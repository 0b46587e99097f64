"""Fused Pallas GP-surrogate step equals the XLA GP step (interpret).

The GP state is SYNTHETIC and well-conditioned: the toy state trained on
a near-uniform initial flow is degenerate (saturated kernel matrix with
catastrophic alpha cancellation), where f32 evaluation is meaningless in
any formulation.  Production states (spread training data, sane
hyperparameters) behave like the synthetic one.
"""

import contextlib
import io
import tempfile

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from gapflow_tpu import Problem
from gapflow_tpu.core.gp_step import make_gp_step_core
from gapflow_tpu.core.step import apply_bcs
from gapflow_tpu.validate import synthetic_gp_state as synthetic_state

SIM = """
options:
    output: data/gpk
    write_freq: 1000000
    silent: True
grid:
    dx: 2.e-5
    dy: 2.e-5
    Nx: 32
    Ny: 128
geometry:
    type: journal
    CR: 1.e-2
    eps: 0.7
    U: 0.1
    V: 0.05
numerics:
    CFL: 0.25
    adaptive: 0
    tol: 1e-30
    dt: 5e-11
    max_it: 100000
properties:
    shear: 0.0794
    bulk: 0.
    EOS: DH
    P0: 101325
    rho0: 877.7007
    C1: 3.5e10
    C2: 1.23
gp:
    press:
        fix_noise: True
        atol: 1.
        rtol: 0.1
        obs_stddev: 100.
        max_steps: 5
{shear_gp}
db:
    init_size: 8
    init_method: sobol
    init_width: 1.e-4
    dtool_path: {tmp}
"""

SHEAR_GP = """    shear:
        fix_noise: True
        atol: 1.
        rtol: 0.1
        obs_stddev: 1.
        max_steps: 5
"""


def _setup(with_shear, tmp):
    with contextlib.redirect_stdout(io.StringIO()):
        problem = Problem.from_string(
            SIM.format(shear_gp=SHEAR_GP if with_shear else "", tmp=tmp))
        problem._pre_run()
    dims = tuple(tuple(m.active_dims) if m.is_gp_model else None
                 for m in (problem.pressure, problem.wall_stress_xz,
                           problem.wall_stress_yz))
    use = tuple(m.is_gp_model for m in (problem.pressure,
                                        problem.wall_stress_xz,
                                        problem.wall_stress_yz))
    return problem, dims, use


@pytest.mark.parametrize("with_shear,cap,mode", [
    (False, 8, "auto"), (True, 8, "auto"),
    (False, 96, "auto"), (True, 96, "auto"),
    # the unrolled per-point accumulation is no longer the production
    # route at any capacity (UNROLL_CAP = 0: the split-K MXU formulation
    # measures faster everywhere) but stays covered as the reference
    # formulation
    (True, 8, "unrolled")])
def test_gp_pallas_step_matches_xla(with_shear, cap, mode, tmp_path,
                                    monkeypatch):
    """The capacity-tiled MXU formulation (batched 3-surrogate augmented
    split-K matmul) at small and large caps, plus the unrolled
    per-point accumulation (forced)."""
    from jax.experimental.pallas import tpu as pltpu
    import gapflow_tpu.ops.stencil_gp as sg
    from gapflow_tpu.ops.stencil_gp import (make_pallas_gp_step_fn,
                                            gp_kernel_supported)

    if mode == "unrolled":
        monkeypatch.setattr(sg, "UNROLL_CAP", 256)

    problem, dims, use = _setup(with_shear, str(tmp_path))
    cfg = problem._solver_cfg
    assert gp_kernel_supported(cfg, 128, dims, use)

    rng = np.random.default_rng(0)
    gp_state = synthetic_state(dims, use, cap, rng)

    q = np.asarray(problem.q, np.float32)
    q[0] *= 1 + 1e-3 * rng.standard_normal(q[0].shape)
    q = jnp.asarray(np.asarray(apply_bcs(jnp.asarray(q), cfg), np.float32))
    topo = jnp.asarray(problem.topo.full, jnp.float32)
    extra = jnp.asarray(problem.fc.get_real_field("extra").p, jnp.float32)
    dt = jnp.float32(problem.dt)

    nf = problem.database.num_features
    ref_step = make_gp_step_core(cfg, dims, nf, use)
    qr, pr = ref_step(q, topo, extra, dt, 0, gp_state)

    caps = tuple(cap if u else 0 for u in use)
    with pltpu.force_tpu_interpret_mode():
        kstep = make_pallas_gp_step_fn(cfg, dims, nf, use, 32, 128, caps,
                                       bs=16)
        qk, pk = kstep(q, topo, extra, dt, 0, gp_state)

    qr, qk = np.asarray(qr), np.asarray(qk)
    sc = np.abs(qr).reshape(3, -1).max(1)[:, None, None]
    sc = np.maximum(sc, 1e-6 * sc.max())
    assert np.max(np.abs(qk - qr) / sc) < 2e-5
    p_err = (np.abs(np.asarray(pk) - np.asarray(pr)).max()
             / np.abs(np.asarray(pr)).max())
    assert p_err < 2e-5


def test_gp_step_cpu_routes_to_xla(tmp_path):
    """On the CPU backend the core step must NOT attempt a Mosaic call."""
    problem, dims, use = _setup(False, str(tmp_path))
    cfg = problem._solver_cfg
    rng = np.random.default_rng(1)
    gp_state = synthetic_state(dims, use, 8, rng)
    step = make_gp_step_core(cfg, dims, problem.database.num_features, use)
    q = jnp.asarray(problem.q, jnp.float32)
    topo = jnp.asarray(problem.topo.full, jnp.float32)
    extra = jnp.asarray(problem.fc.get_real_field("extra").p, jnp.float32)
    qn, p = jax.jit(step)(q, topo, extra, jnp.float32(problem.dt), 0,
                          gp_state)
    assert np.all(np.isfinite(np.asarray(qn)))


@pytest.mark.parametrize("cap", [8, 96])
def test_gp_pallas_loop_matches_steps(cap, tmp_path):
    """Whole-run-in-VMEM GP loop == n repeated GP steps (both cap modes)."""
    from jax.experimental.pallas import tpu as pltpu
    from gapflow_tpu.ops.stencil_gp import make_pallas_gp_loop_fn

    problem, dims, use = _setup(True, str(tmp_path))
    cfg = problem._solver_cfg
    rng = np.random.default_rng(2)
    gp_state = synthetic_state(dims, use, cap, rng)

    q = np.asarray(problem.q, np.float32)
    q[0] *= 1 + 1e-3 * rng.standard_normal(q[0].shape)
    q = jnp.asarray(np.asarray(apply_bcs(jnp.asarray(q), cfg), np.float32))
    topo = jnp.asarray(problem.topo.full, jnp.float32)
    extra = jnp.asarray(problem.fc.get_real_field("extra").p, jnp.float32)
    dt = jnp.float32(problem.dt)

    nf = problem.database.num_features
    n = 3
    ref_step = make_gp_step_core(cfg, dims, nf, use, allow_pallas=False)
    qr = q
    for s in range(n):
        qr, _ = ref_step(qr, topo, extra, dt, s, gp_state)

    caps = tuple(cap if u else 0 for u in use)
    with pltpu.force_tpu_interpret_mode():
        loop = make_pallas_gp_loop_fn(cfg, dims, nf, use, 32, 128, caps,
                                      n, bs=16)
        qk = loop(q, topo, extra, dt, gp_state)

    qr, qk = np.asarray(qr), np.asarray(qk)
    sc = np.abs(qr).reshape(3, -1).max(1)[:, None, None]
    sc = np.maximum(sc, 1e-6 * sc.max())
    assert np.max(np.abs(qk - qr) / sc) < 5e-5


@pytest.mark.parametrize("cap,n", [(8, 4), (96, 8)])
def test_gp_pallas_hbm_loop_matches_steps(cap, n, tmp_path):
    """HBM ping-pong whole-run GP loop == n repeated GP steps (one- and
    two-sweep cases; both capacity modes)."""
    from jax.experimental.pallas import tpu as pltpu
    from gapflow_tpu.ops.stencil_gp import make_pallas_gp_loop_hbm

    problem, dims, use = _setup(True, str(tmp_path))
    cfg = problem._solver_cfg
    rng = np.random.default_rng(3)
    gp_state = synthetic_state(dims, use, cap, rng)

    q = np.asarray(problem.q, np.float32)
    q[0] *= 1 + 1e-3 * rng.standard_normal(q[0].shape)
    q = jnp.asarray(np.asarray(apply_bcs(jnp.asarray(q), cfg), np.float32))
    topo = jnp.asarray(problem.topo.full, jnp.float32)
    extra = jnp.asarray(problem.fc.get_real_field("extra").p, jnp.float32)
    dt = jnp.float32(problem.dt)

    nf = problem.database.num_features
    ref_step = make_gp_step_core(cfg, dims, nf, use, allow_pallas=False)
    qr = q
    for s in range(n):
        qr, _ = ref_step(qr, topo, extra, dt, s, gp_state)

    caps = tuple(cap if u else 0 for u in use)
    with pltpu.force_tpu_interpret_mode():
        loop = make_pallas_gp_loop_hbm(cfg, dims, nf, use, 32, 128, caps,
                                       n, bs=8)
        qk = loop(q, topo, extra, dt, gp_state)

    qr, qk = np.asarray(qr), np.asarray(qk)
    sc = np.abs(qr).reshape(3, -1).max(1)[:, None, None]
    sc = np.maximum(sc, 1e-6 * sc.max())
    assert np.max(np.abs(qk - qr) / sc) < 5e-5


@pytest.mark.parametrize("with_shear,cap", [(False, 8), (True, 8),
                                            (True, 96)])
def test_gp_pallas_bc_step_matches_xla(with_shear, cap, tmp_path):
    """The D/N (uniform-edge) GP kernel — _kernel_fused_gp_bc on the
    W-wide ghost-explicit layout with the serial refill between passes —
    equals the XLA GP step over several steps (the ghost ring re-fills
    linearly, so trajectories compose)."""
    from jax.experimental.pallas import tpu as pltpu
    from gapflow_tpu.ops.stencil_gp import (make_pallas_gp_step_bc_fn,
                                            gp_bc_kernel_supported)

    sim_dn = SIM.replace("    Ny: 128", """    Ny: 128
    xE: ['D', 'N', 'N']
    xW: ['D', 'N', 'N']
    xE_D: 877.7007
    xW_D: 877.7007""")
    with contextlib.redirect_stdout(io.StringIO()):
        problem = Problem.from_string(
            sim_dn.format(shear_gp=SHEAR_GP if with_shear else "",
                          tmp=tmp_path))
        problem._pre_run()
    dims = tuple(tuple(m.active_dims) if m.is_gp_model else None
                 for m in (problem.pressure, problem.wall_stress_xz,
                           problem.wall_stress_yz))
    use = tuple(m.is_gp_model for m in (problem.pressure,
                                        problem.wall_stress_xz,
                                        problem.wall_stress_yz))
    cfg = problem._solver_cfg
    assert gp_bc_kernel_supported(cfg, 128, dims, use)

    rng = np.random.default_rng(0)
    gp_state = synthetic_state(dims, use, cap, rng)

    q = np.asarray(problem.q, np.float32)
    q[0] *= 1 + 1e-3 * rng.standard_normal(q[0].shape)
    q = jnp.asarray(np.asarray(apply_bcs(jnp.asarray(q), cfg), np.float32))
    topo = jnp.asarray(problem.topo.full, jnp.float32)
    extra = jnp.asarray(problem.fc.get_real_field("extra").p, jnp.float32)
    dt = jnp.float32(problem.dt)

    nf = problem.database.num_features
    ref_step = make_gp_step_core(cfg, dims, nf, use)
    qr = q
    for k in range(3):
        qr, _ = ref_step(qr, topo, extra, dt, k, gp_state)

    caps = tuple(cap if u else 0 for u in use)
    with pltpu.force_tpu_interpret_mode():
        kstep = make_pallas_gp_step_bc_fn(cfg, dims, nf, use, 32, 128,
                                          caps, bs=16)
        qk = q
        for k in range(3):
            qk = kstep(qk, topo, extra, dt, gp_state)

    qr, qk = np.asarray(qr), np.asarray(qk)
    sc = np.abs(qr).reshape(3, -1).max(1)[:, None, None]
    sc = np.maximum(sc, 1e-6 * sc.max())
    assert np.max(np.abs(qk - qr) / sc) < 5e-5


def test_gp_fast_pred_config_plumbs_and_matches(tmp_path):
    """``numerics: gp_fast_pred: 1`` reaches the SolverConfig and the
    fused GP kernel still matches the XLA step in interpret mode (CPU
    f32 dots are exact regardless of the MXU precision request; the
    ~2e-3 hardware error of the bf16 accumulation pass is measured and
    documented in doc/status.md)."""
    from jax.experimental.pallas import tpu as pltpu
    from gapflow_tpu.ops.stencil_gp import make_pallas_gp_step_fn

    sim_fast = SIM.replace("numerics:", "numerics:\n    gp_fast_pred: 1")
    with contextlib.redirect_stdout(io.StringIO()):
        problem = Problem.from_string(
            sim_fast.format(shear_gp=SHEAR_GP, tmp=tmp_path))
        problem._pre_run()
    cfg = problem._solver_cfg
    assert cfg.gp_fast_pred is True

    dims = tuple(tuple(m.active_dims) if m.is_gp_model else None
                 for m in (problem.pressure, problem.wall_stress_xz,
                           problem.wall_stress_yz))
    use = tuple(m.is_gp_model for m in (problem.pressure,
                                        problem.wall_stress_xz,
                                        problem.wall_stress_yz))
    rng = np.random.default_rng(0)
    gp_state = synthetic_state(dims, use, 96, rng)   # MXU mode

    q = np.asarray(problem.q, np.float32)
    q[0] *= 1 + 1e-3 * rng.standard_normal(q[0].shape)
    q = jnp.asarray(np.asarray(apply_bcs(jnp.asarray(q), cfg), np.float32))
    topo = jnp.asarray(problem.topo.full, jnp.float32)
    extra = jnp.asarray(problem.fc.get_real_field("extra").p, jnp.float32)
    dt = jnp.float32(problem.dt)
    nf = problem.database.num_features

    ref = make_gp_step_core(cfg, dims, nf, use, allow_pallas=False)
    qr, _ = ref(q, topo, extra, dt, 0, gp_state)

    caps = tuple(96 if u else 0 for u in use)
    with pltpu.force_tpu_interpret_mode():
        kstep = make_pallas_gp_step_fn(cfg, dims, nf, use, 32, 128, caps)
        qk, _ = kstep(q, topo, extra, dt, 0, gp_state)

    qr, qk = np.asarray(qr), np.asarray(qk)
    sc = np.abs(qr).reshape(3, -1).max(1)[:, None, None]
    sc = np.maximum(sc, 1e-6 * sc.max())
    assert np.max(np.abs(qk - qr) / sc) < 5e-5
