"""Pallas fused stencil kernel equals the XLA fused step (interpret mode).

Runs the kernel through the Pallas interpreter on CPU so the hot-path
physics is covered by CI without TPU hardware; the same comparisons hold
on TPU (verified on hardware during development).  All comparisons use
PERTURBED states (see ``perturbed``) — the unperturbed journal state is
f32-frozen and would pass trivially — and component-scaled tolerances
(distinct compiled programs agree to f32 rounding, not bitwise).
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from gapflow_tpu import Problem
from gapflow_tpu.core.step import make_det_step
from gapflow_tpu.ops import pallas_supported


SIM_BC_GRID = """    Nx: 32
    Ny: 128
    xE: ['D', 'N', 'N']
    xW: ['D', 'N', 'N']
    xE_D: 877.7007
    xW_D: 877.7007"""

sim = """
options:
    output: data/pallas
    write_freq: 1000
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
    V: 0.
numerics:
    CFL: 0.5
    adaptive: 0
    tol: 1e-8
    dt: 5e-11
    max_it: 10
properties:
    shear: 0.0794
    bulk: 0.
    EOS: DH
    P0: 101325.
    rho0: 877.7007
    C1: 3.5e10
    C2: 1.23
"""


def perturbed(problem, seed=0, amp=0.01):
    """Non-inert state for kernel comparisons.

    The journal initial state is f32-FROZEN: per-step increments fall
    below one ulp of rho ~ 877.7, so an unperturbed comparison holds
    trivially (all gradients stay exactly zero) and exercises nothing.
    A relative density + small flux perturbation makes every term live.
    ``amp``: with the DH EOS (C1=3.5e10), pressure swings ~ amp*C1 —
    keep amp*C1 below Roelands' p_ref (2e8) for piezoviscous configs,
    where (1+p/p_ref)^z NaNs for large negative p (and the reference
    step then silently rolls back via its validity cond)."""
    from gapflow_tpu.core.step import apply_bcs
    st = problem._make_state()
    rng = np.random.default_rng(seed)
    q = np.array(st.q)
    q[0] *= 1. + amp * rng.standard_normal(q[0].shape)
    q[1] += 0.1 * amp * float(np.mean(q[0])) * rng.standard_normal(q[0].shape)
    return st._replace(q=apply_bcs(jnp.asarray(q, st.q.dtype),
                                   problem._solver_cfg))


def as_f32(state):
    """Cast the whole SimState to float32 so the XLA reference runs the
    same precision as the kernel (f64-ref-vs-f32-kernel differences are
    dominated by f32 rounding of the reference, ~30 ulps)."""
    return jax.tree.map(
        lambda a: a.astype(jnp.float32)
        if hasattr(a, "dtype") and a.dtype == jnp.float64 else a, state)


def scaled_err(a, b):
    """Max abs difference scaled by each component's max magnitude.

    Pointwise relative error is meaningless where jy crosses zero;
    distinct compiled programs (XLA vs Mosaic, one-step vs temporal-
    blocked) agree to f32 rounding — ~1e-7 per step, up to ~2e-6 after
    several steps — not bitwise.  Real kernel bugs sit orders above
    (the periodic-x thinning seam bug measured 6e-5 in ONE step)."""
    a, b = np.asarray(a), np.asarray(b)
    scale = np.abs(b).reshape(b.shape[0], -1).max(axis=1)
    return float(np.max(np.abs(a - b)
                        / scale[(slice(None),) + (None,) * (b.ndim - 1)]))


def test_pallas_step_matches_xla_interpret(monkeypatch):
    from jax.experimental.pallas import tpu as pltpu

    problem = Problem.from_string(sim)
    problem._pre_run()
    assert pallas_supported(problem._solver_cfg, problem.grid["Ny"])

    state = as_f32(perturbed(problem))
    det = make_det_step(problem._solver_cfg, with_aux=False)
    ref = np.asarray(det(state).q, dtype=np.float32)

    with pltpu.force_tpu_interpret_mode():
        from gapflow_tpu.ops.stencil import make_pallas_step, _make_call
        make_pallas_step.cache_clear()
        _make_call.cache_clear()
        step = make_pallas_step(problem._solver_cfg, 32, 128, bs=16)
        out = np.asarray(step(state.q, state.topo, state.extra,
                              state.dt, 0))
        make_pallas_step.cache_clear()
        _make_call.cache_clear()

    assert scaled_err(out, ref) < 1e-5


@pytest.mark.parametrize("props", [
    # Barus piezoviscosity on the DH journal config
    "    piezo: {name: Barus, aB: 2.e-9}",
    # Roelands piezoviscosity
    "    piezo: {name: Roelands, mu_inf: 1.e-3, p_ref: 1.96e8, z: 0.68}",
])
def test_pallas_piezo_step_matches_xla_interpret(props):
    """Piezoviscous (per-cell eta) fused kernel equals the XLA step."""
    from jax.experimental.pallas import tpu as pltpu

    sim_pz = sim + props + "\n"
    problem = Problem.from_string(sim_pz)
    problem._pre_run()
    cfg = problem._solver_cfg
    assert cfg.piezo is not None
    assert pallas_supported(cfg, problem.grid["Ny"])

    state = as_f32(perturbed(problem, amp=1e-4))
    det = make_det_step(cfg, with_aux=False)
    ref = np.asarray(det(state).q, dtype=np.float32)

    with pltpu.force_tpu_interpret_mode():
        from gapflow_tpu.ops.stencil import make_pallas_step, _make_call
        make_pallas_step.cache_clear()
        _make_call.cache_clear()
        step = make_pallas_step(cfg, 32, 128, bs=16)
        out = np.asarray(step(state.q, state.topo, state.extra,
                              state.dt, 0))
        make_pallas_step.cache_clear()
        _make_call.cache_clear()

    assert scaled_err(out, ref) < 1e-5


def test_pallas_bayada_mixture_matches_xla_interpret():
    """Bayada EOS + McAdams mixture viscosity (density-argument piezo
    branch) through the fused kernel equals the XLA step."""
    from jax.experimental.pallas import tpu as pltpu

    sim_bay = sim.replace("""    EOS: DH
    P0: 101325.
    rho0: 877.7007
    C1: 3.5e10
    C2: 1.23""", """    EOS: Bayada
    rho_l: 850.
    rho_v: 0.019
    c_l: 1600.
    c_v: 352.
    piezo: {name: McAdams, eta_v: 3.9e-5, rho_l: 850., rho_v: 0.019}""")
    problem = Problem.from_string(sim_bay)
    problem._pre_run()
    cfg = problem._solver_cfg
    assert cfg.prop["EOS"] == "Bayada" and cfg.piezo is not None
    assert pallas_supported(cfg, problem.grid["Ny"])

    state = as_f32(perturbed(problem, amp=1e-4))
    det = make_det_step(cfg, with_aux=False)
    ref = np.asarray(det(state).q, dtype=np.float32)

    with pltpu.force_tpu_interpret_mode():
        from gapflow_tpu.ops.stencil import make_pallas_step, _make_call
        make_pallas_step.cache_clear()
        _make_call.cache_clear()
        step = make_pallas_step(cfg, 32, 128, bs=16)
        out = np.asarray(step(state.q, state.topo, state.extra,
                              state.dt, 0))
        make_pallas_step.cache_clear()
        _make_call.cache_clear()

    assert scaled_err(out, ref) < 1e-5


@pytest.mark.parametrize("extra_props,extra_grid", [
    # D/N x edges + piezo + Eyring thinning
    ("    piezo: {name: Barus, aB: 2.e-9}\n"
     "    thinning: {name: Eyring, tauE: 5.e5}\n",
     """
    xE: ['D', 'N', 'N']
    xW: ['D', 'N', 'N']
    xE_D: 877.7007
    xW_D: 877.7007"""),
    # D/N x edges + Carreau thinning
    ("    thinning: {name: Carreau, lam: 1.e-8, a: 2., N: 0.5}\n",
     """
    xE: ['D', 'N', 'N']
    xW: ['D', 'N', 'N']
    xE_D: 877.7007
    xW_D: 877.7007"""),
    # fully periodic journal + Eyring thinning (seam-patch path)
    ("    thinning: {name: Eyring, tauE: 5.e5}\n", ""),
    # fully periodic + piezo + Eyring thinning
    ("    piezo: {name: Barus, aB: 2.e-9}\n"
     "    thinning: {name: Eyring, tauE: 5.e5}\n", ""),
    # fully periodic + Carreau thinning
    ("    thinning: {name: Carreau, lam: 1.e-8, a: 2., N: 0.5}\n", ""),
])
def test_pallas_thinning_step_matches_xla_interpret(extra_props,
                                                    extra_grid):
    """Shear thinning through the ghost-explicit kernel equals the XLA
    step (np.gradient one-sided ghost stencils reproduced in-kernel)."""
    from jax.experimental.pallas import tpu as pltpu

    sim_th = sim.replace("""    Nx: 32
    Ny: 128""", """    Nx: 32
    Ny: 128""" + extra_grid) + extra_props
    problem = Problem.from_string(sim_th)
    problem._pre_run()
    cfg = problem._solver_cfg
    assert cfg.thinning is not None
    assert pallas_supported(cfg, problem.grid["Ny"])

    state = as_f32(perturbed(problem))
    det = make_det_step(cfg, with_aux=False)
    ref = np.asarray(det(state).q, dtype=np.float32)

    with pltpu.force_tpu_interpret_mode():
        from gapflow_tpu.ops.stencil import make_pallas_step, _make_call
        make_pallas_step.cache_clear()
        _make_call.cache_clear()
        step = make_pallas_step(cfg, 32, 128, bs=16)
        out = np.asarray(step(state.q, state.topo, state.extra,
                              state.dt, 0))
        make_pallas_step.cache_clear()
        _make_call.cache_clear()

    assert scaled_err(out, ref) < 1e-5


def test_thinning_periodic_x_multistep_matches_xla():
    """Periodic-x thinning through the seam-patched kernel: several
    per-step kernel calls track the XLA trajectory (the round-1 seam
    divergence measured 6e-5 in ONE step; the patch holds it at f32
    rounding across steps)."""
    from jax.experimental.pallas import tpu as pltpu

    sim_th = sim + "    thinning: {name: Eyring, tauE: 5.e5}\n"
    problem = Problem.from_string(sim_th)
    problem._pre_run()
    cfg = problem._solver_cfg
    assert pallas_supported(cfg, problem.grid["Ny"])

    state = as_f32(perturbed(problem))
    det = make_det_step(cfg, with_aux=False)
    ref_state = state
    for _ in range(4):
        ref_state = det(ref_state)
    ref = np.asarray(ref_state.q, dtype=np.float32)

    with pltpu.force_tpu_interpret_mode():
        from gapflow_tpu.ops.stencil import make_pallas_step, _make_call
        make_pallas_step.cache_clear()
        _make_call.cache_clear()
        step = make_pallas_step(cfg, 32, 128, bs=16)
        q = state.q
        for i in range(4):
            q = step(q, state.topo, state.extra, state.dt, i)
        out = np.asarray(q)
        make_pallas_step.cache_clear()
        _make_call.cache_clear()

    assert scaled_err(out, ref) < 1e-5


def test_pallas_thinning_loop_matches_per_step():
    """Temporal-blocked loop (k=2 for thinning) equals per-step stepping
    for a D/N-x thinning config."""
    from jax.experimental.pallas import tpu as pltpu

    sim_th = sim.replace("""    Nx: 32
    Ny: 128""", SIM_BC_GRID) + "    thinning: {name: Eyring, tauE: 5.e5}\n"
    problem = Problem.from_string(sim_th)
    problem._pre_run()
    cfg = problem._solver_cfg
    state = perturbed(problem)

    with pltpu.force_tpu_interpret_mode():
        from gapflow_tpu.ops import stencil
        assert stencil._k_steps(cfg) == 2
        stencil.make_pallas_loop.cache_clear()
        stencil._make_call.cache_clear()
        loop = stencil.make_pallas_loop(cfg, 32, 128, bs=16)
        out = np.asarray(loop(state.q, state.topo, state.extra,
                              state.dt, 5))  # 2 sweeps + 1 remainder

        (call, extend, reassemble, fused, ext_step, *_rest) = \
            stencil._make_call(cfg, 32, 128, 16, jnp.float32)
        stat_ext = extend(stencil._statics_ghosted(
            state.topo.astype(jnp.float32), state.extra.astype(jnp.float32)))
        dt = jnp.asarray(state.dt, jnp.float32)[None]
        q_int = state.q.astype(jnp.float32)[:, 1:-1, 1:-1]
        for _ in range(5):
            q_int = call(ext_step(q_int), stat_ext, dt)
        ref = np.asarray(reassemble(state.q.astype(jnp.float32), q_int))
        stencil.make_pallas_loop.cache_clear()
        stencil._make_call.cache_clear()

    assert scaled_err(out, ref) < 1e-5


def test_pallas_bc_step_matches_xla_interpret():
    """Boundary-capable kernel variant (D/N edges) in interpret mode."""
    from jax.experimental.pallas import tpu as pltpu

    sim_bc = sim.replace(
        """    Nx: 32
    Ny: 128""",
        """    Nx: 32
    Ny: 128
    xE: ['D', 'N', 'N']
    xW: ['D', 'N', 'N']
    xE_D: 877.7007
    xW_D: 877.7007""")

    problem = Problem.from_string(sim_bc)
    problem._pre_run()
    assert pallas_supported(problem._solver_cfg, problem.grid["Ny"])

    state = as_f32(perturbed(problem))
    det = make_det_step(problem._solver_cfg, with_aux=False)
    ref = np.asarray(det(state).q, dtype=np.float32)

    with pltpu.force_tpu_interpret_mode():
        from gapflow_tpu.ops.stencil import make_pallas_step, _make_call
        make_pallas_step.cache_clear()
        _make_call.cache_clear()
        step = make_pallas_step(problem._solver_cfg, 32, 128, bs=16)
        out = np.asarray(step(state.q, state.topo, state.extra,
                              state.dt, 0))
        make_pallas_step.cache_clear()
        _make_call.cache_clear()

    assert scaled_err(out, ref) < 1e-5


def test_pallas_compensated_loop_matches_plain():
    """The delta-emitting kernel + Kahan carry reproduces the plain loop.

    In f64 the two formulations agree to rounding (~1e-11 relative); in f32
    they are distinct rounding paths through a stiff transient, so only a
    loose agreement is meaningful (the compensated path is the *more*
    accurate one — see examples/validate_f32_production.py)."""
    from jax.experimental.pallas import tpu as pltpu

    problem = Problem.from_string(sim)
    problem._pre_run()
    state = perturbed(problem)

    with pltpu.force_tpu_interpret_mode():
        from gapflow_tpu.ops.stencil import make_pallas_loop, _make_call
        make_pallas_loop.cache_clear()
        _make_call.cache_clear()
        args = (state.q, state.topo, state.extra, state.dt)
        outs = {}
        # 10 steps = 2 blocked sweeps (whole-run Kahan kernel) + 2
        # remainder steps through the per-step delta path
        for dt_ in (jnp.float64, jnp.float32):
            plain = make_pallas_loop(problem._solver_cfg, 32, 128, bs=16,
                                     dtype=dt_)
            comp = make_pallas_loop(problem._solver_cfg, 32, 128, bs=16,
                                    dtype=dt_, compensated=True)
            outs[dt_] = (np.asarray(plain(*args, 10)),
                         np.asarray(comp(*args, 10)))
        make_pallas_loop.cache_clear()
        _make_call.cache_clear()

    out_p, out_c = outs[jnp.float64]
    assert scaled_err(out_c, out_p) < 1e-8

    out_p, out_c = outs[jnp.float32]
    assert np.all(np.isfinite(out_c))
    assert scaled_err(out_c, out_p) < 5e-3


def test_pallas_multi_step_matches_ext():
    """Temporal-blocked kernel (K_MULTI steps/sweep) equals K_MULTI
    applications of the one-step extended-carry kernel."""
    from jax.experimental.pallas import tpu as pltpu

    problem = Problem.from_string(sim)
    problem._pre_run()
    cfg = problem._solver_cfg
    state = perturbed(problem)

    with pltpu.force_tpu_interpret_mode():
        from gapflow_tpu.ops import stencil
        stencil._make_call.cache_clear()
        (call, extend, reassemble, fused, ext_step, call_ext, _,
         hbm_factory, *_) = stencil._make_call(cfg, 32, 128, 16, jnp.float32)
        assert fused and call_ext is not None and hbm_factory is not None
        call_multi = hbm_factory(1)

        stat_ext = extend(stencil._statics_ghosted(
            state.topo.astype(jnp.float32), state.extra.astype(jnp.float32)))
        dt = jnp.asarray(state.dt, jnp.float32)[None]
        q_ext = extend(state.q.astype(jnp.float32))

        ref = q_ext
        for _ in range(stencil.K_MULTI):
            ref = call_ext(ref, stat_ext, dt)
        out = call_multi(q_ext, stat_ext, dt)
        stencil._make_call.cache_clear()

    assert scaled_err(out, ref) < 1e-5


def test_pallas_bc_multi_step_matches_onestep():
    """Temporal-blocked boundary kernel equals K_MULTI applications of the
    one-step boundary kernel + per-step extension."""
    from jax.experimental.pallas import tpu as pltpu

    sim_bc = sim.replace(
        """    Nx: 32
    Ny: 128""",
        """    Nx: 32
    Ny: 128
    xE: ['D', 'N', 'N']
    xW: ['D', 'N', 'N']
    xE_D: 877.7007
    xW_D: 877.7007""")

    problem = Problem.from_string(sim_bc)
    problem._pre_run()
    cfg = problem._solver_cfg
    state = perturbed(problem)

    with pltpu.force_tpu_interpret_mode():
        from gapflow_tpu.ops import stencil
        stencil._make_call.cache_clear()
        (call, extend, reassemble, fused, ext_step, call_ext, vmem_f,
         hbm_factory, *_) = stencil._make_call(cfg, 32, 128, 16, jnp.float32)
        assert fused and call_ext is None and hbm_factory is not None
        call_multi = hbm_factory(1)

        stat_ext = extend(stencil._statics_ghosted(
            state.topo.astype(jnp.float32), state.extra.astype(jnp.float32)))
        dt = jnp.asarray(state.dt, jnp.float32)[None]
        qf = state.q.astype(jnp.float32)

        q_int = qf[:, 1:-1, 1:-1]
        for _ in range(stencil.K_MULTI):
            q_int = call(ext_step(q_int), stat_ext, dt)

        out_ext = call_multi(extend(qf), stat_ext, dt)
        out_int = out_ext[:, stencil.HALO_X:stencil.HALO_X + 32, :128]
        stencil._make_call.cache_clear()

    assert scaled_err(out_int, q_int) < 1e-5


def test_pallas_loop_bc_matches_per_step():
    """make_pallas_loop on a D/N config (multi + remainder dispatch)
    equals per-step application of the boundary kernel."""
    from jax.experimental.pallas import tpu as pltpu

    sim_bc = sim.replace(
        """    Nx: 32
    Ny: 128""",
        """    Nx: 32
    Ny: 128
    xE: ['D', 'N', 'N']
    xW: ['D', 'N', 'N']
    xE_D: 877.7007
    xW_D: 877.7007""")

    problem = Problem.from_string(sim_bc)
    problem._pre_run()
    cfg = problem._solver_cfg
    state = perturbed(problem)

    with pltpu.force_tpu_interpret_mode():
        from gapflow_tpu.ops import stencil
        stencil.make_pallas_loop.cache_clear()
        stencil._make_call.cache_clear()
        loop = stencil.make_pallas_loop(cfg, 32, 128, bs=16)
        out = np.asarray(loop(state.q, state.topo, state.extra,
                              state.dt, 6))

        (call, extend, reassemble, fused, ext_step, *_rest) = \
            stencil._make_call(cfg, 32, 128, 16, jnp.float32)
        stat_ext = extend(stencil._statics_ghosted(
            state.topo.astype(jnp.float32), state.extra.astype(jnp.float32)))
        dt = jnp.asarray(state.dt, jnp.float32)[None]
        q_int = state.q.astype(jnp.float32)[:, 1:-1, 1:-1]
        for _ in range(6):
            q_int = call(ext_step(q_int), stat_ext, dt)
        ref = np.asarray(reassemble(state.q.astype(jnp.float32), q_int))
        stencil.make_pallas_loop.cache_clear()
        stencil._make_call.cache_clear()

    assert scaled_err(out, ref) < 1e-5


def test_pallas_hbm_loop_matches_ext():
    """Whole-run HBM ping-pong kernel (n_sweeps in one pallas_call)
    equals n_sweeps*K_MULTI one-step kernel applications."""
    from jax.experimental.pallas import tpu as pltpu

    problem = Problem.from_string(sim)
    problem._pre_run()
    cfg = problem._solver_cfg
    state = perturbed(problem)

    with pltpu.force_tpu_interpret_mode():
        from gapflow_tpu.ops import stencil
        stencil._make_call.cache_clear()
        (call, extend, reassemble, fused, ext_step, call_ext, _,
         hbm_factory, *_) = stencil._make_call(cfg, 32, 128, 16, jnp.float32)
        assert hbm_factory is not None

        stat_ext = extend(stencil._statics_ghosted(
            state.topo.astype(jnp.float32), state.extra.astype(jnp.float32)))
        dt = jnp.asarray(state.dt, jnp.float32)[None]
        q_ext = extend(state.q.astype(jnp.float32))

        for n_sweeps in (1, 2, 3):
            ref = q_ext
            for _ in range(n_sweeps * stencil.K_MULTI):
                ref = call_ext(ref, stat_ext, dt)
            out = hbm_factory(n_sweeps)(q_ext, stat_ext, dt)
            assert scaled_err(out, ref) < 1e-5, f"n_sweeps={n_sweeps}"
        stencil._make_call.cache_clear()


def test_pallas_comp_hbm_matches_per_step():
    """Compensated whole-run kernel (in-kernel Kahan, 6-channel carry)
    equals the per-step emit_delta + host-Kahan path bit for bit."""
    from jax.experimental.pallas import tpu as pltpu

    problem = Problem.from_string(sim)
    problem._pre_run()
    cfg = problem._solver_cfg
    state = perturbed(problem)

    with pltpu.force_tpu_interpret_mode():
        from gapflow_tpu.ops import stencil
        stencil._make_call.cache_clear()
        (call, extend, reassemble, fused, ext_step, _, _, hbm_factory,
         *_) = stencil._make_call(cfg, 32, 128, 16, jnp.float32, True)
        assert hbm_factory is not None

        stat_ext = extend(stencil._statics_ghosted(
            state.topo.astype(jnp.float32), state.extra.astype(jnp.float32)))
        dt = jnp.asarray(state.dt, jnp.float32)[None]
        qf = state.q.astype(jnp.float32)

        q_int = qf[:, 1:-1, 1:-1]
        q_lo = jnp.zeros_like(q_int)
        for _ in range(2 * stencil.K_MULTI):
            delta = call(ext_step(q_int), stat_ext, dt)
            y = delta + q_lo
            t = q_int + y
            q_lo = y - (t - q_int)
            q_int = t

        ext_q = extend(qf)
        carry6 = jnp.concatenate([ext_q, jnp.zeros_like(ext_q)], 0)
        out6 = hbm_factory(2)(carry6, stat_ext, dt)
        sl = slice(stencil.HALO_X, stencil.HALO_X + 32)
        stencil._make_call.cache_clear()

    np.testing.assert_array_equal(np.asarray(out6[:3, sl, :]),
                                  np.asarray(q_int))
    np.testing.assert_array_equal(np.asarray(out6[3:, sl, :]),
                                  np.asarray(q_lo))


def test_pallas_bc_hbm_loop_matches_onestep():
    """Whole-run ghost-explicit kernel equals n_sweeps*K one-step
    boundary-kernel applications (D/N edges)."""
    from jax.experimental.pallas import tpu as pltpu

    sim_bc = sim.replace(
        """    Nx: 32
    Ny: 128""",
        """    Nx: 32
    Ny: 128
    xE: ['D', 'N', 'N']
    xW: ['D', 'N', 'N']
    xE_D: 877.7007
    xW_D: 877.7007""")

    problem = Problem.from_string(sim_bc)
    problem._pre_run()
    cfg = problem._solver_cfg
    state = perturbed(problem)

    with pltpu.force_tpu_interpret_mode():
        from gapflow_tpu.ops import stencil
        stencil._make_call.cache_clear()
        (call, extend, reassemble, fused, ext_step, _, _,
         hbm_factory, *_) = stencil._make_call(cfg, 32, 128, 16, jnp.float32)
        assert hbm_factory is not None

        stat_ext = extend(stencil._statics_ghosted(
            state.topo.astype(jnp.float32), state.extra.astype(jnp.float32)))
        dt = jnp.asarray(state.dt, jnp.float32)[None]
        qf = state.q.astype(jnp.float32)
        k = stencil._k_steps(cfg)

        for n_sweeps in (2, 3):
            q_int = qf[:, 1:-1, 1:-1]
            for _ in range(n_sweeps * k):
                q_int = call(ext_step(q_int), stat_ext, dt)
            out_ext = hbm_factory(n_sweeps)(extend(qf), stat_ext, dt)
            out = out_ext[:, stencil.HALO_X:stencil.HALO_X + 32, :128]
            assert scaled_err(out, q_int) < 1e-5, f"n_sweeps={n_sweeps}"
        stencil._make_call.cache_clear()


def test_pallas_thinning_hbm_loop_matches_per_step():
    """Whole-run ghost-explicit kernel with in-kernel thinning (D/N x,
    k=2) through make_pallas_loop equals per-step stepping."""
    from jax.experimental.pallas import tpu as pltpu

    sim_th = sim.replace("""    Nx: 32
    Ny: 128""", SIM_BC_GRID) + "    thinning: {name: Eyring, tauE: 5.e5}\n"
    problem = Problem.from_string(sim_th)
    problem._pre_run()
    cfg = problem._solver_cfg
    state = perturbed(problem)

    with pltpu.force_tpu_interpret_mode():
        from gapflow_tpu.ops import stencil
        stencil.make_pallas_loop.cache_clear()
        stencil._make_call.cache_clear()
        loop = stencil.make_pallas_loop(cfg, 32, 128, bs=16)
        out = np.asarray(loop(state.q, state.topo, state.extra,
                              state.dt, 9))  # 4 sweeps (hbm) + 1 remainder

        (call, extend, reassemble, fused, ext_step, *_rest) = \
            stencil._make_call(cfg, 32, 128, 16, jnp.float32)
        stat_ext = extend(stencil._statics_ghosted(
            state.topo.astype(jnp.float32), state.extra.astype(jnp.float32)))
        dt = jnp.asarray(state.dt, jnp.float32)[None]
        q_int = state.q.astype(jnp.float32)[:, 1:-1, 1:-1]
        for _ in range(9):
            q_int = call(ext_step(q_int), stat_ext, dt)
        ref = np.asarray(reassemble(state.q.astype(jnp.float32), q_int))
        stencil.make_pallas_loop.cache_clear()
        stencil._make_call.cache_clear()

    assert scaled_err(out, ref) < 1e-5


def test_pallas_thinning_periodic_hbm_loop_matches_xla():
    """Whole-run ghost-explicit kernel with PERIODIC-x thinning (seam
    patch, k=2 temporal blocking) equals the XLA trajectory — the
    strip-local halo evolution must apply the seam rule, or the halo
    drifts from the remote interior it mirrors within one sweep."""
    from jax.experimental.pallas import tpu as pltpu

    sim_th = sim + "    thinning: {name: Eyring, tauE: 5.e5}\n"
    problem = Problem.from_string(sim_th)
    problem._pre_run()
    cfg = problem._solver_cfg
    state = as_f32(perturbed(problem))

    n_steps = 9   # 4 temporal-blocked sweeps + 1 remainder step
    det = make_det_step(cfg, with_aux=False)
    ref_state = state
    for _ in range(n_steps):
        ref_state = det(ref_state)
    ref = np.asarray(ref_state.q, dtype=np.float32)

    with pltpu.force_tpu_interpret_mode():
        from gapflow_tpu.ops import stencil
        assert stencil._k_steps(cfg) == 2
        stencil.make_pallas_loop.cache_clear()
        stencil._make_call.cache_clear()
        loop = stencil.make_pallas_loop(cfg, 32, 128, bs=16)
        out = np.asarray(loop(state.q, state.topo, state.extra,
                              state.dt, n_steps))
        stencil.make_pallas_loop.cache_clear()
        stencil._make_call.cache_clear()

    assert scaled_err(out, ref) < 1e-5


@pytest.mark.parametrize("grid_extra,props_extra", [
    # D/N x edges + thinning
    (SIM_BC_GRID, "    thinning: {name: Eyring, tauE: 5.e5}\n"),
    # fully periodic + thinning (seam patch)
    ("""    Nx: 32
    Ny: 128""", "    thinning: {name: Eyring, tauE: 5.e5}\n"),
    # plain D/N (no thinning)
    (SIM_BC_GRID, ""),
], ids=["bc-thinning", "periodic-thinning", "bc-plain"])
def test_pallas_bc_compensated_hbm_matches_per_step(grid_extra, props_extra):
    """Compensated (Kahan, 6-channel) ghost-explicit whole-run kernel
    equals the per-step emit_delta + host-Kahan path."""
    from jax.experimental.pallas import tpu as pltpu

    sim_c = sim.replace("""    Nx: 32
    Ny: 128""", grid_extra) + props_extra
    problem = Problem.from_string(sim_c)
    problem._pre_run()
    cfg = problem._solver_cfg
    state = perturbed(problem)
    n_steps = 9

    with pltpu.force_tpu_interpret_mode():
        from gapflow_tpu.ops import stencil
        stencil.make_pallas_loop.cache_clear()
        stencil._make_call.cache_clear()
        # whole-run path (sweeps through the 6-channel kernel + remainder)
        loop = stencil.make_pallas_loop(cfg, 32, 128, bs=16,
                                        compensated=True)
        out = np.asarray(loop(state.q, state.topo, state.extra,
                              state.dt, n_steps))

        # per-step reference: emit_delta kernel + host Kahan carry
        (call, extend, reassemble, fused, ext_step, *_) = \
            stencil._make_call(cfg, 32, 128, 16, jnp.float32, True)
        stat_ext = extend(stencil._statics_ghosted(
            state.topo.astype(jnp.float32),
            state.extra.astype(jnp.float32)))
        dt = jnp.asarray(state.dt, jnp.float32)[None]
        q_int = state.q.astype(jnp.float32)[:, 1:-1, 1:-1]
        lo = jnp.zeros_like(q_int)
        for _ in range(n_steps):
            delta = call(ext_step(q_int), stat_ext, dt)
            y = delta + lo
            t = q_int + y
            lo = y - (t - q_int)
            q_int = t
        ref = np.asarray(reassemble(state.q.astype(jnp.float32), q_int))
        stencil.make_pallas_loop.cache_clear()
        stencil._make_call.cache_clear()

    assert scaled_err(out, ref) < 1e-5


def test_pallas_bc_asymmetric_dirichlet_matches_xla():
    """Asymmetric xE_D/xW_D targets through the ghost-explicit kernel
    equal the XLA step (the Dirichlet value swap of SolverConfig —
    xE_D is the HIGH-x boundary — must reach the in-kernel refills)."""
    from jax.experimental.pallas import tpu as pltpu

    sim_bc = sim.replace(
        """    Nx: 32
    Ny: 128""",
        """    Nx: 32
    Ny: 128
    xE: ['D', 'N', 'N']
    xW: ['D', 'N', 'N']
    xE_D: 900.
    xW_D: 850.""")

    problem = Problem.from_string(sim_bc)
    problem._pre_run()
    cfg = problem._solver_cfg
    assert pallas_supported(cfg, problem.grid["Ny"])

    state = as_f32(perturbed(problem, amp=1e-3))
    det = make_det_step(cfg, with_aux=False)
    ref = np.asarray(det(state).q, dtype=np.float32)

    with pltpu.force_tpu_interpret_mode():
        from gapflow_tpu.ops.stencil import make_pallas_step, _make_call
        make_pallas_step.cache_clear()
        _make_call.cache_clear()
        step = make_pallas_step(cfg, 32, 128, bs=16)
        out = np.asarray(step(state.q, state.topo, state.extra,
                              state.dt, 0))
        make_pallas_step.cache_clear()
        _make_call.cache_clear()

    assert scaled_err(out, ref) < 1e-5
