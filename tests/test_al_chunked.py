"""Chunked device<->host AL (core/al_chunked.py) reproduces the host
protocol: same acquisitions, same database, same BFGS hyperparameters,
same state — with the stepping between acquisitions compiled."""

import numpy as np
import pytest

from gapflow_tpu import Problem


def _sim(tmp_path, tag, atol, al, max_steps=2):
    return f"""
options:
    output: {tmp_path}/{tag}
    write_freq: 1000
    use_tstamp: False
    silent: True
grid:
    Lx: 1470.
    Ly: 1.
    Nx: 100
    Ny: 1
    xE: ['D', 'N', 'N']
    xW: ['D', 'N', 'N']
    xE_D: 0.8
    xW_D: 0.8
geometry:
    type: parabolic
    hmin: 12.
    hmax: 60.
    U: 0.12
    V: 0.
numerics:
    CFL: 0.5
    adaptive: 0
    tol: 1e-8
    dt: 0.02
    max_it: 5_000
properties:
    shear: 2.15
    bulk: 0.
    EOS: BWR
    T: 1.0
    rho0: 0.8
gp:
    press:
        fix_noise: True
        atol: {atol}
        rtol: 0.
        obs_stddev: 2.e-2
        max_steps: {max_steps}
        active_learning: {al}
    shear:
        fix_noise: True
        atol: {atol}
        rtol: 0.
        obs_stddev: 4.e-3
        max_steps: {max_steps}
        active_learning: {al}
db:
    init_size: 4
    init_method: lhc
    dtool_path: {tmp_path}/train_{tag}
"""


def test_chunked_matches_host_protocol_with_al(tmp_path):
    """Tight tolerance: both paths acquire; database, hyperparameters,
    pauses and state must agree."""
    n = 6

    p_host = Problem.from_string(_sim(tmp_path, "host", 1.e-3, "True"))
    p_host._pre_run()
    p_chun = Problem.from_string(_sim(tmp_path, "chun", 1.e-3, "True"))
    p_chun._pre_run()

    size0 = p_host.database.size
    assert p_chun.database.size == size0
    np.testing.assert_allclose(np.asarray(p_chun.database.Xtrain),
                               np.asarray(p_host.database.Xtrain),
                               rtol=1e-12)

    for _ in range(n):
        p_host.update()
    n_acq = p_chun.run_steps_gp_chunked(n)

    # identical acquisition decisions
    assert n_acq > 0
    assert p_chun.database.size == p_host.database.size == size0 + n_acq
    np.testing.assert_allclose(np.asarray(p_chun.database._Xtrain),
                               np.asarray(p_host.database._Xtrain),
                               rtol=1e-6, atol=1e-12)

    # identical BFGS refits (same data, same start, same optimizer)
    for mh, mc in ((p_host.pressure, p_chun.pressure),
                   (p_host.wall_stress_xz, p_chun.wall_stress_xz)):
        for kk in mh.params:
            np.testing.assert_allclose(np.asarray(mc.params[kk]),
                                       np.asarray(mh.params[kk]),
                                       rtol=1e-5, atol=1e-8)
        assert mc._pause == mh._pause

    assert p_chun.step == p_host.step == n
    np.testing.assert_allclose(p_chun.q, p_host.q, rtol=1e-6, atol=1e-10)


def test_chunked_no_al_matches_fused(tmp_path):
    """Loose tolerance: no acquisitions; the chunked run degenerates to
    pure compiled stepping and matches the host fused path."""
    n = 3

    p_host = Problem.from_string(_sim(tmp_path, "host2", 1.5, "False"))
    p_host._pre_run()
    p_chun = Problem.from_string(_sim(tmp_path, "chun2", 1.5, "False"))
    p_chun._pre_run()

    for _ in range(n):
        p_host.update()
    n_acq = p_chun.run_steps_gp_chunked(n)

    assert n_acq == 0
    assert p_chun.database.size == p_host.database.size
    assert p_chun.step == p_host.step == n
    np.testing.assert_allclose(p_chun.q, p_host.q, rtol=1e-9, atol=1e-11)


def test_chunked_pause_budget(tmp_path):
    """max_steps=1 with an unreachably tight tolerance: the budget runs
    out, the surrogate pauses for pause_steps, and stepping continues —
    same as the host 'missed uncertainty threshold' branch."""
    n = 4

    p_host = Problem.from_string(_sim(tmp_path, "host3", 1.e-9, "True",
                                      max_steps=1))
    p_host._pre_run()
    p_chun = Problem.from_string(_sim(tmp_path, "chun3", 1.e-9, "True",
                                      max_steps=1))
    p_chun._pre_run()

    for _ in range(n):
        p_host.update()
    n_acq = p_chun.run_steps_gp_chunked(n)

    assert p_chun.database.size == p_host.database.size
    assert n_acq == p_host.database.size - 4
    assert p_chun.pressure._pause == p_host.pressure._pause
    assert p_chun.wall_stress_xz._pause == p_host.wall_stress_xz._pause
    np.testing.assert_allclose(p_chun.q, p_host.q, rtol=1e-6, atol=1e-10)


def _sim_elastic(tmp_path, tag, atol, al):
    return _sim(tmp_path, tag, atol, al).replace(
        "    rho0: 0.8",
        """    rho0: 0.8
    elastic:
        E: 100.
        v: 0.3
        alpha_underrelax: 1e-02""")


@pytest.mark.filterwarnings("ignore:Semi-periodic 1D problem")
def test_chunked_elastic_matches_host_protocol(tmp_path):
    """Multiscale EHL: GP closures + per-step elastic deformation in the
    compiled advance equal the host update() trajectory step-for-step
    (deformation state included)."""
    n = 6

    p_host = Problem.from_string(_sim_elastic(tmp_path, "ehost", 1.e-3,
                                              "True"))
    p_host._pre_run()
    p_chun = Problem.from_string(_sim_elastic(tmp_path, "echun", 1.e-3,
                                              "True"))
    p_chun._pre_run()
    assert p_chun.topo.elastic

    for _ in range(n):
        p_host.update()
    n_acq = p_chun.run_steps_gp_chunked(n)

    assert p_chun.database.size == p_host.database.size
    assert p_chun.step == p_host.step == n
    np.testing.assert_allclose(p_chun.q, p_host.q, rtol=1e-6, atol=1e-10)
    # the carried deformation state must match the host ElasticDeformation;
    # the deformation is ~3e-7 in magnitude while the padded-device vs
    # dense-host GP evaluation carries ~1e-9 fp noise (same absolute scale
    # as in q), so the bound is absolute, not relative
    np.testing.assert_allclose(
        np.asarray(p_chun.topo.ElasticDeformation.u_prev),
        np.asarray(p_host.topo.ElasticDeformation.u_prev),
        rtol=1e-6, atol=5e-9)
    np.testing.assert_allclose(np.asarray(p_chun.topo.full),
                               np.asarray(p_host.topo.full),
                               rtol=1e-6, atol=5e-9)
    assert n_acq >= 0


def test_gp_fast_matches_host_frozen(tmp_path):
    """run_steps_gp_fast (frozen surrogates, whole-run compiled loops)
    equals the host update() trajectory when active learning is off."""
    n = 6

    p_host = Problem.from_string(_sim(tmp_path, "fhost", 1.e-3, "False"))
    p_host._pre_run()
    p_fast = Problem.from_string(_sim(tmp_path, "ffast", 1.e-3, "False"))
    p_fast._pre_run()

    for _ in range(n):
        p_host.update()
    p_fast.run_steps_gp_fast(n)

    assert p_fast.step == p_host.step == n
    np.testing.assert_allclose(p_fast.q, p_host.q, rtol=1e-8, atol=1e-12)
    # the host loop leaves the pressure field at the pass-2 evaluation of
    # the last step's INTERMEDIATE state; the fast path refreshes it at
    # the final averaged q — equal to O(dt * residual), not bitwise
    np.testing.assert_allclose(
        np.asarray(p_fast.fc.get_real_field("pressure").p),
        np.asarray(p_host.fc.get_real_field("pressure").p),
        rtol=1e-6)


def test_gp_fast_vmem_loop_matches_host(tmp_path):
    """The whole-run-in-VMEM branch of run_steps_gp_fast (forced, in
    interpret mode; on TPU the gate selects it automatically) equals the
    host trajectory like the scan branch does — f32 comparison since the
    kernel runs f32."""
    from jax.experimental.pallas import tpu as pltpu

    n = 4
    # the GP kernel needs lane-aligned widths and fully periodic edges;
    # use a 2D periodic journal config instead of the 1D slider
    cfgstr = f"""
options:
    output: {tmp_path}/vfast
    write_freq: 1000
    use_tstamp: False
    silent: True
grid:
    dx: 2.e-5
    dy: 2.e-5
    Nx: 16
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
    max_it: 100
properties:
    shear: 0.0794
    bulk: 0.
    EOS: DH
    P0: 101325.
    rho0: 877.7007
    C1: 3.5e10
    C2: 1.23
gp:
    press:
        fix_noise: True
        atol: 1.
        rtol: 0.1
        obs_stddev: 100.
        max_steps: 2
        active_learning: False
db:
    init_size: 4
    init_method: sobol
    init_width: 1.e-4
    dtool_path: {tmp_path}/train_v
"""
    p_host = Problem.from_string(cfgstr)
    p_host._pre_run()
    p_fast = Problem.from_string(cfgstr.replace("/vfast", "/vfast2")
                                 .replace("train_v", "train_v2"))
    p_fast._pre_run()

    for _ in range(n):
        p_host.update()
    with pltpu.force_tpu_interpret_mode():
        p_fast.run_steps_gp_fast(n, use_vmem_loop=True)

    assert p_fast.step == p_host.step == n
    np.testing.assert_allclose(p_fast.q, p_host.q, rtol=2e-5, atol=1e-7)


@pytest.mark.filterwarnings("ignore:Semi-periodic 1D problem")
def test_gp_fast_elastic_matches_host(tmp_path):
    """run_steps_gp_fast on an ELASTIC problem (fused GP x elastic loop,
    core.ehl.make_gp_ehl_loop, deform_every=1) equals the host update()
    trajectory — deformation state and topography included."""
    n = 6

    p_host = Problem.from_string(_sim_elastic(tmp_path, "gehost", 1.e-3,
                                              "False"))
    p_host._pre_run()
    p_fast = Problem.from_string(_sim_elastic(tmp_path, "gefast", 1.e-3,
                                              "False"))
    p_fast._pre_run()
    assert p_fast.topo.elastic

    for _ in range(n):
        p_host.update()
    p_fast.run_steps_gp_fast(n)

    assert p_fast.step == p_host.step == n
    np.testing.assert_allclose(p_fast.q, p_host.q, rtol=1e-6, atol=1e-10)
    np.testing.assert_allclose(
        np.asarray(p_fast.topo.ElasticDeformation.u_prev),
        np.asarray(p_host.topo.ElasticDeformation.u_prev),
        rtol=1e-6, atol=5e-9)
    np.testing.assert_allclose(np.asarray(p_fast.topo.full),
                               np.asarray(p_host.topo.full),
                               rtol=1e-6, atol=5e-9)


@pytest.mark.filterwarnings("ignore:Semi-periodic 1D problem")
def test_gp_fast_elastic_deform_every(tmp_path):
    """deform_every=K chunks the elastic FFT with the compounded
    relaxation factor 1-(1-alpha)^K: same fixed point; during the
    transient the chunked deformation lags the host's by up to one
    chunk's increment (a few percent of u here, where u still grows by
    ~15% per step)."""
    n = 6

    p_host = Problem.from_string(_sim_elastic(tmp_path, "kehost", 1.e-3,
                                              "False"))
    p_host._pre_run()
    p_fast = Problem.from_string(_sim_elastic(tmp_path, "kefast", 1.e-3,
                                              "False"))
    p_fast._pre_run()

    for _ in range(n):
        p_host.update()
    p_fast.run_steps_gp_fast(n, deform_every=2)

    assert p_fast.step == p_host.step == n
    assert np.all(np.isfinite(p_fast.q))
    np.testing.assert_allclose(p_fast.q, p_host.q, rtol=1e-5, atol=1e-8)
    np.testing.assert_allclose(
        np.asarray(p_fast.topo.ElasticDeformation.u_prev),
        np.asarray(p_host.topo.ElasticDeformation.u_prev),
        rtol=5e-2, atol=1e-9)


def test_gp_ehl_vmem_inner_matches_xla(tmp_path):
    """The K>1 GP x elastic chunk can run the whole-run-in-VMEM GP loop
    kernel between deformation updates (forced, interpret mode; on TPU
    the gate selects it automatically) and equals the XLA inner scan —
    f32 comparison since the kernel runs f32."""
    import jax.numpy as jnp
    from jax.experimental.pallas import tpu as pltpu
    from gapflow_tpu.core.ehl import make_gp_ehl_loop

    cfgstr = f"""
options:
    output: {tmp_path}/gev
    write_freq: 1000
    use_tstamp: False
    silent: True
grid:
    dx: 2.e-5
    dy: 2.e-5
    Nx: 16
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
    dt: 1e-11
    max_it: 100
properties:
    shear: 0.0794
    bulk: 0.
    EOS: DH
    P0: 101325.
    rho0: 877.7007
    C1: 3.5e10
    C2: 1.23
    elastic:
        E: 5e10
        v: 0.3
        alpha_underrelax: 1e-05
gp:
    press:
        fix_noise: True
        atol: 1.
        rtol: 0.1
        obs_stddev: 100.
        max_steps: 2
        active_learning: False
db:
    init_size: 4
    init_method: sobol
    init_width: 1.e-4
    dtool_path: {tmp_path}/train_gev
"""
    p = Problem.from_string(cfgstr)
    p._pre_run()
    gp_state, dims3, use3, caps3, nf, _, _ = p._frozen_gp_state(
        dtype=jnp.float32)
    ed = p.topo.ElasticDeformation

    args = (jnp.asarray(p.q, jnp.float32),
            jnp.zeros_like(jnp.asarray(ed.u_prev, jnp.float32)),
            jnp.asarray(p.topo.full, jnp.float32),
            jnp.asarray(p.dt, jnp.float32),
            jnp.asarray(0, jnp.int32), 4, gp_state)

    loop_x = make_gp_ehl_loop(p, dims3, nf, use3, deform_every=2,
                              dtype=jnp.float32, use_vmem_inner=False)
    q_ref, u_ref = loop_x(*args)

    loop_k = make_gp_ehl_loop(p, dims3, nf, use3, deform_every=2,
                              dtype=jnp.float32, use_vmem_inner=True)
    with pltpu.force_tpu_interpret_mode():
        q_k, u_k = loop_k(*args)

    np.testing.assert_allclose(np.asarray(q_k), np.asarray(q_ref),
                               rtol=2e-5, atol=1e-7)
    scale = max(np.abs(np.asarray(u_ref)).max(), 1e-30)
    assert np.abs(np.asarray(u_k) - np.asarray(u_ref)).max() / scale < 1e-4


def _sim_dn2d(tmp_path, tag, atol, al):
    """Uniform-D/N 2D domain covered by the q-only bc GP kernel
    (nx % 8 == 0, ny % 128 == 0, MC_order != 0)."""
    return f"""
options:
    output: {tmp_path}/{tag}
    write_freq: 1000
    use_tstamp: False
    silent: True
grid:
    Lx: 1470.
    Ly: 1470.
    Nx: 8
    Ny: 128
    xE: ['D', 'N', 'N']
    xW: ['D', 'N', 'N']
    xE_D: 0.8
    xW_D: 0.8
geometry:
    type: parabolic
    hmin: 12.
    hmax: 60.
    U: 0.12
    V: 0.06
numerics:
    CFL: 0.5
    adaptive: 0
    tol: 1e-8
    dt: 0.02
    max_it: 5_000
properties:
    shear: 2.15
    bulk: 0.
    EOS: BWR
    T: 1.0
    rho0: 0.8
gp:
    press:
        fix_noise: True
        atol: {atol}
        rtol: 0.
        obs_stddev: 2.e-2
        max_steps: 2
        active_learning: {al}
    shear:
        fix_noise: True
        atol: {atol}
        rtol: 0.
        obs_stddev: 4.e-3
        max_steps: 2
        active_learning: {al}
db:
    init_size: 4
    init_method: lhc
    dtool_path: {tmp_path}/train_{tag}
"""


def test_chunked_dn_routes_bc_kernel(tmp_path, monkeypatch):
    """Chunked AL on a uniform-D/N domain (the reference's slider-family
    AL workload) advances through the q-only bc GP Pallas kernel —
    host-protocol parity in interpret mode: same acquisitions, same
    database, same trajectory."""
    from jax.experimental.pallas import tpu as pltpu
    from gapflow_tpu.core import al_chunked
    from gapflow_tpu.core.gp_step import make_gp_step_core
    from gapflow_tpu.ops.stencil_gp import gp_bc_kernel_supported

    n = 4

    p_host = Problem.from_string(_sim_dn2d(tmp_path, "dnhost", "1.e-3",
                                           "True"))
    p_host._pre_run()
    assert gp_bc_kernel_supported(
        p_host._solver_cfg, 128,
        ((0, 3), (0, 1, 3), (0, 2, 3)), (True, True, True))
    for _ in range(n):
        p_host.update()

    p_dev = Problem.from_string(_sim_dn2d(tmp_path, "dndev", "1.e-3",
                                          "True"))
    p_dev._pre_run()

    monkeypatch.setenv("GAPFLOW_FORCE_GP_BC_KERNEL", "1")
    al_chunked.make_advance_fn.cache_clear()
    try:
        with pltpu.force_tpu_interpret_mode():
            p_dev.run_steps_gp_chunked(n)
    finally:
        al_chunked.make_advance_fn.cache_clear()

    assert p_dev.step == p_host.step == n
    assert p_dev.database.size == p_host.database.size
    np.testing.assert_allclose(np.asarray(p_dev.database._Xtrain),
                               np.asarray(p_host.database._Xtrain),
                               rtol=1e-12)
    # q to the bc kernel's established fp bound (different but
    # equally-valid evaluation order; test_gp_pallas.py uses the same)
    qr, qk = np.asarray(p_host.q), np.asarray(p_dev.q)
    sc = np.abs(qr).reshape(3, -1).max(1)[:, None, None]
    sc = np.maximum(sc, 1e-6 * sc.max())
    assert np.max(np.abs(qk - qr) / sc) < 5e-5
