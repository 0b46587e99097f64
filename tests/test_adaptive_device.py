"""Adaptive-dt multiscale runs on the DEVICE paths.

The reference adapts dt every step while running GP and/or elastic
physics (GaPFlow/problem.py:435-440,571-586).  These tests pin the
device loops' dt carry — ``dt = CFL * dmin / (v_max + v_sound)``
refreshed per step inside the compiled program, with the GP sound speed
autodiffed from the surrogate mean — against the host per-step
``update()`` loop: same trajectory, same dt sequence, same simulated
time.  Routing: ``run()`` now sends adaptive frozen-GP / EHL configs to
the device paths; adaptive ACTIVE-LEARNING runs stay on the host
protocol loop.
"""

import numpy as np

from gapflow_tpu import Problem


def _gp_sim(tmp_path, tag, al, elastic=False, max_it=6):
    el = """
    elastic:
        E: 100.
        v: 0.3
        alpha_underrelax: 1e-02""" if elastic else ""
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
    CFL: 0.4
    adaptive: 1
    tol: 1e-30
    dt: 0.02
    max_it: {max_it}
properties:
    shear: 2.15
    bulk: 0.
    EOS: BWR
    T: 1.0
    rho0: 0.8{el}
gp:
    press:
        fix_noise: True
        atol: 1.e-3
        rtol: 0.
        obs_stddev: 2.e-2
        max_steps: 2
        active_learning: {al}
    shear:
        fix_noise: True
        atol: 1.e-3
        rtol: 0.
        obs_stddev: 4.e-3
        max_steps: 2
        active_learning: {al}
db:
    init_size: 4
    init_method: lhc
    dtool_path: {tmp_path}/train_{tag}
"""


def _det_elastic_sim(tmp_path, tag, max_it=6):
    return f"""
options:
    output: {tmp_path}/{tag}
    write_freq: 1000
    use_tstamp: False
    silent: True
grid:
    dx: 2.e-5
    dy: 2.e-5
    Nx: 32
    Ny: 16
geometry:
    type: journal
    CR: 1.e-2
    eps: 0.7
    U: 0.1
    V: 0.05
numerics:
    CFL: 0.25
    adaptive: 1
    tol: 1e-30
    dt: 5e-11
    max_it: {max_it}
properties:
    shear: 0.0794
    bulk: 0.
    EOS: DH
    P0: 101325.
    rho0: 877.7007
    C1: 3.5e10
    C2: 1.23
    elastic:
        E: 5e09
        v: 0.3
        alpha_underrelax: 1e-03
"""


def _host_run(sim, n):
    p = Problem.from_string(sim)
    p._pre_run()
    for _ in range(n):
        p.update()
    return p


def test_adaptive_frozen_gp_matches_host(tmp_path):
    """Adaptive frozen-GP config: run() routes to the device loop with
    the dt carry; trajectory, dt sequence endpoint and simtime match the
    host per-step loop."""
    n = 6
    p_host = _host_run(_gp_sim(tmp_path, "fahost", "False"), n)

    p_dev = Problem.from_string(_gp_sim(tmp_path, "fadev", "False"))
    p_dev.run()

    assert p_dev._device_route == "gp_fast"
    assert p_dev.step == p_host.step == n
    np.testing.assert_allclose(p_dev.q, p_host.q, rtol=1e-8, atol=1e-12)
    np.testing.assert_allclose(p_dev.dt, p_host.dt, rtol=1e-8)
    np.testing.assert_allclose(p_dev.simtime, p_host.simtime, rtol=1e-8)


def test_adaptive_gp_elastic_matches_host(tmp_path):
    """Adaptive GP x elastic: the fused GP-EHL loop carries dt and
    refreshes it from the post-deformation topography (host
    sequencing)."""
    n = 6
    p_host = _host_run(_gp_sim(tmp_path, "gahost", "False", elastic=True),
                       n)

    p_dev = Problem.from_string(_gp_sim(tmp_path, "gadev", "False",
                                        elastic=True))
    p_dev.run()

    assert p_dev._device_route == "gp_fast"
    assert p_dev.step == p_host.step == n
    np.testing.assert_allclose(p_dev.q, p_host.q, rtol=1e-6, atol=1e-10)
    np.testing.assert_allclose(p_dev.dt, p_host.dt, rtol=1e-6)
    np.testing.assert_allclose(p_dev.simtime, p_host.simtime, rtol=1e-6)
    np.testing.assert_allclose(
        np.asarray(p_dev.topo.ElasticDeformation.u_prev),
        np.asarray(p_host.topo.ElasticDeformation.u_prev),
        rtol=1e-6, atol=5e-9)


def test_adaptive_det_elastic_matches_host(tmp_path):
    """Adaptive deterministic EHL: the pass-2 fused loop with the dt
    carry (EOS sound speed), host-trajectory exact."""
    n = 6
    p_host = _host_run(_det_elastic_sim(tmp_path, "dahost"), n)

    p_dev = Problem.from_string(_det_elastic_sim(tmp_path, "dadev"))
    p_dev.run()

    assert p_dev._device_route == "ehl_pass2"
    assert p_dev.step == p_host.step == n
    np.testing.assert_allclose(p_dev.q, p_host.q, rtol=1e-10, atol=1e-14)
    np.testing.assert_allclose(p_dev.dt, p_host.dt, rtol=1e-10)
    np.testing.assert_allclose(p_dev.simtime, p_host.simtime, rtol=1e-10)
    np.testing.assert_allclose(np.asarray(p_dev.topo.full),
                               np.asarray(p_host.topo.full),
                               rtol=1e-8, atol=1e-12)


def test_adaptive_ehl_run_steps_delegates(tmp_path):
    """run_steps_ehl on an adaptive problem no longer raises: it takes
    the host-exact pass-2 adaptive loop."""
    n = 4
    p_host = _host_run(_det_elastic_sim(tmp_path, "rshost"), n)

    p = Problem.from_string(_det_elastic_sim(tmp_path, "rsdev"))
    p._pre_run()
    p.run_steps_ehl(n)
    assert p.step == n
    np.testing.assert_allclose(p.q, p_host.q, rtol=1e-10, atol=1e-14)
    np.testing.assert_allclose(p.dt, p_host.dt, rtol=1e-10)


def test_adaptive_al_routes_to_host_loop(tmp_path):
    """Adaptive + active learning: run() keeps the per-step host
    protocol loop (no device route recorded)."""
    p = Problem.from_string(_gp_sim(tmp_path, "alad", "True", max_it=3))
    p.run()
    assert not hasattr(p, "_device_route")
    assert p.step == 3
    assert np.all(np.isfinite(np.asarray(p.q)))


def test_adaptive_run_steps_fast_delegates(tmp_path):
    """run_steps_fast on an adaptive problem no longer raises: it takes
    the fused state scan with the per-step dt refresh (host-exact)."""
    det = _det_elastic_sim(tmp_path, "dfhost").replace("""
    elastic:
        E: 5e09
        v: 0.3
        alpha_underrelax: 1e-03""", "")
    n = 4

    p_host = Problem.from_string(det)
    p_host._pre_run()
    for _ in range(n):
        p_host.update()

    p = Problem.from_string(det.replace("/dfhost", "/dfdev"))
    p._pre_run()
    p.run_steps_fast(n)
    assert p.step == n
    np.testing.assert_allclose(p.q, p_host.q, rtol=1e-10, atol=1e-14)
    np.testing.assert_allclose(p.dt, p_host.dt, rtol=1e-10)
