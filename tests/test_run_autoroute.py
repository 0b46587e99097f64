"""Plain ``Problem.run()`` auto-routes silent fixed-dt MULTISCALE runs
(GP surrogates, elastic, both) onto the whole-run device paths — and the
trajectory equals the host per-step ``update()`` loop (the reference
protocol, GaPFlow/problem.py:368-410).  The taken route is recorded in
``Problem._device_route`` for observability.
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
    CFL: 0.5
    adaptive: 0
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


def _det_elastic_sim(tmp_path, max_it=6):
    return f"""
options:
    output: {tmp_path}/ehl
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
    adaptive: 0
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


def test_run_routes_frozen_gp_to_device(tmp_path):
    """A silent frozen-GP config through plain run() takes the fused
    device path and matches the host update() loop."""
    n = 6

    p_host = Problem.from_string(_gp_sim(tmp_path, "fhost", "False"))
    p_host._pre_run()
    for _ in range(n):
        p_host.update()

    p_dev = Problem.from_string(_gp_sim(tmp_path, "fdev", "False"))
    p_dev.run()

    assert p_dev._device_route == "gp_fast"
    assert p_dev.step == p_host.step == n
    np.testing.assert_allclose(p_dev.q, p_host.q, rtol=1e-8, atol=1e-12)


def test_run_routes_al_gp_to_chunked(tmp_path):
    """A silent ACTIVE-LEARNING config through plain run() takes the
    chunked host-protocol path: same acquisitions, same database, same
    trajectory as the host loop."""
    n = 6

    p_host = Problem.from_string(_gp_sim(tmp_path, "ahost", "True"))
    p_host._pre_run()
    size0 = p_host.database.size
    for _ in range(n):
        p_host.update()

    p_dev = Problem.from_string(_gp_sim(tmp_path, "adev", "True"))
    p_dev.run()

    assert p_dev._device_route == "gp_chunked"
    assert p_dev.step == p_host.step == n
    assert p_dev.database.size == p_host.database.size > size0
    np.testing.assert_allclose(np.asarray(p_dev.database._Xtrain),
                               np.asarray(p_host.database._Xtrain),
                               rtol=1e-12)
    np.testing.assert_allclose(p_dev.q, p_host.q, rtol=1e-6, atol=1e-10)


def test_run_routes_gp_elastic_to_device(tmp_path):
    """GP x elastic through plain run(): the fused GP-EHL loop, equal to
    the host loop including the deformation state."""
    n = 6

    p_host = Problem.from_string(_gp_sim(tmp_path, "gehost", "False",
                                         elastic=True))
    p_host._pre_run()
    for _ in range(n):
        p_host.update()

    p_dev = Problem.from_string(_gp_sim(tmp_path, "gedev", "False",
                                        elastic=True))
    p_dev.run()

    assert p_dev._device_route == "gp_fast"
    assert p_dev.step == p_host.step == n
    np.testing.assert_allclose(p_dev.q, p_host.q, rtol=1e-6, atol=1e-10)
    np.testing.assert_allclose(
        np.asarray(p_dev.topo.ElasticDeformation.u_prev),
        np.asarray(p_host.topo.ElasticDeformation.u_prev),
        rtol=1e-6, atol=5e-9)


def test_run_routes_det_elastic_to_device(tmp_path):
    """Deterministic EHL through plain run(): the pass-2 fused loop,
    host-trajectory exact (deformation protocol included)."""
    n = 6

    p_host = Problem.from_string(_det_elastic_sim(tmp_path))
    p_host._pre_run()
    for _ in range(n):
        p_host.update()

    p_dev = Problem.from_string(_det_elastic_sim(tmp_path).replace(
        "/ehl", "/ehl2"))
    p_dev.run()

    assert p_dev._device_route == "ehl_pass2"
    assert p_dev.step == p_host.step == n
    np.testing.assert_allclose(p_dev.q, p_host.q, rtol=1e-10, atol=1e-14)
    u_ref = np.asarray(p_host.topo.ElasticDeformation.u_prev)
    u_dev = np.asarray(p_dev.topo.ElasticDeformation.u_prev)
    scale = max(np.abs(u_ref).max(), 1e-30)
    assert np.abs(u_dev - u_ref).max() / scale < 1e-8
    np.testing.assert_allclose(np.asarray(p_dev.topo.full),
                               np.asarray(p_host.topo.full),
                               rtol=1e-8, atol=1e-12)
