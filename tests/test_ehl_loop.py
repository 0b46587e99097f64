"""On-device EHL loop vs the host-stepped elastic protocol."""

import numpy as np

from gapflow_tpu import Problem
from gapflow_tpu.core.ehl import make_ehl_loop


sim = """
options:
    output: data/ehl_loop
    write_freq: 1000
    silent: True
grid:
    dx: 1.e-5
    dy: 1.
    Nx: 100
    Ny: 1
geometry:
    type: journal
    CR: 1.e-2
    eps: 0.7
    U: 0.1
    V: 0.
numerics:
    CFL: 0.25
    adaptive: 0
    tol: 1e-8
    dt: 5e-11
    max_it: 100000
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
        alpha_underrelax: 1e-04
"""


def test_ehl_loop_matches_host():
    n = 60

    # host path (reference protocol: deformation from pass-2 pressure)
    p_host = Problem.from_string(sim)
    p_host._pre_run()
    for _ in range(n):
        p_host.update()

    # on-device loop (deformation from end-of-step pressure)
    p_dev = Problem.from_string(sim)
    p_dev._pre_run()
    loop = make_ehl_loop(p_dev, use_pallas=False)
    u0 = np.zeros_like(p_dev.topo.deformation)
    q, u = loop(p_dev.q, u0, p_dev.dt, n)

    q = np.asarray(q)
    u = np.asarray(u)

    # q agrees closely (the ordering difference is O(dt) per step)
    np.testing.assert_allclose(q, p_host.q, rtol=1e-6)
    # deformation agrees to a fraction of its magnitude
    u_host = np.asarray(p_host.topo.ElasticDeformation.u_prev)
    scale = max(np.abs(u_host).max(), 1e-30)
    assert np.abs(u - u_host).max() / scale < 0.05


def test_ehl_loop_steady_state_consistency():
    """Run the on-device loop much longer: deformation relaxes smoothly
    (monotone growth of the deformation magnitude toward the fixed point)."""
    p_dev = Problem.from_string(sim)
    p_dev._pre_run()
    loop = make_ehl_loop(p_dev, use_pallas=False)
    u0 = np.zeros_like(p_dev.topo.deformation)

    q, u1 = loop(p_dev.q, u0, p_dev.dt, 50)
    q, u2 = loop(q, u1, p_dev.dt, 50)

    assert np.all(np.isfinite(np.asarray(q)))
    m1 = np.abs(np.asarray(u1)).max()
    m2 = np.abs(np.asarray(u2)).max()
    assert m2 > m1 > 0.


def test_ehl_loop_deform_every_same_fixed_point():
    """K-chunked deformation updates track the per-step protocol closely
    (compounded relaxation factor, same fixed point)."""
    p1 = Problem.from_string(sim)
    p1._pre_run()
    loop1 = make_ehl_loop(p1, use_pallas=False, deform_every=1)
    u0 = np.zeros_like(p1.topo.deformation)
    q1, u1 = loop1(p1.q, u0, p1.dt, 200)

    p5 = Problem.from_string(sim)
    p5._pre_run()
    loop5 = make_ehl_loop(p5, use_pallas=False, deform_every=5)
    q5, u5 = loop5(p5.q, u0, p5.dt, 200)

    np.testing.assert_allclose(np.asarray(q5), np.asarray(q1), rtol=1e-5)
    # the chunked deformation lags by up to K-1 fluid steps during the
    # transient (~K/n relative); both converge to the same fixed point
    scale = max(np.abs(np.asarray(u1)).max(), 1e-30)
    assert np.abs(np.asarray(u5) - np.asarray(u1)).max() / scale < 0.06
