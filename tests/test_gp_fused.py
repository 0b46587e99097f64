"""Fused one-dispatch GP step equals the host-orchestrated GP step."""

import numpy as np

from gapflow_tpu import Problem


def _sim(tmp_path, tag):
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
    adaptive: 1
    tol: 1e-8
    dt: 0.05
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
        atol: 1.5
        rtol: 0.
        obs_stddev: 2.e-2
        max_steps: 3
        active_learning: False
    shear:
        fix_noise: True
        atol: 1.5
        rtol: 0.
        obs_stddev: 4.e-3
        max_steps: 3
        active_learning: False
db:
    init_size: 4
    init_method: rand
    dtool_path: {tmp_path}/train
"""


def test_fused_gp_step_matches_host(tmp_path):
    p_host = Problem.from_string(_sim(tmp_path, "host"))
    p_host._pre_run()
    # identical training data: second problem adopts the same datasets
    p_fused = Problem.from_string(_sim(tmp_path, "fused"))
    p_fused._pre_run()

    assert p_host.database.size == p_fused.database.size

    # force the host path on one problem
    p_host._gp_fused_eligible = lambda *_: False

    assert p_fused._gp_fused_eligible(False)

    for _ in range(3):
        p_host.update()
        p_fused.update()

    assert p_fused.step == p_host.step
    np.testing.assert_allclose(p_fused.q, p_host.q, rtol=1e-10, atol=1e-12)
    np.testing.assert_allclose(np.asarray(p_fused.pressure.pressure),
                               np.asarray(p_host.pressure.pressure),
                               rtol=1e-10, atol=1e-12)
