"""2D GP-surrogate run: both wall-stress GPs (xz and yz) active."""

import numpy as np

from gapflow_tpu import Problem


def test_2d_gp_smoke(tmp_path):
    sim = f"""
options:
    output: {tmp_path}
    write_freq: 100
    use_tstamp: False
    silent: True
grid:
    Lx: 1470.
    Ly: 1470.
    Nx: 16
    Ny: 16
geometry:
    type: inclined
    hmin: 12.
    hmax: 30.
    U: 0.12
    V: 0.05
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
    init_method: sobol
    dtool_path: {tmp_path}/train
"""
    problem = Problem.from_string(sim)
    problem._pre_run()

    # in 2D both wall-stress directions run GP surrogates
    assert problem.wall_stress_xz.is_gp_model
    assert problem.wall_stress_yz.is_gp_model
    assert problem.pressure.is_gp_model

    for _ in range(3):
        problem.update()

    assert problem.step == 3
    assert problem.q_is_valid
    assert np.all(np.isfinite(problem.pressure.pressure))
    # the yz model writes its own components (3 bottom, 9 top)
    assert np.any(problem.wall_stress_yz.full[3] != 0.)
    assert np.all(np.isfinite(problem.wall_stress_yz.variance))
