"""On-device GP+active-learning run loop (core/al_loop.py).

Covers the two contracts: (1) with acquisition never triggered, the
compiled loop reproduces the fused host GP step exactly (padded buffers
are algebraically equivalent to the dense path); (2) with a tight
tolerance it acquires MD data through io_callback — growing the real
host database (dtool packaging included) — and keeps the state finite.
"""

import numpy as np
import pytest

from gapflow_tpu import Problem


def _sim(tmp_path, tag, atol, al):
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
    init_method: rand
    dtool_path: {tmp_path}/train
"""


def test_device_loop_matches_fused_step_without_al(tmp_path):
    p_host = Problem.from_string(_sim(tmp_path, "host", 1.5, "False"))
    p_host._pre_run()
    p_dev = Problem.from_string(_sim(tmp_path, "dev", 1.5, "False"))
    p_dev._pre_run()
    assert p_host.database.size == p_dev.database.size

    for _ in range(3):
        p_host.update()          # fused host GP step (no AL pending)
    with pytest.warns(UserWarning, match="experimental"):
        n_acq = p_dev.run_steps_gp_device(3, capacity=8)

    assert n_acq == 0
    assert p_dev.step == p_host.step == 3
    np.testing.assert_allclose(p_dev.q, p_host.q, rtol=1e-9, atol=1e-11)


def test_device_loop_acquires_through_io_callback(tmp_path):
    p = Problem.from_string(_sim(tmp_path, "al", 1.e-3, "True"))
    p._pre_run()
    size0 = p.database.size

    with pytest.warns(UserWarning, match="experimental"):
        n_acq = p.run_steps_gp_device(2, capacity=16, refit_steps=10)

    # the tight tolerance forces acquisitions, which run the (mock) MD
    # oracle on the host and append to the real database
    assert n_acq > 0
    assert p.database.size == size0 + n_acq
    assert p.step == 2
    assert np.all(np.isfinite(p.q))
    # surrogates were synced back WITHOUT marking the fit current:
    # acquisitions re-normalized the database scales, so the device-
    # learned hyperparameters live in the frozen normalization and the
    # next host predictor pass must retrain under the current scales
    assert p.pressure.last_fit_train_size == size0

    # the host path can continue seamlessly from the synced state
    p.update()
    assert p.step == 3
    assert np.all(np.isfinite(p.q))
