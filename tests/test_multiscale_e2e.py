"""Full multiscale loop: continuum solver + GP surrogates + native MD.

The EOS is entirely data-driven ('MD'): pressure and wall shear come from
GP surrogates trained on confined-LJ runs of the bundled engine.
"""

import os
import shutil

import numpy as np
import pytest


def _engine_available():
    if shutil.which("g++") is None or shutil.which("make") is None:
        return False
    try:
        from gapflow_tpu.md._engine import _load_library
        _load_library()
        return True
    except Exception:
        return False


pytestmark = pytest.mark.skipif(not _engine_available(),
                                reason="native engine unavailable")


def test_problem_with_native_md_oracle(tmp_path):
    from gapflow_tpu import Problem

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    infile = os.path.join(repo, "examples", "lmp", "lj", "in.run")
    wallfile = os.path.join(repo, "examples", "lmp", "lj", "wall.data")

    sim = f"""
options:
    output: {tmp_path}/out
    write_freq: 100
    use_tstamp: False
    silent: True
grid:
    Lx: 1470.
    Ly: 1.
    Nx: 50
    Ny: 1
    xE: ['D', 'N', 'N']
    xW: ['D', 'N', 'N']
    xE_D: 0.6
    xW_D: 0.6
geometry:
    type: parabolic
    hmin: 8.
    hmax: 12.
    U: 0.12
    V: 0.
numerics:
    CFL: 0.5
    adaptive: 0   # adaptive dt uses the GP sound speed, which is
                  # near-degenerate with only 2 training points (dt would
                  # explode); this test validates the multiscale wiring
    tol: 1e-8
    dt: 0.05
    max_it: 5_000
properties:
    shear: 0.
    bulk: 0.
    EOS: MD
    rho0: 0.6
gp:
    press:
        fix_noise: True
        atol: 10.
        rtol: 1.
        obs_stddev: 0.05
        max_steps: 2
        active_learning: False
    shear:
        fix_noise: True
        atol: 10.
        rtol: 1.
        obs_stddev: 0.05
        max_steps: 2
        active_learning: False
db:
    init_size: 2
    init_method: lhc
    init_width: 0.05
    dtool_path: {tmp_path}/train
md:
    system: lj
    ncpu: 1
    infile: {infile}
    wallfile: {wallfile}
    tinit: 200
    ttherm: 200
    tsample: 600
    Nevery: 10
"""
    problem = Problem.from_string(sim)
    problem._pre_run()

    # both surrogates trained on real MD observations
    assert problem.database.size == 2
    assert not problem.database.has_mock_md
    # real-MD runs force zero analytic viscosities (reference behavior)
    assert problem.prop["shear"] == 0.

    for _ in range(2):
        problem.update()

    assert problem.step == 2
    assert problem.q_is_valid
    assert np.all(np.isfinite(np.asarray(problem.pressure.pressure)))
    # GP wall shear drives the momentum source
    assert np.any(problem.wall_stress_xz.full[4] != 0.)
