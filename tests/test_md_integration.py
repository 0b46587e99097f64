"""End-to-end multiscale path: Database -> LennardJones -> native engine.

Adds training points by actually running the bundled C++ MD engine on
tiny settings, packages each run as a FAIR dataset, parses stress_wall.dat
into the 13-entry observation vector, and reloads the datasets into a new
Database.
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


def test_database_with_native_md(tmp_path):
    from gapflow_tpu.db import Database
    from gapflow_tpu.md import LennardJones

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

    md_params = {
        "system": "lj",
        "ncpu": 1,
        "infile": os.path.join(repo, "examples", "lmp", "lj", "in.run"),
        "wallfile": os.path.join(repo, "examples", "lmp", "lj", "wall.data"),
        # tiny stage lengths for CI speed
        "tinit": 200,
        "ttherm": 200,
        "tsample": 500,
        "Nevery": 10,
    }
    md = LennardJones(md_params)

    db_config = {"init_size": 2, "init_width": 0.01, "init_method": "lhc",
                 "init_seed": 1, "dtool_path": str(tmp_path)}
    db = Database(md, db_config, num_extra_features=1)

    # features: rho, jx, jy, h, hx, hy, Ls
    Xtest = np.column_stack([
        np.full(16, 0.6), np.full(16, 0.03), np.zeros(16),
        np.full(16, 8.0), np.zeros(16), np.zeros(16), np.zeros(16),
    ])
    db.initialize(Xtest, dim=1)

    assert db.size == 2
    Y = np.asarray(db._Ytrain)
    assert Y.shape == (2, 13)
    assert np.all(np.isfinite(Y))
    # wall shear stresses were sampled (nonzero response)
    assert np.abs(Y[:, [5, 11]]).max() > 0.

    # persistence round trip through the dataset layer
    db2 = Database(md, db_config, num_extra_features=1)
    assert db2.size == 2
    np.testing.assert_allclose(np.asarray(db2._Ytrain), Y)


def test_parallel_run_single_output(tmp_path):
    """ncpu=2 runs ONE simulation (OpenMP threads), not N racing copies.

    Guards the reference-divergence fixed in md/runner.py: the reference's
    run_parallel forms one MPI world; a naive port spawned N full duplicate
    runs writing concurrently to the same stress_wall.dat.
    """
    import glob

    from gapflow_tpu.md import LennardJones

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    md = LennardJones({
        "system": "lj",
        "ncpu": 2,
        "infile": os.path.join(repo, "examples", "lmp", "lj", "in.run"),
        "wallfile": os.path.join(repo, "examples", "lmp", "lj", "wall.data"),
        "tinit": 200, "ttherm": 200, "tsample": 400, "Nevery": 10,
    })
    md.dtool_basepath = str(tmp_path)
    assert md.num_worker == 2

    X = np.array([0.6, 0.03, 0.0, 8.0, 0.0, 0.0, 0.0])
    Y, Ye = md.run(X, 1)
    assert np.all(np.isfinite(Y)) and np.all(np.isfinite(Ye))

    # exactly one dataset with exactly one stress_wall.dat
    datasets = [p for p in os.scandir(tmp_path) if p.is_dir()]
    assert len(datasets) == 1
    walls = glob.glob(os.path.join(datasets[0].path, "data",
                                   "**", "stress_wall.dat"), recursive=True)
    assert len(walls) == 1

    # the sampling stage wrote every expected row exactly once (no
    # interleaved duplicate writers): monotone unique timesteps
    rows = np.loadtxt(walls[0], comments="#")
    steps = rows[:, 0]
    assert steps.size == np.unique(steps).size
    assert np.all(np.diff(steps) > 0)
