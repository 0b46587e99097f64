"""Database initialization, growth, and on-disk persistence round-trip.

Mirrors reference tests/test_database.py:31-64.
"""

import numpy as np
import pytest

from gapflow_tpu import Database
from gapflow_tpu.md import Mock


@pytest.mark.parametrize("method", ["rand", "lhc", "sobol"])
def test_addition(tmp_path, method):
    db_config = {"init_size": 4, "init_width": 0.01, "init_method": method,
                 "init_seed": 42, "dtool_path": str(tmp_path)}
    geo = {"U": 1., "V": 0.}
    prop = {"shear": 1., "bulk": 0., "EOS": "PL",
            "rho0": 1.1853, "P0": 101325., "alpha": 0.}
    gp = {"press_gp": False, "shear_gp": False}

    md = Mock(prop, geo, gp)
    db = Database(md, db_config, num_extra_features=1)

    Xtest = np.random.uniform(size=(100, 7))
    db.initialize(Xtest)
    assert db.size == db_config["init_size"]

    Xnew = np.random.uniform(size=(10, 7))
    db.add_data(Xnew)
    assert db.size == 14

    # a fresh Database adopts every frozen dataset in the training path
    new_db = Database(md, db_config, num_extra_features=1)
    assert new_db.size == 14

    np.testing.assert_allclose(np.sort(np.asarray(new_db._Xtrain), axis=0),
                               np.sort(np.asarray(db._Xtrain), axis=0))
