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
    np.testing.assert_allclose(np.sort(np.asarray(new_db._Ytrain), axis=0),
                               np.sort(np.asarray(db._Ytrain), axis=0))
    np.testing.assert_allclose(np.asarray(new_db.X_scale),
                               np.asarray(db.X_scale))


def _make_db(tmp_path, init_size=2):
    db_config = {"init_size": init_size, "init_width": 0.01,
                 "init_method": "lhc", "init_seed": 7,
                 "dtool_path": str(tmp_path)}
    geo = {"U": 1., "V": 0.}
    prop = {"shear": 1., "bulk": 0., "EOS": "PL",
            "rho0": 1.1853, "P0": 101325., "alpha": 0.}
    gp = {"press_gp": False, "shear_gp": False}
    md = Mock(prop, geo, gp)
    return Database(md, db_config, num_extra_features=1), md


def test_remote_readme_list(tmp_path):
    """get_readme_list_remote against a local mock of the dserver API.

    Mirrors the reference's dtool_lookup_api path (GaPFlow/db.py:212-235):
    POST /lookup-datasets returns dataset URIs; READMEs load through the
    file:// dataset layer or plain HTTP.
    """
    import json
    import os
    import threading
    from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

    db, md = _make_db(tmp_path)
    Xtest = np.random.default_rng(0).uniform(size=(50, 7))
    db.initialize(Xtest)
    assert db.size == 2

    ds_paths = sorted(p.path for p in os.scandir(tmp_path) if p.is_dir())
    assert len(ds_paths) == 2
    seen = {}

    class Handler(BaseHTTPRequestHandler):
        def log_message(self, *a):
            pass

        def do_POST(self):
            assert self.path == "/lookup-datasets"
            seen["query"] = json.loads(
                self.rfile.read(int(self.headers["Content-Length"])))
            seen["auth"] = self.headers.get("Authorization")
            # one dataset via file://, one via HTTP README fetch
            body = json.dumps([
                {"uri": "file://" + ds_paths[0]},
                {"uri": f"http://127.0.0.1:{port}/ds1"},
            ]).encode()
            self.send_response(200)
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def do_GET(self):
            assert self.path == "/ds1/README.yml"
            with open(os.path.join(ds_paths[1], "README.yml"), "rb") as fh:
                body = fh.read()
            self.send_response(200)
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

    srv = ThreadingHTTPServer(("127.0.0.1", 0), Handler)
    port = srv.server_address[1]
    thread = threading.Thread(target=srv.serve_forever, daemon=True)
    thread.start()
    try:
        readmes = db.get_readme_list_remote(
            query={"readme.parameters.system": "Mock"},
            lookup_url=f"http://127.0.0.1:{port}", token="secret")
    finally:
        srv.shutdown()
        thread.join()

    assert seen["query"] == {"readme.parameters.system": "Mock"}
    assert seen["auth"] == "Bearer secret"
    assert len(readmes) == 2
    got = np.sort(np.array([rm["X"] for rm in readmes]), axis=0)
    np.testing.assert_allclose(got, np.sort(np.asarray(db._Xtrain), axis=0),
                               rtol=1e-6)


def test_remote_readme_list_unconfigured(tmp_path):
    db, _ = _make_db(tmp_path, init_size=0)
    with pytest.raises(RuntimeError, match="lookup server"):
        db.get_readme_list_remote()
