"""The flagship example (examples/config/asperity_2d_ehl_gp.yaml —
the BASELINE 'Large 2D rough-surface EHL' scenario: asperity gap x
elastic half-space x GP surrogates with active learning) runs END TO
END through plain ``Problem.run()`` at reduced size: the chunked-AL
device route is taken, MD acquisitions occur, and the state stays
finite and physical.  Reference scenario analogue:
examples/config/asperity_2d_lj_gp.yaml in hannes-holey/GaPFlow.
"""

import os

import numpy as np
import pytest
import yaml

from gapflow_tpu import Problem

_CFG = os.path.join(os.path.dirname(__file__), "..", "examples",
                    "config", "asperity_2d_ehl_gp.yaml")


def _flagship_small(tmp_path, nx=32, ny=32, max_it=30):
    with open(_CFG) as fh:
        cfg = yaml.safe_load(fh)
    cfg["options"]["output"] = str(tmp_path / "run")
    cfg["options"]["use_tstamp"] = False
    cfg["grid"]["Nx"] = nx
    cfg["grid"]["Ny"] = ny
    cfg["numerics"]["max_it"] = max_it
    cfg["db"]["dtool_path"] = str(tmp_path / "train")
    return yaml.safe_dump(cfg)


def test_flagship_asperity_ehl_gp_runs_end_to_end(tmp_path):
    p = Problem.from_string(_flagship_small(tmp_path))
    assert p.topo.elastic and p.has_gp_model

    p.run()

    # the composition routed onto the chunked-AL device path
    assert p._device_route == "gp_chunked"
    assert p.step == 30 or p.converged
    # active learning actually fired (the Sobol-seeded database grows)
    assert p.database.size > 8
    # state sanity: finite fields, positive density, deformation moved
    q = np.asarray(p.q)
    assert np.all(np.isfinite(q))
    assert np.min(q[0]) > 0.
    u = np.asarray(p.topo.ElasticDeformation.u_prev)
    assert np.all(np.isfinite(u))
    assert np.abs(u).max() > 0.
    assert np.all(np.isfinite(np.asarray(p.topo.full)))


@pytest.mark.skipif(
    len(__import__("jax").devices()) < 8,
    reason="needs 8 (virtual) devices")
def test_flagship_asperity_ehl_gp_runs_sharded(tmp_path):
    """The same flagship composition advances on an 8-device mesh
    through the single driver entry (sharded chunked AL x elastic)."""
    import jax
    from gapflow_tpu.parallel import grid_mesh

    p = Problem.from_string(_flagship_small(tmp_path))
    p._pre_run()
    size0 = p.database.size
    mesh = grid_mesh(jax.devices()[:8], shape=(4, 2))
    p.run_steps_sharded(8, mesh=mesh)

    assert p.step == 8
    assert p.database.size >= size0
    q = np.asarray(p.q)
    assert np.all(np.isfinite(q))
    assert np.min(q[0]) > 0.
    assert np.all(np.isfinite(np.asarray(
        p.topo.ElasticDeformation.u_prev)))
