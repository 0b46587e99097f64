"""Sharded halo-exchange step equals the serial fused step.

Runs the 2D journal problem on an 8-device (virtual CPU) mesh and checks
the sharded trajectory matches the single-device solution to machine
precision (fixed dt).
"""

import numpy as np
import pytest

import jax

from gapflow_tpu import Problem
from gapflow_tpu.parallel import (grid_mesh, make_sharded_trajectory)
from gapflow_tpu.parallel.halo import shard_problem_arrays


sim_periodic = """
options:
    output: data/journal
    write_freq: 1000
    silent: True
grid:
    dx: 2.e-5
    dy: 2.e-5
    Nx: 48
    Ny: 48
geometry:
    type: journal
    CR: 1.e-2
    eps: 0.7
    U: 0.1
    V: 0.
numerics:
    CFL: 0.5
    adaptive: 0
    tol: 1e-8
    dt: 5e-11
    max_it: 10_000
properties:
    shear: 0.0794
    bulk: 0.
    EOS: DH
    P0: 101325.
    rho0: 877.7007
    C1: 3.5e10
    C2: 1.23
"""

sim_dirichlet = sim_periodic.replace(
    """    Nx: 48
    Ny: 48""",
    """    Nx: 48
    Ny: 48
    xE: ['D', 'N', 'N']
    xW: ['D', 'N', 'N']
    xE_D: 877.7007
    xW_D: 877.7007""")


@pytest.mark.parametrize("sim", [sim_periodic, sim_dirichlet],
                         ids=["periodic", "dirichlet"])
def test_sharded_matches_serial(sim):
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 (virtual) devices")

    n_steps = 10

    # serial reference
    ps = Problem.from_string(sim)
    qs_serial, _ = ps.run_steps(n_steps)
    q_serial = qs_serial[-1][:, 1:-1, 1:-1]

    # sharded
    pp = Problem.from_string(sim)
    pp._pre_run()
    mesh = grid_mesh(jax.devices()[:8], shape=(4, 2))
    q, topo, extra = shard_problem_arrays(pp, mesh)
    runner = make_sharded_trajectory(pp._solver_cfg, mesh, n_steps)
    q_sharded = np.asarray(runner(q, topo, extra, pp.dt))

    np.testing.assert_allclose(q_sharded, q_serial, rtol=1e-12, atol=1e-12)


def test_multihost_glue_single_process():
    """Single-process degenerate path of the multi-host helpers: init is
    a no-op, the global mesh covers the virtual devices, and a
    scatter/step/gather round-trip matches the local path."""
    import numpy as np
    import jax
    from gapflow_tpu.parallel import multihost as mh

    mh.init_distributed()          # no coordinator configured -> no-op
    assert jax.process_count() == 1

    mesh = mh.global_grid_mesh()
    assert mesh.shape["x"] * mesh.shape["y"] == jax.device_count()

    arr = np.arange(3 * 8 * 16, dtype=np.float64).reshape(3, 8, 16)
    sharded = mh.scatter_global(arr, mesh)
    assert sharded.sharding.mesh.shape == mesh.shape
    back = mh.gather_global(sharded + 1.0)
    np.testing.assert_array_equal(back, arr + 1.0)
