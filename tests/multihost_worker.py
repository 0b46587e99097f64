"""Worker for the real 2-process jax.distributed test (test_multihost.py).

Launched once per process:  python multihost_worker.py <pid> <nproc> <port>

Each process owns 4 virtual CPU devices (8 global), joins the cluster via
``init_distributed``, runs the sharded journal trajectory over the GLOBAL
mesh, gathers the result on every host, and checks it against a serial
single-process reference computed locally.  Exit code 0 = equality held.
"""

import os
import sys

pid, nproc, port = int(sys.argv[1]), int(sys.argv[2]), sys.argv[3]

os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                           + " --xla_force_host_platform_device_count=4")
os.environ["JAX_PLATFORMS"] = "cpu"

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# the env var can be pinned to a TPU plugin in this environment — override
# explicitly, before any backend comes up (same as tests/conftest.py)
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

from gapflow_tpu.parallel import multihost as mh  # noqa: E402

# must run before any backend is touched
mh.init_distributed(coordinator_address=f"localhost:{port}",
                    num_processes=nproc, process_id=pid)

import numpy as np  # noqa: E402

assert jax.process_count() == nproc, \
    f"process_count {jax.process_count()} != {nproc}"
assert jax.device_count() == 4 * nproc
assert len(jax.local_devices()) == 4

from gapflow_tpu import Problem  # noqa: E402
from gapflow_tpu.parallel import make_sharded_trajectory  # noqa: E402
from gapflow_tpu.parallel.halo import shard_problem_arrays  # noqa: E402

SIM = """
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

n_steps = 10

# serial reference, computed on this process's local devices only
ps = Problem.from_string(SIM)
qs_serial, _ = ps.run_steps(n_steps)
q_serial = np.asarray(qs_serial[-1][:, 1:-1, 1:-1])

# sharded over the GLOBAL (2-process) mesh
pp = Problem.from_string(SIM)
pp._pre_run()
mesh = mh.global_grid_mesh(shape=(4, 2))
assert {d.process_index for d in mesh.devices.flat} == set(range(nproc))

q, topo, extra = shard_problem_arrays(pp, mesh)
runner = make_sharded_trajectory(pp._solver_cfg, mesh, n_steps)
q_final = runner(q, topo, extra, pp.dt)
q_full = mh.gather_global(q_final)

np.testing.assert_allclose(q_full, q_serial, rtol=1e-12, atol=1e-12)

# scatter/gather round trip across processes
arr = np.arange(3 * 48 * 48, dtype=np.float64).reshape(3, 48, 48)
back = mh.gather_global(mh.scatter_global(arr, mesh) * 2.0)
np.testing.assert_array_equal(back, arr * 2.0)

print(f"worker {pid}: OK", flush=True)
