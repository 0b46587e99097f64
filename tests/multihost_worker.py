"""Worker for the real 2-process jax.distributed tests (test_multihost.py).

Launched once per process:

    python multihost_worker.py <pid> <nproc> <port> <mode> <scratch>

Each process owns 4 virtual CPU devices (8 global), joins the cluster via
``init_distributed``, runs one sharded program over the GLOBAL mesh, and
checks it against a serial single-process reference computed locally.
Exit code 0 = equality held.

Modes (SURVEY §5.8 coverage — every runtime family crosses a real
process boundary, not just the fixed-dt deterministic step):

- ``det``      fixed-dt deterministic trajectory + scatter/gather
- ``adaptive`` full SimState step (adaptive dt, residuals, rollback)
- ``ehl``      sharded fluid + replicated-FFT elastic loop
- ``gp``       GP-surrogate-closed trajectory (replicated train set)
"""

import os
import sys

pid, nproc, port, mode, scratch = (int(sys.argv[1]), int(sys.argv[2]),
                                   sys.argv[3], sys.argv[4], sys.argv[5])

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
import jax.numpy as jnp  # noqa: E402

assert jax.process_count() == nproc, \
    f"process_count {jax.process_count()} != {nproc}"
assert jax.device_count() == 4 * nproc
assert len(jax.local_devices()) == 4

from gapflow_tpu import Problem  # noqa: E402
from gapflow_tpu.parallel import shard_problem_state  # noqa: E402
from gapflow_tpu.parallel.halo import (  # noqa: E402
    make_sharded_state_trajectory, make_sharded_trajectory,
    shard_problem_arrays)

SIM = """
options:
    output: {out}
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
    adaptive: {adaptive}
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

GP_SIM = """
options:
    output: {out}
    write_freq: 1000
    use_tstamp: False
    silent: True
grid:
    Lx: 1470.
    Ly: 735.
    Nx: 32
    Ny: 16
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
    dtool_path: {train}
"""

# per-process scratch: both processes build identical problems (seeded DB,
# deterministic mock oracle) but must not share output files
my_dir = os.path.join(scratch, f"proc{pid}")
os.makedirs(my_dir, exist_ok=True)


def make_mesh():
    mesh = mh.global_grid_mesh(shape=(4, 2))
    assert {d.process_index for d in mesh.devices.flat} == set(range(nproc))
    return mesh


if mode == "det":
    sim = SIM.format(out=f"{my_dir}/journal", adaptive=0)
    n_steps = 10

    ps = Problem.from_string(sim)
    qs_serial, _ = ps.run_steps(n_steps)
    q_serial = np.asarray(qs_serial[-1][:, 1:-1, 1:-1])

    pp = Problem.from_string(sim)
    pp._pre_run()
    mesh = make_mesh()
    q, topo, extra = shard_problem_arrays(pp, mesh)
    runner = make_sharded_trajectory(pp._solver_cfg, mesh, n_steps)
    q_full = mh.gather_global(runner(q, topo, extra, pp.dt))
    np.testing.assert_allclose(q_full, q_serial, rtol=1e-12, atol=1e-12)

    # scatter/gather round trip across processes
    arr = np.arange(3 * 48 * 48, dtype=np.float64).reshape(3, 48, 48)
    back = mh.gather_global(mh.scatter_global(arr, mesh) * 2.0)
    np.testing.assert_array_equal(back, arr * 2.0)

elif mode == "adaptive":
    from gapflow_tpu.core.step import make_det_step

    sim = SIM.format(out=f"{my_dir}/journal", adaptive=1)
    n_steps = 10

    ps = Problem.from_string(sim)
    ps._pre_run()
    det = make_det_step(ps._solver_cfg, with_aux=False)
    s = ps._make_state()
    for _ in range(n_steps):
        s = det(s)

    pp = Problem.from_string(sim)
    pp._pre_run()
    mesh = make_mesh()
    state = shard_problem_state(pp, mesh)
    out = make_sharded_state_trajectory(pp._solver_cfg, mesh, n_steps)(state)

    np.testing.assert_allclose(mh.gather_global(out.q),
                               np.asarray(s.q)[:, 1:-1, 1:-1],
                               rtol=1e-12, atol=1e-12)
    # adaptive dt is a global reduction — replicated, identical on every
    # process, and equal to the serial chain
    np.testing.assert_allclose(float(out.dt), float(s.dt), rtol=1e-13)
    assert int(out.step) == int(s.step)
    np.testing.assert_allclose(float(out.ekin_old), float(s.ekin_old),
                               rtol=1e-12)
    np.testing.assert_allclose(float(out.residual), float(s.residual),
                               rtol=1e-8)
    assert bool(out.valid)

elif mode == "ehl":
    from gapflow_tpu.core.ehl import make_ehl_loop
    from gapflow_tpu.parallel.ehl import make_sharded_ehl_loop

    sim = SIM.format(out=f"{my_dir}/journal", adaptive=0).replace(
        "    C2: 1.23",
        """    C2: 1.23
    elastic:
        E: 5e09
        v: 0.3
        alpha_underrelax: 1e-04""")
    n_steps = 20

    ps = Problem.from_string(sim)
    ps._pre_run()
    loop_s = make_ehl_loop(ps, use_pallas=False, deform_every=4)
    u0 = np.zeros_like(np.asarray(ps.topo.deformation))
    q_ref, u_ref = loop_s(ps.q, u0, ps.dt, n_steps)

    pp = Problem.from_string(sim)
    pp._pre_run()
    mesh = make_mesh()
    q, _topo, _extra = shard_problem_arrays(pp, mesh)
    loop_p = make_sharded_ehl_loop(pp, mesh, deform_every=4)
    q_out, u_out = loop_p(q, u0, pp.dt, n_steps)

    np.testing.assert_allclose(mh.gather_global(q_out),
                               np.asarray(q_ref)[:, 1:-1, 1:-1],
                               rtol=1e-10, atol=1e-14)
    # deformation is replicated (every shard runs the same global FFT);
    # fetch through the collective gather — replicated global arrays are
    # still not directly addressable from one process
    u_out = mh.gather_global(u_out)
    scale = max(np.abs(np.asarray(u_ref)).max(), 1e-30)
    assert np.abs(u_out - np.asarray(u_ref)).max() / scale < 1e-8

elif mode == "gp":
    from gapflow_tpu.core.gp_step import make_gp_step
    from gapflow_tpu.parallel.gp import (gp_problem_dims,
                                         make_sharded_gp_trajectory)

    sim = GP_SIM.format(out=f"{my_dir}/gp", train=f"{my_dir}/train")
    n_steps = 3

    p = Problem.from_string(sim)
    p._pre_run()
    # one host update trains/conditions every surrogate; the seeded DB +
    # deterministic mock oracle make gp_state identical on every process
    p.update()
    assert p._gp_fused_eligible(False)

    dims, nf, use = gp_problem_dims(p)
    gp_state = p._gp_state()
    cfg = p._solver_cfg

    step = make_gp_step(cfg, dims, nf, use)
    q = jnp.asarray(p.q)
    topo = jnp.asarray(p.topo.full)
    extra = jnp.asarray(p.fc.get_real_field("extra").p)
    dt = jnp.asarray(p.dt)
    for i in range(n_steps):
        q, _ = step(q, topo, extra, dt, jnp.asarray(p.step + i, jnp.int32),
                    gp_state)
    ref = np.asarray(q)[:, 1:-1, 1:-1]

    mesh = make_mesh()
    qs, topo_b, extra_b = shard_problem_arrays(p, mesh)
    runner = make_sharded_gp_trajectory(cfg, dims, nf, use, mesh, n_steps)
    out = mh.gather_global(runner(qs, topo_b, extra_b, dt, gp_state))
    np.testing.assert_allclose(out, ref, rtol=1e-10, atol=1e-12)

else:
    raise SystemExit(f"unknown mode {mode!r}")

print(f"worker {pid} [{mode}]: OK", flush=True)
