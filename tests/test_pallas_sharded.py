"""Sharded Pallas FV loop == serial Pallas loop, on a virtual device mesh."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from gapflow_tpu import Problem
from gapflow_tpu.parallel import grid_mesh
from gapflow_tpu.parallel.pallas_halo import (make_sharded_pallas_loop,
                                              pad_blocks2)


sim = """
options:
    output: data/pshard
    write_freq: 1000
    silent: True
grid:
    dx: 2.e-5
    dy: 2.e-5
    Nx: 32
    Ny: 256
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
    max_it: 10
properties:
    shear: 0.0794
    bulk: 0.
    EOS: DH
    P0: 101325.
    rho0: 877.7007
    C1: 3.5e10
    C2: 1.23
"""


@pytest.mark.parametrize("shape", [(1, 1), (2, 4), (4, 2), (1, 8)])
def test_sharded_pallas_matches_serial(shape):
    """(1, 1) runs on a single host core (the local-wrap degenerate case,
    covering the kernel layouts and the temporal-blocked body); the
    multi-device shapes need >= mesh-size cores for interpret mode."""
    import os
    from jax.experimental.pallas import tpu as pltpu

    if len(jax.devices()) < shape[0] * shape[1]:
        pytest.skip("needs 8 virtual devices")
    if (os.cpu_count() or 1) < shape[0] * shape[1]:
        # Interpret-mode pallas runs each virtual device's kernel on its
        # own thread and synchronizes them with a threading.Barrier; with
        # fewer host cores than mesh devices the XLA CPU client's pool
        # cannot run all device programs concurrently and the barrier
        # deadlocks (jax 0.9, interpret_pallas_call._barrier).
        pytest.skip("interpret-mode sharded pallas needs >= mesh-size "
                    "host cores")

    problem = Problem.from_string(sim)
    problem._pre_run()
    cfg = problem._solver_cfg
    nx, ny = problem.grid["Nx"], problem.grid["Ny"]
    by = ny // shape[1]
    if by % 8:
        pytest.skip("block width must stay 8-aligned")

    rng = np.random.default_rng(3)
    qp = np.array(problem.q)
    qp[0] *= 1. + 0.01 * rng.standard_normal(qp[0].shape)
    from gapflow_tpu.core.step import apply_bcs
    q = apply_bcs(jnp.asarray(qp, jnp.float32), problem._solver_cfg)
    topo = np.asarray(problem.topo.full, np.float32)
    extra = np.asarray(problem.fc.get_real_field("extra").p, np.float32)
    dt = jnp.asarray(problem.dt, jnp.float32)
    n = 5

    with pltpu.force_tpu_interpret_mode():
        from gapflow_tpu.ops.stencil import make_pallas_loop, _make_call
        from gapflow_tpu.parallel import pallas_halo
        make_pallas_loop.cache_clear()
        make_sharded_pallas_loop.cache_clear()
        _make_call.cache_clear()

        serial = make_pallas_loop(cfg, nx, ny)
        ref = np.asarray(serial(q, jnp.asarray(topo), jnp.asarray(extra),
                                dt, n))[:, 1:-1, 1:-1]

        mesh = grid_mesh(jax.devices()[:shape[0] * shape[1]], shape=shape)
        loop = make_sharded_pallas_loop(cfg, mesh, nx, ny)
        from jax.sharding import NamedSharding, PartitionSpec as P
        spec = NamedSharding(mesh, P(None, "x", "y"))
        qs = jax.device_put(np.asarray(q)[:, 1:-1, 1:-1], spec)
        t2 = jax.device_put(pad_blocks2(topo, *shape), spec)
        e2 = jax.device_put(pad_blocks2(extra, *shape), spec)
        out = np.asarray(loop(qs, t2, e2, dt, n))

        make_pallas_loop.cache_clear()
        make_sharded_pallas_loop.cache_clear()
        _make_call.cache_clear()

    # serial (whole-run-in-VMEM at this size) and sharded (per-exchange
    # blocked kernel) are DIFFERENT compiled programs: equality holds to
    # f32 rounding, not bitwise
    scale = np.abs(ref).reshape(3, -1).max(axis=1)[:, None, None]
    assert np.max(np.abs(out - ref) / scale) < 1e-5


@pytest.mark.parametrize("shape,cap", [((1, 1), 8), ((1, 1), 96),
                                       ((2, 4), 8), ((1, 8), 96)])
def test_sharded_gp_pallas_matches_serial(shape, cap, tmp_path):
    """Sharded fused-GP-kernel loop == serial GP kernel steps (both
    capacity modes: unrolled and MXU-tiled)."""
    import os
    from jax.experimental.pallas import tpu as pltpu
    from gapflow_tpu.parallel.pallas_halo import make_sharded_gp_pallas_loop
    from gapflow_tpu.validate import synthetic_gp_state
    from tests.test_gp_pallas import _setup

    if len(jax.devices()) < shape[0] * shape[1]:
        pytest.skip("needs 8 virtual devices")
    if (os.cpu_count() or 1) < shape[0] * shape[1]:
        pytest.skip("interpret-mode sharded pallas needs >= mesh-size "
                    "host cores")

    problem, dims, use = _setup(True, str(tmp_path))
    cfg = problem._solver_cfg
    nx, ny = problem.grid["Nx"], problem.grid["Ny"]
    nf = problem.database.num_features
    rng = np.random.default_rng(7)
    gp_state = synthetic_gp_state(dims, use, cap, rng)
    caps = tuple(cap if u else 0 for u in use)

    qp = np.array(problem.q, np.float32)
    qp[0] *= 1. + 0.01 * rng.standard_normal(qp[0].shape)
    from gapflow_tpu.core.step import apply_bcs
    q = apply_bcs(jnp.asarray(qp, jnp.float32), cfg)
    topo = np.asarray(problem.topo.full, np.float32)
    extra = np.asarray(problem.fc.get_real_field("extra").p, np.float32)
    dt = jnp.asarray(problem.dt, jnp.float32)
    n = 4

    with pltpu.force_tpu_interpret_mode():
        from gapflow_tpu.ops.stencil_gp import make_pallas_gp_step_fn
        kstep = make_pallas_gp_step_fn(cfg, dims, nf, use, nx, ny, caps,
                                       bs=16)
        qr = q
        for s in range(n):
            qr, _ = kstep(qr, jnp.asarray(topo), jnp.asarray(extra), dt,
                          s, gp_state)
        ref = np.asarray(qr)[:, 1:-1, 1:-1]

        mesh = grid_mesh(jax.devices()[:shape[0] * shape[1]], shape=shape)
        loop = make_sharded_gp_pallas_loop(cfg, mesh, nx, ny, dims, nf,
                                           use, caps)
        from jax.sharding import NamedSharding, PartitionSpec as P
        spec = NamedSharding(mesh, P(None, "x", "y"))
        qs = jax.device_put(np.asarray(q)[:, 1:-1, 1:-1], spec)
        t2 = jax.device_put(pad_blocks2(topo, *shape), spec)
        e2 = jax.device_put(pad_blocks2(extra, *shape), spec)
        out = np.asarray(loop(qs, t2, e2, dt, n, gp_state))
        make_sharded_gp_pallas_loop.cache_clear()

    scale = np.abs(ref).reshape(3, -1).max(axis=1)[:, None, None]
    assert np.max(np.abs(out - ref) / scale) < 1e-5


sim_ehl = """
options:
    output: data/pshard_ehl
    write_freq: 1000
    silent: True
grid:
    dx: 1.e-5
    dy: 1.e-5
    Nx: 32
    Ny: 256
geometry:
    type: journal
    CR: 1.e-2
    eps: 0.7
    U: 0.1
    V: 0.
numerics:
    CFL: 0.25
    adaptive: 0
    tol: 1e-30
    dt: 5e-11
    max_it: 1000
properties:
    shear: 0.0794
    bulk: 0.
    EOS: DH
    P0: 101325.
    rho0: 877.7007
    C1: 3.5e10
    C2: 1.23
    elastic:
        E: 5e09
        v: 0.3
        alpha_underrelax: 1e-03
"""


@pytest.mark.parametrize("shape,K", [((1, 1), 1), ((1, 1), 4),
                                     ((2, 4), 1), ((4, 2), 4)])
def test_sharded_ehl_pallas_matches_serial(shape, K):
    """Sharded EHL with the fused Pallas fluid kernel == the serial
    Pallas EHL loop (same end-of-step deformation protocol)."""
    import os
    from jax.experimental.pallas import tpu as pltpu
    from gapflow_tpu.core.ehl import make_ehl_loop
    from gapflow_tpu.parallel.ehl import make_sharded_ehl_loop
    from gapflow_tpu.parallel.halo import shard_problem_arrays

    if len(jax.devices()) < shape[0] * shape[1]:
        pytest.skip("needs 8 virtual devices")
    if (os.cpu_count() or 1) < shape[0] * shape[1]:
        pytest.skip("interpret-mode sharded pallas needs >= mesh-size "
                    "host cores")

    n = 4 * K
    with pltpu.force_tpu_interpret_mode():
        ps = Problem.from_string(sim_ehl)
        ps._pre_run()
        # reference = the f32 XLA EHL loop: the serial Pallas EHL loop's
        # double-buffered strip pipeline is chip-validated (bench
        # ehl_kernel_bitexact), not interpret-faithful beyond a few steps
        loop_s = make_ehl_loop(ps, use_pallas=False, deform_every=K,
                               dtype=np.float32)
        u0 = np.zeros_like(np.asarray(ps.topo.deformation, np.float32))
        q_ref, u_ref = loop_s(jnp.asarray(ps.q, jnp.float32), u0,
                              jnp.float32(ps.dt), n)
        q_ref, u_ref = np.asarray(q_ref), np.asarray(u_ref)

        pp = Problem.from_string(sim_ehl)
        pp._pre_run()
        mesh = grid_mesh(jax.devices()[:shape[0] * shape[1]], shape=shape)
        q, _t, _e = shard_problem_arrays(pp, mesh)
        loop_p = make_sharded_ehl_loop(pp, mesh, deform_every=K,
                                       use_pallas=True)
        q_out, u_out = loop_p(jnp.asarray(q, jnp.float32),
                              u0, jnp.float32(pp.dt), n)
        q_out, u_out = np.asarray(q_out), np.asarray(u_out)

    scale = np.abs(q_ref).reshape(3, -1).max(axis=1)[:, None, None]
    scale = np.maximum(scale, 1e-6 * scale.max())
    assert np.max(np.abs(q_out - q_ref[:, 1:-1, 1:-1]) / scale) < 1e-5
    us = max(np.abs(u_ref).max(), 1e-30)
    assert np.abs(u_out - u_ref).max() / us < 1e-4


sim_bc = """
options:
    output: data/pshard_bc
    write_freq: 1000
    silent: True
grid:
    dx: 2.e-5
    dy: 2.e-5
    Nx: 32
    Ny: 256
{edges}
geometry:
    type: journal
    CR: 1.e-2
    eps: 0.7
    U: 0.1
    V: 0.05
numerics:
    CFL: 0.5
    adaptive: 0
    tol: 1e-8
    dt: 5e-11
    max_it: 10
properties:
    shear: 0.0794
    bulk: 0.
    EOS: DH
    P0: 101325.
    rho0: 877.7007
    C1: 3.5e10
    C2: 1.23
"""

EDGES_XDN = """    xE: ['D', 'N', 'N']
    xW: ['D', 'N', 'N']
    xE_D: 877.7007
    xW_D: 877.7007
"""
EDGES_ALL = EDGES_XDN + """    yS: ['D', 'N', 'N']
    yN: ['D', 'N', 'N']
    yS_D: 877.7007
    yN_D: 877.7007
"""


@pytest.mark.parametrize("shape,edges", [
    ((1, 1), EDGES_XDN), ((1, 1), EDGES_ALL),
    ((2, 4), EDGES_XDN), ((2, 2), EDGES_ALL), ((1, 8), EDGES_ALL)])
def test_sharded_bc_pallas_matches_serial(shape, edges):
    """Sharded D/N-edge fused kernel == serial bc-kernel loop: edge
    shards carry the serial ghost protocol, interior shards the halo
    wrap invariant."""
    import os
    from jax.experimental.pallas import tpu as pltpu
    from gapflow_tpu.parallel.pallas_halo import (
        make_sharded_bc_pallas_loop, pad_blocks2_bc)

    if len(jax.devices()) < shape[0] * shape[1]:
        pytest.skip("needs 8 virtual devices")
    if (os.cpu_count() or 1) < shape[0] * shape[1]:
        pytest.skip("interpret-mode sharded pallas needs >= mesh-size "
                    "host cores")

    problem = Problem.from_string(sim_bc.format(edges=edges))
    problem._pre_run()
    cfg = problem._solver_cfg
    nx, ny = problem.grid["Nx"], problem.grid["Ny"]
    per_x = all(cfg.bc_edge(0)["P"])
    per_y = all(cfg.bc_edge(2)["P"])
    assert not per_x

    rng = np.random.default_rng(5)
    qp = np.array(problem.q)
    qp[0] *= 1. + 0.01 * rng.standard_normal(qp[0].shape)
    from gapflow_tpu.core.step import apply_bcs
    q = apply_bcs(jnp.asarray(qp, jnp.float32), cfg)
    topo = np.asarray(problem.topo.full, np.float32)
    extra = np.asarray(problem.fc.get_real_field("extra").p, np.float32)
    dt = jnp.asarray(problem.dt, jnp.float32)
    n = 5

    with pltpu.force_tpu_interpret_mode():
        from gapflow_tpu.ops.stencil import make_pallas_loop, _make_call
        make_pallas_loop.cache_clear()
        _make_call.cache_clear()
        serial = make_pallas_loop(cfg, nx, ny)
        ref = np.asarray(serial(q, jnp.asarray(topo), jnp.asarray(extra),
                                dt, n))[:, 1:-1, 1:-1]

        mesh = grid_mesh(jax.devices()[:shape[0] * shape[1]], shape=shape)
        loop = make_sharded_bc_pallas_loop(cfg, mesh, nx, ny)
        from jax.sharding import NamedSharding, PartitionSpec as P
        spec = NamedSharding(mesh, P(None, "x", "y"))
        qs = jax.device_put(np.asarray(q)[:, 1:-1, 1:-1], spec)
        t2 = jax.device_put(pad_blocks2_bc(topo, *shape, per_x, per_y),
                            spec)
        e2 = jax.device_put(pad_blocks2_bc(extra, *shape, per_x, per_y),
                            spec)
        out = np.asarray(loop(qs, t2, e2, dt, n))
        make_pallas_loop.cache_clear()
        make_sharded_bc_pallas_loop.cache_clear()
        _make_call.cache_clear()

    scale = np.abs(ref).reshape(3, -1).max(axis=1)[:, None, None]
    scale = np.maximum(scale, 1e-6 * scale.max())
    assert np.max(np.abs(out - ref) / scale) < 1e-5
