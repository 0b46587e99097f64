"""Multi-chip spatial domain decomposition with ICI halo exchange.

The (3, Nx, Ny) interior state is sharded over a 2D device mesh
('x', 'y'); every MacCormack pass exchanges one-cell halos with the four
mesh neighbors via ``jax.lax.ppermute`` (rides the ICI on TPU pods) and
applies the physics locally.  Global Dirichlet/Neumann boundaries are
masked fills on the shards that own a global edge; periodic boundaries
come free from the permutation ring.

Static per-cell data (topography, extra features) is laid out as
overlapping blocks: each shard's block carries its own one-cell halo,
precomputed once from the ghost-inclusive serial field by
:func:`pad_blocks` — exact for any geometry, no per-step exchange.

This is the TPU-native replacement for the reference's single-node µGrid
fields + ghost-buffer loops (reference GaPFlow/problem.py:676-768): the
same ghost-cell formula, recast as collective halo exchange over a mesh.
With a fixed timestep the sharded step matches the serial step to
floating-point reduction order.
"""

from functools import lru_cache

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax import shard_map

from ..core.integrate import hyperbolicFlux, diffusiveFlux, source
from ..core.step import det_closures, mc_directions


def grid_mesh(devices=None, shape=None, axis_names=("x", "y")):
    """Build a 2D device mesh for spatial decomposition."""
    if devices is None:
        devices = jax.devices()
    n = len(devices)
    if shape is None:
        px = int(np.floor(np.sqrt(n)))
        while n % px:
            px -= 1
        shape = (px, n // px)
    devs = np.asarray(devices).reshape(shape)
    return Mesh(devs, axis_names)


def pad_blocks(global_with_ghosts, px, py):
    """Overlapping-block layout for static fields.

    Converts a ghost-inclusive serial field (C, Nx+2, Ny+2) into a
    (C, px*(bx+2), py*(by+2)) array whose (i, j) block is that shard's
    interior plus its one-cell halo; shard it P(None, 'x', 'y').
    """
    g = np.asarray(global_with_ghosts)
    C, nxg, nyg = g.shape
    Nx, Ny = nxg - 2, nyg - 2
    assert Nx % px == 0 and Ny % py == 0, "grid must divide the mesh"
    bx, by = Nx // px, Ny // py

    rows = []
    for i in range(px):
        cols = []
        for j in range(py):
            cols.append(g[:, i * bx:i * bx + bx + 2, j * by:j * by + by + 2])
        rows.append(np.concatenate(cols, axis=2))
    return np.concatenate(rows, axis=1)


def _neighbor_perm(axis_size, shift):
    return [(i, (i + shift) % axis_size) for i in range(axis_size)]


def _exchange_axis(block, axis, axis_name, axis_size):
    """(lo_halo, hi_halo) slabs received from the two mesh neighbors."""
    hi_edge = lax.slice_in_dim(block, block.shape[axis] - 1,
                               block.shape[axis], axis=axis)
    lo_edge = lax.slice_in_dim(block, 0, 1, axis=axis)

    if axis_size == 1:
        return hi_edge, lo_edge  # periodic wrap onto self

    lo_halo = lax.ppermute(hi_edge, axis_name, _neighbor_perm(axis_size, +1))
    hi_halo = lax.ppermute(lo_edge, axis_name, _neighbor_perm(axis_size, -1))
    return lo_halo, hi_halo


def _edge_values(bc, q_adj):
    """Ghost values for one edge from its P/D/N masks (midpoint a1 = 0.5)."""
    rows = []
    for c in range(3):
        if bc["D"][c]:
            rows.append(2. * bc["val"] - q_adj[c])
        elif bc["N"][c]:
            rows.append(q_adj[c])
        else:
            rows.append(q_adj[c])  # periodic comes from the ppermute wrap
    return jnp.stack(rows)


def _pad_with_halos(q, cfg, px, py):
    """Assemble the locally padded (3, bx+2, by+2) block."""
    ix = lax.axis_index("x")
    iy = lax.axis_index("y")

    lo_x, hi_x = _exchange_axis(q, 1, "x", px)
    bc_xE, bc_xW = cfg.bc_edge(0), cfg.bc_edge(1)
    if not all(bc_xE["P"]):
        lo_x = jnp.where(ix == 0,
                         _edge_values(bc_xE, q[:, 0, :])[:, None, :], lo_x)
        hi_x = jnp.where(ix == px - 1,
                         _edge_values(bc_xW, q[:, -1, :])[:, None, :], hi_x)
    q = jnp.concatenate([lo_x, q, hi_x], axis=1)

    lo_y, hi_y = _exchange_axis(q, 2, "y", py)
    bc_yS, bc_yN = cfg.bc_edge(2), cfg.bc_edge(3)
    if not all(bc_yS["P"]):
        lo_y = jnp.where(iy == 0,
                         _edge_values(bc_yS, q[:, :, 0])[:, :, None], lo_y)
        hi_y = jnp.where(iy == py - 1,
                         _edge_values(bc_yN, q[:, :, -1])[:, :, None], hi_y)
    q = jnp.concatenate([lo_y, q, hi_y], axis=2)

    return q


def _one_pass_local(cfg, q_pad, topo_pad, extra_pad, dt, d):
    """One MacCormack pass on a halo-padded local block; returns interior."""
    p, tau_bulk, s_lo, s_up = det_closures(cfg, q_pad, topo_pad, extra_pad)

    FxH, FyH = hyperbolicFlux(q_pad, p)
    FxD, FyD = diffusiveFlux(q_pad, tau_bulk)
    Fx = FxH + FxD
    Fy = FyH + FyD

    flux_x = -d * (jnp.roll(Fx, d, axis=1) - Fx)
    flux_y = -d * (jnp.roll(Fy, d, axis=2) - Fy)
    src = source(q_pad, topo_pad, tau_bulk, s_lo, s_up)

    q_new = q_pad - dt * (flux_x / cfg.dx + flux_y / cfg.dy - src)
    return q_new[:, 1:-1, 1:-1]


@lru_cache(maxsize=16)
def make_sharded_det_step(cfg, mesh):
    """Jitted sharded MacCormack timestep.

    Signature: ``step(q, topo_blocks, extra_blocks, dt, step_idx) -> q`` with
    q of global shape (3, Nx, Ny) sharded P(None, 'x', 'y') and the static
    fields in :func:`pad_blocks` layout.
    """
    px, py = mesh.shape["x"], mesh.shape["y"]

    def local_step(q, topo_pad, extra_pad, dt, step):
        def passes(qq, d0, d1):
            qq1 = _one_pass_local(cfg, _pad_with_halos(qq, cfg, px, py),
                                  topo_pad, extra_pad, dt, d0)
            return _one_pass_local(cfg, _pad_with_halos(qq1, cfg, px, py),
                                   topo_pad, extra_pad, dt, d1)

        q0 = q
        if cfg.MC_order != 0:
            d0, d1 = mc_directions(cfg.MC_order)
            q = passes(q, d0, d1)
        else:
            q = lax.cond(step % 2 == 0,
                         lambda qq: passes(qq, 1, -1),
                         lambda qq: passes(qq, -1, 1), q)

        return (q + q0) / 2.

    spec = P(None, "x", "y")
    sharded = shard_map(local_step, mesh=mesh,
                        in_specs=(spec, spec, spec, P(), P()),
                        out_specs=spec, check_vma=False)
    return jax.jit(sharded)


@lru_cache(maxsize=16)
def make_sharded_trajectory(cfg, mesh, n):
    """n sharded steps under one jit (lax.scan over the sharded step)."""
    px, py = mesh.shape["x"], mesh.shape["y"]
    step_raw = make_sharded_det_step(cfg, mesh)

    def run(q, topo_pad, extra_pad, dt):
        def body(carry, i):
            return step_raw(carry, topo_pad, extra_pad, dt, i), None

        q, _ = lax.scan(body, q, jnp.arange(n))
        return q

    return jax.jit(run)


def shard_problem_arrays(problem, mesh):
    """Device-place a Problem's state for the sharded step.

    Returns (q_interior, topo_blocks, extra_blocks) with the right
    shardings; q strips the serial ghost cells.
    """
    px, py = mesh.shape["x"], mesh.shape["y"]
    spec = NamedSharding(mesh, P(None, "x", "y"))

    # make_array_from_callback (not device_put): works unchanged when the
    # mesh spans multiple processes — each process materializes only its
    # addressable shards from the (replicated) host array
    def put(host_array):
        host_array = np.asarray(host_array)
        return jax.make_array_from_callback(
            host_array.shape, spec, lambda idx: host_array[idx])

    q = put(np.asarray(problem.q)[:, 1:-1, 1:-1])
    topo = put(pad_blocks(problem.topo.full, px, py))
    extra = put(pad_blocks(problem.fc.get_real_field("extra").p, px, py))
    return q, topo, extra
