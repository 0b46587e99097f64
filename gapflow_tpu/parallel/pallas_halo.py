"""Sharded multi-chip FV stepping with the fused Pallas kernel.

Combines the 2D spatial decomposition of :mod:`gapflow_tpu.parallel.halo`
with the fused two-pass MacCormack kernel of
:mod:`gapflow_tpu.ops.stencil`: each shard exchanges HALO_X-deep (8-cell)
halo slabs with its mesh neighbors (one ``ppermute`` per axis; the y
exchange runs on the x-extended block so corner cells ride along), then
advances K_MULTI=4 temporal-blocked steps locally in one kernel — halo
consumption is 2 cells/step/edge, so the 8-deep halo buys exactly 4
steps between ICI syncs.  Remainder steps (n % 4) use a 2-deep exchange
with the one-step kernel, whose deep halo makes the inter-pass ghost
refill unnecessary (pass 1's halo ring is valid, which is all pass 2
consumes).

Local kernel layout: the fused periodic kernel treats its full width as
periodic (in-kernel roll).  The local block is laid out as
``[interior(by) | E1 E2 | junk pad | W2 W1]`` on a 128-aligned width W:
col 0's roll-left neighbor is col W-1 = W1 (the true west halo) and col
by-1's roll-right neighbor is col ny = E1 (the true east halo), so the
SAME kernel binary runs serial and sharded.  Junk padding columns are
never read by valid outputs (garbage propagates one column per pass and
the halo is two deep).  The x axis gets real neighbor rows in the inner
two rows of the 8-row alignment halo; the outer rows are replicated
padding.

Scope: fully periodic problems (the multi-chip production case).
Bit-identical to the serial fused kernel per cell — verified against
:func:`gapflow_tpu.ops.make_pallas_loop` on a virtual mesh in
tests/test_pallas_sharded.py.
"""

from functools import lru_cache, partial

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import NamedSharding, PartitionSpec as P
from jax import shard_map

from ..ops.stencil import (_make_call, _fully_periodic, HALO_X,
                           _statics_ghosted)
from .halo import _neighbor_perm


def _pad_width(by):
    return ((by + 4 + 127) // 128) * 128


def _exchange2(block, axis, axis_name, axis_size, depth=2):
    """``depth``-cell (lo, hi) halo slabs from the mesh neighbors."""
    hi_edge = lax.slice_in_dim(block, block.shape[axis] - depth,
                               block.shape[axis], axis=axis)
    lo_edge = lax.slice_in_dim(block, 0, depth, axis=axis)
    if axis_size == 1:
        return hi_edge, lo_edge
    lo = lax.ppermute(hi_edge, axis_name, _neighbor_perm(axis_size, +1))
    hi = lax.ppermute(lo_edge, axis_name, _neighbor_perm(axis_size, -1))
    return lo, hi


def _to_kernel_layout(rows, by, W, depth=2):
    """(C, R, by+2*depth) x-extended+y-exchanged block -> (C, R, W) wrap
    layout.

    Input columns: [W_depth..W1 | interior(by) | E1..E_depth]; output
    [interior | E1..E_depth | pad | W_depth..W1], so col 0's roll-left
    neighbor is col W-1 = W1 and col by-1's roll-right neighbor is E1."""
    inter = rows[:, :, depth:depth + by]
    east = rows[:, :, depth + by:depth + by + depth]
    west = rows[:, :, 0:depth]
    pad = jnp.repeat(rows[:, :, depth:depth + 1], W - by - 2 * depth,
                     axis=2)
    return jnp.concatenate([inter, east, pad, west], axis=2)


@lru_cache(maxsize=8)
def make_sharded_pallas_loop(cfg, mesh, nx, ny, dtype=jnp.float32):
    """Build ``loop(q, topo2, extra2, dt, n_steps) -> q`` sharded over mesh.

    q: (3, nx, ny) interior, sharded P(None, 'x', 'y').  topo2/extra2:
    2-cell overlapping blocks from :func:`pad_blocks2`, same sharding.
    """
    if not _fully_periodic(cfg):
        raise ValueError("sharded Pallas loop covers fully periodic "
                         "problems (others take make_sharded_trajectory)")
    if cfg.thinning is not None:
        raise ValueError("sharded Pallas loop does not cover shear "
                         "thinning (the global ghost-row gradient "
                         "semantics live on specific shards)")
    px, py = mesh.shape["x"], mesh.shape["y"]
    bx, by = nx // px, ny // py
    W = _pad_width(by)
    W8 = ((by + 2 * HALO_X + 127) // 128) * 128

    call, _, _, fused = _make_call(cfg, bx, W, None, dtype)[:4]
    assert fused
    # temporal-blocked local kernel: K_MULTI steps per HALO_X-deep
    # exchange (halo consumption 2 cells/step/edge, so an 8-deep halo
    # buys exactly 4 steps between ICI syncs)
    from ..ops.stencil import K_MULTI
    call_multi = _make_call(cfg, bx, W8, None, dtype)[7](1)

    def _exchange_deep(arr, depth):
        lo_x, hi_x = _exchange2(arr, 1, "x", px, depth)
        rows = jnp.concatenate([lo_x, arr, hi_x], axis=1)
        lo_y, hi_y = _exchange2(rows, 2, "y", py, depth)
        return jnp.concatenate([lo_y, rows, hi_y], axis=2)

    def local_loop(q, topo2, extra2, dt, n_steps):
        q = q.astype(dtype)
        dt = jnp.asarray(dt, dtype)[None]
        n_steps = jnp.asarray(n_steps, jnp.int32)

        # statics once per run: blocks carry their own 2-cell halos
        # (pad_blocks2), so the kernel-layout statics are exact with no
        # exchange; replicate the outer rows up to the 8-row alignment halo
        stats = _statics_ghosted(topo2.astype(dtype), extra2.astype(dtype))
        st_rows = jnp.concatenate(
            [jnp.repeat(stats[:, :1], HALO_X - 2, axis=1), stats,
             jnp.repeat(stats[:, -1:], HALO_X - 2, axis=1)], axis=1)
        stat_ext = _to_kernel_layout(st_rows, by, W)

        # statics for the blocked kernel: true HALO_X-deep halos, built by
        # one exchange of the interior blocks (statics are elementwise in
        # topo/extra, so exchanged inputs give exact halo statics).
        # Built unconditionally: gating on n_steps >= K_MULTI would put
        # the ppermutes under lax.cond, which is fragile inside
        # shard_map; remainder-only calls (n_steps < 4) pay two small
        # unused exchange rounds.
        topo8 = _exchange_deep(topo2.astype(dtype)[:, 2:-2, 2:-2], HALO_X)
        extra8 = _exchange_deep(extra2.astype(dtype)[:, 2:-2, 2:-2],
                                HALO_X)
        stat_ext8 = _to_kernel_layout(_statics_ghosted(topo8, extra8),
                                      by, W8, depth=HALO_X)

        def body(i, q_int):
            lo_x, hi_x = _exchange2(q_int, 1, "x", px)
            rows = jnp.concatenate([lo_x, q_int, hi_x], axis=1)
            lo_y, hi_y = _exchange2(rows, 2, "y", py)
            rows = jnp.concatenate([lo_y, rows, hi_y], axis=2)
            # expand the 2-row x halo to the kernel's 8-row alignment halo
            rows = jnp.concatenate(
                [jnp.repeat(rows[:, :1], HALO_X - 2, axis=1), rows,
                 jnp.repeat(rows[:, -1:], HALO_X - 2, axis=1)], axis=1)
            q_ext = _to_kernel_layout(rows, by, W)
            out = call(q_ext, stat_ext, dt)    # (3, bx, W)
            return out[:, :, :by]

        def body_blocked(i, q_int):
            rows = _exchange_deep(q_int, HALO_X)
            q_ext = _to_kernel_layout(rows, by, W8, depth=HALO_X)
            out = call_multi(q_ext, stat_ext8, dt)   # (3, bx+2H, W8)
            return out[:, HALO_X:HALO_X + bx, :by]

        q = lax.fori_loop(0, n_steps // K_MULTI, body_blocked, q)
        return lax.fori_loop(0, n_steps % K_MULTI, body, q)

    spec = P(None, "x", "y")
    sharded = shard_map(
        local_loop, mesh=mesh,
        in_specs=(spec, spec, spec, P(), P()),
        out_specs=spec, check_vma=False)
    return jax.jit(sharded)


def _pad_blocks2_impl(g, px, py, xp):
    """Shared 2-cell-halo overlapping-block layout (np or jnp)."""
    C, nxg, nyg = g.shape
    Nx, Ny = nxg - 2, nyg - 2
    assert Nx % px == 0 and Ny % py == 0, "grid must divide the mesh"
    inter = g[:, 1:-1, 1:-1]
    wide = xp.concatenate([inter[:, -2:], inter, inter[:, :2]], axis=1)
    wide = xp.concatenate([wide[:, :, -2:], wide, wide[:, :, :2]],
                          axis=2)
    bx, by = Nx // px, Ny // py
    rows = []
    for i in range(px):
        cols = [wide[:, i * bx:i * bx + bx + 4, j * by:j * by + by + 4]
                for j in range(py)]
        rows.append(xp.concatenate(cols, axis=2))
    return xp.concatenate(rows, axis=1)


def pad_blocks2_jnp(global_with_ghosts, px, py):
    """Traceable :func:`pad_blocks2` (for per-iteration rebuilt statics,
    e.g. the sharded EHL topography)."""
    return _pad_blocks2_impl(global_with_ghosts, px, py, jnp)


def pad_blocks2(global_with_ghosts, px, py):
    """Overlapping-block layout with TWO-cell halos for static fields.

    (C, Nx+2, Ny+2) ghost-inclusive serial field -> (C, px*(bx+4),
    py*(by+4)) whose (i, j) block is that shard's interior plus a 2-cell
    halo (periodic wrap at the global edges); shard P(None, 'x', 'y')."""
    return _pad_blocks2_impl(np.asarray(global_with_ghosts), px, py, np)



@lru_cache(maxsize=8)
def make_sharded_gp_pallas_loop(cfg, mesh, nx, ny, active_dims,
                                num_features, use_gp, caps,
                                dtype=jnp.float32):
    """Sharded GP-closed stepping through the FUSED GP kernel.

    ``loop(q, topo2, extra2, dt, n_steps, gp_state) -> q`` — the
    multi-chip layout of the flagship multiscale mode: training set
    replicated (tiny), test points sharded, each shard evaluating the
    batched Matern means on its own MXU (ops.stencil_gp.make_gp_call)
    between 2-deep ppermute halo exchanges.  Per-chip throughput is the
    serial GP kernel's; ICI traffic is the same 2-cell halo volume as
    the det one-step body.

    q sharded P(None, 'x', 'y'); topo2/extra2 in pad_blocks2 layout;
    gp_state replicated (core.gp_step layout, padded capacities in
    ``caps``).

    One-step bodies by design (no temporal blocking): a GP-closed step
    is 10-60x the det step's compute (capacity x 3 surrogates of kernel
    evaluations per cell), so the 2-deep exchange's ICI time
    (ici_bytes_per_step mode="gp", ~74 kB/chip/step at 2048^2 on 2x4)
    is noise against it — the det path's K_MULTI blocking would buy
    nothing here.
    """
    from ..ops.stencil_gp import make_gp_call

    if not _fully_periodic(cfg):
        raise ValueError("sharded GP Pallas loop covers fully periodic "
                         "problems (others take make_sharded_gp_step)")
    px, py = mesh.shape["x"], mesh.shape["y"]
    bx, by = nx // px, ny // py
    W = _pad_width(by)
    call, prep = make_gp_call(cfg, active_dims, use_gp, caps, bx, W,
                              dtype=dtype)

    def local_loop(q, topo2, extra2, dt, n_steps, *gp_arrs):
        q = q.astype(dtype)
        dt = jnp.asarray(dt, dtype)[None]
        n_steps = jnp.asarray(n_steps, jnp.int32)

        stats = _statics_ghosted(topo2.astype(dtype), extra2.astype(dtype))
        st_rows = jnp.concatenate(
            [jnp.repeat(stats[:, :1], HALO_X - 2, axis=1), stats,
             jnp.repeat(stats[:, -1:], HALO_X - 2, axis=1)], axis=1)
        stat_ext = _to_kernel_layout(st_rows, by, W)

        def body(i, q_int):
            lo_x, hi_x = _exchange2(q_int, 1, "x", px)
            rows = jnp.concatenate([lo_x, q_int, hi_x], axis=1)
            lo_y, hi_y = _exchange2(rows, 2, "y", py)
            rows = jnp.concatenate([lo_y, rows, hi_y], axis=2)
            rows = jnp.concatenate(
                [jnp.repeat(rows[:, :1], HALO_X - 2, axis=1), rows,
                 jnp.repeat(rows[:, -1:], HALO_X - 2, axis=1)], axis=1)
            q_ext = _to_kernel_layout(rows, by, W)
            out, _ = call(q_ext, stat_ext, dt, *gp_arrs)   # (3, bx, W)
            return out[:, :, :by]

        return lax.fori_loop(0, n_steps, body, q)

    spec = P(None, "x", "y")

    def loop(q, topo2, extra2, dt, n_steps, gp_state):
        gp_arrs = prep(gp_state)
        sharded = shard_map(
            local_loop, mesh=mesh,
            in_specs=(spec, spec, spec, P(), P())
                     + (P(),) * len(gp_arrs),
            out_specs=spec, check_vma=False)
        return sharded(q, topo2, extra2, dt, n_steps, *gp_arrs)

    return jax.jit(loop, static_argnames=())


def ici_bytes_per_step(nx, ny, px, py, mode="det", deform_every=1,
                       itemsize=4):
    """Analytic ICI traffic of the sharded Pallas paths, bytes sent per
    chip per timestep (each ppermute sends one halo slab per direction).

    mode="det": temporal-blocked loop — one HALO_X-deep (8-cell)
    exchange round per K_MULTI=4 steps.  mode="gp": one 2-deep exchange
    per step.  mode="ehl": the gp/det fluid exchanges plus the
    replicated-FFT pressure all-gather, (Nx+2)(Ny+2) values received
    from the other chips every ``deform_every`` steps (counted as sent
    bytes of the local (bx, by) contribution broadcast to px*py-1
    peers under a ring all-gather: each chip forwards the full array
    once, so sent ~= (Nx+2)(Ny+2) * itemsize / (px*py) * (px*py-1)).
    """
    from ..ops.stencil import K_MULTI

    bx, by = nx // px, ny // py

    def fluid(depth, every):
        x_bytes = 2 * 3 * depth * by * itemsize if px > 1 else 0
        y_bytes = 2 * 3 * (bx + 2 * depth) * depth * itemsize \
            if py > 1 else 0
        return (x_bytes + y_bytes) / every

    if mode == "det":
        return fluid(HALO_X, K_MULTI)
    if mode == "gp":
        return fluid(2, 1)
    if mode == "ehl":
        n_dev = px * py
        gather = (nx + 2) * (ny + 2) * itemsize * (n_dev - 1) / n_dev
        blocked = deform_every >= 4
        return (fluid(HALO_X, K_MULTI) if blocked else fluid(2, 1)) \
            + gather / deform_every
    raise ValueError(mode)


@lru_cache(maxsize=8)
def make_sharded_bc_pallas_loop(cfg, mesh, nx, ny, dtype=jnp.float32):
    """Sharded fused-kernel stepping for per-edge-uniform D/N problems.

    ``loop(q, topo2, extra2, dt, n_steps) -> q`` — the non-periodic
    extension of :func:`make_sharded_pallas_loop`: the same 2-deep wrap
    layout and ppermute exchanges, except that DOMAIN-edge shards
    override the wrapped halo slabs with the serial ghost values before
    the kernel, and the kernel (ops.stencil._kernel_fused_bc_shard)
    refills those ghost slots between the two passes from the pass-1
    state, gated on the shard's edge flags — the serial
    _communicate_ghost_buffers sequencing, shard-locally.  Periodic axes
    keep the plain wrap invariant.  topo2/extra2 must come from
    :func:`pad_blocks2_bc` so edge-shard statics carry the serial ghost
    topography, not a periodic wrap.

    Scope: per-edge-uniform P/D/N (ops.stencil._edges_uniform), no shear
    thinning, static MC order — the serial bc kernel family's coverage.
    One-step bodies (no temporal blocking yet): ICI cost is the gp-mode
    2-deep exchange per step (ici_bytes_per_step mode="gp").
    """
    from ..ops.stencil import make_bc_shard_call, _edges_uniform

    if cfg.thinning is not None:
        raise ValueError("sharded bc loop does not cover shear thinning")
    if not _edges_uniform(cfg) or cfg.MC_order == 0:
        raise ValueError("sharded bc loop covers per-edge-uniform "
                         "static-order configs")
    px, py = mesh.shape["x"], mesh.shape["y"]
    bx, by = nx // px, ny // py
    W = _pad_width(by)
    call = make_bc_shard_call(cfg, bx, by, W, dtype=dtype)

    bc_xE, bc_xW = cfg.bc_edge(0), cfg.bc_edge(1)
    bc_yS, bc_yN = cfg.bc_edge(2), cfg.bc_edge(3)
    per_x, per_y = all(bc_xE["P"]), all(bc_yS["P"])

    def ghost_vals(bc, adj):
        comps = []
        for c in range(3):
            if bc["D"][c]:
                comps.append(2. * bc["val"] - adj[c])
            else:                      # N (P never reaches this path)
                comps.append(adj[c])
        return jnp.stack(comps)

    def local_loop(q, topo2, extra2, dt, n_steps):
        q = q.astype(dtype)
        dt = jnp.asarray(dt, dtype)[None]
        n_steps = jnp.asarray(n_steps, jnp.int32)
        ix = lax.axis_index("x")
        iy = lax.axis_index("y")
        flags = jnp.stack([
            (ix == 0) & (not per_x),
            (ix == px - 1) & (not per_x),
            (iy == py - 1) & (not per_y),
            (iy == 0) & (not per_y),
        ]).astype(jnp.int32)

        stats = _statics_ghosted(topo2.astype(dtype), extra2.astype(dtype))
        st_rows = jnp.concatenate(
            [jnp.repeat(stats[:, :1], HALO_X - 2, axis=1), stats,
             jnp.repeat(stats[:, -1:], HALO_X - 2, axis=1)], axis=1)
        stat_ext = _to_kernel_layout(st_rows, by, W)

        def body(i, q_int):
            lo_x, hi_x = _exchange2(q_int, 1, "x", px)
            if not per_x:
                gE = ghost_vals(bc_xE, q_int[:, 0, :])[:, None, :]
                gW = ghost_vals(bc_xW, q_int[:, -1, :])[:, None, :]
                lo_x = jnp.where(ix == 0,
                                 jnp.concatenate([gE, gE], axis=1), lo_x)
                hi_x = jnp.where(ix == px - 1,
                                 jnp.concatenate([gW, gW], axis=1), hi_x)
            rows = jnp.concatenate([lo_x, q_int, hi_x], axis=1)
            lo_y, hi_y = _exchange2(rows, 2, "y", py)
            if not per_y:
                gS = ghost_vals(bc_yS, rows[:, :, 0])[:, :, None]
                gN = ghost_vals(bc_yN, rows[:, :, -1])[:, :, None]
                lo_y = jnp.where(iy == 0,
                                 jnp.concatenate([gS, gS], axis=2), lo_y)
                hi_y = jnp.where(iy == py - 1,
                                 jnp.concatenate([gN, gN], axis=2), hi_y)
            rows2 = jnp.concatenate([lo_y, rows, hi_y], axis=2)
            rows2 = jnp.concatenate(
                [jnp.repeat(rows2[:, :1], HALO_X - 2, axis=1), rows2,
                 jnp.repeat(rows2[:, -1:], HALO_X - 2, axis=1)], axis=1)
            q_ext = _to_kernel_layout(rows2, by, W)
            out = call(q_ext, stat_ext, dt, flags)    # (3, bx, W)
            return out[:, :, :by]

        return lax.fori_loop(0, n_steps, body, q)

    spec = P(None, "x", "y")
    sharded = shard_map(
        local_loop, mesh=mesh,
        in_specs=(spec, spec, spec, P(), P()),
        out_specs=spec, check_vma=False)
    return jax.jit(sharded)


def pad_blocks2_bc(global_with_ghosts, px, py, per_x, per_y):
    """:func:`pad_blocks2` for non-periodic axes: edge blocks carry the
    SERIAL ghost-ring values of the input (duplicated to the 2-cell halo
    depth; the outer cell is junk depth, never consumed) instead of a
    periodic wrap."""
    g = np.asarray(global_with_ghosts)
    C, nxg, nyg = g.shape
    Nx, Ny = nxg - 2, nyg - 2
    inter = g[:, 1:-1, 1:-1]
    if per_x:
        top2, bot2 = inter[:, -2:], inter[:, :2]
    else:
        gE, gW = g[:, :1, 1:-1], g[:, -1:, 1:-1]
        top2 = np.concatenate([gE, gE], axis=1)
        bot2 = np.concatenate([gW, gW], axis=1)
    wide = np.concatenate([top2, inter, bot2], axis=1)
    if per_y:
        l2, r2 = wide[:, :, -2:], wide[:, :, :2]
    else:
        # ghost cols aligned with the interior rows; halo rows replicate
        gS = np.concatenate([g[:, :1, :1].repeat(2, 1), g[:, 1:-1, :1],
                             g[:, -1:, :1].repeat(2, 1)], axis=1)
        gN = np.concatenate([g[:, :1, -1:].repeat(2, 1), g[:, 1:-1, -1:],
                             g[:, -1:, -1:].repeat(2, 1)], axis=1)
        l2 = np.concatenate([gS, gS], axis=2)
        r2 = np.concatenate([gN, gN], axis=2)
    wide = np.concatenate([l2, wide, r2], axis=2)

    bx, by = Nx // px, Ny // py
    assert Nx % px == 0 and Ny % py == 0, "grid must divide the mesh"
    rows = []
    for i in range(px):
        cols = [wide[:, i * bx:i * bx + bx + 4, j * by:j * by + by + 4]
                for j in range(py)]
        rows.append(np.concatenate(cols, axis=2))
    return np.concatenate(rows, axis=1)
