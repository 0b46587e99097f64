"""Pallas step for mixed per-component P/D/N edges.

The serial scheme (reference GaPFlow/problem.py:676-768) treats an edge
with SOME periodic components specially: the ghost fill overwrites only
the Dirichlet/Neumann components and leaves a periodic component's ghost
cells at whatever the np.roll pass arithmetic produced — i.e. the ghost
evolves like an interior cell whose missing neighbor wraps around the
ARRAY edge (serial row 0 reads row nx+1, col 0 reads col ny+1).  Those
ghost values are therefore STATE: unlike the uniform-edge kernels (whose
D/N ghosts are affine functions of the adjacent interior and are rebuilt
from the interior every step), a mixed-edge run must carry them.

Design: the interior update keeps the fused boundary kernel layout
(ops.stencil._kernel_fused_bc family: strips along x, ghost columns
relocated to lanes [ny] and [W-1]); the ghost-line evolution — an
O(perimeter) computation — runs in XLA alongside the kernel on narrow
"bands" (six full-width rows / six full-height columns) that reproduce
the serial roll-wrap arithmetic exactly:

  * x band rows [g0, i0, i1, i_{nx-2}, i_{nx-1}, g1]: a ghost row's
    roll neighbor is either the adjacent interior row or (via the array
    wrap) the OTHER ghost row — all in the band.  Full-width rows make
    the in-row y differences (jnp.roll over ny+2) serial-exact,
    including the corner cells.
  * y band columns [gS, c0, c1, c_{ny-2}, c_{ny-1}, gN], symmetric.

Each band runs both MacCormack passes with the serial ghost refills
in-between, yielding (a) the pass-1 evolved ghost lines — fed to the
kernel so its between-pass refill can place them (the kernel's own
pass-1 values at ghost slots see garbage neighbors) — and (b) the final
averaged ghost lines for the carried state.  Pass-2 at a ghost line
needs pass-1 at lines the band recomputes itself, so bands never read
kernel intermediates; interior and frame evolve independently from the
same pre-step state, exactly as in the serial program.

Shear thinning is excluded: its viscosity couples every interior cell
to the ghost lines through jnp.gradient's one-sided stencils, which the
per-strip kernel cannot see for EVOLVED (non-reconstructible) ghosts.

Used by ops.stencil.make_pallas_loop / Problem.run_steps_fast when
``mixed_supported`` holds; everything else keeps the XLA fused step.
"""

from functools import lru_cache, partial

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..core.integrate import hyperbolicFlux, diffusiveFlux, source
from ..core.step import apply_bcs, det_closures, mc_directions
from .stencil import (HALO_X, N_STATIC, _auto_bs, _extend_bc,
                      _one_pass_fused, _pad_width, _statics_ghosted)

# band-local neighbor tables for lines [g, e0, e1, t2, t1, g'] taken from
# serial indices [0, 1, 2, n-1, n, n+1] of an (n+2)-long periodic axis:
# prev = serial index-1 (wraps g <- g'), next = serial index+1; -1 marks
# a neighbor outside the band (that line's flux difference is garbage and
# never consumed — see module docstring)
_PREV = (5, 0, 1, -1, 3, 4)
_NEXT = (1, 2, -1, 4, 5, 0)


def _edge_mixed(cfg, i):
    P = cfg.bc_edge(i)["P"]
    return any(P) and not all(P)


def mixed_supported(cfg, ny, nx=None):
    """Kernel coverage for mixed per-component P/D/N edges.

    Requires a static pass order and lane-aligned width like the uniform
    boundary kernel, at least one mixed edge, and no shear thinning.  The
    config sanitizer already guarantees P-masks match on opposite edges.
    ``nx`` (when given) must keep the band lines distinct.
    """
    if cfg.MC_order == 0 or ny % 128 or cfg.thinning is not None:
        return False
    if not (_edge_mixed(cfg, 0) or _edge_mixed(cfg, 2)):
        return False
    if nx is not None and nx < 6:
        return False
    return True


# ---------------------------------------------------------------------------
# Ghost-line bands (XLA, serial-exact)
# ---------------------------------------------------------------------------

def _fill_vals(bc, adj, ghost):
    """Serial per-component ghost fill: D/N formulas, P keeps ``ghost``."""
    rows = []
    for c in range(3):
        if bc["D"][c]:
            rows.append(2. * bc["val"] - adj[c])
        elif bc["N"][c]:
            rows.append(adj[c])
        else:
            rows.append(ghost[c])
    return jnp.stack(rows)


def _refill_band(cfg, qb, axis):
    """Serial apply_bcs restricted to a band (x edges first, then y)."""
    bc_xE, bc_xW = cfg.bc_edge(0), cfg.bc_edge(1)
    bc_yS, bc_yN = cfg.bc_edge(2), cfg.bc_edge(3)
    if axis == 1:
        # x band (3, 6, ny+2): x ghosts are band rows 0/5, adj rows 1/4
        if all(bc_xE["P"]):
            qb = qb.at[:, 0].set(qb[:, 4]).at[:, 5].set(qb[:, 1])
        else:
            qb = qb.at[:, 0].set(_fill_vals(bc_xE, qb[:, 1], qb[:, 0]))
            qb = qb.at[:, 5].set(_fill_vals(bc_xW, qb[:, 4], qb[:, 5]))
        # y ghosts are the full-width edge columns
        if all(bc_yS["P"]):
            qb = qb.at[:, :, 0].set(qb[:, :, -2])
            qb = qb.at[:, :, -1].set(qb[:, :, 1])
        else:
            qb = qb.at[:, :, 0].set(_fill_vals(bc_yS, qb[:, :, 1],
                                               qb[:, :, 0]))
            qb = qb.at[:, :, -1].set(_fill_vals(bc_yN, qb[:, :, -2],
                                                qb[:, :, -1]))
    else:
        # y band (3, nx+2, 6): x ghosts are the full-height edge rows
        if all(bc_xE["P"]):
            qb = qb.at[:, 0].set(qb[:, -2]).at[:, -1].set(qb[:, 1])
        else:
            qb = qb.at[:, 0].set(_fill_vals(bc_xE, qb[:, 1], qb[:, 0]))
            qb = qb.at[:, -1].set(_fill_vals(bc_xW, qb[:, -2], qb[:, -1]))
        # y ghosts are band cols 0/5, adj cols 1/4
        if all(bc_yS["P"]):
            qb = qb.at[:, :, 0].set(qb[:, :, 4])
            qb = qb.at[:, :, 5].set(qb[:, :, 1])
        else:
            qb = qb.at[:, :, 0].set(_fill_vals(bc_yS, qb[:, :, 1],
                                               qb[:, :, 0]))
            qb = qb.at[:, :, 5].set(_fill_vals(bc_yN, qb[:, :, 4],
                                               qb[:, :, 5]))
    return qb


def _pass_band(cfg, qb, tb, eb, dt, d, axis):
    """One serial MacCormack pass on a band.

    ``axis`` = 1: x band — explicit neighbor table along the band rows,
    jnp.roll (serial-exact, wraps the array edge) along the full width.
    ``axis`` = 2: y band, transposed roles.  Lines whose table neighbor
    is outside the band (-1) come out garbage and are never consumed.
    """
    p, tau, s_lo, s_up = det_closures(cfg, qb, tb, eb)
    FxH, FyH = hyperbolicFlux(qb, p)
    FxD, FyD = diffusiveFlux(qb, tau)
    Fx, Fy = FxH + FxD, FyH + FyD

    nbr = _PREV if d == 1 else _NEXT
    if axis == 1:
        Fn = jnp.stack([Fx[:, (j if j >= 0 else r)]
                        for r, j in enumerate(nbr)], axis=1)
        flux_x = -d * (Fn - Fx)
        flux_y = -d * (jnp.roll(Fy, d, axis=2) - Fy)
    else:
        Fn = jnp.stack([Fy[:, :, (j if j >= 0 else r)]
                        for r, j in enumerate(nbr)], axis=2)
        flux_y = -d * (Fn - Fy)
        flux_x = -d * (jnp.roll(Fx, d, axis=1) - Fx)

    src = source(qb, tb, tau, s_lo, s_up)
    return qb - dt * (flux_x / cfg.dx + flux_y / cfg.dy - src)


def _band_step(cfg, qb, tb, eb, dt, axis):
    """Both passes with refills; returns (pass-1 band, pass-2 band)."""
    d0, d1 = mc_directions(cfg.MC_order)
    qb1 = _refill_band(cfg, _pass_band(cfg, qb, tb, eb, dt, d0, axis), axis)
    qb2 = _refill_band(cfg, _pass_band(cfg, qb1, tb, eb, dt, d1, axis), axis)
    return qb1, qb2


def _band_idx(n):
    return np.array([0, 1, 2, n - 1, n, n + 1])


# ---------------------------------------------------------------------------
# Kernel (boundary layout + side-input ghost refill)
# ---------------------------------------------------------------------------

def _refill_ghosts_mixed(cfg, comps, bs, ny, i_strip, n_strips, per_x,
                         gx, gc):
    """Between-pass ghost refill with evolved P components.

    Same serial fill order as ops.stencil._refill_ghosts; on a mixed edge
    a P component's ghost takes the band-computed pass-1 value: ``gx``
    (3, 8, W) rows 0/1 = evolved xE/xW ghost rows, ``gc`` (3, rows, 128)
    lanes 0/1 = evolved yN/yS ghost columns at this strip's rows.
    """
    W = comps[0].shape[1]
    bc_xE, bc_xW = cfg.bc_edge(0), cfg.bc_edge(1)
    if not per_x:
        adjL = [q[HALO_X, :] for q in comps]
        adjR = [q[HALO_X + bs - 1, :] for q in comps]
        fillL, fillR = [], []
        for c in range(3):
            if bc_xE["P"][c]:
                fillL.append(gx[c, 0, :])
                fillR.append(gx[c, 1, :])
            else:
                fillL.append(2. * bc_xE["val"] - adjL[c]
                             if bc_xE["D"][c] else adjL[c])
                fillR.append(2. * bc_xW["val"] - adjR[c]
                             if bc_xW["D"][c] else adjR[c])
        is_first = i_strip == 0
        is_last = i_strip == n_strips - 1
        comps = [
            jnp.concatenate([
                q[:HALO_X - 1],
                jnp.where(is_first, fL, q[HALO_X - 1, :])[None, :],
                q[HALO_X:HALO_X + bs],
                jnp.where(is_last, fR, q[HALO_X + bs, :])[None, :],
                q[HALO_X + bs + 1:],
            ], axis=0)
            for q, fL, fR in zip(comps, fillL, fillR)
        ]

    bc_yS, bc_yN = cfg.bc_edge(2), cfg.bc_edge(3)
    per_y = all(bc_yS["P"])
    out = []
    for c, q in enumerate(comps):
        if per_y:
            vS = q[:, ny - 1]
            vN = q[:, 0]
        elif bc_yS["P"][c]:
            vN = gc[c, :, 0]
            vS = gc[c, :, 1]
        else:
            vS = (2. * bc_yS["val"] - q[:, 0]) if bc_yS["D"][c] else q[:, 0]
            vN = (2. * bc_yN["val"] - q[:, ny - 1]) if bc_yN["D"][c] \
                else q[:, ny - 1]
        out.append(jnp.concatenate([
            q[:, :ny], vN[:, None], q[:, ny + 1:W - 1], vS[:, None],
        ], axis=1))
    return out


def _kernel_fused_bc_mixed(cfg, bs, ny, n_strips, per_x, d0, d1, emit_delta,
                           dt_ref, q_hbm, st_hbm, gx_hbm, gc_hbm, out_ref,
                           q_loc, st_loc, gx_loc, gc_loc, sems):
    i = pl.program_id(0)
    x0 = pl.multiple_of(i * bs, 8)
    rows = bs + 2 * HALO_X

    cp_q = pltpu.make_async_copy(
        q_hbm.at[:, pl.ds(x0, rows), :], q_loc, sems.at[0])
    cp_s = pltpu.make_async_copy(
        st_hbm.at[:, pl.ds(x0, rows), :], st_loc, sems.at[1])
    cp_gx = pltpu.make_async_copy(gx_hbm, gx_loc, sems.at[2])
    cp_gc = pltpu.make_async_copy(
        gc_hbm.at[:, pl.ds(x0, rows), :], gc_loc, sems.at[3])
    cp_q.start()
    cp_s.start()
    cp_gx.start()
    cp_gc.start()
    cp_q.wait()
    cp_s.wait()
    cp_gx.wait()
    cp_gc.wait()

    dt = dt_ref[0]
    st = tuple(st_loc[c] for c in range(N_STATIC))
    q0_0, q1_0, q2_0 = q_loc[0], q_loc[1], q_loc[2]

    comps = _one_pass_fused(cfg, q0_0, q1_0, q2_0, st, dt, d0)
    comps = _refill_ghosts_mixed(cfg, comps, bs, ny, i, n_strips, per_x,
                                 gx_loc, gc_loc)

    sl = slice(HALO_X, HALO_X + bs)
    if emit_delta:
        u0, u1, u2 = _one_pass_fused(cfg, *comps, st, dt, d1,
                                     return_upd=True)
        out_ref[0] = ((comps[0][sl, :ny] - q0_0[sl, :ny]) - u0[sl, :ny]) / 2.
        out_ref[1] = ((comps[1][sl, :ny] - q1_0[sl, :ny]) - u1[sl, :ny]) / 2.
        out_ref[2] = ((comps[2][sl, :ny] - q2_0[sl, :ny]) - u2[sl, :ny]) / 2.
    else:
        a, b, c = _one_pass_fused(cfg, *comps, st, dt, d1)
        out_ref[0] = (a[sl, :ny] + q0_0[sl, :ny]) / 2.
        out_ref[1] = (b[sl, :ny] + q1_0[sl, :ny]) / 2.
        out_ref[2] = (c[sl, :ny] + q2_0[sl, :ny]) / 2.


# ---------------------------------------------------------------------------
# Driver
# ---------------------------------------------------------------------------

def _row_extend(line, per_x):
    """(3, nx+2, L) serial-height lines -> (3, nx+2*HALO_X, L) kernel rows
    (same row placement as ops.stencil._extend_bc)."""
    inner = line[:, 1:-1]
    if per_x:
        top, bot = inner[:, -HALO_X:], inner[:, :HALO_X]
    else:
        top = jnp.repeat(line[:, :1], HALO_X, axis=1)
        bot = jnp.repeat(line[:, -1:], HALO_X, axis=1)
    return jnp.concatenate([top, inner, bot], axis=1)


def _lo_mask(cfg, nx, ny):
    """Positions whose value survives apply_bcs un-overwritten — i.e.
    where a compensation term accumulates across steps."""
    P_x = cfg.bc_edge(0)["P"]
    P_y = cfg.bc_edge(2)["P"]
    x_mixed, y_mixed = _edge_mixed(cfg, 0), _edge_mixed(cfg, 2)
    m = np.zeros((3, nx + 2, ny + 2), np.float32)
    m[:, 1:-1, 1:-1] = 1.
    for c in range(3):
        if x_mixed and P_x[c]:
            m[c, 0, 1:-1] = m[c, -1, 1:-1] = 1.
        if y_mixed and P_y[c]:
            m[c, 1:-1, 0] = m[c, 1:-1, -1] = 1.
        if x_mixed and y_mixed and P_x[c] and P_y[c]:
            m[c, 0, 0] = m[c, 0, -1] = m[c, -1, 0] = m[c, -1, -1] = 1.
    return m


@lru_cache(maxsize=16)
def make_mixed_loop(cfg, nx, ny, bs=None, dtype=jnp.float32,
                    compensated=False):
    """n-step driver for mixed-edge problems.

    ``loop(q, topo, extra, dt, n_steps) -> q`` on ghost-inclusive arrays
    (same surface as ops.stencil.make_pallas_loop).  The carried state is
    the full ghost-inclusive field: mixed-edge P ghosts are evolved state
    (module docstring).  ``compensated`` Kahan-accumulates the per-step
    increments — the kernel emits the interior delta, the bands emit the
    exact frame delta (g_p2 - g_0 is a same-sign near-equal subtraction),
    and the carry two-sums both, masked to the accumulated positions.
    """
    if not mixed_supported(cfg, ny, nx):
        raise ValueError("mixed-edge Pallas step does not cover this "
                         "configuration (see mixed_supported)")
    if bs is None:
        bs = _auto_bs(nx, ny)
    bs = min(bs, nx)
    assert nx % bs == 0 and bs % 8 == 0, \
        "strip size must divide nx and align to 8"
    n_strips = nx // bs
    rows = bs + 2 * HALO_X
    W = _pad_width(ny)
    d0, d1 = mc_directions(cfg.MC_order)
    per_x = all(cfg.bc_edge(0)["P"])
    x_mixed, y_mixed = _edge_mixed(cfg, 0), _edge_mixed(cfg, 2)
    rows_tot = nx + 2 * HALO_X
    ridx, cidx = _band_idx(nx), _band_idx(ny)

    params = pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024)
    kernel = partial(_kernel_fused_bc_mixed, cfg, bs, ny, n_strips, per_x,
                     d0, d1, compensated)

    def call(q_ext, stat_ext, gx, gc, dt):
        return pl.pallas_call(
            kernel,
            in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                      pl.BlockSpec(memory_space=pl.ANY),
                      pl.BlockSpec(memory_space=pl.ANY),
                      pl.BlockSpec(memory_space=pl.ANY),
                      pl.BlockSpec(memory_space=pl.ANY)],
            out_specs=pl.BlockSpec((3, bs, ny), lambda i: (0, i, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((3, nx, ny), dtype),
            scratch_shapes=[
                pltpu.VMEM((3, rows, W), dtype),
                pltpu.VMEM((N_STATIC, rows, W), dtype),
                pltpu.VMEM((3, 8, W), dtype),
                pltpu.VMEM((3, rows, 128), dtype),
                pltpu.SemaphoreType.DMA((4,)),
            ],
            grid=(n_strips,),
            compiler_params=params,
        )(dt, q_ext, stat_ext, gx, gc)

    def to_W(lines):
        """(3, k, ny+2) serial-width rows -> (3, k, W) kernel lanes."""
        pad = jnp.zeros((3, lines.shape[1], W - ny - 2), dtype)
        return jnp.concatenate(
            [lines[:, :, 1:ny + 1], lines[:, :, ny + 1:], pad,
             lines[:, :, :1]], axis=2)

    zeros_gx = jnp.zeros((3, 8, W), dtype)
    zeros_gc = jnp.zeros((3, rows_tot, 128), dtype)
    mask = jnp.asarray(_lo_mask(cfg, nx, ny)) if compensated else None

    @partial(jax.jit, static_argnames=("n_steps",))
    def loop(q, topo, extra, dt, n_steps):
        q = apply_bcs(q.astype(dtype), cfg)
        topo32, extra32 = topo.astype(dtype), extra.astype(dtype)
        dtv = jnp.asarray(dt, dtype)
        stat_ext = _statics_ghosted(_extend_bc(topo32[:3], per_x, W),
                                    _extend_bc(extra32, per_x, W))
        tb_x, eb_x = topo32[:, ridx, :], extra32[:, ridx, :]
        tb_y, eb_y = topo32[:, :, cidx], extra32[:, :, cidx]

        def frame(q_g):
            """Band evolution: side inputs + new/delta ghost lines."""
            gx_in, gc_in = zeros_gx, zeros_gc
            rows_new = rows_d = cols_new = cols_d = None
            if x_mixed:
                qb1, qb2 = _band_step(cfg, q_g[:, ridx, :], tb_x, eb_x,
                                      dtv, 1)
                gx_in = jnp.zeros((3, 8, W), dtype).at[:, :2].set(
                    to_W(qb1[:, (0, 5), :]))
                rows_new = (qb2[:, (0, 5)] + q_g[:, (0, -1)]) / 2.
                rows_d = (qb2[:, (0, 5)] - q_g[:, (0, -1)]) / 2.
            if y_mixed:
                qb1, qb2 = _band_step(cfg, q_g[:, :, cidx], tb_y, eb_y,
                                      dtv, 2)
                gc_lines = jnp.stack([qb1[:, :, 5], qb1[:, :, 0]], axis=2)
                gc_in = jnp.pad(_row_extend(gc_lines, per_x),
                                ((0, 0), (0, 0), (0, 126)))
                cols_new = (qb2[:, :, (0, 5)] + q_g[:, :, (0, -1)]) / 2.
                cols_d = (qb2[:, :, (0, 5)] - q_g[:, :, (0, -1)]) / 2.
            return gx_in, gc_in, rows_new, rows_d, cols_new, cols_d

        if compensated:
            def body(i, carry):
                q_g, lo = carry
                gx_in, gc_in, _, rows_d, _, cols_d = frame(q_g)
                delta = call(_extend_bc(q_g, per_x, W), stat_ext,
                             gx_in, gc_in, dtv[None])
                dq = jnp.zeros_like(q_g).at[:, 1:-1, 1:-1].set(delta)
                if y_mixed:
                    dq = dq.at[:, :, 0].set(cols_d[:, :, 0])
                    dq = dq.at[:, :, -1].set(cols_d[:, :, 1])
                if x_mixed:
                    dq = dq.at[:, 0].set(rows_d[:, 0])
                    dq = dq.at[:, -1].set(rows_d[:, 1])
                y = dq + lo
                t = q_g + y
                return apply_bcs(t, cfg), (y - (t - q_g)) * mask

            q_g, _ = jax.lax.fori_loop(
                0, n_steps, body, (q, jnp.zeros_like(q)))
        else:
            def body(i, q_g):
                gx_in, gc_in, rows_new, _, cols_new, _ = frame(q_g)
                q_int = call(_extend_bc(q_g, per_x, W), stat_ext,
                             gx_in, gc_in, dtv[None])
                qn = jnp.zeros_like(q_g).at[:, 1:-1, 1:-1].set(q_int)
                if y_mixed:
                    qn = qn.at[:, :, 0].set(cols_new[:, :, 0])
                    qn = qn.at[:, :, -1].set(cols_new[:, :, 1])
                if x_mixed:
                    qn = qn.at[:, 0].set(rows_new[:, 0])
                    qn = qn.at[:, -1].set(rows_new[:, 1])
                return apply_bcs(qn, cfg)

            q_g = jax.lax.fori_loop(0, n_steps, body, q)
        return q_g

    return loop
