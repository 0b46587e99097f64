"""Fused Pallas TPU kernel for the MacCormack timestep (periodic BCs).

One kernel invocation computes BOTH MacCormack passes and the temporal
average for a row strip: the strip (plus halos) is DMA'd from HBM into
VMEM once, every intermediate (pressure, wall/bulk stresses, fluxes) lives
in VMEM, and only the final averaged strip goes back to HBM.  This removes
the intermediate HBM round-trips of the XLA path (which materializes the
per-pass state between fusions).

Decomposition: strips along x (the sublane dimension).  Mosaic requires
HBM<->VMEM slice shapes and offsets aligned to the (8, 128) tile, so
strips carry an 8-cell x-halo (2 needed by the two passes, the rest
alignment padding; 8 also makes every DMA offset tile-aligned).  The y
axis is kept whole and un-haloed: with periodic boundaries the in-kernel
roll over the full width IS the periodic wrap, so y needs no ghost data
(requires ny to be a multiple of 128).

The n-step loop escalates through these layouts (fastest that fits):

1. whole-run-in-VMEM: the halo-extended state ping-pongs between two
   VMEM-resident buffers with the statics also VMEM-resident; the entire
   n-step loop touches HBM exactly twice (~15e9 cell-updates/s at 1024^2
   on one v5e chip — pure VPU compute);
2. whole-run HBM ping-pong (_kernel_fused_hbm_loop / _kernel_fused_bc_hbm):
   grid = (n_sweeps, n_strips), K_MULTI temporal-blocked steps per strip
   sweep with double-buffered DMA, state ping-ponging between two HBM
   buffers — the entire loop in ONE pallas_call (~11.4e9 at 2048^2;
   in-kernel Kahan variant for compensated f32 runs);
3. extended-array carry (_kernel_fused_ext): per-step kernel that
   maintains its own halos (remainder steps of 2.);
4. interior carry with a per-step extension pass (compensated-remainder
   and boundary-condition one-step variants).

The kernel is VPU-bound, so the hot path uses the hand-factored closures
(gapflow_tpu.models.closures_opt) with all static per-cell factors
(1/h, 1/(4Ls+h), ...) precomputed once per run — one dynamic reciprocal
per cell remains.  Equivalence with the sympy-generated expressions is
asserted by tests/test_closures_opt.py; equivalence of the kernel with
the XLA fused step by tests/test_pallas.py.

Scope: fully periodic boundaries (the production large-grid case: journal
and asperity topographies) and per-edge uniform Dirichlet/Neumann edges,
with any EOS, optional piezoviscosity, and optional shear thinning (both
per-cell eta in-kernel).  Thinning routes through the ghost-explicit
layout: np.gradient's one-sided stencils AT the ghost rows/cols — the
reference semantics — sit at fixed local positions (_thinning_eta), and
periodic x edges add the seam-crossing flux correction of _seam_patch
(the ghost one-sided eta reaches interior cells only through the bulk
stress consumed across the wrap).
"""

from functools import lru_cache, partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..core.integrate import hyperbolicFlux, diffusiveFlux, source
from ..core.step import det_closures, mc_directions
from ..models.eos import eos_pressure
from ..models.viscosity import piezoviscosity
from ..models.closures_opt import (fused_pass_top_pre, precompute_statics,
                                   N_STATIC)

HALO_X = 8   # 2 physics cells + alignment padding (tile-aligned DMA offsets)
K_MULTI = HALO_X // 2   # steps per sweep of the temporal-blocked kernel


def _fully_periodic(cfg):
    return all(all(dict(cfg.bc[i])["P"]) for i in range(4))


def _edges_uniform(cfg):
    """Every edge is either fully periodic or has no periodic component.

    Mixed P/D components on one edge keep the serial quirk of leaving the
    periodic component's ghost stale; the kernel does not reproduce that.
    """
    for i in range(4):
        P = dict(cfg.bc[i])["P"]
        if any(P) and not all(P):
            return False
    return True


def pallas_supported(cfg, ny=128):
    """Kernel coverage: static pass order, lane-aligned width, and edge
    specs that are per-edge uniformly periodic or non-periodic.

    Piezoviscosity is purely elementwise and runs in-kernel exactly.
    Shear thinning runs in-kernel through the ghost-explicit layout: its
    shear rate comes from np.gradient of the pressure over the
    ghost-INCLUSIVE array (reference semantics,
    core.step.effective_viscosity), whose one-sided stencils sit AT the
    ghost rows/cols.  Non-periodic x edges and the y ghost cols are fixed
    positions in that layout, reproduced exactly by :func:`_thinning_eta`;
    periodic x edges reduce to a seam-crossing flux correction at the two
    wrap rows (:func:`_seam_patch`) — the serial rewrap's ghost values are
    the wrap halo itself, and only the ghost's one-sided eta reaches
    interior cells, through the bulk stress consumed across the seam.
    """
    return (cfg.MC_order != 0 and ny % 128 == 0 and _edges_uniform(cfg))


def _k_steps(cfg):
    """Temporal-blocking depth: halo consumption per inter-strip edge is
    2 rows/step (1 per one-sided pass), doubled by shear thinning (the
    per-cell viscosity reads p at +-1 rows)."""
    return K_MULTI // 2 if cfg.thinning is not None else K_MULTI


# ---------------------------------------------------------------------------
# Pass bodies
# ---------------------------------------------------------------------------

def _eta_fused(cfg, rho, p):
    """Per-cell shear viscosity for the fused kernels (piezoviscous or
    constant).  Elementwise, so it matches core.step.effective_viscosity
    exactly for ``cfg.thinning is None``; the cavitation mixture models
    (Dukler/McAdams, paired with the Bayada EOS) take density instead of
    pressure, as in the reference (GaPFlow/models/stress.py:306-331)."""
    if cfg.piezo is None:
        return cfg.shear
    arg = rho if cfg.prop["EOS"] == "Bayada" else p
    return piezoviscosity(arg, cfg.shear, dict(cfg.piezo))


def _thinning_eta(cfg, p, mu0, st, thin):
    """Shear-thinning viscosity with the serial np.gradient semantics.

    core.step.effective_viscosity computes the mean shear rate from
    jnp.gradient of p over the ghost-INCLUSIVE array: centered differences
    everywhere except the array-edge rows/cols — which are the ghost
    rows/cols — where the stencil is one-sided.  In the ghost-explicit
    kernel layout those edges sit at fixed local positions (x ghost row
    HALO_X-1 of the first strip / HALO_X+bs of the last; y ghost cols ny
    and W-1), so the kernel reproduces the reference field exactly:
    centered rolls plus one-sided overwrites at the ghost positions.
    Note the one-sided x form only references the ghost and its adjacent
    interior row, so domain-edge strips keep consuming no halo.

    Periodic x (``per_x``): there are no x ghost slots — the wrap halo IS
    the serial ghost copy, and the centered rolls over it reproduce the
    interior eta exactly (the serial central stencil at the seam reads the
    rewrapped ghost, i.e. the remote interior value the halo holds).  The
    serial ghosts' ONE-SIDED eta affects interior cells only through the
    seam-crossing flux difference, handled by :func:`_seam_patch`.

    thin = (bs, ny, is_first, is_last, per_x); bs/ny/per_x static,
    is_* traced bools.
    """
    from ..models.viscosity import shear_rate_avg, shear_thinning_factor

    bs, ny, is_first, is_last, per_x = thin
    rows, W = p.shape
    rdx = 1. / cfg.dx
    rdy = 1. / cfg.dy

    p_up = pltpu.roll(p, rows - 1, axis=0)   # p[i+1]
    p_dn = pltpu.roll(p, 1, axis=0)          # p[i-1]
    dpx = (p_up - p_dn) * (0.5 * rdx)
    if not per_x:
        ridx = jax.lax.broadcasted_iota(jnp.int32, p.shape, 0)
        dpx = jnp.where(is_first & (ridx == HALO_X - 1),
                        (p_up - p) * rdx, dpx)
        dpx = jnp.where(is_last & (ridx == HALO_X + bs),
                        (p - p_dn) * rdx, dpx)

    p_r = pltpu.roll(p, W - 1, axis=1)       # p[:, j+1] (wraps at seam)
    p_l = pltpu.roll(p, 1, axis=1)           # p[:, j-1]
    dpy = (p_r - p_l) * (0.5 * rdy)
    cidx = jax.lax.broadcasted_iota(jnp.int32, p.shape, 1)
    dpy = jnp.where(cidx == ny, (p - p_l) * rdy, dpy)       # N ghost col
    dpy = jnp.where(cidx == W - 1, (p_r - p) * rdy, dpy)    # S ghost col

    H = st[2]
    rate = shear_rate_avg(dpx, dpy, H, cfg.U, cfg.V, mu0)
    return mu0 * shear_thinning_factor(rate, mu0, dict(cfg.thinning))


def _seam_patch(cfg, us, p, mu0, st, comps, tb_c, d, dt, thin):
    """Periodic-x seam correction for shear thinning (ghost one-sided eta).

    The serial scheme keeps explicit x ghost rows: ghost = rewrapped copy
    of the remote seam interior, but with ONE-SIDED np.gradient eta —
    dpx_g = (p[int 0] - p[int nx-1]) / dx at BOTH ghosts.  In the wrap-halo
    layout the ghost q/p/H values are automatic (the halo holds the remote
    copy), so the only divergence from translation invariance is the bulk
    stress consumed ACROSS the seam by the one-sided flux difference:
    update[j] -= -d (F[j-d] - F[j]) / dx, so for d=+1 the row holding
    int 0 consumes tb_* of int nx-1 evaluated at ghost eta (serial row 1
    reading ghost row 0), and for d=-1 the row holding int nx-1 consumes
    tb_* of int 0 at ghost eta (serial row nx reading ghost row nx+1).
    Everything else (hyperbolic p/q, sources, interior eta) already
    matches, so the patch adds dt * (-d)/dx * (tb_g - tb_central) of the
    seam NEIGHBOR row to u1/u2 of the seam CONSUMER row.

    Patched at both seam images (global int 0 / int nx-1 appear at local
    rows H-1, H of the first strip and H+bs-1, H+bs of the last), keeping
    the temporally-blocked halo evolution exact: the halo rows mirror the
    remote interior only if they evolve under the same seam rule.
    """
    from ..models.viscosity import shear_rate_avg, shear_thinning_factor
    from ..models.closures_opt import bulk_stress_pre

    bs, ny, is_first, is_last, per_x = thin
    if not per_x:
        return us

    u1, u2 = us
    rdx = 1. / cfg.dx
    rdy = 1. / cfg.dy
    W = p.shape[1]
    ridx = jax.lax.broadcasted_iota(jnp.int32, u1.shape, 0)
    cidx = jax.lax.broadcasted_iota(jnp.int32, (1, W), 1)

    def row(arr, i):
        return arr[i:i + 1, :]

    for base, gate in ((HALO_X, is_first), (HALO_X + bs, is_last)):
        # seam between local rows base-1 (int nx-1) and base (int 0)
        r = base if d == 1 else base - 1          # consumer row
        n = r - d                                  # neighbor (ghost image)

        p_n = row(p, n)
        dpx_g = (row(p, base) - row(p, base - 1)) * rdx
        # central dpy on the neighbor row (ghost cols one-sided, unused
        # by interior consumers; cheap to keep exact anyway)
        p_r = pltpu.roll(p_n, W - 1, axis=1)
        p_l = pltpu.roll(p_n, 1, axis=1)
        dpy_g = (p_r - p_l) * (0.5 * rdy)
        dpy_g = jnp.where(cidx == ny, (p_n - p_l) * rdy, dpy_g)
        dpy_g = jnp.where(cidx == W - 1, (p_r - p_n) * rdy, dpy_g)

        mu0_n = row(mu0, n) if hasattr(mu0, "shape") and mu0.ndim == 2 \
            else mu0
        st_n = tuple(row(s, n) for s in st)
        H_n = st_n[2]
        rate = shear_rate_avg(dpx_g, dpy_g, H_n, cfg.U, cfg.V, mu0_n)
        eta_g = mu0_n * shear_thinning_factor(rate, mu0_n,
                                              dict(cfg.thinning))

        q0_n, q1_n, q2_n = (row(c, n) for c in comps)
        tb_xx_g, _, tb_xy_g = bulk_stress_pre(q0_n, q1_n, q2_n, st_n,
                                              cfg.U, cfg.V, eta_g, cfg.bulk)
        # central-eta values the main pass actually used (sliced, not
        # recomputed, so the replacement cancels exactly)
        tb_xx_c = row(tb_c[0], n)
        tb_xy_c = row(tb_c[2], n)

        corr = dt * (-d) * rdx
        mask = gate & (ridx == r)
        u1 = jnp.where(mask, u1 + corr * (tb_xx_g - tb_xx_c), u1)
        u2 = jnp.where(mask, u2 + corr * (tb_xy_g - tb_xy_c), u2)

    return u1, u2


def _one_pass_fused(cfg, q0, q1, q2, st, dt, d, return_upd=False,
                    thin=None):
    """Newtonian/piezoviscous/shear-thinning hot path: factored closures +
    precomputed statics, unstacked component updates.  ``return_upd``
    returns the raw update terms ``u`` (with ``q_new = q - u``) instead of
    the updated state — used by the delta-emitting kernels, where the
    small ``u`` must not be rounded into the large absolute state.
    ``thin`` (ghost-explicit layouts only) enables in-kernel shear
    thinning — see :func:`_thinning_eta`."""
    p = eos_pressure(q0, cfg.prop)
    mu0 = _eta_fused(cfg, q0, p)
    eta = mu0
    if cfg.thinning is not None:
        assert thin is not None, \
            "thinning requires the ghost-explicit kernel layout"
        eta = _thinning_eta(cfg, p, mu0, st, thin)
    tb_xx, tb_yy, tb_xy, S0, S1, S2 = fused_pass_top_pre(
        q0, q1, q2, st, cfg.U, cfg.V, eta, cfg.bulk)

    rdx = 1. / cfg.dx
    rdy = 1. / cfg.dy

    def ddx(F):
        return -d * (pltpu.roll(F, d % F.shape[0], axis=0) - F) * rdx

    def ddy(F):
        return -d * (pltpu.roll(F, d % F.shape[1], axis=1) - F) * rdy

    u0 = dt * (ddx(q1) + ddy(q2) - S0)
    u1 = dt * (ddx(p + tb_xx) + ddy(tb_xy) - S1)
    u2 = dt * (ddx(tb_xy) + ddy(p + tb_yy) - S2)
    if cfg.thinning is not None and thin[4]:
        u1, u2 = _seam_patch(cfg, (u1, u2), p, mu0, st, (q0, q1, q2),
                             (tb_xx, tb_yy, tb_xy), d, dt, thin)
    if return_upd:
        return u0, u1, u2
    return q0 - u0, q1 - u1, q2 - u2


# ---------------------------------------------------------------------------
# Boundary-capable variant (explicit ghost rows/cols)
# ---------------------------------------------------------------------------
#
# Non-periodic edges need ghost refills BETWEEN the two passes, which is
# local information: a Dirichlet/Neumann ghost depends only on the adjacent
# interior cell.  Layout trick for the lane (y) axis: ghost columns live at
# index ny (right/North) and index W-1 (left/South) of a 128-aligned width
# W >= ny+2, so the in-kernel rolls pick them up exactly like a periodic
# wrap — col 0's left neighbor IS col W-1 — and only the ghost/padding
# columns (refilled or ignored) ever see garbage.

def _pad_width(ny):
    return ((ny + 2 + 127) // 128) * 128


def _ghost_row(bc, adj):
    """Ghost values (3, W) for one x edge from its per-component masks."""
    rows = []
    for c in range(3):
        if bc["D"][c]:
            rows.append(2. * bc["val"] - adj[c])
        elif bc["N"][c]:
            rows.append(adj[c])
        else:            # uniform edges: P never reaches the refill path
            rows.append(adj[c])
    return rows


def _refill_ghosts(cfg, comps, bs, ny, i_strip, n_strips):
    """Refill ghost rows/cols of the (3, rows, W) pass output in the serial
    fill order (x edges, then y edges so corners take the y value)."""
    q0, q1, q2 = comps
    W = q0.shape[1]

    bc_xE, bc_xW = cfg.bc_edge(0), cfg.bc_edge(1)
    if not all(bc_xE["P"]):
        adjL = [q[HALO_X, :] for q in comps]          # first interior row
        adjR = [q[HALO_X + bs - 1, :] for q in comps]  # last interior row
        fillL = _ghost_row(bc_xE, adjL)
        fillR = _ghost_row(bc_xW, adjR)
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
    out = []
    for c, q in enumerate(comps):
        # South ghost lives at col W-1 (left neighbor of col 0)
        if bc_yS["P"][c]:
            vS = q[:, ny - 1]
            vN = q[:, 0]
        else:
            vS = (2. * bc_yS["val"] - q[:, 0]) if bc_yS["D"][c] else q[:, 0]
            vN = (2. * bc_yN["val"] - q[:, ny - 1]) if bc_yN["D"][c] \
                else q[:, ny - 1]
        out.append(jnp.concatenate([
            q[:, :ny], vN[:, None], q[:, ny + 1:W - 1], vS[:, None],
        ], axis=1))
    return out


def _kernel_fused_bc(cfg, bs, ny, n_strips, per_x, d0, d1, emit_delta,
                     dt_ref, q_hbm, st_hbm, out_ref, q_loc, st_loc, sems):
    i = pl.program_id(0)
    x0 = pl.multiple_of(i * bs, 8)
    rows = bs + 2 * HALO_X

    cp_q = pltpu.make_async_copy(
        q_hbm.at[:, pl.ds(x0, rows), :], q_loc, sems.at[0])
    cp_s = pltpu.make_async_copy(
        st_hbm.at[:, pl.ds(x0, rows), :], st_loc, sems.at[1])
    cp_q.start()
    cp_s.start()
    cp_q.wait()
    cp_s.wait()

    dt = dt_ref[0]
    st = tuple(st_loc[c] for c in range(N_STATIC))
    q0_0, q1_0, q2_0 = q_loc[0], q_loc[1], q_loc[2]
    thin = (bs, ny, i == 0, i == n_strips - 1, per_x) \
        if cfg.thinning is not None else None

    comps = _one_pass_fused(cfg, q0_0, q1_0, q2_0, st, dt, d0, thin=thin)
    comps = _refill_ghosts(cfg, comps, bs, ny, i, n_strips)

    sl = slice(HALO_X, HALO_X + bs)
    if emit_delta:
        # the refill touches ghost rows/cols only, so the interior slice of
        # comps is still the Sterbenz-exact predictor state
        u0, u1, u2 = _one_pass_fused(cfg, *comps, st, dt, d1,
                                     return_upd=True, thin=thin)
        out_ref[0] = ((comps[0][sl, :ny] - q0_0[sl, :ny]) - u0[sl, :ny]) / 2.
        out_ref[1] = ((comps[1][sl, :ny] - q1_0[sl, :ny]) - u1[sl, :ny]) / 2.
        out_ref[2] = ((comps[2][sl, :ny] - q2_0[sl, :ny]) - u2[sl, :ny]) / 2.
    else:
        a, b, c = _one_pass_fused(cfg, *comps, st, dt, d1, thin=thin)
        out_ref[0] = (a[sl, :ny] + q0_0[sl, :ny]) / 2.
        out_ref[1] = (b[sl, :ny] + q1_0[sl, :ny]) / 2.
        out_ref[2] = (c[sl, :ny] + q2_0[sl, :ny]) / 2.


def _refill_ghosts_shard(cfg, comps, bs, ny, i_strip, n_strips, flags):
    """Shard-aware :func:`_refill_ghosts`: the same serial fill order and
    formulas, but every refill additionally gates on the shard holding
    that DOMAIN edge (``flags`` = traced (xe, xw, yn, ys) booleans).
    Non-edge shards keep their halo values — which pass 1 evolved exactly
    like the neighbor's interior, the periodic-layout invariant."""
    q0, q1, q2 = comps
    W = q0.shape[1]
    xe, xw, yn, ys = flags

    bc_xE, bc_xW = cfg.bc_edge(0), cfg.bc_edge(1)
    if not all(bc_xE["P"]):
        adjL = [q[HALO_X, :] for q in comps]
        adjR = [q[HALO_X + bs - 1, :] for q in comps]
        fillL = _ghost_row(bc_xE, adjL)
        fillR = _ghost_row(bc_xW, adjR)
        is_first = (i_strip == 0) & xe
        is_last = (i_strip == n_strips - 1) & xw
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
    if all(bc_yS["P"]):
        return comps
    out = []
    for c, q in enumerate(comps):
        # in the wrap shard layout: col ny = E1 (North ghost slot on the
        # yN-edge shard), col W-1 = W1 (South ghost slot on yS-edge)
        vS = (2. * bc_yS["val"] - q[:, 0]) if bc_yS["D"][c] else q[:, 0]
        vN = (2. * bc_yN["val"] - q[:, ny - 1]) if bc_yN["D"][c] \
            else q[:, ny - 1]
        vN = jnp.where(yn, vN, q[:, ny])
        vS = jnp.where(ys, vS, q[:, W - 1])
        out.append(jnp.concatenate([
            q[:, :ny], vN[:, None], q[:, ny + 1:W - 1], vS[:, None],
        ], axis=1))
    return out


def _kernel_fused_bc_shard(cfg, bs, by, n_strips, d0, d1,
                           dt_ref, flags_ref, q_hbm, st_hbm, out_ref,
                           q_loc, st_loc, sems):
    """One MacCormack step of a SHARD block in the wrap layout with
    domain-edge D/N ghost handling (parallel.pallas_halo's non-periodic
    scope).  Identical to :func:`_kernel_fused_bc` except the ghost
    refill gates on the shard's edge flags (SMEM) and the layout is the
    2-deep wrap layout: edge-shard halo slots arrive pre-filled with the
    serial ghost values (the XLA exchange overrides the ppermute wrap),
    the inter-pass refill recomputes them from the pass-1 state, and the
    junk halo depth never reaches a valid output in two passes."""
    i = pl.program_id(0)
    x0 = pl.multiple_of(i * bs, 8)
    rows = bs + 2 * HALO_X

    cp_q = pltpu.make_async_copy(
        q_hbm.at[:, pl.ds(x0, rows), :], q_loc, sems.at[0])
    cp_s = pltpu.make_async_copy(
        st_hbm.at[:, pl.ds(x0, rows), :], st_loc, sems.at[1])
    cp_q.start()
    cp_s.start()
    cp_q.wait()
    cp_s.wait()

    dt = dt_ref[0]
    flags = tuple(flags_ref[c] != 0 for c in range(4))
    st = tuple(st_loc[c] for c in range(N_STATIC))
    q0_0, q1_0, q2_0 = q_loc[0], q_loc[1], q_loc[2]

    comps = _one_pass_fused(cfg, q0_0, q1_0, q2_0, st, dt, d0)
    comps = _refill_ghosts_shard(cfg, comps, bs, by, i, n_strips, flags)

    sl = slice(HALO_X, HALO_X + bs)
    a, b, c = _one_pass_fused(cfg, *comps, st, dt, d1)
    out_ref[0] = (a[sl] + q0_0[sl]) / 2.
    out_ref[1] = (b[sl] + q1_0[sl]) / 2.
    out_ref[2] = (c[sl] + q2_0[sl]) / 2.


def make_bc_shard_call(cfg, bx, by, W, bs=None, dtype=jnp.float32):
    """Raw pallas_call for :func:`_kernel_fused_bc_shard`:
    ``call(q_ext (3, bx+2H, W), stat_ext, dt (1,), flags (4,) int32) ->
    (3, bx, W)``."""
    if bs is None:
        bs = _auto_bs(bx, W)
    bs = min(bs, bx)
    assert bx % bs == 0 and bs % 8 == 0
    rows = bs + 2 * HALO_X
    d0, d1 = mc_directions(cfg.MC_order)
    kern = partial(_kernel_fused_bc_shard, cfg, bs, by, bx // bs, d0, d1)

    def call(q_ext, stat_ext, dt, flags):
        return pl.pallas_call(
            kern,
            in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                      pl.BlockSpec(memory_space=pltpu.SMEM),
                      pl.BlockSpec(memory_space=pl.ANY),
                      pl.BlockSpec(memory_space=pl.ANY)],
            out_specs=pl.BlockSpec((3, bs, W), lambda i: (0, i, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((3, bx, W), dtype),
            scratch_shapes=[
                pltpu.VMEM((3, rows, W), dtype),
                pltpu.VMEM((N_STATIC, rows, W), dtype),
                pltpu.SemaphoreType.DMA((2,)),
            ],
            grid=(bx // bs,),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024),
        )(dt, flags, q_ext, stat_ext)

    return call


def _advance_plain(cfg, k, d0, d1, chs, st, dt):
    """k MacCormack steps on a 3-channel strip (plain accumulation)."""
    q0, q1, q2 = chs
    for _ in range(k):
        a, b, c = _one_pass_fused(cfg, q0, q1, q2, st, dt, d0)
        a, b, c = _one_pass_fused(cfg, a, b, c, st, dt, d1)
        q0 = (a + q0) / 2.
        q1 = (b + q1) / 2.
        q2 = (c + q2) / 2.
    return q0, q1, q2


def _advance_comp(cfg, k, d0, d1, chs, st, dt):
    """k steps on a 6-channel (q, q_lo) strip with in-kernel Kahan
    accumulation: the step increment is formed at full relative precision
    (((q* - q) - u)/2, Sterbenz-exact predictor difference) and two-summed
    into the carry — the same arithmetic, in the same order, as the
    per-step emit_delta kernel + host Kahan update in make_pallas_loop
    (equality to f32 rounding; tests/test_pallas.py)."""
    q0, q1, q2, l0, l1, l2 = chs
    for _ in range(k):
        a, b, c = _one_pass_fused(cfg, q0, q1, q2, st, dt, d0)
        u0, u1, u2 = _one_pass_fused(cfg, a, b, c, st, dt, d1,
                                     return_upd=True)
        outs = []
        for q, pred, u, lo in ((q0, a, u0, l0), (q1, b, u1, l1),
                               (q2, c, u2, l2)):
            delta = ((pred - q) - u) / 2.
            y = delta + lo
            t = q + y
            outs.append((t, y - (t - q)))
        (q0, l0), (q1, l1), (q2, l2) = outs
    return q0, q1, q2, l0, l1, l2


def _hbm_schedule(n_strips, n_sweeps, q_hbm, outA, outB,
                  start_in, wait_in, out_copy, compute, store,
                  halo_writes):
    """Shared scheduling skeleton of the whole-run HBM ping-pong kernels.

    Grid = (n_sweeps, n_strips), iterated sequentially, sweep-major.
    Sweep s reads q_hbm (s=0) or the previous sweep's write buffer, and
    writes outA for even s, outB for odd s.  Inputs and outputs are
    double-buffered by global iteration parity g = s*n_strips + i.

    Synchronization invariants:
    - input slot g%2 is overwritten by the prefetch issued at iteration
      g-1, whose previous occupant (g-2) was consumed at g-2;
    - within a sweep, iteration (s,i) top-prefetches (s,i+1) from the
      stable read buffer ((s,0)/(s,1) are covered by the g==0 block or
      the previous sweep's drain);
    - the LAST strip of each sweep drains all outstanding output DMAs,
      then prefetches (s+1, 0)/(s+1, 1) from the just-completed write
      buffer, so cross-sweep reads never race writes;
    - out DMA of (s,j) is waited at (s,j+2) before its slot's reuse for
      j <= n_strips-3, and by the sweep drain for the last two strips.

    Callbacks (slot is a static python int, i/strip indices traced):
    - start_in(slot, src_ref, strip): start the input DMAs for a strip;
    - wait_in(slot): wait them;
    - out_copy(slot, dst_ref, strip): the output DMA descriptor;
    - compute(slot): k-step advance of the strip, returns channel arrays;
    - store(slot, chs): write them into the out staging buffer;
    - halo_writes(slot, with_dst): first/last-strip halo block writes
      (internally gated on the strip index).
    """
    s = pl.program_id(0)
    i = pl.program_id(1)
    g = s * n_strips + i

    def wait_out(slot):
        out_copy(slot, outA, 0).wait()

    def with_src(fn):
        """Run fn(read_buffer) under the sweep-parity dispatch."""
        @pl.when(s == 0)
        def _():
            fn(q_hbm)

        @pl.when((s > 0) & (s % 2 == 1))
        def _():
            fn(outA)

        @pl.when((s > 0) & (s % 2 == 0))
        def _():
            fn(outB)

    def with_dst(fn):
        @pl.when(s % 2 == 0)
        def _():
            fn(outA)

        @pl.when(s % 2 == 1)
        def _():
            fn(outB)

    # --- input prefetches -------------------------------------------------
    @pl.when(g == 0)
    def _():
        start_in(0, q_hbm, 0)
        if n_strips > 1:
            start_in(1, q_hbm, 1)

    if n_strips > 2:
        @pl.when((i >= 1) & (i + 1 < n_strips) & (g % 2 == 0))
        def _():
            with_src(lambda src: start_in(1, src, i + 1))

        @pl.when((i >= 1) & (i + 1 < n_strips) & (g % 2 == 1))
        def _():
            with_src(lambda src: start_in(0, src, i + 1))

    def advance(slot):
        wait_in(slot)
        chs = compute(slot)

        # slot-reuse guard: this slot's previous out DMA (iteration g-2,
        # same sweep -- cross-sweep ones were drained at the boundary)
        @pl.when(i >= 2)
        def _():
            wait_out(slot)

        store(slot, chs)
        with_dst(lambda dst: out_copy(slot, dst, i).start())
        halo_writes(slot, with_dst)

        # sweep-boundary drain + cross-sweep prefetch
        @pl.when(i == n_strips - 1)
        def _():
            wait_out(slot)
            if n_strips > 1:
                wait_out(1 - slot)

            @pl.when(s + 1 < n_sweeps)
            def _():
                # (s+1, 0) lands in slot (g+1)%2 = 1-slot, (s+1, 1) back
                # in this slot (whose compute is done)
                with_dst(lambda dst: start_in(1 - slot, dst, 0))
                if n_strips > 1:
                    with_dst(lambda dst: start_in(slot, dst, 1))

    @pl.when(g % 2 == 0)
    def _():
        advance(0)

    @pl.when(g % 2 == 1)
    def _():
        advance(1)


def _kernel_fused_hbm_loop(cfg, bs, nx, n_strips, n_sweeps, k, d0, d1,
                           advance_chs, nch,
                           dt_ref, q_hbm, st_hbm, outA, outB,
                           q_loc, st_loc, out_loc, sems):
    """Whole-run temporal-blocked variant for VMEM-exceeding grids: the
    full n_sweeps*k-step loop runs in ONE pallas_call, ping-ponging the
    halo-extended state between two HBM buffers.  Each (sweep, strip)
    grid cell advances its strip k steps in VMEM (trapezoid tiling: each
    one-sided pass corrupts one more row inward from the strip edge, so
    the bs-row interior stays exact for 2k <= HALO_X), double-buffered
    per :func:`_hbm_schedule`.

    Why one call: besides kernel-launch overhead, a lax.fori_loop of
    pallas_calls pays a fixed per-iteration dispatch cost (milliseconds
    through a tunneled device) that dominates the actual sweep time at
    2048^2; folding the loop into the grid pays it once per run.
    """
    i = pl.program_id(1)
    rows = bs + 2 * HALO_X
    dt = dt_ref[0]

    def start_in(slot, src, strip):
        x0 = pl.multiple_of(strip * bs, 8)
        pltpu.make_async_copy(src.at[:, pl.ds(x0, rows), :],
                              q_loc.at[slot], sems.at[slot]).start()
        pltpu.make_async_copy(st_hbm.at[:, pl.ds(x0, rows), :],
                              st_loc.at[slot], sems.at[2 + slot]).start()

    def wait_in(slot):
        # reconstructed descriptors: .wait() only needs the transfer size
        pltpu.make_async_copy(q_hbm.at[:, pl.ds(0, rows), :],
                              q_loc.at[slot], sems.at[slot]).wait()
        pltpu.make_async_copy(st_hbm.at[:, pl.ds(0, rows), :],
                              st_loc.at[slot], sems.at[2 + slot]).wait()

    def out_copy(slot, dst, strip):
        x0 = pl.multiple_of(strip * bs, 8)
        return pltpu.make_async_copy(
            out_loc.at[slot],
            dst.at[:, pl.ds(HALO_X + x0, bs), :], sems.at[4 + slot])

    def compute(slot):
        st = tuple(st_loc[slot, c] for c in range(N_STATIC))
        chs = tuple(q_loc[slot, c] for c in range(nch))
        return advance_chs(cfg, k, d0, d1, chs, st, dt)

    def store(slot, chs):
        sl = slice(HALO_X, HALO_X + bs)
        for c in range(nch):
            out_loc[slot, c] = chs[c][sl]

    def halo_writes(slot, with_dst):
        # periodic halo images (tiny transfers, waited inline): interior
        # rows [0, H) -> top halo, interior rows [nx-H, nx) -> bottom halo
        @pl.when(i == 0)
        def _():
            def halo(dst):
                cp = pltpu.make_async_copy(
                    out_loc.at[slot, :, pl.ds(0, HALO_X), :],
                    dst.at[:, pl.ds(nx + HALO_X, HALO_X), :], sems.at[6])
                cp.start()
                cp.wait()
            with_dst(halo)

        @pl.when(i == n_strips - 1)
        def _():
            def halo(dst):
                cp = pltpu.make_async_copy(
                    out_loc.at[slot, :, pl.ds(bs - HALO_X, HALO_X), :],
                    dst.at[:, pl.ds(0, HALO_X), :], sems.at[6])
                cp.start()
                cp.wait()
            with_dst(halo)

    _hbm_schedule(n_strips, n_sweeps, q_hbm, outA, outB,
                  start_in, wait_in, out_copy, compute, store, halo_writes)


def _kernel_fused_bc_hbm(cfg, bs, nx, ny, n_strips, n_sweeps, k, per_x,
                         nch, d0, d1,
                         dt_ref, q_hbm, st_hbm, outA, outB,
                         q_loc, st_loc, out_loc, sems):
    """Ghost-explicit variant of :func:`_kernel_fused_hbm_loop`: the
    entire n_sweeps*k-step loop in ONE pallas_call on the W-padded
    layout, with in-kernel ghost refills per pass and per temporal
    average (the same `_refill_ghosts` formulas as the one-step boundary
    kernel).  Domain edges consume no halo -- the ghost refill resets
    the adjacent row exactly each pass -- so only inter-strip edges
    shrink (2 rows/step without thinning, 4 with; see _k_steps).

    ``nch=6``: compensated variant — the carry is the (q, q_lo)
    6-channel state with in-kernel Kahan accumulation (same arithmetic
    as the per-step emit_delta path; q_lo at ghost slots is dead since
    the q ghosts are refilled from the compensated interior each step,
    mirroring the per-step ext_step-from-interior semantics)."""
    i = pl.program_id(1)
    rows = bs + 2 * HALO_X
    dt = dt_ref[0]

    def start_in(slot, src, strip):
        x0 = pl.multiple_of(strip * bs, 8)
        pltpu.make_async_copy(src.at[:, pl.ds(x0, rows), :],
                              q_loc.at[slot], sems.at[slot]).start()
        pltpu.make_async_copy(st_hbm.at[:, pl.ds(x0, rows), :],
                              st_loc.at[slot], sems.at[2 + slot]).start()

    def wait_in(slot):
        pltpu.make_async_copy(q_hbm.at[:, pl.ds(0, rows), :],
                              q_loc.at[slot], sems.at[slot]).wait()
        pltpu.make_async_copy(st_hbm.at[:, pl.ds(0, rows), :],
                              st_loc.at[slot], sems.at[2 + slot]).wait()

    def out_copy(slot, dst, strip):
        x0 = pl.multiple_of(strip * bs, 8)
        return pltpu.make_async_copy(
            out_loc.at[slot, :, pl.ds(HALO_X, bs), :],
            dst.at[:, pl.ds(HALO_X + x0, bs), :], sems.at[4 + slot])

    def compute(slot):
        st = tuple(st_loc[slot, c] for c in range(N_STATIC))
        thin = (bs, ny, i == 0, i == n_strips - 1, per_x) \
            if cfg.thinning is not None else None

        if nch == 3:
            q0, q1, q2 = q_loc[slot, 0], q_loc[slot, 1], q_loc[slot, 2]
            for _ in range(k):
                comps = _one_pass_fused(cfg, q0, q1, q2, st, dt, d0,
                                        thin=thin)
                comps = _refill_ghosts(cfg, comps, bs, ny, i, n_strips)
                a, b, c = _one_pass_fused(cfg, *comps, st, dt, d1,
                                          thin=thin)
                q0 = (a + q0) / 2.
                q1 = (b + q1) / 2.
                q2 = (c + q2) / 2.
                q0, q1, q2 = _refill_ghosts(cfg, (q0, q1, q2), bs, ny, i,
                                            n_strips)
            return q0, q1, q2

        # compensated: Kahan two-sum of the Sterbenz-exact step increment
        # (interior cells; ghost slots are refilled from the carry anyway)
        q0, q1, q2 = q_loc[slot, 0], q_loc[slot, 1], q_loc[slot, 2]
        l0, l1, l2 = q_loc[slot, 3], q_loc[slot, 4], q_loc[slot, 5]
        for _ in range(k):
            comps = _one_pass_fused(cfg, q0, q1, q2, st, dt, d0, thin=thin)
            comps = _refill_ghosts(cfg, comps, bs, ny, i, n_strips)
            u0, u1, u2 = _one_pass_fused(cfg, *comps, st, dt, d1,
                                         return_upd=True, thin=thin)
            outs = []
            for q, pred, u, lo in ((q0, comps[0], u0, l0),
                                   (q1, comps[1], u1, l1),
                                   (q2, comps[2], u2, l2)):
                delta = ((pred - q) - u) / 2.
                y = delta + lo
                t = q + y
                outs.append((t, y - (t - q)))
            (q0, l0), (q1, l1), (q2, l2) = outs
            q0, q1, q2 = _refill_ghosts(cfg, (q0, q1, q2), bs, ny, i,
                                        n_strips)
        return q0, q1, q2, l0, l1, l2

    def store(slot, chs):
        for c in range(nch):
            out_loc[slot, c] = chs[c]

    def halo_writes(slot, with_dst):
        # halo blocks (tiny, waited inline)
        if per_x:
            # periodic wrap images, as in the periodic kernel
            @pl.when(i == 0)
            def _():
                def halo(dst):
                    cp = pltpu.make_async_copy(
                        out_loc.at[slot, :, pl.ds(HALO_X, HALO_X), :],
                        dst.at[:, pl.ds(nx + HALO_X, HALO_X), :],
                        sems.at[6])
                    cp.start()
                    cp.wait()
                with_dst(halo)

            @pl.when(i == n_strips - 1)
            def _():
                def halo(dst):
                    cp = pltpu.make_async_copy(
                        out_loc.at[slot, :, pl.ds(bs, HALO_X), :],
                        dst.at[:, pl.ds(0, HALO_X), :], sems.at[6])
                    cp.start()
                    cp.wait()
                with_dst(halo)
        else:
            # refreshed ghost row lives at local row H-1 / H+bs; write
            # the whole 8-aligned halo block (deeper rows are dead)
            @pl.when(i == 0)
            def _():
                def halo(dst):
                    cp = pltpu.make_async_copy(
                        out_loc.at[slot, :, pl.ds(0, HALO_X), :],
                        dst.at[:, pl.ds(0, HALO_X), :], sems.at[6])
                    cp.start()
                    cp.wait()
                with_dst(halo)

            @pl.when(i == n_strips - 1)
            def _():
                def halo(dst):
                    cp = pltpu.make_async_copy(
                        out_loc.at[slot, :, pl.ds(HALO_X + bs, HALO_X), :],
                        dst.at[:, pl.ds(nx + HALO_X, HALO_X), :],
                        sems.at[6])
                    cp.start()
                    cp.wait()
                with_dst(halo)

    _hbm_schedule(n_strips, n_sweeps, q_hbm, outA, outB,
                  start_in, wait_in, out_copy, compute, store, halo_writes)


def _kernel_fused(cfg, bs, d0, d1, emit_delta,
                  dt_ref, q_hbm, st_hbm, out_ref, q_loc, st_loc, sems):
    i = pl.program_id(0)
    x0 = pl.multiple_of(i * bs, 8)
    rows = bs + 2 * HALO_X

    cp_q = pltpu.make_async_copy(
        q_hbm.at[:, pl.ds(x0, rows), :], q_loc, sems.at[0])
    cp_s = pltpu.make_async_copy(
        st_hbm.at[:, pl.ds(x0, rows), :], st_loc, sems.at[1])
    cp_q.start()
    cp_s.start()
    cp_q.wait()
    cp_s.wait()

    dt = dt_ref[0]
    st = tuple(st_loc[c] for c in range(N_STATIC))
    q0_0, q1_0, q2_0 = q_loc[0], q_loc[1], q_loc[2]

    a, b, c = _one_pass_fused(cfg, q0_0, q1_0, q2_0, st, dt, d0)

    sl = slice(HALO_X, HALO_X + bs)
    if emit_delta:
        # emit the full-precision step increment Delta = ((q* - q) - u)/2
        # (q* - q is exact by Sterbenz; u is the small pass-2 update), so
        # sub-ulp-of-q increments survive for compensated accumulation
        u0, u1, u2 = _one_pass_fused(cfg, a, b, c, st, dt, d1,
                                     return_upd=True)
        out_ref[0] = ((a[sl] - q0_0[sl]) - u0[sl]) / 2.
        out_ref[1] = ((b[sl] - q1_0[sl]) - u1[sl]) / 2.
        out_ref[2] = ((c[sl] - q2_0[sl]) - u2[sl]) / 2.
    else:
        a, b, c = _one_pass_fused(cfg, a, b, c, st, dt, d1)
        out_ref[0] = (a[sl] + q0_0[sl]) / 2.
        out_ref[1] = (b[sl] + q1_0[sl]) / 2.
        out_ref[2] = (c[sl] + q2_0[sl]) / 2.


def _kernel_fused_ehl(cfg, bs, ny, n_strips, d0, d1, emit_delta,
                      dt_ref, q_hbm, h_hbm, ls_hbm, px_hbm, py_hbm,
                      out_ref, q_loc, h_loc, ls_loc, sems):
    """Per-step EHL kernel (fully periodic layout): statics computed
    IN-KERNEL from the extended gap height instead of being materialized
    as an 8-channel array every step.

    The EHL reference protocol rebuilds the topography every fluid step
    (the deformation changes), so the statics production — the dominant
    HBM cost of the per-step path — cannot be hoisted.  This kernel
    DMAs 5 channels per strip (3 q + extended h + Ls) instead of 11
    (3 q + 8 statics) and derives Hx, Hy and the factored statics in
    VMEM.

    Gradient semantics match core.ehl._topo_from_deformation exactly:
    np.gradient central differences over the GHOST-INCLUSIVE height.
    The extended-h layout wraps the interior, so rows/cols whose central
    stencil reaches a ghost cell get PATCHED from precomputed values
    (px: the two interior boundary rows of Hx; py: the two boundary
    columns of Hy in extended row space) — O(perimeter) data computed
    once per step in XLA from the ghost-inclusive height."""
    i = pl.program_id(0)
    x0 = pl.multiple_of(i * bs, 8)
    rows = bs + 2 * HALO_X

    cp_q = pltpu.make_async_copy(
        q_hbm.at[:, pl.ds(x0, rows), :], q_loc, sems.at[0])
    cp_h = pltpu.make_async_copy(
        h_hbm.at[pl.ds(x0, rows), :], h_loc, sems.at[1])
    cp_l = pltpu.make_async_copy(
        ls_hbm.at[pl.ds(x0, rows), :], ls_loc, sems.at[2])
    cp_q.start()
    cp_h.start()
    cp_l.start()
    cp_q.wait()
    cp_h.wait()
    cp_l.wait()

    dt = dt_ref[0]
    H = h_loc[:]
    Ls = ls_loc[:]

    rdx2 = 0.5 / cfg.dx
    rdy2 = 0.5 / cfg.dy
    # central differences on the wrap-extended strip; the wrap across the
    # strip's own edges only corrupts the outermost halo row, which the
    # two passes never consume (they eat 2 of the 8 halo rows)
    Hx = (pltpu.roll(H, rows - 1, axis=0) - pltpu.roll(H, 1, axis=0)) * rdx2
    Hy = (pltpu.roll(H, ny - 1, axis=1) - pltpu.roll(H, 1, axis=1)) * rdy2

    # rows whose x-stencil reaches a ghost row: interior rows 0 and nx-1,
    # present as interior rows of the first/last strips AND as wrap-halo
    # rows of the opposite strip
    ridx = jax.lax.broadcasted_iota(jnp.int32, (rows, ny), 0)
    px0 = px_hbm[0][None, :]      # np.gradient row for interior row 0
    pxN = px_hbm[1][None, :]      # ... for interior row nx-1
    first = i == 0
    last = i == n_strips - 1
    Hx = jnp.where(first & (ridx == HALO_X), px0, Hx)
    Hx = jnp.where(first & (ridx == HALO_X - 1), pxN, Hx)
    Hx = jnp.where(last & (ridx == HALO_X + bs - 1), pxN, Hx)
    Hx = jnp.where(last & (ridx == HALO_X + bs), px0, Hx)

    # columns whose y-stencil reaches a ghost col (every strip); py is
    # stored (nx + 2*HALO_X, 2) so the strip slice is lane-contiguous
    cidx = jax.lax.broadcasted_iota(jnp.int32, (rows, ny), 1)
    pyl = py_hbm[pl.ds(x0, rows), 0:1]
    pyr = py_hbm[pl.ds(x0, rows), 1:2]
    Hy = jnp.where(cidx == 0, pyl, Hy)
    Hy = jnp.where(cidx == ny - 1, pyr, Hy)

    ic = 1. / (4. * Ls + H)
    st = (Hx, Hy, H, 2. * Ls, 1. / H, ic,
          2. * (3. * Ls + H) * ic * ic, 6. * Ls)

    q0_0, q1_0, q2_0 = q_loc[0], q_loc[1], q_loc[2]
    a, b, c = _one_pass_fused(cfg, q0_0, q1_0, q2_0, st, dt, d0)

    sl = slice(HALO_X, HALO_X + bs)
    if emit_delta:
        u0, u1, u2 = _one_pass_fused(cfg, a, b, c, st, dt, d1,
                                     return_upd=True)
        out_ref[0] = ((a[sl] - q0_0[sl]) - u0[sl]) / 2.
        out_ref[1] = ((b[sl] - q1_0[sl]) - u1[sl]) / 2.
        out_ref[2] = ((c[sl] - q2_0[sl]) - u2[sl]) / 2.
    else:
        a, b, c = _one_pass_fused(cfg, a, b, c, st, dt, d1)
        out_ref[0] = (a[sl] + q0_0[sl]) / 2.
        out_ref[1] = (b[sl] + q1_0[sl]) / 2.
        out_ref[2] = (c[sl] + q2_0[sl]) / 2.


@lru_cache(maxsize=16)
def make_pallas_ehl_step(cfg, nx, ny, bs=None, dtype=jnp.float32,
                         emit_delta=False):
    """Per-step EHL driver around :func:`_kernel_fused_ehl`.

    ``step(q, u, h_und, extra, dt) -> q_new`` (or the compensated
    increment when ``emit_delta``) on ghost-inclusive arrays; the gap
    topography is rebuilt from ``h_und + u`` inside the kernel.  Fully
    periodic configs without shear thinning only (the EHL production
    case); callers fall back to make_pallas_step + XLA statics
    otherwise."""
    if not (_fully_periodic(cfg) and cfg.thinning is None
            and pallas_supported(cfg, ny)):
        raise ValueError("EHL statics-in-kernel path requires a fully "
                         "periodic, non-thinning configuration")
    if bs is None:
        bs = _auto_bs(nx, ny)
    bs = min(bs, nx)
    assert nx % bs == 0 and bs % 8 == 0
    grid = (nx // bs,)
    rows = bs + 2 * HALO_X
    d0, d1 = mc_directions(cfg.MC_order)
    params = pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024)

    kern = partial(_kernel_fused_ehl, cfg, bs, ny, grid[0], d0, d1,
                   emit_delta)

    def call(q_ext, h_ext, ls_ext, px, py, dt):
        return pl.pallas_call(
            kern,
            in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                      pl.BlockSpec(memory_space=pl.ANY),
                      pl.BlockSpec(memory_space=pl.ANY),
                      pl.BlockSpec(memory_space=pl.ANY),
                      pl.BlockSpec(memory_space=pltpu.VMEM),
                      pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((3, bs, ny), lambda i: (0, i, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((3, nx, ny), dtype),
            scratch_shapes=[
                pltpu.VMEM((3, rows, ny), dtype),
                pltpu.VMEM((rows, ny), dtype),
                pltpu.VMEM((rows, ny), dtype),
                pltpu.SemaphoreType.DMA((3,)),
            ],
            grid=grid,
            compiler_params=params,
        )(dt, q_ext, h_ext, ls_ext, px, py)

    rdx2, rdy2 = 0.5 / cfg.dx, 0.5 / cfg.dy

    def _ext1(inner):
        return jnp.concatenate([inner[-HALO_X:], inner,
                                inner[:HALO_X]], axis=0)

    @jax.jit
    def step(q, u, h_und, extra, dt):
        q = q.astype(dtype)
        dt = jnp.asarray(dt, dtype)[None]
        h_full = (h_und + u).astype(dtype)
        hi = h_full[1:-1, 1:-1]
        h_ext = _ext1(hi)
        ls_ext = _ext1(extra.astype(dtype)[0, 1:-1, 1:-1])
        # np.gradient rows/cols whose central stencil uses ghost height
        px = jnp.stack([(h_full[2, 1:-1] - h_full[0, 1:-1]) * rdx2,
                        (h_full[-1, 1:-1] - h_full[-3, 1:-1]) * rdx2])
        py = jnp.stack([_ext1((h_full[1:-1, 2] - h_full[1:-1, 0]) * rdy2),
                        _ext1((h_full[1:-1, -1] - h_full[1:-1, -3]) * rdy2)],
                       axis=1)
        q_ext = _extend_interior(q[:, 1:-1, 1:-1])
        q_int = call(q_ext, h_ext, ls_ext, px, py, dt)
        if emit_delta:
            return q_int
        return _reassemble(q, q_int)

    return step


def _kernel_fused_ehl6(cfg, bs, nx, ny, n_strips, d0, d1,
                       dt_ref, q_hbm, h_hbm, ls_hbm, px_hbm, py_hbm,
                       out_hbm, q_loc, h_loc, ls_loc, out_loc, sems):
    """Compensated statics-in-kernel EHL step on an INTERIOR-only carry.

    The (q, q_lo) 6-channel state lives ghost-free in HBM; the kernel
    builds its own periodic wrap halos with split DMAs (the first/last
    strips read their wrap rows from the opposite end of the array), so
    the per-step XLA extension/reassembly passes of the ghost-inclusive
    layout disappear entirely.  Statics come from the interior gap
    height exactly as in :func:`_kernel_fused_ehl`, and the Kahan
    two-sum of the step increment happens in-register (same arithmetic
    and order as make_pallas_loop's compensated path).

    Strips are DOUBLE-BUFFERED: strip i+1's input DMAs start before
    strip i's compute and the output copy drains asynchronously — a
    serialized DMA-compute-DMA chain leaves the memory system idle
    during compute and vice versa (measured 0.70 ms of a 0.99 ms step
    at 2048^2 was non-overlapped data movement)."""
    i = pl.program_id(0)
    rows = bs + 2 * HALO_X

    def start_in(slot, strip):
        """Wrap-DMA all inputs of `strip` into buffer `slot`; 9 sems."""
        x0 = pl.multiple_of(strip * bs, 8)

        def at(hbm, loc, nch, dst_lo, src_lo, n, sem):
            if nch == 1:
                cp = pltpu.make_async_copy(
                    hbm.at[pl.ds(src_lo, n), :],
                    loc.at[slot, pl.ds(dst_lo, n), :], sems.at[sem])
            else:
                cp = pltpu.make_async_copy(
                    hbm.at[:, pl.ds(src_lo, n), :],
                    loc.at[slot, :, pl.ds(dst_lo, n), :], sems.at[sem])
            cp.start()

        if n_strips == 1:
            segs = ((0, nx - HALO_X, HALO_X), (HALO_X, 0, nx),
                    (HALO_X + nx, 0, HALO_X))
        else:
            # wrap at the array ends for the first/last strips (all
            # branch values are multiples of 8)
            lo_src = pl.multiple_of(
                jnp.where(strip == 0, nx - HALO_X, x0 - HALO_X), 8)
            hi_src = pl.multiple_of(
                jnp.where(strip == n_strips - 1, 0, x0 + bs), 8)
            segs = ((0, lo_src, HALO_X), (HALO_X, x0, bs),
                    (HALO_X + bs, hi_src, HALO_X))
        base = 9 * slot
        for k, (dst_lo, src_lo, n) in enumerate(segs):
            at(q_hbm, q_loc, 6, dst_lo, src_lo, n, base + 3 * k)
            at(h_hbm, h_loc, 1, dst_lo, src_lo, n, base + 3 * k + 1)
            at(ls_hbm, ls_loc, 1, dst_lo, src_lo, n, base + 3 * k + 2)

    def wait_in(slot):
        # wait descriptors must match the started copies' shapes
        base = 9 * slot
        for k, (dst_lo, n) in enumerate(((0, HALO_X), (HALO_X, bs),
                                         (HALO_X + bs, HALO_X))):
            pltpu.make_async_copy(
                q_hbm.at[:, pl.ds(0, n), :],
                q_loc.at[slot, :, pl.ds(dst_lo, n), :],
                sems.at[base + 3 * k]).wait()
            pltpu.make_async_copy(
                h_hbm.at[pl.ds(0, n), :],
                h_loc.at[slot, pl.ds(dst_lo, n), :],
                sems.at[base + 3 * k + 1]).wait()
            pltpu.make_async_copy(
                ls_hbm.at[pl.ds(0, n), :],
                ls_loc.at[slot, pl.ds(dst_lo, n), :],
                sems.at[base + 3 * k + 2]).wait()

    def out_copy(slot, strip):
        x0 = pl.multiple_of(strip * bs, 8)
        return pltpu.make_async_copy(
            out_loc.at[slot], out_hbm.at[:, pl.ds(x0, bs), :],
            sems.at[18 + slot])

    @pl.when(i == 0)
    def _():
        start_in(0, 0)

    @pl.when(i + 1 < n_strips)
    def _():
        start_in((i + 1) % 2, i + 1)

    slot = i % 2
    wait_in(slot)

    dt = dt_ref[0]
    H = h_loc[slot]
    Ls = ls_loc[slot]

    rdx2 = 0.5 / cfg.dx
    rdy2 = 0.5 / cfg.dy
    Hx = (pltpu.roll(H, rows - 1, axis=0) - pltpu.roll(H, 1, axis=0)) * rdx2
    Hy = (pltpu.roll(H, ny - 1, axis=1) - pltpu.roll(H, 1, axis=1)) * rdy2

    ridx = jax.lax.broadcasted_iota(jnp.int32, (rows, ny), 0)
    px0 = px_hbm[0][None, :]
    pxN = px_hbm[1][None, :]
    x0 = pl.multiple_of(i * bs, 8)
    first = i == 0
    last = i == n_strips - 1
    Hx = jnp.where(first & (ridx == HALO_X), px0, Hx)
    Hx = jnp.where(first & (ridx == HALO_X - 1), pxN, Hx)
    Hx = jnp.where(last & (ridx == HALO_X + bs - 1), pxN, Hx)
    Hx = jnp.where(last & (ridx == HALO_X + bs), px0, Hx)

    cidx = jax.lax.broadcasted_iota(jnp.int32, (rows, ny), 1)
    pyl = py_hbm[pl.ds(x0, rows), 0:1]
    pyr = py_hbm[pl.ds(x0, rows), 1:2]
    Hy = jnp.where(cidx == 0, pyl, Hy)
    Hy = jnp.where(cidx == ny - 1, pyr, Hy)

    ic = 1. / (4. * Ls + H)
    st = (Hx, Hy, H, 2. * Ls, 1. / H, ic,
          2. * (3. * Ls + H) * ic * ic, 6. * Ls)

    q0, q1, q2 = q_loc[slot, 0], q_loc[slot, 1], q_loc[slot, 2]
    l0, l1, l2 = q_loc[slot, 3], q_loc[slot, 4], q_loc[slot, 5]
    a, b, c = _one_pass_fused(cfg, q0, q1, q2, st, dt, d0)
    u0, u1, u2 = _one_pass_fused(cfg, a, b, c, st, dt, d1,
                                 return_upd=True)

    # the out buffer for this slot was drained two iterations ago
    @pl.when(i >= 2)
    def _():
        out_copy(slot, i - 2).wait()

    sl = slice(HALO_X, HALO_X + bs)
    for k, (q, pred, u, lo) in enumerate(((q0, a, u0, l0), (q1, b, u1, l1),
                                          (q2, c, u2, l2))):
        delta = ((pred - q) - u) / 2.
        y = delta + lo
        t = q + y
        out_loc[slot, k] = t[sl]
        out_loc[slot, 3 + k] = (y - (t - q))[sl]

    out_copy(slot, i).start()

    @pl.when(i == n_strips - 1)
    def _():
        out_copy(slot, i).wait()

    if n_strips > 1:
        @pl.when(i == n_strips - 1)
        def _():
            out_copy((i - 1) % 2, i - 1).wait()


@lru_cache(maxsize=16)
def make_pallas_ehl_loop_step(cfg, nx, ny, bs=None, dtype=jnp.float32):
    """Compensated interior-carry EHL step around _kernel_fused_ehl6.

    ``step(q6, h_int, ls_int, px, py, dt) -> q6`` with q6 the interior
    (6, nx, ny) (q, q_lo) state; h_int the interior gap height; px/py
    the ghost-stencil gradient patches (see make_pallas_ehl_step)."""
    if not (_fully_periodic(cfg) and cfg.thinning is None
            and pallas_supported(cfg, ny)):
        raise ValueError("EHL statics-in-kernel path requires a fully "
                         "periodic, non-thinning configuration")
    if bs is None:
        bs = _auto_bs(nx, ny)
    bs = min(bs, nx)
    assert nx % bs == 0 and bs % 8 == 0
    grid = (nx // bs,)
    rows = bs + 2 * HALO_X
    d0, d1 = mc_directions(cfg.MC_order)
    params = pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024)

    kern = partial(_kernel_fused_ehl6, cfg, bs, nx, ny, grid[0], d0, d1)

    @jax.jit
    def step(q6, h_int, ls_int, px, py, dt):
        dt = jnp.asarray(dt, dtype)[None]
        return pl.pallas_call(
            kern,
            in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                      pl.BlockSpec(memory_space=pl.ANY),
                      pl.BlockSpec(memory_space=pl.ANY),
                      pl.BlockSpec(memory_space=pl.ANY),
                      pl.BlockSpec(memory_space=pltpu.VMEM),
                      pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pl.ANY),
            out_shape=jax.ShapeDtypeStruct((6, nx, ny), dtype),
            scratch_shapes=[
                pltpu.VMEM((2, 6, rows, ny), dtype),
                pltpu.VMEM((2, rows, ny), dtype),
                pltpu.VMEM((2, rows, ny), dtype),
                pltpu.VMEM((2, 6, bs, ny), dtype),
                pltpu.SemaphoreType.DMA((20,)),
            ],
            grid=grid,
            compiler_params=params,
        )(dt, q6, h_int, ls_int, px, py)

    return step


def _kernel_fused_ext(cfg, bs, nx, d0, d1,
                      dt_ref, q_hbm, st_hbm, out_hbm,
                      q_loc, st_loc, out_loc, sems):
    """Loop-optimized periodic variant: writes the halo-EXTENDED array
    directly (out rows [H, H+nx) = interior; first/last strips duplicate
    their edge rows into the opposite halo), so the n-step driver carries
    the extended state with no per-step halo-concatenation pass."""
    i = pl.program_id(0)
    n_strips = pl.num_programs(0)
    x0 = pl.multiple_of(i * bs, 8)
    rows = bs + 2 * HALO_X

    cp_q = pltpu.make_async_copy(
        q_hbm.at[:, pl.ds(x0, rows), :], q_loc, sems.at[0])
    cp_s = pltpu.make_async_copy(
        st_hbm.at[:, pl.ds(x0, rows), :], st_loc, sems.at[1])
    cp_q.start()
    cp_s.start()
    cp_q.wait()
    cp_s.wait()

    dt = dt_ref[0]
    st = tuple(st_loc[c] for c in range(N_STATIC))
    q0_0, q1_0, q2_0 = q_loc[0], q_loc[1], q_loc[2]

    a, b, c = _one_pass_fused(cfg, q0_0, q1_0, q2_0, st, dt, d0)
    a, b, c = _one_pass_fused(cfg, a, b, c, st, dt, d1)

    sl = slice(HALO_X, HALO_X + bs)
    out_loc[0] = (a[sl] + q0_0[sl]) / 2.
    out_loc[1] = (b[sl] + q1_0[sl]) / 2.
    out_loc[2] = (c[sl] + q2_0[sl]) / 2.

    cp_out = pltpu.make_async_copy(
        out_loc, out_hbm.at[:, pl.ds(HALO_X + x0, bs), :], sems.at[2])
    cp_out.start()

    # top halo rows [nx+H, nx+2H) = interior rows [0, H) (first strip);
    # bottom halo rows [0, H) = interior rows [nx-H, nx) (last strip)
    @pl.when(i == 0)
    def _():
        cp = pltpu.make_async_copy(
            out_loc.at[:, pl.ds(0, HALO_X), :],
            out_hbm.at[:, pl.ds(nx + HALO_X, HALO_X), :], sems.at[3])
        cp.start()
        cp.wait()

    @pl.when(i == n_strips - 1)
    def _():
        cp = pltpu.make_async_copy(
            out_loc.at[:, pl.ds(bs - HALO_X, HALO_X), :],
            out_hbm.at[:, pl.ds(0, HALO_X), :], sems.at[3])
        cp.start()
        cp.wait()

    cp_out.wait()


def _kernel_fused_vmem(cfg, bs, nx, n_steps, d0, d1,
                       dt_ref, q_hbm, st_hbm, out_hbm, qA, qB, st_loc,
                       sems):
    """Whole-run-in-VMEM variant: the halo-extended state ping-pongs
    between two VMEM buffers and the statics stay VMEM-resident, so the
    entire n-step loop touches HBM exactly twice (initial load, final
    store).  Grid = (n_steps, n_strips), sequential on the core."""
    s = pl.program_id(0)
    i = pl.program_id(1)
    n_strips = pl.num_programs(1)

    @pl.when((s == 0) & (i == 0))
    def _():
        cq = pltpu.make_async_copy(q_hbm, qA, sems.at[0])
        cs = pltpu.make_async_copy(st_hbm, st_loc, sems.at[1])
        cq.start()
        cs.start()
        cq.wait()
        cs.wait()

    x0 = pl.multiple_of(i * bs, 8)
    rows = bs + 2 * HALO_X
    dt = dt_ref[0]
    sl = slice(HALO_X, HALO_X + bs)

    def advance(qin, qout):
        st = tuple(st_loc[c, pl.ds(x0, rows), :] for c in range(N_STATIC))
        q0_0 = qin[0, pl.ds(x0, rows), :]
        q1_0 = qin[1, pl.ds(x0, rows), :]
        q2_0 = qin[2, pl.ds(x0, rows), :]
        a, b, c = _one_pass_fused(cfg, q0_0, q1_0, q2_0, st, dt, d0)
        a, b, c = _one_pass_fused(cfg, a, b, c, st, dt, d1)
        for ci, (val, q00) in enumerate(((a, q0_0), (b, q1_0), (c, q2_0))):
            out = (val[sl] + q00[sl]) / 2.
            qout[ci, pl.ds(HALO_X + x0, bs), :] = out

            # halo duplication (periodic wrap lives in the array layout)
            @pl.when(i == 0)
            def _(out=out, ci=ci):
                qout[ci, pl.ds(nx + HALO_X, HALO_X), :] = out[:HALO_X]

            @pl.when(i == n_strips - 1)
            def _(out=out, ci=ci):
                qout[ci, pl.ds(0, HALO_X), :] = out[bs - HALO_X:]

    @pl.when(s % 2 == 0)
    def _():
        advance(qA, qB)

    @pl.when(s % 2 == 1)
    def _():
        advance(qB, qA)

    @pl.when((s == n_steps - 1) & (i == n_strips - 1))
    def _():
        src = qB if (n_steps - 1) % 2 == 0 else qA
        cp = pltpu.make_async_copy(src, out_hbm, sems.at[2])
        cp.start()
        cp.wait()


def _extend_interior(inner):
    """Periodic x-halo extension: (C, nx, ny) -> (C, nx + 2*HALO_X, ny)."""
    return jnp.concatenate([inner[:, -HALO_X:, :], inner,
                            inner[:, :HALO_X, :]], axis=1)


def _reassemble(q_like, q_int):
    """Interior (3, nx, ny) -> ghost-inclusive with periodic ghost fill."""
    out = jnp.zeros_like(q_like).at[:, 1:-1, 1:-1].set(q_int)
    out = out.at[:, 0, :].set(out[:, -2, :])
    out = out.at[:, -1, :].set(out[:, 1, :])
    out = out.at[:, :, 0].set(out[:, :, -2])
    out = out.at[:, :, -1].set(out[:, :, 1])
    return out


def _auto_bs(nx, ny):
    """Largest strip that keeps the kernel's live VMEM within budget.

    Live temporaries scale with bs*ny; bs*ny ~ 256*1024 fits within the
    raised 100 MB scoped-vmem limit (measured on v5e with the factored
    closures; 512*1024 still fits, 1024*1024 overflows).
    """
    budget = 256 * 1024
    bs = max(8, min(nx, (budget // ny) // 8 * 8))
    while nx % bs and bs > 8:
        bs -= 8
    return bs


def _make_ext_from_interior(cfg, W, per_x):
    """Build the per-step extension for the boundary kernel directly from
    the interior (3, nx, ny) state: ghost rows/cols come from the BC
    formulas, no intermediate ghost-inclusive array."""
    bc_xE, bc_xW = cfg.bc_edge(0), cfg.bc_edge(1)
    bc_yS, bc_yN = cfg.bc_edge(2), cfg.bc_edge(3)
    per_y = all(bc_yS["P"])

    def ghost_vals(bc, adj):
        comps = []
        for c in range(3):
            if bc["D"][c]:
                comps.append(2. * bc["val"] - adj[c])
            elif bc["N"][c]:
                comps.append(adj[c])
            else:
                comps.append(adj[c])
        return jnp.stack(comps)

    def ext(q_int):
        ny = q_int.shape[2]
        if per_x:
            top = q_int[:, -HALO_X:]
            bot = q_int[:, :HALO_X]
        else:
            gt = ghost_vals(bc_xE, q_int[:, 0, :])[:, None, :]
            gb = ghost_vals(bc_xW, q_int[:, -1, :])[:, None, :]
            top = jnp.repeat(gt, HALO_X, axis=1)
            bot = jnp.repeat(gb, HALO_X, axis=1)
        rows = jnp.concatenate([top, q_int, bot], axis=1)

        if per_y:
            gS = rows[:, :, ny - 1:ny]
            gN = rows[:, :, 0:1]
        else:
            gS = ghost_vals(bc_yS, rows[:, :, 0])[:, :, None]
            gN = ghost_vals(bc_yN, rows[:, :, ny - 1])[:, :, None]
        pad = jnp.zeros((3, rows.shape[1], W - ny - 2), dtype=q_int.dtype)
        return jnp.concatenate([rows, gN, pad, gS], axis=2)

    return ext


def _extend_bc(arr, per_x, W):
    """Ghost-inclusive (C, nx+2, ny+2) -> boundary-kernel layout
    (C, nx+2*HALO_X, W): x halos wrap (periodic) or replicate the input
    ghost row; y ghosts move to cols [ny] (North) and [W-1] (South)."""
    C, nxg, nyg = arr.shape
    ny = nyg - 2
    rows_i = arr[:, 1:-1, :]
    if per_x:
        top = rows_i[:, -HALO_X:]
        bot = rows_i[:, :HALO_X]
    else:
        top = jnp.repeat(arr[:, :1], HALO_X, axis=1)
        bot = jnp.repeat(arr[:, -1:], HALO_X, axis=1)
    rows = jnp.concatenate([top, rows_i, bot], axis=1)

    inter = rows[:, :, 1:-1]
    gS = rows[:, :, :1]
    gN = rows[:, :, -1:]
    pad = jnp.zeros((C, rows.shape[1], W - ny - 2), dtype=arr.dtype)
    return jnp.concatenate([inter, gN, pad, gS], axis=2)


@lru_cache(maxsize=16)
def _make_call(cfg, nx, ny, bs, dtype, emit_delta=False):
    """The raw pallas_call; returns (call, extend_fn, reassemble_fn, fused).

    ``emit_delta``: the kernel outputs the step increment (q_new - q)
    computed at full relative precision instead of the absolute new state
    (for compensated f32 accumulation in :func:`make_pallas_loop`)."""
    if not pallas_supported(cfg, ny):
        raise ValueError("Pallas step does not cover this configuration "
                         "(see pallas_supported)")
    if bs is None:
        bs = _auto_bs(nx, ny)
    bs = min(bs, nx)
    assert nx % bs == 0 and bs % 8 == 0, \
        "strip size must divide nx and align to 8"
    grid = (nx // bs,)
    rows = bs + 2 * HALO_X
    d0, d1 = mc_directions(cfg.MC_order)
    fused = True   # every supported config runs the factored fused closures
    periodic = _fully_periodic(cfg)

    params = pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024)
    common = dict(
        grid=grid,
        out_specs=pl.BlockSpec((3, bs, ny), lambda i: (0, i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((3, nx, ny), dtype),
        compiler_params=params,
    )

    if not periodic or cfg.thinning is not None:
        # boundary variant: explicit ghost rows/cols, refilled in-kernel
        # (all thinning configs land here: pallas_supported restricts
        # thinning to non-periodic x edges)
        W = _pad_width(ny)
        per_x = all(cfg.bc_edge(0)["P"])
        kernel = partial(_kernel_fused_bc, cfg, bs, ny, grid[0], per_x,
                         d0, d1, emit_delta)

        def call(q_ext, stat_ext, dt):
            return pl.pallas_call(
                kernel,
                in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                          pl.BlockSpec(memory_space=pl.ANY),
                          pl.BlockSpec(memory_space=pl.ANY)],
                scratch_shapes=[
                    pltpu.VMEM((3, rows, W), dtype),
                    pltpu.VMEM((N_STATIC, rows, W), dtype),
                    pltpu.SemaphoreType.DMA((2,)),
                ],
                **common,
            )(dt, q_ext, stat_ext)

        from ..core.step import apply_bcs

        ext_step = _make_ext_from_interior(cfg, W, per_x)

        def extend(arr):
            # first extension of the ghost-inclusive input (exact ghosts)
            return _extend_bc(arr, per_x, W)

        def reassemble(q_like, q_int):
            out = jnp.zeros_like(q_like).at[:, 1:-1, 1:-1].set(q_int)
            return apply_bcs(out, cfg)

        def ext_lo(lo):
            # interior Kahan carry into the W-padded layout (ghosts dead)
            return _extend_bc(jnp.pad(lo, ((0, 0), (1, 1), (1, 1))),
                              per_x, W)

        def int_slice(ext_arr):
            return ext_arr[:, HALO_X:HALO_X + nx, :ny]

        nch_hbm = 6 if emit_delta else 3

        def hbm_loop_factory(n_sweeps):
            kern = partial(_kernel_fused_bc_hbm, cfg, bs, nx, ny, grid[0],
                           n_sweeps, _k_steps(cfg), per_x, nch_hbm, d0, d1)
            ext_shape = (nch_hbm, nx + 2 * HALO_X, W)

            def call_hbm(q_ext, stat_ext, dt):
                outs = pl.pallas_call(
                    kern,
                    in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                              pl.BlockSpec(memory_space=pl.ANY),
                              pl.BlockSpec(memory_space=pl.ANY)],
                    out_specs=[pl.BlockSpec(memory_space=pl.ANY),
                               pl.BlockSpec(memory_space=pl.ANY)],
                    out_shape=[jax.ShapeDtypeStruct(ext_shape, dtype),
                               jax.ShapeDtypeStruct(ext_shape, dtype)],
                    scratch_shapes=[
                        pltpu.VMEM((2, nch_hbm, rows, W), dtype),
                        pltpu.VMEM((2, N_STATIC, rows, W), dtype),
                        pltpu.VMEM((2, nch_hbm, rows, W), dtype),
                        pltpu.SemaphoreType.DMA((7,)),
                    ],
                    grid=(n_sweeps, grid[0]),
                    compiler_params=params,
                )(dt, q_ext, stat_ext)
                return outs[(n_sweeps - 1) % 2]

            return call_hbm

        return (call, extend, reassemble, fused, ext_step, None, None,
                hbm_loop_factory, ext_lo, int_slice)

    def extend(arr):
        return _extend_interior(arr[:, 1:-1, 1:-1])

    def ext_step(q_int):
        return _extend_interior(q_int)

    def reassemble(q_like, q_int):
        return _reassemble(q_like, q_int)

    call_ext = None
    vmem_loop_factory = None
    hbm_loop_factory = None
    if fused:
        kernel = partial(_kernel_fused, cfg, bs, d0, d1, emit_delta)

        # whole-run-in-VMEM loop when the ping-pong state + statics +
        # per-strip temporaries fit the scoped VMEM budget (piezoviscous
        # eta adds a few live per-cell temporaries per pass)
        tmp_coeff = 60 if cfg.piezo is None else 75
        ext_bytes = (nx + 2 * HALO_X) * ny * jnp.dtype(dtype).itemsize
        vmem_need = (6 + N_STATIC) * ext_bytes + tmp_coeff * bs * ny
        if vmem_need < 90 * 1024 * 1024:
            def vmem_loop_factory(n_steps):
                kern = partial(_kernel_fused_vmem, cfg, bs, nx, n_steps,
                               d0, d1)
                ext_shape = (3, nx + 2 * HALO_X, ny)

                def call_vmem(q_ext, stat_ext, dt):
                    return pl.pallas_call(
                        kern,
                        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                                  pl.BlockSpec(memory_space=pl.ANY),
                                  pl.BlockSpec(memory_space=pl.ANY)],
                        out_specs=pl.BlockSpec(memory_space=pl.ANY),
                        out_shape=jax.ShapeDtypeStruct(ext_shape, dtype),
                        scratch_shapes=[
                            pltpu.VMEM(ext_shape, dtype),
                            pltpu.VMEM(ext_shape, dtype),
                            pltpu.VMEM((N_STATIC,) + ext_shape[1:], dtype),
                            pltpu.SemaphoreType.DMA((3,)),
                        ],
                        grid=(n_steps, grid[0]),
                        compiler_params=params,
                    )(dt, q_ext, stat_ext)

                return call_vmem

        # loop-optimized variant: in AND out are the halo-extended array
        kernel_ext = partial(_kernel_fused_ext, cfg, bs, nx, d0, d1)

        def call_ext(q_ext, stat_ext, dt):
            return pl.pallas_call(
                kernel_ext,
                in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                          pl.BlockSpec(memory_space=pl.ANY),
                          pl.BlockSpec(memory_space=pl.ANY)],
                out_specs=pl.BlockSpec(memory_space=pl.ANY),
                out_shape=jax.ShapeDtypeStruct((3, nx + 2 * HALO_X, ny),
                                               dtype),
                scratch_shapes=[
                    pltpu.VMEM((3, rows, ny), dtype),
                    pltpu.VMEM((N_STATIC, rows, ny), dtype),
                    pltpu.VMEM((3, bs, ny), dtype),
                    pltpu.SemaphoreType.DMA((4,)),
                ],
                grid=grid,
                compiler_params=params,
            )(dt, q_ext, stat_ext)

        # whole-run HBM ping-pong loop: n_sweeps*K_MULTI steps in ONE
        # pallas_call — the fastest >VMEM layout (no per-iteration
        # dispatch); n_sweeps=1 doubles as the single-sweep blocked kernel
        # (used by the sharded loop between halo exchanges)
        def hbm_loop_factory(n_sweeps):
            # emit_delta -> compensated whole-run variant: the carry is the
            # 6-channel (q, q_lo) state, Kahan-accumulated in-kernel
            nch = 6 if emit_delta else 3
            advance = _advance_comp if emit_delta else _advance_plain
            kern = partial(_kernel_fused_hbm_loop, cfg, bs, nx, nx // bs,
                           n_sweeps, K_MULTI, d0, d1, advance, nch)
            ext_shape = (nch, nx + 2 * HALO_X, ny)

            def call_hbm(q_ext, stat_ext, dt):
                outs = pl.pallas_call(
                    kern,
                    in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                              pl.BlockSpec(memory_space=pl.ANY),
                              pl.BlockSpec(memory_space=pl.ANY)],
                    out_specs=[pl.BlockSpec(memory_space=pl.ANY),
                               pl.BlockSpec(memory_space=pl.ANY)],
                    out_shape=[jax.ShapeDtypeStruct(ext_shape, dtype),
                               jax.ShapeDtypeStruct(ext_shape, dtype)],
                    scratch_shapes=[
                        pltpu.VMEM((2, nch, rows, ny), dtype),
                        pltpu.VMEM((2, N_STATIC, rows, ny), dtype),
                        pltpu.VMEM((2, nch, bs, ny), dtype),
                        pltpu.SemaphoreType.DMA((7,)),
                    ],
                    grid=(n_sweeps, grid[0]),
                    compiler_params=params,
                )(dt, q_ext, stat_ext)
                return outs[(n_sweeps - 1) % 2]

            return call_hbm

        def call(q_ext, stat_ext, dt):
            return pl.pallas_call(
                kernel,
                in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                          pl.BlockSpec(memory_space=pl.ANY),
                          pl.BlockSpec(memory_space=pl.ANY)],
                scratch_shapes=[
                    pltpu.VMEM((3, rows, ny), dtype),
                    pltpu.VMEM((N_STATIC, rows, ny), dtype),
                    pltpu.SemaphoreType.DMA((2,)),
                ],
                **common,
            )(dt, q_ext, stat_ext)

    def ext_lo(lo):
        return _extend_interior(lo)

    def int_slice(ext_arr):
        return ext_arr[:, HALO_X:HALO_X + nx, :]

    return (call, extend, reassemble, fused, ext_step, call_ext,
            vmem_loop_factory, hbm_loop_factory, ext_lo, int_slice)


@lru_cache(maxsize=16)
def make_pallas_step(cfg, nx, ny, bs=None, dtype=jnp.float32):
    """Single fused two-pass stencil step on ghost-inclusive arrays.

    Matches :func:`gapflow_tpu.core.step.make_det_step` for periodic
    problems (minus residual/validity bookkeeping).
    """
    from .mixed_bc import make_mixed_loop, mixed_supported
    if mixed_supported(cfg, ny, nx):
        mloop = make_mixed_loop(cfg, nx, ny, bs=bs, dtype=dtype)

        def step(q, topo, extra, dt, step_idx):
            del step_idx
            return mloop(q, topo, extra, dt, 1)

        return step

    call, extend, reassemble, fused = _make_call(cfg, nx, ny, bs, dtype)[:4]

    @jax.jit
    def step(q, topo, extra, dt, step_idx):
        del step_idx
        q = q.astype(dtype)
        dt = jnp.asarray(dt, dtype)[None]
        q_ext = extend(q)
        if fused:
            # extend-then-compute: the statics are per-cell functions of
            # (topo, extra), so they commute with the (gather) extension —
            # and XLA then fuses the whole 8-channel production into ONE
            # materialization of the extended layout instead of statics +
            # re-layout passes (bit-identical; ~0.6 ms/step at 2048^2,
            # which is what the per-step EHL protocol pays every step)
            stat_ext = _statics_ghosted(extend(topo.astype(dtype)[:3]),
                                        extend(extra.astype(dtype)))
            q_int = call(q_ext, stat_ext, dt)
        else:
            q_int = call(q_ext, extend(topo.astype(dtype)),
                         extend(extra.astype(dtype)), dt)
        return reassemble(q, q_int)

    return step


def _statics_ghosted(topo, extra):
    """precompute_statics on the full ghost-inclusive fields (the extension
    functions strip/relocate ghosts themselves)."""
    return precompute_statics(topo, extra)


@lru_cache(maxsize=16)
def make_pallas_loop(cfg, nx, ny, bs=None, dtype=jnp.float32,
                     compensated=False, with_lo=False):
    """n-step driver around the fused kernel with statics hoisted.

    ``loop(q, topo, extra, dt, n_steps) -> q`` on ghost-inclusive arrays:
    static-field extension and precomputation happen once; between steps q
    stays in interior layout (one wrap-concat per step).  ``n_steps`` is
    static per compilation.

    ``compensated=True`` enables Kahan-compensated time accumulation: the
    kernel emits the step increment at full relative precision (instead of
    the absolute new state) and the carry holds ``(q, q_lo)`` so increments
    smaller than one ulp of q accumulate in the compensation term instead
    of being rounded away.  Essential for float32 production runs with
    absolute density ~1e3 and small dt: the stiff viscous source at the
    minimum gap requires ``6 nu dt / h_min^2 << 1`` for an unbiased
    MacCormack steady state, and the corresponding per-step increments
    underflow plain f32 updates — see examples/validate_f32_production.py.
    Costs four elementwise adds per step outside the kernel.

    ``with_lo=True`` (requires ``compensated``) exposes the Kahan carry
    across calls: ``loop(q, topo, extra, dt, n_steps, q_lo) ->
    (q, q_lo)`` with interior-shaped ``q_lo`` — for chunked drivers
    (EHL) whose per-chunk state would otherwise restart the
    compensation term at zero and re-freeze near steady state.
    """
    if with_lo and not compensated:
        raise ValueError("with_lo requires compensated=True")

    from .mixed_bc import make_mixed_loop, mixed_supported
    if mixed_supported(cfg, ny, nx):
        # mixed per-component P/D/N edges: evolved-ghost carry, one
        # kernel per step with XLA ghost-line bands (ops.mixed_bc)
        if with_lo:
            raise ValueError("mixed-edge loop does not expose the Kahan "
                             "carry (no chunked EHL driver on mixed edges)")
        return make_mixed_loop(cfg, nx, ny, bs=bs, dtype=dtype,
                               compensated=compensated)

    (call, extend, reassemble, fused, ext_step, call_ext, vmem_factory,
     hbm_factory, ext_lo, int_slice) = _make_call(cfg, nx, ny, bs, dtype,
                                                  compensated)

    @partial(jax.jit, static_argnames=("n_steps",))
    def loop(q, topo, extra, dt, n_steps, q_lo=None):
        q = q.astype(dtype)
        dt = jnp.asarray(dt, dtype)[None]

        if fused:
            # same extend-then-compute ordering as make_pallas_step
            stat_ext = _statics_ghosted(extend(topo.astype(dtype)[:3]),
                                        extend(extra.astype(dtype)))
            args = (stat_ext,)
        else:
            args = (extend(topo.astype(dtype)), extend(extra.astype(dtype)))

        # interior-only carry: the per-step extension rebuilds halos and
        # ghosts directly from the interior via the BC formulas
        if compensated:
            def body(i, carry):
                q_int, q_lo = carry
                # the kernel emits the increment directly (emit_delta) so
                # sub-ulp-of-q updates reach the Kahan two-sum un-rounded
                delta = call(ext_step(q_int), *args, dt)
                y = delta + q_lo
                t = q_int + y
                return t, y - (t - q_int)

            lo0 = (jnp.zeros_like(q[:, 1:-1, 1:-1]) if q_lo is None
                   else q_lo.astype(dtype))
            n_sweeps, n_rem = divmod(n_steps, _k_steps(cfg))
            if hbm_factory is not None and n_sweeps > 0:
                # whole-run Kahan carry in one kernel; the remainder steps
                # continue the (q, q_lo) carry through the per-step path
                ext_q = extend(q)
                carry6 = jnp.concatenate([ext_q, ext_lo(lo0)], 0)
                carry6 = hbm_factory(n_sweeps)(carry6, *args, dt)
                carry = (int_slice(carry6[:3]), int_slice(carry6[3:]))
            else:
                n_rem = n_steps
                carry = (q[:, 1:-1, 1:-1], lo0)
            q_int, lo_out = jax.lax.fori_loop(0, n_rem, body, carry)
            if with_lo:
                return reassemble(q, q_int), lo_out
        elif vmem_factory is not None and n_steps > 1:
            # whole run in VMEM: one kernel, HBM touched exactly twice
            q_ext = vmem_factory(n_steps)(extend(q), *args, dt)
            q_int = q_ext[:, HALO_X:HALO_X + q.shape[1] - 2, :]
        elif call_ext is not None:
            # extended-array carry: the kernel maintains the halos itself,
            # removing the per-step halo-concatenation pass; full sweeps
            # go through the temporal-blocked kernel (K_MULTI steps per
            # HBM round-trip), the remainder through the one-step kernel
            q_ext = extend(q)
            n_sweeps, n_rem = divmod(n_steps, _k_steps(cfg))
            if hbm_factory is not None and n_sweeps > 0:
                q_ext = hbm_factory(n_sweeps)(q_ext, *args, dt)
            else:
                n_rem = n_steps
            if n_rem > 0:
                q_ext = jax.lax.fori_loop(
                    0, n_rem, lambda i, qe: call_ext(qe, *args, dt), q_ext)
            q_int = q_ext[:, HALO_X:HALO_X + q.shape[1] - 2, :]
        else:
            # interior carry (boundary-condition configs): full sweeps go
            # through the temporal-blocked ghost-refilling kernel when
            # available, the remainder re-extends per step
            n_sweeps, n_rem = divmod(n_steps, _k_steps(cfg))
            if hbm_factory is not None and fused and n_sweeps > 0:
                q_ext = hbm_factory(n_sweeps)(extend(q), *args, dt)
                q_int = q_ext[:, HALO_X:HALO_X + q.shape[1] - 2,
                              :q.shape[2] - 2]
            else:
                n_rem = n_steps
                q_int = q[:, 1:-1, 1:-1]

            def body(i, q_int):
                return call(ext_step(q_int), *args, dt)

            q_int = jax.lax.fori_loop(0, n_rem, body, q_int)
        return reassemble(q, q_int)

    return loop
