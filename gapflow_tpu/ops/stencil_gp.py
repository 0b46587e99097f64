"""Fused Pallas TPU kernel for the GP-surrogate MacCormack step.

The reference's flagship multiscale mode closes the balance equations
with Gaussian-process surrogates (pressure and/or wall shear stresses)
trained on MD data (reference GaPFlow/models/stress.py:214-331 with
problem.py:509-586).  The XLA formulation (core.gp_step) materializes
the feature matrix, the test-train kernel and the stress arrays in HBM
every pass — ~3.1 ms/step at 1024^2 (0.34e9 cell-updates/s) on v5e.

This kernel keeps the whole GP closure in VMEM: per strip, the scaled
feature columns are built from the local (q, statics) block, the Matern
3/2 mean is accumulated over the (small, padded) training set with
per-point FMAs, and the deterministic factored closures consume the GP
pressure directly.  GP wall-stress surrogates enter as additive source
corrections: S1/S2 of the factored pass use the det wall stresses, so
substituting the GP values is S += ((su_gp - su_det) - (sl_gp -
sl_det))/h — the same slots stress_upper[4]/[3] occupy in
core.integrate.source.

Scope: fully periodic edges, no shear thinning, feature indices within
the 7 built-ins (rho, jx, jy, h, hx, hy, Ls) — the production
multiscale configurations.  Everything else falls back to the XLA step.

Train-set layout (padded, gapflow_tpu.models.al_jit compatible): padded
alpha rows are zero so their kernel contributions vanish; amp and
Yscale are folded into alpha host-side.
"""

from functools import partial

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .stencil import (HALO_X, N_STATIC, _edges_uniform, _eta_fused,
                      _extend_bc, _extend_interior, _pad_width,
                      _reassemble, _refill_ghosts, _statics_ghosted,
                      _fully_periodic, pallas_supported)
from ..core.step import mc_directions
from ..models.eos import eos_pressure
from ..models.closures_opt import fused_pass_top_pre

_SQRT3 = 3. ** 0.5


def gp_kernel_supported(cfg, ny, active_dims, use_gp):
    """Kernel coverage for the GP-closed step (see module docstring)."""
    if not (pallas_supported(cfg, ny) and _fully_periodic(cfg)
            and cfg.thinning is None):
        return False
    for dims, used in zip(active_dims, use_gp):
        if used and (dims is None or any(d >= 7 for d in dims)):
            return False
    return True


# Capacity at or below which the unrolled per-point accumulation is
# used; larger training sets take the capacity-tiled MXU formulation
# (matmul r^2 + tiled Matern + matmul accumulation).  0 since the
# split-K bf16 arg^2 matmul (_split_k_bf16): with the distance product
# costing one MXU pass instead of six, the MXU formulation measures
# faster at EVERY capacity (cap16 8.9e8 vs 7.6e8 cu/s unrolled, cap64
# 3.2e8 vs 2.4e8, cap1024 2.3e7 vs n/a; 1024^2 grid, r4 chip sweep).
# The unrolled path stays as the documented reference formulation and
# remains reachable by raising this.
UNROLL_CAP = 0
# Capacity-tile height of the MXU formulation (train points per tile;
# 512 measured 21% slower at cap 1024).
MXU_TILE = 256


def _features7(q0, q1, q2, st):
    """The 7 built-in feature columns from the strip-local state."""
    return (q0, q1, q2, st[2], st[0], st[1], 0.5 * st[3])


def _gp_mean(feats, dims, coef, Wm2, w2, alpha, n_out):
    """Matern-3/2 GP mean(s) over a strip block.

    feats: the 7 feature arrays; dims: static feature indices; coef:
    (1, d) per-feature scale with the Matern sqrt(3) folded in
    (sqrt(3) * inv lengthscale / Xscale); Wm2: (cap, d) = -2 * sqrt(3)-
    scaled train inputs; w2: (cap, 1) their squared norms plus the
    sqrt-smoothing epsilon; alpha: (cap, n_out) weights with amp and
    Yscale folded in.  The distance then assembles as
    ``arg^2 = x.x + x.Wm2[j] + w2[j] = 3 r^2 + 3e-14`` — no separate
    sqrt(3)/epsilon ops per pair.  Unrolled over the (static) capacity;
    per point: d FMAs + 2 adds + max + sqrt + exp + 1 FMA, all VPU
    (transcendental-bound: see doc/status.md speed-of-light analysis).
    """
    xs = [feats[d] * coef[0, i] for i, d in enumerate(dims)]
    x2 = sum(x * x for x in xs)
    cap = Wm2.shape[0]
    acc = [jnp.zeros_like(feats[0]) for _ in range(n_out)]
    for j in range(cap):
        dot = sum(x * Wm2[j, i] for i, x in enumerate(xs))
        arg = jnp.sqrt(jnp.maximum(x2 + dot + w2[j, 0], 3e-14))
        e = jnp.exp(-arg)
        kj = e + arg * e
        for m in range(n_out):
            acc[m] = acc[m] + kj * alpha[j, m]
    return acc


def _gp_all_mxu(feats, du, Waug_ref, Aaug_ref, out_ref, mt,
                fast=False):  # noqa: C901
    """Capacity-tiled MXU evaluation of ALL active surrogate means.

    The three surrogates' contractions are batched into one MXU-shaped
    product: per cell row, the augmented design row
    ``[x_d..., x_d^2..., 1]`` (d over the union of active dims) hits the
    augmented train matrix ``Waug`` whose column for train point (m, j)
    is ``[-6 c_mi W_mji ..., 3 c_mi^2 ..., 3 w2_mj + 3e-14]`` — the
    matmul emits ``3 r^2 + 3e-14 = arg^2`` directly (the Matern sqrt(3)
    and the sqrt-smoothing epsilon folded in).  Both sides arrive as
    K-concatenated 3-term bf16 splits (:func:`_split_k_bf16`): one
    single-pass bf16 matmul with f32 accumulation reproduces the
    6-pass HIGHEST f32 product at the cost of ONE K-padded MXU pass.
    A short elementwise block (sqrt, exp, fma) evaluates the Matern-3/2
    kernel on the (tile, ny) block in VMEM, and a second matmul against
    the block-diagonal ``Aaug`` (amp and Yscale folded into alpha)
    accumulates the output rows [p, xz_lo, xz_up, yz_lo, yz_up] into
    ``out_ref`` (8, rows, ny).

    Unlike the unrolled path, compile time and VMEM are independent of
    capacity: the tile loop is rolled, so padded capacities >= 2048 are
    production-viable (matches the re-predict hot path
    GaPFlow/models/gp.py:509-535 at database sizes the reference reaches).
    """
    rows, ny = feats[0].shape
    Mtot = Waug_ref.shape[0]
    n_t = Mtot // mt
    d_n = len(du)
    # bf16 Waug marks the split-K f32 route; f64 (CPU verification
    # kernels) keeps the full-precision product — the bf16 split only
    # reaches f32 accuracy
    f32_split = Waug_ref.dtype == jnp.bfloat16
    dt_ = feats[0].dtype
    ones = jnp.ones((1, ny), dt_)

    # Stage the (scaled) feature columns and their squares into the
    # scratch channels 8.. of out_ref: the row-block loop below is
    # ROLLED (fori_loop) and Mosaic cannot dynamic-slice VALUES inside
    # it — only refs.  One extra VMEM write/read per cell.
    for i, d in enumerate(du):
        out_ref[8 + i] = feats[d]
        out_ref[8 + d_n + i] = feats[d] * feats[d]

    def body(rbi, carry):
        r0 = pl.multiple_of(rbi * 8, 8)
        blks = out_ref[8:8 + 2 * d_n, pl.ds(r0, 8), :]
        accs = []
        for rr in range(8):
            xaug = jnp.concatenate(
                [blks[i, rr:rr + 1] for i in range(2 * d_n)] + [ones],
                axis=0)
            if f32_split:
                # f32-accurate arg^2 from ONE bf16 pass: split the
                # design row into 3 bf16 terms and K-concatenate the 6
                # retained cross products against the pre-split Waug (a
                # plain bf16 pass here costs ~2^-9 relative on the
                # staged features — the round-2 precision leak; a
                # HIGHEST f32 matmul is exact but pays 6 K-padded MXU
                # passes)
                xsp = _bf16_3split(xaug)
                x_in = jnp.concatenate([xsp[i] for i in _SPLIT_X],
                                       axis=0)
            else:
                x_in = xaug
            acc = jnp.zeros((8, ny), dt_)
            for t in range(n_t):
                Wt = Waug_ref[pl.ds(t * mt, mt), :]
                arg2 = jnp.dot(Wt, x_in,
                               preferred_element_type=dt_,
                               precision=(None if f32_split
                                          else lax.Precision.HIGHEST))
                arg = jnp.sqrt(jnp.maximum(arg2, 3e-14))
                e = jnp.exp(-arg)
                km = e + arg * e
                # fast mode: one bf16 MXU pass (~2e-3 relative on the
                # means, documented opt-in); exact mode: HIGHEST f32
                # (6-pass) accumulation — kernel parity at f32 rounding
                acc = acc + jnp.dot(Aaug_ref[:, pl.ds(t * mt, mt)], km,
                                    preferred_element_type=dt_,
                                    precision=(None if fast and f32_split
                                               else lax.Precision.HIGHEST))
            accs.append(acc)
        out_ref[:8, pl.ds(r0, 8), :] = jnp.stack(accs, axis=1)
        return carry

    lax.fori_loop(0, rows // 8, body, 0)


def _one_pass_gp(cfg, gpspec, q0, q1, q2, st, dt, d, gp_ops):
    """One MacCormack pass with GP-surrogate closures (periodic layout).

    Mirrors stencil._one_pass_fused with the pressure replaced by the GP
    mean (when active) and the wall-stress source slots corrected to the
    GP values (when active).  Returns (q0', q1', q2', p)."""
    dims_z, dims_x, dims_y = gpspec["dims"]
    gpz, gpx, gpy = gpspec["use"]
    feats = _features7(q0, q1, q2, st)
    mxu = gpspec.get("mode") == "mxu"

    if mxu:
        Waug, Aaug, gp_out, du, mt = gp_ops
        _gp_all_mxu(feats, du, Waug, Aaug, gp_out, mt,
                    fast=gpspec.get("fast", False))

    if gpz:
        if mxu:
            p = gp_out[0]
        else:
            cz, Wz, w2z, az = gp_ops["z"]
            (p,) = _gp_mean(feats, dims_z, cz, Wz, w2z, az, 1)
    else:
        p = eos_pressure(q0, cfg.prop)
    eta = _eta_fused(cfg, q0, p)

    tb_xx, tb_yy, tb_xy, S0, S1, S2 = fused_pass_top_pre(
        q0, q1, q2, st, cfg.U, cfg.V, eta, cfg.bulk)

    if gpx or gpy:
        # det wall stresses of the factored pass (closures_opt formulas)
        Hx, Hy, H, Ls2, inv_h, ic, _k2s, Ls6 = st
        ir = 1. / q0
        g = ic * ir
        e2g = 2. * eta * g
        Ur = cfg.U * q0
        Vr = cfg.V * q0
        if gpx:
            su_det = -e2g * (3. * q1 - Ur)
            sl_det = e2g * (Ls6 * (q1 - Ur)
                            + H * (3. * q1 - 2. * Ur)) * inv_h
            if mxu:
                lo, up = gp_out[1], gp_out[2]
            else:
                cx, Wx, w2x, axw = gp_ops["x"]
                lo, up = _gp_mean(feats, dims_x, cx, Wx, w2x, axw, 2)
            S1 = S1 + ((up - su_det) - (lo - sl_det)) * inv_h
        if gpy:
            su_det = -e2g * (3. * q2 - Vr)
            sl_det = e2g * (Ls6 * (q2 - Vr)
                            + H * (3. * q2 - 2. * Vr)) * inv_h
            if mxu:
                lo, up = gp_out[3], gp_out[4]
            else:
                cy, Wy, w2y, ayw = gp_ops["y"]
                lo, up = _gp_mean(feats, dims_y, cy, Wy, w2y, ayw, 2)
            S2 = S2 + ((up - su_det) - (lo - sl_det)) * inv_h

    rdx = 1. / cfg.dx
    rdy = 1. / cfg.dy

    def ddx(F):
        return -d * (pltpu.roll(F, d % F.shape[0], axis=0) - F) * rdx

    def ddy(F):
        return -d * (pltpu.roll(F, d % F.shape[1], axis=1) - F) * rdy

    u0 = dt * (ddx(q1) + ddy(q2) - S0)
    u1 = dt * (ddx(p + tb_xx) + ddy(tb_xy) - S1)
    u2 = dt * (ddx(tb_xy) + ddy(p + tb_yy) - S2)
    return q0 - u0, q1 - u1, q2 - u2, p


def _kernel_fused_gp(cfg, gpspec, bs, ny, d0, d1,
                     dt_ref, q_hbm, st_hbm, *refs):
    """Per-strip GP-closed MacCormack step (both passes + average).

    refs layout, unroll mode: per active model (z, x, y): coef, W, w2,
    alpha (VMEM); then outputs (q out block, p out block) and scratch
    (q_loc, st_loc, sems).  mxu mode: Waug, Aaug (VMEM); outputs; then
    scratch (q_loc, st_loc, gp_out, sems)."""
    if gpspec.get("mode") == "mxu":
        Waug, Aaug, out_q, out_p, q_loc, st_loc, gp_out, sems = refs
        gp_ops = (Waug, Aaug, gp_out, gpspec["du"], gpspec["mt"])
    else:
        n_models = sum(gpspec["use"])
        gp_arrs = refs[:4 * n_models]
        out_q, out_p, q_loc, st_loc, sems = refs[4 * n_models:]

        gp_ops = {}
        k = 0
        for key, used in zip(("z", "x", "y"), gpspec["use"]):
            if used:
                gp_ops[key] = tuple(gp_arrs[4 * k:4 * k + 4])
                k += 1

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

    a, b, c, _ = _one_pass_gp(cfg, gpspec, q0_0, q1_0, q2_0, st, dt, d0,
                              gp_ops)
    a2, b2, c2, p2 = _one_pass_gp(cfg, gpspec, a, b, c, st, dt, d1,
                                  gp_ops)

    sl = slice(HALO_X, HALO_X + bs)
    out_q[0] = (a2[sl] + q0_0[sl]) / 2.
    out_q[1] = (b2[sl] + q1_0[sl]) / 2.
    out_q[2] = (c2[sl] + q2_0[sl]) / 2.
    out_p[...] = p2[sl]


def _prep_gp_ops(gp_state, dims, key):
    """XLA-side (tiny) precomputation of the kernel's per-model arrays."""
    params = gp_state[f"params_{key}"]
    Xfit = gp_state[f"Xfit_{key}"]
    alpha = gp_state[f"alpha_{key}"]
    inv_ls = jnp.exp(-params["log_scale"])
    amp = jnp.exp(params["log_amp"])
    Xscale = gp_state["Xscale"]

    # fold the Matern sqrt(3) and the sqrt-smoothing epsilon into the
    # prepared arrays (see _gp_mean): the in-kernel distance assembles
    # arg^2 = 3 r^2 + 3e-14 with no per-pair scaling ops
    Ws = _SQRT3 * Xfit * inv_ls[None, :]
    Wm2 = -2. * Ws                                        # (cap, d)
    w2 = jnp.sum(Ws * Ws, axis=1, keepdims=True) + 3e-14  # (cap, 1)
    # test side: feat / Xscale[dim] * inv_ls -> one coefficient per dim
    coef = (_SQRT3 * inv_ls / Xscale[jnp.asarray(dims)])[None, :]
    a = alpha if alpha.ndim == 2 else alpha[:, None]
    a = a * (amp * gp_state[f"Yscale_{key}"])
    return coef, Wm2, w2, a


# Output-row layout of the batched (mxu) formulation.
_OUT_ROWS = {"z": (0,), "x": (1, 2), "y": (3, 4)}


def _mxu_spec(active_dims, use_gp, caps):
    """Static layout of the batched train matrix: (du, Mtot, mt)."""
    du = tuple(sorted(set().union(
        *(dims for dims, used in zip(active_dims, use_gp) if used))))
    raw = sum(c for c, used in zip(caps, use_gp) if used)
    mt = min(MXU_TILE, ((raw + 7) // 8) * 8)
    Mtot = ((raw + mt - 1) // mt) * mt
    return du, Mtot, mt


def _prep_gp_ops_mxu(gp_state, active_dims, use_gp, du, Mtot,
                     dtype=jnp.float32):
    """XLA-side assembly of the batched augmented train arrays.

    Waug: (Mtot, 2*len(du)+1) with column blocks per active model (see
    :func:`_gp_all_mxu`); Aaug: (8, Mtot) block-diagonal alpha with amp
    and Yscale folded in (rows 5..7 zero padding).  Padding train rows
    are all-zero: their matmul emits arg2 = 0 and alpha 0 annihilates the
    kernel value.  For f32 kernels Waug ships as the K-concatenated
    bf16 split (:func:`_split_k_bf16`); f64 (CPU verification) keeps
    the plain f64 matrix.
    """
    nd = len(du)
    pos = {d: i for i, d in enumerate(du)}
    W_blocks, A_blocks = [], []
    for key, dims, used in zip(("z", "x", "y"), active_dims, use_gp):
        if not used:
            continue
        params = gp_state[f"params_{key}"]
        Xfit = gp_state[f"Xfit_{key}"]
        alpha = gp_state[f"alpha_{key}"]
        inv_ls = jnp.exp(-params["log_scale"])
        amp = jnp.exp(params["log_amp"])
        c = inv_ls / gp_state["Xscale"][jnp.asarray(dims)]      # (d,)
        Wm = Xfit * inv_ls[None, :]                             # (cap, d)
        w2 = jnp.sum(Wm * Wm, axis=1)                           # (cap,)
        cap = Xfit.shape[0]

        blk = jnp.zeros((cap, 2 * nd + 1), Wm.dtype)
        for i, dim in enumerate(dims):
            blk = blk.at[:, pos[dim]].set(-6. * c[i] * Wm[:, i])
            blk = blk.at[:, nd + pos[dim]].set(3. * c[i] * c[i])
        blk = blk.at[:, 2 * nd].set(3. * w2 + 3e-14)
        W_blocks.append(blk)

        a = alpha if alpha.ndim == 2 else alpha[:, None]
        a = a * (amp * gp_state[f"Yscale_{key}"])               # (cap, n_out)
        ab = jnp.zeros((cap, 8), a.dtype)
        for m, row in enumerate(_OUT_ROWS[key]):
            ab = ab.at[:, row].set(a[:, m])
        A_blocks.append(ab)

    Waug = jnp.concatenate(W_blocks, axis=0)
    Aaug = jnp.concatenate(A_blocks, axis=0)
    pad = Mtot - Waug.shape[0]
    if pad:
        Waug = jnp.pad(Waug, ((0, pad), (0, 0)))
        Aaug = jnp.pad(Aaug, ((0, pad), (0, 0)))
    if dtype == jnp.float32:
        return _split_k_bf16(Waug.astype(jnp.float32)), \
            Aaug.T.astype(jnp.float32)
    return Waug.astype(dtype), Aaug.T.astype(dtype)


def _bf16_3split(v):
    """Exact 3-term bf16 decomposition of an f32 array (24-bit mantissa
    = 3 x 8-bit bf16 mantissas; each residual subtraction is exact)."""
    hi = v.astype(jnp.bfloat16)
    r1 = v - hi.astype(jnp.float32)
    mid = r1.astype(jnp.bfloat16)
    lo = (r1 - mid.astype(jnp.float32)).astype(jnp.bfloat16)
    return hi, mid, lo


# x-side / W-side pairing of the 6 retained bf16 product terms of
# (x_hi+x_mid+x_lo)(W_hi+W_mid+W_lo); the dropped mid*lo / lo*lo class
# is O(2^-24) relative — below the f32 rounding of the result (the same
# truncation XLA's HIGHEST decomposition makes).
_SPLIT_X = (0, 0, 1, 0, 2, 1)
_SPLIT_W = (0, 1, 0, 2, 0, 1)


def _split_k_bf16(Waug):
    """K-concatenated bf16 split of the augmented train matrix.

    (Mtot, k) f32 -> (Mtot, 6k) bf16 whose column blocks pair with the
    x-side blocks of :func:`_gp_all_mxu` so ONE single-pass bf16 matmul
    (f32 accumulation) reproduces the f32-accurate arg^2 that a
    HIGHEST-precision f32 matmul computes in 6 passes.  The MXU pass
    cost is K-padding-bound at these K (k <= 15, 6k <= 90 < 128), so
    this is ~6x cheaper at identical accuracy — measured 1.24e7 ->
    2.2e7 cu/s on the cap-1024 GP-closed step.
    """
    parts = _bf16_3split(Waug)
    return jnp.concatenate([parts[i] for i in _SPLIT_W], axis=1)


def make_gp_call(cfg, active_dims, use_gp, caps, nx, ny, bs=None,
                 dtype=jnp.float32):
    """Raw GP-step pallas_call on halo-extended arrays.

    Returns ``(call, prep)``: ``call(q_ext, stat_ext, dt, *gp_arrs) ->
    (out_q (3, nx, ny), out_p (nx, ny))`` over the x-extended wrap
    layout (serial strips or a sharded shard block — parallel.pallas_halo
    routes its local blocks through this same call), and
    ``prep(gp_state) -> [gp_arrs]`` building the (replicated) train
    arrays for the selected capacity mode."""
    if not gp_kernel_supported(cfg, ny, active_dims, use_gp):
        raise ValueError("GP Pallas kernel does not cover this config")
    mxu = max(c for c, u in zip(caps, use_gp) if u) > UNROLL_CAP
    if bs is None:
        # smaller strip budget than the det kernels: the GP accumulation
        # holds extra live per-cell temporaries (scaled features, x2,
        # per-model accumulators) on top of the pass working set
        bs = max(8, min(nx, ((64 * 1024) // ny) // 8 * 8))
        while nx % bs and bs > 8:
            bs -= 8
    bs = min(bs, nx)
    assert nx % bs == 0 and bs % 8 == 0
    grid = (nx // bs,)
    rows = bs + 2 * HALO_X
    d0, d1 = mc_directions(cfg.MC_order)
    params = pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024)
    gpspec = {"dims": active_dims, "use": use_gp,
              "fast": bool(getattr(cfg, "gp_fast_pred", False))}
    n_models = sum(use_gp)
    scratch = [pltpu.VMEM((3, rows, ny), dtype),
               pltpu.VMEM((N_STATIC, rows, ny), dtype)]
    if mxu:
        du, Mtot, mt = _mxu_spec(active_dims, use_gp, caps)
        gpspec.update(mode="mxu", du=du, mt=mt)
        n_gp_arrs = 2
        # channels 8..: staged feature columns for the rolled
        # row-block loop of _gp_all_mxu (ref-sliceable)
        scratch.append(pltpu.VMEM((8 + 2 * len(du), rows, ny), dtype))
    else:
        du = Mtot = None
        n_gp_arrs = 4 * n_models
    scratch.append(pltpu.SemaphoreType.DMA((2,)))

    kern = partial(_kernel_fused_gp, cfg, gpspec, bs, ny, d0, d1)

    def prep(gp_state):
        if mxu:
            return list(_prep_gp_ops_mxu(
                gp_state, active_dims, use_gp, du, Mtot, dtype))
        gp_arrs = []
        for key, dims, used in zip(("z", "x", "y"), active_dims, use_gp):
            if used:
                gp_arrs.extend(a.astype(dtype) for a in
                               _prep_gp_ops(gp_state, dims, key))
        return gp_arrs

    def call(q_ext, stat_ext, dt, *gp_arrs):
        return pl.pallas_call(
            kern,
            in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                      pl.BlockSpec(memory_space=pl.ANY),
                      pl.BlockSpec(memory_space=pl.ANY)]
                     + [pl.BlockSpec(memory_space=pltpu.VMEM)]
                     * n_gp_arrs,
            out_specs=[pl.BlockSpec((3, bs, ny), lambda i: (0, i, 0),
                                    memory_space=pltpu.VMEM),
                       pl.BlockSpec((bs, ny), lambda i: (i, 0),
                                    memory_space=pltpu.VMEM)],
            out_shape=[jax.ShapeDtypeStruct((3, nx, ny), dtype),
                       jax.ShapeDtypeStruct((nx, ny), dtype)],
            scratch_shapes=scratch,
            grid=grid,
            compiler_params=params,
        )(dt, q_ext, stat_ext, *gp_arrs)

    return call, prep


def make_pallas_gp_step_fn(cfg, active_dims, num_features, use_gp,
                           nx, ny, caps, bs=None, dtype=jnp.float32):
    """Unjitted ``step(q, topo, extra, dt, step_idx, gp_state)`` with the
    same contract as core.gp_step.make_gp_step_core, running the fused
    Pallas kernel.  MC_order must be static (pallas_supported enforces
    it), so step_idx is ignored.  ``caps`` are the static per-model
    padded capacities (z, x, y) of the gp_state buffers: capacities up to
    UNROLL_CAP take the unrolled per-point accumulation, larger ones the
    capacity-tiled MXU formulation (compile time and VMEM independent of
    capacity)."""
    call, prep = make_gp_call(cfg, active_dims, use_gp, caps, nx, ny,
                              bs, dtype)

    def step(q, topo, extra, dt, step_idx, gp_state):
        del step_idx
        q = q.astype(dtype)
        dt = jnp.asarray(dt, dtype)[None]
        q_ext = _extend_interior(q[:, 1:-1, 1:-1])
        stat_ext = _statics_ghosted(
            _extend_interior(topo.astype(dtype)[:3, 1:-1, 1:-1]),
            _extend_interior(extra.astype(dtype)[:, 1:-1, 1:-1]))

        out_q, out_p = call(q_ext, stat_ext, dt, *prep(gp_state))

        q_new = _reassemble(q, out_q)
        p_full = jnp.pad(out_p, ((1, 1), (1, 1)), mode="wrap")
        return q_new, p_full

    return step


def gp_bc_kernel_supported(cfg, ny, active_dims, use_gp):
    """Coverage of the D/N (uniform-edge) GP step kernel.

    The bc det kernel's conditions (static pass order, lane-aligned
    width, per-edge-uniform P/D/N, no thinning) plus the GP feature
    constraint.  Fully periodic configs take the cheaper wrap-layout
    kernel (:func:`gp_kernel_supported`) instead.
    """
    if (cfg.MC_order == 0 or ny % 128 or cfg.thinning is not None
            or _fully_periodic(cfg) or not _edges_uniform(cfg)):
        return False
    for dims, used in zip(active_dims, use_gp):
        if used and (dims is None or any(d >= 7 for d in dims)):
            return False
    return True


def _kernel_fused_gp_bc(cfg, gpspec, bs, ny, n_strips, per_x, d0, d1,
                        dt_ref, q_hbm, st_hbm, *refs):
    """Per-strip GP-closed MacCormack step on a D/N (uniform-edge)
    domain: the :func:`_kernel_fused_gp` body on the W-wide
    ghost-explicit layout with the serial ghost refill between the
    passes (ops.stencil._refill_ghosts — the bc det kernel's scheme).

    q-only output: the callers (whole-run scans of frozen-GP
    production runs, Problem.run_steps_gp_fast) discard the pass-2
    pressure, so the ghost-ring pressure emission that the per-step
    host protocol needs (al_chunked / GP x EHL pass-2 deformation)
    stays out of scope — those paths keep the XLA step on D/N domains.
    """
    if gpspec.get("mode") == "mxu":
        Waug, Aaug, out_q, q_loc, st_loc, gp_out, sems = refs
        gp_ops = (Waug, Aaug, gp_out, gpspec["du"], gpspec["mt"])
    else:
        n_models = sum(gpspec["use"])
        gp_arrs = refs[:4 * n_models]
        out_q, q_loc, st_loc, sems = refs[4 * n_models:]

        gp_ops = {}
        k = 0
        for key, used in zip(("z", "x", "y"), gpspec["use"]):
            if used:
                gp_ops[key] = tuple(gp_arrs[4 * k:4 * k + 4])
                k += 1

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

    a, b, c, _ = _one_pass_gp(cfg, gpspec, q0_0, q1_0, q2_0, st, dt, d0,
                              gp_ops)
    a, b, c = _refill_ghosts(cfg, [a, b, c], bs, ny, i, n_strips)
    a2, b2, c2, _ = _one_pass_gp(cfg, gpspec, a, b, c, st, dt, d1,
                                 gp_ops)

    sl = slice(HALO_X, HALO_X + bs)
    out_q[0] = (a2[sl, :ny] + q0_0[sl, :ny]) / 2.
    out_q[1] = (b2[sl, :ny] + q1_0[sl, :ny]) / 2.
    out_q[2] = (c2[sl, :ny] + q2_0[sl, :ny]) / 2.


def make_gp_call_bc(cfg, active_dims, use_gp, caps, nx, ny, bs=None,
                    dtype=jnp.float32):
    """Raw D/N GP-step pallas_call on W-wide extended arrays (q-only).

    Returns ``(call, prep)``: ``call(q_ext, stat_ext, dt, *gp_arrs) ->
    out_q (3, nx, ny)`` over the :func:`ops.stencil._extend_bc`
    ghost-explicit layout, and ``prep(gp_state) -> [gp_arrs]``.
    """
    if not gp_bc_kernel_supported(cfg, ny, active_dims, use_gp):
        raise ValueError("D/N GP Pallas kernel does not cover this "
                         "config")
    mxu = max(c for c, u in zip(caps, use_gp) if u) > UNROLL_CAP
    W = _pad_width(ny)
    per_x = all(cfg.bc_edge(0)["P"])
    if bs is None:
        bs = max(8, min(nx, ((64 * 1024) // ny) // 8 * 8))
        while nx % bs and bs > 8:
            bs -= 8
    bs = min(bs, nx)
    assert nx % bs == 0 and bs % 8 == 0
    grid = (nx // bs,)
    rows = bs + 2 * HALO_X
    d0, d1 = mc_directions(cfg.MC_order)
    params = pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024)
    gpspec = {"dims": active_dims, "use": use_gp,
              "fast": bool(getattr(cfg, "gp_fast_pred", False))}
    n_models = sum(use_gp)
    scratch = [pltpu.VMEM((3, rows, W), dtype),
               pltpu.VMEM((N_STATIC, rows, W), dtype)]
    if mxu:
        du, Mtot, mt = _mxu_spec(active_dims, use_gp, caps)
        gpspec.update(mode="mxu", du=du, mt=mt)
        n_gp_arrs = 2
        scratch.append(pltpu.VMEM((8 + 2 * len(du), rows, W), dtype))
    else:
        du = Mtot = None
        n_gp_arrs = 4 * n_models
    scratch.append(pltpu.SemaphoreType.DMA((2,)))

    kern = partial(_kernel_fused_gp_bc, cfg, gpspec, bs, ny, grid[0],
                   per_x, d0, d1)

    def prep(gp_state):
        if mxu:
            return list(_prep_gp_ops_mxu(
                gp_state, active_dims, use_gp, du, Mtot, dtype))
        gp_arrs = []
        for key, dims, used in zip(("z", "x", "y"), active_dims, use_gp):
            if used:
                gp_arrs.extend(a.astype(dtype) for a in
                               _prep_gp_ops(gp_state, dims, key))
        return gp_arrs

    def call(q_ext, stat_ext, dt, *gp_arrs):
        return pl.pallas_call(
            kern,
            in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                      pl.BlockSpec(memory_space=pl.ANY),
                      pl.BlockSpec(memory_space=pl.ANY)]
                     + [pl.BlockSpec(memory_space=pltpu.VMEM)]
                     * n_gp_arrs,
            out_specs=pl.BlockSpec((3, bs, ny), lambda i: (0, i, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((3, nx, ny), dtype),
            scratch_shapes=scratch,
            grid=grid,
            compiler_params=params,
        )(dt, q_ext, stat_ext, *gp_arrs)

    return call, prep


def make_pallas_gp_step_bc_fn(cfg, active_dims, num_features, use_gp,
                              nx, ny, caps, bs=None, dtype=jnp.float32):
    """Unjitted q-only GP step for D/N domains:
    ``step(q, topo, extra, dt, gp_state) -> q`` through the bc GP
    kernel, ghost ring refreshed with the serial fill (linear, so the
    fresh fill equals the step-evolved ghosts).  Used by the whole-run
    frozen-GP scan (run_steps_gp_fast) on uniform-D/N configurations.
    """
    from ..core.step import apply_bcs

    call, prep = make_gp_call_bc(cfg, active_dims, use_gp, caps, nx, ny,
                                 bs, dtype)
    W = _pad_width(ny)
    per_x = all(cfg.bc_edge(0)["P"])

    def step(q, topo, extra, dt, gp_state):
        q = q.astype(dtype)
        dt = jnp.asarray(dt, dtype)[None]
        q_ext = _extend_bc(q, per_x, W)
        stat_ext = _statics_ghosted(
            _extend_bc(topo.astype(dtype)[:3], per_x, W),
            _extend_bc(extra.astype(dtype), per_x, W))
        out_q = call(q_ext, stat_ext, dt, *prep(gp_state))
        out = jnp.zeros_like(q).at[:, 1:-1, 1:-1].set(out_q)
        return apply_bcs(out, cfg)

    return step


def _kernel_gp_vmem(cfg, gpspec, bs, nx, n_steps, d0, d1,
                    dt_ref, q_hbm, st_hbm, *refs):
    """Whole-run-in-VMEM GP-closed loop (the det _kernel_fused_vmem
    structure with GP-surrogate closures): the halo-extended state
    ping-pongs between two VMEM buffers, the statics and (tiny) GP train
    arrays stay VMEM-resident, and the entire n-step GP-closed run
    touches HBM exactly twice.  This is the temporal whole-run analogue
    of the det kernel family for the flagship multiscale mode — the
    production path for converged/paused surrogates (active learning
    re-enters through core.al_chunked).  Grid = (n_steps, n_strips)."""
    if gpspec.get("mode") == "mxu":
        Waug, Aaug, out_hbm, qA, qB, st_loc, gp_out, sems = refs
        gp_ops = (Waug, Aaug, gp_out, gpspec["du"], gpspec["mt"])
    else:
        n_models = sum(gpspec["use"])
        gp_arrs = refs[:4 * n_models]
        out_hbm, qA, qB, st_loc, sems = refs[4 * n_models:]
        gp_ops = {}
        k = 0
        for key, used in zip(("z", "x", "y"), gpspec["use"]):
            if used:
                gp_ops[key] = tuple(gp_arrs[4 * k:4 * k + 4])
                k += 1

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
        a, b, c, _ = _one_pass_gp(cfg, gpspec, q0_0, q1_0, q2_0, st, dt,
                                  d0, gp_ops)
        a, b, c, _ = _one_pass_gp(cfg, gpspec, a, b, c, st, dt, d1,
                                  gp_ops)
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


def _gp_vmem_need(nx, ny, dtype, bs, cap_max):
    """Scoped-VMEM estimate for the whole-run GP loop at strip size bs.

    2x3 ping-pong state channels + statics resident for the whole run;
    per-strip: the (8, rows, ny) GP scratch plus the live per-cell pass
    temporaries.  In the UNROLLED accumulation (cap_max <= UNROLL_CAP)
    Mosaic keeps ~3 temporaries live per unrolled train point (measured
    214 floats/cell at capacity 64 — 115.9 MB total at 1024^2, bs 64),
    so the coefficient scales with capacity; the MXU formulation's tile
    loop is rolled and its live set is capacity-independent."""
    item = jnp.dtype(dtype).itemsize
    ext_bytes = (nx + 2 * HALO_X) * ny * item
    rows = bs + 2 * HALO_X
    if cap_max > UNROLL_CAP:
        # 8 output + up to 14 staged feature channels in the gp scratch
        strip = (22 * rows + 80 * bs) * ny * item \
            + 6 * MXU_TILE * ny * item
    else:
        strip = (8 * rows + (int(3.3 * cap_max) + 50) * bs) * ny * item
    return (6 + N_STATIC) * ext_bytes + strip


_GP_VMEM_BUDGET = 90 * 1024 * 1024


def _gp_loop_bs(nx, ny, dtype, cap_max):
    """Largest strip (multiple of 8, divides nx) within the VMEM budget,
    capped at the det-kernel heuristic; None if even bs=8 overflows."""
    bs = max(8, min(nx, ((64 * 1024) // ny) // 8 * 8))
    while nx % bs and bs > 8:
        bs -= 8
    while bs >= 8:
        if nx % bs == 0 and \
                _gp_vmem_need(nx, ny, dtype, bs, cap_max) < _GP_VMEM_BUDGET:
            return bs
        bs -= 8
    return None


def gp_loop_vmem_fits(cfg, nx, ny, dtype=jnp.float32, caps=None,
                      use_gp=None):
    """Whether the ping-pong state + statics + GP scratch fit VMEM (at
    SOME strip size).  caps/use_gp refine the live-temporary estimate of
    the unrolled accumulation; without them the (capacity-independent)
    MXU-formulation estimate is assumed — the production route at every
    capacity since UNROLL_CAP = 0."""
    if caps is None:
        cap_max = max(UNROLL_CAP, 1)
    else:
        used = [c for c, u in zip(caps, use_gp or (True,) * len(caps)) if u]
        cap_max = max(used) if used else max(UNROLL_CAP, 1)
    return _gp_loop_bs(nx, ny, dtype, cap_max) is not None


def make_pallas_gp_loop_fn(cfg, active_dims, num_features, use_gp,
                           nx, ny, caps, n_steps, bs=None,
                           dtype=jnp.float32):
    """Unjitted whole-run GP-closed loop: ``loop(q, topo, extra, dt,
    gp_state) -> q`` advancing ``n_steps`` (static) fixed-dt GP-surrogate
    timesteps in ONE pallas_call with the state resident in VMEM.

    Matches make_gp_step_core's per-step output exactly (same pass
    bodies); the wrapper re-derives the final pressure host-side.
    """
    if not gp_kernel_supported(cfg, ny, active_dims, use_gp):
        raise ValueError("GP Pallas kernel does not cover this config")
    if not gp_loop_vmem_fits(cfg, nx, ny, dtype, caps, use_gp):
        raise ValueError("state does not fit the whole-run VMEM budget")
    cap_max = max(c for c, u in zip(caps, use_gp) if u)
    mxu = cap_max > UNROLL_CAP
    if bs is None:
        bs = _gp_loop_bs(nx, ny, dtype, cap_max)
    bs = min(bs, nx)
    assert nx % bs == 0 and bs % 8 == 0
    rows = bs + 2 * HALO_X
    d0, d1 = mc_directions(cfg.MC_order)
    params = pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024)
    gpspec = {"dims": active_dims, "use": use_gp,
              "fast": bool(getattr(cfg, "gp_fast_pred", False))}
    n_models = sum(use_gp)
    ext_shape = (3, nx + 2 * HALO_X, ny)
    scratch = [pltpu.VMEM(ext_shape, dtype),
               pltpu.VMEM(ext_shape, dtype),
               pltpu.VMEM((N_STATIC,) + ext_shape[1:], dtype)]
    if mxu:
        du, Mtot, mt = _mxu_spec(active_dims, use_gp, caps)
        gpspec.update(mode="mxu", du=du, mt=mt)
        n_gp_arrs = 2
        # channels 8..: staged feature columns for the rolled
        # row-block loop of _gp_all_mxu (ref-sliceable)
        scratch.append(pltpu.VMEM((8 + 2 * len(du), rows, ny), dtype))
    else:
        Mtot = None
        n_gp_arrs = 4 * n_models
    scratch.append(pltpu.SemaphoreType.DMA((3,)))

    kern = partial(_kernel_gp_vmem, cfg, gpspec, bs, nx, n_steps, d0, d1)

    def loop(q, topo, extra, dt, gp_state):
        q = q.astype(dtype)
        dt = jnp.asarray(dt, dtype)[None]
        q_ext = _extend_interior(q[:, 1:-1, 1:-1])
        stat_ext = _statics_ghosted(
            _extend_interior(topo.astype(dtype)[:3, 1:-1, 1:-1]),
            _extend_interior(extra.astype(dtype)[:, 1:-1, 1:-1]))

        if mxu:
            gp_arrs = list(_prep_gp_ops_mxu(
                gp_state, active_dims, use_gp, du, Mtot, dtype))
        else:
            gp_arrs = []
            for key, dims, used in zip(("z", "x", "y"), active_dims,
                                       use_gp):
                if used:
                    gp_arrs.extend(a.astype(dtype) for a in
                                   _prep_gp_ops(gp_state, dims, key))

        out = pl.pallas_call(
            kern,
            in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                      pl.BlockSpec(memory_space=pl.ANY),
                      pl.BlockSpec(memory_space=pl.ANY)]
                     + [pl.BlockSpec(memory_space=pltpu.VMEM)]
                     * n_gp_arrs,
            out_specs=pl.BlockSpec(memory_space=pl.ANY),
            out_shape=jax.ShapeDtypeStruct(ext_shape, dtype),
            scratch_shapes=scratch,
            grid=(n_steps, nx // bs),
            compiler_params=params,
        )(dt, q_ext, stat_ext, *gp_arrs)

        return _reassemble(q, out[:, HALO_X:HALO_X + nx, :])

    return loop


def _kernel_gp_hbm_loop(cfg, gpspec, bs, nx, n_strips, n_sweeps, k,
                        d0, d1, dt_ref, q_hbm, st_hbm, *refs):
    """Whole-run temporal-blocked GP loop for VMEM-exceeding grids: the
    full n_sweeps*k-step GP-closed run in ONE pallas_call, ping-ponging
    the halo-extended state between two HBM buffers — the det
    _kernel_fused_hbm_loop schedule with GP-surrogate passes.  Each
    (sweep, strip) cell advances its strip k steps in VMEM (trapezoid
    tiling: 2k <= HALO_X rows of halo consumed), double-buffered per
    stencil._hbm_schedule; the (tiny) GP train arrays stay VMEM-resident
    across the whole run."""
    from .stencil import _hbm_schedule

    if gpspec.get("mode") == "mxu":
        Waug, Aaug = refs[:2]
        outA, outB, q_loc, st_loc, out_loc, gp_out, sems = refs[2:]
        gp_ops = (Waug, Aaug, gp_out, gpspec["du"], gpspec["mt"])
    else:
        n_models = sum(gpspec["use"])
        gp_arrs = refs[:4 * n_models]
        outA, outB, q_loc, st_loc, out_loc, sems = refs[4 * n_models:]
        gp_ops = {}
        kk = 0
        for key, used in zip(("z", "x", "y"), gpspec["use"]):
            if used:
                gp_ops[key] = tuple(gp_arrs[4 * kk:4 * kk + 4])
                kk += 1

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
            out_loc.at[slot],
            dst.at[:, pl.ds(HALO_X + x0, bs), :], sems.at[4 + slot])

    def compute(slot):
        st = tuple(st_loc[slot, c] for c in range(N_STATIC))
        q0, q1, q2 = (q_loc[slot, c] for c in range(3))
        for _ in range(k):
            a, b, c = _one_pass_gp(cfg, gpspec, q0, q1, q2, st, dt, d0,
                                   gp_ops)[:3]
            a, b, c = _one_pass_gp(cfg, gpspec, a, b, c, st, dt, d1,
                                   gp_ops)[:3]
            q0 = (a + q0) / 2.
            q1 = (b + q1) / 2.
            q2 = (c + q2) / 2.
        return q0, q1, q2

    def store(slot, chs):
        sl = slice(HALO_X, HALO_X + bs)
        for c in range(3):
            out_loc[slot, c] = chs[c][sl]

    def halo_writes(slot, with_dst):
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


def make_pallas_gp_loop_hbm(cfg, active_dims, num_features, use_gp,
                            nx, ny, caps, n_steps, bs=None,
                            dtype=jnp.float32):
    """HBM ping-pong counterpart of :func:`make_pallas_gp_loop_fn` for
    grids whose state exceeds the VMEM budget (gp_loop_vmem_fits False):
    ``loop(q, topo, extra, dt, gp_state) -> q`` advancing ``n_steps``
    (a multiple of stencil.K_MULTI) in one pallas_call."""
    from .stencil import K_MULTI

    if not gp_kernel_supported(cfg, ny, active_dims, use_gp):
        raise ValueError("GP Pallas kernel does not cover this config")
    if n_steps % K_MULTI:
        raise ValueError(f"n_steps must be a multiple of {K_MULTI}")
    mxu = max(c for c, u in zip(caps, use_gp) if u) > UNROLL_CAP
    if bs is None:
        # tighter than the per-step kernel: two slots of (q, statics)
        # strips + the pass temporaries are live at once
        bs = max(8, min(nx, ((32 * 1024) // ny) // 8 * 8))
        while nx % bs and bs > 8:
            bs -= 8
    bs = min(bs, nx)
    assert nx % bs == 0 and bs % 8 == 0
    rows = bs + 2 * HALO_X
    d0, d1 = mc_directions(cfg.MC_order)
    params = pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024)
    gpspec = {"dims": active_dims, "use": use_gp,
              "fast": bool(getattr(cfg, "gp_fast_pred", False))}
    n_models = sum(use_gp)
    ext_shape = (3, nx + 2 * HALO_X, ny)
    n_sweeps = n_steps // K_MULTI
    if mxu:
        du, Mtot, mt = _mxu_spec(active_dims, use_gp, caps)
        gpspec.update(mode="mxu", du=du, mt=mt)
        n_gp_arrs = 2
    else:
        du = Mtot = None
        n_gp_arrs = 4 * n_models
    scratch = [
        pltpu.VMEM((2, 3, rows, ny), dtype),
        pltpu.VMEM((2, N_STATIC, rows, ny), dtype),
        pltpu.VMEM((2, 3, bs, ny), dtype),
    ]
    if mxu:
        # channels 8..: staged feature columns for the rolled
        # row-block loop of _gp_all_mxu (ref-sliceable)
        scratch.append(pltpu.VMEM((8 + 2 * len(du), rows, ny), dtype))
    scratch.append(pltpu.SemaphoreType.DMA((7,)))

    kern = partial(_kernel_gp_hbm_loop, cfg, gpspec, bs, nx, nx // bs,
                   n_sweeps, K_MULTI, d0, d1)

    def loop(q, topo, extra, dt, gp_state):
        q = q.astype(dtype)
        dt = jnp.asarray(dt, dtype)[None]
        q_ext = _extend_interior(q[:, 1:-1, 1:-1])
        stat_ext = _statics_ghosted(
            _extend_interior(topo.astype(dtype)[:3, 1:-1, 1:-1]),
            _extend_interior(extra.astype(dtype)[:, 1:-1, 1:-1]))

        if mxu:
            gp_arrs = list(_prep_gp_ops_mxu(
                gp_state, active_dims, use_gp, du, Mtot, dtype))
        else:
            gp_arrs = []
            for key, dims, used in zip(("z", "x", "y"), active_dims,
                                       use_gp):
                if used:
                    gp_arrs.extend(a.astype(dtype) for a in
                                   _prep_gp_ops(gp_state, dims, key))

        outs = pl.pallas_call(
            kern,
            in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                      pl.BlockSpec(memory_space=pl.ANY),
                      pl.BlockSpec(memory_space=pl.ANY)]
                     + [pl.BlockSpec(memory_space=pltpu.VMEM)]
                     * n_gp_arrs,
            out_specs=[pl.BlockSpec(memory_space=pl.ANY),
                       pl.BlockSpec(memory_space=pl.ANY)],
            out_shape=[jax.ShapeDtypeStruct(ext_shape, dtype),
                       jax.ShapeDtypeStruct(ext_shape, dtype)],
            scratch_shapes=scratch,
            grid=(n_sweeps, nx // bs),
            compiler_params=params,
        )(dt, q_ext, stat_ext, *gp_arrs)

        out = outs[(n_sweeps - 1) % 2]
        return _reassemble(q, out[:, HALO_X:HALO_X + nx, :])

    return loop
