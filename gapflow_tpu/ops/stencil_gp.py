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
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .stencil import (HALO_X, N_STATIC, _eta_fused,
                      _extend_interior, _reassemble, _statics_ghosted,
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


def _features7(q0, q1, q2, st):
    """The 7 built-in feature columns from the strip-local state."""
    return (q0, q1, q2, st[2], st[0], st[1], 0.5 * st[3])


def _gp_mean(feats, dims, coef, W, w2, alpha, n_out):
    """Matern-3/2 GP mean(s) over a strip block.

    feats: the 7 feature arrays; dims: static feature indices;
    coef: (7,) per-feature scale (inv lengthscale / Xscale, zeros for
    inactive dims); W: (cap, d) scaled train inputs; w2: (cap,) squared
    norms; alpha: (cap, n_out) weights with amp and Yscale folded in.
    Unrolled over the (static) capacity — per point: d FMAs + one
    sqrt/exp, all VPU."""
    xs = [feats[d] * coef[0, i] for i, d in enumerate(dims)]
    x2 = sum(x * x for x in xs)
    cap = W.shape[0]
    acc = [jnp.zeros_like(feats[0]) for _ in range(n_out)]
    for j in range(cap):
        dot = sum(x * W[j, i] for i, x in enumerate(xs))
        r2 = x2 - 2. * dot + w2[j, 0]
        r = jnp.sqrt(jnp.maximum(r2, 0.) + 1e-14)
        arg = _SQRT3 * r
        kj = (1. + arg) * jnp.exp(-arg)
        for m in range(n_out):
            acc[m] = acc[m] + kj * alpha[j, m]
    return acc


def _one_pass_gp(cfg, gpspec, q0, q1, q2, st, dt, d, gp_ops):
    """One MacCormack pass with GP-surrogate closures (periodic layout).

    Mirrors stencil._one_pass_fused with the pressure replaced by the GP
    mean (when active) and the wall-stress source slots corrected to the
    GP values (when active).  Returns (q0', q1', q2', p)."""
    dims_z, dims_x, dims_y = gpspec["dims"]
    gpz, gpx, gpy = gpspec["use"]
    feats = _features7(q0, q1, q2, st)

    if gpz:
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
            cx, Wx, w2x, axw = gp_ops["x"]
            lo, up = _gp_mean(feats, dims_x, cx, Wx, w2x, axw, 2)
            S1 = S1 + ((up - su_det) - (lo - sl_det)) * inv_h
        if gpy:
            su_det = -e2g * (3. * q2 - Vr)
            sl_det = e2g * (Ls6 * (q2 - Vr)
                            + H * (3. * q2 - 2. * Vr)) * inv_h
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

    refs layout: per active model (z, x, y): coef, W, w2, alpha (VMEM);
    then outputs (q out block, p out block) and scratch (q_loc, st_loc,
    sems)."""
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

    W = Xfit * inv_ls[None, :]
    w2 = jnp.sum(W * W, axis=1, keepdims=True)            # (cap, 1)
    # test side: feat / Xscale[dim] * inv_ls -> one coefficient per dim
    coef = (inv_ls / Xscale[jnp.asarray(dims)])[None, :]  # (1, d)
    a = alpha if alpha.ndim == 2 else alpha[:, None]
    a = a * (amp * gp_state[f"Yscale_{key}"])
    return coef, W, w2, a


def make_pallas_gp_step_fn(cfg, active_dims, num_features, use_gp,
                           nx, ny, bs=None, dtype=jnp.float32):
    """Unjitted ``step(q, topo, extra, dt, step_idx, gp_state)`` with the
    same contract as core.gp_step.make_gp_step_core, running the fused
    Pallas kernel.  MC_order must be static (pallas_supported enforces
    it), so step_idx is ignored."""
    if not gp_kernel_supported(cfg, ny, active_dims, use_gp):
        raise ValueError("GP Pallas kernel does not cover this config")
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
    gpspec = {"dims": active_dims, "use": use_gp}
    n_models = sum(use_gp)

    kern = partial(_kernel_fused_gp, cfg, gpspec, bs, ny, d0, d1)

    def step(q, topo, extra, dt, step_idx, gp_state):
        del step_idx
        q = q.astype(dtype)
        dt = jnp.asarray(dt, dtype)[None]
        q_ext = _extend_interior(q[:, 1:-1, 1:-1])
        stat_ext = _statics_ghosted(
            _extend_interior(topo.astype(dtype)[:3, 1:-1, 1:-1]),
            _extend_interior(extra.astype(dtype)[:, 1:-1, 1:-1]))

        gp_arrs = []
        for key, dims, used in zip(("z", "x", "y"), active_dims, use_gp):
            if used:
                gp_arrs.extend(a.astype(dtype)
                               for a in _prep_gp_ops(gp_state, dims, key))

        out_q, out_p = pl.pallas_call(
            kern,
            in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                      pl.BlockSpec(memory_space=pl.ANY),
                      pl.BlockSpec(memory_space=pl.ANY)]
                     + [pl.BlockSpec(memory_space=pltpu.VMEM)]
                     * (4 * n_models),
            out_specs=[pl.BlockSpec((3, bs, ny), lambda i: (0, i, 0),
                                    memory_space=pltpu.VMEM),
                       pl.BlockSpec((bs, ny), lambda i: (i, 0),
                                    memory_space=pltpu.VMEM)],
            out_shape=[jax.ShapeDtypeStruct((3, nx, ny), dtype),
                       jax.ShapeDtypeStruct((nx, ny), dtype)],
            scratch_shapes=[
                pltpu.VMEM((3, rows, ny), dtype),
                pltpu.VMEM((N_STATIC, rows, ny), dtype),
                pltpu.SemaphoreType.DMA((2,)),
            ],
            grid=grid,
            compiler_params=params,
        )(dt, q_ext, stat_ext, *gp_arrs)

        q_new = _reassemble(q, out_q)
        p_full = jnp.pad(out_p, ((1, 1), (1, 1)), mode="wrap")
        return q_new, p_full

    return step
