"""Fused Pallas TPU kernel for the MacCormack timestep (periodic BCs).

One kernel invocation computes BOTH MacCormack passes and the temporal
average for a row strip: the strip (plus halos) is DMA'd from HBM into
VMEM once, every intermediate (pressure, wall/bulk stresses, fluxes) lives
in VMEM, and only the final averaged strip goes back to HBM.  This removes
the intermediate HBM round-trips of the XLA path (which materializes the
per-pass state between fusions).

Decomposition: strips along x (the sublane dimension).  Mosaic requires
HBM->VMEM slice shapes aligned to the (8, 128) tile, so strips carry a
4-cell x-halo (2 needed by the two passes + 2 alignment padding).  The y
axis is kept whole and un-haloed: with periodic boundaries the in-kernel
roll over the full width IS the periodic wrap, so y needs no ghost data
(requires ny to be a multiple of 128).

The kernel is VPU-bound, so the hot path uses the hand-factored closures
(gapflow_tpu.models.closures_opt) with all static per-cell factors
(1/h, 1/(4Ls+h), ...) precomputed once per run — one dynamic reciprocal
per cell remains.  Equivalence with the sympy-generated expressions is
asserted by tests/test_closures_opt.py; equivalence of the kernel with
the XLA fused step by tests/test_pallas.py.

Scope: fully periodic boundaries (the production large-grid case: journal
and asperity topographies); other BCs take the XLA fused path.
"""

from functools import lru_cache, partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..core.integrate import hyperbolicFlux, diffusiveFlux, source
from ..core.step import det_closures
from ..models.eos import eos_pressure
from ..models.closures_opt import (fused_pass_top_pre, precompute_statics,
                                   N_STATIC)

HALO_X = 4   # 2 physics cells + 2 alignment padding


def pallas_supported(cfg, ny=128):
    """The kernel covers fully periodic problems with static pass order
    and lane-aligned width."""
    return (cfg.MC_order != 0
            and ny % 128 == 0
            and all(all(dict(cfg.bc[i])["P"]) for i in range(4)))


def _fused_applicable(cfg):
    return cfg.piezo is None and cfg.thinning is None


# ---------------------------------------------------------------------------
# Pass bodies
# ---------------------------------------------------------------------------

def _one_pass_generic(cfg, q, topo, extra, dt, d):
    """Generic MacCormack pass (any EOS/viscosity model)."""
    p, tau_bulk, s_lo, s_up = det_closures(cfg, q, topo, extra)
    FxH, FyH = hyperbolicFlux(q, p)
    FxD, FyD = diffusiveFlux(q, tau_bulk)
    Fx = FxH + FxD
    Fy = FyH + FyD
    # pltpu.roll needs a non-negative static shift; d is +-1
    flux_x = -d * (pltpu.roll(Fx, d % Fx.shape[1], axis=1) - Fx)
    flux_y = -d * (pltpu.roll(Fy, d % Fy.shape[2], axis=2) - Fy)
    src = source(q, topo, tau_bulk, s_lo, s_up)
    return q - dt * (flux_x / cfg.dx + flux_y / cfg.dy - src)


def _one_pass_fused(cfg, q0, q1, q2, st, dt, d):
    """Newtonian hot path: factored closures + precomputed statics,
    unstacked component updates."""
    p = eos_pressure(q0, cfg.prop)
    tb_xx, tb_yy, tb_xy, S0, S1, S2 = fused_pass_top_pre(
        q0, q1, q2, st, cfg.U, cfg.V, cfg.shear, cfg.bulk)

    rdx = 1. / cfg.dx
    rdy = 1. / cfg.dy

    def ddx(F):
        return -d * (pltpu.roll(F, d % F.shape[0], axis=0) - F) * rdx

    def ddy(F):
        return -d * (pltpu.roll(F, d % F.shape[1], axis=1) - F) * rdy

    q0n = q0 - dt * (ddx(q1) + ddy(q2) - S0)
    q1n = q1 - dt * (ddx(p + tb_xx) + ddy(tb_xy) - S1)
    q2n = q2 - dt * (ddx(tb_xy) + ddy(p + tb_yy) - S2)
    return q0n, q1n, q2n


# ---------------------------------------------------------------------------
# Kernels
# ---------------------------------------------------------------------------

def _kernel_fused(cfg, bs, d0, d1,
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
    a, b, c = _one_pass_fused(cfg, a, b, c, st, dt, d1)

    sl = slice(HALO_X, HALO_X + bs)
    out_ref[0] = (a[sl] + q0_0[sl]) / 2.
    out_ref[1] = (b[sl] + q1_0[sl]) / 2.
    out_ref[2] = (c[sl] + q2_0[sl]) / 2.


def _kernel_generic(cfg, bs, d0, d1,
                    dt_ref, q_hbm, topo_hbm, extra_hbm, out_ref,
                    q_loc, topo_loc, extra_loc, sems):
    i = pl.program_id(0)
    x0 = pl.multiple_of(i * bs, 8)
    rows = bs + 2 * HALO_X

    cp_q = pltpu.make_async_copy(
        q_hbm.at[:, pl.ds(x0, rows), :], q_loc, sems.at[0])
    cp_t = pltpu.make_async_copy(
        topo_hbm.at[:, pl.ds(x0, rows), :], topo_loc, sems.at[1])
    cp_e = pltpu.make_async_copy(
        extra_hbm.at[:, pl.ds(x0, rows), :], extra_loc, sems.at[2])
    cp_q.start()
    cp_t.start()
    cp_e.start()
    cp_q.wait()
    cp_t.wait()
    cp_e.wait()

    dt = dt_ref[0]
    q0 = q_loc[:]
    topo = topo_loc[:]
    extra = extra_loc[:]

    q1 = _one_pass_generic(cfg, q0, topo, extra, dt, d0)
    q2 = _one_pass_generic(cfg, q1, topo, extra, dt, d1)

    out_ref[:] = (q2[:, HALO_X:HALO_X + bs, :]
                  + q0[:, HALO_X:HALO_X + bs, :]) / 2.


# ---------------------------------------------------------------------------
# Builders
# ---------------------------------------------------------------------------

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

    Live temporaries scale with bs*ny; bs*ny ~ 128*1024 fits comfortably
    within the 16 MB VMEM (measured on v5e with the factored closures).
    """
    budget = 128 * 1024
    bs = max(8, min(nx, (budget // ny) // 8 * 8))
    while nx % bs and bs > 8:
        bs -= 8
    return bs


@lru_cache(maxsize=16)
def _make_call(cfg, nx, ny, bs, dtype):
    """The raw pallas_call on x-extended interior arrays."""
    if not pallas_supported(cfg, ny):
        raise ValueError("Pallas step requires fully periodic BCs, a static "
                         "MacCormack pass order, and ny % 128 == 0")
    if bs is None:
        bs = _auto_bs(nx, ny)
    bs = min(bs, nx)
    assert nx % bs == 0 and bs % 8 == 0, \
        "strip size must divide nx and align to 8"
    grid = (nx // bs,)
    rows = bs + 2 * HALO_X
    d0, d1 = [(-1, 1), (1, -1)][(cfg.MC_order + 1) // 2]
    fused = _fused_applicable(cfg)

    params = pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024)
    common = dict(
        grid=grid,
        out_specs=pl.BlockSpec((3, bs, ny), lambda i: (0, i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((3, nx, ny), dtype),
        compiler_params=params,
    )

    if fused:
        kernel = partial(_kernel_fused, cfg, bs, d0, d1)

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
    else:
        kernel = partial(_kernel_generic, cfg, bs, d0, d1)

        def call(q_ext, topo_ext, extra_ext, dt):
            n_extra = extra_ext.shape[0]
            return pl.pallas_call(
                kernel,
                in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)]
                         + [pl.BlockSpec(memory_space=pl.ANY)] * 3,
                scratch_shapes=[
                    pltpu.VMEM((3, rows, ny), dtype),
                    pltpu.VMEM((4, rows, ny), dtype),
                    pltpu.VMEM((n_extra, rows, ny), dtype),
                    pltpu.SemaphoreType.DMA((3,)),
                ],
                **common,
            )(dt, q_ext, topo_ext, extra_ext)

    return call, fused


@lru_cache(maxsize=16)
def make_pallas_step(cfg, nx, ny, bs=None, dtype=jnp.float32):
    """Single fused two-pass stencil step on ghost-inclusive arrays.

    Matches :func:`gapflow_tpu.core.step.make_det_step` for periodic
    problems (minus residual/validity bookkeeping).
    """
    call, fused = _make_call(cfg, nx, ny, bs, dtype)

    @jax.jit
    def step(q, topo, extra, dt, step_idx):
        del step_idx
        q = q.astype(dtype)
        dt = jnp.asarray(dt, dtype)[None]
        q_ext = _extend_interior(q[:, 1:-1, 1:-1])
        if fused:
            stats = precompute_statics(topo.astype(dtype)[:, 1:-1, 1:-1],
                                       extra.astype(dtype)[:, 1:-1, 1:-1])
            q_int = call(q_ext, _extend_interior(stats), dt)
        else:
            q_int = call(q_ext,
                         _extend_interior(topo.astype(dtype)[:, 1:-1, 1:-1]),
                         _extend_interior(extra.astype(dtype)[:, 1:-1, 1:-1]),
                         dt)
        return _reassemble(q, q_int)

    return step


@lru_cache(maxsize=16)
def make_pallas_loop(cfg, nx, ny, bs=None, dtype=jnp.float32):
    """n-step driver around the fused kernel with statics hoisted.

    ``loop(q, topo, extra, dt, n_steps) -> q`` on ghost-inclusive arrays:
    static-field extension and precomputation happen once; between steps q
    stays in interior layout (one wrap-concat per step).  ``n_steps`` is
    static per compilation.
    """
    call, fused = _make_call(cfg, nx, ny, bs, dtype)

    @partial(jax.jit, static_argnames=("n_steps",))
    def loop(q, topo, extra, dt, n_steps):
        q = q.astype(dtype)
        dt = jnp.asarray(dt, dtype)[None]
        topo_i = topo.astype(dtype)[:, 1:-1, 1:-1]
        extra_i = extra.astype(dtype)[:, 1:-1, 1:-1]

        if fused:
            stat_ext = _extend_interior(precompute_statics(topo_i, extra_i))
            args = (stat_ext,)
        else:
            args = (_extend_interior(topo_i), _extend_interior(extra_i))

        def body(i, q_int):
            return call(_extend_interior(q_int), *args, dt)

        q_int = jax.lax.fori_loop(0, n_steps, body, q[:, 1:-1, 1:-1])
        return _reassemble(q, q_int)

    return loop
