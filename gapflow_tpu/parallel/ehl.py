"""Sharded elastohydrodynamic (EHL) stepping over a device mesh.

Couples the halo-exchange fluid step (parallel.halo) with the FFT
elastic half-space inside one jitted loop.  The division of labor:

- FLUID: spatially sharded — every MacCormack pass exchanges one-cell
  halos over ICI (shard_map + ppermute), exactly as the deterministic
  sharded path.
- ELASTIC: the pressure field is gathered to every device
  (``with_sharding_constraint`` to a replicated sharding — XLA inserts
  the all_gather) and the Green's-function FFT product runs replicated.
  At reference scales this is the right trade: the (Nx+2)x(Ny+2)
  pressure is a few MB (1024^2 f32 = 4 MB, well within ICI all-gather
  budget per deformation update), while a mesh-decomposed 2D FFT would
  pay two all-to-all transposes of the SAME data volume per transform
  — more collective traffic than the gather it replaces, plus a
  latency-bound butterfly.  Replicate-and-FFT wins until grids far
  beyond the reference's production sizes.
- The rebuilt topography (gap + gradients + deformation) is resliced
  into overlapping pad_blocks on device and constrained back to the
  block sharding — XLA keeps each shard's slice local.

Protocol: end-of-step pressure deformation with under-relaxation,
matching core.ehl.make_ehl_loop (fixed-point-equivalent to the
reference's pass-2 protocol, GaPFlow/topography.py:424-441; verified in
tests/test_ehl_loop.py).  ``deform_every=K`` compounds the relaxation
factor exactly as the serial loop.

Reference analogue: GaPFlow/problem.py:509-586 with
GaPFlow/topography.py:424-441 (single-process NumPy + serial FFT).
"""

from functools import partial

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import NamedSharding, PartitionSpec as P

from ..core.ehl import _topo_from_deformation
from ..core.step import apply_bcs
from ..models.eos import eos_pressure
from .halo import make_sharded_det_step, pad_blocks, pad_blocks_jnp


def make_sharded_ehl_loop(problem, mesh, deform_every=1, use_pallas=None):
    """Build ``loop(q, u_prev, dt, n_steps) -> (q, u)`` sharded over mesh.

    ``q`` is the INTERIOR (3, Nx, Ny) sharded P(None,'x','y') (use
    halo.shard_problem_arrays); ``u_prev`` is the ghost-inclusive
    (Nx+2, Ny+2) deformation, replicated.  Semantics match
    core.ehl.make_ehl_loop (XLA path) to floating-point reduction order.

    On covered configurations (fully periodic, f32, no thinning, grid
    dividing the mesh) the fluid steps between deformation updates run
    the FUSED Pallas kernel per shard (parallel.pallas_halo) instead of
    the XLA local step — per-chip throughput is the serial kernel's.
    ``use_pallas=None`` auto-routes; False forces the XLA step.
    """
    if not problem.topo.elastic:
        raise ValueError("problem has no elastic coupling")

    cfg = problem._solver_cfg
    ed = problem.topo.ElasticDeformation
    hs_deform = ed.deformation_full     # ghost- or interior-grid FFT
    alpha = ed.alpha_underrelax
    shift_reference = ed.periodicity in ("half", "none")

    px, py = mesh.shape["x"], mesh.shape["y"]
    repl = NamedSharding(mesh, P())
    blk = NamedSharding(mesh, P(None, "x", "y"))

    # host-side (numpy) closures: these become replicated jit constants,
    # which stays legal when the mesh spans multiple processes (closing
    # over a committed global jax.Array would not — jax raises)
    h_und = np.asarray(problem.topo.h_undeformed)
    extra_b_host = pad_blocks(problem.fc.get_real_field("extra").p, px, py)

    K = int(deform_every)
    alpha_K = 1. - (1. - alpha) ** K

    nx, ny = problem.grid["Nx"], problem.grid["Ny"]
    if use_pallas is None:
        from ..ops.stencil import _fully_periodic
        import jax as _jax
        # the wrap-layout shard kernel pads the lane width itself, so the
        # only requirements are the periodic scope, a static pass order
        # and 8-aligned shard blocks
        use_pallas = (not _jax.config.jax_enable_x64
                      and _fully_periodic(cfg)
                      and cfg.thinning is None
                      and cfg.MC_order != 0
                      and nx % px == 0 and ny % py == 0
                      and (nx // px) % 8 == 0 and (ny // py) % 8 == 0)

    if use_pallas:
        from .pallas_halo import (make_sharded_pallas_loop,
                                  pad_blocks2_jnp, pad_blocks2)
        pallas_loop = make_sharded_pallas_loop(cfg, mesh, nx, ny)
        extra2_host = pad_blocks2(
            np.asarray(problem.fc.get_real_field("extra").p, np.float32),
            px, py)
    else:
        step = make_sharded_det_step(cfg, mesh)

    @partial(jax.jit, static_argnames=("n_steps",))
    def loop(q, u_prev, dt, n_steps):
        assert n_steps % K == 0, "n_steps must be divisible by deform_every"
        u0 = lax.with_sharding_constraint(jnp.asarray(u_prev), repl)
        if use_pallas:
            extra2 = lax.with_sharding_constraint(
                jnp.asarray(extra2_host, q.dtype), blk)
        else:
            extra_b = lax.with_sharding_constraint(
                jnp.asarray(extra_b_host, q.dtype), blk)

        def body(i, carry):
            q, u = carry
            u_eff = u - (u[0, 0] if shift_reference else 0.)
            topo_full = _topo_from_deformation(h_und, u_eff, cfg.dx, cfg.dy)
            if use_pallas:
                topo2 = lax.with_sharding_constraint(
                    pad_blocks2_jnp(topo_full.astype(q.dtype), px, py),
                    blk)
                q = pallas_loop(q, topo2, extra2, dt, K)
            else:
                topo_b = lax.with_sharding_constraint(
                    pad_blocks_jnp(topo_full.astype(q.dtype), px, py), blk)

                def fluid(k, qq):
                    return step(qq, topo_b, extra_b, dt, i * K + k)

                q = lax.fori_loop(0, K, fluid, q)

            # gather the evolved interior, rebuild the serial ghost ring
            # (ghost fills are linear, so the fresh fill equals the
            # step-evolved ghosts), and deform from its pressure
            q_repl = lax.with_sharding_constraint(q, repl)
            q_ghost = apply_bcs(jnp.pad(q_repl, ((0, 0), (1, 1), (1, 1))),
                                cfg)
            p = eos_pressure(q_ghost[0], cfg.prop)
            if shift_reference:
                p = p - p[0, 0]
            u_new = hs_deform(p.astype(u.dtype))
            u = (1. - alpha_K) * u + alpha_K * u_new
            return q, lax.with_sharding_constraint(u, repl)

        return lax.fori_loop(0, n_steps // K, body, (q, u0))

    return loop
