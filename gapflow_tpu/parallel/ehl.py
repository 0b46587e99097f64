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


def make_sharded_gp_ehl_loop(problem, mesh, active_dims, num_features,
                             use_gp, caps, deform_every=1,
                             use_pallas=None, adaptive=False):
    """Sharded FROZEN-GP x elastic loop: ``loop(q, u_prev, topo0, dt,
    n_steps, gp_state) -> (q, u)``.

    ``adaptive=True`` (requires ``deform_every=1``) carries dt in the
    loop state and refreshes it per step AFTER the deformation from the
    rebuilt topography (the host ``_post_update`` sequencing; same dt
    protocol as the serial ``core.ehl.make_gp_ehl_loop`` adaptive mode)
    via the pmax-reduced per-shard sound speed
    (parallel.gp.make_sharded_cfl_fn).  Returns
    ``(q, u, dt, simtime_inc)`` instead.

    The flagship multiscale EHL mode over a device mesh, closing the
    composition gap (GP x elastic x sharding): GP-closed fluid steps run
    spatially sharded — training set replicated, test points sharded
    (parallel.gp; on covered f32 configurations the fused GP kernel per
    shard, parallel.pallas_halo.make_sharded_gp_pallas_loop) — while the
    elastic FFT runs replicated on the gathered end-of-step GP pressure
    (the same replicate-and-FFT trade as :func:`make_sharded_ehl_loop`)
    and the rebuilt topography is resliced into overlapping blocks on
    device.

    ``q`` is the INTERIOR (3, Nx, Ny) sharded P(None,'x','y');
    ``u_prev`` the ghost-inclusive deformation, replicated; ``topo0``
    the host topography used verbatim for step 0 (it carries the
    geometry's analytic gradients until the first elastic update — host
    ``topo.update()`` sequencing); ``gp_state`` the replicated
    core.gp_step layout at padded capacities ``caps``.

    Protocol: end-of-step pressure deformation with the compounded
    relaxation factor — fixed-point equivalent to the host's pass-2
    protocol and EQUAL to the serial ``core.ehl.make_gp_ehl_loop`` with
    ``end_pressure=True`` (tests/test_sharded_driver.py).  Reference
    analogue: GaPFlow/problem.py:509-586 + topography.py:424-441.

    The deforming GP pressure is evaluated INSIDE shard_map (each shard
    contracts its own cells against the replicated training cache) and
    only the resulting 2D field is gathered for the FFT.  Evaluating the
    closures on a gathered replicated q instead miscompiles under the
    SPMD partitioner (observed on jax 0.8 CPU meshes: the replicated
    region feeding the large kernel matmul loses the gathered interior),
    and per-shard evaluation is the right layout anyway — test points
    sharded, training set replicated.
    """
    from jax import shard_map
    from ..core.gp_step import make_gp_closures
    from ..ops.stencil import _fully_periodic
    from .gp import make_sharded_gp_step, make_sharded_cfl_fn

    if not problem.topo.elastic:
        raise ValueError("problem has no elastic coupling")
    if adaptive and deform_every != 1:
        raise ValueError("adaptive dt requires deform_every=1")

    cfg = problem._solver_cfg
    ed = problem.topo.ElasticDeformation
    hs_deform = ed.deformation_full
    alpha = ed.alpha_underrelax
    shift_reference = ed.periodicity in ("half", "none")

    px, py = mesh.shape["x"], mesh.shape["y"]
    repl = NamedSharding(mesh, P())
    blk = NamedSharding(mesh, P(None, "x", "y"))

    h_und = np.asarray(problem.topo.h_undeformed)
    extra_full_host = np.asarray(problem.fc.get_real_field("extra").p)

    K = int(deform_every)
    alpha_K = 1. - (1. - alpha) ** K

    nx, ny = problem.grid["Nx"], problem.grid["Ny"]
    closures = make_gp_closures(cfg, active_dims, num_features, use_gp)
    spec = P(None, "x", "y")

    # p ring: unused under fft_grid='interior' (deformation_full acts on
    # the interior and rebuilds its own ring); exact as a wrap under full
    # periodicity.  The remaining case ('ghost' grid + D/N edges) gets
    # the ghost-feature closures on the gathered field, evaluated inside
    # a replicated shard_map (see docstring).
    ring_from_wrap = ed.fft_grid == "interior" or _fully_periodic(cfg)

    def _p_local(qb, tb, eb, gp_state):
        return closures(qb, tb, eb, gp_state)[0]

    p_shard_fn = shard_map(_p_local, mesh=mesh,
                           in_specs=(spec, spec, spec, P()),
                           out_specs=P("x", "y"), check_vma=False)
    if not ring_from_wrap:
        p_repl_fn = shard_map(_p_local, mesh=mesh,
                              in_specs=(P(), P(), P(), P()),
                              out_specs=P(), check_vma=False)

    if use_pallas is None:
        from ..ops.stencil_gp import gp_kernel_supported
        import jax as _jax
        use_pallas = (not _jax.config.jax_enable_x64
                      and _jax.default_backend() != "cpu"
                      and cfg.MC_order != 0
                      and nx % px == 0 and ny % py == 0
                      and (nx // px) % 8 == 0 and (ny // py) % 8 == 0
                      and gp_kernel_supported(cfg, ny // py, active_dims,
                                              use_gp))

    if use_pallas:
        from .pallas_halo import (make_sharded_gp_pallas_loop,
                                  pad_blocks2_jnp, pad_blocks2)
        gp_loop = make_sharded_gp_pallas_loop(cfg, mesh, nx, ny,
                                              active_dims, num_features,
                                              use_gp, caps)
        extra2_host = pad_blocks2(np.asarray(extra_full_host, np.float32),
                                  px, py)
    else:
        step = make_sharded_gp_step(cfg, active_dims, num_features,
                                    use_gp, mesh)
    # 1-cell pad_blocks layout: the non-pallas fluid step, and the
    # adaptive CFL refresh in either branch
    extra_b_host = pad_blocks(extra_full_host, px, py)
    if adaptive:
        cfl_fn = make_sharded_cfl_fn(cfg, active_dims, num_features,
                                     use_gp, mesh)

    @partial(jax.jit, static_argnames=("n_steps",))
    def loop(q, u_prev, topo0, dt, n_steps, gp_state):
        assert n_steps % K == 0, "n_steps must be divisible by deform_every"
        u0 = lax.with_sharding_constraint(jnp.asarray(u_prev), repl)
        topo0_full = lax.with_sharding_constraint(
            jnp.asarray(topo0, q.dtype), repl)
        extra_full = jnp.asarray(extra_full_host, q.dtype)
        if use_pallas:
            extra2 = lax.with_sharding_constraint(
                jnp.asarray(extra2_host, q.dtype), blk)
        if not use_pallas or adaptive:
            extra_b = lax.with_sharding_constraint(
                jnp.asarray(extra_b_host, q.dtype), blk)

        def advance_one(i, q, u, dt_c):
            u_eff = u - (u[0, 0] if shift_reference else 0.)
            topo_r = _topo_from_deformation(h_und, u_eff, cfg.dx,
                                            cfg.dy).astype(q.dtype)
            topo_full = jnp.where(i == 0, topo0_full, topo_r)
            if use_pallas:
                topo2 = lax.with_sharding_constraint(
                    pad_blocks2_jnp(topo_full, px, py), blk)
                q = gp_loop(q, topo2, extra2, dt_c, K, gp_state)
            else:
                topo_b = lax.with_sharding_constraint(
                    pad_blocks_jnp(topo_full, px, py), blk)

                def fluid(k, qq):
                    return step(qq, topo_b, extra_b, dt_c, i * K + k,
                                gp_state)

                q = lax.fori_loop(0, K, fluid, q)

            # deforming GP pressure: evaluated per shard (test points
            # sharded against the replicated training cache), then the
            # 2D field is gathered for the replicated FFT
            if ring_from_wrap:
                topo_int = lax.with_sharding_constraint(
                    topo_full[:, 1:-1, 1:-1], blk)
                extra_int = lax.with_sharding_constraint(
                    extra_full[:, 1:-1, 1:-1], blk)
                p_int = lax.with_sharding_constraint(
                    p_shard_fn(q, topo_int, extra_int, gp_state), repl)
                p = jnp.pad(p_int, ((1, 1), (1, 1)), mode="wrap")
            else:
                # ghost-grid FFT with D/N edges: ghost features matter —
                # rebuild the serial ghost ring (fills are linear, so the
                # fresh fill equals the step-evolved ghosts) and run the
                # closures replicated
                q_repl = lax.with_sharding_constraint(q, repl)
                q_ghost = apply_bcs(
                    jnp.pad(q_repl, ((0, 0), (1, 1), (1, 1))), cfg)
                p = p_repl_fn(q_ghost, topo_full, extra_full, gp_state)
            if shift_reference:
                p = p - p[0, 0]
            u_new = hs_deform(p.astype(u.dtype))
            u = (1. - alpha_K) * u + alpha_K * u_new
            return q, lax.with_sharding_constraint(u, repl)

        if adaptive:
            def body_a(i, carry):
                q, u, dt_c, t = carry
                q, u = advance_one(i, q, u, dt_c)
                # dt refresh AFTER the deformation, from the updated
                # topography (host _post_update sequencing)
                u_eff2 = u - (u[0, 0] if shift_reference else 0.)
                topo_n = _topo_from_deformation(h_und, u_eff2, cfg.dx,
                                                cfg.dy).astype(q.dtype)
                topo_nb = lax.with_sharding_constraint(
                    pad_blocks_jnp(topo_n, px, py), blk)
                t = t + dt_c
                dt_c = cfl_fn(q, topo_nb, extra_b,
                              gp_state).astype(dt_c.dtype)
                return q, u, dt_c, t

            return lax.fori_loop(
                0, n_steps, body_a,
                (q, u0, jnp.asarray(dt, q.dtype),
                 jnp.zeros((), q.dtype)))

        def body(i, carry):
            q, u = carry
            return advance_one(i, q, u, dt)

        return lax.fori_loop(0, n_steps // K, body, (q, u0))

    return loop


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
