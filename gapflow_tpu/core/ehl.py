"""Fully on-device elastohydrodynamic (EHL) stepping.

Couples the fused MacCormack step with the FFT elastic half-space inside
one jitted loop: per step, the gap topography is rebuilt from the
under-relaxed deformation state, the fluid advances one (Pallas or XLA)
timestep, and the new pressure deforms the surface — no host round trips.

The host path (reference protocol) computes the deformation from the
pass-2 pressure; here the deformation uses the end-of-step pressure, which
converges to the same steady state (EHL runs under-relax toward a fixed
point where both coincide) — verified in tests/test_ehl_loop.py.

This covers the 'large 2D rough-surface EHL' production configuration:
1024^2 grids with per-step elastic coupling at Pallas throughput.
"""

from functools import partial

import jax
import jax.numpy as jnp

from ..models.eos import eos_pressure
from .step import make_det_step


def _topo_from_deformation(h_undeformed, u, dx, dy):
    """Rebuild the (4, nx+2, ny+2) topography from a deformation field."""
    h = h_undeformed + u
    dh_dx = jnp.gradient(h, axis=0) / dx
    dh_dy = jnp.gradient(h, axis=1) / dy
    return jnp.stack([h, dh_dx, dh_dy, u])


def make_gp_ehl_loop(problem, active_dims, num_features, use_gp,
                     deform_every=1, dtype=None, end_pressure=False,
                     use_vmem_inner=None, adaptive=False):
    """Fused FROZEN-GP x elastic loop: ``loop(q, u_prev, topo0, dt,
    step0, n_steps, gp_state) -> (q, u)``.

    ``adaptive=True`` (requires ``deform_every=1``) carries dt in the
    loop state and refreshes it per step from the CFL criterion with the
    host-exact sequencing (reference GaPFlow/problem.py:435-440: step →
    deform → ``dt = CFL * dmin / (v_max + v_sound)`` with v_sound
    evaluated on the post-deformation topography; GP pressure takes the
    autodiffed GP sound speed).  The loop then returns
    ``(q, u, dt, simtime_inc)``.

    Composes the GP-closed MacCormack step (core.gp_step — auto-routing
    to the per-step Pallas GP kernel on covered TPU configurations) with
    the FFT elastic half-space inside one jitted program, with the HOST
    protocol's sequencing (reference GaPFlow/problem.py:565-569 +
    topography.py:424-441, the same composition core/al_chunked.py
    verifies for the AL path):

    - step 0 uses the host-synced topography verbatim (it carries the
      geometry's analytic gradients until the first ``topo.update()``);
      later steps rebuild it from the carried deformation;
    - after each step the PASS-2 pressure (shifted for half/none
      periodicity) deforms the surface under-relaxed into the carried
      (unshifted) ``u_prev`` state.

    ``deform_every=K`` evaluates the FFT every K fluid steps with the
    compounded relaxation factor 1-(1-alpha)^K (same fixed point as
    :func:`make_ehl_loop`'s K-chunking); the deforming pressure is then
    the GP/EOS pressure of the end-of-chunk state.  K=1 is host-exact
    (tests/test_al_chunked.py asserts trajectory equality).

    ``end_pressure=True`` deforms from the END-of-step GP/EOS pressure
    instead of the pass-2 one (the convention of :func:`make_ehl_loop`
    and the sharded loops — fixed-point equivalent); K>1 always uses it.

    For K > 1 on kernel-covered f32 configurations the inner K steps
    run the whole-run-in-VMEM GP loop kernel
    (ops.stencil_gp.make_pallas_gp_loop_fn): the state ping-pongs in
    VMEM between deformation updates and HBM is touched twice per
    chunk.  ``use_vmem_inner=None`` auto-detects; True forces it (test
    hook, interpret mode), False keeps the per-step scan.
    """
    from .gp_step import (make_gp_step_core, make_gp_closures,
                          make_v_sound, cfl_dt)

    if not problem.topo.elastic:
        raise ValueError("problem has no elastic coupling")
    if adaptive and deform_every != 1:
        raise ValueError("adaptive dt requires deform_every=1 "
                         "(host-exact per-step sequencing)")

    cfg = problem._solver_cfg
    ed = problem.topo.ElasticDeformation
    hs_deform = ed.deformation_full
    alpha = ed.alpha_underrelax
    shift_ref = ed.periodicity in ("half", "none")

    dtype = dtype or jnp.asarray(problem.q).dtype
    h_und = jnp.asarray(problem.topo.h_undeformed, dtype)
    extra_d = jnp.asarray(problem.fc.get_real_field("extra").p, dtype)

    step_core = make_gp_step_core(cfg, active_dims, num_features, use_gp)
    closures = make_gp_closures(cfg, active_dims, num_features, use_gp)
    v_sound = make_v_sound(cfg, active_dims, num_features, use_gp)

    K = int(deform_every)
    alpha_K = 1. - (1. - alpha) ** K
    nx, ny = problem.grid["Nx"], problem.grid["Ny"]

    def _inner_kernel_loop(gp_state):
        """Whole-run VMEM GP kernel for the K inner steps, or None."""
        if K == 1 or use_vmem_inner is False:
            return None
        from ..ops.stencil_gp import (gp_kernel_supported,
                                      gp_loop_vmem_fits,
                                      make_pallas_gp_loop_fn)
        caps = tuple(gp_state[f"Xfit_{k}"].shape[0] if u else 0
                     for k, u in zip(("z", "x", "y"), use_gp))
        if use_vmem_inner is None:
            ok = (dtype == jnp.float32
                  and jax.default_backend() != "cpu"
                  and nx % 8 == 0
                  and gp_kernel_supported(cfg, ny, active_dims, use_gp)
                  and gp_loop_vmem_fits(cfg, nx, ny, dtype, caps, use_gp))
            if not ok:
                return None
        return make_pallas_gp_loop_fn(cfg, active_dims, num_features,
                                      use_gp, nx, ny, caps, K,
                                      dtype=dtype)

    @partial(jax.jit, static_argnames=("n_steps",))
    def loop(q, u_prev, topo0, dt, step0, n_steps, gp_state):
        assert n_steps % K == 0, "n_steps must be divisible by deform_every"
        q = jnp.asarray(q, dtype)
        u = jnp.asarray(u_prev)
        topo0_d = jnp.asarray(topo0, dtype)
        dt = jnp.asarray(dt, dtype)
        inner_loop = _inner_kernel_loop(gp_state)

        if adaptive:
            def body_a(i, carry):
                q, u, dt_c, t = carry
                u_eff = (u - (u[0, 0] if shift_ref else 0.)).astype(dtype)
                topo_r = _topo_from_deformation(h_und, u_eff,
                                                cfg.dx, cfg.dy)
                topo_d = jnp.where(i == 0, topo0_d, topo_r)
                q, p = step_core(q, topo_d, extra_d, dt_c,
                                 step0 + i, gp_state)
                if end_pressure:
                    p, _, _, _ = closures(q, topo_d, extra_d, gp_state)
                if shift_ref:
                    p = p - p[0, 0]
                u_new = hs_deform(p.astype(u.dtype))
                u = (1. - alpha_K) * u + alpha_K * u_new
                # dt refresh AFTER the deformation, from the updated
                # topography (host _post_update sequencing)
                u_eff2 = (u - (u[0, 0] if shift_ref else 0.)).astype(dtype)
                topo_n = _topo_from_deformation(h_und, u_eff2,
                                                cfg.dx, cfg.dy)
                c = v_sound(q, topo_n, extra_d, gp_state)
                t = t + dt_c
                dt_c = cfl_dt(cfg, q, c).astype(dtype)
                return q, u, dt_c, t

            return jax.lax.fori_loop(
                0, n_steps, body_a,
                (q, u, dt, jnp.zeros((), dtype)))

        def body(i, carry):
            q, u = carry
            u_eff = (u - (u[0, 0] if shift_ref else 0.)).astype(dtype)
            topo_r = _topo_from_deformation(h_und, u_eff, cfg.dx, cfg.dy)
            topo_d = jnp.where(i == 0, topo0_d, topo_r)

            if K == 1:
                q, p_last = step_core(q, topo_d, extra_d, dt,
                                      step0 + i, gp_state)
                if end_pressure:
                    p, _, _, _ = closures(q, topo_d, extra_d, gp_state)
                else:
                    p = p_last
            elif inner_loop is not None:
                q = inner_loop(q, topo_d, extra_d, dt, gp_state)
                p, _, _, _ = closures(q, topo_d, extra_d, gp_state)
            else:
                def inner(k, qq):
                    qn, _ = step_core(qq, topo_d, extra_d, dt,
                                      step0 + i * K + k, gp_state)
                    return qn
                q = jax.lax.fori_loop(0, K, inner, q)
                p, _, _, _ = closures(q, topo_d, extra_d, gp_state)

            if shift_ref:
                p = p - p[0, 0]
            u_new = hs_deform(p.astype(u.dtype))
            u = (1. - alpha_K) * u + alpha_K * u_new
            return q, u

        return jax.lax.fori_loop(0, n_steps // K, body, (q, u))

    return loop


def make_ehl_loop(problem, use_pallas="auto", dtype=None, deform_every=1,
                  statics_in_kernel=True):
    """Build ``loop(q, u_prev, dt, n_steps) -> (q, u)`` for an elastic Problem.

    q and u are ghost-inclusive arrays; the Problem supplies the half-space
    kernel, under-relaxation factor, undeformed gap and solver config.

    ``deform_every=K`` evaluates the FFT elastic update every K fluid
    steps with the compounded relaxation factor 1-(1-alpha)^K — the same
    fixed point, ~K x fewer FFTs.  With under-relaxation factors of
    1e-3..1e-4 the deformation moves by well under 1% of its increment
    per step, so K of O(10) changes the transient negligibly; K=1 is the
    reference protocol.  The fluid advances through the fast n-step
    Pallas loop within each K-chunk (statics hoisted per chunk).
    ``n_steps`` must be divisible by K.
    """
    if not problem.topo.elastic:
        raise ValueError("problem has no elastic coupling")

    cfg = problem._solver_cfg
    ed = problem.topo.ElasticDeformation
    hs_deform = ed.deformation_full     # ghost- or interior-grid FFT
    alpha = ed.alpha_underrelax
    shift_reference = ed.periodicity in ("half", "none")

    h_und = jnp.asarray(problem.topo.h_undeformed)
    extra = jnp.asarray(problem.fc.get_real_field("extra").p)
    prop = cfg.prop
    nx, ny = problem.grid["Nx"], problem.grid["Ny"]

    from ..ops import make_pallas_step, make_pallas_loop, pallas_supported
    from ..ops.stencil import (make_pallas_ehl_step,
                               make_pallas_ehl_loop_step, _fully_periodic,
                               _reassemble)
    if use_pallas == "auto":
        use_pallas = pallas_supported(cfg, ny)

    K = int(deform_every)
    alpha_K = 1. - (1. - alpha) ** K

    ehl_kernel = (use_pallas and statics_in_kernel and K == 1
                  and _fully_periodic(cfg) and cfg.thinning is None)
    if ehl_kernel:
        # statics-in-kernel per-step path: the topography/statics rebuild
        # (the dominant HBM cost of the reference protocol) happens inside
        # the fused kernel from h_und + u; in f32 the kernel additionally
        # carries the interior-only (q, q_lo) Kahan state and builds its
        # own wrap halos, eliminating the per-step extension/reassembly
        dtype = dtype or jnp.float32
        comp = dtype == jnp.float32
        if comp:
            _estep6 = make_pallas_ehl_loop_step(cfg, nx, ny, dtype=dtype)
        else:
            _estep = make_pallas_ehl_step(cfg, nx, ny, dtype=dtype)
    elif use_pallas:
        dtype = dtype or jnp.float32
        # f32 production needs Kahan-compensated accumulation CARRIED
        # across chunks (per-step increments near the EHL steady state
        # fall below one ulp of q and a plain carry freezes; a per-chunk
        # compensation term restarting at zero would re-freeze) — see
        # examples/validate_f32_production.py
        comp = dtype == jnp.float32
        if K > 1:
            inner_loop = make_pallas_loop(cfg, nx, ny, dtype=dtype,
                                          compensated=comp, with_lo=comp)

            if comp:
                def fluid_chunk(carry, topo, extra_, dt, i):
                    q, lo = carry
                    return inner_loop(q, topo, extra_, dt, K, lo)
            else:
                def fluid_chunk(carry, topo, extra_, dt, i):
                    q, lo = carry
                    return inner_loop(q, topo, extra_, dt, K), lo
        else:
            _step = make_pallas_step(cfg, nx, ny, dtype=dtype)

            def fluid_chunk(carry, topo, extra_, dt, i):
                q, lo = carry
                return _step(q, topo, extra_, dt, i), lo
    else:
        dtype = dtype or jnp.asarray(problem.q).dtype
        det = make_det_step(cfg, with_aux=False)

        def fluid_chunk(carry, topo, extra_, dt, i):
            from .state import SimState

            q, lo = carry

            def one(k, qq):
                state = SimState(
                    q=qq, topo=topo, extra=extra_, dt=dt,
                    step=jnp.asarray(i + k, jnp.int32),
                    simtime=jnp.asarray(0., qq.dtype),
                    ekin_old=jnp.asarray(1., qq.dtype),
                    residual=jnp.asarray(1., qq.dtype),
                    residual_buffer=jnp.full((5,), jnp.inf, qq.dtype),
                    valid=jnp.asarray(True))
                return det(state).q

            return jax.lax.fori_loop(0, K, one, q), lo

    h_und = h_und.astype(dtype)
    extra_d = extra.astype(dtype)

    if ehl_kernel and comp:
        # interior-carry compensated loop: (q, q_lo) stays ghost-free
        # between steps; the ghost ring is periodic wrap, so the pressure
        # ring is the wrap of the interior pressure and the final state
        # is reassembled once after the loop
        h_und_int = h_und[1:-1, 1:-1]
        ls_int = extra_d[0, 1:-1, 1:-1]
        rdx2 = jnp.asarray(0.5 / cfg.dx, dtype)
        rdy2 = jnp.asarray(0.5 / cfg.dy, dtype)

        def _wrapv(v):
            from ..ops.stencil import HALO_X
            return jnp.concatenate([v[-HALO_X:], v, v[:HALO_X]], axis=0)

        @partial(jax.jit, static_argnames=("n_steps",))
        def loop(q, u_prev, dt, n_steps):
            q = jnp.asarray(q, dtype)
            u_prev = jnp.asarray(u_prev, dtype)
            dt = jnp.asarray(dt, dtype)

            def body(i, carry):
                q6, u = carry
                u_eff = u - (u[0, 0] if shift_reference else 0.)
                h_full_edge = h_und + u_eff        # only edge slices used
                px = jnp.stack([
                    (h_full_edge[2, 1:-1] - h_full_edge[0, 1:-1]) * rdx2,
                    (h_full_edge[-1, 1:-1] - h_full_edge[-3, 1:-1]) * rdx2])
                py = jnp.stack([
                    _wrapv((h_full_edge[1:-1, 2]
                            - h_full_edge[1:-1, 0]) * rdy2),
                    _wrapv((h_full_edge[1:-1, -1]
                            - h_full_edge[1:-1, -3]) * rdy2)], axis=1)
                h_int = h_und_int + u_eff[1:-1, 1:-1]
                q6 = _estep6(q6, h_int, ls_int, px, py, dt)

                p = jnp.pad(eos_pressure(q6[0], prop),
                            ((1, 1), (1, 1)), mode="wrap")
                u_new = hs_deform(p.astype(u.dtype))
                u = (1. - alpha_K) * u + alpha_K * u_new
                return q6, u

            q6_0 = jnp.concatenate(
                [q[:, 1:-1, 1:-1], jnp.zeros_like(q[:, 1:-1, 1:-1])], 0)
            q6, u = jax.lax.fori_loop(0, n_steps, body, (q6_0, u_prev))
            return _reassemble(q, q6[:3]), u

        return loop

    @partial(jax.jit, static_argnames=("n_steps",))
    def loop(q, u_prev, dt, n_steps):
        assert n_steps % K == 0, "n_steps must be divisible by deform_every"
        q = jnp.asarray(q, dtype)
        u_prev = jnp.asarray(u_prev, dtype)
        dt = jnp.asarray(dt, dtype)

        def body(i, carry):
            q, lo, u = carry
            u_eff = u - (u[0, 0] if shift_reference else 0.)
            if ehl_kernel:
                # topography/statics rebuilt inside the kernel
                q = _estep(q, u_eff, h_und, extra_d, dt)
            else:
                topo = _topo_from_deformation(h_und, u_eff, cfg.dx, cfg.dy)
                # note: h uses the reference-shifted deformation, as host
                q, lo = fluid_chunk((q, lo), topo.astype(dtype), extra_d,
                                    dt, i * K)

            p = eos_pressure(q[0], prop)
            if shift_reference:
                p = p - p[0, 0]
            u_new = hs_deform(p.astype(u.dtype))
            u = (1. - alpha_K) * u + alpha_K * u_new
            return q, lo, u

        lo0 = jnp.zeros_like(q[:, 1:-1, 1:-1])
        q, _, u = jax.lax.fori_loop(0, n_steps // K, body, (q, lo0, u_prev))
        return q, u

    return loop
