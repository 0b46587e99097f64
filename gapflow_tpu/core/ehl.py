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


def make_ehl_loop(problem, use_pallas="auto", dtype=None):
    """Build ``loop(q, u_prev, dt, n_steps) -> (q, u)`` for an elastic Problem.

    q and u are ghost-inclusive arrays; the Problem supplies the half-space
    kernel, under-relaxation factor, undeformed gap and solver config.
    """
    if not problem.topo.elastic:
        raise ValueError("problem has no elastic coupling")

    cfg = problem._solver_cfg
    ed = problem.topo.ElasticDeformation
    hs_deform = ed._hs.deformation
    alpha = ed.alpha_underrelax
    shift_reference = ed.periodicity in ("half", "none")

    h_und = jnp.asarray(problem.topo.h_undeformed)
    extra = jnp.asarray(problem.fc.get_real_field("extra").p)
    prop = cfg.prop
    nx, ny = problem.grid["Nx"], problem.grid["Ny"]

    from ..ops import make_pallas_step, pallas_supported
    if use_pallas == "auto":
        use_pallas = pallas_supported(cfg, ny)

    if use_pallas:
        dtype = dtype or jnp.float32
        fluid_step = make_pallas_step(cfg, nx, ny, dtype=dtype)
    else:
        dtype = dtype or jnp.asarray(problem.q).dtype
        det = make_det_step(cfg, with_aux=False)

        def fluid_step(q, topo, extra_, dt, i):
            from .state import SimState
            state = SimState(
                q=q, topo=topo, extra=extra_, dt=dt,
                step=jnp.asarray(i, jnp.int32),
                simtime=jnp.asarray(0., q.dtype),
                ekin_old=jnp.asarray(1., q.dtype),
                residual=jnp.asarray(1., q.dtype),
                residual_buffer=jnp.full((5,), jnp.inf, q.dtype),
                valid=jnp.asarray(True))
            return det(state).q

    h_und = h_und.astype(dtype)
    extra_d = extra.astype(dtype)

    @partial(jax.jit, static_argnames=("n_steps",))
    def loop(q, u_prev, dt, n_steps):
        q = jnp.asarray(q, dtype)
        u_prev = jnp.asarray(u_prev, dtype)
        dt = jnp.asarray(dt, dtype)

        def body(i, carry):
            q, u = carry
            topo = _topo_from_deformation(
                h_und + 0., u - (u[0, 0] if shift_reference else 0.),
                cfg.dx, cfg.dy)
            # note: h uses the reference-shifted deformation like the host
            q = fluid_step(q, topo.astype(dtype), extra_d, dt, i)

            p = eos_pressure(q[0], prop)
            if shift_reference:
                p = p - p[0, 0]
            u_new = hs_deform(p.astype(u.dtype))
            u = (1. - alpha) * u + alpha * u_new
            return q, u

        return jax.lax.fori_loop(0, n_steps, body, (q, u_prev))

    return loop
