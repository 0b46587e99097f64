"""Fused GP-surrogate MacCormack step: one XLA program per timestep.

The reference (and our host path) re-enters Python around every GP
prediction — ~10 device dispatches per timestep.  When no retraining is
pending (active learning off, paused, or converged database), the entire
GP-closed timestep is a pure function of the state and the three GP
caches, so it fuses into a single jitted program:

    per pass: build the feature matrix from the current q,
              predict pressure and wall-stress means with the cached
              (L, alpha) kernel algebra,
              assemble the wall/bulk stress fields,
              advance q one MacCormack pass + ghost fill.

Deterministic components (bulk stress; the xx/yy/zz/xy wall components)
come from the same closures as the deterministic path.  Variance
computation and retraining stay host-driven (reference protocol:
variance is only evaluated on predictor passes before output steps or
for active learning).
"""

from functools import lru_cache

import jax
import jax.numpy as jnp
from jax import lax

from .integrate import predictor_corrector, source
from .step import apply_bcs, effective_viscosity, mc_directions
from ..models.gp import kernel_fn
from ..models.viscous import stress_bottom, stress_top, stress_avg
from ..models.eos import eos_pressure


def _features(q, topo, extra):
    """(n_feat, N) feature rows: rho, jx, jy, h, hx, hy, extra..."""
    return jnp.concatenate([q, topo[:3], extra], axis=0)


def _gp_mean(params, X_fit, alpha, Xtest):
    # full-precision contraction: the TPU default (bf16 passes) costs ~1%
    # on the predicted stresses — measured against the f64 truth while
    # validating the fused Pallas GP kernel, which accumulates in f32
    Ks = kernel_fn(params, X_fit, Xtest)
    return jnp.matmul(Ks.T, alpha,
                      precision=jax.lax.Precision.HIGHEST).T


def make_gp_closures(cfg, active_dims, num_features, use_gp):
    """GP-surrogate constitutive closures, shape-agnostic.

    Returns ``closures(q, topo, extra, gp_state) -> (p, tau_bulk, s_bot,
    s_top)`` operating on any (3, a, b) block — the serial ghost-inclusive
    array or a halo-padded shard (parallel.gp) — with the training set in
    ``gp_state`` replicated.  See :func:`make_gp_step_core` for the
    gp_state layout.
    """
    dims_z, dims_x, dims_y = active_dims
    gpz, gpx, gpy = use_gp

    def closures(q, topo, extra, gp_state):
        shape = q.shape[1:]
        feats = _features(q, topo, extra)
        Xf = (feats.reshape(num_features, -1).T
              / gp_state["Xscale"][None, :])

        # pressure
        if gpz:
            p = (_gp_mean(gp_state["params_z"], gp_state["Xfit_z"],
                          gp_state["alpha_z"],
                          Xf[:, list(dims_z)]).reshape(shape)
                 * gp_state["Yscale_z"])
        else:
            p = eos_pressure(q[0], cfg.prop)

        h3 = topo[:3]
        eta = effective_viscosity(cfg, q, p, h3[0])
        Ls = extra

        s_bot = stress_bottom(q, h3, cfg.U, cfg.V, eta, cfg.bulk, Ls)
        s_top = stress_top(q, h3, cfg.U, cfg.V, eta, cfg.bulk, Ls)
        tau_bulk = stress_avg(q, h3, cfg.U, cfg.V, eta, cfg.bulk, Ls)

        # GP wall shear overrides: xz model writes Voigt 4, yz writes 3;
        # the 2-column mean is (bottom, top)
        if gpx:
            mean = (_gp_mean(gp_state["params_x"], gp_state["Xfit_x"],
                             gp_state["alpha_x"], Xf[:, list(dims_x)])
                    * gp_state["Yscale_x"])
            s_bot = s_bot.at[4].set(mean[0].reshape(shape))
            s_top = s_top.at[4].set(mean[1].reshape(shape))
        if gpy:
            mean = (_gp_mean(gp_state["params_y"], gp_state["Xfit_y"],
                             gp_state["alpha_y"], Xf[:, list(dims_y)])
                    * gp_state["Yscale_y"])
            s_bot = s_bot.at[3].set(mean[0].reshape(shape))
            s_top = s_top.at[3].set(mean[1].reshape(shape))

        return p, tau_bulk, s_bot, s_top

    return closures


def make_gp_step_core(cfg, active_dims, num_features, use_gp,
                      allow_pallas=True):
    """Unjitted GP-closed timestep builder (shared with the AL loop).

    active_dims: (dims_z, dims_x, dims_y) tuples (None when that surrogate
    is deterministic); use_gp: (z, x, y) booleans; num_features: feature
    count of the database.

    Returns ``step(q, topo, extra, dt, step_idx, gp_state) -> (q, p_last)``
    where gp_state is a dict with, per active surrogate k in {z, x, y}:
    ``params_k``, ``Xfit_k``, ``alpha_k``, ``Xscale`` (full feature scale),
    ``Yscale_k``.  ``Xfit_k``/``alpha_k`` may be fixed-capacity padded
    buffers (gapflow_tpu.models.al_jit) — padded alpha rows are zero, so
    the means are exact without masking.
    """
    closures = make_gp_closures(cfg, active_dims, num_features, use_gp)

    def one_pass(q, topo, extra, dt, d, gp_state):
        p, tau_bulk, s_lo, s_up = closures(q, topo, extra, gp_state)
        fX, fY = predictor_corrector(q, p, tau_bulk, d)
        src = source(q, topo, tau_bulk, s_lo, s_up)
        q = q - dt * (fX / cfg.dx + fY / cfg.dy - src)
        return apply_bcs(q, cfg), p

    def _pallas_route(q, gp_state):
        """Fused Pallas GP kernel on TPU for covered configurations (the
        flagship periodic multiscale runs) — 2.5-3x the XLA assembly,
        f32-identical output (verified on hardware).  Small capacities
        take the unrolled per-point accumulation; larger ones the
        capacity-tiled MXU formulation (ops.stencil_gp._gp_all_mxu), so
        every padded capacity routes to the kernel."""
        from ..ops.stencil_gp import gp_kernel_supported
        nx, ny = q.shape[1] - 2, q.shape[2] - 2
        return (allow_pallas
                and jax.default_backend() != "cpu"
                and q.dtype == jnp.float32
                and nx % 8 == 0
                and gp_kernel_supported(cfg, ny, active_dims, use_gp))

    def _caps(gp_state):
        return tuple(gp_state[f"Xfit_{k}"].shape[0] if u else 0
                     for k, u in zip(("z", "x", "y"), use_gp))

    def step(q, topo, extra, dt, step_idx, gp_state):
        if _pallas_route(q, gp_state):
            from ..ops.stencil_gp import make_pallas_gp_step_fn
            nx, ny = q.shape[1] - 2, q.shape[2] - 2
            kstep = make_pallas_gp_step_fn(cfg, active_dims, num_features,
                                           use_gp, nx, ny, _caps(gp_state))
            return kstep(q, topo, extra, dt, step_idx, gp_state)
        q0 = q

        def passes(q, d0, d1):
            q, _ = one_pass(q, topo, extra, dt, d0, gp_state)
            return one_pass(q, topo, extra, dt, d1, gp_state)

        if cfg.MC_order != 0:
            d0, d1 = mc_directions(cfg.MC_order)
            q, p_last = passes(q, d0, d1)
        else:
            q, p_last = lax.cond(step_idx % 2 == 0,
                                 lambda qq: passes(qq, 1, -1),
                                 lambda qq: passes(qq, -1, 1), q)

        q = (q + q0) / 2.
        q = apply_bcs(q, cfg)
        return q, p_last

    return step


@lru_cache(maxsize=16)
def make_gp_step(cfg, active_dims, num_features, use_gp):
    """Jitted fused GP-closed timestep (see :func:`make_gp_step_core`)."""
    return jax.jit(make_gp_step_core(cfg, active_dims, num_features, use_gp))
