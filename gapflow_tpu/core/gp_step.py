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
                      allow_pallas=True, need_p=True):
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

    ``need_p=False`` declares the caller discards ``p_last`` (the
    chunked-AL advance on non-elastic problems, the adaptive dt scan):
    uniform-D/N domains — the reference's slider-family AL
    configurations — then route through the q-only bc GP Pallas kernel
    (ops.stencil_gp.make_pallas_gp_step_bc_fn, ~3x the XLA GP step)
    instead of falling back to XLA, and ``p_last`` is a zeros
    placeholder (dead code the compiler eliminates)."""
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

    def _bc_route(q, gp_state):
        """q-only bc GP kernel on uniform-D/N domains when the caller
        discards p_last (GAPFLOW_FORCE_GP_BC_KERNEL=1 is the CPU
        interpret-mode test hook)."""
        import os
        from ..ops.stencil_gp import gp_bc_kernel_supported
        nx, ny = q.shape[1] - 2, q.shape[2] - 2
        forced = os.environ.get("GAPFLOW_FORCE_GP_BC_KERNEL") == "1"
        return (allow_pallas and not need_p
                and (forced or (jax.default_backend() != "cpu"
                                and q.dtype == jnp.float32))
                and nx % 8 == 0
                and gp_bc_kernel_supported(cfg, ny, active_dims, use_gp))

    def step(q, topo, extra, dt, step_idx, gp_state):
        if _pallas_route(q, gp_state):
            from ..ops.stencil_gp import make_pallas_gp_step_fn
            nx, ny = q.shape[1] - 2, q.shape[2] - 2
            kstep = make_pallas_gp_step_fn(cfg, active_dims, num_features,
                                           use_gp, nx, ny, _caps(gp_state))
            return kstep(q, topo, extra, dt, step_idx, gp_state)
        if _bc_route(q, gp_state):
            from ..ops.stencil_gp import make_pallas_gp_step_bc_fn
            nx, ny = q.shape[1] - 2, q.shape[2] - 2
            kstep = make_pallas_gp_step_bc_fn(cfg, active_dims,
                                              num_features, use_gp,
                                              nx, ny, _caps(gp_state),
                                              dtype=q.dtype)
            return kstep(q, topo, extra, dt, gp_state), jnp.zeros_like(q[0])
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


def make_v_sound(cfg, active_dims, num_features, use_gp):
    """Device-side max sound speed, matching the host property
    ``Pressure.v_sound`` (models/stress.py) formula for formula:

    - deterministic pressure: ``max(eos_sound_velocity(rho))`` over the
      ghost-inclusive grid;
    - GP pressure: ``sqrt(max_x d mean/d rho_norm * Yscale / Xscale[0])``
      with the gradient of the cached GP mean taken by autodiff over the
      full-grid feature matrix (reference GaPFlow/models/stress.py
      sound-speed protocol; host parity in tests/test_adaptive_device.py).

    Returns ``v_sound(q, topo, extra, gp_state) -> scalar``.  Used by the
    adaptive-dt device loops to refresh ``dt = CFL * dmin / (v_max + c)``
    per step without host round trips.
    """
    from ..models.eos import eos_sound_velocity

    dims_z = active_dims[0]
    gpz = use_gp[0]

    def v_sound(q, topo, extra, gp_state):
        if not gpz:
            return jnp.max(eos_sound_velocity(q[0], cfg.prop))

        feats = _features(q, topo, extra)
        Xf = (feats.reshape(num_features, -1).T
              / gp_state["Xscale"][None, :])
        Xtest = Xf[:, list(dims_z)]
        params = gp_state["params_z"]
        Xfit = gp_state["Xfit_z"]
        alpha = gp_state["alpha_z"]

        def mean_one(x):
            Ks = kernel_fn(params, Xfit, x[None, :])
            return (Ks.T @ alpha).squeeze()

        dmean = jax.vmap(jax.grad(mean_one))(Xtest)[:, 0]
        vs_sq = (jnp.max(dmean) * gp_state["Yscale_z"]
                 / gp_state["Xscale"][0])
        return jnp.sqrt(vs_sq)

    return v_sound


def cfl_dt(cfg, q, v_sound):
    """Adaptive timestep: ``CFL * min(dx, dy) / (v_max + v_sound)``.

    ``v_max = sqrt(max(j^2/rho))`` — the CFL convention the reference
    defines the criterion with (GaPFlow problem.py v_max property), not
    the physical velocity."""
    v_max = jnp.sqrt(jnp.max((q[1] ** 2 + q[2] ** 2) / q[0]))
    return cfg.CFL * jnp.minimum(cfg.dx, cfg.dy) / (v_max + v_sound)


@lru_cache(maxsize=32)
def make_gp_adaptive_loop(cfg, active_dims, num_features, use_gp,
                          n_steps):
    """Adaptive-dt frozen-GP device loop (non-elastic domains):
    ``loop(q, topo, extra, dt, step0, gp_state) -> (q, dt, simtime)``.

    Scans the fused GP-closed step (auto-routing to the per-step Pallas
    GP kernel on covered configs — the per-step kernels take dt as a
    traced operand, so kernel speed survives the dt carry) and refreshes
    ``dt = CFL * dmin / (v_max + v_sound)`` after every step, the host
    ``_post_update`` protocol (reference GaPFlow/problem.py:435-440).

    ``n_steps`` is STATIC (cached per length): a traced bound lowers the
    fori_loop to while_loop, and Mosaic kernels inside a while_loop wedge
    the TPU compiler indefinitely (measured on hardware: the static-bound
    program compiles in ~3 s, the dynamic-bound one never returns).
    """
    step_core = make_gp_step_core(cfg, active_dims, num_features, use_gp,
                                  need_p=False)
    v_sound = make_v_sound(cfg, active_dims, num_features, use_gp)

    @jax.jit
    def loop(q, topo, extra, dt, step0, gp_state):
        def body(i, carry):
            q, dt, t = carry
            qn, _ = step_core(q, topo, extra, dt, step0 + i, gp_state)
            c = v_sound(qn, topo, extra, gp_state)
            t = t + dt
            dt = cfl_dt(cfg, qn, c).astype(dt.dtype)
            return qn, dt, t

        return lax.fori_loop(0, n_steps, body,
                             (q, dt, jnp.zeros((), dt.dtype)))

    return loop
