"""EXPERIMENTAL: fully on-device GP run loop WITH active learning.

Status: an experiment, not the production active-learning path.  The
production device path is :mod:`gapflow_tpu.core.al_chunked`
(``Problem.run_steps_gp_chunked``), which reproduces the host protocol
acquisition-for-acquisition and runs on tunneled TPU runtimes.  This
module is kept as the demonstration that the *entire* AL loop can live
in one XLA program; its two protocol deviations are documented below
and it is excluded from the documented API (callers get a warning).

This closes the last host-driven piece of the GP-surrogate path: the
reference protocol (GaPFlow/models/gp.py:419-506 — per predictor pass,
each surrogate checks its predictive variance against the tolerance and
acquires argmax-variance MD data until trusted or out of budget) runs
here as one compiled XLA program over ``n_steps`` timesteps:

- each surrogate's training state lives in a fixed-capacity PaddedGP
  (gapflow_tpu.models.al_jit): appends are O(n^2) Cholesky row updates
  at a traced index, hyperparameter refits are fixed-budget Adam on the
  masked NLML — nothing retraces as the database grows;
- the MD oracle enters through ``jax.experimental.io_callback``: the host
  callback reuses ``Database.add_data`` unchanged, so real (nanomd /
  LAMMPS-shim) or mock MD runs, dtool dataset packaging and the on-disk
  database stay exactly as in the host path;
- the fluid advances with the same GP-closed MacCormack passes as the
  fused no-retrain step (core/gp_step.py — the pass builder is shared).

Protocol deviations from the host path (both documented here on purpose):

1. Feature/target normalization is frozen at loop entry.  The host path
   re-normalizes by the max-abs of the grown database after every
   acquisition; a compiled loop cannot re-scale its buffers.  GP
   predictions are scale-invariant given consistent scales, so this only
   changes the hyperparameter parameterization.
2. An acquisition refits *all* active surrogates (shared database), with
   a fixed Adam budget instead of scipy BFGS.  The host path refits the
   acquiring surrogate immediately and the others lazily on their next
   predictor pass.

Exposed through ``Problem.run_steps_gp_device``.
"""

from functools import partial
from typing import NamedTuple

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import io_callback

from ..models import al_jit
from .gp_step import make_gp_step_core, _features

_Y_COLS = {"z": (0,), "x": (5, 11), "y": (4, 10)}
_KEYS = ("z", "x", "y")


class SurrogateSpec(NamedTuple):
    """Static per-surrogate configuration (hashable; part of the trace)."""

    dims: tuple          # active feature dims
    ycols: tuple         # columns of the 13-wide Y record
    atol: float
    rtol: float
    max_steps: int       # acquisition budget per timestep
    pause_steps: int
    use_al: bool


def _surrogate_specs(problem):
    specs = {}
    for key, m in zip(_KEYS, (problem.pressure, problem.wall_stress_xz,
                              problem.wall_stress_yz)):
        if not m.is_gp_model:
            continue
        specs[key] = SurrogateSpec(
            dims=tuple(int(d) for d in m.active_dims),
            ycols=_Y_COLS[key],
            atol=float(m.atol), rtol=float(m.rtol),
            max_steps=int(m.max_steps), pause_steps=int(m.pause_steps),
            use_al=bool(m.use_active_learning))
    return specs


def _tol_norm(spec, yerr):
    """Variance tolerance in normalized-target units.

    Host form (models/gp.py): max_var * Yscale^2 < max(atol * Yerr * Yscale,
    rtol * Yscale)^2, with Yerr already normalized."""
    return jnp.maximum(spec.atol * yerr, spec.rtol) ** 2


def make_gp_al_loop(problem, n_candidates=None,
                    refit_steps=40, refit_lr=0.05):
    """Build ``loop(q, gps, pauses, step0, dt, n_steps)`` for a GP Problem.

    ``gps`` is a dict of PaddedGP per active surrogate key; build the
    initial one with :func:`init_gp_states`.  Returns
    ``(q, gps, pauses, n_acquired)``.
    """
    cfg = problem._solver_cfg
    db = problem.database
    dtype = jnp.asarray(problem.q).dtype

    specs = _surrogate_specs(problem)
    if not specs:
        raise ValueError("no GP surrogates on this problem")
    if problem.topo.elastic:
        raise ValueError("run_steps_gp_device does not cover elastic "
                         "problems: the topography is frozen for the "
                         "compiled loop, but EHL coupling must deform it "
                         "from the pressure every step (host path only)")

    models = dict(zip(_KEYS, (problem.pressure, problem.wall_stress_xz,
                              problem.wall_stress_yz)))

    # frozen normalization (deviation 1 in the module docstring)
    Xscale = jnp.asarray(db.X_scale, dtype)
    Yscales = {k: jnp.asarray(models[k].Yscale, dtype) for k in specs}

    nfeat = db.num_features
    dims3 = tuple(tuple(specs[k].dims) if k in specs else None
                  for k in _KEYS)
    use3 = tuple(k in specs for k in _KEYS)
    step_core = make_gp_step_core(cfg, dims3, nfeat, use3)

    # static candidate subset (strided cells, ghost-inclusive like Xtest)
    ncells = int(np.prod(np.asarray(problem.q).shape[1:]))
    if n_candidates is None:
        n_candidates = max(int(getattr(m, "al_candidates", 0) or 0)
                           for m in (models[k] for k in specs))
    if n_candidates and n_candidates < ncells:
        stride = max(1, ncells // n_candidates)
        cand_idx = jnp.arange(0, ncells, stride)
    else:
        cand_idx = jnp.arange(ncells)

    # frozen COPY: db.add_data re-normalizes db.X_scale after every
    # acquisition, but x_norm was normalized with the scale captured at
    # loop build — converting with the live scale would run the MD
    # oracle at the wrong physical point from the second acquisition on
    Xscale_host = np.array(db.X_scale, np.float64)

    def host_acquire(x_norm):
        """Run the MD oracle through the unchanged host database
        (dtool packaging, output files and all) and hand back the raw
        13-component result."""
        X_phys = np.asarray(x_norm, np.float64) * Xscale_host
        db.add_data(X_phys[None, :])
        return np.asarray(db._Ytrain[-1], dtype=dtype)

    y_shape = jax.ShapeDtypeStruct((13,), dtype)

    def _acquire_and_append(gps, x7):
        y13 = io_callback(host_acquire, y_shape, x7)
        for k, spec in specs.items():
            yk = y13[jnp.asarray(spec.ycols)] / Yscales[k]
            yk = yk[0] if len(spec.ycols) == 1 else yk
            gps = {**gps, k: al_jit.append(gps[k],
                                           x7[jnp.asarray(spec.dims)], yk)}
        # deviation 2: refit every surrogate with a fixed Adam budget
        return {k: al_jit.refit(g, steps=refit_steps, lr=refit_lr)
                for k, g in gps.items()}

    def _al_pass(gps, pauses, Xf):
        """Per-surrogate acquisition loops (reference order z, x, y)."""
        Xc = Xf[cand_idx]
        n_acq = jnp.asarray(0, jnp.int32)

        for k, spec in specs.items():
            if not spec.use_al:
                continue
            cap = gps[k].X.shape[0]
            Xck = Xc[:, jnp.asarray(spec.dims)]

            def body(carry, _, k=k, spec=spec, cap=cap, Xck=Xck):
                gps, n = carry
                _, var = al_jit.predict(gps[k], Xck)
                need = ((jnp.max(var) >= _tol_norm(spec, gps[k].yerr))
                        & (gps[k].count < cap))

                def acquire(gps):
                    x7 = Xc[jnp.argmax(var)]
                    return _acquire_and_append(gps, x7)

                gps = lax.cond(need, acquire, lambda g: g, gps)
                return (gps, n + need.astype(jnp.int32)), None

            active = pauses[k] < 0
            # fixed trip count; masked no-ops once trusted (scan-able)
            def al_budget(carry, k=k, spec=spec):
                return lax.scan(body, carry, None, length=spec.max_steps)[0]

            (gps, dn) = lax.cond(
                active, al_budget, lambda c: c, (gps, jnp.asarray(0, jnp.int32)))
            n_acq = n_acq + dn

            # pause when the budget ran out — or the padded buffer is
            # full, so no acquisition can ever help — and the surrogate
            # is still untrusted (host: models/gp.py pause_steps
            # protocol; without the capacity clause a full, untrusted
            # surrogate would re-run max_steps no-op variance sweeps
            # every timestep forever)
            _, var = al_jit.predict(gps[k], Xck)
            untrusted = jnp.max(var) >= _tol_norm(spec, gps[k].yerr)
            exhausted = active & untrusted & \
                ((dn == spec.max_steps) | (gps[k].count >= cap))
            pauses = {**pauses,
                      k: jnp.where(exhausted, spec.pause_steps, pauses[k])}

        return gps, pauses, n_acq

    def _gp_state_of(gps):
        state = {"Xscale": Xscale}
        for k in specs:
            state[f"params_{k}"] = gps[k].params
            state[f"Xfit_{k}"] = gps[k].X
            state[f"alpha_{k}"] = gps[k].alpha
            state[f"Yscale_{k}"] = Yscales[k]
        return state

    topo = jnp.asarray(problem.topo.full, dtype)
    extra = jnp.asarray(problem.fc.get_real_field("extra").p, dtype)

    @partial(jax.jit, static_argnames=("n_steps",))
    def loop(q, gps, pauses, step0, dt, n_steps):
        q = jnp.asarray(q, dtype)
        dt = jnp.asarray(dt, dtype)

        def body(carry, i):
            q, gps, pauses, n_acq = carry
            # predictor-pass bookkeeping (host: _pause decrements first)
            pauses = {k: jnp.maximum(-1, p - 1) for k, p in pauses.items()}

            Xf = (_features(q, topo, extra).reshape(nfeat, -1).T
                  / Xscale[None, :])
            gps, pauses, dn = _al_pass(gps, pauses, Xf)

            q, _ = step_core(q, topo, extra, dt, step0 + i,
                             _gp_state_of(gps))
            return (q, gps, pauses, n_acq + dn), None

        init = (q, gps, pauses, jnp.asarray(0, jnp.int32))
        (q, gps, pauses, n_acq), _ = lax.scan(body, init,
                                              jnp.arange(n_steps))
        return q, gps, pauses, n_acq

    return loop


def init_gp_states(problem, capacity=64):
    """PaddedGP per active surrogate from the current host fit, plus the
    pause-counter dict (all in the frozen normalization)."""
    db = problem.database
    dtype = jnp.asarray(problem.q).dtype
    specs = _surrogate_specs(problem)
    models = dict(zip(_KEYS, (problem.pressure, problem.wall_stress_xz,
                              problem.wall_stress_yz)))
    if capacity < db.size:
        raise ValueError(f"capacity {capacity} < database size {db.size}")

    gps, pauses = {}, {}
    for k, spec in specs.items():
        m = models[k]
        X0 = jnp.asarray(db.Xtrain[:, list(spec.dims)], dtype)
        Ycols = db._Ytrain[:, list(spec.ycols)] / m.Yscale
        Y0 = jnp.asarray(Ycols[:, 0] if len(spec.ycols) == 1 else Ycols,
                         dtype)
        params = {kk: jnp.asarray(v, dtype) for kk, v in m.params.items()}
        gps[k] = al_jit.init(params, capacity, X0, Y0,
                             jnp.asarray(m.Yerr, dtype))
        pauses[k] = jnp.asarray(int(m._pause), jnp.int32)
    return gps, pauses


def sync_host(problem, q, gps, pauses, n_steps):
    """Write the device results back into the host Problem/surrogates."""
    problem.q[...] = np.asarray(q)
    models = dict(zip(_KEYS, (problem.pressure, problem.wall_stress_xz,
                              problem.wall_stress_yz)))
    for k, gp in gps.items():
        m = models[k]
        m.params = {kk: jnp.asarray(v) for kk, v in gp.params.items()}
        # deliberately NOT marking the fit current: acquisitions made
        # db re-normalize X/Y scales, so the device-learned params live
        # in the frozen normalization — the next host predictor pass
        # sees db.size > _last_fit_train_size and retrains (from these
        # params) under the host's current scales
        m.cond_gp = None          # recondition lazily with host data
        m._pause = int(pauses[k])
        m._step += n_steps
    problem.step += n_steps
    problem.simtime += n_steps * problem.dt
