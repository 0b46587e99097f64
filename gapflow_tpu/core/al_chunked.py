"""Chunked device<->host GP active learning: HOST protocol, DEVICE stepping.

The fully-compiled AL loop (core.al_loop) routes its MD oracle through
``io_callback`` — unavailable on some TPU runtimes (tunneled PJRT:
UNIMPLEMENTED host send/recv) — and freezes the database normalization
at loop entry with fixed-budget Adam refits.  This module keeps the
EXACT host protocol of the reference (GaPFlow/models/gp.py:419-506):
per-acquisition max-abs renormalization, scipy-BFGS hyperparameter
refits, per-surrogate budgets and pause counters — while all fluid
stepping BETWEEN acquisitions runs as one compiled device program:

- the device advances GP-closed MacCormack timesteps (core.gp_step)
  while every unpaused surrogate's predictive variance stays below its
  tolerance, checking variance each step exactly like a host predictor
  pass (padded al_jit buffers keep shapes static as the database grows);
- the moment a surrogate needs data the program exits — WITHOUT stepping
  — returning the argmax-variance candidate features;
- the host then acquires that point through the unchanged
  ``Database.add_data`` (MD oracle + dtool packaging + renormalization),
  retrains with the host BFGS (models/gp.py ``_train``), refreshes the
  padded device buffers under the NEW normalization, and re-enters the
  device at the same timestep (the per-pass pause decrement is skipped
  on resume).

Per acquisition this costs one device round trip — the same as the host
path pays per PASS.  Between acquisitions there are zero round trips,
so a converging run approaches pure compiled throughput while remaining
protocol-identical to the reference (verified: tests/test_al_chunked.py
compares final database, hyperparameters and state against the host
path run step by step).

Exposed through ``Problem.run_steps_gp_chunked``.
"""

from functools import lru_cache, partial

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

from ..models import al_jit
from .al_loop import (_KEYS, _surrogate_specs, _tol_norm, init_gp_states)
from .gp_step import make_gp_step_core, _features


@lru_cache(maxsize=16)
def make_advance_fn(cfg, specs_t, dims3, nfeat, use3, ncells, n_candidates):
    """Cached non-elastic :func:`_build_advance` (the common case)."""
    return _build_advance(cfg, specs_t, dims3, nfeat, use3, ncells,
                          n_candidates, None)


def _build_advance(cfg, specs_t, dims3, nfeat, use3, ncells, n_candidates,
                   elastic_fns):
    """Jitted ``advance``: GP-closed steps until a surrogate needs data.

    ``advance(q, topo, extra, u, gps, pauses, Xscale, Yscales, step0, dt,
    n_rem, skip_first, suppress) -> (q, u, steps_done, needs, pauses)``:
    runs at most ``n_rem`` timesteps; exits early — before advancing the
    offending step — when any unpaused surrogate's max predictive
    variance over the candidate set reaches its tolerance.  ``needs`` is
    one TRIGGER flag per active surrogate (specs order); the acquisition
    decision itself (which point, whether really untrusted) is made by
    the HOST with the protocol-exact dense variance path — the padded
    device variance agrees to fp rounding, which is enough for the
    threshold trigger but not for argmax tie-breaking (y-uniform or
    symmetric problems have exactly tied variance cells).
    ``skip_first`` suppresses the per-pass pause decrement for the first
    step attempt (set on re-entry at the same timestep); ``suppress[k]``
    masks surrogate k's trigger for that first attempt (set when the
    host ruled k trusted at the contested step).

    ``elastic_fns`` composes the elastic half-space in the device loop
    (multiscale EHL, reference GaPFlow/problem.py:565-569 +
    topography.py:424-441): per step the topography is rebuilt from the
    carried deformation, and after the step the pass-2 pressure deforms
    the surface under-relaxed — exactly the host ``topo.update()``
    sequencing.  ``u`` carries the UNSHIFTED relaxed deformation (the
    host ``ElasticDeformation.u_prev`` state); for half/none periodicity
    the applied field is shifted by u[0, 0] like the host.  Non-elastic
    problems pass a dummy ``u`` straight through.
    """
    specs = dict(specs_t)
    keys = list(specs)
    # non-elastic advances discard p_last -> uniform-D/N domains (the
    # reference's slider-family AL runs) take the q-only bc GP kernel
    step_core = make_gp_step_core(cfg, dims3, nfeat, use3,
                                  need_p=elastic_fns is not None)
    if elastic_fns is not None:
        from .ehl import _topo_from_deformation
        hs_deform, h_und, alpha_ur, shift_ref = elastic_fns
        h_und = jnp.asarray(h_und)

    if n_candidates and n_candidates < ncells:
        stride = max(1, ncells // n_candidates)
        cand_idx = jnp.arange(0, ncells, stride)
    else:
        cand_idx = jnp.arange(ncells)

    def _gp_state_of(gps, Xscale, Yscales):
        state = {"Xscale": Xscale}
        for k in keys:
            state[f"params_{k}"] = gps[k].params
            state[f"Xfit_{k}"] = gps[k].X
            state[f"alpha_{k}"] = gps[k].alpha
            state[f"Yscale_{k}"] = Yscales[k]
        return state

    @jax.jit
    def advance(q, topo, extra, u, gps, pauses, Xscale, Yscales, step0, dt,
                n_rem, skip_first, suppress):
        gp_state = _gp_state_of(gps, Xscale, Yscales)

        def cond(c):
            _, _, _, i, needs = c
            return (i < n_rem) & ~jnp.any(needs)

        def body(c):
            q, u, pauses, i, needs = c

            # host predict(): the pause decrements at every predictor
            # pass START, before the variance check
            hold = skip_first & (i == 0)
            pauses = {k: jnp.where(hold, p, jnp.maximum(-1, p - 1))
                      for k, p in pauses.items()}

            if elastic_fns is not None:
                # i == 0 uses the host-synced field exactly: the initial
                # topography carries the geometry's ANALYTIC gradients
                # until the first topo.update() replaces them with
                # np.gradient of the deformed height (host sequencing)
                u_eff = u - (u[0, 0] if shift_ref else 0.)
                topo_r = _topo_from_deformation(h_und, u_eff,
                                                cfg.dx, cfg.dy
                                                ).astype(q.dtype)
                topo_d = jnp.where(i == 0, topo, topo_r)
            else:
                topo_d = topo

            Xf = (_features(q, topo_d, extra).reshape(nfeat, -1).T
                  / Xscale[None, :])
            Xc = Xf[cand_idx]

            needs_l = []
            for k in keys:
                spec = specs[k]
                if spec.use_al:
                    _, var = al_jit.predict(gps[k],
                                            Xc[:, jnp.asarray(spec.dims)])
                    need_k = ((pauses[k] < 0)
                              & ~(suppress[k] & (i == 0))
                              & (jnp.max(var) >= _tol_norm(spec,
                                                           gps[k].yerr)))
                else:
                    need_k = jnp.asarray(False)
                needs_l.append(need_k)
            needs = jnp.stack(needs_l)
            need_any = jnp.any(needs)

            q_new, p_last = step_core(q, topo_d, extra, dt, step0 + i,
                                      gp_state)
            if elastic_fns is not None:
                # host topo.update() after the step: pass-2 pressure,
                # shifted for half/none periodicity, under-relaxed into
                # the carried (unshifted) u_prev state
                p = p_last - (p_last[0, 0] if shift_ref else 0.)
                u_rel = ((1. - alpha_ur) * u
                         + alpha_ur * hs_deform(p.astype(u.dtype)))
                u = jnp.where(need_any, u, u_rel)
            q = jnp.where(need_any, q, q_new)
            i = jnp.where(need_any, i, i + 1)
            return (q, u, pauses, i, needs)

        init = (q, u, pauses, jnp.asarray(0, jnp.int32),
                jnp.zeros((len(keys),), bool))
        q, u, pauses, i, needs = lax.while_loop(cond, body, init)
        return q, u, i, needs, pauses

    return advance


def _next_capacity(n):
    cap = 16
    while cap < n:
        cap *= 2
    return cap


def run_gp_al_chunked(problem, n_steps, capacity=None, n_candidates=None,
                      sharded_mesh=None):
    """Advance ``n_steps`` GP-surrogate timesteps with host-protocol AL.

    Returns the number of acquisitions.  See the module docstring for
    the device/host split; all database, training and pause bookkeeping
    follows models/gp.py ``predict`` exactly.

    ``sharded_mesh``: decompose the compiled advance spatially over a
    2D device mesh (parallel.al.make_sharded_advance) — fluid steps with
    ppermute halo exchange, variance trigger as a pmax reduction; the
    host acquisition protocol is identical (multi-chip chunked AL).
    """
    cfg = problem._solver_cfg
    db = problem.database
    dtype = jnp.asarray(problem.q).dtype

    specs = _surrogate_specs(problem)
    if not specs:
        raise ValueError("no GP surrogates on this problem")

    models = {k: m for k, m in zip(_KEYS, (problem.pressure,
                                           problem.wall_stress_xz,
                                           problem.wall_stress_yz))
              if k in specs}

    # host predict() trains at pass start whenever the database grew
    for m in models.values():
        if m.params is None or m.last_fit_train_size < db.size:
            m._train(reason=0)

    nfeat = db.num_features
    dims3 = tuple(tuple(specs[k].dims) if k in specs else None
                  for k in _KEYS)
    use3 = tuple(k in specs for k in _KEYS)
    ncells = int(np.prod(np.asarray(problem.q).shape[1:]))
    if n_candidates is None:
        n_candidates = max(int(getattr(m, "al_candidates", 0) or 0)
                           for m in models.values())

    elastic = problem.topo.elastic
    if elastic:
        ed = problem.topo.ElasticDeformation
        shift_ref = ed.periodicity in ("half", "none")
        elastic_fns = (ed.deformation_full,
                       np.asarray(problem.topo.h_undeformed),
                       float(ed.alpha_underrelax), shift_ref)
        key = (tuple(specs.items()), dims3, nfeat, use3, ncells,
               int(n_candidates), sharded_mesh)
        cache = getattr(problem, "_chunked_advance_cache", None)
        if cache is None or cache[0] != key:
            if sharded_mesh is not None:
                # multi-chip chunked AL x elastic: sharded fluid +
                # pmax trigger + replicated-FFT deformation
                # (parallel.al._build_sharded_advance)
                from ..parallel.al import _build_sharded_advance
                advance = _build_sharded_advance(
                    cfg, tuple(specs.items()), dims3, nfeat, use3,
                    sharded_mesh, elastic_fns)
            else:
                advance = _build_advance(
                    cfg, tuple(specs.items()), dims3, nfeat, use3,
                    ncells, int(n_candidates), elastic_fns)
            problem._chunked_advance_cache = (key, advance)
        else:
            advance = cache[1]
        u = jnp.asarray(ed.u_prev)
    elif sharded_mesh is not None:
        from ..parallel.al import make_sharded_advance
        advance = make_sharded_advance(cfg, tuple(specs.items()), dims3,
                                       nfeat, use3, sharded_mesh)
        u = jnp.zeros((1, 1), dtype)
    else:
        advance = make_advance_fn(cfg, tuple(specs.items()), dims3, nfeat,
                                  use3, ncells, int(n_candidates))
        u = jnp.zeros((1, 1), dtype)

    if sharded_mesh is not None:
        from ..parallel.halo import shard_problem_arrays
        q, topo_b, extra_b = shard_problem_arrays(problem, sharded_mesh)
        q = q.astype(dtype)
        topo_b = topo_b.astype(dtype)
        extra_b = extra_b.astype(dtype)
    else:
        q = jnp.asarray(problem.q, dtype)
        topo = jnp.asarray(problem.topo.full, dtype)
        extra = jnp.asarray(problem.fc.get_real_field("extra").p, dtype)
    dt = jnp.asarray(problem.dt, dtype)

    def _sync_state(total_steps):
        """Mirror the device state into the host fields (the host
        variance/acquisition path reads them).  The topography is only
        rewritten once a step has actually advanced: before the first
        ever ``topo.update()`` the host field still carries the
        geometry's ANALYTIC gradients, which the ``h`` setter would
        clobber with numerical ones."""
        if sharded_mesh is not None:
            problem.q[:, 1:-1, 1:-1] = np.asarray(q)
            problem._communicate_ghost_buffers()
        else:
            problem.q[...] = np.asarray(q)
        if elastic and total_steps > 0:
            u_np = np.asarray(u)
            ed.u_prev = jnp.asarray(u_np)
            shift = u_np[0, 0] if shift_ref else 0.
            problem.topo.deformation = u_np - shift
            # h setter refreshes the gradients (host update() sequencing)
            problem.topo.h = problem.topo.h_undeformed + (u_np - shift)

    steps_done = 0
    n_acquired = 0
    counters = {k: 0 for k in specs}
    suppressed = {k: False for k in specs}
    skip_first = False

    while steps_done < n_steps:
        cap = capacity or _next_capacity(db.size + 1)
        gps, pauses = init_gp_states(problem, cap)
        Yscales = {k: jnp.asarray(models[k].Yscale, dtype) for k in specs}
        if elastic:
            # the advance's i == 0 topography is the host field verbatim
            # (refreshed by _sync_state after the last exit)
            topo = jnp.asarray(problem.topo.full, dtype)
            if sharded_mesh is not None:
                from ..parallel.halo import pad_blocks
                topo_b = jnp.asarray(
                    pad_blocks(np.asarray(problem.topo.full),
                               sharded_mesh.shape["x"],
                               sharded_mesh.shape["y"]), dtype)

        if sharded_mesh is not None:
            q, u, steps, needs, pauses = advance(
                q, topo_b, extra_b, u, gps, pauses,
                jnp.asarray(db.X_scale, dtype), Yscales,
                jnp.asarray(problem.step + steps_done, jnp.int32), dt,
                jnp.asarray(n_steps - steps_done, jnp.int32),
                jnp.asarray(skip_first),
                {k: jnp.asarray(v) for k, v in suppressed.items()})
        else:
            q, u, steps, needs, pauses = advance(
                q, topo, extra, u, gps, pauses,
                jnp.asarray(db.X_scale, dtype), Yscales,
                jnp.asarray(problem.step + steps_done, jnp.int32), dt,
                jnp.asarray(n_steps - steps_done, jnp.int32),
                jnp.asarray(skip_first),
                {k: jnp.asarray(v) for k, v in suppressed.items()})

        steps = int(steps)
        needs = np.asarray(needs)
        for k in specs:
            models[k]._pause = int(np.asarray(pauses[k]))

        if steps > 0:
            # the device advanced past the last contested timestep:
            # per-timestep acquisition budgets (and trusted-rule
            # suppressions) reset — host predict() starts a fresh AL
            # while-loop every predictor pass
            counters = {k: 0 for k in specs}
            suppressed = {k: False for k in specs}
        steps_done += steps

        if not needs.any():
            break

        k = next(k for i, k in enumerate(specs) if needs[i])
        m, spec = models[k], specs[k]
        skip_first = True

        # the HOST decides, with its own dense variance path — exactly
        # models/gp.py predict(): sync the device state into the fields
        # first so Xtest reflects the contested step's q (and, for
        # elastic problems, its topography)
        _sync_state(problem.step + steps_done)
        cand = m._candidate_indices() if spec.use_al else None
        if cand is None:
            m._infer(compute_var=True)
            v_acq = m._predictive_var
        else:
            v_acq = m._infer_subset_var(cand)

        if m.trusted:
            # fp disagreement at the threshold: the host verdict stands;
            # mask this surrogate's trigger for the contested step
            suppressed[k] = True
            continue

        if counters[k] >= spec.max_steps:
            # host: "Active learning loop missed uncertainty threshold"
            m._pause = spec.pause_steps
            continue

        # host _active_learning + _train(reason=1): acquire the argmax-
        # variance point through the unchanged database (MD oracle, dtool
        # packaging, max-abs renormalization), then BFGS-retrain
        m._active_learning(v_acq, idx=cand)
        counters[k] += 1
        n_acquired += 1
        m._train(reason=1)
        # the other surrogates see the grown database at their next
        # predictor pass — which is THIS step, resumed on re-entry
        for mm in models.values():
            if mm.last_fit_train_size < db.size:
                mm._train(reason=0)

    # write back (host bookkeeping: one predictor pass per step)
    _sync_state(problem.step + steps_done)
    for m in models.values():
        m._step += n_steps
        m.cond_gp = None
    problem.step += n_steps
    problem.simtime += n_steps * float(problem.dt)
    return n_acquired
