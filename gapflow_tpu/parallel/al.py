"""Multi-chip chunked active learning: the compiled advance of
core/al_chunked.py sharded over a device mesh.

The host protocol is unchanged (reference GaPFlow/models/gp.py:419-506:
``Database.add_data`` MD acquisitions, scipy-BFGS refits, per-surrogate
budgets and pauses all run on the host exactly as the serial chunked
path) — only the device program between acquisitions is decomposed:

- FLUID: GP-closed MacCormack steps with one-cell ppermute halo
  exchange per pass, training set replicated / test points sharded
  (the parallel.gp layout).
- VARIANCE TRIGGER: each shard evaluates the padded GP variance over
  its halo-padded block and the maximum reduces with ``lax.pmax`` over
  the mesh.  The union of halo-padded blocks is exactly the serial
  ghost-inclusive cell set (global edges carry the D/N/periodic ghost
  fills, interior halos duplicate interior cells) and a max is
  duplicate-insensitive, so the trigger sees the same candidate field
  as the serial advance.  When ``n_candidates`` subsets the host
  candidate set the device trigger checks ALL cells (a superset): it
  can fire a round trip the strided host check would skip, in which
  case the host verdict (trusted) stands and the trigger is suppressed
  on re-entry — the same fp-disagreement mechanism the serial chunked
  path already relies on; acquisition decisions are unchanged.
- The argmax-variance CANDIDATE itself is chosen by the host with its
  dense protocol-exact variance path after the gathered state is synced
  (core/al_chunked.py), exactly as in the serial chunked path.

Exposed through ``Problem.run_steps_gp_chunked(..., sharded_mesh=mesh)``
and auto-routed by ``Problem.run_steps_sharded`` for AL surrogates.
"""

from functools import lru_cache

import jax
import jax.numpy as jnp
from jax import lax, shard_map
from jax.sharding import PartitionSpec as P

from ..core.al_loop import _tol_norm
from ..core.gp_step import make_gp_closures, _features
from ..core.step import mc_directions
from ..models import al_jit
from .halo import _one_pass_local, _pad_with_halos


@lru_cache(maxsize=8)
def make_sharded_advance(cfg, specs_t, dims3, nfeat, use3, mesh):
    """Cached non-elastic :func:`_build_sharded_advance` (the common
    case)."""
    return _build_sharded_advance(cfg, specs_t, dims3, nfeat, use3, mesh,
                                  None)


def _assemble_full_p(p_pad, px, py, bx, by):
    """Reassemble the ghost-inclusive serial pressure field from the
    per-shard halo-padded blocks (inside shard_map; replicated result).

    Overlapping halo cells agree exactly — interior halos are the
    neighbor's edge pressure (same closure on the ppermute'd features)
    and global-edge halos carry the BC-filled ghost features — so
    last-write-wins assembly reproduces the serial ghost-inclusive
    pass-2 pressure bit-for-bit, including the [0, 0] corner that
    anchors the half/none-periodicity shift."""
    Px = lax.all_gather(p_pad, "x", axis=0)      # (px, bx+2, by+2)
    Pxy = lax.all_gather(Px, "y", axis=0)        # (py, px, bx+2, by+2)
    full = jnp.zeros((px * bx + 2, py * by + 2), p_pad.dtype)
    for i in range(px):
        for j in range(py):
            full = lax.dynamic_update_slice(full, Pxy[j, i],
                                            (i * bx, j * by))
    return full


def _build_sharded_advance(cfg, specs_t, dims3, nfeat, use3, mesh,
                           elastic_fns):
    """Jitted sharded ``advance``: GP-closed steps until a surrogate
    needs data (the core/al_chunked.py advance over a mesh).

    ``advance(q, topo_blocks, extra_blocks, u, gps, pauses, Xscale,
    Yscales, step0, dt, n_rem, skip_first, suppress) -> (q, u,
    steps_done, needs, pauses)`` with q of global interior shape
    (3, Nx, Ny) sharded P(None, 'x', 'y'), statics in pad_blocks layout,
    the deformation state ``u`` replicated and everything else
    replicated.  Semantics match the serial advance (same early exit
    BEFORE the offending step, same pause bookkeeping).

    ``elastic_fns = (hs_deform, h_undeformed, alpha_underrelax,
    shift_ref)`` composes the elastic half-space exactly like the serial
    advance (core/al_chunked.py): per step the full topography is
    rebuilt REPLICATED from the carried deformation and each shard
    slices its halo-padded block; after the step the serial
    ghost-inclusive pass-2 pressure is reassembled from the per-shard
    blocks (:func:`_assemble_full_p`) and the replicated FFT half-space
    relaxes it into ``u`` — the replicate-and-FFT trade of parallel.ehl.
    Reference protocol: GaPFlow/models/gp.py:419-506 +
    topography.py:424-441 in one loop.
    """
    specs = dict(specs_t)
    keys = list(specs)
    gp_closures = make_gp_closures(cfg, dims3, nfeat, use3)
    px, py = mesh.shape["x"], mesh.shape["y"]
    if elastic_fns is not None:
        from ..core.ehl import _topo_from_deformation
        hs_deform, h_und, alpha_ur, shift_ref = elastic_fns
        h_und = jnp.asarray(h_und)

    def _gp_state_of(gps, Xscale, Yscales):
        state = {"Xscale": Xscale}
        for k in keys:
            state[f"params_{k}"] = gps[k].params
            state[f"Xfit_{k}"] = gps[k].X
            state[f"alpha_{k}"] = gps[k].alpha
            state[f"Yscale_{k}"] = Yscales[k]
        return state

    def local_advance(q, topo_pad, extra_pad, u, gps, pauses, Xscale,
                      Yscales, step0, dt, n_rem, skip_first, suppress):
        gp_state = _gp_state_of(gps, Xscale, Yscales)
        bx, by = q.shape[1], q.shape[2]
        ix = lax.axis_index("x")
        iy = lax.axis_index("y")

        def closures(qq, tt, ee):
            return gp_closures(qq, tt, ee, gp_state)

        def fluid_step(qq, i, topo_d):
            def passes(z, d0, d1):
                z1 = _one_pass_local(cfg, _pad_with_halos(z, cfg, px, py),
                                     topo_d, extra_pad, dt, d0,
                                     closures=closures)
                return _one_pass_local(cfg,
                                       _pad_with_halos(z1, cfg, px, py),
                                       topo_d, extra_pad, dt, d1,
                                       closures=closures, return_p=True)

            if cfg.MC_order != 0:
                d0, d1 = mc_directions(cfg.MC_order)
                qn, p2 = passes(qq, d0, d1)
            else:
                qn, p2 = lax.cond((step0 + i) % 2 == 0,
                                  lambda z: passes(z, 1, -1),
                                  lambda z: passes(z, -1, 1), qq)
            return (qn + qq) / 2., p2

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
                # i == 0 uses the host-synced blocks exactly (analytic
                # gradients until the first topo.update(), host
                # sequencing); later steps rebuild the full topography
                # REPLICATED from the carried deformation and slice this
                # shard's halo-padded block
                u_eff = u - (u[0, 0] if shift_ref else 0.)
                topo_full_r = _topo_from_deformation(
                    h_und, u_eff, cfg.dx, cfg.dy).astype(q.dtype)
                zero = jnp.zeros((), ix.dtype)
                topo_pad_r = lax.dynamic_slice(
                    topo_full_r, (zero, ix * bx, iy * by),
                    (4, bx + 2, by + 2))
                topo_d = jnp.where(i == 0, topo_pad, topo_pad_r)
            else:
                topo_d = topo_pad

            q_pad = _pad_with_halos(q, cfg, px, py)
            Xf = (_features(q_pad, topo_d, extra_pad)
                  .reshape(nfeat, -1).T / Xscale[None, :])

            needs_l = []
            for k in keys:
                spec = specs[k]
                if spec.use_al:
                    _, var = al_jit.predict(gps[k],
                                            Xf[:, jnp.asarray(spec.dims)])
                    vmax = lax.pmax(lax.pmax(jnp.max(var), "x"), "y")
                    need_k = ((pauses[k] < 0)
                              & ~(suppress[k] & (i == 0))
                              & (vmax >= _tol_norm(spec, gps[k].yerr)))
                else:
                    need_k = jnp.asarray(False)
                needs_l.append(need_k)
            needs = jnp.stack(needs_l)
            need_any = jnp.any(needs)

            q_new, p2 = fluid_step(q, i, topo_d)
            if elastic_fns is not None:
                # host topo.update() after the step: the serial
                # ghost-inclusive pass-2 pressure (reassembled from the
                # per-shard blocks), shifted for half/none periodicity,
                # under-relaxed into the carried u by the replicated FFT
                p_full = _assemble_full_p(p2, px, py, bx, by)
                p_full = p_full - (p_full[0, 0] if shift_ref else 0.)
                u_rel = ((1. - alpha_ur) * u
                         + alpha_ur * hs_deform(p_full.astype(u.dtype)))
                u = jnp.where(need_any, u, u_rel)
            q = jnp.where(need_any, q, q_new)
            i = jnp.where(need_any, i, i + 1)
            return (q, u, pauses, i, needs)

        init = (q, u, pauses, jnp.asarray(0, jnp.int32),
                jnp.zeros((len(keys),), bool))
        q, u, pauses, i, needs = lax.while_loop(cond, body, init)
        return q, u, i, needs, pauses

    spec = P(None, "x", "y")
    sharded = shard_map(
        local_advance, mesh=mesh,
        in_specs=(spec, spec, spec) + (P(),) * 10,
        out_specs=(spec, P(), P(), P(), P()), check_vma=False)
    return jax.jit(sharded)
