"""Sharded GP-surrogate stepping: spatial decomposition of the fused
GP-closed timestep (core.gp_step) over a device mesh.

The GP prediction is per-cell — each grid point's closure is the kernel
mean against the (small) training set — so the natural multi-chip layout
is: TRAINING SET REPLICATED, TEST POINTS SHARDED.  Every shard builds the
feature matrix from its halo-padded local block and contracts it against
the replicated ``(Xfit, alpha)`` cache on its own MXU; no collectives
beyond the one-cell halo exchange of the MacCormack pass itself.  At
reference scales (N_train <= a few thousand, 13 features) the replicated
cache is < 100 kB — far below the point where a distributed Gram product
would pay for its collectives.

Reference analogue: GaPFlow/problem.py:509-586 (the GP update drives the
same MacCormack pass; the reference is single-process NumPy).

Retraining/acquisition stays host-driven exactly as in the serial fused
path (problem.py:_gp_fused_eligible): when a model may retrain, the host
path runs; once caches are static, this sharded step takes over.
"""

from functools import lru_cache

import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import PartitionSpec as P
from jax import shard_map

from ..core.gp_step import make_gp_closures
from ..core.step import mc_directions
from .halo import _one_pass_local, _pad_with_halos


@lru_cache(maxsize=16)
def make_sharded_gp_step(cfg, active_dims, num_features, use_gp, mesh):
    """Jitted sharded GP-closed timestep.

    ``step(q, topo_blocks, extra_blocks, dt, step_idx, gp_state) -> q``
    with q sharded P(None, 'x', 'y'), static fields in pad_blocks layout,
    and gp_state (core.gp_step layout) replicated on every device.
    """
    px, py = mesh.shape["x"], mesh.shape["y"]
    gp_closures = make_gp_closures(cfg, active_dims, num_features, use_gp)

    def local_step(q, topo_pad, extra_pad, dt, step, gp_state):
        def closures(qq, tt, ee):
            return gp_closures(qq, tt, ee, gp_state)

        def passes(qq, d0, d1):
            qq1 = _one_pass_local(cfg, _pad_with_halos(qq, cfg, px, py),
                                  topo_pad, extra_pad, dt, d0,
                                  closures=closures)
            return _one_pass_local(cfg, _pad_with_halos(qq1, cfg, px, py),
                                   topo_pad, extra_pad, dt, d1,
                                   closures=closures)

        q0 = q
        if cfg.MC_order != 0:
            d0, d1 = mc_directions(cfg.MC_order)
            q = passes(q, d0, d1)
        else:
            q = lax.cond(step % 2 == 0,
                         lambda qq: passes(qq, 1, -1),
                         lambda qq: passes(qq, -1, 1), q)

        return (q + q0) / 2.

    spec = P(None, "x", "y")
    sharded = shard_map(local_step, mesh=mesh,
                        in_specs=(spec, spec, spec, P(), P(), P()),
                        out_specs=spec, check_vma=False)
    return jax.jit(sharded)


@lru_cache(maxsize=16)
def make_sharded_gp_trajectory(cfg, active_dims, num_features, use_gp,
                               mesh, n):
    """n sharded GP-surrogate steps under one jit."""
    step_raw = make_sharded_gp_step(cfg, active_dims, num_features,
                                    use_gp, mesh)

    def run(q, topo_pad, extra_pad, dt, gp_state):
        def body(carry, i):
            return step_raw(carry, topo_pad, extra_pad, dt, i,
                            gp_state), None

        q, _ = lax.scan(body, q, jnp.arange(n))
        return q

    return jax.jit(run)


def gp_problem_dims(problem):
    """(active_dims, num_features, use_gp) static args from a Problem —
    the same extraction as Problem._update_gp_fused."""
    models = (problem.pressure, problem.wall_stress_xz,
              problem.wall_stress_yz)
    dims = tuple(tuple(m.active_dims) if m.is_gp_model else None
                 for m in models)
    use = tuple(m.is_gp_model for m in models)
    return dims, problem.database.num_features, use


@lru_cache(maxsize=16)
def make_sharded_cfl_fn(cfg, active_dims, num_features, use_gp, mesh):
    """Global adaptive-dt refresh for sharded GP states:
    ``cfl(q, topo_blocks, extra_blocks, gp_state) -> dt`` (replicated).

    Per shard the host-exact sound speed (core.gp_step.make_v_sound —
    EOS, or the autodiffed GP-mean gradient) and the CFL ``v_max`` are
    evaluated over the halo-padded block and max-reduced with
    ``lax.pmax``.  The union of halo-padded blocks is exactly the
    serial ghost-inclusive cell set (global edges carry the BC ghost
    fills, interior halos duplicate interior cells) and max is
    duplicate-insensitive — the same argument as the sharded AL
    variance trigger (parallel.al)."""
    from ..core.gp_step import make_v_sound

    px, py = mesh.shape["x"], mesh.shape["y"]
    v_sound = make_v_sound(cfg, active_dims, num_features, use_gp)

    def local(q, topo_pad, extra_pad, gp_state):
        q_pad = _pad_with_halos(q, cfg, px, py)
        c = v_sound(q_pad, topo_pad, extra_pad, gp_state)
        c = lax.pmax(lax.pmax(c, "x"), "y")
        v = jnp.sqrt(jnp.max((q_pad[1] ** 2 + q_pad[2] ** 2) / q_pad[0]))
        v = lax.pmax(lax.pmax(v, "x"), "y")
        return cfg.CFL * jnp.minimum(cfg.dx, cfg.dy) / (v + c)

    spec = P(None, "x", "y")
    return shard_map(local, mesh=mesh,
                     in_specs=(spec, spec, spec, P()),
                     out_specs=P(), check_vma=False)


def make_sharded_gp_adaptive_trajectory(cfg, active_dims, num_features,
                                        use_gp, mesh, n):
    """n ADAPTIVE sharded GP-surrogate steps under one jit:
    ``run(q, topo_blocks, extra_blocks, dt, step0, gp_state) ->
    (q, dt, simtime_inc)`` with the host ``_post_update`` sequencing
    (step, then ``dt = CFL * dmin / (v_max + v_sound)`` from the new
    state — reference GaPFlow/problem.py:435-440)."""
    step_raw = make_sharded_gp_step(cfg, active_dims, num_features,
                                    use_gp, mesh)
    cfl = make_sharded_cfl_fn(cfg, active_dims, num_features, use_gp,
                              mesh)

    @jax.jit
    def run(q, topo_pad, extra_pad, dt, step0, gp_state):
        def body(carry, i):
            q, dt, t = carry
            q = step_raw(q, topo_pad, extra_pad, dt, step0 + i, gp_state)
            t = t + dt
            dt = cfl(q, topo_pad, extra_pad, gp_state).astype(dt.dtype)
            return (q, dt, t), None

        (q, dt, t), _ = lax.scan(
            body, (q, dt, jnp.zeros((), dt.dtype)), jnp.arange(n))
        return q, dt, t

    return run
