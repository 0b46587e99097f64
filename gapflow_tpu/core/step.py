"""The fused MacCormack solver step.

Builds pure, jit-compiled functions from a static :class:`SolverConfig`:

- ``make_pass_fn``:   one MacCormack pass with externally supplied closures
                      (used by the GP-surrogate driver, which must re-predict
                      between passes)
- ``make_det_step``:  the full deterministic timestep — constitutive models,
                      two alternating passes, ghost fills, temporal average,
                      validity check with rollback, residual and adaptive dt —
                      as a single XLA program
- ``make_run_loop``:  ``lax.while_loop`` over deterministic steps until
                      convergence/max_it (benchmark / fast path)

Numerical scheme parity: reference GaPFlow/problem.py:509-610 (MacCormack
two-pass with alternating one-sided differences, second-order temporal
averaging, ghost-cell boundary handling at problem.py:676-768 with the
a1 = 0.5 midpoint ghost formula).
"""

from dataclasses import dataclass
from functools import lru_cache, partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax import lax

from .integrate import predictor_corrector, source
from ..models.eos import eos_pressure, eos_sound_velocity
from ..models.viscosity import (piezoviscosity, shear_thinning_factor,
                                shear_rate_avg)
from ..models.viscous import stress_bottom, stress_top, stress_avg


@dataclass(frozen=True)
class SolverConfig:
    """Static solver configuration (hashable; closed over by the jitted fns)."""

    dx: float
    dy: float
    U: float
    V: float
    shear: float
    bulk: float
    eos: Tuple[Tuple[str, float], ...]       # prop dict items for the EOS
    piezo: Optional[Tuple[Tuple[str, object], ...]] = None
    thinning: Optional[Tuple[Tuple[str, object], ...]] = None
    MC_order: int = 1
    adaptive: bool = False
    CFL: float = 0.5
    # opt-in approximate GP prediction (numerics: gp_fast_pred): the
    # fused GP kernels' accumulation matmul drops from 6-pass HIGHEST
    # f32 to one bf16 MXU pass.  Measured on hardware: 1.43x faster
    # GP-closed steps (cap64 3.26e8 -> 4.66e8 cu/s = 78% of the VPU
    # speed-of-light; cap1024 2.35e7 -> 3.37e7 = 90%) at ~8e-3 relative
    # on the predicted means / ~3e-4 scaled on q per step — below
    # typical GP surrogate fit error (obs_stddev ~1e-3..1e-2).
    # Default False = f32-exact (kernel parity 1.7e-7).
    gp_fast_pred: bool = False
    # BC masks: per-edge tuples of 3 bools; D values are scalars
    bc: Tuple = ()

    @staticmethod
    def from_dicts(grid, geo, prop, numerics):
        eos_keys = [k for k, v in prop.items()
                    if not isinstance(v, dict) and k not in ("shear", "bulk")]
        eos = tuple((k, prop[k]) for k in ["EOS"] + [k for k in eos_keys if k != "EOS"])
        piezo = tuple(prop["piezo"].items()) if "piezo" in prop else None
        thinning = tuple(prop["thinning"].items()) if "thinning" in prop else None
        # Dirichlet VALUES come from the OPPOSITE edge: the reference's
        # ghost fill (problem.py:676-768) writes the low-x ghost with the
        # xE masks but computes it from bc_xW_D_val (and vice versa; same
        # for y) — i.e. xE_D lands on the HIGH-x boundary.  Masks must
        # match on opposite edges for the reference to work at all, so
        # swapping only the value reproduces its net semantics exactly.
        _opposite = {"xE": "xW", "xW": "xE", "yS": "yN", "yN": "yS"}
        bc = []
        for edge in ("xE", "xW", "yS", "yN"):
            entry = {kind: tuple(grid[f"bc_{edge}_{kind}"]) for kind in "PDN"}
            entry["val"] = grid.get(f"bc_{_opposite[edge]}_D_val", 0.0)
            bc.append(tuple(sorted(entry.items())))
        return SolverConfig(
            dx=grid["dx"], dy=grid["dy"], U=geo["U"], V=geo["V"],
            shear=prop["shear"], bulk=prop["bulk"], eos=eos,
            piezo=piezo, thinning=thinning,
            MC_order=numerics["MC_order"], adaptive=bool(numerics["adaptive"]),
            CFL=numerics["CFL"],
            gp_fast_pred=bool(numerics.get("gp_fast_pred", False)),
            bc=tuple(bc),
        )

    # -- dict views ---------------------------------------------------------
    @property
    def prop(self):
        d = dict(self.eos)
        d["shear"] = self.shear
        d["bulk"] = self.bulk
        if self.piezo is not None:
            d["piezo"] = dict(self.piezo)
        if self.thinning is not None:
            d["thinning"] = dict(self.thinning)
        return d

    def bc_edge(self, i):
        return dict(self.bc[i])


# ---------------------------------------------------------------------------
# Ghost-cell boundary fill
# ---------------------------------------------------------------------------

def _edge_fill(q, cfg, edge_idx, axis, side):
    """Fill one ghost edge of ``q`` according to its P/D/N component masks.

    The reference pairs each edge's assignment mask with the *opposite*
    edge's Dirichlet value (problem.py:676-768) — xE_D is the HIGH-x
    boundary target.  SolverConfig.from_dicts pre-swaps the values between
    opposite edges, so here mask and value are read from the same entry.

    Ghost formula (one ghost cell, midpoint weight a1 = 0.5):
      Dirichlet: Q = 2*q_target - q_adjacent
      Neumann:   Q = q_adjacent
    """
    bc = cfg.bc_edge(edge_idx)
    if all(bc["P"]):
        # periodic wrap
        src = -2 if side == "lo" else 1
        dst = 0 if side == "lo" else -1
        if axis == 1:
            return q.at[:, dst, :].set(q[:, src, :])
        return q.at[:, :, dst].set(q[:, :, src])

    dst = 0 if side == "lo" else -1
    adj = 1 if side == "lo" else -2
    rows = []
    for c in range(3):
        q_adj = q[c, adj, :] if axis == 1 else q[c, :, adj]
        ghost = q[c, dst, :] if axis == 1 else q[c, :, dst]
        if bc["D"][c]:
            rows.append(2. * bc["val"] - q_adj)
        elif bc["N"][c]:
            rows.append(q_adj)
        else:
            rows.append(ghost)
    edge = jnp.stack(rows)
    if axis == 1:
        return q.at[:, dst, :].set(edge)
    return q.at[:, :, dst].set(edge)


def apply_bcs(q, cfg):
    """Fill all four ghost edges (x-low, x-high, y-low, y-high, in order)."""
    q = _edge_fill(q, cfg, 0, axis=1, side="lo")   # left edge, xE spec
    q = _edge_fill(q, cfg, 1, axis=1, side="hi")   # right edge, xW spec
    q = _edge_fill(q, cfg, 2, axis=2, side="lo")   # bottom edge, yS spec
    q = _edge_fill(q, cfg, 3, axis=2, side="hi")   # top edge, yN spec
    return q


def mc_directions(mc_order):
    """Static MacCormack pass order (d0, d1) for mc_order in (-1, +1).

    mc_order == 0 alternates by step parity: even steps run
    mc_directions(+1), odd steps mc_directions(-1) — reference
    problem.py:521-522.  One shared definition for the XLA, GP, Pallas,
    sharded and host paths."""
    return [(-1, 1), (1, -1)][(mc_order + 1) // 2]


# ---------------------------------------------------------------------------
# Constitutive closures (deterministic path)
# ---------------------------------------------------------------------------

def effective_viscosity(cfg, q, p, h):
    """Shear viscosity after piezoviscous and shear-thinning corrections."""
    prop = cfg.prop
    if cfg.piezo is not None:
        arg = q[0] if prop["EOS"] == "Bayada" else p
        mu0 = piezoviscosity(arg, cfg.shear, prop["piezo"])
    else:
        mu0 = cfg.shear

    if cfg.thinning is not None:
        dp_dx = jnp.gradient(p, cfg.dx, axis=0)
        dp_dy = jnp.gradient(p, cfg.dy, axis=1)
        rate = shear_rate_avg(dp_dx, dp_dy, h, cfg.U, cfg.V, mu0)
        return mu0 * shear_thinning_factor(rate, mu0, prop["thinning"])
    return mu0


def det_closures(cfg, q, topo, extra):
    """Pressure, wall and bulk stresses of the deterministic model.

    Returns (p, tau_bulk(3,), s_lower(6,), s_upper(6,)).  The slip length is
    the extra field (zero by default), as in the reference hot path.
    """
    prop = cfg.prop
    h3 = topo[:3]
    p = eos_pressure(q[0], prop)
    eta = effective_viscosity(cfg, q, p, h3[0])
    Ls = extra

    s_lower = stress_bottom(q, h3, cfg.U, cfg.V, eta, cfg.bulk, Ls)
    s_upper = stress_top(q, h3, cfg.U, cfg.V, eta, cfg.bulk, Ls)
    tau_bulk = stress_avg(q, h3, cfg.U, cfg.V, eta, cfg.bulk, Ls)
    return p, tau_bulk, s_lower, s_upper


# ---------------------------------------------------------------------------
# MacCormack passes
# ---------------------------------------------------------------------------

@lru_cache(maxsize=64)
def make_pass_fn(cfg):
    """One MacCormack pass with externally supplied closure fields.

    ``pass_fn(q, topo, p, tau_bulk, s_lower, s_upper, dt, direction)``
    advances q by one one-sided Euler update and refills the ghost cells.
    ``direction`` is static (+1/-1).
    """

    @partial(jax.jit, static_argnames=("direction",))
    def pass_fn(q, topo, p, tau_bulk, s_lower, s_upper, dt, direction):
        fX, fY = predictor_corrector(q, p, tau_bulk, direction)
        src = source(q, topo, tau_bulk, s_lower, s_upper)
        q = q - dt * (fX / cfg.dx + fY / cfg.dy - src)
        return apply_bcs(q, cfg)

    return pass_fn


def kinetic_energy(q):
    return jnp.sum((q[1] ** 2 + q[2] ** 2) / q[0] / 2.)


def v_max(q):
    return jnp.sqrt((q[1] ** 2 + q[2] ** 2) / q[0]).max()


@lru_cache(maxsize=64)
def make_det_step(cfg, with_aux=True):
    """The full deterministic timestep as one fused XLA program.

    Cached per config so every Problem with the same physics reuses one
    compiled executable (jax caches compilations by function identity).

    ``det_step(state) -> (state, aux)`` where aux holds the last-pass
    closure fields (pressure, wall/bulk stresses) for I/O and the elastic
    update.  On NaN/negative density the state is rolled back to the
    pre-step q and ``valid`` is set False (reference problem.py:588-610).
    """
    prop = cfg.prop

    def one_pass(q, topo, extra, dt, d):
        p, tau_bulk, s_lo, s_up = det_closures(cfg, q, topo, extra)
        fX, fY = predictor_corrector(q, p, tau_bulk, d)
        src = source(q, topo, tau_bulk, s_lo, s_up)
        q = q - dt * (fX / cfg.dx + fY / cfg.dy - src)
        return apply_bcs(q, cfg), (p, tau_bulk, s_lo, s_up)

    def two_passes(q, topo, extra, dt, d0, d1):
        q, _ = one_pass(q, topo, extra, dt, d0)
        q, aux = one_pass(q, topo, extra, dt, d1)
        return q, aux

    def det_step(state):
        q0 = state.q
        topo, extra, dt = state.topo, state.extra, state.dt

        if cfg.MC_order != 0:
            d0, d1 = mc_directions(cfg.MC_order)
            q, aux = two_passes(q0, topo, extra, dt, d0, d1)
        else:
            q, aux = lax.cond(
                state.step % 2 == 0,
                lambda args: two_passes(*args, 1, -1),
                lambda args: two_passes(*args, -1, 1),
                (q0, topo, extra, dt),
            )

        # second-order temporal average
        q = (q + q0) / 2.

        valid = jnp.logical_and(~jnp.any(jnp.isnan(q)), ~jnp.any(q[0] < 0.))

        def post(q):
            q = apply_bcs(q, cfg)
            ekin = kinetic_energy(q)
            c_max = eos_sound_velocity(q[0], prop).max()
            dt_crit = jnp.minimum(cfg.dx, cfg.dy) / (v_max(q) + c_max)
            cfl = dt / dt_crit
            # zero-guard: static/squeeze setups (U=V=0) start at ekin=0
            residual = (jnp.abs(ekin - state.ekin_old)
                        / jnp.maximum(state.ekin_old, 1e-300) / cfl)
            new_dt = cfg.CFL * dt_crit if cfg.adaptive else dt
            return state._replace(
                q=q,
                dt=new_dt,
                step=state.step + 1,
                simtime=state.simtime + dt,
                ekin_old=ekin,
                residual=residual,
                residual_buffer=jnp.roll(state.residual_buffer, 1)
                                   .at[0].set(residual),
                valid=jnp.asarray(True),
            )

        def rollback(q):
            del q
            return state._replace(q=q0, valid=jnp.asarray(False))

        new_state = lax.cond(valid, post, rollback, q)
        if with_aux:
            return new_state, aux
        return new_state

    return jax.jit(det_step)


@lru_cache(maxsize=64)
def make_trajectory(cfg, n):
    """Scan ``n`` deterministic steps, stacking (q, simtime) after each.

    The whole trajectory runs on-device in one XLA program; used by the
    verification tests that compare every step against analytic solutions.
    """
    det_step = make_det_step(cfg, with_aux=False)

    def run(state):
        def body(s, _):
            s = det_step(s)
            return s, (s.q, s.simtime)

        return lax.scan(body, state, None, length=n)

    return jax.jit(run)


@lru_cache(maxsize=64)
def make_run_loop(cfg, tol, max_it):
    """Fast path: iterate deterministic steps until convergence or max_it.

    Returns a jitted ``run(state) -> state``.  Convergence matches the
    reference criterion: all 5 trailing residuals below tol.
    """
    det_step = make_det_step(cfg, with_aux=False)

    def converged(state):
        return jnp.all(state.residual_buffer < tol)

    def run(state):
        def cond(s):
            return jnp.logical_and(
                jnp.logical_and(~converged(s), s.step < max_it), s.valid)

        return lax.while_loop(cond, lambda s: det_step(s), state)

    return jax.jit(run)
