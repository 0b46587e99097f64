"""Multi-chip spatial domain decomposition with ICI halo exchange.

The (3, Nx, Ny) interior state is sharded over a 2D device mesh
('x', 'y'); every MacCormack pass exchanges one-cell halos with the four
mesh neighbors via ``jax.lax.ppermute`` (rides the ICI on TPU pods) and
applies the physics locally.  Global Dirichlet/Neumann boundaries are
masked fills on the shards that own a global edge; periodic boundaries
come free from the permutation ring.

Static per-cell data (topography, extra features) is laid out as
overlapping blocks: each shard's block carries its own one-cell halo,
precomputed once from the ghost-inclusive serial field by
:func:`pad_blocks` — exact for any geometry, no per-step exchange.

This is the TPU-native replacement for the reference's single-node µGrid
fields + ghost-buffer loops (reference GaPFlow/problem.py:676-768): the
same ghost-cell formula, recast as collective halo exchange over a mesh.
With a fixed timestep the sharded step matches the serial step to
floating-point reduction order.
"""

from functools import lru_cache

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax import shard_map

from ..core.integrate import hyperbolicFlux, diffusiveFlux, source
from ..core.step import det_closures, mc_directions


def grid_mesh(devices=None, shape=None, axis_names=("x", "y")):
    """Build a 2D device mesh for spatial decomposition."""
    if devices is None:
        devices = jax.devices()
    n = len(devices)
    if shape is None:
        px = int(np.floor(np.sqrt(n)))
        while n % px:
            px -= 1
        shape = (px, n // px)
    devs = np.asarray(devices).reshape(shape)
    return Mesh(devs, axis_names)


def pad_blocks(global_with_ghosts, px, py):
    """Overlapping-block layout for static fields.

    Converts a ghost-inclusive serial field (C, Nx+2, Ny+2) into a
    (C, px*(bx+2), py*(by+2)) array whose (i, j) block is that shard's
    interior plus its one-cell halo; shard it P(None, 'x', 'y').
    """
    g = np.asarray(global_with_ghosts)
    C, nxg, nyg = g.shape
    Nx, Ny = nxg - 2, nyg - 2
    assert Nx % px == 0 and Ny % py == 0, "grid must divide the mesh"
    bx, by = Nx // px, Ny // py

    rows = []
    for i in range(px):
        cols = []
        for j in range(py):
            cols.append(g[:, i * bx:i * bx + bx + 2, j * by:j * by + by + 2])
        rows.append(np.concatenate(cols, axis=2))
    return np.concatenate(rows, axis=1)


def pad_blocks_jnp(g, px, py):
    """Traced (jnp) variant of :func:`pad_blocks` for fields rebuilt
    on-device every step (e.g. the EHL topography)."""
    C, nxg, nyg = g.shape
    bx, by = (nxg - 2) // px, (nyg - 2) // py
    rows = []
    for i in range(px):
        cols = [g[:, i * bx:i * bx + bx + 2, j * by:j * by + by + 2]
                for j in range(py)]
        rows.append(jnp.concatenate(cols, axis=2))
    return jnp.concatenate(rows, axis=1)


def _neighbor_perm(axis_size, shift):
    return [(i, (i + shift) % axis_size) for i in range(axis_size)]


def _exchange_axis(block, axis, axis_name, axis_size):
    """(lo_halo, hi_halo) slabs received from the two mesh neighbors."""
    hi_edge = lax.slice_in_dim(block, block.shape[axis] - 1,
                               block.shape[axis], axis=axis)
    lo_edge = lax.slice_in_dim(block, 0, 1, axis=axis)

    if axis_size == 1:
        return hi_edge, lo_edge  # periodic wrap onto self

    lo_halo = lax.ppermute(hi_edge, axis_name, _neighbor_perm(axis_size, +1))
    hi_halo = lax.ppermute(lo_edge, axis_name, _neighbor_perm(axis_size, -1))
    return lo_halo, hi_halo


def _edge_values(bc, q_adj):
    """Ghost values for one edge from its P/D/N masks (midpoint a1 = 0.5)."""
    rows = []
    for c in range(3):
        if bc["D"][c]:
            rows.append(2. * bc["val"] - q_adj[c])
        elif bc["N"][c]:
            rows.append(q_adj[c])
        else:
            rows.append(q_adj[c])  # periodic comes from the ppermute wrap
    return jnp.stack(rows)


def _pad_with_halos(q, cfg, px, py):
    """Assemble the locally padded (3, bx+2, by+2) block."""
    ix = lax.axis_index("x")
    iy = lax.axis_index("y")

    lo_x, hi_x = _exchange_axis(q, 1, "x", px)
    bc_xE, bc_xW = cfg.bc_edge(0), cfg.bc_edge(1)
    if not all(bc_xE["P"]):
        lo_x = jnp.where(ix == 0,
                         _edge_values(bc_xE, q[:, 0, :])[:, None, :], lo_x)
        hi_x = jnp.where(ix == px - 1,
                         _edge_values(bc_xW, q[:, -1, :])[:, None, :], hi_x)
    q = jnp.concatenate([lo_x, q, hi_x], axis=1)

    lo_y, hi_y = _exchange_axis(q, 2, "y", py)
    bc_yS, bc_yN = cfg.bc_edge(2), cfg.bc_edge(3)
    if not all(bc_yS["P"]):
        lo_y = jnp.where(iy == 0,
                         _edge_values(bc_yS, q[:, :, 0])[:, :, None], lo_y)
        hi_y = jnp.where(iy == py - 1,
                         _edge_values(bc_yN, q[:, :, -1])[:, :, None], hi_y)
    q = jnp.concatenate([lo_y, q, hi_y], axis=2)

    return q


def _one_pass_local(cfg, q_pad, topo_pad, extra_pad, dt, d, closures=None,
                    return_p=False):
    """One MacCormack pass on a halo-padded local block; returns interior.

    ``closures(q, topo, extra)`` defaults to the deterministic model;
    parallel.gp passes the GP-surrogate closures instead.
    ``return_p=True`` additionally returns the pass pressure on the
    halo-padded block (the pass-2 pressure drives the elastic
    deformation in the sharded chunked-AL advance)."""
    if closures is None:
        p, tau_bulk, s_lo, s_up = det_closures(cfg, q_pad, topo_pad,
                                               extra_pad)
    else:
        p, tau_bulk, s_lo, s_up = closures(q_pad, topo_pad, extra_pad)

    FxH, FyH = hyperbolicFlux(q_pad, p)
    FxD, FyD = diffusiveFlux(q_pad, tau_bulk)
    Fx = FxH + FxD
    Fy = FyH + FyD

    flux_x = -d * (jnp.roll(Fx, d, axis=1) - Fx)
    flux_y = -d * (jnp.roll(Fy, d, axis=2) - Fy)
    src = source(q_pad, topo_pad, tau_bulk, s_lo, s_up)

    q_new = q_pad - dt * (flux_x / cfg.dx + flux_y / cfg.dy - src)
    if return_p:
        return q_new[:, 1:-1, 1:-1], p
    return q_new[:, 1:-1, 1:-1]


@lru_cache(maxsize=16)
def make_sharded_det_step(cfg, mesh):
    """Jitted sharded MacCormack timestep.

    Signature: ``step(q, topo_blocks, extra_blocks, dt, step_idx) -> q`` with
    q of global shape (3, Nx, Ny) sharded P(None, 'x', 'y') and the static
    fields in :func:`pad_blocks` layout.
    """
    if cfg.thinning is not None:
        # thinning's per-cell eta reads p at +-1 cells (np.gradient), so
        # the halo cells' tau_bulk — consumed by the first interior cell —
        # would need 2-deep halos to match the serial stencil exactly
        raise NotImplementedError(
            "sharded stepping with shear thinning needs 2-deep halos; "
            "run thinning configs on the single-chip Pallas path")
    px, py = mesh.shape["x"], mesh.shape["y"]

    def local_step(q, topo_pad, extra_pad, dt, step):
        def passes(qq, d0, d1):
            qq1 = _one_pass_local(cfg, _pad_with_halos(qq, cfg, px, py),
                                  topo_pad, extra_pad, dt, d0)
            return _one_pass_local(cfg, _pad_with_halos(qq1, cfg, px, py),
                                   topo_pad, extra_pad, dt, d1)

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
                        in_specs=(spec, spec, spec, P(), P()),
                        out_specs=spec, check_vma=False)
    return jax.jit(sharded)


@lru_cache(maxsize=16)
def make_sharded_trajectory(cfg, mesh, n):
    """n sharded steps under one jit (lax.scan over the sharded step)."""
    px, py = mesh.shape["x"], mesh.shape["y"]
    step_raw = make_sharded_det_step(cfg, mesh)

    def run(q, topo_pad, extra_pad, dt):
        def body(carry, i):
            return step_raw(carry, topo_pad, extra_pad, dt, i), None

        q, _ = lax.scan(body, q, jnp.arange(n))
        return q

    return jax.jit(run)


def _ownership_weights(bx, by, px, py, dtype):
    """(bx+2, by+2) mask of cells this shard contributes to GLOBAL
    reductions: its interior plus the halo rows/cols that are global
    ghost cells (serial reductions run over the ghost-INCLUSIVE array —
    reference problem.py kinetic_energy/v_max — so the shards owning a
    global edge count their ghosts; interior-halo cells belong to a
    neighbor and count zero)."""
    ix = lax.axis_index("x")
    iy = lax.axis_index("y")
    wx = jnp.concatenate([(ix == 0).astype(dtype)[None],
                          jnp.ones((bx,), dtype),
                          (ix == px - 1).astype(dtype)[None]])
    wy = jnp.concatenate([(iy == 0).astype(dtype)[None],
                          jnp.ones((by,), dtype),
                          (iy == py - 1).astype(dtype)[None]])
    return wx[:, None] * wy[None, :]


@lru_cache(maxsize=16)
def make_sharded_state_step(cfg, mesh):
    """Full sharded SimState timestep: adaptive dt, residual tracking and
    NaN/negative-density rollback under spatial sharding.

    The scalar pipeline of core.step.make_det_step recast as collectives:
    kinetic energy is a masked local sum + psum over both mesh axes,
    v_max/c_max are pmax reductions, and the critical timestep
    ``dt_crit = min(dx, dy) / (v_max + c_max)`` — hence the adaptive
    ``dt = CFL * dt_crit`` — is the implied global pmin: every device
    steps with the SAME dt next step.  Validity is a psum of violation
    counts; on violation every field rolls back uniformly (reference
    problem.py:588-610).

    Signature: ``step(state) -> state`` where state is a SimState with
    ``q`` sharded P(None,'x','y'), ``topo``/``extra`` in pad_blocks
    layout, and all scalars replicated.
    """
    from ..core.state import SimState
    px, py = mesh.shape["x"], mesh.shape["y"]
    prop = cfg.prop
    axes = ("x", "y")
    spec = P(None, "x", "y")
    specs = SimState(q=spec, topo=spec, extra=spec, dt=P(), step=P(),
                     simtime=P(), ekin_old=P(), residual=P(),
                     residual_buffer=P(), valid=P())

    def local_step(state):
        from ..models.eos import eos_sound_velocity

        q0, dt = state.q, state.dt

        def passes(qq, d0, d1):
            qq1 = _one_pass_local(cfg, _pad_with_halos(qq, cfg, px, py),
                                  state.topo, state.extra, dt, d0)
            return _one_pass_local(cfg, _pad_with_halos(qq1, cfg, px, py),
                                   state.topo, state.extra, dt, d1)

        if cfg.MC_order != 0:
            d0, d1 = mc_directions(cfg.MC_order)
            q = passes(q0, d0, d1)
        else:
            q = lax.cond(state.step % 2 == 0,
                         lambda qq: passes(qq, 1, -1),
                         lambda qq: passes(qq, -1, 1), q0)

        q = (q + q0) / 2.

        # ghost-filled padded block of the averaged q == serial
        # apply_bcs(q); global reductions run over owned cells only
        qp = _pad_with_halos(q, cfg, px, py)
        w = _ownership_weights(q.shape[1], q.shape[2], px, py, q.dtype)

        bad_local = jnp.sum(w * (jnp.any(jnp.isnan(qp), axis=0)
                                 | (qp[0] < 0.)))
        bad = lax.psum(bad_local, axes)
        valid = bad == 0.

        # guard the scalar pipeline against the invalid branch (NaN or
        # rho <= 0 would poison the collectives; results are discarded
        # by the rollback select below)
        qp_safe = jnp.where(valid, qp, jnp.ones_like(qp))

        ekin = lax.psum(
            jnp.sum(w * (qp_safe[1] ** 2 + qp_safe[2] ** 2)
                    / qp_safe[0] / 2.), axes)
        w_inf = jnp.where(w > 0., 0., -jnp.inf)
        vmax = lax.pmax(jnp.max(
            jnp.sqrt((qp_safe[1] ** 2 + qp_safe[2] ** 2) / qp_safe[0])
            + w_inf), axes)
        cmax = lax.pmax(jnp.max(eos_sound_velocity(qp_safe[0], prop)
                                + w_inf), axes)

        dt_crit = jnp.minimum(cfg.dx, cfg.dy) / (vmax + cmax)
        cfl = dt / dt_crit
        residual = (jnp.abs(ekin - state.ekin_old)
                    / jnp.maximum(state.ekin_old, 1e-300) / cfl)
        new_dt = cfg.CFL * dt_crit if cfg.adaptive else dt

        return state._replace(
            q=jnp.where(valid, q, q0),
            dt=jnp.where(valid, new_dt, dt),
            step=jnp.where(valid, state.step + 1, state.step),
            simtime=jnp.where(valid, state.simtime + dt, state.simtime),
            ekin_old=jnp.where(valid, ekin, state.ekin_old),
            residual=jnp.where(valid, residual, state.residual),
            residual_buffer=jnp.where(
                valid,
                jnp.roll(state.residual_buffer, 1).at[0].set(residual),
                state.residual_buffer),
            valid=valid,
        )

    sharded = shard_map(local_step, mesh=mesh, in_specs=(specs,),
                        out_specs=specs, check_vma=False)
    return jax.jit(sharded)


@lru_cache(maxsize=16)
def make_sharded_state_trajectory(cfg, mesh, n):
    """n adaptive sharded steps under one jit."""
    step_raw = make_sharded_state_step(cfg, mesh)

    def run(state):
        def body(s, _):
            return step_raw(s), None

        state, _ = lax.scan(body, state, None, length=n)
        return state

    return jax.jit(run)


def shard_problem_arrays(problem, mesh):
    """Device-place a Problem's state for the sharded step.

    Returns (q_interior, topo_blocks, extra_blocks) with the right
    shardings; q strips the serial ghost cells.
    """
    px, py = mesh.shape["x"], mesh.shape["y"]
    spec = NamedSharding(mesh, P(None, "x", "y"))

    # make_array_from_callback (not device_put): works unchanged when the
    # mesh spans multiple processes — each process materializes only its
    # addressable shards from the (replicated) host array
    def put(host_array):
        host_array = np.asarray(host_array)
        return jax.make_array_from_callback(
            host_array.shape, spec, lambda idx: host_array[idx])

    q = put(np.asarray(problem.q)[:, 1:-1, 1:-1])
    topo = put(pad_blocks(problem.topo.full, px, py))
    extra = put(pad_blocks(problem.fc.get_real_field("extra").p, px, py))
    return q, topo, extra


def shard_problem_state(problem, mesh):
    """Sharded SimState for :func:`make_sharded_state_step`.

    q is the interior sharded P(None,'x','y'); topo/extra ride in
    pad_blocks layout; scalars are replicated.  ekin_old seeds from the
    ghost-inclusive serial sum (core.state.initial_state semantics).
    """
    from ..core.state import SimState

    q, topo, extra = shard_problem_arrays(problem, mesh)
    q_full = jnp.asarray(problem.q)
    dtype = q_full.dtype
    ekin = jnp.sum((q_full[1] ** 2 + q_full[2] ** 2) / q_full[0] / 2.)
    return SimState(
        q=q, topo=topo, extra=extra,
        dt=jnp.asarray(problem.dt, dtype),
        step=jnp.asarray(problem.step, jnp.int32),
        simtime=jnp.asarray(getattr(problem, "simtime", 0.) or 0., dtype),
        ekin_old=ekin.astype(dtype),
        residual=jnp.asarray(1., dtype),
        residual_buffer=jnp.full((5,), jnp.inf, dtype).at[0].set(1.),
        valid=jnp.asarray(True),
    )
