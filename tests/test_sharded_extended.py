"""Sharded runtime beyond deterministic fixed-dt physics:

- full SimState sharded step (adaptive dt, residuals, rollback) equals
  the serial fused det step on an 8-device virtual mesh;
- sharded GP-surrogate step (replicated train set, sharded test points)
  equals the serial fused GP step.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from gapflow_tpu import Problem
from gapflow_tpu.parallel import grid_mesh, shard_problem_state
from gapflow_tpu.parallel.halo import (make_sharded_state_trajectory,
                                       shard_problem_arrays)


sim_adaptive = """
options:
    output: data/journal
    write_freq: 1000
    silent: True
grid:
    dx: 2.e-5
    dy: 2.e-5
    Nx: 48
    Ny: 48
geometry:
    type: journal
    CR: 1.e-2
    eps: 0.7
    U: 0.1
    V: 0.
numerics:
    CFL: 0.5
    adaptive: 1
    tol: 1e-8
    dt: 5e-11
    max_it: 10_000
properties:
    shear: 0.0794
    bulk: 0.
    EOS: DH
    P0: 101325.
    rho0: 877.7007
    C1: 3.5e10
    C2: 1.23
"""


def _gp_sim(tmp_path, tag):
    return f"""
options:
    output: {tmp_path}/{tag}
    write_freq: 1000
    use_tstamp: False
    silent: True
grid:
    Lx: 1470.
    Ly: 735.
    Nx: 32
    Ny: 16
    xE: ['D', 'N', 'N']
    xW: ['D', 'N', 'N']
    xE_D: 0.8
    xW_D: 0.8
geometry:
    type: parabolic
    hmin: 12.
    hmax: 60.
    U: 0.12
    V: 0.
numerics:
    CFL: 0.5
    adaptive: 0
    tol: 1e-8
    dt: 0.05
    max_it: 5_000
properties:
    shear: 2.15
    bulk: 0.
    EOS: BWR
    T: 1.0
    rho0: 0.8
gp:
    press:
        fix_noise: True
        atol: 1.5
        rtol: 0.
        obs_stddev: 2.e-2
        max_steps: 3
        active_learning: False
    shear:
        fix_noise: True
        atol: 1.5
        rtol: 0.
        obs_stddev: 4.e-3
        max_steps: 3
        active_learning: False
db:
    init_size: 4
    init_method: rand
    dtool_path: {tmp_path}/train
"""


def test_sharded_adaptive_state_matches_serial():
    """Adaptive dt, residual and step bookkeeping under sharding equal
    the serial state pipeline (dt_crit -> same global dt every step)."""
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 (virtual) devices")
    from gapflow_tpu.core.step import make_det_step

    n_steps = 10

    ps = Problem.from_string(sim_adaptive)
    ps._pre_run()
    det = make_det_step(ps._solver_cfg, with_aux=False)
    s = ps._make_state()
    for _ in range(n_steps):
        s = det(s)

    pp = Problem.from_string(sim_adaptive)
    pp._pre_run()
    mesh = grid_mesh(jax.devices()[:8], shape=(4, 2))
    state = shard_problem_state(pp, mesh)
    runner = make_sharded_state_trajectory(pp._solver_cfg, mesh, n_steps)
    out = runner(state)

    np.testing.assert_allclose(np.asarray(out.q),
                               np.asarray(s.q)[:, 1:-1, 1:-1],
                               rtol=1e-12, atol=1e-12)
    # the adaptive dt is a GLOBAL reduction — bit-identical max/min chain
    np.testing.assert_allclose(float(out.dt), float(s.dt), rtol=1e-13)
    assert int(out.step) == int(s.step)
    np.testing.assert_allclose(float(out.simtime), float(s.simtime),
                               rtol=1e-12)
    # ekin/residual reassociate across shards: near-equal, not bitwise
    np.testing.assert_allclose(float(out.ekin_old), float(s.ekin_old),
                               rtol=1e-12)
    np.testing.assert_allclose(float(out.residual), float(s.residual),
                               rtol=1e-8)
    assert bool(out.valid)


def test_sharded_rollback_matches_serial():
    """A state that goes invalid rolls back identically under sharding."""
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 (virtual) devices")
    from gapflow_tpu.core.step import make_det_step

    ps = Problem.from_string(sim_adaptive)
    ps._pre_run()
    det = make_det_step(ps._solver_cfg, with_aux=False)
    s = ps._make_state()
    # a dt far above dt_crit drives the first step to NaN -> rollback
    s = s._replace(dt=jnp.asarray(1e-3, s.dt.dtype))
    s1 = det(s)
    assert not bool(s1.valid)

    pp = Problem.from_string(sim_adaptive)
    pp._pre_run()
    mesh = grid_mesh(jax.devices()[:8], shape=(4, 2))
    from gapflow_tpu.parallel.halo import make_sharded_state_step
    state = shard_problem_state(pp, mesh)
    state = state._replace(dt=jnp.asarray(1e-3, state.dt.dtype))
    out = make_sharded_state_step(pp._solver_cfg, mesh)(state)

    assert not bool(out.valid)
    np.testing.assert_array_equal(np.asarray(out.q),
                                  np.asarray(s1.q)[:, 1:-1, 1:-1])
    assert float(out.dt) == float(s1.dt)
    assert int(out.step) == int(s1.step)


sim_elastic = sim_adaptive.replace(
    "    adaptive: 1", "    adaptive: 0").replace(
    "    C2: 1.23",
    """    C2: 1.23
    elastic:
        E: 5e09
        v: 0.3
        alpha_underrelax: 1e-04""")


@pytest.mark.parametrize("deform_every", [1, 4], ids=["K1", "K4"])
def test_sharded_ehl_matches_serial(deform_every):
    """Sharded fluid + replicated-FFT elastic loop equals the serial
    on-device EHL loop (same end-of-step protocol)."""
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 (virtual) devices")
    from gapflow_tpu.core.ehl import make_ehl_loop
    from gapflow_tpu.parallel.ehl import make_sharded_ehl_loop

    n = 20

    ps = Problem.from_string(sim_elastic)
    ps._pre_run()
    loop_s = make_ehl_loop(ps, use_pallas=False, deform_every=deform_every)
    u0 = np.zeros_like(np.asarray(ps.topo.deformation))
    q_ref, u_ref = loop_s(ps.q, u0, ps.dt, n)

    pp = Problem.from_string(sim_elastic)
    pp._pre_run()
    mesh = grid_mesh(jax.devices()[:8], shape=(4, 2))
    q, _topo, _extra = shard_problem_arrays(pp, mesh)
    loop_p = make_sharded_ehl_loop(pp, mesh, deform_every=deform_every)
    q_out, u_out = loop_p(q, u0, pp.dt, n)

    np.testing.assert_allclose(np.asarray(q_out),
                               np.asarray(q_ref)[:, 1:-1, 1:-1],
                               rtol=1e-10, atol=1e-14)
    scale = max(np.abs(np.asarray(u_ref)).max(), 1e-30)
    assert np.abs(np.asarray(u_out) - np.asarray(u_ref)).max() / scale < 1e-8


def test_sharded_gp_step_matches_fused(tmp_path):
    """Sharded GP-surrogate stepping (replicated train set + sharded test
    points) equals the serial fused GP step."""
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 (virtual) devices")
    from gapflow_tpu.core.gp_step import make_gp_step
    from gapflow_tpu.parallel.gp import (gp_problem_dims,
                                         make_sharded_gp_trajectory)

    n_steps = 3

    p = Problem.from_string(_gp_sim(tmp_path, "serial"))
    p._pre_run()
    # one host update trains/conditions every surrogate
    p.update()
    assert p._gp_fused_eligible(False)

    dims, nf, use = gp_problem_dims(p)
    gp_state = p._gp_state()
    cfg = p._solver_cfg

    # serial fused trajectory from the current q
    step = make_gp_step(cfg, dims, nf, use)
    q = jnp.asarray(p.q)
    topo = jnp.asarray(p.topo.full)
    extra = jnp.asarray(p.fc.get_real_field("extra").p)
    dt = jnp.asarray(p.dt)
    for i in range(n_steps):
        q, _ = step(q, topo, extra, dt, jnp.asarray(p.step + i, jnp.int32),
                    gp_state)
    ref = np.asarray(q)[:, 1:-1, 1:-1]

    # sharded trajectory from the same state
    mesh = grid_mesh(jax.devices()[:8], shape=(4, 2))
    qs, topo_b, extra_b = shard_problem_arrays(p, mesh)
    runner = make_sharded_gp_trajectory(cfg, dims, nf, use, mesh, n_steps)
    out = np.asarray(runner(qs, topo_b, extra_b, dt, gp_state))

    np.testing.assert_allclose(out, ref, rtol=1e-10, atol=1e-12)
