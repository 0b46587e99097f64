"""One driver API for multi-chip: ``Problem.run_steps_sharded`` routes
every family — deterministic, frozen-GP, EHL, and GP x elastic — onto
the sharded runtime (mirroring the reference's single-entry driver,
GaPFlow/problem.py:368-410), and each family equals its serial
counterpart on an 8-device virtual mesh.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from gapflow_tpu import Problem
from gapflow_tpu.parallel import grid_mesh


needs8 = pytest.mark.skipif(len(jax.devices()) < 8,
                            reason="needs 8 (virtual) devices")


def _gp_sim(tmp_path, tag, elastic=False):
    el = """
    elastic:
        E: 5e09
        v: 0.3
        alpha_underrelax: 1e-03""" if elastic else ""
    return f"""
options:
    output: {tmp_path}/{tag}
    write_freq: 1000
    use_tstamp: False
    silent: True
grid:
    dx: 2.e-5
    dy: 2.e-5
    Nx: 32
    Ny: 16
geometry:
    type: journal
    CR: 1.e-2
    eps: 0.7
    U: 0.1
    V: 0.05
numerics:
    CFL: 0.25
    adaptive: 0
    tol: 1e-30
    dt: 5e-11
    max_it: 1000
properties:
    shear: 0.0794
    bulk: 0.
    EOS: DH
    P0: 101325.
    rho0: 877.7007
    C1: 3.5e10
    C2: 1.23{el}
gp:
    press:
        fix_noise: True
        atol: 1.
        rtol: 0.1
        obs_stddev: 100.
        max_steps: 2
        active_learning: False
    shear:
        fix_noise: True
        atol: 1.
        rtol: 0.1
        obs_stddev: 100.
        max_steps: 2
        active_learning: False
db:
    init_size: 4
    init_method: sobol
    init_width: 1.e-4
    dtool_path: {tmp_path}/train_{tag}
"""


_det_elastic = """
options:
    output: data/shdrv
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
    adaptive: 0
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
    elastic:
        E: 5e09
        v: 0.3
        alpha_underrelax: 1e-04
"""


@needs8
def test_driver_sharded_gp_matches_gp_fast(tmp_path):
    """run_steps_sharded on a frozen-GP problem equals run_steps_gp_fast
    (both close every step with the cached re-predict; the sharded path
    decomposes the test points over the mesh)."""
    n = 4

    p_ref = Problem.from_string(_gp_sim(tmp_path, "ref"))
    p_ref._pre_run()
    p_sh = Problem.from_string(_gp_sim(tmp_path, "sh"))
    p_sh._pre_run()

    p_ref.run_steps_gp_fast(n)
    mesh = grid_mesh(jax.devices()[:8], shape=(4, 2))
    p_sh.run_steps_sharded(n, mesh=mesh)

    assert p_sh.step == p_ref.step == n
    np.testing.assert_allclose(p_sh.q, p_ref.q, rtol=1e-10, atol=1e-12)
    np.testing.assert_allclose(
        np.asarray(p_sh.fc.get_real_field("pressure").p),
        np.asarray(p_ref.fc.get_real_field("pressure").p), rtol=1e-10)


@needs8
def test_driver_sharded_al_matches_serial_chunked(tmp_path):
    """Active-learning surrogates route onto the SHARDED chunked-AL path
    (parallel.al): same acquisitions, same database, same pauses and
    state as the serial chunked advance, acquisition for acquisition."""
    n = 6

    def _al_sim(tag):
        return _gp_sim(tmp_path, tag).replace(
            "active_learning: False", "active_learning: True").replace(
            "atol: 1.", "atol: 1.e-4").replace(
            "obs_stddev: 100.", "obs_stddev: 1.e-3")

    p_ser = Problem.from_string(_al_sim("alser"))
    p_ser._pre_run()
    p_sh = Problem.from_string(_al_sim("alsh"))
    p_sh._pre_run()
    size0 = p_ser.database.size

    n_acq_ser = p_ser.run_steps_gp_chunked(n)
    mesh = grid_mesh(jax.devices()[:8], shape=(4, 2))
    p_sh.run_steps_sharded(n, mesh=mesh)

    assert p_sh.step == p_ser.step == n
    assert p_sh.database.size == p_ser.database.size
    if n_acq_ser:
        assert p_sh.database.size > size0
        np.testing.assert_allclose(np.asarray(p_sh.database._Xtrain),
                                   np.asarray(p_ser.database._Xtrain),
                                   rtol=1e-12)
    assert p_sh.pressure._pause == p_ser.pressure._pause
    assert (p_sh.wall_stress_xz._pause == p_ser.wall_stress_xz._pause)
    np.testing.assert_allclose(p_sh.q, p_ser.q, rtol=1e-6, atol=1e-10)


@needs8
def test_driver_sharded_ehl_matches_serial():
    """run_steps_sharded on a deterministic ELASTIC problem equals the
    serial run_steps_ehl (same end-of-step deformation protocol)."""
    n = 8

    p_ref = Problem.from_string(_det_elastic)
    p_ref._pre_run()
    p_sh = Problem.from_string(_det_elastic)
    p_sh._pre_run()

    p_ref.run_steps_ehl(n)
    mesh = grid_mesh(jax.devices()[:8], shape=(4, 2))
    p_sh.run_steps_sharded(n, mesh=mesh)

    assert p_sh.step == p_ref.step == n
    np.testing.assert_allclose(p_sh.q, p_ref.q, rtol=1e-10, atol=1e-14)
    u_ref = np.asarray(p_ref.topo.ElasticDeformation.u_prev)
    u_sh = np.asarray(p_sh.topo.ElasticDeformation.u_prev)
    scale = max(np.abs(u_ref).max(), 1e-30)
    assert np.abs(u_sh - u_ref).max() / scale < 1e-8
    np.testing.assert_allclose(np.asarray(p_sh.topo.full),
                               np.asarray(p_ref.topo.full),
                               rtol=1e-8, atol=1e-12)


@needs8
def test_driver_sharded_gp_ehl_matches_serial_loop(tmp_path):
    """run_steps_sharded on a GP x ELASTIC problem (the full
    composition) equals the serial fused GP-EHL loop under the same
    end-of-step pressure convention."""
    from gapflow_tpu.core.ehl import make_gp_ehl_loop

    n = 4

    p_ref = Problem.from_string(_gp_sim(tmp_path, "geref", elastic=True))
    p_ref._pre_run()
    p_sh = Problem.from_string(_gp_sim(tmp_path, "gesh", elastic=True))
    p_sh._pre_run()
    assert p_sh.topo.elastic

    # serial reference: fused GP-EHL loop, end-of-step pressure (the
    # sharded protocol), run from the identical initial state
    gp_state, dims3, use3, caps3, nf, dtype, _ = p_ref._frozen_gp_state()
    loop = make_gp_ehl_loop(p_ref, dims3, nf, use3, end_pressure=True)
    ed_ref = p_ref.topo.ElasticDeformation
    q_ref, u_ref = loop(jnp.asarray(p_ref.q, dtype),
                        jnp.asarray(ed_ref.u_prev),
                        jnp.asarray(p_ref.topo.full, dtype),
                        jnp.asarray(p_ref.dt, dtype),
                        jnp.asarray(0, jnp.int32), n, gp_state)

    mesh = grid_mesh(jax.devices()[:8], shape=(4, 2))
    p_sh.run_steps_sharded(n, mesh=mesh)

    assert p_sh.step == n
    np.testing.assert_allclose(p_sh.q[:, 1:-1, 1:-1],
                               np.asarray(q_ref)[:, 1:-1, 1:-1],
                               rtol=1e-10, atol=1e-12)
    u_sh = np.asarray(p_sh.topo.ElasticDeformation.u_prev)
    scale = max(np.abs(np.asarray(u_ref)).max(), 1e-30)
    assert np.abs(u_sh - np.asarray(u_ref)).max() / scale < 1e-8


@needs8
def test_driver_sharded_gp_ehl_deform_every(tmp_path):
    """The composed sharded family honors deform_every chunking (same
    fixed point; runs and stays finite)."""
    n = 4

    p = Problem.from_string(_gp_sim(tmp_path, "gek", elastic=True))
    p._pre_run()
    mesh = grid_mesh(jax.devices()[:8], shape=(4, 2))
    p.run_steps_sharded(n, mesh=mesh, deform_every=2)

    assert p.step == n
    assert np.all(np.isfinite(p.q))
    assert np.all(np.isfinite(np.asarray(
        p.topo.ElasticDeformation.u_prev)))


@needs8
def test_driver_sharded_al_elastic_matches_serial_chunked(tmp_path):
    """Sharded chunked AL composes with ELASTIC problems (the flagship
    asperity AL x EHL scenario over a mesh): same acquisitions, same
    database, same deformation state as the serial chunked AL x elastic
    advance, acquisition for acquisition."""
    n = 6

    def _al_sim(tag):
        return _gp_sim(tmp_path, tag, elastic=True).replace(
            "active_learning: False", "active_learning: True").replace(
            "atol: 1.", "atol: 1.e-4").replace(
            "obs_stddev: 100.", "obs_stddev: 1.e-3")

    p_ser = Problem.from_string(_al_sim("aleser"))
    p_ser._pre_run()
    p_sh = Problem.from_string(_al_sim("alesh"))
    p_sh._pre_run()
    size0 = p_ser.database.size

    n_acq_ser = p_ser.run_steps_gp_chunked(n)
    mesh = grid_mesh(jax.devices()[:8], shape=(4, 2))
    p_sh.run_steps_sharded(n, mesh=mesh)

    assert p_sh.step == p_ser.step == n
    assert p_sh.database.size == p_ser.database.size
    if n_acq_ser:
        assert p_sh.database.size > size0
        np.testing.assert_allclose(np.asarray(p_sh.database._Xtrain),
                                   np.asarray(p_ser.database._Xtrain),
                                   rtol=1e-12)
    assert p_sh.pressure._pause == p_ser.pressure._pause
    assert (p_sh.wall_stress_xz._pause == p_ser.wall_stress_xz._pause)
    np.testing.assert_allclose(p_sh.q, p_ser.q, rtol=1e-6, atol=1e-10)
    u_ser = np.asarray(p_ser.topo.ElasticDeformation.u_prev)
    u_sh = np.asarray(p_sh.topo.ElasticDeformation.u_prev)
    scale = max(np.abs(u_ser).max(), 1e-30)
    assert np.abs(u_sh - u_ser).max() / scale < 1e-6
    np.testing.assert_allclose(np.asarray(p_sh.topo.full),
                               np.asarray(p_ser.topo.full),
                               rtol=1e-6, atol=1e-10)


@needs8
def test_driver_sharded_det_adaptive_matches_host():
    """Deterministic ADAPTIVE problems through run_steps_sharded take the
    SimState trajectory (per-step global CFL reduction) — dt would
    silently freeze on the fixed-dt kernel loops.  Equality against the
    host per-step loop."""
    n = 6
    sim_ad = _det_elastic.replace("""
    elastic:
        E: 5e09
        v: 0.3
        alpha_underrelax: 1e-04""", "").replace("adaptive: 0",
                                                "adaptive: 1")
    assert "elastic" not in sim_ad

    p_host = Problem.from_string(sim_ad)
    p_host._pre_run()
    for _ in range(n):
        p_host.update()

    p_sh = Problem.from_string(sim_ad)
    p_sh._pre_run()
    mesh = grid_mesh(jax.devices()[:8], shape=(4, 2))
    p_sh.run_steps_sharded(n, mesh=mesh)

    assert p_sh.step == p_host.step == n
    np.testing.assert_allclose(p_sh.q, p_host.q, rtol=1e-10, atol=1e-14)
    np.testing.assert_allclose(p_sh.dt, p_host.dt, rtol=1e-10)
    np.testing.assert_allclose(p_sh.simtime, p_host.simtime, rtol=1e-10)


@needs8
def test_driver_sharded_gp_adaptive_matches_serial(tmp_path):
    """Frozen-GP ADAPTIVE over the mesh: the scanned sharded GP step
    with the dt carry and pmax CFL refresh equals the serial adaptive
    device loop (which is host-exact, tests/test_adaptive_device.py)."""
    n = 5
    sim_ad = _gp_sim(tmp_path, "gad").replace("adaptive: 0",
                                              "adaptive: 1")

    p_ref = Problem.from_string(sim_ad)
    p_ref._pre_run()
    p_sh = Problem.from_string(
        _gp_sim(tmp_path, "gad2").replace("adaptive: 0", "adaptive: 1"))
    p_sh._pre_run()

    p_ref.run_steps_gp_fast(n)
    mesh = grid_mesh(jax.devices()[:8], shape=(4, 2))
    p_sh.run_steps_sharded(n, mesh=mesh)

    assert p_sh.step == p_ref.step == n
    np.testing.assert_allclose(p_sh.q, p_ref.q, rtol=1e-10, atol=1e-12)
    np.testing.assert_allclose(p_sh.dt, p_ref.dt, rtol=1e-10)
    np.testing.assert_allclose(p_sh.simtime, p_ref.simtime, rtol=1e-10)


@needs8
def test_driver_sharded_gp_ehl_adaptive_matches_serial(tmp_path):
    """GP x ELASTIC ADAPTIVE over the mesh equals the serial adaptive
    fused GP-EHL loop under the shared end-of-step pressure
    convention."""
    from gapflow_tpu.core.ehl import make_gp_ehl_loop

    n = 4
    sim_ad = _gp_sim(tmp_path, "gead", elastic=True).replace(
        "adaptive: 0", "adaptive: 1")

    p_ref = Problem.from_string(sim_ad)
    p_ref._pre_run()
    p_sh = Problem.from_string(_gp_sim(tmp_path, "gead2", elastic=True)
                               .replace("adaptive: 0", "adaptive: 1"))
    p_sh._pre_run()

    gp_state, dims3, use3, caps3, nf, dtype, _ = p_ref._frozen_gp_state()
    loop = make_gp_ehl_loop(p_ref, dims3, nf, use3, end_pressure=True,
                            adaptive=True)
    ed_ref = p_ref.topo.ElasticDeformation
    q_ref, u_ref, dt_ref, t_ref = loop(
        jnp.asarray(p_ref.q, dtype), jnp.asarray(ed_ref.u_prev),
        jnp.asarray(p_ref.topo.full, dtype),
        jnp.asarray(p_ref.dt, dtype), jnp.asarray(0, jnp.int32), n,
        gp_state)

    mesh = grid_mesh(jax.devices()[:8], shape=(4, 2))
    p_sh.run_steps_sharded(n, mesh=mesh)

    assert p_sh.step == n
    np.testing.assert_allclose(p_sh.q[:, 1:-1, 1:-1],
                               np.asarray(q_ref)[:, 1:-1, 1:-1],
                               rtol=1e-10, atol=1e-12)
    np.testing.assert_allclose(p_sh.dt, float(dt_ref), rtol=1e-10)
    np.testing.assert_allclose(p_sh.simtime, float(t_ref), rtol=1e-10)
    u_sh = np.asarray(p_sh.topo.ElasticDeformation.u_prev)
    scale = max(np.abs(np.asarray(u_ref)).max(), 1e-30)
    assert np.abs(u_sh - np.asarray(u_ref)).max() / scale < 1e-8


@needs8
def test_driver_sharded_det_ehl_adaptive_runs():
    """Deterministic ELASTIC ADAPTIVE over the mesh: the dummy-GP
    adaptive loop advances with a refreshing dt and stays finite."""
    n = 4
    sim_ad = _det_elastic.replace("adaptive: 0", "adaptive: 1")

    p = Problem.from_string(sim_ad)
    p._pre_run()
    dt0 = p.dt
    mesh = grid_mesh(jax.devices()[:8], shape=(4, 2))
    p.run_steps_sharded(n, mesh=mesh)

    assert p.step == n
    assert np.isfinite(p.dt) and p.dt != dt0
    assert p.simtime > 0.
    assert np.all(np.isfinite(p.q))
    assert np.all(np.isfinite(np.asarray(
        p.topo.ElasticDeformation.u_prev)))
