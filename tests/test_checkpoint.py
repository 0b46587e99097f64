"""Checkpoint / resume: a restored run continues bit-for-bit."""

import os

import numpy as np

from gapflow_tpu import Problem


sim = """
options:
    output: data/ckpt
    write_freq: 1000
    silent: True
grid:
    dx: 1.e-5
    dy: 1.
    Nx: 64
    Ny: 1
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
    dt: 1e-10
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


def test_checkpoint_roundtrip(tmp_path):
    p1 = Problem.from_string(sim)
    p1._pre_run()
    for _ in range(5):
        p1.update()

    ckpt = os.path.join(tmp_path, "state")
    p1.save_checkpoint(ckpt)

    p2 = Problem.from_checkpoint(ckpt)
    assert p2.step == p1.step
    assert np.isclose(p2.simtime, p1.simtime)
    np.testing.assert_array_equal(p2.q, p1.q)

    # both continue identically
    for _ in range(5):
        p1.update()
        p2.update()
    np.testing.assert_allclose(p2.q, p1.q, rtol=1e-14, atol=0)
    assert np.isclose(p2.residual, p1.residual)


def test_checkpoint_gp_mode(tmp_path):
    """GP-mode checkpoint: database and configs survive the round trip."""
    sim_gp = f"""
options:
    output: {tmp_path}/out
    write_freq: 100
    use_tstamp: False
    silent: True
grid:
    Lx: 1470.
    Ly: 1.
    Nx: 64
    Ny: 1
geometry:
    type: parabolic
    hmin: 12.
    hmax: 60.
    U: 0.12
    V: 0.
numerics:
    CFL: 0.5
    adaptive: 1
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
    init_size: 3
    init_method: rand
    dtool_path: {tmp_path}/train
"""
    p1 = Problem.from_string(sim_gp)
    p1._pre_run()
    for _ in range(2):
        p1.update()

    ckpt = os.path.join(tmp_path, "gp_state")
    p1.save_checkpoint(ckpt)

    p2 = Problem.from_checkpoint(ckpt)
    assert p2.has_gp_model
    assert p2.database.size == p1.database.size
    assert p2.step == p1.step
    np.testing.assert_array_equal(p2.q, p1.q)

    # restored problem continues stepping directly (load_checkpoint
    # re-initializes the GP surrogates itself)
    p2.update()
    assert p2.step == p1.step + 1


def test_checkpoint_npz_path_accepted(tmp_path):
    """from_checkpoint accepts the actual on-disk .npz filename."""
    import os
    from gapflow_tpu import Problem

    p1 = Problem.from_string(sim)
    p1._pre_run()
    ckpt = os.path.join(tmp_path, "state")
    p1.save_checkpoint(ckpt)
    p2 = Problem.from_checkpoint(ckpt + ".npz")
    np.testing.assert_array_equal(p2.q, p1.q)


def test_checkpoint_elastic_resume_exact(tmp_path):
    """Elastic resume continues the under-relaxation state exactly."""
    import os
    from gapflow_tpu import Problem

    sim2 = sim.replace("""properties:""", """properties:
    elastic:
        E: 5e09
        v: 0.3
        alpha_underrelax: 1e-03""")
    p1 = Problem.from_string(sim2)
    p1._pre_run()
    for _ in range(3):
        p1.update()

    ckpt = os.path.join(tmp_path, "el")
    p1.save_checkpoint(ckpt)
    p2 = Problem.from_checkpoint(ckpt)

    np.testing.assert_allclose(
        np.asarray(p2.topo.ElasticDeformation.u_prev),
        np.asarray(p1.topo.ElasticDeformation.u_prev))
    np.testing.assert_allclose(np.asarray(p2.topo.h_undeformed),
                               np.asarray(p1.topo.h_undeformed))

    p1.update()
    p2.update()
    np.testing.assert_allclose(p2.q, p1.q)
    np.testing.assert_allclose(
        np.asarray(p2.topo.ElasticDeformation.u_prev),
        np.asarray(p1.topo.ElasticDeformation.u_prev))
