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
