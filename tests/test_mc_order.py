"""MacCormack pass-order option: MC_order=0 alternates between steps."""

from dataclasses import replace

import numpy as np

from gapflow_tpu import Problem


_BASE = """
options:
    output: data/mc
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
    eps: 0.5
    U: 0.1
    V: 0.
numerics:
    CFL: 0.5
    adaptive: 0
    tol: 1e-8
    dt: 5e-11
    max_it: 10_000
    MC_order: {order}
properties:
    shear: 0.0794
    bulk: 0.
    EOS: DH
    P0: 101325.
    rho0: 877.7007
    C1: 3.5e10
    C2: 1.23
"""


def _problem(order):
    p = Problem.from_string(_BASE.format(order=order))
    p._pre_run()
    return p


def test_mc_order_zero_alternates():
    p_alt = _problem(0)
    p_alt.update()
    p_alt.update()

    # manual alternation: order +1 for the even step, -1 for the odd step
    p_ref = _problem(1)
    p_ref.update()
    p_ref._solver_cfg = replace(p_ref._solver_cfg, MC_order=-1)
    p_ref._det_step = None
    p_ref.update()

    np.testing.assert_array_equal(p_alt.q, p_ref.q)


def test_mc_order_direction_matters():
    q_pos = _problem(1)
    q_neg = _problem(-1)
    q_pos.update()
    q_neg.update()
    assert np.abs(q_pos.q - q_neg.q).max() > 0.
