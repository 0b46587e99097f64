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


def test_dirichlet_values_land_on_reference_edges():
    """Asymmetric Dirichlet targets: the reference ghost fill computes the
    LOW-x ghost from bc_xW_D_val and the HIGH-x ghost from bc_xE_D_val
    (GaPFlow/problem.py:676-768 routes direction=-1 through the xW entry),
    i.e. xE_D is the HIGH-x (East) boundary target.  Same swap for y."""
    import numpy as np
    import jax.numpy as jnp
    from gapflow_tpu import Problem
    from gapflow_tpu.core.step import apply_bcs

    sim = """
options:
    output: data/bcvals
    write_freq: 1000
    silent: True
grid:
    dx: 2.e-5
    dy: 2.e-5
    Nx: 16
    Ny: 8
    xE: ['D', 'N', 'N']
    xW: ['D', 'N', 'N']
    xE_D: 900.
    xW_D: 850.
    yS: ['D', 'N', 'N']
    yN: ['D', 'N', 'N']
    yS_D: 830.
    yN_D: 820.
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
    max_it: 10
properties:
    shear: 0.0794
    bulk: 0.
    EOS: DH
    P0: 101325.
    rho0: 877.7007
    C1: 3.5e10
    C2: 1.23
"""
    p = Problem.from_string(sim)
    q = jnp.asarray(p.q)
    out = np.asarray(apply_bcs(q, p._solver_cfg))
    qn = np.asarray(q)

    # low-x ghost row: Q = 2*xW_D - adjacent; high-x: Q = 2*xE_D - adjacent
    np.testing.assert_allclose(out[0, 0, 1:-1],
                               2. * 850. - qn[0, 1, 1:-1])
    np.testing.assert_allclose(out[0, -1, 1:-1],
                               2. * 900. - qn[0, -2, 1:-1])
    # low-y ghost col: Q = 2*yN_D - adjacent; high-y: Q = 2*yS_D - adjacent
    np.testing.assert_allclose(out[0, 1:-1, 0],
                               2. * 820. - qn[0, 1:-1, 1])
    np.testing.assert_allclose(out[0, 1:-1, -1],
                               2. * 830. - qn[0, 1:-1, -2])
