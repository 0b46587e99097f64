"""Hand-factored hot-path closures equal the sympy-generated ones."""

import numpy as np

from gapflow_tpu.models._closures import _fused_pass_top
from gapflow_tpu.models.closures_opt import fused_pass_top_opt


def test_fused_pass_equivalence():
    rng = np.random.default_rng(7)
    n = 64
    q0 = rng.uniform(0.5, 2.0, n)
    q1 = rng.uniform(-1., 1., n)
    q2 = rng.uniform(-1., 1., n)
    H = rng.uniform(0.5, 3.0, n)
    Hx = rng.uniform(-0.3, 0.3, n)
    Hy = rng.uniform(-0.3, 0.3, n)

    for U, V, eta, zeta, Ls in [(0.7, -0.3, 1.3, 0.4, 0.0),
                                (0.7, -0.3, 1.3, 0.4, 0.25),
                                (0.1, 0.0, 0.0794, 0.0, 0.5)]:
        ref = _fused_pass_top(q0, q1, q2, H, Hx, Hy, U, V, eta, zeta, Ls)
        opt = fused_pass_top_opt(q0, q1, q2, H, Hx, Hy, U, V, eta, zeta, Ls)
        for r, o in zip(ref, opt):
            np.testing.assert_allclose(np.asarray(o), np.asarray(r),
                                       rtol=1e-12, atol=1e-12)
