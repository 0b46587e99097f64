"""Consistency of gap-averaged closures with the z-resolved profiles.

Mirrors reference tests/test_analytic.py:38-124: the closed-form wall/average
stress expressions must equal the boundary values / trapezoid integrals of
the analytic z-profiles, and the velocity profiles must reproduce the flux.
"""

import numpy as np
import pytest

from gapflow_tpu.models.profiles import get_velocity_profiles, get_stress_profiles
from gapflow_tpu.models.viscous import stress_avg, stress_top, stress_bottom


@pytest.mark.parametrize("slip, Ls", [("both", 0.), ("both", 0.5),
                                      ("top", 0.), ("top", 0.5),
                                      ("bottom", 0.), ("bottom", 0.5)])
def test_flow_rate(slip, Ls):
    Nz = 10_000
    hmax = 2.
    z = np.linspace(0., hmax, Nz)
    q = np.array([1., 2., 1.])

    u, v = get_velocity_profiles(z, q, Ls=Ls, U=1., V=1., slip=slip)

    assert np.isclose(np.trapezoid(u, z) / hmax, q[1])
    assert np.isclose(np.trapezoid(v, z) / hmax, q[2])


@pytest.mark.parametrize("slip, Ls", [("both", 0.), ("both", 0.5),
                                      ("top", 0.), ("top", 0.5)])
def test_avg_stress(slip, Ls):
    q_test = np.array([1.0, 0.75, 0.25])
    h_test = np.array([1.0, 0.01, 0.01])

    Nz = 10_000
    z = np.linspace(0., 1., Nz)

    tau_xx, tau_yy, _, _, _, tau_xy = get_stress_profiles(
        z, h_test, q_test, np.zeros(3), np.zeros(3),
        U=1., V=1., eta=1., zeta=1., Ls=Ls, mode=slip)

    tau_avg = stress_avg(q_test, h_test, U=1., V=1., eta=1., zeta=1.,
                         Ls=Ls, slip=slip)

    assert np.isclose(np.trapezoid(tau_xx, z) / tau_avg[0], 1.)
    assert np.isclose(np.trapezoid(tau_yy, z) / tau_avg[1], 1.)
    assert np.isclose(np.trapezoid(tau_xy, z) / tau_avg[2], 1.)


@pytest.mark.parametrize("slip, Ls", [("both", 0.), ("both", 0.5),
                                      ("top", 0.), ("top", 0.5)])
def test_wall_stress(slip, Ls):
    q_test = np.array([1.0, 0.75, 0.25])
    h_test = np.array([1.0, 0.01, 0.01])

    Nz = 10_000
    z = np.linspace(0., 1., Nz)

    profs = get_stress_profiles(z, h_test, q_test, np.zeros(3), np.zeros(3),
                                U=1., V=1., eta=1., zeta=1., Ls=Ls, mode=slip)

    tau_top = stress_top(q_test, h_test, U=1., V=1., eta=1., zeta=1.,
                         Ls=Ls, slip=slip)
    tau_bot = stress_bottom(q_test, h_test, U=1., V=1., eta=1., zeta=1.,
                            Ls=Ls, slip=slip)

    # profiles are returned in Voigt order (xx, yy, zz, yz, xz, xy)
    for i in range(6):
        assert np.isclose(tau_bot[i], profs[i][0])
        assert np.isclose(tau_top[i], profs[i][-1])


def test_gradient_terms_consistency():
    """Wall stresses with nonzero state gradients match the z-profiles too."""
    rng = np.random.default_rng(3)
    q = np.array([1.1, 0.6, -0.2])
    h = np.array([1.4, 0.05, -0.03])
    dqx = rng.uniform(-0.2, 0.2, 3)
    dqy = rng.uniform(-0.2, 0.2, 3)
    z = np.linspace(0., h[0], 3)

    for slip in ("top", "both"):
        profs = get_stress_profiles(z, h, q, dqx, dqy, U=0.7, V=-0.3,
                                    eta=1.3, zeta=0.4, Ls=0.25, mode=slip)
        bot = stress_bottom(q, h, 0.7, -0.3, 1.3, 0.4, 0.25,
                            dqx=dqx, dqy=dqy, slip=slip)
        top = stress_top(q, h, 0.7, -0.3, 1.3, 0.4, 0.25,
                         dqx=dqx, dqy=dqy, slip=slip)
        for i in range(6):
            np.testing.assert_allclose(bot[i], profs[i][0], rtol=1e-12, atol=1e-12)
            np.testing.assert_allclose(top[i], profs[i][-1], rtol=1e-12, atol=1e-12)
