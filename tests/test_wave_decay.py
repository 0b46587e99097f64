"""Shear/sound wave decay vs linearized Navier-Stokes theory.

Mirrors reference tests/test_wave_decay.py:86-146: sinusoidal transverse
and longitudinal perturbations on a flat periodic gap must decay with the
analytic envelope every step (4 / 3 decimals), covering the under- and
over-damped longitudinal branches.
"""

import io

import numpy as np
import pytest

from gapflow_tpu import Problem
from gapflow_tpu.config import read_yaml_input

sim = """
options:
    output: data/decay
    write_freq: 100
    use_tstamp: False
    silent: True
grid:
    Lx: 3.2e-7
    Ly: 1
    Nx: 256
    Ny: 1
    xE: ['P', 'P', 'P']
    xW: ['P', 'P', 'P']
    yS: ['P', 'P', 'P']
    yN: ['P', 'P', 'P']
geometry:
    type: inclined
    hmin: 5e-9
    hmax: 5e-9
    U: 0.
    V: 0.
numerics:
    adaptive: 0
    CFL: 0.5
    dt: 1e-13
    max_it: 5_000
properties:
    EOS: cubic
    shear: 3.92293e-05    # N s/m^2
    bulk: 0.              # N s/m^2
    rho0: 762.8617        # kg/m^3
    a: 1.33030e-1
    b: -1.41778e2
    c: 8.35134e4
    d: -2.86532e6
"""


def longitudinal_decay_underdamped(t, a, b, c):
    return np.exp(-t / a) * (np.cos(b * t) - c * np.sin(b * t))


def longitudinal_decay_overdamped(t, a, b, c):
    return np.exp(-t / a) * (np.cosh(b * t) - c * np.sinh(b * t))


@pytest.fixture(scope="session")
def setup():
    with io.StringIO(sim) as ymlfile:
        yield read_yaml_input(ymlfile)


@pytest.mark.parametrize("n", [1, 2, 4, 8])
def test_shear_wave_decay(setup, n):
    problem = Problem._from_dict(setup)
    problem._pre_run()

    h = problem.geo["hmin"]
    kin_visc = problem.prop["shear"] / problem.prop["rho0"]
    Lx = problem.grid["Lx"]

    kn = n * 2. * np.pi / Lx
    tau = h ** 2 / (6 * kin_visc)

    x = problem.topo.x[1:-1, 1]

    problem.q[2, 1:-1, :] = np.sin(kn * x)[:, None]
    problem.kinetic_energy_old = problem.kinetic_energy

    # one fused on-device scan produces the whole trajectory
    qs, times = problem.run_steps(200)
    for q, t in zip(qs, times):
        jy_ana = np.sin(kn * x) * np.exp(-2 * t / tau)
        np.testing.assert_almost_equal(q[2, 1:-1, 1], jy_ana, decimal=4)


@pytest.mark.parametrize("n", [1, 2, 3, 4])
def test_sound_wave_decay(setup, n):
    problem = Problem._from_dict(setup)
    problem._pre_run()

    h = problem.geo["hmin"]
    kin_visc = problem.prop["shear"] / problem.prop["rho0"]
    Lx = problem.grid["Lx"]

    kn = n * 2. * np.pi / Lx
    tau = h ** 2 / (6 * kin_visc)
    cT = problem.pressure.v_sound

    x = problem.topo.x[1:-1, 1]
    problem.q[1, 1:-1, :] = np.sin(kn * x)[:, None]
    problem.kinetic_energy_old = problem.kinetic_energy

    k_crit = 6. * kin_visc / (h ** 2 * cT)

    qs, times = problem.run_steps(400)
    for q, t in zip(qs, times):
        if kn > k_crit:
            sT = np.sqrt(cT ** 2 - (1 / tau / kn) ** 2)
            jx_ana = np.sin(kn * x) * longitudinal_decay_underdamped(
                t, tau, sT * kn, 1 / (tau * sT * kn))
        else:
            isT = np.sqrt((1 / tau / kn) ** 2 - cT ** 2)
            jx_ana = np.sin(kn * x) * longitudinal_decay_overdamped(
                t, tau, isT * kn, 1 / (tau * isT * kn))

        np.testing.assert_almost_equal(q[1, 1:-1, 1], jx_ana, decimal=3)
