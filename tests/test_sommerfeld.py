"""1D journal bearing vs the analytic Sommerfeld pressure solution.

Mirrors reference tests/test_sommerfeld.py:115-141 (rel. L2 error < 0.02
for eccentricities 0.5/0.7/0.9).
"""

import io

import numpy as np
import pytest

from gapflow_tpu import Problem
from gapflow_tpu.config import read_yaml_input


sim = """
options:
    output: data/journal
    write_freq: 1000
    silent: True
grid:
    dx: 1.e-5
    dy: 1.
    Nx: 100
    Ny: 1
    xE: ['P', 'P', 'P']
    xW: ['P', 'P', 'P']
    yS: ['P', 'P', 'P']
    yN: ['P', 'P', 'P']
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
    C1: 3.5e12
    C2: 1.23
"""


def sommerfeld_solution(x, Lx, mu, U, clearance_ratio, eps, P0):
    """Analytic journal-bearing pressure for incompressible fluids."""
    Rb = Lx / (2. * np.pi)
    c = clearance_ratio * Rb
    omega = U / Rb

    prefac = 6. * mu * omega * (Rb / c) ** 2 * eps
    return P0 + prefac * np.sin(x / Rb) * (2. + eps * np.cos(x / Rb)) \
        / ((2. + eps ** 2) * (1. + eps * np.cos(x / Rb)) ** 2)


@pytest.fixture(scope="session")
def setup():
    with io.StringIO(sim) as ymlfile:
        yield read_yaml_input(ymlfile)


@pytest.mark.parametrize("eps", [0.5, 0.7, 0.9])
def test_pressure_profile(setup, eps):
    input_dict = setup
    input_dict["geometry"]["eps"] = eps

    problem = Problem._from_dict(input_dict)
    problem.run()

    p_num = np.asarray(problem.pressure.pressure)[1:-1, 1]

    Lx = problem.grid["Lx"]
    U = problem.geo["U"]
    CR = problem.geo["CR"]
    mu = problem.prop["shear"]

    Nx = 100
    x_ana = np.linspace(0., Lx, Nx + 1)
    x_num = (x_ana[1:] + x_ana[:-1]) / 2.

    dp = p_num[1] - p_num[0]
    p_ana = sommerfeld_solution(x_num, Lx, mu, U, CR, eps, p_num[0] - dp / 2)

    rel_err = np.linalg.norm(p_ana - p_num) / np.linalg.norm(p_ana)
    assert rel_err < 0.02
