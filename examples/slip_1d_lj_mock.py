"""1D slip-flow with a heterogeneous slip-length field as an extra GP feature.

A smooth periodic step in the slip length (erf profile) enters the GP
surrogates as feature index 6; the shear-stress GP learns the (rho, jx, Ls)
dependence of the wall stress from the mock oracle.

Run: python examples/slip_1d_lj_mock.py
"""

import sys as _sys
from pathlib import Path as _Path
_sys.path.insert(0, str(_Path(__file__).resolve().parents[1]))

import numpy as np
from scipy.special import erf

from gapflow_tpu.problem import Problem
from gapflow_tpu.config import read_yaml_string
from gapflow_tpu.db import Database
from gapflow_tpu.md import Mock


infile = """
options:
    output: data/slip_1d_lj
    write_freq: 100
    use_tstamp: False
grid:
    Lx: 1470.
    Ly: 1.
    Nx: 200
    Ny: 1
geometry:
    type: inclined
    hmin: 12.
    hmax: 12.
    U: 0.12
    V: 0.
numerics:
    CFL: 0.5
    adaptive: 1
    tol: 1e-8
    dt: 0.1
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
        atol: 1.
        rtol: 0.
        obs_stddev: 2.e-2
        max_steps: 10
        active_dims: [0]        # density
    shear:
        fix_noise: True
        atol: 1.
        rtol: 0.
        obs_stddev: 4.e-3
        max_steps: 10
        active_dims:
            x: [0, 1, 6]        # density, flux, slip length
db:
    init_size: 10
    init_method: lhc
"""


def make_slip_field(nx, ny, a=20.):
    """Smooth periodic step: Ls ~ erf ramp up in one half, down in the other."""
    slip = np.zeros(nx)
    ramp = erf(np.linspace(-a, a, nx // 2))
    slip[:nx // 2] = ramp
    slip[nx // 2:] = -ramp
    slip = (1. + np.roll(slip, nx // 4)) / 2.

    extra = np.zeros((1, nx + 2, ny + 2))
    extra[0, 1:-1, :] = slip[:, None]
    extra[0, 0, :] = extra[0, -2, :]
    extra[0, -1, :] = extra[0, 1, :]
    return extra


if __name__ == "__main__":
    input_dict = read_yaml_string(infile)

    nx, ny = input_dict["grid"]["Nx"], input_dict["grid"]["Ny"]
    extra = make_slip_field(nx, ny)

    md_runner = Mock(input_dict["properties"], input_dict["geometry"],
                     input_dict["gp"])
    database = Database(md_runner, input_dict["db"])

    problem = Problem(input_dict["options"], input_dict["grid"],
                      input_dict["numerics"], input_dict["properties"],
                      input_dict["geometry"], input_dict["gp"],
                      database, extra_field=extra)
    problem.run()
