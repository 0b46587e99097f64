"""2D slip flow with active-learning GP surrogates (mock oracle).

A circular slip patch in the center of the domain; both wall-stress GPs
(xz, yz) and the pressure GP are trained on-the-fly with variance-driven
active learning (batched Cholesky solves on the accelerator).

Run: python examples/slip_2d_lj_mock.py
"""

import sys as _sys
from pathlib import Path as _Path
_sys.path.insert(0, str(_Path(__file__).resolve().parents[1]))

import numpy as np

from gapflow_tpu.problem import Problem
from gapflow_tpu.config import read_yaml_string
from gapflow_tpu.db import Database
from gapflow_tpu.md import Mock


infile = """
options:
    output: data/slip_2d_lj
    write_freq: 50
    use_tstamp: False
grid:
    Lx: 1470.
    Ly: 1470.
    Nx: 64
    Ny: 64
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
    max_it: 2_000
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
        active_dims: [0]
    shear:
        fix_noise: True
        atol: 1.
        rtol: 0.
        obs_stddev: 4.e-3
        max_steps: 10
        active_dims:
            x: [0, 1, 6]
            y: [0, 2, 6]
db:
    init_size: 10
    init_method: sobol
"""


def make_slip_patch(nx, ny, radius_frac=0.25):
    """Smooth circular slip patch centered in the domain."""
    x = np.linspace(-0.5, 0.5, nx)
    y = np.linspace(-0.5, 0.5, ny)
    r = np.hypot(x[:, None], y[None, :])
    patch = 0.5 * (1. - np.tanh((r - radius_frac) * 20.))

    extra = np.zeros((1, nx + 2, ny + 2))
    extra[0, 1:-1, 1:-1] = patch
    # periodic ghost fill
    extra[0, 0, :] = extra[0, -2, :]
    extra[0, -1, :] = extra[0, 1, :]
    extra[0, :, 0] = extra[0, :, -2]
    extra[0, :, -1] = extra[0, :, 1]
    return extra


if __name__ == "__main__":
    input_dict = read_yaml_string(infile)

    nx, ny = input_dict["grid"]["Nx"], input_dict["grid"]["Ny"]
    extra = make_slip_patch(nx, ny)

    md_runner = Mock(input_dict["properties"], input_dict["geometry"],
                     input_dict["gp"])
    database = Database(md_runner, input_dict["db"])

    problem = Problem(input_dict["options"], input_dict["grid"],
                      input_dict["numerics"], input_dict["properties"],
                      input_dict["geometry"], input_dict["gp"],
                      database, extra_field=extra)
    problem.run()
