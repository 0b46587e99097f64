"""GP-run animation with uncertainty bands from stored variance fields.

Mirrors reference tests/test_animation_gp.py: run a short GP-surrogate
simulation (mock oracle), read the variance-tolerance traces from the GP
CSVs, and build the banded animation.
"""

import os
import shutil

import matplotlib

matplotlib.use("Agg")

import numpy as np  # noqa: E402

from gapflow_tpu.config import read_history_csv  # noqa: E402
from gapflow_tpu.problem import Problem  # noqa: E402
from gapflow_tpu.viz.animations import (_create_animation_1d_gp,
                                        _display_animation)  # noqa: E402


def test_animation_1d_gp(tmp_path):
    sim = f"""
options:
    output: {tmp_path}
    write_freq: 1
    use_tstamp: True
grid:
    Lx: 1470.
    Ly: 1.
    Nx: 200
    Ny: 1
    xE: ['D', 'N', 'N']
    xW: ['D', 'N', 'N']
    yS: ['P', 'P', 'P']
    yN: ['P', 'P', 'P']
    xE_D: 0.8
    xW_D: 0.8
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
    max_it: 10
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
        max_steps: 10
        active_learning: False
    shear:
        fix_noise: True
        atol: 1.5
        rtol: 0.
        obs_stddev: 4.e-3
        max_steps: 10
        active_learning: False
db:
    init_size: 5
    init_method: rand
    init_width: 0.01
"""

    myProblem = Problem.from_string(sim)
    myProblem.run()

    fname_sol = os.path.join(myProblem.outdir, "sol.nc")
    gp_p = os.path.join(myProblem.outdir, "gp_zz.csv")
    gp_s = os.path.join(myProblem.outdir, "gp_xz.csv")

    tol_p = np.array(read_history_csv(gp_p)["variance_tol"])
    tol_t = np.array(read_history_csv(gp_s)["variance_tol"])

    ani = _create_animation_1d_gp(filename=fname_sol, tol_p=tol_p, tol_t=tol_t)

    assert isinstance(ani, matplotlib.animation.FuncAnimation)
    assert ani._save_count == 11
    assert len(ani._fig.axes) == 6

    save = shutil.which("ffmpeg") is not None
    _display_animation(ani, fname_sol, seconds=2., save=save, show=False)
