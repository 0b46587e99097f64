"""Animations built from stored output (1D, with/without elastic topo).

Mirrors reference tests/test_animation.py: run short simulations, build
FuncAnimation objects, check frame and axes counts.
"""

import os

import matplotlib

matplotlib.use("Agg")

from gapflow_tpu.problem import Problem  # noqa: E402
from gapflow_tpu.viz.animations import (_create_animation_1d,
                                        _display_animation)  # noqa: E402


def _sim(tmp_path, elastic):
    elastic_block = """
    elastic:
        E: 5e09
        v: 0.3
        alpha_underrelax: 1e-04""" if elastic else ""
    return f"""
options:
    output: {tmp_path}
    write_freq: 10
    silent: False
grid:
    dx: 1.e-5
    dy: 1.
    Nx: 100
    Ny: 1
geometry:
    type: journal
    CR: 1.e-2
    eps: 0.7
    U: 0.1
    V: 0.
numerics:
    CFL: 0.25
    adaptive: 1
    tol: 1e-8
    dt: 1e-10
    max_it: 100
properties:
    shear: 0.0794
    bulk: 0.
    EOS: DH
    P0: 101325.
    rho0: 877.7007
    C1: 3.5e10
    C2: 1.23{elastic_block}
"""


def test_animation_1d_elastic(tmp_path):
    myProblem = Problem.from_string(_sim(tmp_path, elastic=True))
    myProblem.run()

    ani = _create_animation_1d(
        filename_sol=os.path.join(myProblem.outdir, "sol.nc"),
        filename_topo=os.path.join(myProblem.outdir, "topo.nc"))

    assert isinstance(ani, matplotlib.animation.FuncAnimation)
    assert ani._save_count == 11
    assert len(ani._fig.axes) == 8


def test_animation_1d(tmp_path):
    myProblem = Problem.from_string(_sim(tmp_path, elastic=False))
    myProblem.run()

    ani = _create_animation_1d(
        filename_sol=os.path.join(myProblem.outdir, "sol.nc"),
        filename_topo=os.path.join(myProblem.outdir, "topo.nc"))

    assert isinstance(ani, matplotlib.animation.FuncAnimation)
    assert ani._save_count == 11
    assert len(ani._fig.axes) == 6

    _display_animation(ani, os.path.join(myProblem.outdir, "sol.nc"),
                       seconds=2., save=False, show=False)
