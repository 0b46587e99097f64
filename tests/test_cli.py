"""Console tools run end-to-end against generated output directories."""

import os
import sys

import matplotlib

matplotlib.use("Agg")

import pytest  # noqa: E402

from gapflow_tpu import Problem  # noqa: E402


@pytest.fixture(scope="module")
def run_dir(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("cli")
    sim = f"""
options:
    output: {tmp}/run
    write_freq: 20
    use_tstamp: False
    silent: False
grid:
    dx: 1.e-5
    dy: 1.
    Nx: 64
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
    max_it: 60
properties:
    shear: 0.0794
    bulk: 0.
    EOS: DH
    P0: 101325.
    rho0: 877.7007
    C1: 3.5e10
    C2: 1.23
"""
    problem = Problem.from_string(sim)
    problem.run()
    return str(tmp)


def _run_main(module, argv):
    old = sys.argv
    sys.argv = argv
    try:
        module.main()
    finally:
        sys.argv = old


def test_plot_height_cli(run_dir):
    from gapflow_tpu.cli import plot_height
    _run_main(plot_height, ["gpf_plot_height", "-p", run_dir, "-m", "single"])


def test_plot_frame_cli(run_dir):
    from gapflow_tpu.cli import plot_frame
    _run_main(plot_frame, ["gpf_plot_frame", "-p", run_dir, "-m", "single"])


def test_plot_frames_cli(run_dir):
    from gapflow_tpu.cli import plot_frames
    _run_main(plot_frames, ["gpf_plot_frames", "-p", run_dir,
                            "-m", "single", "-e", "2"])


def test_plot_history_cli(run_dir):
    from gapflow_tpu.cli import plot_history
    _run_main(plot_history, ["gpf_plot_history", "-p", run_dir,
                             "-m", "single"])


def test_animate1d_cli(run_dir):
    from gapflow_tpu.cli import animate1d
    _run_main(animate1d, ["gpf_animate1d", "-p", run_dir, "-m", "single"])


def test_info_tool(capsys):
    from gapflow_tpu import info
    info.show_info()
    out = capsys.readouterr().out
    assert "gapflow-tpu" in out
    assert "JAX" in out
