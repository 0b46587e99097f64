"""All shipped example configurations stay valid against the schema."""

import glob
import os

import matplotlib

matplotlib.use("Agg")

import pytest  # noqa: E402

from gapflow_tpu.config import read_yaml_input  # noqa: E402
from gapflow_tpu import Problem  # noqa: E402


_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
_CONFIGS = sorted(glob.glob(os.path.join(_REPO, "examples", "config",
                                         "*.yaml")))


@pytest.mark.parametrize("fname", _CONFIGS,
                         ids=[os.path.basename(f) for f in _CONFIGS])
def test_example_config_sanitizes(fname):
    with open(fname) as fh:
        d = read_yaml_input(fh)
    assert d["grid"]["Nx"] >= 1
    assert d["properties"]["EOS"] in ("DH", "PL", "vdW", "MT", "cubic",
                                      "BWR", "Bayada", "MD")


def test_example_configs_construct(tmp_path, monkeypatch):
    """Deterministic + mock-GP examples build Problem objects."""
    buildable = [f for f in _CONFIGS if "nanomd" not in f]
    for fname in buildable:
        with open(fname) as fh:
            d = read_yaml_input(fh)
        d["options"]["silent"] = True
        problem = Problem._from_dict(d)
        assert problem.q.shape[0] == 3


def test_problem_plot_methods(tmp_path):
    sim = f"""
options: {{output: {tmp_path}, write_freq: 50, use_tstamp: False}}
grid: {{dx: 1.e-5, dy: 1., Nx: 64, Ny: 1}}
geometry: {{type: journal, CR: 1.e-2, eps: 0.7, U: 0.1, V: 0.}}
numerics: {{CFL: 0.25, adaptive: 1, tol: 1e-8, dt: 1e-10, max_it: 50}}
properties: {{shear: 0.0794, bulk: 0., EOS: DH, P0: 101325.,
             rho0: 877.7007, C1: 3.5e10, C2: 1.23}}
"""
    problem = Problem.from_string(sim)
    problem.run(keep_open=True)
    problem.plot()
    problem.plot_topo(show_pressure=True)
    ani = problem.animate()
    assert ani is not None
    problem._post_run()
