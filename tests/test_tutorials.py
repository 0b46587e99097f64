"""Execute every tutorial notebook end-to-end.

The doc tutorials (doc/tutorials/*.ipynb, generated from
doc/tutorials/src/*.py) are real code against the public API; executing
them keeps the documentation from rotting.  Mirrors the reference's
tested-notebook docs (reference doc/tutorials/*.ipynb run on CI via
nbsphinx execution).
"""

import os
import shutil
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
TUTORIALS = os.path.join(REPO, "doc", "tutorials")

nbformat = pytest.importorskip("nbformat")
pytest.importorskip("nbclient")


def _notebooks():
    return sorted(f for f in os.listdir(TUTORIALS) if f.endswith(".ipynb"))


def _needs_engine(name):
    return name.startswith("08")


def _engine_available():
    if shutil.which("g++") is None or shutil.which("make") is None:
        return False
    try:
        from gapflow_tpu.md._engine import _load_library
        _load_library()
        return True
    except Exception:
        return False


def test_notebooks_regenerate_cleanly():
    """The committed .ipynb files match their percent-format sources."""
    res = subprocess.run(
        [sys.executable, os.path.join(TUTORIALS, "build_notebooks.py"),
         "--check"], capture_output=True, text=True)
    assert res.returncode == 0, res.stdout + res.stderr


@pytest.mark.parametrize("name", _notebooks())
def test_tutorial_executes(name, tmp_path, monkeypatch):
    if _needs_engine(name) and not _engine_available():
        pytest.skip("native MD engine unavailable")

    from nbclient import NotebookClient

    monkeypatch.setenv("MPLBACKEND", "Agg")
    # the kernel subprocess needs the checkout importable (the package may
    # not be pip-installed) and runs in a scratch dir so 'data/...' outputs
    # never pollute the repo
    pp = os.environ.get("PYTHONPATH", "")
    monkeypatch.setenv("PYTHONPATH", REPO + (os.pathsep + pp if pp else ""))
    monkeypatch.chdir(tmp_path)

    nb = nbformat.read(os.path.join(TUTORIALS, name), as_version=4)
    # force the kernel onto CPU the same way conftest forces the test
    # process: an env var is not enough on hosts whose sitecustomize
    # re-registers an accelerator platform after interpreter start
    setup = nbformat.v4.new_code_cell(
        "import jax; jax.config.update('jax_platforms', 'cpu')")
    nb.cells.insert(0, setup)
    client = NotebookClient(nb, timeout=900, kernel_name="python3",
                            resources={"metadata": {"path": str(tmp_path)}})
    client.execute()
    nb.cells.pop(0)
