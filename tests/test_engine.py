"""Native MD engine: load, capability queries, and a short confined-LJ run.

Mirrors reference tests/test_lammps.py:40-66 (library load + package
checks) plus a fast end-to-end run producing the stress_wall.dat the
multiscale loop consumes.
"""

import os
import shutil
import subprocess

import numpy as np
import pytest

_HAS_TOOLCHAIN = shutil.which("g++") is not None and shutil.which("make")


def _engine_available():
    if not _HAS_TOOLCHAIN:
        return False
    try:
        from gapflow_tpu.md._engine import _load_library
        _load_library()
        return True
    except Exception:
        return False


pytestmark = pytest.mark.skipif(not _engine_available(),
                                reason="native engine unavailable")


def show_info(lmp):
    print()
    print("OS:", lmp.get_os_info())
    print("Shared lib:", lmp.lib._name)
    print("Version:", lmp.version())
    print("mpi4py:", lmp.has_mpi4py)
    print("packages:", lmp.installed_packages)


def test_engine_serial():
    from gapflow_tpu.md._lammps import lammps

    lmp = lammps.lammps(name="mpi", cmdargs=["-log", "none"])
    show_info(lmp)

    assert "LJ" in lmp.installed_packages
    assert "EXTRA-FIX" in lmp.installed_packages
    assert lmp.has_package("WALLS")
    lmp.close()


def test_engine_confined_lj_run(tmp_path):
    """Short confined-LJ run: stable temperature, finite wall stresses."""
    from gapflow_tpu.md.runner import run_serial

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    wall = os.path.join(repo, "examples", "lmp", "lj", "wall.data")

    deck = tmp_path / "in.run"
    deck.write_text(f"""
include in.param
variable cutoff equal 2.5
variable temp equal 1.0
variable dt equal 0.005
workload confined_lj
run_all
""")
    (tmp_path / "in.param").write_text(f"""
variable\tinput_gap equal 8.0
variable\tinput_dens equal 0.6
variable\tinput_fluxX equal 0.05
variable\tinput_fluxY equal 0.0
variable\ttinit equal 300
variable\tttherm equal 300
variable\ttsample equal 1000
variable\tNevery equal 10
variable\tslabfile index {wall}
""")

    cwd = os.getcwd()
    os.chdir(tmp_path)
    try:
        run_serial("in.run")
    finally:
        os.chdir(cwd)

    data = np.loadtxt(tmp_path / "stress_wall.dat")
    assert data.shape[1] == 7
    assert data.shape[0] == 100
    assert np.all(np.isfinite(data))
    # wall stresses respond to the fluid (not all zero)
    assert np.abs(data[:, 1:]).max() > 0.


def test_engine_output_feeds_md_utils(tmp_path):
    """stress_wall.dat parses into the 13-entry observation vector."""
    from gapflow_tpu.md.utils import read_output_files

    rng = np.random.default_rng(0)
    n = 200
    data = np.column_stack([
        np.arange(n),
        1.0 + 0.1 * rng.normal(size=n),   # pressL
        0.3 + 0.05 * rng.normal(size=n),  # tauxzL
        1.0 + 0.1 * rng.normal(size=n),   # pressU
        -0.3 + 0.05 * rng.normal(size=n),
        0.0 + 0.05 * rng.normal(size=n),
        0.0 + 0.05 * rng.normal(size=n),
    ])
    fname = tmp_path / "stress_wall.dat"
    np.savetxt(fname, data)

    Y, Yerr = read_output_files(str(fname))
    assert Y.shape == (13,)
    assert abs(Y[0] - 1.0) < 0.05
    assert abs(Y[5] - 0.3) < 0.05
    assert abs(Y[11] + 0.3) < 0.05
    assert np.all(Yerr[[0, 4, 5, 10, 11]] > 0)


def test_engine_introspection(tmp_path):
    """extract_box/extract_global/get_natoms after building a system."""
    import os
    from gapflow_tpu.md._lammps import lammps

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    wall = os.path.join(repo, "examples", "lmp", "lj", "wall.data")

    lmp = lammps.lammps(cmdargs=["-log", "none"])
    lmp.command("variable input_gap equal 6.0")
    lmp.command("variable input_dens equal 0.5")
    lmp.command(f"variable slabfile index {wall}")
    lmp.command("workload confined_lj")

    assert lmp.get_natoms() > 288          # walls + fluid
    (xlo, ylo, zlo), (xhi, yhi, zhi) = lmp.extract_box()
    assert xhi > xlo and yhi > ylo and zhi > zlo
    assert lmp.extract_global("natoms") == lmp.get_natoms()
    assert lmp.extract_global("dt") > 0
    lmp.close()


def test_engine_gather_atoms():
    import os
    from gapflow_tpu.md._lammps import lammps

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    wall = os.path.join(repo, "examples", "lmp", "lj", "wall.data")

    lmp = lammps.lammps(cmdargs=["-log", "none"])
    lmp.command(f"variable slabfile index {wall}")
    lmp.command("variable input_gap equal 6.0")
    lmp.command("variable input_dens equal 0.5")
    lmp.command("workload confined_lj")

    x = lmp.gather_atoms("x")
    assert x.shape == (lmp.get_natoms(), 3)
    assert np.all(np.isfinite(x))
    v = lmp.gather_atoms("v")
    assert v.shape == x.shape
    lmp.close()
