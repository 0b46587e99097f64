"""External-LAMMPS input generation (`engine: lammps` escape hatch).

Exercises GoldAlkane._build_moltemplate end to end up to the external-tool
boundary: dataset staging, full system.lt generation against the shipped
TraPPE force-field file, and — when moltemplate.sh / a LAMMPS binary exist
on PATH — the actual deck build and a smoke run.

Reference analogue: GaPFlow/md/moltemplate.py:607-727 (write_template /
build_template) with examples/lmp/mol/moltemplate_files/trappe1998.lt.
"""

import os
import shutil

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
MOLDIR = os.path.join(REPO, "examples", "lmp", "mol", "moltemplate_files")

HAVE_MOLTEMPLATE = shutil.which("moltemplate.sh") is not None


def _gold_alkane(tmp_path, molecule="pentane"):
    from gapflow_tpu.md.mol import GoldAlkane

    static = tmp_path / "static"
    static.mkdir()
    for name in ("in.settings.lmp", "in.run.sample.lmp"):
        (static / name).write_text(f"# placeholder static deck: {name}\n")

    params = {
        "engine": "lammps",
        "ncpu": 4,
        "molecule": molecule,
        "fftemplate": os.path.join(MOLDIR, "trappe1998.lt"),
        "topo": os.path.join(MOLDIR, f"{molecule}.lt"),
        "staticFiles": str(static),
        "nx": 14,
        "vWall": 0.0,
        "fluxX": 0.05,
        "fluxY": 0.0,
        "temperature": 300.,
        "Ninit": 100,
        "Nsteady": 100,
        "Nsample": 200,
    }
    md = GoldAlkane(params)
    md.dtool_basepath = str(tmp_path)
    return md


def test_build_moltemplate_inputs(tmp_path, monkeypatch):
    """Full input generation: staged force field + generated system.lt."""
    if not HAVE_MOLTEMPLATE:
        # stop at the external-tool boundary; the generated inputs are the
        # test surface (the gated test below runs the real tool)
        monkeypatch.setattr("gapflow_tpu.md.mol.build_template",
                            lambda args: None)
    md = _gold_alkane(tmp_path)
    dataset, location = md._create_dataset(0)
    X = [0.6, 0.05, 0.0, 20.0, 0.0, 0.0, 0.0]
    md.build_input_files(dataset, location, X)

    mtdir = os.path.join(location, "data", "moltemplate_files")

    # the shipped force field and molecule resolve the .lt import chain
    assert os.path.exists(os.path.join(mtdir, "trappe1998.lt"))
    assert os.path.exists(os.path.join(mtdir, "pentane.lt"))
    with open(os.path.join(mtdir, "pentane.lt")) as fh:
        assert 'import "trappe1998.lt"' in fh.read()
    with open(os.path.join(mtdir, "trappe1998.lt")) as fh:
        ff = fh.read()
    for needed in ("@atom:CH2", "@atom:CH3", "Data Bonds By Type",
                   "bond_coeff", "angle_coeff", "dihedral_coeff"):
        assert needed in ff

    # static deck files staged
    assert os.path.exists(
        os.path.join(location, "data", "static", "in.settings.lmp"))

    # generated system.lt: init styles, solid slabs, fluid block, settings
    with open(os.path.join(mtdir, "system.lt")) as fh:
        system = fh.read()
    for needed in ("pair_style", "processors", "import pentane.lt",
                   "write_once(\"In Init\")", "write_once(\"Data Masses\")",
                   "write_once(\"Data Boundary\")", "input_fluxX",
                   "eps_CH3_Au equal sqrt", "fluid = new pentane"):
        assert needed in system, f"system.lt is missing {needed!r}"

    # the MPI grid heuristic feeds both the deck and the worker count
    assert md.num_worker >= 1
    procs = [ln for ln in system.splitlines() if "processors" in ln][0]
    nx, ny, nz = (int(v) for v in procs.split()[1:4])
    assert nx * ny * nz == md.num_worker


@pytest.mark.skipif(not HAVE_MOLTEMPLATE,
                    reason="moltemplate.sh not on PATH")
def test_build_template_external(tmp_path):
    """moltemplate.sh produces the LAMMPS data file from our inputs."""
    from gapflow_tpu.md.moltemplate import build_template

    md = _gold_alkane(tmp_path)
    dataset, location = md._create_dataset(0)
    md.build_input_files(dataset, location, [0.6, 0.05, 0.0, 20.0, 0.0, 0.0])

    datapath = os.path.join(location, "data")
    cwd = os.getcwd()
    os.chdir(datapath)
    try:
        build_template(md.params)
    finally:
        os.chdir(cwd)
    assert os.path.exists(os.path.join(datapath, "system.data"))


@pytest.mark.skipif(shutil.which("lmp") is None
                    and shutil.which("lmp_mpi") is None
                    and shutil.which("lmp_serial") is None,
                    reason="no external LAMMPS binary on PATH")
def test_run_lammps_end_to_end(tmp_path):
    """When a LAMMPS binary exists, the escape hatch runs a real deck."""
    from gapflow_tpu.md.runner import run_lammps

    deck = tmp_path / "in.min"
    deck.write_text(
        "units lj\nregion box block 0 5 0 5 0 5\ncreate_box 1 box\n"
        "create_atoms 1 random 50 12345 box\nmass 1 1.0\n"
        "pair_style lj/cut 2.5\npair_coeff 1 1 1.0 1.0\n"
        "minimize 1e-4 1e-6 100 1000\n")
    cwd = os.getcwd()
    os.chdir(tmp_path)
    try:
        run_lammps(str(deck), nworker=1)
    finally:
        os.chdir(cwd)
