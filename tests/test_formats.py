"""Engine output parsers: thermo log tables and ave/chunk profiles."""

import shutil

import numpy as np
import pytest

from gapflow_tpu.md.formats import LogFile, AvgChunkFile


def test_logfile_parser(tmp_path):
    log = tmp_path / "log.test"
    log.write_text("""nanomd: built system
Step Temp KinEng
0 1.0 100.0
10 1.05 105.0
20 0.98 98.0
Loop time of sampling stage
Step Temp KinEng
0 2.0 200.0
10 2.1 210.0
done
""")
    lf = LogFile(str(log))
    assert len(lf.runs) == 2
    assert lf.runs[0]["Step"] == [0., 10., 20.]
    assert lf.runs[0]["Temp"] == [1.0, 1.05, 0.98]
    assert lf.runs[1]["KinEng"] == [200., 210.]


def test_avgchunkfile_parser(tmp_path):
    f = tmp_path / "dens_profile.dat"
    f.write_text("""# Chunk-averaged data for fix avedens and group fluid
# Timestep Number-of-chunks Total-count
# Chunk Coord1 Ncount density/number
100 3 30
  1 0.5 10 0.7
  2 1.5 12 0.84
  3 2.5 8 0.56
200 3 30
  1 0.5 11 0.77
  2 1.5 11 0.77
  3 2.5 8 0.56
""")
    cf = AvgChunkFile(str(f))
    assert cf.timesteps == [100, 200]
    np.testing.assert_allclose(cf.coordinates[0], [0.5, 1.5, 2.5])
    np.testing.assert_allclose(cf.counts[1], [11, 11, 8])
    np.testing.assert_allclose(cf.data["density/number"][0], [0.7, 0.84, 0.56])


@pytest.mark.skipif(shutil.which("g++") is None, reason="no toolchain")
def test_engine_emits_parseable_output(tmp_path):
    """The nanomd engine's log and density profile parse with these classes."""
    import os
    try:
        from gapflow_tpu.md._engine import _load_library
        _load_library()
    except Exception:
        pytest.skip("native engine unavailable")

    from gapflow_tpu.md.runner import run_serial

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    wall = os.path.join(repo, "examples", "lmp", "lj", "wall.data")

    (tmp_path / "in.run").write_text(f"""
variable\tinput_gap equal 6.0
variable\tinput_dens equal 0.5
variable\tinput_fluxX equal 0.0
variable\tinput_fluxY equal 0.0
variable\ttinit equal 100
variable\tttherm equal 100
variable\ttsample equal 300
variable\tNevery equal 10
variable\tnbinz equal 20
variable\tslabfile index {wall}
workload confined_lj
run_all
""")

    cwd = os.getcwd()
    os.chdir(tmp_path)
    try:
        run_serial("in.run")
    finally:
        os.chdir(cwd)

    lf = LogFile(str(tmp_path / "log.nanomd"))
    assert len(lf.runs) >= 1
    assert len(lf.runs[-1]["Temp"]) > 0

    cf = AvgChunkFile(str(tmp_path / "dens_profile.dat"))
    assert len(cf.timesteps) == 1
    dens = np.asarray(cf.data["density/number"][0])
    # density concentrated inside the gap, roughly at the target value
    assert dens.max() > 0.2
