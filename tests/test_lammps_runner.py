"""Subprocess-level dry tests of the external-LAMMPS escape hatch
(md/runner.py run_lammps) against a STUB executable: argv/`-in`
plumbing, mpirun rank selection and error propagation are exercised end
to end through the real subprocess layer, so the only untested piece of
``engine: lammps`` is the LAMMPS binary itself (none exists in this
environment).  Reference analogue: GaPFlow/md/runner.py:50-74.
"""

import os
import stat
import subprocess

import pytest

from gapflow_tpu.md import runner


def _make_stub(path, name, body):
    exe = path / name
    exe.write_text("#!/bin/sh\n" + body)
    exe.chmod(exe.stat().st_mode | stat.S_IEXEC)
    return exe


@pytest.fixture
def stub_path(tmp_path, monkeypatch):
    """A bin dir on PATH holding only our stubs (keep /bin for sh)."""
    bindir = tmp_path / "bin"
    bindir.mkdir()
    monkeypatch.setenv("PATH", f"{bindir}:/usr/bin:/bin")
    return bindir


def test_run_lammps_serial_argv(stub_path, tmp_path):
    """Single-worker runs invoke the bare binary with -in <deck>."""
    log = tmp_path / "argv.log"
    _make_stub(stub_path, "lmp", f'echo "$@" > {log}\n')

    runner.run_lammps("in.run", nworker=1)
    assert log.read_text().split() == ["-in", "in.run"]


def test_run_lammps_mpirun_ranks(stub_path, tmp_path):
    """nworker > 1 with mpirun available: one LAMMPS world of nworker
    ranks (the reference's cooperative decomposition)."""
    log = tmp_path / "argv.log"
    _make_stub(stub_path, "mpirun", f'echo "$@" > {log}\n')
    _make_stub(stub_path, "lmp", "exit 7\n")  # must NOT run directly

    runner.run_lammps("system.in", nworker=4)
    argv = log.read_text().split()
    assert argv[:2] == ["-np", "4"]
    assert argv[2].endswith("/lmp")
    assert argv[3:] == ["-in", "system.in"]


def test_run_lammps_serial_when_no_mpirun(stub_path, tmp_path):
    """nworker > 1 without mpirun degrades to a serial run."""
    log = tmp_path / "argv.log"
    _make_stub(stub_path, "lmp_mpi", f'echo "$@" > {log}\n')

    runner.run_lammps("deck.in", nworker=4)
    assert log.read_text().split() == ["-in", "deck.in"]


def test_run_lammps_binary_preference(stub_path, tmp_path):
    """Binary lookup prefers lmp > lmp_mpi > lmp_serial."""
    for name in ("lmp", "lmp_mpi", "lmp_serial"):
        _make_stub(stub_path, name, "exit 0\n")
    assert runner.find_lammps().endswith("/lmp")
    os.remove(stub_path / "lmp")
    assert runner.find_lammps().endswith("/lmp_mpi")


def test_run_lammps_error_propagates(stub_path):
    """A failing binary raises CalledProcessError (check=True)."""
    _make_stub(stub_path, "lmp", "exit 3\n")
    with pytest.raises(subprocess.CalledProcessError):
        runner.run_lammps("in.run")


def test_run_lammps_missing_binary(stub_path):
    """No binary on PATH: an actionable RuntimeError, not a silent run."""
    with pytest.raises(RuntimeError, match="engine: lammps requires"):
        runner.run_lammps("in.run")
