"""Process layer for MD engine runs: serial in-process or MPI-spawned workers.

Parity: reference GaPFlow/md/runner.py:30-79 (same PARALLEL capability flag
and spawn/barrier protocol, targeting the bundled native engine instead of
LAMMPS; falls back to one subprocess per worker when mpi4py is absent).
"""

import os
import subprocess
import sys
import warnings

PARALLEL = True

try:
    from mpi4py import MPI
except ImportError:
    PARALLEL = False


def main():
    """Worker entry point for MPI-spawned parallel runs."""
    comm = MPI.Comm.Get_parent()
    run_serial(sys.argv[1])
    comm.Barrier()
    comm.Free()


def run_parallel(fname, nworker):
    """Run the engine on ``nworker`` processes (MPI spawn, like the reference)."""
    if PARALLEL:
        worker_file = os.path.abspath(__file__)
        sub_comm = MPI.COMM_SELF.Spawn(sys.executable,
                                       args=[worker_file, fname],
                                       maxprocs=nworker)
        sub_comm.Barrier()
        sub_comm.Free()
    else:
        warnings.warn("mpi4py not available; running MD with "
                      "thread-parallel native engine instead.")
        run_serial(fname, nthreads=nworker)


def run_serial(fname, nthreads=1):
    """Run the native engine in-process on the given input deck."""
    from ._engine import Engine

    eng = Engine(nthreads=nthreads)
    assert eng.has_package("EXTRA-FIX"), \
        "engine must support Gaussian-dynamics flux control (EXTRA-FIX)"
    eng.file(fname)
    eng.close()


def run_subprocess(fname, nworker=1):
    """Run the engine in a child process (isolation without MPI)."""
    code = ("from gapflow_tpu.md.runner import run_serial; "
            f"run_serial({fname!r}, nthreads={nworker})")
    subprocess.run([sys.executable, "-c", code], check=True)


if __name__ == "__main__":
    main()
