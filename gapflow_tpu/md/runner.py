"""Process layer for MD engine runs.

Parity: reference GaPFlow/md/runner.py:30-79.  The reference spawns
``nworker`` MPI ranks that form ONE LAMMPS world (domain decomposition).
The bundled native engine parallelizes a single simulation with OpenMP
threads instead, so ``run_parallel`` here means "one simulation, nworker
threads" — never N duplicate runs racing on the same output files.
"""

import subprocess
import sys

#: Capability flag: the native engine supports intra-run parallelism
#: (OpenMP threads).  The reference's flag means "mpi4py importable".
PARALLEL = True


def run_parallel(fname, nworker):
    """Run ONE simulation on ``nworker`` OpenMP threads.

    Reference analogue: GaPFlow/md/runner.py:50-65 spawns an MPI world of
    ``nworker`` ranks cooperating on one simulation.  The native engine's
    cooperative axis is threads, so this delegates to :func:`run_serial`
    with ``nthreads=nworker`` — exactly one set of output files is written.
    """
    run_serial(fname, nthreads=max(int(nworker), 1))


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
