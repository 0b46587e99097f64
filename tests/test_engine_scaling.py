"""nanomd OpenMP thread-scaling measurement on the confined-LJ workload.

Records atom-steps/s at 1/2/4 threads (printed with ``-s`` and always
written to the pytest log via the returned record_property), asserts the
physics is thread-count independent, and — only when the host actually has
multiple cores — asserts that threading does not slow the engine down.

Reference analogue: GaPFlow/md/utils.py:27-58 sizes an MPI rank grid from
the atom count; the native engine's cooperative axis is OpenMP threads.
"""

import os
import time

import numpy as np
import pytest

DECK = """
include in.param
variable cutoff equal 2.5
variable temp equal 1.0
variable dt equal 0.005
workload confined_lj
run_all
"""

PARAMS = """
variable\tinput_gap equal 10.0
variable\tinput_dens equal 0.7
variable\tinput_fluxX equal 0.05
variable\tinput_fluxY equal 0.0
variable\ttinit equal 300
variable\tttherm equal 300
variable\ttsample equal 1000
variable\tNevery equal 10
variable\tslabfile index {wall}
"""


def _run_at(tmp_path, nthreads):
    from gapflow_tpu.md.runner import run_serial

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    wall = os.path.join(repo, "examples", "lmp", "lj", "wall.data")

    rundir = tmp_path / f"threads_{nthreads}"
    rundir.mkdir()
    (rundir / "in.run").write_text(DECK)
    (rundir / "in.param").write_text(PARAMS.format(wall=wall))

    cwd = os.getcwd()
    os.chdir(rundir)
    try:
        t0 = time.perf_counter()
        run_serial("in.run", nthreads=nthreads)
        elapsed = time.perf_counter() - t0
    finally:
        os.chdir(cwd)

    data = np.loadtxt(rundir / "stress_wall.dat")
    return elapsed, data


def test_thread_scaling(tmp_path, record_property):
    ncores = os.cpu_count() or 1
    thread_counts = [1, 2, 4]
    nsteps = 300 + 300 + 1000  # tinit + ttherm + tsample

    results = {}
    for nt in thread_counts:
        elapsed, data = _run_at(tmp_path, nt)
        assert np.all(np.isfinite(data))
        # natoms not directly reported; rate in step/s is the scaling metric
        rate = nsteps / elapsed
        results[nt] = (rate, data)
        record_property(f"steps_per_s_threads_{nt}", round(rate, 1))

    table = "  ".join(f"{nt}T:{results[nt][0]:.0f}/s" for nt in thread_counts)
    print(f"\nnanomd confined-LJ thread scaling ({ncores} core(s)): {table}")

    # physics must be thread-count independent: compare the time-averaged
    # wall observables (thermostatted steady state, generous statistical tol)
    ref = results[1][1][:, 1:].mean(axis=0)
    scale = np.abs(results[1][1][:, 1:]).mean() + 1e-12
    for nt in thread_counts[1:]:
        got = results[nt][1][:, 1:].mean(axis=0)
        assert np.allclose(got, ref, atol=0.25 * scale), \
            f"wall stress statistics drifted at {nt} threads"

    if ncores >= 4:
        # real parallel hardware: 4 threads must beat 1 (lenient bound)
        assert results[4][0] > 1.3 * results[1][0], \
            f"no thread speedup: {results}"
