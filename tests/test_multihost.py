"""Real multi-process jax.distributed tests over the DCN glue.

Each case spawns TWO separate Python processes (4 virtual CPU devices
each, 8 global), brings up jax.distributed with a local coordinator, and
runs one sharded runtime family over the global mesh — the sharded
result must equal the serial single-process trajectory on every host.

Covered families (SURVEY §5.8): the fixed-dt deterministic step, the
full adaptive SimState step (global dt/residual reductions, rollback),
the EHL loop (sharded fluid + replicated FFT), and the GP-surrogate-
closed step (replicated train set, sharded test points).

This exercises what SURVEY §5.8 calls the distributed backend for real
(the reference's only multi-process machinery is MPI-spawning LAMMPS
workers, GaPFlow/md/runner.py:50-65).
"""

import os
import socket
import subprocess
import sys

import pytest


def _free_port():
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


def _run_workers(mode, tmp_path, timeout=540):
    worker = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                          "multihost_worker.py")
    port = _free_port()

    env = {k: v for k, v in os.environ.items()
           if k not in ("XLA_FLAGS", "JAX_PLATFORMS", "PYTHONPATH")}

    procs = [
        subprocess.Popen([sys.executable, worker, str(pid), "2", str(port),
                          mode, str(tmp_path)],
                         stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
                         text=True, env=env)
        for pid in range(2)
    ]
    outs = []
    try:
        for p in procs:
            out, _ = p.communicate(timeout=timeout)
            outs.append(out)
    except subprocess.TimeoutExpired:
        for p in procs:
            p.kill()
        pytest.fail("multihost workers timed out:\n" + "\n---\n".join(outs))

    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"worker {pid} failed:\n{out}"
        assert f"worker {pid} [{mode}]: OK" in out


# bounded by the workers' communicate timeout — no plugin mark
@pytest.mark.parametrize("mode", ["det", "adaptive", "ehl", "gp"])
def test_two_process_sharded_equals_serial(mode, tmp_path):
    _run_workers(mode, tmp_path)
