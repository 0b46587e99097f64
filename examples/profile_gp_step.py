"""Per-configuration timing of the GP-closed step/loop kernels on TPU.

Measures, at a given grid size, the three GP-closed execution paths —
XLA fused step, Pallas per-step kernel, whole-run-in-VMEM loop kernel —
across padded training-set capacities (both the unrolled and the
MXU-tiled in-kernel formulations), with three full-capacity surrogates.

    python examples/profile_gp_step.py [N] [cap1,cap2,...]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("GAPFLOW_X64", "0")

import numpy as np                                            # noqa: E402
import jax                                                    # noqa: E402
import jax.numpy as jnp                                       # noqa: E402
from jax import lax                                           # noqa: E402

from gapflow_tpu import Problem                               # noqa: E402
from gapflow_tpu.core.step import apply_bcs                   # noqa: E402
from gapflow_tpu.core.gp_step import make_gp_step_core        # noqa: E402
from gapflow_tpu.validate import synthetic_gp_state           # noqa: E402

N = int(sys.argv[1]) if len(sys.argv) > 1 else 1024
CAPS = [int(c) for c in sys.argv[2].split(",")] if len(sys.argv) > 2 \
    else [16, 64, 256, 1024, 2048]

SIM = f"""
options:
    output: data/gp_prof
    write_freq: 1000000
    silent: True
grid:
    dx: 2.e-5
    dy: 2.e-5
    Nx: {N}
    Ny: {N}
geometry:
    type: journal
    CR: 1.e-2
    eps: 0.7
    U: 0.1
    V: 0.05
numerics:
    CFL: 0.25
    adaptive: 0
    tol: 1e-30
    dt: 5e-11
    max_it: 100000
properties:
    shear: 0.0794
    bulk: 0.
    EOS: DH
    P0: 101325.
    rho0: 877.7007
    C1: 3.5e10
    C2: 1.23
"""

DIMS = ((0, 3), (0, 1, 3), (0, 2, 3))
USE = (True, True, True)


def sync(arr):
    return float(np.asarray(jax.device_get(arr)).ravel()[1])


def time_fn(fn, *args, reps=3):
    out = fn(*args)
    sync(out[0] if isinstance(out, tuple) else out)
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn(*args)
        sync(out[0] if isinstance(out, tuple) else out)
        ts.append(time.perf_counter() - t0)
    return min(ts)


def main():
    problem = Problem.from_string(SIM)
    problem._pre_run()
    cfg = problem._solver_cfg
    q = apply_bcs(jnp.asarray(problem.q, jnp.float32), cfg)
    topo = jnp.asarray(problem.topo.full, jnp.float32)
    extra = jnp.asarray(problem.fc.get_real_field("extra").p, jnp.float32)
    dt = jnp.float32(problem.dt)
    cells = N * N
    rng = np.random.default_rng(0)

    for cap in CAPS:
        gp_state = synthetic_gp_state(DIMS, USE, cap, rng)
        caps = (cap, cap, cap)
        row = [f"cap={cap:5d}"]

        # XLA fused step, scan-wrapped (amortizes dispatch)
        n_scan = 20
        step_xla = make_gp_step_core(cfg, DIMS, 7, USE, allow_pallas=False)

        @jax.jit
        def scan_xla(q, gp_state):
            def body(i, qq):
                qn, _ = step_xla(qq, topo, extra, dt, i, gp_state)
                return qn
            return lax.fori_loop(0, n_scan, body, q)

        t = time_fn(scan_xla, q, gp_state) / n_scan
        row.append(f"xla {t*1e3:8.3f} ms ({cells/t/1e9:5.2f}e9)")

        # Pallas per-step kernel, scan-wrapped
        from gapflow_tpu.ops.stencil_gp import make_pallas_gp_step_fn
        kstep = make_pallas_gp_step_fn(cfg, DIMS, 7, USE, N, N, caps)

        @jax.jit
        def scan_k(q, gp_state):
            def body(i, qq):
                qn, _ = kstep(qq, topo, extra, dt, i, gp_state)
                return qn
            return lax.fori_loop(0, n_scan, body, q)

        t = time_fn(scan_k, q, gp_state) / n_scan
        row.append(f"kstep {t*1e3:8.3f} ms ({cells/t/1e9:5.2f}e9)")

        # whole-run loop kernel
        from gapflow_tpu.ops.stencil_gp import (make_pallas_gp_loop_fn,
                                                gp_loop_vmem_fits)
        if gp_loop_vmem_fits(cfg, N, N):
            n_loop = max(8, min(200, 4096 // max(1, cap // 16)))
            loop = jax.jit(make_pallas_gp_loop_fn(cfg, DIMS, 7, USE, N, N,
                                                  caps, n_loop))
            t = time_fn(loop, q, topo, extra, dt, gp_state) / n_loop
            row.append(f"loop({n_loop}) {t*1e3:8.3f} ms "
                       f"({cells/t/1e9:5.2f}e9)")
        print("  ".join(row), flush=True)


if __name__ == "__main__":
    main()
