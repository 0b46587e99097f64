"""Per-stage timing of the on-device EHL loop on the TPU.

Times the full reference-protocol loop (deform every step) and ablated
variants (no deformation FFT / no fluid step / no topo rebuild) to show
where the per-step budget goes.  Run on the real chip:

    python examples/profile_ehl.py [N]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("GAPFLOW_X64", "0")

import jax                                                    # noqa: E402
import jax.numpy as jnp                                       # noqa: E402
from jax import lax                                           # noqa: E402

from gapflow_tpu import Problem                               # noqa: E402
from gapflow_tpu.core.ehl import _topo_from_deformation       # noqa: E402
from gapflow_tpu.models.eos import eos_pressure               # noqa: E402
from gapflow_tpu.ops import make_pallas_step                  # noqa: E402

N = int(sys.argv[1]) if len(sys.argv) > 1 else 1024

SIM = f"""
options:
    output: data/ehl_prof
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
    V: 0.
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
    elastic:
        E: 5e09
        v: 0.3
        alpha_underrelax: 1e-04
"""


def build(problem, with_fluid=True, with_deform=True, with_topo=True):
    cfg = problem._solver_cfg
    ed = problem.topo.ElasticDeformation
    hs_deform = ed.deformation_full   # ghost- or interior-grid FFT
    alpha = jnp.float32(ed.alpha_underrelax)
    h_und = jnp.asarray(problem.topo.h_undeformed, jnp.float32)
    extra = jnp.asarray(problem.fc.get_real_field("extra").p, jnp.float32)
    step = make_pallas_step(cfg, N, N, dtype=jnp.float32)

    @jax.jit
    def loop(q, u, dt, n):
        def body(i, carry):
            q, u = carry
            if with_topo:
                topo = _topo_from_deformation(h_und, u, cfg.dx, cfg.dy)
            else:
                topo = _topo_from_deformation(h_und, u * 0., cfg.dx, cfg.dy)
            if with_fluid:
                q = step(q, topo.astype(jnp.float32), extra, dt, i)
            p = eos_pressure(q[0], cfg.prop)
            if with_deform:
                u_new = hs_deform(p)
                u = (1. - alpha) * u + alpha * u_new
            else:
                u = u + 0. * jnp.mean(p)
            return q, u

        return lax.fori_loop(0, n, body, (q, u))

    return loop


def time_loop(loop, q0, u0, dt, lo=20, hi=120):
    def run(n):
        q, u = loop(q0, u0, dt, n)
        float(jnp.sum(u) + jnp.sum(q[0, 0, :8]))
        ts = []
        for _ in range(3):
            t0 = time.perf_counter()
            q, u = loop(q0, u0, dt, n)
            float(jnp.sum(u) + jnp.sum(q[0, 0, :8]))
            ts.append(time.perf_counter() - t0)
        return min(ts)

    return (run(hi) - run(lo)) / (hi - lo)


def main():
    problem = Problem.from_string(SIM)
    problem._pre_run()
    q0 = jnp.asarray(problem.q, jnp.float32)
    u0 = jnp.zeros_like(jnp.asarray(problem.topo.deformation, jnp.float32))
    dt = jnp.float32(problem.dt)

    variants = [
        ("full (reference protocol)", dict()),
        ("no deformation FFT", dict(with_deform=False)),
        ("no fluid step", dict(with_fluid=False)),
        ("no topo rebuild", dict(with_topo=False)),
    ]
    for name, kw in variants:
        per = time_loop(build(problem, **kw), q0, u0, dt)
        print(f"{name:28s}: {per * 1e3:7.3f} ms/step "
              f"({N * N / per / 1e9:5.2f}e9 cu/s)")


if __name__ == "__main__":
    main()
