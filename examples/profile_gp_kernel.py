"""Dissect the GP-closed kernel's cost against its speed-of-light bound.

The whole-run GP kernel (ops.stencil_gp._gp_all_mxu) spends, per
(8-row block, capacity tile): one bf16 split-K arg^2 matmul, a 4-op VPU
Matern block, and one f32 accumulation matmul (M=8).  doc/status.md
attributes the measured 55%-of-bound cap-64 throughput to "rolled tile
loop staging/layout overhead"; this script times each constituent at
the cap-64 shapes as chained XLA ops so the gap can be attributed and
attacked.  Run on the TPU: `GAPFLOW_X64=0 python examples/profile_gp_kernel.py`.
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
os.environ.setdefault("GAPFLOW_X64", "0")

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax


def timed_chain(make_body, init, k=2000, reps=3):
    """Seconds per iteration of a chained fori_loop (nothing hoists)."""

    @jax.jit
    def run(x, k):
        return lax.fori_loop(0, k, make_body, x)

    x = run(init, 50)
    jax.tree.map(lambda a: a.block_until_ready(), x)

    def one(kk):
        t0 = time.perf_counter()
        out = run(init, kk)
        jax.tree.map(lambda a: float(np.asarray(a).ravel()[0]), out)
        return time.perf_counter() - t0

    one(k)
    t_long = min(one(k) for _ in range(reps))
    t_short = min(one(k // 10) for _ in range(reps))
    return (t_long - t_short) / (k - k // 10)


def main():
    Mtot, K, ny = 192, 128, 1024      # cap-64, 3 surrogates, split-K pad
    rows_per_step = 1024 * 2          # 1024 rows x 2 MacCormack passes

    key = jax.random.key(0)
    Wb = jax.random.normal(key, (Mtot, K), jnp.bfloat16)
    xb = jax.random.normal(key, (K, ny), jnp.bfloat16)
    A = jax.random.normal(key, (8, Mtot), jnp.float32)
    km0 = jax.random.normal(key, (Mtot, ny), jnp.float32)

    # 1. arg2 matmul (bf16, f32 accumulation) — one per row; the scalar
    # feedback into the bf16 operand forces sequential execution
    def arg2_body(i, c):
        out = jnp.dot(Wb * (1 + c * 0).astype(jnp.bfloat16), xb,
                      preferred_element_type=jnp.float32)
        return out[0, 0] * 1e-20

    t_arg2 = timed_chain(arg2_body, jnp.float32(0))

    # 2. Matern VPU block on the (Mtot, ny) tile — one per row
    def matern(i, a):
        arg = jnp.sqrt(jnp.maximum(a, 3e-14))
        e = jnp.exp(-arg)
        return (e + arg * e) + a * 1e-7

    t_matern = timed_chain(matern, km0)

    # 3. accumulation matmul (8, Mtot) @ (Mtot, ny), HIGHEST — one per row
    def acc_body(i, km):
        out = jnp.dot(A, km, precision=lax.Precision.HIGHEST)
        return km + out[0, 0] * 1e-20

    t_acc = timed_chain(acc_body, km0)

    per_step = {
        "arg2_matmul_ms": t_arg2 * rows_per_step * 1e3,
        "matern_ms": t_matern * rows_per_step * 1e3,
        "acc_matmul_ms": t_acc * rows_per_step * 1e3,
    }
    bound_ms = per_step["matern_ms"]
    total_ms = sum(per_step.values())
    print(f"per-row costs: arg2 {t_arg2 * 1e6:.1f} us, "
          f"matern {t_matern * 1e6:.1f} us, acc {t_acc * 1e6:.1f} us")
    print(f"per 1024^2 cap-64 step (x{rows_per_step} rows):")
    for k_, v in per_step.items():
        print(f"  {k_}: {v:.2f}")
    print(f"sum {total_ms:.2f} ms -> {1024 * 1024 / total_ms * 1e3:.3e} "
          f"cu/s if serial; VPU bound alone -> "
          f"{1024 * 1024 / bound_ms * 1e3:.3e} cu/s")
    print("measured production kernel: see bench gp_closed_1024_cap64_cu_s")


if __name__ == "__main__":
    main()
