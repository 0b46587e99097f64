"""Benchmark: FV step throughput at 1024^2 and GP refit latency at N=2048.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

Targets (BASELINE.json): >= 1e9 cell-updates/s/chip on a 1024^2 grid;
GP refit (kernel build + Cholesky + one NLML opt step) < 5 ms at N=2048.

Runs in float32 on the TPU (GAPFLOW_X64=0); the verification suite runs
separately in float64 on CPU.
"""

import json
import os
import sys
import time

os.environ.setdefault("GAPFLOW_X64", "0")

import numpy as np  # noqa: E402


def bench_fv_step(nx=1024, ny=1024, n_steps=5000, warmup=2):
    import jax
    from gapflow_tpu import Problem
    from gapflow_tpu.core.step import make_trajectory, make_det_step

    sim = f"""
options:
    output: data/bench
    write_freq: 100000
    silent: True
grid:
    dx: 2.e-5
    dy: 2.e-5
    Nx: {nx}
    Ny: {ny}
geometry:
    type: journal
    CR: 1.e-2
    eps: 0.7
    U: 0.1
    V: 0.
numerics:
    CFL: 0.5
    adaptive: 0
    tol: 1e-30
    dt: 1e-11
    max_it: 1000000
properties:
    shear: 0.0794
    bulk: 0.
    EOS: DH
    P0: 101325.
    rho0: 877.7007
    C1: 3.5e10
    C2: 1.23
"""
    problem = Problem.from_string(sim)
    problem._pre_run()

    state = problem._make_state()

    # fused Pallas stencil loop (falls back to the XLA step if unsupported)
    from gapflow_tpu.ops import make_pallas_loop, pallas_supported
    if pallas_supported(problem._solver_cfg, ny):
        loop = make_pallas_loop(problem._solver_cfg, nx, ny)

        def run(q):
            return loop(q, state.topo, state.extra, state.dt, n_steps)

        out = run(state.q)
        float(out[0, 1, 1])     # materialize: compile + first run done
        times = []
        for _ in range(3):
            t0 = time.perf_counter()
            out = run(out)
            float(out[0, 1, 1])  # D2H forces full completion
            times.append(time.perf_counter() - t0)
    else:
        runner = make_trajectory_steps(problem._solver_cfg, n_steps)
        out = runner(state)
        float(out.q[0, 1, 1])
        times = []
        for _ in range(3):
            t0 = time.perf_counter()
            out = runner(out)
            float(out.q[0, 1, 1])
            times.append(time.perf_counter() - t0)

    cell_updates = nx * ny * n_steps
    return cell_updates / float(np.median(times))


def make_trajectory_steps(cfg, n):
    """n fused steps on-device without stacking outputs (pure throughput)."""
    import jax
    from jax import lax
    from gapflow_tpu.core.step import make_det_step

    det_step = make_det_step(cfg, with_aux=False)

    @jax.jit
    def run(state):
        return lax.fori_loop(0, n, lambda i, s: det_step(s), state)

    return run


def bench_ehl_step(nx=1024, ny=1024, fft_grid=None):
    """Per-step-deformation EHL throughput (reference protocol: the
    elastic FFT runs every fluid step).  Uses the config default FFT
    grid ('interior' since round 3; pass fft_grid='ghost' for the
    reference-parity convention)."""
    import jax.numpy as jnp
    from gapflow_tpu import Problem
    from gapflow_tpu.core.ehl import make_ehl_loop

    fft = f"\n        fft_grid: {fft_grid}" if fft_grid else ""
    sim = f"""
options:
    output: data/bench_ehl
    write_freq: 1000000
    silent: True
grid:
    dx: 2.e-5
    dy: 2.e-5
    Nx: {nx}
    Ny: {ny}
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
        alpha_underrelax: 1e-04{fft}
"""
    problem = Problem.from_string(sim)
    problem._pre_run()
    loop = make_ehl_loop(problem, deform_every=1)
    q0 = jnp.asarray(problem.q)
    u0 = jnp.zeros_like(jnp.asarray(problem.topo.deformation))
    dt = problem.dt

    def run(n):
        q, u = loop(q0, u0, dt, n)
        float(jnp.sum(u))
        times = []
        for _ in range(3):
            t0 = time.perf_counter()
            q, u = loop(q0, u0, dt, n)
            float(jnp.sum(u))
            times.append(time.perf_counter() - t0)
        return min(times)

    per_step = (run(120) - run(20)) / 100
    return nx * ny / per_step


def bench_gp_closed(nx=1024, ny=1024, cap=64, n_steps=200):
    """GP-closed production throughput: whole-run-in-VMEM GP loop kernel
    with three surrogates at padded capacity ``cap`` (synthetic
    well-conditioned state; the padded buffers are FULL, so every train
    point is computed — no tile skipping)."""
    import jax
    import jax.numpy as jnp
    from gapflow_tpu import Problem
    from gapflow_tpu.core.step import apply_bcs
    from gapflow_tpu.ops.stencil_gp import make_pallas_gp_loop_fn
    from gapflow_tpu.validate import synthetic_gp_state

    sim = f"""
options:
    output: data/bench_gp
    write_freq: 100000
    silent: True
grid:
    dx: 2.e-5
    dy: 2.e-5
    Nx: {nx}
    Ny: {ny}
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
    max_it: 1000000
properties:
    shear: 0.0794
    bulk: 0.
    EOS: DH
    P0: 101325.
    rho0: 877.7007
    C1: 3.5e10
    C2: 1.23
"""
    problem = Problem.from_string(sim)
    problem._pre_run()
    cfg = problem._solver_cfg
    dims = ((0, 3), (0, 1, 3), (0, 2, 3))
    use = (True, True, True)
    caps = (cap, cap, cap)
    rng = np.random.default_rng(0)
    gp_state = synthetic_gp_state(dims, use, cap, rng)

    q = jnp.asarray(np.asarray(problem.q), jnp.float32)
    q = apply_bcs(q, cfg)
    topo = jnp.asarray(problem.topo.full, jnp.float32)
    extra = jnp.asarray(problem.fc.get_real_field("extra").p, jnp.float32)
    dt = jnp.float32(problem.dt)

    loop = jax.jit(make_pallas_gp_loop_fn(cfg, dims, 7, use, nx, ny,
                                          caps, n_steps))
    out = loop(q, topo, extra, dt, gp_state)
    float(out[0, 1, 1])
    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        out = loop(out, topo, extra, dt, gp_state)
        float(out[0, 1, 1])
        times.append(time.perf_counter() - t0)
    return nx * ny * n_steps / float(np.median(times))


def bench_sharded_local(bx=1024, by=512, n_steps=512):
    """Per-chip throughput of the SHARDED kernel path, measured on one
    chip: the (1,1)-mesh degenerate run of make_sharded_pallas_loop is
    the identical program a (2,4)-mesh shard of a 2048^2 grid executes
    between ICI exchanges (same wrap layout, same temporal-blocked
    kernel, self-halo instead of ppermute data)."""
    import jax
    import jax.numpy as jnp
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
    from gapflow_tpu import Problem
    from gapflow_tpu.core.step import apply_bcs
    from gapflow_tpu.parallel.pallas_halo import (make_sharded_pallas_loop,
                                                 pad_blocks2)

    sim = f"""
options:
    output: data/bench_shard
    write_freq: 100000
    silent: True
grid:
    dx: 2.e-5
    dy: 2.e-5
    Nx: {bx}
    Ny: {by}
geometry:
    type: journal
    CR: 1.e-2
    eps: 0.7
    U: 0.1
    V: 0.
numerics:
    CFL: 0.5
    adaptive: 0
    tol: 1e-30
    dt: 1e-11
    max_it: 1000000
properties:
    shear: 0.0794
    bulk: 0.
    EOS: DH
    P0: 101325.
    rho0: 877.7007
    C1: 3.5e10
    C2: 1.23
"""
    problem = Problem.from_string(sim)
    problem._pre_run()
    cfg = problem._solver_cfg
    mesh = Mesh(np.array(jax.devices()[:1]).reshape(1, 1), ("x", "y"))
    loop = make_sharded_pallas_loop(cfg, mesh, bx, by)

    q = np.asarray(apply_bcs(jnp.asarray(problem.q, jnp.float32), cfg))
    topo = np.asarray(problem.topo.full, np.float32)
    extra = np.asarray(problem.fc.get_real_field("extra").p, np.float32)
    spec = NamedSharding(mesh, P(None, "x", "y"))
    qs = jax.device_put(q[:, 1:-1, 1:-1], spec)
    t2 = jax.device_put(pad_blocks2(topo, 1, 1), spec)
    e2 = jax.device_put(pad_blocks2(extra, 1, 1), spec)
    dt = jnp.float32(problem.dt)

    out = loop(qs, t2, e2, dt, n_steps)
    float(out[0, 1, 1])
    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        out = loop(out, t2, e2, dt, n_steps)
        float(out[0, 1, 1])
        times.append(time.perf_counter() - t0)
    return bx * by * n_steps / float(np.median(times))


def bench_gp_refit(n_train=2048, n_dims=3, chain=50):
    """GP refit + rank-1 active-learning update latencies at N_train.

    refit = kernel build + Cholesky + NLML value/grad + prediction cache,
    all from one shared factorization (gp_refit), amortized over a chained
    on-device scan (how a jitted training loop actually runs it).
    update = rank-1 Cholesky append (gp_append), the per-acquisition cost
    of the active-learning loop.
    Returns (refit_seconds, update_seconds).

    chain=50: the tunneled TPU in this environment adds a fixed ~25-30 ms
    dispatch cost per jitted CALL (independent of the work inside); the
    deployment pattern is a fully on-device training loop, so the chain
    amortizes that per-call cost away, not the per-iteration work.
    """
    import jax
    import jax.numpy as jnp
    from gapflow_tpu.models.gp import gp_refit, gp_condition, gp_append

    key = jax.random.key(0)
    X = jax.random.uniform(key, (n_train, n_dims), dtype=jnp.float32)
    Y = jnp.sin(X[:, 0]) + 0.1 * X[:, 1]
    params = {"log_amp": jnp.asarray(0., jnp.float32),
              "log_scale": jnp.zeros(n_dims, jnp.float32)}

    def sync(out):
        return float(jax.tree_util.tree_leaves(out)[0].reshape(-1)[0])

    @jax.jit
    def refit_chain(params, X, Y):
        def body(p, _):
            val, grad, cache = gp_refit(p, X, Y, 0.01)
            p = jax.tree.map(lambda a, g: a - 1e-3 * g, p, grad)
            return p, (val, cache[1][0])
        return jax.lax.scan(body, params, None, length=chain)

    out = refit_chain(params, X, Y)
    sync(out)
    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        out = refit_chain(params, X, Y)
        sync(out)
        times.append(time.perf_counter() - t0)
    refit_s = float(np.median(times)) / chain

    # rank-1 update, amortized over a chained scan (the carry perturbs both
    # the targets and the acquisition point so no stage hoists out of the
    # loop as invariant)
    cache = gp_condition(params, X[:-1], Y[:-1], 0.01)

    @jax.jit
    def update_chain(Y):
        def body(y, i):
            x_new = X[-1] + y[:n_dims] * 1e-12
            _, (_, alpha, _) = gp_append(params, X[:-1], cache, y, x_new, 0.01)
            return y + alpha[0] * 1e-12, alpha[0]
        return jax.lax.scan(body, Y, jnp.arange(chain))

    sync(update_chain(Y))
    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        sync(update_chain(Y))
        times.append(time.perf_counter() - t0)
    update_s = float(np.median(times)) / chain

    return refit_s, update_s


def _probe_device(timeout_s=600, attempts=3):
    """Fail fast (and loudly) when the TPU runtime is unreachable.

    Backend init through a wedged tunnel hangs indefinitely; probing in
    a subprocess with a timeout turns that into a diagnostic JSON line
    and a nonzero exit instead of a silent driver stall.  A healthy but
    congested tunnel has been measured at ~110 s for first device init,
    so the timeout is generous and the probe retries: transient tunnel
    drops recover within minutes and a lost bench round costs more than
    a slow one."""
    import subprocess
    import time
    code = ("import jax, jax.numpy as jnp; "
            "x = jnp.ones((8, 8)); print(float(x.sum()))")
    err = "no probe attempts made"
    for attempt in range(attempts):
        if attempt:
            time.sleep(60)
        try:
            out = subprocess.run([sys.executable, "-c", code],
                                 timeout=timeout_s, capture_output=True)
            if out.returncode == 0:
                return None
            err = out.stderr.decode()[-400:]
        except subprocess.TimeoutExpired:
            err = f"device probe timed out after {timeout_s}s"
        print(f"# device probe attempt {attempt + 1}/{attempts} failed: "
              f"{err.splitlines()[-1] if err.splitlines() else err}",
              file=sys.stderr)
    return err


def main():
    fv_target = 1e9
    gp_target = 5e-3

    err = _probe_device()
    if err is not None:
        print(json.dumps({
            "metric": "FV cell-updates/s/chip @1024^2 (f32)",
            "value": 0.0, "unit": "cell-updates/s", "vs_baseline": 0.0,
            "error": f"TPU runtime unreachable: {err}",
        }))
        sys.exit(1)

    throughput = bench_fv_step()
    fv_2048 = bench_fv_step(nx=2048, ny=2048, n_steps=2048)
    ehl_1024 = bench_ehl_step()
    ehl_1024_ghost = bench_ehl_step(fft_grid="ghost")
    ehl_4096 = bench_ehl_step(nx=4096, ny=4096)
    gp_closed_64 = bench_gp_closed(cap=64)
    gp_closed_1024 = bench_gp_closed(cap=1024, n_steps=24)
    shard_local = bench_sharded_local()
    gp_refit_s, gp_update_s = bench_gp_refit()

    from gapflow_tpu.parallel.pallas_halo import ici_bytes_per_step
    ici = {f"{m}_2048_2x4_bytes_per_step_per_chip":
           float(ici_bytes_per_step(2048, 2048, 2, 4, m))
           for m in ("det", "gp", "ehl")}

    # correctness on the SAME backend as the throughput numbers: f32
    # Sommerfeld through the production loop + perturbed Pallas-vs-XLA
    # equality (on TPU this is the only Mosaic-compiled check; the CPU
    # suite runs the kernels in interpret mode only)
    from gapflow_tpu.validate import correctness_block
    correctness = correctness_block()

    result = {
        "metric": "FV cell-updates/s/chip @1024^2 (f32); gp_refit_ms @N=2048",
        "value": float(throughput),
        "unit": "cell-updates/s",
        "vs_baseline": float(throughput / fv_target),
        "fv_2048_cu_s": float(fv_2048),
        "ehl_1024_cu_s": float(ehl_1024),
        "ehl_1024_ghost_cu_s": float(ehl_1024_ghost),
        "ehl_4096_cu_s": float(ehl_4096),
        "gp_closed_1024_cap64_cu_s": float(gp_closed_64),
        "gp_closed_1024_cap1024_cu_s": float(gp_closed_1024),
        "sharded_local_kernel_cu_s_per_chip": float(shard_local),
        "ici": ici,
        "gp_refit_ms": float(gp_refit_s * 1e3),
        "gp_al_update_ms": float(gp_update_s * 1e3),
        "gp_vs_target": float(gp_target / gp_refit_s),
        "correctness": correctness,
    }
    print(json.dumps(result))
    if not correctness["ok"]:
        print("BENCH CORRECTNESS FAILURE", file=sys.stderr)
        sys.exit(1)


if __name__ == "__main__":
    main()
