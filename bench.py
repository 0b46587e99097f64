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
import signal
import sys
import tempfile
import threading
import time

os.environ.setdefault("GAPFLOW_X64", "0")
# Persistent compilation cache, as in production deployments (and the
# test suite): repeat bench runs skip recompiling the big jitted
# programs.  Measured loops warm up explicitly either way; the one
# stage whose wall-clock includes compiles (gp_al_e2e) reports the
# same warm-cache behavior a user's second run sees.
os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR",
    os.path.join(tempfile.gettempdir(), "gapflow-jax-cache"))
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

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


def bench_gp_closed(nx=1024, ny=1024, cap=64, n_steps=200, fast=False):
    """GP-closed production throughput: whole-run-in-VMEM GP loop kernel
    with three surrogates at padded capacity ``cap`` (synthetic
    well-conditioned state; the padded buffers are FULL, so every train
    point is computed — no tile skipping).  ``fast=True`` measures the
    opt-in bf16-accumulation predict mode (numerics: gp_fast_pred)."""
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
    gp_fast_pred: {int(fast)}
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


def bench_gp_closed_dn(nx=1024, ny=1024, cap=64, n_steps=60):
    """GP-closed throughput on a D/N-edge domain (the reference's slider
    configurations), through the production route of run_steps_gp_fast:
    the q-only bc GP kernel (ops.stencil_gp.make_pallas_gp_step_bc_fn)
    scanned per step, with the XLA GP step as fallback on uncovered
    configs.  Reported next to the periodic kernel number so the
    boundary family's gap is driver-visible.
    """
    import jax
    import jax.numpy as jnp
    from gapflow_tpu import Problem
    from gapflow_tpu.core.step import apply_bcs
    from gapflow_tpu.core.gp_step import make_gp_step_core
    from gapflow_tpu.ops.stencil_gp import (gp_bc_kernel_supported,
                                            make_pallas_gp_step_bc_fn)
    from gapflow_tpu.validate import synthetic_gp_state

    sim = f"""
options:
    output: data/bench_gp_dn
    write_freq: 100000
    silent: True
grid:
    dx: 2.e-5
    dy: 2.e-5
    Nx: {nx}
    Ny: {ny}
    xE: ['D', 'N', 'N']
    xW: ['D', 'N', 'N']
    xE_D: 877.7007
    xW_D: 877.7007
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
    rng = np.random.default_rng(0)
    gp_state = synthetic_gp_state(dims, use, cap, rng)

    q0 = apply_bcs(jnp.asarray(np.asarray(problem.q), jnp.float32), cfg)
    topo = jnp.asarray(problem.topo.full, jnp.float32)
    extra = jnp.asarray(problem.fc.get_real_field("extra").p, jnp.float32)
    dt = jnp.float32(problem.dt)

    if (jax.default_backend() != "cpu"
            and gp_bc_kernel_supported(cfg, ny, dims, use)):
        kstep = make_pallas_gp_step_bc_fn(cfg, dims, 7, use, nx, ny,
                                          (cap, cap, cap))

        def body(i, qq):
            return kstep(qq, topo, extra, dt, gp_state)
    else:
        step_core = make_gp_step_core(cfg, dims, 7, use)

        def body(i, qq):
            qn, _ = step_core(qq, topo, extra, dt, i, gp_state)
            return qn

    @jax.jit
    def run(q, gp_state):
        return jax.lax.fori_loop(0, n_steps, body, q)

    out = run(q0, gp_state)
    float(out[0, 1, 1])
    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        out = run(out, gp_state)
        float(out[0, 1, 1])
        times.append(time.perf_counter() - t0)
    return nx * ny * n_steps / float(np.median(times))


def bench_gp_ehl(nx=1024, ny=1024, cap=64):
    """Fused GP x elastic production throughput (the elastic route of
    run_steps_gp_fast, reference protocol deform_every=1): per step the
    fused GP kernel closes the fluid step and the FFT half-space deforms
    the surface from the pass-2 pressure (core.ehl.make_gp_ehl_loop).
    Three synthetic frozen surrogates at padded capacity ``cap``."""
    import jax.numpy as jnp
    from gapflow_tpu import Problem
    from gapflow_tpu.core.step import apply_bcs
    from gapflow_tpu.core.ehl import make_gp_ehl_loop
    from gapflow_tpu.validate import synthetic_gp_state

    sim = f"""
options:
    output: data/bench_gp_ehl
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
    elastic:
        E: 5e09
        v: 0.3
        alpha_underrelax: 1e-04
"""
    problem = Problem.from_string(sim)
    problem._pre_run()
    cfg = problem._solver_cfg
    dims = ((0, 3), (0, 1, 3), (0, 2, 3))
    use = (True, True, True)
    rng = np.random.default_rng(0)
    gp_state = synthetic_gp_state(dims, use, cap, rng)

    loop = make_gp_ehl_loop(problem, dims, 7, use, dtype=jnp.float32)
    q0 = apply_bcs(jnp.asarray(np.asarray(problem.q), jnp.float32), cfg)
    topo0 = jnp.asarray(problem.topo.full, jnp.float32)
    u0 = jnp.zeros(np.asarray(problem.topo.deformation).shape, jnp.float32)
    dt = jnp.float32(problem.dt)
    step0 = jnp.asarray(0, jnp.int32)

    def run(n):
        q, u = loop(q0, u0, topo0, dt, step0, n, gp_state)
        float(jnp.sum(u))
        times = []
        for _ in range(3):
            t0 = time.perf_counter()
            q, u = loop(q0, u0, topo0, dt, step0, n, gp_state)
            float(jnp.sum(u))
            times.append(time.perf_counter() - t0)
        return min(times)

    per_step = (run(120) - run(20)) / 100
    return nx * ny / per_step


def bench_gp_al_e2e(nx=1024, ny=1024, n_steps=200):
    """User-visible multiscale number: chunked active-learning wall-clock.

    Runs ``run_steps_gp_chunked`` with the mock MD oracle at nx*ny from a
    cold (freshly sampled) database and times the WHOLE call — compiled
    stepping plus every host acquisition round-trip, MD oracle run, BFGS
    refit and buffer refresh.  This is the reference's only hot loop
    (GaPFlow/models/gp.py:435-506) measured end to end, compile included
    (a user's first run pays it too).  Returns (cell-updates/s, n_acq).
    """
    import shutil
    from gapflow_tpu import Problem

    out = "data/bench_gp_al"
    shutil.rmtree(out, ignore_errors=True)
    sim = f"""
options:
    output: {out}/run
    write_freq: 1000000
    use_tstamp: False
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
gp:
    press:
        fix_noise: True
        atol: 1.e-2
        rtol: 0.
        obs_stddev: 1.e-3
        max_steps: 2
        active_learning: True
    shear:
        fix_noise: True
        atol: 1.e-2
        rtol: 0.
        obs_stddev: 1.e-4
        max_steps: 2
        active_learning: True
db:
    init_size: 4
    init_method: lhc
    dtool_path: {out}/train
"""
    problem = Problem.from_string(sim)
    problem._pre_run()

    t0 = time.perf_counter()
    n_acq = problem.run_steps_gp_chunked(n_steps)
    wall = time.perf_counter() - t0

    # warm asymptote: a second window on the now-trained surrogate pays
    # no compile and (typically) no acquisition — the per-step rate a
    # long production run converges to
    t0 = time.perf_counter()
    n_acq2 = problem.run_steps_gp_chunked(n_steps)
    warm_wall = time.perf_counter() - t0
    return (nx * ny * n_steps / wall, int(n_acq),
            nx * ny * n_steps / warm_wall, int(n_acq2))


def bench_gp_sol(nx=1024, ny=1024):
    """Transcendental speed-of-light for the GP-closed step.

    The Matern-3/2 mean is irreducibly one (sqrt, exp, fma, fma) VPU
    block per (cell, train point) pair; a GP-closed MacCormack step
    evaluates cap x n_surrogates x 2 passes of them per cell.  This
    measures the chip's throughput of exactly that block (chained so
    nothing hoists) and converts it into the cell-updates/s bound for
    the bench's cap-64 and cap-1024 configurations (3 surrogates).
    Distances (d FMAs/pair on the VPU in the unrolled path) are NOT
    counted, so the bound is optimistic — see doc/status.md.
    Returns (block_evals_per_s, sol_cap64_cu_s, sol_cap1024_cu_s).
    """
    import jax
    import jax.numpy as jnp

    x = jnp.linspace(-3., 0., 8 * 1024 * 1024).reshape(8, 1024, 1024)

    @jax.jit
    def chain(x, k):
        def body(i, a):
            r = jnp.sqrt(a * a + 1e-6)
            return (1. + r) * jnp.exp(-r) * 0.5 + a * 1e-7
        return jax.lax.fori_loop(0, k, body, x)

    def timed(k):
        t0 = time.perf_counter()
        float(chain(x, k)[0, 0, 0])
        return time.perf_counter() - t0

    # long chains: the ~25 ms tunneled-dispatch noise must be small
    # against the measured difference (short chains bounce 2x run-to-run)
    timed(200)
    timed(2200)                     # compile both lengths
    t_long = min(timed(2200) for _ in range(3))
    t_short = min(timed(200) for _ in range(3))
    per_pass = (t_long - t_short) / 2000
    rate = x.size / per_pass

    def sol(cap):
        evals = nx * ny * cap * 3 * 2
        return nx * ny / (evals / rate)

    return rate, sol(64), sol(1024)


# ---------------------------------------------------------------------------
# Harness.
#
# The driver runs `timeout N python bench.py` and parses the LAST JSON
# line out of a BOUNDED tail of the MERGED stdout+stderr stream (rounds 3
# and 4 were lost to this: protocol banners / retry diagnostics printed
# after the final JSON line pushed it out of the tail, and the total
# wall-clock blew the window — rc=124, parsed=null).  Hence four rules:
#
#  1. JSON-only output: at startup fd 1 and fd 2 are both redirected to
#     data/bench_log.txt (fd-level, so C/XLA writes are caught too); the
#     ONLY bytes the driver ever sees are cumulative-JSON lines written
#     to a dup of the original stdout after every stage.
#  2. One backend init: no probe subprocess.  A watchdog thread turns a
#     wedged TPU-tunnel init into an error JSON + exit instead of a
#     silent stall (round 3's init exceeded 600 s in the driver run).
#  3. Global deadline (env BENCH_BUDGET_S, default 540 s): stages are
#     launched only while their known-or-estimated cost fits in the
#     remaining budget; the rest are recorded in "skipped".  Measured
#     stage durations persist in data/bench_costs.json, so a driver run
#     after a local warm-up run skips nothing it cannot afford.
#  4. SIGTERM/SIGINT flush: if the driver's window expires anyway, the
#     handler prints the cumulative JSON one last time and exits 0.
# ---------------------------------------------------------------------------

_COSTS_PATH = os.path.join("data", "bench_costs.json")

# conservative cold-cache cost estimates [s]; overwritten by measured
# durations from the previous run.  NOTE the axon tunnel backend cannot
# serialize executables (jax persistent compilation cache is a no-op for
# TPU programs here — verified), so every fresh process re-pays all
# compiles: these are genuine cold costs, measured on hardware.
_EST = {
    "init": 120, "fv_1024": 35, "ici": 2, "gp_refit": 240, "gp_sol": 6,
    "gp_closed_cap64": 35, "gp_closed_cap64_fast": 20,
    "correctness": 120, "gp_closed_cap1024": 60,
    "gp_closed_cap1024_fast": 60,
    "ehl_1024": 60, "gp_ehl_1024": 40, "gp_closed_dn": 60,
    "ehl_4096": 120, "sharded_local": 60, "gp_al_e2e": 400,
    "fv_2048": 45, "ehl_1024_ghost": 60,
}


def _sig6(x):
    """Round floats to 6 significant digits, recursively.

    The driver keeps only a BOUNDED (~2000 char) tail of the stream and
    parses its LAST JSON line — every byte of the final line counts.
    """
    if isinstance(x, float):
        return float(f"{x:.6g}")
    if isinstance(x, dict):
        return {k: _sig6(v) for k, v in x.items()}
    if isinstance(x, list):
        return [_sig6(v) for v in x]
    return x


# the essential subset (headline contract + every VERDICT-required
# metric), guaranteed to fit the driver's tail window even when the full
# cumulative line outgrows it (rule 5)
_COMPACT_KEYS = (
    "metric", "value", "unit", "vs_baseline", "elapsed_s", "backend",
    "gp_refit_ms", "gp_al_update_ms",
    "gp_sol_1024_cap64_cu_s", "gp_sol_1024_cap1024_cu_s",
    "gp_closed_1024_cap64_cu_s", "gp_closed_1024_cap64_fast_cu_s",
    "gp_closed_1024_cap1024_cu_s", "gp_closed_1024_cap1024_fast_cu_s",
    "gp_closed_dn_1024_cap64_cu_s",
    "ehl_1024_cu_s", "ehl_4096_cu_s", "gp_ehl_1024_cu_s",
    "sharded_local_kernel_cu_s_per_chip", "ici",
    "gp_al_e2e_256_warm_cu_s",
    "killed_by_signal", "deadline_overrun", "stage_running",
)


def compact_line(result, errors=(), skipped=()):
    """One JSON line with the required metric subset, < ~1500 bytes."""
    compact = {k: result[k] for k in _COMPACT_KEYS if k in result}
    if "correctness" in result:
        c = result["correctness"]
        compact["correctness"] = {
            "ok": c.get("ok"), "n_checks": len(c.get("check_s", {})),
            "skipped": len(c.get("skipped", []))}
    if errors:
        compact["n_errors"] = len(errors)
    if skipped:
        compact["n_skipped_stages"] = len(skipped)
    return json.dumps(_sig6(compact), separators=(",", ":"))


def main():
    fv_target = 1e9
    gp_target = 5e-3
    budget = float(os.environ.get("BENCH_BUDGET_S", "1500"))
    t_start = time.monotonic()

    # --- rule 1: JSON-only driver stream -------------------------------
    os.makedirs("data", exist_ok=True)
    real_out = os.fdopen(os.dup(1), "w", buffering=1)
    log_f = open(os.path.join("data", "bench_log.txt"), "w", buffering=1)
    os.dup2(log_f.fileno(), 1)
    os.dup2(log_f.fileno(), 2)

    result = {
        "metric": "FV cell-updates/s/chip @1024^2 (f32); gp_refit_ms @N=2048",
        "value": 0.0,
        "unit": "cell-updates/s",
        "vs_baseline": 0.0,
    }
    errors = {}
    skipped = []
    stage_s = {}
    state = {"running": None, "done": False}

    def emit():
        if state["running"] is not None:
            result["stage_running"] = state["running"]
        else:
            result.pop("stage_running", None)
        result["elapsed_s"] = round(time.monotonic() - t_start, 1)
        try:
            full = json.dumps(_sig6(result), separators=(",", ":"))
            cline = compact_line(result, errors, skipped)
            # full line first, compact line LAST: the driver's bounded
            # tail always ends with a complete, parseable JSON line
            real_out.write(full + "\n")
            if cline != full:
                real_out.write(cline + "\n")
            real_out.flush()
        except Exception:
            pass

    # --- rule 4: flush on the driver's kill signal ---------------------
    def _flush_and_exit(signum, frame):
        result["killed_by_signal"] = int(signum)
        emit()
        os._exit(0)

    for sig in (signal.SIGTERM, signal.SIGINT):
        signal.signal(sig, _flush_and_exit)

    # --- rule 3: deadline watchdog -------------------------------------
    deadline = t_start + budget

    def _watchdog():
        while not state["done"]:
            time.sleep(2)
            if time.monotonic() > deadline + 15:
                # a stage overran its estimate past the global budget —
                # flush what we have before the driver's timeout hits
                result["deadline_overrun"] = True
                emit()
                os._exit(0)

    threading.Thread(target=_watchdog, daemon=True).start()

    # measured costs from a previous run beat the static estimates
    try:
        with open(_COSTS_PATH) as fh:
            _EST.update({k: 1.3 * v for k, v in json.load(fh).items()})
    except Exception:
        pass

    def remaining():
        return deadline - time.monotonic()

    # --- rule 2: single backend init, watchdog-guarded -----------------
    # emit BEFORE init: a wedged tunnel init blocks the main thread in C
    # (deferred signal handlers never run) and only the watchdog thread
    # can exit — this line guarantees the driver tail parses even then
    state["running"] = "init"
    emit()
    t0 = time.monotonic()
    import jax
    import jax.numpy as jnp
    float(jnp.ones((8, 8)).sum())
    stage_s["init"] = round(time.monotonic() - t0, 1)
    result["backend"] = jax.default_backend()
    state["running"] = None

    # measured init on this tunnel varies 29..477 s run-to-run; a slow
    # init must not starve the stages when the driver window is large.
    # Extending past the window is safe: `timeout`'s SIGTERM lands in
    # Python-land now, and the handler flushes cumulative JSON + exit 0.
    stage_budget = float(os.environ.get("BENCH_STAGE_BUDGET_S", "1300"))
    deadline = max(deadline, time.monotonic() + stage_budget)
    emit()

    def stage(name, fn, self_capped=False):
        # self-capped stages bound their own wall-clock from remaining()
        # (the correctness blocks) — launch them whenever any useful
        # slice of budget is left instead of est-skipping on a recorded
        # duration that a previous, larger window produced
        est = 40 if self_capped else _EST.get(name, 90)
        if remaining() < est:
            skipped.append(name)
            result["skipped"] = skipped
            print(f"# stage {name} SKIPPED (est {est:.0f}s > "
                  f"{remaining():.0f}s left)", file=sys.stderr)
            emit()
            return
        state["running"] = name
        t0 = time.monotonic()
        try:
            fn()
        except Exception as e:  # noqa: BLE001 — isolate stage failures
            errors[name] = f"{type(e).__name__}: {e}"[:300]
            result["errors"] = errors
        dur = time.monotonic() - t0
        stage_s[name] = round(dur, 1)
        result["stage_s"] = stage_s
        state["running"] = None
        print(f"# stage {name} done in {dur:.1f}s", file=sys.stderr)
        # persist measured costs incrementally: a deadline-cut run still
        # leaves the next run accurate estimates
        try:
            try:
                with open(_COSTS_PATH) as fh:
                    costs = json.load(fh)
            except Exception:
                costs = {}
            costs.update(stage_s)
            with open(_COSTS_PATH, "w") as fh:
                json.dump(costs, fh)
        except Exception:
            pass
        emit()

    def _fv1024():
        v = float(bench_fv_step())
        result["value"] = v
        result["vs_baseline"] = v / fv_target

    def _gp64():
        result["gp_closed_1024_cap64_cu_s"] = float(bench_gp_closed(cap=64))

    def _gp1024():
        result["gp_closed_1024_cap1024_cu_s"] = float(
            bench_gp_closed(cap=1024, n_steps=24))

    def _gp64_fast():
        result["gp_closed_1024_cap64_fast_cu_s"] = float(
            bench_gp_closed(cap=64, fast=True))

    def _gp1024_fast():
        result["gp_closed_1024_cap1024_fast_cu_s"] = float(
            bench_gp_closed(cap=1024, n_steps=24, fast=True))

    def _gp_dn():
        result["gp_closed_dn_1024_cap64_cu_s"] = float(
            bench_gp_closed_dn())

    def _ehl4096():
        result["ehl_4096_cu_s"] = float(bench_ehl_step(nx=4096, ny=4096))

    def _shard():
        result["sharded_local_kernel_cu_s_per_chip"] = float(
            bench_sharded_local())

    def _gp_ehl():
        result["gp_ehl_1024_cu_s"] = float(bench_gp_ehl())

    def _ehl1024():
        result["ehl_1024_cu_s"] = float(bench_ehl_step())

    def _ehl1024g():
        result["ehl_1024_ghost_cu_s"] = float(bench_ehl_step(
            fft_grid="ghost"))

    def _fv2048():
        result["fv_2048_cu_s"] = float(bench_fv_step(nx=2048, ny=2048,
                                                     n_steps=2048))

    def _refit():
        refit_s, update_s = bench_gp_refit()
        result["gp_refit_ms"] = float(refit_s * 1e3)
        result["gp_al_update_ms"] = float(update_s * 1e3)
        result["gp_vs_target"] = float(gp_target / refit_s)

    def _al_e2e():
        # bounded: 256^2 x 50 steps (round 4's unbounded 1024^2 x 200
        # cold-start run alone exceeded the driver window); the warm
        # number is the long-run asymptote, separated from compile cost
        cold, n_acq, warm, n_acq2 = bench_gp_al_e2e(nx=256, ny=256,
                                                    n_steps=50)
        result["gp_al_e2e_256_cold_cu_s"] = float(cold)
        result["gp_al_e2e_256_warm_cu_s"] = float(warm)
        result["gp_al_e2e_n_acq"] = n_acq + n_acq2

    def _ici():
        from gapflow_tpu.parallel.pallas_halo import ici_bytes_per_step
        result["ici"] = {
            f"{m}_2048_2x4_bytes_per_step_per_chip":
            float(ici_bytes_per_step(2048, 2048, 2, 4, m))
            for m in ("det", "gp", "ehl")}

    def _gp_sol():
        rate, sol64, sol1024 = bench_gp_sol()
        result["gp_matern_block_evals_per_s"] = float(rate)
        result["gp_sol_1024_cap64_cu_s"] = float(sol64)
        result["gp_sol_1024_cap1024_cu_s"] = float(sol1024)
        if result.get("gp_closed_1024_cap64_cu_s"):
            result["gp_closed_cap64_sol_fraction"] = float(
                result["gp_closed_1024_cap64_cu_s"] / sol64)
        if result.get("gp_closed_1024_cap1024_cu_s"):
            result["gp_closed_cap1024_sol_fraction"] = float(
                result["gp_closed_1024_cap1024_cu_s"] / sol1024)

    def _run_checks(names, block_s):
        # correctness on the SAME backend as the throughput numbers: f32
        # Sommerfeld through the production loop + perturbed Pallas-vs-XLA
        # equality (on TPU this is the only Mosaic-compiled check; the CPU
        # suite runs the kernels in interpret mode only).  Each block is
        # internally deadline-capped — it skips pending sub-checks at its
        # own deadline instead of blowing the global one (round 4's
        # failure mode) — and repeated calls MERGE (ok ANDs, no check
        # runs twice).
        from gapflow_tpu.validate import correctness_block
        result.setdefault("correctness", {})
        try:
            with open(_COSTS_PATH) as fh:
                est = {k[5:]: 1.2 * v for k, v in json.load(fh).items()
                       if k.startswith("corr_")}
        except Exception:
            est = {}
        # conservative first-run estimates for the compile-heavy checks
        # (cold measured: gp_kernel 254 s, al_chunked 166-358 s)
        est.setdefault("gp_kernel", 260)
        est.setdefault("al_chunked", 250)
        correctness_block(
            deadline=time.monotonic() + block_s,
            out=result["correctness"], est=est, names=names)
        try:
            with open(_COSTS_PATH) as fh:
                costs = json.load(fh)
        except Exception:
            costs = {}
        costs.update({f"corr_{k}": v for k, v in
                      result["correctness"].get("check_s", {}).items()})
        try:
            with open(_COSTS_PATH, "w") as fh:
                json.dump(costs, fh)
        except Exception:
            pass

    def _correct_core():
        # the cheap trio (~62 s cold): guarantees a correctness.ok
        # verdict early, before any tight driver window closes
        from gapflow_tpu.validate import CORE_CHECKS
        _run_checks(CORE_CHECKS, min(150., max(45., 0.3 * remaining())))

    def _correct():
        # the four deep checks measure ~254+250+30+200 s cold — the cap
        # only binds when the budget is genuinely large enough for them
        _run_checks(None, min(800., max(60., 0.4 * remaining())))

    # priority order: headline + the verdict-required metric set first,
    # nice-to-have stages last (they are the ones a tight window skips).
    # The correctness verdict is split: the cheap core trio (~62 s cold)
    # runs EARLY so correctness.ok exists under any window; the
    # compile-heavy deep checks run after every required throughput
    # metric.  The axon backend re-pays every kernel compile each run,
    # so ordering IS the budget allocation.
    stage("fv_1024", _fv1024)
    stage("ici", _ici)
    stage("gp_refit", _refit)
    stage("gp_sol", _gp_sol)
    stage("gp_closed_cap64", _gp64)
    stage("gp_closed_cap64_fast", _gp64_fast)
    stage("correct_core", _correct_core, self_capped=True)
    stage("ehl_1024", _ehl1024)
    stage("gp_ehl_1024", _gp_ehl)
    stage("sharded_local", _shard)
    stage("gp_closed_dn", _gp_dn)
    stage("gp_closed_cap1024", _gp1024)
    stage("gp_closed_cap1024_fast", _gp1024_fast)
    stage("ehl_4096", _ehl4096)
    stage("correctness", _correct, self_capped=True)
    stage("fv_2048", _fv2048)
    stage("ehl_1024_ghost", _ehl1024g)
    stage("gp_al_e2e", _al_e2e)

    # recompute SoL fractions in case gp_sol ran before gp_closed stages
    if result.get("gp_sol_1024_cap64_cu_s") and \
            result.get("gp_closed_1024_cap64_cu_s"):
        result["gp_closed_cap64_sol_fraction"] = float(
            result["gp_closed_1024_cap64_cu_s"]
            / result["gp_sol_1024_cap64_cu_s"])
    if result.get("gp_sol_1024_cap1024_cu_s") and \
            result.get("gp_closed_1024_cap1024_cu_s"):
        result["gp_closed_cap1024_sol_fraction"] = float(
            result["gp_closed_1024_cap1024_cu_s"]
            / result["gp_sol_1024_cap1024_cu_s"])
    for cap in ("cap64", "cap1024"):
        fast = result.get(f"gp_closed_1024_{cap}_fast_cu_s")
        sol = result.get(f"gp_sol_1024_{cap}_cu_s")
        if fast and sol:
            result[f"gp_closed_{cap}_fast_sol_fraction"] = float(fast / sol)

    state["done"] = True
    try:
        with open(_COSTS_PATH, "w") as fh:
            json.dump(stage_s, fh)
    except Exception:
        pass

    emit()
    ok = result.get("correctness", {}).get("ok", False)
    if not ok or errors:
        print("BENCH INCOMPLETE OR CORRECTNESS FAILURE:"
              f" errors={errors} correctness_ok={ok}", file=sys.stderr)
        sys.exit(1)


if __name__ == "__main__":
    main()
