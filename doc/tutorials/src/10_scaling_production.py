# %% [markdown]
# # 10. Production throughput and multi-chip scaling
#
# The framework keeps THREE execution tiers for every physics mode, all
# bit-compatible with the host loop of tutorial 5:
#
# | tier | deterministic | GP-closed | EHL |
# |---|---|---|---|
# | host loop (reference protocol) | `update()` | same | same |
# | fused on-device | `run_steps` (one XLA program/step) | `run_steps_gp_chunked` | `run_steps_ehl` |
# | whole-run kernels (TPU, f32) | `run_steps_fast` / `run_compiled_fast` | `run_steps_gp_fast` (elastic composes) | `run_steps_ehl` (Pallas route) |
#
# You rarely pick a tier by hand: plain `run()` auto-routes every
# silent fixed-dt problem family — deterministic, frozen-GP, active
# learning, elastic, GP × elastic — onto its strongest device path,
# with trajectories identical to the host loop
# (`tests/test_run_autoroute.py`).
#
# On TPU the whole-run tiers run fused Pallas kernels: the state
# ping-pongs in VMEM (or between two HBM buffers with 4-step temporal
# blocking above the VMEM budget) and HBM is touched twice per chunk.
# The GP-closed kernels evaluate the Matérn-3/2 surrogate means with a
# capacity-tiled MXU formulation — one augmented matmul emits the
# squared distances for ALL THREE surrogates, a short VPU block
# (sqrt/exp/fma) applies the kernel function, and a second matmul
# against a block-diagonal alpha accumulates the outputs — so padded
# training capacities of 2048+ stay production-viable.
#
# This tutorial runs on the CPU backend (the notebooks execute in CI),
# where the same APIs fall back to the fused XLA programs; the numbers
# table at the end is from the real chip.

# %%
import numpy as np
import jax

jax.config.update("jax_platforms", "cpu")

from gapflow_tpu import Problem

BASE = """
options:
    output: data/tut10
    write_freq: 100000
    silent: True
grid:
    dx: 2.e-5
    dy: 2.e-5
    Nx: 32
    Ny: 64
geometry:
    type: journal
    CR: 1.e-2
    eps: 0.7
    U: 0.1
    V: 0.05
numerics:
    CFL: 0.5
    adaptive: 0
    tol: 1e-10
    dt: 5e-11
    max_it: 4000
properties:
    shear: 0.0794
    bulk: 0.
    EOS: DH
    P0: 101325.
    rho0: 877.7007
    C1: 3.5e10
    C2: 1.23
"""

# %% [markdown]
# ## Fused stepping vs the host loop
#
# `run_steps(n)` advances n fixed-dt steps as one jitted program per
# step — identical math to `update()`, none of the per-pass Python.

# %%
p_host = Problem.from_string(BASE)
p_host._pre_run()
for _ in range(50):
    p_host.update()

p_fast = Problem.from_string(BASE)
p_fast._pre_run()
p_fast.run_steps(50)

err = np.abs(np.asarray(p_fast.q) - np.asarray(p_host.q)).max()
print("fused vs host max|dq| =", err)
assert err < 1e-10

# %% [markdown]
# ## Frozen-surrogate GP production runs
#
# With active learning off (or converged), the GP-closed stepping is a
# pure function of the cached `(hyperparameters, alpha)` re-predict
# state — `run_steps_gp_fast(n)` advances whole chunks through the
# GP loop kernels (whole-run-in-VMEM at 1024², HBM ping-pong above;
# XLA scan on this CPU backend), matching the host trajectory.

# %%
GP = BASE.replace(
    "    C2: 1.23",
    """    C2: 1.23
gp:
    press:
        fix_noise: True
        atol: 1.
        rtol: 0.1
        obs_stddev: 100.
        max_steps: 2
        active_learning: False
db:
    init_size: 4
    init_method: sobol
    init_width: 1.e-4
    dtool_path: data/tut10_db
""")

import contextlib, io, shutil
shutil.rmtree("data/tut10_db", ignore_errors=True)
shutil.rmtree("data/tut10_db2", ignore_errors=True)
with contextlib.redirect_stdout(io.StringIO()):
    g_host = Problem.from_string(GP)
    g_host._pre_run()
    g_fast = Problem.from_string(GP.replace("tut10_db", "tut10_db2"))
    g_fast._pre_run()

for _ in range(10):
    g_host.update()
g_fast.run_steps_gp_fast(10)

err = np.abs(np.asarray(g_fast.q) - np.asarray(g_host.q)).max()
rel = err / np.abs(np.asarray(g_host.q)).max()
print("gp_fast vs host max|dq| =", err, " rel =", rel)
# the padded device buffers and the host's dense conditioning factorize
# the same (ill-conditioned) kernel system along different routes; both
# alphas solve it to machine precision, differing by eps * cond(K)
assert rel < 1e-6

# %% [markdown]
# ## Spatial decomposition over a device mesh
#
# The scale axis of this framework is the grid: the `(3, Nx, Ny)` state
# shards over a 2D `jax.sharding.Mesh` with `ppermute` halo exchanges
# riding the ICI on TPU pods.  The same code runs here on 8 *virtual*
# CPU devices.  On TPU, covered f32 configurations route each shard's
# stepping through the fused Pallas kernels (periodic wrap kernel with
# 4-step temporal blocking, shard bc kernel for D/N domains).
#
# `run_steps_sharded` is the single multi-chip entry for EVERY family:
# frozen-GP problems keep the training set replicated and shard the
# test points; EHL runs the sharded fluid with a replicated-FFT
# deformation; GP × elastic composes both; and active-learning
# problems shard the compiled advance between unchanged host
# acquisitions (`parallel/al.py` — the variance trigger is a `pmax`
# over halo-padded blocks).  Equality with the serial paths is pinned
# by `tests/test_sharded_driver.py`.

# %%
from gapflow_tpu.parallel import grid_mesh

n_dev = len(jax.devices())
shape = (2, 4) if n_dev >= 8 else (1, 1)
mesh = grid_mesh(jax.devices()[:shape[0] * shape[1]], shape=shape)

p_shard = Problem.from_string(BASE)
p_shard._pre_run()
p_shard.run_steps_sharded(50, mesh=mesh)

err = np.abs(np.asarray(p_shard.q) - np.asarray(p_host.q)).max()
print(f"sharded {shape} vs host max|dq| =", err)
assert err < 1e-9

# %% [markdown]
# ## ICI budget
#
# The halo exchanges are tiny against the compute.  Analytic traffic
# per chip per step (f32), 2048² grid on a 2×4 mesh:

# %%
from gapflow_tpu.parallel.pallas_halo import ici_bytes_per_step

for mode in ("det", "gp", "ehl"):
    b = ici_bytes_per_step(2048, 2048, 2, 4, mode)
    print(f"{mode:>4}: {b / 1024:8.1f} kB/chip/step")

# %% [markdown]
# The det path exchanges an 8-deep halo once per 4 steps (the
# temporal-blocked kernel consumes 2 halo cells per step); the GP path
# exchanges 2-deep every step — still noise, since a GP-closed step
# carries 10–60× the det step's compute; the EHL path adds the
# replicated-FFT pressure all-gather every `deform_every` steps.
#
# ## Measured single-chip numbers (TPU v5e, f32)
#
# From `bench.py` (driver-verified each round; see `doc/status.md` for
# the full table and the GP speed-of-light analysis): deterministic
# 1024² ≈ 15e9 cell-updates/s (whole-run-in-VMEM), 2048²–4096² ≈ 11e9
# (HBM ping-pong, 4-step temporal blocking), per-step-deformation EHL
# 2.3e9 @1024² / 1.8e9 @4096², GP × EHL 2.4e8, GP-closed 3.2e8 @cap64
# (2.7e8 on D/N domains) and 2.3e7 @cap1024 — 53%/63% of the VPU
# transcendental bound for exact Matérn evaluation, which the split-K
# bf16 distance matmul and in-VMEM closures approach — GP refit at
# N=2048 ≈ 2.6 ms, AL rank-1 update ≈ 0.6 ms.
