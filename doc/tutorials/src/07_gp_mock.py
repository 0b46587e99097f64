# %% [markdown]
# # 7. Gaussian process regression and active learning
#
# When no analytic constitutive law is trusted, the framework learns
# the closures — pressure $p(\bar\rho, h)$ and wall shear stress — as
# Gaussian-process surrogates over MD data, acquiring new training
# points *where the surrogate is least certain* while the continuum
# simulation runs.  This tutorial builds the machinery bottom-up with
# the **mock oracle** (the analytic closures plus Gaussian noise — the
# test double of a real MD engine).  (Reference analogue:
# `doc/tutorials/07_gp_mock.ipynb`.)
#
# ## The GP engine
#
# `gapflow_tpu.models.gp` is a self-contained Matérn-3/2 engine built
# for the TPU: the Gram matrix and predictions are MXU matmuls, the
# marginal-likelihood gradient is analytic (trace identities, no
# autodiff through the Cholesky), and the prediction cache stores the
# explicit inverse Cholesky factor so rank-1 active-learning appends
# are matmuls only.  Fit a noisy 1D function:

# %%
import numpy as np
import matplotlib.pyplot as plt
import jax.numpy as jnp
from gapflow_tpu.models import gp

rng = np.random.default_rng(3)
Xtr = jnp.asarray(np.sort(rng.uniform(0, 1, (12, 1)), axis=0))
Ytr = jnp.sin(6 * Xtr[:, 0]) + 0.05 * rng.normal(size=12)

params = {"log_amp": jnp.asarray(0.), "log_scale": jnp.zeros(1)}
params, nlml_final = gp.fit_hyperparameters(params, Xtr, Ytr, yerr=0.05)
cache = gp.gp_condition(params, Xtr, Ytr, 0.05)

Xte = jnp.linspace(0, 1, 200)[:, None]
mean, var = gp.gp_predict_mean_var(params, Xtr, cache, Xte)

fig, ax = plt.subplots(figsize=(6, 3.2))
ax.plot(Xte[:, 0], np.sin(6 * np.asarray(Xte[:, 0])), "k:", label="truth")
ax.plot(Xte[:, 0], np.asarray(mean), label="GP mean")
sd = np.sqrt(np.asarray(var))
ax.fill_between(np.asarray(Xte[:, 0]), mean - 2 * sd, mean + 2 * sd,
                alpha=0.25, label=r"$\pm 2\sigma$")
ax.plot(Xtr[:, 0], Ytr, "o", ms=4, label="training data")
ax.legend(); fig.tight_layout()
print("fitted lengthscale:", float(jnp.exp(params["log_scale"][0])))

# %% [markdown]
# The uncertainty band is the whole point: it tells the active learner
# *where* the next (expensive) micro-simulation is worth running.
#
# ## Surrogates in the loop
#
# Adding ``gp:`` and ``db:`` sections to the journal input replaces the
# EOS and wall-stress closures with GP surrogates.  With no ``md:``
# section the training data comes from the mock oracle.  Per GP the
# tolerance is $\max(\mathrm{atol}\cdot Y_{err} \cdot Y_{scale},\,
# \mathrm{rtol}\cdot Y_{scale})^2$; while the maximum predictive
# variance over the grid exceeds it, the learner acquires the
# argmax-variance cell, runs the oracle there, renormalizes the
# database, and refits — up to ``max_steps`` times per timestep, then
# pauses for ``pause_steps``.

# %%
from gapflow_tpu import Problem

sim = """
options:
    output: data/tutorial07
    write_freq: 100
    use_tstamp: False
    silent: True
grid:
    dx: 1.e-5
    dy: 1.
    Nx: 100
    Ny: 1
    xE: ['D', 'N', 'N']
    xW: ['D', 'N', 'N']
    xE_D: 877.7007
    xW_D: 877.7007
geometry:
    type: journal
    CR: 1.e-2
    eps: 0.7
    U: 0.1
    V: 0.
numerics:
    CFL: 0.25
    adaptive: 1
    tol: 1e-9
    dt: 1e-10
    max_it: 150
properties:
    shear: 0.0794
    bulk: 0.
    EOS: DH
    P0: 101325
    rho0: 877.7007
    C1: 3.5e10
    C2: 1.23
gp:
    press:
        fix_noise: True
        atol: 1.
        rtol: 0.1
        obs_stddev: 100.
        max_steps: 5
    shear:
        fix_noise: True
        atol: 1.
        rtol: 0.1
        obs_stddev: 1.
        max_steps: 5
db:
    init_size: 5
    init_method: lhc
    init_width: 1.e-6
"""
problem = Problem.from_string(sim)
problem.run()

# %% [markdown]
# Watch what the learner did:

# %%
zz = problem.pressure          # the pressure GP ('zz' normal stress)
hist = zz.history
fig, ax = plt.subplots(1, 2, figsize=(10, 3.2))
ax[0].step(hist["step"], hist["database_size"], where="post")
ax[0].set_xlabel("timestep"); ax[0].set_ylabel("training-set size")
ax[1].semilogy(hist["step"], hist["maximum_variance"], label="max variance")
ax[1].semilogy(hist["step"], hist["variance_tol"], "--", label="tolerance")
ax[1].set_xlabel("timestep"); ax[1].legend()
fig.tight_layout()
print("final database size:", zz.database.size)

# %% [markdown]
# Acquisitions cluster in the first steps (the initial Latin-hypercube
# samples cover only a width of ``init_width`` around the initial
# state) and stop once the surrogate is certain everywhere the
# simulation goes.  The solution carries its uncertainty: ``sol.nc``
# stores a ``*_var`` field next to every GP-closed quantity, and the
# live field is:

# %%
x = np.asarray(problem.topo.x)[1:-1, 1]
p = np.asarray(problem.pressure.pressure)[1:-1, 1]
sd = np.sqrt(np.asarray(problem.pressure.variance)[1:-1, 1])
fig, ax = plt.subplots(figsize=(6, 3.2))
ax.plot(x * 1e3, p / 1e3)
ax.fill_between(x * 1e3, (p - 2 * sd) / 1e3, (p + 2 * sd) / 1e3, alpha=0.3)
ax.set_xlabel("x (mm)"); ax.set_ylabel(r"p $\pm 2\sigma$ (kPa)")
fig.tight_layout()

# %% [markdown]
# ## TPU execution of the learning loop
#
# Three execution modes, identical protocol:
#
# 1. **Host loop** (`problem.run()`, used above): reference protocol —
#    per-acquisition renormalization, scipy-BFGS refits.  When no
#    retraining is pending, each GP-closed timestep still runs as one
#    fused XLA program.
# 2. **Chunked device–host** (`problem.run_steps_gp_chunked(n)`):
#    advances compiled GP-surrogate chunks on-device and exits to the
#    host only when a variance check trips; the host then runs the
#    exact reference acquisition protocol and re-enters.  Matches the
#    host path acquisition-for-acquisition (`tests/test_al_chunked.py`)
#    and needs no host-callback support — this is the production mode
#    on TPU.
# (A third, *experimental* mode — `run_steps_gp_device`, the whole loop
# including acquisition inside one XLA program — lives in
# `gapflow_tpu/core/al_loop.py`; it deviates from the reference protocol
# and is not part of the supported API.)
#
# Tutorial 8 swaps the mock oracle for real molecular dynamics.
