# %% [markdown]
# # 4. Dynamics of highly confined fluids
#
# A fluid confined between two parallel walls (no relative motion)
# relaxes perturbations through two channels: in-plane viscous
# diffusion, and friction against the walls.  Linearizing the
# gap-averaged equations of tutorial 1 around a quiescent state gives
# exponentially decaying modes whose rates we can write down — a sharp
# analytic test of the whole solver, and a window into what makes
# nanometre-gap dynamics special.  (Reference analogue:
# `doc/tutorials/04_confined_fluids.ipynb`, after Holey et al.)
#
# ## Linearized relaxation
#
# For a sinusoidal perturbation with wave number $k$ on a flat gap of
# height $h$:
#
# - a **transverse momentum** wave $j_y \propto \sin(kx)$ decays purely
#   diffusively, dominated at nanometre gaps by the wall-friction rate
#   $\sim \nu / h^2$ ($\nu = \eta/\rho_0$): the walls are never more
#   than $h/2$ away.
# - a **longitudinal momentum** wave couples to the density through the
#   sound speed $c$: an oscillatory (underdamped) sound wave when
#   $k > k_{crit} = 6\nu / (h^2 c)$, and a non-oscillatory
#   (overdamped) relaxation when the wall friction beats the
#   oscillation period — $k < k_{crit}$.
#
# The crossover is the interesting physics: in high-aspect-ratio
# channels the *entire* long-wavelength spectrum is overdamped — sound
# does not propagate, pressure just diffuses.

# %%
import numpy as np
import matplotlib.pyplot as plt

eta = 3.92293e-5          # Pa s  (LJ fluid, from MD)
rho0 = 762.8617           # kg/m^3
nu = eta / rho0
c = 583.0                 # m/s (cubic EOS fit, see below)

h = np.logspace(0, 4, 100) * 1e-9
k_crit = 6 * nu / h ** 2 / c

fig, ax = plt.subplots(figsize=(5, 4))
ax.fill_between(h * 1e9, 2 * np.pi / k_crit, 1e-9, alpha=0.3, lw=0)
ax.plot(h * 1e9, 2 * np.pi / k_crit)
ax.set_xscale("log"); ax.set_yscale("log")
ax.set_xlabel("gap height h (nm)")
ax.set_ylabel(r"wavelength $2\pi/k_{crit}$ (m)")
ax.set_title("overdamped region (shaded)")
fig.tight_layout()

# %% [markdown]
# ## Validating the solver against the analytic decay
#
# Set up a flat periodic channel with an LJ fluid described by a cubic
# EOS fit to MD data (the same fluid tutorial 8 simulates atomistically):

# %%
from gapflow_tpu import Problem

sim = """
options:
    output: data/tutorial04
    write_freq: 100
    use_tstamp: False
    silent: True
grid:
    Lx: 3.2e-7
    Ly: 1
    Nx: 256
    Ny: 1
geometry:
    type: inclined
    hmin: 5e-9
    hmax: 5e-9
    U: 0.
    V: 0.
numerics:
    adaptive: 0
    CFL: 0.5
    dt: 1e-13
    max_it: 5000
properties:
    EOS: cubic
    shear: 3.92293e-05
    bulk: 0.
    rho0: 762.8617
    a: 1.33030e-1
    b: -1.41778e2
    c: 8.35134e4
    d: -2.86532e6
"""
problem = Problem.from_string(sim)
problem._pre_run()

h = problem.geo["hmin"]
Lx = problem.grid["Lx"]
nu = problem.prop["shear"] / problem.prop["rho0"]
cT = float(problem.pressure.v_sound)
print(f"gap h = {h*1e9:.0f} nm, sound speed c = {cT:.0f} m/s")
print(f"k_crit = {6*nu/h**2/cT:.3e} 1/m "
      f"(mode n > {6*nu/h**2/cT*Lx/2/np.pi:.1f} is underdamped)")

# %% [markdown]
# Seed a transverse (shear) wave $j_y(x, 0) = \sin(k_n x)$ and follow
# its decay on-device.  The wall-friction relaxation time is
# $\tau_\perp = h^2 / (6\nu)$ and the amplitude decays as
# $e^{-2t/\tau_\perp}$ (both walls drag on the gap-averaged momentum).

# %%
n = 2
kn = n * 2 * np.pi / Lx
tau_perp = h ** 2 / (6 * nu)

x = np.asarray(problem.topo.x)[1:-1, 1]
problem.q[2, 1:-1, :] = np.sin(kn * x)[:, None]

qs, times = problem.run_steps(200)
amp = np.asarray(qs)[:, 2, 1:-1, 1].max(axis=1)

fig, ax = plt.subplots(figsize=(6, 3))
ax.semilogy(np.asarray(times) * 1e12, amp, label="simulation")
ax.semilogy(np.asarray(times) * 1e12,
            np.exp(-2 * np.asarray(times) / tau_perp), "--",
            label=r"$e^{-2t/\tau_\perp}$")
ax.set_xlabel("t (ps)"); ax.set_ylabel(r"max $j_y$")
ax.legend(); fig.tight_layout()

# the continuum envelope neglects the O(nu k^2) in-plane viscous term,
# so the discrete decay tracks it to ~1e-3 absolute at this resolution
np.testing.assert_allclose(
    amp, np.exp(-2 * np.asarray(times) / tau_perp), atol=1e-3)

# %% [markdown]
# Now a longitudinal wave, once in each damping branch.  The envelope
# follows
# $e^{-t/\tau}\bigl(\cos(s k t) - \tfrac{1}{\tau s k}\sin(s k t)\bigr)$
# with $s = \sqrt{c^2 - (1/\tau k)^2}$ (underdamped; $\cosh/\sinh$ with
# $s = \sqrt{(1/\tau k)^2 - c^2}$ when overdamped).

# %%
def envelope(t, kn):
    tau = h ** 2 / (6 * nu)
    if kn > 6 * nu / h ** 2 / cT:       # underdamped
        s = np.sqrt(cT ** 2 - (1 / tau / kn) ** 2)
        return np.exp(-t / tau) * (np.cos(s * kn * t)
                                   - np.sin(s * kn * t) / (tau * s * kn))
    s = np.sqrt((1 / tau / kn) ** 2 - cT ** 2)
    return np.exp(-t / tau) * (np.cosh(s * kn * t)
                               - np.sinh(s * kn * t) / (tau * s * kn))


fig, ax = plt.subplots(1, 2, figsize=(10, 3), sharey=False)
for axis, n in zip(ax, (1, 4)):
    problem = Problem.from_string(sim)
    problem._pre_run()
    kn = n * 2 * np.pi / Lx
    problem.q[1, 1:-1, :] = np.sin(kn * x)[:, None]
    qs, times = problem.run_steps(400)
    t = np.asarray(times)
    probe = np.asarray(qs)[:, 1, 1:-1, 1][:, np.argmax(np.sin(kn * x))]
    axis.plot(t * 1e12, probe, label=f"simulation, n={n}")
    axis.plot(t * 1e12, envelope(t, kn), "--", label="theory")
    branch = "underdamped" if kn > 6 * nu / h**2 / cT else "overdamped"
    axis.set_title(branch)
    axis.set_xlabel("t (ps)"); axis.legend()
ax[0].set_ylabel(r"$j_x$ at the crest")
fig.tight_layout()

# %% [markdown]
# Both branches match the linear theory — the same check runs in the
# test suite per step to 4 decimals (`tests/test_wave_decay.py`).
#
# **Why this matters for the multiscale method:** at $h \lesssim 10$ nm
# the macro dynamics is wall-friction dominated, so the quality of the
# solution rests entirely on the wall-stress closure — precisely the
# quantity the GP surrogates of tutorials 7–8 learn from MD, where the
# continuum ansatz of tutorial 2 no longer holds.
