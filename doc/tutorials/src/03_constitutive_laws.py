# %% [markdown]
# # 3. Constitutive laws
#
# Between a full MD micro-problem and nothing at all sits a library of
# analytic constitutive models: equations of state $p(\rho)$ with their
# sound speeds, and viscosity laws for pressure and shear-rate
# dependence.  They are selected from the YAML ``properties`` section
# and are all branch-free JAX functions (autodiff-consistent: each
# sound speed is the analytic $c = \sqrt{\partial p/\partial \rho}$,
# verified against AD in the test suite).  Reference analogue:
# `doc/tutorials/03_constitutive_laws.ipynb`.
#
# ## Equations of state for isothermal compressible fluids
#
# Seven families (YAML key ``EOS:``):
#
# | key | model | typical use |
# |---|---|---|
# | ``DH`` | Dowson–Higginson | mineral oils under EHL pressures |
# | ``PL`` | power law / ideal gas | gases ($\alpha=0$: isothermal) |
# | ``vdW`` | van der Waals | model fluids near saturation |
# | ``MT`` | Murnaghan–Tait | weakly compressible liquids |
# | ``cubic`` | cubic polynomial | fits to MD data |
# | ``BWR`` | Benedict–Webb–Rubin (32 coeff.) | Lennard-Jones fluid |
# | ``Bayada`` | Bayada–Chupin | cavitation (liquid/vapor mixture) |

# %%
import numpy as np
import matplotlib.pyplot as plt
from gapflow_tpu.models import eos

fig, ax = plt.subplots(1, 2, figsize=(10, 3.5))

rho = np.linspace(700, 950, 200)
ax[0].plot(rho, eos.dowson_higginson(rho) / 1e6, label="DH")
ax[0].plot(rho, eos.murnaghan_tait(rho) / 1e6, label="MT")
ax[0].set_xlabel(r"$\rho$ (kg/m³)"); ax[0].set_ylabel("p (MPa)")
ax[0].legend(); ax[0].set_title("liquids")

# LJ fluid: reduced units, BWR fit
rho_lj = np.linspace(0.05, 0.8, 200)
ax[1].plot(rho_lj, eos.bwr(rho_lj, T=2.0), label="BWR, T*=2.0")
ax[1].plot(rho_lj, eos.bwr(rho_lj, T=1.2), label="BWR, T*=1.2")
ax[1].set_xlabel(r"$\rho^*$"); ax[1].set_ylabel(r"$p^*$")
ax[1].legend(); ax[1].set_title("Lennard-Jones (reduced units)")
fig.tight_layout()

# %% [markdown]
# Every EOS has an analytic sound speed — the MacCormack step needs it
# for the CFL-adaptive timestep, and GP pressure surrogates get theirs
# from autodiff of the GP mean instead.

# %%
c = eos.sound_dowson_higginson(rho)
c_ad = np.sqrt(np.gradient(eos.dowson_higginson(rho), rho))
fig, ax = plt.subplots(figsize=(5, 3))
ax.plot(rho, c, label="analytic")
ax.plot(rho[5:-5], c_ad[5:-5], "--", label="finite-difference check")
ax.set_xlabel(r"$\rho$ (kg/m³)"); ax.set_ylabel("c (m/s)")
ax.legend(); fig.tight_layout()

# %% [markdown]
# The Bayada–Chupin model switches between liquid, vapor, and a mixture
# regime — implemented branch-free with ``jnp.where`` so it traces into
# one XLA program (and into the Pallas kernels):

# %%
rho_cav = np.linspace(1.0, 870.0, 400)
p_cav = eos.bayada_chupin(rho_cav, rho_l=850., rho_v=0.0288,
                          c_l=1440., c_v=337.)
c_cav = eos.sound_bayada_chupin(rho_cav, rho_l=850., rho_v=0.0288,
                                c_l=1440., c_v=337.)
fig, ax = plt.subplots(1, 2, figsize=(9, 3))
ax[0].semilogy(rho_cav, p_cav); ax[0].set_ylabel("p (Pa)")
ax[1].semilogy(rho_cav, c_cav); ax[1].set_ylabel("c (m/s)")
for a in ax:
    a.set_xlabel(r"$\rho$ (kg/m³)")
fig.tight_layout()

# %% [markdown]
# ## Viscosity models for non-Newtonian fluids
#
# Lubricants are strongly piezoviscous and shear-thinning.  The YAML
# ``properties`` section takes optional ``piezo:`` and ``thinning:``
# blocks; both corrections apply multiplicatively to the Newtonian
# viscosity in the closures of tutorial 2.
#
# Piezoviscosity (``piezo: {name: Barus | Roelands}`` — plus the
# Dukler and McAdams *mixture* rules used with cavitation):

# %%
from gapflow_tpu.models import viscosity as vis

p = np.linspace(0, 5e8, 200)
mu0 = 0.08
fig, ax = plt.subplots(1, 2, figsize=(10, 3.5))
ax[0].semilogy(p / 1e6, vis.barus_piezo(p, mu0), label="Barus")
ax[0].semilogy(p / 1e6, vis.roelands_piezo(p, mu0), label="Roelands")
ax[0].set_xlabel("p (MPa)"); ax[0].set_ylabel(r"$\eta$ (Pa·s)")
ax[0].legend(); ax[0].set_title("piezoviscosity")

# shear thinning (thinning: {name: Eyring | Carreau}); the model
# functions return the multiplicative factor mu(gamma)/mu0
gdot = np.logspace(2, 9, 200)
ax[1].loglog(gdot, mu0 * np.asarray(vis.eyring_shear(gdot, mu0, tauE=5e6)),
             label="Eyring")
ax[1].loglog(gdot, mu0 * np.asarray(vis.carreau_shear(gdot, mu0, lam=1e-6)),
             label="Carreau")
ax[1].set_xlabel(r"$\dot\gamma$ (1/s)"); ax[1].set_ylabel(r"$\eta$ (Pa·s)")
ax[1].legend(); ax[1].set_title("shear thinning")
fig.tight_layout()

# %% [markdown]
# The effective shear rate entering the thinning law is the
# gap-averaged one from the tutorial-2 velocity profile (Couette +
# Poiseuille contributions):

# %%
dp_dx = -1e9
srate = vis.shear_rate_avg(dp_dx, 0.0, h=1e-6, u1=5.0, u2=0.0, mu=mu0)
print(f"average shear rate at h=1µm, U=5 m/s, dp/dx={dp_dx:.0e}: "
      f"{float(srate):.3e} 1/s")

# %% [markdown]
# In a YAML input these combine, e.g.:
#
# ```yaml
# properties:
#     shear: 0.0794
#     EOS: DH
#     piezo:
#         name: Barus
#         aB: 2.e-8
#     thinning:
#         name: Eyring
#         tauE: 5.e6
# ```
#
# On TPU, piezoviscosity and shear thinning both run inside the fused
# Pallas kernels (including across the periodic-x seam) — see the
# `performance` page.
