# %% [markdown]
# # 1. Governing equations
#
# This tutorial introduces the mathematical foundation of the multiscale
# approach: the gap-averaged balance equations solved on the macro scale,
# the constitutive closures they require from the micro scale, and the
# numerical scheme.  (Scope mirrors the reference tutorial
# `doc/tutorials/01_macro_equations.ipynb`; everything here runs on the
# gapflow-tpu implementation.)
#
# ## Splitting approach
#
# Lubricated contacts have an extreme aspect ratio: the gap height $h$
# is nanometres to micrometres while the lateral extent $L$ is
# millimetres.  Resolving the full 3D flow is wasteful — but at
# nanometre gaps, continuum constitutive assumptions also break down.
# The framework therefore splits the problem:
#
# - a **macro problem** for the gap-averaged densities and fluxes on a
#   2D lateral grid, which needs the *stress at and between the walls*
#   as input, and
# - a **micro problem** — an analytic constitutive law, or a molecular
#   dynamics simulation of a confined fluid element — that provides
#   exactly those stresses as functions of the local state.
#
# ## Macro problem
#
# ### Derivation
#
# Integrating the compressible Navier–Stokes equations across the gap
# $z \in [0, h(x, y)]$ and defining the gap-averaged conserved variables
#
# $$ q = (\bar\rho, \bar j_x, \bar j_y), \qquad
#    \bar\rho = \frac{1}{h}\int_0^h \rho\, dz, \quad
#    \bar j_x = \frac{1}{h}\int_0^h \rho u\, dz, $$
#
# yields a 2D system of balance laws with source terms from the moving
# walls and the gap slope:
#
# $$ \partial_t q + \partial_x F_x(q) + \partial_y F_y(q) = S(q, h). $$
#
# The hyperbolic fluxes carry the pressure (through an equation of
# state $p(\bar\rho)$) and the convective momentum flux; the diffusive
# fluxes carry the gap-averaged viscous stresses; the source couples
# the wall shear stresses $\tau_{xz}|_{0,h}$ and the topography
# gradients $\partial_x h$, $\partial_y h$.  The closures
# ($p$, $\tau$ at top/bottom/averaged) are *exactly* what the micro
# problem must supply — tutorials 2–4 derive the analytic versions,
# tutorials 7–8 replace them with learned surrogates.
#
# ### Numerical solution
#
# The solver advances $q$ with MacCormack's predictor–corrector scheme:
# a forward-difference predictor followed by a backward-difference
# corrector (directions alternate every step to cancel the bias),
# second-order in space and time.  On TPU the whole step compiles to a
# single XLA program; grids covered by the fused Pallas kernels run the
# entire n-step loop in one kernel launch (see the `performance` page).
#
# Let's set up a 1D inclined slider and inspect the pieces.

# %%
import numpy as np
import matplotlib.pyplot as plt

from gapflow_tpu import Problem

config = """
options:
    output: data/tutorial01
    write_freq: 100
    silent: True
grid:
    Lx: 1.e-3
    dy: 1.
    Nx: 64
    Ny: 1
    xE: ['D', 'N', 'N']
    xW: ['D', 'N', 'N']
    xE_D: 877.7007
    xW_D: 877.7007
geometry:
    type: inclined
    hmax: 1.e-5
    hmin: 5.e-6
    U: 5.0
    V: 0.
numerics:
    CFL: 0.4
    adaptive: 1
    tol: 1e-7
    dt: 1e-10
    max_it: 20000
properties:
    shear: 1.e-2
    bulk: 0.
    EOS: DH
    P0: 101325.
    rho0: 877.7007
    C1: 3.5e8
    C2: 1.23
"""
problem = Problem.from_string(config)
problem._pre_run()
print("state q:", problem.q.shape, "(rho, jx, jy) on the ghost-padded grid")

# %% [markdown]
# The topography defines the gap height; the equation of state closes
# the pressure.  The state carries one ghost cell per edge for the
# boundary conditions (fixed ambient density at inlet and outlet here,
# zero-gradient fluxes).

# %%
fig, ax = plt.subplots(1, 2, figsize=(9, 3))
x = np.asarray(problem.topo.x)[1:-1, 1]     # interior midpoints
ax[0].plot(x, np.asarray(problem.topo.h)[1:-1, 1] * 1e6)
ax[0].set_xlabel("x (m)"); ax[0].set_ylabel("h (µm)")
ax[0].set_title("gap height")
rho = np.linspace(850, 920, 100)
from gapflow_tpu.models.eos import eos_pressure
p = eos_pressure(rho, problem.prop)
ax[1].plot(rho, np.asarray(p) / 1e6)
ax[1].set_xlabel(r"$\rho$ (kg/m³)"); ax[1].set_ylabel("p (MPa)")
ax[1].set_title("Dowson–Higginson EOS")
fig.tight_layout()

# %% [markdown]
# ## One MacCormack step
#
# `core.integrate` holds the flux/source building blocks;
# `core.step.make_det_step` assembles them into one jitted update.
# Run a short trajectory and watch the transient decay toward the
# steady Reynolds-equation solution.

# %%
qs, times = problem.run_steps(400)
qs = np.asarray(qs)
print("trajectory:", qs.shape, " t_final =", float(times[-1]))

mid = qs[:, 0, :, 1]          # centerline density over time
fig, ax = plt.subplots(figsize=(6, 3))
for i in range(0, 400, 80):
    ax.plot(x, mid[i, 1:-1], alpha=0.3 + 0.7 * i / 400, color="C0")
ax.plot(x, mid[-1, 1:-1], color="C1", lw=2, label="final")
ax.set_xlabel("x (m)"); ax.set_ylabel(r"$\bar\rho$ (kg/m³)")
ax.legend(); fig.tight_layout()

# %% [markdown]
# The density piles up where the gap converges — the lubrication
# pressure build-up that carries the load.
#
# ## Micro problem
#
# The step above used analytic closures: the Dowson–Higginson equation
# of state for $p(\bar\rho)$ and Newtonian gap-averaged stress profiles
# (derived symbolically in tutorial 2).  In the multiscale setting each
# of these can be replaced by a Gaussian-process surrogate trained on
# molecular dynamics data of a confined fluid element at the local
# $(h, \bar\rho, \bar j)$ — the micro problem.  Tutorial 7 builds that
# machinery with a mock oracle; tutorial 8 runs real MD.

# %%
# scalar diagnostics maintained by the driver
print(f"mass = {problem.mass:.6e} kg")
print(f"kinetic energy = {problem.kinetic_energy:.3e} J")
print(f"CFL = {problem.cfl:.3f}")
