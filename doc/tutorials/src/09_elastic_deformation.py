# %% [markdown]
# # 9. Elastic Deformation
#
# At high loads the solid surfaces are not rigid: the lubrication
# pressure deforms them, which changes the gap, which changes the
# pressure — elastohydrodynamic lubrication (EHL).  This tutorial
# covers the theory, the solver, and two worked examples.  (Reference
# analogue: `doc/tutorials/09_elastic_deformation.ipynb`.)
#
# ## Theory
#
# ### Green's function approach
#
# For a linear-elastic half-space (Young's modulus $E$, Poisson ratio
# $\nu$) the normal surface displacement under a pressure field $p$ is
# the Boussinesq superposition
#
# $$ u(x, y) = \frac{1}{E^*} \int G(x - x', y - y')\, p(x', y')\,
#    dx'\,dy', \qquad E^* = \frac{E}{1 - \nu^2}, $$
#
# a convolution — so it diagonalizes in Fourier space.
#
# #### Periodic solution
#
# For a fully periodic domain the kernel is algebraic in the wave
# vector: $\hat u(q) = \frac{2}{E^* |q|}\, \hat p(q)$, with the $q = 0$
# mode set to zero (uniform pressure on a periodic half-space produces
# no relative displacement — deformations are zero-mean).
#
# #### Non-periodic solution
#
# For a free surface the real-space Love kernel over a rectangular
# pressure patch $(a, b) = (dx/2, dy/2)$ is used:
#
# $$ G = \frac{1}{\pi}\Bigl[(x+a)\ln\tfrac{(y+b)+r_{++}}{(y-b)+r_{+-}}
#      + (y+b)\ln\tfrac{(x+a)+r_{++}}{(x-a)+r_{-+}} + \dots\Bigr], $$
#
# and the convolution runs on a zero-padded $2N_x \times 2N_y$ grid so
# the FFT's implicit periodicity cannot wrap the response.
#
# #### Semi-periodic solution
#
# Periodic in one direction only: the free-space kernel plus
# ``n_images`` periodic images along the periodic axis.  The pure-1D
# case (``Ny: 1``, periodic $y$) degenerates to a line contact with
# unit transverse length.
#
# #### Fourier transform trick
#
# All three variants are a multiply in the spectrum.  On TPU there is
# one subtlety: the solver works on the ghost-inclusive $(N_x + 2)$
# grid, whose sizes carry large prime factors (e.g. $1026 = 2 \cdot 3^3
# \cdot 19$) that slow XLA's FFT ~4×.  `gapflow_tpu/ops/specfft.py`
# splits each axis $n = \text{smooth} \times \text{bad}$ with one
# Cooley–Tukey step and evaluates the bad-prime factor as a dense
# (MXU) matmul at full precision — the per-step EHL cost drops ~2.2×.
#
# ## The kernels, standalone

# %%
import numpy as np
import matplotlib.pyplot as plt
from gapflow_tpu.elastic import PeriodicHalfSpace, FreeHalfSpace

E_star = 1e9
n, L = 256, 1e-3
hs_per = PeriodicHalfSpace((n, 1), E_star, (L, 1.))
hs_free = FreeHalfSpace((n, 1), E_star, (L, 1.))

x = (np.arange(n) + 0.5) * L / n
p = 1e6 * np.exp(-((x - L / 2) / (L / 12)) ** 2)[:, None]

u_per = np.asarray(hs_per.deformation(p))[:, 0]
u_free = np.asarray(hs_free.deformation(p))[:, 0]

fig, ax = plt.subplots(figsize=(6.5, 3))
ax.plot(x * 1e3, u_per * 1e9, label="periodic (zero-mean)")
ax.plot(x * 1e3, u_free * 1e9, label="free surface")
ax.set_xlabel("x (mm)"); ax.set_ylabel("u (nm)")
ax.legend(); fig.tight_layout()

# %% [markdown]
# A cosine pressure on the periodic half-space has the exact response
# $u = \frac{2}{E^* q}\, p$ — the test suite checks this identity and
# the free-space point-load far field against the analytic Boussinesq
# solution (`tests/test_elastic.py`).

# %%
q1 = 2 * np.pi / L
p_cos = 1e6 * np.cos(q1 * x)[:, None]
u_cos = np.asarray(hs_per.deformation(p_cos))[:, 0]
np.testing.assert_allclose(u_cos, 2 / (E_star * q1) * p_cos[:, 0],
                           rtol=1e-10)
print("periodic cosine response exact:",
      float(np.max(np.abs(u_cos))) , "m")

# %% [markdown]
# ## Usage
#
# ### YAML
#
# An ``elastic:`` block inside ``properties`` activates the coupling:
#
# ```yaml
# properties:
#     ...
#     elastic:
#         E: 210e9                  # Young's modulus (Pa)
#         v: 0.3                    # Poisson ratio
#         alpha_underrelax: 1e-3    # fixed-point damping
#         n_images: 10              # images for semi-periodic kernels
# ```
#
# ### Implementation notes
#
# The gap update is an under-relaxed fixed point,
# $u_{k+1} = (1 - \alpha)\, u_k + \alpha\, u(p_k)$, evaluated once per
# timestep: the pressure–deformation loop converges *together with* the
# flow transient.  The kernel variant (periodic / semi-periodic / free)
# follows the grid's boundary periodicity automatically; free and
# semi-periodic responses are referenced to the corner value so only
# deformation *differences* act on the gap.
#
# ## Examples
#
# ### Parabolic slider, non-periodic (line contact)

# %%
from gapflow_tpu import Problem

sim = """
options:
    output: data/tutorial09
    write_freq: 1000
    use_tstamp: False
    silent: True
grid:
    Lx: 1.e-3
    dy: 1.
    Nx: 128
    Ny: 1
    xE: ['D', 'N', 'N']
    xW: ['D', 'N', 'N']
    xE_D: 877.7007
    xW_D: 877.7007
geometry:
    type: parabolic
    hmin: 3.e-7
    hmax: 3.e-6
    U: 1.
    V: 0.
numerics:
    CFL: 0.25
    adaptive: 1
    tol: 1e-7
    dt: 1e-11
    max_it: 3000
properties:
    shear: 0.0794
    bulk: 0.
    EOS: DH
    P0: 101325
    rho0: 877.7007
    C1: 3.5e10
    C2: 1.23
    elastic:
        E: 2.e10
        v: 0.3
        alpha_underrelax: 1e-3
        n_images: 10
"""
problem = Problem.from_string(sim)
problem.run()

x = np.asarray(problem.topo.x)[1:-1, 1]
fig, ax = plt.subplots(1, 2, figsize=(10, 3.2))
ax[0].plot(x * 1e3, np.asarray(problem.topo.h_undeformed)[1:-1, 1] * 1e6,
           ":", label="undeformed")
ax[0].plot(x * 1e3, np.asarray(problem.topo.h)[1:-1, 1] * 1e6,
           label="deformed")
ax[0].set_xlabel("x (mm)"); ax[0].set_ylabel("h (µm)"); ax[0].legend()
p_f = np.asarray(problem.pressure.pressure)[1:-1, 1]
ax[1].plot(x * 1e3, (p_f - 101325) / 1e6)
ax[1].set_xlabel("x (mm)"); ax[1].set_ylabel(r"$p - P_0$ (MPa)")
fig.tight_layout()
u_max = float(np.abs(np.asarray(problem.topo.deformation)).max())
print("max deformation:", u_max, "m")
# converged EHL state: sub-micron deformation, everywhere-positive gap
assert 1e-8 < u_max < 2e-6
assert np.asarray(problem.topo.h)[1:-1, 1].min() > 0

# %% [markdown]
# The pressure peak flattens the parabolic gap — the hallmark EHL
# plateau begins to form (lower the stiffness or raise the speed to
# deepen it).
#
# ### Journal slider, periodic
#
# The same ``elastic:`` block on the (periodic) journal geometry of
# tutorial 5 selects the periodic spectral kernel automatically; the
# rough-surface EHL benchmark combines the 2D asperity field of
# tutorial 6 with this coupling at 1024²–2048² (see the *performance*
# page: above 10⁹ cell-updates/s with per-step deformation through the
# mixed-radix FFT, and `deform_every`-chunked updates — same fixed
# point — several times faster).
#
# On multi-chip meshes, `gapflow_tpu/parallel/ehl.py` runs the sharded
# EHL loop: halo-exchange fluid steps with the elastic FFT on an
# all-gathered pressure (at these grid sizes, replicate-and-FFT beats a
# distributed-FFT transpose pair).
