# %% [markdown]
# # 6. Lubrication (2D)
#
# Real surfaces are rough.  This tutorial runs a fully two-dimensional
# problem — a field of cosine asperities sliding against a flat counter
# surface — and introduces the 2D geometry, output, and scaling
# features.  (Reference analogue: `doc/tutorials/06_lubrication_2d.ipynb`.)
#
# The ``asperity`` geometry tiles the domain with ``num`` × ``num``
# cosine bumps; for ``num > 1`` the individual depths are drawn from a
# Gaussian (use ``seed:`` for a reproducible rough surface — an
# extension over the reference, which draws unseeded).

# %%
import numpy as np
import matplotlib.pyplot as plt
from gapflow_tpu import Problem

sim = """
options:
    output: data/tutorial06
    write_freq: 1000
    silent: True
grid:
    Lx: 1.e-4
    Ly: 1.e-4
    Nx: 64
    Ny: 64
geometry:
    type: asperity
    hmax: 1.e-6
    hmin: 3.e-7
    num: 2
    seed: 11
    U: 1.0
    V: 0.5
numerics:
    CFL: 0.4
    adaptive: 1
    tol: 1e-7
    dt: 1e-11
    max_it: 4000
properties:
    shear: 0.0794
    bulk: 0.
    EOS: DH
    P0: 101325.
    rho0: 877.7007
    C1: 3.5e9
    C2: 1.23
"""
problem = Problem.from_string(sim)
problem._pre_run()

fig, ax = plt.subplots(figsize=(4.5, 4))
im = ax.imshow(np.asarray(problem.topo.h)[1:-1, 1:-1].T * 1e6,
               origin="lower", extent=[0, 100, 0, 100])
fig.colorbar(im, label="h (µm)")
ax.set_xlabel("x (µm)"); ax.set_ylabel("y (µm)")
ax.set_title("2×2 asperity field"); fig.tight_layout()

# %% [markdown]
# Run a batch of steps on-device (the full convergence run works the
# same way with ``problem.run()``; we keep it short here):

# %%
qs, times = problem.run_steps(1500)
print(f"t = {float(times[-1])*1e9:.2f} ns, residual = {problem.residual:.2e}")

p = np.asarray(problem.pressure.pressure)[1:-1, 1:-1]
fig, ax = plt.subplots(1, 2, figsize=(10, 4))
im0 = ax[0].imshow((p.T - 101325.) / 1e6, origin="lower",
                   extent=[0, 100, 0, 100], cmap="RdBu_r")
fig.colorbar(im0, ax=ax[0], label=r"$p - P_0$ (MPa)")
ax[0].set_title("pressure")
jmag = np.hypot(np.asarray(problem.q)[1, 1:-1, 1:-1],
                np.asarray(problem.q)[2, 1:-1, 1:-1])
im1 = ax[1].imshow(jmag.T, origin="lower", extent=[0, 100, 0, 100])
fig.colorbar(im1, ax=ax[1], label=r"$|j|$ (kg/m²s)")
ax[1].set_title("flux magnitude")
for a in ax:
    a.set_xlabel("x (µm)"); a.set_ylabel("y (µm)")
fig.tight_layout()

# %% [markdown]
# Sliding along the diagonal (``U: 1.0``, ``V: 0.5``) builds pressure on
# the converging flanks of each asperity and a depression behind — the
# flux field funnels through the deepest channels between the bumps.
#
# ## 2D output and visualization
#
# 2D runs write the same ``sol.nc``/``topo.nc`` files; the CLI tools
# switch to image plots automatically (``gpf_plot_frame -d 2``,
# ``gpf_animate2d``).  ``problem.plot()`` shows centerline cuts.
#
# ## Scaling up
#
# Production-sized 2D grids are where the TPU design pays off:
#
# - **single chip**: grids covered by the fused Pallas kernels
#   (periodic or uniform D/N edges, ``Ny`` a multiple of 128) run the
#   whole step loop in one kernel — ~15×10⁹ cell-updates/s at 1024²,
#   ~11×10⁹ at 2048²/4096² via the HBM ping-pong schedule.
# - **many chips**:
#
#   ```python
#   from gapflow_tpu.parallel import grid_mesh
#   problem.run_steps_sharded(1000, mesh=grid_mesh(jax.devices()))
#   ```
#
#   shards the grid over a 2D device mesh with ``ppermute`` halo
#   exchanges; sharded-vs-serial equality is covered by the test suite
#   on a virtual 8-device mesh.
#
# Tutorial 9 adds elastic deformation of the counter surface (EHL);
# the rough-EHL benchmark combines exactly this asperity field with the
# FFT half-space solver.
