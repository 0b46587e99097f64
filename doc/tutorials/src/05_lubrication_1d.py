# %% [markdown]
# # 5. Lubrication (1D)
#
# Time to solve an actual bearing.  The journal bearing — a shaft
# rotating inside a slightly larger bushing — unrolls into a 1D
# periodic channel with gap height
# $h(x) = c\,(1 + \varepsilon \cos(2\pi x / L_x))$, where $c$ is the
# radial clearance and $\varepsilon$ the eccentricity.  For an
# incompressible Newtonian fluid the steady pressure has a closed form
# (the Sommerfeld solution), which makes this the canonical validation
# problem.  (Reference analogue: `doc/tutorials/05_lubrication_1d.ipynb`.)
#
# ## YAML input
#
# Everything a run needs sits in one YAML file: the ``grid`` (here 1D —
# ``Ny: 1`` and trivially periodic in $y$), the ``geometry``, the
# ``numerics`` (CFL-adaptive time stepping toward a residual tolerance),
# and the fluid ``properties``.  A stiff Dowson–Higginson EOS
# (``C1: 3.5e12``) makes the liquid nearly incompressible so we can
# compare against Sommerfeld.

# %%
import numpy as np
import matplotlib.pyplot as plt
from gapflow_tpu import Problem

sim = """
options:
    output: data/tutorial05
    write_freq: 1000
    silent: True
grid:
    dx: 1.e-5
    dy: 1.
    Nx: 100
    Ny: 1
geometry:
    type: journal
    CR: 1.e-2
    eps: 0.7
    U: 0.1
    V: 0.
numerics:
    CFL: 0.5
    adaptive: 1
    tol: 1e-8
    dt: 1e-10
    max_it: 10_000
properties:
    shear: 0.0794
    bulk: 0.
    EOS: DH
    P0: 101325.
    rho0: 877.7007
    C1: 3.5e12
    C2: 1.23
"""
problem = Problem.from_string(sim)
problem.run()
print("converged:", problem.converged, " steps:", problem.step)

# %% [markdown]
# ``run()`` integrates to the residual tolerance.  With
# ``options.silent`` and no GP/elastic coupling the whole convergence
# loop executes on-device as one compiled program (``run_compiled``);
# in float32 on TPU it auto-dispatches to the fused Pallas kernel path
# (``run_compiled_fast``) at ~10¹⁰ cell-updates/s.
#
# ## Comparing against the Sommerfeld solution

# %%
def sommerfeld_solution(x, Lx, mu, U, clearance_ratio, eps, P0):
    Rb = Lx / (2. * np.pi)
    c = clearance_ratio * Rb
    omega = U / Rb
    prefac = 6. * mu * omega * (Rb / c) ** 2 * eps
    return P0 + prefac * np.sin(x / Rb) * (2. + eps * np.cos(x / Rb)) \
        / ((2. + eps ** 2) * (1. + eps * np.cos(x / Rb)) ** 2)


p_num = np.asarray(problem.pressure.pressure)[1:-1, 1]
Lx = problem.grid["Lx"]
x = np.asarray(problem.topo.x)[1:-1, 1]

dp = p_num[1] - p_num[0]
p_ana = sommerfeld_solution(x, Lx, problem.prop["shear"], problem.geo["U"],
                            problem.geo["CR"], problem.geo["eps"],
                            p_num[0] - dp / 2)

l2 = np.linalg.norm(p_num - p_ana) / np.linalg.norm(p_ana)
print(f"relative L2 error: {l2:.4f}")
assert l2 < 0.02

fig, ax = plt.subplots(1, 2, figsize=(10, 3.2))
ax[0].plot(x * 1e3, np.asarray(problem.topo.h)[1:-1, 1] * 1e6)
ax[0].set_xlabel("x (mm)"); ax[0].set_ylabel("h (µm)")
ax[0].set_title(r"journal gap, $\varepsilon = 0.7$")
ax[1].plot(x * 1e3, p_num / 1e3, label="gapflow-tpu")
ax[1].plot(x * 1e3, p_ana / 1e3, "--", label="Sommerfeld")
ax[1].set_xlabel("x (mm)"); ax[1].set_ylabel("p (kPa)")
ax[1].legend(); fig.tight_layout()

# %% [markdown]
# Sub-2% L2 against the analytic solution (the test suite repeats this
# for $\varepsilon \in \{0.5, 0.7, 0.9\}$, and
# `gapflow_tpu/validate.py` re-runs it in float32 through the Pallas
# production path on every benchmark).
#
# ## Built-in plotting
#
# A `Problem` plots itself without touching the output files:

# %%
problem.plot()
plt.gcf().tight_layout()

# %% [markdown]
# For stored runs, the CLI tools (``gpf_plot_frame``, ``gpf_plot_height``,
# ``gpf_plot_history``, ``gpf_animate1d``) operate on ``sol.nc`` /
# ``topo.nc`` / ``history.csv`` in the output directory — see the
# *Visualization* page.
#
# ## What to try next
#
# - **Cavitation**: the diverging half of the journal produces negative
#   Sommerfeld pressures; a real lubricant cavitates instead.  Switch to
#   ``EOS: Bayada`` with liquid/vapor parameters
#   (`examples/config/parabolic_1d_cav_bayada.yaml`).
# - **Boundary conditions**: replace the periodic edges with fixed
#   ambient density (`xE/xW: ['D', 'N', 'N']` + `xE_D/xW_D`) to model a
#   finite slider — see `examples/config/inclined_1d_powerlaw.yaml`.
# - **Piezoviscosity / shear thinning**: add the ``piezo``/``thinning``
#   blocks from tutorial 3.
