# %% [markdown]
# # 8. Gaussian process regression with MD data
#
# Tutorial 7 trained surrogates on a mock oracle; here the oracle is
# real molecular dynamics.  The bundled C++ engine (``nanomd``,
# `gapflow_tpu/native/nanomd.cpp`) executes both reference workloads
# natively — no external LAMMPS/moltemplate needed:
#
# - **Lennard-Jones fluid** confined between solid walls, with
#   Gaussian-dynamics flux control driving the sampled state to the
#   target $(\bar\rho, j_x, j_y, h)$;
# - **hexadecane/pentane on gold**: TraPPE-UA united-atom chains
#   (harmonic bonds/angles, OPLS dihedrals), gold walls as LJ or
#   tabulated EAM, with a gap squeeze to the target height.
#
# (Reference analogue: `doc/tutorials/08_gp_md.ipynb`, which drives an
# external LAMMPS build; ``md: engine: lammps`` reproduces that path.)
#
# ## Lennard-Jones fluid
#
# Each training point is one MD run at a state point $X = (\bar\rho,
# j_x, j_y, h, \partial_x h, \partial_y h, L_s)$.  The run samples the
# full wall stress tensor; the 13-entry observation vector $Y$ holds
# the pressure, the six wall-stress components per wall, and their
# statistical errors.  The `Database` drives runs, packages each as a
# FAIR (dtool-layout) dataset, and normalizes features/targets.

# %%
import os
import tempfile
import numpy as np
import matplotlib.pyplot as plt

from gapflow_tpu.db import Database
from gapflow_tpu.md import LennardJones

import gapflow_tpu
repo = os.path.dirname(os.path.dirname(os.path.abspath(gapflow_tpu.__file__)))

md_params = {
    "system": "lj",
    "ncpu": 1,
    "infile": os.path.join(repo, "examples", "lmp", "lj", "in.run"),
    "wallfile": os.path.join(repo, "examples", "lmp", "lj", "wall.data"),
    # short stage lengths so the tutorial runs in seconds; production
    # values are ~100x longer (see examples/config/*_lj_gp_nanomd.yaml)
    "tinit": 200,
    "ttherm": 200,
    "tsample": 1000,
    "Nevery": 10,
}
md = LennardJones(md_params)

train_dir = tempfile.mkdtemp(prefix="gpf_tutorial08_")
db_config = {"init_size": 2, "init_width": 0.01, "init_method": "lhc",
             "init_seed": 1, "dtool_path": train_dir}
db = Database(md, db_config, num_extra_features=1)

# candidate state points: rho*=0.6, jx*=0.03, gap h*=8 (LJ reduced units)
Xtest = np.column_stack([
    np.full(16, 0.6), np.full(16, 0.03), np.zeros(16),
    np.full(16, 8.0), np.zeros(16), np.zeros(16), np.zeros(16),
])
db.initialize(Xtest, dim=1)     # runs 2 MD simulations
print("database size:", db.size)
print("observation vector Y[0]:")
print(np.asarray(db._Ytrain)[0])

# %% [markdown]
# ## Inside one MD run
#
# Each dataset directory holds the inputs (``in.param`` with the state
# point, the run deck, the wall geometry), the sampled
# ``stress_wall.dat``, the log, and a ``README.yml`` with the $(X, Y)$
# pair — enough to reload the training set from disk alone (a fresh
# ``Database`` adopts every frozen dataset it finds).
#
# The wall-stress time series is noisy; the statistical error bars come
# from the autocorrelation time via the statistical-inefficiency
# method:

# %%
from gapflow_tpu.md.utils import statistical_inefficiency

ds = sorted(d for d in os.listdir(train_dir)
            if os.path.isdir(os.path.join(train_dir, d)))[0]
data = np.loadtxt(os.path.join(train_dir, ds, "data", "stress_wall.dat"))
t, pzz = data[:, 0], data[:, 1]      # lower-wall normal pressure

s = statistical_inefficiency(pzz, mintime=1)
err = np.sqrt(np.var(pzz) * s / len(pzz))
fig, ax = plt.subplots(figsize=(6.5, 3))
ax.plot(t, pzz, lw=0.7)
ax.axhline(pzz.mean(), color="C1",
           label=f"mean = {pzz.mean():.3f} ± {err:.3f}")
ax.set_xlabel("MD step"); ax.set_ylabel(r"$\sigma_{zz}$ wall (LJ units)")
ax.legend(); fig.tight_layout()
print(f"statistical inefficiency: {s:.1f} "
      f"(~{len(pzz)/s:.0f} independent samples)")

# %% [markdown]
# ## The full multiscale loop
#
# Add an ``md:`` section to the GP input of tutorial 7 and the active
# learner calls MD instead of the mock — the complete configs are
# `examples/config/parabolic_1d_lj_gp_nanomd.yaml` (confined LJ) and
# `examples/config/journal_1d_gold-pentane_gp_native.yaml`
# (gold/alkane):
#
# ```yaml
# properties:
#     EOS: MD            # pressure AND wall stress from the GP/MD data
#     shear: 2.129
#     rho0: 0.8
# gp:
#     press: {atol: 0.1, rtol: 0.05, obs_stddev: 0.01, max_steps: 5}
#     shear: {atol: 0.1, rtol: 0.05, obs_stddev: 0.001, max_steps: 5}
# db:
#     init_size: 4
#     init_method: lhc
# md:
#     system: lj          # or 'mol' for gold/alkane
#     engine: native      # bundled nanomd; 'lammps' for the reference path
#     ncpu: 4             # OpenMP threads for the MD run
#     infile: examples/lmp/lj/in.run
#     wallfile: examples/lmp/lj/wall.data
#     tsample: 100000
# ```
#
# For the gold/alkane system the native path assembles the data file
# directly (`gapflow_tpu/md/molbuild.py`: FCC gold slabs + TraPPE-UA
# chains packed at the target density) and `nanomd` integrates it with
# FD-validated forces; `md: wall: eam` selects tabulated EAM gold
# (the reference default) over ``lj/cut`` walls.
#
# The whole machinery — MD runs between compiled GP-surrogate chunks —
# is exercised end-to-end on tiny settings in
# `tests/test_multiscale_e2e.py` and `tests/test_mol_native.py`.
