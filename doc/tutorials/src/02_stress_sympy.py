# %% [markdown]
# # 2. Viscous stress tensor calculation with wall slip
#
# The macro solver (tutorial 1) needs the viscous stress tensor at the
# bottom wall, at the top wall, and gap-averaged — as functions of the
# gap-averaged state $q = (\bar\rho, \bar j_x, \bar j_y)$, the local gap
# height $h$, and the wall velocities.  This tutorial derives those
# closures symbolically, exactly the way
# `codegen/derive_closures.py` generates the production module
# `gapflow_tpu/models/_closures.py` (cf. Holey et al., Tribol. Lett. 70
# (2022); reference analogue: `doc/tutorials/02_stress_sympy.ipynb`).
#
# ## Velocity ansatz
#
# Across the gap we assume the standard lubrication profile — a
# quadratic Poiseuille part plus a linear Couette part:
#
# $$ u(z) = \frac{U_t - U_b}{h}\, z + U_b + a\, z (h - z), \qquad
#    z \in [0, h], $$
#
# with wall velocities $U_b$, $U_t$ and curvature $a$.  Wall slip enters
# through Navier conditions with slip length $L_s$:
#
# $$ U_b = U_{w,b} + L_s\, u'(0), \qquad U_t = U_{w,t} - L_s\, u'(h). $$
#
# The three unknowns $(a, U_b, U_t)$ are fixed by the two slip
# conditions and the flux constraint
# $ \bar j_x = \frac{\bar\rho}{h} \int_0^h u\, dz $ — a linear system we
# let sympy solve.

# %%
import sympy as sp

z, h, a, Ls, eta, zeta = sp.symbols("z h a L_s eta zeta", positive=True)
Ub, Ut, Uwb, Uwt = sp.symbols("U_b U_t U_wb U_wt")
rho, jx = sp.symbols("rho j_x")

u = (Ut - Ub) / h * z + Ub + a * z * (h - z)

flux = sp.Eq(jx, rho / h * sp.integrate(u, (z, 0, h)))
slip_bot = sp.Eq(Ub, Uwb + Ls * u.diff(z).subs(z, 0))
slip_top = sp.Eq(Ut, Uwt - Ls * u.diff(z).subs(z, h))

sol = sp.solve([flux, slip_bot, slip_top], [a, Ub, Ut], dict=True)[0]
u_sol = sp.simplify(u.subs(sol))
u_sol

# %% [markdown]
# ## Wall stresses
#
# For this tutorial we look at the dominant shear component
# $\tau_{xz} = \eta\, \partial_z u$ (the generated module carries the
# full Newtonian tensor
# $\tau_{ij} = \eta (u_{i,j} + u_{j,i}) + (\zeta - \tfrac{2}{3}\eta)
# u_{k,k} \delta_{ij}$ in Voigt order, including the $\partial_x$,
# $\partial_y$ terms through the state gradients).

# %%
tau_xz = eta * u_sol.diff(z)
tau_bot = sp.simplify(tau_xz.subs(z, 0))
tau_top = sp.simplify(tau_xz.subs(z, h))
tau_avg = sp.simplify(sp.integrate(tau_xz, (z, 0, h)) / h)
print("tau_xz(0)   =", tau_bot)
print("tau_xz(h)   =", tau_top)
print("<tau_xz>    =", tau_avg)

# %% [markdown]
# With $L_s = 0$ these collapse to the familiar no-slip results
# $\tau_{xz}(0) = \eta\,(U_t - U_b)/h \mp 6\eta\,(\bar j_x/\bar\rho -
# (U_b+U_t)/2)/h$; the gap-average keeps only the Couette part (the
# Poiseuille contribution integrates to zero).

# %%
print("no slip, bottom:", sp.simplify(tau_bot.subs(Ls, 0)))
print("no slip, average:", sp.simplify(tau_avg.subs(Ls, 0)))

# %% [markdown]
# ## Checking against the generated production code
#
# `gapflow_tpu/models/_closures.py` is emitted by
# `codegen/derive_closures.py` from this very derivation (full tensor,
# four slip modes, CSE-factored for the TPU).  Lambdify the symbolic
# result and compare with the production dispatch.

# %%
import numpy as np
from gapflow_tpu.models.viscous import stress_bottom, stress_top

f_bot = sp.lambdify((rho, jx, h, Uwb, Uwt, eta, Ls), tau_bot)

rho_v, jx_v, h_v, U_v, Ls_v, eta_v = 850.0, 42.5, 1e-6, 2.0, 3e-8, 1e-2
q = np.array([rho_v, jx_v, 0.0])
hvec = np.array([h_v, 0.0, 0.0])    # (h, dh/dx, dh/dy)

# production closure: slip='both' means Navier slip at both walls with
# the same Ls; the convention is a bottom wall sliding at U under a
# stationary top wall.
tau6 = stress_bottom(q, hvec, U=U_v, V=0.0, eta=eta_v, zeta=0.0, Ls=Ls_v,
                     slip="both")
sym = f_bot(rho_v, jx_v, h_v, U_v, 0.0, eta_v, Ls_v)
print("generated tau_xz(0):", float(tau6[4]))
print("sympy     tau_xz(0):", float(sym))
np.testing.assert_allclose(float(tau6[4]), float(sym), rtol=1e-12)

# %% [markdown]
# ## z-resolved profiles
#
# The same generated module provides the full velocity and stress
# profiles across the gap — used by the test suite to verify flux
# consistency ($\frac{\bar\rho}{h}\int u\,dz = \bar j_x$), wall values,
# and gap averages for every slip mode.

# %%
import matplotlib.pyplot as plt
from gapflow_tpu.models.profiles import (get_velocity_profiles,
                                         get_stress_profiles)

zz = np.linspace(0, h_v, 200)
fig, ax = plt.subplots(1, 2, figsize=(9, 3.2), sharey=True)
for mode in ("none", "both"):
    uu, vv = get_velocity_profiles(zz, q, Ls=Ls_v, U=U_v, V=0.0, slip=mode)
    ax[0].plot(np.asarray(uu), zz * 1e6, label=f"slip={mode}")
    taus = get_stress_profiles(zz, hvec, q, np.zeros(3), np.zeros(3),
                               U=U_v, V=0.0, eta=eta_v, zeta=0.0,
                               Ls=Ls_v, mode=mode)
    ax[1].plot(np.asarray(taus[4]) / 1e3, zz * 1e6, label=f"slip={mode}")
ax[0].set_xlabel("u(z) (m/s)"); ax[0].set_ylabel("z (µm)")
ax[1].set_xlabel(r"$\tau_{xz}(z)$ (kPa)")
ax[0].legend(); fig.tight_layout()

# flux consistency: the ansatz must reproduce the prescribed flux
# (u(z) is quadratic, so a fine trapezoid grid integrates it to ~1e-8)
zf = np.linspace(0, h_v, 20001)
u_noslip, _ = get_velocity_profiles(zf, q, Ls=0.0, U=U_v, V=0.0, slip="none")
flux_num = np.trapezoid(np.asarray(u_noslip), zf) / h_v * rho_v
print("flux from profile:", flux_num, " prescribed:", jx_v)
np.testing.assert_allclose(flux_num, jx_v, rtol=1e-6)

# %% [markdown]
# The slip profile translates the velocity at both walls and softens the
# wall shear stress — at nanometre gaps this is the first continuum
# correction that MD data demands.  Tutorial 4 looks at confined fluids
# where even this breaks down, and tutorials 7–8 learn the stresses
# directly.
