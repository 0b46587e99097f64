"""Constitutive model classes: pressure, wall stress and bulk stress.

Each model owns its output field(s) in the host :class:`FieldCollection` and
can run in two modes: deterministic (analytic EOS / Newtonian closures with
piezoviscous and shear-thinning corrections) or GP-surrogate (trained
on-the-fly from the MD training database).

Field conventions (parity with reference GaPFlow/models/stress.py:44-623):
the xz and yz wall-stress fields each store 12 Voigt components
(6 bottom + 6 top); the shared components (xx, yy, zz, xy) are stored
*halved* so that summing the two fields reconstructs the full wall stress
used by the source term.
"""

import numpy as np

import jax
import jax.numpy as jnp
from jax import vmap, grad

from .gp import GaussianProcessSurrogate, kernel_fn
from .eos import eos_pressure, eos_sound_velocity
from .viscous import stress_bottom, stress_top, stress_avg
from .viscosity import piezoviscosity, shear_thinning_factor, shear_rate_avg


def _effective_viscosity(prop, geo, pressure, rho, height, dp_dx, dp_dy):
    """Shear viscosity with optional piezoviscous / shear-thinning factors."""
    if "piezo" in prop:
        arg = rho if prop["EOS"] == "Bayada" else pressure
        mu0 = piezoviscosity(arg, prop["shear"], prop["piezo"])
    else:
        mu0 = prop["shear"]

    if "thinning" in prop:
        rate = shear_rate_avg(dp_dx, dp_dy, height, geo["U"], geo["V"], mu0)
        return mu0 * shear_thinning_factor(rate, mu0, prop["thinning"])
    return mu0


class WallStress(GaussianProcessSurrogate):
    """Wall shear stress model for the xz ('x') or yz ('y') plane."""

    def __init__(self, fc, prop, geo, direction="x", data=None, gp=None):
        self.__field = fc.real_field(f"wall_stress_{direction}z", (12,))
        self.__pressure = fc.get_real_field("pressure")
        self.__x = fc.get_real_field("x")
        self.__y = fc.get_real_field("y")

        self.geo = geo
        self.prop = prop
        self.name = f"{direction}z"
        self._out_index = {"x": 4, "y": 3}[direction]

        if gp is not None:
            self.active_dims = {"x": gp.get("active_dims_x", [0, 1, 3]),
                                "y": gp.get("active_dims_y", [0, 2, 3])}[direction]
            self.__field_variance = fc.real_field(f"wall_stress_{direction}z_var")
            self.atol = gp["atol"]
            self.rtol = gp["rtol"]
            self.max_steps = gp["max_steps"]
            self.pause_steps = gp["pause_steps"]
            self.al_candidates = gp.get("al_candidates", 0)
            self.is_gp_model = True
            self.use_active_learning = gp["active_learning"]
        else:
            self.is_gp_model = False
            self.use_active_learning = False

        super().__init__(fc, data)

    # -- field views --------------------------------------------------------
    @property
    def full(self):
        return self.__field.p

    @property
    def upper(self):
        return self.__field.p[6:]

    @property
    def lower(self):
        return self.__field.p[:6]

    @property
    def variance(self):
        return self.__field_variance.p

    @property
    def pressure(self):
        return self.__pressure.p

    @property
    def dp_dx(self):
        return np.gradient(self.pressure, self.__x.p[:, 0], axis=0)

    @property
    def dp_dy(self):
        return np.gradient(self.pressure, self.__y.p[0, :], axis=1)

    # -- GP data plumbing ---------------------------------------------------
    @property
    def Xtest(self):
        return (self._Xtest / self.database.X_scale)[:, self.active_dims]

    @property
    def Xtrain(self):
        # sliced to the last fit size: the shared database may have grown
        # through the other surrogate's active learning since our fit
        n = self.last_fit_train_size or self.database.size
        return self.database.Xtrain[:n, self.active_dims]

    @property
    def _Ytrain(self):
        n = self.last_fit_train_size
        i = self._out_index
        return jnp.vstack([self.database._Ytrain[:n, i + 1],
                           self.database._Ytrain[:n, i + 7]]).T

    @property
    def Ytrain(self):
        return self._Ytrain / self.Yscale

    @property
    def Yscale(self):
        idx = jnp.array([self._out_index + 1, self._out_index + 7], dtype=int)
        return jnp.max(self.database.Y_scale[idx])

    @property
    def Yerr(self):
        n = self.last_fit_train_size
        i = self._out_index
        Yerr_all = jnp.vstack([self.database._Ytrain_err[:n, i + 1],
                               self.database._Ytrain_err[:n, i + 7]]).T
        return jnp.mean(Yerr_all / self.Yscale)

    # -- updates ------------------------------------------------------------
    def init(self):
        if self.is_gp_model:
            self.params_init = {
                "log_amp": jnp.log(1.),
                "log_scale": jnp.log(jnp.std(self.Xtrain, axis=0)),
            }
            self._train()
            self._infer()

    def update(self, predictor=False, compute_var=False):
        eta = _effective_viscosity(
            self.prop, self.geo, self.pressure, self.solution[0], self.height,
            self.dp_dx if "thinning" in self.prop else 0.,
            self.dp_dy if "thinning" in self.prop else 0.)

        s_bot = np.asarray(stress_bottom(
            self.solution, self.height_and_slopes, self.geo["U"],
            self.geo["V"], eta, self.prop["bulk"], self.extra))
        s_top = np.asarray(stress_top(
            self.solution, self.height_and_slopes, self.geo["U"],
            self.geo["V"], eta, self.prop["bulk"], self.extra))

        f = self.__field.p
        f[:3] = s_bot[:3] / 2.
        f[6:9] = s_top[:3] / 2.
        f[5] = s_bot[-1] / 2.
        f[11] = s_top[-1] / 2.

        if self.is_gp_model:
            mean, var = self.predict(predictor=predictor,
                                     compute_var=compute_var)
            f[self._out_index] = np.asarray(mean[0])
            f[self._out_index + 6] = np.asarray(mean[1])
            self.__field_variance.p[...] = np.asarray(var)
        else:
            f[self._out_index] = s_bot[self._out_index]
            f[self._out_index + 6] = s_top[self._out_index]


class BulkStress(GaussianProcessSurrogate):
    """Gap-averaged in-plane viscous stress (always deterministic)."""

    name = "bulk"

    def __init__(self, fc, prop, geo, data=None, gp=None):
        self.__field = fc.real_field("bulk_viscous_stress", (3,))
        self.__pressure = fc.get_real_field("pressure")
        self.__x = fc.get_real_field("x")
        self.__y = fc.get_real_field("y")

        self.geo = geo
        self.prop = prop
        self.is_gp_model = False
        self.use_active_learning = False

        super().__init__(fc, data)

    @property
    def stress(self):
        return self.__field.p

    @property
    def pressure(self):
        return self.__pressure.p

    @property
    def dp_dx(self):
        return np.gradient(self.pressure, self.__x.p[:, 0], axis=0)

    @property
    def dp_dy(self):
        return np.gradient(self.pressure, self.__y.p[0, :], axis=1)

    # unused abstract hooks (deterministic only)
    Xtrain = Ytrain = Xtest = Yscale = Yerr = None

    def update(self):
        eta = _effective_viscosity(
            self.prop, self.geo, self.pressure, self.solution[0], self.height,
            self.dp_dx if "thinning" in self.prop else 0.,
            self.dp_dy if "thinning" in self.prop else 0.)

        self.__field.p[...] = np.asarray(stress_avg(
            self.solution, self.height_and_slopes, self.geo["U"],
            self.geo["V"], eta, self.prop["bulk"], self.extra))


@jax.jit
def _gp_vsound(params, X, alpha, Xtest, yscale, xscale0):
    """Jitted GP sound speed: one device dispatch for the whole
    vmap(grad(mean)) sweep.  Eager execution here costs hundreds of
    sequential tunnel round trips (adaptive host loops call this every
    step; the device-chunk driver once per chunk)."""

    def eos_mean(x):
        Ks = kernel_fn(params, X, x[None, :])
        return (Ks.T @ alpha).squeeze()

    dmean = vmap(grad(eos_mean))(Xtest)[:, 0]
    return jnp.sqrt(dmean.max() * yscale / xscale0)


class Pressure(GaussianProcessSurrogate):
    """Pressure model: analytic EOS or GP surrogate of the MD pressure."""

    name = "zz"

    def __init__(self, fc, prop, geo, data=None, gp=None):
        self.__field = fc.get_real_field("pressure")
        self.geo = geo
        self.prop = prop

        if gp is not None:
            self.active_dims = gp.get("active_dims", [0, 3])
            self.__field_variance = fc.real_field("pressure_var")
            self.atol = gp["atol"]
            self.rtol = gp["rtol"]
            self.max_steps = gp["max_steps"]
            self.pause_steps = gp["pause_steps"]
            self.al_candidates = gp.get("al_candidates", 0)
            self.is_gp_model = True
            self.use_active_learning = gp["active_learning"]
        else:
            self.is_gp_model = False
            self.use_active_learning = False

        super().__init__(fc, data)

    @property
    def pressure(self):
        return self.__field.p

    @property
    def variance(self):
        return self.__field_variance.p

    @property
    def v_sound(self):
        """Max sound speed: analytic EOS derivative, or autodiff of the GP mean."""
        if not self.is_gp_model:
            return float(np.max(np.asarray(
                eos_sound_velocity(self.solution[0], self.prop))))

        self._ensure_conditioned()
        _, alpha, _ = self.cond_gp
        return _gp_vsound(self.params, self._X_at_fit, alpha, self.Xtest,
                          jnp.asarray(self.Yscale),
                          jnp.asarray(self.database.X_scale[0]))

    @property
    def Xtest(self):
        return (self._Xtest / self.database.X_scale)[:, self.active_dims]

    @property
    def Xtrain(self):
        n = self.last_fit_train_size or self.database.size
        return self.database.Xtrain[:n, self.active_dims]

    @property
    def _Ytrain(self):
        return self.database._Ytrain[:self.last_fit_train_size, 0]

    @property
    def Ytrain(self):
        return self._Ytrain / self.Yscale

    @property
    def Yscale(self):
        return self.database.Y_scale[0]

    @property
    def Yerr(self):
        return jnp.mean(self.database.Ytrain_err[:self.last_fit_train_size, 0])

    def init(self):
        if self.is_gp_model:
            self.params_init = {
                "log_amp": jnp.log(1.),
                "log_scale": jnp.log(jnp.std(self.Xtrain, axis=0)),
            }
            self._train()
            self._infer()

    def update(self, predictor=False, compute_var=False):
        if self.is_gp_model:
            mean, var = self.predict(predictor=predictor,
                                     compute_var=compute_var)
            self.__field.p[...] = np.asarray(mean)
            self.__field_variance.p[...] = np.asarray(var)
        else:
            self.__field.p[...] = np.asarray(
                eos_pressure(self.solution[0], self.prop))
