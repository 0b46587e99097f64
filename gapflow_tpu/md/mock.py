"""Fake MD oracle: analytic closures + seeded Gaussian noise, pure JAX.

Lets the entire GP / database / active-learning stack run without a real MD
engine; the continuum solver keeps its analytic viscosities when the oracle
is a mock (Problem checks ``database.has_mock_md``).

Parity: reference GaPFlow/md/mock.py:33-107.
"""

import jax.numpy as jnp
import jax.random as jr

from .base import MolecularDynamics
from ..models.viscous import stress_bottom, stress_top
from ..models.eos import eos_pressure


class Mock(MolecularDynamics):
    """Mock oracle evaluating the implemented constitutive laws at X."""

    name = "mock"

    _ascii_art = "\n  [ mock oracle -- analytic closures + seeded noise ]\n"

    def __init__(self, prop, geo, gp):
        self.is_mock = True
        self.noise = (gp["press"]["obs_stddev"] if gp["press_gp"] else 0.,
                      gp["shear"]["obs_stddev"] if gp["shear_gp"] else 0.)
        self.num_worker = 0
        self.geo = geo
        self.prop = prop
        self.params = dict(prop)

    def build_input_files(self, dataset, location, X):
        self.X = X

    def read_output(self):
        key = jr.key(123)
        key, subkey = jr.split(key)
        noise_p = jr.normal(subkey) * self.noise[0]
        key, subkey = jr.split(subkey)
        noise_s0 = jr.normal(key) * self.noise[1]
        key, subkey = jr.split(subkey)
        noise_s1 = jr.normal(key) * self.noise[1]

        U, V = self.geo["U"], self.geo["V"]
        eta, zeta = self.prop["shear"], self.prop["bulk"]

        X = self.X
        tau_bot = stress_bottom(X[:3], X[3:6], U, V, eta, zeta, X[6]) + noise_s0
        tau_top = stress_top(X[:3], X[3:6], U, V, eta, zeta, X[6]) + noise_s1
        press = eos_pressure(X[0:1], self.prop) + noise_p

        Y = jnp.hstack([press, tau_bot, tau_top]).T
        Ye = jnp.array([
            self.noise[0],                       # p
            0., 0., 0.,                          # xx, yy, zz (bottom)
            self.noise[1], self.noise[1], 0.,    # yz, xz, xy (bottom)
            0., 0., 0.,                          # xx, yy, zz (top)
            self.noise[1], self.noise[1], 0.,    # yz, xz, xy (top)
        ])
        return Y, Ye
