"""Fake MD oracle: analytic closures + deterministic per-sample noise.

Lets the entire GP / database / active-learning stack run without a real MD
engine; the continuum solver keeps its analytic viscosities when the oracle
is a mock (Problem checks ``database.has_mock_md``).

Observable contract (parity surface with reference GaPFlow/md/mock.py):
``read_output`` returns the 13-vector ``Y = [p, tau_bot(6 Voigt),
tau_top(6 Voigt)]`` evaluated from the analytic closures at the stored
feature vector X, perturbed by Gaussian noise of the configured
``obs_stddev``, plus the matching error-bar vector ``Yerr``.

Implementation here (deliberately different from the reference's fixed
global seed): the noise key is derived from the *content* of X, so every
distinct training sample receives its own reproducible draw — re-running
the same acquisition reproduces the same database, while different samples
see independent scatter (what a real MD oracle produces).  Noise is applied
only to the components whose error bars are nonzero: the pressure (index 0)
and the yz/xz wall shear components (indices 4, 5, 10, 11) — exactly the
set any GP surrogate observes.
"""

import zlib

import numpy as np
import jax.numpy as jnp
import jax.random as jr

from .base import MolecularDynamics
from ..models.viscous import stress_bottom, stress_top
from ..models.eos import eos_pressure

_BASE_SEED = 0x6A9F10  # arbitrary fixed constant: reproducibility anchor

# Y layout: [p, bot xx yy zz yz xz xy, top xx yy zz yz xz xy]
_NOISY_PRESSURE = np.array([0])
_NOISY_SHEAR = np.array([4, 5, 10, 11])


def _sample_key(X):
    """Deterministic PRNG key derived from the feature vector's bytes."""
    digest = zlib.crc32(np.asarray(X, dtype=np.float64).tobytes())
    return jr.fold_in(jr.key(_BASE_SEED), digest)


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

    @property
    def _sigma(self):
        """13-vector of per-component observation stddevs."""
        sig = np.zeros(13)
        sig[_NOISY_PRESSURE] = self.noise[0]
        sig[_NOISY_SHEAR] = self.noise[1]
        return jnp.asarray(sig)

    def read_output(self):
        X = self.X
        U, V = self.geo["U"], self.geo["V"]
        eta, zeta = self.prop["shear"], self.prop["bulk"]

        clean = jnp.concatenate([
            eos_pressure(X[0:1], self.prop),
            stress_bottom(X[:3], X[3:6], U, V, eta, zeta, X[6]),
            stress_top(X[:3], X[3:6], U, V, eta, zeta, X[6]),
        ])

        sigma = self._sigma
        draws = jr.normal(_sample_key(X), (13,), dtype=clean.dtype)
        return clean + sigma * draws, sigma
