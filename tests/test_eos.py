"""EOS sanity: sound speed equals autodiff derivative of pressure."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gapflow_tpu.models.eos import eos_pressure, eos_sound_velocity


PROPS = [
    {"EOS": "DH", "rho0": 877.7007, "P0": 101325., "C1": 3.5e10, "C2": 1.23},
    {"EOS": "PL", "rho0": 1.1853, "P0": 101325., "alpha": 0.},
    {"EOS": "vdW", "M": 39.948, "T": 100., "a": 1.355, "b": 0.03201},
    {"EOS": "MT", "rho0": 700., "P0": 0.101e6, "K": 0.557e9, "n": 7.33},
    {"EOS": "cubic", "a": 15.2, "b": -9.6, "c": 3.35, "d": -0.07},
    {"EOS": "BWR", "T": 2., "gamma": 3.},
    {"EOS": "Bayada", "rho_l": 850., "rho_v": 0.019, "c_l": 1600., "c_v": 352.},
]

_RHO_RANGES = {
    "DH": (800., 950.), "PL": (1.0, 1.4), "vdW": (1., 40.),
    "MT": (650., 760.), "cubic": (0.6, 1.0), "BWR": (0.5, 0.9),
    # stay inside one branch of the cavitation model for differentiability
    "Bayada": (851., 900.),
}


@pytest.mark.parametrize("prop", PROPS, ids=lambda p: p["EOS"])
def test_sound_speed_is_dp_drho(prop):
    lo, hi = _RHO_RANGES[prop["EOS"]]
    rho = jnp.linspace(lo, hi, 16)

    c = eos_sound_velocity(rho, prop)
    dp = jax.vmap(jax.grad(lambda r: eos_pressure(r, prop)))(rho)

    np.testing.assert_allclose(np.asarray(c), np.sqrt(np.asarray(dp)),
                               rtol=1e-8)


def test_bayada_branches():
    prop = PROPS[-1]
    rho_l, rho_v = prop["rho_l"], prop["rho_v"]
    # liquid branch (alpha < 0), mixture (0<=alpha<=1), vapor (alpha > 1)
    rho = jnp.array([rho_l + 10., (rho_l + rho_v) / 2., rho_v / 2.])
    p = np.asarray(eos_pressure(rho, prop))
    assert np.all(np.isfinite(p))
    c = np.asarray(eos_sound_velocity(rho, prop))
    assert np.isclose(c[0], prop["c_l"])
    assert np.isclose(c[2], prop["c_v"])


def test_dh_density_clamp():
    prop = PROPS[0]
    p_hi = eos_pressure(jnp.array(prop["C2"] * prop["rho0"] * 2.), prop)
    assert np.isfinite(float(p_hi))
