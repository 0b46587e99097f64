"""YAML round-trip of numpy/jax containers through make_dumpable.

Mirrors reference tests/test_utils.py:39-61.
"""

import os

import numpy as np
import jax.numpy as jnp
import yaml

from gapflow_tpu.utils import make_dumpable


def test_make_dumpable(tmp_path):
    Aj = jnp.array([1., 3.5, 5.])
    Bn = np.random.randint(10, size=10).astype(float)

    output_dict = {"A": Aj, "B": Bn, "b": np.mean(Bn), "s": "test_value"}
    formatted = make_dumpable(output_dict)

    fname = os.path.join(tmp_path, "file.yaml")
    with open(fname, "w") as fh:
        yaml.safe_dump(formatted, fh)
    with open(fname) as fh:
        loaded = yaml.safe_load(fh)

    assert np.allclose(loaded["A"], np.asarray(Aj))
    assert np.allclose(loaded["B"], Bn)
    assert np.isclose(loaded["b"], np.mean(Bn))
    assert loaded["s"] == "test_value"


def test_statistical_inefficiency_ar1():
    """The decorrelation factor of an AR(1) series matches its analytic
    value g = (1 + phi) / (1 - phi) (integrated autocorrelation of
    acf(t) = phi^t); the variance of the mean inflates accordingly."""
    import numpy as np
    from gapflow_tpu.md.utils import (statistical_inefficiency,
                                      variance_of_mean)

    phi = 0.8
    rng = np.random.default_rng(7)
    n = 200_000
    eps = rng.standard_normal(n)
    x = np.empty(n)
    x[0] = eps[0]
    for i in range(1, n):
        x[i] = phi * x[i - 1] + eps[i]

    g = statistical_inefficiency(x, mintime=1)
    g_exact = (1 + phi) / (1 - phi)
    assert abs(g - g_exact) / g_exact < 0.15
    v = variance_of_mean(x, mintime=1)
    v_exact = np.var(x) / n * g_exact
    assert abs(v - v_exact) / v_exact < 0.15


def test_autocorr_func_normalization():
    """acf[0] == 1 and white noise decorrelates immediately."""
    import numpy as np
    from gapflow_tpu.md.utils import autocorr_func_1d

    rng = np.random.default_rng(3)
    acf = autocorr_func_1d(rng.standard_normal(50_000))
    assert acf[0] == 1.0
    assert np.abs(acf[1:100]).max() < 0.05
