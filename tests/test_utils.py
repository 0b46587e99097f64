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
