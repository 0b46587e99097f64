"""The bench-embedded correctness checks (gapflow_tpu.validate) run and
discriminate: the Pallas-vs-XLA comparator is exercised end-to-end via
interpret mode on CPU (on TPU, bench.py runs it Mosaic-compiled)."""

import numpy as np

from gapflow_tpu import validate


def _clear_kernel_caches():
    from gapflow_tpu.ops import stencil
    stencil.make_pallas_loop.cache_clear()
    stencil.make_pallas_step.cache_clear()
    stencil._make_call.cache_clear()


def test_pallas_vs_xla_err_small():
    from jax.experimental.pallas import tpu as pltpu

    with pltpu.force_tpu_interpret_mode():
        _clear_kernel_caches()
        err = validate.pallas_vs_xla_err(nx=32, ny=128, n_steps=3)
        _clear_kernel_caches()
    assert err < 1e-5


def test_pallas_vs_xla_err_thinning_small():
    from jax.experimental.pallas import tpu as pltpu

    with pltpu.force_tpu_interpret_mode():
        _clear_kernel_caches()
        err = validate.pallas_vs_xla_err(
            nx=32, ny=128, n_steps=2,
            extra_props=", piezo: {name: Barus, aB: 2.e-9}, "
                        "thinning: {name: Eyring, tauE: 5.e5}")
        _clear_kernel_caches()
    assert err < 1e-5


def test_sommerfeld_solution_shape():
    x = np.linspace(0., 1., 64)
    p = validate.sommerfeld_solution(x, 1., 0.08, 0.1, 1e-2, 0.7, 1e5)
    assert p.shape == (64,)
    # antisymmetric-ish about the half circumference: max > P0 > min
    assert p.max() > 1e5 > p.min()


def test_ehl_kernel_bitexact_small():
    from jax.experimental.pallas import tpu as pltpu
    from gapflow_tpu.ops import stencil
    from gapflow_tpu.validate import ehl_kernel_bitexact

    with pltpu.force_tpu_interpret_mode():
        stencil.make_pallas_ehl_step.cache_clear()
        stencil.make_pallas_ehl_loop_step.cache_clear()
        stencil._make_call.cache_clear()
        out = ehl_kernel_bitexact(n_steps=2, nx=32, ny=128,
                                  dt_scale=0.01)
        stencil.make_pallas_ehl_step.cache_clear()
        stencil.make_pallas_ehl_loop_step.cache_clear()
        stencil._make_call.cache_clear()
    assert out["ok"], out
