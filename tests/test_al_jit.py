"""Jit-native padded active learning vs the dense GP reference path."""

import numpy as np
import jax
import jax.numpy as jnp

from gapflow_tpu.models import al_jit
from gapflow_tpu.models.gp import gp_condition, gp_predict_mean_var


def _data(n0=12, d=2, seed=0):
    key = jax.random.key(seed)
    k1, k2 = jax.random.split(key)
    X0 = jax.random.uniform(k1, (n0, d))
    Y0 = jnp.sin(4. * X0[:, 0]) + 0.3 * X0[:, 1]
    Xtest = jax.random.uniform(k2, (40, d))
    params = {"log_amp": jnp.asarray(0.1),
              "log_scale": jnp.asarray([-0.5, 0.0])}
    return params, X0, Y0, Xtest


def test_padded_predict_matches_dense():
    params, X0, Y0, Xtest = _data()
    yerr = 0.05

    gp = al_jit.init(params, capacity=32, X0=X0, Y0=Y0, yerr=yerr)
    m_pad, v_pad = al_jit.predict(gp, Xtest)

    cache = gp_condition(params, X0, Y0, yerr)
    m_ref, v_ref = gp_predict_mean_var(params, X0, cache, Xtest)

    np.testing.assert_allclose(np.asarray(m_pad), np.asarray(m_ref),
                               rtol=1e-8, atol=1e-10)
    np.testing.assert_allclose(np.asarray(v_pad), np.asarray(v_ref),
                               rtol=1e-7, atol=1e-10)


def test_padded_append_matches_dense():
    params, X0, Y0, Xtest = _data()
    yerr = 0.05

    gp = al_jit.init(params, capacity=32, X0=X0, Y0=Y0, yerr=yerr)
    x_new = jnp.asarray([0.5, 0.5])
    y_new = jnp.asarray(0.7)
    gp = al_jit.append(gp, x_new, y_new)
    assert int(gp.count) == 13

    X1 = jnp.vstack([X0, x_new[None, :]])
    Y1 = jnp.concatenate([Y0, y_new[None]])
    cache = gp_condition(params, X1, Y1, yerr)
    m_ref, v_ref = gp_predict_mean_var(params, X1, cache, Xtest)

    m_pad, v_pad = al_jit.predict(gp, Xtest)
    np.testing.assert_allclose(np.asarray(m_pad), np.asarray(m_ref),
                               rtol=1e-8, atol=1e-10)
    np.testing.assert_allclose(np.asarray(v_pad), np.asarray(v_ref),
                               rtol=1e-6, atol=1e-9)


def test_masked_analytic_gradient_matches_ad():
    """Analytic masked NLML gradient equals AD through masked_nlml."""
    params, X0, Y0, _ = _data()
    yerr = 0.05
    gp = al_jit.init(params, capacity=32, X0=X0, Y0=Y0, yerr=yerr)

    val, grad = al_jit.masked_nlml_value_and_grad(
        params, gp.X, gp.Y, gp.count, gp.yerr)
    v_ad, g_ad = jax.value_and_grad(al_jit.masked_nlml)(
        params, gp.X, gp.Y, gp.count, gp.yerr)

    np.testing.assert_allclose(float(val), float(v_ad), rtol=1e-10)
    np.testing.assert_allclose(float(grad["log_amp"]),
                               float(g_ad["log_amp"]), rtol=1e-7)
    np.testing.assert_allclose(np.asarray(grad["log_scale"]),
                               np.asarray(g_ad["log_scale"]), rtol=1e-7)


def test_masked_nlml_matches_dense():
    from gapflow_tpu.models.gp import nlml
    params, X0, Y0, _ = _data()
    yerr = 0.05
    gp = al_jit.init(params, capacity=32, X0=X0, Y0=Y0, yerr=yerr)
    v_pad = float(al_jit.masked_nlml(params, gp.X, gp.Y, gp.count, yerr))
    v_ref = float(nlml(params, X0, Y0, yerr))
    assert abs(v_pad - v_ref) < 1e-6 * max(1., abs(v_ref))


def test_full_jitted_al_loop():
    """The whole acquisition loop compiles and reduces predictive variance."""
    params, X0, Y0, Xtest = _data()
    yerr = 0.02

    def truth(x):
        return jnp.sin(4. * x[0]) + 0.3 * x[1]

    gp0 = al_jit.init(params, capacity=64, X0=X0, Y0=Y0, yerr=yerr)
    _, var0 = al_jit.predict(gp0, Xtest)

    @jax.jit
    def run(gp):
        return al_jit.active_learning_loop(
            gp, Xtest, truth, tol=1e-4, max_steps=15,
            refit_every=5, refit_steps=20)

    gp, mean, var = run(gp0)

    assert int(gp.count) > 12                     # acquisitions happened
    assert float(jnp.max(var)) < float(jnp.max(var0))
    # surrogate approximates the truth at test points
    truth_vals = jax.vmap(truth)(Xtest)
    err = float(jnp.abs(mean - truth_vals).max())
    assert err < 0.2


def test_al_loop_with_io_callback_oracle():
    """External (host) MD oracle through io_callback inside the jitted loop."""
    import numpy as onp
    from jax.experimental import io_callback

    params, X0, Y0, Xtest = _data()
    yerr = 0.02

    calls = []

    def host_oracle(x):
        # stands in for an external MD engine run on the host
        x = onp.asarray(x)
        calls.append(x.copy())
        return onp.float64(onp.sin(4. * x[0]) + 0.3 * x[1])

    def acquire(x):
        return io_callback(host_oracle,
                           jax.ShapeDtypeStruct((), Y0.dtype), x)

    gp0 = al_jit.init(params, capacity=64, X0=X0, Y0=Y0, yerr=yerr)

    @jax.jit
    def run(gp):
        return al_jit.active_learning_loop(
            gp, Xtest, acquire, tol=1e-4, max_steps=6,
            refit_every=3, refit_steps=10)

    gp, mean, var = run(gp0)

    assert int(gp.count) > 12          # the host oracle was consulted
    assert len(calls) > 0
    assert float(jnp.max(var)) < float(jnp.max(
        al_jit.predict(gp0, Xtest)[1]))
