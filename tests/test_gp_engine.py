"""GP math layer: NLML gradients, shared-factorization refit, rank-1 update."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from gapflow_tpu.models.gp import (kernel_fn, kernel_gram, gp_condition,
                                   gp_predict_mean_var, nlml, gp_refit,
                                   gp_append, fit_hyperparameters,
                                   fit_hyperparameters_jax)


@pytest.fixture
def data():
    key = jax.random.key(1)
    k1, k2 = jax.random.split(key)
    X = jax.random.uniform(k1, (50, 3))
    Y = jnp.sin(3. * X[:, 0]) + 0.5 * X[:, 1] ** 2
    Xtest = jax.random.uniform(k2, (20, 3))
    params = {"log_amp": jnp.asarray(0.3),
              "log_scale": jnp.asarray([-0.2, 0.1, 0.4])}
    return params, X, Y, Xtest


def test_kernel_gram_consistency(data):
    params, X, _, Xtest = data
    K1 = np.asarray(kernel_fn(params, X, X))
    K2 = np.asarray(kernel_gram(params, X))
    np.testing.assert_allclose(K1, K2, rtol=1e-10, atol=1e-12)
    np.testing.assert_allclose(np.diag(K2), np.exp(0.3))


def test_nlml_gradient_matches_fd(data):
    params, X, Y, _ = data
    g = jax.grad(nlml)(params, X, Y, 0.05)
    eps = 1e-6
    p_plus = dict(params, log_amp=params["log_amp"] + eps)
    p_minus = dict(params, log_amp=params["log_amp"] - eps)
    fd = (nlml(p_plus, X, Y, 0.05) - nlml(p_minus, X, Y, 0.05)) / (2 * eps)
    assert abs(float(g["log_amp"]) - float(fd)) < 1e-4 * max(1., abs(float(fd)))


def test_analytic_gradient_matches_ad(data):
    """gp_refit's closed-form NLML gradient equals reverse-mode AD."""
    params, X, Y, _ = data
    _, grad, _ = gp_refit(params, X, Y, 0.05)
    g_ad = jax.grad(nlml)(params, X, Y, 0.05)
    np.testing.assert_allclose(float(grad["log_amp"]),
                               float(g_ad["log_amp"]), rtol=1e-7)
    np.testing.assert_allclose(np.asarray(grad["log_scale"]),
                               np.asarray(g_ad["log_scale"]), rtol=1e-7)

    # multi-output: gradient sums over columns sharing one kernel
    Y2 = jnp.stack([Y, 2. * Y - 1.], axis=1)
    _, grad2, _ = gp_refit(params, X, Y2, 0.05)
    g_ad2 = jax.grad(nlml)(params, X, Y2, 0.05)
    np.testing.assert_allclose(np.asarray(grad2["log_scale"]),
                               np.asarray(g_ad2["log_scale"]), rtol=1e-7)


def test_refit_matches_separate_calls(data):
    params, X, Y, _ = data
    val, grad, cache = gp_refit(params, X, Y, 0.05)
    assert np.isclose(float(val), float(nlml(params, X, Y, 0.05)))
    Linv, alpha, _ = gp_condition(params, X, Y, 0.05)
    np.testing.assert_allclose(np.asarray(cache[0]), np.asarray(Linv),
                               rtol=1e-10, atol=1e-12)
    np.testing.assert_allclose(np.asarray(cache[1]), np.asarray(alpha),
                               rtol=1e-8, atol=1e-10)


def test_rank1_append_matches_full_recondition(data):
    params, X, Y, Xtest = data
    cache = gp_condition(params, X, Y, 0.05)

    x_new = jnp.asarray([0.5, 0.25, 0.75])
    y_new = jnp.asarray(0.42)
    Y_full = jnp.concatenate([Y, y_new[None]])

    X_up, cache_up = gp_append(params, X, cache, Y_full, x_new, 0.05)

    X_ref = jnp.vstack([X, x_new[None, :]])
    cache_ref = gp_condition(params, X_ref, Y_full, 0.05)

    m1, v1 = gp_predict_mean_var(params, X_up, cache_up, Xtest)
    m2, v2 = gp_predict_mean_var(params, X_ref, cache_ref, Xtest)
    np.testing.assert_allclose(np.asarray(m1), np.asarray(m2),
                               rtol=1e-8, atol=1e-10)
    np.testing.assert_allclose(np.asarray(v1), np.asarray(v2),
                               rtol=1e-7, atol=1e-10)


def test_trainers_reduce_nlml(data):
    params, X, Y, _ = data
    v0 = float(nlml(params, X, Y, 0.05))

    p_scipy, v_scipy = fit_hyperparameters(params, X, Y, 0.05)
    assert v_scipy < v0

    p_jax, v_jax = fit_hyperparameters_jax(params, X, Y, 0.05,
                                           lr=0.05, steps=150)
    assert float(v_jax) < v0


def test_al_candidate_subsampling(tmp_path):
    """AL with a bounded candidate set still acquires and converges."""
    from gapflow_tpu import Problem

    sim = f"""
options:
    output: {tmp_path}
    write_freq: 100
    use_tstamp: False
    silent: True
grid:
    Lx: 1470.
    Ly: 1.
    Nx: 100
    Ny: 1
geometry:
    type: parabolic
    hmin: 12.
    hmax: 60.
    U: 0.12
    V: 0.
numerics:
    CFL: 0.5
    adaptive: 1
    tol: 1e-8
    dt: 0.05
    max_it: 5_000
properties:
    shear: 2.15
    bulk: 0.
    EOS: BWR
    T: 1.0
    rho0: 0.8
gp:
    press:
        fix_noise: True
        atol: .7
        rtol: 0.
        obs_stddev: 2.e-2
        max_steps: 5
        active_learning: True
        al_candidates: 16
    shear:
        fix_noise: True
        atol: .9
        rtol: 0.
        obs_stddev: 4.e-3
        max_steps: 5
        active_learning: True
        al_candidates: 16
db:
    init_size: 3
    init_method: rand
    dtool_path: {tmp_path}/train
"""
    p = Problem.from_string(sim)
    p._pre_run()
    size0 = p.database.size
    for _ in range(2):
        p.update()
    # acquisitions happened from the subsampled candidate set
    assert p.database.size > size0
    assert p.q_is_valid
