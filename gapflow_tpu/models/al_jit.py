"""Jit-native active learning: fixed-shape padded GP growing inside XLA.

The reference's active-learning loop is host-driven: every acquisition
re-enters Python, re-trains with scipy, and re-uploads arrays (reference
GaPFlow/models/gp.py:419-506).  On TPU that pattern pays dispatch latency
per acquisition.  This module recasts the whole loop as compiled code:

- the training set lives in **fixed-capacity padded buffers** (`capacity`
  rows); inactive rows are masked to an identity block in the kernel
  matrix, so all shapes are static and nothing retraces as data grows;
- acquisitions append via the **O(n^2) Cholesky row update** (no
  refactorization) at a traced index, carried on the *inverse* factor
  L^{-1} so the update and all predictions are matmuls (MXU) rather
  than sequential triangular solves (see gapflow_tpu.models.gp);
- hyperparameter refits are a fixed number of Adam steps on the masked
  NLML, fully on-device;
- the MD oracle enters through a user-supplied ``acquire_fn(x) -> y``:
  pure-JAX for the mock oracle (the whole loop then jit-compiles), or an
  ``io_callback`` wrapper for a real external MD engine.

The masking trick: with padded rows made identity (K_pad = I block,
Y_pad = 0), chol(blockdiag(K, I)) = blockdiag(chol(K), I) and its
inverse is blockdiag(chol(K)^{-1}, I); padded alpha rows are zero, and
predictions/NLML gradients over the active block are exact — verified
against the dense reference path in tests/test_al_jit.py.
"""

from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax import lax

from .gp import (kernel_fn, _invert_cholesky, _weights_from_inv,
                 _HI, _nlml_core)


class PaddedGP(NamedTuple):
    """Fixed-capacity GP state (a pytree; safe through jit/scan/cond)."""

    params: dict          # {log_amp, log_scale}
    X: jnp.ndarray        # (capacity, d) inputs; rows >= count are padding
    Y: jnp.ndarray        # (capacity,) or (capacity, m) targets; padding = 0
    count: jnp.ndarray    # () int32: number of active rows
    Linv: jnp.ndarray     # (capacity, capacity) INVERSE Cholesky factor
    alpha: jnp.ndarray    # like Y: K^{-1} Y with padding rows = 0
    yerr: jnp.ndarray     # () observation noise std


def _row_mask(capacity, count, dtype):
    return (jnp.arange(capacity) < count).astype(dtype)


def masked_gram(params, X, count, yerr):
    """Kernel matrix with inactive rows/cols replaced by an identity block."""
    n = X.shape[0]
    K = kernel_fn(params, X, X)
    K = 0.5 * (K + K.T)
    amp = jnp.exp(params["log_amp"])
    i = jnp.arange(n)
    K = K.at[i, i].set(amp + jnp.asarray(yerr) ** 2)

    m = _row_mask(n, count, K.dtype)
    active = m[:, None] * m[None, :]
    eye = jnp.eye(n, dtype=K.dtype)
    return K * active + eye * ((1. - m)[None, :] * (1. - m)[:, None])


def masked_nlml(params, X, Y, count, yerr):
    """NLML of the active block (padding contributes only constants)."""
    K = masked_gram(params, X, count, yerr)
    L = jnp.linalg.cholesky(K)
    Y2 = Y if Y.ndim == 2 else Y[:, None]
    m = Y2.shape[1]
    a = jax.scipy.linalg.solve_triangular(L, Y2, lower=True)
    quad = 0.5 * jnp.sum(a * a)
    logdet = m * jnp.sum(jnp.log(jnp.diagonal(L)))
    const = 0.5 * m * count * jnp.log(2. * jnp.pi)
    return quad + logdet + const


def masked_nlml_value_and_grad(params, X, Y, count, yerr):
    """Analytic value and gradient of :func:`masked_nlml`.

    Thin wrapper over gp._nlml_core with the padding row mask: the
    identity padding is parameter-independent, so the per-hyperparameter
    kernel derivative is simply masked.  Avoids reverse-mode AD's
    sequential triangular solves inside the fixed-budget Adam refit
    loop, with ONE shared implementation of the closed-form gradient.
    """
    mask = _row_mask(X.shape[0], count, X.dtype)
    val, grad, _ = _nlml_core(params, X, Y, yerr, mask=mask, count=count)
    return val, grad


def condition(gp: PaddedGP) -> PaddedGP:
    """Full (re)factorization of the masked gram; O(capacity^3)."""
    K = masked_gram(gp.params, gp.X, gp.count, gp.yerr)
    L = jnp.linalg.cholesky(K)
    Linv = _invert_cholesky(L)
    alpha, _ = _weights_from_inv(Linv, gp.Y)
    return gp._replace(Linv=Linv, alpha=alpha)


def init(params, capacity, X0, Y0, yerr):
    """Build a PaddedGP from initial data (n0 <= capacity rows)."""
    n0, d = X0.shape
    X = jnp.zeros((capacity, d), dtype=X0.dtype).at[:n0].set(X0)
    if Y0.ndim == 2:
        Y = jnp.zeros((capacity, Y0.shape[1]), dtype=Y0.dtype).at[:n0].set(Y0)
    else:
        Y = jnp.zeros((capacity,), dtype=Y0.dtype).at[:n0].set(Y0)
    gp = PaddedGP(params=params, X=X, Y=Y,
                  count=jnp.asarray(n0, jnp.int32),
                  Linv=jnp.eye(capacity, dtype=X0.dtype),
                  alpha=jnp.zeros_like(Y),
                  yerr=jnp.asarray(yerr, X0.dtype))
    return condition(gp)


def predict(gp: PaddedGP, Xtest):
    """Masked predictive mean(s) and variance at Xtest."""
    Ks = kernel_fn(gp.params, gp.X, Xtest)
    m = _row_mask(gp.X.shape[0], gp.count, Ks.dtype)
    Ks = Ks * m[:, None]

    mean = jnp.matmul(Ks.T, gp.alpha, precision=_HI)
    v = jnp.dot(gp.Linv, Ks, precision=_HI)
    amp = jnp.exp(gp.params["log_amp"])
    var = amp + gp.yerr ** 2 - jnp.sum(v * v, axis=0)
    return mean.T, var


def append(gp: PaddedGP, x_new, y_new) -> PaddedGP:
    """Add one training point at the traced index ``count`` in O(n^2)."""
    cap = gp.X.shape[0]
    idx = gp.count

    X = gp.X.at[idx].set(x_new)
    Y = gp.Y.at[idx].set(y_new)

    k_vec = kernel_fn(gp.params, X, x_new[None, :])[:, 0]
    m = _row_mask(cap, idx, k_vec.dtype)
    k_vec = k_vec * m                              # only active rows

    w = jnp.dot(gp.Linv, k_vec, precision=_HI)
    amp = jnp.exp(gp.params["log_amp"])
    dval = jnp.sqrt(jnp.maximum(amp + gp.yerr ** 2 - w @ w, 1e-12))

    # new row of Linv at position idx replaces that row's identity
    # padding: L_new = [[L, 0], [w^T, d]] inverts to
    # [[Linv, 0], [-(Linv^T w)^T / d, 1/d]]; w has zeros in padding rows,
    # so (Linv^T w)[idx:] = 0 and only the [idx, idx] entry needs fixing.
    bottom = -jnp.dot(gp.Linv.T, w, precision=_HI) / dval
    Linv = gp.Linv.at[idx, :].set(bottom).at[idx, idx].set(1. / dval)
    alpha, _ = _weights_from_inv(Linv, Y)

    return gp._replace(X=X, Y=Y, count=idx + 1, Linv=Linv, alpha=alpha)


def refit(gp: PaddedGP, steps=50, lr=0.05) -> PaddedGP:
    """Fixed-budget Adam refit of the hyperparameters + refactorization."""
    import optax
    opt = optax.adam(lr)

    def body(carry, _):
        params, opt_state = carry
        _, grad = masked_nlml_value_and_grad(params, gp.X, gp.Y,
                                             gp.count, gp.yerr)
        updates, opt_state = opt.update(grad, opt_state)
        return (optax.apply_updates(params, updates), opt_state), None

    (params, _), _ = lax.scan(body, (gp.params, opt.init(gp.params)),
                              None, length=steps)
    return condition(gp._replace(params=params))


def active_learning_loop(gp: PaddedGP, Xtest, acquire_fn, tol,
                         max_steps, refit_every=1, refit_steps=30):
    """Variance-driven acquisition, fully under jit.

    Each iteration predicts on Xtest, and — while max variance exceeds
    ``tol`` and capacity remains — acquires the argmax-variance point via
    ``acquire_fn(x) -> y`` and appends it (rank-1).  Every ``refit_every``
    acquisitions the hyperparameters get a fixed-budget Adam refit.
    Runs exactly ``max_steps`` iterations with masked no-ops once trusted
    (fixed trip count keeps the loop scan-able).

    Returns (gp, mean, var).
    """
    cap = gp.X.shape[0]

    def body(carry, i):
        gp, n_acq = carry
        mean, var = predict(gp, Xtest)
        need = (jnp.max(var) >= tol) & (gp.count < cap)

        def do_acquire(carry):
            gp, n_acq = carry
            imax = jnp.argmax(var)
            x_new = Xtest[imax]
            y_new = acquire_fn(x_new)
            gp = append(gp, x_new, y_new)
            n_acq = n_acq + 1
            # cadence counts ACQUISITIONS (iterations where the trust
            # check passes acquire nothing and must not consume a slot
            # of the refit schedule)
            do_refit = (n_acq % refit_every) == 0
            gp = lax.cond(do_refit,
                          lambda g: refit(g, steps=refit_steps),
                          lambda g: g, gp)
            return gp, n_acq

        gp, n_acq = lax.cond(need, do_acquire, lambda c: c, (gp, n_acq))
        return (gp, n_acq), jnp.max(var)

    (gp, _), max_vars = lax.scan(body, (gp, jnp.asarray(0, jnp.int32)),
                                 jnp.arange(max_steps))
    mean, var = predict(gp, Xtest)
    return gp, mean, var
