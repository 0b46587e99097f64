"""Mixed-radix 2D FFT for grid sizes with large prime factors.

The parity convention inherited from the reference puts the elastic
half-space on the ghost-INCLUSIVE grid (reference GaPFlow/topography.py:357:
Nx+2 points), so production FFTs run at sizes like 1026 = 2*3^3*19 or the
free-space padded 2052 = 2^2*3^3*19.  XLA's TPU FFT falls off a cliff on
prime factors this large (measured: 1.33 ms vs 0.32 ms for a 1026^2 vs
1024^2 rfft2+irfft2 pair on v5e) because the generic prime-length path
doesn't tile onto the MXU.

This module splits each axis n = n_smooth * n_bad (n_bad = product of the
prime factors > 13) with one Cooley-Tukey decimation step: the smooth part
goes through the native FFT, and the length-n_bad DFT becomes a dense
matmul on the MXU (at HIGHEST precision — the TPU's default bf16 matmul
passes would cost ~6e-3 relative error; with f32 accumulation the round
trip matches the native FFT at ~3e-7).  At 1026^2 the full complex
convolution pair runs in 0.46 ms — 2.9x the native path.

Complex arrays never cross the host boundary (the tunneled TPU runtime in
this environment cannot transfer complex64): DFT/twiddle constants are
kept as real numpy cos/sin pairs and combined with ``lax.complex`` inside
the traced function; inputs and outputs are real.
"""

from functools import lru_cache, partial

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

_MAX_NATIVE_PRIME = 13

# Two-factor full-matmul stage for large SMOOTH sizes: an n = n1*n2
# Cooley-Tukey split with both factor DFTs as dense MXU matmuls.
# Measured on v5e (f32 convolution pair, packed half-spectrum carrier):
# 4096^2 full-matmul 5.58 ms vs native-pass 5.17 ms; 2048^2 1.47 vs
# 1.40; 1024^2 ~tie.  The HIGHEST-precision (6-pass) matmuls erase the
# MXU advantage and the spectral path is HBM-traversal-bound anyway, so
# the stage is DISABLED by default ([None]) and kept as a measured
# answer to "route the smooth FFTs over the MXU too" — flip
# _SMOOTH_MM_MIN[0] to a length threshold to enable on TPU;
# _SMOOTH_MM_FORCE[0] = True engages it on any backend (CPU tests).
_SMOOTH_MM_MIN = [None]
_SMOOTH_MM_FORCE = [False]


def _factorize(n):
    fac, d = [], 2
    while d * d <= n:
        while n % d == 0:
            fac.append(d)
            n //= d
        d += 1
    if n > 1:
        fac.append(n)
    return fac


def bad_factor(n):
    """Product of prime factors of n above the native-FFT-friendly limit."""
    bad = 1
    for p in _factorize(n):
        if p > _MAX_NATIVE_PRIME:
            bad *= p
    return bad


def needs_mixed_radix(shape):
    """True if any axis length has a prime factor > 13."""
    return any(bad_factor(int(n)) > 1 for n in shape)


@lru_cache(maxsize=32)
def _axis_consts(n, n_bad, f64):
    """(D_re, D_im, T_re, T_im) numpy constants for one CT stage.

    D is the dense n_bad-point DFT matrix, T the W_n^{m2 k1} twiddles
    with k1 over the smooth part and m2 over the bad part.
    """
    n1 = n // n_bad
    k = np.arange(n_bad)
    D = np.exp(-2j * np.pi * np.outer(k, k) / n_bad)
    T = np.exp(-2j * np.pi * np.outer(np.arange(n1), np.arange(n_bad)) / n)
    dt = np.float64 if f64 else np.float32
    return (D.real.astype(dt), D.imag.astype(dt),
            T.real.astype(dt), T.imag.astype(dt))


def _smooth_mm_split(n):
    """(n1, n2) for the full-matmul stage of a smooth length n, or None.

    Balanced factors minimize the matmul FLOPs (∝ n*(n1+n2)); both stay
    MXU-sized.  Smooth n (all prime factors <= 13) always admits a split
    with n2 <= 13*sqrt(n), so the 512 guard only rejects tiny cofactors
    of huge lengths that should use the native FFT anyway.
    """
    lim = _SMOOTH_MM_MIN[0]
    if lim is None or n < lim:
        return None
    if not (_SMOOTH_MM_FORCE[0] or jax.default_backend() == "tpu"):
        return None
    for n1 in range(int(np.sqrt(n)), 1, -1):
        if n % n1 == 0 and n // n1 <= 512:
            return n1, n // n1
    return None


@lru_cache(maxsize=32)
def _smooth_consts(n, n1, n2, f64):
    """Real/imag DFT + twiddle constants for the full-matmul stage."""
    dt = np.float64 if f64 else np.float32
    k1 = np.arange(n1)
    k2 = np.arange(n2)
    D1 = np.exp(-2j * np.pi * np.outer(k1, k1) / n1)
    D2 = np.exp(-2j * np.pi * np.outer(k2, k2) / n2)
    T = np.exp(-2j * np.pi * np.outer(k1, k2) / n)
    return (D1.real.astype(dt), D1.imag.astype(dt),
            D2.real.astype(dt), D2.imag.astype(dt),
            T.real.astype(dt), T.imag.astype(dt))


def _fft_last_mm(x, n, split):
    """Forward DFT along the last axis with BOTH Cooley-Tukey factors as
    dense matmuls (large smooth n; see _SMOOTH_MM_MIN)."""
    n1, n2 = split
    D1r, D1i, D2r, D2i, Tr, Ti = _smooth_consts(
        n, n1, n2, x.real.dtype == jnp.float64)
    D1 = lax.complex(jnp.asarray(D1r), jnp.asarray(D1i))
    D2 = lax.complex(jnp.asarray(D2r), jnp.asarray(D2i))
    T = lax.complex(jnp.asarray(Tr), jnp.asarray(Ti))

    shp = x.shape[:-1]
    # m = n2*m1 + m2 -> y[m1, m2]; X[k1 + n1*k2] =
    # sum_m2 W_n^{m2 k1} W_{n2}^{m2 k2} sum_m1 y[m1, m2] W_{n1}^{m1 k1}
    y = x.reshape(shp + (n1, n2))
    y = jnp.einsum("...mj,mk->...kj", y, D1,
                   precision=lax.Precision.HIGHEST)
    y = y * T
    y = jnp.einsum("...km,mj->...kj", y, D2,
                   precision=lax.Precision.HIGHEST)
    return jnp.swapaxes(y, -1, -2).reshape(shp + (n,))


def _fft_last(x, n):
    """Forward DFT of complex x along its last axis (length n)."""
    n_bad = bad_factor(n)
    if n_bad == 1:
        split = _smooth_mm_split(n)
        if split is not None:
            return _fft_last_mm(x, n, split)
        return jnp.fft.fft(x, axis=-1)

    n1 = n // n_bad
    Dr, Di, Tr, Ti = _axis_consts(n, n_bad, x.real.dtype == jnp.float64)
    D = lax.complex(jnp.asarray(Dr), jnp.asarray(Di))
    T = lax.complex(jnp.asarray(Tr), jnp.asarray(Ti))

    shp = x.shape[:-1]
    # index split m = n_bad*m1 + m2 -> (m1, m2); X[k1 + n1*k2] =
    # sum_m2 W_n^{m2 k1} W_bad^{m2 k2} sum_m1 x[m1, m2] W_smooth^{m1 k1}
    y = x.reshape(shp + (n1, n_bad))
    if n1 > 1:
        y = jnp.fft.fft(y, axis=-2)
    y = y * T
    y = jnp.einsum("...km,mj->...kj", y, D, precision=lax.Precision.HIGHEST)
    return jnp.swapaxes(y, -1, -2).reshape(shp + (n,))


def _fft2_t(x):
    """2D DFT over the last two axes, returned with those axes SWAPPED.

    ``_fft2_t(x)[..., j, i] == fft2(x)[..., i, j]``.  Because the DFT is
    separable and symmetric, applying this twice (with the convolution
    weights stored transposed in between) yields a normally-oriented
    result while skipping two full-array transposes per convolution.
    """
    x = _fft_last(x, x.shape[-1])
    x = jnp.swapaxes(x, -1, -2)
    return _fft_last(x, x.shape[-1])


def fft2(x):
    """Forward 2D DFT over the last two axes of a complex array."""
    return jnp.swapaxes(_fft2_t(x), -1, -2)


def spectral_multiply_t(p, w_full_t, scale=1.):
    """``scale * irfft2(rfft2(p) * w)`` with w given TRANSPOSED.

    The hot-path form: the caller precomputes ``w_full_t = w_full.T`` once,
    and the whole convolution runs in the transposed spectrum — the
    orientation flips of the two ``_fft2_t`` calls cancel.  ``scale``
    (e.g. an under-relaxation factor) folds into the spectral product so
    it costs nothing.  The inverse runs through the forward transform via
    ifft(X) = conj(fft(conj(X)))/n.

    For 2D ``p`` with an even row count the real-input half-spectrum path
    (`_spectral_multiply_real`) runs instead — identical result, half the
    FFT work.
    """
    nx, ny = p.shape[-2], p.shape[-1]
    if p.ndim == 2 and nx % 2 == 0 and ny % 2 == 0:
        return _spectral_multiply_real(p, w_full_t, scale)
    cdtype = jnp.complex128 if p.dtype == jnp.float64 else jnp.complex64
    S_t = _fft2_t(p.astype(cdtype))
    V_t = (S_t * (w_full_t * (scale / (nx * ny)))).conj()
    return _fft2_t(V_t).real


def _pack_forward_y(p, M):
    """Forward y transform of PACKED ROW PAIRS -> half spectra (nx, kh).

    Rows pack as ``p[2j] + i p[2j+1]`` (so the pass runs on nx/2 rows)
    and the Hermitian split recovers the per-row half spectra.  ``M`` is
    the transform length; columns beyond ny are zero-padded.  Shared by
    the periodic (:func:`_spectral_multiply_real`, M == ny) and padded
    (:func:`spectral_multiply_padded`, M == 2 ny) paths — keep the
    symmetry handling in ONE place.
    """
    _, ny = p.shape
    kh = M // 2 + 1
    zero = jnp.zeros((), p.dtype)
    z = lax.complex(p[0::2, :], p[1::2, :])
    if M > ny:
        z = jnp.pad(z, ((0, 0), (0, M - ny)))
    Z = _fft_last(z, M)
    idx = (-np.arange(kh)) % M
    Zh = Z[:, :kh]
    Zr = jnp.conj(Z[:, idx])
    F_even = 0.5 * (Zh + Zr)
    F_odd = lax.complex(zero, -0.5 * jnp.ones((), p.dtype)) * (Zh - Zr)
    return jnp.stack([F_even, F_odd], axis=1).reshape(p.shape[0], kh)


def _unpack_inverse_y(Uh, M, ny):
    """Inverse y of per-row Hermitian half spectra via packed row pairs.

    Repacks output row pairs, extends k from the kh half ring to the
    full length-M ring, inverse-transforms (conj-forward-conj) and
    returns the real field with columns beyond ``ny`` dropped.  Inverse
    counterpart of :func:`_pack_forward_y`, shared by the same two
    callers.
    """
    nx, kh = Uh.shape
    A, B = Uh[0::2, :], Uh[1::2, :]
    iB = lax.complex(-B.imag, B.real)
    head = A + iB                                     # k = 0 .. M/2
    tailA = jnp.conj(A[:, 1:M - kh + 1][:, ::-1])
    tailB = jnp.conj(B[:, 1:M - kh + 1][:, ::-1])
    tail = tailA + lax.complex(-tailB.imag, tailB.real)
    Zf = jnp.concatenate([head, tail], axis=-1)
    zo = jnp.conj(_fft_last(jnp.conj(Zf), M))
    out = jnp.stack([zo.real, zo.imag], axis=1).reshape(nx, M)
    return out[:, :ny] if M > ny else out


def _spectral_multiply_real(p, w_full_t, scale):
    """Half-spectrum convolution of a real 2D field (rfft2 semantics).

    Exploits both real-input symmetries that the complex path wastes:

    - the y-axis passes transform PACKED ROW PAIRS ``p[2j] + i p[2j+1]``
      (and unpack via the Hermitian split), so they run on nx/2 rows;
    - after the y transform the spectrum is Hermitian in k, so the x-axis
      passes only touch the ny/2+1 non-redundant columns.

    Net: the four axis passes of the convolution cost half of the complex
    path.  Requires even nx, ny (all production ghost-inclusive sizes are
    even) and a ``q -> -q``-even real ``w`` — the same symmetry the
    complex path already assumes for a real result.
    """
    nx, ny = p.shape
    kh = ny // 2 + 1
    inv_n = scale / (nx * ny)

    F = _pack_forward_y(p, ny)

    # forward x on the kh non-redundant columns (transposed layout)
    G = _fft_last(jnp.swapaxes(F, -1, -2), nx)        # G[k, i] = S[i, k]
    V = G * (w_full_t[:kh, :] * inv_n).astype(p.dtype)

    # inverse x (via conj-forward-conj), back to row-major half spectra
    U = jnp.conj(_fft_last(jnp.conj(V), nx))
    Uh = jnp.swapaxes(U, -1, -2)                      # (nx, kh), Hermitian in k

    return _unpack_inverse_y(Uh, ny, ny)


def spectral_multiply_padded(p, w_full_t, scale=1.):
    """First-quadrant output of the ZERO-PADDED spectral convolution.

    ``scale * irfft2(rfft2(pad2(p)) * w)[:nx, :ny]`` where ``pad2``
    zero-pads an (nx, ny) real field to (2nx, 2ny) and ``w_full_t`` is
    the transposed full (2nx, 2ny) spectrum of a real convolution
    kernel even under index negation (the free/semi-periodic elastic
    Green's functions).

    The padded free-space convolution is the per-step cost of
    reference-protocol EHL (reference GaPFlow/topography.py:424-441
    recomputes the deformation every fluid step); the spectral passes
    are HBM-traversal-bound, so the win here is pruning: the input
    occupies one quadrant of the padded grid and only that quadrant of
    the output is consumed, so the y-axis passes run on the nonzero /
    needed ROW PAIRS only (nx/2 packed rows instead of nx) and the
    padded (2nx, 2ny) real arrays are never materialized.  Only the
    x-axis passes (which the full-spectrum weight product genuinely
    couples across all 2nx wavenumbers) touch padded-length data.

    Requires a 2D ``p`` (the batched variant is ``spectral_multiply_t``
    over an explicitly padded field) with even nx, ny; the caller falls
    back to explicit padding + ``spectral_multiply_t`` otherwise.
    """
    if p.ndim != 2:
        raise ValueError("spectral_multiply_padded takes a 2D field; "
                         "batched inputs go through spectral_multiply_t "
                         "with explicit padding")
    nx, ny = p.shape
    if nx % 2 or ny % 2:
        raise ValueError("pruned padded convolution needs even sizes; "
                         "pad explicitly and use spectral_multiply_t")
    Mx, My = 2 * nx, 2 * ny
    kh = My // 2 + 1                       # = ny + 1
    inv_n = scale / (Mx * My)

    # forward y on the nonzero packed row pairs (rows nx..2nx-1 of the
    # padded field are zero -> their packed rows never exist)
    F = _pack_forward_y(p, My)                         # (nx, kh)

    # forward x over the kh non-redundant columns: zero-pad the spatial
    # rows nx -> 2nx (transposed layout)
    Ft = jnp.pad(jnp.swapaxes(F, -1, -2), ((0, 0), (0, Mx - nx)))
    G = _fft_last(Ft, Mx)                              # G[k, i] = S[i, k]
    V = G * (w_full_t[:kh, :] * inv_n).astype(p.dtype)

    # inverse x (conj-forward-conj); only spatial rows i < nx are needed
    U = jnp.conj(_fft_last(jnp.conj(V), Mx))
    Uh = jnp.swapaxes(U[:, :nx], -1, -2)               # (nx, kh)

    # inverse y on packed output row pairs; drop the padded column half
    return _unpack_inverse_y(Uh, My, ny)


def spectral_multiply(p, w_full):
    """``irfft2(rfft2(p) * w)`` for real p and a real full-spectrum w.

    w_full must be even under q -> -q (true for any real-symmetric
    convolution kernel) so the product's inverse transform is real; the
    imaginary residue is dropped.
    """
    return spectral_multiply_t(p, jnp.swapaxes(w_full, -1, -2))
