"""Mixed-radix spectral path: correctness vs numpy and the native FFT.

The elastic half-space runs on the ghost-inclusive parity grid
(reference GaPFlow/topography.py:357), whose sizes (Nx+2) usually carry a
large prime factor; ops/specfft.py routes those through a Cooley-Tukey
split with the bad-prime DFT as an MXU matmul.  These tests pin the
decomposition against numpy and the elastic kernels against their native
rfft2 formulation.
"""

import numpy as np
import pytest
import jax.numpy as jnp

from gapflow_tpu.ops import specfft


def test_bad_factor():
    assert specfft.bad_factor(1024) == 1
    assert specfft.bad_factor(1026) == 19     # 2 * 3^3 * 19
    assert specfft.bad_factor(2052) == 19
    assert specfft.bad_factor(102) == 17      # 2 * 3 * 17
    assert specfft.bad_factor(19) == 19
    assert specfft.bad_factor(13 * 8) == 1    # 13 is native-friendly
    assert specfft.bad_factor(17 * 19) == 17 * 19
    assert not specfft.needs_mixed_radix((1024, 1024))
    assert specfft.needs_mixed_radix((1024, 1026))


@pytest.mark.parametrize("shape", [(1026, 1026), (54, 38), (19, 19),
                                   (102, 64), (36, 34)])
def test_fft2_matches_numpy(shape):
    rng = np.random.default_rng(3)
    x = rng.standard_normal(shape) + 1j * rng.standard_normal(shape)
    got = np.asarray(specfft.fft2(jnp.asarray(x)))
    ref = np.fft.fft2(x)
    assert np.abs(got - ref).max() / np.abs(ref).max() < 1e-10


@pytest.mark.parametrize("shape", [(1026, 1026), (102, 102), (38, 54)])
def test_spectral_multiply_matches_rfft_path(shape):
    rng = np.random.default_rng(5)
    p = rng.standard_normal(shape)
    # real-even kernel on the torus -> real full spectrum
    gx = np.fft.fftfreq(shape[0])
    gy = np.fft.fftfreq(shape[1])
    w_full = 1. / (1. + gx[:, None] ** 2 + gy[None, :] ** 2)

    ref = np.fft.irfft2(np.fft.rfft2(p) * w_full[:, :shape[1] // 2 + 1],
                        s=shape)
    got = np.asarray(specfft.spectral_multiply(jnp.asarray(p),
                                               jnp.asarray(w_full)))
    assert np.abs(got - ref).max() / np.abs(ref).max() < 1e-11


@pytest.mark.parametrize("shape", [(54, 38), (102, 102), (36, 34),
                                   (64, 64)])
def test_real_halfspectrum_equals_complex_path(shape):
    """The even-size real (rfft2-style) path equals the complex path."""
    rng = np.random.default_rng(11)
    p = rng.standard_normal(shape)
    G = rng.standard_normal(shape)
    Gs = 0.5 * (G + np.roll(G[::-1, ::-1], (1, 1), (0, 1)))
    w_t = jnp.asarray(np.fft.fft2(Gs).real.T)

    got = np.asarray(specfft._spectral_multiply_real(jnp.asarray(p), w_t,
                                                     0.37))
    # complex reference: batch dim of 1 forces the p.ndim == 2 dispatch off
    ref = np.asarray(specfft.spectral_multiply_t(jnp.asarray(p)[None], w_t,
                                                 0.37))[0]
    assert np.abs(got - ref).max() <= 1e-12 * np.abs(ref).max()


@pytest.mark.parametrize("shape", [(19, 19), (37, 26), (38, 27)])
def test_odd_sizes_fall_back_to_complex(shape):
    """Odd axes (no row pairing / half spectrum) still produce the right
    convolution through the complex fallback."""
    rng = np.random.default_rng(13)
    p = rng.standard_normal(shape)
    G = rng.standard_normal(shape)
    Gs = 0.5 * (G + np.roll(G[::-1, ::-1], (1, 1), (0, 1)))
    w = np.fft.fft2(Gs).real

    ref = 0.7 * np.fft.ifft2(np.fft.fft2(p) * w).real
    got = np.asarray(specfft.spectral_multiply(jnp.asarray(p),
                                               jnp.asarray(w)) * 0.7)
    assert np.abs(got - ref).max() <= 1e-11 * np.abs(ref).max()


@pytest.fixture
def force_smooth_mm(monkeypatch):
    """Engage the large-smooth-size full-matmul stage regardless of
    backend or threshold (production gates it to TPU at >= 4096)."""
    monkeypatch.setattr(specfft, "_SMOOTH_MM_FORCE", [True])
    monkeypatch.setattr(specfft, "_SMOOTH_MM_MIN", [64])


@pytest.mark.parametrize("n", [64, 96, 128, 256])
def test_smooth_matmul_fft_matches_numpy(n, force_smooth_mm):
    assert specfft._smooth_mm_split(n) is not None
    rng = np.random.default_rng(17)
    x = rng.standard_normal((5, n)) + 1j * rng.standard_normal((5, n))
    got = np.asarray(specfft._fft_last(jnp.asarray(x), n))
    ref = np.fft.fft(x, axis=-1)
    assert np.abs(got - ref).max() / np.abs(ref).max() < 1e-10


def test_smooth_matmul_convolution_matches_native(force_smooth_mm):
    """The packed half-spectrum convolution is unchanged when its axis
    passes run through the full-matmul stage."""
    shape = (128, 64)
    rng = np.random.default_rng(19)
    p = rng.standard_normal(shape)
    G = rng.standard_normal(shape)
    Gs = 0.5 * (G + np.roll(G[::-1, ::-1], (1, 1), (0, 1)))
    w_t = jnp.asarray(np.fft.fft2(Gs).real.T)

    got = np.asarray(specfft._spectral_multiply_real(jnp.asarray(p), w_t,
                                                     1.3))
    ref = 1.3 * np.fft.ifft2(np.fft.fft2(p) * np.fft.fft2(Gs).real).real
    assert np.abs(got - ref).max() <= 1e-10 * np.abs(ref).max()


def test_smooth_matmul_disabled_by_default():
    """The smooth-size matmul stage is a measured opt-in (the native
    passes win at HIGHEST precision on v5e) — off unless enabled."""
    assert specfft._smooth_mm_split(4096) is None


def test_periodic_halfspace_mixed_equals_native():
    """1026-point periodic kernel (mixed-radix) vs a hand-built rfft2 path."""
    from gapflow_tpu.elastic import PeriodicHalfSpace

    n = 102  # 2*3*17: exercises the mixed path at test-friendly size
    hs = PeriodicHalfSpace((n, n), 1e9, (1e-3, 1e-3))
    assert hs._mixed

    rng = np.random.default_rng(7)
    p = rng.standard_normal((n, n)) * 1e5
    u = np.asarray(hs.deformation(jnp.asarray(p)))

    qx = 2. * np.pi * np.fft.fftfreq(n, d=1e-3 / n)
    q = np.sqrt(qx[:, None] ** 2 + qx[None, :] ** 2)
    with np.errstate(divide="ignore"):
        w = 2. / (1e9 * q)
    w[0, 0] = 0.
    ref = np.fft.irfft2(np.fft.rfft2(p) * w[:, :n // 2 + 1], s=p.shape)
    assert np.abs(u - ref).max() <= 1e-10 * np.abs(ref).max()


def test_free_halfspace_mixed_equals_native():
    """Padded free-space kernel via the mixed path vs direct rfft2."""
    from gapflow_tpu.elastic import FreeHalfSpace

    n = 51  # padded 102 = 2*3*17 -> mixed
    hs = FreeHalfSpace((n, n), 1e9, (1e-3, 1e-3))
    assert hs._mixed

    rng = np.random.default_rng(9)
    p = rng.standard_normal((n, n)) * 1e5
    u = np.asarray(hs.deformation(jnp.asarray(p)))

    Ghat_full = np.asarray(hs._Ghat)
    ppad = np.zeros((2 * n, 2 * n))
    ppad[:n, :n] = p
    ref = np.fft.irfft2(np.fft.rfft2(ppad) * Ghat_full[:, :n + 1],
                        s=(2 * n, 2 * n))[:n, :n]
    assert np.abs(u - ref).max() <= 1e-10 * np.abs(ref).max()


@pytest.mark.parametrize("shape", [(64, 64), (54, 38), (36, 34),
                                   (102, 64), (38, 38)])
def test_spectral_multiply_padded_matches_explicit(shape):
    """Pruned zero-padded convolution == explicit pad + full path, for
    smooth and mixed-radix padded sizes (the free/semi-periodic elastic
    Green's function per-step EHL hot path)."""
    nx, ny = shape
    Mx, My = 2 * nx, 2 * ny
    rng = np.random.default_rng(23)
    p = rng.standard_normal(shape)
    # real-even padded-torus kernel (the Love kernel's symmetry)
    G = rng.standard_normal((Mx, My))
    Gs = 0.5 * (G + np.roll(G[::-1, ::-1], (1, 1), (0, 1)))
    w = np.fft.fft2(Gs).real
    w_t = jnp.asarray(np.ascontiguousarray(w.T))

    ppad = np.zeros((Mx, My))
    ppad[:nx, :ny] = p
    ref = 0.41 * np.fft.ifft2(np.fft.fft2(ppad) * w).real[:nx, :ny]
    got = np.asarray(specfft.spectral_multiply_padded(
        jnp.asarray(p), w_t, 0.41))
    assert got.shape == (nx, ny)
    assert np.abs(got - ref).max() <= 1e-11 * np.abs(ref).max()


def test_free_halfspace_pruned_equals_explicit_padding():
    """FreeHalfSpace.deformation through the pruned path equals the
    explicit zero-pad + spectral_multiply_t formulation bit-for-bit in
    intent (same spectrum, same weights) and to FFT roundoff in value."""
    from gapflow_tpu.elastic import FreeHalfSpace

    nx, ny = 48, 40
    hs = FreeHalfSpace((nx, ny), 5e9, (1e-3, 1e-3), n_images_x=2)
    hs._spec = True    # force the spectral path at test-friendly size
    if not hasattr(hs, "_Ghat_t"):
        Ghat = np.fft.fft2(np.asarray(
            np.fft.irfft2(np.asarray(hs._Ghat), s=hs._padded))).real
        hs._Ghat_t = jnp.asarray(np.ascontiguousarray(Ghat.T))

    rng = np.random.default_rng(29)
    p = jnp.asarray(rng.standard_normal((nx, ny)) * 1e5)
    got = np.asarray(hs.deformation(p))

    ppad = jnp.zeros(hs._padded).at[:nx, :ny].set(p)
    ref = np.asarray(specfft.spectral_multiply_t(
        ppad, hs._Ghat_t))[:nx, :ny]
    assert np.abs(got - ref).max() <= 1e-10 * np.abs(ref).max()
