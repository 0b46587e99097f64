"""Elastic half-space deformation via FFT Green's functions, pure JAX.

Replaces the ContactMechanics dependency of the reference
(reference GaPFlow/topography.py:327-465) with direct implementations:

- periodic:      u_hat(q) = 2 p_hat(q) / (E* |q|), q0-stiffness 0 (zero-mean)
- free:          real-space Love/Boussinesq kernel for uniform pressure on a
                 rectangular cell, zero-padded FFT convolution
- semi-periodic: free kernel summed over periodic images along one axis

Sign convention: positive pressure produces positive deformation (the gap
opens), matching how the reference composes h = h_undeformed + deformation.

All kernels are precomputed once; the per-step work is two FFTs and an
elementwise product — ideal for TPU.
"""

import warnings
from copy import deepcopy

import numpy as np
import jax
import jax.numpy as jnp

from .ops import specfft


def _check_fft_dtype(p):
    """TPU has no complex128 FFT: float64 elastic runs are CPU-only.

    Caught at trace time with an actionable message instead of the PJRT
    compiler error ("Unexpected operand type for FFT: c128[...]")."""
    if p.dtype == jnp.float64 and jax.default_backend() != "cpu":
        raise TypeError(
            "float64 elastic FFT is not supported on this accelerator "
            "(no complex128 FFT on TPU). Run elastic problems in float32 "
            "production mode (GAPFLOW_X64=0) or on the CPU backend.")


def _love_kernel(dx, dy, X, Y):
    """Surface displacement at offsets (X, Y) due to unit uniform pressure on
    an (dx × dy) rectangle centered at the origin, times pi*E*/2... no:

    Returns u * E* (displacement scaled by the effective modulus), i.e. the
    caller divides by E*.  Love (1929) / Johnson, Contact Mechanics eq. (3.25).
    """
    a, b = dx / 2., dy / 2.

    def F(xp, yp):
        # corner antiderivative of the 1/r Boussinesq kernel over a rectangle:
        # F(x, y) = x asinh(y/|x|) + y asinh(x/|y|), with F -> 0 on the axes
        mx = np.abs(xp) > 1e-300
        my = np.abs(yp) > 1e-300
        safe_x = np.where(mx, np.abs(xp), 1.)
        safe_y = np.where(my, np.abs(yp), 1.)
        return (np.where(mx, xp * np.arcsinh(yp / safe_x), 0.)
                + np.where(my, yp * np.arcsinh(xp / safe_y), 0.))

    G = (F(X + a, Y + b) - F(X + a, Y - b)
         - F(X - a, Y + b) + F(X - a, Y - b))
    return G / np.pi  # u = p/(pi E*) * [...]; result scaled by 1/E* by caller


class PeriodicHalfSpace:
    """Fully periodic FFT elastic half-space (stiffness_q0 = 0)."""

    def __init__(self, nb_grid_pts, young, physical_sizes):
        nx, ny = nb_grid_pts
        Lx, Ly = physical_sizes
        qx = 2. * np.pi * np.fft.fftfreq(nx, d=Lx / nx)

        # the ghost-inclusive parity grid (Nx+2 points) usually has a large
        # prime factor that cripples the native TPU FFT; route those sizes
        # through the mixed-radix MXU path (full real-even spectrum).
        # Even at smooth sizes the packed half-spectrum path beats the
        # native rfft2 pair once the grid is large (measured crossover
        # ~1M points on v5e: 0.78 vs 0.97 ms at 2048^2), so big even
        # grids take it too.
        self._mixed = specfft.needs_mixed_radix((nx, ny))
        self._spec = self._mixed or (
            nx % 2 == 0 and ny % 2 == 0 and nx * ny > 2 ** 20)
        qy_full = 2. * np.pi * np.fft.fftfreq(ny, d=Ly / ny)
        qy = qy_full if self._spec else \
            2. * np.pi * np.fft.rfftfreq(ny, d=Ly / ny)
        q = np.sqrt(qx[:, None] ** 2 + qy[None, :] ** 2)
        with np.errstate(divide="ignore"):
            weights = 2. / (young * q)
        weights[0, 0] = 0.  # stiffness_q0 = 0: zero-mean response
        self._weights = jnp.asarray(weights)
        if self._spec:
            self._weights_t = jnp.asarray(np.ascontiguousarray(weights.T))
        self._ny = ny
        self._shape = (nx, ny)

    def deformation(self, p):
        """Displacement field for pressure field p (positive p -> positive u)."""
        _check_fft_dtype(p)
        if self._spec:
            return specfft.spectral_multiply_t(
                p, self._weights_t.astype(p.dtype))
        return jnp.fft.irfft2(jnp.fft.rfft2(p) * self._weights.astype(p.dtype),
                              s=p.shape)


class FreeHalfSpace:
    """Non-periodic elastic half-space: padded FFT convolution with the
    real-space Love kernel."""

    def __init__(self, nb_grid_pts, young, physical_sizes, n_images_x=0,
                 n_images_y=0):
        nx, ny = nb_grid_pts
        Lx, Ly = physical_sizes
        dx, dy = Lx / nx, Ly / ny

        ix = np.fft.fftfreq(2 * nx, d=1. / (2 * nx))  # 0..nx-1, -nx..-1
        iy = np.fft.fftfreq(2 * ny, d=1. / (2 * ny))
        X = ix[:, None] * dx
        Y = iy[None, :] * dy

        G = _love_kernel(dx, dy, X, Y)
        # periodic images along requested axes (semi-periodic half-space)
        for k in range(1, n_images_x + 1):
            G = G + _love_kernel(dx, dy, X + k * Lx, Y) \
                  + _love_kernel(dx, dy, X - k * Lx, Y)
        for k in range(1, n_images_y + 1):
            G = G + _love_kernel(dx, dy, X, Y + k * Ly) \
                  + _love_kernel(dx, dy, X, Y - k * Ly)
        G = G / young

        # the 2Nx x 2Ny padded grid inherits the parity grid's large prime
        # factors (e.g. 2052 = 2^2*3^3*19) — same mixed-radix escape as the
        # periodic kernel.  G is real and even under index negation on the
        # padded torus, so its full spectrum is real.  Large smooth padded
        # grids also take the packed half-spectrum path (same crossover
        # as PeriodicHalfSpace).
        self._mixed = specfft.needs_mixed_radix((2 * nx, 2 * ny))
        self._spec = self._mixed or 4 * nx * ny > 2 ** 20
        if self._spec:
            Ghat = np.fft.fft2(G).real
            self._Ghat = jnp.asarray(Ghat)
            self._Ghat_t = jnp.asarray(np.ascontiguousarray(Ghat.T))
        else:
            self._Ghat = jnp.asarray(np.fft.rfft2(G))
        self._shape = (nx, ny)
        self._padded = (2 * nx, 2 * ny)

    def deformation(self, p):
        _check_fft_dtype(p)
        nx, ny = self._shape
        if self._spec and nx % 2 == 0 and ny % 2 == 0:
            # pruned zero-padded convolution: the (2nx, 2ny) arrays are
            # never materialized and the y passes run on the nonzero /
            # needed half of the rows only (~25-35% of the per-step EHL
            # deformation cost at production sizes)
            return specfft.spectral_multiply_padded(
                p, self._Ghat_t.astype(p.dtype))
        ppad = jnp.zeros(self._padded, dtype=p.dtype).at[:nx, :ny].set(p)
        if self._spec:
            u = specfft.spectral_multiply_t(ppad, self._Ghat_t.astype(p.dtype))
        else:
            u = jnp.fft.irfft2(jnp.fft.rfft2(ppad) * self._Ghat,
                               s=self._padded)
        return u[:nx, :ny]


class ElasticDeformation:
    """Half-space selector + under-relaxed fixed-point deformation update.

    Chooses the periodic/semi-periodic/free kernel from the grid's BC
    periodicity, mirroring reference GaPFlow/topography.py:327-441 including
    the semi-periodic 1D line-contact special case.
    """

    def __init__(self, E, v, alpha_underrelax, grid, n_images,
                 fft_grid="interior"):
        self.area_per_cell = grid["dx"] * grid["dy"]
        # fft_grid="interior" (default): the FFT runs on the Nx x Ny
        # INTERIOR grid — the physically consistent domain (cell size
        # exactly dx) — whose smooth production sizes keep the native TPU
        # FFT on its fast path (the ghost-inclusive Nx+2 usually carries
        # a large prime factor; the mixed-radix escape is ~3x slower than
        # a smooth-size rfft2).  The ghost ring of the returned
        # deformation is filled per-axis: periodic wrap on periodic axes,
        # edge replication otherwise.
        #
        # fft_grid="ghost" (reference-parity opt-in): ghost-INCLUSIVE
        # grid points with INTERIOR physical sizes — the reference's own
        # convention (GaPFlow/topography.py:357: Nx+2 points,
        # physical_sizes=(Lx, Ly)): the elastic kernel cell size is
        # Lx/(Nx+2), slightly smaller than the solver's dx = Lx/Nx,
        # exactly as upstream.
        #
        # EQUIVALENCE: both conventions discretize the same Boussinesq
        # half-space and differ only at O(1/N) — (a) the ghost grid's
        # cell size understates dx by the factor Nx/(Nx+2), scaling every
        # wavevector (and hence 1/|q| kernel weight) by 1 + O(1/N); (b)
        # the ghost ring duplicates the wrap/edge pressures, a
        # perimeter-area effect O(1/N).  The continuum limit is
        # identical; tests/test_elastic.py::test_fft_grid_convergence
        # measures the first-order decay of the difference and the common
        # limit against the analytic periodic response.
        self.fft_grid = fft_grid
        if fft_grid == "interior":
            nx, ny = grid["Nx"], grid["Ny"]
        else:
            nx, ny = grid["Nx"] + 2, grid["Ny"] + 2
        self.alpha_underrelax = alpha_underrelax
        self.u_prev = jnp.zeros((grid["Nx"] + 2, grid["Ny"] + 2))

        perX = grid["bc_xE_P"][0]
        perY = grid["bc_yS_P"][0]
        young_effective = E / (1. - v ** 2)

        # semi-periodic 1D: treat as non-periodic line contact w/ unit length
        if (perX != perY) and ((perY and grid["Ny"] == 1) or
                               (perX and grid["Nx"] == 1)):
            warnings.warn(
                "Semi-periodic 1D problem: elastic deformation computed as a "
                "line contact with non-periodic BCs and unit transverse length.")
            grid = deepcopy(grid)
            if perY:
                grid["Ly"] = 1.0
            else:
                grid["Lx"] = 1.0
            n_images = 0
            perX = perY = False

        sizes = (grid["Lx"], grid["Ly"])
        if perX and perY:
            self.periodicity = "full"
            self._hs = PeriodicHalfSpace((nx, ny), young_effective, sizes)
        elif perX != perY:
            self.periodicity = "half"
            self._hs = FreeHalfSpace((nx, ny), young_effective, sizes,
                                     n_images_x=n_images if perX else 0,
                                     n_images_y=n_images if perY else 0)
        else:
            self.periodicity = "none"
            self._hs = FreeHalfSpace((nx, ny), young_effective, sizes)

        self._pad_modes = ("wrap" if perX else "edge",
                           "wrap" if perY else "edge")
        self._deform = jax.jit(self.deformation_full)

    def deformation_full(self, p):
        """Traceable deformation of a ghost-inclusive pressure field.

        ghost mode: the half-space acts on the full (Nx+2, Ny+2) array.
        interior mode: the half-space acts on the interior; the ghost
        ring of the result is wrap- (periodic axis) or edge- (else)
        filled, consistent with how ghost topography values enter the
        solver only through gradients at near-edge interior cells.
        """
        if self.fft_grid != "interior":
            return self._hs.deformation(p)
        u = self._hs.deformation(p[1:-1, 1:-1])
        mx, my = self._pad_modes
        u = jnp.pad(u, ((1, 1), (0, 0)), mode=mx)
        return jnp.pad(u, ((0, 0), (1, 1)), mode=my)

    def get_deformation(self, p):
        """Elastic deformation for pressure p; positive p opens the gap."""
        return self._deform(jnp.asarray(p))

    def get_deformation_underrelax(self, p):
        """Under-relaxed update u <- (1-alpha) u_prev + alpha u_new."""
        u_new = self.get_deformation(p)
        u_rel = (1. - self.alpha_underrelax) * self.u_prev \
            + self.alpha_underrelax * u_new
        self.u_prev = u_rel
        return u_rel

    def get_G_real(self):
        """Centered real-space Green's function (introspection helper)."""
        if isinstance(self._hs, FreeHalfSpace):
            Ghat = np.asarray(self._hs._Ghat)
            if self._hs._spec:   # full real spectrum, not rfft layout
                G = np.fft.ifft2(Ghat).real
            else:
                G = np.fft.irfft2(Ghat, s=self._hs._padded)
        else:
            shape = self._hs._shape
            w_hat = np.asarray(self._hs._weights)
            if self._hs._spec:
                G = np.fft.ifft2(w_hat).real
            else:
                G = np.fft.irfft2(w_hat, s=shape)
        return np.fft.fftshift(G)

    def get_G_real_slices(self):
        G = self.get_G_real()
        return G[:, G.shape[1] // 2], G[G.shape[0] // 2, :]
