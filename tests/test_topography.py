"""Geometry profiles: analytic gradients match numerical differentiation."""

import numpy as np
import pytest

from gapflow_tpu.topography import (create_midpoint_grid, journal_bearing,
                                    inclined_slider, parabolic_slider, cdc,
                                    asperity)


GRID = {"Lx": 2.0, "Ly": 1.0, "Nx": 200, "Ny": 50,
        "dx": 0.01, "dy": 0.02}


def _check_gradients(h, dh_dx, dh_dy, dx, dy, skip_mask=None, rtol=2e-3):
    num_dx = np.gradient(h, dx, axis=0)
    num_dy = np.gradient(h, dy, axis=1)
    mask = np.ones_like(h, dtype=bool)
    mask[0, :] = mask[-1, :] = False
    mask[:, 0] = mask[:, -1] = False
    if skip_mask is not None:
        mask &= ~skip_mask
    scale = max(np.abs(dh_dx).max(), np.abs(dh_dy).max(), 1e-12)
    np.testing.assert_allclose(dh_dx[mask], num_dx[mask],
                               atol=rtol * scale * 10, rtol=0)
    np.testing.assert_allclose(dh_dy[mask], num_dy[mask],
                               atol=rtol * scale * 10, rtol=0)


def test_midpoint_grid():
    xx, yy = create_midpoint_grid(GRID)
    assert xx.shape == (GRID["Nx"] + 2, GRID["Ny"] + 2)
    dx = GRID["Lx"] / GRID["Nx"]
    # cell centers, one ghost per side
    assert np.isclose(xx[0, 0], -dx / 2)
    assert np.isclose(xx[1, 0], dx / 2)
    assert np.isclose(xx[-1, 0], GRID["Lx"] + dx / 2)


def test_journal_gradients():
    xx, yy = create_midpoint_grid(GRID)
    h, dh_dx, dh_dy = journal_bearing(xx, GRID, {"CR": 0.01, "eps": 0.7})
    _check_gradients(h, dh_dx, dh_dy, GRID["dx"], GRID["dy"])
    assert np.all(h > 0)


def test_journal_hmin_hmax():
    xx, _ = create_midpoint_grid(GRID)
    h, _, _ = journal_bearing(xx, GRID, {"hmin": 1., "hmax": 3.})
    assert np.isclose(h.max(), 3., atol=1e-3)
    assert np.isclose(h.min(), 1., atol=1e-3)


def test_inclined_and_parabolic():
    xx, _ = create_midpoint_grid(GRID)
    geo = {"hmin": 1., "hmax": 2.}

    h, dh_dx, dh_dy = inclined_slider(xx, GRID, geo)
    _check_gradients(h, dh_dx, dh_dy, GRID["dx"], GRID["dy"])
    assert np.isclose(h[1, 1], 2., atol=0.01)    # hmax at x=0

    h, dh_dx, dh_dy = parabolic_slider(xx, GRID, geo)
    _check_gradients(h, dh_dx, dh_dy, GRID["dx"], GRID["dy"])
    imin = np.argmin(h[:, 1])
    assert abs(xx[imin, 1] - GRID["Lx"] / 2) < 2 * GRID["dx"]


def test_cdc_profile():
    xx, _ = create_midpoint_grid(GRID)
    geo = {"hmin": 1., "hmax": 2., "b": 0.2}
    h, dh_dx, dh_dy = cdc(xx, GRID, geo)
    # flat inlet at hmax, flat center at hmin
    assert np.isclose(h[1, 1], 2.)
    center = np.argmin(np.abs(xx[:, 1] - GRID["Lx"] / 2))
    assert np.isclose(h[center, 1], 1.)
    assert np.all(dh_dy == 0.)


def test_asperity_field():
    xx, yy = create_midpoint_grid(GRID)
    geo = {"hmin": 1., "hmax": 2., "num": 1}
    h, dh_dx, dh_dy = asperity(xx, yy, GRID, geo)
    assert h.min() >= 1. - 1e-9
    assert h.max() <= 2. + 1e-9
    assert np.any(dh_dy != 0.)
