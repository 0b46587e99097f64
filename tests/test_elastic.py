"""FFT elastic half-space kernels vs analytic solutions.

- periodic: a cosine pressure p0 cos(qx) deforms the surface by
  u = 2 p0 cos(qx) / (E* q)  (Westergaard / periodic Boussinesq)
- free: point-ish load reciprocity and positivity; under-relaxation
  converges to the fixed point
"""

import numpy as np
import pytest

from gapflow_tpu.elastic import (PeriodicHalfSpace, FreeHalfSpace,
                                 ElasticDeformation)


def test_periodic_cosine_analytic():
    nx, ny = 128, 64
    Lx, Ly = 2.0, 1.0
    E = 13.7

    hs = PeriodicHalfSpace((nx, ny), E, (Lx, Ly))

    x = (np.arange(nx) + 0.5) * Lx / nx
    k = 3
    qwave = 2. * np.pi * k / Lx
    p0 = 2.5
    p = p0 * np.cos(qwave * x)[:, None] * np.ones((1, ny))

    u = np.asarray(hs.deformation(p))
    u_ana = 2. * p0 / (E * qwave) * np.cos(qwave * x)[:, None] * np.ones((1, ny))

    np.testing.assert_allclose(u, u_ana, rtol=1e-10, atol=1e-12)


def test_periodic_zero_mean():
    hs = PeriodicHalfSpace((32, 32), 1.0, (1.0, 1.0))
    rng = np.random.default_rng(0)
    p = rng.normal(size=(32, 32))
    u = np.asarray(hs.deformation(p))
    assert abs(u.mean()) < 1e-12


def test_free_halfspace_point_load():
    """Far from a concentrated load, u approaches the Boussinesq 1/(pi E* r)."""
    nx = ny = 64
    L = 1.0
    E = 1.0
    hs = FreeHalfSpace((nx, ny), E, (L, L))

    p = np.zeros((nx, ny))
    p[nx // 2, ny // 2] = 1.0   # unit pressure on one cell
    u = np.asarray(hs.deformation(p))

    # positive everywhere, maximal under the load
    assert u.max() == u[nx // 2, ny // 2]
    assert np.all(u > 0)

    dx = L / nx
    force = 1.0 * dx * dx
    for r_cells in (8, 16, 24):
        u_num = u[nx // 2 + r_cells, ny // 2]
        r = r_cells * dx
        u_ana = force / (np.pi * E * r)
        assert abs(u_num / u_ana - 1.) < 0.02


def test_underrelaxation_fixed_point():
    grid = {
        "dx": 0.01, "dy": 0.01, "Nx": 30, "Ny": 30,
        "Lx": 0.3, "Ly": 0.3,
        "bc_xE_P": [True] * 3, "bc_yS_P": [True] * 3,
    }
    ed = ElasticDeformation(E=1e4, v=0.3, alpha_underrelax=0.5,
                            grid=grid, n_images=0)
    assert ed.periodicity == "full"

    rng = np.random.default_rng(1)
    p = rng.normal(size=(32, 32))

    u_direct = np.asarray(ed.get_deformation(p))
    u = None
    for _ in range(60):
        u = np.asarray(ed.get_deformation_underrelax(p))
    np.testing.assert_allclose(u, u_direct, rtol=1e-6, atol=1e-9)


def test_interior_fft_grid_periodic():
    """fft_grid='interior': exact cosine response on the interior grid,
    ghost ring wrap-filled, and agreement with the (parity) ghost mode
    to the O(1/N) grid-convention difference."""
    grid = {
        "dx": 0.01, "dy": 0.01, "Nx": 32, "Ny": 32,
        "Lx": 0.32, "Ly": 0.32,
        "bc_xE_P": [True] * 3, "bc_yS_P": [True] * 3,
    }
    E = 1e4
    ed_i = ElasticDeformation(E=E, v=0.0, alpha_underrelax=1.0,
                              grid=grid, n_images=0, fft_grid="interior")
    ed_g = ElasticDeformation(E=E, v=0.0, alpha_underrelax=1.0,
                              grid=grid, n_images=0, fft_grid="ghost")
    assert ed_i.periodicity == "full"

    # exact spectral identity on the interior grid: u = 2 p / (E* q1)
    x = (np.arange(32) + 0.5) * 0.01
    q1 = 2 * np.pi / 0.32
    p_int = np.cos(q1 * x)[:, None] * np.ones((1, 32))
    p_full = np.pad(p_int, 1, mode="wrap")
    u = np.asarray(ed_i.get_deformation(p_full))
    np.testing.assert_allclose(u[1:-1, 1:-1], 2. / (E * q1) * p_int,
                               rtol=1e-10, atol=1e-16)
    # ghost ring is the periodic wrap of the interior
    np.testing.assert_allclose(u, np.pad(u[1:-1, 1:-1], 1, mode="wrap"))

    # both conventions solve the same physics; they differ only through
    # the ghost grid's Lx/(Nx+2) cell size -> O(1/N) relative
    u_g = np.asarray(ed_g.get_deformation(p_full))
    scale = np.abs(u_g).max()
    assert np.abs(u[1:-1, 1:-1] - u_g[1:-1, 1:-1]).max() / scale < 0.15


def test_interior_fft_grid_ehl_loop_consistency():
    """The on-device EHL loop under fft_grid='interior' converges to the
    same deformation as the ghost (parity) mode within the grid-convention
    difference."""
    from gapflow_tpu import Problem
    from gapflow_tpu.core.ehl import make_ehl_loop

    base = """
options:
    output: data/ehl_interior
    write_freq: 100000
    silent: True
grid:
    dx: 1.e-5
    dy: 1.e-5
    Nx: 64
    Ny: 64
geometry:
    type: journal
    CR: 1.e-2
    eps: 0.7
    U: 0.1
    V: 0.
numerics:
    CFL: 0.25
    adaptive: 0
    tol: 1e-30
    dt: 5e-11
    max_it: 1000
properties:
    shear: 0.0794
    bulk: 0.
    EOS: DH
    P0: 101325.
    rho0: 877.7007
    C1: 3.5e10
    C2: 1.23
    elastic:
        E: 5e09
        v: 0.3
        alpha_underrelax: 1e-03
{extra}
"""
    us = {}
    for mode, extra in (("ghost", "        fft_grid: ghost"),
                        ("interior", "")):
        problem = Problem.from_string(base.format(extra=extra))
        problem._pre_run()
        assert problem.topo.ElasticDeformation.fft_grid == mode
        loop = make_ehl_loop(problem, use_pallas=False)
        u0 = np.zeros_like(np.asarray(problem.topo.deformation))
        _, u = loop(problem.q, u0, problem.dt, 200)
        us[mode] = np.asarray(u)

    scale = np.abs(us["ghost"]).max()
    assert scale > 0
    assert np.abs(us["interior"] - us["ghost"]).max() / scale < 0.1


def test_semi_periodic_1d_line_contact():
    grid = {
        "dx": 0.01, "dy": 1.0, "Nx": 64, "Ny": 1,
        "Lx": 0.64, "Ly": 1.0,
        "bc_xE_P": [False] * 3, "bc_yS_P": [True] * 3,
    }
    with pytest.warns(UserWarning):
        ed = ElasticDeformation(E=1e4, v=0.3, alpha_underrelax=1.0,
                                grid=grid, n_images=10)
    # 1D special case: treated as a non-periodic line contact
    assert ed.periodicity == "none"

    p = np.zeros((66, 3))
    p[33, :] = 1.0
    u = np.asarray(ed.get_deformation(p))
    assert np.all(np.isfinite(u))
    assert u[33, 1] == u.max()


def test_2d_elastic_ehl_smoke():
    """2D EHL: parabolic gap + free half-space deformation, a few steps."""
    from gapflow_tpu import Problem

    sim = """
options:
    output: data/ehl2d
    write_freq: 1000
    silent: True
grid:
    Lx: 1.e-3
    Ly: 1.e-3
    Nx: 32
    Ny: 32
    xE: ['D', 'N', 'N']
    xW: ['D', 'N', 'N']
    yS: ['D', 'N', 'N']
    yN: ['D', 'N', 'N']
    xE_D: 877.7007
    xW_D: 877.7007
    yS_D: 877.7007
    yN_D: 877.7007
geometry:
    type: parabolic
    hmin: 5.e-7
    hmax: 5.e-6
    U: 1.
    V: 0.
numerics:
    CFL: 0.25
    adaptive: 1
    tol: 1e-8
    dt: 1e-11
    max_it: 10_000
properties:
    shear: 0.0794
    bulk: 0.
    EOS: DH
    P0: 101325
    rho0: 877.7007
    C1: 3.5e10
    C2: 1.23
    elastic:
        E: 5e9
        v: 0.3
        alpha_underrelax: 0.05
"""
    problem = Problem.from_string(sim)
    problem._pre_run()
    assert problem.topo.elastic
    assert problem.topo.ElasticDeformation.periodicity == "none"

    h0 = problem.topo.h.copy()
    for _ in range(10):
        problem.update()

    assert problem.q_is_valid
    defo = np.asarray(problem.topo.deformation)
    assert np.all(np.isfinite(defo))
    # pressure deformed the gap and gradients were updated
    assert np.any(problem.topo.h != h0)
    assert np.all(np.isfinite(problem.topo.dh_dx))


def test_fft_grid_convergence():
    """The ghost- and interior-grid conventions differ by O(1/N) and share
    the continuum limit (the equivalence argument that makes 'interior'
    the default; see ElasticDeformation.__init__).

    A fixed smooth periodic pressure is evaluated at N, 2N, 4N: the
    relative ghost-vs-interior difference must decay ~1/N, and both must
    converge to the analytic periodic response u = 2 p0 cos(qx)/(E* q).
    """
    E = 1e4
    Lx = Ly = 1.0
    p0, k = 2.5, 2
    qwave = 2. * np.pi * k / Lx

    diffs, errs_i, errs_g = [], [], []
    for N in (16, 32, 64, 128):
        grid = {
            "dx": Lx / N, "dy": Ly / N, "Nx": N, "Ny": N,
            "Lx": Lx, "Ly": Ly,
            "bc_xE_P": [True] * 3, "bc_yS_P": [True] * 3,
        }
        x = (np.arange(N) + 0.5) * Lx / N
        p_int = p0 * np.cos(qwave * x)[:, None] * np.ones((1, N))
        p_full = np.pad(p_int, 1, mode="wrap")
        u_ana = 2. * p0 / (E * qwave) * np.cos(qwave * x)[:, None]

        us = {}
        for mode in ("interior", "ghost"):
            ed = ElasticDeformation(E=E, v=0.0, alpha_underrelax=1.0,
                                    grid=grid, n_images=0, fft_grid=mode)
            us[mode] = np.asarray(ed.get_deformation(p_full))[1:-1, 1:-1]

        scale = np.abs(u_ana).max()
        diffs.append(np.abs(us["interior"] - us["ghost"]).max() / scale)
        errs_i.append(np.abs(us["interior"] - u_ana).max() / scale)
        errs_g.append(np.abs(us["ghost"] - u_ana).max() / scale)

    # interior is spectrally exact for this single-mode field: the ghost
    # convention is the one carrying O(1/N) discretization error
    assert max(errs_i) < 1e-10
    # ghost converges to the same limit at first order, so the mutual
    # difference decays ~1/N (allow slack off the asymptotic 0.5 ratio);
    # measured amplitude ~7/N (cell-size factor + wrap-padding leakage)
    for a, b in zip(diffs, diffs[1:]):
        assert b < 0.65 * a
    for a, b in zip(errs_g, errs_g[1:]):
        assert b < 0.65 * a
    assert diffs[-1] < 0.07
