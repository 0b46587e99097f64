"""Non-Newtonian and cavitation physics paths through the fused solver."""

import numpy as np
import pytest

from gapflow_tpu import Problem
from gapflow_tpu.core.step import SolverConfig, make_det_step, det_closures
from gapflow_tpu.models.viscosity import (piezoviscosity,
                                          shear_thinning_factor,
                                          shear_rate_avg)

import jax.numpy as jnp


def test_effective_viscosity_matches_model_classes():
    """The fused step's viscosity corrections equal the host model path."""
    import io as _io
    from gapflow_tpu.config import read_yaml_input

    sim = """
options: {output: d, write_freq: 1000, silent: True}
grid: {Lx: 1.e-3, dy: 1., Nx: 64, Ny: 1}
geometry: {type: parabolic, hmin: 1.e-5, hmax: 5.e-5, U: 3., V: 0.}
numerics: {CFL: 0.4, adaptive: 1, tol: 1e-7, dt: 1e-10, max_it: 10}
properties:
    shear: 0.039
    bulk: 0.
    EOS: DH
    P0: 101325
    rho0: 877.7007
    C1: 3.5e10
    C2: 1.23
    piezo: {name: Barus, aB: 2.e-9}
    thinning: {name: Eyring, tauE: 5.e5}
"""
    with _io.StringIO(sim) as fh:
        d = read_yaml_input(fh)

    cfg = SolverConfig.from_dicts(d["grid"], d["geometry"], d["properties"],
                                  d["numerics"])
    assert cfg.piezo is not None and cfg.thinning is not None

    from gapflow_tpu.core.step import effective_viscosity
    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.uniform(800., 900., (3, 10, 3)))
    p = jnp.asarray(rng.uniform(1e5, 1e7, (10, 3)))
    h = jnp.asarray(rng.uniform(1e-5, 5e-5, (10, 3)))

    eta_fused = effective_viscosity(cfg, q, p, h)

    mu0 = piezoviscosity(p, 0.039, d["properties"]["piezo"])
    dp_dx = jnp.gradient(p, cfg.dx, axis=0)
    dp_dy = jnp.gradient(p, cfg.dy, axis=1)
    rate = shear_rate_avg(dp_dx, dp_dy, h, cfg.U, cfg.V, mu0)
    eta_ref = mu0 * shear_thinning_factor(rate, mu0,
                                          d["properties"]["thinning"])

    np.testing.assert_allclose(np.asarray(eta_fused), np.asarray(eta_ref),
                               rtol=1e-12)


def test_piezo_thinning_run():
    """Barus piezoviscosity + Eyring thinning: stable short run."""
    sim = """
options: {output: d, write_freq: 1000, silent: True}
grid:
    Lx: 1.e-3
    dy: 1.
    Nx: 128
    Ny: 1
    xE: ['D', 'N', 'N']
    xW: ['D', 'N', 'N']
    xE_D: 877.7007
    xW_D: 877.7007
geometry: {type: parabolic, hmin: 1.e-5, hmax: 5.e-5, U: 3., V: 0.}
numerics: {CFL: 0.4, adaptive: 1, tol: 1e-7, dt: 1e-11, max_it: 10000}
properties:
    shear: 0.039
    bulk: 0.
    EOS: DH
    P0: 101325
    rho0: 877.7007
    C1: 3.5e10
    C2: 1.23
    piezo: {name: Barus, aB: 2.e-9}
    thinning: {name: Eyring, tauE: 5.e5}
"""
    p = Problem.from_string(sim)
    qs, _ = p.run_steps(100)
    assert np.all(np.isfinite(qs[-1]))
    assert np.all(qs[-1][0] > 0.)


def test_bayada_cavitation_run():
    """Bayada-Chupin two-phase EOS + McAdams mixture viscosity run.

    The diverging section of the parabolic gap cavitates: densities drop
    into the mixture region, pressure stays finite.
    """
    sim = """
options: {output: d, write_freq: 1000, silent: True}
grid:
    Lx: 0.02
    dy: 1.
    Nx: 128
    Ny: 1
    xE: ['D', 'N', 'N']
    xW: ['D', 'N', 'N']
    xE_D: 850.
    xW_D: 850.
geometry: {type: parabolic, hmin: 1.e-5, hmax: 5.e-5, U: 3., V: 0.}
numerics: {CFL: 0.4, adaptive: 1, tol: 1e-7, dt: 1e-9, max_it: 100000}
properties:
    shear: 0.039
    bulk: 0.
    EOS: Bayada
    rho_l: 850.
    rho_v: 0.019
    c_l: 1600.
    c_v: 352.
    piezo: {name: McAdams, eta_v: 3.9e-5, rho_l: 850., rho_v: 0.019}
"""
    p = Problem.from_string(sim)
    qs, _ = p.run_steps(400)
    q = qs[-1]
    assert np.all(np.isfinite(q))
    assert np.all(q[0] > 0.)
    p._refresh_det_fields()
    assert np.all(np.isfinite(np.asarray(p.pressure.pressure)))
