"""Mixed per-component P/D/N edges: Pallas path equals the XLA fused step.

The serial scheme leaves a periodic component's ghost on a mixed edge
UN-refilled — it evolves by the np.roll pass arithmetic with array-edge
wrap (reference GaPFlow/problem.py:676-768: only the D and N masks are
assigned).  These ghosts are state; ops.mixed_bc carries them and evolves
them with XLA ghost-line bands around the fused boundary kernel.  The
XLA det step (core.step.make_det_step) reproduces the serial semantics
exactly (jnp.roll over the ghost-inclusive array + per-component fill)
and is the oracle.

Trajectories run SIX steps so the evolved-ghost values propagate into
the interior (one cell per pass); sensitivity of the comparison to the
ghost treatment was established by corrupting the band side-inputs,
which moves the error by orders of magnitude (to NaN for the y-mixed
cases).  States are perturbed (non-inert) with a small amplitude and dt
that keep the D-edge journal configuration stable over the horizon.
"""

import numpy as np
import pytest

from gapflow_tpu import Problem
from gapflow_tpu.core.step import make_det_step
from gapflow_tpu.ops.mixed_bc import make_mixed_loop, mixed_supported

from test_pallas import sim, perturbed, as_f32, scaled_err

N_STEPS = 6

CASES = {
    # x edges: rho Dirichlet, jx Neumann, jy periodic (evolved ghost rows)
    "x_mixed": """Nx: 8
    xE: ['D', 'N', 'P']
    xW: ['D', 'N', 'P']
    xE_D: 877.7007
    xW_D: 877.7007""",
    # y edges: rho/jx periodic (evolved ghost cols), jy Dirichlet; x periodic
    "y_mixed_x_periodic": """Nx: 8
    yS: ['P', 'P', 'D']
    yN: ['P', 'P', 'D']
    yS_D: 0.
    yN_D: 0.""",
    # both axes mixed (corners evolve too)
    "both_mixed": """Nx: 8
    xE: ['D', 'N', 'P']
    xW: ['D', 'N', 'P']
    xE_D: 877.7007
    xW_D: 877.7007
    yS: ['P', 'P', 'D']
    yN: ['P', 'P', 'D']
    yS_D: 0.
    yN_D: 0.""",
    # uniform D/N x edges combined with a mixed y pair
    "y_mixed_x_uniform": """Nx: 8
    xE: ['D', 'N', 'N']
    xW: ['D', 'N', 'N']
    xE_D: 877.7007
    xW_D: 877.7007
    yS: ['P', 'P', 'D']
    yN: ['P', 'P', 'D']
    yS_D: 0.
    yN_D: 0.""",
}


def _problem(grid):
    yaml = sim.replace("Nx: 32", grid, 1).replace("dt: 5e-11", "dt: 2e-11")
    problem = Problem.from_string(yaml)
    problem._pre_run()
    return problem


def _reference(problem, state):
    det = make_det_step(problem._solver_cfg, with_aux=False)
    s = state
    for _ in range(N_STEPS):
        s = det(s)
    assert bool(s.valid)
    return np.asarray(s.q, np.float32)


def _run_mixed(problem, state, compensated):
    from jax.experimental.pallas import tpu as pltpu

    cfg = problem._solver_cfg
    with pltpu.force_tpu_interpret_mode():
        make_mixed_loop.cache_clear()
        loop = make_mixed_loop(cfg, problem.grid["Nx"], problem.grid["Ny"],
                               bs=8, compensated=compensated)
        out = np.asarray(loop(state.q, state.topo, state.extra,
                              state.dt, N_STEPS))
        make_mixed_loop.cache_clear()
    return out


@pytest.mark.parametrize("case", list(CASES))
def test_mixed_loop_matches_xla_interpret(case):
    problem = _problem(CASES[case])
    cfg = problem._solver_cfg
    assert mixed_supported(cfg, problem.grid["Ny"], problem.grid["Nx"])
    from gapflow_tpu.ops import pallas_supported
    assert not pallas_supported(cfg, problem.grid["Ny"])

    state = as_f32(perturbed(problem, amp=0.001))
    ref = _reference(problem, state)
    out = _run_mixed(problem, state, compensated=False)

    # full comparison INCLUDING the evolved ghost frame
    assert scaled_err(out, ref) < 1e-5
    # the mixed-edge ghost lines themselves
    assert scaled_err(out[:, 0], ref[:, 0]) < 1e-5
    assert scaled_err(out[:, -1], ref[:, -1]) < 1e-5
    assert scaled_err(out[:, :, 0], ref[:, :, 0]) < 1e-5
    assert scaled_err(out[:, :, -1], ref[:, :, -1]) < 1e-5


@pytest.mark.parametrize("case", ["x_mixed", "both_mixed"])
def test_mixed_loop_compensated_matches_plain(case):
    """Delta-emitting kernel + masked Kahan frame carry vs the plain loop.

    Same contract as test_pallas.test_pallas_compensated_loop_matches_plain:
    tight agreement in f64 (identical math, different summation order),
    loose in f32 where the two are distinct rounding paths and the
    compensated one is the more accurate."""
    import jax.numpy as jnp
    from jax.experimental.pallas import tpu as pltpu

    problem = _problem(CASES[case])
    cfg = problem._solver_cfg
    state = perturbed(problem, amp=0.001)

    outs = {}
    with pltpu.force_tpu_interpret_mode():
        make_mixed_loop.cache_clear()
        for dt_ in (jnp.float64, jnp.float32):
            plain = make_mixed_loop(cfg, 8, 128, bs=8, dtype=dt_)
            comp = make_mixed_loop(cfg, 8, 128, bs=8, dtype=dt_,
                                   compensated=True)
            args = (state.q, state.topo, state.extra, state.dt, N_STEPS)
            outs[dt_] = (np.asarray(plain(*args)), np.asarray(comp(*args)))
        make_mixed_loop.cache_clear()

    out_p, out_c = outs[jnp.float64]
    assert scaled_err(out_c, out_p) < 1e-8

    out_p, out_c = outs[jnp.float32]
    assert np.all(np.isfinite(out_c))
    assert scaled_err(out_c, out_p) < 5e-3


def test_mixed_routing():
    """make_pallas_loop and run_steps_fast route mixed configs to the
    mixed-edge loop (and reject unsupported shapes)."""
    problem = _problem(CASES["x_mixed"])
    cfg = problem._solver_cfg

    import jax.numpy as jnp
    from gapflow_tpu.ops.stencil import make_pallas_loop
    make_pallas_loop.cache_clear()
    make_mixed_loop.cache_clear()
    loop = make_pallas_loop(cfg, 8, 128, bs=8)
    # same cache entry as a direct make_mixed_loop call (keyword-for-
    # keyword, as make_pallas_loop delegates)
    assert loop is make_mixed_loop(cfg, 8, 128, bs=8, dtype=jnp.float32,
                                   compensated=False)
    with pytest.raises(ValueError, match="Kahan carry"):
        make_pallas_loop(cfg, 8, 128, bs=8, compensated=True, with_lo=True)
    make_pallas_loop.cache_clear()
    make_mixed_loop.cache_clear()


def test_mixed_supported_gating():
    from dataclasses import replace
    problem = _problem(CASES["x_mixed"])
    cfg = problem._solver_cfg
    assert mixed_supported(cfg, 128, 8)
    assert not mixed_supported(cfg, 127, 8)        # lane alignment
    assert not mixed_supported(cfg, 128, 4)        # band lines collide
    assert not mixed_supported(replace(cfg, MC_order=0), 128, 8)
    assert not mixed_supported(
        replace(cfg, thinning=(("model", "Eyring"), ("tau0", 1e5))), 128, 8)

    # uniform-edge configs stay with the uniform kernels
    uni = Problem.from_string(sim)
    uni._pre_run()
    assert not mixed_supported(uni._solver_cfg, 128, 32)


def test_mixed_thinning_takes_xla_fallback():
    """The one kernel-uncovered configuration — mixed per-component
    edges + shear thinning — must take the XLA fallback BIT-FAITHFULLY
    through the production entry (run_steps_fast -> run_steps).  The
    sealing argument lives in the ops/mixed_bc.py docstring: the
    thinning viscosity couples every interior cell to the EVOLVED
    (carried, non-reconstructible) ghost lines through np.gradient's
    one-sided stencils, which the per-strip kernel cannot see."""
    yaml = (sim.replace("Nx: 32", CASES["x_mixed"], 1)
               .replace("dt: 5e-11", "dt: 2e-11")
               .replace("    C2: 1.23",
                        "    C2: 1.23\n"
                        "    thinning: {name: Eyring, tauE: 5.e5}"))

    p_fast = Problem.from_string(yaml)
    p_fast._pre_run()
    cfg = p_fast._solver_cfg
    assert cfg.thinning is not None
    # the kernel family declines this config ...
    from gapflow_tpu.ops import pallas_supported
    assert not mixed_supported(cfg, p_fast.grid["Ny"], p_fast.grid["Nx"])
    assert not pallas_supported(cfg, p_fast.grid["Ny"])

    # ... so run_steps_fast routes to run_steps: same XLA det program as
    # the oracle — outputs are bit-identical, not just close
    p_ref = Problem.from_string(yaml)
    p_ref._pre_run()
    state = p_ref._make_state()
    ref = _reference(p_ref, state)

    p_fast.run_steps_fast(N_STEPS)
    np.testing.assert_array_equal(np.asarray(p_fast.q, np.float32), ref)
