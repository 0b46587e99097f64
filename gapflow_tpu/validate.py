"""Hardware correctness checks for the production (f32, Pallas) path.

These run on whatever backend JAX is using — on a real TPU they validate
the Mosaic-compiled kernels, which the CPU test suite can only exercise
in interpret mode.  ``bench.py`` folds them into every benchmark run so
BENCH_r*.json carries a correctness block next to the throughput numbers
(a TPU-only kernel regression fails the bench loudly instead of shipping
a fast wrong number).

Two checks:

- :func:`sommerfeld_l2` — the flagship journal-bearing problem through
  the fused production loop to steady state vs the analytic Sommerfeld
  pressure (same <2% rel-L2 criterion as the f64 verification suite;
  reference analogue: GaPFlow/tests/test_journal_bearing.py).
- :func:`pallas_vs_xla_err` — one fused Pallas step vs the XLA step on a
  PERTURBED journal state (the unperturbed state is f32-frozen and
  compares trivially), component-scaled max error.  Distinct compiled
  programs agree to f32 rounding (~1e-7/step); real kernel bugs measure
  orders above (the periodic-x thinning seam bug was 6e-5 in one step).
"""

import numpy as np
import jax
import jax.numpy as jnp


_JOURNAL = """
options: {{output: {out}, write_freq: 100000, silent: True}}
grid: {{dx: {dx}, dy: {dy}, Nx: {nx}, Ny: {ny}}}
geometry: {{type: journal, CR: 1.e-2, eps: 0.7, U: 0.1, V: 0.}}
numerics: {{CFL: 0.5, adaptive: 0, tol: {tol}, dt: {dt}, max_it: 1000000}}
properties: {{shear: 0.0794, bulk: 0., EOS: DH, P0: 101325.,
             rho0: 877.7007, C1: 3.5e10, C2: 1.23{extra_props}}}
"""


def journal_problem(nx=256, ny=128, dx=4.e-6, dt=1.5e-10, tol=1e-9,
                    out="data/val", extra_props=""):
    from . import Problem
    return Problem.from_string(_JOURNAL.format(
        nx=nx, ny=ny, dx=dx, dy=dx, dt=dt, tol=tol, out=out,
        extra_props=extra_props))


def sommerfeld_solution(x, Lx, mu, U, clearance_ratio, eps, P0):
    """Analytic Sommerfeld journal-bearing pressure (full film)."""
    Rb = Lx / (2. * np.pi)
    c = clearance_ratio * Rb
    omega = U / Rb
    prefac = 6. * mu * omega * (Rb / c) ** 2 * eps
    return P0 + prefac * np.sin(x / Rb) * (2. + eps * np.cos(x / Rb)) \
        / ((2. + eps ** 2) * (1. + eps * np.cos(x / Rb)) ** 2)


def sommerfeld_l2(n_steps=20000, nx=256, ny=128):
    """Rel-L2 pressure error of the f32 production loop vs Sommerfeld.

    The f32 parameter constraints (EOS stiffness above f32 ulp, stiff
    source stability, compensated accumulation against increment
    underflow) are documented in examples/validate_f32_production.py.
    """
    problem = journal_problem(nx=nx, ny=ny)
    problem._pre_run()
    problem.run_steps_fast(n_steps)

    problem._refresh_det_fields()
    p_num = np.asarray(problem.pressure.pressure)[1:-1, ny // 2]

    Lx = problem.grid["Lx"]
    x_edges = np.linspace(0., Lx, nx + 1)
    x = (x_edges[1:] + x_edges[:-1]) / 2.

    dp = p_num[1] - p_num[0]
    p_ana = sommerfeld_solution(x, Lx, problem.prop["shear"],
                                problem.geo["U"], problem.geo["CR"],
                                problem.geo["eps"], p_num[0] - dp / 2)
    return float(np.linalg.norm(p_ana - p_num) / np.linalg.norm(p_ana))


def _perturbed_state(problem, seed=0, amp=0.01):
    """Non-inert f32 journal state (the initial state is f32-frozen)."""
    from .core.step import apply_bcs
    st = problem._make_state()
    rng = np.random.default_rng(seed)
    q = np.array(st.q)
    q[0] *= 1. + amp * rng.standard_normal(q[0].shape)
    q[1] += 0.1 * amp * float(np.mean(q[0])) * rng.standard_normal(q[0].shape)
    st = st._replace(q=apply_bcs(jnp.asarray(q, st.q.dtype),
                                 problem._solver_cfg))
    return jax.tree.map(
        lambda a: a.astype(jnp.float32)
        if hasattr(a, "dtype") and a.dtype == jnp.float64 else a, st)


def pallas_vs_xla_err(nx=256, ny=256, n_steps=8, extra_props="", amp=0.01):
    """Component-scaled max error, Pallas loop vs XLA steps, perturbed state.

    Runs n_steps through BOTH the fused Pallas loop (the production path,
    Mosaic-compiled on TPU) and the per-step XLA program, from the same
    perturbed f32 state.  Returns max_c max_xy |pallas - xla| / max|xla_c|.
    """
    from .core.step import make_det_step
    from .ops import make_pallas_loop, pallas_supported

    # dx/dt from the bench config: stable for any nx (the Sommerfeld
    # dx=4e-6 is tuned to nx=256 — at smaller nx its gap shrinks with Lx
    # and the stiff wall source 6*nu*dt/h_min^2 > 1 blows up both paths)
    problem = journal_problem(nx=nx, ny=ny, dx=2.e-5, dt=5.e-11,
                              out="data/val_eq", extra_props=extra_props)
    problem._pre_run()
    if not pallas_supported(problem._solver_cfg, ny):
        raise RuntimeError("flagship config lost Pallas support")

    # amp*C1 is the induced pressure swing; non-Newtonian configs need
    # amp ~ 1e-4 (3.5e6 Pa) — at amp=0.01 the thinned film is unstable
    # and BOTH paths blow up (the XLA step then freezes via its validity
    # rollback while the kernel runs on to NaN)
    state = _perturbed_state(problem, amp=amp)

    det = jax.jit(make_det_step(problem._solver_cfg, with_aux=False))
    s = state
    for _ in range(n_steps):
        s = det(s)
    ref = np.asarray(s.q, dtype=np.float32)

    loop = make_pallas_loop(problem._solver_cfg, nx, ny)
    out = np.asarray(loop(state.q, state.topo, state.extra,
                          state.dt, n_steps))

    scale = np.abs(ref).reshape(3, -1).max(axis=1)
    return float(np.max(np.abs(out - ref) / scale[:, None, None]))


_AL_SIM = """
options: {{output: {tmp}/{tag}, write_freq: 1000, use_tstamp: False,
          silent: True}}
grid: {{Lx: 1470., Ly: 1., Nx: 100, Ny: 1, xE: ['D', 'N', 'N'],
       xW: ['D', 'N', 'N'], xE_D: 0.8, xW_D: 0.8}}
geometry: {{type: parabolic, hmin: 12., hmax: 60., U: 0.12, V: 0.}}
numerics: {{CFL: 0.5, adaptive: 0, tol: 1e-8, dt: 0.02, max_it: 5000}}
properties: {{shear: 2.15, bulk: 0., EOS: BWR, T: 1.0, rho0: 0.8}}
gp:
    press: {{fix_noise: True, atol: 1.e-3, rtol: 0., obs_stddev: 2.e-2,
            max_steps: 2, active_learning: True}}
    shear: {{fix_noise: True, atol: 1.e-3, rtol: 0., obs_stddev: 4.e-3,
            max_steps: 2, active_learning: True}}
db: {{init_size: 4, init_method: lhc, dtool_path: {tmp}/train_{tag}}}
"""


def al_chunked_parity(n_steps=3):
    """Mock-oracle AL: chunked device-host loop vs the host protocol.

    Runs both paths on the active backend (on TPU this is the VERDICT
    'on-device GP+AL validated on hardware' check — the chunked loop
    needs no io_callback, which tunneled runtimes lack) and compares the
    final database, hyperparameters and state.  Acquisition decisions
    are host-made in both paths, so Xtrain must match EXACTLY.
    """
    import contextlib
    import io
    import tempfile
    from . import Problem

    tmp = tempfile.mkdtemp()
    # the GP training/MD banners print unconditionally (host protocol);
    # swallow them so bench output stays one JSON line
    with contextlib.redirect_stdout(io.StringIO()):
        ph = Problem.from_string(_AL_SIM.format(tmp=tmp, tag="host"))
        ph._pre_run()
        pc = Problem.from_string(_AL_SIM.format(tmp=tmp, tag="chun"))
        pc._pre_run()

        for _ in range(n_steps):
            ph.update()
        n_acq = pc.run_steps_gp_chunked(n_steps)

    x_diff = float(np.abs(np.asarray(pc.database._Xtrain)
                          - np.asarray(ph.database._Xtrain)).max()) \
        if pc.database.size == ph.database.size else float("inf")
    p_diff = max(float(np.abs(np.asarray(pc.pressure.params[k])
                              - np.asarray(ph.pressure.params[k])).max())
                 for k in ph.pressure.params)
    q_diff = float(np.abs(pc.q - ph.q).max() / np.abs(ph.q).max())
    # Protocol parity is the EXACT checks: identical acquisitions
    # (x_diff == 0 bit-for-bit) and hyperparameters.  The q fields are
    # assembled by different-but-equivalent f32 programs (host closures
    # vs fused step), and the GP-closed step amplifies one-ulp input
    # differences through the surrogate pressure (Yscale ~1e5, stiff
    # BWR kernel weights); the f64 CPU suite (tests/test_al_chunked.py)
    # pins the same two paths to rtol 1e-6, so the f32 bound here is a
    # conditioning allowance, not a logic tolerance.
    return {
        "n_acquired": int(n_acq),
        "db_size": int(pc.database.size),
        "xtrain_maxdiff": x_diff,
        "press_param_maxdiff": p_diff,
        "q_rel_maxdiff": q_diff,
        "ok": bool(n_acq > 0 and x_diff == 0.0 and p_diff < 1e-5
                   and q_diff < 1e-3),
    }


def ehl_kernel_bitexact(n_steps=4, nx=256, ny=128, dt_scale=1.0):
    """Interior-carry EHL kernel vs the emit-delta kernel + explicit
    Kahan two-sum on the ACTIVE backend.

    On a real TPU this exercises the Mosaic-compiled double-buffered
    wrap-halo DMA pipeline of ``_kernel_fused_ehl6`` — exactly the part
    interpret-mode CPU tests cannot stress (DMA/compute races are
    serialized away by the interpreter).  The two formulations share
    their arithmetic; on TPU the comparison comes out bit-equal, and
    ``ok`` allows up to a few ulps relative (compiler FMA contraction
    can differ between the two graphs on other backends).

    ``dt_scale`` shrinks the timestep for off-design grid sizes whose
    default-dt dynamics blow up (the amplified state would magnify ulp
    noise into absolute differences).
    """
    from .ops.stencil import (make_pallas_ehl_step, make_pallas_ehl_loop_step,
                              HALO_X, _reassemble)

    problem = journal_problem(nx=nx, ny=ny)
    problem._pre_run()
    cfg = problem._solver_cfg
    state = _perturbed_state(problem)
    q0 = jnp.asarray(state.q, jnp.float32)
    rng = np.random.default_rng(7)
    u = jnp.asarray(rng.standard_normal((nx + 2, ny + 2)) * 1e-9,
                    jnp.float32)
    # journal_problem has no elastic block; any ghost-inclusive height
    # works as the undeformed gap for this arithmetic-identity check
    h_und = jnp.asarray(problem.topo.h, jnp.float32)
    extra = jnp.asarray(problem.fc.get_real_field("extra").p, jnp.float32)
    dt = jnp.float32(problem.dt * dt_scale)

    dstep = make_pallas_ehl_step(cfg, nx, ny, emit_delta=True)
    qr = q0
    lo = np.zeros((3, nx, ny), np.float32)
    for _ in range(n_steps):
        delta = np.asarray(dstep(qr, u, h_und, extra, dt))
        y = delta + lo
        qi = np.asarray(qr)[:, 1:-1, 1:-1]
        t = qi + y
        lo = y - (t - qi)
        qr = _reassemble(qr, jnp.asarray(t))

    hf = h_und + u
    rdx2, rdy2 = 0.5 / cfg.dx, 0.5 / cfg.dy
    px = jnp.stack([(hf[2, 1:-1] - hf[0, 1:-1]) * rdx2,
                    (hf[-1, 1:-1] - hf[-3, 1:-1]) * rdx2])

    def wrapv(v):
        return jnp.concatenate([v[-HALO_X:], v, v[:HALO_X]], 0)

    py = jnp.stack([wrapv((hf[1:-1, 2] - hf[1:-1, 0]) * rdy2),
                    wrapv((hf[1:-1, -1] - hf[1:-1, -3]) * rdy2)], axis=1)

    step6 = make_pallas_ehl_loop_step(cfg, nx, ny)
    q6 = jnp.concatenate([q0[:, 1:-1, 1:-1],
                          jnp.zeros((3, nx, ny), jnp.float32)], 0)
    for _ in range(n_steps):
        q6 = step6(q6, hf[1:-1, 1:-1], extra[0, 1:-1, 1:-1], px, py, dt)

    dq = float(np.abs(np.asarray(q6[:3])
                      - np.asarray(qr)[:, 1:-1, 1:-1]).max())
    dl = float(np.abs(np.asarray(q6[3:]) - lo).max())
    scale = float(np.abs(np.asarray(qr)).max())
    return {"q_maxdiff": dq, "lo_maxdiff": dl,
            "ok": bool(dq <= 1e-6 * scale and dl <= 1e-6 * scale)}


_GP_SIM = """
options: {{output: {tmp}, write_freq: 1000000, silent: True}}
grid: {{dx: 2.e-5, dy: 2.e-5, Nx: 64, Ny: 128}}
geometry: {{type: journal, CR: 1.e-2, eps: 0.7, U: 0.1, V: 0.05}}
numerics: {{CFL: 0.25, adaptive: 0, tol: 1e-30, dt: 5e-11, max_it: 10}}
properties: {{shear: 0.0794, bulk: 0., EOS: DH, P0: 101325.,
             rho0: 877.7007, C1: 3.5e10, C2: 1.23}}
gp:
    press: {{fix_noise: True, atol: 1., rtol: 0.1, obs_stddev: 100.,
            max_steps: 2}}
    shear: {{fix_noise: True, atol: 1., rtol: 0.1, obs_stddev: 1.,
            max_steps: 2}}
db: {{init_size: 4, init_method: sobol, init_width: 1.e-4,
     dtool_path: {tmp}}}
"""


def synthetic_gp_state(dims, use, cap, rng):
    """Well-conditioned padded GP state for kernel parity checks.

    A state trained on a near-uniform initial flow is degenerate
    (saturated kernel, catastrophic alpha cancellation) and meaningless
    to compare in f32; production states behave like this synthetic one.
    """
    state = {"Xscale": jnp.asarray(
        np.array([877.7, 68.7, 23.7, 1.7e-6, 6.2e-3, 6.2e-3, 1.0]),
        jnp.float32)}
    for key, dms, used, yscale in zip(("z", "x", "y"), dims, use,
                                      (1e5, 1e3, 1e3)):
        if not used:
            continue
        d = len(dms)
        state[f"params_{key}"] = {
            "log_amp": jnp.asarray(0.2, jnp.float32),
            "log_scale": jnp.asarray(rng.uniform(-0.5, 0.5, d),
                                     jnp.float32)}
        state[f"Xfit_{key}"] = jnp.asarray(
            rng.uniform(0., 1.2, (cap, d)), jnp.float32)
        m = 1 if key == "z" else 2
        alpha = rng.normal(size=(cap, m))
        state[f"alpha_{key}"] = jnp.asarray(
            alpha if m == 2 else alpha[:, 0], jnp.float32)
        state[f"Yscale_{key}"] = jnp.asarray(yscale, jnp.float32)
    return state


def gp_kernel_parity(cap=16):
    """Fused Pallas GP step vs the XLA GP step on the ACTIVE backend.

    On real TPU the two come out f32-identical (verified during
    development at 1024^2/capacity 64); ``ok`` allows f32-rounding-level
    scaled error.
    """
    import contextlib
    import io
    import tempfile
    from . import Problem
    from .core.gp_step import make_gp_step_core
    from .core.step import apply_bcs

    tmp = tempfile.mkdtemp()
    with contextlib.redirect_stdout(io.StringIO()):
        problem = Problem.from_string(_GP_SIM.format(tmp=tmp))
        problem._pre_run()
    dims = tuple(tuple(m.active_dims) if m.is_gp_model else None
                 for m in (problem.pressure, problem.wall_stress_xz,
                           problem.wall_stress_yz))
    use = tuple(m.is_gp_model for m in (problem.pressure,
                                        problem.wall_stress_xz,
                                        problem.wall_stress_yz))
    cfg = problem._solver_cfg
    rng = np.random.default_rng(0)
    gp_state = synthetic_gp_state(dims, use, cap, rng)

    q = np.asarray(problem.q, np.float32)
    q[0] *= 1 + 1e-3 * rng.standard_normal(q[0].shape)
    q = jnp.asarray(np.asarray(apply_bcs(jnp.asarray(q), cfg), np.float32))
    topo = jnp.asarray(problem.topo.full, jnp.float32)
    extra = jnp.asarray(problem.fc.get_real_field("extra").p, jnp.float32)
    dt = jnp.float32(problem.dt)
    nf = problem.database.num_features

    from .ops.stencil_gp import make_pallas_gp_step_fn
    nx, ny = q.shape[1] - 2, q.shape[2] - 2
    caps = tuple(gp_state[f"Xfit_{k}"].shape[0] if u else 0
                 for k, u in zip(("z", "x", "y"), use))
    kstep = make_pallas_gp_step_fn(cfg, dims, nf, use, nx, ny, caps)
    qk, pk = kstep(q, topo, extra, dt, 0, gp_state)
    ref = make_gp_step_core(cfg, dims, nf, use, allow_pallas=False)
    qr, pr = ref(q, topo, extra, dt, 0, gp_state)

    qr, qk = np.asarray(qr), np.asarray(qk)
    sc = np.abs(qr).reshape(3, -1).max(1)[:, None, None]
    sc = np.maximum(sc, 1e-6 * sc.max())
    q_err = float(np.max(np.abs(qk - qr) / sc))
    p_err = float(np.abs(np.asarray(pk) - np.asarray(pr)).max()
                  / np.abs(np.asarray(pr)).max())
    return {"q_scaled_maxerr": q_err, "p_rel_maxerr": p_err,
            "ok": bool(q_err < 2e-5 and p_err < 2e-5)}


def gp_loop_parity(cap=96, n=3):
    """Whole-run-in-VMEM GP loop kernel vs n repeated XLA GP steps on the
    ACTIVE backend (the on-chip analogue of
    tests/test_gp_pallas.py::test_gp_pallas_loop_matches_steps; cap > 64
    exercises the capacity-tiled MXU formulation)."""
    import contextlib
    import io
    import tempfile
    from . import Problem
    from .core.gp_step import make_gp_step_core
    from .core.step import apply_bcs

    tmp = tempfile.mkdtemp()
    with contextlib.redirect_stdout(io.StringIO()):
        problem = Problem.from_string(_GP_SIM.format(tmp=tmp))
        problem._pre_run()
    dims = tuple(tuple(m.active_dims) if m.is_gp_model else None
                 for m in (problem.pressure, problem.wall_stress_xz,
                           problem.wall_stress_yz))
    use = tuple(m.is_gp_model for m in (problem.pressure,
                                        problem.wall_stress_xz,
                                        problem.wall_stress_yz))
    cfg = problem._solver_cfg
    rng = np.random.default_rng(1)
    gp_state = synthetic_gp_state(dims, use, cap, rng)

    q = np.asarray(problem.q, np.float32)
    q[0] *= 1 + 1e-3 * rng.standard_normal(q[0].shape)
    q = jnp.asarray(np.asarray(apply_bcs(jnp.asarray(q), cfg), np.float32))
    topo = jnp.asarray(problem.topo.full, jnp.float32)
    extra = jnp.asarray(problem.fc.get_real_field("extra").p, jnp.float32)
    dt = jnp.float32(problem.dt)
    nf = problem.database.num_features
    nx, ny = q.shape[1] - 2, q.shape[2] - 2
    caps = tuple(cap if u else 0 for u in use)

    ref = make_gp_step_core(cfg, dims, nf, use, allow_pallas=False)
    qr = q
    for s in range(n):
        qr, _ = ref(qr, topo, extra, dt, s, gp_state)

    from .ops.stencil_gp import make_pallas_gp_loop_fn
    loop = make_pallas_gp_loop_fn(cfg, dims, nf, use, nx, ny, caps, n)
    qk = loop(q, topo, extra, dt, gp_state)

    qr, qk = np.asarray(qr), np.asarray(qk)
    sc = np.abs(qr).reshape(3, -1).max(1)[:, None, None]
    sc = np.maximum(sc, 1e-6 * sc.max())
    q_err = float(np.max(np.abs(qk - qr) / sc))
    return {"q_scaled_maxerr": q_err, "ok": bool(q_err < 5e-5)}


# the cheap high-value trio (~60 s cold on the tunnel TPU): production
# f32 physics + deterministic Pallas parity + the EHL DMA pipeline.
# Running these as their own early bench stage guarantees a
# ``correctness.ok`` verdict even when the driver window kills the run
# before the compile-heavy deep checks (gp_kernel parity alone measures
# ~250 s cold).
CORE_CHECKS = ("pallas_vs_xla_max_scaled_err", "sommerfeld_l2",
               "ehl_kernel")


def correctness_block(sommerfeld_steps=20000, deadline=None, out=None,
                      est=None, names=None):
    """Run the checks; returns a dict for the bench JSON line.

    ``ok`` is False on any regression — bench.py exits nonzero on it.
    ``deadline`` (time.monotonic value): checks still pending when it
    passes are recorded in ``skipped`` instead of running — the bench's
    global budget must not die inside this block (round 4 did).  Checks
    run highest-priority first; per-check durations land in ``check_s``
    so cost regressions are driver-visible.  Pass ``out`` (a dict
    already referenced by the bench result) to make every finished
    check immediately visible to the SIGTERM flush — a driver-window
    kill mid-block then still records the completed checks.  ``est``
    maps check names to expected seconds (bench persists measured
    values): a check whose estimate does not fit before the deadline is
    skipped up front instead of overrunning it in flight (al_chunked
    measured 166-358 s; an in-flight overrun starves later bench
    stages).  ``names`` restricts the run to a subset of checks (the
    bench runs CORE_CHECKS as an early stage of their own); repeated
    calls MERGE into ``out``: check_s/skipped accumulate, already-run
    checks are not repeated, and ``ok`` ANDs across calls.
    """
    import time as _time

    checks = [
        # cheap first (cold costs measured on the tunnel TPU) so a
        # tight deadline still yields a multi-check verdict
        ("pallas_vs_xla_max_scaled_err", pallas_vs_xla_err),    # ~11 s
        ("ehl_kernel", ehl_kernel_bitexact),                    # ~20 s
        ("sommerfeld_l2",
         lambda: sommerfeld_l2(n_steps=sommerfeld_steps)),      # ~31 s
        ("gp_kernel", gp_kernel_parity),                        # ~254 s
        ("al_chunked", al_chunked_parity),                      # ~250 s
        ("pallas_thinning_vs_xla_max_scaled_err",
         lambda: pallas_vs_xla_err(
             extra_props=", piezo: {name: Barus, aB: 2.e-9}, "
                         "thinning: {name: Eyring, tauE: 5.e5}",
             amp=1e-4)),
        ("gp_kernel_mxu", lambda: gp_kernel_parity(cap=1024)),
        ("gp_loop", gp_loop_parity),
    ]
    thresholds = {
        "sommerfeld_l2": lambda v: v < 0.02,
        "pallas_vs_xla_max_scaled_err": lambda v: v < 1e-4,
        "pallas_thinning_vs_xla_max_scaled_err": lambda v: v < 1e-4,
    }

    out = {} if out is None else out
    est = est or {}
    out.setdefault("check_s", {})
    out.setdefault("skipped", [])
    out.setdefault("ok", True)
    for name, fn in checks:
        if names is not None and name not in names:
            continue
        if name in out["check_s"]:
            continue
        if deadline is not None and (_time.monotonic()
                                     + est.get(name, 0.) > deadline):
            if name not in out["skipped"]:
                out["skipped"].append(name)
            continue
        if name in out["skipped"]:
            out["skipped"].remove(name)
        t0 = _time.monotonic()
        res = fn()
        out[name] = res
        out["check_s"][name] = round(_time.monotonic() - t0, 1)
        passed = (thresholds[name](res) if name in thresholds
                  else bool(res["ok"]))
        out["ok"] = bool(out["ok"] and passed)
    if not out["skipped"]:
        out.pop("skipped", None)
    return out
