"""The bench-embedded correctness checks (gapflow_tpu.validate) run and
discriminate: the Pallas-vs-XLA comparator is exercised end-to-end via
interpret mode on CPU (on TPU, bench.py runs it Mosaic-compiled)."""

import numpy as np

from gapflow_tpu import validate


def _clear_kernel_caches():
    from gapflow_tpu.ops import stencil
    stencil.make_pallas_loop.cache_clear()
    stencil.make_pallas_step.cache_clear()
    stencil._make_call.cache_clear()


def test_pallas_vs_xla_err_small():
    from jax.experimental.pallas import tpu as pltpu

    with pltpu.force_tpu_interpret_mode():
        _clear_kernel_caches()
        err = validate.pallas_vs_xla_err(nx=32, ny=128, n_steps=3)
        _clear_kernel_caches()
    assert err < 1e-5


def test_pallas_vs_xla_err_thinning_small():
    from jax.experimental.pallas import tpu as pltpu

    with pltpu.force_tpu_interpret_mode():
        _clear_kernel_caches()
        err = validate.pallas_vs_xla_err(
            nx=32, ny=128, n_steps=2,
            extra_props=", piezo: {name: Barus, aB: 2.e-9}, "
                        "thinning: {name: Eyring, tauE: 5.e5}")
        _clear_kernel_caches()
    assert err < 1e-5


def test_sommerfeld_solution_shape():
    x = np.linspace(0., 1., 64)
    p = validate.sommerfeld_solution(x, 1., 0.08, 0.1, 1e-2, 0.7, 1e5)
    assert p.shape == (64,)
    # antisymmetric-ish about the half circumference: max > P0 > min
    assert p.max() > 1e5 > p.min()


def test_ehl_kernel_bitexact_small():
    from jax.experimental.pallas import tpu as pltpu
    from gapflow_tpu.ops import stencil
    from gapflow_tpu.validate import ehl_kernel_bitexact

    with pltpu.force_tpu_interpret_mode():
        stencil.make_pallas_ehl_step.cache_clear()
        stencil.make_pallas_ehl_loop_step.cache_clear()
        stencil._make_call.cache_clear()
        out = ehl_kernel_bitexact(n_steps=2, nx=32, ny=128,
                                  dt_scale=0.01)
        stencil.make_pallas_ehl_step.cache_clear()
        stencil.make_pallas_ehl_loop_step.cache_clear()
        stencil._make_call.cache_clear()
    assert out["ok"], out


def test_correctness_block_core_then_deep_merge(monkeypatch):
    """CORE_CHECKS subset first, the deep pass later: merge semantics.

    The bench runs the cheap trio as an early stage and the rest as a
    late self-capped stage sharing one ``out`` dict; checks must not
    re-run, skips must resolve, and ok must AND across calls."""
    calls = {}

    def fake(name, ret):
        def fn(*a, **k):
            calls[name] = calls.get(name, 0) + 1
            return ret
        return fn

    monkeypatch.setattr(validate, "pallas_vs_xla_err",
                        fake("pallas", 1e-6))
    monkeypatch.setattr(validate, "sommerfeld_l2", fake("somm", 0.012))
    monkeypatch.setattr(validate, "ehl_kernel_bitexact",
                        fake("ehl", {"ok": True}))
    monkeypatch.setattr(validate, "gp_kernel_parity",
                        fake("gpk", {"ok": True}))
    monkeypatch.setattr(validate, "al_chunked_parity",
                        fake("al", {"ok": False}))
    monkeypatch.setattr(validate, "gp_loop_parity",
                        fake("gploop", {"ok": True}))

    out = {}
    validate.correctness_block(out=out, names=validate.CORE_CHECKS)
    assert set(out["check_s"]) == set(validate.CORE_CHECKS)
    assert out["ok"] is True
    assert calls == {"pallas": 1, "somm": 1, "ehl": 1}

    # deep pass: core CHECKS must not re-run (the thinning check calls
    # the same comparator under its own name — that is a new check, not
    # a re-run); al_chunked fails -> ok False
    validate.correctness_block(out=out)
    assert calls["somm"] == 1 and calls["ehl"] == 1
    assert calls["pallas"] == 2      # + pallas_thinning_vs_xla check
    assert calls["gpk"] == 2         # gp_kernel + gp_kernel_mxu
    assert calls["al"] == 1
    assert out["ok"] is False
    assert "skipped" not in out


def test_correctness_block_deadline_skips_then_runs(monkeypatch):
    """A check skipped by one call's deadline runs in a later call."""
    import time

    monkeypatch.setattr(validate, "pallas_vs_xla_err", lambda *a, **k: 1e-6)
    monkeypatch.setattr(validate, "sommerfeld_l2",
                        lambda *a, **k: 0.01)
    monkeypatch.setattr(validate, "ehl_kernel_bitexact",
                        lambda *a, **k: {"ok": True})

    out = {}
    # sommerfeld's estimate exceeds the deadline -> skipped up front
    validate.correctness_block(
        out=out, names=validate.CORE_CHECKS,
        deadline=time.monotonic() + 5., est={"sommerfeld_l2": 100.})
    assert out["skipped"] == ["sommerfeld_l2"]
    assert out["ok"] is True

    # a later call with budget resolves the skip
    validate.correctness_block(
        out=out, names=validate.CORE_CHECKS,
        deadline=time.monotonic() + 500.)
    assert "skipped" not in out
    assert "sommerfeld_l2" in out["check_s"]
