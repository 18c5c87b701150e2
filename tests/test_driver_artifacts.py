"""Consistency guards for the driver-facing artifacts (bench.py,
__graft_entry__.py) — cheap checks that protect the round-recorded
evidence paths from bitrot without paying their full runtime."""

import importlib.util
import json
import sys


def _load(name, path):
    spec = importlib.util.spec_from_file_location(name, path)
    mod = importlib.util.module_from_spec(spec)
    sys.modules[name] = mod
    spec.loader.exec_module(mod)
    return mod


def test_graft_entry_stage_registry_consistent():
    ge = _load("graft_entry_mod", "/root/repo/__graft_entry__.py")
    stage_names = [s for s, _ in ge._STAGES]
    assert stage_names == [
        "toy_train_step",
        "flagship_ring_cp_forward",
        "flagship_train_step",
    ]
    for name in stage_names:
        assert name in ge._STAGE_FNS, name
        assert callable(ge._STAGE_FNS[name])
    # budgets positive and the defaults fit the orchestrator's total
    budgets = [b for _, b in ge._STAGES]
    assert all(b > 60 for b in budgets)


def test_bench_analytic_flops_sane():
    bench = _load("bench_mod", "/root/repo/bench.py")
    f8 = bench.analytic_forward_flops(1, 8, 518, 518)
    f4 = bench.analytic_forward_flops(1, 4, 518, 518)
    # corrected round-4 figure: 19.3 TFLOP at 8 views (the phantom 8x
    # refinenet stage must stay gone)
    assert 19.0e12 < f8 < 19.6e12, f8
    # superlinear in V (global attention is quadratic), but < quadratic
    assert f4 * 2 < f8 < f4 * 4
    # implied MFU at the measured throughput must stay physical
    assert f8 * 43.2 / 8 < bench.V5E_PEAK_TFLOPS * 1e12


def test_bench_budgeted_isolates_failures(capsys):
    bench = _load("bench_mod2", "/root/repo/bench.py")

    def boom():
        raise RuntimeError("intentional")

    bench._budgeted("unit-test bench", 5, boom)
    out = capsys.readouterr().out.strip().splitlines()[-1]
    rec = json.loads(out)
    assert rec["metric"] == "unit-test bench error"
    assert "intentional" in rec["error"]


def test_bench_records_have_required_driver_keys():
    # the driver parses the LAST json line and requires these keys; the
    # extra lines carry the same schema for cross-round comparability
    bench = _load("bench_mod3", "/root/repo/bench.py")
    assert isinstance(bench.ROUND1_VIEWS_PER_S, float)
    assert isinstance(bench.ROUND2_TRAIN_VIEWS_PER_S, float)
    assert "round-1" in bench.INFER_ANCHOR
    assert "round-2" in bench.TRAIN_ANCHOR
