"""Pure-logic guards for the bench harness (no Spark): the adaptive
tail (VERDICT r4 nit #5 — float-equality heuristic replaced by an
explicit improved-last flag; ADVICE r4 — repeat<1 crashed), and the
fresh-JVM rerun trigger."""

import importlib.util
import sys

# import bench.py without running main() and without requiring Spark
import os

_BENCH = os.path.join(os.path.dirname(__file__), "..", "bench.py")
_spec = importlib.util.spec_from_file_location("bench", _BENCH)
bench = importlib.util.module_from_spec(_spec)
sys.modules.setdefault("bench", bench)
_spec.loader.exec_module(bench)


def test_more_runs_mandatory_phase():
    assert bench._more_runs(0, 2, None, True)
    assert bench._more_runs(1, 2, 5.0, False)
    assert not bench._more_runs(2, 2, 1.0, True)  # cheap query: no tail


def test_more_runs_adaptive_tail_tracks_improvement():
    # heavy query, last run improved → up to 2 extra runs
    assert bench._more_runs(2, 2, 3.0, True)
    assert bench._more_runs(3, 2, 2.9, True)
    assert not bench._more_runs(4, 2, 2.8, True)  # tail cap
    # the r4 failure shape: fast-then-slow sequence — last run did NOT
    # improve, tail must stop even though best > 2.0
    assert not bench._more_runs(2, 2, 2.5, False)


def test_more_runs_safe_at_repeat_zero():
    # repeat is clamped to >=1 in main(), but the predicate itself must
    # not crash on best=None either (the old form raised TypeError)
    assert bench._more_runs(0, 1, None, True)
    assert not bench._more_runs(1, 1, None, True)


def test_flag_outliers_ratio_and_floor():
    times = {"a": 3.0, "b": 0.4, "c": 1.0, "d": 9.0, "e": 2.0}
    ref = {"a": 1.0, "b": 0.1, "c": 0.9, "d": 2.0}  # e: no reference
    got = bench._flag_outliers(times, ref)
    # b is >1.5x but under the 0.5s floor; c is within 1.5x; e unknown
    assert got == ["d", "a"]  # worst ratio first (4.5x before 3.0x)


def test_reference_times_is_per_query_min_across_rounds(monkeypatch, tmp_path):
    import json

    # r03 in bench.py's own shape; r04 in the driver's wrapped shape
    (tmp_path / "BENCH_r03.json").write_text(json.dumps({"queries": {"q": 1.0, "r": 5.0}}))
    (tmp_path / "BENCH_r04.json").write_text(
        json.dumps({"rc": 0, "tail": "...", "parsed": {"queries": {"q": 2.0, "s": 0.3}}})
    )
    monkeypatch.setattr(bench, "_HERE", str(tmp_path))
    monkeypatch.delenv("SPARK_GRAFT_BENCH_REF", raising=False)
    label, ref = bench._reference_times()
    # q: best prior wins (a noisy later round can't mask a regression)
    assert ref == {"q": 1.0, "r": 5.0, "s": 0.3} and label


def test_reference_times_survives_malformed_rounds(monkeypatch, tmp_path):
    import json

    (tmp_path / "BENCH_r01.json").write_text(json.dumps([1, 2]))  # list top level
    (tmp_path / "BENCH_r02.json").write_text(json.dumps({"rc": 1, "parsed": None}))
    (tmp_path / "BENCH_r03.json").write_text(json.dumps({"queries": {"q": 1.5}}))
    monkeypatch.setattr(bench, "_HERE", str(tmp_path))
    monkeypatch.delenv("SPARK_GRAFT_BENCH_REF", raising=False)
    label, ref = bench._reference_times()
    assert ref == {"q": 1.5}


def test_probe_unit_is_small_and_positive():
    t = bench._probe_unit()
    assert 0.0 < t < 2.0
