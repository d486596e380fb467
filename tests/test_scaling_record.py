"""Unit tests for the scaling-evidence estimators (bench/scaling.py).

The N->4N headline is computed from BENCH/scaling_runs.jsonl by
pure-python estimators; since that number IS the north-rule evidence,
its arithmetic and its refusal conditions get the same test discipline
as the operators.
"""

import importlib.util
import json
import os
import sys

import pytest

_SPEC = importlib.util.spec_from_file_location(
    "nem_bench_scaling",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                 "bench", "scaling.py"),
)
scaling = importlib.util.module_from_spec(_SPEC)
sys.modules["nem_bench_scaling"] = scaling
_SPEC.loader.exec_module(scaling)


def _row(executors, wall, blocking, scoring, *, batch="b0", pair=0,
         variant="v1", n_base=1000, mode=None):
    r = {
        "executors": executors, "cores": executors, "n_base": n_base,
        "pairs": 5000, "matches": 70, "wall_sec": wall,
        "pairs_per_sec": round(5000 / wall, 1),
        "blocking_sec": blocking, "scoring_sec": scoring,
        "variant": variant, "ts": "2026-01-01T00:00:00Z",
        "batch": batch, "pair": pair,
    }
    if mode:
        r["mode"] = mode
    return r


def _write(tmp_path, rows):
    path = tmp_path / "runs.jsonl"
    with open(path, "w") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")
    return str(path)


def test_capability_and_paired_estimators(tmp_path, monkeypatch):
    rows = [
        _row(1, 100.0, 20.0, 80.0, batch="b0", pair=0),
        _row(4, 40.0, 8.0, 32.0, batch="b0", pair=0),   # paired: 0.625
        _row(1, 80.0, 16.0, 64.0, batch="b1", pair=0),  # min T1
        _row(4, 25.0, 5.0, 20.0, batch="b1", pair=0),   # min T4; paired 0.8
        _row(1, 90.0, 18.0, 72.0, batch="b1", pair=1),  # unpaired E1
    ]
    monkeypatch.setattr(scaling, "RECORD", _write(tmp_path, rows))
    est = scaling.estimators(scaling.load_record(1000))
    # capability = min(T1) / (4 * min(T4)) across the whole record
    assert est["capability"]["eff"] == pytest.approx(80.0 / (4 * 25.0))
    # stage capability uses per-stage minima
    assert est["capability"]["stage_eff"]["scoring_sec"] == pytest.approx(
        64.0 / (4 * 20.0))
    # paired ratios match only on (batch, pair); the unpaired E1 is dropped
    assert len(est["paired"]) == 2
    assert est["paired_median_eff"] == pytest.approx(
        (0.625 + 0.8) / 2)
    assert est["n_runs"] == {1: 3, 4: 2}
    assert est["n_batches"] == 2


def test_mixed_variants_refused(tmp_path, monkeypatch):
    rows = [
        _row(1, 100.0, 20.0, 80.0, variant="v1"),
        _row(4, 25.0, 5.0, 20.0, variant="v2"),
    ]
    monkeypatch.setattr(scaling, "RECORD", _write(tmp_path, rows))
    with pytest.raises(AssertionError, match="mixed plan variants"):
        scaling.estimators(scaling.load_record(1000))
    # explicit variant selection restores a usable (single-level) subset
    assert {r["variant"] for r in
            scaling.load_record(1000, variant="v1")} == {"v1"}


def test_differing_work_refused(tmp_path, monkeypatch):
    rows = [
        _row(1, 100.0, 20.0, 80.0),
        _row(4, 25.0, 5.0, 20.0),
    ]
    rows[1]["pairs"] = 4999  # not byte-identical work
    monkeypatch.setattr(scaling, "RECORD", _write(tmp_path, rows))
    with pytest.raises(AssertionError):
        scaling.estimators(scaling.load_record(1000))


def test_mode_partition(tmp_path, monkeypatch):
    rows = [
        _row(1, 100.0, 20.0, 80.0),
        _row(4, 25.0, 5.0, 20.0),
        _row(1, 50.0, 10.0, 40.0, mode="ml", variant="ml-x"),
    ]
    monkeypatch.setattr(scaling, "RECORD", _write(tmp_path, rows))
    er = scaling.load_record(1000)            # default mode='er'
    ml = scaling.load_record(1000, mode="ml")
    assert len(er) == 2 and len(ml) == 1
    assert ml[0]["variant"] == "ml-x"


def test_ml_stage_keys_detected(tmp_path, monkeypatch):
    def _ml(executors, wall, batch, pair):
        r = _row(executors, wall, 0.0, 0.0, batch=batch, pair=pair,
                 variant="ml-x", mode="ml")
        del r["blocking_sec"], r["scoring_sec"]
        r.update({"featurize_sec": wall * 0.7, "fit_sec": wall * 0.1,
                  "score_sec": wall * 0.2})
        return r

    rows = [_ml(1, 100.0, "b0", 0), _ml(4, 30.0, "b0", 0)]
    monkeypatch.setattr(scaling, "RECORD", _write(tmp_path, rows))
    est = scaling.estimators(scaling.load_record(1000, mode="ml"))
    assert set(est["stage_keys"]) == {"featurize_sec", "fit_sec",
                                      "score_sec"}
    assert est["capability"]["stage_eff"]["featurize_sec"] == pytest.approx(
        70.0 / (4 * 21.0))
