"""Hyperparameter-grid runner (reference M5, expand_grid loop at
model_magellan_ml.py:383-430): one metrics row per config; stage resume
makes shared config prefixes free."""

from neural_entity_matching_spark.plans.pipeline import PipelineConfig, run_grid


def test_grid_one_row_per_config_with_prefix_resume(spark, fixture_small, tmp_path):
    transcripts, labeled, _ = fixture_small
    ckpt = str(tmp_path / "grid_ckpt")
    # the reference grid shape: blocker type {lsh, sequential} x scorer
    # {threshold, trained} (model_magellan_ml.py:383-430); plus parameter
    # variants that exercise stage-prefix resume
    configs = [
        PipelineConfig(threshold=0.55),
        PipelineConfig(threshold=0.65),          # same blocking prefix
        PipelineConfig(bands=32, threshold=0.55),  # different LSH params
        PipelineConfig(scorer="logistic"),       # lsh x trained matcher
        PipelineConfig(blocker="sequential", seq_min_tokens=15,
                       seq_cutoff=60.0),          # sequential x threshold
        PipelineConfig(blocker="sequential", seq_min_tokens=15,
                       seq_cutoff=60.0,
                       scorer="logistic"),        # sequential x trained
    ]
    metrics, reports = run_grid(
        spark, transcripts, labeled, ckpt, configs,
        input_fingerprint="fx-small",
    )
    rows = {r["run_id"]: r for r in metrics.collect()}
    assert len(rows) == len(configs)

    # config 1 (threshold change only): signatures AND candidates resumed
    # from config 0's snapshots, scoring recomputed
    r1 = reports[1].stages
    assert r1["signatures"]["resumed"] and r1["candidates"]["resumed"]
    assert not r1["scored"]["resumed"]
    # config 2 (LSH param change): signatures still shared, blocking re-run
    r2 = reports[2].stages
    assert r2["signatures"]["resumed"]
    assert not r2["candidates"]["resumed"]
    # config 3 (scorer change only): blocking prefix shared with config 0,
    # the trained matcher re-scores the same candidates
    r3 = reports[3].stages
    assert r3["signatures"]["resumed"] and r3["candidates"]["resumed"]
    assert not r3["scored"]["resumed"]
    # config 4 (blocker type change): candidates re-run on the sequential
    # cascade; config 5 shares that cascade's candidate snapshot
    r4, r5 = reports[4].stages, reports[5].stages
    assert r4["signatures"]["resumed"] and not r4["candidates"]["resumed"]
    assert reports[4].stages["_blocking_stats"]["strategy"] == "sequential"
    assert r5["candidates"]["resumed"] and not r5["scored"]["resumed"]

    # metric sanity: recall/pruning/F1 populated and plausible everywhere
    for r in rows.values():
        assert 0.0 <= r["blocking_recall"] <= 1.0
        assert 0.0 <= r["f1"] <= 1.0
        assert r["n_candidates"] > 0
    # the fixture's frozen operating point hits the gate — for the
    # threshold scorer AND the trained logistic matcher on the same
    # candidates
    assert rows["grid-000"]["f1"] >= 0.99
    assert rows["grid-000"]["blocking_recall"] >= 0.98
    assert rows["grid-003"]["f1"] >= 0.99