"""Hyperparameter-grid runner (reference M5, expand_grid loop at
model_magellan_ml.py:383-430): one metrics row per config; stage resume
makes shared config prefixes free."""

from neural_entity_matching_spark.plans.pipeline import PipelineConfig, run_grid


def test_grid_one_row_per_config_with_prefix_resume(spark, fixture_small, tmp_path):
    transcripts, labeled, _ = fixture_small
    ckpt = str(tmp_path / "grid_ckpt")
    configs = [
        PipelineConfig(threshold=0.55),
        PipelineConfig(threshold=0.65),          # same blocking prefix
        PipelineConfig(bands=32, threshold=0.55),  # different blocker
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
    # config 2 (blocker change): signatures still shared, blocking re-run
    r2 = reports[2].stages
    assert r2["signatures"]["resumed"]
    assert not r2["candidates"]["resumed"]

    # metric sanity: recall/pruning/F1 populated and plausible everywhere
    for r in rows.values():
        assert 0.0 <= r["blocking_recall"] <= 1.0
        assert 0.0 <= r["f1"] <= 1.0
        assert r["n_candidates"] > 0
    # the fixture's frozen operating point hits the gate
    assert rows["grid-000"]["f1"] >= 0.99
    assert rows["grid-000"]["blocking_recall"] >= 0.98