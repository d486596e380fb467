"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR on
local[$SPARK_GRAFT_CPUS]; prints ONE JSON line.

Headline set = the scale-path operators (LSH dedup, TF-IDF cosine, ANN
top-k, windowed agg, sessionization, joins/aggs) over the driver tables,
plus the flagship ER pipeline (signature -> LSH block -> featurize ->
score -> cluster) over a deterministic synthetic transcript corpus sized
to the scale factor.

Measurement protocol (the same discipline as bench/scaling.py): the
WHOLE query set runs ``SPARK_GRAFT_BENCH_ROUNDS`` (default 3) full
interleaved rounds and the reported per-query number is the MEDIAN
across rounds; the raw per-round values are published under
``queries_raw``. This kills two artifacts that polluted earlier
single-shot runs: (a) first-run fixed costs — whole-stage-codegen JIT,
Python-UDF worker fork + pandas/arrow import — which measured 2-4x on
top of steady-state for the ER chain, and (b) this host's multi-minute
noisy-neighbor slow windows, which inflate whichever single run they
happen to overlap (round 2's unattributed "regression" of er_pipeline,
36.0s vs 21.4s for byte-identical output, was exactly these two
artifacts; steady-state is ~8s).

Throughput keys: ``pairs_scored_per_sec`` is candidate pairs scored per
END-TO-END pipeline second (includes signature build, blocking and
clustering — the harness number); ``pairs_scored_per_sec_scoring_only``
divides by the scoring stage alone, which is the number comparable to
the north-rule per-executor scoring throughput (the other stages
amortize at real scale but dominate a 3k-doc harness run).
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

BENCH_QUERIES = [
    "signature_build",
    "positive_pairs_join",
    "group_stats",
    "topk_per_group",
    "dedup_exact",
    "ngram_jaccard_dedup",
    "minhash_lsh_dedup",
    "tfidf_cosine_pairs",
    "embedding_cosine_topk",
    "text_quality",
    "token_count",
    "sessionize",
    "window_agg",
]

ER_N_BASE = {0.001: 100, 0.01: 600, 0.1: 3000}


def run_er_pipeline(spark, transcripts) -> dict:
    """Full ER chain on the (pre-cached) synthetic corpus; returns
    per-stage wall times + outputs. ``transcripts`` is cached by the
    caller so synthesis/upload stay outside the timed section."""
    from pyspark.sql import functions as F

    from neural_entity_matching_spark.functions.normalize import build_signatures
    from neural_entity_matching_spark.operators.blocking import lsh_block
    from neural_entity_matching_spark.operators.clustering import connected_components
    from neural_entity_matching_spark.operators.scoring import fast_threshold_score

    t0 = time.monotonic()
    sigs = build_signatures(transcripts).cache()
    # plan choice is per operating point, both measured: the GROUPED
    # xxhash64-id plan wins here (er_pipeline 7.7s vs 13.9s median at
    # sf0.1/local[32] — the packed plan's dense-rank mapping build is
    # fixed-cost job latency that dominates a 5.7k-doc corpus), while the
    # PACKED single-long plan wins the executor-scaling harness at 176k
    # docs / 30M pair rows (bench/scaling_worker.py, BENCH/BASELINE.md).
    # No locality sort of the pairs either: sortWithinPartitions before
    # scoring A/B measured a net LOSS on local[32] at 261k AND 5.0M pairs
    # — it only pays on bandwidth-starved 1-core executors.
    candidates, stats = lsh_block(
        sigs, num_hashes=128, bands=64, char_ngram=8, seed=42, block_cap=35,
        decode_ids=False,
    )
    t1 = time.monotonic()
    sigs_iid = sigs.select(F.xxhash64("conv_id").alias("conv_id"), "sig_text")
    scored = fast_threshold_score(
        candidates, sigs_iid, threshold=0.55, broadcast_signatures=True,
    ).cache()
    n_pairs = scored.count()  # materialize BEFORE filtering is_match
    t2 = time.monotonic()
    clusters = connected_components(
        scored.filter(F.col("is_match") == 1).select("conv_id_a", "conv_id_b"),
        vertices=sigs_iid,
    )
    n_clusters = clusters.select("cluster_id").distinct().count()
    stats.extra["id_mapping"].unpersist()
    t3 = time.monotonic()
    scored.unpersist()
    sigs.unpersist()
    return {
        "wall": t3 - t0,
        "block_wall": t1 - t0,
        "score_wall": t2 - t1,
        "cluster_wall": t3 - t2,
        "pairs": n_pairs,
        "clusters": n_clusters,
        "oversized_blocks": stats.oversized_blocks,
    }


def run_ml_scorer(spark, transcripts, labeled) -> dict:
    """Trained-matcher cost at bench scale (round-3 verdict item #6):
    featurize the LSH candidates, fit the logistic matcher (M1, seed 0)
    on the label-attached pairs, score every candidate (M2). Reported
    under its own key (not in the headline total) so M1/M2 wall is
    tracked round-over-round without shifting the comparable total."""
    from pyspark.sql import functions as F

    from neural_entity_matching_spark.functions.normalize import build_signatures
    from neural_entity_matching_spark.operators.blocking import lsh_block
    from neural_entity_matching_spark.operators.ml_scorer import (
        score_with_model,
        train_scorer,
    )
    from neural_entity_matching_spark.operators.scoring import (
        attach_labels,
        featurize_pairs,
    )

    sigs = build_signatures(transcripts).cache()
    candidates, stats = lsh_block(
        sigs, num_hashes=128, bands=64, char_ngram=8, seed=42, block_cap=35,
    )
    candidates = candidates.persist()
    n_cand = candidates.count()  # blocking outside the timed section

    t0 = time.monotonic()
    feats = featurize_pairs(candidates, sigs).persist()
    feats.count()
    t1 = time.monotonic()
    model = train_scorer(attach_labels(feats, labeled), model="logistic",
                         seed=0)
    t2 = time.monotonic()
    scored = score_with_model(model, feats, threshold=0.5).persist()
    n_scored = scored.count()
    n_matches = scored.agg(F.sum("is_match")).collect()[0][0]
    t3 = time.monotonic()

    for h in (scored, feats, candidates, sigs):
        h.unpersist()
    if "id_mapping" in stats.extra:
        stats.extra["id_mapping"].unpersist()
    return {
        "wall": t3 - t0,
        "featurize_wall": t1 - t0,
        "train_wall": t2 - t1,
        "score_wall": t3 - t2,
        "pairs": n_scored,
        "matches": int(n_matches or 0),
        "candidates": n_cand,
    }


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    rounds = int(os.environ.get("SPARK_GRAFT_BENCH_ROUNDS", "4"))
    sf = float(sf_dir.rstrip("/").rsplit("sf", 1)[-1])

    from neural_entity_matching_spark.plans import contract
    from neural_entity_matching_spark.session import get_spark
    from neural_entity_matching_spark.sources.synth import to_spark

    spark = get_spark(
        app_name="nem-bench", master=f"local[{cpus}]", shuffle_partitions=cpus,
        tmpfs_shuffle=True)

    n_base = ER_N_BASE.get(sf, max(100, int(30000 * sf)))
    transcripts, labeled, _ = to_spark(spark, n_base=n_base, seed=42)
    transcripts = transcripts.cache()
    transcripts.count()
    labeled = labeled.cache()
    labeled.count()

    # declared warm-up (outside every measured round): one ER chain on a
    # small slice JITs the whole-stage-codegen paths and forks the
    # Python/Arrow UDF workers. First-ROUND walls previously carried
    # 2-4x of exactly this fixed cost (r6 raw: er 33.3/14.5/9.2s across
    # rounds for byte-identical output); measuring steady-state is the
    # point of the multi-round protocol, so the JIT pass is explicit
    # rather than silently polluting round 1.
    warm = transcripts.limit(1500).cache()
    warm.count()
    run_er_pipeline(spark, warm)
    warm.unpersist()

    raw: list[dict[str, float]] = []
    er_runs: list[dict] = []
    ml_runs: list[dict] = []
    for _ in range(rounds):
        q: dict[str, float] = {}
        for name in BENCH_QUERIES:
            fn = contract.QUERIES[name]
            t0 = time.monotonic()
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            q[name] = round(time.monotonic() - t0, 3)
        er = run_er_pipeline(spark, transcripts)
        q["er_pipeline"] = round(er["wall"], 3)
        raw.append(q)
        er_runs.append(er)
        ml_runs.append(run_ml_scorer(spark, transcripts, labeled))

    queries = {
        name: round(statistics.median(r[name] for r in raw), 3)
        for name in raw[0]
    }
    total = round(sum(queries.values()), 3)
    # capability line (declared protocol, mirrors bench/scaling.py's
    # min-wall estimator): per-query min across rounds. Outputs are
    # byte-identical across rounds, so the minimum is the host-noise-
    # robust location estimate — the number the plan delivers when the
    # host delivers its nominal resources. Median stays the headline
    # 'value' for cross-round comparability; both are published.
    queries_min = {
        name: round(min(r[name] for r in raw), 3) for name in raw[0]
    }
    total_min = round(sum(queries_min.values()), 3)
    er_wall = statistics.median(e["wall"] for e in er_runs)
    score_wall = statistics.median(e["score_wall"] for e in er_runs)
    n_pairs = er_runs[0]["pairs"]
    out = {
        "metric": "total_headline_seconds",
        "value": total,
        "unit": "sec",
        "queries": queries,
        "sf": sf,
        "cpus": cpus,
        "rounds": rounds,
        "protocol": ("median over interleaved full rounds (headline) + "
                     "min-of-rounds capability line; raw in queries_raw"),
        "queries_min": queries_min,
        "total_min_of_rounds": total_min,
        "queries_raw": raw,
        "er_pairs_scored": n_pairs,
        "pairs_scored_per_sec": round(n_pairs / er_wall, 1) if er_wall else 0.0,
        "pairs_scored_per_sec_scoring_only": (
            round(n_pairs / score_wall, 1) if score_wall else 0.0
        ),
        "er_info": {
            "clusters": er_runs[0]["clusters"],
            "oversized_blocks": er_runs[0]["oversized_blocks"],
            "block_wall_median": round(statistics.median(
                e["block_wall"] for e in er_runs), 3),
            "score_wall_median": round(score_wall, 3),
            "cluster_wall_median": round(statistics.median(
                e["cluster_wall"] for e in er_runs), 3),
        },
        # trained-matcher cost (M1 fit + M2 score over the LSH candidates)
        # — outside the headline total so it stays comparable to r<=3
        "ml_scorer_logistic": {
            "wall_median": round(statistics.median(
                m["wall"] for m in ml_runs), 3),
            "featurize_wall_median": round(statistics.median(
                m["featurize_wall"] for m in ml_runs), 3),
            "train_wall_median": round(statistics.median(
                m["train_wall"] for m in ml_runs), 3),
            "score_wall_median": round(statistics.median(
                m["score_wall"] for m in ml_runs), 3),
            "pairs": ml_runs[0]["pairs"],
            "matches": ml_runs[0]["matches"],
        },
    }
    spark.stop()
    print(json.dumps(out))


if __name__ == "__main__":
    main()
