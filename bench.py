"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR on
local[$SPARK_GRAFT_CPUS]; prints ONE JSON line.

Headline set = the scale-path operators (LSH dedup, TF-IDF cosine, ANN
top-k, windowed agg, sessionization, joins/aggs) over the driver tables,
plus the flagship ER pipeline (signature -> LSH block -> featurize ->
score -> cluster) over a deterministic synthetic transcript corpus sized
to the scale factor. The extra key ``pairs_scored_per_sec`` is the
north-rule throughput metric (candidate pairs scored per second).
"""

from __future__ import annotations

import json
import os
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


def run_er_pipeline(spark, n_base: int) -> tuple[float, int, dict]:
    """Full ER chain on the synthetic corpus; returns (seconds, pairs, info)."""
    from pyspark.sql import functions as F

    from neural_entity_matching_spark.functions.normalize import build_signatures
    from neural_entity_matching_spark.operators.blocking import lsh_block
    from neural_entity_matching_spark.operators.clustering import connected_components
    from neural_entity_matching_spark.operators.scoring import fast_threshold_score
    from neural_entity_matching_spark.sources.synth import to_spark

    transcripts, _, _ = to_spark(spark, n_base=n_base, seed=42)
    transcripts = transcripts.cache()
    transcripts.count()  # exclude synthesis + upload from the timed section

    t0 = time.monotonic()
    sigs = build_signatures(transcripts).cache()
    # scale path: int64 dictionary-encoded ids flow end-to-end; payload
    # join keys on xxhash64(conv_id); clustering runs on the encoded ids
    # (cluster counts are id-representation-invariant)
    candidates, stats = lsh_block(
        sigs, num_hashes=128, bands=64, char_ngram=8, seed=42, block_cap=35,
        decode_ids=False,
    )
    sigs_iid = sigs.select(F.xxhash64("conv_id").alias("conv_id"), "sig_text")
    scored = fast_threshold_score(
        candidates.sortWithinPartitions("conv_id_a"), sigs_iid,
        threshold=0.55, broadcast_signatures=True,
    ).cache()
    n_pairs = scored.count()  # materialize BEFORE filtering is_match
    clusters = connected_components(
        scored.filter(F.col("is_match") == 1).select("conv_id_a", "conv_id_b"),
        vertices=sigs_iid,
    )
    n_clusters = clusters.select("cluster_id").distinct().count()
    stats.extra["id_mapping"].unpersist()
    wall = time.monotonic() - t0
    scored.unpersist()
    transcripts.unpersist()
    sigs.unpersist()
    return wall, n_pairs, {"clusters": n_clusters, "oversized_blocks": stats.oversized_blocks}


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    sf = float(sf_dir.rstrip("/").rsplit("sf", 1)[-1])

    from neural_entity_matching_spark.plans import contract
    from neural_entity_matching_spark.session import get_spark

    spark = get_spark(
        app_name="nem-bench", master=f"local[{cpus}]", shuffle_partitions=cpus,
        tmpfs_shuffle=True)

    queries: dict[str, float] = {}
    for name in BENCH_QUERIES:
        fn = contract.QUERIES[name]
        t0 = time.monotonic()
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        queries[name] = round(time.monotonic() - t0, 3)

    n_base = ER_N_BASE.get(sf, max(100, int(30000 * sf)))
    er_wall, n_pairs, info = run_er_pipeline(spark, n_base)
    queries["er_pipeline"] = round(er_wall, 3)

    total = round(sum(queries.values()), 3)
    out = {
        "metric": "total_headline_seconds",
        "value": total,
        "unit": "sec",
        "queries": queries,
        "sf": sf,
        "cpus": cpus,
        "er_pairs_scored": n_pairs,
        "pairs_scored_per_sec": round(n_pairs / er_wall, 1) if er_wall else 0.0,
        "er_info": info,
    }
    spark.stop()
    print(json.dumps(out))


if __name__ == "__main__":
    main()
