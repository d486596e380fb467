"""Profiling harness: isolate scoring-stage cost components at a given
executor count. Diagnosis only, not part of the graded bench.

Variants over the same persisted candidate set:
  join_only   — payload joins + trivial column (no jaccard, no lev)
  jaccard     — joins + array_intersect token jaccard (no lev)
  full        — the real fast_threshold_score cascade

Usage: python bench/profile_scoring.py <executors> [n_base] [cores_per_exec]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

EXECUTOR_MEM_MB = 10240


def main() -> None:
    executors = int(sys.argv[1])
    n_base = int(sys.argv[2]) if len(sys.argv) > 2 else 40000
    cores_per = int(sys.argv[3]) if len(sys.argv) > 3 else 8
    mode = sys.argv[4] if len(sys.argv) > 4 else "cluster"
    cores = executors * cores_per

    from pyspark.sql import functions as F

    from neural_entity_matching_spark.functions.normalize import build_signatures
    from neural_entity_matching_spark.operators.blocking import lsh_block
    from neural_entity_matching_spark.operators.scoring import fast_threshold_score
    from neural_entity_matching_spark.session import get_spark
    from neural_entity_matching_spark.sources.synth import to_spark

    if mode == "local":
        master = f"local[{cores}]"
        extra = {"spark.driver.memory": "24g"}
    else:
        master = f"local-cluster[{executors},{cores_per},{EXECUTOR_MEM_MB}]"
        extra = {
            "spark.executor.memory": f"{EXECUTOR_MEM_MB - 2048}m",
            "spark.driver.memory": "8g",
            "spark.executorEnv.PYTHONPATH": os.path.dirname(
                os.path.dirname(os.path.abspath(__file__))
            ),
        }
    spark = get_spark(
        app_name=f"nem-score-profile-{executors}",
        master=master,
        shuffle_partitions=cores * 2,
        extra_conf=extra,
        tmpfs_shuffle=True,
    )
    from neural_entity_matching_spark.session import wait_for_executors
    wait_for_executors(spark, cores)
    transcripts, _, _ = to_spark(spark, n_base=n_base, seed=42)
    transcripts = transcripts.repartition(cores * 2).cache()
    transcripts.count()
    sigs = build_signatures(transcripts).cache()
    sigs.count()

    candidates, _ = lsh_block(
        sigs, num_hashes=128, bands=64, char_ngram=8, seed=42, block_cap=35
    )
    candidates = candidates.persist()
    n_pairs = candidates.count()

    out = {"executors": executors, "cores": cores, "n_pairs": n_pairs}

    sig = sigs.select(
        "conv_id",
        F.substring("sig_text", 1, 512).alias("sig_lev"),
        F.length("sig_text").alias("sig_len"),
        F.expr(
            "array_distinct(transform(split(trim(sig_text), '\\\\s+'), x -> xxhash64(x)))"
        ).alias("toks"),
    ).withColumn("n_toks", F.size("toks"))
    bsig = F.broadcast(sig)

    def joined():
        return (
            candidates
            .join(bsig.select(F.col("conv_id").alias("conv_id_a"), F.col("sig_lev").alias("_a"),
                              F.col("sig_len").alias("len_a"), F.col("toks").alias("toks_a"),
                              F.col("n_toks").alias("nt_a")), "conv_id_a")
            .join(bsig.select(F.col("conv_id").alias("conv_id_b"), F.col("sig_lev").alias("_b"),
                              F.col("sig_len").alias("len_b"), F.col("toks").alias("toks_b"),
                              F.col("n_toks").alias("nt_b")), "conv_id_b")
        )

    # variant 1: joins only
    t = time.monotonic()
    n = joined().select(
        (F.length("_a") + F.length("_b") + F.col("nt_a")).alias("x")
    ).agg(F.sum("x")).collect()[0][0]
    out["join_only_sec"] = round(time.monotonic() - t, 2)

    # variant 2: + token jaccard via array_intersect
    t = time.monotonic()
    n = joined().withColumn(
        "_inter", F.size(F.array_intersect("toks_a", "toks_b"))
    ).agg(F.sum("_inter")).collect()[0][0]
    out["jaccard_sec"] = round(time.monotonic() - t, 2)

    # variant 3: full cascade
    t = time.monotonic()
    scored = fast_threshold_score(candidates, sigs, threshold=0.55,
                                  broadcast_signatures=True)
    n_m = scored.filter(F.col("is_match") == 1).count()
    out["full_sec"] = round(time.monotonic() - t, 2)
    out["matches"] = n_m

    # variant 4: full cascade minus levenshtein (decision by jaccard alone)
    t = time.monotonic()
    nolev = joined().withColumn(
        "_inter", F.size(F.array_intersect("toks_a", "toks_b"))
    ).withColumn(
        "token_jaccard",
        F.when(F.col("nt_a") + F.col("nt_b") - F.col("_inter") > 0,
               F.col("_inter") / (F.col("nt_a") + F.col("nt_b") - F.col("_inter")))
         .otherwise(F.lit(0.0)),
    ).filter(F.col("token_jaccard") > 0.55).count()
    out["nolev_sec"] = round(time.monotonic() - t, 2)

    spark.stop()
    print(json.dumps(out))


if __name__ == "__main__":
    main()
