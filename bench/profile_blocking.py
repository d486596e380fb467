"""Profiling harness: break the blocking stage into sub-steps and time each
at a given executor count. Not part of the graded bench — diagnosis only.

Usage: python bench/profile_blocking.py <executors> [n_base]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

CORES_PER_EXECUTOR = 8
EXECUTOR_MEM_MB = 10240


def main() -> None:
    executors = int(sys.argv[1])
    n_base = int(sys.argv[2]) if len(sys.argv) > 2 else 40000
    cores = executors * CORES_PER_EXECUTOR

    from pyspark.sql import functions as F

    from neural_entity_matching_spark.functions.normalize import build_signatures
    from neural_entity_matching_spark.operators.blocking import (
        grouped_pairs_from_block_keys,
        lsh_band_keys,
    )
    from neural_entity_matching_spark.session import get_spark
    from neural_entity_matching_spark.sources.synth import to_spark

    spark = get_spark(
        app_name=f"nem-profile-{executors}",
        master=f"local-cluster[{executors},{CORES_PER_EXECUTOR},{EXECUTOR_MEM_MB}]",
        shuffle_partitions=cores * 2,
        extra_conf={
            "spark.executor.memory": f"{EXECUTOR_MEM_MB - 2048}m",
            "spark.driver.memory": "8g",
            "spark.executorEnv.PYTHONPATH": os.path.dirname(
                os.path.dirname(os.path.abspath(__file__))
            ),
        },
    )
    transcripts, _, _ = to_spark(spark, n_base=n_base, seed=42)
    transcripts = transcripts.repartition(cores * 2).cache()
    transcripts.count()
    sigs = build_signatures(transcripts).cache()
    n_sigs = sigs.count()

    import pandas as pd  # noqa: F401
    from pyspark.sql.types import LongType

    @F.pandas_udf(LongType())
    def _warm(s):
        return s.str.len().astype("int64")

    sigs.select(_warm("sig_text").alias("w")).agg(F.sum("w")).collect()

    out = {"executors": executors, "cores": cores, "n_sigs": n_sigs}

    # step 1: band-key UDF compute (materialize keys)
    t = time.monotonic()
    keys = lsh_band_keys(sigs, num_hashes=128, bands=64, char_ngram=8, seed=42)
    keys = keys.persist()
    out["n_keys"] = keys.count()
    out["bandkeys_sec"] = round(time.monotonic() - t, 2)

    # step 2: grouped expansion WITHOUT final dedup
    from pyspark.sql import Window

    t = time.monotonic()
    w = Window.partitionBy("block_key").orderBy("conv_id")
    keyed = (
        keys.withColumn("rn", F.row_number().over(w))
        .withColumn("bs", F.count("*").over(Window.partitionBy("block_key")))
    )
    blocks = (
        keyed.filter((F.col("bs") >= 2) & (F.col("bs") <= 35))
        .groupBy("block_key")
        .agg(F.sort_array(F.collect_list("conv_id")).alias("ids"))
    )
    pair_expr = (
        "flatten(transform(sequence(1, size(ids) - 1), i -> "
        "transform(slice(ids, i + 1, size(ids) - i), "
        "y -> struct(element_at(ids, i) AS conv_id_a, y AS conv_id_b))))"
    )
    raw_pairs = (
        blocks.select(F.explode(F.expr(pair_expr)).alias("p"))
        .select(F.col("p.conv_id_a"), F.col("p.conv_id_b"))
    ).persist()
    out["n_raw_pairs"] = raw_pairs.count()
    out["expand_sec"] = round(time.monotonic() - t, 2)

    # step 3: dedup shuffle
    t = time.monotonic()
    deduped = raw_pairs.dropDuplicates(["conv_id_a", "conv_id_b"]).persist()
    out["n_pairs"] = deduped.count()
    out["dedup_sec"] = round(time.monotonic() - t, 2)

    # step 4 (reference): full operator end-to-end, fresh (keys cached)
    t = time.monotonic()
    pairs2, _ = grouped_pairs_from_block_keys(keys, block_cap=35)
    out["n_pairs2"] = pairs2.count()
    out["full_grouped_sec"] = round(time.monotonic() - t, 2)

    spark.stop()
    print(json.dumps(out))


if __name__ == "__main__":
    main()
