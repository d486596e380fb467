"""Profiling harness: break the blocking stage into sub-steps and time each
at a given executor count. Not part of the graded bench — diagnosis only.
Run with the machine otherwise IDLE.

Usage: python bench/profile_blocking.py <executors> [n_base] [cores_per_exec] [mode]
mode: 'cluster' (local-cluster JVMs, default) or 'local' (local[cores])
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
    from neural_entity_matching_spark.operators.blocking import (
        _decode_pairs,
        _prepare_keys,
        lsh_band_keys,
    )
    from neural_entity_matching_spark.session import get_spark, wait_for_executors
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
        app_name=f"nem-profile-{executors}",
        master=master,
        shuffle_partitions=cores * 2,
        extra_conf=extra,
        tmpfs_shuffle=True,
    )
    out_cores = wait_for_executors(spark, cores)
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

    out = {"executors": executors, "cores": cores, "n_sigs": n_sigs,
           "registered_cores": out_cores}
    block_cap = 35

    # step 1a: band-key UDF compute + persist (isolated)
    t = time.monotonic()
    keys = lsh_band_keys(sigs, num_hashes=128, bands=64, char_ngram=8, seed=42)
    keys = keys.persist()
    out["n_keys"] = keys.count()
    out["udf_keys_sec"] = round(time.monotonic() - t, 2)

    # step 1b: id-encoding mapping + collision check (reads the cache)
    t = time.monotonic()
    narrow, mapping, release = _prepare_keys(keys, "conv_id", True)
    out["mapping_sec"] = round(time.monotonic() - t, 2)

    # step 2: block sizes hash-agg + stats
    t = time.monotonic()
    sizes = narrow.groupBy("block_key").agg(F.count("*").alias("bs")).persist()
    out["n_blocks"] = sizes.count()
    out["sizes_sec"] = round(time.monotonic() - t, 2)

    # step 3: eligibility join + collect_list + expand + dedup on int64 pairs
    t = time.monotonic()
    eligible = sizes.filter(
        (F.col("bs") >= 2) & (F.col("bs") <= block_cap)
    ).select("block_key")
    blocks = (
        narrow.join(eligible, "block_key")
        .groupBy("block_key")
        .agg(F.sort_array(F.collect_list("iid")).alias("ids"))
    )
    pair_expr = (
        "flatten(transform(sequence(1, size(ids) - 1), i -> "
        "transform(slice(ids, i + 1, size(ids) - i), "
        "y -> struct(element_at(ids, i) AS iid_a, y AS iid_b))))"
    )
    iid_pairs = (
        blocks.select(F.explode(F.expr(pair_expr)).alias("p"))
        .select(F.col("p.iid_a"), F.col("p.iid_b"))
        .dropDuplicates(["iid_a", "iid_b"])
    ).persist()
    out["n_pairs"] = iid_pairs.count()
    out["expand_dedup_sec"] = round(time.monotonic() - t, 2)

    # step 4: decode + materialize
    t = time.monotonic()
    pairs = _decode_pairs(iid_pairs, mapping).persist()
    out["n_decoded"] = pairs.count()
    out["decode_sec"] = round(time.monotonic() - t, 2)

    spark.stop()
    print(json.dumps(out))


if __name__ == "__main__":
    main()
