"""One scaling measurement: run the ER candidate-scoring chain on a
local-cluster with a given number of executor JVMs (8 cores each), print
one JSON line. Invoked by bench/scaling.py in a fresh process per level.

``local-cluster[E,8,mem]`` spawns E real executor JVMs — the faithful
sandbox proxy for an N- vs 4N-executor cluster: each executor brings its
own heap, GC, and Python workers, exactly like adding machines (a single
shared JVM hits its allocation/GC ceiling near 8 cores and measures
nothing but that ceiling).

Stages are materialized once each (persist + count), mirroring the real
pipeline's per-stage snapshot writes."""

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
    from neural_entity_matching_spark.operators.blocking import lsh_block
    from neural_entity_matching_spark.operators.scoring import fast_threshold_score
    from neural_entity_matching_spark.session import get_spark
    from neural_entity_matching_spark.sources.synth import to_spark

    spark = get_spark(
        app_name=f"nem-scaling-{executors}x{CORES_PER_EXECUTOR}",
        master=f"local-cluster[{executors},{CORES_PER_EXECUTOR},{EXECUTOR_MEM_MB}]",
        shuffle_partitions=cores * 2,
        extra_conf={
            "spark.executor.memory": f"{EXECUTOR_MEM_MB - 2048}m",
            "spark.driver.memory": "8g",
            # executor JVMs spawn their own Python workers — ship the repo
            # (the spark-submit deployment does this with --py-files)
            "spark.executorEnv.PYTHONPATH": os.path.dirname(
                os.path.dirname(os.path.abspath(__file__))
            ),
        },
    )
    transcripts, _, _ = to_spark(spark, n_base=n_base, seed=42)
    transcripts = transcripts.repartition(cores * 2).cache()
    transcripts.count()
    sigs = build_signatures(transcripts).cache()
    sigs.count()  # signatures materialized outside the timed section

    # warm the Python UDF workers before the timed section: worker fork +
    # pandas/arrow import is cluster warm-up, not throughput
    import pandas as pd  # noqa: F401
    from pyspark.sql.types import LongType

    @F.pandas_udf(LongType())
    def _warm(s):
        return s.str.len().astype("int64")

    sigs.select(_warm("sig_text").alias("w")).agg(F.sum("w")).collect()

    stages = {}
    t0 = time.monotonic()
    candidates, _ = lsh_block(
        sigs, num_hashes=128, bands=64, char_ngram=8, seed=42, block_cap=35
    )
    candidates = candidates.persist()
    n_pairs = candidates.count()
    stages["blocking_sec"] = round(time.monotonic() - t0, 2)

    t1 = time.monotonic()
    scored = fast_threshold_score(
        candidates, sigs, threshold=0.55, broadcast_signatures=True
    ).persist()
    n_scored = scored.count()
    n_matches = scored.filter(F.col("is_match") == 1).count()
    stages["scoring_sec"] = round(time.monotonic() - t1, 2)
    wall = time.monotonic() - t0
    spark.stop()
    print(json.dumps({
        "executors": executors, "cores": cores, "n_base": n_base,
        "pairs": n_scored, "matches": n_matches, "wall_sec": round(wall, 2),
        "pairs_per_sec": round(n_scored / wall, 1), **stages,
    }))
    assert n_pairs == n_scored


if __name__ == "__main__":
    main()
