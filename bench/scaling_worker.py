"""One scaling measurement: run the ER candidate-scoring chain at a given
core count, print one JSON line. Invoked by bench/scaling.py in a fresh
process (own JVM) per parallelism level."""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    cores = int(sys.argv[1])
    n_base = int(sys.argv[2]) if len(sys.argv) > 2 else 8000

    from pyspark.sql import functions as F

    from neural_entity_matching_spark.functions.normalize import build_signatures
    from neural_entity_matching_spark.operators.blocking import lsh_block
    from neural_entity_matching_spark.operators.scoring import (
        featurize_pairs,
        threshold_scorer,
    )
    from neural_entity_matching_spark.session import get_spark
    from neural_entity_matching_spark.sources.synth import to_spark

    spark = get_spark(
        app_name=f"nem-scaling-{cores}",
        master=f"local[{cores}]",
        shuffle_partitions=cores,
    )
    transcripts, _, _ = to_spark(spark, n_base=n_base, seed=42)
    transcripts = transcripts.repartition(cores * 2).cache()
    transcripts.count()
    sigs = build_signatures(transcripts).cache()
    sigs.count()  # signatures materialized outside the timed section

    t0 = time.monotonic()
    candidates, _ = lsh_block(
        sigs, num_hashes=128, bands=64, char_ngram=8, seed=42, block_cap=35
    )
    scored = threshold_scorer(
        featurize_pairs(candidates, sigs, broadcast_signatures=True),
        threshold=0.55,
    )
    n_pairs = scored.count()
    n_matches = scored.filter(F.col("is_match") == 1).count()
    wall = time.monotonic() - t0
    spark.stop()
    print(json.dumps({
        "cores": cores, "n_base": n_base, "pairs": n_pairs,
        "matches": n_matches, "wall_sec": round(wall, 2),
        "pairs_per_sec": round(n_pairs / wall, 1),
    }))


if __name__ == "__main__":
    main()
