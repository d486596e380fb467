"""Sandwich A/B for the ML feature table: exact featurize_pairs vs the
banded/hashed fast table (lev_band + hashed_tokens) on the IDENTICAL
persisted candidate sample the ML scaling chain uses. Diagnosis +
evidence harness, not part of the graded bench.

Protocol: exact -> fast -> exact back-to-back in one session (the outer
exact legs bracket the fast leg, so a host-phase drift during the run
shows up as leg-1 vs leg-3 disagreement instead of silently inflating
the claimed win). Also checks the gate: a logistic matcher trained on
each table must produce the same match F1 against the fixture labels.

Usage: python bench/profile_featurize.py <executors> [n_base] [band] [cores_per_exec] [mode]
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
    n_base = int(sys.argv[2]) if len(sys.argv) > 2 else 80000
    band = float(sys.argv[3]) if len(sys.argv) > 3 else 0.35
    cores_per = int(sys.argv[4]) if len(sys.argv) > 4 else 1
    mode = sys.argv[5] if len(sys.argv) > 5 else "cluster"
    cores = executors * cores_per

    from pyspark.sql import functions as F

    from neural_entity_matching_spark.functions.normalize import build_signatures
    from neural_entity_matching_spark.operators.blocking import lsh_block
    from neural_entity_matching_spark.operators.evaluation import pairwise_f1
    from neural_entity_matching_spark.operators.ml_scorer import (
        score_with_model,
        train_scorer,
    )
    from neural_entity_matching_spark.operators.scoring import (
        attach_labels,
        featurize_pairs,
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
        app_name=f"nem-prof-featurize-{executors}x{cores_per}",
        master=master,
        shuffle_partitions=cores * 2,
        extra_conf=extra,
        tmpfs_shuffle=True,
    )
    wait_for_executors(spark, cores)
    transcripts, labeled, _ = to_spark(spark, n_base=n_base, seed=42)
    transcripts = transcripts.repartition(cores * 2).cache()
    transcripts.count()
    sigs = build_signatures(transcripts).cache()
    sigs.count()

    # identical candidate construction to scaling_worker._run_ml: packed
    # blocking, decode, canonicalize, deterministic real-id-keyed sample
    sample_mod = int(os.environ.get("NEM_ML_SAMPLE_MOD", "137"))
    _, bstats = lsh_block(
        sigs, num_hashes=128, bands=64, char_ngram=8, seed=42, block_cap=35,
        strategy="packed",
    )
    packed = bstats.extra["packed_pairs"]
    mapping = F.broadcast(bstats.extra["id_mapping"])
    cand = (
        packed.select(
            F.floor(F.col("pk") / F.lit(1 << 32)).cast("long").alias("iid_a"),
            F.pmod("pk", F.lit(1 << 32)).alias("iid_b"),
        )
        .join(mapping.select(F.col("iid").alias("iid_a"),
                             F.col("_id").alias("_ida")), "iid_a")
        .join(mapping.select(F.col("iid").alias("iid_b"),
                             F.col("_id").alias("_idb")), "iid_b")
        .select(F.least("_ida", "_idb").alias("conv_id_a"),
                F.greatest("_ida", "_idb").alias("conv_id_b"))
        .filter(F.pmod(F.xxhash64("conv_id_a", "conv_id_b"),
                       F.lit(sample_mod)) == 0)
        .repartition(cores * 2)
        .persist()
    )
    n_cand = cand.count()
    labeled = labeled.persist()
    labeled.count()

    def leg(tag: str, **feat_kw) -> dict:
        t0 = time.monotonic()
        feats = featurize_pairs(cand, sigs, broadcast_signatures=True,
                                **feat_kw).persist()
        feats.count()
        wall = time.monotonic() - t0
        model = train_scorer(attach_labels(feats, labeled),
                             model="logistic", seed=0)
        scored = score_with_model(model, feats, threshold=0.5)
        res = pairwise_f1(scored, labeled, universe=cand)
        feats.unpersist()
        return {"leg": tag, "featurize_sec": round(wall, 2),
                "f1": round(res.f1, 6), "tp": res.tp, "fp": res.fp,
                "fn": res.fn}

    legs = [
        leg("exact-1"),
        leg(f"fast-band{band}", lev_band=band, hashed_tokens=True),
        leg("exact-2"),
    ]
    spark.stop()
    print(json.dumps({
        "mode": "featurize-sandwich", "executors": executors,
        "cores": cores, "n_base": n_base, "pairs": n_cand, "band": band,
        "legs": legs,
    }))


if __name__ == "__main__":
    main()
