"""spark-submit entrypoint for the ER pipeline (north rule deployment):

    zip -r dist/nem.zip neural_entity_matching_spark
    spark-submit --master <cluster> --py-files dist/nem.zip \\
        scripts/run_pipeline.py --input <transcripts parquet/iceberg> \\
        --checkpoint-dir /path/ckpt [--threshold 0.55] [--block-cap 35] \\
        [--scorer threshold|logistic|gbt] [--labels <parquet>] \\
        [--synthetic N]   # generate the deterministic fixture instead

Runs (or resumes) signatures -> blocking -> scoring -> clustering and
prints a JSON report: per-stage rows/wall/resumed + blocking skew stats.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--input", help="transcripts table path (parquet dir)")
    p.add_argument("--synthetic", type=int, default=0,
                   help="generate a deterministic fixture with N base convs")
    p.add_argument("--checkpoint-dir", required=True)
    p.add_argument("--threshold", type=float, default=0.55)
    p.add_argument("--block-cap", type=int, default=35)
    p.add_argument("--bands", type=int, default=64)
    p.add_argument("--num-hashes", type=int, default=128)
    p.add_argument("--run-id", default="run")
    p.add_argument("--master", default=None)
    args = p.parse_args()

    from neural_entity_matching_spark.plans.pipeline import (
        PipelineConfig,
        run_pipeline,
    )
    from neural_entity_matching_spark.session import get_spark

    spark = get_spark(app_name="nem-pipeline", master=args.master)
    if args.synthetic:
        from neural_entity_matching_spark.sources.synth import to_spark

        transcripts, _, _ = to_spark(spark, n_base=args.synthetic, seed=42)
        input_fp = f"synthetic-{args.synthetic}-42"
    else:
        if not args.input:
            p.error("--input or --synthetic required")
        transcripts = spark.read.parquet(args.input)
        input_fp = args.input

    cfg = PipelineConfig(
        num_hashes=args.num_hashes, bands=args.bands,
        block_cap=args.block_cap, threshold=args.threshold,
    )
    clusters, report = run_pipeline(
        spark, transcripts, args.checkpoint_dir, cfg,
        input_fingerprint=input_fp, run_id=args.run_id,
    )
    n_clusters = clusters.select("cluster_id").distinct().count()
    print(json.dumps({
        "run_id": report.run_id,
        "n_entities": report.stages["signatures"]["rows"],
        "n_candidates": report.stages["candidates"]["rows"],
        "n_clusters": n_clusters,
        "stages": report.stages,
    }, default=str))
    spark.stop()


if __name__ == "__main__":
    main()
