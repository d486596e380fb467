"""Explicit StructTypes for every table in the pipeline.

The reference infers schemas from CSVs and keeps key metadata in a
side-channel Magellan "catalog" (reference script/model_magellan_ml.py:81-96);
here schemas are first-class and every stage's output contract is pinned.
"""

from __future__ import annotations

from pyspark.sql.types import (
    ArrayType,
    DoubleType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

# Base input per BASELINE.json:input_hint — one row per transcript turn.
TRANSCRIPTS = StructType(
    [
        StructField("conv_id", StringType(), False),
        StructField("turn_idx", IntegerType(), False),
        StructField("role", StringType(), True),
        StructField("text", StringType(), True),
        StructField("tool", StringType(), True),
        StructField("ts", TimestampType(), True),
    ]
)

# Ground truth, reference convention: positives only
# (reference script/prepare_data.py:6,35 — "only the positive examples are saved").
LABELED_PAIRS = StructType(
    [
        StructField("conv_id_a", StringType(), False),
        StructField("conv_id_b", StringType(), False),
        StructField("y", IntegerType(), False),
    ]
)

# One signature row per conversation (the reference's one-row-per-entity table).
SIGNATURES = StructType(
    [
        StructField("conv_id", StringType(), False),
        StructField("sig_text", StringType(), True),
        StructField("n_turns", IntegerType(), False),
    ]
)

CANDIDATE_PAIRS = StructType(
    [
        StructField("conv_id_a", StringType(), False),
        StructField("conv_id_b", StringType(), False),
    ]
)

SCORED_PAIRS = StructType(
    [
        StructField("conv_id_a", StringType(), False),
        StructField("conv_id_b", StringType(), False),
        StructField("lev_ratio", DoubleType(), True),
        StructField("token_jaccard", DoubleType(), True),
        StructField("len_ratio", DoubleType(), True),
        StructField("score", DoubleType(), True),
        StructField("is_match", IntegerType(), False),
    ]
)

CLUSTERS = StructType(
    [
        StructField("conv_id", StringType(), False),
        StructField("cluster_id", StringType(), False),
    ]
)

# Per-stage, per-partition lineage rows (north rule: "per-partition lineage
# + metrics"; replaces the reference's opaque result pickle,
# reference script/model_magellan_ml.py:428-430).
RUN_METRICS = StructType(
    [
        StructField("run_id", StringType(), False),
        StructField("stage", StringType(), False),
        StructField("partition_id", IntegerType(), True),
        StructField("rows_out", LongType(), True),
        StructField("wall_ms", LongType(), True),
        StructField("snapshot_id", StringType(), True),
    ]
)

EXPECTED_CLUSTERS = StructType(
    [
        StructField("conv_id", StringType(), False),
        StructField("cluster_id", StringType(), False),
    ]
)

BAND_KEYS = StructType(
    [
        StructField("conv_id", StringType(), False),
        StructField("block_key", StringType(), False),
    ]
)

EMBEDDINGS = StructType(
    [
        StructField("vec_id", LongType(), False),
        StructField("embedding", ArrayType(DoubleType()), True),
        StructField("label", IntegerType(), True),
    ]
)
