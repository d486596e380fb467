"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship end-to-end record-linkage chain
(turn-ordered signature build -> MinHash-LSH blocking -> JVM pair
features -> threshold scorer) over the sf0.001 events table treated as
transcript turns (user_id=conv_id, ts order=turn order).

``queries()`` / ``oracle_sql()`` expose one entry per implemented
operator from SURVEY.md §2 plus the training-data-pipeline operators
(dedup suite, ANN, text analysis); implementations live in
``neural_entity_matching_spark/plans/contract.py``.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from neural_entity_matching_spark.plans import contract  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: ER pipeline (signature -> LSH block -> features -> score)
    on /root/testdata/sf0.001."""
    from pyspark.sql import functions as F

    from neural_entity_matching_spark.operators.blocking import lsh_block
    from neural_entity_matching_spark.operators.scoring import (
        featurize_pairs,
        threshold_scorer,
    )

    sf_dir = "/root/testdata/sf0.001"
    sigs = contract.q_signature_build(spark, sf_dir).select(
        F.col("user_id").cast("string").alias("conv_id"),
        F.col("sig").alias("sig_text"),
        F.col("n_events").cast("int").alias("n_turns"),
    )
    candidates, _stats = lsh_block(
        sigs, num_hashes=128, bands=64, char_ngram=8, seed=42, block_cap=100
    )
    return threshold_scorer(featurize_pairs(candidates, sigs), threshold=0.55)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator (SURVEY.md §2 ids in each
    callable's docstring)."""
    return dict(contract.QUERIES)


def oracle_sql() -> dict[str, str]:
    """Equivalent DuckDB SQL for every query (all are SQL-expressible;
    column names/aliases match the Spark side exactly)."""
    return dict(contract.ORACLES)
