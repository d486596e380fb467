"""Catalog registration (S5): make every engine table addressable by name
through the Spark catalog, so SQL users query `nem.<table>` instead of
paths.

The reference keeps an implicit "catalog" of pandas frames keyed by
variable names in driver scripts (reference script/prepare_data.py); here
the same inventory is registered against the session catalog. On a real
deployment these would be Iceberg tables in a configured catalog
(``spark.sql.catalog.nem``); in this sandbox (no Iceberg jars, see
BENCH/BASELINE.md) they are temp views over parquet with the SAME names
and schemas, so every ``spark.sql`` statement is deployment-portable.
"""

from __future__ import annotations

from pyspark.sql import SparkSession

# the driver-contract tables (TESTDATA.md) + their primary keys; key
# registration is what downstream joins/bucketing assume
TESTDATA_TABLES = {
    "region": ["r_regionkey"],
    "nation": ["n_nationkey"],
    "customer": ["c_custkey"],
    "supplier": ["s_suppkey"],
    "part": ["p_partkey"],
    "orders": ["o_orderkey"],
    "lineitem": ["l_orderkey", "l_linenumber"],
    "events": ["event_id"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
}


def register_testdata(spark: SparkSession, sf_dir: str,
                      prefix: str = "") -> dict[str, list[str]]:
    """Register every testdata parquet table as a named view.

    Returns {table_name: key_columns} — the key registry callers use to
    choose join/bucket keys. Missing files are skipped (partial datasets
    register what exists)."""
    import os

    registered: dict[str, list[str]] = {}
    for name, keys in TESTDATA_TABLES.items():
        path = os.path.join(sf_dir, f"{name}.parquet")
        if not os.path.exists(path):
            continue
        spark.read.parquet(path).createOrReplaceTempView(prefix + name)
        registered[prefix + name] = keys
    return registered


def register_transcripts(spark: SparkSession, df, name: str = "transcripts"):
    """Register a transcript DataFrame under the frozen schema contract
    (conv_id, turn_idx, role, text, tool, ts) — validates the columns
    before exposing the name."""
    from neural_entity_matching_spark import schema

    expected = {f.name for f in schema.TRANSCRIPTS.fields}
    missing = expected - set(df.columns)
    if missing:
        raise ValueError(f"transcripts view missing columns: {sorted(missing)}")
    df.createOrReplaceTempView(name)
    return name
