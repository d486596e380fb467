"""Approximate nearest neighbor search over an embedding column.

* ``brute_force_topk`` — exact cosine top-k: broadcast the query set,
  JVM zip_with/aggregate dot products, window top-k. The correctness
  baseline; O(|queries| * |corpus|).
* ``lsh_topk`` — the scale path: random-hyperplane LSH sign buckets with
  multi-probe (several independent hash tables); candidates are the union
  of same-bucket vectors across tables, scored exactly, top-k per query.
  Recall tunable via (n_planes, n_tables); measured against the brute
  baseline in tests.
* ``ivf_assign/ivf_topk`` — IVF variant: k seeded random centroids
  (deterministic, no training), vectors assigned to nearest centroid,
  queries probe the ``n_probe`` nearest centroids only.

All distance math is either JVM expressions (hot loop in codegen) or one
vectorized numpy matmul inside a pandas UDF (bucket/centroid assignment).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, IntegerType, LongType

_DOT = "aggregate(zip_with({0}, {1}, (x, y) -> CAST(x AS DOUBLE) * CAST(y AS DOUBLE)), 0D, (a, v) -> a + v)"


def _with_norm(df: DataFrame, vec_col: str, out: str = "nrm") -> DataFrame:
    return df.withColumn(out, F.expr("sqrt(" + _DOT.format(vec_col, vec_col) + ")"))


def _safe_cos(a: str, b: str, na: str, nb: str):
    """Cosine with zero-norm guard (ANSI mode makes x/0 an error, and a
    zero vector is a legitimate payload, e.g. an empty document)."""
    denom = F.col(na) * F.col(nb)
    return F.when(
        denom > 0, F.round(F.expr(_DOT.format(a, b)) / denom, 6)
    ).otherwise(F.lit(0.0))


def brute_force_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact cosine top-k: (q_id, nn_id, cos_sim, rank). Queries must be
    broadcastable (the common 'score a probe set' shape)."""
    c = _with_norm(
        corpus.select(F.col(id_col).alias("nn_id"), F.col(vec_col).alias("ce")), "ce"
    ).withColumnRenamed("nrm", "cn")
    q = _with_norm(
        queries.select(F.col(id_col).alias("q_id"), F.col(vec_col).alias("qe")), "qe"
    ).withColumnRenamed("nrm", "qn")
    pairs = (
        F.broadcast(q).crossJoin(c)
        .filter(F.col("q_id") != F.col("nn_id"))
        .withColumn("cos_sim", _safe_cos("qe", "ce", "qn", "cn"))
    )
    w = Window.partitionBy("q_id").orderBy(F.desc("cos_sim"), F.asc("nn_id"))
    return (
        pairs.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("q_id", "nn_id", "cos_sim", "rank")
    )


def hyperplane_bucket_udf(n_planes: int = 16, seed: int = 42, dim: int | None = None):
    """pandas UDF: embedding -> sign-bucket id (one 0..2^n_planes-1 int).
    Hyperplanes are seeded gaussians, re-derived identically on every
    executor — deterministic, partition-invariant. One numpy matmul per
    Arrow batch."""

    state: dict = {}

    @F.pandas_udf(LongType())
    def _bucket(vecs: pd.Series) -> pd.Series:
        mat = np.array([np.asarray(v, dtype=np.float64) for v in vecs])
        if mat.ndim != 2 or mat.shape[0] == 0:
            return pd.Series(np.zeros(len(vecs), dtype=np.int64))
        d = mat.shape[1]
        if "planes" not in state or state["dim"] != d:
            rng = np.random.RandomState(seed)
            state["planes"] = rng.standard_normal((d, n_planes))
            state["dim"] = d
        signs = (mat @ state["planes"]) > 0  # (n, p)
        powers = (1 << np.arange(n_planes, dtype=np.int64))
        return pd.Series((signs * powers).sum(axis=1).astype(np.int64))

    return _bucket


def lsh_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_planes: int = 12,
    n_tables: int = 6,
    seed: int = 42,
) -> DataFrame:
    """LSH-bucketed cosine top-k: same output shape as brute_force_topk but
    scoring only same-bucket candidates (union over ``n_tables``
    independent hyperplane tables). At corpus scale this replaces the
    cross join with n_tables equi-joins on (table, bucket)."""
    def keyed(df, id_alias, vec_alias):
        parts = []
        for t in range(n_tables):
            b = hyperplane_bucket_udf(n_planes=n_planes, seed=seed + 1000 * t)
            parts.append(
                df.select(
                    F.col(id_col).alias(id_alias), F.col(vec_col).alias(vec_alias),
                    F.lit(t).alias("tbl"), b(F.col(vec_col)).alias("bucket"),
                )
            )
        out = parts[0]
        for p in parts[1:]:
            out = out.unionByName(p)
        return out

    cq = keyed(queries, "q_id", "qe")
    cc = keyed(corpus, "nn_id", "ce")
    cand = (
        cq.join(cc, ["tbl", "bucket"])
        .filter(F.col("q_id") != F.col("nn_id"))
        .select("q_id", "qe", "nn_id", "ce")
        .dropDuplicates(["q_id", "nn_id"])
    )
    scored = (
        _with_norm(cand, "qe", "qn")
        .transform(lambda df: _with_norm(df, "ce", "cn"))
        .withColumn("cos_sim", _safe_cos("qe", "ce", "qn", "cn"))
    )
    w = Window.partitionBy("q_id").orderBy(F.desc("cos_sim"), F.asc("nn_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("q_id", "nn_id", "cos_sim", "rank")
    )


def centroid_assign_udf(n_centroids: int = 32, n_probe: int = 1,
                        seed: int = 42):
    """pandas UDF: embedding -> array of the n_probe nearest seeded random
    centroids (IVF coarse quantizer; deterministic, no training step)."""

    state: dict = {}

    @F.pandas_udf(ArrayType(IntegerType()))
    def _assign(vecs: pd.Series) -> pd.Series:
        mat = np.array([np.asarray(v, dtype=np.float64) for v in vecs])
        if mat.ndim != 2 or mat.shape[0] == 0:
            return pd.Series([[0]] * len(vecs))
        d = mat.shape[1]
        if "c" not in state or state["dim"] != d:
            rng = np.random.RandomState(seed)
            c = rng.standard_normal((n_centroids, d))
            state["c"] = c / np.linalg.norm(c, axis=1, keepdims=True)
            state["dim"] = d
        norms = np.linalg.norm(mat, axis=1, keepdims=True)
        norms[norms == 0] = 1.0
        sims = (mat / norms) @ state["c"].T  # (n, k)
        idx = np.argsort(-sims, axis=1)[:, :n_probe]
        return pd.Series([row.astype(np.int32).tolist() for row in idx])

    return _assign


def ivf_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_centroids: int = 32,
    n_probe: int = 4,
    seed: int = 42,
) -> DataFrame:
    """IVF cosine top-k: corpus partitioned by nearest centroid, queries
    probe their n_probe nearest cells; exact scoring inside cells."""
    assign1 = centroid_assign_udf(n_centroids, 1, seed)
    assignp = centroid_assign_udf(n_centroids, n_probe, seed)
    cc = corpus.select(
        F.col(id_col).alias("nn_id"), F.col(vec_col).alias("ce"),
        F.explode(assign1(F.col(vec_col))).alias("cell"),
    )
    cq = queries.select(
        F.col(id_col).alias("q_id"), F.col(vec_col).alias("qe"),
        F.explode(assignp(F.col(vec_col))).alias("cell"),
    )
    cand = (
        cq.join(cc, "cell")
        .filter(F.col("q_id") != F.col("nn_id"))
        .select("q_id", "qe", "nn_id", "ce")
        .dropDuplicates(["q_id", "nn_id"])
    )
    scored = (
        _with_norm(cand, "qe", "qn")
        .transform(lambda df: _with_norm(df, "ce", "cn"))
        .withColumn("cos_sim", _safe_cos("qe", "ce", "qn", "cn"))
    )
    w = Window.partitionBy("q_id").orderBy(F.desc("cos_sim"), F.asc("nn_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("q_id", "nn_id", "cos_sim", "rank")
    )
