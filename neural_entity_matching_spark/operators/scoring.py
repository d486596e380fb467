"""Pairwise featurization + scoring.

Reference flow: Magellan auto feature gen over candidate pairs
(reference script/model_magellan_ml.py:37-114), label attach via left join
+ NaN->0 (model_magellan_ml.py:207-208), shallow matcher or the degenerate
blocker-as-matcher bypass when post-blocking labels are single-class
(model_magellan_ml.py:119-134,214-219).

Spark-first: features are column expressions (codegen) plus optional
pandas-UDF measures; the payload fetch is two joins back to the signature
table (the reference's pair re-alignment dance at
blocking_algorithms.py:149-172 disappears because pairs carry
(conv_id_a, conv_id_b) columns from the start).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from neural_entity_matching_spark.functions.similarity import (
    jaro_winkler_udf,
    len_ratio,
    lev_ratio,
    token_jaccard,
)

FEATURE_COLS = ["lev_ratio", "token_jaccard", "len_ratio"]


def featurize_pairs(
    candidates: DataFrame,
    signatures: DataFrame,
    with_jaro_winkler: bool = False,
    lev_prefix: int | None = 512,
    broadcast_signatures: bool = False,
) -> DataFrame:
    """Attach (sig_a, sig_b) payloads and compute pair features.

    Hot path is JVM-only (levenshtein / array jaccard / lengths); the
    Jaro-Winkler pandas UDF is opt-in (Arrow batch per partition).

    ``lev_prefix``: levenshtein is O(len_a * len_b) PER PAIR — on unbounded
    multi-turn signatures that term dominates the whole pipeline, so the
    edit ratio is computed over the first ``lev_prefix`` normalized chars
    (None = unbounded). Token-Jaccard and length features still see the
    full signature. At 10^12-turn scale a bounded edit window is the only
    viable contract; the F1 gate is enforced on exactly this definition.

    Scale note: both payload joins shuffle on conv_id — the same key the
    signature table is already hash-partitioned on, so AQE keeps them
    cheap; candidates is the smaller post-blocking side.
    """
    sig = signatures.select("conv_id", "sig_text")
    if broadcast_signatures:
        # Both payload joins become broadcast-hash joins — zero shuffle of
        # the (much larger) pair table. Only valid while the signature
        # table fits an executor; at 10^12-turn scale leave False and let
        # AQE plan the shuffled join on the bucketed conv_id.
        sig = F.broadcast(sig)
    la, lb = F.col("sig_a"), F.col("sig_b")
    if lev_prefix is not None:
        la = F.substring("sig_a", 1, lev_prefix)
        lb = F.substring("sig_b", 1, lev_prefix)
    out = (
        candidates
        .join(sig.withColumnRenamed("conv_id", "conv_id_a")
                 .withColumnRenamed("sig_text", "sig_a"), "conv_id_a")
        .join(sig.withColumnRenamed("conv_id", "conv_id_b")
                 .withColumnRenamed("sig_text", "sig_b"), "conv_id_b")
        .withColumn("lev_ratio", lev_ratio(la, lb))
        .withColumn("token_jaccard", token_jaccard(F.col("sig_a"), F.col("sig_b")))
        .withColumn("len_ratio", len_ratio(F.col("sig_a"), F.col("sig_b")))
    )
    if with_jaro_winkler:
        out = out.withColumn(
            "jaro_winkler", jaro_winkler_udf(F.col("sig_a"), F.col("sig_b"))
        )
    return out.drop("sig_a", "sig_b")


def fast_threshold_score(
    candidates: DataFrame,
    signatures: DataFrame,
    threshold: float = 0.55,
    w_lev: float = 0.5,
    w_jacc: float = 0.5,
    lev_prefix: int = 512,
    broadcast_signatures: bool = False,
) -> DataFrame:
    """Decision-exact fused featurize+score using *thresholded* levenshtein.

    Full O(n*m) edit distance on every candidate pair dominates the whole
    pipeline, yet for most pairs (dissimilar hard negatives) the decision
    only needs to know the ratio is BELOW what the threshold requires.
    Cascade per pair:

      1. token_jaccard (cheap JVM array op);
      2. required_ratio = (t - w_jacc*jacc) / w_lev — the edit ratio a pair
         must reach to match;
      3. required_ratio > 1  -> non-match, no edit distance at all;
         else run ``levenshtein(a, b, k)`` with k = floor((1-required)
         * maxlen): Spark's banded implementation costs O(k*n) instead of
         O(n^2) and returns -1 when the distance exceeds k -> non-match.

    ``is_match`` is IDENTICAL to the exact path (the band covers exactly
    the distances that could still match); ``score`` is exact for every
    matched pair and an upper bound (< threshold) for non-matches. Use
    featurize_pairs + threshold_scorer when exact sub-threshold scores
    matter (PR curves over negatives, ML feature tables).

    Allocation discipline: tokenization happens ONCE per signature (into
    hashed int64 arrays), never per pair — per-pair split/distinct on the
    full text makes the whole stage allocation-stall bound (measured: 32
    threads pinned at ~25% CPU each, i.e. 8 effective cores, identical
    wall at 8 and 32 threads).
    """
    sig = signatures.select(
        "conv_id",
        (F.substring("sig_text", 1, lev_prefix) if lev_prefix is not None
         else F.col("sig_text")).alias("sig_lev"),
        F.length("sig_text").alias("sig_len"),
        F.expr(
            "array_distinct(transform(split(trim(sig_text), '\\\\s+'), x -> xxhash64(x)))"
        ).alias("toks"),
    ).withColumn("n_toks", F.size("toks"))
    if broadcast_signatures:
        sig = F.broadcast(sig)
    out = (
        candidates
        .join(sig.select(F.col("conv_id").alias("conv_id_a"), F.col("sig_lev").alias("_a"),
                         F.col("sig_len").alias("len_a"), F.col("toks").alias("toks_a"),
                         F.col("n_toks").alias("nt_a")), "conv_id_a")
        .join(sig.select(F.col("conv_id").alias("conv_id_b"), F.col("sig_lev").alias("_b"),
                         F.col("sig_len").alias("len_b"), F.col("toks").alias("toks_b"),
                         F.col("n_toks").alias("nt_b")), "conv_id_b")
        .withColumn("_inter", F.size(F.array_intersect("toks_a", "toks_b")))
        .withColumn(
            "token_jaccard",
            F.when(F.col("nt_a") + F.col("nt_b") - F.col("_inter") > 0,
                   F.col("_inter") / (F.col("nt_a") + F.col("nt_b") - F.col("_inter")))
             .otherwise(F.lit(0.0)),
        )
        .withColumn(
            "len_ratio",
            F.least("len_a", "len_b") / F.greatest("len_a", "len_b", F.lit(1)),
        )
        .withColumn("_maxlen", F.greatest(F.length("_a"), F.length("_b"), F.lit(1)))
        .withColumn(
            "_req",  # edit ratio (0..1) still needed after the jaccard part
            (F.lit(threshold) - F.lit(w_jacc) * F.col("token_jaccard")) / F.lit(w_lev),
        )
        .withColumn(
            "_k", F.floor((F.lit(1.0) - F.col("_req")) * F.col("_maxlen")).cast("int")
        )
        .withColumn(
            "_d",
            F.when(F.col("_k") < 0, F.lit(-1))
             # SQL form: the banded threshold argument is only accepted as
             # an expression through the SQL function, not the Python API
             .otherwise(F.expr("levenshtein(_a, _b, _k)")),
        )
        .withColumn(
            "lev_ratio",
            F.when(F.col("_d") >= 0,
                   100.0 * (1.0 - F.col("_d") / F.col("_maxlen")))
             # banded search exhausted: true ratio < required — report the
             # tightest upper bound, kept strictly below the required ratio
             .otherwise(
                 F.greatest(
                     F.least(
                         100.0 * (1.0 - (F.col("_k") + 1) / F.col("_maxlen")),
                         100.0 * F.col("_req") - F.lit(1e-6),
                     ),
                     F.lit(0.0),
                 )
             ),
        )
        .withColumn(
            "score",
            F.lit(w_lev) * F.col("lev_ratio") / 100.0
            + F.lit(w_jacc) * F.col("token_jaccard"),
        )
        .withColumn("is_match", (F.col("_d") >= 0).cast("int"))
        .drop("_a", "_b", "len_a", "len_b", "toks_a", "toks_b", "nt_a", "nt_b",
              "_inter", "_maxlen", "_req", "_k", "_d")
    )
    return out


def attach_labels(candidates: DataFrame, labeled_pairs: DataFrame) -> DataFrame:
    """Left join + coalesce(y, 0): negatives are implied by absence
    (reference script/model_magellan_ml.py:207-208). The label table is tiny
    relative to candidates — broadcast it."""
    return (
        candidates.join(
            F.broadcast(labeled_pairs.select("conv_id_a", "conv_id_b", "y")),
            ["conv_id_a", "conv_id_b"],
            "left",
        )
        .withColumn("y", F.coalesce(F.col("y"), F.lit(0)))
    )


def threshold_scorer(
    featurized: DataFrame,
    threshold: float = 0.55,
    w_lev: float = 0.5,
    w_jacc: float = 0.5,
) -> DataFrame:
    """Deterministic linear scorer over the JVM features.

    score = w_lev * lev_ratio/100 + w_jacc * token_jaccard, match iff
    score >= threshold. This is the no-ML path (the ML scorers live in
    operators/ml_scorer.py); it already separates the synthetic dup
    perturbations (<=10% token noise) from hard negatives.
    """
    return (
        featurized
        .withColumn(
            "score",
            w_lev * F.col("lev_ratio") / 100.0 + w_jacc * F.col("token_jaccard"),
        )
        .withColumn("is_match", (F.col("score") >= threshold).cast("int"))
    )


def degenerate_scorer(featurized: DataFrame) -> DataFrame:
    """Blocker-as-matcher bypass: when post-blocking training labels are
    single-class the reference skips training and predicts 1 for every
    candidate (model_magellan_ml.py:119-134,214-219). Same interface."""
    return featurized.withColumn("score", F.lit(1.0)).withColumn(
        "is_match", F.lit(1)
    )


def is_single_class(labeled: DataFrame) -> bool:
    """Guard for the degenerate path (model_magellan_ml.py:214-219)."""
    return labeled.select("y").distinct().count() < 2
