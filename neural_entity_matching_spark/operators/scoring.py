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
    lev_batch_udf,
    lev_tokjac_udf,
    token_jaccard,
)

FEATURE_COLS = ["lev_ratio", "token_jaccard", "len_ratio"]
# the full north-star matcher vector: "batched Jaro-Winkler, Levenshtein,
# TF-IDF cosine" (BASELINE.json) + the cheap features Magellan would
# auto-generate; produced by featurize_pairs(with_jaro_winkler=True,
# with_tfidf=True)
FULL_FEATURE_COLS = FEATURE_COLS + ["jaro_winkler", "tfidf_cosine"]


def tfidf_doc_weights(
    signatures: DataFrame,
    text_col: str = "sig_text",
    id_col: str = "conv_id",
    max_df: int | None = None,
    n_docs: int | None = None,
) -> DataFrame:
    """(conv_id, tw: map<bigint,double>) — L2-normalized TF-IDF weights over
    xxhash64'd word tokens (the "pre-computed per-doc weight map" the pair
    featurizer joins; string tokens never shuffle).

    idf = ln(1 + N/df). ``max_df`` drops corpus-hot tokens from the
    representation entirely (weights AND norm) — the standard df cap that
    keeps any downstream inverted-index use linear. Distributed shape: one
    (doc, token-hash) aggregate, one token-df aggregate, one join back,
    one per-doc map aggregate; no UDF, no collect.

    ``n_docs``: pass the corpus size when the caller already knows it;
    otherwise N is folded into the lazy plan as a broadcast 1-row
    aggregate (cross join) — either way no extra eager ``count()`` job
    fires when the weights are built.
    """
    toks = (
        signatures.select(
            F.col(id_col).alias("conv_id"),
            F.explode(F.split(F.trim(F.col(text_col)), r"\s+")).alias("tok"),
        )
        .filter(F.length("tok") > 0)
        .select("conv_id", F.xxhash64("tok").alias("th"))
    )
    tf = toks.groupBy("conv_id", "th").agg(F.count("*").alias("tf"))
    dfreq = tf.groupBy("th").agg(F.count("*").alias("df"))
    if max_df is not None:
        dfreq = dfreq.filter(F.col("df") <= max_df)
    w = tf.join(dfreq, "th")
    if n_docs is not None:
        w = w.withColumn("_n", F.lit(float(n_docs)))
    else:
        n_row = signatures.agg(
            F.count("*").cast("double").alias("_n"))
        w = w.crossJoin(F.broadcast(n_row))
    w = (
        w.withColumn("idf", F.log(F.lit(1.0) + F.col("_n") / F.col("df")))
        .withColumn("w", F.col("tf") * F.col("idf"))
        .drop("_n")
    )
    per_doc = w.groupBy("conv_id").agg(
        F.map_from_entries(
            F.collect_list(F.struct(F.col("th").alias("k"), F.col("w").alias("v")))
        ).alias("tw_raw"),
        F.sqrt(F.sum(F.col("w") * F.col("w"))).alias("nrm"),
    )
    return per_doc.select(
        "conv_id",
        F.when(
            F.col("nrm") > 0,
            F.expr("transform_values(tw_raw, (k, v) -> v / nrm)"),
        ).otherwise(F.expr("map()")).alias("tw"),
    )


# unit-normalized maps: cosine == dot. map_zip_with unions the key sets;
# absent keys contribute 0.
_TFIDF_DOT = (
    "aggregate(map_values(map_zip_with({0}, {1},"
    " (k, x, y) -> coalesce(x, 0D) * coalesce(y, 0D))),"
    " 0D, (acc, v) -> acc + v)"
)


def featurize_pairs(
    candidates: DataFrame,
    signatures: DataFrame,
    with_jaro_winkler: bool = False,
    lev_prefix: int | None = 512,
    broadcast_signatures: bool = False,
    with_tfidf: bool = False,
    tfidf_max_df: int | None = None,
    tfidf_n_docs: int | None = None,
    with_embedding: bool = False,
    embedding_dim: int = 64,
    lev_band: float | None = None,
    hashed_tokens: bool = False,
) -> DataFrame:
    """Attach (sig_a, sig_b) payloads and compute pair features.

    The default (exact) hot path computes the Levenshtein distance and
    token intersect/union in ONE fused Arrow pass (batch-vectorized
    Myers kernel + exact-Spark-semantics tokenizer — r7, see the fused
    branch below); lev_ratio / token_jaccard / len_ratio are JVM float
    expressions over the returned integers, bit-identical to the all-JVM
    formulation. The banded/hashed variants stay JVM-only; the
    Jaro-Winkler pandas UDF is opt-in (Arrow batch per partition).

    ``with_tfidf`` adds the north-star TF-IDF cosine: per-doc normalized
    weight maps are precomputed ONCE over the signature table
    (tfidf_doc_weights) and joined to the pairs; the per-pair cosine is a
    JVM map_zip_with dot — O(|a|+|b|) per pair, no UDF.

    ``with_embedding`` adds the optional sentence-embedding cosine from
    the deterministic hash-embedding stand-in
    (functions/embedding.py — swap in a real encoder outside this
    sandbox); per-doc vectors computed once, pair cosine is a JVM
    zip_with dot.

    ``lev_prefix``: levenshtein is O(len_a * len_b) PER PAIR — on unbounded
    multi-turn signatures that term dominates the whole pipeline, so the
    edit ratio is computed over the first ``lev_prefix`` normalized chars
    (None = unbounded). Token-Jaccard and length features still see the
    full signature. At 10^12-turn scale a bounded edit window is the only
    viable contract; the F1 gate is enforced on exactly this definition.

    Scale note: both payload joins shuffle on conv_id — the same key the
    signature table is already hash-partitioned on, so AQE keeps them
    cheap; candidates is the smaller post-blocking side.

    ``lev_band``: opt-in BANDED edit distance for the ML feature table
    (the exact O(n*m) levenshtein is ~95% of the trained-matcher wall —
    400 s at 1x1-core on 201k pairs). With band b in (0, 1],
    ``levenshtein(a, b, k)`` runs Spark's O(k*n) banded search with
    k = floor(b * maxlen): ``lev_ratio`` is EXACT (bit-identical
    expression to the default path) for every pair whose true edit
    distance is within the band — i.e. true ratio >= ~100*(1-b) — and is
    the deterministic upper bound ``100*(1-(k+1)/maxlen)`` otherwise.
    Feature semantics: pairs more distant than the band collapse to
    ~100*(1-b) instead of spreading over [0, 100*(1-b)); a trained
    matcher separates on the near side of the band, so the gates
    (pairwise F1 / AP on the fixture) are asserted unchanged in
    test_ml_scorer. None (default) = exact everywhere.

    ``hashed_tokens``: opt-in once-per-SIGNATURE tokenization into
    distinct xxhash64 arrays (the fast scorer's allocation discipline)
    instead of tokenizing both full strings per PAIR — per-pair
    split/distinct on full text makes the stage allocation-stall bound
    (measured: 32 threads pinned at ~25% CPU). ``token_jaccard`` equals
    the string-token value except under 64-bit token-hash collisions
    (~n_tokens^2 / 2^65 per signature — the same trade the decision path
    already accepts).
    """
    sig = signatures.select("conv_id", "sig_text")
    if hashed_tokens:
        # same expression text as the fast scorer's toks map
        sig = sig.withColumn(
            "toks",
            F.expr(
                "array_distinct(transform(split(trim(sig_text), '\\\\s+'),"
                " x -> xxhash64(x)))"
            ),
        )
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

    def _side(suffix: str) -> DataFrame:
        s = (sig.withColumnRenamed("conv_id", f"conv_id_{suffix}")
                .withColumnRenamed("sig_text", f"sig_{suffix}"))
        return (s.withColumnRenamed("toks", f"toks_{suffix}")
                if hashed_tokens else s)

    out = candidates.join(_side("a"), "conv_id_a").join(_side("b"), "conv_id_b")
    fused_udf = lev_band is None and not hashed_tokens
    if fused_udf:
        # r7 hot path (guide §4.2): ONE Arrow pass computes the exact
        # Levenshtein distance (batch-vectorized Myers kernel,
        # O(n*ceil(m/64)) instead of O(n*m) — integer-identical to
        # F.levenshtein) AND the distinct-token intersect/union sizes
        # (exact Spark trim/split semantics, memoized per signature).
        # Replaces the two dominant per-pair JVM terms: the full cell DP
        # (~95% of the exact featurize wall) and the per-pair
        # split/array_distinct/array_intersect chain. lev_ratio /
        # token_jaccard are reconstructed with float expressions copied
        # term-for-term from similarity.lev_ratio / token_jaccard, so
        # every double is bit-identical to the JVM path (oracle-checked
        # by pair_features).
        out = (
            out.withColumn(
                "_lj", lev_tokjac_udf(lev_prefix)(F.col("sig_a"),
                                                  F.col("sig_b")))
            .withColumn(
                "lev_ratio",
                100.0
                * (
                    1.0
                    - F.col("_lj.d")
                    / F.greatest(F.length(la), F.length(lb), F.lit(1))
                ),
            )
            .withColumn(
                "token_jaccard",
                F.when(F.col("_lj.tu") > 0, F.col("_lj.ti") / F.col("_lj.tu"))
                 .otherwise(F.lit(0.0)),
            )
            .drop("_lj")
        )
    elif lev_band is None:
        # exact distance via the Myers kernel, jaccard handled by the
        # hashed_tokens branch below
        out = (
            out.withColumn("_lev_d", lev_batch_udf(la, lb))
            .withColumn(
                "lev_ratio",
                100.0
                * (
                    1.0
                    - F.col("_lev_d")
                    / F.greatest(F.length(la), F.length(lb), F.lit(1))
                ),
            )
            .drop("_lev_d")
        )
    else:
        out = (
            out
            .withColumn("_la", la)
            .withColumn("_lb", lb)
            .withColumn("_maxlen",
                        F.greatest(F.length("_la"), F.length("_lb"), F.lit(1)))
            .withColumn("_k", F.floor(F.lit(float(lev_band)) * F.col("_maxlen"))
                        .cast("int"))
            # SQL form: the banded threshold argument is only accepted as
            # an expression through the SQL function (same as fast scorer)
            .withColumn("_d", F.expr("levenshtein(_la, _lb, greatest(_k, 0))"))
            .withColumn(
                "lev_ratio",
                F.when(F.col("_d") >= 0,
                       100.0 * (1.0 - F.col("_d") / F.col("_maxlen")))
                 .otherwise(100.0 * (1.0 - (F.col("_k") + 1) / F.col("_maxlen"))),
            )
            .drop("_la", "_lb", "_maxlen", "_k", "_d")
        )
    if hashed_tokens:
        out = (
            out
            .withColumn("_inter", F.size(F.array_intersect("toks_a", "toks_b")))
            .withColumn("_union", F.size(F.array_union("toks_a", "toks_b")))
            .withColumn(
                "token_jaccard",
                F.when(F.col("_union") > 0, F.col("_inter") / F.col("_union"))
                 .otherwise(F.lit(0.0)),
            )
            .drop("toks_a", "toks_b", "_inter", "_union")
        )
    elif not fused_udf:
        out = out.withColumn(
            "token_jaccard", token_jaccard(F.col("sig_a"), F.col("sig_b")))
    out = out.withColumn("len_ratio", len_ratio(F.col("sig_a"), F.col("sig_b")))
    if with_jaro_winkler:
        out = out.withColumn(
            "jaro_winkler", jaro_winkler_udf(F.col("sig_a"), F.col("sig_b"))
        )
    if with_tfidf:
        tw = tfidf_doc_weights(signatures, max_df=tfidf_max_df,
                               n_docs=tfidf_n_docs)
        if broadcast_signatures:
            tw = F.broadcast(tw)
        # LEFT join + empty-map default: a doc whose signature has zero
        # tokens gets no weight row, and an inner join here would silently
        # drop its candidate pairs from the feature table (row set must
        # not depend on which feature columns are enabled — the embedding
        # path below is total for the same reason).
        out = (
            out
            .join(tw.select(F.col("conv_id").alias("conv_id_a"),
                            F.col("tw").alias("tw_a")), "conv_id_a", "left")
            .join(tw.select(F.col("conv_id").alias("conv_id_b"),
                            F.col("tw").alias("tw_b")), "conv_id_b", "left")
            .withColumn("tw_a", F.coalesce(F.col("tw_a"), F.expr("map()")))
            .withColumn("tw_b", F.coalesce(F.col("tw_b"), F.expr("map()")))
            .withColumn("tfidf_cosine", F.expr(_TFIDF_DOT.format("tw_a", "tw_b")))
            .drop("tw_a", "tw_b")
        )
    if with_embedding:
        from neural_entity_matching_spark.functions.embedding import (
            embed_signatures,
        )

        emb = embed_signatures(signatures, dim=embedding_dim)
        if broadcast_signatures:
            emb = F.broadcast(emb)
        dot = ("aggregate(zip_with({0}, {1}, (x, y) -> x * y),"
               " 0D, (acc, v) -> acc + v)")
        out = (
            out
            .join(emb.select(F.col("conv_id").alias("conv_id_a"),
                             F.col("emb").alias("emb_a")), "conv_id_a")
            .join(emb.select(F.col("conv_id").alias("conv_id_b"),
                             F.col("emb").alias("emb_b")), "conv_id_b")
            # vectors are unit-or-zero norm: the dot IS the cosine
            .withColumn("embedding_cosine", F.expr(dot.format("emb_a", "emb_b")))
            .drop("emb_a", "emb_b")
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
    split_broadcast: bool = False,
    persist_handles: list[DataFrame] | None = None,
) -> DataFrame:
    """Decision-exact fused featurize+score using *thresholded* levenshtein.

    Full O(n*m) edit distance on every candidate pair dominates the whole
    pipeline, yet for most pairs (dissimilar hard negatives) the decision
    only needs to know the ratio is BELOW what the threshold requires.
    Cascade per pair:

      1. token_jaccard (cheap JVM array op);
      2. if even an identical string (d=0) could not reach the threshold —
         evaluated with the SAME float expression the exact scorer uses —
         skip the edit distance entirely;
      3. else run ``levenshtein(a, b, k)`` with k = floor((1-required)
         * maxlen) + 1: Spark's banded implementation costs O(k*n) instead
         of O(n^2) and returns -1 when the distance exceeds k.

    ``is_match`` is BIT-IDENTICAL to featurize_pairs + threshold_scorer:
    the band is one wider than the analytic cutoff (floor+1 strictly
    bounds any IEEE rounding of the cutoff expression), and the decision
    is derived from the reconstructed score via the *identical* float
    expression (``score >= threshold``), never from band exhaustion —
    so threshold-boundary pairs land exactly where the exact path puts
    them. When the band is exhausted (_d = -1) the true score is strictly
    below what the threshold requires, hence is_match = 0 is also exact.
    ``score`` is exact for every pair whose distance fell inside the band
    and a sub-threshold upper bound otherwise. Use featurize_pairs +
    threshold_scorer when exact sub-threshold scores matter (PR curves
    over negatives, ML feature tables).

    CONSUMPTION RULE: materialize (persist/snapshot-write) before
    filtering on ``is_match``/``score``. A filter applied to the lazy
    plan gets pushed through the projection chain by Catalyst, which
    substitutes the whole banded-levenshtein cascade into the predicate
    and re-evaluates it per reference — measured 20x wall on 11.6M pairs
    (313s vs 16s). Aggregations (``agg(sum(is_match))``) are safe; the
    staged pipeline is safe (the scored stage is snapshot-written before
    the cluster stage filters it).

    Allocation discipline: tokenization happens ONCE per signature (into
    hashed int64 arrays), never per pair — per-pair split/distinct on the
    full text makes the whole stage allocation-stall bound (measured: 32
    threads pinned at ~25% CPU each, i.e. 8 effective cores, identical
    wall at 8 and 32 threads).

    ``split_broadcast`` (requires ``broadcast_signatures``): ship TWO
    broadcast maps instead of one — a toks-only map (token array +
    lengths, ~0.3 KB/entry) probed by EVERY pair, and the string map
    (the levenshtein operand, ~1 KB/entry) probed ONLY by pairs whose
    jaccard-derived score ceiling clears the threshold. Measured on the
    synthetic corpus at n=20k, 93.05% of candidate pairs decide on
    jaccard alone, so the split removes ~75% of the per-probe broadcast
    bytes — the shared-DRAM-bus resource concurrent executors contend
    on. Costs one internal persist of the o(pairs) jaccard stage (the
    two branches must not recompute it; the InMemoryRelation also keeps
    the is_match pushdown hazard away from the branch filters). Results
    are bit-identical to the fused path: same float expressions, same
    band, same decision comparison (asserted in test_fast_scorer).

    ``persist_handles``: the split path persists its jaccard stage
    internally; pass a list and the handle is appended so the CALLER can
    unpersist once the scored output is materialized (the same handle
    discipline the blocking operators use via ``stats.extra``). Without
    it each split-scoring call in a long-lived session leaks one cached
    InMemoryRelation (MEMORY_AND_DISK spill blocks accumulate until
    session end).
    """
    if split_broadcast:
        if not broadcast_signatures:
            raise ValueError(
                "split_broadcast requires broadcast_signatures=True "
                "(the split exists to shrink the broadcast probe payload)"
            )
        return _fast_threshold_score_split(
            candidates, signatures, threshold=threshold, w_lev=w_lev,
            w_jacc=w_jacc, lev_prefix=lev_prefix,
            persist_handles=persist_handles,
        )
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
        # band ONE wider than the analytic cutoff: floor(x)+1 > x for any
        # IEEE rounding of x, so every distance the exact comparison could
        # accept is inside the band
        .withColumn(
            "_k",
            F.floor((F.lit(1.0) - F.col("_req")) * F.col("_maxlen")).cast("int")
            + F.lit(1),
        )
        # skip the edit distance only when even d=0 cannot match, decided
        # by the same float expression as the exact scorer at lev_ratio=100
        .withColumn(
            "_smax",
            F.lit(w_lev) * F.lit(100.0) / 100.0
            + F.lit(w_jacc) * F.col("token_jaccard"),
        )
        .withColumn(
            "_d",
            F.when(F.col("_smax") < F.lit(threshold), F.lit(-1))
             # SQL form: the banded threshold argument is only accepted as
             # an expression through the SQL function, not the Python API
             .otherwise(F.expr("levenshtein(_a, _b, greatest(_k, 1))")),
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
        # the decision comes from the reconstructed score through the
        # IDENTICAL comparison the exact path uses — never from band
        # exhaustion, so boundary rounding matches bit-for-bit
        .withColumn(
            "is_match",
            ((F.col("_d") >= 0) & (F.col("score") >= F.lit(threshold))).cast("int"),
        )
        .drop("_a", "_b", "len_a", "len_b", "toks_a", "toks_b", "nt_a", "nt_b",
              "_inter", "_maxlen", "_req", "_k", "_smax", "_d")
    )
    return out


def _fast_threshold_score_split(
    candidates: DataFrame,
    signatures: DataFrame,
    threshold: float,
    w_lev: float,
    w_jacc: float,
    lev_prefix: int,
    persist_handles: list[DataFrame] | None = None,
) -> DataFrame:
    """Split-broadcast body of fast_threshold_score — see its docstring.

    Every expression below is copied verbatim from the fused path so the
    reconstructed scores and decisions stay bit-identical; the only
    structural change is WHICH broadcast relation each branch probes.
    ``_maxlen`` (the fused path's ``greatest(length(_a), length(_b), 1)``)
    is derived without the strings as ``least(sig_len, lev_prefix)`` per
    side — exact because ``length(substring(s, 1, p)) == least(length(s),
    p)`` in characters, the unit both functions use.
    """
    toks_map = signatures.select(
        "conv_id",
        F.length("sig_text").alias("sig_len"),
        F.expr(
            "array_distinct(transform(split(trim(sig_text), '\\\\s+'), x -> xxhash64(x)))"
        ).alias("toks"),
    ).withColumn("n_toks", F.size("toks"))
    str_map = signatures.select(
        "conv_id",
        (F.substring("sig_text", 1, lev_prefix) if lev_prefix is not None
         else F.col("sig_text")).alias("sig_lev"),
    )
    btoks = F.broadcast(toks_map)
    bstr = F.broadcast(str_map)
    cand_cols = list(candidates.columns)  # preserved like the fused path

    def _lev_len(side: str):
        # length of the levenshtein operand without fetching it
        col = F.col(f"len_{side}")
        return F.least(col, F.lit(lev_prefix)) if lev_prefix is not None else col

    base = (
        candidates
        .join(btoks.select(F.col("conv_id").alias("conv_id_a"),
                           F.col("sig_len").alias("len_a"),
                           F.col("toks").alias("toks_a"),
                           F.col("n_toks").alias("nt_a")), "conv_id_a")
        .join(btoks.select(F.col("conv_id").alias("conv_id_b"),
                           F.col("sig_len").alias("len_b"),
                           F.col("toks").alias("toks_b"),
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
        .withColumn("_maxlen", F.greatest(_lev_len("a"), _lev_len("b"), F.lit(1)))
        .withColumn(
            "_req",
            (F.lit(threshold) - F.lit(w_jacc) * F.col("token_jaccard")) / F.lit(w_lev),
        )
        .withColumn(
            "_k",
            F.floor((F.lit(1.0) - F.col("_req")) * F.col("_maxlen")).cast("int")
            + F.lit(1),
        )
        .withColumn(
            "_smax",
            F.lit(w_lev) * F.lit(100.0) / 100.0
            + F.lit(w_jacc) * F.col("token_jaccard"),
        )
        .select(*cand_cols, "token_jaccard", "len_ratio",
                "_maxlen", "_req", "_k", "_smax")
        # both branches read this once-computed stage; without the persist
        # each branch would re-run the toks joins AND Catalyst could push
        # branch predicates into the jaccard projection
        .persist()
    )
    if persist_handles is not None:
        persist_handles.append(base)
    skip = (
        base.filter(F.col("_smax") < F.lit(threshold))
        .withColumn("_d", F.lit(-1).cast("int"))
    )
    survivors = (
        base.filter(~(F.col("_smax") < F.lit(threshold)))
        .join(bstr.select(F.col("conv_id").alias("conv_id_a"),
                          F.col("sig_lev").alias("_a")), "conv_id_a")
        .join(bstr.select(F.col("conv_id").alias("conv_id_b"),
                          F.col("sig_lev").alias("_b")), "conv_id_b")
        .withColumn("_d", F.expr("levenshtein(_a, _b, greatest(_k, 1))"))
        .drop("_a", "_b")
    )
    return (
        skip.unionByName(survivors)
        .withColumn(
            "lev_ratio",
            F.when(F.col("_d") >= 0,
                   100.0 * (1.0 - F.col("_d") / F.col("_maxlen")))
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
        .withColumn(
            "is_match",
            ((F.col("_d") >= 0) & (F.col("score") >= F.lit(threshold))).cast("int"),
        )
        .drop("_maxlen", "_req", "_k", "_smax", "_d")
    )


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
