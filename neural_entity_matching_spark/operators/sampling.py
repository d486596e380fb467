"""Dataset-construction operators (reference EP1, script/prepare_data.py +
script/utilities.py): positive/negative match generation, positional-zip
negative pairing, quantile difficulty cutoffs, and the iterative
difficulty-stratified sampler.

These reproduce the reference's *labeled-set construction* semantics on
Spark. They are not in the serving path (SURVEY.md §2.4 A4) — they exist
so reference experiment fixtures can be rebuilt at scale.

Determinism rules: every 'random' choice is a deterministic function of
content + seed (md5/xxhash ordering), never of row order or partitioning —
the reference's pd.sample(random_state=seed) analogue that survives a
cluster (SURVEY.md §7 risk 4).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from neural_entity_matching_spark.functions.similarity import lev_ratio

PAIR_KEY = ["conv_id_a", "conv_id_b"]


def generate_pos_neg_matches(
    positives: DataFrame, entities: DataFrame, id_col: str = "conv_id"
) -> tuple[DataFrame, DataFrame]:
    """J1 + J2 (reference script/utilities.py:74-114): positive pairs joined
    to entity payloads; negatives = entities in NO positive pair
    (anti-join), returned as an entity pool for negative pairing."""
    pos = (
        positives
        .join(entities.withColumnRenamed(id_col, "conv_id_a")
              .withColumnRenamed("sig_text", "sig_a"), "conv_id_a")
        .join(entities.withColumnRenamed(id_col, "conv_id_b")
              .withColumnRenamed("sig_text", "sig_b"), "conv_id_b")
    )
    matched_ids = (
        positives.select(F.col("conv_id_a").alias(id_col))
        .unionByName(positives.select(F.col("conv_id_b").alias(id_col)))
        .distinct()
    )
    negatives_pool = entities.join(matched_ids, id_col, "left_anti")
    return pos, negatives_pool


def deterministic_sample(df: DataFrame, n: int, seed: int,
                         key_cols: list[str]) -> DataFrame:
    """A1: seeded sample-without-replacement = order by content hash, take n
    (partition-invariant analogue of pd.sample(random_state))."""
    h = F.md5(F.concat_ws("\x00", F.lit(seed), *[F.col(c) for c in key_cols]))
    return df.orderBy(h, *key_cols).limit(n)


def positional_zip_negatives(
    pool: DataFrame, n: int, seed: int, id_col: str = "conv_id"
) -> DataFrame:
    """J8 (reference script/utilities.py:137): negative pairs built by
    zipping two independently seeded samples side-by-side. Positional
    concat becomes row_number + equi-join on row number, with seeded
    content-hash ordering for determinism."""
    s1 = deterministic_sample(pool, n, seed, [id_col])
    s2 = deterministic_sample(pool, n, seed + 1, [id_col])
    w1 = Window.orderBy(F.md5(F.concat_ws("\x00", F.lit(seed), F.col(id_col))), id_col)
    w2 = Window.orderBy(F.md5(F.concat_ws("\x00", F.lit(seed + 1), F.col(id_col))), id_col)
    a = s1.select(F.col(id_col).alias("conv_id_a"), F.row_number().over(w1).alias("rn"))
    b = s2.select(F.col(id_col).alias("conv_id_b"), F.row_number().over(w2).alias("rn"))
    return (
        a.join(b, "rn")
        .filter(F.col("conv_id_a") != F.col("conv_id_b"))
        .select(
            F.least("conv_id_a", "conv_id_b").alias("conv_id_a"),
            F.greatest("conv_id_a", "conv_id_b").alias("conv_id_b"),
        )
        .dropDuplicates(PAIR_KEY)
    )


def pair_similarity(pairs: DataFrame, entities: DataFrame,
                    id_col: str = "conv_id", text_col: str = "sig_text") -> DataFrame:
    """Attach the edit-similarity ratio the difficulty sampler thresholds on
    (reference calculate_edit_distance, utilities.py:19-20; JVM levenshtein
    ratio here — same monotone scale)."""
    e = entities.select(F.col(id_col).alias("_id"), F.col(text_col).alias("_t"))
    return (
        pairs
        .join(e.withColumnRenamed("_id", "conv_id_a").withColumnRenamed("_t", "_ta"), "conv_id_a")
        .join(e.withColumnRenamed("_id", "conv_id_b").withColumnRenamed("_t", "_tb"), "conv_id_b")
        .withColumn("similarity", lev_ratio(F.col("_ta"), F.col("_tb")))
        .drop("_ta", "_tb")
    )


def difficulty_cutoffs(
    pos_sim: DataFrame, neg_sim: DataFrame, q: float = 0.2
) -> tuple[float, float]:
    """A3 (reference utilities.py:188-189): difficult positives sit below
    the q-quantile of positive similarity; difficult negatives above the
    (1-q)-quantile of negative similarity."""
    pc = pos_sim.agg(F.percentile("similarity", F.lit(q))).collect()[0][0]
    nc = neg_sim.agg(F.percentile("similarity", F.lit(1 - q))).collect()[0][0]
    return float(pc), float(nc)


def difficulty_stratified_sample(
    pos_pairs: DataFrame,
    neg_pairs: DataFrame,
    entities: DataFrame,
    n_pos: int,
    n_neg: int,
    difficult_frac: float = 0.2,
    seed: int = 42,
    batch: int = 200,
    max_iters: int = 20,
) -> tuple[DataFrame, DataFrame]:
    """A4 (reference utilities.py:199-268): driver loop — sample a batch,
    score similarity, keep the difficult tail past the quantile cutoffs,
    remove sampled pairs from the pool, iterate until difficult_frac*n
    difficult pairs are collected (or max_iters), then top up randomly.

    Each iteration is one Spark job chain (sample -> join similarity ->
    filter -> anti-join removal); results accumulate via unionByName with
    localCheckpoint to keep the plan flat.
    """
    spark = pos_pairs.sparkSession
    pos_scored = pair_similarity(pos_pairs, entities).localCheckpoint(eager=True)
    neg_scored = pair_similarity(neg_pairs, entities).localCheckpoint(eager=True)
    pos_cut, neg_cut = difficulty_cutoffs(pos_scored, neg_scored)

    want_pos_hard = int(n_pos * difficult_frac)
    want_neg_hard = int(n_neg * difficult_frac)
    schema = pos_scored.select(*PAIR_KEY, "similarity").schema
    hard_pos = spark.createDataFrame([], schema)
    hard_neg = spark.createDataFrame([], schema)
    pool_pos, pool_neg = pos_scored, neg_scored

    for it in range(max_iters):
        need_pos = want_pos_hard - hard_pos.count()
        need_neg = want_neg_hard - hard_neg.count()
        if need_pos <= 0 and need_neg <= 0:
            break
        if need_pos > 0:
            sp = deterministic_sample(pool_pos, batch, seed + it, PAIR_KEY)
            keep = sp.filter(F.col("similarity") <= pos_cut).select(*PAIR_KEY, "similarity")
            hard_pos = hard_pos.unionByName(keep.limit(need_pos)).localCheckpoint(eager=True)
            pool_pos = pool_pos.join(sp.select(*PAIR_KEY), PAIR_KEY, "left_anti") \
                               .localCheckpoint(eager=True)
        if need_neg > 0:
            sn = deterministic_sample(pool_neg, batch, seed + it, PAIR_KEY)
            keep = sn.filter(F.col("similarity") >= neg_cut).select(*PAIR_KEY, "similarity")
            hard_neg = hard_neg.unionByName(keep.limit(need_neg)).localCheckpoint(eager=True)
            pool_neg = pool_neg.join(sn.select(*PAIR_KEY), PAIR_KEY, "left_anti") \
                               .localCheckpoint(eager=True)

    # top up from the ORIGINAL pair set minus the hard selection — the loop
    # may have drained the sampling pool entirely
    fill_pos = deterministic_sample(
        pos_scored.join(hard_pos.select(*PAIR_KEY), PAIR_KEY, "left_anti"),
        n_pos - hard_pos.count(), seed + 777, PAIR_KEY,
    ).select(*PAIR_KEY, "similarity")
    fill_neg = deterministic_sample(
        neg_scored.join(hard_neg.select(*PAIR_KEY), PAIR_KEY, "left_anti"),
        n_neg - hard_neg.count(), seed + 778, PAIR_KEY,
    ).select(*PAIR_KEY, "similarity")
    return (
        hard_pos.unionByName(fill_pos).withColumn("y", F.lit(1)),
        hard_neg.unionByName(fill_neg).withColumn("y", F.lit(0)),
    )


def train_valid_split(
    pairs: DataFrame, prop_train: float = 0.8, seed: int = 42
) -> tuple[DataFrame, DataFrame]:
    """A5 (reference utilities.py:147-156): deterministic split by content
    hash modulo — each pair lands in train iff
    pmod(xxhash64(keys, seed), 1e6) < prop_train*1e6.

    This is a NARROW operation (no shuffle, no global sort): the earlier
    row_number-over-global-window form funneled the whole pair table
    through one task. Split sizes are binomial-approximate rather than
    exactly ``floor(n*prop)`` — the standard contract at cluster scale;
    membership is a pure function of (content, seed), invariant to
    partitioning and repeated runs."""
    h = F.pmod(
        F.xxhash64(*[F.col(c) for c in PAIR_KEY], F.lit(seed)), F.lit(1_000_000)
    )
    cut = int(prop_train * 1_000_000)
    train = pairs.filter(h < cut)
    valid = pairs.filter(h >= cut)
    return train, valid
