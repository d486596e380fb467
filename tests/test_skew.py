"""Skew machinery (SURVEY.md §7 risk 3, north rule): salted pair join ==
unsalted pair join, with per-task work actually spread; caps drop mega
blocks visibly; adversarial hot-block fixture."""

import pyspark.sql.functions as F

from neural_entity_matching_spark.operators.blocking import (
    pairs_from_block_keys,
    salted_pairs_from_block_keys,
)


def _hot_keys(spark, n_hot=120, n_normal=300):
    """Adversarial fixture: one mega block (n_hot members) + normal blocks."""
    hot = spark.range(n_hot).select(
        F.concat(F.lit("h"), F.col("id")).alias("conv_id"),
        F.lit("HOT").alias("block_key"),
    )
    normal = spark.range(n_normal).select(
        F.concat(F.lit("n"), F.col("id")).alias("conv_id"),
        F.concat(F.lit("blk"), (F.col("id") % 100)).alias("block_key"),
    )
    return hot.unionByName(normal)


def test_salted_equals_unsalted(spark):
    keys = _hot_keys(spark)
    plain, s1 = pairs_from_block_keys(keys, block_cap=1000)
    salted, s2 = salted_pairs_from_block_keys(keys, block_cap=1000, salt=8)
    p = {(r["conv_id_a"], r["conv_id_b"]) for r in plain.collect()}
    q = {(r["conv_id_a"], r["conv_id_b"]) for r in salted.collect()}
    assert p == q
    assert len(p) == 120 * 119 // 2 + 100 * 3  # hot pairs + C(3,2) per normal blk


def test_salting_spreads_join_work(spark):
    """The pre-dedup salted join must not funnel the hot block through a
    single partition: max per-partition row share drops materially."""
    keys = _hot_keys(spark, n_hot=200, n_normal=100)

    def max_partition_share(df):
        rows = (
            df.groupBy(F.spark_partition_id().alias("p"))
            .count()
            .agg(F.max("count").alias("mx"), F.sum("count").alias("tot"))
            .collect()[0]
        )
        return rows["mx"] / rows["tot"]

    def joined(salt):
        eligible = keys  # no cap here; isolate the join shape
        if salt is None:
            a = eligible.select("block_key", F.col("conv_id").alias("conv_id_a"))
            b = eligible.select("block_key", F.col("conv_id").alias("conv_id_b"))
            j = a.join(b, "block_key").filter(F.col("conv_id_a") < F.col("conv_id_b"))
        else:
            a = eligible.select(
                "block_key", F.col("conv_id").alias("conv_id_a"),
                F.pmod(F.xxhash64("conv_id"), F.lit(salt)).alias("salt"),
            )
            b = eligible.select(
                "block_key", F.col("conv_id").alias("conv_id_b"),
                F.explode(F.sequence(F.lit(0), F.lit(salt - 1))).alias("salt"),
            )
            j = a.join(b, ["block_key", "salt"]).filter(
                F.col("conv_id_a") < F.col("conv_id_b")
            )
        return j.select("conv_id_a", "conv_id_b")

    # observe the raw hash layout: no AQE rebalancing, no broadcast join
    # (at cluster scale both sides are far beyond broadcast range)
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    old_thresh = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        share_plain = max_partition_share(joined(None))
        share_salted = max_partition_share(joined(8))
    finally:
        spark.conf.set("spark.sql.adaptive.enabled", "true")
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old_thresh)
    assert share_salted < share_plain * 0.5, (share_plain, share_salted)


def test_cap_drops_mega_block_visibly(spark):
    keys = _hot_keys(spark)
    pairs, stats = pairs_from_block_keys(keys, block_cap=50)
    assert stats.oversized_blocks == 1
    assert stats.dropped_memberships == 120
    got = pairs.count()
    assert got == 100 * 3  # only the normal blocks survive


def test_all_strategies_and_encodings_identical(spark):
    """grouped == join == salted pair sets, with and without id encoding,
    and decode_ids=False maps back exactly through stats.extra['id_mapping']."""
    from neural_entity_matching_spark.operators.blocking import (
        grouped_pairs_from_block_keys,
    )

    keys = _hot_keys(spark, n_hot=60, n_normal=200)

    def pairset(df):
        return {(r["conv_id_a"], r["conv_id_b"]) for r in df.collect()}

    j, _ = pairs_from_block_keys(keys, block_cap=80)
    g, _ = grouped_pairs_from_block_keys(keys, block_cap=80)
    s, _ = salted_pairs_from_block_keys(keys, block_cap=80, salt=4)
    raw, _ = grouped_pairs_from_block_keys(keys, block_cap=80, encode_ids=False)
    expect = pairset(j)
    assert pairset(g) == expect
    assert pairset(s) == expect
    assert pairset(raw) == expect
    assert expect  # non-trivial

    iid, st = grouped_pairs_from_block_keys(keys, block_cap=80,
                                            decode_ids=False)
    mapping = {r["iid"]: r["_id"] for r in st.extra["id_mapping"].collect()}
    decoded = {
        tuple(sorted((mapping[r["conv_id_a"]], mapping[r["conv_id_b"]])))
        for r in iid.collect()
    }
    assert decoded == expect
    st.extra["id_mapping"].unpersist()
