"""Two-table (ltable/rtable) blocking parity: the reference's primary mode
(reference script/blocking_algorithms.py:149-172 re-aligns lhs/rhs ids;
model_magellan_ml.py:183-193 always blocks Amazon x Google)."""

import pyspark.sql.functions as F

from neural_entity_matching_spark.functions.normalize import build_signatures
from neural_entity_matching_spark.operators.blocking import (
    lsh_block,
    token_overlap_block,
    two_table_pairs_from_block_keys,
)

LSH = dict(num_hashes=128, bands=64, char_ngram=8, seed=42)


def test_two_table_lsh_pair_shape(fixture_small):
    """lhs = base conversations, rhs = duplicate variants: every pair is
    cross-side with preserved orientation, no intra-table pairs, and the
    cross-side true dup pairs are found (recall on lhs-rhs labeled pairs)."""
    transcripts, labeled, _ = fixture_small
    sigs = build_signatures(transcripts).cache()
    lhs = sigs.filter(~F.col("conv_id").rlike("-d[0-9]$")).cache()
    rhs = sigs.filter(F.col("conv_id").rlike("-d[0-9]$")).cache()
    pairs, stats = lsh_block(lhs, block_cap=35, signatures_rhs=rhs, **LSH)
    rows = pairs.collect()
    assert rows and stats.extra["n_pairs"] == len(rows)

    lhs_ids = {r[0] for r in lhs.select("conv_id").collect()}
    rhs_ids = {r[0] for r in rhs.select("conv_id").collect()}
    for r in rows:
        assert r["conv_id_a"] in lhs_ids, r
        assert r["conv_id_b"] in rhs_ids, r

    # cross-side labeled dups (base, dup-variant) must be found: the same
    # frozen blocking keys give recall 1.0 in self-join mode, and the
    # two-table join sees the same band collisions
    cross_truth = {
        (r["conv_id_a"], r["conv_id_b"])
        for r in labeled.collect()
        if (r["conv_id_a"] in lhs_ids) != (r["conv_id_b"] in lhs_ids)
    }
    oriented = {
        (a, b) if a in lhs_ids else (b, a) for a, b in cross_truth
    }
    got = {(r["conv_id_a"], r["conv_id_b"]) for r in rows}
    assert oriented <= got


def test_two_table_generic_keys_cap_and_stats(spark):
    """Per-side cap semantics: a block oversized on ONE side drops."""
    rows_l = [(f"l{i}", "hot") for i in range(6)] + [("l9", "cold")]
    rows_r = [(f"r{i}", "hot") for i in range(3)] + [("r9", "cold")]
    kl = spark.createDataFrame(rows_l, ["conv_id", "block_key"])
    kr = spark.createDataFrame(rows_r, ["conv_id", "block_key"])
    pairs, stats = two_table_pairs_from_block_keys(kl, kr, block_cap=5)
    got = {(r["conv_id_a"], r["conv_id_b"]) for r in pairs.collect()}
    # 'hot' has 6 lhs members > cap -> dropped; 'cold' pairs survive
    assert got == {("l9", "r9")}
    assert stats.oversized_blocks == 1
    assert stats.dropped_memberships == 9
    assert stats.extra["n_pairs"] == 1


def test_two_table_token_overlap_orientation(spark):
    lhs = spark.createDataFrame(
        [("a1", "alpha beta gamma"), ("a2", "zeta eta theta")],
        ["conv_id", "sig_text"],
    )
    rhs = spark.createDataFrame(
        [("b1", "alpha beta delta"), ("b2", "iota kappa mu")],
        ["conv_id", "sig_text"],
    )
    pairs, _ = token_overlap_block(lhs, min_shared_tokens=2,
                                   signatures_rhs=rhs)
    got = {(r["conv_id_a"], r["conv_id_b"]) for r in pairs.collect()}
    assert got == {("a1", "b1")}