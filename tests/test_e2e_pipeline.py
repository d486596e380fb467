"""Slice-0 end-to-end golden run (SURVEY.md §7 order-of-construction 1):
signatures -> MinHash-LSH blocking -> JVM features -> threshold scorer ->
pairwise F1 >= 0.99 at the fixed blocking keys -> clusters == union-find
oracle."""

import pyspark.sql.functions as F

from neural_entity_matching_spark.functions.normalize import build_signatures
from neural_entity_matching_spark.operators.blocking import lsh_block
from neural_entity_matching_spark.operators.clustering import (
    connected_components,
    union_find_oracle,
)
from neural_entity_matching_spark.operators.evaluation import (
    blocking_recall,
    pairwise_f1,
    pruning_rate,
)
from neural_entity_matching_spark.operators.scoring import (
    featurize_pairs,
    threshold_scorer,
)

# Frozen blocking params (FIXTURES.md §4): r = num_hashes/bands = 2 sits on
# the LSH S-curve where p(true-pair s>=0.29) >= 0.997 and p(negative
# s~0.01) < 0.01 — calibrated against the 1-(1-s^r)^b oracle
# (reference script/utilities.py:525).
LSH = dict(num_hashes=128, bands=64, char_ngram=8, seed=42)
BLOCK_CAP = 35  # below the 40-member identical-greeting hot block


def test_end_to_end_f1_gate(fixture_small):
    transcripts, labeled, expected = fixture_small
    sigs = build_signatures(transcripts).cache()
    n_entities = sigs.count()

    candidates, stats = lsh_block(sigs, block_cap=BLOCK_CAP, **LSH)
    candidates = candidates.cache()
    n_cand = candidates.count()

    # blocking sanity: it must prune hard AND keep nearly all true pairs
    assert pruning_rate(n_cand, n_entities) > 0.9
    recall = blocking_recall(candidates, labeled)
    assert recall >= 0.98, f"blocking recall {recall}"

    scored = threshold_scorer(featurize_pairs(candidates, sigs), threshold=0.55)
    res = pairwise_f1(scored, labeled, universe=candidates)
    assert res.f1 >= 0.99, res

    # clustering == pure-python union-find transitive closure
    matches = scored.filter(F.col("is_match") == 1)
    clusters = connected_components(
        matches.select("conv_id_a", "conv_id_b"), vertices=sigs
    )
    got = {r["conv_id"]: r["cluster_id"] for r in clusters.collect()}
    edge_list = [
        (r["conv_id_a"], r["conv_id_b"])
        for r in matches.select("conv_id_a", "conv_id_b").collect()
    ]
    vertices = [r["conv_id"] for r in sigs.select("conv_id").collect()]
    oracle = union_find_oracle(edge_list, vertices)
    assert got == oracle


def test_hot_block_is_capped(fixture_small):
    """The greeting-only hot block (40 near-identical docs) must be visible
    in stats when the cap is below its size, and its pairs must be dropped."""
    transcripts, _, _ = fixture_small
    sigs = build_signatures(transcripts)
    _, stats = lsh_block(sigs, block_cap=10, **LSH)
    assert stats.oversized_blocks > 0
    assert stats.dropped_memberships > 0
