"""Dataset-construction parity (reference EP1): pos/neg generation,
positional-zip negatives, quantile cutoffs, iterative difficulty sampler,
deterministic splits."""

import pyspark.sql.functions as F
import pytest

from neural_entity_matching_spark.functions.normalize import build_signatures
from neural_entity_matching_spark.operators import sampling


@pytest.fixture(scope="module")
def prepared(fixture_small):
    transcripts, labeled, _ = fixture_small
    sigs = build_signatures(transcripts).cache()
    pos, neg_pool = sampling.generate_pos_neg_matches(labeled, sigs)
    return sigs, labeled, pos.cache(), neg_pool.cache()


def test_pos_neg_generation(prepared):
    sigs, labeled, pos, neg_pool = prepared
    assert pos.count() == labeled.count()
    # no entity in the negative pool participates in any positive
    ids_in_pos = {r[0] for r in labeled.select("conv_id_a").collect()} | {
        r[0] for r in labeled.select("conv_id_b").collect()
    }
    pool_ids = {r[0] for r in neg_pool.select("conv_id").collect()}
    assert not (pool_ids & ids_in_pos)


def test_positional_zip_negatives_deterministic(prepared):
    _, labeled, _, neg_pool = prepared
    n1 = sampling.positional_zip_negatives(neg_pool, 50, seed=9)
    n2 = sampling.positional_zip_negatives(neg_pool.repartition(7), 50, seed=9)
    a = {(r["conv_id_a"], r["conv_id_b"]) for r in n1.collect()}
    b = {(r["conv_id_a"], r["conv_id_b"]) for r in n2.collect()}
    assert a == b and len(a) >= 45
    # negatives never collide with labeled positives
    lab = {(r["conv_id_a"], r["conv_id_b"]) for r in labeled.collect()}
    assert not (a & lab)


def test_difficulty_sampler_prefers_hard_examples(prepared, spark):
    sigs, labeled, pos, neg_pool = prepared
    neg_pairs = sampling.positional_zip_negatives(neg_pool, 300, seed=4)
    pos_pairs = labeled.select("conv_id_a", "conv_id_b")

    pos_s = sampling.pair_similarity(pos_pairs, sigs)
    neg_s = sampling.pair_similarity(neg_pairs, sigs)
    pos_cut, neg_cut = sampling.difficulty_cutoffs(pos_s, neg_s, q=0.2)
    assert pos_cut > neg_cut  # positives are globally more similar

    hard_pos, hard_neg = sampling.difficulty_stratified_sample(
        pos_pairs, neg_pairs, sigs, n_pos=100, n_neg=100,
        difficult_frac=0.3, seed=1, batch=150, max_iters=10,
    )
    hp, hn = hard_pos.cache(), hard_neg.cache()
    assert hp.count() == 100 and hn.count() == 100
    assert hp.select("y").distinct().collect()[0][0] == 1
    # the difficult tail is present: >=20 positives at/below the cutoff,
    # >=20 negatives at/above
    assert hp.filter(F.col("similarity") <= pos_cut).count() >= 20
    assert hn.filter(F.col("similarity") >= neg_cut).count() >= 20


def test_train_valid_split_deterministic(prepared):
    _, labeled, _, _ = prepared
    t1, v1 = sampling.train_valid_split(labeled, prop_train=0.8, seed=3)
    t2, v2 = sampling.train_valid_split(labeled.repartition(5), prop_train=0.8, seed=3)
    # membership is a pure function of content+seed: partition-invariant
    s1 = {tuple(r) for r in t1.select("conv_id_a", "conv_id_b").collect()}
    s2 = {tuple(r) for r in t2.select("conv_id_a", "conv_id_b").collect()}
    assert s1 == s2 and t1.count() == t2.count()
    # exact partition of the input (no row lost or duplicated)
    total = labeled.count()
    assert v1.count() == total - t1.count()
    # binomial-approximate proportions (hash-modulo split, no global sort)
    assert abs(t1.count() / total - 0.8) < 0.1
    # different seed -> different split
    t3, _ = sampling.train_valid_split(labeled, prop_train=0.8, seed=4)
    s3 = {tuple(r) for r in t3.select("conv_id_a", "conv_id_b").collect()}
    assert s1 != s3
