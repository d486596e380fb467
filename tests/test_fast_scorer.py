"""fast_threshold_score must make IDENTICAL match decisions to the exact
featurize+threshold path, with exact scores on every matched pair."""

import pyspark.sql.functions as F

from neural_entity_matching_spark.functions.normalize import build_signatures
from neural_entity_matching_spark.operators.blocking import lsh_block
from neural_entity_matching_spark.operators.scoring import (
    fast_threshold_score,
    featurize_pairs,
    threshold_scorer,
)

LSH = dict(num_hashes=128, bands=64, char_ngram=8, seed=42)


def test_fast_scorer_decision_equivalence(fixture_small):
    transcripts, _, _ = fixture_small
    sigs = build_signatures(transcripts).cache()
    cands, _ = lsh_block(sigs, block_cap=35, **LSH)
    cands = cands.cache()

    exact = threshold_scorer(featurize_pairs(cands, sigs), threshold=0.55).cache()
    fast = fast_threshold_score(cands, sigs, threshold=0.55).cache()

    key = ["conv_id_a", "conv_id_b"]
    e = {tuple(r[k] for k in key): (r["is_match"], r["score"]) for r in exact.collect()}
    f = {tuple(r[k] for k in key): (r["is_match"], r["score"]) for r in fast.collect()}
    assert set(e) == set(f)
    n_match = 0
    for pair, (em, es) in e.items():
        fm, fs = f[pair]
        assert em == fm, (pair, em, fm)  # decisions identical
        if em == 1:
            n_match += 1
            assert abs(es - fs) < 1e-9, (pair, es, fs)  # exact score on matches
        else:
            assert fs < 0.55  # non-match upper bound stays sub-threshold
    assert n_match > 0
