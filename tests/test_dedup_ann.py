"""Dedup suite + ANN operators against the driver testdata (sf0.001/sf0.01)
and against exact baselines."""

import pyspark.sql.functions as F
import pytest

from neural_entity_matching_spark.operators import ann, dedup

SF = "/root/testdata/sf0.01"


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(f"{SF}/documents.parquet").cache()


@pytest.fixture(scope="module")
def emb(spark):
    return spark.read.parquet(f"{SF}/embeddings.parquet").cache()


def test_exact_dedup_keeps_min_id(spark):
    rows = [(1, "a b  c"), (2, "A B C"), (3, "different text")]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    out = {r["keep_id"]: r["n_copies"] for r in dedup.exact_dedup(df).collect()}
    assert out == {1: 2, 3: 1}  # normalization folds case+whitespace


def test_minhash_lsh_dedup_matches_bruteforce(spark, docs):
    got, stats = dedup.minhash_lsh_dedup(docs, threshold=0.4)
    got_pairs = {(r["id_a"], r["id_b"]) for r in got.collect()}
    # brute-force oracle via the exact verify path on an all-pairs block
    brute = dedup.ngram_jaccard_dedup(
        docs.withColumn("one", F.lit(1)), block_col="one", n=5, threshold=0.4
    )
    brute_pairs = {(r["id_a"], r["id_b"]) for r in brute.collect()}
    assert got_pairs == brute_pairs
    assert len(got_pairs) == 25  # frozen dataset structure


def test_simhash_blocking_recall_for_small_hamming(spark, docs):
    """Pigeonhole guarantee: every pair with hamming <= 3 must be found."""
    pairs, _ = dedup.simhash_dedup(docs, max_hamming=3)
    found = {(r["id_a"], r["id_b"]) for r in pairs.collect()}
    # brute-force hamming over all simhash pairs
    t = dedup.simhash_table(docs).collect()
    sh = {r["id"]: r["sh"] for r in t}
    ids = sorted(sh)
    brute = set()
    for i, a in enumerate(ids):
        for b in ids[i + 1:]:
            if bin((sh[a] ^ sh[b]) & 0xFFFFFFFFFFFFFFFF).count("1") <= 3:
                brute.add((a, b))
    assert found == brute


def test_embedding_cosine_dedup_verify_exact(spark, emb):
    pairs, _ = dedup.embedding_cosine_dedup(emb, threshold=0.9, n_planes=8)
    for r in pairs.limit(5).collect():
        assert r["cos_sim"] >= 0.9


def test_brute_force_topk_self_consistency(spark, emb):
    q = emb.filter(F.col("vec_id") < 5)
    out = ann.brute_force_topk(emb, q, k=5)
    rows = out.collect()
    assert len(rows) == 25
    by_q = {}
    for r in rows:
        by_q.setdefault(r["q_id"], []).append(r)
    for q_id, rs in by_q.items():
        sims = [r["cos_sim"] for r in sorted(rs, key=lambda r: r["rank"])]
        assert sims == sorted(sims, reverse=True)
        assert all(r["nn_id"] != q_id for r in rs)


def test_lsh_topk_recall_on_clustered_vectors(spark):
    """Sign-LSH is a *high-similarity* filter: on vectors with true
    near-dups (cos ~ 0.95) recall@1 must be high. (On the driver
    embeddings the 10th neighbor sits at cos ~ 0.2 — hyperplane LSH
    correctly refuses to bucket those together; that regime belongs to
    IVF, tested below.)"""
    import numpy as np

    rng = np.random.RandomState(5)
    base = rng.standard_normal((100, 32))
    rows = []
    for i, v in enumerate(base):
        rows.append((i, [float(x) for x in v]))
        rows.append((1000 + i, [float(x) for x in v + 0.12 * rng.standard_normal(32)]))
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    q = df.filter(F.col("vec_id") >= 1000)
    approx = ann.lsh_topk(df, q, k=1, n_planes=8, n_tables=8)
    got = {r["q_id"]: r["nn_id"] for r in approx.collect()}
    hits = sum(1 for qid, nn in got.items() if nn == qid - 1000)
    assert hits / 100 >= 0.9, hits


def test_ivf_topk_recall_vs_brute(spark, emb):
    q = emb.filter(F.col("vec_id") < 20)
    brute = ann.brute_force_topk(emb, q, k=10)
    # driver embeddings are weakly clustered (10th NN at cos ~0.2), so
    # recall tracks the scanned fraction; probing 8/16 cells scans ~50%
    # of the corpus and lands at 0.735 recall — deterministic for this data
    approx = ann.ivf_topk(emb, q, k=10, n_centroids=16, n_probe=8)
    b = {(r["q_id"], r["nn_id"]) for r in brute.collect()}
    a = {(r["q_id"], r["nn_id"]) for r in approx.collect()}
    recall = len(a & b) / len(b)
    assert recall >= 0.7, recall


def test_cross_corpus_dedup_decontamination(spark):
    """Decontamination orientation + anti-join use: contaminated training
    docs identified against a held-out reference, no intra-corpus pairs."""
    from neural_entity_matching_spark.operators.dedup import cross_corpus_dedup

    train = spark.createDataFrame(
        [(1, "the quick brown fox jumps over the lazy dog tonight"),
         (2, "completely unrelated training document about spark plans"),
         (3, "the quick brown fox jumps over the lazy dog toniight"),  # near-dup of ref 10
         (4, "another clean document with its own words entirely")],
        ["doc_id", "text"],
    )
    ref = spark.createDataFrame(
        [(10, "the quick brown fox jumps over the lazy dog tonight"),
         (11, "benchmark item that matches nothing in the training set")],
        ["doc_id", "text"],
    )
    pairs, stats = cross_corpus_dedup(train, ref, threshold=0.4,
                                      num_hashes=64, bands=16, char_ngram=5)
    rows = pairs.collect()
    got = {(r["id_a"], r["id_b"]) for r in rows}
    assert got == {(1, 10), (3, 10)}
    assert all(r["jacc"] >= 0.4 for r in rows)
    assert stats.extra["n_verified"] == 2
    # the decontamination step: drop contaminated training docs
    clean = train.join(pairs.select(F.col("id_a").alias("doc_id")).distinct(),
                       "doc_id", "left_anti")
    assert {r["doc_id"] for r in clean.collect()} == {2, 4}
