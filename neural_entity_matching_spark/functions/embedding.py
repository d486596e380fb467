"""Deterministic hash-embedding stand-in for a sentence encoder.

The north star names an *optional* sentence-embedding similarity feature
for the pairwise scorer (BASELINE.json: "optional sentence-embedding
similarity features"). Real encoders (sentence-transformers etc.) are not
installable in this sandbox, so this module provides the Spark-side
plumbing with a deterministic stand-in: each word token hashes to one of
``dim`` buckets with a ±1 sign (feature hashing / signed random
projection), the doc vector is the L2-normalized bucket-sum. Properties
that make it a faithful stand-in:

* deterministic: pure function of (text, dim, seed) — no wall clock, no
  row order, survives resume and cluster re-runs;
* batched: one Arrow batch per call, numpy inside (no per-row Spark
  Python);
* cosine-meaningful: shared-token mass dominates the dot product, so
  near-duplicate texts score high — enough to exercise the feature path,
  thresholds and ANN operators end-to-end.

Swap ``hash_embedding_udf`` for a real encoder UDF outside the sandbox;
every consumer (featurize_pairs with_embedding, operators/ann.py) only
sees an ``array<double>`` column.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, DoubleType

from neural_entity_matching_spark.functions.minhash import _splitmix_mix


def _token_hashes(text: str) -> np.ndarray:
    """uint64 hash per whitespace token (vectorized polynomial over bytes
    would need ragged handling; tokens are short so a per-token fold via
    numpy on the byte array of the WHOLE string is the pragmatic middle:
    hash = splitmix(fold of token bytes))."""
    toks = text.split()
    if not toks:
        return np.zeros(0, dtype=np.uint64)
    out = np.zeros(len(toks), dtype=np.uint64)
    base = np.uint64(1111111111111111111)
    for i, t in enumerate(toks):
        h = np.uint64(0xCBF29CE484222325)
        for byte in t.encode("utf-8"):
            h = h * base + np.uint64(byte)
        out[i] = h
    return _splitmix_mix(out)


def hash_embedding_udf(dim: int = 64, seed: int = 42):
    """Returns a pandas UDF: text -> array<double> unit vector of ``dim``."""
    mix_seed = np.uint64(seed * 2654435761 + 1)

    @F.pandas_udf(ArrayType(DoubleType()))
    def _embed(texts: pd.Series) -> pd.Series:
        out = []
        for t in texts.fillna("").to_numpy():
            hs = _splitmix_mix(_token_hashes(t) ^ mix_seed)
            v = np.zeros(dim, dtype=np.float64)
            if len(hs):
                bucket = (hs % np.uint64(dim)).astype(np.int64)
                sign = np.where((hs >> np.uint64(63)) > 0, -1.0, 1.0)
                np.add.at(v, bucket, sign)
                n = np.linalg.norm(v)
                if n > 0:
                    v /= n
            out.append(v.tolist())
        return pd.Series(out, dtype=object)

    return _embed


def embed_signatures(signatures, text_col: str = "sig_text",
                     id_col: str = "conv_id", dim: int = 64, seed: int = 42):
    """(conv_id, emb array<double>) — one embedding per signature."""
    udf = hash_embedding_udf(dim=dim, seed=seed)
    return signatures.select(F.col(id_col).alias("conv_id"),
                             udf(F.col(text_col)).alias("emb"))
