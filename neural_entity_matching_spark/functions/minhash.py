"""MinHash fingerprints + LSH band keys as one vectorized pandas UDF.

Semantics follow the reference (mattilyra/lsh used at
reference script/blocking_algorithms.py:83-140): character n-gram shingles
(strings shorter than the shingle width are right-padded with spaces —
the crash the reference documents at blocking_algorithms.py:117-119,196-197),
k seeded min-hashes, fingerprint split into b bands, each band hashed to a
bucket key. Co-bucketed ids become candidate pairs.

Exact bucket parity with the reference's hash family is NOT required (the
F1 metric is "at fixed blocking keys" that we define); what IS required is
determinism and partition-invariance: all hashing is seeded numpy uint64
arithmetic, no Python ``hash()``, no wall clock, no row order dependence.

Implementation is batch-vectorized: per Arrow batch we build one flat
uint64 array of rolling-polynomial shingle hashes for every doc, expand to
(n_shingles, k) with a splitmix64-style mix per seed, and take per-doc
minima with ``np.minimum.reduceat`` — no per-row Python in the hot loop
beyond the unavoidable per-string byte encode.

Candidate probability oracle for tests: p = 1 - (1 - s^r)^b
(reference script/utilities.py:525).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, LongType

_FNV = np.uint64(1099511628211)
_POLY_BASE = np.uint64(1111111111111111111)  # odd 64-bit multiplier

# Version tag of the minhash permutation family. Band keys and
# fingerprints produced under different families are INCOMPATIBLE:
# any persisted artifact derived from them (pipeline candidate
# snapshots, incremental-ER sigs/keys stores) must carry this tag and
# refuse/rebuild on mismatch instead of silently mixing key spaces.
# History: v1 = per-seed xor+splitmix pipeline (rounds 1-3);
# v2 = odd-multiplier modular bijection over pre-mixed shingle hashes
# (round 4, kernel 6.3x).
HASH_FAMILY = "minhash-oddmul-v2"


def _splitmix_mix(x: np.ndarray) -> np.ndarray:
    """Deterministic 64-bit mixer (splitmix64 finalizer), vectorized."""
    x = x.copy()
    x ^= x >> np.uint64(30)
    x *= np.uint64(0xBF58476D1CE4E5B9)
    x ^= x >> np.uint64(27)
    x *= np.uint64(0x94D049BB133111EB)
    x ^= x >> np.uint64(31)
    return x


def _shingle_hashes(text: str, k: int) -> np.ndarray:
    """uint64 rolling polynomial hashes of all char k-grams of ``text``.

    Short strings are right-padded with spaces to width k (reference rule,
    blocking_algorithms.py:117-119) so every doc has >=1 shingle.
    """
    if len(text) < k:
        text = text + " " * (k - len(text))
    b = np.frombuffer(text.encode("utf-8"), dtype=np.uint8).astype(np.uint64)
    if len(b) < k:  # multibyte chars shrink? no — utf-8 only grows; keep guard
        b = np.pad(b, (0, k - len(b)), constant_values=32)
    win = np.lib.stride_tricks.sliding_window_view(b, k)
    powers = _POLY_BASE ** np.arange(k, dtype=np.uint64)  # wraps mod 2^64
    return np.unique(_splitmix_mix(win @ powers))


def _minhash_matrix(flat: np.ndarray, offsets: np.ndarray,
                    seeds: np.ndarray, chunk_shingles: int = 1 << 16) -> np.ndarray:
    """(n_docs, k) per-doc minima under k seeded permutations of the
    shingle-hash space.

    Permutation family: each seed is forced odd and applied as one
    modular multiplication over Z/2^64 — an exact bijection, so min-of-
    permutation semantics hold, and the minimum is decided by the
    product's high bits, which are well mixed because the shingle hashes
    are already splitmix64-finalized uniform values. Replacing the
    earlier per-seed xor+splitmix pipeline (7 vector ops) with one
    multiply + reduceat measured 6.3x on the kernel with Jaccard-
    estimation error unchanged (mean abs err 0.029 vs 0.032 at k=128,
    both at the theoretical SE — see round-4 notes).

    Two levels of memory-traffic discipline (the naive (S, k) matrix
    form is DRAM-bandwidth-bound and *anti-scales* with executor
    threads — measured 98s -> 4s on 3.3M shingles x 128 seeds):

    1. loop over the k seeds with (chunk,)-sized temporaries, never an
       (S, k) matrix;
    2. tile the flat shingle array into doc-group chunks of
       <= ``chunk_shingles`` hashes (~512 KiB) so all k per-seed passes
       over a chunk run L2-resident instead of streaming the whole
       multi-MB batch from DRAM k times. With 8+ workers per box the
       un-tiled form saturates the socket's DRAM bandwidth and stops
       scaling with cores; the tiled form scales like compute.
    """
    mult = seeds | np.uint64(1)
    k = len(seeds)
    n = len(offsets)
    mins = np.empty((n, k), dtype=np.uint64)
    if n == 0:
        return mins
    bounds = np.append(offsets, len(flat))
    doc_lens = np.diff(bounds)
    cap = max(chunk_shingles, int(doc_lens.max()))
    buf = np.empty(cap, dtype=np.uint64)
    i = 0
    while i < n:
        j = i + 1
        while j < n and bounds[j + 1] - bounds[i] <= cap:
            j += 1
        sl = flat[bounds[i]:bounds[j]]
        off = offsets[i:j] - bounds[i]
        b = buf[: len(sl)]
        for sd in range(k):
            np.multiply(sl, mult[sd], out=b)
            mins[i:j, sd] = np.minimum.reduceat(b, off)
        i = j
    return mins


def band_keys_udf(num_hashes: int = 128, bands: int = 32, char_ngram: int = 8,
                  seed: int = 42):
    """Returns a pandas UDF: text -> array<long> of ``bands`` band-bucket keys.

    k % bands == 0 enforced, as the reference enforces seeds % bands == 0
    (blocking_algorithms.py:97-98).
    """
    if num_hashes % bands != 0:
        raise ValueError(f"num_hashes must be a multiple of bands: {num_hashes} % {bands} != 0")
    rows_per_band = num_hashes // bands
    rng = np.random.RandomState(seed)
    seeds = rng.randint(1, 2**63 - 1, size=num_hashes).astype(np.uint64)

    @F.pandas_udf(ArrayType(LongType()))
    def _band_keys(texts: pd.Series) -> pd.Series:
        out = []
        vals = texts.fillna("").to_numpy()
        if len(vals) == 0:
            return pd.Series(out, dtype=object)
        shingle_arrays = [_shingle_hashes(t, char_ngram) for t in vals]
        offsets = np.zeros(len(shingle_arrays), dtype=np.int64)
        np.cumsum([len(a) for a in shingle_arrays[:-1]], out=offsets[1:])
        flat = np.concatenate(shingle_arrays)
        mins = _minhash_matrix(flat, offsets, seeds)  # (n_docs, k)
        # FNV-fold each band's slice into one bucket key, salt by band index
        mins = mins.reshape(len(vals), bands, rows_per_band)
        keys = np.full((len(vals), bands), np.uint64(0xCBF29CE484222325))
        for r in range(rows_per_band):
            keys = (keys * _FNV) ^ mins[:, :, r]
        keys ^= _splitmix_mix(np.arange(bands, dtype=np.uint64))[None, :]
        signed = keys.view(np.int64)
        for i in range(len(vals)):
            out.append(signed[i].tolist())
        return pd.Series(out, dtype=object)

    return _band_keys


def minhash_signature_udf(num_hashes: int = 128, char_ngram: int = 8,
                          seed: int = 42):
    """Raw k-minhash fingerprint (array<long>) — used by dedup operators that
    estimate Jaccard from fingerprint agreement rather than banding."""
    rng = np.random.RandomState(seed)
    seeds = rng.randint(1, 2**63 - 1, size=num_hashes).astype(np.uint64)

    @F.pandas_udf(ArrayType(LongType()))
    def _fingerprint(texts: pd.Series) -> pd.Series:
        out = []
        vals = texts.fillna("").to_numpy()
        if len(vals) == 0:
            return pd.Series(out, dtype=object)
        shingle_arrays = [_shingle_hashes(t, char_ngram) for t in vals]
        offsets = np.zeros(len(shingle_arrays), dtype=np.int64)
        np.cumsum([len(a) for a in shingle_arrays[:-1]], out=offsets[1:])
        flat = np.concatenate(shingle_arrays)
        mins = _minhash_matrix(flat, offsets, seeds).view(np.int64)
        for i in range(len(vals)):
            out.append(mins[i].tolist())
        return pd.Series(out, dtype=object)

    return _fingerprint


def candidate_probability(s: float, rows_per_band: int, bands: int) -> float:
    """Analytical LSH oracle p = 1 - (1 - s^r)^b (reference utilities.py:525)."""
    return 1.0 - (1.0 - s**rows_per_band) ** bands
