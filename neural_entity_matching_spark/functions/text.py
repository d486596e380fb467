"""Reusable text-analysis column functions for training-data pipelines:
tokenization, token counting (whitespace + BPE-ish regex), quality
scoring, heuristic language ID, and document fingerprints. All pure JVM
column expressions (whole-stage codegen) — these are the library forms of
the contract queries text_quality / lang_id / token_count / dedup_exact.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

BPE_ISH = r"[a-z]+|[0-9]+|[^a-z0-9\s]"

EN_LEXICON = [
    "the", "a", "of", "and", "to", "in", "is", "for", "on", "with",
    "key", "agg", "row", "scan", "table", "value", "part", "hash",
    "join", "order", "group", "data", "query", "column", "line",
]


def normalized(col: Column) -> Column:
    return F.regexp_replace(F.lower(F.trim(col)), r"\s+", " ")


def ws_tokens(col: Column) -> Column:
    """Whitespace tokens."""
    return F.split(F.trim(col), r"\s+")


def n_ws_tokens(col: Column) -> Column:
    return F.size(ws_tokens(col))


def n_bpe_tokens(col: Column) -> Column:
    """BPE-ish piece count: alpha runs, digit runs, single other chars."""
    return F.size(F.regexp_extract_all(F.lower(col), F.lit(BPE_ISH), F.lit(0)))


def distinct_token_ratio(col: Column) -> Column:
    t = ws_tokens(normalized(col))
    return F.size(F.array_distinct(t)) / F.size(t)


def avg_token_len(col: Column) -> Column:
    n = normalized(col)
    return F.length(F.regexp_replace(n, " ", "")) / F.size(ws_tokens(n))


def quality_score(col: Column, full_credit_tokens: int = 50) -> Column:
    """Composite in [0,1]: length credit (saturating) x lexical diversity —
    the boilerplate/low-content down-weighting heuristic."""
    n = n_ws_tokens(normalized(col))
    return F.least(F.lit(1.0), n / float(full_credit_tokens)) * distinct_token_ratio(col)


def lexicon_ratio(col: Column, lexicon: list[str] | None = None) -> Column:
    lex = F.array(*[F.lit(w) for w in (lexicon or EN_LEXICON)])
    toks = F.array_distinct(ws_tokens(F.lower(F.trim(col))))
    return F.size(F.array_intersect(toks, lex)) / F.size(toks)


def lang_id(col: Column, lexicon: list[str] | None = None,
            threshold: float = 0.3) -> Column:
    """Heuristic language ID: lexicon hit-ratio thresholding ('en'/'unk').
    Swap the lexicon per language for a multi-language classifier; at scale
    this is one array_intersect per row, no Python."""
    return F.when(lexicon_ratio(col, lexicon) >= threshold, F.lit("en")).otherwise(
        F.lit("unk")
    )


def content_fingerprint(col: Column) -> Column:
    """Stable document fingerprint over normalized text (exact-dedup key)."""
    return F.md5(normalized(col))


def rolling_fingerprints(col: Column, k_tokens: int = 8) -> Column:
    """Array of distinct k-token shingle fingerprints (xxhash64), stride 1 —
    alignment-free chunk fingerprints for partial-overlap/containment
    detection (a shared k-token run yields a shared fingerprint no matter
    where it sits in either document). Fixed-stride char windows would miss
    shifted copies."""
    toks = ws_tokens(normalized(col))
    return F.array_distinct(
        F.transform(
            F.sequence(F.lit(1), F.greatest(F.size(toks) - (k_tokens - 1), F.lit(1))),
            lambda i: F.xxhash64(F.concat_ws(" ", F.slice(toks, i, k_tokens))),
        )
    )
