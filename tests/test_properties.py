"""Pure-python property tests (hypothesis) for the similarity kernels —
no SparkSession needed, so they run in milliseconds."""

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from neural_entity_matching_spark.functions.minhash import _shingle_hashes
from neural_entity_matching_spark.functions.similarity import (
    _indel_distance,
    _jaro_winkler,
)

texts = st.text(alphabet="abcdefg hij", max_size=40)


@settings(max_examples=200, deadline=None)
@given(texts, texts)
def test_indel_symmetry_and_bounds(a, b):
    d = _indel_distance(a, b)
    assert d == _indel_distance(b, a)
    assert 0 <= d <= len(a) + len(b)
    assert (d == 0) == (a == b)
    # parity: indel distance has the same parity as len(a)+len(b)
    assert (d - (len(a) + len(b))) % 2 == 0


@settings(max_examples=200, deadline=None)
@given(texts, texts)
def test_jaro_winkler_bounds_and_symmetry(a, b):
    j = _jaro_winkler(a, b)
    assert 0.0 <= j <= 1.0 + 1e-12
    assert abs(j - _jaro_winkler(b, a)) < 1e-12
    if a == b:
        assert j == 1.0


@settings(max_examples=100, deadline=None)
@given(texts)
def test_shingles_deterministic_and_padded(t):
    a = _shingle_hashes(t, 8)
    b = _shingle_hashes(t, 8)
    assert np.array_equal(a, b)
    assert len(a) >= 1  # padding rule guarantees >= 1 shingle
    assert len(np.unique(a)) == len(a)  # already distinct


@settings(max_examples=50, deadline=None)
@given(st.text(alphabet="xyz w", min_size=0, max_size=6))
def test_short_strings_pad_like_reference(t):
    """Strings shorter than the shingle width behave as if right-padded
    with spaces (reference blocking_algorithms.py:117-119)."""
    padded = t + " " * (8 - len(t))
    assert np.array_equal(_shingle_hashes(t, 8), _shingle_hashes(padded, 8))
