"""Damerau-Levenshtein tests; distance cases mirror the reference's
/root/reference/internal/typoutil/levenshtein_test.go semantics (OSA
variant with transpositions, max-distance clipping), plus a
hypothesis-backed equivalence check between the scalar and the
numpy-batched implementation.
"""

from __future__ import annotations

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from go_search_engine_spark.functions.edit_distance import (
    damerau_levenshtein,
    damerau_levenshtein_batch,
)

CASES = [
    ("", "", 0),
    ("abc", "", 3),
    ("", "abc", 3),
    ("abc", "abc", 0),
    ("kitten", "sitting", 3),
    ("flaw", "lawn", 2),
    ("ca", "abc", 3),  # OSA: no substring edit after transposition
    ("abcdef", "abcdfe", 1),  # adjacent transposition
    ("tokenizer", "tokenzier", 1),  # transposition
    ("tokenizer", "tokenizr", 1),  # deletion
    ("search", "serach", 1),  # transposition
    ("abc", "cab", 2),
]


@pytest.mark.parametrize("a,b,want", CASES)
def test_scalar(a, b, want):
    assert damerau_levenshtein(a, b, 10) == want


@pytest.mark.parametrize("a,b,want", CASES)
def test_batch_matches_scalar(a, b, want):
    got = damerau_levenshtein_batch(a, np.array([b], dtype=object), 10)
    assert got[0] == want


def test_max_distance_clipping():
    assert damerau_levenshtein("abcdefgh", "zzzzzzzz", 2) == 3
    got = damerau_levenshtein_batch(
        "abcdefgh", np.array(["zzzzzzzz", "abcdefgh", "abcdefgx"], dtype=object), 2
    )
    assert got.tolist() == [3, 0, 1]


def test_length_prefilter():
    # |len diff| > max ⇒ max+1 without running the DP
    got = damerau_levenshtein_batch(
        "abc", np.array(["abcdefgh", "ab"], dtype=object), 2
    )
    assert got.tolist() == [3, 1]


@settings(max_examples=300, deadline=None)
@given(
    st.text(alphabet="abcd", max_size=8),
    st.lists(st.text(alphabet="abcd", max_size=8), min_size=1, max_size=20),
    st.integers(min_value=0, max_value=3),
)
def test_batch_equivalence(query, terms, maxd):
    arr = np.array(terms, dtype=object)
    got = damerau_levenshtein_batch(query, arr, maxd)
    want = [min(damerau_levenshtein(query, t, maxd), maxd + 1) for t in terms]
    assert got.tolist() == want
