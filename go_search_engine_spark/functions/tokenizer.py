"""Tokenizer: camelCase/acronym split + lowercase + non-alphanumeric split,
plus edge n-grams with order-preserving global dedup.

Semantics transcribed from the reference
(/root/reference/internal/tokenizer/tokenizer.go:9-78); the reference's own
table tests (internal/tokenizer/tokenizer_test.go) are the spec and are
mirrored in tests/test_tokenizer.py.

Three interchangeable implementations, golden-tested identical:

1. ``tokenize`` / ``tokenize_with_prefix_ngrams``: pure Python. Used by the
   rank-identity oracle and unit tests.
2. ``tokenize_col`` / ``tokenize_ngrams_col``: pure Spark Column
   expressions (regexp_replace + split + transform). Fully JVM-side /
   whole-stage-codegen -- the preferred path for ad-hoc SQL-expressible
   plans and for the DuckDB-oracle parity queries.
3. ``tokenize_series`` (pandas, Arrow-batched): used inside the build's
   document->postings flatMap (mapInPandas), where tf + positions are
   computed in the same pass (one boundary crossing, no extra shuffle).

The n-gram generator slices *bytes* in the reference (token[:i] on a Go
string). All tokens are [a-z0-9]+ after tokenization, so byte slicing ==
character slicing; we slice characters.
"""

from __future__ import annotations

import re

from pyspark.sql import Column
from pyspark.sql import functions as F

ACRONYM_PATTERN = r"([A-Z]+)([A-Z][a-z])"
CAMEL_PATTERN = r"([a-z0-9])([A-Z])"
SPLIT_PATTERN = r"[^a-zA-Z0-9]+"

_ACRONYM_RE = re.compile(ACRONYM_PATTERN)
_CAMEL_RE = re.compile(CAMEL_PATTERN)
_SPLIT_RE = re.compile(SPLIT_PATTERN)


# ---------------------------------------------------------------------------
# 1. Pure Python (the spec; used by the oracle)
# ---------------------------------------------------------------------------

def tokenize(text: str) -> list[str]:
    """Reference T1 (tokenizer.go:19-37)."""
    t = _ACRONYM_RE.sub(r"\1 \2", text)
    t = _CAMEL_RE.sub(r"\1 \2", t)
    return [s for s in _SPLIT_RE.split(t.lower()) if s]


def prefix_ngrams(token: str) -> list[str]:
    """Reference T2 (tokenizer.go:41-52): prefixes of length 1..len."""
    return [token[:i] for i in range(1, len(token) + 1)]


def tokenize_with_prefix_ngrams(text: str) -> list[str]:
    """Reference T3 (tokenizer.go:56-78): per token emit the token then its
    n-grams, with order-preserving global dedup."""
    out: list[str] = []
    seen: set[str] = set()
    for token in tokenize(text):
        if token not in seen:
            out.append(token)
            seen.add(token)
        for g in prefix_ngrams(token):
            if g not in seen:
                out.append(g)
                seen.add(g)
    return out


# ---------------------------------------------------------------------------
# 2. Spark Column expressions (JVM / codegen path)
# ---------------------------------------------------------------------------

def tokenize_col(c: Column) -> Column:
    """array<string> of tokens, identical to ``tokenize``."""
    t = F.regexp_replace(c, ACRONYM_PATTERN, r"$1 $2")
    t = F.regexp_replace(t, CAMEL_PATTERN, r"$1 $2")
    arr = F.split(F.lower(t), SPLIT_PATTERN)
    return F.filter(arr, lambda x: x != F.lit(""))


def prefix_ngrams_col(tok: Column) -> Column:
    """array<string> of prefixes length 1..len of a token column."""
    return F.transform(
        F.sequence(F.lit(1), F.length(tok)),
        lambda i: F.substring(tok, F.lit(1), i),
    )


def tokenize_ngrams_col(c: Column) -> Column:
    """array<string>, identical to ``tokenize_with_prefix_ngrams``.

    array_distinct keeps first occurrence, matching the reference's
    order-preserving dedup.
    """
    toks = tokenize_col(c)
    per_token = F.transform(
        toks, lambda t: F.concat(F.array(t), prefix_ngrams_col(t))
    )
    return F.array_distinct(F.flatten(per_token))


def whitespace_word_count_col(c: Column) -> Column:
    """BM25 document length |d|: whitespace-separated word count, matching
    the reference's getFieldLength (bm25.go:123-158) -- NOT token count.
    NULL-safe in the helper itself (a NULL column would make F.size
    return -1, silently corrupting every downstream sum/avg)."""
    arr = F.split(F.coalesce(c, F.lit("")), r"[ \t\n\r]+")
    return F.size(F.filter(arr, lambda x: x != F.lit("")))


def whitespace_word_count(text: str) -> int:
    """Python twin of ``whitespace_word_count_col`` (oracle path)."""
    return len([w for w in re.split(r"[ \t\n\r]+", text) if w])


# ---------------------------------------------------------------------------
# 3. Arrow-batched pandas path (used by the build flatMap)
# ---------------------------------------------------------------------------

def tokenize_series(s):
    """pd.Series[str] -> pd.Series[list[str]] via vectorized pandas string
    ops (the regex passes run in C over the whole Arrow batch)."""
    t = s.fillna("").str.replace(ACRONYM_PATTERN, r"\1 \2", regex=True)
    t = t.str.replace(CAMEL_PATTERN, r"\1 \2", regex=True)
    t = t.str.lower().str.split(SPLIT_PATTERN, regex=True)
    return t.map(lambda toks: [x for x in toks if x])
