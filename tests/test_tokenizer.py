"""Golden tokenizer tests, transcribed from the reference's own table tests
(/root/reference/internal/tokenizer/tokenizer_test.go:8-113) -- those tests
ARE the tokenizer spec. All three implementations (pure Python, Spark
Column expr, pandas series) must agree with the spec exactly.
"""

from __future__ import annotations

import pandas as pd
import pytest
from pyspark.sql import functions as F

from go_search_engine_spark.functions.tokenizer import (
    prefix_ngrams,
    prefix_ngrams_col,
    tokenize,
    tokenize_col,
    tokenize_ngrams_col,
    tokenize_series,
    tokenize_with_prefix_ngrams,
    whitespace_word_count,
    whitespace_word_count_col,
)

# tokenizer_test.go:8-45 (TestTokenize) + :99-113 (edge cases)
TOKENIZE_CASES = [
    ("", []),
    ("hello world", ["hello", "world"]),
    ("hello, world!", ["hello", "world"]),
    ("item123 test", ["item123", "test"]),
    ("  hello world  ", ["hello", "world"]),
    ("hello   world", ["hello", "world"]),
    ("theOffice", ["the", "office"]),
    ("TheOffice", ["the", "office"]),
    ("myAPIService", ["my", "api", "service"]),
    ("HTTPRequestManager", ["http", "request", "manager"]),
    ("performHTTPRequest", ["perform", "http", "request"]),
    ("state-of-the-art", ["state", "of", "the", "art"]),
    ("my_variable_name", ["my", "variable", "name"]),
    ("HELLO WORLD", ["hello", "world"]),
    ("API_v1.0-beta!", ["api", "v1", "0", "beta"]),
    ("1Password", ["1", "password"]),
    ("!@#$%^", []),
    ("12345 67890", ["12345", "67890"]),
    ("BIGAcronymThenCamel", ["big", "acronym", "then", "camel"]),
    ("anotherCase", ["another", "case"]),
    ("word1!@#word2", ["word1", "word2"]),
    ("myAPI1Test", ["my", "api1", "test"]),
]

# tokenizer_test.go:47-67 (TestGeneratePrefixNGrams)
NGRAM_CASES = [
    ("", []),
    ("a", ["a"]),
    ("cat", ["c", "ca", "cat"]),
    ("search", ["s", "se", "sea", "sear", "searc", "search"]),
]

# tokenizer_test.go:69-97 (TestTokenizeWithPrefixNGrams)
TOKENIZE_NGRAM_CASES = [
    ("", []),
    ("cat", ["cat", "c", "ca"]),
    ("cat dog", ["cat", "c", "ca", "dog", "d", "do"]),
    ("theOffice", ["the", "t", "th", "office", "o", "of", "off", "offi", "offic"]),
    ("api-v1", ["api", "a", "ap", "v1", "v"]),
    ("test test", ["test", "t", "te", "tes"]),
    (
        "tester testing",
        ["tester", "t", "te", "tes", "test", "teste", "testing", "testi", "testin"],
    ),
    ("!@#$", []),
]


@pytest.mark.parametrize("text,want", TOKENIZE_CASES)
def test_tokenize_python(text, want):
    assert tokenize(text) == want


@pytest.mark.parametrize("token,want", NGRAM_CASES)
def test_prefix_ngrams_python(token, want):
    assert prefix_ngrams(token) == want


@pytest.mark.parametrize("text,want", TOKENIZE_NGRAM_CASES)
def test_tokenize_ngrams_python(text, want):
    assert tokenize_with_prefix_ngrams(text) == want


def test_tokenize_pandas_matches_python():
    s = pd.Series([t for t, _ in TOKENIZE_CASES])
    got = tokenize_series(s).tolist()
    assert got == [w for _, w in TOKENIZE_CASES]


def test_tokenize_spark_col_matches_python(spark):
    df = spark.createDataFrame(
        [(i, t) for i, (t, _) in enumerate(TOKENIZE_CASES)], ["i", "text"]
    )
    rows = (
        df.select("i", tokenize_col(F.col("text")).alias("toks"))
        .orderBy("i")
        .collect()
    )
    assert [r.toks for r in rows] == [w for _, w in TOKENIZE_CASES]


def test_ngrams_spark_col_matches_python(spark):
    df = spark.createDataFrame(
        [(i, t) for i, (t, _) in enumerate(NGRAM_CASES) if t], ["i", "tok"]
    )
    rows = (
        df.select("i", prefix_ngrams_col(F.col("tok")).alias("g")).orderBy("i").collect()
    )
    want = [w for t, w in NGRAM_CASES if t]
    assert [r.g for r in rows] == want


def test_tokenize_ngrams_spark_col_matches_python(spark):
    df = spark.createDataFrame(
        [(i, t) for i, (t, _) in enumerate(TOKENIZE_NGRAM_CASES)], ["i", "text"]
    )
    rows = (
        df.select("i", tokenize_ngrams_col(F.col("text")).alias("toks"))
        .orderBy("i")
        .collect()
    )
    assert [r.toks for r in rows] == [w for _, w in TOKENIZE_NGRAM_CASES]


def test_whitespace_word_count(spark):
    cases = ["", "one", "two words", "  padded   words \t tab\nnewline "]
    want = [whitespace_word_count(c) for c in cases]
    assert want == [0, 1, 2, 4]
    df = spark.createDataFrame([(i, c) for i, c in enumerate(cases)], ["i", "t"])
    rows = (
        df.select("i", whitespace_word_count_col(F.col("t")).alias("n"))
        .orderBy("i")
        .collect()
    )
    assert [r.n for r in rows] == want


def test_three_impls_agree_on_random_text(spark):
    """The pure-Python, pandas, and Spark-Column tokenizers are three
    independent transcriptions of tokenizer.go:9-78; the golden cases
    above sample the spec pointwise, this compares all three on 300
    seeded-random strings over an adversarial alphabet (case flips,
    acronym runs, digits, unicode letters, CJK, emoji, control chars,
    repeated separators) in ONE Spark job. Divergence between the
    regex-in-SQL and regex-in-Python translations is exactly the bug
    class golden cases miss."""
    import random

    rng = random.Random(4242)
    alphabet = (
        "abcdefgh" "ABCDEFGH" "0123456789" "_-. \t\n" "!@#$%^&*()[]{}+/"
        "ÜéßΣσ中文\U0001f680\x00\x1f"
    )
    texts = [
        "".join(rng.choice(alphabet) for _ in range(rng.randint(0, 40)))
        for _ in range(300)
    ]
    want = [tokenize(t) for t in texts]
    want_ng = [tokenize_with_prefix_ngrams(t) for t in texts]

    got_pd = [tokenize_series(pd.Series([t]))[0] for t in texts]
    assert got_pd == want

    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], ["i", "text"]
    )
    rows = (
        df.select(
            "i",
            tokenize_col(F.col("text")).alias("toks"),
            tokenize_ngrams_col(F.col("text")).alias("ng"),
        )
        .orderBy("i")
        .collect()
    )
    assert [list(r.toks) for r in rows] == want
    assert [list(r.ng) for r in rows] == want_ng
