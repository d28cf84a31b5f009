"""The pure-Python XXH64 must match Spark's xxhash64 bit-for-bit -- the
query engine uses it for partition pruning without a Spark job."""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from go_search_engine_spark.functions.xxhash import (
    spark_xxhash64_string,
    term_bucket,
)


def test_matches_spark(spark):
    terms = [
        "", "a", "ab", "abc", "abcd", "abcdefg", "abcdefgh",
        "tokenizer", "x" * 31, "x" * 32, "y" * 33, "z" * 100,
        "sym123Buffer", "HTTPRequestManager", "unicode-ü-é",
    ]
    df = spark.createDataFrame([(t,) for t in terms], ["t"])
    got = {
        r["t"]: r["h"]
        for r in df.select("t", F.xxhash64("t").alias("h")).collect()
    }
    for t in terms:
        assert spark_xxhash64_string(t) == got[t], t


@settings(max_examples=30, deadline=None)
@given(st.text(max_size=80))
def test_matches_spark_fuzz(spark, s):
    df = spark.createDataFrame([(s,)], ["t"])
    h = df.select(F.xxhash64("t").alias("h")).collect()[0]["h"]
    assert spark_xxhash64_string(s) == h


def test_bucket(spark):
    df = spark.createDataFrame([("hello",), ("world",)], ["t"])
    got = {
        r["t"]: r["b"]
        for r in df.select(
            "t", F.pmod(F.xxhash64("t"), F.lit(32)).cast("int").alias("b")
        ).collect()
    }
    for t, b in got.items():
        assert term_bucket(t, 32) == b
