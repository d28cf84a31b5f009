"""max_ngram_len deviation flag: capped edge n-grams stay rank-identical
between engine and oracle, and the default (None) is faithful."""

from __future__ import annotations

import math

from go_search_engine_spark.build.builder import IndexBuilder
from go_search_engine_spark.config import IndexSettings
from go_search_engine_spark.corpus import generate_corpus
from go_search_engine_spark.oracle.oracle import OracleIndex
from go_search_engine_spark.query.engine import SearchEngine
from pyspark.sql import functions as F


def test_ngram_cap_rank_identity(spark, tmp_path):
    settings = IndexSettings(
        name="cap",
        searchable_fields=["path"],
        max_ngram_len=4,  # prefixes of length 1..4 only
    )
    corpus = generate_corpus(spark, 100, seed=13, words_per_doc=8)
    IndexBuilder(spark, settings, str(tmp_path)).build(corpus, num_shards=2)
    engine = SearchEngine(spark, str(tmp_path), "cap")
    oracle = OracleIndex([r.asDict() for r in corpus.collect()], settings)

    # capped: a 4-char prefix matches, a 5-char prefix no longer does
    # unless it is a full token
    for q in ["src", "file", "pkg1"]:
        got = engine.search(q, k=20, typo_tolerance=False).collect()
        want = oracle.search(q, k=20, typo_tolerance=False)
        assert [r["doc_id"] for r in got] == [h.doc_id for h in want], q
        for g, w in zip(got, want):
            assert math.isclose(g["score"], w.score, rel_tol=1e-9)

    # the cap actually prunes: no pure-prefix term longer than 4 chars
    ts = spark.read.parquet(f"{tmp_path}/cap/term_stats")
    flat = spark.read.parquet(f"{tmp_path}/cap/segments")
    long_nonfull = flat.filter(
        (F.length("term") > 4) & (~F.col("is_full_word"))
    ).count()
    assert long_nonfull == 0
    assert ts.filter(F.length("term") > 4).count() > 0  # full tokens remain
