"""Block-max WAND pruning must be rank-identical to the exhaustive engine
(and to the oracle, transitively via test_rank_identity), and must
actually prune work on skewed queries.
"""

from __future__ import annotations

import math

import pytest

from go_search_engine_spark.build.builder import IndexBuilder
from go_search_engine_spark.config import IndexSettings
from go_search_engine_spark.corpus import generate_corpus
from go_search_engine_spark.query.engine import SearchEngine
from go_search_engine_spark.query.wand import wand_topk

QUERIES = [
    ("tokenizer", 10, True),
    ("tokenzier", 10, True),            # typo
    ("deltaEncode varintDecode", 10, True),
    ("mergeSegments buffer", 10, True),
    ("func the", 20, False),            # two head terms
    ("blockMaxWand func", 10, True),    # rare + head (the WAND sweet spot)
    ("zzzqqq", 10, True),               # no match
    ("alpha beta gamma", 10, False),
]


@pytest.fixture(scope="module")
def engine(spark, tmp_path_factory):
    wh = str(tmp_path_factory.mktemp("wh_wand"))
    settings = IndexSettings(
        name="wand",
        searchable_fields=["content"],
        fields_without_prefix_search=["content"],
        block_size=16,
        salt_df_threshold=150,
        salt_buckets=4,
    )
    corpus = generate_corpus(spark, 400, seed=33, words_per_doc=30)
    IndexBuilder(spark, settings, wh).build(corpus, num_shards=2)
    return SearchEngine(spark, wh, "wand")


@pytest.mark.parametrize("query,k,typos", QUERIES)
def test_wand_rank_identical(engine, query, k, typos):
    exhaustive = engine.search(query, k=k, typo_tolerance=typos).collect()
    pruned = wand_topk(engine, query, k=k, typo_tolerance=typos).collect()
    assert [r["doc_id"] for r in pruned] == [r["doc_id"] for r in exhaustive]
    for p, e in zip(pruned, exhaustive):
        assert math.isclose(p["score"], e["score"], rel_tol=1e-9, abs_tol=1e-12)
        assert p["num_typos"] == e["num_typos"]


def test_wand_actually_prunes(engine):
    report: dict = {}
    wand_topk(engine, "blockMaxWand func", k=5, typo_tolerance=False,
              report=report).collect()
    # rare+head query: theta must exist and phase 2 must shrink below the
    # full rare candidate set
    assert report["theta"] is not None
    assert report["n_phase2_docs"] < report["n_rare_docs"]
