"""Warm serving mode: persisted decoded postings + co-partitioned docs.

Invariants: (1) warm results are rank-identical to cold on every query
shape (exact, typo, multi-field, restricted fields); (2) a partial warm
set (budget smaller than the index) serves warm+cold unions identically;
(3) maintenance under a live warm engine drops the warm state via the
generation check (no stale postings served); (4) the warm fast path runs
ONE Spark job per query (no per-query broadcast-exchange jobs).
"""

from __future__ import annotations

import pytest

from go_search_engine_spark.build.builder import IndexBuilder
from go_search_engine_spark.config import IndexSettings
from go_search_engine_spark.corpus import generate_corpus
from go_search_engine_spark.query.engine import SearchEngine
from go_search_engine_spark.query.wand import wand_topk


def _key(rows):
    return [
        (r["doc_id"], round(r["score"], 10), r["num_typos"],
         r["number_exact_words"])
        for r in rows
    ]


@pytest.fixture(scope="module")
def warm_idx(spark, tmp_path_factory):
    wh = str(tmp_path_factory.mktemp("wh_warm"))
    s = IndexSettings(
        name="w",
        searchable_fields=["content"],
        fields_without_prefix_search=["content"],
    )
    corpus = generate_corpus(spark, 120, seed=41, words_per_doc=15)
    IndexBuilder(spark, s, wh).build(corpus, num_shards=2)
    return wh


QUERIES = [
    ("tokenizer return", dict(typo_tolerance=False)),
    ("tokenzer retrun", dict(typo_tolerance=True)),  # typos
    ("partition", dict(typo_tolerance=False)),
    ("qqqqnomatch", dict(typo_tolerance=True)),  # no hits
]


def test_warm_rank_identity_full(spark, warm_idx):
    cold = SearchEngine(spark, warm_idx, "w")
    colds = {q: cold.search(q, k=50, **kw).collect() for q, kw in QUERIES}
    eng = SearchEngine(spark, warm_idx, "w")
    info = eng.warm()
    assert info["warm_terms"] == "all" and info["docs_slim"]
    # storage telemetry (VERDICT r3 #8): a serving operator needs real
    # byte sizes to budget max_postings against executor memory
    assert info["bytes_in_memory"] > 0
    assert info["cached_partitions"] > 0
    assert 0.0 <= info["fraction_in_memory"] <= 1.0
    assert info["bytes_on_disk"] == 0  # tiny index must not spill
    for q, kw in QUERIES:
        assert _key(eng.search(q, k=50, **kw).collect()) == _key(colds[q]), q
    # wand auto mode short-circuits to the warm exhaustive plan
    rep: dict = {}
    got = wand_topk(eng, "tokenzer retrun", k=20, report=rep).collect()
    assert rep["mode"] == "warm_exhaustive"
    assert _key(got) == _key(cold.search("tokenzer retrun", k=20).collect())
    # forced pruning still exercises the block-max machinery, warm or not
    rep2: dict = {}
    forced = wand_topk(
        eng, "tokenizer return", k=20, typo_tolerance=False,
        report=rep2, prune=True,
    ).collect()
    assert rep2["mode"] == "two_phase"
    assert _key(forced) == _key(
        cold.search("tokenizer return", k=20, typo_tolerance=False).collect()
    )


def test_warm_partial_budget_unions_cold_terms(spark, warm_idx):
    cold = SearchEngine(spark, warm_idx, "w")
    eng = SearchEngine(spark, warm_idx, "w")
    # budget far below the index: only head terms get warmed
    info = eng.warm(max_postings=200)
    assert info["warm_terms"] != "all" and info["warm_terms"] >= 1
    assert eng._warm_boundary is not None and not eng._warm_all
    for q, kw in QUERIES:
        assert _key(eng.search(q, k=50, **kw).collect()) == _key(
            cold.search(q, k=50, **kw).collect()
        ), q
    # VERDICT r3 #3: the hot-set decode filter must be a semi-join
    # against the boundary-filtered term_stats, never a giant IN-list of
    # term literals in the plan
    import re

    plan = eng._warm_decoded._jdf.queryExecution().analyzed().toString()
    assert "LeftSemi" in plan
    assert not re.search(r"term#\d+ IN \(", plan)


def test_warm_partial_sql_template_one_job(spark, warm_idx):
    """Partial warm (the realistic big-index serving mode): a query whose
    candidate terms are ALL inside the warm hot-set is served by the
    cached SQL template -- ONE spark.sql call, one Spark job,
    rank-identical to cold. (Round 4 left partial warm on the
    ~30-round-trip per-query DataFrame plan-construction path.)"""
    cold = SearchEngine(spark, warm_idx, "w")
    eng = SearchEngine(spark, warm_idx, "w")
    info = eng.warm(max_postings=200)
    assert info["warm_terms"] != "all"
    assert info["sql_template"] is True
    v = eng._vocab().sort_values(["df", "term"], ascending=[False, True])
    hot = str(v["term"].iloc[0])
    assert eng._is_warm_term(hot, int(v["df"].iloc[0]))
    colds = cold.search(hot, k=20, typo_tolerance=False).collect()
    eng.search(hot, k=20, typo_tolerance=False).collect()  # compile
    sc = spark.sparkContext
    df = eng.search(hot, k=20, typo_tolerance=False)
    sc.setJobGroup("pwarm_one_job", "partial warm single-job probe")
    try:
        got = df.collect()
        ids = sc.statusTracker().getJobIdsForGroup("pwarm_one_job") or []
    finally:
        sc.setJobGroup(None, None)
    assert len(ids) == 1
    assert _key(got) == _key(colds)
    # a query touching a COLD term must keep the union path (the decode
    # UDF is not SQL-expressible) and stay correct
    tail = str(v["term"].iloc[-1])
    assert not eng._is_warm_term(tail, int(v["df"].iloc[-1]))
    q = f"{hot} {tail}"
    assert _key(eng.search(q, k=20, typo_tolerance=False).collect()) == _key(
        cold.search(q, k=20, typo_tolerance=False).collect()
    )


def test_warm_single_job_per_query(spark, warm_idx):
    eng = SearchEngine(spark, warm_idx, "w")
    eng.warm()
    eng.search("tokenizer return", k=10, typo_tolerance=False).collect()
    sc = spark.sparkContext
    df = eng.search("tokenizer return", k=10, typo_tolerance=False)
    # a dedicated job group isolates this collect from the session's other
    # jobs (getJobIdsForGroup(None) rotates out of retainedJobs mid-suite)
    sc.setJobGroup("warm_one_job", "warm single-job probe")
    try:
        df.collect()
        ids = sc.statusTracker().getJobIdsForGroup("warm_one_job") or []
    finally:
        sc.setJobGroup(None, None)
    # literal-injected candidates + co-partitioned docs join: the whole
    # query is ONE job (no broadcast-exchange side jobs)
    assert len(ids) == 1


def test_warm_dropped_on_maintenance(spark, tmp_path):
    from go_search_engine_spark.build.maintenance import IndexMaintenance

    wh = str(tmp_path)
    s = IndexSettings(
        name="wm",
        searchable_fields=["content"],
        fields_without_prefix_search=["content"],
    )
    corpus = generate_corpus(spark, 60, seed=42, words_per_doc=12)
    IndexBuilder(spark, s, wh).build(corpus, num_shards=2)
    eng = SearchEngine(spark, wh, "wm")
    eng.warm()
    before = eng.search("tokenizer", k=100, typo_tolerance=False).collect()
    victim = before[0]["documentID"]
    IndexMaintenance(spark, wh, "wm").delete_documents([victim])
    after = eng.search("tokenizer", k=100, typo_tolerance=False).collect()
    assert victim not in {r["documentID"] for r in after}
    # warm state was invalidated (not re-warmed silently)
    assert eng._warm_decoded is None and eng._docs_slim is None


def test_warm_plan_shape(spark, warm_idx):
    """The warm plan must (1) scan the persisted decoded frame (an
    InMemoryTableScan, not parquet+decode), and (2) run every
    aggregation/window of score+intersect WITHOUT an exchange (the warm
    frame's doc_id hash-partitioning satisfies all their clusterings) --
    the final executed plan's only exchanges are the single-partition
    top-k rank window's."""
    eng = SearchEngine(spark, warm_idx, "w")
    eng.warm()
    df = eng.search("tokenizer return", k=10, typo_tolerance=False)
    df.collect()
    plan = df._jdf.queryExecution().executedPlan().toString()
    final = plan.split("== Initial Plan ==")[0]
    assert "InMemoryTableScan" in final
    # an InMemoryRelation node echoes its STORED child plan (which
    # legitimately contains the decode MapInPandas and the warm
    # repartition exchange) -- the live query region is everything above
    # the first such echo
    live = final.split("InMemoryRelation")[0]
    assert "MapInPandas" not in live  # no per-query Arrow decode
    agg_region = live[live.find("TakeOrderedAndProject"):]
    assert "HashAggregate" in agg_region
    assert "Exchange hashpartitioning" not in agg_region
    assert "BroadcastExchange" not in agg_region  # literal-injected cand


def test_warm_sql_template_ntf_and_field_restriction(spark, tmp_path):
    """The warm SQL template (one spark.sql call per query) must stay
    rank-identical to the cold Column path on the branches the shared
    suite above doesn't reach: multi-field indexes, per-query field
    restriction, and no_typo_tolerance_fields (typo matches excluded in
    those fields only)."""
    wh = str(tmp_path)
    s = IndexSettings(
        name="wsql",
        searchable_fields=["path", "content"],
        fields_without_prefix_search=["path", "content"],
        no_typo_tolerance_fields=["path"],
    )
    corpus = generate_corpus(spark, 120, seed=43, words_per_doc=15)
    IndexBuilder(spark, s, wh).build(corpus, num_shards=2)
    cold = SearchEngine(spark, wh, "wsql")
    eng = SearchEngine(spark, wh, "wsql")
    cases = [
        ("tokenizer return", dict(typo_tolerance=False)),
        ("tokenzer retrun", dict(typo_tolerance=True)),  # ntf exclusion
        ("tokenizer", dict(fields=["content"])),  # restriction slot
        ("tokenizer", dict(fields=["path"])),
    ]
    colds = [cold.search(q, k=50, **kw).collect() for q, kw in cases]
    info = eng.warm()
    assert info["sql_template"] is True
    for (q, kw), want in zip(cases, colds):
        assert _key(eng.search(q, k=50, **kw).collect()) == _key(
            want
        ), (q, kw)
    # at least one case must be non-empty or the identity is vacuous
    assert any(len(c) for c in colds)
    # the template must be BIT-EXACT vs the warm DataFrame path (same
    # cached frame, same expression trees -- SQL decimal-literal
    # parsing once drifted the BM25 arithmetic ~1e-9 until the
    # constants were emitted as explicit double casts)
    tpl = eng._warm_sql
    for q, kw in cases:
        a = [tuple(r) for r in eng.search(q, k=50, **kw).collect()]
        eng._warm_sql = None
        b = [tuple(r) for r in eng.search(q, k=50, **kw).collect()]
        eng._warm_sql = tpl
        assert a == b, (q, kw)
    # a partial warm builds the template too (round-5); it serves only
    # queries whose candidates are all warm -- cold-term queries keep the
    # union path (test_warm_partial_sql_template_one_job pins both)
    eng2 = SearchEngine(spark, wh, "wsql")
    info2 = eng2.warm(max_postings=200)
    assert info2["sql_template"] is True
    assert eng2._warm_sql is not None


def test_warm_sql_views_dropped_on_rewarm_and_reload(spark, tmp_path):
    """Temp views backing the warm SQL template must not accumulate in
    the session catalog across re-warms or generation reloads."""
    from go_search_engine_spark.build.maintenance import IndexMaintenance

    wh = str(tmp_path)
    s = IndexSettings(
        name="wv",
        searchable_fields=["content"],
        fields_without_prefix_search=["content"],
    )
    corpus = generate_corpus(spark, 60, seed=44, words_per_doc=12)
    IndexBuilder(spark, s, wh).build(corpus, num_shards=2)

    def warm_views():
        return {
            t.name for t in spark.catalog.listTables()
            if t.name.startswith("gse_warm_")
        }

    base = warm_views()
    eng = SearchEngine(spark, wh, "wv")
    eng.warm()
    v1 = warm_views() - base
    assert len(v1) == 2
    eng.warm()  # re-warm replaces, never accumulates
    v2 = warm_views() - base
    assert len(v2) == 2 and v2 != v1
    # a maintenance commit reloads the engine on the next query and
    # drops the stale views with the stale warm state
    IndexMaintenance(spark, wh, "wv").delete_documents(
        [eng.search("tokenizer", k=1, typo_tolerance=False)
         .collect()[0]["documentID"]]
    )
    eng.search("tokenizer", k=1, typo_tolerance=False).collect()
    assert warm_views() - base == set()


def test_rewarm_releases_previous_warm_state(spark, warm_idx):
    """Re-warming the same generation (re-tuning the budget) must not
    leak the previous persisted frames, and a re-warm that skips the
    docs_slim branch must not keep serving the stale slim frame."""
    eng = SearchEngine(spark, warm_idx, "w")
    eng.warm()
    n_once = spark.sparkContext._jsc.getPersistentRDDs().size()
    info2 = eng.warm()  # re-warm: old decoded + docs_slim dropped first
    assert spark.sparkContext._jsc.getPersistentRDDs().size() == n_once
    assert info2["docs_slim"]
    # re-warm with the docs map disabled: the stale slim frame must go
    info3 = eng.warm(docs_map_max=0)
    assert info3["docs_slim"] is False
    assert eng._docs_slim is None
    rows = eng.search("tokenizer return", k=5, typo_tolerance=False).collect()
    assert len(rows) > 0


def test_two_engines_warm_views_isolated(spark, warm_idx, tmp_path_factory):
    """Two engines warmed on ONE SparkSession must never share temp-view
    names (round-4 review: a shared counter read-then-increment races
    under the API server's per-index job threads, and a collision
    silently serves one index's cached SQL over the other's frames).
    View names are uuid-based; both engines' cached templates must keep
    answering from their OWN index."""
    wh2 = str(tmp_path_factory.mktemp("wh_warm2"))
    s = IndexSettings(
        name="w2",
        searchable_fields=["content"],
        fields_without_prefix_search=["content"],
    )
    # a DIFFERENT corpus: results must diverge if views cross-wire
    corpus = generate_corpus(spark, 60, seed=99, words_per_doc=12)
    IndexBuilder(spark, s, wh2).build(corpus, num_shards=1)

    a = SearchEngine(spark, warm_idx, "w")
    b = SearchEngine(spark, wh2, "w2")
    cold_a = _key(a.search("tokenizer return", k=10,
                           typo_tolerance=False).collect())
    cold_b = _key(b.search("tokenizer return", k=10,
                           typo_tolerance=False).collect())
    a.warm()
    b.warm()
    assert a._warm_sql is not None and b._warm_sql is not None
    assert not (set(a._warm_sql["views"]) & set(b._warm_sql["views"]))
    assert _key(a.search("tokenizer return", k=10,
                         typo_tolerance=False).collect()) == cold_a
    assert _key(b.search("tokenizer return", k=10,
                         typo_tolerance=False).collect()) == cold_b


def test_partial_warm_budget_in_posting_rows(spark, tmp_path_factory):
    """``max_postings`` budgets POSTING ROWS (the decoded frame has one
    row per term x field x doc), not per-term df: on a multi-field index
    a term's warm cost is df x fields-present, and the materialized warm
    frame must respect the budget (round-4 review: budgeting by df alone
    overshot by up to the searchable-field count)."""
    wh = str(tmp_path_factory.mktemp("wh_warm_mf"))
    s = IndexSettings(
        name="mf",
        searchable_fields=["title", "body"],
        fields_without_prefix_search=["title", "body"],
    )
    docs = spark.createDataFrame(
        [(f"d{i}", "alpha beta gamma", f"alpha beta delta word{i}")
         for i in range(40)],
        "documentID string, title string, body string",
    )
    IndexBuilder(spark, s, wh).build(docs, num_shards=1)
    eng = SearchEngine(spark, wh, "mf")
    info = eng.warm(max_postings=100)
    # alpha: df=40 across BOTH fields -> 80 decoded rows (fits);
    # adding beta (80 more) would blow the budget -- df-unit budgeting
    # would have warmed both (cum df 80 <= 100) and materialized 160
    assert info["warm_terms"] == 1
    assert info["warm_postings"] <= 100
    # partial warm still serves rank-identical results
    cold = SearchEngine(spark, wh, "mf")
    q = "alpha delta"
    assert _key(eng.search(q, k=10, typo_tolerance=False).collect()) == \
        _key(cold.search(q, k=10, typo_tolerance=False).collect())
