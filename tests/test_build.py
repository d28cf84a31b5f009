"""End-to-end build correctness: flat postings match a pure-Python
reimplementation of the reference indexing loop, blocks decode back to the
flat postings exactly, doc ids are deterministic, and stats match.
"""

from __future__ import annotations

import collections

import pytest
from pyspark.sql import functions as F

from go_search_engine_spark.build.blocks import decode_block
from go_search_engine_spark.build.builder import IndexBuilder, load_stats
from go_search_engine_spark.build.ids import assign_doc_ids
from go_search_engine_spark.config import IndexSettings
from go_search_engine_spark.corpus import generate_corpus
from go_search_engine_spark.functions.tokenizer import (
    tokenize,
    tokenize_with_prefix_ngrams,
    whitespace_word_count,
)

N_DOCS = 250


@pytest.fixture(scope="module")
def built(spark, tmp_path_factory):
    wh = str(tmp_path_factory.mktemp("warehouse"))
    settings = IndexSettings(
        name="t_build",
        searchable_fields=["content", "path"],
        fields_without_prefix_search=["content"],
        salt_df_threshold=150,  # low threshold so salting actually triggers
        salt_buckets=4,
        block_size=16,  # small blocks so multi-block terms exist
    )
    corpus = generate_corpus(spark, N_DOCS, seed=7, words_per_doc=30)
    builder = IndexBuilder(spark, settings, wh)
    report = builder.build(corpus, num_shards=4)
    rows = corpus.collect()
    return spark, wh, settings, builder, report, rows


def python_postings(rows, settings):
    """Pure-Python reimplementation of the reference indexing loop
    (service.go:220-305): returns {(documentID, field, term): tf}."""
    out = {}
    for r in rows:
        for field in settings.searchable_fields:
            text = r[field] or ""
            if settings.uses_prefix(field):
                toks = tokenize_with_prefix_ngrams(text)
            else:
                toks = tokenize(text)
            for t, c in collections.Counter(toks).items():
                out[(r["documentID"], field, t)] = float(c)
    return out


def test_flat_postings_match_python(built):
    spark, wh, settings, builder, report, rows = built
    want = python_postings(rows, settings)
    docs = spark.read.parquet(builder.path("docs"))
    flat = spark.read.parquet(builder.path("segments"))
    got_rows = (
        flat.join(docs.select("doc_id", "documentID"), "doc_id")
        .select("documentID", "field", "term", "tf")
        .collect()
    )
    got = {(r["documentID"], r["field"], r["term"]): r["tf"] for r in got_rows}
    assert got == want
    assert report.n_postings == len(want)


def test_prefix_mode_tf_is_one(built):
    spark, wh, settings, builder, *_ = built
    flat = spark.read.parquet(builder.path("segments"))
    # path field is prefix-mode: reference dedup => tf == 1 everywhere
    bad = flat.filter((F.col("field") == "path") & (F.col("tf") != 1.0)).count()
    assert bad == 0


def test_doc_ids_deterministic_across_partitioning(spark):
    corpus = generate_corpus(spark, 120, seed=3, words_per_doc=10)
    a = assign_doc_ids(corpus, "documentID", 4).select("documentID", "doc_id")
    b = assign_doc_ids(corpus.repartition(13), "documentID", 9).select(
        "documentID", "doc_id"
    )
    da = {r["documentID"]: r["doc_id"] for r in a.collect()}
    db = {r["documentID"]: r["doc_id"] for r in b.collect()}
    assert da == db
    # dense 0..n-1, ordered by documentID
    assert sorted(da.values()) == list(range(120))
    by_rank = sorted(da, key=lambda k: da[k])
    assert by_rank == sorted(da)


def test_blocks_roundtrip_to_flat(built):
    spark, wh, settings, builder, *_ = built
    flat = spark.read.parquet(builder.path("segments"))
    blocks = spark.read.parquet(builder.path("blocks"))
    from go_search_engine_spark.functions.codec import decode_positions

    want = {
        (r["term"], r["field"], r["doc_id"]): (
            r["tf"],
            decode_positions(bytes(r["positions"]), 1)[0].astype(int).tolist(),
        )
        for r in flat.collect()
    }
    got = {}
    for row in blocks.collect():
        pdf = decode_block(row.asDict())
        for rec in pdf.itertuples():
            got[(rec.term, rec.field, int(rec.doc_id))] = (
                float(rec.tf),
                list(rec.positions),
            )
    assert got == want


def test_block_invariants(built):
    spark, wh, settings, builder, *_ = built
    blocks = spark.read.parquet(builder.path("blocks")).collect()
    assert any(b["block_id"] > 0 for b in blocks), "expected multi-block terms"
    for b in blocks:
        assert 1 <= b["n"] <= settings.block_size
        assert b["first_doc"] <= b["last_doc"]
        assert b["max_tf"] >= 1.0
        assert b["min_dl"] >= 0


def test_stats_and_salting(built):
    spark, wh, settings, builder, report, rows = built
    stats = load_stats(builder.path())
    assert stats["N"] == N_DOCS
    # avgdl: whitespace word count over searchable fields (bm25.go:109-158)
    dls = [
        sum(whitespace_word_count(r[f] or "") for f in settings.searchable_fields)
        for r in rows
    ]
    assert stats["avgdl"] == pytest.approx(sum(dls) / len(dls))
    # head terms exist (Zipf head) and got salted
    assert report.n_salted_terms > 0
    blocks = spark.read.parquet(builder.path("blocks"))
    assert blocks.filter(F.col("salt") > 0).count() > 0
    # df: distinct docs per term (bm25.go:44-57)
    want_df = collections.Counter()
    for r in rows:
        seen = set()
        for f_name in settings.searchable_fields:
            toks = (
                tokenize_with_prefix_ngrams(r[f_name] or "")
                if settings.uses_prefix(f_name)
                else tokenize(r[f_name] or "")
            )
            seen |= set(toks)
        for t in seen:
            want_df[t] += 1
    ts = {
        r["term"]: r["df"]
        for r in spark.read.parquet(builder.path("term_stats")).collect()
    }
    assert ts == dict(want_df)


def test_content_sha256(built):
    spark, wh, settings, builder, report, rows = built
    import hashlib

    docs = spark.read.parquet(builder.path("docs"))
    got = {r["documentID"]: r["content_sha256"] for r in docs.collect()}
    for r in rows:
        assert got[r["documentID"]] == hashlib.sha256(r["content"].encode()).hexdigest()


def test_store_positions_off(spark, tmp_path):
    """store_positions=False: BM25 search results identical, positional
    operators refuse loudly, the positions stream shrinks to 1 byte/row."""
    import pytest as _pytest
    from pyspark.sql import functions as F

    from go_search_engine_spark.build.builder import IndexBuilder
    from go_search_engine_spark.config import IndexSettings
    from go_search_engine_spark.corpus import generate_corpus
    from go_search_engine_spark.query.engine import SearchEngine
    from go_search_engine_spark.query.phrase import phrase_search

    corpus = generate_corpus(spark, 80, seed=5, words_per_doc=12)
    engines = {}
    for flag in (True, False):
        s = IndexSettings(
            name=f"pos_{flag}",
            searchable_fields=["content"],
            fields_without_prefix_search=["content"],
            store_positions=flag,
        )
        wh = str(tmp_path / f"wh_{flag}")
        IndexBuilder(spark, s, wh).build(corpus, num_shards=1)
        engines[flag] = SearchEngine(spark, wh, f"pos_{flag}")

    a = engines[True].search("tokenizer func", k=10).collect()
    b = engines[False].search("tokenizer func", k=10).collect()
    assert [(r["doc_id"], r["score"]) for r in a] == [
        (r["doc_id"], r["score"]) for r in b
    ]

    with _pytest.raises(ValueError, match="store_positions"):
        phrase_search(engines[False], "tokenizer func").collect()
    with _pytest.raises(ValueError, match="store_positions"):
        engines[False].highlight(
            engines[False].candidate_terms(["func"], False), ["content"]
        )

    seg_t = spark.read.parquet(str(tmp_path / "wh_True" / "pos_True" / "segments"))
    seg_f = spark.read.parquet(str(tmp_path / "wh_False" / "pos_False" / "segments"))
    sz = lambda df: df.select(
        F.sum(F.length("positions")).alias("b")
    ).collect()[0]["b"]
    n_rows = seg_f.count()
    assert sz(seg_f) == n_rows  # exactly the 1-byte empty record per row
    assert sz(seg_t) > sz(seg_f)


def test_empty_corpus_builds_valid_empty_index(spark, tmp_path):
    """A build from an empty corpus must produce a valid, queryable empty
    index (no shard job ever writes segments/, so the builder has to
    materialize the empty table itself), not PATH_NOT_FOUND in finalize."""
    from go_search_engine_spark.query.engine import SearchEngine

    wh = str(tmp_path / "wh_empty")
    settings = IndexSettings(
        name="t_empty",
        searchable_fields=["content"],
        fields_without_prefix_search=["content"],
    )
    corpus = spark.createDataFrame(
        [], "documentID string, content string"
    )
    report = IndexBuilder(spark, settings, wh).build(corpus, num_shards=4)
    assert report.n_docs == 0 and report.n_postings == 0
    stats = load_stats(f"{wh}/t_empty")
    assert stats["N"] == 0 and stats["max_doc_id"] == -1
    eng = SearchEngine(spark, wh, "t_empty")
    assert eng.search("anything").count() == 0


def test_rebuild_existing_index_from_empty_corpus(spark, tmp_path):
    """Rebuilding an EXISTING index from an empty corpus: stale-shard
    cleanup empties segments/ but leaves the directory, so a
    directory-existence guard would skip the empty-table materialization
    and finalize would die with UNABLE_TO_INFER_SCHEMA. The guard must
    check for data files, not the directory."""
    from go_search_engine_spark.query.engine import SearchEngine

    wh = str(tmp_path / "wh_reempty")
    settings = IndexSettings(
        name="t_reempty",
        searchable_fields=["content"],
        fields_without_prefix_search=["content"],
    )
    full = spark.createDataFrame(
        [("a", "hello world"), ("b", "more text")],
        "documentID string, content string",
    )
    IndexBuilder(spark, settings, wh).build(full, num_shards=2)
    empty = spark.createDataFrame([], "documentID string, content string")
    report = IndexBuilder(spark, settings, wh).build(
        empty, num_shards=2, resume=True
    )
    assert report.n_docs == 0 and report.n_postings == 0
    stats = load_stats(f"{wh}/t_reempty")
    assert stats["N"] == 0
    eng = SearchEngine(spark, wh, "t_reempty")
    assert eng.search("hello").count() == 0


def test_build_releases_stage_caches(spark, tmp_path):
    """build() must not leave its doc-preparation frames cached after it
    returns: a long-lived server running repeated builds would pin one
    corpus copy per batch in executor storage forever."""
    sc = spark.sparkContext
    before = set(sc._jsc.getPersistentRDDs().keySet().toArray())
    wh = str(tmp_path / "wh_leak")
    settings = IndexSettings(
        name="t_leak",
        searchable_fields=["content"],
        fields_without_prefix_search=["content"],
    )
    corpus = generate_corpus(spark, 60, seed=3, words_per_doc=12)
    IndexBuilder(spark, settings, wh).build(corpus, num_shards=2)
    after = set(sc._jsc.getPersistentRDDs().keySet().toArray())
    leaked = after - before
    assert not leaked, f"build leaked cached RDDs: {leaked}"


def test_blocks_arrow_batch_conf_isolated(spark, tmp_path):
    """The block encoder's 128k-row Arrow batch override must be invisible
    to the main session: it runs on a cloned session (builder._finalize),
    because a concurrent job in the shared session (API server: one
    session, per-index build jobs on threads) reading the raised value
    would balloon KB-sized doc-flatMap rows into ~0.25 GB Arrow batches.
    A watcher thread polls the main session's conf through the whole
    build and must never observe a change."""
    import threading

    key = "spark.sql.execution.arrow.maxRecordsPerBatch"
    baseline = spark.conf.get(key)
    seen: set[str] = set()
    stop = threading.Event()

    def watch():
        while not stop.is_set():
            seen.add(spark.conf.get(key))

    t = threading.Thread(target=watch, daemon=True)
    t.start()
    try:
        wh = str(tmp_path / "wh_conf")
        settings = IndexSettings(
            name="t_conf",
            searchable_fields=["content"],
            fields_without_prefix_search=["content"],
        )
        corpus = generate_corpus(spark, 40, seed=5, words_per_doc=12)
        IndexBuilder(spark, settings, wh).build(corpus, num_shards=2)
    finally:
        stop.set()
        t.join(timeout=10)
    assert seen == {baseline}, f"main-session conf changed during build: {seen}"
    assert spark.conf.get(key) == baseline
