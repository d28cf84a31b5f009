"""Kill/resume: a build killed mid-way resumes from per-shard checkpoints,
skips completed shards (fingerprint-verified), and produces an index
identical to a clean one-shot build.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from go_search_engine_spark.build.builder import IndexBuilder
from go_search_engine_spark.config import IndexSettings
from go_search_engine_spark.corpus import generate_corpus


def _settings(name):
    return IndexSettings(
        name=name,
        searchable_fields=["content"],
        fields_without_prefix_search=["content"],
        block_size=32,
        salt_df_threshold=100,
        salt_buckets=2,
    )


def _snapshot(spark, builder):
    flat = spark.read.parquet(builder.path("segments"))
    docs = spark.read.parquet(builder.path("docs"))
    posts = {
        (r["doc_id"], r["field"], r["term"]): (r["tf"], bytes(r["positions"]))
        for r in flat.collect()
    }
    ids = {r["documentID"]: r["doc_id"] for r in docs.collect()}
    return posts, ids


def test_kill_and_resume(spark, tmp_path):
    corpus = generate_corpus(spark, 200, seed=11, words_per_doc=20)

    clean = IndexBuilder(spark, _settings("clean"), str(tmp_path))
    clean.build(corpus, num_shards=6)

    crashy = IndexBuilder(spark, _settings("crashy"), str(tmp_path))
    with pytest.raises(RuntimeError, match="injected failure"):
        crashy.build(corpus, num_shards=6, fail_after_shards=2)

    # resume: the 2 committed shards are skipped, the rest get built
    report = crashy.build(corpus, num_shards=6, resume=True)
    assert report.shards_skipped == 2
    assert report.shards_built == 4
    assert [c["status"] for c in report.per_shard] == ["complete"] * 4

    assert _snapshot(spark, crashy) == _snapshot(spark, clean)
    # blocks identical too (decoded content, order-insensitive)
    a = spark.read.parquet(clean.path("blocks"))
    b = spark.read.parquet(crashy.path("blocks"))
    cols = ["term", "field", "block_id", "n", "first_doc", "last_doc", "max_tf", "min_dl"]
    assert sorted(map(tuple, a.select(cols).collect())) == sorted(
        map(tuple, b.select(cols).collect())
    )


def test_resume_noop_when_complete(spark, tmp_path):
    corpus = generate_corpus(spark, 80, seed=5, words_per_doc=12)
    b = IndexBuilder(spark, _settings("noop"), str(tmp_path))
    b.build(corpus, num_shards=3)
    report = b.build(corpus, num_shards=3, resume=True)
    assert report.shards_built == 0
    assert report.shards_skipped == 3


def test_changed_input_invalidates_fingerprint(spark, tmp_path):
    b = IndexBuilder(spark, _settings("fp"), str(tmp_path))
    b.build(generate_corpus(spark, 60, seed=1, words_per_doc=10), num_shards=2)
    # different corpus => fingerprints mismatch => shards rebuilt
    report = b.build(
        generate_corpus(spark, 60, seed=2, words_per_doc=10),
        num_shards=2,
        resume=True,
    )
    assert report.shards_built == 2
    assert report.shards_skipped == 0


def test_resume_cleans_stale_shards(spark, tmp_path):
    """A corpus shrink (or num_shards shrink) between builds must not
    leave stale segment shards feeding _finalize: doc_ids are dense
    ranks, so stale postings would corrupt df/idf/avgdl silently."""
    big = generate_corpus(spark, 200, seed=3, words_per_doc=12)
    small = big.filter(F.xxhash64("documentID") % 5 == 0)

    dirty = IndexBuilder(spark, _settings("stale"), str(tmp_path))
    dirty.build(big, num_shards=6)
    # resume onto the smaller corpus with FEWER shards: shard ids 2-5 and
    # any shard emptied by the filter are stale on disk
    dirty.build(small, num_shards=2, resume=True)

    clean = IndexBuilder(spark, _settings("stale_clean"), str(tmp_path))
    clean.build(small, num_shards=2, resume=False)

    assert _snapshot(spark, dirty) == _snapshot(spark, clean)
    import json

    with open(dirty.path("stats.json")) as f:
        d = json.load(f)
    with open(clean.path("stats.json")) as f:
        c = json.load(f)
    # generation counts finalizes, so a resumed index is legitimately at 2
    # while the fresh one is at 1; everything data-derived must match
    d.pop("generation"), c.pop("generation")
    # the committed settings copy embeds the index name, which
    # legitimately differs between the two indexes
    ds, cs = d.pop("settings"), c.pop("settings")
    ds.pop("name"), cs.pop("name")
    assert ds == cs
    assert d == c


def test_resume_after_live_rebuild_rebuilds_plain_layout(spark, tmp_path):
    """Round-4 fix: a live_rebuild commits the index under a
    tables_gen=R root but leaves its checkpoints in base/_checkpoints.
    A later resume build previously skipped every shard against those
    checkpoints and re-finalized the grace-retained old base/segments --
    silent corruption. Resume stages in the plain layout (a mid-resume
    crash must never touch the committed root live readers are on), so
    the layout tag on each checkpoint must force a full rebuild there,
    then flip the pointer back at finalize with identical results."""
    from go_search_engine_spark.build.builder import load_stats
    from go_search_engine_spark.query.engine import SearchEngine

    corpus = generate_corpus(spark, 120, seed=21, words_per_doc=12)
    wh = str(tmp_path)
    IndexBuilder(spark, _settings("lrz"), wh).build(corpus, num_shards=4)

    b2 = IndexBuilder(spark, _settings("lrz"), wh)
    b2.build(corpus, num_shards=4, resume=False, live_rebuild=True)
    assert b2.tables_gen == 1

    eng = SearchEngine(spark, wh, "lrz")
    q = eng.docs.select("content").first()["content"].split()[0]
    baseline = [
        (r["documentID"], round(r["score"], 9))
        for r in SearchEngine(spark, wh, "lrz").search(
            q, k=10, typo_tolerance=False
        ).collect()
    ]

    b3 = IndexBuilder(spark, _settings("lrz"), wh)
    rep = b3.build(corpus, num_shards=4, resume=True)
    assert b3.tables_gen is None  # staged in the plain layout
    # the live_rebuild's checkpoints are tagged tables_gen=1: a plain
    # resume must NOT skip shards against them
    assert rep.shards_built == 4 and rep.shards_skipped == 0
    assert int(load_stats(b3.base).get("tables_gen", 0)) == 0
    got = [
        (r["documentID"], round(r["score"], 9))
        for r in SearchEngine(spark, wh, "lrz").search(
            q, k=10, typo_tolerance=False
        ).collect()
    ]
    assert got == baseline


def test_resume_ignores_orphan_live_rebuild_checkpoints(spark, tmp_path):
    """A live_rebuild that CRASHES before finalize leaves an orphan
    tables_gen root plus checkpoints tagged for it. A resume build runs
    under the still-committed plain layout and must rebuild every shard
    rather than skip against the orphan's checkpoints."""
    from go_search_engine_spark.build.builder import load_stats
    from go_search_engine_spark.query.engine import SearchEngine

    corpus = generate_corpus(spark, 120, seed=22, words_per_doc=12)
    wh = str(tmp_path)
    IndexBuilder(spark, _settings("lro"), wh).build(corpus, num_shards=4)

    b2 = IndexBuilder(spark, _settings("lro"), wh)
    with pytest.raises(RuntimeError, match="injected failure"):
        b2.build(
            corpus, num_shards=4, resume=False, live_rebuild=True,
            fail_after_shards=2,
        )
    # commit point never flipped: index still serves the plain layout
    assert int(load_stats(f"{wh}/lro").get("tables_gen", 0)) == 0

    b3 = IndexBuilder(spark, _settings("lro"), wh)
    rep = b3.build(corpus, num_shards=4, resume=True)
    assert b3.tables_gen is None
    assert rep.shards_built == 4 and rep.shards_skipped == 0
    eng = SearchEngine(spark, wh, "lro")
    q = eng.docs.select("content").first()["content"].split()[0]
    assert eng.search(q, k=5, typo_tolerance=False).count() > 0


def test_content_change_same_ids_invalidates_fingerprint(spark, tmp_path):
    """Round-4 review regression: editing document CONTENT while keeping
    the same documentID set must change every touched shard's
    fingerprint -- the fingerprint hashes content_sha256, not just the
    id mapping -- so a resume build rebuilds instead of silently serving
    the stale postings and doc lengths."""
    docs_v1 = spark.createDataFrame(
        [(f"d{i}", "alpha beta gamma") for i in range(40)],
        "documentID string, content string",
    )
    b = IndexBuilder(spark, _settings("cfp"), str(tmp_path))
    b.build(docs_v1, num_shards=2)

    docs_v2 = spark.createDataFrame(
        [(f"d{i}", "delta epsilon zeta") for i in range(40)],
        "documentID string, content string",
    )
    report = b.build(docs_v2, num_shards=2, resume=True)
    assert report.shards_skipped == 0
    assert report.shards_built == 2
    terms = {
        r["term"]
        for r in spark.read.parquet(b.path("term_stats")).collect()
    }
    assert "delta" in terms and "alpha" not in terms


def test_corrupt_docs_marker_is_tolerated(spark, tmp_path):
    """A crash mid-marker-write leaves a truncated _docs_complete.json;
    the next resume build must treat it as 'docs not verifiably
    complete' and rewrite, never die on JSONDecodeError."""
    corpus = generate_corpus(spark, 40, seed=3, words_per_doc=10)
    b = IndexBuilder(spark, _settings("mk"), str(tmp_path))
    b.build(corpus, num_shards=2)
    with open(b.path("_docs_complete.json"), "w") as f:
        f.write('{"fingerprint": "trunc')  # simulated torn write
    report = b.build(corpus, num_shards=2, resume=True)
    assert report.shards_skipped == 2  # shards still verify by checkpoint
    docs = spark.read.parquet(b.path("docs"))
    assert docs.count() == 40
