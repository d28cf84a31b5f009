"""Index lifecycle + document maintenance (T11-T14, O1-O5 analogues)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from go_search_engine_spark.build.builder import IndexBuilder
from go_search_engine_spark.build.delta import table_path
from go_search_engine_spark.build.maintenance import (
    IndexMaintenance,
    create_index,
    delete_index,
    list_indexes,
    rename_index,
    requires_full_reindex,
    update_settings,
)
from go_search_engine_spark.config import IndexSettings
from go_search_engine_spark.corpus import generate_corpus
from go_search_engine_spark.query.engine import SearchEngine


def _settings(name, **kw):
    return IndexSettings(
        name=name,
        searchable_fields=["content"],
        fields_without_prefix_search=["content"],
        **kw,
    )


def test_lifecycle_ops(tmp_path):
    wh = str(tmp_path)
    create_index(wh, _settings("a"))
    create_index(wh, _settings("b"))
    assert list_indexes(wh) == ["a", "b"]
    rename_index(wh, "a", "c")
    assert list_indexes(wh) == ["b", "c"]
    delete_index(wh, "b")
    assert list_indexes(wh) == ["c"]


def test_reindex_detection():
    old = _settings("x")
    same = _settings("x")
    assert not requires_full_reindex(old, same)
    core = _settings("x")
    core.min_word_size_for_1_typo = 5
    assert requires_full_reindex(old, core)
    soft = _settings("x")
    soft.ranking_criteria = []
    soft.distinct_field = "lang"
    assert not requires_full_reindex(old, soft)


def test_settings_update_metadata_only(spark, tmp_path):
    wh = str(tmp_path)
    s = _settings("m")
    corpus = generate_corpus(spark, 60, seed=4, words_per_doc=10)
    IndexBuilder(spark, s, wh).build(corpus, num_shards=2)
    s2 = _settings("m")
    s2.distinct_field = "lang"
    assert update_settings(spark, wh, s2) is False  # metadata-only commit
    from go_search_engine_spark.build.builder import load_settings

    assert load_settings(f"{wh}/m").distinct_field == "lang"


def test_delete_documents(spark, tmp_path):
    wh = str(tmp_path)
    s = _settings("del")
    corpus = generate_corpus(spark, 100, seed=6, words_per_doc=15)
    IndexBuilder(spark, s, wh).build(corpus, num_shards=2)
    eng = SearchEngine(spark, wh, "del")
    before = eng.search("tokenizer", k=100, typo_tolerance=False).collect()
    assert before
    victims = [r["documentID"] for r in before[:2]]

    n = IndexMaintenance(spark, wh, "del").delete_documents(victims)
    assert n == 2
    eng2 = SearchEngine(spark, wh, "del")
    after = eng2.search("tokenizer", k=100, typo_tolerance=False).collect()
    assert {r["documentID"] for r in after} == {
        r["documentID"] for r in before
    } - set(victims)
    # stats refreshed: N dropped by 2, no dangling postings
    assert eng2.stats["N"] == eng.stats["N"] - 2
    segs = spark.read.parquet(table_path(f"{wh}/del", "segments"))
    victims_ids = [r["doc_id"] for r in before[:2]]
    assert segs.filter(F.col("doc_id").isin(victims_ids)).count() == 0
    # empty-term cleanup: every term in term_stats still has postings
    ts = spark.read.parquet(table_path(f"{wh}/del", "term_stats"))
    assert ts.join(segs.select("term").distinct(), "term", "left_anti").count() == 0


def test_refresh_invalidates_resume_state(spark, tmp_path):
    """delete_documents rewrites docs+segments; a later resume build over
    the ORIGINAL corpus must notice (fingerprints no longer describe what
    is on disk) and re-add the deleted documents instead of skipping."""
    wh = str(tmp_path)
    s = _settings("rewind")
    corpus = generate_corpus(spark, 80, seed=8, words_per_doc=12)
    builder = IndexBuilder(spark, s, wh)
    builder.build(corpus, num_shards=2)
    eng = SearchEngine(spark, wh, "rewind")
    n0 = eng.stats["N"]

    victim = eng.search("tokenizer", k=1, typo_tolerance=False).collect()[0][
        "documentID"
    ]
    assert IndexMaintenance(spark, wh, "rewind").delete_documents([victim]) == 1

    report = builder.build(corpus, num_shards=2, resume=True)
    assert report.shards_built > 0  # NOT silently skipped
    eng2 = SearchEngine(spark, wh, "rewind")
    assert eng2.stats["N"] == n0
    assert victim in {
        r["documentID"]
        for r in eng2.search("tokenizer", k=100, typo_tolerance=False).collect()
    }


def test_upsert_documents(spark, tmp_path):
    """T13 (reference indexing/service.go:166-215): in-place update keeps
    the internal id, inserts append new ids, old postings vanish, new
    postings appear, untouched docs are never re-derived."""
    wh = str(tmp_path)
    s = _settings("ups")
    corpus = generate_corpus(spark, 60, seed=12, words_per_doc=10)
    IndexBuilder(spark, s, wh).build(corpus, num_shards=2)
    eng = SearchEngine(spark, wh, "ups")
    n0 = eng.stats["N"]
    ids_before = {
        r["documentID"]: r["doc_id"]
        for r in eng.docs.select("documentID", "doc_id").collect()
    }
    victims = sorted(ids_before)[:2]

    upd = spark.createDataFrame(
        [(v, "repo", "p", "c", "go", "zzzupserted fresh words here")
         for v in victims]
        + [("zzz-new-doc", "repo", "p", "c", "go", "zzzbrandnew content")],
        "documentID string, repo string, path string, commit string, "
        "lang string, content string",
    )
    rep = IndexMaintenance(spark, wh, "ups").upsert_documents(upd)
    assert rep == {"updated": 2, "inserted": 1}

    eng2 = SearchEngine(spark, wh, "ups")
    assert eng2.stats["N"] == n0 + 1
    ids_after = {
        r["documentID"]: r["doc_id"]
        for r in eng2.docs.select("documentID", "doc_id").collect()
    }
    # updated docs keep their internal id; untouched docs unchanged
    for k, v in ids_before.items():
        assert ids_after[k] == v
    assert ids_after["zzz-new-doc"] == max(ids_before.values()) + 1

    # new terms searchable; hit the updated docs + the new one
    got = {
        r["documentID"]
        for r in eng2.search("zzzupserted", k=100, typo_tolerance=False).collect()
    }
    assert got == set(victims)
    got_new = {
        r["documentID"]
        for r in eng2.search("zzzbrandnew", k=10, typo_tolerance=False).collect()
    }
    assert got_new == {"zzz-new-doc"}

    # old postings of the updated docs are gone
    segs = spark.read.parquet(table_path(f"{wh}/ups", "segments"))
    vic_ids = [ids_before[v] for v in victims]
    old_terms = segs.filter(F.col("doc_id").isin(vic_ids)).select(
        "term"
    ).distinct().collect()
    assert {r["term"] for r in old_terms} <= {
        "zzzupserted", "fresh", "words", "here"
    }
    # no empty terms left behind
    ts = spark.read.parquet(table_path(f"{wh}/ups", "term_stats"))
    assert ts.join(segs.select("term").distinct(), "term", "left_anti").count() == 0


def test_upsert_rejects_duplicate_ids(spark, tmp_path):
    """A batch with the same documentID twice would double postings (or
    fork insert ids); the op must refuse it loudly."""
    import pytest as _pytest

    wh = str(tmp_path)
    s = _settings("dups")
    corpus = generate_corpus(spark, 30, seed=13, words_per_doc=10)
    IndexBuilder(spark, s, wh).build(corpus, num_shards=2)
    m = IndexMaintenance(spark, wh, "dups")
    batch = spark.createDataFrame(
        [
            ("dup-doc", "r", "p", "c", "go", "one version"),
            ("dup-doc", "r", "p", "c", "go", "another version"),
        ],
        "documentID string, repo string, path string, commit string, "
        "lang string, content string",
    )
    with _pytest.raises(ValueError, match="duplicate documentIDs"):
        m.upsert_documents(batch)


def test_upsert_preserves_shard_modulus(spark, tmp_path):
    """num_shards comes from stats.json, not max(docs.shard)+1: with 8
    shards on a tiny corpus some shards are empty, and an upsert must
    still assign shard = pmod(xxhash64(id), 8) like the build did."""
    from pyspark.sql import functions as F

    wh = str(tmp_path)
    s = _settings("mod8")
    corpus = generate_corpus(spark, 12, seed=14, words_per_doc=8)
    IndexBuilder(spark, s, wh).build(corpus, num_shards=8)
    m = IndexMaintenance(spark, wh, "mod8")
    assert m._num_shards() == 8
    some_id = corpus.select("documentID").limit(1).collect()[0][0]
    m.upsert_documents(
        spark.createDataFrame(
            [(some_id, "r", "p", "c", "go", "updated text body")],
            "documentID string, repo string, path string, commit string, "
            "lang string, content string",
        )
    )
    docs = spark.read.parquet(table_path(wh + "/mod8", "docs"))
    bad = docs.filter(
        F.col("shard")
        != F.pmod(F.xxhash64("documentID"), F.lit(8)).cast("int")
    ).count()
    assert bad == 0


def test_compact_segments(spark, tmp_path):
    """Repeated upserts fragment the segments table; compaction bounds
    the file count and leaves search results byte-identical."""
    import glob
    import os

    wh = str(tmp_path)
    s = _settings("cmp")
    corpus = generate_corpus(spark, 40, seed=15, words_per_doc=10)
    IndexBuilder(spark, s, wh).build(corpus, num_shards=2)
    m = IndexMaintenance(spark, wh, "cmp")
    for i in range(3):  # each upsert rewrites segments (fragmentation)
        m.upsert_documents(
            spark.createDataFrame(
                [(f"frag-{i}", "r", "p", "c", "go", f"fragment doc {i} body")],
                "documentID string, repo string, path string, commit string, "
                "lang string, content string",
            )
        )
    eng_before = SearchEngine(spark, wh, "cmp")
    before = eng_before.search("tokenizer", k=50).collect()
    n_before = len(
        glob.glob(
            os.path.join(table_path(os.path.join(wh, "cmp"), "segments"),
                         "*.parquet")
        )
    )

    n_after = m.compact_segments(target_partitions=2)
    assert n_after <= 2 < n_before

    eng_after = SearchEngine(spark, wh, "cmp")
    after = eng_after.search("tokenizer", k=50).collect()
    assert [(r["doc_id"], r["score"]) for r in before] == [
        (r["doc_id"], r["score"]) for r in after
    ]
    assert {r["documentID"] for r in eng_after.search("fragment", k=10).collect()} \
        == {"frag-0", "frag-1", "frag-2"}


def test_upsert_into_emptied_index(spark, tmp_path):
    """Deleting every document leaves docs empty (max(doc_id) is NULL);
    a following upsert must treat the whole batch as inserts starting at
    doc_id 0 instead of crashing on the null aggregate."""
    wh = str(tmp_path)
    s = _settings("emptied")
    corpus = generate_corpus(spark, 10, seed=21, words_per_doc=8)
    IndexBuilder(spark, s, wh).build(corpus, num_shards=2)
    m = IndexMaintenance(spark, wh, "emptied")
    all_ids = [r["documentID"] for r in corpus.select("documentID").collect()]
    assert m.delete_documents(all_ids) == 10

    batch = spark.createDataFrame(
        [(f"fresh-{i}", "r", "p", "c", "go", f"fresh body {i}") for i in range(3)],
        "documentID string, repo string, path string, commit string, "
        "lang string, content string",
    )
    rep = m.upsert_documents(batch)
    assert rep == {"updated": 0, "inserted": 3}
    docs = spark.read.parquet(table_path(f"{wh}/emptied", "docs"))
    got = sorted(
        (r["documentID"], r["doc_id"])
        for r in docs.select("documentID", "doc_id").collect()
    )
    assert got == [("fresh-0", 0), ("fresh-1", 1), ("fresh-2", 2)]


def test_upsert_bulk_insert_ids_parallel(spark, tmp_path):
    """Insert-id assignment uses the builder's range-partition + offset
    composition (build/ids.py), not a global single-partition window: a
    multi-partition insert batch gets dense contiguous ids above the old
    maximum, ordered by documentID (assign_doc_ids' plan -- per-partition
    windows only -- is pinned in test_build)."""
    wh = str(tmp_path)
    s = _settings("bulkins")
    corpus = generate_corpus(spark, 20, seed=22, words_per_doc=8)
    IndexBuilder(spark, s, wh).build(corpus, num_shards=2)
    m = IndexMaintenance(spark, wh, "bulkins")
    old_max = (
        spark.read.parquet(table_path(f"{wh}/bulkins", "docs"))
        .agg(F.max("doc_id"))
        .collect()[0][0]
    )
    batch = spark.createDataFrame(
        [(f"new-{i:03d}", "r", "p", "c", "go", f"body {i}") for i in range(50)],
        "documentID string, repo string, path string, commit string, "
        "lang string, content string",
    ).repartition(8)
    rep = m.upsert_documents(batch)
    assert rep == {"updated": 0, "inserted": 50}
    docs = spark.read.parquet(table_path(f"{wh}/bulkins", "docs"))
    new_rows = sorted(
        (r["documentID"], r["doc_id"])
        for r in docs.filter(F.col("documentID").startswith("new-")).collect()
    )
    # dense, contiguous, documentID-ordered, starting at old_max + 1
    assert [d for _, d in new_rows] == list(
        range(old_max + 1, old_max + 51)
    )


def test_resume_build_after_refresh_maintenance(spark, tmp_path):
    """A refresh-mode delete commits into a tables_gen root (unpartitioned
    part files live THERE, never mixed into the plain build layout); a
    later build(resume=True) writes the plain shard= layout, flips the
    pointer back, and must re-add the deleted document (resume state was
    invalidated) with no stale root-level files in its segments dir."""
    import glob
    import os

    wh = str(tmp_path)
    s = _settings("rootclean")
    corpus = generate_corpus(spark, 40, seed=23, words_per_doc=10)
    builder = IndexBuilder(spark, s, wh)
    builder.build(corpus, num_shards=2)
    eng = SearchEngine(spark, wh, "rootclean")
    victim = eng.search("tokenizer", k=1, typo_tolerance=False).collect()[0][
        "documentID"
    ]
    IndexMaintenance(spark, wh, "rootclean").delete_documents([victim])
    base = os.path.join(wh, "rootclean")
    gen_seg = table_path(base, "segments")
    assert "tables_gen=1" in gen_seg
    assert glob.glob(os.path.join(gen_seg, "part-*"))  # refresh layout

    builder.build(corpus, num_shards=2, resume=True)
    seg_root = os.path.join(base, "segments")  # pointer back to plain
    assert table_path(base, "segments") == seg_root
    assert not glob.glob(os.path.join(seg_root, "part-*"))
    assert not glob.glob(os.path.join(seg_root, "_SUCCESS"))
    eng2 = SearchEngine(spark, wh, "rootclean")
    assert eng2.stats["N"] == 40
    got = {
        r["documentID"]
        for r in eng2.search("tokenizer", k=100, typo_tolerance=False).collect()
    }
    assert victim in got


def test_live_engine_generation_coherence(spark, tmp_path):
    """A LIVE SearchEngine (vocab cache warmed, DataFrame handles open)
    must serve post-maintenance-correct results after an upsert/delete
    rewrote the index under it: every _finalize bumps ``generation`` in
    stats.json and the engine reloads on the next query (the Spark
    analogue of the reference's typo-cache invalidation on index update,
    typo_finder.go:54-76)."""
    wh = str(tmp_path)
    s = _settings("live")
    corpus = generate_corpus(spark, 50, seed=31, words_per_doc=10)
    IndexBuilder(spark, s, wh).build(corpus, num_shards=2)
    eng = SearchEngine(spark, wh, "live")
    svc_settings_before = eng.settings
    before = eng.search("tokenizer", k=100, typo_tolerance=False).collect()
    assert before  # vocab cache + handles now warm
    assert eng._vocab_pd is not None
    gen0 = eng._generation

    victim = before[0]["documentID"]
    m = IndexMaintenance(spark, wh, "live")
    assert m.delete_documents([victim]) == 1
    m.upsert_documents(
        spark.createDataFrame(
            [("live-new", "r", "p", "c", "go", "zzzlively fresh tokenizer")],
            "documentID string, repo string, path string, commit string, "
            "lang string, content string",
        )
    )

    # SAME engine object: must see the post-maintenance truth
    after = eng.search("tokenizer", k=100, typo_tolerance=False).collect()
    got = {r["documentID"] for r in after}
    assert victim not in got
    assert "live-new" in got
    assert eng._generation != gen0
    assert eng.stats["N"] == 50  # -1 deleted, +1 inserted
    # the new vocabulary is served from the RELOADED cache
    vocab = eng._vocab()
    assert vocab is not None and "zzzlively" in set(vocab["term"])
    assert eng.settings is not svc_settings_before  # reload swapped it


def test_upsert_read_modify_write_batch(spark, tmp_path):
    """Round-4 fix: the canonical read-modify-write pattern -- read rows
    back from the visible docs table, edit a field, upsert -- carries the
    engine-derived columns (doc_id, doc_len, content_sha256, shard).
    These must be dropped and recomputed, not joined against the docs
    table's own doc_id (AMBIGUOUS_REFERENCE) or trusted stale."""
    from go_search_engine_spark.build.delta import read_visible_docs

    wh = str(tmp_path)
    s = _settings("rmw")
    corpus = generate_corpus(spark, 30, seed=31, words_per_doc=10)
    IndexBuilder(spark, s, wh).build(corpus, num_shards=2)
    base = f"{wh}/rmw"
    m = IndexMaintenance(spark, wh, "rmw")

    for mode in ("refresh", "delta"):
        docs = read_visible_docs(spark, base)
        row = docs.orderBy("documentID").limit(1).collect()[0].asDict()
        victim = row["documentID"]
        row["content"] = f"zzzrmw{mode} rewritten body"
        batch = spark.createDataFrame([row], docs.schema)
        rep = m.upsert_documents(batch, mode=mode)
        assert rep["updated"] == 1 and rep["inserted"] == 0
        eng = SearchEngine(spark, wh, "rmw")
        got = eng.search(f"zzzrmw{mode}", k=5, typo_tolerance=False)
        assert [r["documentID"] for r in got.collect()] == [victim]
        # derived columns were recomputed, not trusted from the batch
        fresh = read_visible_docs(spark, base).filter(
            F.col("documentID") == victim
        ).collect()[0]
        assert fresh["doc_len"] == 3
        assert fresh["doc_id"] == row["doc_id"]  # update keeps the id


def test_settings_commit_atomic_with_stats(spark, tmp_path):
    """The ACTIVE settings are the copy committed inside stats.json
    (atomic with the table pointers); a divergent settings.json mirror
    (what a crashed pre-fix live_rebuild could leave) must not win.
    commit_settings updates both and bumps the generation."""
    import json as _json
    import os

    from go_search_engine_spark.build.builder import (
        commit_settings,
        load_settings,
        load_stats,
    )

    wh = str(tmp_path)
    s = _settings("atom")
    corpus = generate_corpus(spark, 30, seed=9, words_per_doc=10)
    IndexBuilder(spark, s, wh).build(corpus, num_shards=2)
    base = f"{wh}/atom"

    rogue = _settings("atom")
    rogue.distinct_field = "lang"
    with open(os.path.join(base, "settings.json"), "w") as f:
        _json.dump(rogue.to_dict(), f)
    # stats.json's committed copy wins over the tampered mirror
    assert load_settings(base).distinct_field is None

    gen0 = int(load_stats(base)["generation"])
    commit_settings(base, rogue)
    assert load_settings(base).distinct_field == "lang"
    assert int(load_stats(base)["generation"]) == gen0 + 1
    with open(os.path.join(base, "settings.json")) as f:
        assert _json.load(f)["distinct_field"] == "lang"


def test_metadata_settings_update_reaches_live_engine(spark, tmp_path):
    """A non-core settings update commits through stats.json with a
    generation bump, so a LIVE engine picks it up on its next freshness
    check instead of serving cached settings forever."""
    from go_search_engine_spark.query.engine import SearchEngine

    wh = str(tmp_path)
    s = _settings("livemeta")
    corpus = generate_corpus(spark, 30, seed=10, words_per_doc=10)
    IndexBuilder(spark, s, wh).build(corpus, num_shards=2)
    eng = SearchEngine(spark, wh, "livemeta")
    assert eng.settings.distinct_field is None

    s2 = _settings("livemeta")
    s2.distinct_field = "lang"
    assert update_settings(spark, wh, s2) is False
    eng._ensure_fresh()
    assert eng.settings.distinct_field == "lang"
