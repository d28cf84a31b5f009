"""Systematic fault injection over the delta commit protocol.

delta.py's contract: stats.json's atomic replace is THE commit point; a
crash anywhere before it leaves only invisible orphans (readers ignore
gen dirs above the committed delta_gen and resolve term_stats via
term_stats_gen), and a crash after it leaves a fully committed state.
The existing tests pin two handwritten windows
(test_uncommitted_delta_gen_is_invisible,
test_term_stats_crash_window_and_gc); this sweep crashes at EVERY
step -- each of the four parquet table writes, the stats.json tmp
write, the atomic replace itself, and the post-commit GC -- and asserts
after each that a fresh reader serves exactly the pre-commit (or, past
the commit point, post-commit) results, and that a clean retry of the
same batch converges to the refresh-twin state.
"""

from __future__ import annotations

import json
import os

import pytest
from pyspark.sql.readwriter import DataFrameWriter

from go_search_engine_spark.build import maintenance as mnt
from go_search_engine_spark.build.builder import IndexBuilder
from go_search_engine_spark.build.maintenance import IndexMaintenance
from go_search_engine_spark.config import IndexSettings
from go_search_engine_spark.corpus import generate_corpus
from go_search_engine_spark.query.engine import SearchEngine

QUERIES = [("tokenizer", True), ("zzzfault func", False)]


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


def _state(spark, wh, name):
    eng = SearchEngine(spark, wh, name)
    res = {}
    for q, t in QUERIES:
        res[q] = [
            (r["doc_id"], round(r["score"], 9), r["num_typos"])
            for r in eng.search(q, k=50, typo_tolerance=t).collect()
        ]
    with open(os.path.join(wh, name, "stats.json")) as f:
        st = json.load(f)
    res["_stats"] = (st["N"], st.get("delta_gen", 0), st["generation"])
    return res


class _Boom(RuntimeError):
    pass


def _inject_parquet_write(monkeypatch, fail_at: int):
    """Crash the Nth DataFrameWriter.parquet call (1-based) inside the
    commit: 1=delta postings, 2=delta docs, 3=tombstones, 4=term_stats
    for an upsert batch that has both new rows and victims."""
    real = DataFrameWriter.parquet
    calls = {"n": 0}

    def failing(self, path, **kw):
        calls["n"] += 1
        if calls["n"] == fail_at:
            raise _Boom(f"injected crash at parquet write #{fail_at}")
        return real(self, path, **kw)

    monkeypatch.setattr(DataFrameWriter, "parquet", failing)


def _inject_stats_tmp_write(monkeypatch):
    real = json.dump

    def failing(obj, fh, **kw):
        if getattr(fh, "name", "").endswith("stats.json.tmp"):
            raise _Boom("injected crash mid stats.json.tmp write")
        return real(obj, fh, **kw)

    monkeypatch.setattr(mnt.json, "dump", failing)


def _inject_replace(monkeypatch):
    def failing(src, dst):
        raise _Boom("injected crash at os.replace commit point")

    monkeypatch.setattr(mnt.os, "replace", failing)


def _inject_gc(monkeypatch):
    def failing(path, **kw):
        raise _Boom("injected crash during post-commit GC")

    monkeypatch.setattr(mnt.shutil, "rmtree", failing)


INJECTIONS = [
    ("parquet_postings", lambda mp: _inject_parquet_write(mp, 1), "pre"),
    ("parquet_docs", lambda mp: _inject_parquet_write(mp, 2), "pre"),
    ("parquet_tombstones", lambda mp: _inject_parquet_write(mp, 3), "pre"),
    ("parquet_term_stats", lambda mp: _inject_parquet_write(mp, 4), "pre"),
    ("stats_tmp_write", _inject_stats_tmp_write, "pre"),
    ("atomic_replace", _inject_replace, "pre"),
    ("post_commit_gc", _inject_gc, "post"),
]


def test_crash_at_every_commit_step_leaves_coherent_index(
    spark, tmp_path, monkeypatch
):
    wh = str(tmp_path)
    corpus = generate_corpus(spark, 50, seed=77, words_per_doc=10)
    for name in ("ref", "dlt"):
        IndexBuilder(spark, _settings(name), wh).build(corpus, num_shards=1)
    victims = sorted(
        r["documentID"] for r in corpus.select("documentID").collect()
    )

    for i, (label, inject, visible) in enumerate(INJECTIONS):
        batch = _batch(spark, [
            (victims[i], f"zzzfault updated body {i} tokenizer"),
            (f"new-{i}", f"zzzfault inserted func {i}"),
        ])
        pre = _state(spark, wh, "dlt")

        with monkeypatch.context() as mp:
            inject(mp)
            with pytest.raises(_Boom):
                IndexMaintenance(spark, wh, "dlt").upsert_documents(
                    batch, mode="delta"
                )

        mid = _state(spark, wh, "dlt")
        if visible == "pre":
            # crash BEFORE the commit point: a fresh reader must see
            # exactly the pre-crash results and stats -- orphan gen dirs
            # and tmp files are invisible
            assert mid == pre, f"{label}: pre-commit crash leaked state"
            # clean retry of the same batch must converge
            IndexMaintenance(spark, wh, "dlt").upsert_documents(
                batch, mode="delta"
            )
        else:
            # crash AFTER the commit point (GC): the commit must be
            # fully visible despite the raised error; no retry needed
            assert mid != pre, f"{label}: post-commit crash lost the commit"

        IndexMaintenance(spark, wh, "ref").upsert_documents(batch)
        got = _state(spark, wh, "dlt")
        want = _state(spark, wh, "ref")
        assert got[QUERIES[0][0]] == want[QUERIES[0][0]], label
        assert got[QUERIES[1][0]] == want[QUERIES[1][0]], label
        assert got["_stats"][0] == want["_stats"][0], label  # same N
