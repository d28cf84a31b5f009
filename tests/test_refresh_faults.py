"""Fault injection over the refresh-path generation protocol.

live_rebuild writes every table into a fresh immutable ``tables_gen=R/``
root and commits by the builder's atomic stats.json replace; a crash
anywhere before the replace must leave the previous generation fully
live (orphan gen dirs invisible), and a clean retry must converge. The
sweep is dynamic: it crashes the 1st, 2nd, ... Nth parquet table write
of a refresh-mode upsert until an injection point falls beyond the op's
last write (the op then succeeds, proving the whole protocol was
swept), plus the stats.json.tmp write and the atomic replace itself.
"""

from __future__ import annotations

import pytest
from pyspark.sql.readwriter import DataFrameWriter

from go_search_engine_spark.build import builder as bld
from go_search_engine_spark.build.builder import IndexBuilder
from go_search_engine_spark.build.maintenance import IndexMaintenance
from go_search_engine_spark.corpus import generate_corpus
from test_delta_faults import _Boom, _batch, _settings, _state


def _inject_parquet_write(mp, fail_at: int):
    real = DataFrameWriter.parquet
    calls = {"n": 0}

    def failing(self, path, **kw):
        calls["n"] += 1
        if calls["n"] == fail_at:
            raise _Boom(f"injected crash at parquet write #{fail_at}")
        return real(self, path, **kw)

    mp.setattr(DataFrameWriter, "parquet", failing)


def _inject_stats_tmp_write(mp):
    import json as _json

    real = _json.dump

    def failing(obj, fh, **kw):
        if getattr(fh, "name", "").endswith("stats.json.tmp"):
            raise _Boom("injected crash mid stats.json.tmp write")
        return real(obj, fh, **kw)

    mp.setattr(bld.json, "dump", failing)


def _inject_replace(mp):
    import os as _os

    real = _os.replace

    def failing(src, dst):
        if str(dst).endswith("stats.json"):
            raise _Boom("injected crash at os.replace commit point")
        return real(src, dst)

    mp.setattr(bld.os, "replace", failing)


def test_crash_at_every_refresh_step_leaves_old_generation_live(
    spark, tmp_path, monkeypatch
):
    wh = str(tmp_path)
    corpus = generate_corpus(spark, 50, seed=88, words_per_doc=10)
    for name in ("ref", "dlt"):
        IndexBuilder(spark, _settings(name), wh).build(corpus, num_shards=1)
    victims = sorted(
        r["documentID"] for r in corpus.select("documentID").collect()
    )

    # every parquet write of the op, discovered dynamically, then the
    # two stats.json windows
    injections = [
        lambda mp, n=n: _inject_parquet_write(mp, n) for n in range(1, 12)
    ]
    swept_all_writes = False
    round_no = 0
    for inject in injections:
        batch = _batch(spark, [
            (victims[round_no], f"zzzref updated body {round_no}"),
            (f"new-{round_no}", f"zzzref inserted func {round_no}"),
        ])
        pre = _state(spark, wh, "dlt")
        raised = False
        with monkeypatch.context() as mp:
            inject(mp)
            try:
                IndexMaintenance(spark, wh, "dlt").upsert_documents(batch)
            except _Boom:
                raised = True
        if not raised:
            # injection point beyond the op's last table write: the op
            # committed normally -- the sweep covered every write
            swept_all_writes = True
            IndexMaintenance(spark, wh, "ref").upsert_documents(batch)
            round_no += 1
            break
        mid = _state(spark, wh, "dlt")
        assert mid == pre, (
            f"write #{round_no + 1}: pre-commit crash leaked state"
        )
        IndexMaintenance(spark, wh, "dlt").upsert_documents(batch)
        IndexMaintenance(spark, wh, "ref").upsert_documents(batch)
        got, want = _state(spark, wh, "dlt"), _state(spark, wh, "ref")
        assert got["_stats"][0] == want["_stats"][0]
        for q in list(got):
            if q != "_stats":
                assert got[q] == want[q], f"write #{round_no + 1}"
        round_no += 1
    assert swept_all_writes, (
        "12 injection points all raised: live_rebuild makes more table "
        "writes than the sweep covers -- raise the bound"
    )

    for label, inject in (
        ("stats_tmp_write", _inject_stats_tmp_write),
        ("atomic_replace", _inject_replace),
    ):
        batch = _batch(spark, [
            (victims[round_no], f"zzzref updated body {round_no}"),
            (f"new-s-{round_no}", f"zzzref inserted func {round_no}"),
        ])
        pre = _state(spark, wh, "dlt")
        with monkeypatch.context() as mp:
            inject(mp)
            with pytest.raises(_Boom):
                IndexMaintenance(spark, wh, "dlt").upsert_documents(batch)
        assert _state(spark, wh, "dlt") == pre, (
            f"{label}: pre-commit crash leaked state"
        )
        IndexMaintenance(spark, wh, "dlt").upsert_documents(batch)
        IndexMaintenance(spark, wh, "ref").upsert_documents(batch)
        got, want = _state(spark, wh, "dlt"), _state(spark, wh, "ref")
        for q in list(got):
            if q != "_stats":
                assert got[q] == want[q], label
        round_no += 1
