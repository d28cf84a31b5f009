"""Structured Streaming: micro-batch ingestion through foreachBatch must
produce segments identical to the batch flatMap, and watermarked window
aggregation must run to completion on a bounded stream.
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from go_search_engine_spark.build.flatmap import POSTINGS_SCHEMA, make_flatmap
from go_search_engine_spark.config import IndexSettings
from go_search_engine_spark.corpus import generate_corpus
from go_search_engine_spark.functions.tokenizer import whitespace_word_count_col
from go_search_engine_spark.streaming.indexer import (
    StreamingIndexer,
    windowed_event_counts,
)


def test_streaming_index_matches_batch(spark, tmp_path):
    settings = IndexSettings(
        name="stream",
        searchable_fields=["content"],
        fields_without_prefix_search=["content"],
    )
    corpus = generate_corpus(spark, 120, seed=9, words_per_doc=15).withColumn(
        "doc_id", F.xxhash64("documentID")
    )
    src = str(tmp_path / "src")
    corpus.write.mode("overwrite").parquet(src)

    stream = (
        spark.readStream.schema(spark.read.parquet(src).schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    base = str(tmp_path / "idx")
    ix = StreamingIndexer(spark, settings, base)
    q = ix.start(stream, checkpoint=str(tmp_path / "ckpt"))
    q.awaitTermination(120)

    streamed = spark.read.parquet(os.path.join(base, "stream_segments"))
    batch_in = corpus.withColumn(
        "doc_len", whitespace_word_count_col(F.col("content")).cast("long")
    ).select("doc_id", "doc_len", "content")
    batch = batch_in.mapInPandas(make_flatmap(settings), schema=POSTINGS_SCHEMA)
    key = lambda r: (r["doc_id"], r["field"], r["term"])
    got = {key(r): (r["tf"], bytes(r["positions"])) for r in streamed.collect()}
    want = {key(r): (r["tf"], bytes(r["positions"])) for r in batch.collect()}
    assert got == want


def test_windowed_event_counts_streaming(spark, tmp_path):
    ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    src = str(tmp_path / "ev")
    ev.write.mode("overwrite").parquet(src)
    stream = (
        spark.readStream.schema(ev.schema)
        .option("maxFilesPerTrigger", 2)
        .parquet(src)
    )
    agg = windowed_event_counts(stream)
    q = (
        agg.writeStream.outputMode("append")
        .format("memory")
        .queryName("win_out")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    # append mode emits only windows finalized by the watermark; the last
    # watermark-held windows stay in state, so emitted <= total
    rows = spark.sql("SELECT * FROM win_out").collect()
    assert len(rows) > 0
    batch_rows = windowed_event_counts(ev).collect()
    total_stream = sum(r["n"] for r in rows)
    total_batch = sum(r["n"] for r in batch_rows)
    assert total_batch == ev.count()
    assert total_stream <= total_batch


def test_streaming_array_field_matches_batch(spark, tmp_path):
    """array<string> searchable fields must go through the same
    normalization as the batch builder (_norm_field: array_join ' ')."""
    settings = IndexSettings(
        name="stream_arr",
        searchable_fields=["tags"],
        fields_without_prefix_search=["tags"],
    )
    rows = [
        (1, ["alpha beta", "gamma"]),
        (2, ["delta"]),
        (3, ["alpha", "beta gamma", "alpha"]),
    ]
    df = spark.createDataFrame(rows, "doc_id long, tags array<string>")
    src = str(tmp_path / "src_arr")
    df.write.mode("overwrite").parquet(src)

    stream = (
        spark.readStream.schema(df.schema).option("maxFilesPerTrigger", 1).parquet(src)
    )
    base = str(tmp_path / "idx_arr")
    ix = StreamingIndexer(spark, settings, base)
    q = ix.start(stream, checkpoint=str(tmp_path / "ckpt_arr"))
    q.awaitTermination(120)

    streamed = spark.read.parquet(os.path.join(base, "stream_segments"))
    from go_search_engine_spark.build.builder import _norm_field

    batch_in = df.withColumn(
        "doc_len",
        whitespace_word_count_col(
            F.coalesce(_norm_field(df, "tags"), F.lit(""))
        ).cast("long"),
    ).select("doc_id", "doc_len", _norm_field(df, "tags").alias("tags"))
    batch = batch_in.mapInPandas(make_flatmap(settings), schema=POSTINGS_SCHEMA)
    key = lambda r: (r["doc_id"], r["field"], r["term"])
    got = {key(r): (r["tf"], r["dl"]) for r in streamed.collect()}
    want = {key(r): (r["tf"], r["dl"]) for r in batch.collect()}
    assert got == want


def test_stateful_sessionization_matches_batch(spark, tmp_path):
    """applyInPandasWithState sessionizer: once the watermark passes every
    session's last + gap (sentinel events from a separate user drive it
    through), the emitted set must EQUAL the batch lag+cumsum reference
    exactly -- every session once, with identical boundaries."""
    import shutil
    from datetime import datetime, timedelta

    from go_search_engine_spark.streaming.sessions import (
        sessionize_batch,
        sessionize_stream,
    )

    base = datetime(2025, 1, 1, 8, 0, 0)
    rows = []
    for u in range(3):
        t = base + timedelta(minutes=3 * u)
        for s in range(3):
            for e in range(2 + (u + s) % 3):
                rows.append((u, t))
                t += timedelta(minutes=5 + e, seconds=17 * u + e)
            t += timedelta(minutes=41 + 2 * s)  # > 30 min => new session
    ev = spark.createDataFrame(rows, "user_id long, ts timestamp")

    # time-ordered files; two trailing sentinel files (user 99) push the
    # watermark past every real session's last + gap, and the second one
    # gives the timeouts a batch to fire in
    ordered = sorted(rows, key=lambda r: r[1])
    cuts = [len(ordered) // 3, 2 * len(ordered) // 3]
    parts = [ordered[: cuts[0]], ordered[cuts[0] : cuts[1]], ordered[cuts[1] :]]
    parts.append([(99, base + timedelta(hours=10))])
    parts.append([(99, base + timedelta(hours=20))])
    src = tmp_path / "sess_src"
    src.mkdir()
    for i, part in enumerate(parts):
        d = tmp_path / f"_w{i}"
        spark.createDataFrame(part, "user_id long, ts timestamp").coalesce(
            1
        ).write.mode("overwrite").parquet(str(d))
        pf = next(p for p in d.iterdir() if p.suffix == ".parquet")
        shutil.move(str(pf), str(src / f"{i:03d}.parquet"))

    stream = (
        spark.readStream.schema(ev.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src))
    )
    q = (
        sessionize_stream(stream, gap_minutes=30)
        .writeStream.outputMode("append")
        .format("memory")
        .queryName("sess_out")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    got = {
        (r["user_id"], r["session_start"], r["session_end"], r["n_events"])
        for r in spark.sql(
            "SELECT * FROM sess_out WHERE user_id < 99"
        ).collect()
    }
    want = {
        (r["user_id"], r["session_start"], r["session_end"], r["n_events"])
        for r in sessionize_batch(ev, gap_minutes=30).collect()
    }
    assert len(want) == 9  # 3 users x 3 sessions
    assert got == want


def test_stateful_sessionization_out_of_order(spark, tmp_path):
    """A late-but-admissible event (>= watermark) arriving INSIDE a
    previously-seen gap must bridge the two runs into one session -- the
    reason in-stream gaps alone are never final."""
    import shutil
    from datetime import datetime, timedelta

    from go_search_engine_spark.streaming.sessions import (
        sessionize_batch,
        sessionize_stream,
    )

    t0 = datetime(2025, 5, 1, 12, 0, 0)
    f0 = [(0, t0)]
    f1 = [(0, t0 + timedelta(minutes=35))]   # apparent split (gap 35m)
    f2 = [(0, t0 + timedelta(minutes=20))]   # late event bridges the gap
    f3 = [(9, t0 + timedelta(hours=10))]     # sentinel: watermark forward
    f4 = [(9, t0 + timedelta(hours=20))]     # a batch for timeouts to fire
    src = tmp_path / "ooo_src"
    src.mkdir()
    for i, part in enumerate([f0, f1, f2, f3, f4]):
        d = tmp_path / f"_o{i}"
        spark.createDataFrame(part, "user_id long, ts timestamp").coalesce(
            1
        ).write.mode("overwrite").parquet(str(d))
        pf = next(p for p in d.iterdir() if p.suffix == ".parquet")
        shutil.move(str(pf), str(src / f"{i:03d}.parquet"))

    stream = (
        spark.readStream.schema("user_id long, ts timestamp")
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src))
    )
    q = (
        sessionize_stream(stream, gap_minutes=30)
        .writeStream.outputMode("append")
        .format("memory")
        .queryName("ooo_out")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        (r["user_id"], r["session_start"], r["session_end"], r["n_events"])
        for r in spark.sql("SELECT * FROM ooo_out WHERE user_id = 0").collect()
    }
    # ONE merged session [t0, t0+35m] x3 events -- matching the batch twin
    ev = spark.createDataFrame(f0 + f1 + f2, "user_id long, ts timestamp")
    want = {
        (r["user_id"], r["session_start"], r["session_end"], r["n_events"])
        for r in sessionize_batch(ev, gap_minutes=30).collect()
    }
    assert len(want) == 1
    assert got == want


def test_stateful_sessionization_timeout_close(spark, tmp_path):
    """EventTimeTimeout path: a user who stops sending events gets their
    open session closed (emitted once, exact boundaries) when another
    user's events push the watermark past last + gap."""
    import shutil
    from datetime import datetime, timedelta

    from go_search_engine_spark.streaming.sessions import sessionize_stream

    t0 = datetime(2025, 3, 1, 9, 0, 0)
    f0 = [(0, t0), (0, t0 + timedelta(minutes=7)), (1, t0 + timedelta(minutes=1))]
    f1 = [(1, t0 + timedelta(hours=3))]   # watermark -> t0+2:30
    f2 = [(1, t0 + timedelta(hours=4))]   # a further batch fires the timeout
    src = tmp_path / "to_src"
    src.mkdir()
    for i, part in enumerate([f0, f1, f2]):
        d = tmp_path / f"_t{i}"
        spark.createDataFrame(part, "user_id long, ts timestamp").coalesce(
            1
        ).write.mode("overwrite").parquet(str(d))
        pf = next(p for p in d.iterdir() if p.suffix == ".parquet")
        shutil.move(str(pf), str(src / f"{i:03d}.parquet"))

    stream = (
        spark.readStream.schema("user_id long, ts timestamp")
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src))
    )
    q = (
        sessionize_stream(stream, gap_minutes=30)
        .writeStream.outputMode("append")
        .format("memory")
        .queryName("to_out")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    rows = {
        (r["user_id"], r["session_start"], r["session_end"], r["n_events"])
        for r in spark.sql("SELECT * FROM to_out").collect()
    }
    # user 0's 2-event session closed by timeout; user 1's first session
    # (single event at t0+1m) closed by the in-stream 3h gap
    assert (0, t0, t0 + timedelta(minutes=7), 2) in rows
    assert (1, t0 + timedelta(minutes=1), t0 + timedelta(minutes=1), 1) in rows


def test_nrt_streaming_delta_ingestion(spark, tmp_path):
    """NRT path: a file stream of document updates+inserts commits one
    delta generation per micro-batch into a LIVE index; an already-open
    engine serves the streamed docs with exact stats, and the result
    equals a single batch delta upsert of the same rows."""
    import os

    from go_search_engine_spark.build.builder import IndexBuilder
    from go_search_engine_spark.build.maintenance import IndexMaintenance
    from go_search_engine_spark.config import IndexSettings
    from go_search_engine_spark.corpus import generate_corpus
    from go_search_engine_spark.query.engine import SearchEngine
    from go_search_engine_spark.streaming.indexer import NRTStreamingIndexer

    wh = str(tmp_path / "wh")
    s = IndexSettings(
        name="nrt",
        searchable_fields=["content"],
        fields_without_prefix_search=["content"],
    )
    corpus = generate_corpus(spark, 40, seed=61, words_per_doc=10)
    IndexBuilder(spark, s, wh).build(corpus, num_shards=2)
    # twin index takes the same rows in ONE batch delta upsert
    IndexBuilder(
        spark,
        IndexSettings(name="nrt_twin", searchable_fields=["content"],
                      fields_without_prefix_search=["content"]),
        wh,
    ).build(corpus, num_shards=2)

    victim = corpus.select("documentID").orderBy("documentID").limit(1).collect()[0][0]
    updates = spark.createDataFrame(
        [
            (victim, "r", "p", "c", "go", "zzznrt updated body"),
            ("nrt-new-1", "r", "p", "c", "go", "zzznrt streamed doc one"),
            ("nrt-new-2", "r", "p", "c", "go", "zzznrt streamed doc two"),
        ],
        "documentID string, repo string, path string, commit string, "
        "lang string, content string",
    )
    src = str(tmp_path / "src")
    # two files => (up to) two micro-batches
    updates.limit(1).write.mode("overwrite").parquet(src + "/f1")
    updates.offset(1).write.mode("overwrite").parquet(src + "/f2")
    for f in os.listdir(src + "/f1"):
        if f.endswith(".parquet"):
            os.rename(src + f"/f1/{f}", src + f"/b1_{f}")
    for f in os.listdir(src + "/f2"):
        if f.endswith(".parquet"):
            os.rename(src + f"/f2/{f}", src + f"/b2_{f}")

    eng = SearchEngine(spark, wh, "nrt")  # open BEFORE the stream
    assert eng.search("zzznrt", k=10, typo_tolerance=False).count() == 0

    indexer = NRTStreamingIndexer(spark, wh, "nrt")
    stream = (
        spark.readStream.schema(updates.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = indexer.start(stream, str(tmp_path / "ckpt"))
    q.awaitTermination(240)
    assert indexer.batches_seen >= 1
    assert sum(c["inserted"] + c["updated"] for c in indexer.commits) == 3

    IndexMaintenance(spark, wh, "nrt_twin").upsert_documents(
        updates, mode="delta"
    )

    def key(name, query):
        e = SearchEngine(spark, wh, name)
        return [
            (r["documentID"], round(r["score"], 9))
            for r in e.search(query, k=50, typo_tolerance=False).collect()
        ]

    # the LIVE engine sees the streamed docs (generation reload)...
    got = eng.search("zzznrt", k=10, typo_tolerance=False).collect()
    assert {r["documentID"] for r in got} == {victim, "nrt-new-1", "nrt-new-2"}
    # ...and the streamed index equals the single-batch delta twin
    for query in ("zzznrt", "tokenizer"):
        assert key("nrt", query) == key("nrt_twin", query), query


def test_streaming_epoch_replay_is_idempotent(spark, tmp_path):
    """foreachBatch is at-least-once: replaying an epoch (task failure,
    restart from checkpoint) must not double the epoch's postings --
    the per-epoch write is overwrite, not append."""
    settings = IndexSettings(
        name="replay",
        searchable_fields=["content"],
        fields_without_prefix_search=["content"],
    )
    corpus = generate_corpus(spark, 20, seed=21, words_per_doc=10).withColumn(
        "doc_id", F.xxhash64("documentID")
    )
    base = str(tmp_path / "idx")
    ix = StreamingIndexer(spark, settings, base)
    ix.process_batch(corpus, epoch_id=0)
    seg = os.path.join(base, "stream_segments", "epoch=0")
    once = spark.read.parquet(seg).count()
    assert once > 0
    ix.process_batch(corpus, epoch_id=0)  # replay
    assert spark.read.parquet(seg).count() == once
