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
