"""Structured Streaming ingestion into the index build pipeline.

The reference lists "real-time indexing with streaming updates" as an
unimplemented roadmap item (/root/reference/README.md:521); its closest
machinery is the async job system that chunks incoming documents into
micro-batches (internal/indexing/service.go:72-92,
internal/engine/async_operations.go:122-203). Structured Streaming is the
Spark-native equivalent: a ``readStream`` over the corpus source feeds
``foreachBatch``, and every micro-batch runs the SAME deterministic
flatMap -> segment append used by the batch builder, so streamed and
batch-built indexes converge to identical segments.

Also provided: a watermarked tumbling-window analytics aggregation over
the search-event stream (the streaming twin of entry query
``events_window_5m``).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..build.flatmap import POSTINGS_SCHEMA, make_flatmap
from ..config import IndexSettings
from ..functions.tokenizer import whitespace_word_count_col


class StreamingIndexer:
    """foreachBatch micro-batch ingestion: each batch appends one postings
    segment (the same checkpoint unit the batch builder uses)."""

    def __init__(self, spark: SparkSession, settings: IndexSettings, base: str):
        self.spark = spark
        self.settings = settings
        self.base = base
        self.batches_seen = 0

    def _prep(self, batch: DataFrame) -> DataFrame:
        """Identical normalization to the batch builder: array<string>
        searchable fields join with a space (builder._norm_field,
        reference indexing/service.go:233-241) BEFORE doc_len and the
        flatMap -- required for the 'identical segments to batch'
        guarantee."""
        from ..build.builder import _norm_field

        s = self.settings
        dl = None
        for f_name in s.searchable_fields:
            c = whitespace_word_count_col(
                F.coalesce(_norm_field(batch, f_name), F.lit(""))
            )
            dl = c if dl is None else dl + c
        return batch.withColumn("doc_len", dl.cast("long"))

    def process_batch(self, batch: DataFrame, epoch_id: int) -> None:
        from ..build.builder import _norm_field

        s = self.settings
        prepped = self._prep(batch)
        prepped = prepped.select(
            "doc_id",
            "doc_len",
            *[_norm_field(prepped, f).alias(f) for f in s.searchable_fields],
        )
        segment = prepped.mapInPandas(make_flatmap(s), schema=POSTINGS_SCHEMA)
        segment.write.mode("append").parquet(
            os.path.join(self.base, "stream_segments", f"epoch={epoch_id}")
        )
        self.batches_seen += 1

    def start(self, stream: DataFrame, checkpoint: str):
        return (
            stream.writeStream.foreachBatch(self.process_batch)
            .option("checkpointLocation", checkpoint)
            .trigger(availableNow=True)
            .start()
        )


def windowed_event_counts(events: DataFrame, watermark: str = "10 minutes",
                          window: str = "5 minutes") -> DataFrame:
    """Watermarked tumbling-window counts per event type (late data beyond
    the watermark is dropped by Spark's state store). Event time must be
    TIMESTAMP (not NTZ) for watermarks; session TZ is pinned to UTC so the
    cast is value-preserving."""
    events = events.withColumn("ts", F.col("ts").cast("timestamp"))
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("w"), "event_type")
        .agg(F.count("*").alias("n"), F.sum("value").alias("sum_value"))
        .select(F.col("w.start").alias("win_start"), "event_type", "n", "sum_value")
    )
