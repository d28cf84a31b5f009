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
        """Identical normalization to the batch builder, BY CONSTRUCTION:
        doc_len comes from the builder's own derive_doc_columns (whose
        docstring mandates byte-identical derivation across paths) --
        re-implementing the loop here would silently diverge streamed
        segments' BM25 |d| from batch-built ones on any future builder
        tweak. content_sha256 is derived too and simply unused by the
        segment write."""
        from ..build.builder import derive_doc_columns

        return derive_doc_columns(batch, self.settings)

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
        # overwrite-by-epoch, never append: foreachBatch is AT-LEAST-ONCE
        # (a task failure or restart-from-checkpoint replays an epoch),
        # so the write must be idempotent per epoch_id -- an append would
        # double every replayed batch's postings and silently corrupt
        # tf/df statistics
        segment.write.mode("overwrite").parquet(
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


class NRTStreamingIndexer:
    """Near-real-time streaming ingestion into a LIVE index: every
    micro-batch commits one delta generation via the incremental
    maintenance path (build/delta.py), so an open SearchEngine serves the
    streamed documents on its next query (generation check) with EXACT
    BM25 statistics -- no rebuild, no refresh, O(batch + vocab) per
    commit. This is the reference's unimplemented roadmap item
    ("real-time indexing with streaming updates",
    /root/reference/README.md:521) expressed as foreachBatch -> delta
    commit; ``compact_segments`` periodically folds the accumulated
    generations (``compact_every`` batches, 0 = never)."""

    def __init__(
        self,
        spark: SparkSession,
        warehouse: str,
        name: str,
        id_col: str = "documentID",
        compact_every: int = 0,
    ):
        from ..build.maintenance import IndexMaintenance

        self.maintenance = IndexMaintenance(spark, warehouse, name)
        self.id_col = id_col
        self.compact_every = compact_every
        self.batches_seen = 0
        self.commits: list[dict] = []

    def process_batch(self, batch: DataFrame, epoch_id: int) -> None:
        # the delta upsert refuses duplicate ids, so intra-batch
        # duplicates collapse to one row (arbitrary pick -- a producer
        # emitting CONFLICTING rows for one doc in one micro-batch has no
        # defined order anyway); cross-batch updates are ordered by epoch
        deduped = batch.dropDuplicates([self.id_col])
        if deduped.isEmpty():
            return
        rep = self.maintenance.upsert_documents(
            deduped, id_col=self.id_col, mode="delta"
        )
        self.batches_seen += 1
        self.commits.append({"epoch": int(epoch_id), **rep})
        if self.compact_every and self.batches_seen % self.compact_every == 0:
            self.maintenance.compact_segments()

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
