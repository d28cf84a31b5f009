"""Deterministic dense doc-id assignment.

The reference assigns internal uint32 ids from a mutex-guarded counter
(/root/reference/internal/indexing/service.go:147-163; batch pre-allocation
in bulk_operations.go:168-202) -- inherently order-of-arrival. For resume
and rank-identity we need ids that are a pure function of the data:
``doc_id`` = global rank of ``documentID`` under its total order.

Scale-safe scheme (no single-partition window):
  1. range-repartition by the id column and sort within partitions,
  2. count rows per partition (one tiny aggregate),
  3. doc_id = partition offset + within-partition row_number.

The within-partition window parallelizes per partition; the result is
invariant to the partitioner's sampled boundaries because the composite is
exactly the global sort rank.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def assign_doc_ids(
    df: DataFrame,
    id_col: str,
    num_partitions: int,
    out_partitions: int | None = None,
    release_into: list | None = None,
) -> DataFrame:
    """Return ``df`` plus a dense 0-based ``doc_id`` = rank of ``id_col``.

    The window exchange hash-partitions on ``_pid`` (few distinct values),
    leaving empty/doubled partitions -- a straggler factory for every
    downstream stage. The final round-robin ``repartition(out_partitions)``
    restores balance; one extra all-to-all over the corpus, which the
    flatMap amortizes (on a cluster, size out_partitions ~ 2-4x total
    cores).

    The intermediate range-partitioned frame MUST stay cached until the
    caller materializes the result (the collected per-partition offsets
    are only valid against the exact partitioning that produced them); it
    is appended to ``release_into`` so long-lived callers (the HTTP
    server's repeated build/upsert jobs) can unpersist it afterwards
    instead of pinning one corpus copy per batch for the app's lifetime."""
    out_partitions = out_partitions or num_partitions
    parted = df.repartitionByRange(num_partitions, id_col).withColumn(
        "_pid", F.spark_partition_id()
    )
    parted = parted.persist()
    if release_into is not None:
        release_into.append(parted)
    counts = (
        parted.groupBy("_pid").count().orderBy("_pid").collect()
    )  # tiny: one row per partition
    offsets = {}
    acc = 0
    for row in counts:
        offsets[row["_pid"]] = acc
        acc += row["count"]
    offsets_df = F.broadcast(
        parted.sparkSession.createDataFrame(
            [(int(pid), int(off)) for pid, off in offsets.items()],
            # explicit schema: an EMPTY input frame (e.g. an upsert batch
            # with zero inserts) must not crash schema inference
            schema="_pid int, _offset long",
        )
    )
    w = Window.partitionBy("_pid").orderBy(id_col)
    out = (
        parted.withColumn("_rn", F.row_number().over(w))
        .join(offsets_df, "_pid")
        .withColumn("doc_id", (F.col("_offset") + F.col("_rn") - 1).cast("long"))
        .drop("_pid", "_rn", "_offset")
    )
    return out.repartition(out_partitions)
