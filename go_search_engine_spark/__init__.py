"""PySpark-native inverted-index + BM25 search engine.

A from-scratch rebuild of the capabilities of gcbaptista/go-search-engine
(reference at /root/reference) on Apache Spark: declarative DataFrame plans,
vectorized pandas/Arrow UDFs on the slow path only, Iceberg-style table
layout (parquet locally -- the Iceberg runtime jar is not in this image;
the writer is abstracted in ``build.catalog``).

NOT a port: the reference is a single-node Go engine with in-memory hash
maps and gob snapshots; this engine expresses the same semantics as Spark
dataflow -- repartition-by-term posting construction, sorted-merge of
partition-local segments, delta+varint block compression with block-max
metadata for WAND pruning, and checkpointed, resumable builds.
"""

__version__ = "0.1.0"
