"""Driver contract for the spark-graft builder (PySpark target).

``entry`` builds a real inverted index (shards, checkpoints, salted
term-blocks) over the sf0.001 documents table and runs the flagship typo-
tolerant BM25 top-k query through the block-decoded engine.

``queries`` / ``oracle_sql`` expose each implemented operator from
SURVEY.md section 2 (plus the training-data pipeline ops) with a DuckDB
oracle; see go_search_engine_spark/entry_queries.py.
"""

from __future__ import annotations

import os
import tempfile
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from go_search_engine_spark.entry_queries import ORACLES, QUERIES


def _build_index(spark: SparkSession, sf_dir: str, warehouse: str):
    from pyspark.sql import functions as F

    from go_search_engine_spark.build.builder import IndexBuilder
    from go_search_engine_spark.config import IndexSettings

    settings = IndexSettings(
        name="docs_idx",
        searchable_fields=["text"],
        fields_without_prefix_search=["text"],
        salt_df_threshold=100_000,
        term_buckets=16,
    )
    docs = (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .withColumn("documentID", F.format_string("doc-%08d", F.col("doc_id")))
        .drop("doc_id")
    )
    builder = IndexBuilder(spark, settings, warehouse)
    builder.build(docs, num_shards=4)
    return settings


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: build the index over sf0.001 documents, then run a
    typo-tolerant BM25 top-k query end-to-end (build -> blocks -> decode ->
    score -> rank)."""
    from go_search_engine_spark.query.engine import SearchEngine

    sf_dir = "/root/testdata/sf0.001"
    warehouse = os.path.join(tempfile.gettempdir(), "gse_spark_entry_wh")
    _build_index(spark, sf_dir, warehouse)
    engine = SearchEngine(spark, warehouse, "docs_idx")
    return engine.search("data valu tabel", k=10)  # two planted typos


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    return dict(ORACLES)
