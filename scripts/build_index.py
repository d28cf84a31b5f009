#!/usr/bin/env python
"""spark-submit entry point for the index build.

Cluster usage (the north rule's launch mode):

  cd /root/repo && zip -r /tmp/gse.zip go_search_engine_spark
  spark-submit --master <cluster> --py-files /tmp/gse.zip \\
      scripts/build_index.py \\
      --corpus /path/to/corpus.parquet --warehouse /path/to/warehouse \\
      --name my_index --id-col documentID \\
      --searchable content,path --no-prefix content --shards 64

Local smoke (this sandbox):

  python scripts/build_index.py --corpus /root/testdata/sf0.001/documents.parquet \\
      --warehouse /tmp/wh --name smoke --id-col doc_id --searchable text \\
      --no-prefix text --shards 2

The build is resumable: re-running with the same arguments skips shards
whose checkpoints verify (fingerprint match) and finishes the rest.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--corpus", required=True)
    p.add_argument("--warehouse", required=True)
    p.add_argument("--name", default="default")
    p.add_argument("--id-col", default="documentID")
    p.add_argument("--searchable", default="content")
    p.add_argument("--no-prefix", default="")
    p.add_argument("--shards", type=int, default=16)
    p.add_argument("--salt-df-threshold", type=int, default=100_000)
    p.add_argument("--no-resume", action="store_true")
    args = p.parse_args()

    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    from go_search_engine_spark.build.builder import IndexBuilder
    from go_search_engine_spark.config import IndexSettings

    # on a cluster the master/conf comes from spark-submit; local default
    # only applies when run directly
    spark = SparkSession.builder.appName("gse-build").getOrCreate()

    settings = IndexSettings(
        name=args.name,
        searchable_fields=args.searchable.split(","),
        fields_without_prefix_search=[f for f in args.no_prefix.split(",") if f],
        salt_df_threshold=args.salt_df_threshold,
    )
    corpus = spark.read.parquet(args.corpus)
    if args.id_col != "documentID" and args.id_col in corpus.columns:
        corpus = corpus.withColumn("documentID", F.col(args.id_col).cast("string"))
    report = IndexBuilder(spark, settings, args.warehouse).build(
        corpus,
        num_shards=args.shards,
        resume=not args.no_resume,
    )
    print(json.dumps(report.to_dict(), default=str))


if __name__ == "__main__":
    main()
