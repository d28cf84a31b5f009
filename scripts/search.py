#!/usr/bin/env python
"""spark-submit entry point for queries against a built index.

Cluster usage (mirrors scripts/build_index.py):

  cd /root/repo && zip -r /tmp/gse.zip go_search_engine_spark
  spark-submit --master <cluster> --py-files /tmp/gse.zip \\
      scripts/search.py --warehouse /path/to/warehouse --name my_index \\
      --query "data valu tabel" --k 10

Local smoke (this sandbox):

  python scripts/search.py --warehouse /tmp/wh --name smoke \\
      --query "data valu tabel" --k 5

Prints one JSON line per hit plus a final summary line. Modes:
  default      typo-tolerant BM25 top-k (engine.search)
  --no-typos   exact-only BM25
  --wand       block-max WAND path (auto tier choice; rank-identical)
  --phrase     positional phrase search (ranked by occurrence count)
  --warm       serving mode: decode+persist postings before querying
               (prints warm stats; then --repeat N shows hot latency)
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--warehouse", required=True)
    ap.add_argument("--name", required=True)
    ap.add_argument("--query", required=True)
    ap.add_argument("--k", type=int, default=10)
    ap.add_argument("--fields", default=None,
                    help="comma-separated field restriction")
    ap.add_argument("--no-typos", action="store_true")
    ap.add_argument("--wand", action="store_true")
    ap.add_argument("--phrase", action="store_true")
    ap.add_argument("--proximity", type=int, default=None, metavar="W",
                    help="unordered co-occurrence within a W-token window")
    ap.add_argument("--cpus", type=int, default=None)
    ap.add_argument("--warm", action="store_true",
                    help="enable warm serving mode before the query")
    ap.add_argument("--repeat", type=int, default=1,
                    help="run the query N times; report last-run latency")
    args = ap.parse_args()

    from go_search_engine_spark.query.engine import SearchEngine
    from go_search_engine_spark.session import get_spark

    spark = get_spark(cpus=args.cpus)
    engine = SearchEngine(spark, args.warehouse, args.name)
    if args.warm:
        print(json.dumps({"warm": engine.warm()}))
    fields = args.fields.split(",") if args.fields else None
    for _ in range(max(0, args.repeat - 1)):  # warm-up repeats
        engine.search(args.query, k=args.k, fields=fields,
                      typo_tolerance=not args.no_typos).collect()
    t0 = time.time()
    if args.phrase:
        from go_search_engine_spark.query.phrase import phrase_search

        rows = phrase_search(engine, args.query, k=args.k,
                             fields=fields).collect()
    elif args.proximity is not None:
        from go_search_engine_spark.query.phrase import proximity_search

        rows = proximity_search(engine, args.query, window=args.proximity,
                                k=args.k, fields=fields).collect()
    elif args.wand:
        from go_search_engine_spark.query.wand import wand_topk

        rows = wand_topk(engine, args.query, k=args.k, fields=fields,
                         typo_tolerance=not args.no_typos).collect()
    else:
        rows = engine.search(args.query, k=args.k, fields=fields,
                             typo_tolerance=not args.no_typos).collect()
    wall = time.time() - t0
    for r in rows:
        print(json.dumps(r.asDict(), default=str))
    print(json.dumps({"n_hits": len(rows), "wall_sec": round(wall, 3)}))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
