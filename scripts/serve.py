#!/usr/bin/env python
"""Run the REST API server over a warehouse directory.

  python scripts/serve.py --warehouse /tmp/wh --port 7700 --cpus 8

Endpoints mirror the reference's HTTP surface (see
go_search_engine_spark/api/http.py for the route table). Example session:

  curl -X POST localhost:7700/indexes -d '{"name":"idx","searchable_fields":["text"],"fields_without_prefix_search":["text"]}'
  curl -X PUT localhost:7700/indexes/idx/documents -d '[{"documentID":"a","text":"hello world"}]'
  curl localhost:7700/jobs/<job_id>
  curl -X POST localhost:7700/indexes/idx/search -d '{"query":"helo"}'
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--warehouse", required=True)
    ap.add_argument("--host", default="127.0.0.1")
    ap.add_argument("--port", type=int, default=7700)
    ap.add_argument("--cpus", type=int, default=None)
    ap.add_argument(
        "--debug", action="store_true",
        help="include failed jobs' full tracebacks in job payloads",
    )
    args = ap.parse_args()

    from go_search_engine_spark.api.http import serve
    from go_search_engine_spark.session import get_spark

    spark = get_spark(app_name="gse_serve", cpus=args.cpus)
    spark.sparkContext.setLogLevel("ERROR")
    print(f"serving {args.warehouse} on http://{args.host}:{args.port}")
    serve(spark, args.warehouse, args.host, args.port, debug=args.debug)


if __name__ == "__main__":
    main()
