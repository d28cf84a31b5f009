"""The spark-submit entry points (scripts/build_index.py,
scripts/search.py) are the north rule's launch mode; they must behave
as real subprocesses: build an index, print the JSON report, resume by
skipping verified shards, and serve queries whose hits are identical to
the in-process SearchEngine over the same warehouse. serve.py is driven
over real HTTP by tests/test_api.py; the plan auditor has its own
checked-in output.
"""

from __future__ import annotations

import json
import math
import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SF = "/root/testdata/sf0.001/documents.parquet"


def _run(args, timeout=300):
    r = subprocess.run(
        [sys.executable, *args],
        cwd=REPO,
        capture_output=True,
        text=True,
        timeout=timeout,
        env={**os.environ, "SPARK_GRAFT_CPUS": "8"},
    )
    assert r.returncode == 0, r.stderr[-2000:]
    return [
        json.loads(ln)
        for ln in r.stdout.splitlines()
        if ln.startswith("{")
    ]


@pytest.fixture(scope="module")
def cli_wh(tmp_path_factory):
    wh = str(tmp_path_factory.mktemp("wh_cli"))
    out = _run([
        "scripts/build_index.py", "--corpus", SF, "--warehouse", wh,
        "--name", "cli", "--id-col", "doc_id", "--searchable", "text",
        "--no-prefix", "text", "--shards", "2",
    ])
    report = out[-1]
    assert report["n_docs"] == 500 and report["shards_built"] == 2
    return wh, report


def test_build_cli_resumes(cli_wh):
    wh, _ = cli_wh
    out = _run([
        "scripts/build_index.py", "--corpus", SF, "--warehouse", wh,
        "--name", "cli", "--id-col", "doc_id", "--searchable", "text",
        "--no-prefix", "text", "--shards", "2",
    ])
    rep = out[-1]
    # identical re-run: every shard checkpoint verifies, nothing rebuilds
    assert rep["shards_built"] == 0 and rep["shards_skipped"] == 2


def test_search_cli_matches_library(cli_wh, spark):
    from go_search_engine_spark.query.engine import SearchEngine

    wh, _ = cli_wh
    lines = _run([
        "scripts/search.py", "--warehouse", wh, "--name", "cli",
        "--query", "data valu tabel", "--k", "5", "--cpus", "8",
    ])
    hits, summary = lines[:-1], lines[-1]
    assert summary["n_hits"] == 5
    want = SearchEngine(spark, wh, "cli").search(
        "data valu tabel", k=5
    ).collect()
    assert [h["doc_id"] for h in hits] == [r["doc_id"] for r in want]
    for h, r in zip(hits, want):
        assert math.isclose(h["score"], r["score"], rel_tol=1e-9)
        assert h["num_typos"] == r["num_typos"]


def test_search_cli_wand_flag_rank_identical(cli_wh):
    wh, _ = cli_wh
    plain = _run([
        "scripts/search.py", "--warehouse", wh, "--name", "cli",
        "--query", "data valu tabel", "--k", "5", "--cpus", "8",
    ])
    wand = _run([
        "scripts/search.py", "--warehouse", wh, "--name", "cli",
        "--query", "data valu tabel", "--k", "5", "--cpus", "8", "--wand",
    ])
    assert [h["doc_id"] for h in plain[:-1]] == [
        h["doc_id"] for h in wand[:-1]
    ]
