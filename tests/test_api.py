"""REST API surface + async job manager (reference api/*.go +
internal/jobs/manager.go): full lifecycle driven over real HTTP --
create index, async document add with progress polling, search with
filters/typos, multi-search envelopes, paginated listing, async delete,
settings-reindex job, rename, delete index.
"""

from __future__ import annotations

import json
import time
import urllib.request

import pytest

from go_search_engine_spark.api.jobs import JobManager


def _call(port, method, path, body=None):
    data = json.dumps(body).encode() if body is not None else None
    req = urllib.request.Request(
        f"http://127.0.0.1:{port}{path}", data=data, method=method
    )
    try:
        with urllib.request.urlopen(req, timeout=300) as r:
            return r.status, json.loads(r.read())
    except urllib.error.HTTPError as e:
        return e.code, json.loads(e.read())


def _wait_job(port, job_id, timeout=300):
    deadline = time.time() + timeout
    while time.time() < deadline:
        st, job = _call(port, "GET", f"/jobs/{job_id}")
        assert st == 200
        if job["status"] in ("completed", "failed"):
            return job
        time.sleep(0.1)
    raise TimeoutError(job_id)


@pytest.fixture(scope="module")
def api(spark, tmp_path_factory):
    from go_search_engine_spark.api.http import start_server

    wh = str(tmp_path_factory.mktemp("wh_api"))
    httpd, state = start_server(spark, wh, port=0)
    yield httpd.server_address[1]
    httpd.shutdown()


DOCS = [
    {"documentID": "d1", "title": "The Matrix", "text": "neo fights agents", "year": 1999},
    {"documentID": "d2", "title": "Matrix Reloaded", "text": "neo returns again", "year": 2003},
    {"documentID": "d3", "title": "Inception", "text": "dreams within dreams", "year": 2010},
    {"documentID": "d4", "title": "Speed", "text": "bus cannot slow down", "year": 1994},
]


def test_full_http_lifecycle(api):
    port = api
    st, out = _call(port, "GET", "/health")
    assert (st, out) == (200, {"status": "ok"})

    # create
    st, out = _call(port, "POST", "/indexes", {
        "name": "films",
        "searchable_fields": ["title", "text"],
        "filterable_fields": ["year"],
        "fields_without_prefix_search": ["text"],
    })
    assert st == 200 and out == {"created": "films"}
    st, out = _call(port, "POST", "/indexes", {"name": "films"})
    assert st == 409  # duplicate
    st, out = _call(port, "GET", "/indexes")
    assert out == ["films"]

    # async initial build with live progress
    st, out = _call(port, "PUT", "/indexes/films/documents", DOCS)
    assert st == 200 and "job_id" in out
    job = _wait_job(port, out["job_id"])
    assert job["status"] == "completed", job
    assert job["result"]["built"] and job["result"]["n_docs"] == 4
    assert job["progress"]["current"] == job["progress"]["total"] > 0

    # search: typo + filter + projection
    st, res = _call(port, "POST", "/indexes/films/search", {
        "query": "matrx",
        "filters": {"operator": "AND",
                    "filters": [{"field": "year", "operator": "_gte",
                                 "value": 1999}]},
        "retrievable_fields": ["title"],
    })
    assert st == 200
    got = {h["documentID"] for h in res["hits"]}
    assert got == {"d1", "d2"} and res["total"] == 2
    assert all(h["num_typos"] == 1 for h in res["hits"])

    # invalid field restriction -> 400, not 500
    st, res = _call(port, "POST", "/indexes/films/search",
                    {"query": "neo", "restrict_searchable_fields": ["nope"]})
    assert st == 400 and "non-searchable" in res["error"]

    # multi-search envelopes
    st, res = _call(port, "POST", "/multi-search", {
        "index": "films",
        "queries": {
            "a": {"query": "neo"},
            "b": {"query": "dreams", "page_size": 1},
        },
    })
    assert st == 200
    assert {h["documentID"] for h in res["a"]["hits"]} == {"d1", "d2"}
    assert res["b"]["total"] == 1 and len(res["b"]["hits"]) == 1

    # paginated listing, deterministic by doc_id
    st, res = _call(port, "GET", "/indexes/films/documents?page=2&page_size=2")
    assert res["total"] == 4 and len(res["documents"]) == 2
    assert [d["documentID"] for d in res["documents"]] == ["d3", "d4"]

    # upsert into the built index (same endpoint, now incremental)
    st, out = _call(port, "PUT", "/indexes/films/documents", [
        {"documentID": "d5", "title": "Interstellar",
         "text": "space farmers save humanity", "year": 2014},
    ])
    job = _wait_job(port, out["job_id"])
    assert job["status"] == "completed" and job["result"] == {
        "updated": 0, "inserted": 1}
    st, res = _call(port, "POST", "/indexes/films/search",
                    {"query": "interstellar"})
    assert {h["documentID"] for h in res["hits"]} == {"d5"}

    # async delete one
    st, out = _call(port, "DELETE", "/indexes/films/documents/d4")
    job = _wait_job(port, out["job_id"])
    assert job["result"] == {"deleted": 1}
    st, res = _call(port, "POST", "/indexes/films/search", {"query": "bus"})
    assert res["total"] == 0

    # settings update forcing reindex (prefix flip) -> async job
    st, out = _call(port, "PUT", "/indexes/films/settings",
                    {"fields_without_prefix_search": []})
    assert out.get("reindex") is True
    job = _wait_job(port, out["job_id"])
    assert job["status"] == "completed", job
    st, res = _call(port, "POST", "/indexes/films/search",
                    {"query": "dre", "typo_tolerance": False})
    assert {h["documentID"] for h in res["hits"]} == {"d3"}  # prefix now on

    # job listing
    st, jobs = _call(port, "GET", "/jobs?index=films")
    assert len(jobs) >= 4
    assert all(j["status"] == "completed" for j in jobs)

    # rename + delete
    st, out = _call(port, "POST", "/indexes/films/rename",
                    {"new_name": "movies2"})
    assert out == {"renamed": "films", "to": "movies2"}
    st, res = _call(port, "POST", "/indexes/movies2/search", {"query": "neo"})
    assert st == 200 and res["total"] == 2
    st, out = _call(port, "DELETE", "/indexes/movies2")
    assert out == {"deleted": "movies2"}
    st, out = _call(port, "GET", "/indexes")
    assert out == []
    st, out = _call(port, "GET", "/indexes/movies2")
    assert st == 404


def test_document_validation(api):
    port = api
    _call(port, "POST", "/indexes", {
        "name": "val", "searchable_fields": ["text"],
    })
    st, out = _call(port, "PUT", "/indexes/val/documents",
                    [{"text": "no id"}])
    assert st == 400 and "documentID" in out["error"]
    st, out = _call(port, "PUT", "/indexes/val/documents", [])
    assert st == 400
    st, out = _call(port, "PUT", "/indexes/nope/documents",
                    [{"documentID": "x", "text": "y"}])
    assert st == 404
    _call(port, "DELETE", "/indexes/val")


def test_job_manager_failure_and_progress():
    jm = JobManager()

    def boom(progress):
        progress(1, 3, "step one")
        raise RuntimeError("kaput")

    jid = jm.submit("t", "idx", boom)
    job = jm.wait(jid)
    assert job.status == "failed"
    assert "kaput" in job.error
    assert job.progress_current == 1 and job.progress_total == 3

    def ok(progress):
        for i in range(3):
            progress(i + 1, 3, f"s{i}")
        return {"x": 1}

    jid2 = jm.submit("t", "idx", ok)
    job2 = jm.wait(jid2)
    assert job2.status == "completed" and job2.result == {"x": 1}
    assert [j.id for j in jm.list("idx")] == [jid, jid2]
    job.completed_at = time.time() - 7200
    assert jm.prune(3600) == 1
    assert jm.get(jid) is None


def test_warm_and_compact_endpoints(spark, api):
    port = api
    _call(port, "POST", "/indexes", {
        "name": "ops", "searchable_fields": ["text"],
        "fields_without_prefix_search": ["text"],
    })
    st, out = _call(port, "PUT", "/indexes/ops/documents", [
        {"documentID": f"o{i}", "text": f"ops document number {i} body"}
        for i in range(6)
    ])
    assert _wait_job(port, out["job_id"])["status"] == "completed"

    # warm serving mode over HTTP
    st, warm = _call(port, "POST", "/indexes/ops/warm")
    assert st == 200 and warm["warm_terms"] == "all"
    st, res = _call(port, "POST", "/indexes/ops/search", {"query": "body"})
    assert res["total"] == 6

    # delta upsert through the API (add_documents upserts when built),
    # then ratio-gated and forced compaction jobs
    st, out = _call(port, "POST", "/indexes/ops/compact",
                    {"if_needed": True})
    job = _wait_job(port, out["job_id"])
    assert job["result"] == {"compacted": False}  # no delta pending
    st, out = _call(port, "POST", "/indexes/ops/compact")
    job = _wait_job(port, out["job_id"])
    assert job["status"] == "completed" and job["result"]["compacted"]
    st, res = _call(port, "POST", "/indexes/ops/search", {"query": "body"})
    assert res["total"] == 6  # results unchanged after folding
    _call(port, "DELETE", "/indexes/ops")
