"""REST robustness fuzz: every mutating/query endpoint is hit with a
corpus of malformed bodies (truncated JSON, invalid UTF-8, wrong JSON
shapes, wrong field types). The contract, matching the reference's gin
error handling: a bad request maps to a 4xx with a JSON error body --
NEVER a 5xx, a hung connection, or a non-JSON payload. After the whole
sweep the server must still serve a well-formed search correctly (no
state corruption from any rejected request).
"""

from __future__ import annotations

import json
import urllib.error
import urllib.request

import pytest

from test_api import DOCS, _call, _wait_job

BAD_BODIES = [
    b"",
    b"{",
    b"null",
    b'"just a string"',
    b"123",
    b"[]",
    b"[1, 2, 3]",
    b'{"query": 5}',
    b'{"query": ["a"], "k": {}}',
    b'{"query": "a", "k": "notanint"}',
    b'{"query": "a", "k": -5}',
    b'{"filters": "notatree"}',
    b'{"filters": {"operator": 7, "filters": "x"}}',
    b'{"unexpected": {"deep": [null, {"a": []}]}}',
    b"\xff\xfe\x00garbage",
    b'{"name": 42}',
    b'{"searchable_fields": "notalist"}',
    b'{"queries": 3}',
]

ENDPOINTS = [
    ("POST", "/indexes"),
    ("POST", "/indexes/fz/search"),
    ("POST", "/indexes/fz/_search"),
    ("POST", "/indexes/fz/_multi_search"),
    ("POST", "/multi-search"),
    ("PUT", "/indexes/fz/documents"),
    ("PATCH", "/indexes/fz/settings"),
    ("PUT", "/indexes/fz/settings"),
    ("POST", "/indexes/fz/rename"),
    ("POST", "/indexes/fz/warm"),
    ("POST", "/indexes/fz/compact"),
]


def _raw_call(port, method, path, data: bytes):
    req = urllib.request.Request(
        f"http://127.0.0.1:{port}{path}",
        data=data,
        method=method,
        headers={"Content-Type": "application/json"},
    )
    try:
        with urllib.request.urlopen(req, timeout=120) as r:
            return r.status, r.read()
    except urllib.error.HTTPError as e:
        return e.code, e.read()


@pytest.fixture(scope="module")
def fuzz_api(spark, tmp_path_factory):
    from go_search_engine_spark.api.http import start_server

    wh = str(tmp_path_factory.mktemp("wh_fuzz"))
    httpd, _state = start_server(spark, wh, port=0)
    port = httpd.server_address[1]
    st, _ = _call(port, "POST", "/indexes", {
        "name": "fz", "searchable_fields": ["title", "text"],
    })
    assert st in (200, 201)
    st, job = _call(port, "PUT", "/indexes/fz/documents", DOCS)
    assert st in (200, 202)
    assert _wait_job(port, job["job_id"])["status"] == "completed"
    yield port
    httpd.shutdown()


@pytest.mark.parametrize("method,path", ENDPOINTS)
def test_malformed_bodies_never_500(fuzz_api, method, path):
    for body in BAD_BODIES:
        status, payload = _raw_call(fuzz_api, method, path, body)
        assert status < 500, (
            f"{method} {path} with {body[:40]!r} returned {status}: "
            f"{payload[:200]!r}"
        )
        parsed = json.loads(payload)  # error bodies must be JSON
        if status >= 400:
            assert "error" in parsed, (method, path, body[:40])


def test_server_still_healthy_after_fuzz(fuzz_api):
    # run last in file order: the whole malformed-body sweep must leave
    # the index fully serviceable
    st, res = _call(fuzz_api, "POST", "/indexes/fz/search",
                    {"query": "matrix", "k": 5})
    assert st == 200
    assert {h["documentID"] for h in res["hits"]} == {"d1", "d2"}
    st, stats = _call(fuzz_api, "GET", "/indexes/fz/stats")
    assert st == 200 and stats["document_count"] == len(DOCS)
