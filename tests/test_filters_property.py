"""Property-based check of the filter-tree compiler: random trees
(nested groups, AND/OR/unknown expression operators, every condition
operator plus auto-detect and unknown ones, scored conditions, scalar
and array fields, unknown fields) compiled to Spark Columns must agree
row-for-row -- match AND filter score -- with a direct pure-Python
evaluation of the reference semantics (service.go:717-1020,
docs/FILTER_SCORING.md). The fixed tests sample handwritten trees;
this sweeps shapes nobody wrote down.
"""

from __future__ import annotations

import math

import pytest
from hypothesis import HealthCheck, given
from hypothesis import settings as hsettings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from go_search_engine_spark.query.filters import (
    FilterCondition,
    Filters,
    compile_filters,
)

ROWS = [
    {
        "rid": i,
        "title": t,
        "year": y,
        "rating": r,
        "tags": tags,
        "scores": scs,
    }
    for i, (t, y, r, tags, scs) in enumerate([
        ("The Matrix", 1999, 8.7, ["action", "sci-fi"], [9, 8]),
        ("Heat", 1995, 8.3, ["crime", "Action"], [7]),
        ("Amelie", 2001, 8.3, ["romance"], [6, 9]),
        ("Alien", 1979, 8.5, ["sci-fi", "horror"], [10]),
        ("Up", 2009, 8.3, [], [5]),
        ("matrix reloaded", 2003, 7.2, ["ACTION", "sci-fi"], [4, 4]),
        ("Moon", 2009, 7.8, ["sci-fi"], [8]),
        ("Se7en", 1995, 8.6, ["crime", "thriller"], [9]),
    ])
]

_STRINGS = ["action", "Matrix", "sci", "7", "romance", "zzz", "heat"]
_YEARS = [1979, 1995, 2001, 2003, 2009, 1990]
_RATINGS = [7.2, 8.3, 8.5, 9.0]
_INTS = [4, 7, 9, 10]

_KNOWN = (
    "_exact", "_ne", "_gt", "_gte", "_lt", "_lte",
    "_contains", "_ncontains", "_contains_any_of",
)


def _cond_strategy():
    def build(draw_op, field, value, score):
        return FilterCondition(field, draw_op, value, score)

    score = st.sampled_from([0.0, 1.0, 2.5])
    eq_ops = st.sampled_from([None, "", "_exact", "_ne", "_bogus"])
    cmp_ops = st.sampled_from(["_gt", "_gte", "_lt", "_lte"])
    return st.one_of(
        # equality-family on any field (type-matched values: the engine
        # types columns at ingest, so cross-type coercion is out of
        # contract by design)
        st.builds(build, eq_ops, st.just("title"),
                  st.sampled_from(_STRINGS), score),
        st.builds(build, eq_ops, st.just("year"),
                  st.sampled_from(_YEARS), score),
        st.builds(build, eq_ops, st.just("tags"),
                  st.sampled_from(_STRINGS), score),
        # comparisons on numerics (scalar + numeric array)
        st.builds(build, cmp_ops, st.just("year"),
                  st.sampled_from(_YEARS), score),
        st.builds(build, cmp_ops, st.just("rating"),
                  st.sampled_from(_RATINGS), score),
        st.builds(build, cmp_ops, st.just("scores"),
                  st.sampled_from(_INTS), score),
        # substring family on strings (scalar + string array)
        st.builds(build, st.sampled_from(["_contains", "_ncontains"]),
                  st.just("title"), st.sampled_from(_STRINGS), score),
        st.builds(build, st.sampled_from([None, "_contains", "_ncontains"]),
                  st.just("tags"), st.sampled_from(_STRINGS), score),
        # membership on scalar + array
        st.builds(build, st.just("_contains_any_of"), st.just("year"),
                  st.lists(st.sampled_from(_YEARS), min_size=1, max_size=3),
                  score),
        st.builds(build, st.just("_contains_any_of"), st.just("tags"),
                  st.lists(st.sampled_from(_STRINGS), min_size=1,
                           max_size=3), score),
        # unknown field: criterion fails, query survives
        st.builds(build, eq_ops, st.just("nope"),
                  st.sampled_from(_STRINGS), score),
    )


def _tree_strategy(depth: int = 2):
    ops = st.sampled_from(["AND", "OR", "", "XOR"])
    leaf = st.builds(
        Filters, ops,
        st.lists(_cond_strategy(), min_size=1, max_size=3),
        st.just([]),
    )
    if depth == 0:
        return leaf
    return st.one_of(
        leaf,
        st.builds(
            Filters, ops,
            st.lists(_cond_strategy(), min_size=0, max_size=2),
            st.lists(_tree_strategy(depth - 1), min_size=1, max_size=2),
        ),
    )


# --- pure-Python reference evaluation --------------------------------

def _py_cond(row: dict, c: FilterCondition) -> bool:
    if c.field not in row:
        return False
    v = row[c.field]
    arr = isinstance(v, list)
    op = c.operator
    if op is None or op == "":
        op = "_contains" if arr else "_exact"
    elif op not in _KNOWN:
        op = "_exact"
    if op == "_exact":
        return (c.value in v) if arr else v == c.value
    if op == "_ne":
        return (c.value not in v) if arr else v != c.value
    if op in ("_gt", "_gte", "_lt", "_lte"):
        import operator as _op

        f = {"_gt": _op.gt, "_gte": _op.ge,
             "_lt": _op.lt, "_lte": _op.le}[op]
        return any(f(x, c.value) for x in v) if arr else f(v, c.value)
    if op == "_contains":
        needle = str(c.value).lower()
        hay = v if arr else [v]
        return any(needle in str(x).lower() for x in hay)
    if op == "_ncontains":
        needle = str(c.value).lower()
        hay = v if arr else [v]
        return not any(needle in str(x).lower() for x in hay)
    # _contains_any_of
    vals = list(c.value)
    if arr:
        return any(x in vals for x in v)
    return v in vals


def _py_tree(row: dict, f: Filters) -> tuple[bool, float]:
    parts: list[tuple[bool, float]] = []
    for c in f.filters:
        m = _py_cond(row, c)
        parts.append((m, float(c.score) if m else 0.0))
    for g in f.groups:
        parts.append(_py_tree(row, g))
    total = sum(s for _, s in parts)
    op = (f.operator or "").upper()
    if op == "AND":
        matched = all(m for m, _ in parts)
        return matched, total if matched else 0.0
    # "", OR, and unknown expression operators all mean OR
    return any(m for m, _ in parts), total


@pytest.fixture(scope="module")
def fdf(spark):
    return spark.createDataFrame(
        ROWS,
        "rid int, title string, year int, rating double, "
        "tags array<string>, scores array<int>",
    ).cache()


@hsettings(
    max_examples=60,
    deadline=None,
    derandomize=True,
    suppress_health_check=[HealthCheck.too_slow],
)
@given(tree=_tree_strategy())
def test_property_filter_tree_matches_reference_eval(fdf, tree):
    matched, score = compile_filters(fdf, tree)
    got = {
        r["rid"]: (bool(r["m"]), r["s"])
        for r in fdf.select(
            "rid", matched.alias("m"), score.alias("s")
        ).collect()
    }
    for row in ROWS:
        want_m, want_s = _py_tree(row, tree)
        gm, gs = got[row["rid"]]
        assert gm == want_m, f"match diverged on rid={row['rid']}: {tree}"
        assert math.isclose(gs, want_s, rel_tol=1e-12, abs_tol=1e-12), (
            f"score diverged on rid={row['rid']}: {tree}"
        )
