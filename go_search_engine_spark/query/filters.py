"""Filter expression tree -> Spark Column predicate + filter score.

Mirrors the reference's filter system (SURVEY.md section 2.5):
- ``FilterCondition{field, operator, value, score}`` with operators
  ``_exact`` (default), ``_ne``, ``_gt/_gte/_lt/_lte``, ``_contains``,
  ``_ncontains``, ``_contains_any_of``
  (/root/reference/internal/search/service.go:884-1020);
- ``Filters{operator: AND|OR, filters: [...], groups: [...]}`` recursion
  (services/interfaces.go:70-83, evaluation service.go:717-795);
- filter scoring: each matching condition contributes its score; AND is
  all-or-nothing (sum iff every condition matches), OR sums the matching
  ones (service.go:725-794, docs/FILTER_SCORING.md:9-48);
- array-typed doc fields match if ANY element passes
  (service.go:913-1020);
- auto-operator detection: missing operator => ``_contains`` for array
  fields else ``_exact`` (service.go:810-821);
- unknown CONDITION operator => warn + treat as equality
  (applyFilterLogic's default branch, service.go:905-908);
- missing/unknown EXPRESSION operator => OR (service.go:749-750 and the
  :779-781 default branch); a condition naming a field absent from the
  docs schema warns and fails just that criterion (service.go:827-831),
  never the whole query.

The dynamic type coercion machinery (string->float, string->time,
service.go:851-883,1106-1133) collapses away here: columns are typed at
ingest (SURVEY.md section 1.2), so comparisons compile directly to typed
Column expressions Catalyst can push down.
"""

from __future__ import annotations

from dataclasses import dataclass, field as dc_field

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType


@dataclass
class FilterCondition:
    field: str
    operator: str | None = None  # None => auto-detect
    value: object = None
    score: float = 0.0


@dataclass
class Filters:
    # reference default: an empty/missing expression operator means OR
    # (service.go:749-750)
    operator: str = "OR"  # "AND" | "OR"
    filters: list[FilterCondition] = dc_field(default_factory=list)
    groups: list["Filters"] = dc_field(default_factory=list)


def _is_array(df: DataFrame, name: str) -> bool:
    try:
        return isinstance(df.schema[name].dataType, ArrayType)
    except KeyError:
        return False


_KNOWN_OPS = (
    "_exact", "_ne", "_gt", "_gte", "_lt", "_lte",
    "_contains", "_ncontains", "_contains_any_of",
)


def _condition(df: DataFrame, c: FilterCondition) -> Column:
    if c.field not in df.columns:
        # reference: "Field not found in document for filter condition.
        # Criterion fails." (service.go:827-831) -- fail the criterion,
        # never the whole query with an unresolved-column error
        import logging

        logging.getLogger(__name__).warning(
            "filter field %r not found in docs schema; criterion fails",
            c.field,
        )
        return F.lit(False)
    col = F.col(c.field)
    arr = _is_array(df, c.field)
    op = c.operator
    if op is None or op == "":
        op = "_contains" if arr else "_exact"  # service.go:810-821
    elif op not in _KNOWN_OPS:
        # applyFilterLogic default branch: warn, treat as equality
        # (service.go:905-908)
        import logging

        logging.getLogger(__name__).warning(
            "unknown filter operator %r for field %r; treating as "
            "equality", op, c.field,
        )
        op = "_exact"

    if op == "_exact":
        if arr:
            return F.array_contains(col, F.lit(c.value))
        return col == F.lit(c.value)
    if op == "_ne":
        if arr:
            return ~F.array_contains(col, F.lit(c.value))
        return col != F.lit(c.value)
    if op in ("_gt", "_gte", "_lt", "_lte"):
        def cmp(x: Column) -> Column:
            v = F.lit(c.value)
            return {
                "_gt": x > v,
                "_gte": x >= v,
                "_lt": x < v,
                "_lte": x <= v,
            }[op]

        if arr:
            return F.exists(col, cmp)
        return cmp(col)
    if op == "_contains":
        needle = F.lower(F.lit(c.value))
        if arr:
            return F.exists(col, lambda x: F.contains(F.lower(x), needle))
        return F.contains(F.lower(col), needle)
    if op == "_ncontains":
        needle = F.lower(F.lit(c.value))
        if arr:
            return ~F.exists(col, lambda x: F.contains(F.lower(x), needle))
        return ~F.contains(F.lower(col), needle)
    # op == "_contains_any_of" (every other value was normalized above)
    if isinstance(c.value, (str, bytes)) or not isinstance(
        c.value, (list, tuple, set)
    ):
        # list('news') would silently match per-CHARACTER and a number
        # would crash the query mid-plan; fail loud at the boundary
        # (ValueError maps to HTTP 400)
        raise ValueError(
            f"_contains_any_of value for field {c.field!r} must be a "
            f"list of values, got {type(c.value).__name__}"
        )
    vals = list(c.value)
    if arr:
        return F.arrays_overlap(col, F.array([F.lit(v) for v in vals]))
    return col.isin(vals)


def _tree_fields(f: Filters | None) -> list[str]:
    if f is None:
        return []
    out = [c.field for c in f.filters]
    for g in f.groups:
        out.extend(_tree_fields(g))
    return out


def compile_filters(
    df: DataFrame,
    f: Filters | None,
    filterable_fields: list[str] | None = None,
) -> tuple[Column, Column]:
    """Return (matches: boolean Column, filter_score: double Column).

    Empty expression => (true, 0.0) (service.go:719-723).

    ``filterable_fields``: advisory validation -- filtering on a field
    outside the configured set logs a warning but still evaluates, the
    reference's exact semantics (service.go:823-825: "Filtering on
    non-filterable field ... proceeding anyway"). ``None`` disables the
    check (direct/unmanaged use where no settings exist).
    """
    if f is None or (not f.filters and not f.groups):
        return F.lit(True), F.lit(0.0)
    if filterable_fields is not None:
        import logging

        allowed = set(filterable_fields)
        for name in _tree_fields(f):
            if name not in allowed:
                logging.getLogger(__name__).warning(
                    "filtering on non-filterable field %r (not in "
                    "filterable_fields); proceeding anyway", name
                )

    parts: list[tuple[Column, Column]] = []
    for c in f.filters:
        cond = _condition(df, c)
        parts.append((cond, F.when(cond, F.lit(float(c.score))).otherwise(F.lit(0.0))))
    for g in f.groups:
        if g is None:
            # a None group from a library caller: same semantics as an
            # empty expression (matches, zero score -- service.go:719-723)
            parts.append((F.lit(True), F.lit(0.0)))
            continue
        parts.append(compile_filters(df, g))

    conds = [p[0] for p in parts]
    scores = [p[1] for p in parts]
    total = scores[0]
    for s in scores[1:]:
        total = total + s

    op = (f.operator or "").upper()
    if op not in ("", "AND", "OR"):
        import logging

        logging.getLogger(__name__).warning(
            "unknown filter expression operator %r; defaulting to OR",
            f.operator,
        )
    if op == "AND":
        matched = conds[0]
        for c in conds[1:]:
            matched = matched & c
        # all-or-nothing scoring (service.go:725-745)
        return matched, F.when(matched, total).otherwise(F.lit(0.0))
    # OR: sum of matching contributions (service.go:749-794)
    matched = conds[0]
    for c in conds[1:]:
        matched = matched | c
    return matched, total
