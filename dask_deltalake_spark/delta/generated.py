"""Generated columns (writer protocol v4 / table feature
``generatedColumns``) — delta-spark's ``GENERATED ALWAYS AS (expr)``
per the public Delta spec: the generation expression is stored in the
column's ``StructField`` metadata under ``delta.generationExpression``,
and every writer must either compute the column (when the incoming
rows don't provide it) or verify that the provided values satisfy
``value <=> expr`` (null-safe equality, matching delta-spark's
enforcement constraint).

This engine ENFORCES generated columns for real on the write paths
(create / append / overwrite in ``to_delta``; UPDATE/MERGE rewrites
recompute them): a missing generated column is computed from its
expression before any file lands; a provided one is verified with one
``limit(1)`` probe and the write fails atomically with a sample row on
the first mismatch. The classic scale use case works end-to-end:
``partition_by`` a generated column (e.g. ``o_year = YEAR(ts)``) that
the incoming frame never carries — the writer derives it, hive-lays
the files, and partition pruning on the derived column skips data at
the metadata level.

Scale: computing a generated column is one extra projection fused into
the write's own scan (whole-stage codegen, no shuffle); verification
is the same map-side filter+limit probe the CHECK-constraint path
uses. At 100 TB the cost is a projection over the WRITTEN slice only.
"""

from __future__ import annotations

import json
from typing import Optional

import pyspark.sql.functions as F
from pyspark.sql import DataFrame
from pyspark.sql.types import StructType

GENERATION_EXPRESSION_KEY = "delta.generationExpression"


class GeneratedColumnViolationError(Exception):
    """A write provided values for a generated column that do not
    match its generation expression."""


def generated_columns(metadata) -> dict:
    """{column_name: generation_expression_sql} parsed from the table
    schema's per-field metadata."""
    if metadata is None or not metadata.schema_string:
        return {}
    out: dict[str, str] = {}
    for field in json.loads(metadata.schema_string).get("fields", []):
        expr = (field.get("metadata") or {}).get(GENERATION_EXPRESSION_KEY)
        if expr is not None:
            out[field["name"]] = expr
    return out


def attach_generation_expressions(
    schema: StructType, generated: dict
) -> StructType:
    """Return a copy of ``schema`` with ``delta.generationExpression``
    set in the metadata of each named field (create-time embedding)."""
    d = json.loads(schema.json())
    names = {f["name"] for f in d["fields"]}
    missing = set(generated) - names
    if missing:
        raise ValueError(
            f"generated_columns refer to columns not in the written "
            f"schema: {sorted(missing)}"
        )
    for f in d["fields"]:
        if f["name"] in generated:
            md = dict(f.get("metadata") or {})
            md[GENERATION_EXPRESSION_KEY] = generated[f["name"]]
            f["metadata"] = md
    return StructType.fromJson(d)


def apply_generated_columns(
    df: DataFrame,
    table_schema: StructType,
    generated: dict,
    operation: str,
    verify: bool = True,
) -> DataFrame:
    """Compute every generated column the frame doesn't carry (cast to
    the declared type) and verify every one it does. Returns the frame
    with all generated columns present, in table-schema column order
    for the columns it now has."""
    if not generated:
        return df
    types = {f.name: f.dataType for f in table_schema.fields}
    for name, expr_sql in generated.items():
        expr = F.expr(expr_sql).cast(types[name])
        if name not in df.columns:
            df = df.withColumn(name, expr)
        elif verify:
            # null-safe equality, same contract as delta-spark's
            # generated-column check constraint: value <=> expr
            bad = (
                df.filter(~F.col(name).eqNullSafe(expr)).limit(1).collect()
            )
            if bad:
                raise GeneratedColumnViolationError(
                    f"{operation}: provided value for generated column "
                    f"{name!r} does not match its expression "
                    f"({expr_sql}); example row: {bad[0].asDict()}"
                )
    # stable order: table schema first, then any extra frame columns
    ordered = [f.name for f in table_schema.fields if f.name in df.columns]
    extras = [c for c in df.columns if c not in ordered]
    return df.select(*ordered, *extras)


# --- derived partition pruning ----------------------------------------------
# delta-spark infers partition filters for GENERATED partition columns
# from predicates on their SOURCE columns (OptimizeGeneratedColumn):
# a query filtering `ts BETWEEN a AND b` over a table partitioned on
# `event_date = CAST(ts AS DATE)` must prune to the matching date
# partitions even though the user never mentioned event_date. At
# 100 TB this is the difference between a metadata-level prune and a
# full listing — derived-date partitioning is THE canonical layout for
# event data. Supported expression shapes cover the spec's partition-
# safe generation functions; each is either MONOTONIC non-decreasing
# in its source (range predicates map through: < becomes <=, > becomes
# >=) or equality-only (MONTH/DAY repeat across years — only ==/in
# map). Unsupported shapes simply derive nothing (sound: pruning
# predicates are only ever ADDED to a conjunction).

import re as _re
from datetime import date as _date, datetime as _dt


def _to_dt(v):
    """Literal → NAIVE datetime in the engine's clock (UTC — the
    session is pinned UTC, so Spark's CAST(ts AS DATE) truncates UTC
    wall-clock). Offset-bearing literals are converted to UTC FIRST:
    truncating their own wall-clock fields would derive the wrong
    partition (e.g. 2024-01-15T23:30-05:00 is 2024-01-16 UTC) and
    prune files containing matching rows. Partition values in the log
    are naive strings, so comparisons stay naive-vs-naive."""
    if isinstance(v, _dt):
        pass
    elif isinstance(v, _date):
        v = _dt(v.year, v.month, v.day)
    elif isinstance(v, str):
        try:
            v = _dt.fromisoformat(v.replace("Z", "+00:00"))
        except ValueError:
            return None
    else:
        return None
    if v.tzinfo is not None:
        from datetime import timezone as _tz

        v = v.astimezone(_tz.utc).replace(tzinfo=None)
    return v


def _day(v):
    v = _to_dt(v)
    return _dt(v.year, v.month, v.day) if v else None


def _month_start(v):
    v = _to_dt(v)
    return _dt(v.year, v.month, 1) if v else None


def _year_start(v):
    v = _to_dt(v)
    return _dt(v.year, 1, 1) if v else None


def _year_num(v):
    v = _to_dt(v)
    return v.year if v else None


def _month_num(v):
    v = _to_dt(v)
    return v.month if v else None


def _day_num(v):
    v = _to_dt(v)
    return v.day if v else None


def _fmt(pattern: str):
    py = pattern.replace("yyyy", "%Y").replace("MM", "%m").replace(
        "dd", "%d"
    ).replace("HH", "%H")

    def f(v):
        v = _to_dt(v)
        return v.strftime(py) if v else None

    return f


def _prefix(n: int):
    def f(v):
        return v[:n] if isinstance(v, str) else None

    return f


# (regex over the generation expression) -> (source-group, transform
# factory, monotonic?). Transforms return None when the literal cannot
# be converted — then nothing is derived for that predicate.
_SHAPES = [
    (_re.compile(r"^\s*CAST\s*\(\s*(\w+)\s+AS\s+DATE\s*\)\s*$", _re.I),
     lambda m: _day, True),
    (_re.compile(r"^\s*(?:TO_DATE|DATE)\s*\(\s*(\w+)\s*\)\s*$", _re.I),
     lambda m: _day, True),
    (_re.compile(r"^\s*YEAR\s*\(\s*(\w+)\s*\)\s*$", _re.I),
     lambda m: _year_num, True),
    (_re.compile(r"^\s*MONTH\s*\(\s*(\w+)\s*\)\s*$", _re.I),
     lambda m: _month_num, False),
    (_re.compile(r"^\s*(?:DAY|DAYOFMONTH)\s*\(\s*(\w+)\s*\)\s*$", _re.I),
     lambda m: _day_num, False),
    (_re.compile(
        r"^\s*DATE_TRUNC\s*\(\s*'(DAY|MONTH|YEAR)'\s*,\s*(\w+)\s*\)\s*$",
        _re.I),
     lambda m: {"DAY": _day, "MONTH": _month_start, "YEAR": _year_start}[
         m.group(1).upper()
     ], True),
    (_re.compile(
        r"^\s*DATE_FORMAT\s*\(\s*(\w+)\s*,\s*'(yyyy(?:-MM(?:-dd)?)?)'\s*\)\s*$"),
     lambda m: _fmt(m.group(2)), True),
    (_re.compile(
        r"^\s*SUBSTR(?:ING)?\s*\(\s*(\w+)\s*,\s*1\s*,\s*(\d+)\s*\)\s*$",
        _re.I),
     lambda m: _prefix(int(m.group(2))), True),
]

def _parse_generation(expr: str):
    """(source_column, transform, monotonic) or None. DATE_TRUNC's
    source column is capture group 2 (group 1 is the unit)."""
    for rx, make, mono in _SHAPES:
        m = rx.match(expr)
        if m:
            src = m.group(2) if rx.pattern.startswith(
                r"^\s*DATE_TRUNC"
            ) else m.group(1)
            return src, make(m), mono
    return None


_MONO_OPS = {"==": "==", "<": "<=", "<=": "<=", ">": ">=", ">=": ">=",
             "in": "in"}
_EQ_OPS = {"==": "==", "in": "in"}


def infer_partition_predicates(
    dnf: list, metadata, partition_columns: Optional[list] = None
) -> list:
    """Augment each DNF conjunction with predicates DERIVED for
    generated partition columns from predicates on their source
    columns. Returns a new DNF for PRUNING only (row-level filtering
    keeps the original); sound because derived terms are implied by
    the generation invariant every committed file satisfies."""
    if not dnf:
        return dnf
    gens = generated_columns(metadata)
    parts = set(
        partition_columns
        if partition_columns is not None
        else metadata.partition_columns
    )
    rules = {}
    for gcol, gexpr in gens.items():
        if gcol not in parts:
            continue
        parsed = _parse_generation(gexpr)
        if parsed:
            src, f, mono = parsed
            rules.setdefault(src, []).append((gcol, f, mono))
    if not rules:
        return dnf
    out = []
    for conj in dnf:
        extra = []
        for col, op, val in conj:
            for gcol, f, mono in rules.get(col, ()):
                ops = _MONO_OPS if mono else _EQ_OPS
                if op not in ops:
                    continue
                if op == "in":
                    mapped = [f(v) for v in val]
                    if all(m is not None for m in mapped):
                        extra.append((gcol, "in", sorted(set(mapped))))
                else:
                    m = f(val)
                    if m is None:
                        continue
                    mapped_op = ops[op]
                    if op == "<":
                        # x < v implies f(x) < f(v) when v sits EXACTLY
                        # on the truncation boundary (e.g. ts <
                        # 2024-01-15T00:00 -> date < 2024-01-15): the
                        # boundary partition is then provably empty and
                        # the prune stays exact, not just conservative
                        vdt = _to_dt(val)
                        if vdt is not None and (
                            (isinstance(m, _dt) and vdt == m)
                            or (
                                f is _year_num
                                and vdt == _dt(vdt.year, 1, 1)
                            )
                        ):
                            mapped_op = "<"
                    extra.append((gcol, mapped_op, m))
        out.append(list(conj) + extra)
    return out
