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
