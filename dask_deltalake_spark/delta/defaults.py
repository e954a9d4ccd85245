"""Column DEFAULT values (writer feature ``allowColumnDefaults``).

Delta's WRITE-TIME default semantics (public spec / delta-spark
``ALTER TABLE ... ADD COLUMN ... DEFAULT``): a field carrying a
``CURRENT_DEFAULT`` SQL expression in its schema metadata is
materialized BY THE WRITER whenever an incoming frame omits the
column — the default is baked into the written files, it is never a
read-time substitution. Rows that existed before the column was added
keep reading NULL (their files predate the default), which is exactly
delta-spark's behavior and what distinguishes defaults from generated
columns (which are computed from OTHER columns and verified when
provided — delta/generated.py).

The reference has no schema-evolution surface at all; this is
Spark-side extension surface alongside add_column/drop_column."""

from __future__ import annotations

import json

import pyspark.sql.functions as F
from pyspark.sql import DataFrame
from pyspark.sql.types import StructType

CURRENT_DEFAULT_KEY = "CURRENT_DEFAULT"


def column_defaults(metadata) -> dict:
    """name -> (default SQL expr, Spark DataType) for fields declaring
    CURRENT_DEFAULT."""
    out = {}
    schema = StructType.fromJson(json.loads(metadata.schema_string))
    for f in schema.fields:
        meta = f.metadata or {}
        if CURRENT_DEFAULT_KEY in meta:
            out[f.name] = (meta[CURRENT_DEFAULT_KEY], f.dataType)
    return out


def apply_column_defaults(df: DataFrame, metadata) -> DataFrame:
    """Materialize declared defaults for columns the frame OMITS —
    called by the writer before schema validation, so a frame may
    legally omit defaulted columns on any write mode."""
    for name, (expr, dtype) in column_defaults(metadata).items():
        if name not in df.columns:
            df = df.withColumn(name, F.expr(expr).cast(dtype))
    return df
