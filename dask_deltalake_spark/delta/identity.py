"""Identity columns (writer protocol v6 / table feature
``identityColumns``) — delta-spark's ``GENERATED ALWAYS AS IDENTITY``
per the public spec: the column's ``StructField`` metadata carries
``delta.identity.start``, ``delta.identity.step``,
``delta.identity.highWaterMark`` and
``delta.identity.allowExplicitInsert``; every writer that adds rows
must assign fresh values past the high water mark and advance it IN
THE SAME COMMIT (the metaData action rides with the add actions, so
crash-recovery can never reuse a value).

Assignment topology (the part that must survive 100 TB): a global
``row_number()`` would be one total-order sort barrier over the whole
write. Instead identity values are allocated the way delta-spark and
every MPP engine allocate surrogate keys — per-partition ranges:

1. one narrow count job produces per-partition row counts
   (O(#partitions) driver state),
2. a prefix sum turns counts into per-partition offsets,
3. an Arrow-batched ``mapInPandas`` stamps ``hwm + step * (offset +
   local_index)`` with zero shuffle — each task only needs its own
   offset.

Values are exact-contiguous in (partition, intra-partition) order;
like delta-spark, no ordering promise is made across concurrent
writers (the optimistic-commit loser re-reads the new high water mark
and reassigns).
"""

from __future__ import annotations

import json
from typing import Optional

import pyspark.sql.functions as F
from pyspark.sql import DataFrame
from pyspark.sql.types import LongType, StructField, StructType

IDENTITY_START_KEY = "delta.identity.start"
IDENTITY_STEP_KEY = "delta.identity.step"
IDENTITY_HWM_KEY = "delta.identity.highWaterMark"
IDENTITY_ALLOW_EXPLICIT_KEY = "delta.identity.allowExplicitInsert"


class IdentityColumnError(Exception):
    """Explicit values supplied for a GENERATED ALWAYS AS IDENTITY
    column, or an invalid identity declaration."""


def identity_columns(metadata) -> dict:
    """{name: {"start": int, "step": int, "high_water_mark": int|None,
    "allow_explicit": bool}} parsed from the table schema."""
    if metadata is None or not metadata.schema_string:
        return {}
    out: dict[str, dict] = {}
    for field in json.loads(metadata.schema_string).get("fields", []):
        md = field.get("metadata") or {}
        if IDENTITY_START_KEY in md:
            hwm = md.get(IDENTITY_HWM_KEY)
            out[field["name"]] = {
                "start": int(md[IDENTITY_START_KEY]),
                "step": int(md.get(IDENTITY_STEP_KEY, 1)),
                "high_water_mark": int(hwm) if hwm is not None else None,
                "allow_explicit": bool(md.get(IDENTITY_ALLOW_EXPLICIT_KEY, False)),
            }
    return out


def attach_identity_declarations(
    schema: StructType, identity: dict
) -> StructType:
    """Create-time embedding: add a LONG field per declared identity
    column (``{name: {"start": s, "step": i}}``) carrying the spec
    metadata keys. Identity columns must not already exist in the
    written frame's schema."""
    d = json.loads(schema.json())
    names = {f["name"] for f in d["fields"]}
    for name, decl in identity.items():
        step = int(decl.get("step", 1))
        if step == 0:
            raise IdentityColumnError(
                f"identity column {name!r}: step must be non-zero"
            )
        if name in names:
            continue  # field exists (values were just assigned)
        d["fields"].append(
            json.loads(
                StructType([StructField(name, LongType(), False)]).json()
            )["fields"][0]
        )
    for f in d["fields"]:
        if f["name"] in identity:
            decl = identity[f["name"]]
            md = dict(f.get("metadata") or {})
            md[IDENTITY_START_KEY] = int(decl.get("start", 1))
            md[IDENTITY_STEP_KEY] = int(decl.get("step", 1))
            if decl.get("high_water_mark") is not None:
                md[IDENTITY_HWM_KEY] = int(decl["high_water_mark"])
            md[IDENTITY_ALLOW_EXPLICIT_KEY] = bool(
                decl.get("allow_explicit", False)
            )
            f["metadata"] = md
    return StructType.fromJson(d)


def assign_identity_values(
    df: DataFrame, name: str, next_value: int, step: int
) -> tuple[DataFrame, int]:
    """Stamp ``name`` with ``next_value + step * k`` for k = 0..n-1 in
    (partition, intra-partition-row) order, shuffle-free, and return
    (frame, new_high_water_mark). One narrow count job + one
    map-stage projection; no global sort, no repartition."""
    pid = "__ddl_pid"
    with_pid = df.withColumn(pid, F.spark_partition_id())
    counts = {
        r[pid]: r["n"]
        for r in with_pid.groupBy(pid).agg(F.count("*").alias("n")).collect()
    }
    offsets: dict[int, int] = {}
    acc = 0
    for p in sorted(counts):
        offsets[p] = acc
        acc += counts[p]
    total = acc
    if total == 0:
        # no rows -> no values consumed -> high water mark unchanged
        return df.withColumn(name, F.lit(None).cast("long")), None

    out_schema = StructType(
        list(df.schema.fields) + [StructField(name, LongType(), False)]
    )

    def stamp(batches):
        import pandas as pd  # noqa: F401 (Arrow batches are pandas)

        local = {"pos": None, "part": None}
        for pdf in batches:
            part = int(pdf[pid].iloc[0]) if len(pdf) else 0
            if local["part"] != part:
                local["part"] = part
                local["pos"] = offsets.get(part, 0)
            n = len(pdf)
            start_k = local["pos"]
            local["pos"] += n
            pdf = pdf.drop(columns=[pid])
            pdf[name] = [
                next_value + step * (start_k + j) for j in range(n)
            ]
            yield pdf

    stamped = with_pid.mapInPandas(stamp, schema=out_schema)
    return stamped, next_value + step * (total - 1)


def apply_identity_columns(
    df: DataFrame, metadata, operation: str
) -> tuple[DataFrame, Optional[dict]]:
    """Append-path entry: assign every identity column the table
    declares (refusing explicit values unless the declaration allows
    them) and return (stamped_frame, {name: new_high_water_mark} or
    None if the table has no identity columns)."""
    decls = identity_columns(metadata)
    if not decls:
        return df, None
    new_hwms: dict[str, int] = {}
    for name, decl in decls.items():
        if name in df.columns:
            if not decl["allow_explicit"]:
                raise IdentityColumnError(
                    f"{operation}: column {name!r} is GENERATED ALWAYS AS "
                    "IDENTITY; explicit values are not allowed "
                    "(allowExplicitInsert=false)."
                )
            continue  # explicit insert permitted: leave values, hwm unchanged
        step = decl["step"]
        hwm = decl["high_water_mark"]
        next_value = decl["start"] if hwm is None else hwm + step
        df, new_hwm = assign_identity_values(df, name, next_value, step)
        if new_hwm is not None:
            new_hwms[name] = new_hwm
    return df, (new_hwms or None)


def advance_high_water_marks(schema_string: str, new_hwms: dict) -> str:
    """Return ``schema_string`` with each identity column's
    highWaterMark advanced (monotone: never moves backward)."""
    d = json.loads(schema_string)
    for f in d["fields"]:
        if f["name"] in new_hwms:
            md = dict(f.get("metadata") or {})
            prev = md.get(IDENTITY_HWM_KEY)
            nxt = int(new_hwms[f["name"]])
            step = int(md.get(IDENTITY_STEP_KEY, 1))
            if prev is None or (nxt - int(prev)) * (1 if step > 0 else -1) > 0:
                md[IDENTITY_HWM_KEY] = nxt
            f["metadata"] = md
    return json.dumps(d)
