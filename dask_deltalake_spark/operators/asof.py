"""As-of join (nearest-prior-timestamp match).

Spark has no single as-of primitive (SURVEY.md §2.2); the scalable
rewrite is the union + last(ignorenulls) window pattern:

1. Tag right rows 0 and left rows 1, union them on aligned columns.
2. One window per key ordered by (time, tag): ``last(right_payload,
   ignorenulls=True)`` carries the most recent right row forward.
3. Keep the left rows.

Cost: one shuffle of |L|+|R| rows on the join key and a sequential
window — no row expansion, no skew amplification. The naive
range-join + row_number alternative expands each left row by every
earlier right row, which is quadratic on hot keys; at 100 TB the
union form is the only one that holds up. Ties at equal time resolve
to the right row (tag 0 sorts first → right row visible to the left
row at the same instant, i.e. inclusive "at or before").
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Window


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_time: str,
    right_time: str,
    right_payload: list[str],
) -> DataFrame:
    """For each left row, attach the payload of the latest right row
    with ``right[on] == left[on]`` and ``right[right_time] <=
    left[left_time]`` (inclusive). Returns all left columns plus the
    ``right_payload`` columns (null when no prior right row exists).
    Payload names must not collide with left column names; the right
    time column may itself be part of the payload.
    """
    lcols = left.columns
    payload_types = {p: right.schema[p].dataType for p in right_payload}

    lsel = left.select(
        F.col(on).alias("__on"),
        F.col(left_time).alias("__t"),
        F.lit(1).alias("__tag"),
        *[F.lit(None).cast(payload_types[p]).alias(p) for p in right_payload],
        *[F.col(c).alias(f"__l_{c}") for c in lcols],
    )
    rsel = right.select(
        F.col(on).alias("__on"),
        F.col(right_time).alias("__t"),
        F.lit(0).alias("__tag"),
        *[F.col(p).alias(p) for p in right_payload],
        *[
            F.lit(None).cast(left.schema[c].dataType).alias(f"__l_{c}")
            for c in lcols
        ],
    )
    u = lsel.unionByName(rsel)
    w = (
        Window.partitionBy("__on")
        .orderBy("__t", "__tag")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    for p in right_payload:
        u = u.withColumn(p, F.last(p, ignorenulls=True).over(w))
    out = u.filter(F.col("__tag") == 1)
    return out.select(
        *[F.col(f"__l_{c}").alias(c) for c in lcols],
        *right_payload,
    )
