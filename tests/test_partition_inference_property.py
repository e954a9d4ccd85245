"""Property-based soundness of derived partition pruning
(delta/generated.py infer_partition_predicates): for random
timestamps, operators, and generation shapes, a row satisfying the
SOURCE predicate must always land in a partition the DERIVED
predicates keep — the inference may only ever be conservative, never
exclude a matching row's partition."""

from __future__ import annotations

import json
from datetime import datetime, timedelta
from types import SimpleNamespace

from hypothesis import given, settings
from hypothesis import strategies as st

from dask_deltalake_spark.delta.generated import (
    _parse_generation,
    infer_partition_predicates,
)
from dask_deltalake_spark.delta.protocol import (
    AddAction,
    prune_partitions,
)

_SHAPE_EXPRS = [
    ("CAST(ts AS DATE)", lambda d: d.strftime("%Y-%m-%d")),
    ("DATE_TRUNC('MONTH', ts)", lambda d: d.replace(day=1).strftime("%Y-%m-%d 00:00:00")),
    ("YEAR(ts)", lambda d: str(d.year)),
    ("MONTH(ts)", lambda d: str(d.month)),
    ("DATE_FORMAT(ts, 'yyyy-MM')", lambda d: d.strftime("%Y-%m")),
]

_BASE = datetime(2023, 6, 15)


def _metadata(gexpr):
    schema = {
        "type": "struct",
        "fields": [
            {"name": "ts", "type": "timestamp", "nullable": True,
             "metadata": {}},
            {"name": "g", "type": "string", "nullable": True,
             "metadata": {"delta.generationExpression": gexpr}},
        ],
    }
    return SimpleNamespace(
        schema_string=json.dumps(schema), partition_columns=["g"]
    )


@settings(max_examples=300, deadline=None)
@given(
    shape=st.integers(min_value=0, max_value=len(_SHAPE_EXPRS) - 1),
    row_minutes=st.integers(min_value=-400_000, max_value=400_000),
    lit_minutes=st.integers(min_value=-400_000, max_value=400_000),
    op=st.sampled_from(["==", "<", "<=", ">", ">=", "!="]),
)
def test_inference_never_excludes_a_matching_row(
    shape, row_minutes, lit_minutes, op
):
    gexpr, partval = _SHAPE_EXPRS[shape]
    row_ts = _BASE + timedelta(minutes=row_minutes)
    lit_ts = _BASE + timedelta(minutes=lit_minutes)
    # does the ROW satisfy the source predicate?
    cmp = {
        "==": row_ts == lit_ts, "<": row_ts < lit_ts,
        "<=": row_ts <= lit_ts, ">": row_ts > lit_ts,
        ">=": row_ts >= lit_ts, "!=": row_ts != lit_ts,
    }[op]
    if not cmp:
        return  # only matching rows constrain soundness
    md = _metadata(gexpr)
    dnf = infer_partition_predicates([[("ts", op, lit_ts)]], md)
    # the file holding the row carries the GENERATED partition value
    add = AddAction(
        path="f.parquet", size=1,
        partition_values={"g": partval(row_ts)},
        modification_time=0, data_change=True, stats=None,
    )
    kept = prune_partitions([add], dnf)
    assert kept, (
        f"derived predicates excluded a matching row's partition: "
        f"shape={gexpr} op={op} row={row_ts} lit={lit_ts} dnf={dnf}"
    )


def test_all_shapes_parse():
    for gexpr, _ in _SHAPE_EXPRS:
        assert _parse_generation(gexpr) is not None


@settings(max_examples=200, deadline=None)
@given(
    shape=st.integers(min_value=0, max_value=len(_SHAPE_EXPRS) - 1),
    row_minutes=st.integers(min_value=-400_000, max_value=400_000),
    lit_minutes=st.integers(min_value=-400_000, max_value=400_000),
    offset_h=st.integers(min_value=-12, max_value=12),
    op=st.sampled_from(["==", "<", "<=", ">", ">="]),
)
def test_offset_literals_compare_as_instants(
    shape, row_minutes, lit_minutes, offset_h, op
):
    """Timezone-offset literals denote INSTANTS; the derived partition
    predicates must be computed from the UTC clock (the engine's), so
    a matching row's partition is never excluded regardless of the
    literal's offset."""
    from datetime import timezone as _tz

    gexpr, partval = _SHAPE_EXPRS[shape]
    row_ts = _BASE + timedelta(minutes=row_minutes)  # naive = UTC clock
    lit_utc = _BASE + timedelta(minutes=lit_minutes)
    # same instant, expressed with a wall-clock offset
    lit_aware = (lit_utc + timedelta(hours=offset_h)).replace(
        tzinfo=_tz(timedelta(hours=offset_h))
    )
    cmp = {
        "==": row_ts == lit_utc, "<": row_ts < lit_utc,
        "<=": row_ts <= lit_utc, ">": row_ts > lit_utc,
        ">=": row_ts >= lit_utc,
    }[op]
    if not cmp:
        return
    md = _metadata(gexpr)
    dnf = infer_partition_predicates([[("ts", op, lit_aware)]], md)
    add = AddAction(
        path="f.parquet", size=1,
        partition_values={"g": partval(row_ts)},
        modification_time=0, data_change=True, stats=None,
    )
    assert prune_partitions([add], dnf), (
        f"offset literal excluded a matching row's partition: "
        f"shape={gexpr} op={op} row={row_ts} lit={lit_aware}"
    )
