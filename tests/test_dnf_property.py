"""Property-based check of the DNF filter path (reference
core.py:209-212 semantics: list of tuples = AND, list of lists =
OR-of-ANDs, ops ==,!=,<,>,<=,>=,in,not in).

For arbitrary DNF filters over a written Delta table, the engine's
pruned + filtered read must return exactly the rows a pandas
evaluation of the same DNF selects. This exercises the whole chain:
partition pruning (exact) → stats pruning (conservative) → Catalyst
residual filter.
"""

from __future__ import annotations

import pandas as pd
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

import dask_deltalake_spark as ddl

COLS = {
    "part_col": [0, 1, 2, 3],
    "val": list(range(-5, 15)),
    "name": ["aa", "bb", "cc", "dd"],
}
OPS = ["==", "!=", "<", ">", "<=", ">="]


def _clause(col: str, values):
    return st.tuples(
        st.just(col),
        st.sampled_from(OPS + ["in", "not in"]),
        st.sampled_from(values) | st.lists(
            st.sampled_from(values), min_size=0, max_size=3
        ),
    ).map(
        lambda t: (t[0], t[1], t[2])
        if t[1] in ("in", "not in") and isinstance(t[2], list)
        else (t[0], t[1] if t[1] not in ("in", "not in") else "==",
              t[2][0] if isinstance(t[2], list) and t[2] else
              (t[2] if not isinstance(t[2], list) else values[0]))
    )


clause = st.one_of(
    _clause("part_col", COLS["part_col"]),
    _clause("val", COLS["val"]),
    _clause("name", COLS["name"]),
)
conjunction = st.lists(clause, min_size=1, max_size=3)
dnf = st.one_of(
    conjunction,                                   # flat AND list
    st.lists(conjunction, min_size=1, max_size=3)  # OR of ANDs
)


def _pd_clause(df: pd.DataFrame, c):
    col, op, val = c
    s = df[col]
    if op == "==":
        return s == val
    if op == "!=":
        return s != val
    if op == "<":
        return s < val
    if op == ">":
        return s > val
    if op == "<=":
        return s <= val
    if op == ">=":
        return s >= val
    if op == "in":
        return s.isin(list(val))
    if op == "not in":
        return ~s.isin(list(val))
    raise AssertionError(op)


def _pd_eval(df: pd.DataFrame, filt) -> pd.DataFrame:
    if isinstance(filt[0], tuple):
        filt = [filt]
    mask = None
    for conj in filt:
        m = None
        for c in conj:
            cm = _pd_clause(df, c)
            m = cm if m is None else (m & cm)
        mask = m if mask is None else (mask | m)
    return df[mask]


@pytest.fixture(scope="module")
def dnf_table(spark, tmp_path_factory):
    import itertools

    rows = [
        (p, v, n)
        for p, v, n in itertools.product(
            COLS["part_col"], COLS["val"], COLS["name"]
        )
    ]
    pdf = pd.DataFrame(rows, columns=["part_col", "val", "name"])
    path = str(tmp_path_factory.mktemp("dnf") / "t")
    df = spark.createDataFrame(pdf)
    ddl.to_delta(df, path, partition_by=["part_col"])
    return path, pdf


@settings(
    max_examples=40,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(filt=dnf)
def test_dnf_filter_matches_pandas(spark, dnf_table, filt):
    path, pdf = dnf_table
    got = (
        ddl.read_delta(path, filter=filt, spark=spark)
        .toPandas()
        .sort_values(["part_col", "val", "name"])
        .reset_index(drop=True)
    )
    want = (
        _pd_eval(pdf, filt)
        .sort_values(["part_col", "val", "name"])
        .reset_index(drop=True)
    )
    got = got[["part_col", "val", "name"]].astype({"part_col": "int64"})
    want = want[["part_col", "val", "name"]].astype({"part_col": "int64"})
    pd.testing.assert_frame_equal(got, want)
