"""delta.dataSkippingStatsColumns / delta.dataSkippingNumIndexedCols:
stats-collection table properties honored by every stats producer —
to_delta (both engines), the DML/OPTIMIZE rewrites, COMPUTE
STATISTICS, and CONVERT TO DELTA — with delta-spark's precedence
(statsColumns wins over numIndexedCols; -1 = all; default first 32).
Reads on unstatsed columns stay CORRECT (skipping just can't prune)."""

from __future__ import annotations

import json

import pytest

from dask_deltalake_spark import read_delta, to_delta
from dask_deltalake_spark.delta.log import DeltaLog
from dask_deltalake_spark.delta.protocol import stats_column_spec


def _stats_keys(path, version=None):
    """minValues key set of every add action carrying stats."""
    snap = DeltaLog(path).snapshot(version=version)
    out = []
    for a in snap.add_actions:
        assert a.stats, f"add {a.path} carries no stats"
        out.append(set(json.loads(a.stats)["minValues"]))
    return out


def _df(spark, n=20):
    return spark.range(n).selectExpr(
        "id AS k", "id * 2 AS v", "CAST(id AS STRING) AS w"
    )


def test_spec_parsing_and_precedence():
    assert stats_column_spec(None) == (32, None)
    assert stats_column_spec({}) == (32, None)
    assert stats_column_spec(
        {"delta.dataSkippingNumIndexedCols": "2"}
    ) == (2, None)
    assert stats_column_spec(
        {"delta.dataSkippingNumIndexedCols": "-1"}
    ) == (None, None)
    assert stats_column_spec(
        {"delta.dataSkippingStatsColumns": "v, w"}
    ) == (None, {"v", "w"})
    # statsColumns WINS when both are set (delta-spark precedence)
    assert stats_column_spec(
        {
            "delta.dataSkippingStatsColumns": "v",
            "delta.dataSkippingNumIndexedCols": "1",
        }
    ) == (None, {"v"})
    with pytest.warns(RuntimeWarning, match="dataSkippingNumIndexedCols"):
        assert stats_column_spec(
            {"delta.dataSkippingNumIndexedCols": "many"}
        ) == (32, None)
    # ADVICE r10: only -1 is the all-columns sentinel (delta-spark
    # rejects other negatives at property-set time) — a stray '-5'
    # must warn and keep the default, never silently widen stats
    with pytest.warns(RuntimeWarning, match="only -1 means all columns"):
        assert stats_column_spec(
            {"delta.dataSkippingNumIndexedCols": "-5"}
        ) == (32, None)


def test_stats_columns_limits_write_stats(spark, tmp_path):
    path = str(tmp_path / "t_cols")
    to_delta(
        _df(spark),
        path,
        configuration={"delta.dataSkippingStatsColumns": "v"},
    )
    for keys in _stats_keys(path):
        assert keys == {"v"}
    # filtering on the UNstatsed column is still correct — data
    # skipping simply cannot prune those files
    got = read_delta(path, filter=[("k", "<", 5)], spark=spark)
    assert got.count() == 5
    # appends inherit the table property (existing config wins)
    to_delta(_df(spark), path, mode="append")
    for keys in _stats_keys(path):
        assert keys == {"v"}


def test_num_indexed_cols(spark, tmp_path):
    path = str(tmp_path / "t_n1")
    to_delta(
        _df(spark),
        path,
        configuration={"delta.dataSkippingNumIndexedCols": "1"},
    )
    for keys in _stats_keys(path):
        assert keys == {"k"}, "first data column only"
    path2 = str(tmp_path / "t_all")
    to_delta(
        _df(spark),
        path2,
        configuration={"delta.dataSkippingNumIndexedCols": "-1"},
    )
    for keys in _stats_keys(path2):
        assert keys == {"k", "v", "w"}


def test_arrow_engine_honors_spec(spark, tmp_path):
    path = str(tmp_path / "t_arrow")
    to_delta(
        _df(spark),
        path,
        engine="arrow",
        configuration={"delta.dataSkippingStatsColumns": "w"},
    )
    for keys in _stats_keys(path):
        assert keys == {"w"}


def test_rewrites_and_recompute_honor_spec(spark, tmp_path):
    from dask_deltalake_spark import delete_where, optimize
    from dask_deltalake_spark.delta.maintenance import (
        recompute_statistics,
    )

    path = str(tmp_path / "t_rw")
    to_delta(
        _df(spark),
        path,
        configuration={"delta.dataSkippingStatsColumns": "v"},
    )
    to_delta(_df(spark), path, mode="append")
    delete_where(path, [("k", "<", 3)], spark=spark)  # COW rewrite
    for keys in _stats_keys(path):
        assert keys == {"v"}
    optimize(path, spark=spark)  # compaction rewrite
    for keys in _stats_keys(path):
        assert keys == {"v"}
    recompute_statistics(path, spark=spark)
    for keys in _stats_keys(path):
        assert keys == {"v"}
    got = read_delta(path, spark=spark)
    assert got.count() == 34  # 2x20 minus 2x3 deleted


def test_degenerate_and_unknown_names_warn():
    """',' (set but nameless) must fall back to the default with a
    warning — NOT silently disable skipping table-wide — and a name
    missing from the schema's top level (typo / nested path) warns
    instead of silently dropping the intended column's stats."""
    from pyspark.sql.types import LongType, StructField, StructType

    with pytest.warns(RuntimeWarning, match="names no columns"):
        assert stats_column_spec(
            {"delta.dataSkippingStatsColumns": " , "}
        ) == (32, None)
    schema = StructType([StructField("k", LongType())])
    with pytest.warns(RuntimeWarning, match="not a top-level column"):
        mx, cols = stats_column_spec(
            {"delta.dataSkippingStatsColumns": "k, pric"}, schema=schema
        )
    assert mx is None and cols == {"k", "pric"}


def test_accumulator_matches_batch_stats_under_specs():
    """The accumulator-vs-batch byte-equivalence (writer swap
    invariant) must hold under EVERY spec shape, not just the default:
    scoped stats_columns, numIndexedCols truncation, and the
    all-columns (-1) spec — and the scoped JSON must key exactly the
    selected columns in schema order."""
    import json as _json

    import numpy as np
    import pandas as pd

    from dask_deltalake_spark.delta.protocol import (
        StatsAccumulator,
        stats_from_pandas,
    )

    rng = np.random.default_rng(11)
    batches = []
    for i in range(3):
        n = 23 + i
        batches.append(
            pd.DataFrame(
                {
                    "a": rng.integers(-50, 50, n),
                    "b": rng.random(n) * 10,
                    "c": [f"v{rng.integers(0, 99):02d}" for _ in range(n)],
                }
            )
        )
    whole = pd.concat(batches, ignore_index=True)
    for spec in ((32, None), (1, None), (None, None), (None, {"b", "c"}),
                 (None, {"b", "missing"}), (None, set())):
        mx, cols = spec
        acc = StatsAccumulator(max_cols=mx, stats_columns=cols)
        for b in batches:
            acc.update(b)
        assert acc.to_json() == stats_from_pandas(
            whole, max_cols=mx, stats_columns=cols
        ), spec
    scoped = _json.loads(
        stats_from_pandas(whole, max_cols=None, stats_columns={"c", "a"})
    )
    assert list(scoped["minValues"]) == ["a", "c"], "schema order kept"
    one = _json.loads(stats_from_pandas(whole, max_cols=1))
    assert list(one["minValues"]) == ["a"]


def test_overwrite_schema_spec_uses_new_schema(spark, tmp_path):
    """schema_mode='overwrite' REPLACES the table schema, so the stats
    spec must resolve against the NEW schema: a statsColumns entry
    naming a column that exists only post-overwrite collects its stats
    without the spurious 'not a top-level column' warning the
    pre-overwrite schema would trigger."""
    import warnings as _w

    path = str(tmp_path / "t_ow")
    # the create legitimately warns: 'c' is not in the PRE-overwrite
    # schema — assert the warning explicitly (and keep it out of the
    # suite's warnings summary)
    with pytest.warns(RuntimeWarning, match="not a top-level column"):
        to_delta(
            spark.range(5).selectExpr("id AS a", "id AS b"),
            path,
            configuration={"delta.dataSkippingStatsColumns": "c"},
        )
    with _w.catch_warnings(record=True) as caught:
        _w.simplefilter("always")
        to_delta(
            spark.range(5).selectExpr("id AS a", "id * 3 AS c"),
            path,
            mode="overwrite",
            schema_mode="overwrite",
        )
    spurious = [
        w for w in caught if "not a top-level column" in str(w.message)
    ]
    assert not spurious, [str(w.message) for w in spurious]
    for keys in _stats_keys(path):
        assert keys == {"c"}
