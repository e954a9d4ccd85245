"""Identity columns (delta/identity.py): shuffle-free assignment,
high-water-mark advancement in-commit, writer v6 protocol, explicit
insert refusal, and DML guards."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from dask_deltalake_spark.delta.identity import (
    IdentityColumnError,
    identity_columns,
)
from dask_deltalake_spark.delta.log import DeltaLog
from dask_deltalake_spark.delta.mutate import (
    delete_where,
    merge_into,
    update_where,
)
from dask_deltalake_spark.delta.reader import read_delta
from dask_deltalake_spark.delta.writer import to_delta


def _df(spark, lo, hi):
    return spark.range(lo, hi).select(
        F.col("id").alias("k"), (F.col("id") * 10).alias("v")
    )


IDENT = {"row_id": {"start": 100, "step": 1}}


def test_create_assigns_contiguous_and_elevates_protocol(spark, tmp_path):
    path = str(tmp_path / "t")
    to_delta(_df(spark, 0, 50), path, identity_columns=IDENT)
    snap = DeltaLog(path).snapshot()
    assert snap.protocol.min_writer_version == 6
    decls = identity_columns(snap.metadata)
    assert decls["row_id"]["start"] == 100
    assert decls["row_id"]["high_water_mark"] == 149
    out = read_delta(path, spark=spark)
    ids = sorted(r["row_id"] for r in out.select("row_id").collect())
    assert ids == list(range(100, 150))


def test_append_continues_past_high_water_mark(spark, tmp_path):
    path = str(tmp_path / "t")
    to_delta(_df(spark, 0, 30), path, identity_columns=IDENT)
    to_delta(_df(spark, 30, 50), path, mode="append")
    snap = DeltaLog(path).snapshot()
    assert identity_columns(snap.metadata)["row_id"]["high_water_mark"] == 149
    out = read_delta(path, spark=spark)
    ids = sorted(r["row_id"] for r in out.select("row_id").collect())
    assert ids == list(range(100, 150))  # unique, dense, no reuse
    # hwm advanced in the SAME commit as the adds (one version per write)
    assert len(DeltaLog(path).versions()) == 2


def test_step_and_start(spark, tmp_path):
    path = str(tmp_path / "t")
    to_delta(
        _df(spark, 0, 10),
        path,
        identity_columns={"row_id": {"start": 0, "step": 5}},
    )
    ids = sorted(
        r["row_id"]
        for r in read_delta(path, spark=spark).select("row_id").collect()
    )
    assert ids == list(range(0, 50, 5))
    snap = DeltaLog(path).snapshot()
    assert identity_columns(snap.metadata)["row_id"]["high_water_mark"] == 45


def test_explicit_insert_refused_unless_allowed(spark, tmp_path):
    path = str(tmp_path / "t")
    to_delta(_df(spark, 0, 10), path, identity_columns=IDENT)
    explicit = _df(spark, 10, 12).withColumn("row_id", F.lit(7).cast("long"))
    with pytest.raises(IdentityColumnError, match="explicit"):
        to_delta(explicit, path, mode="append")
    # allow_explicit table admits provided values and keeps hwm
    path2 = str(tmp_path / "t2")
    to_delta(
        _df(spark, 0, 10),
        path2,
        identity_columns={
            "row_id": {"start": 1, "step": 1, "allow_explicit": True}
        },
    )
    explicit2 = _df(spark, 10, 12).withColumn(
        "row_id", F.lit(1000) + F.col("k")
    )
    to_delta(explicit2, path2, mode="append")
    assert read_delta(path2, spark=spark).filter(
        F.col("row_id") >= 1000
    ).count() == 2


def test_dml_guards_and_preservation(spark, tmp_path):
    path = str(tmp_path / "t")
    to_delta(_df(spark, 0, 30), path, identity_columns=IDENT)
    with pytest.raises(ValueError, match="IDENTITY"):
        update_where(path, [("k", "<", 5)], {"row_id": 0}, spark=spark)
    update_where(path, [("k", "<", 5)], {"v": F.lit(-1)}, spark=spark)
    out = read_delta(path, spark=spark)
    ids = sorted(r["row_id"] for r in out.select("row_id").collect())
    assert ids == list(range(100, 130))  # rewrite preserved the values
    delete_where(path, [("k", ">=", 25)], spark=spark)
    assert read_delta(path, spark=spark).count() == 25
    src = _df(spark, 0, 2).withColumn("row_id", F.lit(100) + F.col("k"))
    with pytest.raises(IdentityColumnError, match="allowExplicitInsert"):
        merge_into(path, src, keys=["k"], spark=spark)


def test_identity_kwarg_is_create_only(spark, tmp_path):
    path = str(tmp_path / "t")
    to_delta(_df(spark, 0, 10), path, identity_columns=IDENT)
    with pytest.raises(ValueError, match="CREATE-only"):
        to_delta(
            _df(spark, 10, 20), path, mode="append", identity_columns=IDENT
        )
