"""CHECK constraints (delta/constraints.py): add/drop, protocol
elevation, and real enforcement on every write path."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from dask_deltalake_spark.delta.constraints import (
    ConstraintViolationError,
    add_constraint,
    drop_constraint,
    table_constraints,
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
    return (
        spark.range(lo, hi)
        .withColumn("part", (F.col("id") % 2).cast("int"))
        .withColumn("val", F.col("id") * 10)
    )


def test_add_constraint_validates_and_elevates_protocol(spark, tmp_path):
    path = str(tmp_path / "t")
    to_delta(_df(spark, 0, 100), path)
    add_constraint(path, "val_nonneg", "val >= 0", spark=spark)
    snap = DeltaLog(path).snapshot()
    assert snap.protocol.min_writer_version == 3
    assert table_constraints(snap.metadata) == {"val_nonneg": "val >= 0"}
    # an expression existing rows violate cannot be added
    with pytest.raises(ConstraintViolationError, match="existing row"):
        add_constraint(path, "val_big", "val > 500", spark=spark)
    with pytest.raises(ValueError, match="already exists"):
        add_constraint(path, "val_nonneg", "val >= 0", spark=spark)


def test_appends_and_dml_enforce(spark, tmp_path):
    path = str(tmp_path / "t")
    to_delta(_df(spark, 0, 100), path)
    add_constraint(path, "val_cap", "val <= 2000", spark=spark)

    # violating append fails atomically — nothing lands
    bad = _df(spark, 0, 5).withColumn("val", F.lit(9999).cast("long"))
    with pytest.raises(ConstraintViolationError, match="val_cap"):
        to_delta(bad, path, mode="append")
    assert read_delta(path, spark=spark).count() == 100
    assert DeltaLog(path).latest_version() == 1  # only the ADD CONSTRAINT

    # clean append passes
    to_delta(_df(spark, 100, 110), path, mode="append")
    assert read_delta(path, spark=spark).count() == 110

    # COW update to a violating value fails; valid one passes
    with pytest.raises(ConstraintViolationError, match="val_cap"):
        update_where(path, [("id", "<", 5)], {"val": F.lit(5000)}, spark=spark)
    update_where(path, [("id", "<", 5)], {"val": F.lit(2000)}, spark=spark)
    assert (
        read_delta(path, filter=[("id", "<", 5)], spark=spark)
        .agg(F.sum("val"))
        .first()[0]
        == 10000
    )
    # merge with violating source fails
    with pytest.raises(ConstraintViolationError, match="val_cap"):
        merge_into(
            path,
            _df(spark, 200, 203).withColumn("val", F.lit(90000).cast("long")),
            keys=["id"],
            spark=spark,
        )
    # deletes never violate row constraints
    delete_where(path, [("id", ">=", 105)], spark=spark)
    assert read_delta(path, spark=spark).count() == 105


def test_mor_update_enforces(spark, tmp_path):
    path = str(tmp_path / "t")
    to_delta(_df(spark, 0, 100), path)
    add_constraint(path, "val_cap", "val <= 2000", spark=spark)
    with pytest.raises(ConstraintViolationError, match="val_cap"):
        update_where(
            path, [("id", "<", 5)], {"val": F.lit(99999)},
            spark=spark, strategy="merge-on-read",
        )
    assert read_delta(path, spark=spark).count() == 100
    update_where(
        path, [("id", "<", 5)], {"val": F.lit(7)},
        spark=spark, strategy="merge-on-read",
    )
    assert (
        read_delta(path, filter=[("id", "<", 5)], spark=spark)
        .agg(F.sum("val")).first()[0] == 35
    )


def test_create_with_constraint_and_drop(spark, tmp_path):
    path = str(tmp_path / "t")
    with pytest.raises(ConstraintViolationError):
        to_delta(
            _df(spark, 0, 10),
            path,
            configuration={"delta.constraints.pos": "val > 50"},
        )
    to_delta(
        _df(spark, 0, 10),
        str(tmp_path / "t2"),
        configuration={"delta.constraints.pos": "val >= 0"},
    )
    # drop lifts enforcement (protocol stays elevated, like delta-spark)
    p3 = str(tmp_path / "t3")
    to_delta(_df(spark, 0, 10), p3)
    add_constraint(p3, "cap", "val < 100", spark=spark)
    drop_constraint(p3, "cap", spark=spark)
    to_delta(_df(spark, 0, 5).withColumn("val", F.lit(5000).cast("long")), p3, mode="append")
    assert read_delta(p3, spark=spark).count() == 15
    assert DeltaLog(p3).snapshot().protocol.min_writer_version == 3
    with pytest.raises(ValueError, match="does not exist"):
        drop_constraint(p3, "cap", spark=spark)
