"""Generated columns (delta/generated.py): compute-on-write,
verify-on-provide, writer v4 protocol, derived partitioning, and DML
recompute/enforcement."""

from __future__ import annotations

import json

import pyspark.sql.functions as F
import pytest

from dask_deltalake_spark.delta.generated import (
    GENERATION_EXPRESSION_KEY,
    GeneratedColumnViolationError,
    generated_columns,
)
from dask_deltalake_spark.delta.log import DeltaLog
from dask_deltalake_spark.delta.mutate import merge_into, update_where
from dask_deltalake_spark.delta.reader import read_delta
from dask_deltalake_spark.delta.writer import to_delta


def _df(spark, lo, hi):
    return spark.range(lo, hi).select(
        F.col("id").alias("k"), (F.col("id") * 10).alias("v")
    )


GEN = {"v_bucket": "CAST(v % 3 AS INT)"}


def test_create_computes_missing_and_elevates_protocol(spark, tmp_path):
    path = str(tmp_path / "t")
    to_delta(_df(spark, 0, 30), path, generated_columns=GEN)
    snap = DeltaLog(path).snapshot()
    assert snap.protocol.min_writer_version == 4
    assert generated_columns(snap.metadata) == GEN
    # expression rides in the field metadata per the public spec
    fields = {
        f["name"]: f for f in json.loads(snap.metadata.schema_string)["fields"]
    }
    assert (
        fields["v_bucket"]["metadata"][GENERATION_EXPRESSION_KEY]
        == GEN["v_bucket"]
    )
    out = read_delta(path, spark=spark)
    assert out.filter(F.col("v_bucket") != (F.col("v") % 3)).count() == 0
    assert out.count() == 30


def test_append_computes_and_verifies(spark, tmp_path):
    path = str(tmp_path / "t")
    to_delta(_df(spark, 0, 10), path, generated_columns=GEN)
    # append WITHOUT the generated column: engine derives it
    to_delta(_df(spark, 10, 20), path, mode="append")
    out = read_delta(path, spark=spark)
    assert out.count() == 20
    assert out.filter(F.col("v_bucket").isNull()).count() == 0
    # append WITH correct values: admitted
    ok = _df(spark, 20, 30).withColumn(
        "v_bucket", (F.col("v") % 3).cast("int")
    )
    to_delta(ok, path, mode="append")
    assert read_delta(path, spark=spark).count() == 30
    # append WITH wrong values: rejected atomically
    bad = _df(spark, 30, 40).withColumn("v_bucket", F.lit(99).cast("int"))
    with pytest.raises(GeneratedColumnViolationError):
        to_delta(bad, path, mode="append")
    assert read_delta(path, spark=spark).count() == 30
    assert len(DeltaLog(path).versions()) == 3


def test_generated_partition_column(spark, tmp_path):
    """The derived-partition pattern: partition_by a generated column
    the frame never carries."""
    path = str(tmp_path / "t")
    to_delta(
        _df(spark, 0, 30),
        path,
        partition_by=["v_bucket"],
        generated_columns=GEN,
    )
    snap = DeltaLog(path).snapshot()
    assert snap.metadata.partition_columns == ["v_bucket"]
    pruned = read_delta(
        path, filter=[("v_bucket", "==", 1)], spark=spark
    )
    assert pruned.count() == 10
    assert pruned.filter(F.col("v") % 3 != 1).count() == 0
    # appends keep deriving the partition value
    to_delta(_df(spark, 30, 60), path, mode="append")
    assert read_delta(
        path, filter=[("v_bucket", "==", 1)], spark=spark
    ).count() == 20


def test_generated_kwarg_is_create_only(spark, tmp_path):
    path = str(tmp_path / "t")
    to_delta(_df(spark, 0, 10), path, generated_columns=GEN)
    with pytest.raises(ValueError, match="CREATE-only"):
        to_delta(
            _df(spark, 10, 20), path, mode="append", generated_columns=GEN
        )


def test_update_recomputes_and_refuses_explicit_set(spark, tmp_path):
    path = str(tmp_path / "t")
    to_delta(_df(spark, 0, 30), path, generated_columns=GEN)
    with pytest.raises(ValueError, match="GENERATED ALWAYS"):
        update_where(path, [("k", "<", 5)], {"v_bucket": 0}, spark=spark)
    # updating the SOURCE column re-derives the generated one
    update_where(path, [("k", "<", 5)], {"v": F.col("v") + 1}, spark=spark)
    out = read_delta(path, spark=spark)
    assert out.filter(F.col("v_bucket") != (F.col("v") % 3)).count() == 0
    assert out.filter((F.col("k") < 5) & (F.col("v") % 10 != 1)).count() == 0


def test_update_mor_recomputes(spark, tmp_path):
    path = str(tmp_path / "t")
    to_delta(_df(spark, 0, 30), path, generated_columns=GEN)
    update_where(
        path,
        [("k", "<", 5)],
        {"v": F.col("v") + 1},
        spark=spark,
        strategy="merge-on-read",
    )
    out = read_delta(path, spark=spark)
    assert out.count() == 30
    assert out.filter(F.col("v_bucket") != (F.col("v") % 3)).count() == 0


def test_merge_verifies_source_values(spark, tmp_path):
    path = str(tmp_path / "t")
    to_delta(_df(spark, 0, 30), path, generated_columns=GEN)
    good = _df(spark, 25, 35).withColumn(
        "v_bucket", (F.col("v") % 3).cast("int")
    )
    merge_into(path, good, keys=["k"], spark=spark)
    assert read_delta(path, spark=spark).count() == 35
    bad = _df(spark, 40, 45).withColumn("v_bucket", F.lit(77).cast("int"))
    with pytest.raises(GeneratedColumnViolationError):
        merge_into(path, bad, keys=["k"], spark=spark)
    assert read_delta(path, spark=spark).count() == 35


def test_generated_partition_filter_inference(spark, tmp_path):
    """Predicates on the SOURCE column of a generated partition column
    must prune partitions at the metadata level (delta-spark's
    OptimizeGeneratedColumn): a ts-range filter over a table
    partitioned on event_date = CAST(ts AS DATE) scans only the
    matching date partitions — without the user ever naming
    event_date."""
    import pyspark.sql.functions as F

    from dask_deltalake_spark.delta.reader import read_delta
    from dask_deltalake_spark.delta.writer import to_delta

    path = str(tmp_path / "t")
    df = spark.range(96).select(
        (
            F.to_timestamp(F.lit("2024-03-01 00:00:00"))
            + F.make_interval(hours=F.col("id"))
        ).alias("ts"),
        F.col("id").alias("v"),
    )
    to_delta(
        df,
        path,
        partition_by=["event_date"],
        generated_columns={"event_date": "CAST(ts AS DATE)"},
    )

    from datetime import datetime

    got = read_delta(
        path,
        filter=[
            ("ts", ">=", datetime(2024, 3, 2, 6, 0)),
            ("ts", "<", datetime(2024, 3, 3, 18, 0)),
        ],
        spark=spark,
    )
    # correctness: exactly the 36 hours in range
    assert got.count() == 36
    # pruning: only the 2 matching date partitions are in the scan
    scanned_dirs = {
        f.rsplit("/", 2)[-2] for f in got.inputFiles()
    }
    assert scanned_dirs == {"event_date=2024-03-02", "event_date=2024-03-03"}

    # equality + IN map through too
    got_eq = read_delta(
        path, filter=[("ts", "==", datetime(2024, 3, 4, 0, 0))], spark=spark
    )
    assert got_eq.count() == 1
    assert {
        f.rsplit("/", 2)[-2] for f in got_eq.inputFiles()
    } == {"event_date=2024-03-04"}

    # unsupported shapes / ops derive nothing but stay CORRECT
    got_ne = read_delta(
        path, filter=[("ts", "!=", datetime(2024, 3, 4, 0, 0))], spark=spark
    )
    assert got_ne.count() == 95


def test_inference_handles_offset_bearing_literals(spark, tmp_path):
    """A timezone-offset literal must derive the UTC date partition
    (the session clock), not its own wall-clock date — otherwise the
    prune silently drops files containing matching rows."""
    from datetime import datetime, timedelta, timezone

    import pyspark.sql.functions as F

    from dask_deltalake_spark.delta.reader import read_delta
    from dask_deltalake_spark.delta.writer import to_delta

    path = str(tmp_path / "t")
    df = spark.range(48).select(
        (
            F.to_timestamp(F.lit("2024-03-01 00:00:00"))
            + F.make_interval(hours=F.col("id"))
        ).alias("ts"),
        F.col("id").alias("v"),
    )
    to_delta(
        df,
        path,
        partition_by=["event_date"],
        generated_columns={"event_date": "CAST(ts AS DATE)"},
    )
    # 2024-03-01T23:30-05:00 == 2024-03-02T04:30Z -> partition 03-02
    aware = datetime(2024, 3, 1, 23, 30, tzinfo=timezone(timedelta(hours=-5)))
    got = read_delta(path, filter=[("ts", ">=", aware)], spark=spark)
    # == 2024-03-02T04:30Z: hours 29..47 of the series match (19 rows)
    assert got.count() == 19
    # and the prune keeps ONLY the 03-02 partition — derived from the
    # UTC instant, not the literal's own wall-clock date (03-01)
    dirs = {f.rsplit("/", 2)[-2] for f in got.inputFiles()}
    assert dirs == {"event_date=2024-03-02"}
