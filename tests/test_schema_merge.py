"""Schema evolution on write (writer.py:_merge_table_schema —
delta-rs ``schema_mode="merge"`` / delta-spark ``mergeSchema``):
new-column append, column omission, type-conflict rejection, and the
column-mapping interaction (fresh mapping ids / physical names)."""

from __future__ import annotations

import json

import pyspark.sql.functions as F
import pytest

from dask_deltalake_spark.delta.column_mapping import (
    COLUMN_MAPPING_MAX_ID_KEY,
    PHYSICAL_NAME_KEY,
    upgrade_to_column_mapping,
)
from dask_deltalake_spark.delta.log import DeltaLog
from dask_deltalake_spark.delta.reader import read_delta
from dask_deltalake_spark.delta.writer import to_delta


def _df(spark, lo, hi):
    return spark.range(lo, hi).select(
        F.col("id").alias("k"), (F.col("id") * 10).alias("v")
    )


def test_merge_append_new_column(spark, tmp_path):
    path = str(tmp_path / "t")
    to_delta(_df(spark, 0, 5), path)
    d2 = _df(spark, 5, 8).withColumn("tag", F.lit("new"))
    to_delta(d2, path, mode="append", schema_mode="merge")
    df = read_delta(path, spark=spark)
    assert df.columns == ["k", "v", "tag"]  # new column appended LAST
    rows = {r["k"]: r["tag"] for r in df.collect()}
    assert rows[0] is None and rows[7] == "new"
    # the evolved schema and the adds landed in ONE commit
    assert DeltaLog(path).snapshot().version == 1


def test_merge_append_omitted_column(spark, tmp_path):
    path = str(tmp_path / "t")
    to_delta(_df(spark, 0, 3), path)
    to_delta(
        _df(spark, 3, 6).select("k"), path, mode="append", schema_mode="merge"
    )
    df = read_delta(path, spark=spark)
    assert df.count() == 6
    assert df.filter(F.col("v").isNull()).count() == 3
    # no new columns -> no metaData action re-commit
    meta_versions = [
        v
        for v in (0, 1)
        if any(
            "metaData" in a
            for a in DeltaLog(path).read_commit_actions(v)
        )
    ]
    assert meta_versions == [0]


def test_merge_type_conflict_raises(spark, tmp_path):
    path = str(tmp_path / "t")
    to_delta(_df(spark, 0, 3), path)
    bad = spark.range(3).select(
        F.col("id").alias("k"), F.col("id").cast("string").alias("v")
    )
    with pytest.raises(ValueError, match="type changes are not merged"):
        to_delta(bad, path, mode="append", schema_mode="merge")
    # strict default still rejects new columns outright
    with pytest.raises(ValueError, match="does not match table schema"):
        to_delta(
            _df(spark, 0, 1).withColumn("z", F.lit(1)), path, mode="append"
        )


def test_merge_void_type_raises(spark, tmp_path):
    path = str(tmp_path / "t")
    to_delta(_df(spark, 0, 3), path)
    with pytest.raises(ValueError, match="void"):
        to_delta(
            _df(spark, 0, 1).withColumn("z", F.lit(None)),
            path,
            mode="append",
            schema_mode="merge",
        )


def test_merge_on_column_mapped_table(spark, tmp_path):
    path = str(tmp_path / "t")
    to_delta(_df(spark, 0, 4), path)
    upgrade_to_column_mapping(path, spark=spark)
    d2 = _df(spark, 4, 6).withColumn("score", (F.col("k") * 2).cast("int"))
    to_delta(d2, path, mode="append", schema_mode="merge")
    snap = DeltaLog(path).snapshot()
    fields = json.loads(snap.metadata.schema_string)["fields"]
    by_name = {f["name"]: f for f in fields}
    # the merged-in column got a fresh col-<uuid> physical name and
    # the mapping high-water id advanced
    assert by_name["score"]["metadata"][PHYSICAL_NAME_KEY].startswith("col-")
    assert snap.metadata.configuration[COLUMN_MAPPING_MAX_ID_KEY] == "3"
    df = read_delta(path, spark=spark)
    rows = {r["k"]: r["score"] for r in df.collect()}
    assert rows[0] is None and rows[5] == 10
    # follow-up append with the evolved schema writes under the
    # physical name and reads back intact
    to_delta(
        _df(spark, 6, 7).withColumn("score", F.lit(99)),
        path,
        mode="append",
        schema_mode="merge",
    )
    assert (
        read_delta(path, spark=spark).filter(F.col("score") == 99).count()
        == 1
    )


def test_merge_overwrite_keeps_union_schema(spark, tmp_path):
    path = str(tmp_path / "t")
    to_delta(_df(spark, 0, 4), path)
    d2 = _df(spark, 0, 2).withColumn("tag", F.lit("ow"))
    to_delta(d2, path, mode="overwrite", schema_mode="merge")
    df = read_delta(path, spark=spark)
    assert df.columns == ["k", "v", "tag"]
    assert df.count() == 2  # overwrite replaced the data...
    assert df.filter(F.col("tag") == "ow").count() == 2  # ...kept the union schema


def test_merge_composes_with_row_tracking(spark, tmp_path):
    """A schema-merge append on a row-tracked table must land the
    evolved schema, the fresh baseRowId ranges, AND the advanced high
    water mark in ONE commit."""
    from dask_deltalake_spark.delta.rowtracking import (
        enable_row_tracking,
        row_id_high_water_mark,
    )

    path = str(tmp_path / "t")
    to_delta(_df(spark, 0, 4).coalesce(1), path)
    enable_row_tracking(path)
    to_delta(
        _df(spark, 4, 6).withColumn("tag", F.lit("new")).coalesce(1),
        path,
        mode="append",
        schema_mode="merge",
    )
    snap = DeltaLog(path).snapshot()
    assert snap.version == 2
    acts = DeltaLog(path).read_commit_actions(2)
    assert any("metaData" in a for a in acts)  # evolved schema
    assert any("domainMetadata" in a for a in acts)  # advanced mark
    assert row_id_high_water_mark(snap) == 5
    df = read_delta(path, spark=spark, with_row_ids=True)
    assert df.columns == ["k", "v", "tag", "_row_id", "_row_commit_version"]
    assert sorted(r["_row_id"] for r in df.collect()) == list(range(6))


def test_clone_of_clone_resolves_through(spark, tmp_path):
    """Cloning a clone re-resolves already-absolute add paths
    unchanged — grandchild reads the ORIGINAL files."""
    from dask_deltalake_spark.delta.clone import shallow_clone

    a, b, c = (str(tmp_path / x) for x in ("a", "b", "c"))
    to_delta(_df(spark, 0, 6).coalesce(1), a)
    shallow_clone(a, b)
    shallow_clone(b, c)
    snap = DeltaLog(c).snapshot()
    (only,) = snap.add_actions
    assert only.path.startswith(a)  # points at the ROOT table's file
    assert read_delta(c, spark=spark).count() == 6
