"""Column mapping (delta/column_mapping.py): metadata-only upgrade +
rename, logical reads over physical files, physical-name appends,
pruning on renamed partition columns, per-path protocol gating."""

from __future__ import annotations

import json
import os

import pyspark.sql.functions as F
import pytest

from dask_deltalake_spark.delta.column_mapping import (
    rename_column,
    upgrade_to_column_mapping,
)
from dask_deltalake_spark.delta.log import DeltaLog
from dask_deltalake_spark.delta.protocol import DeltaProtocolError
from dask_deltalake_spark.delta.reader import read_delta
from dask_deltalake_spark.delta.writer import to_delta


def _df(spark, lo, hi):
    return (
        spark.range(lo, hi)
        .withColumn("part", (F.col("id") % 2).cast("int"))
        .withColumn("val", F.col("id") * 10)
    )


def _files(path):
    return {
        os.path.join(r, f)
        for r, _, fs in os.walk(path)
        for f in fs
        if f.endswith(".parquet") and "_delta_log" not in r
    }


def test_upgrade_is_metadata_only_and_idempotent(spark, tmp_path):
    path = str(tmp_path / "t")
    to_delta(_df(spark, 0, 100), path, partition_by=["part"])
    before = _files(path)
    v1 = upgrade_to_column_mapping(path)
    assert v1 == 1
    assert _files(path) == before  # no data rewritten
    assert upgrade_to_column_mapping(path) == 1  # idempotent, no commit
    snap = DeltaLog(path).snapshot()
    assert snap.protocol.min_reader_version == 2
    assert snap.protocol.min_writer_version == 5
    cfg = snap.metadata.configuration
    assert cfg["delta.columnMapping.mode"] == "name"
    fields = json.loads(snap.metadata.schema_string)["fields"]
    assert all(
        f["metadata"]["delta.columnMapping.physicalName"] == f["name"]
        for f in fields
    )
    ids = [f["metadata"]["delta.columnMapping.id"] for f in fields]
    assert ids == [1, 2, 3] and cfg["delta.columnMapping.maxColumnId"] == "3"


def test_rename_read_append_roundtrip(spark, tmp_path):
    path = str(tmp_path / "t")
    to_delta(_df(spark, 0, 100), path, partition_by=["part"])
    rename_column(path, "val", "value")      # auto-upgrades
    rename_column(path, "part", "bucket")    # partition column
    snap = DeltaLog(path).snapshot()
    assert snap.metadata.partition_columns == ["bucket"]  # logical

    df = read_delta(path, spark=spark)
    assert df.columns == ["id", "bucket", "value"]
    assert df.count() == 100
    assert df.agg(F.sum("value")).first()[0] == sum(i * 10 for i in range(100))

    # pre-upgrade version still reads under its own (old) schema
    v0 = read_delta(path, version=0, spark=spark)
    assert v0.columns == ["id", "part", "val"]

    # append arrives with LOGICAL names; files must get PHYSICAL names
    before = _files(path)
    new = (
        spark.range(100, 110)
        .withColumn("bucket", (F.col("id") % 2).cast("int"))
        .withColumn("value", F.col("id") * 10)
    )
    to_delta(new, path, mode="append")
    added = _files(path) - before
    assert added
    import pyarrow.parquet as pq

    for f in added:
        names = set(pq.read_schema(f).names)
        assert "val" in names and "value" not in names  # physical
        assert "part=" in f and "bucket=" not in f      # physical hive dir
    assert read_delta(path, spark=spark).count() == 110


def test_pruning_on_renamed_partition_column(spark, tmp_path):
    path = str(tmp_path / "t")
    to_delta(_df(spark, 0, 100), path, partition_by=["part"])
    rename_column(path, "part", "bucket")
    df = read_delta(path, filter=[("bucket", "==", 1)], spark=spark)
    assert df.count() == 50
    # partition pruning happened at the driver: only part=1 files scan
    assert all("part=1" in f for f in df.inputFiles())
    # stats skipping via physical names on a renamed data column
    rename_column(path, "val", "value")
    hi = read_delta(path, filter=[("value", ">", 985)], spark=spark)
    assert hi.count() == 1  # only id=99 (val 990)


def test_mapped_table_path_support_matrix(spark, tmp_path):
    """Every path translates the mapping: the python datasource reads
    logical columns, and OPTIMIZE compacts under physical names."""
    import pyarrow.parquet as pq

    path = str(tmp_path / "t")
    to_delta(_df(spark, 0, 20).repartition(4), path)
    rename_column(path, "val", "value")
    from dask_deltalake_spark.delta.log import DeltaLog
    from dask_deltalake_spark.delta.maintenance import optimize

    res = optimize(path, spark=spark)
    assert res["numFilesAdded"] <= res["numFilesRemoved"]
    out = read_delta(path, spark=spark)
    assert out.columns == ["id", "part", "value"] and out.count() == 20
    # compacted files carry PHYSICAL names
    for a in DeltaLog(path).snapshot().add_actions:
        names = set(pq.read_schema(os.path.join(path, a.path)).names)
        assert "val" in names and "value" not in names
    # the python datasource DOES translate names — reads fine
    from dask_deltalake_spark.sources import register_python_datasource

    register_python_datasource(spark)
    assert (
        spark.read.format("delta_py").option("path", path).load().count() == 20
    )


def test_mapped_table_dml(spark, tmp_path):
    """Full DML on a renamed (column-mapped) table: COW delete/update/
    merge and MoR delete/update all translate logical predicates and
    write physical-named files."""
    import pyarrow.parquet as pq

    from dask_deltalake_spark.delta.mutate import (
        delete_where,
        merge_into,
        update_where,
    )

    path = str(tmp_path / "t")
    to_delta(_df(spark, 0, 100), path, partition_by=["part"])
    rename_column(path, "val", "value")
    rename_column(path, "part", "bucket")

    delete_where(path, [("id", ">=", 90)], spark=spark)  # COW
    assert read_delta(path, spark=spark).count() == 90
    update_where(path, [("id", "<", 10)], {"value": F.col("value") + 1}, spark=spark)
    out = read_delta(path, spark=spark)
    assert out.agg(F.sum("value")).first()[0] == sum(
        i * 10 + (1 if i < 10 else 0) for i in range(90)
    )
    src = (
        spark.range(100, 105)
        .withColumn("bucket", (F.col("id") % 2).cast("int"))
        .withColumn("value", F.col("id") * 10)
    )
    merge_into(path, src, keys=["id"], spark=spark)
    assert read_delta(path, spark=spark).count() == 95
    # MoR on the mapped table
    res = delete_where(
        path, [("id", "<", 5)], spark=spark, strategy="merge-on-read"
    )
    assert res["numDeletedRows"] == 5
    assert read_delta(path, spark=spark).count() == 90
    update_where(
        path, [("id", "==", 50)], {"value": F.lit(0)},
        spark=spark, strategy="merge-on-read",
    )
    got = read_delta(path, filter=[("id", "==", 50)], spark=spark).collect()
    assert len(got) == 1 and got[0]["value"] == 0
    # every data file on disk still carries PHYSICAL names
    for r, _, fs in os.walk(path):
        if "_delta_log" in r:
            continue
        for f in fs:
            if f.endswith(".parquet"):
                names = set(pq.read_schema(os.path.join(r, f)).names)
                assert "value" not in names and "bucket" not in names
        assert "bucket=" not in r


def test_rename_validation(spark, tmp_path):
    path = str(tmp_path / "t")
    to_delta(_df(spark, 0, 10), path)
    with pytest.raises(ValueError, match="not found"):
        rename_column(path, "nope", "x")
    with pytest.raises(ValueError, match="already exists"):
        rename_column(path, "val", "part")


def test_checkpoint_preserves_mapping(spark, tmp_path):
    path = str(tmp_path / "t")
    to_delta(_df(spark, 0, 50), path)
    rename_column(path, "val", "value")
    from dask_deltalake_spark.delta.maintenance import create_checkpoint

    create_checkpoint(path)
    # replay starting from the checkpoint must keep protocol + mapping
    snap = DeltaLog(path).snapshot()
    assert snap.protocol.min_reader_version == 2
    df = read_delta(path, spark=spark)
    assert df.columns == ["id", "part", "value"]
    assert df.count() == 50


def test_add_and_drop_column(spark, tmp_path):
    """ADD/DROP COLUMN are metadata-only: added columns read NULL for
    pre-existing rows and fresh physical names in new files; dropped
    values never resurface even if the logical name is re-added."""
    import pyarrow.parquet as pq

    from dask_deltalake_spark.delta.column_mapping import (
        add_column,
        drop_column,
    )
    from dask_deltalake_spark.delta.log import DeltaLog

    path = str(tmp_path / "t")
    to_delta(_df(spark, 0, 40), path, partition_by=["part"])
    files_v0 = _files(path)
    add_column(path, "score", "double")
    assert _files(path) == files_v0  # metadata-only
    df = read_delta(path, spark=spark)
    assert df.columns == ["id", "part", "val", "score"]
    assert df.filter("score IS NULL").count() == 40

    # append with the new column; its file carries the col-uuid name
    new = (
        spark.range(40, 50)
        .withColumn("part", (F.col("id") % 2).cast("int"))
        .withColumn("val", F.col("id") * 10)
        .withColumn("score", F.col("id") * 1.5)
    )
    to_delta(new, path, mode="append")
    snap = DeltaLog(path).snapshot()
    phys = {
        f["name"]: f["metadata"]["delta.columnMapping.physicalName"]
        for f in json.loads(snap.metadata.schema_string)["fields"]
    }
    assert phys["score"].startswith("col-")
    added = _files(path) - files_v0
    assert any(
        phys["score"] in set(pq.read_schema(f).names) for f in added
    )
    out = read_delta(path, spark=spark)
    assert out.filter("score IS NOT NULL").count() == 10
    assert out.agg(F.sum("score")).first()[0] == sum(i * 1.5 for i in range(40, 50))

    # drop + re-add same logical name: old values must NOT resurface
    drop_column(path, "score")
    assert read_delta(path, spark=spark).columns == ["id", "part", "val"]
    add_column(path, "score", "double")
    again = read_delta(path, spark=spark)
    assert again.filter("score IS NOT NULL").count() == 0  # fresh physical name
    # validation
    with pytest.raises(ValueError, match="already exists"):
        add_column(path, "val", "long")
    with pytest.raises(ValueError, match="partition column"):
        drop_column(path, "part")
    with pytest.raises(ValueError, match="not found"):
        drop_column(path, "nope")


def test_dml_rename_sequence_property(spark, tmp_path):
    """Sequence-diversity contract over the rename x DML interplay
    (extends the single r12 lifecycle in tests/test_dv.py): a
    deterministic battery of operation sequences — renames of data
    AND partition columns interleaved with appends, COW/MoR deletes,
    updates, and merges, in orders the targeted tests don't sample
    (rename-before-MoR, double rename of the same column,
    rename-between-merge-and-delete) — must leave the table equal to
    a pandas model applying the same logical operations. Any
    unkeyed keep-predicate, untranslated predicate, or
    physical/logical name drift diverges some sequence."""
    import pandas as pd

    from dask_deltalake_spark.delta.mutate import (
        delete_where,
        merge_into,
        update_where,
    )

    # each sequence: (op, args) over logical state; cN = N-th rename
    # target name for the column that started as 'val' / 'part'
    SEQUENCES = [
        # rename data col BEFORE MoR delete, then COW on the new name
        [("rename", "val", "v1"), ("mor_delete", "id", 5),
         ("cow_delete_col", "v1", 200), ("append", 40, 50)],
        # MoR first, rename PARTITION col, merge keyed on id, COW on
        # the renamed partition col
        [("mor_delete", "id", 8), ("rename", "part", "bucket"),
         ("merge", 6, 12), ("cow_delete_col", "bucket", 0)],
        # double rename of the same column with DML between
        [("rename", "val", "v1"), ("update_lt", "id", 10),
         ("rename", "v1", "v2"), ("mor_delete", "id", 4),
         ("merge", 38, 44)],
        # rename both columns up front, then the full DML ladder
        [("rename", "part", "bucket"), ("rename", "val", "v1"),
         ("append", 40, 60), ("mor_delete", "id", 15),
         ("update_lt", "id", 3), ("merge", 55, 65)],
    ]

    def spark_frame(lo, hi, valcol, partcol):
        return (
            spark.range(lo, hi)
            .withColumn(partcol, (F.col("id") % 2).cast("int"))
            .withColumn(valcol, F.col("id") * 10)
            .select("id", partcol, valcol)
        )

    for si, seq in enumerate(SEQUENCES):
        path = str(tmp_path / f"t{si}")
        to_delta(_df(spark, 0, 40), path, partition_by=["part"])
        valcol, partcol = "val", "part"
        model = pd.DataFrame(
            {"id": range(40)}
        ).assign(part=lambda d: d.id % 2, val=lambda d: d.id * 10)
        model.columns = ["id", partcol, valcol]

        for op in seq:
            if op[0] == "rename":
                _, old, new = op
                rename_column(path, old, new, spark=spark)
                model = model.rename(columns={old: new})
                if old == valcol:
                    valcol = new
                if old == partcol:
                    partcol = new
            elif op[0] == "append":
                _, lo, hi = op
                to_delta(
                    spark_frame(lo, hi, valcol, partcol), path,
                    mode="append",
                )
                extra = pd.DataFrame({"id": range(lo, hi)})
                extra[partcol] = extra.id % 2
                extra[valcol] = extra.id * 10
                model = pd.concat([model, extra], ignore_index=True)
            elif op[0] == "mor_delete":
                _, col, bound = op
                delete_where(
                    path, [(col, "<", bound)], spark=spark,
                    strategy="merge-on-read",
                )
                model = model[model[col] >= bound]
            elif op[0] == "cow_delete_col":
                _, col, val = op
                delete_where(path, [(col, "==", val)], spark=spark)
                model = model[model[col] != val]
            elif op[0] == "update_lt":
                _, col, bound = op
                update_where(
                    path, [(col, "<", bound)],
                    {valcol: F.col(valcol) + 1}, spark=spark,
                )
                model = model.copy()
                model.loc[model[col] < bound, valcol] += 1
            elif op[0] == "merge":
                _, lo, hi = op
                src = spark_frame(lo, hi, valcol, partcol).withColumn(
                    valcol, F.lit(-7).cast("long")
                )
                merge_into(path, src, keys=["id"], spark=spark)
                src_ids = set(range(lo, hi))
                matched = model.id.isin(src_ids)
                model = model.copy()
                model.loc[matched, valcol] = -7
                missing = sorted(src_ids - set(model.id))
                add = pd.DataFrame({"id": missing})
                add[partcol] = add.id % 2
                add[valcol] = -7
                model = pd.concat([model, add], ignore_index=True)

        got = sorted(
            (r["id"], r[partcol], r[valcol])
            for r in read_delta(path, spark=spark).collect()
        )
        want = sorted(
            (int(r["id"]), int(r[partcol]), int(r[valcol]))
            for _, r in model.iterrows()
        )
        assert got == want, f"sequence {si} diverged: {seq}"


def test_id_mode_guard_recurses_into_nested_fields():
    """The id-mode guard (pure parquet-field-id resolution is
    unsupported) must recurse exactly as far as the physical-schema
    mapping does: an id-mode table whose NESTED struct field lacks
    physicalName metadata previously passed a top-level-only guard
    and was silently scanned under its logical name, reading nulls
    (ADVICE r12)."""
    from pyspark.sql.types import (
        ArrayType,
        LongType,
        StructField,
        StructType,
    )

    from dask_deltalake_spark.delta.column_mapping import scan_schema_for
    from dask_deltalake_spark.delta.protocol import (
        COLUMN_ID_KEY,
        PHYSICAL_NAME_KEY,
        Metadata,
    )

    def _meta(mode):
        return Metadata(
            id="m",
            schema_string="{}",
            configuration={"delta.columnMapping.mode": mode},
        )

    def _f(name, dtype, physical=True):
        md = {COLUMN_ID_KEY: 1}
        if physical:
            md[PHYSICAL_NAME_KEY] = f"col-{name}"
        return StructField(name, dtype, True, metadata=md)

    # nested struct field WITHOUT physicalName, top-level complete
    bad_nested = StructType(
        [
            _f("a", LongType()),
            _f(
                "s",
                StructType([_f("inner", LongType(), physical=False)]),
            ),
        ]
    )
    with pytest.raises(DeltaProtocolError, match="physicalName"):
        scan_schema_for(_meta("id"), bad_nested)

    # same shape inside an array element's struct
    bad_array = StructType(
        [
            _f(
                "arr",
                ArrayType(
                    StructType([_f("inner", LongType(), physical=False)])
                ),
            )
        ]
    )
    with pytest.raises(DeltaProtocolError, match="physicalName"):
        scan_schema_for(_meta("id"), bad_array)

    # fully-annotated nested schema passes and maps recursively
    good = StructType(
        [
            _f("a", LongType()),
            _f("s", StructType([_f("inner", LongType())])),
        ]
    )
    mapped = scan_schema_for(_meta("id"), good)
    assert mapped.fieldNames() == ["col-a", "col-s"]
    assert mapped["col-s"].dataType.fieldNames() == ["col-inner"]
    # name mode maps the same shape without the id guard
    mapped_name = scan_schema_for(_meta("name"), good)
    assert mapped_name.fieldNames() == ["col-a", "col-s"]
    # mapping off → logical schema unchanged
    assert scan_schema_for(_meta("none"), good) is good
