"""Delta read-path parity vs the reference's correctness constants
(BASELINE.md): shapes, version/datetime travel, projection, DNF
filters, partition pruning, checkpointed replay, empty tables."""

import pytest

from dask_deltalake_spark import read_delta
from dask_deltalake_spark.delta.log import DeltaLog


def test_read_latest(spark, simple_table):
    df = read_delta(simple_table, spark=spark)
    assert df.count() == 200
    assert len(df.columns) == 4


def test_versions(spark, simple_table):
    v0 = read_delta(simple_table, version=0, spark=spark)
    assert (v0.count(), len(v0.columns)) == (100, 3)
    v1 = read_delta(simple_table, version=1, spark=spark)
    assert (v1.count(), len(v1.columns)) == (200, 4)


def test_row_filter(spark, simple_table):
    df = read_delta(
        simple_table, version=0, filter=[("count", ">", 30)], spark=spark
    )
    assert df.count() == 61


def test_projection(spark, simple_table):
    df = read_delta(simple_table, version=0, columns=["count"], spark=spark)
    assert df.columns == ["count"]
    assert df.count() == 100


def test_schema_evolution(spark, simple_table):
    v0 = read_delta(simple_table, version=0, spark=spark)
    v1 = read_delta(simple_table, version=1, spark=spark)
    assert set(v1.columns) - set(v0.columns) == {"newColumn"}
    # rows written before the evolution read as null in the new column
    assert v1.filter("newColumn is null").count() > 0


def test_out_of_range_version_raises(spark, simple_table):
    with pytest.raises(Exception):
        read_delta(simple_table, version=4, spark=spark).count()


def test_partition_pruning_metadata_only(spark, partition_table):
    df = read_delta(
        partition_table, version=0, filter=[("col1", "==", 1)], spark=spark
    )
    assert df.count() == 21
    assert len(df.columns) == 3
    # pruning happened on the driver: only col1=1 files are scanned
    snap = DeltaLog(partition_table).snapshot()
    from dask_deltalake_spark.delta.protocol import (
        normalize_dnf,
        prune_partitions,
    )

    kept = prune_partitions(snap.add_actions, normalize_dnf([("col1", "==", 1)]))
    assert all(a.partition_values.get("col1") == "1" for a in kept)
    assert len(kept) < len(snap.add_actions)


def test_partition_pruning_or_of_ands(spark, partition_table):
    df = read_delta(
        partition_table,
        filter=[[("col1", "==", 1)], [("col1", "==", 2)]],
        spark=spark,
    )
    assert df.count() == 39


def test_datetime_travel(spark, simple2_table):
    # mtimes reset to 2020-05-02..06 by the fixture; mirrors
    # reference tests/test_core.py:173-199 expectations
    log = DeltaLog(simple2_table)
    assert log.resolve_datetime("2020-05-01T00:47:31-07:00") == 0
    assert log.resolve_datetime("2020-05-03T10:00:00Z") == 1
    assert log.resolve_datetime("2020-05-25T00:00:00Z") == 4


def test_checkpoint_replay(spark, checkpoint_table):
    log = DeltaLog(checkpoint_table)
    assert log.checkpoint_versions() == [10, 20]
    assert read_delta(checkpoint_table, version=4, spark=spark).count() == 25
    # v12 replays from checkpoint 10, v22 from checkpoint 20
    assert read_delta(checkpoint_table, version=12, spark=spark).count() == 65
    assert read_delta(checkpoint_table, version=22, spark=spark).count() == 115


def test_empty_table(spark, empty_table):
    v0 = read_delta(empty_table, version=0, spark=spark)
    assert (v0.count(), len(v0.columns)) == (5, 2)
    v4 = read_delta(empty_table, version=4, spark=spark)
    assert (v4.count(), len(v4.columns)) == (0, 2)


def test_missing_path_raises(spark):
    with pytest.raises(ValueError):
        read_delta(None, spark=spark)


def test_unknown_kwargs_warn_not_silent(spark, simple_table):
    # reference parity: arrow_options is accepted (reference core.py:163
    # forwards it to pyarrow to_batches) but has no Spark-scan equivalent —
    # it must be ignored loudly, and must not change the result
    with pytest.warns(UserWarning, match="arrow_options"):
        df = read_delta(
            simple_table, arrow_options={"batch_size": 1}, spark=spark
        )
    assert df.count() == 200


def test_unsupported_reader_protocol_refused(spark, tmp_path):
    """A table whose minReaderVersion exceeds what this engine
    implements (column mapping / deletion vectors change how data
    files are interpreted) must be REFUSED, not silently misread —
    ignoring a deletion vector would resurface deleted rows."""
    import json
    import os

    import pytest

    from dask_deltalake_spark.delta.cdc import read_delta_changes
    from dask_deltalake_spark.delta.protocol import DeltaProtocolError
    from dask_deltalake_spark.delta.writer import to_delta

    path = str(tmp_path / "dv_table")
    to_delta(spark.range(0, 10), path)
    # upgrade the protocol the way delta-spark would (new commit)
    log_dir = os.path.join(path, "_delta_log")
    with open(os.path.join(log_dir, "00000000000000000001.json"), "w") as f:
        f.write(
            json.dumps(
                {"protocol": {"minReaderVersion": 3, "minWriterVersion": 7}}
            )
            + "\n"
        )
    with pytest.raises(DeltaProtocolError, match="minReaderVersion"):
        read_delta(path, spark=spark)
    with pytest.raises(DeltaProtocolError, match="minReaderVersion"):
        read_delta_changes(path, starting_version=0, spark=spark)
    # version 0 predates the upgrade and stays readable
    assert read_delta(path, version=0, spark=spark).count() == 10
