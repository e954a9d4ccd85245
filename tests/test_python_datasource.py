"""Spark 4 Python Data Source (format 'delta_py') behavior."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

import dask_deltalake_spark as ddl
from dask_deltalake_spark.sources import register_python_datasource


@pytest.fixture()
def source_table(spark, tmp_path):
    register_python_datasource(spark)
    path = str(tmp_path / "t")
    df = spark.range(500).select(
        F.col("id"), (F.col("id") % 4).alias("k"), (F.col("id") * 1.5).alias("v")
    )
    ddl.to_delta(df, path, partition_by=["k"])
    return path


def _read(spark, path, **opts):
    r = spark.read.format("delta_py").option("path", path)
    for k, v in opts.items():
        r = r.option(k, v)
    return r.load()


def test_matches_read_delta(spark, source_table):
    via_source = _read(spark, source_table).orderBy("id").collect()
    via_native = ddl.read_delta(source_table, spark=spark).orderBy("id").collect()
    assert via_source == via_native


def test_partition_column_typed(spark, source_table):
    df = _read(spark, source_table)
    assert dict(df.dtypes)["k"] == "bigint"
    assert df.filter(F.col("k") == 3).count() == 125


def test_filter_pushdown_and_residual(spark, source_table):
    df = _read(spark, source_table).filter((F.col("k") == 1) & (F.col("id") < 100))
    got = sorted(r.id for r in df.collect())
    assert got == [i for i in range(100) if i % 4 == 1]


def test_version_option(spark, source_table):
    first = ddl.read_delta(source_table, spark=spark)
    ddl.to_delta(first.limit(10), source_table, mode="overwrite")
    assert _read(spark, source_table, version="0").count() == 500
    assert _read(spark, source_table).count() == 10


def test_streaming_source_incremental(spark, tmp_path):
    register_python_datasource(spark)
    tbl = str(tmp_path / "stbl")
    out = str(tmp_path / "sout")
    ck = str(tmp_path / "sck")
    df = spark.range(50).select(F.col("id"), (F.col("id") % 2).alias("k"))
    ddl.to_delta(df, tbl, partition_by=["k"])

    def drain():
        q = (
            spark.readStream.format("delta_py").option("path", tbl).load()
            .writeStream.format("parquet").option("path", out)
            .option("checkpointLocation", ck)
            .trigger(availableNow=True).start()
        )
        q.awaitTermination()

    drain()
    assert spark.read.parquet(out).count() == 50
    ddl.to_delta(df.withColumn("id", F.col("id") + 50), tbl, mode="append")
    drain()
    got = spark.read.parquet(out)
    assert got.count() == 100  # second run emitted only the new commit
    assert got.select("id").distinct().count() == 100


def test_delta_py_reads_mapped_table(spark, tmp_path):
    """Column mapping through the ecosystem format: logical columns
    out, physical pruning underneath."""
    register_python_datasource(spark)
    import pyspark.sql.functions as F

    from dask_deltalake_spark.delta.column_mapping import rename_column
    from dask_deltalake_spark.delta.writer import to_delta

    path = str(tmp_path / "t")
    df = (
        spark.range(0, 500)
        .withColumn("part", (F.col("id") % 2).cast("int"))
        .withColumn("val", F.col("id") * 3)
    )
    to_delta(df, path, partition_by=["part"])
    rename_column(path, "val", "value")
    rename_column(path, "part", "bucket")
    out = spark.read.format("delta_py").option("path", path).load()
    assert out.columns == ["id", "bucket", "value"]
    assert out.count() == 500
    assert out.agg(F.sum("value")).first()[0] == sum(3 * i for i in range(500))
    assert out.filter("bucket = 1").count() == 250


def test_delta_py_reads_dv_table(spark, tmp_path):
    """Deletion vectors through the ecosystem format: dead positions
    masked executor-side in the Arrow batches."""
    register_python_datasource(spark)
    import pyspark.sql.functions as F

    from dask_deltalake_spark.delta.mutate import delete_where
    from dask_deltalake_spark.delta.writer import to_delta

    path = str(tmp_path / "t")
    df = (
        spark.range(0, 500)
        .withColumn("part", (F.col("id") % 2).cast("int"))
        .withColumn("val", F.col("id") * 3)
    )
    to_delta(df, path, partition_by=["part"])
    delete_where(path, [("id", "<", 100)], spark=spark, strategy="merge-on-read")
    out = spark.read.format("delta_py").option("path", path).load()
    assert out.count() == 400
    assert out.agg(F.min("id")).first()[0] == 100


def test_delta_py_stream_dv_readd_emits_live_rows_only(spark, tmp_path):
    """Streaming the ignoreChanges posture over a MoR delete: the
    rewrite commit re-emits ONLY the live rows of its re-added files
    (documented duplicates), never resurrected dead rows."""
    register_python_datasource(spark)
    import pyspark.sql.functions as F

    from dask_deltalake_spark.delta.log import DeltaLog
    from dask_deltalake_spark.delta.mutate import delete_where
    from dask_deltalake_spark.delta.writer import to_delta

    path = str(tmp_path / "t")
    out_dir, ck = str(tmp_path / "out"), str(tmp_path / "ck")
    df = (
        spark.range(0, 500)
        .withColumn("part", (F.col("id") % 2).cast("int"))
        .withColumn("val", F.col("id") * 3)
    )
    to_delta(df, path, partition_by=["part"])

    def drain():
        q = (
            spark.readStream.format("delta_py")
            .option("path", path)
            .option("ignoreChanges", "true")  # r14: opt-in, like
            # delta-spark — the default refuses non-append commits
            .load()
            .writeStream.format("parquet")
            .option("path", out_dir)
            .option("checkpointLocation", ck)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    drain()  # consumes v0: 500 rows
    assert spark.read.parquet(out_dir).count() == 500
    delete_where(path, [("id", "<", 100)], spark=spark, strategy="merge-on-read")
    drain()  # consumes ONLY the delete commit
    inc = spark.read.parquet(out_dir)
    # the increment = live rows of the re-added (vectored) files; a
    # dead row must never appear in the increment
    snap = DeltaLog(path).snapshot()
    import json

    expected_readd_live = sum(
        json.loads(a.stats)["numRecords"] - a.deletion_vector["cardinality"]
        for a in snap.add_actions
        if a.deletion_vector
    )
    assert inc.count() == 500 + expected_readd_live
    assert inc.filter("id < 100").count() == 100  # only v0's copies


def test_delta_py_cdf_batch(spark, tmp_path):
    """Batch change feed: inserts per append commit, vector-delta
    delete images, exclusive startingVersion resume."""
    register_python_datasource(spark)
    from dask_deltalake_spark.delta.mutate import delete_where

    path = str(tmp_path / "t")
    df = (
        spark.range(0, 200)
        .withColumn("part", (F.col("id") % 2).cast("int"))
        .withColumn("val", F.col("id") * 10)
    )
    ddl.to_delta(df, path, partition_by=["part"])                      # v0
    ddl.to_delta(
        spark.range(200, 220)
        .withColumn("part", (F.col("id") % 2).cast("int"))
        .withColumn("val", F.col("id") * 10),
        path,
        mode="append",
    )                                                                  # v1
    delete_where(path, [("id", "<", 30)], spark=spark, strategy="merge-on-read")  # v2
    ch = spark.read.format("delta_py_cdf").option("path", path).load()
    agg = {
        (r["_change_type"], r["_commit_version"]): r["count"]
        for r in ch.groupBy("_change_type", "_commit_version").count().collect()
    }
    assert agg == {("insert", 0): 200, ("insert", 1): 20, ("delete", 2): 30}
    ch2 = (
        spark.read.format("delta_py_cdf")
        .option("path", path)
        .option("startingVersion", "1")
        .load()
    )
    assert sorted(r["id"] for r in ch2.collect()) == list(range(30))
    assert {r["_change_type"] for r in ch2.collect()} == {"delete"}
    # partition values materialize on delete images too
    assert ch2.filter("part = 1").count() == 15


def test_delta_py_cdf_stream_resume(spark, tmp_path):
    """Streaming change feed with checkpoint resume: the second drain
    emits exactly the new commit's vector delta."""
    register_python_datasource(spark)
    from dask_deltalake_spark.delta.mutate import delete_where

    path = str(tmp_path / "t")
    out_dir, ck = str(tmp_path / "out"), str(tmp_path / "ck")
    df = (
        spark.range(0, 200)
        .withColumn("part", (F.col("id") % 2).cast("int"))
        .withColumn("val", F.col("id") * 10)
    )
    ddl.to_delta(df, path, partition_by=["part"])
    delete_where(path, [("id", "<", 30)], spark=spark, strategy="merge-on-read")

    def drain():
        q = (
            spark.readStream.format("delta_py_cdf")
            .option("path", path)
            .load()
            .writeStream.format("parquet")
            .option("path", out_dir)
            .option("checkpointLocation", ck)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    drain()
    assert spark.read.parquet(out_dir).count() == 230  # 200 ins + 30 del
    delete_where(path, [("id", "<", 45)], spark=spark, strategy="merge-on-read")
    drain()
    inc = spark.read.parquet(out_dir).filter("_commit_version = 2")
    assert inc.count() == 15
    assert {r["_change_type"] for r in inc.collect()} == {"delete"}
    assert sorted(r["id"] for r in inc.collect()) == list(range(30, 45))


def test_stream_admission_control_offset_walk(spark, tmp_path):
    """maxFilesPerTrigger / maxBytesPerTrigger bound each planned
    micro-batch at commit granularity: driven directly against the
    stream reader (deterministic — no trigger timing), the offset walk
    must advance one budget's worth of commits per latestOffset call
    and partitions() must cover exactly the planned range."""
    import pyspark.sql.functions as F

    from dask_deltalake_spark.delta.writer import to_delta
    from dask_deltalake_spark.sources.delta_source import (
        DeltaPyStreamReader,
    )

    path = str(tmp_path / "t")
    for i in range(5):  # 5 commits, 1 file each
        to_delta(
            spark.range(i * 10, i * 10 + 10)
            .select(F.col("id").alias("k"))
            .coalesce(1),
            path,
            mode="append" if i else "error",
        )
    r = DeltaPyStreamReader(None, {"path": path, "maxFilesPerTrigger": "1"})
    assert r.initialOffset() == {"version": -1}
    seen = []
    for _ in range(5):
        seen.append(r.latestOffset()["version"])
    assert seen == [0, 1, 2, 3, 4]  # one commit per trigger
    assert r.latestOffset()["version"] == 4  # caught up: offset stable
    # two-files-per-trigger walks two commits at a time
    r2 = DeltaPyStreamReader(None, {"path": path, "maxFilesPerTrigger": "2"})
    r2.initialOffset()
    assert [r2.latestOffset()["version"] for _ in range(3)] == [1, 3, 4]
    # byte budget: each commit is ~1 small file; a budget below one
    # file's size still advances a full commit (progress guarantee)
    r3 = DeltaPyStreamReader(None, {"path": path, "maxBytesPerTrigger": "1"})
    r3.initialOffset()
    assert [r3.latestOffset()["version"] for _ in range(5)] == [0, 1, 2, 3, 4]
    # no admission options -> one batch plans everything
    r4 = DeltaPyStreamReader(None, {"path": path})
    r4.initialOffset()
    assert r4.latestOffset()["version"] == 4
    # restart shape: a fresh reader that never saw initialOffset plans
    # unbounded once, then partitions() reveals the position and
    # admission resumes
    r5 = DeltaPyStreamReader(None, {"path": path, "maxFilesPerTrigger": "1"})
    assert r5.latestOffset()["version"] == 4
    to_delta(
        spark.range(50, 60).select(F.col("id").alias("k")).coalesce(1),
        path,
        mode="append",
    )
    to_delta(
        spark.range(60, 70).select(F.col("id").alias("k")).coalesce(1),
        path,
        mode="append",
    )
    assert r5.latestOffset()["version"] == 5  # bounded again
    parts = r5.partitions({"version": 4}, {"version": 5})
    files = [f for p in parts for f in p.files]
    assert len(files) == 1  # exactly the one commit's file


def test_available_now_drain_honors_admission(spark, tmp_path):
    """drain_available_now = availableNow semantics the JVM fallback
    can't give the Python source: capture-once end offset, admission
    bounds on EVERY batch (first included, via the checkpoint-derived
    start hint), drain-then-stop. Asserts batch-by-batch pacing,
    end-version capping, and exactly-once totals across drains."""
    from dask_deltalake_spark.delta.log import DeltaLog
    from dask_deltalake_spark.delta.writer import to_delta
    from dask_deltalake_spark.streaming.availablenow import (
        drain_available_now,
    )

    register_python_datasource(spark)
    tbl = str(tmp_path / "t")
    ck = str(tmp_path / "ck")

    def commit(lo, hi, mode="append"):
        to_delta(
            spark.range(lo, hi).select(F.col("id").alias("k")).coalesce(1),
            tbl,
            mode=mode,
        )

    commit(0, 5, mode="error")  # v0
    commit(5, 10)  # v1
    commit(10, 15)  # v2

    batches: list[tuple[int, int]] = []

    def sink(df):
        return df.writeStream.foreachBatch(
            lambda bdf, bid: batches.append((bid, bdf.count()))
        )

    # fresh query, maxFilesPerTrigger=1: the start hint (-1, no
    # checkpoint yet) makes even the FIRST batch bounded -> one commit
    # (5 rows) per micro-batch, three data batches
    end = drain_available_now(
        spark, tbl, sink, ck, max_files_per_trigger=1
    )
    assert end == 2
    data_batches = [(b, n) for b, n in batches if n > 0]
    assert [n for _b, n in data_batches] == [5, 5, 5]

    # end-version capping: two new commits, drain only through v3 —
    # v4 must wait for the next drain
    commit(15, 20)  # v3
    commit(20, 25)  # v4
    batches.clear()
    end = drain_available_now(
        spark, tbl, sink, ck, max_files_per_trigger=1, end_version=3
    )
    assert end == 3
    assert sum(n for _b, n in batches) == 5  # v3 only, v4 capped out

    # resumed drain picks up exactly the capped-out commit (the
    # checkpoint hint keeps it bounded too) -> exactly-once totals
    batches.clear()
    drain_available_now(spark, tbl, sink, ck, max_files_per_trigger=1)
    assert sum(n for _b, n in batches) == 5
    assert DeltaLog(tbl).latest_version() == 4


def test_streaming_starting_version(spark, tmp_path):
    """startingVersion (delta-spark parity): a fresh stream begins at
    that version inclusive; the table's earlier commits never emit."""
    from dask_deltalake_spark.delta.writer import to_delta
    from dask_deltalake_spark.streaming.availablenow import (
        drain_available_now,
    )

    register_python_datasource(spark)
    tbl = str(tmp_path / "t")
    for lo in (0, 5, 10):  # v0, v1, v2
        to_delta(
            spark.range(lo, lo + 5).selectExpr("id AS k").coalesce(1),
            tbl,
            mode="append" if lo else "error",
        )
    batches = []
    drain_available_now(
        spark,
        tbl,
        lambda df: df.writeStream.foreachBatch(
            lambda bdf, bid: batches.append(
                sorted(r["k"] for r in bdf.collect())
            )
        ),
        str(tmp_path / "ck"),
        options={"startingVersion": 1},
    )
    got = sorted(k for b in batches for k in b)
    assert got == list(range(5, 15))  # v1+v2 only; v0 never emitted


def test_batch_time_travel_options(spark, tmp_path):
    """versionAsOf / timestampAsOf on the batch source (delta-spark
    read-option parity)."""
    import time

    from dask_deltalake_spark.delta.log import DeltaLog
    from dask_deltalake_spark.delta.writer import to_delta

    register_python_datasource(spark)
    tbl = str(tmp_path / "t")
    to_delta(spark.range(5).selectExpr("id AS k").coalesce(1), tbl)
    time.sleep(0.05)
    to_delta(
        spark.range(5, 9).selectExpr("id AS k").coalesce(1),
        tbl,
        mode="append",
    )
    def r():
        # a DataFrameReader builder accumulates options — fresh per read
        return spark.read.format("delta_py").option("path", tbl)

    assert r().option("versionAsOf", 0).load().count() == 5
    ts = DeltaLog(tbl).version_timestamps()
    from datetime import datetime, timezone

    mid = datetime.fromtimestamp(
        (ts[0] + ts[1]) / 2, tz=timezone.utc
    ).isoformat()
    assert r().option("timestampAsOf", mid).load().count() == 5
    assert r().load().count() == 9
    import pytest

    with pytest.raises(Exception, match="mutually exclusive"):
        (r().option("versionAsOf", 0).option("timestampAsOf", mid)
         .load().count())


def test_stream_over_cleaned_range_raises_clearly(spark, tmp_path):
    """The delta_py stream is COMMIT-backed: a fresh stream over a
    table whose early commits were removed by retention cleanup (the
    standard long-lived-table shape — checkpoint + cleaned prefix)
    must fail with the clear range error naming the missing commits
    and the resume options (the r13 read_delta_changes precedent),
    not a FileNotFoundError from partition planning; and resuming
    from a RETAINED version via startingVersion must work. Also pins
    the checkpoint-only variant surfaced by the r14 latest_version
    fallback: the stream sees the table (no 'No Delta table found')
    and reports the commit-granularity refusal instead."""
    import glob
    import os

    from dask_deltalake_spark.delta.log import _SNAPSHOT_CACHE
    from dask_deltalake_spark.delta.maintenance import create_checkpoint
    from dask_deltalake_spark.delta.writer import to_delta
    from dask_deltalake_spark.streaming.availablenow import (
        drain_available_now,
    )

    register_python_datasource(spark)
    tbl = str(tmp_path / "t")
    for lo in (0, 5, 10):  # v0, v1, v2
        to_delta(
            spark.range(lo, lo + 5).selectExpr("id AS k").coalesce(1),
            tbl,
            mode="append" if lo else "error",
        )
    create_checkpoint(tbl)  # at v2
    to_delta(
        spark.range(15, 20).selectExpr("id AS k").coalesce(1),
        tbl, mode="append",
    )  # v3
    for v in (0, 1):  # retention-style prefix cleanup below the cp
        os.remove(os.path.join(tbl, "_delta_log", f"{v:020d}.json"))
    _SNAPSHOT_CACHE.clear()

    batches = []

    def sink(df):
        return df.writeStream.foreachBatch(
            lambda bdf, bid: batches.append(
                sorted(r["k"] for r in bdf.collect())
            )
        )

    # fresh stream replays commits from 0 -> clear refusal
    with pytest.raises(Exception, match="removed by log retention"):
        drain_available_now(spark, tbl, sink, str(tmp_path / "ck1"))
    # the admission-bounded walk fails the same way, not via the
    # footprint scan's file read
    with pytest.raises(Exception, match="removed by log retention"):
        drain_available_now(
            spark, tbl, sink, str(tmp_path / "ck2"),
            max_files_per_trigger=1,
        )
    # resuming from a retained version works and emits exactly v2+v3
    batches.clear()
    drain_available_now(
        spark, tbl, sink, str(tmp_path / "ck3"),
        options={"startingVersion": 2},
    )
    assert sorted(k for b in batches for k in b) == list(range(10, 20))

    # checkpoint-only variant: every JSON gone; latest_version falls
    # back to the checkpoint (r14) and the stream refuses with the
    # commit-granularity error, not DeltaTableNotFoundError
    for j in glob.glob(os.path.join(tbl, "_delta_log", "*.json")):
        os.remove(j)
    _SNAPSHOT_CACHE.clear()
    with pytest.raises(Exception, match="removed by log retention"):
        drain_available_now(spark, tbl, sink, str(tmp_path / "ck4"))


def test_stream_non_append_commit_semantics(spark, tmp_path):
    """delta-spark streaming parity for non-append commits: the plain
    delta_py stream refuses a DML-rewrite commit by default (silently
    re-emitting rewritten files would DUPLICATE every surviving row
    downstream), 'skipChangeCommits' skips such commits entirely,
    'ignoreChanges' re-emits with the documented duplicate semantics,
    and a delete-ONLY commit is tolerated by 'ignoreDeletes'."""
    import json as _json
    import os

    from dask_deltalake_spark.delta.mutate import delete_where
    from dask_deltalake_spark.delta.writer import to_delta
    from dask_deltalake_spark.streaming.availablenow import (
        drain_available_now,
    )

    register_python_datasource(spark)
    tbl = str(tmp_path / "t")
    to_delta(spark.range(10).selectExpr("id AS k").coalesce(1), tbl)  # v0
    to_delta(spark.range(10, 15).selectExpr("id AS k").coalesce(1),
             tbl, mode="append")                                      # v1
    delete_where(tbl, [("k", "<", 3)], spark=spark)  # v2: rewrite
    to_delta(spark.range(15, 20).selectExpr("id AS k").coalesce(1),
             tbl, mode="append")                                      # v3

    rows = []

    def sink(df):
        return df.writeStream.foreachBatch(
            lambda bdf, bid: rows.extend(r["k"] for r in bdf.collect())
        )

    # default: clear refusal naming the data update and the options
    with pytest.raises(Exception, match="detected a data update"):
        drain_available_now(spark, tbl, sink, str(tmp_path / "ck1"))

    # skipChangeCommits: v2 skipped entirely -> v0+v1+v3 file contents
    rows.clear()
    drain_available_now(
        spark, tbl, sink, str(tmp_path / "ck2"),
        options={"skipChangeCommits": "true"},
    )
    assert sorted(rows) == list(range(20))  # deleted 0-2 still here (v0)

    # ignoreChanges: v2's rewritten file re-emits -> survivors twice
    rows.clear()
    drain_available_now(
        spark, tbl, sink, str(tmp_path / "ck3"),
        options={"ignoreChanges": "true"},
    )
    assert sorted(rows) == sorted(
        list(range(20)) + list(range(3, 10))  # 3..9 duplicated
    )

    # delete-ONLY commit (whole-partition delete -> removes, no adds)
    tbl2 = str(tmp_path / "t2")
    df2 = spark.range(10).selectExpr("id AS k", "CAST(id % 2 AS INT) AS p")
    to_delta(df2, tbl2, partition_by=["p"])
    delete_where(tbl2, [("p", "==", 1)], spark=spark)  # v1: remove-only
    acts = [
        _json.loads(ln)
        for ln in open(
            os.path.join(tbl2, "_delta_log", f"{1:020d}.json")
        )
        if ln.strip()
    ]
    assert not any(
        a.get("add", {}).get("dataChange", False) for a in acts
        if a.get("add")
    ), "fixture must be a delete-only commit"
    with pytest.raises(Exception, match="detected deleted data"):
        drain_available_now(spark, tbl2, sink, str(tmp_path / "ck4"))
    rows.clear()
    drain_available_now(
        spark, tbl2, sink, str(tmp_path / "ck5"),
        options={"ignoreDeletes": "true"},
    )
    # v0 emitted BOTH partition files before the delete; a streamed
    # append is never retracted — ignoreDeletes means exactly "the
    # delete is invisible to the stream" (delta-spark semantics)
    assert sorted(rows) == list(range(10))


def test_stream_starting_version_latest(spark, tmp_path):
    """startingVersion='latest' (delta-spark parity): a fresh stream
    emits NOTHING for the table's existing commits and picks up only
    commits arriving after stream start (the checkpointed offset wins
    on resume)."""
    from dask_deltalake_spark.delta.writer import to_delta
    from dask_deltalake_spark.streaming.availablenow import (
        drain_available_now,
    )

    register_python_datasource(spark)
    tbl = str(tmp_path / "t")
    ck = str(tmp_path / "ck")
    to_delta(spark.range(5).selectExpr("id AS k").coalesce(1), tbl)
    to_delta(spark.range(5, 10).selectExpr("id AS k").coalesce(1),
             tbl, mode="append")
    rows = []

    def sink(df):
        return df.writeStream.foreachBatch(
            lambda bdf, bid: rows.extend(r["k"] for r in bdf.collect())
        )

    drain_available_now(
        spark, tbl, sink, ck, options={"startingVersion": "latest"}
    )
    assert rows == []  # nothing pre-existing emits
    to_delta(spark.range(10, 15).selectExpr("id AS k").coalesce(1),
             tbl, mode="append")
    drain_available_now(
        spark, tbl, sink, ck, options={"startingVersion": "latest"}
    )
    assert sorted(rows) == list(range(10, 15))  # only the new commit


def test_cdf_stream_starting_version_latest(spark, tmp_path):
    """startingVersion='latest' on the CDF stream (r15, ADVICE): the
    plain stream resolved the literal but the CDF sibling crashed
    with a bare int() ValueError — delta-spark accepts 'latest' for
    streaming reads generally. A fresh CDF stream must emit nothing
    for existing commits and only the post-start commit's changes."""
    register_python_datasource(spark)
    path = str(tmp_path / "t")
    out_dir, ck = str(tmp_path / "out"), str(tmp_path / "ck")
    ddl.to_delta(
        spark.range(0, 10).selectExpr("id", "id * 10 AS val").coalesce(1),
        path,
    )
    ddl.to_delta(
        spark.range(10, 20).selectExpr("id", "id * 10 AS val").coalesce(1),
        path, mode="append",
    )

    def drain():
        q = (
            spark.readStream.format("delta_py_cdf")
            .option("path", path)
            .option("startingVersion", "latest")
            .load()
            .writeStream.format("parquet")
            .option("path", out_dir)
            .option("checkpointLocation", ck)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    drain()
    import os as _os
    produced = [
        f for f in _os.listdir(out_dir) if f.endswith(".parquet")
    ] if _os.path.isdir(out_dir) else []
    if produced:
        assert spark.read.parquet(out_dir).count() == 0
    ddl.to_delta(
        spark.range(20, 25).selectExpr("id", "id * 10 AS val").coalesce(1),
        path, mode="append",
    )
    drain()
    got = spark.read.parquet(out_dir)
    assert sorted(r["id"] for r in got.collect()) == list(range(20, 25))
    assert {r["_change_type"] for r in got.collect()} == {"insert"}
    assert {r["_commit_version"] for r in got.collect()} == {2}
