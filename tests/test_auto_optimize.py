"""OPTIMIZE WHERE + auto-optimize table properties (r8).

delta-spark parity surfaces: ``OPTIMIZE tbl WHERE <partition pred>``
(maintenance.optimize(where=)), ``delta.autoOptimize.optimizeWrite``
(pre-write frame shaping), ``delta.autoOptimize.autoCompact``
(post-commit opportunistic compaction of the touched partitions).
"""

import os

import pyspark.sql.functions as F
import pytest

from dask_deltalake_spark.delta.log import _SNAPSHOT_CACHE, DeltaLog
from dask_deltalake_spark.delta.maintenance import optimize
from dask_deltalake_spark.delta.reader import read_delta
from dask_deltalake_spark.delta.writer import to_delta


def _files_per_partition(path, col):
    per = {}
    for a in DeltaLog(path).snapshot().add_actions:
        per.setdefault(a.partition_values.get(col), []).append(a.path)
    return per


def test_optimize_where_scopes_to_matching_partitions(spark, tmp_path):
    p = str(tmp_path / "t")
    df = spark.range(0, 900).withColumn("part", (F.col("id") % 3).cast("int"))
    to_delta(df.repartition(4), p, partition_by=["part"])
    to_delta(df.repartition(4), p, partition_by=["part"], mode="append")
    before = _files_per_partition(p, "part")
    assert all(len(v) == 8 for v in before.values())

    res = optimize(p, where=[("part", "==", 1)], spark=spark)
    assert res["numFilesRemoved"] == 8 and res["numFilesAdded"] == 1
    _SNAPSHOT_CACHE.clear()
    after = _files_per_partition(p, "part")
    # untouched partitions keep their EXACT file lists
    assert after["0"] == before["0"] and after["2"] == before["2"]
    assert len(after["1"]) == 1
    got = read_delta(p, spark=spark)
    assert got.count() == 1800
    assert got.agg(F.sum("id")).first()[0] == 2 * sum(range(900))


def test_optimize_where_refuses_non_partition_predicate(spark, tmp_path):
    p = str(tmp_path / "t")
    to_delta(
        spark.range(0, 10).withColumn("part", F.lit(0)),
        p,
        partition_by=["part"],
    )
    with pytest.raises(ValueError, match="non-partition"):
        optimize(p, where=[("id", "<", 5)], spark=spark)


def test_optimize_where_no_match_is_a_noop(spark, tmp_path):
    p = str(tmp_path / "t")
    to_delta(
        spark.range(0, 10).withColumn("part", F.lit(0)),
        p,
        partition_by=["part"],
    )
    v = DeltaLog(p).snapshot().version
    res = optimize(p, where=[("part", "==", 99)], spark=spark)
    assert res == {"numFilesAdded": 0, "numFilesRemoved": 0, "version": v}
    assert DeltaLog(p).versions()[-1] == v  # no commit written


def test_optimize_write_partitioned_one_file_per_value(spark, tmp_path):
    p = str(tmp_path / "t")
    df = (
        spark.range(0, 900)
        .withColumn("part", (F.col("id") % 3).cast("int"))
        .repartition(8)
    )
    to_delta(
        df,
        p,
        partition_by=["part"],
        configuration={"delta.autoOptimize.optimizeWrite": "true"},
    )
    assert len(DeltaLog(p).snapshot().add_actions) == 3
    assert read_delta(p, spark=spark).count() == 900


def test_optimize_write_unpartitioned_coalesces(spark, tmp_path):
    p = str(tmp_path / "t")
    to_delta(
        spark.range(0, 1000).repartition(16),
        p,
        configuration={"delta.autoOptimize.optimizeWrite": "true"},
    )
    # tiny frame, 128 MiB target -> one output file (vs 16 without)
    assert len(DeltaLog(p).snapshot().add_actions) == 1
    assert read_delta(p, spark=spark).count() == 1000


def test_optimize_write_off_by_default(spark, tmp_path):
    p = str(tmp_path / "t")
    to_delta(spark.range(0, 1000).repartition(16), p)
    assert len(DeltaLog(p).snapshot().add_actions) == 16


def test_optimize_write_sticks_from_table_config(spark, tmp_path):
    """The EXISTING table's property governs later appends — a writer
    does not have to re-request it (delta-spark semantics)."""
    p = str(tmp_path / "t")
    to_delta(
        spark.range(0, 10),
        p,
        configuration={"delta.autoOptimize.optimizeWrite": "true"},
    )
    to_delta(spark.range(10, 1000).repartition(16), p, mode="append")
    assert len(DeltaLog(p).snapshot().add_actions) == 2
    assert read_delta(p, spark=spark).count() == 1000


def test_auto_compact_threshold_and_commit(spark, tmp_path):
    p = str(tmp_path / "t")
    cfg = {
        "delta.autoOptimize.autoCompact": "true",
        "delta.autoOptimize.minNumFiles": "6",
    }
    to_delta(spark.range(0, 100).repartition(2), p, configuration=cfg)
    to_delta(spark.range(100, 200).repartition(2), p, mode="append")
    _SNAPSHOT_CACHE.clear()
    assert len(DeltaLog(p).snapshot().add_actions) == 4  # below threshold
    to_delta(spark.range(200, 300).repartition(2), p, mode="append")
    _SNAPSHOT_CACHE.clear()
    snap = DeltaLog(p).snapshot()
    assert len(snap.add_actions) == 1  # 6 small files -> compacted
    ops = [c.get("operation") for c in DeltaLog(p).commit_infos()]
    assert ops[-1] == "OPTIMIZE"
    got = read_delta(p, spark=spark)
    assert got.count() == 300
    assert got.agg(F.sum("id")).first()[0] == sum(range(300))


def test_auto_compact_scopes_to_touched_partition(spark, tmp_path):
    p = str(tmp_path / "t")
    cfg = {
        "delta.autoOptimize.autoCompact": "true",
        "delta.autoOptimize.minNumFiles": "4",
    }
    d0 = spark.range(0, 100).withColumn("part", F.lit(0)).repartition(2)
    d1 = spark.range(100, 200).withColumn("part", F.lit(1)).repartition(2)
    to_delta(d0, p, partition_by=["part"], configuration=cfg)
    to_delta(d1, p, mode="append")
    to_delta(d1, p, mode="append")  # part 1 now has 4 small files
    _SNAPSHOT_CACHE.clear()
    per = _files_per_partition(p, "part")
    # only the partition that crossed the threshold compacts; the
    # untouched partition's 2 files (below threshold) stay put
    assert len(per["1"]) == 1 and len(per["0"]) == 2
    assert read_delta(p, spark=spark).count() == 300


def test_auto_compact_ignores_large_files(spark, tmp_path):
    """Files at/above targetFileSize never count toward the
    threshold: an already-compacted table does not re-compact."""
    p = str(tmp_path / "t")
    cfg = {
        "delta.autoOptimize.autoCompact": "true",
        "delta.autoOptimize.minNumFiles": "2",
        # absurdly small target: every real file counts as "large"
        "delta.targetFileSize": "1",
    }
    to_delta(spark.range(0, 100).repartition(2), p, configuration=cfg)
    to_delta(spark.range(100, 200).repartition(2), p, mode="append")
    _SNAPSHOT_CACHE.clear()
    ops = [c.get("operation") for c in DeltaLog(p).commit_infos()]
    assert "OPTIMIZE" not in ops
    assert len(DeltaLog(p).snapshot().add_actions) == 4


def test_vacuum_default_honors_retention_property(spark, tmp_path):
    """vacuum(retention_hours=None) resolves
    delta.deletedFileRetentionDuration (delta-spark's default ladder);
    an explicit retention still wins."""
    import time

    from dask_deltalake_spark.delta.maintenance import vacuum

    p = str(tmp_path / "t")
    to_delta(
        spark.range(0, 10).coalesce(1),
        p,
        configuration={
            "delta.deletedFileRetentionDuration": "interval 0 hours"
        },
    )
    to_delta(spark.range(10, 20).coalesce(1), p, mode="overwrite")
    _SNAPSHOT_CACHE.clear()
    snap = DeltaLog(p).snapshot()
    assert len(snap.tombstones) == 1
    # age the tombstoned file a hair so the 0-hour cutoff passes it
    victim = next(iter(snap.tombstones))
    old = time.time() - 60
    os.utime(os.path.join(p, victim), (old, old))
    # property default (0 h) -> the tombstone is expired
    assert sorted(vacuum(p, dry_run=True)) == [victim]
    # explicit retention overrides the property -> nothing expired
    assert vacuum(p, retention_hours=168, dry_run=True) == []


def test_auto_compact_threshold_is_per_partition(spark, tmp_path):
    """A wide append brushing many partitions with one small file each
    must NOT trigger (delta-spark's minNumFiles is per directory)."""
    p = str(tmp_path / "t")
    cfg = {
        "delta.autoOptimize.autoCompact": "true",
        "delta.autoOptimize.minNumFiles": "4",
    }
    wide = (
        spark.range(0, 60)
        .withColumn("part", F.col("id") % 30)
        .coalesce(1)  # exactly ONE file per partition value per write
    )
    to_delta(wide, p, partition_by=["part"], configuration=cfg)
    to_delta(wide, p, mode="append")  # 30 partitions × 2 small files
    _SNAPSHOT_CACHE.clear()
    ops = [c.get("operation") for c in DeltaLog(p).commit_infos()]
    # 60 small files total, but no single partition holds >= 4
    assert "OPTIMIZE" not in ops


def test_auto_compact_rewrites_only_small_files(spark, tmp_path):
    """Large already-compacted files in a qualifying partition are
    neither read nor tombstoned — the trigger's I/O is O(small files)."""
    from dask_deltalake_spark.delta.maintenance import optimize

    p = str(tmp_path / "t")
    to_delta(spark.range(0, 500).coalesce(1), p)
    optimize(p, spark=spark)  # one "large" baseline file
    _SNAPSHOT_CACHE.clear()
    (big,) = [a.path for a in DeltaLog(p).snapshot().add_actions]
    big_size = DeltaLog(p).snapshot().add_actions[0].size
    # now enable auto-compact with a target BELOW the big file's size
    # so only the new small appends count and compact
    from dask_deltalake_spark.delta.maintenance import set_table_properties

    set_table_properties(
        p,
        {
            "delta.autoOptimize.autoCompact": "true",
            "delta.autoOptimize.minNumFiles": "4",
            "delta.targetFileSize": str(big_size - 1),
        },
    )
    for lo in (500, 510):
        to_delta(spark.range(lo, lo + 10).repartition(2), p, mode="append")
    _SNAPSHOT_CACHE.clear()
    snap = DeltaLog(p).snapshot()
    paths = [a.path for a in snap.add_actions]
    assert big in paths, "large file must survive untouched"
    assert len(paths) == 2  # big + one compacted small-file output
    assert read_delta(p, spark=spark).count() == 520


def test_optimize_min_file_size_cut(spark, tmp_path):
    from dask_deltalake_spark.delta.maintenance import optimize

    p = str(tmp_path / "t")
    to_delta(spark.range(0, 500).coalesce(1), p)
    to_delta(spark.range(500, 510).repartition(3), p, mode="append")
    _SNAPSHOT_CACHE.clear()
    sizes = {a.path: a.size for a in DeltaLog(p).snapshot().add_actions}
    big = max(sizes, key=sizes.get)
    res = optimize(p, min_file_size=sizes[big], spark=spark)
    assert res["numFilesRemoved"] == 3 and res["numFilesAdded"] == 1
    _SNAPSHOT_CACHE.clear()
    paths = [a.path for a in DeltaLog(p).snapshot().add_actions]
    assert big in paths and len(paths) == 2
    assert read_delta(p, spark=spark).count() == 510
    # fewer than 2 candidates -> no-op, no commit
    v = DeltaLog(p).snapshot().version
    res2 = optimize(p, min_file_size=sizes[big], spark=spark)
    assert res2["numFilesRemoved"] == 0 and DeltaLog(p).versions()[-1] == v


def test_target_file_size_suffix_and_interval_grammar(spark, tmp_path):
    from dask_deltalake_spark.delta.maintenance import (
        _parse_retention_interval,
    )
    from dask_deltalake_spark.delta.writer import _target_file_size

    assert _target_file_size({"delta.targetFileSize": "100mb"}) == 100 << 20
    assert _target_file_size({"delta.targetFileSize": "1g"}) == 1 << 30
    assert _target_file_size({"delta.targetFileSize": "134217728"}) == 128 << 20
    assert _target_file_size({}) == 128 << 20
    with pytest.warns(RuntimeWarning, match="targetFileSize"):
        assert _target_file_size({"delta.targetFileSize": "huge"}) == 128 << 20

    assert _parse_retention_interval("interval 1 week 2 days") == 168 + 48
    assert _parse_retention_interval("interval 90 seconds") == 90 / 3600
    assert _parse_retention_interval("7 days") == 168
    with pytest.raises(ValueError, match="calendar-variable"):
        _parse_retention_interval("interval 1 month")
    with pytest.raises(ValueError, match="Unparseable"):
        _parse_retention_interval("whenever")


def test_vacuum_warns_not_crashes_on_bad_retention_property(spark, tmp_path):
    from dask_deltalake_spark.delta.maintenance import vacuum

    p = str(tmp_path / "t")
    to_delta(
        spark.range(0, 5).coalesce(1),
        p,
        configuration={
            "delta.deletedFileRetentionDuration": "interval 1 month"
        },
    )
    with pytest.warns(RuntimeWarning, match="deletedFileRetentionDuration"):
        assert vacuum(p) == []  # falls back to 168 h, does not raise


def test_generate_symlink_manifest(spark, tmp_path):
    """delta-spark GENERATE symlink_format_manifest: hive-layout
    manifest files listing the CURRENT snapshot's absolute URIs;
    regeneration drops stale partitions; DV snapshots refuse."""
    from dask_deltalake_spark.delta.maintenance import (
        generate_symlink_manifest,
    )
    from dask_deltalake_spark.delta.mutate import delete_where
    from dask_deltalake_spark.delta.protocol import DeltaProtocolError

    # unpartitioned
    p = str(tmp_path / "t")
    to_delta(spark.range(0, 10).repartition(2), p)
    res = generate_symlink_manifest(p)
    assert res["numManifestFiles"] == 1 and res["numDataFiles"] == 2
    mf = os.path.join(p, "_symlink_format_manifest", "manifest")
    uris = open(mf).read().strip().splitlines()
    assert len(uris) == 2 and all(u.startswith("file://") for u in uris)
    for u in uris:
        assert os.path.exists(u[len("file://"):])

    # partitioned + stale-partition cleanup after delete
    p2 = str(tmp_path / "t2")
    df = spark.range(0, 100).withColumn("part", (F.col("id") % 2).cast("int"))
    to_delta(df, p2, partition_by=["part"])
    generate_symlink_manifest(p2)
    assert os.path.exists(
        os.path.join(p2, "_symlink_format_manifest", "part=1", "manifest")
    )
    delete_where(p2, [("part", "==", 1)], spark=spark)
    # the sweep's concurrency fence only removes manifests written
    # >2 s before the run starts — backdate to make cleanup immediate
    _m1 = os.path.join(p2, "_symlink_format_manifest", "part=1", "manifest")
    _old = __import__("time").time() - 60
    os.utime(_m1, (_old, _old))
    _SNAPSHOT_CACHE.clear()
    res2 = generate_symlink_manifest(p2)
    assert res2["numManifestFiles"] == 1
    assert not os.path.exists(
        os.path.join(p2, "_symlink_format_manifest", "part=1")
    )
    uris0 = open(
        os.path.join(p2, "_symlink_format_manifest", "part=0", "manifest")
    ).read().strip().splitlines()
    assert uris0, "surviving partition listed"

    # DV refusal
    p3 = str(tmp_path / "t3")
    to_delta(spark.range(0, 50).repartition(2), p3)
    delete_where(p3, [("id", "<", 5)], spark=spark, strategy="merge-on-read")
    _SNAPSHOT_CACHE.clear()
    with pytest.raises(DeltaProtocolError, match="deletion vector"):
        generate_symlink_manifest(p3)


def test_symlink_manifest_no_blackout_regeneration(spark, tmp_path):
    """ADVICE r9 (low): regeneration must not rmtree the manifest root
    — new manifests land via temp+rename over their predecessors and
    only stale partition directories are removed afterwards, so a
    Presto/Trino/Athena reader racing the generation sees the previous
    snapshot or the new one, never an empty table."""
    from dask_deltalake_spark.delta.maintenance import (
        generate_symlink_manifest,
    )

    p = str(tmp_path / "t")
    df = spark.range(0, 40).withColumn("part", (F.col("id") % 2).cast("int"))
    to_delta(df, p, partition_by=["part"])
    generate_symlink_manifest(p)
    root = os.path.join(p, "_symlink_format_manifest")
    # foreign marker a blanket rmtree would have destroyed
    marker = os.path.join(root, "_reader_marker")
    with open(marker, "w") as fh:
        fh.write("x")
    # leftover temp from a CRASHED run inside a live partition dir —
    # backdated past the 15-MINUTE age gate (r10 widened it from 60 s;
    # a fresh tmp is presumed to be a concurrent generation's
    # in-flight write and is never swept)
    tmp_left = os.path.join(root, "part=0", ".manifest.dead1234.tmp")
    with open(tmp_left, "w") as fh:
        fh.write("junk")
    old = __import__("time").time() - 3600
    os.utime(tmp_left, (old, old))
    # a FRESH tmp (concurrent run in flight) must survive the sweep
    tmp_live = os.path.join(root, "part=0", ".manifest.live5678.tmp")
    with open(tmp_live, "w") as fh:
        fh.write("in-flight")
    before = open(os.path.join(root, "part=0", "manifest")).read()
    to_delta(
        df.filter("part = 0"), p, mode="overwrite", partition_by=["part"]
    )
    # backdate past the sweep's 2 s concurrency-fence slack so the
    # dropped partition cleans up in THIS regeneration
    _m1 = os.path.join(root, "part=1", "manifest")
    os.utime(_m1, (old, old))
    _SNAPSHOT_CACHE.clear()
    res = generate_symlink_manifest(p)
    assert res["numManifestFiles"] == 1
    assert os.path.exists(marker), "non-manifest content preserved"
    assert not os.path.exists(tmp_left), "crashed-run temp swept"
    assert os.path.exists(tmp_live), "in-flight concurrent tmp kept"
    assert not os.path.exists(os.path.join(root, "part=1")), "stale gone"
    after = open(os.path.join(root, "part=0", "manifest")).read()
    assert after != before, "live manifest replaced with the new snapshot"
