"""File-level CDC reads (delta/cdc.py): insert/delete change sets per
commit, exclusive starting_version resume semantics, dataChange=false
invisibility."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from dask_deltalake_spark.delta.cdc import read_delta_changes
from dask_deltalake_spark.delta.maintenance import optimize
from dask_deltalake_spark.delta.mutate import delete_where
from dask_deltalake_spark.delta.reader import read_delta
from dask_deltalake_spark.delta.writer import to_delta


def _df(spark, lo, hi):
    return (
        spark.range(lo, hi)
        .withColumn("part", (F.col("id") % 2).cast("int"))
        .withColumn("val", F.col("id") * 10)
    )


def test_appends_surface_as_inserts(spark, tmp_path):
    path = str(tmp_path / "t")
    to_delta(_df(spark, 0, 100), path)          # v0
    to_delta(_df(spark, 100, 130), path, mode="append")  # v1
    ch = read_delta_changes(path, starting_version=0, spark=spark)
    rows = ch.groupBy("_change_type", "_commit_version").count().collect()
    assert {(r["_change_type"], r["_commit_version"], r["count"]) for r in rows} == {
        ("insert", 1, 30)
    }
    # from table start (-1): v0's initial snapshot is an insert set too
    all_ch = read_delta_changes(path, starting_version=-1, spark=spark)
    n = {
        (r["_change_type"], r["_commit_version"]): r["count"]
        for r in all_ch.groupBy("_change_type", "_commit_version").count().collect()
    }
    assert n == {("insert", 0): 100, ("insert", 1): 30}


def test_partition_delete_surfaces_as_deletes(spark, tmp_path):
    path = str(tmp_path / "t")
    to_delta(_df(spark, 0, 100), path, partition_by=["part"])  # v0
    delete_where(path, [("part", "==", 1)], spark=spark)       # v1
    ch = read_delta_changes(path, starting_version=0, spark=spark)
    assert ch.filter("_change_type = 'delete'").count() == 50
    assert ch.filter("_change_type = 'insert'").count() == 0
    # deleted rows carry their data (consumers need the old image)
    assert (
        ch.filter("_change_type = 'delete'").agg(F.min("part")).first()[0] == 1
    )


def test_optimize_is_invisible(spark, tmp_path):
    path = str(tmp_path / "t")
    to_delta(_df(spark, 0, 50).repartition(4), path)  # v0, several files
    optimize(path, spark=spark)                        # v1, dataChange=false
    ch = read_delta_changes(path, starting_version=0, spark=spark)
    assert ch.count() == 0
    # schema is still the full change schema on the empty frame
    assert ch.columns[-2:] == ["_change_type", "_commit_version"]


def test_bad_ending_version_raises(spark, tmp_path):
    path = str(tmp_path / "t")
    to_delta(_df(spark, 0, 10), path)
    with pytest.raises(ValueError, match="beyond latest"):
        read_delta_changes(path, starting_version=0, ending_version=5, spark=spark)


def test_row_level_update_images(spark, tmp_path):
    """key_columns= mode: a COW UPDATE must emit exactly one
    update_preimage + one update_postimage per actually-changed row,
    suppress copied rows, and leave append commits on the file-level
    path."""
    path = str(tmp_path / "t")
    to_delta(_df(spark, 0, 100), path)                       # v0
    from dask_deltalake_spark.delta.mutate import update_where

    update_where(
        path, [("part", "==", 1)], {"val": F.col("val") + 1}, spark=spark
    )                                                        # v1 rewrite
    ch = read_delta_changes(
        path, starting_version=0, spark=spark, key_columns=["id"]
    )
    by_type = {
        r["_change_type"]: r["count"]
        for r in ch.groupBy("_change_type").count().collect()
    }
    assert by_type == {"update_preimage": 50, "update_postimage": 50}
    # images carry the right values: post = pre + 1 per key
    pre = {r["id"]: r["val"] for r in ch.filter("_change_type = 'update_preimage'").collect()}
    post = {r["id"]: r["val"] for r in ch.filter("_change_type = 'update_postimage'").collect()}
    assert set(pre) == set(post) and all(post[k] == pre[k] + 1 for k in pre)
    assert all(k % 2 == 1 for k in pre)  # only part=1 rows changed

    # append after the update stays file-level 'insert'
    to_delta(_df(spark, 100, 110), path, mode="append")      # v2
    ch2 = read_delta_changes(
        path, starting_version=1, spark=spark, key_columns=["id"]
    )
    assert {
        (r["_change_type"], r["count"])
        for r in ch2.groupBy("_change_type").count().collect()
    } == {("insert", 10)}


def test_row_level_delete_and_insert_in_rewrite(spark, tmp_path):
    """A rewrite commit where some keys vanish and some appear must
    classify them as delete/insert alongside the update images. Built
    by deleting rows non-partition-aligned (COW rewrite drops keys)."""
    path = str(tmp_path / "t")
    to_delta(_df(spark, 0, 100), path)                       # v0, one commit
    delete_where(path, [("id", "<", 10)], spark=spark)       # v1: rewrite, keys 0-9 gone
    ch = read_delta_changes(
        path, starting_version=0, spark=spark, key_columns=["id"]
    )
    by_type = {
        r["_change_type"]: r["count"]
        for r in ch.groupBy("_change_type").count().collect()
    }
    # copied rows (10..99) suppressed; only the 10 dropped keys surface
    assert by_type == {"delete": 10}
    assert {r["id"] for r in ch.collect()} == set(range(10))


def test_key_columns_validated(spark, tmp_path):
    path = str(tmp_path / "t")
    to_delta(_df(spark, 0, 10), path)
    with pytest.raises(ValueError, match="key_columns"):
        read_delta_changes(
            path, starting_version=-1, spark=spark, key_columns=["nope"]
        )


def test_cdf_timestamp_range_options(spark, tmp_path):
    """startingTimestamp/endingTimestamp (delta-spark CDF parity):
    starting = first commit at/after, ending = last commit at/before,
    resolved against the commit clock; after-last starting raises."""
    import time

    from dask_deltalake_spark.delta.log import DeltaLog

    path = str(tmp_path / "t")
    to_delta(_df(spark, 0, 3), path)  # v0
    time.sleep(0.05)
    to_delta(_df(spark, 3, 5), path, mode="append")  # v1
    time.sleep(0.05)
    to_delta(_df(spark, 5, 9), path, mode="append")  # v2
    ts = DeltaLog(path).version_timestamps()

    def iso(t):
        from datetime import datetime, timezone

        return datetime.fromtimestamp(t, tz=timezone.utc).isoformat()

    between_0_1 = iso((ts[0] + ts[1]) / 2)
    between_1_2 = iso((ts[1] + ts[2]) / 2)

    got = read_delta_changes(
        path, starting_timestamp=between_0_1, spark=spark
    )
    assert {r["_commit_version"] for r in got.collect()} == {1, 2}
    assert got.count() == 6  # v1's 2 rows + v2's 4

    only_v1 = read_delta_changes(
        path,
        starting_timestamp=between_0_1,
        ending_timestamp=between_1_2,
        spark=spark,
    )
    assert {r["_commit_version"] for r in only_v1.collect()} == {1}

    # the DataSource twins resolve identically
    from dask_deltalake_spark.sources import register_python_datasource

    register_python_datasource(spark)
    src = (
        spark.read.format("delta_py_cdf")
        .option("path", path)
        .option("startingTimestamp", between_0_1)
        .option("endingTimestamp", between_1_2)
        .load()
    )
    assert {r["_commit_version"] for r in src.collect()} == {1}

    with pytest.raises(ValueError, match="after the latest"):
        read_delta_changes(
            path, starting_timestamp="2099-01-01T00:00:00", spark=spark
        )

    with pytest.raises(ValueError, match="mutually exclusive"):
        read_delta_changes(
            path,
            starting_version=1,
            starting_timestamp=between_0_1,
            spark=spark,
        )


def test_cdf_fold_reconstructs_every_version(spark, tmp_path):
    """The change feed's defining invariant, pinned end-to-end: for a
    lifecycle mixing appends, row-level DELETE/UPDATE (both
    strategies), MERGE upsert, and a dataChange=false OPTIMIZE,
    folding the CDF (+insert / -delete / update_pre→update_post)
    onto any version-k snapshot reproduces the version-m snapshot
    for EVERY k < m — if any commit's change set is incomplete,
    duplicated, or signed wrong, some fold diverges."""
    from dask_deltalake_spark.delta.mutate import merge_into, update_where
    from dask_deltalake_spark.delta.reader import read_delta

    path = str(tmp_path / "t")
    to_delta(_df(spark, 0, 60).coalesce(2), path)                 # v0
    to_delta(_df(spark, 60, 80), path, mode="append")             # v1
    delete_where(path, [("id", "<", 10)], spark=spark)            # v2 COW
    update_where(
        path, [("part", "==", 1)], {"val": F.col("val") + 1},
        spark=spark,
    )                                                             # v3
    delete_where(
        path, [("id", ">=", 70)], spark=spark,
        strategy="merge-on-read",
    )                                                             # v4 MoR
    # MERGE AFTER the MoR delete: r11 COW DML reads touched files
    # through their vectors, so the upsert's rewrite must materialize
    # the v4 vector state without resurrecting its dead rows — the
    # fold below would diverge if it did
    merge_into(
        path,
        _df(spark, 55, 65).withColumn("val", F.lit(-1)),
        keys="id",
        spark=spark,
    )                                                             # v5
    optimize(path, spark=spark)                                   # v6 no-op CDF

    def snap(v):
        return {
            (r["id"], r["part"], r["val"])
            for r in read_delta(path, version=v, spark=spark).collect()
        }

    latest = 6
    states = {v: snap(v) for v in range(latest + 1)}
    assert states[6] == states[5], "OPTIMIZE must be CDF/data invisible"
    for k in range(latest):
        ch = read_delta_changes(
            path, starting_version=k, spark=spark
        ).collect()
        folded = set(states[k])
        # apply in commit order; within a commit removals before adds
        by_v: dict = {}
        for r in ch:
            by_v.setdefault(r["_commit_version"], []).append(r)
        for v in sorted(by_v):
            for r in by_v[v]:
                if r["_change_type"] in ("delete", "update_preimage"):
                    folded.discard((r["id"], r["part"], r["val"]))
            for r in by_v[v]:
                if r["_change_type"] in ("insert", "update_postimage"):
                    folded.add((r["id"], r["part"], r["val"]))
        assert folded == states[latest], (
            f"CDF fold from v{k} diverged from v{latest}"
        )


def test_cdf_range_over_cleaned_commits_raises_clearly(spark, tmp_path):
    """The change feed is commit-backed: a range whose commits were
    removed by retention cleanup (table still replayable through its
    checkpoint) raises a CLEAR range error naming the missing
    commits, not a FileNotFoundError mid-read."""
    import glob
    import os

    from dask_deltalake_spark.delta.log import _SNAPSHOT_CACHE
    from dask_deltalake_spark.delta.maintenance import create_checkpoint

    path = str(tmp_path / "t")
    df = spark.range(10).selectExpr("id", "CAST(id AS STRING) AS s")
    to_delta(df, path, configuration={"delta.enableChangeDataFeed": "true"})
    to_delta(df, path, mode="append")   # v1
    to_delta(df, path, mode="append")   # v2
    create_checkpoint(path)             # checkpoint at 2
    to_delta(df, path, mode="append")   # v3
    # an INTERIOR commit of the requested range goes missing (both
    # BOUNDARY states stay replayable: v0 via its JSON, v3 via the
    # checkpoint) — the shape the pre-check exists for
    os.remove(os.path.join(path, "_delta_log", f"{1:020d}.json"))
    _SNAPSHOT_CACHE.clear()
    with pytest.raises(ValueError, match="not available: commit"):
        read_delta_changes(path, starting_version=0, spark=spark).count()
    # a range whose consumed boundary the checkpoint covers still
    # reads fine past the gap
    assert sorted(
        r[0]
        for r in read_delta_changes(path, starting_version=2, spark=spark)
        .select("_commit_version").distinct().collect()
    ) == [3]


def test_checkpoint_only_log_latest_version_and_cdf_error(spark, tmp_path):
    """Checkpoint-only logs (zero JSON commits survive): after the r13
    existence fixes, exists()/snapshot() treat the table as existing —
    latest_version() must AGREE and fall back to the newest checkpoint
    version (ADVICE r13), so the surfaces riding it (CDC, streaming
    sources) see a consistent table. The change feed — commit-backed
    by contract — then fails its own range pre-validation with the
    clear retention error, not 'No Delta table found'."""
    import glob
    import os

    from dask_deltalake_spark.delta.log import _SNAPSHOT_CACHE, DeltaLog
    from dask_deltalake_spark.delta.maintenance import create_checkpoint

    path = str(tmp_path / "t")
    df = spark.range(10).selectExpr("id", "CAST(id AS STRING) AS s")
    to_delta(df, path, configuration={"delta.enableChangeDataFeed": "true"})
    to_delta(df, path, mode="append")   # v1
    create_checkpoint(path)             # checkpoint at 1
    for j in glob.glob(os.path.join(path, "_delta_log", "*.json")):
        os.remove(j)
    _SNAPSHOT_CACHE.clear()

    log = DeltaLog(path)
    assert log.versions() == []
    assert log.latest_version() == 1          # checkpoint anchor
    assert log.snapshot().version == 1        # agrees with existence
    with pytest.raises(ValueError, match="not available: commit"):
        read_delta_changes(path, starting_version=0, spark=spark).count()


def _feed(spark, path, **kw):
    return {
        (r["id"], r["val"], r["_change_type"], r["_commit_version"])
        for r in read_delta_changes(path, spark=spark, **kw).collect()
    }


def test_cdf_write_support_dml_emits_cdc_actions(spark, tmp_path):
    """CDF WRITE support (r15): on a delta.enableChangeDataFeed=true
    table, COW DELETE/UPDATE/MERGE write _change_data files and
    commit `cdc` actions (delta-spark parity) — so a spec reader
    (including our own, which prefers cdc files) gets exact row-level
    images instead of the add/remove reconstruction that
    double-reports every merely-copied row of a rewrite. Cross-
    validated: the cdc-backed feed must equal the key-columns
    reconstruction feed from an identical NON-CDF twin table."""
    import json as _json
    import os

    from dask_deltalake_spark.delta.log import DeltaLog
    from dask_deltalake_spark.delta.mutate import merge_into, update_where

    df = spark.range(20).selectExpr("id", "id * 10 AS val")

    def _build(path, cdf):
        conf = {"delta.enableChangeDataFeed": "true"} if cdf else None
        to_delta(df, path, configuration=conf)                   # v0
        delete_where(path, [("id", "<", 5)], spark=spark)        # v1
        update_where(path, [("id", ">=", 15)],
                     {"val": F.col("val") + 1}, spark=spark)     # v2
        src = spark.range(18, 24).selectExpr("id", "id * 100 AS val")
        merge_into(path, src, keys=["id"], spark=spark)          # v3

    cdf_path = str(tmp_path / "cdf")
    twin_path = str(tmp_path / "twin")
    _build(cdf_path, cdf=True)
    _build(twin_path, cdf=False)

    # protocol: CDF create lands writer v4 (other engines' gates fire)
    assert DeltaLog(cdf_path).snapshot().protocol.min_writer_version == 4

    # every DML commit carries cdc actions; v0 (blind append) none
    log_dir = os.path.join(cdf_path, "_delta_log")
    for v, want_cdc in ((0, False), (1, True), (2, True), (3, True)):
        acts = [
            _json.loads(ln)
            for ln in open(os.path.join(log_dir, f"{v:020d}.json"))
            if ln.strip()
        ]
        has = any("cdc" in a for a in acts)
        assert has == want_cdc, (v, acts)
        for a in acts:
            if "cdc" in a:
                assert a["cdc"]["dataChange"] is False
                rel = a["cdc"]["path"]
                assert rel.startswith("_change_data/")
                assert os.path.exists(os.path.join(cdf_path, rel))

    got = _feed(spark, cdf_path)
    want = _feed(spark, twin_path, key_columns=["id"])
    assert got == want
    # spot-check the exact images
    v1 = {r for r in got if r[3] == 1}
    assert v1 == {(i, i * 10, "delete", 1) for i in range(5)}
    v2 = {r for r in got if r[3] == 2}
    assert v2 == (
        {(i, i * 10, "update_preimage", 2) for i in range(15, 20)}
        | {(i, i * 10 + 1, "update_postimage", 2) for i in range(15, 20)}
    )
    v3 = {r for r in got if r[3] == 3}
    assert {(i, i * 100, "insert", 3) for i in (20, 21, 22, 23)} <= v3
    assert {(i, i * 100, "update_postimage", 3) for i in (18, 19)} <= v3
    # final table state identical on both tables
    a = {(r["id"], r["val"])
         for r in read_delta(cdf_path, spark=spark).collect()}
    b = {(r["id"], r["val"])
         for r in read_delta(twin_path, spark=spark).collect()}
    assert a == b


def test_cdf_write_support_partitioned_and_empty_match(spark, tmp_path):
    """Partitioned CDF table: cdc files land under hive dirs inside
    _change_data/ and the feed resolves partition columns; a DELETE
    matching NOTHING still commits an (empty) cdc action so the
    file swap cannot reconstruct as spurious delete+insert."""
    import json as _json
    import os

    path = str(tmp_path / "t")
    df = spark.range(20).selectExpr(
        "id", "CAST(id % 2 AS INT) AS p", "id * 10 AS val"
    )
    to_delta(df, path, partition_by=["p"],
             configuration={"delta.enableChangeDataFeed": "true"})
    delete_where(path, [("id", "<", 4)], spark=spark)  # v1: 4 deletes
    got = {
        (r["id"], r["p"], r["_change_type"])
        for r in read_delta_changes(
            path, starting_version=0, spark=spark
        ).collect()
    }
    assert got == {(i, i % 2, "delete") for i in range(4)}

    # nothing-matched delete on a pruned-but-rewritten region: the
    # stats prune may keep a file whose rows all survive; force the
    # shape with a predicate no row satisfies inside a touched file
    delete_where(path, [("id", "==", -1)], spark=spark)  # v2
    log_dir = os.path.join(path, "_delta_log")
    acts = [
        _json.loads(ln)
        for ln in open(os.path.join(log_dir, f"{2:020d}.json"))
        if ln.strip()
    ]
    assert any("cdc" in a for a in acts)
    feed2 = read_delta_changes(path, starting_version=1, spark=spark)
    assert feed2.count() == 0  # zero changes, NOT a delete+insert storm


def test_cdf_merge_on_read_emits_cdc_images(spark, tmp_path):
    """MoR strategies on a CDF table (r15, completing the write
    matrix): DELETE emits exactly the NEWLY-dead rows (rows a prior
    delete already vector-killed must not re-emit), UPDATE emits
    pre/post pairs for the matched live rows — both as cdc actions in
    the same atomic commit as the vectors, cross-validated against
    the vector-delta reconstruction feed of an identical non-CDF
    twin."""
    import json as _json
    import os

    from dask_deltalake_spark.delta.mutate import update_where

    df = spark.range(20).selectExpr("id", "id * 10 AS val")

    def _build(path, cdf):
        conf = {"delta.enableChangeDataFeed": "true"} if cdf else None
        to_delta(df, path, configuration=conf)                     # v0
        delete_where(path, [("id", "<", 5)], spark=spark,
                     strategy="merge-on-read")                     # v1
        # overlapping predicate: ids 3,4 already dead — only 5,6 new
        delete_where(path, [("id", "<", 7)], spark=spark,
                     strategy="merge-on-read")                     # v2
        update_where(path, [("id", ">=", 18)],
                     {"val": F.col("val") + 1}, spark=spark,
                     strategy="merge-on-read")                     # v3

    cdf_path = str(tmp_path / "cdf")
    twin = str(tmp_path / "twin")
    _build(cdf_path, cdf=True)
    _build(twin, cdf=False)

    # cdc actions present on every MoR commit
    log_dir = os.path.join(cdf_path, "_delta_log")
    for v in (1, 2, 3):
        acts = [
            _json.loads(ln)
            for ln in open(os.path.join(log_dir, f"{v:020d}.json"))
            if ln.strip()
        ]
        assert any("cdc" in a for a in acts), v

    got = _feed(spark, cdf_path, starting_version=-1)
    want = _feed(spark, twin, starting_version=-1, key_columns=["id"])
    assert got == want
    assert {r for r in got if r[3] == 1} == {
        (i, i * 10, "delete", 1) for i in range(5)
    }
    # v2: ONLY the newly-dead rows 5, 6 — no re-emission of 0-4
    assert {r for r in got if r[3] == 2} == {
        (5, 50, "delete", 2), (6, 60, "delete", 2)
    }
    assert {r for r in got if r[3] == 3} == (
        {(i, i * 10, "update_preimage", 3) for i in (18, 19)}
        | {(i, i * 10 + 1, "update_postimage", 3) for i in (18, 19)}
    )
    # table state identical
    a = {(r["id"], r["val"])
         for r in read_delta(cdf_path, spark=spark).collect()}
    b = {(r["id"], r["val"])
         for r in read_delta(twin, spark=spark).collect()}
    assert a == b


def test_vacuum_reclaims_cdc_files_only_after_log_cleanup(
    spark, tmp_path
):
    """cdc-file retention (r15): a _change_data file is protected
    while its commit JSON is still in the log (the feed of that
    version is readable) — vacuum at retention 0 lists NONE; once
    the commit leaves the log (retention cleanup — simulated by a
    checkpoint plus JSON deletion, the exact state cleanup produces)
    the cdc file becomes an ordinary mtime-aged candidate and full
    vacuum reclaims it. Without this, _change_data grows without
    bound on any long-lived CDF table."""
    import glob
    import os

    from dask_deltalake_spark.delta.log import _SNAPSHOT_CACHE
    from dask_deltalake_spark.delta.maintenance import (
        create_checkpoint,
        vacuum,
    )

    path = str(tmp_path / "t")
    to_delta(spark.range(10).selectExpr("id", "id AS val"), path,
             configuration={"delta.enableChangeDataFeed": "true"})
    delete_where(path, [("id", "<", 3)], spark=spark)  # v1 + cdc file
    cdc_files = glob.glob(os.path.join(path, "_change_data", "*.parquet"))
    assert cdc_files

    cands = vacuum(path, retention_hours=0, dry_run=True)
    assert not any(c.startswith("_change_data") for c in cands), cands

    # simulate metadata cleanup: checkpoint then drop the JSONs
    create_checkpoint(path)
    for j in glob.glob(os.path.join(path, "_delta_log", "*.json")):
        os.remove(j)
    _SNAPSHOT_CACHE.clear()
    cands = vacuum(path, retention_hours=0, dry_run=True)
    assert any(c.startswith("_change_data") for c in cands), cands
    vacuum(path, retention_hours=0, dry_run=False, spark=spark)
    assert not glob.glob(os.path.join(path, "_change_data", "*.parquet"))
    # the table itself still reads through the checkpoint
    assert read_delta(path, spark=spark).count() == 7


def test_enable_change_data_feed_on_existing_table(spark, tmp_path):
    """enable_change_data_feed (ADVICE r15): enabling the feed on an
    existing plain table commits protocol v7 + the property
    atomically, is idempotent, and DML AFTER the enablement version
    emits cdc actions the feed reads verbatim (the pre-enablement
    append still reconstructs as inserts)."""
    import glob
    import os

    from dask_deltalake_spark.delta.cdc import enable_change_data_feed
    from dask_deltalake_spark.delta.log import DeltaLog

    path = str(tmp_path / "t")
    to_delta(spark.range(10).selectExpr("id", "id * 2 AS val"), path)  # v0
    v = enable_change_data_feed(path)
    assert v == 1
    assert enable_change_data_feed(path) == 1  # idempotent: no new commit

    snap = DeltaLog(path).snapshot()
    assert snap.protocol.min_writer_version == 7
    assert "changeDataFeed" in (snap.protocol.writer_features or [])
    assert (
        snap.metadata.configuration["delta.enableChangeDataFeed"] == "true"
    )

    delete_where(path, [("id", "<", 4)], spark=spark)  # v2, cdc-emitting
    assert glob.glob(os.path.join(path, "_change_data", "*.parquet"))
    feed = read_delta_changes(path, starting_version=-1, spark=spark)
    rows = {(r["id"], r["_change_type"], r["_commit_version"])
            for r in feed.select("id", "_change_type",
                                 "_commit_version").collect()}
    # v0: 10 inserts (reconstructed); v1 metadata-only: nothing;
    # v2: exactly the 4 deletes, from the cdc file
    assert sum(1 for _, t, v_ in rows if t == "insert" and v_ == 0) == 10
    assert {(i, "delete", 2) for i in range(4)} <= rows
    assert sum(1 for _, t, v_ in rows if v_ == 2) == 4


def test_enable_change_data_feed_refuses_unknown_writer_feature(
    spark, tmp_path
):
    """enable_change_data_feed is writer-gated (ADVICE r15): a table
    carrying an unknown foreign writer feature must refuse the
    upgrade commit, like every other write path."""
    from dask_deltalake_spark.delta.cdc import enable_change_data_feed
    from dask_deltalake_spark.delta.protocol import (
        DeltaProtocolError,
        Protocol,
    )
    from dask_deltalake_spark.delta.writer import write_commit

    path = str(tmp_path / "t")
    to_delta(spark.range(5).selectExpr("id", "id AS val"), path)  # v0
    write_commit(
        path,
        1,
        [
            {"commitInfo": {"timestamp": 0, "operation": "UPGRADE"}},
            Protocol(
                min_writer_version=7,
                writer_features=["someFutureFeature"],
            ).to_json(),
        ],
    )
    with pytest.raises(DeltaProtocolError, match="someFutureFeature"):
        enable_change_data_feed(path)


def test_foreign_cdc_partition_values_are_authoritative(spark, tmp_path):
    """Foreign cdc-action partition stamping (ADVICE r15): a foreign
    writer whose _change_data paths are NOT Hive-partitioned (flat
    cdc-XXXX.parquet names) still yields correct partition columns —
    they come from the cdc action's partitionValues field, which is
    authoritative per the spec, NOT from basePath directory
    inference (which returned NULL for this layout)."""
    import json as _json
    import os

    import pyarrow as pa
    import pyarrow.parquet as _pq

    from dask_deltalake_spark.delta.protocol import Metadata, Protocol
    from dask_deltalake_spark.delta.writer import write_commit

    path = str(tmp_path / "foreign")
    os.makedirs(os.path.join(path, "_change_data"))
    os.makedirs(os.path.join(path, "part=a"))

    schema_str = _json.dumps({
        "type": "struct",
        "fields": [
            {"name": "k", "type": "long", "nullable": True,
             "metadata": {}},
            {"name": "part", "type": "string", "nullable": True,
             "metadata": {}},
        ],
    })

    def _write(rel, kk, types=None):
        cols = {"k": pa.array(kk, pa.int64())}
        if types is not None:
            cols["_change_type"] = pa.array(types, pa.string())
        _pq.write_table(pa.table(cols), os.path.join(path, rel))
        return os.path.getsize(os.path.join(path, rel))

    sz0 = _write("part=a/f0.parquet", [1, 2, 3])
    write_commit(path, 0, [
        Protocol(min_reader_version=1, min_writer_version=4).to_json(),
        Metadata(
            id="foreign-part-cdf", schema_string=schema_str,
            partition_columns=["part"],
            configuration={"delta.enableChangeDataFeed": "true"},
        ).to_json(),
        {"add": {"path": "part=a/f0.parquet",
                 "partitionValues": {"part": "a"}, "size": sz0,
                 "modificationTime": 1000, "dataChange": True}},
    ])
    sz1 = _write("part=a/f1.parquet", [1, 2, 3])
    # flat (non-Hive) cdc path — the foreign layout the spec allows
    szc = _write("_change_data/cdc-0001.parquet", [2, 2],
                 ["update_preimage", "update_postimage"])
    write_commit(path, 1, [
        {"commitInfo": {"timestamp": 2000, "operation": "UPDATE"}},
        {"remove": {"path": "part=a/f0.parquet",
                    "deletionTimestamp": 2000, "dataChange": True}},
        {"add": {"path": "part=a/f1.parquet",
                 "partitionValues": {"part": "a"}, "size": sz1,
                 "modificationTime": 2000, "dataChange": True}},
        {"cdc": {"path": "_change_data/cdc-0001.parquet",
                 "partitionValues": {"part": "a"}, "size": szc,
                 "dataChange": False}},
    ])

    feed = read_delta_changes(path, starting_version=0, spark=spark)
    rows = [(r["k"], r["part"], r["_change_type"])
            for r in feed.collect()]
    assert sorted(rows) == [
        (2, "a", "update_postimage"),
        (2, "a", "update_preimage"),
    ]


def test_merge_cdc_balanced_under_duplicate_keys(spark, tmp_path):
    """MERGE CDC under duplicate keys (ADVICE r15): the rewrite
    replaces ALL matched target rows of a key with the source row(s)
    for that key. The images must describe that multiset delta
    exactly — one update pre/post pair per key plus delete images for
    collapsed extra target rows (and insert images for extra same-key
    source rows) — so folding the feed over the before-state
    reproduces the after-state row-for-row."""
    from collections import Counter

    from dask_deltalake_spark.delta.mutate import merge_into

    path = str(tmp_path / "t")
    # duplicate target keys: key 1 appears 3x, key 2 once
    tgt = spark.createDataFrame(
        [(1, 10), (1, 11), (1, 12), (2, 20), (3, 30)], "id long, val long"
    )
    to_delta(tgt, path,
             configuration={"delta.enableChangeDataFeed": "true"})  # v0
    # duplicate source keys: key 2 arrives twice; key 9 is an insert
    src = spark.createDataFrame(
        [(1, 100), (2, 200), (2, 201), (9, 900)], "id long, val long"
    )
    merge_into(path, src, keys=["id"], spark=spark)                 # v1

    before = Counter([(1, 10), (1, 11), (1, 12), (2, 20), (3, 30)])
    after = Counter(
        (r["id"], r["val"]) for r in read_delta(path, spark=spark).collect()
    )
    # engine semantics: matched keys collapse to their source rows
    assert after == Counter([(1, 100), (2, 200), (2, 201), (3, 30), (9, 900)])

    feed = read_delta_changes(path, starting_version=0, spark=spark)
    rows = [(r["id"], r["val"], r["_change_type"]) for r in feed.collect()]
    by_type = Counter(t for _, _, t in rows)
    # balanced: 2 keys updated -> 2 pre + 2 post; key 1's two
    # collapsed extras -> 2 deletes; key 2's extra source row + the
    # unmatched key 9 -> 2 inserts
    assert by_type == Counter(
        {"update_preimage": 2, "update_postimage": 2,
         "delete": 2, "insert": 2}
    )
    # folding the feed over the before-state reproduces the after-state
    folded = Counter(before)
    for i, v, t in rows:
        if t in ("delete", "update_preimage"):
            folded[(i, v)] -= 1
        elif t in ("insert", "update_postimage"):
            folded[(i, v)] += 1
    folded += Counter()  # drop zeros
    assert folded == after


def test_reconstruction_stamps_partition_values_for_flat_layout(
    spark, tmp_path
):
    """Reconstruction dual of the foreign-cdc partition fix: a
    foreign NON-CDF table whose data files are FLAT (not
    Hive-partitioned — spec-legal) must still surface correct
    partition columns in reconstructed insert/delete images, stamped
    from the add's partitionValues (removes carry none — the prior
    add's state is remembered, mirroring the streaming planner)."""
    import json as _json
    import os

    import pyarrow as pa
    import pyarrow.parquet as _pq

    from dask_deltalake_spark.delta.protocol import Metadata, Protocol
    from dask_deltalake_spark.delta.writer import write_commit

    path = str(tmp_path / "flat")
    os.makedirs(os.path.join(path, "_delta_log"))

    def _w(rel, ks):
        _pq.write_table(
            pa.table({"k": pa.array(ks, pa.int64())}),
            os.path.join(path, rel),
        )
        return os.path.getsize(os.path.join(path, rel))

    schema_str = _json.dumps({
        "type": "struct",
        "fields": [
            {"name": "k", "type": "long", "nullable": True,
             "metadata": {}},
            {"name": "part", "type": "string", "nullable": True,
             "metadata": {}},
        ],
    })
    sz0 = _w("d0.parquet", [1, 2])
    write_commit(path, 0, [
        Protocol(min_reader_version=1, min_writer_version=2).to_json(),
        Metadata(id="flat", schema_string=schema_str,
                 partition_columns=["part"]).to_json(),
        {"add": {"path": "d0.parquet",
                 "partitionValues": {"part": "a"}, "size": sz0,
                 "modificationTime": 1000, "dataChange": True}},
    ])
    sz1 = _w("d1.parquet", [3])
    write_commit(path, 1, [
        {"add": {"path": "d1.parquet",
                 "partitionValues": {"part": "b"}, "size": sz1,
                 "modificationTime": 2000, "dataChange": True}},
    ])
    # remove WITHOUT partitionValues (spec-legal): prior add's state
    write_commit(path, 2, [
        {"remove": {"path": "d0.parquet", "deletionTimestamp": 3000,
                    "dataChange": True}},
    ])

    feed = read_delta_changes(path, starting_version=0, spark=spark)
    rows = {(r["k"], r["part"], r["_change_type"], r["_commit_version"])
            for r in feed.collect()}
    assert rows == {
        (3, "b", "insert", 1),
        (1, "a", "delete", 2),
        (2, "a", "delete", 2),
    }


def test_foreign_cdc_action_on_column_mapped_partitioned_table(
    spark, tmp_path
):
    """Combined seam: a foreign cdc action on a COLUMN-MAPPED
    partitioned table whose _change_data file is flat — the cdc
    parquet carries PHYSICAL column names, the action's
    partitionValues is PHYSICAL-keyed, and the feed must surface
    LOGICAL column names with the partition value stamped from the
    action (r16: the stamping branch's physical-name resolution)."""
    import json as _json
    import os

    import pyarrow as pa
    import pyarrow.parquet as _pq

    from dask_deltalake_spark.delta.protocol import Metadata, Protocol
    from dask_deltalake_spark.delta.writer import write_commit

    path = str(tmp_path / "mapped")
    os.makedirs(os.path.join(path, "_change_data"))

    schema_str = _json.dumps({
        "type": "struct",
        "fields": [
            {"name": "k", "type": "long", "nullable": True,
             "metadata": {"delta.columnMapping.id": 1,
                          "delta.columnMapping.physicalName": "col-aa"}},
            {"name": "region", "type": "string", "nullable": True,
             "metadata": {"delta.columnMapping.id": 2,
                          "delta.columnMapping.physicalName": "col-bb"}},
        ],
    })

    def _w(rel, ks, types=None):
        cols = {"col-aa": pa.array(ks, pa.int64())}
        if types is not None:
            cols["_change_type"] = pa.array(types, pa.string())
        _pq.write_table(pa.table(cols), os.path.join(path, rel))
        return os.path.getsize(os.path.join(path, rel))

    sz0 = _w("f0.parquet", [1, 2])
    write_commit(path, 0, [
        Protocol(min_reader_version=2, min_writer_version=5).to_json(),
        Metadata(
            id="mapped-cdf", schema_string=schema_str,
            partition_columns=["region"],
            configuration={"delta.columnMapping.mode": "name",
                           "delta.columnMapping.maxColumnId": "2",
                           "delta.enableChangeDataFeed": "true"},
        ).to_json(),
        {"add": {"path": "f0.parquet",
                 "partitionValues": {"col-bb": "emea"}, "size": sz0,
                 "modificationTime": 1000, "dataChange": True}},
    ])
    sz1 = _w("f1.parquet", [1, 2])
    szc = _w("_change_data/cdc-0001.parquet", [2, 2],
             ["update_preimage", "update_postimage"])
    write_commit(path, 1, [
        {"commitInfo": {"timestamp": 2000, "operation": "UPDATE"}},
        {"remove": {"path": "f0.parquet", "deletionTimestamp": 2000,
                    "dataChange": True}},
        {"add": {"path": "f1.parquet",
                 "partitionValues": {"col-bb": "emea"}, "size": sz1,
                 "modificationTime": 2000, "dataChange": True}},
        {"cdc": {"path": "_change_data/cdc-0001.parquet",
                 "partitionValues": {"col-bb": "emea"}, "size": szc,
                 "dataChange": False}},
    ])

    feed = read_delta_changes(path, starting_version=0, spark=spark)
    rows = sorted(
        (r["k"], r["region"], r["_change_type"]) for r in feed.collect()
    )
    assert rows == [
        (2, "emea", "update_postimage"),
        (2, "emea", "update_preimage"),
    ]
