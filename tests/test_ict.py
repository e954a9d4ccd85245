"""In-commit timestamps (delta/ict.py + writer.py
_stamp_in_commit_timestamp): monotonic stamping across every write
path, mixed-history datetime travel, and history preferring the
in-commit clock over file mtimes."""

from __future__ import annotations

import json
import os
import time

import pyspark.sql.functions as F

from dask_deltalake_spark.delta.ict import (
    ICT_ENABLE_KEY,
    enable_in_commit_timestamps,
)
from dask_deltalake_spark.delta.log import DeltaLog
from dask_deltalake_spark.delta.maintenance import read_delta_history
from dask_deltalake_spark.delta.mutate import delete_where
from dask_deltalake_spark.delta.reader import read_delta
from dask_deltalake_spark.delta.writer import to_delta


def _df(spark, lo, hi):
    return spark.range(lo, hi).select(
        F.col("id").alias("k"), (F.col("id") * 10).alias("v")
    )


def _ict(path, v):
    return DeltaLog(path)._in_commit_timestamp(v)


def test_stamping_and_monotonicity_across_paths(spark, tmp_path):
    path = str(tmp_path / "t")
    to_delta(_df(spark, 0, 4), path)
    assert _ict(path, 0) is None  # not enabled yet
    v = enable_in_commit_timestamps(path)
    assert v == 1
    assert enable_in_commit_timestamps(path) == 1  # idempotent
    snap = DeltaLog(path).snapshot()
    assert "inCommitTimestamp" in snap.protocol.writer_features
    assert snap.metadata.configuration[ICT_ENABLE_KEY] == "true"
    # append + DML both get stamped (central choke point), monotonic
    to_delta(_df(spark, 4, 6), path, mode="append")
    delete_where(path, [("k", "==", 0)], spark=spark)
    icts = [_ict(path, i) for i in (1, 2, 3)]
    assert all(t is not None for t in icts)
    assert icts[0] < icts[1] < icts[2]


def test_datetime_travel_uses_in_commit_clock(spark, tmp_path):
    path = str(tmp_path / "t")
    to_delta(_df(spark, 0, 3), path)
    enable_in_commit_timestamps(path)
    to_delta(_df(spark, 3, 8), path, mode="append")
    # sabotage every log-file mtime to LONG AGO: mtime-based resolution
    # would now resolve any recent datetime to nothing/v-earliest
    log_dir = os.path.join(path, "_delta_log")
    for f in os.listdir(log_dir):
        os.utime(os.path.join(log_dir, f), (1_000_000, 1_000_000))
    log = DeltaLog(path)
    ict_v2 = _ict(path, 2)
    from datetime import datetime, timezone

    at_v2 = datetime.fromtimestamp(ict_v2 / 1000.0, tz=timezone.utc).isoformat()
    assert log.resolve_datetime(at_v2) == 2
    assert (
        read_delta(path, spark=spark, datetime=at_v2).count() == 8
    )
    # a pre-enable commit (v0, unstamped) keeps resolving by mtime:
    # an epoch shortly after the sabotaged mtime lands on v0
    early = datetime.fromtimestamp(1_000_001, tz=timezone.utc).isoformat()
    assert log.resolve_datetime(early) == 0


def test_history_reports_in_commit_clock(spark, tmp_path):
    path = str(tmp_path / "t")
    to_delta(_df(spark, 0, 3), path)
    enable_in_commit_timestamps(path)
    to_delta(_df(spark, 3, 4), path, mode="append")
    hist = read_delta_history(path)
    ts_by_op = dict(zip(hist["operation"], hist["timestamp"]))
    assert ts_by_op["WRITE"] == _ict(path, 2) or any(
        t == _ict(path, 2) for t in hist["timestamp"]
    )
    # raw log cross-check: the newest row's timestamp IS the ICT
    assert hist.iloc[0]["timestamp"] == _ict(path, 2)


def test_ict_chain_survives_non_leading_commit_info(spark, tmp_path):
    """The spec permits commitInfo at ANY position in a commit; a
    foreign engine's commit with trailing commitInfo must not break
    the monotonic chain or hide the stamp from the clock readers."""
    from dask_deltalake_spark.delta.protocol import commit_filename

    path = str(tmp_path / "t")
    to_delta(_df(spark, 0, 3), path)
    enable_in_commit_timestamps(path)  # v1
    to_delta(_df(spark, 3, 5), path, mode="append")  # v2, stamped
    # rewrite v2 with commitInfo LAST (what another engine may write)
    p = os.path.join(path, "_delta_log", commit_filename(2))
    with open(p, "r", encoding="utf-8") as f:
        actions = [json.loads(ln) for ln in f if ln.strip()]
    reordered = [a for a in actions if "commitInfo" not in a] + [
        a for a in actions if "commitInfo" in a
    ]
    assert reordered != actions  # the reorder actually moved it
    with open(p, "w", encoding="utf-8") as f:
        for a in reordered:
            f.write(json.dumps(a, separators=(",", ":")) + "\n")
    ict2 = _ict(path, 2)
    assert ict2 is not None  # the clock reader finds a trailing stamp
    # the NEXT commit still detects enablement + stays monotonic
    to_delta(_df(spark, 5, 7), path, mode="append")  # v3
    ict3 = _ict(path, 3)
    assert ict3 is not None and ict3 > ict2
