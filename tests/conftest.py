"""Shared pytest fixtures: one session-scoped SparkSession plus the
reference's golden Delta-table fixtures (unzipped from
/root/reference/tests/data — data only, never code) for protocol
parity tests."""

from __future__ import annotations

import os
import sys
import zipfile

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from dask_deltalake_spark.session import get_spark  # noqa: E402

REFERENCE_DATA = "/root/reference/tests/data"
SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="session")
def spark():
    spark = get_spark(
        app_name="dask_deltalake_spark-tests",
        master="local[8]",
        extra_conf={
            "spark.sql.shuffle.partitions": "8",
            "spark.driver.memory": "6g",
            "spark.ui.enabled": "false",
        },
    )
    yield spark
    spark.stop()


def _unzip(name: str, tmp_path_factory, subdir: str) -> str:
    zpath = os.path.join(REFERENCE_DATA, f"{name}.zip")
    out = str(tmp_path_factory.mktemp(f"fixture_{name}"))
    with zipfile.ZipFile(zpath) as z:
        z.extractall(out)
    return os.path.join(out, subdir)


@pytest.fixture(scope="session")
def simple_table(tmp_path_factory):
    return _unzip("simple", tmp_path_factory, "test1")


@pytest.fixture(scope="session")
def simple2_table(tmp_path_factory):
    path = _unzip("simple2", tmp_path_factory, "simple_table")
    # the reference test resets log mtimes to consecutive days
    # (tests/test_core.py:176-181 behavior): v0..v4 → 2020-05-02..06
    log = os.path.join(path, "_delta_log")
    import datetime as dt

    for i, fname in enumerate(sorted(os.listdir(log))):
        if fname.endswith(".json"):
            ts = dt.datetime(2020, 5, 2 + i, tzinfo=dt.timezone.utc).timestamp()
            os.utime(os.path.join(log, fname), (ts, ts))
    return path


@pytest.fixture(scope="session")
def partition_table(tmp_path_factory):
    return _unzip("partition", tmp_path_factory, "test2")


@pytest.fixture(scope="session")
def empty_table(tmp_path_factory):
    return _unzip("empty1", tmp_path_factory, "empty")


@pytest.fixture(scope="session")
def checkpoint_table(tmp_path_factory):
    return _unzip("checkpoint", tmp_path_factory, "checkpoint")


@pytest.fixture()
def vacuum_table(tmp_path_factory):
    # function-scoped: the delete test mutates it
    return _unzip("vacuum", tmp_path_factory, "vaccum_table")
