"""S16 parity: storage_options → Hadoop conf translation and the
local-only log-store gate."""

from __future__ import annotations

import pytest

from dask_deltalake_spark.delta.filesystem import (
    apply_storage_options,
    check_local_scheme,
)
from dask_deltalake_spark.delta.log import DeltaLog


def test_aws_options_map_to_s3a(spark):
    applied = apply_storage_options(
        spark,
        {
            "AWS_ACCESS_KEY_ID": "AKIA_TEST",
            "AWS_SECRET_ACCESS_KEY": "shhh",
            "AWS_REGION": "eu-west-1",
            "fs.s3a.path.style.access": "true",
            "unrelated_key": "ignored",
        },
    )
    assert applied["fs.s3a.access.key"] == "AKIA_TEST"
    assert applied["fs.s3a.secret.key"] == "shhh"
    assert applied["fs.s3a.endpoint.region"] == "eu-west-1"
    assert applied["fs.s3a.path.style.access"] == "true"
    assert "unrelated_key" not in applied
    hconf = spark.sparkContext._jsc.hadoopConfiguration()
    assert hconf.get("fs.s3a.access.key") == "AKIA_TEST"


def test_anon_option(spark):
    applied = apply_storage_options(spark, {"anon": True})
    assert applied["fs.s3a.aws.credentials.provider"].endswith(
        "AnonymousAWSCredentialsProvider"
    )


def test_file_uri_normalized(tmp_path):
    assert check_local_scheme(f"file://{tmp_path}") == str(tmp_path)


def test_object_store_log_replay_gated():
    with pytest.raises(NotImplementedError, match="fsspec"):
        DeltaLog("s3://bucket/table")
