"""Multi-filesystem storage configuration (reference S16 parity).

The reference maps ``storage_options`` AWS credentials onto an
``s3fs.S3FileSystem`` on the client (reference core.py:59-70,
writer.py:202-220). In Spark, executor-side parquet I/O goes through
the Hadoop FileSystem layer, so the same options translate to
``fs.s3a.*`` / ``fs.azure.*`` / ``fs.gs.*`` Hadoop configuration —
credentials set once on the session, used by every scan and write task.

Transaction-log replay (driver-side, metadata-only) reads through the
local filesystem in this build; replaying a log on an object store
needs an fsspec-backed log store, which is gated behind the optional
``fsspec`` import (not available in this container).
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import SparkSession

# storage_options key (reference naming, case-insensitive) → Hadoop conf
_S3_OPTION_MAP = {
    "aws_access_key_id": "fs.s3a.access.key",
    "access_key_id": "fs.s3a.access.key",
    "key": "fs.s3a.access.key",
    "aws_secret_access_key": "fs.s3a.secret.key",
    "secret_access_key": "fs.s3a.secret.key",
    "secret": "fs.s3a.secret.key",
    "aws_session_token": "fs.s3a.session.token",
    "session_token": "fs.s3a.session.token",
    "aws_region": "fs.s3a.endpoint.region",
    "region": "fs.s3a.endpoint.region",
    "aws_endpoint_url": "fs.s3a.endpoint",
    "endpoint_url": "fs.s3a.endpoint",
    "anon": "fs.s3a.aws.credentials.provider",
}

_ANON_PROVIDER = "org.apache.hadoop.fs.s3a.AnonymousAWSCredentialsProvider"


def apply_storage_options(
    spark: SparkSession, storage_options: Optional[dict]
) -> dict[str, str]:
    """Translate reference-style ``storage_options`` into Hadoop
    configuration on the session. Returns the applied mapping.

    Unrecognized keys pass through verbatim when they already look like
    Hadoop conf keys (``fs.*``) and are ignored otherwise — matching the
    reference's behavior of forwarding options to the fs layer.
    """
    applied: dict[str, str] = {}
    if not storage_options:
        return applied
    hconf = spark.sparkContext._jsc.hadoopConfiguration()
    for k, v in storage_options.items():
        lk = str(k).lower()
        if lk in _S3_OPTION_MAP:
            target = _S3_OPTION_MAP[lk]
            value = _ANON_PROVIDER if lk == "anon" and v else str(v)
            if lk == "anon" and not v:
                continue
            hconf.set(target, value)
            applied[target] = value
        elif str(k).startswith("fs."):
            hconf.set(str(k), str(v))
            applied[str(k)] = str(v)
    return applied


def check_local_scheme(path: str) -> str:
    """Normalize ``file://`` URIs; reject object-store URIs for log
    replay with an actionable error (data I/O would work via Hadoop FS,
    but the driver-side log store here is local-filesystem only)."""
    p = str(path)
    if p.startswith("file://"):
        return p[len("file://"):]
    if "://" in p:
        scheme = p.split("://", 1)[0]
        try:
            import fsspec  # noqa: F401
        except ImportError:
            raise NotImplementedError(
                f"Transaction-log replay over {scheme}:// requires the "
                "optional fsspec dependency (not installed); data-file "
                "I/O alone can use Hadoop FS via storage_options."
            )
    return p
