"""Multi-filesystem storage configuration (reference S16 parity).

The reference maps ``storage_options`` AWS credentials onto an
``s3fs.S3FileSystem`` on the client (reference core.py:59-70,
writer.py:202-220). In Spark, executor-side parquet I/O goes through
the Hadoop FileSystem layer, so the same options translate to
``fs.s3a.*`` / ``fs.azure.*`` / ``fs.gs.*`` Hadoop configuration —
credentials set once on the session, used by every scan and write task.

Transaction-log replay (driver-side, metadata-only) goes through the
pluggable LogStore seam (delta/logstore.py): local os I/O by default,
the ``mock:`` test scheme always, any fsspec filesystem when the
optional ``fsspec`` dependency is installed (it is not in this
container, so that path is import-gated and the seam is exercised via
``mock:`` instead).
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
    """Normalize ``file://`` URIs and validate that the path's scheme
    has a log store: local paths and registered schemes (``mock:``,
    anything added via ``register_log_store``) pass through; unknown
    schemes fall back to fsspec and raise ``NotImplementedError``
    naming that missing optional dependency (the narrowed S16 gate —
    with fsspec installed, any fsspec filesystem works)."""
    from dask_deltalake_spark.delta.logstore import store_for

    p = str(path)
    if p.startswith("file://"):
        return p[len("file://"):]
    store_for(p)  # raises NotImplementedError for unservable schemes
    return p
