"""SparkSession construction tuned for this engine.

Scale posture: these configs are chosen for a real multi-executor
cluster even though tests run on ``local[N]``:

- AQE on (runtime coalescing, skew-join splitting) so shuffle
  partition counts self-tune between the 60k-row test scale and the
  100 TB production scale.
- ``spark.sql.shuffle.partitions`` defaults to the local core count;
  on a cluster it should be ~2-3x total cores — AQE coalesces down.
- UTC session timezone so timestamp semantics are deterministic and
  match ANSI engines (the DuckDB oracle).
- ``nanosAsLong`` because the events fixture carries TIMESTAMP(NANOS),
  which Spark's vectorized parquet reader otherwise rejects
  (see ``tables.load_table`` for the µs conversion).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

ENGINE_CONF = {
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    "spark.sql.legacy.parquet.nanosAsLong": "true",
    # read naive parquet timestamp[us] (isAdjustedToUTC=false) directly
    # as TimestampType instants — tz-independent and equal to DuckDB's
    # EPOCH_US view of the same bytes. With NTZ inference on, the
    # NTZ->timestamp conversion would go through an implicit cast that
    # interprets the naive value in the SESSION timezone (see
    # tables.load_table).
    "spark.sql.parquet.inferTimestampNTZ.enabled": "false",
    "spark.sql.session.timeZone": "UTC",
    "spark.sql.execution.arrow.pyspark.enabled": "true",
    "spark.sql.parquet.aggregatePushdown": "true",
    # let Python Data Sources (sources/delta_source.py) receive filters
    "spark.sql.python.filterPushdown.enabled": "true",
    # full PushedFilters/ReadSchema in plan text (plans/inspect.py reads
    # them; the 100-char default truncates scan metadata with "...")
    "spark.sql.maxMetadataStringLength": "2000",
    # generous broadcast threshold: every dim table in the star schema
    # (region/nation/customer/supplier/part) is broadcastable at any SF
    "spark.sql.autoBroadcastJoinThreshold": str(64 * 1024 * 1024),
    # Listing-job cutover for scans built from explicit file lists
    # (delta/reader.py passes every surviving add as a path). Above
    # this many paths Spark launches a DISTRIBUTED listing job whose
    # fixed dispatch (~150 ms) dwarfs driver-side getFileStatus on
    # fast-metadata filesystems (~50 µs/path ⇒ breakeven in the
    # thousands) — measured 2x on a 60-file reader build (~900 →
    # ~480 ms/call). The breakeven is LISTING-LATENCY-bound, not
    # core-count-bound: on object stores (~10-20 ms/path) Spark's
    # default of 32 is correct, so deployments there set the env var
    # back down. Same cutover shape as the footer-harvest and
    # deep-clone driver loops.
    "spark.sql.sources.parallelPartitionDiscovery.threshold": os.environ.get(
        "SPARK_GRAFT_PARALLEL_LISTING_THRESHOLD", "1024"
    ),
    "spark.serializer": "org.apache.spark.serializer.KryoSerializer",
}


def default_parallelism() -> int:
    return int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 8))


def get_spark(
    app_name: str = "dask_deltalake_spark",
    master: str | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) the engine SparkSession."""
    cpus = default_parallelism()
    builder = SparkSession.builder.appName(app_name).master(
        master or f"local[{cpus}]"
    )
    conf = dict(ENGINE_CONF)
    conf.setdefault("spark.sql.shuffle.partitions", str(cpus))
    # local-mode driver == all executors; with 32 task threads, per-core
    # headroom ≈ mem/32, so give it real memory (the box has 128 GiB)
    conf.setdefault(
        "spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "32g")
    )
    if extra_conf:
        conf.update(extra_conf)
    for k, v in conf.items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    _tune_output_committer(spark)
    return spark


def _tune_output_committer(spark: SparkSession) -> None:
    """File-output-committer tuning for the engine's staging-dir write
    pattern (r16 commit-path profile): every data-file write stages
    into a fresh private directory and the DELTA LOG — not the
    directory listing — is the source of truth, so the v1 committer's
    double rename (task → job temporary → destination) and the
    _SUCCESS marker buy nothing. Algorithm 2 commits task output
    straight to the destination (duplicate-attempt protection stays
    with Spark's OutputCommitCoordinator), and the marker write is
    dropped; measured together they remove ~30% of a small write
    job's wall time. Hadoop conf, not Spark conf — settable on a live
    session, so ensure_engine_conf applies it to foreign sessions
    too."""
    try:
        hc = spark.sparkContext._jsc.hadoopConfiguration()
        hc.set("mapreduce.fileoutputcommitter.algorithm.version", "2")
        hc.set("mapreduce.fileoutputcommitter.marksuccessfuljobs", "false")
    except Exception:
        pass  # non-JVM-backed session (Spark Connect): keep defaults


def ensure_engine_conf(spark: SparkSession) -> SparkSession:
    """Apply runtime-settable engine confs to an externally-built session.

    The driver harness builds its own SparkSession; session-scoped confs
    like the UTC timezone and nanosAsLong can still be set post-hoc.
    Static confs (serializer, driver memory) are skipped silently.
    """
    for k, v in ENGINE_CONF.items():
        try:
            spark.conf.set(k, v)
        except Exception:
            pass
    _tune_output_committer(spark)
    return spark
