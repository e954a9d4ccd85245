"""Loaders for the driver's synthetic star schema (TESTDATA.md).

Tables: region nation customer supplier part orders lineitem events
documents embeddings — one parquet file per table under
``/root/testdata/sf{0.001,0.01,0.1}``.

Scale note: each loader is a plain ``spark.read.parquet`` so Catalyst
retains full pushdown (PushedFilters / ReadSchema reach the scan). The
only transformation is the events-table timestamp repair, which is a
cheap projectable expression, not a UDF.
"""

from __future__ import annotations

import os

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import LongType, TimestampNTZType

TABLE_NAMES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def _pin_utc_or_raise(spark: SparkSession) -> None:
    """Pin the session timezone to UTC for the NTZ fallback path. This
    path exists precisely for sessions where ``spark.conf.set`` fails,
    so the set itself must be guarded: on failure, accept a session
    already at UTC, otherwise fail loudly on the REAL problem (a
    non-UTC restricted session would silently shift every NTZ value by
    the tz offset)."""
    try:
        spark.conf.set("spark.sql.session.timeZone", "UTC")
        return
    except Exception:
        pass
    try:
        tz = spark.conf.get("spark.sql.session.timeZone")
    except Exception:
        tz = None
    if tz != "UTC":
        raise RuntimeError(
            "timestamp columns were read as TIMESTAMP_NTZ and the "
            "session timezone could not be pinned to UTC (conf is "
            f"restricted; current timeZone={tz!r}). The NTZ->timestamp "
            "conversion is only correct under UTC — start the session "
            "with spark.sql.session.timeZone=UTC."
        )


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one star-schema table.

    ``events.ts`` is stored as parquet TIMESTAMP(NANOS), which Spark
    reads only as a raw long (``spark.sql.legacy.parquet.nanosAsLong``);
    we convert it to a proper TimestampType at µs precision so window /
    as-of / streaming queries get native timestamp semantics.
    """
    try:
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        # naive parquet timestamp[us] then loads directly as TimestampType
        # instants (tz-independent, equal to DuckDB EPOCH_US) instead of
        # TIMESTAMP_NTZ — see the fallback below for why NTZ is a trap
        spark.conf.set("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
    except Exception:
        pass
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    if name == "events" and isinstance(df.schema["ts"].dataType, LongType):
        # integer `div`, not `/1000`: float division routes the ns value
        # through a double (53-bit mantissa, ±128 ns at 2024 epoch-ns
        # magnitudes) and can flip the truncated µs by one vs DuckDB's
        # exact native ns→µs truncation
        df = df.withColumn(
            "ts", F.timestamp_micros(F.expr("ts div 1000"))
        )
    # Fallback only (conf set above failed, e.g. a session that forbids
    # runtime conf changes): naive parquet timestamp[us] read as
    # TIMESTAMP_NTZ must be converted to TimestampType. NOTE the
    # conversion is NOT tz-independent on its own — Spark analyzes
    # to_utc_timestamp(ntz, 'UTC') as to_utc_timestamp(CAST(ntz AS
    # timestamp), 'UTC'), and the implicit cast interprets the naive
    # value in spark.sql.session.timeZone (a non-UTC session shifts
    # every micros by the tz offset). Pin the session tz to UTC first so
    # the cast is the identity and the DuckDB oracle agrees.
    if any(isinstance(f.dataType, TimestampNTZType) for f in df.schema.fields):
        _pin_utc_or_raise(spark)
        for field in df.schema.fields:
            if isinstance(field.dataType, TimestampNTZType):
                df = df.withColumn(
                    field.name, F.to_utc_timestamp(F.col(field.name), "UTC")
                )
    return df


def load_tables(
    spark: SparkSession, sf_dir: str, names: list[str] | None = None
) -> dict[str, DataFrame]:
    return {n: load_table(spark, sf_dir, n) for n in (names or TABLE_NAMES)}


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every table as a temp view for spark.sql() queries."""
    for name in TABLE_NAMES:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)
