"""Loaders for the driver-generated parquet tables (TESTDATA.md).

All scans go through :func:`load_table` so filters/projections written by the
operators reach the parquet reader (Catalyst pushdown) — never pre-collect or
cache here.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

TABLES = (
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
)


def ensure_nanos_readable(spark: SparkSession) -> None:
    """Make TIMESTAMP(NANOS) parquet columns readable in ANY session.

    events.parquet carries INT64 TIMESTAMP(NANOS,false), which a vanilla
    SparkSession rejects outright (PARQUET_TYPE_ILLEGAL). The conf is
    runtime-settable, so set it here — at load time, not session-build time —
    because callers (the driver's harness included) bring their own bare
    sessions. With the conf on, ts arrives as bigint nanos and the caller
    converts explicitly.
    """
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    # Timestamp semantics must match the TZ-naive-UTC DuckDB oracles even when
    # the caller's session (or machine) isn't UTC. Runtime-settable.
    spark.conf.set("spark.sql.session.timeZone", "UTC")


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name not in TABLES:
        raise KeyError(f"unknown table {name!r}; expected one of {TABLES}")
    if name == "events":
        ensure_nanos_readable(spark)
    df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
    if name == "events" and dict(df.dtypes).get("ts") == "bigint":
        # TIMESTAMP(NANOS) read via nanosAsLong: truncate to microseconds
        # (DuckDB's epoch_us over TIMESTAMP_NS truncates the same way).
        from pyspark.sql import functions as F

        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    return df


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every testdata table as a temp view for ``spark.sql`` use."""
    for name in TABLES:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)
