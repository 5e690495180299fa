"""Testdata table loading.

The driver ships deterministic TPC-H-ish parquet at
``/root/testdata/sf{0.001,0.01,0.1}`` (see TESTDATA.md). Every query in
the catalog takes ``(spark, sf_dir)`` and reads through here so schema
handling and path conventions live in one place.

Scans stay declarative (``spark.read.parquet``) so Catalyst pushes
filters and prunes columns into the parquet reader — at 100 TB the scan
is the dominant cost and pushdown/pruning is the single biggest lever.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

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

DEFAULT_SF_DIR = "/root/testdata/sf0.001"


def table_path(sf_dir: str, name: str) -> str:
    return os.path.join(sf_dir, f"{name}.parquet")


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    # events.parquet has shipped with TWO physical types for ts across
    # driver testdata generations: TIMESTAMP(NANOS) (rounds 1–3) and
    # TIMESTAMP(MICROS, isAdjustedToUTC=false) (round 4+). An
    # unconfigured session (the driver builds its own vanilla
    # SparkSession, not our get_spark()) throws PARQUET_TYPE_ILLEGAL on
    # nanos; the conf is runtime-settable, so set it here — the one
    # choke point every query reads through — then dispatch on the
    # surfaced Spark type so either generation normalizes to the same
    # TIMESTAMP(µs) column the queries and oracles agree on.
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(table_path(sf_dir, name))
    if name == "events":
        ts_type = df.schema["ts"].dataType.simpleString()
        if ts_type == "bigint":
            # int64 nanos via nanosAsLong: truncate to µs — identical
            # to DuckDB's TIMESTAMP_NS→TIMESTAMP cast. `div` is
            # integer floor division (exact; double division would
            # lose precision past 2^53).
            df = df.withColumn(
                "ts", F.timestamp_micros(F.expr("ts div 1000"))
            )
        elif ts_type == "timestamp_ntz":
            # µs, not adjusted to UTC → Spark surfaces TIMESTAMP_NTZ.
            # Cast to session-zoned TIMESTAMP (all harnesses pin UTC,
            # so wall values are preserved) for one stable schema
            # across testdata generations and parity with DuckDB's
            # naive TIMESTAMP under a UTC comparison.
            df = df.withColumn("ts", F.col("ts").cast("timestamp"))
    return df


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {name: load_table(spark, sf_dir, name) for name in TABLE_NAMES}


def register_views(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    """Register every table as a temp view (for the SQL-API operators)."""
    dfs = load_tables(spark, sf_dir)
    for name, df in dfs.items():
        df.createOrReplaceTempView(name)
    return dfs
