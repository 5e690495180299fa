"""Physical-layout catalog queries (SURVEY §4 scale techniques made
first-class): the Z-order clustering envelope — deterministic, so the
layout a 100 TB table would be rewritten into is itself
value-hash-checkable against the oracle."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from convoy_spark.operators.scale import (
    ZORDER_BITS,
    sql_zorder_key,
    zorder_bucket_stats,
)
from convoy_spark.queries.catalog import query
from convoy_spark.tables import load_table

_ZBUCKET_BITS = 10


@query(
    "zorder_layout",
    oracle=f"""
    WITH mx AS (
      SELECT MAX(l_partkey) AS pmax, MAX(l_suppkey) AS smax FROM lineitem
    ),
    m AS (
      SELECT (l_partkey * 65535) // mx.pmax AS l_partkey,
             (l_suppkey * 65535) // mx.smax AS l_suppkey
      FROM lineitem, mx
    ),
    z AS (
      SELECT l_partkey, l_suppkey,
             {sql_zorder_key("l_partkey", "l_suppkey")}
               >> {2 * ZORDER_BITS - _ZBUCKET_BITS} AS bucket
      FROM m
    )
    SELECT bucket,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           MIN(l_partkey) AS min_l_partkey,
           MAX(l_partkey) AS max_l_partkey,
           MIN(l_suppkey) AS min_l_suppkey,
           MAX(l_suppkey) AS max_l_suppkey
    FROM z GROUP BY bucket
    """,
)
def zorder_layout(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Z-order (Morton) clustering envelope over lineitem's two join
    dimensions: each dimension range-normalized to 16 bits by its max
    (one tiny agg, broadcast back — exact integer scaling), bucket =
    the interleaved key's top bits — the range-partition id an
    OPTIMIZE-ZORDER-style rewrite would send each row to — with the
    per-bucket min/max stats a scan planner's file skipping reads.
    Pure integer bit arithmetic, one map + one keyed agg; the
    skipping-effectiveness property (bucket envelopes tight on BOTH
    dims simultaneously) is pytest-asserted."""
    li = load_table(spark, sf_dir, "lineitem")
    mx = li.agg(
        F.max("l_partkey").alias("_pmax"), F.max("l_suppkey").alias("_smax")
    )
    scaled = li.crossJoin(F.broadcast(mx)).select(
        F.expr("(l_partkey * 65535) div _pmax").alias("l_partkey"),
        F.expr("(l_suppkey * 65535) div _smax").alias("l_suppkey"),
    )
    return zorder_bucket_stats(
        scaled, "l_partkey", "l_suppkey", n_bucket_bits=_ZBUCKET_BITS
    )


@query(
    "key_skew_profile",
    oracle="""
    WITH k AS (
      SELECT l_orderkey AS key, CAST(COUNT(*) AS BIGINT) AS cnt
      FROM lineitem GROUP BY l_orderkey
    ),
    b AS (
      SELECT CAST(floor(log2(cnt)) AS BIGINT) AS log2_bucket, cnt FROM k
    )
    SELECT log2_bucket,
           CAST(COUNT(*) AS BIGINT) AS n_keys,
           CAST(SUM(cnt) AS BIGINT) AS n_rows,
           CAST(MAX(cnt) AS BIGINT) AS max_rows_per_key
    FROM b GROUP BY log2_bucket
    """,
)
def key_skew_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Join-key skew diagnostic (the pre-flight check before any
    100 TB join/groupBy: is the key power-law, and how heavy is the
    head?): per-key row counts histogrammed by log2 bucket. Two
    map-side-combinable aggregations; the per-key agg is exactly the
    shuffle the diagnosed join would do, so the profile costs what
    one pass of the real workload costs. ``log2`` of an exact long is
    engine-identical for counts < 2^53 (power-of-two boundaries are
    exact doubles; intermediate values round identically)."""
    k = (
        load_table(spark, sf_dir, "lineitem")
        .groupBy(F.col("l_orderkey").alias("key"))
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    b = k.select(F.floor(F.log2("cnt")).alias("log2_bucket"), "cnt")
    return b.groupBy("log2_bucket").agg(
        F.count(F.lit(1)).alias("n_keys"),
        F.sum("cnt").alias("n_rows"),
        F.max("cnt").alias("max_rows_per_key"),
    )
