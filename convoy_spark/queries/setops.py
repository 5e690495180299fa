"""Set-operation / dedup / sort-limit catalog queries
(SURVEY.md §2.6 T1–T3 plus INTERSECT/EXCEPT/LIMIT, which the
reference lacks).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from convoy_spark.queries.catalog import query
from convoy_spark.tables import load_table


@query(
    "union_dedup",
    oracle="""
    SELECT o_orderkey AS order_id FROM orders WHERE o_totalprice > 150000.0
    UNION
    SELECT o_orderkey AS order_id FROM orders WHERE o_orderstatus = 'P'
    """,
)
def union_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SQL UNION (deduplicating) — quote-edges ∪ retweet-edges
    (`2_enrich_ur_conversation_ids.py:34` T2). Spark's union is
    UNION ALL; dropDuplicates supplies the SQL semantics."""
    orders = load_table(spark, sf_dir, "orders")
    a = orders.filter(F.col("o_totalprice") > 150000.0).select(
        F.col("o_orderkey").alias("order_id")
    )
    b = orders.filter(F.col("o_orderstatus") == "P").select(
        F.col("o_orderkey").alias("order_id")
    )
    return a.union(b).dropDuplicates()


@query(
    "intersect_except",
    oracle="""
    SELECT order_id, 'both' AS src FROM (
      SELECT o_orderkey AS order_id FROM orders WHERE o_totalprice > 100000.0
      INTERSECT
      SELECT o_orderkey AS order_id FROM orders WHERE o_orderstatus = 'O'
    )
    UNION ALL
    SELECT order_id, 'only_big' AS src FROM (
      SELECT o_orderkey AS order_id FROM orders WHERE o_totalprice > 100000.0
      EXCEPT
      SELECT o_orderkey AS order_id FROM orders WHERE o_orderstatus = 'O'
    )
    """,
)
def intersect_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT/EXCEPT (extension, SURVEY §2.6 'not present')."""
    orders = load_table(spark, sf_dir, "orders")
    big = orders.filter(F.col("o_totalprice") > 100000.0).select(
        F.col("o_orderkey").alias("order_id")
    )
    open_ = orders.filter(F.col("o_orderstatus") == "O").select(
        F.col("o_orderkey").alias("order_id")
    )
    both = big.intersect(open_).withColumn("src", F.lit("both"))
    only_big = big.exceptAll(open_).dropDuplicates().withColumn(
        "src", F.lit("only_big")
    )
    return both.union(only_big)


@query(
    "dedup_first_wins",
    oracle="""
    SELECT user_id, event_id AS first_event_id,
           CAST(ts AS TIMESTAMP) AS first_ts
    FROM events
    QUALIFY row_number() OVER (
      PARTITION BY user_id ORDER BY ts, event_id
    ) = 1
    """,
)
def dedup_first_wins(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Key-dedup with deterministic first-wins tiebreak (T3): the
    reference's INSERT IGNORE keeps the first row per PK in file order
    (`1_initial_load.py:218-224`); under distributed nondeterminism
    that needs an explicit ordering key (SURVEY §7 hard-part #3) —
    row_number over (ts, event_id) here."""
    events = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return (
        events.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "user_id",
            F.col("event_id").alias("first_event_id"),
            F.col("ts").alias("first_ts"),
        )
    )


@query(
    "top_k_ordered",
    oracle="""
    SELECT o_orderkey AS order_id, o_totalprice AS totalprice
    FROM orders
    ORDER BY o_totalprice DESC, o_orderkey
    LIMIT 100
    """,
)
def top_k_ordered(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global ORDER BY + LIMIT (T1 + extension): Spark plans this as
    TakeOrderedAndProject — per-partition top-k then a driver-side
    merge of k·partitions rows, never a full sort — the only
    100 TB-safe global top-k. Tiebreak on the key keeps the row set
    deterministic."""
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
        .limit(100)
        .select(
            F.col("o_orderkey").alias("order_id"),
            F.col("o_totalprice").alias("totalprice"),
        )
    )


@query(
    "distinct_projection",
    oracle="""
    SELECT DISTINCT o_orderstatus AS status, o_orderpriority AS priority
    FROM orders
    """,
)
def distinct_projection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DISTINCT over a projection — hash-agg dedup (T3 family)."""
    orders = load_table(spark, sf_dir, "orders")
    return orders.select(
        F.col("o_orderstatus").alias("status"),
        F.col("o_orderpriority").alias("priority"),
    ).distinct()
