"""Join catalog queries (SURVEY.md §2.3 J1–J7 plus the anti-join the
reference lacks).

Scale notes: dim joins (nation/region/customer) are explicitly
broadcast — the fact side never shuffles for them. The self-join and
fact-fact joins shuffle once on the join key; at 100 TB those keys are
what the tables would be bucketed on.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from convoy_spark.functions.numeric import dsum, sql_dsum
from convoy_spark.operators.forest import FOREST_SQL_CTE, forest_edges
from convoy_spark.queries.catalog import query
from convoy_spark.tables import load_table


@query(
    "self_join_parent_child",
    oracle=f"""
    WITH {FOREST_SQL_CTE}
    SELECT
      f.child_id,
      f.parent_id,
      c.o_totalprice AS child_price,
      p.o_totalprice AS parent_price
    FROM forest f
    JOIN orders c ON c.o_orderkey = f.child_id
    JOIN orders p ON p.o_orderkey = f.parent_id
    """,
)
def self_join_parent_child(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Self equi inner join over a parent/child edge (J1/J2): the
    reference joins tweets to tweets on quote/retweet references
    (`2_enrich_ur_conversation_ids.py:33,35`); here the synthetic
    forest supplies the edge."""
    orders = load_table(spark, sf_dir, "orders")
    edges = forest_edges(spark, sf_dir).filter(F.col("parent_id").isNotNull())
    c = orders.select(
        F.col("o_orderkey").alias("child_id"),
        F.col("o_totalprice").alias("child_price"),
    )
    p = orders.select(
        F.col("o_orderkey").alias("pid"),
        F.col("o_totalprice").alias("parent_price"),
    )
    return (
        edges.join(c, "child_id")
        .join(p, edges.parent_id == p.pid)
        .select("child_id", "parent_id", "child_price", "parent_price")
    )


@query(
    "broadcast_dim_rollup",
    oracle=f"""
    SELECT
      r.r_name AS region_name,
      n.n_name AS nation_name,
      CAST(COUNT(*) AS BIGINT) AS n_customers,
      {sql_dsum('c.c_acctbal')} AS total_acctbal
    FROM customer c
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    JOIN region r ON n.n_regionkey = r.r_regionkey
    GROUP BY r.r_name, n.n_name
    """,
)
def broadcast_dim_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dim-chain join + rollup (J5 shape): users_a-style dimension
    joined through small lookups (`4_create_tweets_a.py:44,47`). Both
    dims are broadcast — zero shuffle on the fact side until the final
    aggregation."""
    customer = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region")
    return (
        customer.join(
            F.broadcast(nation),
            customer.c_nationkey == nation.n_nationkey,
        )
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .groupBy(
            F.col("r_name").alias("region_name"),
            F.col("n_name").alias("nation_name"),
        )
        .agg(
            F.count("*").alias("n_customers"),
            dsum(F.col("c_acctbal")).alias("total_acctbal"),
        )
    )


@query(
    "left_join_wide",
    oracle="""
    SELECT
      l.l_orderkey AS order_id,
      l.l_linenumber AS line_no,
      l.l_extendedprice AS price,
      p.p_name AS part_name,
      p.p_brand AS brand,
      s.s_name AS supp_name
    FROM lineitem l
    LEFT JOIN part p ON l.l_partkey = p.p_partkey
    LEFT JOIN supplier s ON l.l_suppkey = s.s_suppkey
    WHERE l.l_orderkey % 100 = 0
    """,
)
def left_join_wide(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left outer join USING building a wide denormalized table (J5,
    `4_create_tweets_a.py:44,47` — tweets_i ⟕ tweet_stats_i). Dims are
    broadcast; the key-stratum filter keeps the materialized result
    bounded while the plan is the full-scale shape."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_orderkey") % 100 == 0
    )
    part = load_table(spark, sf_dir, "part")
    supplier = load_table(spark, sf_dir, "supplier")
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey, "left")
        .join(F.broadcast(supplier), li.l_suppkey == supplier.s_suppkey, "left")
        .select(
            F.col("l_orderkey").alias("order_id"),
            F.col("l_linenumber").alias("line_no"),
            F.col("l_extendedprice").alias("price"),
            F.col("p_name").alias("part_name"),
            F.col("p_brand").alias("brand"),
            F.col("s_name").alias("supp_name"),
        )
    )


@query(
    "right_join_rollup",
    oracle=f"""
    WITH agg AS (
      SELECT o_custkey,
             CAST(COUNT(*) AS BIGINT) AS n_orders,
             {sql_dsum('o_totalprice')} AS total_spend
      FROM orders GROUP BY o_custkey
    )
    SELECT c.c_custkey AS cust_id, c.c_name AS cust_name,
           c.c_mktsegment AS segment,
           agg.n_orders, agg.total_spend
    FROM agg RIGHT JOIN customer c ON agg.o_custkey = c.c_custkey
    """,
)
def right_join_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Right outer join keeping parents with no aggregate row (J6,
    `5_create_conversation_tables.py:33-36` — conversations whose root
    tweet is missing keep a row with NULL stats)."""
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    agg = orders.groupBy("o_custkey").agg(
        F.count("*").alias("n_orders"),
        dsum(F.col("o_totalprice")).alias("total_spend"),
    )
    return agg.join(customer, agg.o_custkey == customer.c_custkey, "right").select(
        F.col("c_custkey").alias("cust_id"),
        F.col("c_name").alias("cust_name"),
        F.col("c_mktsegment").alias("segment"),
        "n_orders",
        "total_spend",
    )


@query(
    "anti_join",
    oracle="""
    SELECT o_orderkey AS order_id, o_orderstatus AS status
    FROM orders
    WHERE o_orderkey NOT IN (
      SELECT l_orderkey FROM lineitem WHERE l_discount > 0.08
    )
    """,
)
def anti_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left anti join (NOT IN / NOT EXISTS) — absent from the
    reference (SURVEY §2.3 'not present'), added as first-class
    surface. Same broadcast-ability as the semi join."""
    orders = load_table(spark, sf_dir, "orders")
    lineitem = load_table(spark, sf_dir, "lineitem")
    discounted = lineitem.filter(F.col("l_discount") > 0.08).select("l_orderkey")
    return orders.join(
        discounted, orders.o_orderkey == discounted.l_orderkey, "left_anti"
    ).select(
        F.col("o_orderkey").alias("order_id"),
        F.col("o_orderstatus").alias("status"),
    )


@query(
    "multiway_star_join",
    oracle=f"""
    SELECT
      n.n_name AS nation_name,
      CAST(COUNT(*) AS BIGINT) AS n_lineitems,
      {sql_dsum('l.l_extendedprice * (1 - l.l_discount)')} AS revenue
    FROM lineitem l
    JOIN orders o ON l.l_orderkey = o.o_orderkey
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    WHERE o.o_orderstatus = 'F'
    GROUP BY n.n_name
    """,
)
def multiway_star_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-way star join with selective fact filter — the denormalized
    analytics-table shape (`4_create_tweets_a.py`, `5_create_conversation_tables.py`)
    as one query. Catalyst reorders; customer/nation broadcast; the
    o_orderstatus filter pushes below the join."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderstatus") == "F"
    )
    customer = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(customer), orders.o_custkey == customer.c_custkey)
        .join(F.broadcast(nation), customer.c_nationkey == nation.n_nationkey)
        .groupBy(F.col("n_name").alias("nation_name"))
        .agg(
            F.count("*").alias("n_lineitems"),
            dsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias(
                "revenue"
            ),
        )
    )


@query(
    "local_supplier_volume",
    oracle=f"""
    SELECT n_name AS nation_name,
           {sql_dsum('l_extendedprice * (1 - l_discount)')} AS revenue
    FROM customer, orders, lineitem, supplier, nation, region
    WHERE c_custkey = o_custkey
      AND l_orderkey = o_orderkey
      AND l_suppkey = s_suppkey
      AND c_nationkey = s_nationkey
      AND s_nationkey = n_nationkey
      AND n_regionkey = r_regionkey
      AND r_name = 'ASIA'
      AND o_orderdate >= TIMESTAMP '1996-01-01'
      AND o_orderdate < TIMESTAMP '1997-01-01'
    GROUP BY n_name
    """,
)
def local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 shape — the six-table star join the catalog's other
    join queries don't exercise: lineitem ⋈ orders ⋈ customer ⋈
    supplier ⋈ nation ⋈ region with a same-nation customer/supplier
    equality and a pushed-down date+region selection. What this pins
    is Catalyst's multi-way join ORDERING: the region/nation filters
    prune supplier before the fact join, both date bounds reach the
    orders scan (PushedFilters), and every dim rides a broadcast —
    the fact table shuffles only for the orders⋈lineitem equi-join.
    Past-window by the key_skew precedent (every shape is in-window
    via flagship/broadcast_dim_rollup/semi machinery); decimal-exact
    revenue."""
    region = F.broadcast(
        load_table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    )
    nation = F.broadcast(
        load_table(spark, sf_dir, "nation").join(
            region, F.col("n_regionkey") == F.col("r_regionkey")
        )
    )
    supplier = F.broadcast(
        load_table(spark, sf_dir, "supplier").join(
            nation, F.col("s_nationkey") == F.col("n_nationkey")
        )
    )
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    li = load_table(spark, sf_dir, "lineitem")
    customer = load_table(spark, sf_dir, "customer")
    return (
        li.join(supplier, F.col("l_suppkey") == F.col("s_suppkey"))
        .join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(
            customer,
            (F.col("o_custkey") == F.col("c_custkey"))
            & (F.col("c_nationkey") == F.col("s_nationkey")),
        )
        .groupBy(F.col("n_name").alias("nation_name"))
        .agg(
            dsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias(
                "revenue"
            )
        )
    )


@query(
    "shipping_priority",
    oracle=f"""
    SELECT o_orderkey AS order_id,
           {sql_dsum('l_extendedprice * (1 - l_discount)')} AS revenue,
           o_orderdate, o_orderpriority
    FROM customer, orders, lineitem
    WHERE c_mktsegment = 'BUILDING'
      AND c_custkey = o_custkey
      AND l_orderkey = o_orderkey
      AND o_orderdate < TIMESTAMP '1998-06-01'
      AND l_shipdate > TIMESTAMP '1998-06-01'
    GROUP BY o_orderkey, o_orderdate, o_orderpriority
    ORDER BY revenue DESC, o_orderkey ASC
    LIMIT 10
    """,
)
def shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 shape — top-10 highest-revenue unshipped orders in a
    market segment: segment filter semi-prunes orders via the
    customer dim, both date predicates push into their scans, one
    keyed aggregation, and the top-10 is TakeOrderedAndProject
    (distributed per-partition top-k, never a global sort). Ordering
    made deterministic by the decimal-exact revenue + o_orderkey
    tiebreak, so the LIMIT is hash-checkable. Past-window (same
    precedent as local_supplier_volume)."""
    customer = load_table(spark, sf_dir, "customer").filter(
        F.col("c_mktsegment") == "BUILDING"
    )
    orders = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit("1998-06-01").cast("timestamp")
    )
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit("1998-06-01").cast("timestamp")
    )
    return (
        li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(
            customer.select("c_custkey"),
            F.col("o_custkey") == F.col("c_custkey"),
            "left_semi",
        )
        .groupBy(
            F.col("o_orderkey").alias("order_id"),
            "o_orderdate",
            "o_orderpriority",
        )
        .agg(
            dsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias(
                "revenue"
            )
        )
        .orderBy(F.col("revenue").desc(), F.col("order_id").asc())
        .limit(10)
    )
