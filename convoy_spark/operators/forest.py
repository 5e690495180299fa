"""Deterministic synthetic forest over the testdata.

The reference's graph operators (transitive closure over quote/retweet
edges `2_enrich_ur_conversation_ids.py:30-47`, conversation-tree
statistics `3_create_tweet_stats_i.py`) need a parent/child edge set.
The driver testdata has no native edge table, so we derive one, pure
and deterministic, from ``orders``:

    parent(o_orderkey) = o_orderkey div 10   (if that key exists)

This yields a forest whose depth grows with log10(max key) — multiple
pointer-jumping iterations at every SF — with plenty of both chains and
fanout (each node has up to 10 children), mirroring reply trees. The
same definition is emitted as a SQL CTE for the DuckDB oracle so both
engines walk the identical graph.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from convoy_spark.tables import load_table

# DuckDB CTE: one row per node, parent_id NULL for roots. The
# `p.id <> c.id` guard matters: orderkey 0 would otherwise be its own
# parent (0 div 10 = 0) — a self-loop that the pointer-jumping side
# shrugs off but that would make the oracle's recursive CTE climb
# forever.
FOREST_SQL_CTE = """
nodes AS (SELECT o_orderkey AS id FROM orders),
forest AS (
  SELECT c.id AS child_id, p.id AS parent_id
  FROM nodes c LEFT JOIN nodes p ON p.id = c.id // 10 AND p.id <> c.id
)
"""


def forest_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(child_id, parent_id) — parent_id NULL marks a root.

    Scale note: the parent lookup is a self equi-join of a single
    column; at 100 TB this is a shuffle on the id — or zero shuffle if
    the table is bucketed by its key, which is how we'd lay it out.
    """
    nodes = load_table(spark, sf_dir, "orders").select(
        F.col("o_orderkey").alias("id")
    )
    child = nodes.select(
        F.col("id").alias("child_id"), F.expr("id div 10").alias("pkey")
    )
    parent = nodes.select(F.col("id").alias("pid"))
    # pkey != child_id mirrors the oracle's self-loop guard (orderkey 0).
    return child.join(
        parent,
        (child.pkey == parent.pid) & (child.child_id != parent.pid),
        "left",
    ).select("child_id", F.col("pid").alias("parent_id"))
