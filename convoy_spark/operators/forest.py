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

# DuckDB CTE: one row per node, parent_id NULL for roots. Trees live
# inside 100-key blocks: node k's parent is the key at the same block
# base with local offset (k mod 100) div 10 — when that key exists
# and isn't k itself (the `p.id <> c.id` guard: block-base keys would
# otherwise self-loop, which the pointer-jumping side shrugs off but
# which would make the oracle's recursive CTE climb forever). The
# sparse TPC-H-ish key distribution then yields many trees per scale
# (15 roots at sf0.001 → 1500 at sf0.1) with both chains and fanout.
FOREST_SQL_CTE = """
nodes AS (SELECT o_orderkey AS id FROM orders),
forest AS (
  SELECT c.id AS child_id, p.id AS parent_id
  FROM nodes c LEFT JOIN nodes p
    ON p.id = (c.id // 100) * 100 + (c.id % 100) // 10 AND p.id <> c.id
)
"""


# The "ur" layer (2_enrich_ur_conversation_ids / 3_create_tweet_stats
# ur-duality): tree ROOTS gain a second-kind parent — root r attaches
# to the minimum existing key of its 100-block (when that key is
# smaller than r) — exactly how quote/retweet edges attach whole
# reply trees under an ur-conversation in the reference
# (`3_create_tweet_stats_i.py:86-87` seeds both stacks at the root).
# Acyclic by construction (the attachment target is strictly smaller,
# and base parents already shrink ids), and guaranteed to fire on the
# sparse TPC-H-ish key distribution.
UR_FOREST_SQL_CTE = f"""
{FOREST_SQL_CTE},
blockmin AS (
  SELECT id // 1000 AS blk, MIN(id) AS bmin FROM nodes GROUP BY id // 1000
),
ur_forest AS (
  SELECT b.child_id,
         COALESCE(b.parent_id,
                  CASE WHEN m.bmin < b.child_id THEN m.bmin END) AS parent_id
  FROM forest b LEFT JOIN blockmin m ON b.child_id // 1000 = m.blk
)
"""


def ur_forest_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The extended forest: reply edges plus root-attachment ur
    edges (roots adopt their 1000-superblock's minimum key as
    parent). Still a forest — non-roots keep their single parent,
    roots gain at most one strictly-smaller one."""
    base = forest_edges(spark, sf_dir)
    blockmin = (
        load_table(spark, sf_dir, "orders")
        .select(F.col("o_orderkey").alias("id"))
        .groupBy(F.expr("id div 1000").alias("blk"))
        .agg(F.min("id").alias("bmin"))
    )
    return base.join(
        blockmin, F.expr("child_id div 1000") == F.col("blk"), "left"
    ).select(
        "child_id",
        F.coalesce(
            "parent_id",
            F.when(F.col("bmin") < F.col("child_id"), F.col("bmin")),
        ).alias("parent_id"),
    )


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
        F.col("id").alias("child_id"),
        F.expr("(id div 100) * 100 + (id % 100) div 10").alias("pkey"),
    )
    parent = nodes.select(F.col("id").alias("pid"))
    # pkey != child_id mirrors the oracle's self-loop guard
    # (block-base keys map to themselves).
    return child.join(
        parent,
        (child.pkey == parent.pid) & (child.child_id != parent.pid),
        "left",
    ).select("child_id", F.col("pid").alias("parent_id"))
