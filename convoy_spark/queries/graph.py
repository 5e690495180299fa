"""Graph-enrichment catalog queries (SURVEY.md §2.5 O1–O2, §2.3
J3–J4): pointer-jumping transitive closure over the synthetic forest,
oracled by a DuckDB recursive CTE walking the identical graph.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from convoy_spark.operators.closure import closure_roots, enrich_with_roots
from convoy_spark.operators.forest import FOREST_SQL_CTE, forest_edges
from convoy_spark.queries.catalog import query
from convoy_spark.tables import load_table

# Recursive climb to the root — the oracle twin of pointer jumping.
CLOSURE_SQL_CTE = f"""
{FOREST_SQL_CTE},
climb(node_id, cur, parent) AS (
  SELECT child_id, child_id, parent_id FROM forest
  UNION ALL
  SELECT c.node_id, f.child_id, f.parent_id
  FROM climb c JOIN forest f ON c.parent = f.child_id
),
roots AS (
  SELECT node_id, cur AS root_id FROM climb WHERE parent IS NULL
)
"""


@query(
    "closure_roots",
    oracle=f"""
    WITH RECURSIVE {CLOSURE_SQL_CTE}
    SELECT node_id, root_id FROM roots
    """,
)
def closure_roots_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ur-conversation root resolution (O2/J3,
    `2_enrich_ur_conversation_ids.py:39-47`): pointer-jumping
    convergence loop vs. the oracle's recursive CTE. Converges in
    ⌈log2 depth⌉ shuffles — 4 iterations for this forest — independent
    of table size."""
    return closure_roots(forest_edges(spark, sf_dir))


@query(
    "ur_enrichment",
    oracle=f"""
    WITH RECURSIVE {CLOSURE_SQL_CTE},
    linked AS (
      -- reference parity: the closure table only holds conversations
      -- that are actually linked; everything else COALESCEs to itself
      SELECT node_id, root_id FROM roots WHERE node_id <> root_id
    )
    SELECT
      o.o_orderkey AS order_id,
      o.o_totalprice AS totalprice,
      COALESCE(l.root_id, o.o_orderkey) AS ur_id
    FROM orders o LEFT JOIN linked l ON l.node_id = o.o_orderkey
    """,
)
def ur_enrichment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Closure application (J4, `2_enrich_ur_conversation_ids.py:49-52`):
    facts LEFT JOIN closure map, COALESCE to own key for singletons —
    the map is restricted to genuinely linked nodes exactly like the
    reference's closure table."""
    orders = load_table(spark, sf_dir, "orders")
    cmap = closure_roots(forest_edges(spark, sf_dir)).filter(
        F.col("node_id") != F.col("root_id")
    )
    enriched = enrich_with_roots(
        orders.select("o_orderkey", "o_totalprice"), cmap, "o_orderkey", "ur_id"
    )
    return enriched.select(
        F.col("o_orderkey").alias("order_id"),
        F.col("o_totalprice").alias("totalprice"),
        "ur_id",
    )


@query(
    "conversation_sizes",
    oracle=f"""
    WITH RECURSIVE {CLOSURE_SQL_CTE}
    SELECT root_id AS ur_id,
           CAST(COUNT(*) AS BIGINT) AS n_members,
           CAST(MAX(node_id) AS BIGINT) AS max_member
    FROM roots
    GROUP BY root_id
    """,
)
def conversation_sizes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rollup over closure output (O1+A4 composition): per
    ur-conversation member counts — the input to the singleton fast
    path split (`3_create_tweet_stats_i.py:349-358`)."""
    roots = closure_roots(forest_edges(spark, sf_dir))
    return roots.groupBy(F.col("root_id").alias("ur_id")).agg(
        F.count("*").alias("n_members"),
        F.max("node_id").cast("long").alias("max_member"),
    )
