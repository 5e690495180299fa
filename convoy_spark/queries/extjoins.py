"""Extended join surface (SURVEY §2.3 'not present' row): as-of and
range joins — absent from the reference, table stakes for an
analytics engine, and cheap to express Spark-first.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from convoy_spark.queries.catalog import query
from convoy_spark.tables import load_table

BUCKETS = [("low", 0.0, 50.0), ("mid", 50.0, 150.0), ("high", 150.0, 400.0),
           ("huge", 400.0, 1e12)]

_BUCKETS_SQL = ", ".join(f"('{n}', {lo}, {hi})" for n, lo, hi in BUCKETS)


@query(
    "asof_join",
    oracle="""
    WITH u AS (
      SELECT user_id, ts, event_id, value,
             CASE WHEN event_type = 'click' THEN 0 ELSE 1 END AS side
      FROM events WHERE event_type IN ('click', 'purchase')
    ),
    m AS (
      SELECT *,
        last_value(CASE WHEN side = 0 THEN event_id END IGNORE NULLS) OVER w
          AS click_id,
        last_value(CASE WHEN side = 0 THEN value END IGNORE NULLS) OVER w
          AS click_value
      FROM u
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, side, event_id
                   ROWS UNBOUNDED PRECEDING)
    )
    SELECT event_id AS purchase_id, user_id, value AS purchase_value,
           click_id, click_value
    FROM m WHERE side = 1
    """,
)
def asof_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join: each purchase matched to the user's most recent
    click at-or-before it, via the union + last-observation-carried-
    forward window — ONE shuffle on the key, no range-predicate row
    explosion, deterministic tiebreaks (clicks sort before same-ts
    purchases, then event_id). This is the formulation that survives
    100 TB; a nested-loop BETWEEN join does not."""
    events = load_table(spark, sf_dir, "events")
    u = events.filter(F.col("event_type").isin("click", "purchase")).select(
        "user_id",
        "ts",
        "event_id",
        "value",
        F.when(F.col("event_type") == "click", 0).otherwise(1).alias("side"),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "side", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    m = u.withColumns(
        {
            "click_id": F.last(
                F.when(F.col("side") == 0, F.col("event_id")), ignorenulls=True
            ).over(w),
            "click_value": F.last(
                F.when(F.col("side") == 0, F.col("value")), ignorenulls=True
            ).over(w),
        }
    )
    return m.filter(F.col("side") == 1).select(
        F.col("event_id").alias("purchase_id"),
        "user_id",
        F.col("value").alias("purchase_value"),
        "click_id",
        "click_value",
    )


@query(
    "range_bucket_join",
    oracle=f"""
    WITH buckets(name, lo, hi) AS (VALUES {_BUCKETS_SQL})
    SELECT b.name AS bucket,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(COUNT(DISTINCT e.user_id) AS BIGINT) AS n_users
    FROM events e JOIN buckets b ON e.value >= b.lo AND e.value < b.hi
    GROUP BY b.name
    """,
)
def range_bucket_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Range (theta) join against a tiny bucket dimension: Spark plans
    a BroadcastNestedLoopJoin — correct here because the build side is
    4 rows; the general big-big range join instead wants bucketized
    equi-join pre-binning (bin each side by range-aligned keys), which
    is exactly what this query's bucket table demonstrates."""
    events = load_table(spark, sf_dir, "events")
    buckets = spark.createDataFrame(BUCKETS, "name string, lo double, hi double")
    return (
        events.join(
            F.broadcast(buckets),
            (F.col("value") >= F.col("lo")) & (F.col("value") < F.col("hi")),
        )
        .groupBy(F.col("name").alias("bucket"))
        .agg(
            F.count("*").alias("n_events"),
            F.countDistinct("user_id").alias("n_users"),
        )
    )
