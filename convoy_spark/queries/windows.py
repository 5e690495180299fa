"""Window-function catalog queries — the reference has no window
functions (SURVEY §2.4 'not present'); these are the extension surface
a user of the engine needs for top-k-per-group, running totals, and
sessionization (cf. pyspark_guide 'Common OLAP patterns').

Window evaluation order within a frame is deterministic given a total
ordering, so running double-sums match the oracle exactly — every
ORDER BY below carries a unique tiebreak column.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from convoy_spark.queries.catalog import query
from convoy_spark.tables import load_table


@query(
    "top_k_per_group",
    oracle="""
    SELECT event_type, event_id, value
    FROM events
    QUALIFY row_number() OVER (
      PARTITION BY event_type ORDER BY value DESC, event_id
    ) <= 5
    """,
)
def top_k_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-K per group via ranked window — one shuffle on the
    partition key; with AQE the per-group sort never materializes the
    whole group."""
    events = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("event_type").orderBy(
        F.col("value").desc(), F.col("event_id")
    )
    return (
        events.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 5)
        .select("event_type", "event_id", "value")
    )


@query(
    "running_total",
    oracle="""
    SELECT
      user_id,
      event_id,
      CAST(ts AS TIMESTAMP) AS ts,
      CAST(sum(CAST(value AS DECIMAL(18,6))) OVER (
        PARTITION BY user_id ORDER BY ts, event_id
        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
      ) AS DOUBLE) AS running_value,
      row_number() OVER (
        PARTITION BY user_id ORDER BY ts, event_id
      ) AS seq
    FROM events
    WHERE user_id % 10 = 0
    """,
)
def running_total(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Running sum + sequence number per key ordered by time."""
    events = load_table(spark, sf_dir, "events").filter(
        F.col("user_id") % 10 == 0
    )
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return events.select(
        "user_id",
        "event_id",
        "ts",
        # decimal-exact running sum: window SUM over doubles is not
        # plain left-to-right in every engine (DuckDB uses a segment
        # tree), so only fixed-point sums are portable.
        F.sum(F.col("value").cast("decimal(18,6)"))
        .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
        .cast("double")
        .alias("running_value"),
        F.row_number().over(w).alias("seq"),
    )


@query(
    "lag_lead_delta",
    oracle="""
    SELECT
      user_id,
      event_id,
      value,
      lag(value) OVER w AS prev_value,
      lead(value) OVER w AS next_value,
      value - lag(value) OVER w AS delta
    FROM events
    WHERE user_id % 10 = 1
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    """,
)
def lag_lead_delta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """lag/lead neighbor access along a per-key timeline."""
    events = load_table(spark, sf_dir, "events").filter(
        F.col("user_id") % 10 == 1
    )
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return events.select(
        "user_id",
        "event_id",
        "value",
        F.lag("value").over(w).alias("prev_value"),
        F.lead("value").over(w).alias("next_value"),
        (F.col("value") - F.lag("value").over(w)).alias("delta"),
    )


@query(
    "window_funcs",
    oracle="""
    SELECT
      user_id,
      event_id,
      value,
      CAST(sum(CAST(value AS DECIMAL(18,6))) OVER (
        PARTITION BY user_id ORDER BY ts, event_id
        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
      ) AS DOUBLE) AS running_value,
      row_number() OVER w AS seq,
      lag(value) OVER w AS prev_value,
      lead(value) OVER w AS next_value,
      value - lag(value) OVER w AS delta
    FROM events
    WHERE user_id % 10 = 0
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    """,
)
def window_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Window-function surface in one pass: running decimal-exact sum,
    row_number, lag/lead and first-difference over a shared per-key
    time ordering. All frames share ONE shuffle+sort on user_id — the
    plan has a single Exchange/Sort pair feeding every window op,
    which is the shape that survives 100 TB (window cost = one sort,
    not one per function)."""
    events = load_table(spark, sf_dir, "events").filter(
        F.col("user_id") % 10 == 0
    )
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return events.select(
        "user_id",
        "event_id",
        "value",
        F.sum(F.col("value").cast("decimal(18,6)"))
        .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
        .cast("double")
        .alias("running_value"),
        F.row_number().over(w).alias("seq"),
        F.lag("value").over(w).alias("prev_value"),
        F.lead("value").over(w).alias("next_value"),
        (F.col("value") - F.lag("value").over(w)).alias("delta"),
    )


@query(
    "sessionize",
    oracle="""
    WITH flagged AS (
      SELECT
        user_id, event_id, ts,
        CASE WHEN epoch_us(CAST(ts AS TIMESTAMP))
                  - lag(epoch_us(CAST(ts AS TIMESTAMP))) OVER
                    (PARTITION BY user_id ORDER BY ts, event_id)
                  > 1800000000
             OR lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
             THEN 1 ELSE 0 END AS new_session
      FROM events
    ),
    sessions AS (
      SELECT
        user_id, event_id,
        sum(new_session) OVER (
          PARTITION BY user_id ORDER BY ts, event_id
          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
        ) AS session_seq
      FROM flagged
    )
    SELECT user_id, CAST(session_seq AS BIGINT) AS session_seq,
           CAST(COUNT(*) AS BIGINT) AS n_events
    FROM sessions
    GROUP BY user_id, session_seq
    """,
)
def sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-based sessionization (lag + cumulative flag sum), the batch
    twin of streaming session windows (pyspark_guide 'Sessionization').
    One shuffle on user_id; both windows share it."""
    events = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap = F.unix_micros("ts") - F.lag(F.unix_micros("ts")).over(w)
    flagged = events.withColumn(
        "new_session",
        F.when(gap.isNull() | (gap > 30 * 60 * 1_000_000), 1).otherwise(0),
    )
    sessions = flagged.withColumn(
        "session_seq",
        F.sum("new_session").over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ),
    )
    return sessions.groupBy("user_id", "session_seq").agg(
        F.count("*").alias("n_events")
    )
