"""Event-time window catalog queries (SURVEY §2.9 extension surface):
the batch twins of the streaming aggregations in
:mod:`convoy_spark.streaming.incremental` — identical plans run over
the batch events table, oracled via DuckDB ``time_bucket``. The
streaming tests assert stream output == these batch results, closing
the loop: batch, oracle, and stream all agree.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from convoy_spark.functions.numeric import dsum, sql_dsum
from convoy_spark.queries.catalog import query
from convoy_spark.streaming.incremental import tumbling_agg
from convoy_spark.tables import load_table


@query(
    "tumbling_window_agg",
    oracle=f"""
    SELECT
      time_bucket(INTERVAL '1 hour', ts) AS window_start,
      event_type,
      CAST(COUNT(*) AS BIGINT) AS n_events,
      {sql_dsum('value')} AS total_value
    FROM events
    GROUP BY time_bucket(INTERVAL '1 hour', ts), event_type
    """,
)
def tumbling_window_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """1-hour tumbling windows per event type — ``F.window`` epoch
    alignment matches ``time_bucket``'s for whole-hour widths. One
    map-side-combined shuffle, same as any groupBy."""
    return tumbling_agg(load_table(spark, sf_dir, "events"))


@query(
    "sliding_window_agg",
    oracle=f"""
    WITH expanded AS (
      SELECT time_bucket(INTERVAL '1 hour', ts) - k * INTERVAL '1 hour'
               AS window_start,
             event_type, value
      FROM events CROSS JOIN (SELECT unnest([0, 1]) AS k)
    )
    SELECT window_start, event_type,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           {sql_dsum('value')} AS total_value
    FROM expanded
    GROUP BY window_start, event_type
    """,
)
def sliding_window_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """2-hour windows sliding by 1 hour: every event lands in exactly
    two windows (Spark expands this internally; the oracle makes the
    expansion explicit with a 2-row cross join). The shuffle carries
    2× the rows — the documented cost of overlap."""
    events = load_table(spark, sf_dir, "events")
    return (
        events.groupBy(F.window("ts", "2 hours", "1 hour"), "event_type")
        .agg(
            F.count("*").alias("n_events"),
            dsum(F.col("value")).alias("total_value"),
        )
        .select(
            F.col("window.start").alias("window_start"),
            "event_type",
            "n_events",
            "total_value",
        )
    )


@query(
    "session_window_agg",
    oracle=f"""
    WITH marked AS (
      SELECT user_id, ts, value,
             CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                       > INTERVAL '30 minutes'
                  OR lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                       IS NULL
                  THEN 1 ELSE 0 END AS new_session
      FROM events
    ),
    sessions AS (
      SELECT user_id, ts, value,
             SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts
                                    ROWS UNBOUNDED PRECEDING) AS session_no
      FROM marked
    )
    SELECT user_id, MIN(ts) AS session_start,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           {sql_dsum('value')} AS total_value
    FROM sessions
    GROUP BY user_id, session_no
    """,
)
def session_window_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Native session windows (``F.session_window``, 30-minute gap):
    Spark merges overlapping gap-windows per key inside the
    aggregation — the streaming-capable form of the classic
    lag/cumsum sessionization (which is exactly how the oracle
    computes it). Same one-shuffle profile as any groupBy; in
    streaming mode this is the watermark-evicted stateful session
    operator."""
    events = load_table(spark, sf_dir, "events")
    return (
        events.groupBy(
            F.session_window("ts", "30 minutes"), "user_id"
        )
        .agg(
            F.count("*").alias("n_events"),
            dsum(F.col("value")).alias("total_value"),
        )
        .select(
            F.col("user_id"),
            F.col("session_window.start").alias("session_start"),
            "n_events",
            "total_value",
        )
    )


@query(
    "cohort_retention",
    oracle="""
    WITH act AS (
      SELECT DISTINCT user_id,
             CAST(floor(epoch(ts)) AS BIGINT) // 86400 AS day
      FROM events
    ),
    first AS (
      SELECT user_id, MIN(day) AS cohort_day FROM act GROUP BY user_id
    ),
    cohorts AS (
      SELECT cohort_day, CAST(COUNT(*) AS BIGINT) AS n_cohort
      FROM first GROUP BY cohort_day
    ),
    ret AS (
      SELECT f.cohort_day, a.day - f.cohort_day AS day_offset,
             CAST(COUNT(DISTINCT a.user_id) AS BIGINT) AS n_active
      FROM act a JOIN first f ON a.user_id = f.user_id
      GROUP BY f.cohort_day, a.day - f.cohort_day
    )
    SELECT r.cohort_day, r.day_offset, r.n_active, c.n_cohort,
           CAST(r.n_active AS DOUBLE) / c.n_cohort AS retention
    FROM ret r JOIN cohorts c ON r.cohort_day = c.cohort_day
    """,
)
def cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort-retention matrix (the product-analytics staple): users
    cohorted by first-activity day, per (cohort, day-offset) distinct
    active users and retention rate. Day = integer epoch-day, so the
    bucketing is engine-exact; the rate is ONE long/long IEEE
    division. Plan: one distinct (user, day) agg, a tiny first-day
    agg joined back on user_id (keyed), then a count-distinct rollup
    — every stage map-side-combinable; cohort sizes (≤ days rows)
    broadcast into the final rate projection. At 100 TB the
    (user, day) distinct is the only big shuffle, and it is the
    minimal one the statistic needs."""
    ev = load_table(spark, sf_dir, "events")
    act = ev.select(
        "user_id",
        F.expr("unix_timestamp(ts) div 86400").alias("day"),
    ).distinct()
    first = act.groupBy("user_id").agg(F.min("day").alias("cohort_day"))
    cohorts = first.groupBy("cohort_day").agg(
        F.count(F.lit(1)).alias("n_cohort")
    )
    ret = (
        act.join(first, "user_id")
        .groupBy(
            "cohort_day", (F.col("day") - F.col("cohort_day")).alias("day_offset")
        )
        .agg(F.count_distinct("user_id").alias("n_active"))
    )
    return ret.join(F.broadcast(cohorts), "cohort_day").select(
        "cohort_day",
        "day_offset",
        "n_active",
        "n_cohort",
        (F.col("n_active").cast("double") / F.col("n_cohort")).alias(
            "retention"
        ),
    )


# Multi-step funnel definition: each later step must happen AFTER the
# user's chosen previous-step event and within the step window.
FUNNEL_STEPS = ["view", "click", "purchase"]
FUNNEL_WINDOW_HOURS = 72


def funnel_step_frames(events: DataFrame) -> list[DataFrame]:
    """One (user_id, t_i) frame per funnel step, greedy-earliest
    semantics: t1 = first 'view'; t_{i+1} = first step-(i+1) event at
    or after t_i and within FUNNEL_WINDOW_HOURS of it — deterministic,
    order-independent, exact integer-microsecond comparisons.

    THE shared chain builder (round-6 ADVICE #1): funnel_user_chain,
    funnel_rollup (hence the catalog query AND the streaming twin) all
    consume these frames, so the semantics pytest pins the code every
    caller runs. One user-keyed MIN aggregate + one user-keyed join
    per step; the step frames shrink monotonically, so each later
    join is smaller than the last. Every stage shares the user_id
    partitioning — at scale this is k keyed exchanges over
    monotonically shrinking frames, never a window over the full
    event stream."""
    e = events.select("user_id", "event_type", "ts")
    chain = (
        e.filter(F.col("event_type") == FUNNEL_STEPS[0])
        .groupBy("user_id")
        .agg(F.min("ts").alias("t1"))
    )
    frames = [chain]
    for i, step in enumerate(FUNNEL_STEPS[1:], start=2):
        prev = f"t{i - 1}"
        chain = (
            e.filter(F.col("event_type") == step)
            .join(chain.select("user_id", F.col(prev).alias("_p")), "user_id")
            .filter(
                (F.col("ts") >= F.col("_p"))
                & (
                    F.col("ts")
                    <= F.col("_p")
                    + F.expr(f"INTERVAL {FUNNEL_WINDOW_HOURS} HOURS")
                )
            )
            .groupBy("user_id")
            .agg(F.min("ts").alias(f"t{i}"))
        )
        frames.append(chain)
    return frames


def funnel_user_chain(events: DataFrame) -> DataFrame:
    """Per-user earliest funnel chain over FUNNEL_STEPS: the frame of
    users who completed the LAST step (t_k = its ts). See
    funnel_step_frames for semantics and the scale argument."""
    return funnel_step_frames(events)[-1]


@query(
    "event_funnel_conversion",
    oracle=f"""
    WITH s1 AS (
      SELECT user_id, MIN(ts) AS t1 FROM events
      WHERE event_type = '{FUNNEL_STEPS[0]}' GROUP BY user_id
    ),
    s2 AS (
      SELECT e.user_id, MIN(ts) AS t2
      FROM events e JOIN s1 USING (user_id)
      WHERE event_type = '{FUNNEL_STEPS[1]}'
        AND ts >= t1 AND ts <= t1 + INTERVAL {FUNNEL_WINDOW_HOURS} HOUR
      GROUP BY e.user_id
    ),
    s3 AS (
      SELECT e.user_id, MIN(ts) AS t3
      FROM events e JOIN s2 USING (user_id)
      WHERE event_type = '{FUNNEL_STEPS[2]}'
        AND ts >= t2 AND ts <= t2 + INTERVAL {FUNNEL_WINDOW_HOURS} HOUR
      GROUP BY e.user_id
    ),
    n AS (
      SELECT (SELECT COUNT(*) FROM s1) AS n1,
             (SELECT COUNT(*) FROM s2) AS n2,
             (SELECT COUNT(*) FROM s3) AS n3
    )
    SELECT * FROM (
      SELECT 1 AS step, '{FUNNEL_STEPS[0]}' AS step_name,
             CAST(n1 AS BIGINT) AS n_users, CAST(1.0 AS DOUBLE) AS conv_from_prev
      FROM n
      UNION ALL
      SELECT 2, '{FUNNEL_STEPS[1]}', CAST(n2 AS BIGINT),
             CASE WHEN n1 = 0 THEN CAST(0.0 AS DOUBLE)
                  ELSE CAST(n2 AS DOUBLE) / n1 END
      FROM n
      UNION ALL
      SELECT 3, '{FUNNEL_STEPS[2]}', CAST(n3 AS BIGINT),
             CASE WHEN n2 = 0 THEN CAST(0.0 AS DOUBLE)
                  ELSE CAST(n3 AS DOUBLE) / n2 END
      FROM n
    )
    """,
)
def event_funnel_conversion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-step funnel conversion (view → click → purchase, each
    step within 72 h of the previous — the product-analytics staple
    the reference's conversation tooling implies but never had):
    per-user greedy-earliest chains (funnel_user_chain), rolled up to
    per-step reached-user counts and step-over-step conversion rates
    (one IEEE division of exact longs). Registers PAST-window by the
    key_skew_profile precedent: every plan shape here — user-keyed
    min aggregate, time-range-filtered keyed join, scalar rollup —
    is in-window via flagship/asof_join/interval_merge; the chain
    semantics are pinned by a constructed-sequence pytest and the
    emulator hash."""
    events = load_table(spark, sf_dir, "events")
    return funnel_rollup(events.select("user_id", "event_type", "ts"))


def funnel_rollup(e: DataFrame) -> DataFrame:
    """The funnel summary over a (user_id, event_type, ts) frame —
    shared by the catalog query above and the streaming store twin
    (streaming/eventfunnel.py). Built on funnel_step_frames (round-6
    ADVICE #1: the chain logic used to be duplicated here verbatim;
    now the constructed-sequence semantics pytest pins the code this
    rollup actually runs)."""
    chains = funnel_step_frames(e)
    counts = None
    for i, c in enumerate(chains, start=1):
        cnt = c.agg(F.count(F.lit(1)).alias(f"n{i}"))
        counts = cnt if counts is None else counts.crossJoin(cnt)
    rows = []
    for i, step in enumerate(FUNNEL_STEPS, start=1):
        conv = (
            "CAST(1.0 AS DOUBLE)"
            if i == 1
            else (
                f"CASE WHEN n{i - 1} = 0 THEN CAST(0.0 AS DOUBLE) "
                f"ELSE CAST(n{i} AS DOUBLE) / n{i - 1} END"
            )
        )
        rows.append(f"{i}, '{step}', n{i}, {conv}")
    return counts.selectExpr(
        f"stack({len(FUNNEL_STEPS)}, {', '.join(rows)}) AS "
        "(step, step_name, n_users, conv_from_prev)"
    )


@query(
    "event_transitions",
    oracle="""
    WITH seq AS (
      SELECT user_id, event_type,
             lag(event_type) OVER (
               PARTITION BY user_id ORDER BY ts, event_id
             ) AS prev_type
      FROM events
    ),
    pairs AS (
      SELECT prev_type, event_type AS next_type,
             CAST(COUNT(*) AS BIGINT) AS n
      FROM seq WHERE prev_type IS NOT NULL
      GROUP BY prev_type, event_type
    ),
    outs AS (
      SELECT prev_type, SUM(n) AS n_out FROM pairs GROUP BY prev_type
    )
    SELECT p.prev_type, p.next_type, p.n,
           CAST(p.n AS DOUBLE) / o.n_out AS p_next
    FROM pairs p JOIN outs o USING (prev_type)
    """,
)
def event_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order Markov transition matrix of the event stream
    (path analysis: which action follows which): per-user
    consecutive-event bigrams via ONE keyed lag window
    (deterministic (ts, event_id) ordering), counted with map-side
    combine, row-normalized to exact-division transition
    probabilities. |event_types|² output regardless of stream size.
    Past-window: the keyed lag window is in-window machinery
    (scd2_snapshot's change-detect lag, lag_lead_delta emulator-green
    since round 3); the rollup is two keyed aggs."""
    events = load_table(spark, sf_dir, "events")
    from pyspark.sql import Window as W

    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    seq = events.select(
        "user_id",
        "event_type",
        F.lag("event_type").over(w).alias("prev_type"),
    ).filter(F.col("prev_type").isNotNull())
    pairs = (
        seq.groupBy("prev_type", F.col("event_type").alias("next_type"))
        .agg(F.count(F.lit(1)).alias("n"))
    )
    outs = pairs.groupBy("prev_type").agg(F.sum("n").alias("n_out"))
    return pairs.join(F.broadcast(outs), "prev_type").select(
        "prev_type",
        "next_type",
        "n",
        (F.col("n").cast("double") / F.col("n_out")).alias("p_next"),
    )
