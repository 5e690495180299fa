"""Temporal-warehouse catalog queries: SCD type-2 history
construction, overlapping-interval consolidation, rolling anomaly
flagging, and last-touch attribution — the change-tracking /
time-series surface a warehouse user expects next to the window
functions in :mod:`convoy_spark.queries.windows` (the reference has no
window layer at all, SURVEY §2.4; this is extension surface).

All four are single-shuffle keyed-window plans: ``partitionBy`` a
high-cardinality key (``user_id`` / ``event_type``), so at 100 TB the
sort is per-key-group and no stage concentrates the table into few
tasks. Every ORDER BY carries ``event_id`` as a unique tiebreak, which
is what makes the outputs (and therefore the value hashes) exactly
reproducible at any parallelism.

Float determinism: the anomaly test never compares engine-summed
doubles. Values are floor-quantized to integer millis; the window
sums S=Σv and Q=Σv² are exact integers well under 2^53 in BOTH
engines; the z²-threshold comparison is then evaluated in doubles with
the identical expression tree on both sides — identical IEEE inputs
and identical operation order give identical booleans, so the flag is
deterministic without needing the algebra to be exact.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from convoy_spark.functions.numeric import dsum, sql_dsum
from convoy_spark.queries.catalog import query
from convoy_spark.tables import load_table


@query(
    "scd2_snapshot",
    oracle="""
    WITH ordered AS (
      SELECT user_id, event_type, ts, event_id,
             CASE WHEN lag(event_type) OVER w IS DISTINCT FROM event_type
                  THEN 1 ELSE 0 END AS chg
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ), runs AS (
      SELECT user_id, event_type, ts,
             SUM(chg) OVER (PARTITION BY user_id ORDER BY ts, event_id
                            ROWS UNBOUNDED PRECEDING) AS run_id
      FROM ordered
    ), grp AS (
      SELECT user_id, CAST(run_id AS BIGINT) AS run_id, event_type,
             MIN(ts) AS valid_from,
             CAST(COUNT(*) AS BIGINT) AS n_events
      FROM runs GROUP BY 1, 2, 3
    )
    SELECT user_id, run_id, event_type, valid_from,
           lead(valid_from) OVER (PARTITION BY user_id ORDER BY run_id)
             AS valid_to,
           n_events
    FROM grp
    """,
)
def scd2_snapshot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Slowly-changing-dimension type-2 history: collapse each user's
    consecutive same-``event_type`` runs into validity intervals
    ``[valid_from, valid_to)`` (open-ended current row = NULL
    valid_to). Change detection is a keyed lag, run numbering a keyed
    prefix sum, and ``valid_to`` a lead over the (much smaller) run
    table — the standard CDC→dimension-history build, as one
    declarative plan instead of the MERGE loop a row-store needs.

    Scale: both windows and the groupBy hash-partition on ``user_id``
    (the group key's first column), so the whole plan is one exchange
    of the events table plus one exchange of the run table; no stage
    sees more than one user's rows in one sort group.
    """
    events = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    prev = F.lag("event_type").over(w)
    runs = (
        events.withColumn(
            "chg",
            F.when(
                prev.isNull() | (prev != F.col("event_type")), 1
            ).otherwise(0),
        )
        .withColumn(
            "run_id",
            F.sum("chg")
            .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
            .cast("bigint"),
        )
    )
    grp = runs.groupBy("user_id", "run_id", "event_type").agg(
        F.min("ts").alias("valid_from"),
        F.count("*").alias("n_events"),
    )
    w2 = Window.partitionBy("user_id").orderBy("run_id")
    return grp.select(
        "user_id",
        "run_id",
        "event_type",
        "valid_from",
        F.lead("valid_from").over(w2).alias("valid_to"),
        "n_events",
    )


@query(
    "interval_merge",
    oracle="""
    WITH iv AS (
      SELECT user_id, event_id,
             epoch_us(ts) AS start_us,
             epoch_us(ts) + CAST(FLOOR(value * 60000000.0) AS BIGINT)
               AS end_us
      FROM events
    ), flagged AS (
      SELECT user_id, start_us, end_us,
             CASE WHEN mx IS NULL OR start_us > mx
                  THEN 1 ELSE 0 END AS new_island
      FROM (
        SELECT *, MAX(end_us) OVER (PARTITION BY user_id
                                    ORDER BY start_us, event_id
                                    ROWS BETWEEN UNBOUNDED PRECEDING
                                             AND 1 PRECEDING) AS mx
        FROM iv
      )
    ), islands AS (
      SELECT user_id, end_us,
             SUM(new_island)
               OVER (PARTITION BY user_id ORDER BY start_us, end_us
                     ROWS UNBOUNDED PRECEDING) AS island_id,
             start_us
      FROM flagged
    )
    SELECT user_id, CAST(island_id AS BIGINT) AS island_id,
           make_timestamp(MIN(start_us)) AS merged_start,
           make_timestamp(MAX(end_us)) AS merged_end,
           CAST(COUNT(*) AS BIGINT) AS n_intervals
    FROM islands
    GROUP BY user_id, island_id
    """,
)
def interval_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Overlapping-interval consolidation (classic "merge intervals"
    at warehouse scale): each event opens an interval of ``value``
    minutes; per user, intervals that overlap or touch are merged.
    Unlike gap-based sessionization (``sessionize``), an interval can
    outlast many successors, so the island test compares each start
    against the RUNNING MAX of all previous ends — a keyed cumulative
    max, not a lag.

    First-row handling: the cumulative max over an empty frame is
    NULL, and a NULL comparison must not silently fall through a CASE
    ELSE — both sides test ``mx IS NULL`` explicitly, so every user's
    first interval opens island 1 on both engines.

    Scale: one shuffle on ``user_id``; both windows and the final
    groupBy reuse that partitioning. Interval ends are integer
    microseconds (floor of an identical IEEE product on both engines)
    so island boundaries are bit-deterministic.
    """
    events = load_table(spark, sf_dir, "events")
    iv = events.select(
        "user_id",
        "event_id",
        F.unix_micros("ts").alias("start_us"),
        (
            F.unix_micros("ts")
            + F.floor(F.col("value") * F.lit(60000000.0)).cast("bigint")
        ).alias("end_us"),
    )
    w = Window.partitionBy("user_id").orderBy("start_us", "event_id")
    cummax = F.max("end_us").over(w.rowsBetween(Window.unboundedPreceding, -1))
    flagged = iv.withColumn(
        "new_island",
        F.when(
            cummax.isNull() | (F.col("start_us") > cummax), 1
        ).otherwise(0),
    )
    w2 = Window.partitionBy("user_id").orderBy("start_us", "end_us")
    islands = flagged.withColumn(
        "island_id",
        F.sum("new_island")
        .over(w2.rowsBetween(Window.unboundedPreceding, Window.currentRow))
        .cast("bigint"),
    )
    return islands.groupBy("user_id", "island_id").agg(
        F.timestamp_micros(F.min("start_us")).alias("merged_start"),
        F.timestamp_micros(F.max("end_us")).alias("merged_end"),
        F.count("*").alias("n_intervals"),
    )


@query(
    "anomaly_zscore",
    oracle="""
    WITH scaled AS (
      SELECT event_id, event_type, ts, value,
             CAST(FLOOR(value * 1000.0) AS BIGINT) AS v
      FROM events
    ), stats AS (
      SELECT event_id, event_type, value, v,
             CAST(COUNT(v) OVER w AS BIGINT) AS n,
             CAST(SUM(v) OVER w AS BIGINT) AS s,
             CAST(SUM(v * v) OVER w AS BIGINT) AS q
      FROM scaled
      WINDOW w AS (PARTITION BY event_type ORDER BY ts, event_id
                   ROWS BETWEEN 100 PRECEDING AND 1 PRECEDING)
    )
    SELECT event_id, event_type, value, n AS n_window
    FROM stats
    WHERE n >= 30
      AND (CAST(n AS DOUBLE) * CAST(v AS DOUBLE) - CAST(s AS DOUBLE))
          * (CAST(n AS DOUBLE) * CAST(v AS DOUBLE) - CAST(s AS DOUBLE))
          * (CAST(n AS DOUBLE) - 1.0)
        > 9.0 * CAST(n AS DOUBLE)
          * (CAST(n AS DOUBLE) * CAST(q AS DOUBLE)
             - CAST(s AS DOUBLE) * CAST(s AS DOUBLE))
    """,
)
def anomaly_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling z-score anomaly flags: an event is anomalous when its
    value sits more than 3 sample standard deviations from the mean of
    the previous ≤100 same-type events (min 30 for a stable estimate).
    The test ``|v-μ| > 3σ`` is evaluated square-multiplied-out as
    ``(n·v−S)²·(n−1) > 9·n·(n·Q−S²)`` — no division, no sqrt, and S/Q
    are exact integer window sums of millis-quantized values, so the
    boolean is bit-deterministic across engines (module docstring).

    Scale — prefix sums, not a sliding frame. Spark's sliding
    ``rowsBetween(-100, -1)`` frame has no aggregate-retraction
    support, so WindowExec re-accumulates all 100 frame rows for
    every row — O(100·n) per key, measured growing linearly at a flat
    ~5× of the baseline's segment-tree windows (BENCH_NOTES). The
    trailing sums are instead derived from RUNNING prefix sums (an
    incremental O(1)-per-row frame) and a 101-row ``lag`` of those
    prefixes (an offset frame, also O(1)):

        S[p-100..p-1] = (PS(p) − v(p)) − PS(p-101)

    — same sort, same single shuffle, ~100× less aggregate work, and
    the integers are identical so the oracle (which keeps the naive
    sliding-window formulation) proves the rewrite. With few event
    types the sort groups are large; a deployment with
    low-cardinality keys would sub-bucket by time blocks with
    100-row context overlap for parallelism; at the catalog's key
    cardinalities the single keyed window is the right plan.
    """
    events = load_table(spark, sf_dir, "events")
    scaled = events.select(
        "event_id",
        "event_type",
        "ts",
        "value",
        F.floor(F.col("value") * F.lit(1000.0)).cast("bigint").alias("v"),
    )
    w = Window.partitionBy("event_type").orderBy("ts", "event_id")
    run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    vv = F.col("v") * F.col("v")
    pre = scaled.select(
        "event_id",
        "event_type",
        "value",
        "v",
        (F.row_number().over(w) - 1).alias("n_before"),
        F.sum("v").over(run).alias("ps"),
        F.sum(vv).over(run).alias("pq"),
        F.lag(F.sum("v").over(run), 101).over(w).alias("ps_back"),
        F.lag(F.sum(vv).over(run), 101).over(w).alias("pq_back"),
    )
    stats = pre.select(
        "event_id",
        "event_type",
        "value",
        "v",
        F.least(F.lit(100), F.col("n_before")).cast("bigint").alias("n"),
        (
            F.col("ps") - F.col("v") - F.coalesce("ps_back", F.lit(0))
        ).alias("s"),
        (
            F.col("pq")
            - F.col("v") * F.col("v")
            - F.coalesce("pq_back", F.lit(0))
        ).alias("q"),
    )
    n_d = F.col("n").cast("double")
    v_d = F.col("v").cast("double")
    s_d = F.col("s").cast("double")
    q_d = F.col("q").cast("double")
    dev = n_d * v_d - s_d
    lhs = dev * dev * (n_d - F.lit(1.0))
    rhs = F.lit(9.0) * n_d * (n_d * q_d - s_d * s_d)
    return (
        stats.filter((F.col("n") >= 30) & (lhs > rhs))
        .select("event_id", "event_type", "value", F.col("n").alias("n_window"))
    )


@query(
    "last_touch_attribution",
    oracle=f"""
    WITH touched AS (
      SELECT event_id, user_id, event_type, value, epoch_us(ts) AS ts_us,
             last_value(CASE WHEN event_type IN ('click', 'view')
                             THEN epoch_us(ts) END IGNORE NULLS) OVER w
               AS touch_us,
             last_value(CASE WHEN event_type IN ('click', 'view')
                             THEN event_type END IGNORE NULLS) OVER w
               AS touch_type
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
    )
    SELECT
      CASE WHEN touch_us IS NOT NULL
                AND ts_us - touch_us <= 259200000000
           THEN touch_type ELSE 'organic' END AS channel,
      CAST(COUNT(*) AS BIGINT) AS n_purchases,
      {sql_dsum('value')} AS attributed_revenue
    FROM touched
    WHERE event_type = 'purchase'
    GROUP BY 1
    """,
)
def last_touch_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Last-touch marketing attribution: each purchase is credited to
    the user's most recent click/view within a 3-day lookback, else
    'organic'. The touch lookup is ``last(..., ignorenulls)`` over the
    preceding-rows frame — the same-table analogue of the as-of join
    (``asof_join``), with the matched columns carried as two parallel
    IGNORE-NULLS lasts (both null exactly on non-touch rows, so they
    select the same row).

    Scale: one shuffle on ``user_id``; the purchase filter cannot be
    pushed below the window (the frame must see non-purchase rows —
    that is the semantics), so the window runs over the full events
    table and the post-filter reduces to purchases before the final
    broadcast-sized 3-key aggregate. Revenue is decimal-exact
    (:func:`~convoy_spark.functions.numeric.dsum`).
    """
    events = load_table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    is_touch = F.col("event_type").isin("click", "view")
    touched = events.select(
        "event_id",
        "event_type",
        "value",
        F.unix_micros("ts").alias("ts_us"),
        F.last(F.when(is_touch, F.unix_micros("ts")), ignorenulls=True)
        .over(w)
        .alias("touch_us"),
        F.last(F.when(is_touch, F.col("event_type")), ignorenulls=True)
        .over(w)
        .alias("touch_type"),
    )
    three_days_us = 3 * 24 * 3600 * 1_000_000
    channel = F.when(
        F.col("touch_us").isNotNull()
        & (F.col("ts_us") - F.col("touch_us") <= three_days_us),
        F.col("touch_type"),
    ).otherwise(F.lit("organic"))
    return (
        touched.filter(F.col("event_type") == "purchase")
        .groupBy(channel.alias("channel"))
        .agg(
            F.count("*").alias("n_purchases"),
            dsum(F.col("value")).alias("attributed_revenue"),
        )
    )


@query(
    "column_profile",
    oracle="""
    WITH unp AS (
      SELECT 'l_quantity' AS col_name, l_quantity AS value FROM lineitem
      UNION ALL
      SELECT 'l_extendedprice', l_extendedprice FROM lineitem
      UNION ALL
      SELECT 'l_discount', l_discount FROM lineitem
      UNION ALL
      SELECT 'l_tax', l_tax FROM lineitem
    ), dv AS (
      SELECT col_name, value, CAST(COUNT(*) AS BIGINT) AS n
      FROM unp GROUP BY 1, 2
    )
    SELECT col_name,
           CAST(SUM(n) AS BIGINT) AS n_rows,
           CAST(SUM(CASE WHEN value IS NULL THEN n ELSE 0 END) AS BIGINT)
             AS n_nulls,
           CAST(SUM(CASE WHEN value IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
             AS n_distinct,
           MIN(value) AS min_value,
           MAX(value) AS max_value,
           CAST(SUM(CAST(value * n AS DECIMAL(27,6))) AS DOUBLE)
             / SUM(CASE WHEN value IS NOT NULL THEN n ELSE 0 END)
             AS mean_value
    FROM dv
    GROUP BY col_name
    """,
)
def column_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANALYZE-style column statistics in one declarative plan: row
    count, null count, exact NDV, min/max, and decimal-exact mean for
    the four lineitem measures, via unpivot (``stack``) then a
    TWO-LEVEL aggregate — first ``(col_name, value)`` (the exact
    distinct, hash-spread over the cluster), then per-column over the
    ndv-sized table of distinct values with their multiplicities.

    Scale: the naive single-level ``GROUP BY col_name`` with
    COUNT(DISTINCT) would funnel every value of the corpus through 4
    reducer keys; the two-level shape keeps the wide shuffle keyed by
    value (well distributed) and only the ndv-sized remainder hits the
    4-key stage, with map-side combine on both levels. The weighted
    mean ``Σ(value·n)/Σn`` over distinct values equals the plain mean
    over rows; the product is the identical IEEE double on both
    engines before the decimal cast, so the sum is cross-engine exact.
    At 100 TB, columns with ~row-count NDV would swap the exact level-1
    distinct for an HLL profile (``approx_distinct_rollup``); the exact
    form is the oracle-checkable contract.
    """
    li = load_table(spark, sf_dir, "lineitem")
    unp = li.select(
        F.expr(
            "stack(4, 'l_quantity', l_quantity,"
            " 'l_extendedprice', l_extendedprice,"
            " 'l_discount', l_discount,"
            " 'l_tax', l_tax) as (col_name, value)"
        )
    )
    dv = unp.groupBy("col_name", "value").agg(F.count("*").alias("n"))
    nn = F.when(F.col("value").isNotNull(), F.col("n")).otherwise(F.lit(0))
    return dv.groupBy("col_name").agg(
        F.sum("n").cast("bigint").alias("n_rows"),
        F.sum(
            F.when(F.col("value").isNull(), F.col("n")).otherwise(F.lit(0))
        )
        .cast("bigint")
        .alias("n_nulls"),
        F.sum(F.when(F.col("value").isNotNull(), 1).otherwise(0))
        .cast("bigint")
        .alias("n_distinct"),
        F.min("value").alias("min_value"),
        F.max("value").alias("max_value"),
        (
            F.sum((F.col("value") * F.col("n")).cast("decimal(27,6)")).cast(
                "double"
            )
            / F.sum(nn)
        ).alias("mean_value"),
    )


@query(
    "resample_ffill",
    oracle="""
    WITH b AS (
      SELECT user_id, grid_ts, value AS bucket_value,
             n_events
      FROM (
        SELECT user_id, date_trunc('hour', ts) AS grid_ts, value,
               CAST(COUNT(*) OVER (PARTITION BY user_id,
                                   date_trunc('hour', ts)) AS BIGINT)
                 AS n_events,
               row_number() OVER (PARTITION BY user_id,
                                  date_trunc('hour', ts)
                                  ORDER BY ts DESC, event_id DESC) AS rn
        FROM events
      ) WHERE rn = 1
    ),
    bounds AS (
      SELECT user_id, MIN(grid_ts) AS lo, MAX(grid_ts) AS hi FROM b
      GROUP BY user_id
    ),
    grid AS (
      SELECT user_id,
             unnest(generate_series(lo, hi, INTERVAL 1 HOUR)) AS grid_ts
      FROM bounds
    )
    SELECT g.user_id, g.grid_ts,
           COALESCE(b.n_events, 0) AS n_events,
           last_value(b.bucket_value IGNORE NULLS) OVER (
             PARTITION BY g.user_id ORDER BY g.grid_ts
             ROWS UNBOUNDED PRECEDING) AS value_ffill
    FROM grid g LEFT JOIN b ON g.user_id = b.user_id
                           AND g.grid_ts = b.grid_ts
    """,
)
def resample_ffill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-grid resampling with forward fill (gap filling): each
    user's event stream snapped to an hourly grid between their first
    and last event, per-cell event count (0 in gaps) and the
    last-observation-carried-forward value — the feature-store
    snapshot / downsampling operator Spark has no native resample
    for. The carried value is selected deterministically (latest
    ``(ts, event_id)`` within the hour) and NEVER recomputed — no
    float arithmetic, so the double column hash-checks as-is.

    Scale: everything is keyed by ``user_id`` — the bucket-last
    window, the grid explode (``sequence`` bounded by each user's own
    span: output = Σ_user span_hours, never |users| × global span),
    the grid↔bucket equi-join, and the forward-fill window — one
    partitioning reused across all four stages, no global sort. A
    pathological single-user multi-year span costs that one key
    span-many rows (bounded fan-out, the chunk_documents argument);
    the fill is O(1)-per-row state."""
    events = load_table(spark, sf_dir, "events")
    hour = F.date_trunc("hour", F.col("ts"))
    wb = (
        Window.partitionBy("user_id", "grid_ts")
        .orderBy(F.col("ts").desc(), F.col("event_id").desc())
    )
    b = (
        events.select(
            "user_id", hour.alias("grid_ts"), "value", "ts", "event_id"
        )
        .select(
            "user_id",
            "grid_ts",
            "value",
            F.count("*").over(
                Window.partitionBy("user_id", "grid_ts")
            ).alias("n_events"),
            F.row_number().over(wb).alias("rn"),
        )
        .filter(F.col("rn") == 1)
        .select(
            "user_id",
            "grid_ts",
            F.col("value").alias("bucket_value"),
            "n_events",
        )
    )
    grid = (
        b.groupBy("user_id")
        .agg(F.min("grid_ts").alias("lo"), F.max("grid_ts").alias("hi"))
        .select(
            "user_id",
            F.explode(
                F.expr("sequence(lo, hi, interval 1 hour)")
            ).alias("grid_ts"),
        )
    )
    wf = (
        Window.partitionBy("user_id")
        .orderBy("grid_ts")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return grid.join(b, ["user_id", "grid_ts"], "left").select(
        "user_id",
        "grid_ts",
        F.coalesce("n_events", F.lit(0)).alias("n_events"),
        F.last("bucket_value", ignorenulls=True).over(wf).alias("value_ffill"),
    )


@query(
    "snapshot_diff",
    oracle="""
    WITH a AS (
      SELECT event_id, event_type, user_id, value FROM events
      WHERE event_id % 10 <> 0
    ),
    b AS (
      SELECT event_id, event_type, user_id,
             CASE WHEN event_id % 5 = 0 THEN value + 1.0 ELSE value END
               AS value
      FROM events WHERE event_id % 7 <> 0
    ),
    d AS (
      SELECT COALESCE(a.event_id, b.event_id) AS event_id,
             COALESCE(a.event_type, b.event_type) AS event_type,
             CASE
               WHEN a.event_id IS NULL THEN 'added'
               WHEN b.event_id IS NULL THEN 'removed'
               WHEN a.event_type IS DISTINCT FROM b.event_type
                 OR a.user_id IS DISTINCT FROM b.user_id
                 OR a.value IS DISTINCT FROM b.value THEN 'changed'
               ELSE 'unchanged'
             END AS status
      FROM a FULL OUTER JOIN b ON a.event_id = b.event_id
    )
    SELECT event_type, status, CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(event_id) AS BIGINT) AS id_checksum
    FROM d GROUP BY event_type, status
    """,
)
def snapshot_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CDC snapshot diff — the table-audit primitive a warehouse runs
    between two versions of the same table (the reference copies whole
    tables between engines, `6_copy_tables_to_columnstore.py`; this is
    the verification such a copy or any incremental load needs):
    full outer join on the primary key, per-row status =
    added / removed / changed / unchanged with NULL-SAFE column
    comparison (``IS DISTINCT FROM`` ≡ Spark's ``eqNullSafe`` — a
    column going NULL↔value must count as changed), rolled up per
    (event_type, status) with an id checksum pinning WHICH rows, not
    just how many. Snapshots are derived deterministically from the
    events table (mod-arithmetic delete/update masks) so the query is
    self-contained and fully value-hash-checked.

    Scale: ONE full outer join keyed on the pk — co-locate with
    bucketed snapshots (operators/scale.py::write_bucketed) and it
    runs exchange-free; the rollup is a map-side-combined keyed agg.
    Never a row-by-row driver compare."""
    ev = load_table(spark, sf_dir, "events").select(
        "event_id", "event_type", "user_id", "value"
    )
    a = ev.filter(F.col("event_id") % 10 != 0)
    b = ev.filter(F.col("event_id") % 7 != 0).withColumn(
        "value",
        F.when(F.col("event_id") % 5 == 0, F.col("value") + 1.0).otherwise(
            F.col("value")
        ),
    )
    an = a.select([F.col(c).alias(f"a_{c}") for c in a.columns])
    bn = b.select([F.col(c).alias(f"b_{c}") for c in b.columns])
    d = an.join(bn, an["a_event_id"] == bn["b_event_id"], "full_outer").select(
        F.coalesce("a_event_id", "b_event_id").alias("event_id"),
        F.coalesce("a_event_type", "b_event_type").alias("event_type"),
        F.when(F.col("a_event_id").isNull(), F.lit("added"))
        .when(F.col("b_event_id").isNull(), F.lit("removed"))
        .when(
            ~F.col("a_event_type").eqNullSafe(F.col("b_event_type"))
            | ~F.col("a_user_id").eqNullSafe(F.col("b_user_id"))
            | ~F.col("a_value").eqNullSafe(F.col("b_value")),
            F.lit("changed"),
        )
        .otherwise(F.lit("unchanged"))
        .alias("status"),
    )
    return d.groupBy("event_type", "status").agg(
        F.count("*").cast("long").alias("n"),
        F.sum("event_id").cast("long").alias("id_checksum"),
    )


HIST_BUCKETS = 8


@query(
    "column_histogram",
    oracle=f"""
    SELECT event_type, bucket, CAST(COUNT(*) AS BIGINT) AS n,
           MIN(value) AS lo, MAX(value) AS hi
    FROM (
      SELECT event_type, value,
             ntile({HIST_BUCKETS}) OVER (
               PARTITION BY event_type ORDER BY value, event_id
             ) AS bucket
      FROM events
    )
    GROUP BY event_type, bucket
    """,
)
def column_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi-depth histogram per group ({HIST_BUCKETS} buckets of
    equal row count, boundaries = observed values) — the ANALYZE
    artifact optimizers use for selectivity, completing
    `column_profile`'s stats family. ntile ties break on event_id so
    bucket assignment is engine-deterministic; lo/hi are SELECTED
    values (no arithmetic), so every column hash-checks.

    Scale note: exact ntile sorts within each group's partition —
    fine when groups are plentiful, a straggler when one group holds
    the corpus. At 100 TB swap boundaries to the mergeable quantile
    sketch (approx_percentile_rollup's path) and keep this exact form
    as its differential twin; the sketch's bucket COUNTS then come
    from one broadcast range join."""
    events = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("event_type").orderBy(
        F.col("value").asc(), F.col("event_id").asc()
    )
    return (
        events.select(
            "event_type", "value", F.ntile(HIST_BUCKETS).over(w).alias("bucket")
        )
        .groupBy("event_type", "bucket")
        .agg(
            F.count("*").cast("long").alias("n"),
            F.min("value").alias("lo"),
            F.max("value").alias("hi"),
        )
    )
