"""Aggregation catalog queries (SURVEY.md §2.4 A1–A8 plus
rollup/cube, which the reference lacks).

Everything here is Catalyst hash aggregation: partial (map-side)
combine before the single shuffle on the grouping key, spilling to disk
when groups exceed memory — the 100 TB-safe default.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from convoy_spark.functions.hashing import sql_hash60
from convoy_spark.functions.numeric import davg, dsum, sql_davg, sql_dsum
from convoy_spark.queries.catalog import query
from convoy_spark.tables import load_table


@query(
    "conditional_agg",
    oracle=f"""
    SELECT
      event_type,
      CAST(COUNT(*) AS BIGINT) AS n_events,
      CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users,
      {sql_dsum('value')} AS total_value,
      CAST(COUNT(*) FILTER (WHERE value > 100.0) AS BIGINT) AS n_big,
      {sql_dsum('CASE WHEN value > 100.0 THEN value ELSE 0 END')} AS big_value
    FROM events
    GROUP BY event_type
    """,
)
def conditional_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Group-sum with conditional branches (A1): the conversation-id
    reply-count accumulator with its zero-reply branch
    (`extract_conversation_ids.py:21-28`)."""
    events = load_table(spark, sf_dir, "events")
    return events.groupBy("event_type").agg(
        F.count("*").alias("n_events"),
        F.countDistinct("user_id").alias("n_users"),
        dsum(F.col("value")).alias("total_value"),
        F.count_if(F.col("value") > 100.0).alias("n_big"),
        dsum(F.when(F.col("value") > 100.0, F.col("value")).otherwise(0.0)).alias(
            "big_value"
        ),
    )


@query(
    "global_agg",
    oracle=f"""
    SELECT
      CAST(COUNT(*) AS BIGINT) AS n_rows,
      CAST(COUNT(DISTINCT l_orderkey) AS BIGINT) AS n_orders,
      {sql_dsum('l_quantity')} AS total_qty,
      {sql_davg('l_extendedprice')} AS avg_price,
      MIN(l_shipdate) AS first_ship,
      MAX(l_shipdate) AS last_ship
    FROM lineitem
    """,
)
def global_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global (ungrouped) aggregation — the line/tweet/zero-reply
    global counters of `extract_conversation_ids.py:21-28`."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.agg(
        F.count("*").alias("n_rows"),
        F.countDistinct("l_orderkey").alias("n_orders"),
        dsum(F.col("l_quantity")).alias("total_qty"),
        davg(F.col("l_extendedprice")).alias("avg_price"),
        F.min("l_shipdate").alias("first_ship"),
        F.max("l_shipdate").alias("last_ship"),
    )


@query(
    "two_pass_mad",
    oracle=f"""
    WITH means AS (
      SELECT event_type, {sql_davg('value')} AS mean_value
      FROM events GROUP BY event_type
    )
    SELECT
      e.event_type,
      m.mean_value,
      {sql_davg('abs(e.value - m.mean_value)')} AS value_mad
    FROM events e JOIN means m ON e.event_type = m.event_type
    GROUP BY e.event_type, m.mean_value
    """,
)
def two_pass_mad(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-pass mean absolute deviation (A6/P13): the reference
    computes subtree means then means of |x − mean|
    (`3_create_tweet_stats_i.py:141-178`). Restated as the standard
    2-phase DataFrame aggregation: means, broadcast-join back, second
    aggregate. Both passes are partial-agg + one shuffle each."""
    events = load_table(spark, sf_dir, "events")
    means = events.groupBy("event_type").agg(
        davg(F.col("value")).alias("mean_value")
    )
    return (
        events.join(F.broadcast(means), "event_type")
        .groupBy("event_type", "mean_value")
        .agg(
            davg(F.abs(F.col("value") - F.col("mean_value"))).alias("value_mad")
        )
    )


@query(
    "percentile_stats",
    oracle="""
    SELECT event_type,
      quantile_cont(value, 0.5) AS p50,
      quantile_cont(value, 0.9) AS p90,
      quantile_cont(value, 0.99) AS p99
    FROM events GROUP BY event_type
    """,
)
def percentile_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact interpolated percentiles (``F.percentile`` ==
    ``quantile_cont``: linear interpolation over the sorted group —
    order statistics are deterministic, unlike sums, so no decimal
    trick needed). At 100 TB the swap-in is ``approx_percentile``
    (t-digest sketch, mergeable) — same shape as the HLL++ variant
    below."""
    events = load_table(spark, sf_dir, "events")
    p = F.percentile(F.col("value"), F.array(F.lit(0.5), F.lit(0.9), F.lit(0.99)))
    return events.groupBy("event_type").agg(
        p.getItem(0).alias("p50"),
        p.getItem(1).alias("p90"),
        p.getItem(2).alias("p99"),
    )


@query(
    "sql_interface",
    oracle="""
    SELECT n.n_name AS nation,
      CAST(COUNT(*) AS BIGINT) AS n_customers,
      CAST(SUM(CAST(c.c_acctbal AS DECIMAL(18,6))) AS DOUBLE) AS total_balance
    FROM customer c JOIN nation n ON c.c_nationkey = n.n_nationkey
    GROUP BY n.n_name
    """,
)
def sql_interface(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The same engine through ``spark.sql`` over registered views —
    proving the SQL front door produces the identical plan as the
    DataFrame API (both compile to the same Catalyst logical plan)."""
    from convoy_spark.tables import register_views

    register_views(spark, sf_dir)
    return spark.sql(
        """
        SELECT n.n_name AS nation,
          COUNT(*) AS n_customers,
          CAST(SUM(CAST(c.c_acctbal AS DECIMAL(18,6))) AS DOUBLE)
            AS total_balance
        FROM customer c JOIN nation n ON c.c_nationkey = n.n_nationkey
        GROUP BY n.n_name
        """
    )


@query(
    "approx_distinct_rollup",
    oracle="""
    SELECT event_type,
      CAST(COUNT(*) AS BIGINT) AS n_events,
      CAST(COUNT(DISTINCT user_id) AS BIGINT) AS exact_users,
      (abs(CAST(approx_count_distinct(user_id) AS DOUBLE)
           - CAST(COUNT(DISTINCT user_id) AS DOUBLE))
       <= 0.05 * CAST(COUNT(DISTINCT user_id) AS DOUBLE)) AS approx_within_tol
    FROM events
    GROUP BY event_type
    """,
)
def approx_distinct_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The 100 TB variant of A4's COUNT(DISTINCT): HyperLogLog++
    sketches via ``approx_count_distinct`` — mergeable across
    partitions (one narrow shuffle of fixed-size sketches instead of
    shuffling every distinct value) and the documented swap-in for
    `5_create_conversation_tables.py:34-36` when author cardinality
    per conversation explodes.

    Hash-checkable form: raw HLL register values are engine-specific,
    so the checked columns are the EXACT distinct count (value parity)
    plus a tolerance assertion ``approx_within_tol`` — each engine's
    own sketch must land within 5% of the exact answer (Spark rsd=2%,
    DuckDB's HLL is comparably tight, so the boolean is robustly true
    on both sides and any sketch regression flips it to a hash
    mismatch). The raw-sketch production profile (no exact twin — the
    whole point at 100 TB is not paying the exact-distinct shuffle) is
    ``approx_distinct_raw`` past the window; error bounds are also
    pytest-asserted in tests/test_approx.py."""
    events = load_table(spark, sf_dir, "events")
    exact = F.count_distinct(F.col("user_id")).cast("long")
    approx = F.approx_count_distinct("user_id", rsd=0.02).cast("double")
    return events.groupBy("event_type").agg(
        F.count("*").alias("n_events"),
        exact.alias("exact_users"),
        (F.abs(approx - exact.cast("double")) <= 0.05 * exact.cast("double")).alias(
            "approx_within_tol"
        ),
    )


@query(
    "approx_percentile_rollup",
    oracle="""
    SELECT event_type,
      CAST(COUNT(*) AS BIGINT) AS n_events,
      quantile_cont(value, 0.5) AS exact_p50,
      quantile_cont(value, 0.99) AS exact_p99,
      (abs(approx_quantile(value, 0.5) - quantile_cont(value, 0.5))
         <= 0.05 * (quantile_cont(value, 0.99) - quantile_cont(value, 0.01)))
        AS approx_within_tol
    FROM events
    GROUP BY event_type
    """,
)
def approx_percentile_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The 100 TB variant of percentile_stats: mergeable quantile
    SKETCHES (Spark's ``approx_percentile`` — Greenwald-Khanna/
    KLL-family; DuckDB's ``approx_quantile`` — t-digest) instead of
    the exact order statistic, whose group-wide sort/collect is the
    thing that doesn't scale. Hash-checkable form follows
    ``approx_distinct_rollup``: the checked columns are the EXACT
    interpolated percentiles (value parity, p50 AND p99) plus a
    tolerance boolean — each engine's OWN MEDIAN sketch must land
    within 5% of the group's p01–p99 range of its own exact answer,
    so a sketch regression on either engine flips the boolean into a
    hash mismatch. The boolean deliberately covers the median only:
    a t-digest's TAIL quantile at small group counts has no fixed
    fractional bound (measured 14% of range at n≈200 in DuckDB at
    sf0.001), so asserting p99 would test group size, not sketch
    health — the p99 surface is value-checked via its exact twin
    column instead. Raw sketch values are engine-specific by nature
    (different sketch families), exactly like HLL registers."""
    events = load_table(spark, sf_dir, "events")
    exact = F.percentile(
        F.col("value"), F.array(F.lit(0.01), F.lit(0.5), F.lit(0.99))
    )
    approx = F.expr("approx_percentile(value, 0.5D, 10000)")
    spread = exact.getItem(2) - exact.getItem(0)
    return events.groupBy("event_type").agg(
        F.count("*").alias("n_events"),
        exact.getItem(1).alias("exact_p50"),
        exact.getItem(2).alias("exact_p99"),
        (F.abs(approx - exact.getItem(1)) <= 0.05 * spread).alias(
            "approx_within_tol"
        ),
    )


@query("approx_distinct_raw")  # no oracle by design: this is the
# production profile whose output IS the engine-specific sketch
# estimate; the hash-checked tolerance form is approx_distinct_rollup.
def approx_distinct_raw(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Production HLL++ rollup — sketch estimate only, no exact twin,
    because at 100 TB the entire point is replacing the exact-distinct
    shuffle (every distinct value moves) with fixed-size mergeable
    registers (one narrow shuffle). Kept past the check window as the
    documented raw variant of ``approx_distinct_rollup``."""
    events = load_table(spark, sf_dir, "events")
    return events.groupBy("event_type").agg(
        F.count("*").alias("n_events"),
        F.approx_count_distinct("user_id", rsd=0.02).alias("approx_users"),
    )


@query(
    "rollup_hierarchy",
    oracle=f"""
    SELECT
      CAST(year(o_orderdate) AS INT) AS order_year,
      o_orderstatus AS status,
      CAST(COUNT(*) AS BIGINT) AS n_orders,
      {sql_dsum('o_totalprice')} AS total_price
    FROM orders
    GROUP BY ROLLUP (year(o_orderdate), o_orderstatus)
    """,
)
def rollup_hierarchy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP grouping sets — absent from the reference (SURVEY §2.4
    'not present'), free in Catalyst; the calendar hierarchy mirrors
    the denormalized date columns of `4_create_tweets_a.py:43`."""
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.rollup(
            F.year("o_orderdate").alias("order_year"),
            F.col("o_orderstatus").alias("status"),
        )
        .agg(
            F.count("*").alias("n_orders"),
            dsum(F.col("o_totalprice")).alias("total_price"),
        )
    )


@query(
    "cube_matrix",
    oracle=f"""
    SELECT
      l_returnflag AS returnflag,
      l_linestatus AS linestatus,
      CAST(COUNT(*) AS BIGINT) AS n_items,
      {sql_dsum('l_quantity')} AS total_qty
    FROM lineitem
    GROUP BY CUBE (l_returnflag, l_linestatus)
    """,
)
def cube_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE grouping sets (extension, SURVEY §2.4)."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.cube(
        F.col("l_returnflag").alias("returnflag"),
        F.col("l_linestatus").alias("linestatus"),
    ).agg(
        F.count("*").alias("n_items"),
        dsum(F.col("l_quantity")).alias("total_qty"),
    )


@query(
    "pivot_matrix",
    oracle="""
    SELECT
      user_id,
      CAST(COUNT(*) FILTER (WHERE event_type = 'click') AS BIGINT) AS click,
      CAST(COUNT(*) FILTER (WHERE event_type = 'view') AS BIGINT) AS "view",
      CAST(COUNT(*) FILTER (WHERE event_type = 'purchase') AS BIGINT) AS purchase,
      CAST(COUNT(*) FILTER (WHERE event_type = 'signup') AS BIGINT) AS signup,
      CAST(COUNT(*) FILTER (WHERE event_type = 'error') AS BIGINT) AS "error"
    FROM events
    GROUP BY user_id
    """,
)
def pivot_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot (long → wide) with a fixed category list — the explicit
    value list avoids the extra distinct-values job Spark otherwise
    runs, which matters at 100 TB."""
    events = load_table(spark, sf_dir, "events")
    pivoted = (
        events.groupBy("user_id")
        .pivot("event_type", ["click", "view", "purchase", "signup", "error"])
        .count()
    )
    # pivot leaves NULL where a (user, type) pair never occurred;
    # normalize to 0 to match COUNT(*) FILTER semantics.
    return pivoted.select(
        "user_id",
        *[
            F.coalesce(F.col(c), F.lit(0)).alias(c)
            for c in ["click", "view", "purchase", "signup", "error"]
        ],
    )


KMV_K = 64  # sketch size: rel. std. error ~ 1/sqrt(k-2) ≈ 13%
_KMV_RANGE = float(1 << 60)  # hash60 value space


@query(
    "kmv_distinct_rollup",
    oracle=f"""
    WITH h AS (
      SELECT DISTINCT event_type,
             {sql_hash60("concat('u:', user_id)")} AS hv
      FROM events
    ),
    rk AS (
      SELECT event_type, hv,
             row_number() OVER (PARTITION BY event_type ORDER BY hv) AS r,
             COUNT(*) OVER (PARTITION BY event_type) AS nd
      FROM h
    )
    SELECT event_type,
           CAST(nd AS BIGINT) AS exact_users,
           CAST(hv AS BIGINT) AS kth_hash,
           CASE WHEN nd < {KMV_K} THEN CAST(nd AS DOUBLE)
                ELSE CAST({KMV_K} - 1 AS DOUBLE) * {_KMV_RANGE}
                     / CAST(hv AS DOUBLE) END
             AS kmv_estimate,
           (abs(CASE WHEN nd < {KMV_K} THEN CAST(nd AS DOUBLE)
                     ELSE CAST({KMV_K} - 1 AS DOUBLE) * {_KMV_RANGE}
                          / CAST(hv AS DOUBLE) END
                - CAST(nd AS DOUBLE)) <= 0.5 * CAST(nd AS DOUBLE))
             AS within_tol
    FROM rk WHERE r = LEAST({KMV_K}, nd)
    """,
)
def kmv_distinct_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """K-minimum-values distinct sketch (Bar-Yossef et al. 2002; the
    KMV/theta-sketch family): per group keep the {KMV_K} smallest
    values of a uniform hash; the k-th smallest h_k estimates
    distinct ≈ (k−1)·R/h_k, and a group with fewer than k distinct
    values saturates the sketch — it holds ALL its hashes and the
    estimate is the exact count (the algorithm's own small-set
    contract, not a special case bolted on). Unlike HLL (whose
    registers are engine-specific — `approx_distinct_raw` is the
    catalog's one rows-only entry), KMV over the shared md5-derived
    hash60 is engine-deterministic END TO END, so the sketch value,
    the estimate AND the tolerance flag all value-hash-check against
    the oracle — a fully auditable approximate-distinct.
    ``exact_users`` is the distinct-hash count on both engines (60-bit
    hash: collision-free at any realistic group cardinality).

    Scale shape: the min-k set is associatively mergeable (union →
    keep k smallest; pytest-asserted), which the plan expresses as a
    TWO-PHASE rank — a local top-k within (group, hash-salt) prunes
    each partition's contribution to ≤ k rows before the final
    per-group rank touches ≤ salts·k rows (the bm25/PQ top-k
    discipline; never a full distinct-value sort per group). At
    100 TB the distinct shuffle is the floor (as with any
    exact-distinct pass); the production win is the downstream one —
    k longs per group flow into any further rollup merge instead of
    the full value set. Estimate quality (±3/√k) is pytest-asserted;
    the exact count rides along for the value-parity check, same
    pattern as approx_distinct_rollup."""
    from pyspark.sql import Window

    from convoy_spark.functions.hashing import hash60

    events = load_table(spark, sf_dir, "events")
    # ONE distinct-hash frame feeds both the min-k rank and the exact
    # count (lazy checkpoint: without it Catalyst re-derives the
    # events distinct per consumer — the shared-frame lesson of
    # operators/similarity.py)
    h = (
        events.select(
            "event_type",
            hash60(F.concat(F.lit("u:"), F.col("user_id"))).alias("hv"),
        )
        .distinct()
        .localCheckpoint(eager=False)
    )
    w_local = Window.partitionBy("event_type", "_salt").orderBy("hv")
    w = Window.partitionBy("event_type").orderBy("hv")
    w_all = Window.partitionBy("event_type")
    kth = (
        h.withColumn("_salt", F.pmod(F.col("hv"), F.lit(64)))
        .withColumn("_lrk", F.row_number().over(w_local))
        .filter(F.col("_lrk") <= KMV_K)
        .withColumn("_rk", F.row_number().over(w))
        .withColumn("nd", F.count("*").over(w_all))
        .filter(F.col("_rk") == F.least(F.lit(KMV_K), F.col("nd")))
        .select("event_type", F.col("hv").alias("kth_hash"), "nd")
    )
    # nd (count of two-phase survivors) == the distinct-hash count
    # whenever it is < KMV_K (the local prune kept everything); when
    # saturated it only gates the CASE, where any value >= KMV_K is
    # equivalent — so the branch below needs the TRUE distinct count
    # only for exact_users, which the separate exact agg provides.
    nd_exact = h.groupBy("event_type").agg(
        F.count("*").cast("long").alias("exact_users")
    )
    est = F.when(
        F.col("exact_users") < KMV_K, F.col("exact_users").cast("double")
    ).otherwise(
        F.lit(float(KMV_K - 1))
        * F.lit(_KMV_RANGE)
        / F.col("kth_hash").cast("double")
    )
    return kth.join(nd_exact, "event_type").select(
        "event_type",
        "exact_users",
        "kth_hash",
        est.alias("kmv_estimate"),
        (
            F.abs(est - F.col("exact_users").cast("double"))
            <= 0.5 * F.col("exact_users").cast("double")
        ).alias("within_tol"),
    )
