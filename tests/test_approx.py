"""Approximate-aggregate tolerance tests: the sketch must land within
its declared error bound of the exact answer (the correctness
contract a rows-only driver check cannot express)."""

from __future__ import annotations

from pyspark.sql import functions as F

from convoy_spark.queries.aggregates import (
    approx_distinct_raw,
    approx_distinct_rollup,
)
from convoy_spark.tables import load_table

SF_DIR = "/root/testdata/sf0.01"


def test_approx_within_rsd(spark):
    approx = {
        r.event_type: r.approx_users
        for r in approx_distinct_raw(spark, SF_DIR).collect()
    }
    exact = {
        r.event_type: r.n
        for r in load_table(spark, SF_DIR, "events")
        .groupBy("event_type")
        .agg(F.countDistinct("user_id").alias("n"))
        .collect()
    }
    assert set(approx) == set(exact)
    for k, n in exact.items():
        # rsd=0.02 → allow 4 sigma
        assert abs(approx[k] - n) <= max(2, 0.08 * n), (k, approx[k], n)


def test_approx_rollup_tolerance_form(spark):
    """The hash-checkable form: exact counts plus a per-group boolean
    asserting the engine's own sketch is within 5% — must be all-true
    and agree with an independently computed exact distinct."""
    rows = approx_distinct_rollup(spark, SF_DIR).collect()
    exact = {
        r.event_type: r.n
        for r in load_table(spark, SF_DIR, "events")
        .groupBy("event_type")
        .agg(F.countDistinct("user_id").alias("n"))
        .collect()
    }
    assert {r.event_type for r in rows} == set(exact)
    for r in rows:
        assert r.exact_users == exact[r.event_type]
        assert r.approx_within_tol is True, r


def test_approx_percentile_within_tolerance(spark):
    """The documented 100 TB swap-in for percentile_stats
    (approx_percentile = t-digest-style mergeable sketch) must track
    the exact interpolated percentiles within a few percent of the
    per-group value range."""
    events = load_table(spark, SF_DIR, "events")
    exact = {
        r.event_type: (r.p50, r.p99)
        for r in events.groupBy("event_type")
        .agg(
            F.percentile("value", 0.5).alias("p50"),
            F.percentile("value", 0.99).alias("p99"),
        )
        .collect()
    }
    approx = {
        r.event_type: (r.p50, r.p99, r.vmin, r.vmax)
        for r in events.groupBy("event_type")
        .agg(
            F.approx_percentile("value", 0.5, 1000).alias("p50"),
            F.approx_percentile("value", 0.99, 1000).alias("p99"),
            F.min("value").alias("vmin"),
            F.max("value").alias("vmax"),
        )
        .collect()
    }
    assert set(approx) == set(exact)
    for k, (e50, e99) in exact.items():
        a50, a99, vmin, vmax = approx[k]
        tol = 0.02 * (vmax - vmin) + 1e-9
        assert abs(a50 - e50) <= tol, (k, a50, e50)
        assert abs(a99 - e99) <= tol, (k, a99, e99)


def test_kmv_parity(spark, duck):
    from tests.conftest import run_parity

    run_parity(spark, duck, "kmv_distinct_rollup")


def test_kmv_estimate_quality_and_merge(spark):
    """KMV contract on a synthetic id stream: (a) the estimate from
    the k-th smallest hash tracks the true distinct count within the
    ~3/sqrt(k) bound; (b) the sketch is MERGEABLE — the k smallest of
    a union equal the k smallest over the merged min-k sets of the
    two halves (the property that makes it a one-pass distributed
    sketch)."""
    import pyspark.sql.functions as F

    from convoy_spark.functions.hashing import hash60
    from convoy_spark.queries.aggregates import KMV_K

    n = 5000
    ids = spark.range(n).select(
        hash60(F.concat(F.lit("u:"), F.col("id"))).alias("hv")
    )
    ks = [r.hv for r in ids.orderBy("hv").limit(KMV_K).collect()]
    est = (KMV_K - 1) * float(1 << 60) / ks[-1]
    assert abs(est - n) <= 3.0 / (KMV_K ** 0.5) * n, est

    # mergeability: min-k(all) == min-k(min-k(evens) ∪ min-k(odds))
    halves = []
    for par in (0, 1):
        h = (
            spark.range(n)
            .filter(F.col("id") % 2 == par)
            .select(hash60(F.concat(F.lit("u:"), F.col("id"))).alias("hv"))
        )
        halves.extend(r.hv for r in h.orderBy("hv").limit(KMV_K).collect())
    merged = sorted(halves)[:KMV_K]
    assert merged == ks
