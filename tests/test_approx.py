"""Approximate-aggregate tolerance tests: the sketch must land within
its declared error bound of the exact answer (the correctness
contract a rows-only driver check cannot express)."""

from __future__ import annotations

from pyspark.sql import functions as F

from convoy_spark.queries.aggregates import approx_distinct_rollup
from convoy_spark.tables import load_table

SF_DIR = "/root/testdata/sf0.01"


def test_approx_within_rsd(spark):
    approx = {
        r.event_type: r.approx_users
        for r in approx_distinct_rollup(spark, SF_DIR).collect()
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
