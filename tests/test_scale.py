"""Scale-technique tests: bucketed joins skip their exchanges,
salted aggregation merges exactly."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from convoy_spark.operators.scale import explain_str, salted_agg, write_bucketed
from convoy_spark.tables import load_table

SF_DIR = "/root/testdata/sf0.001"


def test_bucketed_join_skips_shuffle(spark, tmp_path):
    orders = load_table(spark, SF_DIR, "orders")
    customer = load_table(spark, SF_DIR, "customer")
    write_bucketed(orders, "b_orders", "o_custkey", 8, str(tmp_path / "bo"))
    write_bucketed(
        customer.withColumnRenamed("c_custkey", "o_custkey"), "b_customer",
        "o_custkey", 8, str(tmp_path / "bc"),
    )
    # disable broadcast so the join would otherwise shuffle both sides
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = spark.table("b_orders").join(spark.table("b_customer"), "o_custkey")
        plan = explain_str(joined)
        assert "SortMergeJoin" in plan
        assert "Exchange" not in plan, "bucketed join still shuffles"
        # same join on unbucketed frames DOES shuffle — the control
        control = explain_str(
            orders.join(
                customer.withColumnRenamed("c_custkey", "o_custkey"), "o_custkey"
            )
        )
        assert "Exchange" in control
        # and the results agree
        assert joined.count() == orders.join(
            customer.withColumnRenamed("c_custkey", "o_custkey"), "o_custkey"
        ).count()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")


def test_salted_agg_exact(spark):
    events = load_table(spark, SF_DIR, "events")
    # manufacture skew: collapse 90% of keys into one
    skewed = events.withColumn(
        "k", F.when(F.col("user_id") % 10 != 0, F.lit(0)).otherwise(F.col("user_id"))
    )
    direct = {
        r.k: (r.s, r.c)
        for r in skewed.groupBy("k")
        .agg(F.sum("value").alias("s"), F.count("value").alias("c"))
        .collect()
    }
    salted = {
        r.k: (r.sum_value, r.count_value)
        for r in salted_agg(skewed, "k", [("value", "sum"), ("value", "count")])
        .collect()
    }
    assert set(direct) == set(salted)
    for k in direct:
        assert salted[k][1] == direct[k][1]
        assert salted[k][0] == pytest.approx(direct[k][0], rel=1e-9)


def test_salted_rejects_non_decomposable(spark):
    events = load_table(spark, SF_DIR, "events")
    with pytest.raises(ValueError):
        salted_agg(events, "user_id", [("value", "median")])


def test_range_rank_matches_global_order(spark):
    from convoy_spark.operators.scale import range_rank

    import random
    rnd = random.Random(7)
    names = [f"item-{rnd.randrange(10**9):09d}" for _ in range(500)]
    names = list(dict.fromkeys(names))
    df = spark.createDataFrame([(n,) for n in names], "k string")
    got = {r.k: r.rank for r in range_rank(df, ["k"], out_col="rank").collect()}
    want = {n: i + 1 for i, n in enumerate(sorted(names))}
    assert got == want
