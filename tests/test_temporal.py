"""Semantic invariants for the temporal-warehouse family — checks the
oracle differential can't express (the oracle shares the formulation;
these recompute the CONTRACT independently, in pandas, from the raw
table)."""

from __future__ import annotations

import math

import pandas as pd

from convoy_spark.queries.temporal import (
    anomaly_zscore,
    column_profile,
    interval_merge,
    last_touch_attribution,
    scd2_snapshot,
)
from tests.conftest import SF_DIR


def _events(spark):
    from convoy_spark.tables import load_table

    return load_table(spark, SF_DIR, "events").toPandas()


def test_interval_merge_islands_disjoint_and_cover(spark):
    out = interval_merge(spark, SF_DIR).toPandas()
    ev = _events(spark)
    assert out["n_intervals"].sum() == len(ev)
    assert (out["merged_start"] <= out["merged_end"]).all()
    for _, g in out.groupby("user_id"):
        g = g.sort_values("island_id")
        # islands are strictly separated: each starts after the
        # previous island's end (strict >, touching would have merged)
        prev_end = None
        for _, row in g.iterrows():
            if prev_end is not None:
                assert row["merged_start"] > prev_end
            prev_end = row["merged_end"]


def test_scd2_runs_collapse_and_chain(spark):
    out = scd2_snapshot(spark, SF_DIR).toPandas()
    ev = _events(spark)
    assert out["n_events"].sum() == len(ev)
    for _, g in out.groupby("user_id"):
        g = g.sort_values("run_id").reset_index(drop=True)
        # consecutive runs always change type (else they'd be one run)
        types = g["event_type"].tolist()
        assert all(a != b for a, b in zip(types, types[1:]))
        # valid_to chains to the next run's valid_from; final is open
        assert g["valid_to"].iloc[-1] is pd.NaT or pd.isna(
            g["valid_to"].iloc[-1]
        )
        for i in range(len(g) - 1):
            assert g["valid_to"].iloc[i] == g["valid_from"].iloc[i + 1]


def test_anomaly_zscore_flags_are_three_sigma(spark):
    out = anomaly_zscore(spark, SF_DIR).toPandas()
    ev = _events(spark).sort_values(["event_type", "ts", "event_id"])
    flagged = set(out["event_id"])
    recomputed = set()
    for _, g in ev.groupby("event_type"):
        v = (g["value"] * 1000.0).apply(math.floor).astype("int64").tolist()
        ids = g["event_id"].tolist()
        for i in range(len(v)):
            lo = max(0, i - 100)
            win = v[lo:i]
            n = len(win)
            if n < 30:
                continue
            s, q = float(sum(win)), float(sum(x * x for x in win))
            dev = n * float(v[i]) - s
            if dev * dev * (n - 1.0) > 9.0 * n * (n * q - s * s):
                recomputed.add(ids[i])
    assert flagged == recomputed
    assert len(flagged) > 0


def test_attribution_partitions_purchases(spark):
    out = last_touch_attribution(spark, SF_DIR).toPandas()
    ev = _events(spark)
    n_purch = (ev["event_type"] == "purchase").sum()
    assert out["n_purchases"].sum() == n_purch
    assert set(out["channel"]) <= {"click", "view", "organic"}
    # revenue partitions the purchase total (decimal-exact on both
    # sides; compare at the quantization the dsum contract guarantees)
    total = ev.loc[ev["event_type"] == "purchase", "value"].round(6).sum()
    assert abs(out["attributed_revenue"].sum() - total) < 1e-3


def test_column_profile_matches_pandas(spark):
    out = column_profile(spark, SF_DIR).toPandas().set_index("col_name")
    from convoy_spark.tables import load_table

    li = load_table(spark, SF_DIR, "lineitem").toPandas()
    for col in ["l_quantity", "l_extendedprice", "l_discount", "l_tax"]:
        row = out.loc[col]
        assert row["n_rows"] == len(li)
        assert row["n_nulls"] == li[col].isna().sum()
        assert row["n_distinct"] == li[col].nunique()
        assert row["min_value"] == li[col].min()
        assert row["max_value"] == li[col].max()
        assert abs(row["mean_value"] - li[col].mean()) < 1e-6


def test_resample_ffill_pandas_reference(spark):
    from convoy_spark.queries.temporal import resample_ffill

    ev = _events(spark)
    out = resample_ffill(spark, SF_DIR).toPandas()
    ev["hour"] = ev["ts"].dt.floor("h")
    for uid, g in out.groupby("user_id"):
        e = ev[ev.user_id == uid].sort_values(["ts", "event_id"])
        g = g.sort_values("grid_ts").reset_index(drop=True)
        # contiguous hourly grid spanning the user's event range
        assert g.grid_ts.iloc[0] == e.hour.min()
        assert g.grid_ts.iloc[-1] == e.hour.max()
        assert (g.grid_ts.diff().dropna() == pd.Timedelta(hours=1)).all()
        # event counts conserved, gaps are zero
        assert g.n_events.sum() == len(e)
        counts = e.groupby("hour").size()
        for _, r in g.iterrows():
            assert r.n_events == counts.get(r.grid_ts, 0)
        # forward fill: last event value at or before the hour's end
        for _, r in g.iterrows():
            prior = e[e.hour <= r.grid_ts]
            assert not prior.empty
            assert r.value_ffill == prior.value.iloc[-1]


def test_snapshot_diff_parity(spark, duck):
    from tests.conftest import run_parity

    run_parity(spark, duck, "snapshot_diff")


def test_snapshot_diff_accounting(spark):
    """Status accounting recomputed from the mod masks: removed =
    rows in A only (id%10!=0 and id%7==0), added = B only, changed =
    both sides with id%5==0 (the value bump) — and every A∪B row is
    classified exactly once."""
    from pyspark.sql import functions as F

    from convoy_spark.queries import QUERIES
    from convoy_spark.tables import load_table

    sf = "/root/testdata/sf0.001"
    ids = [
        r.event_id
        for r in load_table(spark, sf, "events").select("event_id").collect()
    ]
    in_a = {i for i in ids if i % 10 != 0}
    in_b = {i for i in ids if i % 7 != 0}
    want = {
        "added": len(in_b - in_a),
        "removed": len(in_a - in_b),
        "changed": len({i for i in in_a & in_b if i % 5 == 0}),
        "unchanged": len({i for i in in_a & in_b if i % 5 != 0}),
    }
    rows = QUERIES["snapshot_diff"](spark, sf).collect()
    got = {}
    for r in rows:
        got[r.status] = got.get(r.status, 0) + r.n
    assert got == {k: v for k, v in want.items() if v}
    assert sum(got.values()) == len(in_a | in_b)


def test_column_histogram_parity(spark, duck):
    from tests.conftest import run_parity

    run_parity(spark, duck, "column_histogram")


def test_column_histogram_equi_depth(spark):
    """Per group: bucket counts differ by at most 1 (ntile contract),
    Σn == group size, and bucket value ranges are non-overlapping and
    ordered (lo_{b+1} >= hi_b)."""
    from collections import defaultdict

    from convoy_spark.queries import QUERIES
    from convoy_spark.tables import load_table

    sf = "/root/testdata/sf0.001"
    rows = QUERIES["column_histogram"](spark, sf).collect()
    sizes = {
        r.event_type: r.n
        for r in load_table(spark, sf, "events")
        .groupBy("event_type")
        .count()
        .withColumnRenamed("count", "n")
        .collect()
    }
    by_g = defaultdict(list)
    for r in rows:
        by_g[r.event_type].append(r)
    for g, rs in by_g.items():
        rs.sort(key=lambda r: r.bucket)
        counts = [r.n for r in rs]
        assert max(counts) - min(counts) <= 1, (g, counts)
        assert sum(counts) == sizes[g]
        for a, b in zip(rs, rs[1:]):
            assert b.lo >= a.hi or abs(b.lo - a.hi) < 1e-12, (g, a, b)


def test_funnel_chain_semantics(spark):
    # Constructed sequences: greedy-earliest chain, window exclusion,
    # order requirement.
    from datetime import datetime

    from convoy_spark.queries.eventwin import funnel_user_chain

    def t(day, hour=0):
        return datetime(2024, 1, day, hour)

    rows = [
        # user 1: clean chain view(d1) -> click(d2) -> purchase(d3)
        (1, "view", t(1)), (1, "click", t(2)), (1, "purchase", t(3)),
        # user 2: click BEFORE view only -> chain stops at view
        (2, "click", t(1)), (2, "view", t(2)),
        # user 3: click 100h after view (outside the 72h window)
        (3, "view", t(1)), (3, "click", t(5, 5)),
        # user 4: two views; the EARLIEST anchors the window, so the
        # click at d4 is within 72h of view d2 but NOT of view d1
        (4, "view", t(1)), (4, "view", t(2)), (4, "click", t(4, 12)),
        # user 5: purchase without click -> stops after view
        (5, "view", t(1)), (5, "purchase", t(2)),
    ]
    events = spark.createDataFrame(
        [(i, ts, u, et, 0.0) for i, (u, et, ts) in enumerate(rows)],
        "event_id long, ts timestamp, user_id long, event_type string, value double",
    )
    done = {r.user_id for r in funnel_user_chain(events).collect()}
    assert done == {1}  # only user 1 completes view->click->purchase
