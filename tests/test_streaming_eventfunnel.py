"""Streaming event funnel: a fully-drained stream answers identically
to the batch operator under chunked and out-of-order delivery; epoch
replay is idempotent; only funnel-step events persist."""

from __future__ import annotations

from pyspark.sql import functions as F

from convoy_spark.queries.eventwin import FUNNEL_STEPS, funnel_rollup
from convoy_spark.streaming.eventfunnel import (
    apply_funnel_batch,
    funnel_over_store,
    load_step_store,
    run_incremental_funnel,
)
from convoy_spark.tables import load_table

SF_DIR = "/root/testdata/sf0.001"


def _events(spark):
    return load_table(spark, SF_DIR, "events").select(
        "event_id", "ts", "user_id", "event_type", "value"
    )


def _rows(df):
    return sorted(
        (r.step, r.step_name, r.n_users, r.conv_from_prev)
        for r in df.collect()
    )


def test_stream_funnel_equals_batch(spark, tmp_path):
    ev = _events(spark)
    want = _rows(funnel_rollup(ev.select("user_id", "event_type", "ts")))
    assert want and want[0][2] > 0  # step 1 reached by someone
    landing = tmp_path / "landing"
    landing.mkdir()
    # three uneven chunks delivered OUT of event-id order: the late
    # chunk (ids 0..500) contains early 'view's that re-anchor chains
    for i, (lo, hi) in enumerate([(3000, 10**9), (500, 3000), (0, 500)]):
        chunk = ev.filter(
            (F.col("event_id") >= lo) & (F.col("event_id") < hi)
        )
        chunk.coalesce(1).write.mode("overwrite").parquet(
            str(landing / f"chunk{i}")
        )
        run_incremental_funnel(
            spark,
            str(landing / f"chunk{i}"),
            str(tmp_path / f"ckpt{i}"),
            str(tmp_path / "state"),
        )
    got = _rows(funnel_over_store(spark, str(tmp_path / "state")))
    assert got == want


def test_replay_is_idempotent_and_store_filtered(spark, tmp_path):
    ev = _events(spark).limit(200)
    state = str(tmp_path / "state")
    apply_funnel_batch(ev, state, batch_tag="t-0")
    once = _rows(funnel_over_store(spark, state))
    apply_funnel_batch(ev, state, batch_tag="t-0")  # crash replay
    assert _rows(funnel_over_store(spark, state)) == once
    kinds = {
        r.event_type
        for r in load_step_store(spark, state).select("event_type").distinct().collect()
    }
    assert kinds <= set(FUNNEL_STEPS)  # only funnel steps persist


def test_empty_store_yields_zero_rows_funnel(spark, tmp_path):
    out = funnel_over_store(spark, str(tmp_path / "nostate"))
    rows = {r.step: r.n_users for r in out.collect()}
    assert rows == {1: 0, 2: 0, 3: 0}
