"""Streaming tests (SURVEY §7 M5): availableNow drain equals the
batch plan, checkpoint resume reprocesses nothing (the reference's
status-file semantics, S2), and the custom stateful operator
accumulates correctly."""

from __future__ import annotations

import pandas as pd
from pyspark.sql import functions as F

from convoy_spark.queries.eventwin import tumbling_window_agg
from convoy_spark.streaming.incremental import (
    run_available_now,
    run_stateful_user_totals,
)
from convoy_spark.tables import load_table

SF_DIR = "/root/testdata/sf0.001"


def _canon(pdf: pd.DataFrame) -> pd.DataFrame:
    pdf = pdf.reindex(sorted(pdf.columns), axis=1)
    return pdf.sort_values(by=list(pdf.columns)).reset_index(drop=True)


def test_stream_matches_batch(spark, tmp_path):
    run_available_now(spark, SF_DIR, str(tmp_path / "ckpt"), "t_stream")
    got = _canon(spark.table("t_stream").toPandas())
    want = _canon(tumbling_window_agg(spark, SF_DIR).toPandas())
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_checkpoint_resume_is_noop(spark, tmp_path):
    ckpt = str(tmp_path / "ckpt2")
    run_available_now(spark, SF_DIR, ckpt, "t_first")
    n_first = spark.table("t_first").count()
    assert n_first > 0
    # same checkpoint, no new files: the second drain emits nothing new
    run_available_now(spark, SF_DIR, ckpt, "t_second")
    assert spark.table("t_second").count() == 0


def test_stateful_user_totals(spark, tmp_path):
    run_stateful_user_totals(spark, SF_DIR, str(tmp_path / "ckpt3"), "t_state")
    got = {
        r.user_id: (r.n_events, r.total_value)
        for r in spark.table("t_state").collect()
    }
    want = {
        r.user_id: (r.n, r.total)
        for r in load_table(spark, SF_DIR, "events")
        .groupBy("user_id")
        .agg(F.count("*").alias("n"), F.sum("value").alias("total"))
        .collect()
    }
    assert set(got) == set(want)
    for uid, (n, total) in want.items():
        assert got[uid][0] == n
        assert abs(got[uid][1] - total) < 1e-6


def test_streaming_incremental_closure(spark, tmp_path):
    """Two edge-file drops drained with availableNow produce the same
    node→root map as one batch closure over the union; a re-run with
    the same checkpoint is a no-op (resume protocol)."""
    from convoy_spark.operators.closure import closure_roots
    from convoy_spark.streaming.graph import (
        closure_map_as_df,
        run_incremental_closure,
    )

    landing = tmp_path / "edges"
    ckpt = str(tmp_path / "ckpt")
    map_path = str(tmp_path / "closure_map")
    schema = "child_id long, parent_id long"

    b1 = [(1, None), (2, 1), (10, None)]
    b2 = [(3, 2), (11, 10), (4, 3)]
    spark.createDataFrame(b1, schema).coalesce(1).write.parquet(
        str(landing / "drop1")
    )
    run_incremental_closure(spark, str(landing / "*"), ckpt, map_path)
    spark.createDataFrame(b2, schema).coalesce(1).write.parquet(
        str(landing / "drop2")
    )
    run_incremental_closure(spark, str(landing / "*"), ckpt, map_path)

    got = {
        (r.node_id, r.root_id)
        for r in closure_map_as_df(spark, map_path).collect()
    }
    want = {
        (r.node_id, r.root_id)
        for r in closure_roots(
            spark.createDataFrame(b1 + b2, schema)
        ).collect()
    }
    assert got == want

    # resume: nothing new to process; the map must be unchanged
    run_incremental_closure(spark, str(landing / "*"), ckpt, map_path)
    again = {
        (r.node_id, r.root_id)
        for r in closure_map_as_df(spark, map_path).collect()
    }
    assert again == want
