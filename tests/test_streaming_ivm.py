"""Streaming IVM: any chunking in any order folds to a view
bit-identical to the one-pass batch rollup (decimal partials); replay
idempotent; empty store serves an empty view."""

from __future__ import annotations

from pyspark.sql import functions as F

from convoy_spark.queries.relational import rollup_partials
from convoy_spark.streaming.ivm import (
    apply_ivm_batch,
    run_incremental_ivm,
    view_over_store,
)
from convoy_spark.tables import load_table

SF_DIR = "/root/testdata/sf0.001"


def _li(spark):
    return load_table(spark, SF_DIR, "lineitem")


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_stream_view_equals_batch_bitwise(spark, tmp_path):
    li = _li(spark)
    want = _rows(rollup_partials(li))
    assert want
    landing = tmp_path / "landing"
    landing.mkdir()
    # three uneven chunks, out of key order, order groups straddling
    for i, (lo, hi) in enumerate([(900, 10**9), (0, 150), (150, 900)]):
        chunk = li.filter(
            (F.col("l_orderkey") >= lo) & (F.col("l_orderkey") < hi)
        )
        chunk.coalesce(1).write.mode("overwrite").parquet(
            str(landing / f"chunk{i}")
        )
        run_incremental_ivm(
            spark,
            str(landing / f"chunk{i}"),
            str(tmp_path / f"ckpt{i}"),
            str(tmp_path / "state"),
        )
    got = _rows(view_over_store(spark, str(tmp_path / "state")))
    assert got == want  # decimal partials: equality is BITWISE


def test_ivm_replay_idempotent(spark, tmp_path):
    li = _li(spark).limit(300)
    state = str(tmp_path / "state")
    apply_ivm_batch(li, state, batch_tag="t-0")
    once = _rows(view_over_store(spark, state))
    apply_ivm_batch(li, state, batch_tag="t-0")  # crash replay
    assert _rows(view_over_store(spark, state)) == once


def test_ivm_empty_store(spark, tmp_path):
    assert view_over_store(spark, str(tmp_path / "none")).count() == 0


def test_ivm_compaction_preserves_view_bitwise(spark, tmp_path):
    from convoy_spark.streaming.compact import compact_ivm_partials

    li = _li(spark)
    state = str(tmp_path / "state")
    for i, (lo, hi) in enumerate([(0, 400), (400, 800), (800, 10**9)]):
        apply_ivm_batch(
            li.filter(
                (F.col("l_orderkey") >= lo) & (F.col("l_orderkey") < hi)
            ),
            state,
            batch_tag=f"t-{i}",
        )
    before = _rows(view_over_store(spark, state))
    replaced = compact_ivm_partials(spark, state)
    assert replaced > 0
    after = _rows(view_over_store(spark, state))
    assert after == before
    # and further deltas still fold in after compaction
    apply_ivm_batch(li.limit(0), state, batch_tag="t-post")
    assert _rows(view_over_store(spark, state)) == before
