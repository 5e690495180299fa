"""Streaming PQ re-train trigger: the decision surface derived from
the persisted error store is BITWISE equal to the one-pass batch twin
for any chunking in any delivery order (errors are pure exact longs
under the frozen codebook; per-epoch sums are mergeable); replay and
cross-drain re-delivery collapse idempotently; the surface is empty
until the train epoch exists; and the trigger actually FIRES on the
label-sharded drift the policy targets."""

from __future__ import annotations

from pyspark.sql import functions as F

from convoy_spark.streaming.pqencode import freeze_codebook
from convoy_spark.streaming.pqretrain import (
    RETRAIN_EPOCHS,
    apply_pqretrain_batch,
    pq_retrain_profile,
    retrain_surface,
    run_incremental_pqretrain,
)

SF_DIR = "/root/testdata/sf0.001"


def _emb(spark):
    return spark.read.parquet(f"{SF_DIR}/embeddings.parquet").select(
        "vec_id", "embedding", "label"
    )


def _rows(df):
    return sorted(
        (r.epoch, r.n_vecs, r.mean_err, r.drift_ratio, r.retrain)
        for r in df.collect()
    )


def _freeze_epoch0(emb, state):
    freeze_codebook(emb.filter((F.col("label") % RETRAIN_EPOCHS) == 0), state)


def test_stream_surface_equals_batch_bitwise(spark, tmp_path):
    emb = _emb(spark)
    state = str(tmp_path / "state")
    _freeze_epoch0(emb, state)
    want = _rows(pq_retrain_profile(emb))
    assert len(want) == RETRAIN_EPOCHS
    landing = tmp_path / "landing"
    landing.mkdir()
    # three uneven chunks, delivered out of id order
    for i, (lo, hi) in enumerate([(300, 10**9), (0, 120), (120, 300)]):
        chunk = emb.filter((F.col("vec_id") >= lo) & (F.col("vec_id") < hi))
        chunk.coalesce(1).write.mode("overwrite").parquet(
            str(landing / f"chunk{i}")
        )
        run_incremental_pqretrain(
            spark,
            str(landing / f"chunk{i}"),
            str(tmp_path / f"ckpt{i}"),
            state,
        )
    assert _rows(retrain_surface(spark, state)) == want


def test_replay_and_redelivery_idempotent(spark, tmp_path):
    emb = _emb(spark)
    state = str(tmp_path / "state")
    _freeze_epoch0(emb, state)
    first = emb.filter(F.col("vec_id") < 200)
    apply_pqretrain_batch(first, state, batch_tag="t-0")
    once = _rows(retrain_surface(spark, state))
    # at-least-once replay of the same batch tag: overwrites itself
    apply_pqretrain_batch(first, state, batch_tag="t-0")
    # cross-drain re-delivery of the same vectors under a NEW tag:
    # byte-identical rows, collapsed by the store read's DISTINCT
    apply_pqretrain_batch(first, state, batch_tag="u-0")
    assert _rows(retrain_surface(spark, state)) == once


def test_surface_empty_before_train_epoch(spark, tmp_path):
    emb = _emb(spark)
    state = str(tmp_path / "state")
    _freeze_epoch0(emb, state)
    drifted = emb.filter((F.col("label") % RETRAIN_EPOCHS) != 0)
    apply_pqretrain_batch(drifted, state, batch_tag="t-0")
    # no epoch-0 rows banked yet -> no baseline -> no decision rows
    assert retrain_surface(spark, state).count() == 0


def test_trigger_fires_on_label_shard_drift(spark, tmp_path):
    emb = _emb(spark)
    state = str(tmp_path / "state")
    _freeze_epoch0(emb, state)
    apply_pqretrain_batch(emb, state, batch_tag="t-0")
    rows = {r.epoch: r for r in retrain_surface(spark, state).collect()}
    assert rows[0].retrain is False  # in-sample epoch never fires
    assert rows[0].drift_ratio == 1.0
    fired = [e for e, r in rows.items() if e != 0 and r.retrain]
    assert fired, "held-out topic epochs must cross the drift threshold"
