"""Streaming index-freshness drift: a chunked drain whose chunks
match the batch twin's epoch assignment must yield the IDENTICAL
drift table (integer counts cumulative-summed in any order are exact;
idf/avgdl are deterministic doubles over equal integers); replays
overwrite their own delta partition instead of double-adding; a crash
between the tokens and corpus writes converges on replay."""

from __future__ import annotations

from pyspark.sql import functions as F

from convoy_spark.streaming.indexdrift import (
    apply_index_drift_batch,
    index_drift_profile,
    index_drift_snapshots,
    run_incremental_index_drift,
)
from convoy_spark.tables import load_table

SF_DIR = "/root/testdata/sf0.001"
PROBE = ["data", "spark", "stream", "zzznevertoken"]
N_EPOCHS = 3


def _rows(df):
    return sorted(
        (
            r.epoch,
            r.token,
            r.df,
            round(r.idf, 9),
            r.n_docs,
            round(r.avgdl, 9),
            None if r.idf_delta is None else round(r.idf_delta, 9),
        )
        for r in df.collect()
    )


def _drain_epochs(spark, tmp_path, tag):
    """Feed doc_id % N_EPOCHS == i as drain i — arrival order matches
    the batch twin's epoch assignment exactly."""
    docs = load_table(spark, SF_DIR, "documents").select("doc_id", "text")
    landing = tmp_path / f"landing_{tag}"
    landing.mkdir()
    for i in range(N_EPOCHS):
        chunk = docs.filter(F.pmod(F.col("doc_id"), F.lit(N_EPOCHS)) == i)
        chunk.coalesce(1).write.mode("overwrite").parquet(
            str(landing / f"chunk{i}")
        )
        run_incremental_index_drift(
            spark,
            str(landing / f"chunk{i}"),
            str(tmp_path / f"ckpt_{tag}_{i}"),
            str(tmp_path / f"state_{tag}"),
        )
    return str(tmp_path / f"state_{tag}")


def test_stream_equals_batch_twin(spark, tmp_path):
    docs = load_table(spark, SF_DIR, "documents").select("doc_id", "text")
    want = _rows(index_drift_profile(docs, PROBE, n_epochs=N_EPOCHS))
    assert want, "empty drift table?"
    state = _drain_epochs(spark, tmp_path, "eq")
    got = _rows(index_drift_snapshots(spark, state, PROBE))
    assert got == want


def test_replay_overwrites_own_delta(spark, tmp_path):
    """Re-applying the same batch tag must not double-add: the delta
    partition overwrites itself and keeps its seq."""
    docs = load_table(spark, SF_DIR, "documents").select("doc_id", "text")
    state = str(tmp_path / "state_replay")
    b0 = docs.filter("doc_id < 50")
    b1 = docs.filter("doc_id >= 50")
    apply_index_drift_batch(spark, b0, state, "t-0")
    apply_index_drift_batch(spark, b1, state, "t-1")
    before = _rows(index_drift_snapshots(spark, state, PROBE))
    apply_index_drift_batch(spark, b0, state, "t-0")  # replay
    after = _rows(index_drift_snapshots(spark, state, PROBE))
    assert after == before
    seqs = sorted(
        r.epoch for r in index_drift_snapshots(spark, state, PROBE)
        .select("epoch").distinct().collect()
    )
    assert seqs == [0, 1]  # t-0 kept seq 0 on replay


def test_partial_write_replay_converges(spark, tmp_path):
    """Crash between the tokens write and the corpus (commit-marker)
    write: the replay rewrites both and the snapshot equals a clean
    run."""
    import os

    docs = load_table(spark, SF_DIR, "documents").select("doc_id", "text")
    b0 = docs.filter("doc_id < 50")

    clean = str(tmp_path / "state_clean")
    apply_index_drift_batch(spark, b0, clean, "t-0")
    want = _rows(index_drift_snapshots(spark, clean, PROBE))

    crashed = str(tmp_path / "state_crashed")
    # simulate: tokens written (seq 0), corpus marker missing
    from convoy_spark.streaming.indexdrift import _batch_deltas

    tok, _ = _batch_deltas(b0)
    tok.select(
        F.lit(0).cast("long").alias("seq"), "token", "df"
    ).write.mode("overwrite").parquet(
        os.path.join(crashed, "deltas", "batch-t-0", "tokens")
    )
    apply_index_drift_batch(spark, b0, crashed, "t-0")  # the replay
    assert _rows(index_drift_snapshots(spark, crashed, PROBE)) == want


def test_empty_store_yields_zero_rows(spark, tmp_path):
    out = index_drift_snapshots(spark, str(tmp_path / "nostate"), PROBE)
    assert out.count() == 0
