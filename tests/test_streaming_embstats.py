"""Streaming embedding moments: any chunking in any order folds to
BIT-IDENTICAL per-dimension moments vs the one-pass batch twin
(exact integer accumulation); epoch replay is idempotent."""

from __future__ import annotations

from pyspark.sql import functions as F

from convoy_spark.streaming.embstats import (
    apply_embstats_batch,
    batch_moments,
    embedding_moments,
    run_incremental_embstats,
)

SF_DIR = "/root/testdata/sf0.001"


def _emb(spark):
    return spark.read.parquet(f"{SF_DIR}/embeddings.parquet").select(
        "vec_id", "embedding"
    )


def _rows(df):
    return sorted(
        (r.d, r.n, r.mean, r.variance) for r in df.collect()
    )


def test_stream_moments_equal_batch_bitwise(spark, tmp_path):
    emb = _emb(spark)
    want = _rows(batch_moments(emb))
    assert want
    landing = tmp_path / "landing"
    landing.mkdir()
    # three uneven chunks, delivered out of id order
    for i, (lo, hi) in enumerate([(300, 10**9), (0, 120), (120, 300)]):
        chunk = emb.filter(
            (F.col("vec_id") >= lo) & (F.col("vec_id") < hi)
        )
        chunk.coalesce(1).write.mode("overwrite").parquet(
            str(landing / f"chunk{i}")
        )
        run_incremental_embstats(
            spark,
            str(landing / f"chunk{i}"),
            str(tmp_path / f"ckpt{i}"),
            str(tmp_path / "state"),
        )
    got = _rows(embedding_moments(spark, str(tmp_path / "state")))
    assert got == want  # floats equal BITWISE: same integer sums


def test_epoch_replay_is_idempotent(spark, tmp_path):
    """Re-applying the same epoch (a mid-batch crash replay)
    overwrites its own delta instead of double-adding."""
    emb = _emb(spark).limit(50)
    state = str(tmp_path / "state")
    apply_embstats_batch(emb, state, batch_tag="t-0")
    once = _rows(embedding_moments(spark, state))
    apply_embstats_batch(emb, state, batch_tag="t-0")  # replay
    assert _rows(embedding_moments(spark, state)) == once


def test_moments_match_numpy(spark):
    import numpy as np

    emb = _emb(spark)
    X = np.array(
        [r.embedding for r in emb.orderBy("vec_id").collect()],
        dtype=np.float64,
    )
    got = {r.d: (r.n, r.mean, r.variance) for r in batch_moments(emb).collect()}
    for d in range(X.shape[1]):
        n, mean, var = got[d]
        assert n == X.shape[0]
        assert abs(mean - X[:, d].mean()) < 1e-9
        assert abs(var - X[:, d].var()) < 1e-9
