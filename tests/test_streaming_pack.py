"""Streaming sequence packing: id-ordered chunked delivery produces a
manifest bit-identical to the batch pack_sequences over the union;
out-of-order delivery still tiles the stream exactly (arrival order);
replay and crash-between-writes converge."""

from __future__ import annotations

from pyspark.sql import functions as F

from convoy_spark.operators.loader import pack_sequences
from convoy_spark.streaming.pack import (
    apply_pack_batch,
    packed_manifest,
    run_incremental_pack,
)
from convoy_spark.tables import load_table

SF_DIR = "/root/testdata/sf0.001"
SEQ = 256


def _docs(spark):
    return load_table(spark, SF_DIR, "documents").select("doc_id", "text")


def _rows(df):
    return sorted(map(tuple, df.collect()))


def test_ordered_chunks_equal_batch(spark, tmp_path):
    docs = _docs(spark)
    want = _rows(pack_sequences(docs, seq_len=SEQ))
    state = str(tmp_path / "state")
    # id-contiguous chunks, delivered in id order
    for i, (lo, hi) in enumerate([(0, 150), (150, 320), (320, 10**9)]):
        chunk = docs.filter(
            (F.col("doc_id") >= lo) & (F.col("doc_id") < hi)
        )
        chunk.coalesce(1).write.parquet(str(tmp_path / f"landing{i}/c"))
        run_incremental_pack(
            spark,
            str(tmp_path / f"landing{i}/c"),
            str(tmp_path / f"ckpt{i}"),
            state,
            seq_len=SEQ,
        )
    got = _rows(packed_manifest(spark, state))
    assert got == want  # bitwise: same stream, same offsets


def test_out_of_order_arrival_tiles_by_arrival(spark, tmp_path):
    docs = _docs(spark)
    state = str(tmp_path / "state")
    for i, (lo, hi) in enumerate([(320, 10**9), (0, 150), (150, 320)]):
        chunk = docs.filter(
            (F.col("doc_id") >= lo) & (F.col("doc_id") < hi)
        )
        chunk.coalesce(1).write.parquet(str(tmp_path / f"landing{i}/c"))
        run_incremental_pack(
            spark,
            str(tmp_path / f"landing{i}/c"),
            str(tmp_path / f"ckpt{i}"),
            state,
            seq_len=SEQ,
        )
    out = sorted(
        packed_manifest(spark, state).collect(),
        key=lambda r: r.start_offset,
    )
    # offsets tile the arrival-order stream exactly: gapless, first 0
    run = 0
    for r in out:
        assert r.start_offset == run
        run += r.n_tokens
    total = _docs(spark).select(
        F.sum(
            F.size(F.filter(F.split(F.lower("text"), r"[ \t\n\x0b\f\r]+"),
                            lambda t: t != F.lit("")))
        )
    ).first()[0]
    assert run == total
    # the first arriving chunk starts the stream
    assert out[0].doc_id >= 320


def test_replay_and_partial_write_converge(spark, tmp_path):
    import shutil

    docs = _docs(spark)
    state = str(tmp_path / "state")
    b0 = docs.filter("doc_id < 200")
    b1 = docs.filter("doc_id >= 200")
    apply_pack_batch(b0, state, "t-0", seq_len=SEQ)
    apply_pack_batch(b1, state, "t-1", seq_len=SEQ)
    want = _rows(packed_manifest(spark, state))
    # full replay of both batches: identical
    apply_pack_batch(b0, state, "t-0", seq_len=SEQ)
    apply_pack_batch(b1, state, "t-1", seq_len=SEQ)
    assert _rows(packed_manifest(spark, state)) == want
    # crash between the manifest write and the offsets write of the
    # LAST batch: offsets row lost, manifest present — replay reuses
    # max(seq)+1 (the same seq) and rewrites identical rows
    shutil.rmtree(str(tmp_path / "state/offsets/batch-t-1"))
    apply_pack_batch(b1, state, "t-1", seq_len=SEQ)
    assert _rows(packed_manifest(spark, state)) == want


def test_shard_manifest_completed_shards_immutable(spark, tmp_path):
    from convoy_spark.streaming.pack import shard_manifest

    docs = _docs(spark)
    state = str(tmp_path / "state")
    apply_pack_batch(docs.filter("doc_id < 250"), state, "t-0", seq_len=SEQ)
    first = {
        r.doc_id: r.shard_id
        for r in shard_manifest(spark, state, shard_tokens=1024).collect()
    }
    # stream grows: earlier docs' shard assignments never change
    apply_pack_batch(docs.filter("doc_id >= 250"), state, "t-1", seq_len=SEQ)
    both = {
        r.doc_id: r.shard_id
        for r in shard_manifest(spark, state, shard_tokens=1024).collect()
    }
    assert all(both[d] == s for d, s in first.items())
    # shards are contiguous non-decreasing runs of the stream
    rows = sorted(
        shard_manifest(spark, state, shard_tokens=1024).collect(),
        key=lambda r: r.start_offset,
    )
    assert rows[0].shard_id == 0
    for a, b in zip(rows, rows[1:]):
        assert b.shard_id - a.shard_id in (0, 1)
