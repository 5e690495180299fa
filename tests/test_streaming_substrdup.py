"""Streaming incremental substring-overlap dedup: single-batch drain
is bit-identical to the batch operator; chunked delivery in any order
emits exactly the batch pair set (each pair once); a gram crossing
the stop-gram cap mid-stream stops producing new pairs; checkpoint
resume emits nothing."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from convoy_spark.operators.dedup import substring_dup_pairs
from convoy_spark.streaming.substrdup import run_incremental_substrdup
from convoy_spark.tables import load_table

SF_DIR = "/root/testdata/sf0.001"


def _expected_pairs(spark):
    docs = load_table(spark, SF_DIR, "documents").select("doc_id", "text")
    return {
        (r.doc_a, r.doc_b): r.n_shared
        for r in substring_dup_pairs(docs).collect()
    }


def _run_chunks(spark, tmp_path, chunks, tag, **kw):
    landing = tmp_path / f"landing_{tag}"
    landing.mkdir()
    docs = load_table(spark, SF_DIR, "documents").select("doc_id", "text")
    got: dict = {}

    def sink(df):
        for r in df.collect():
            key = (r.doc_a, r.doc_b)
            assert key not in got, f"pair {key} emitted twice"
            got[key] = r.n_shared

    for i, (lo, hi) in enumerate(chunks):
        chunk = docs.filter(
            (F.col("doc_id") >= lo) & (F.col("doc_id") < hi)
        )
        chunk.coalesce(1).write.mode("overwrite").parquet(
            str(landing / f"chunk{i}")
        )
        run_incremental_substrdup(
            spark,
            str(landing / f"chunk{i}"),
            str(tmp_path / f"ckpt_{tag}_{i}"),
            str(tmp_path / f"state_{tag}"),
            sink,
            **kw,
        )
    return got


def test_single_batch_drain_equals_batch(spark, tmp_path):
    """Whole corpus as ONE batch: empty history makes the incremental
    cap identical to the batch operator's global cap, so the result
    must be bit-identical (pairs AND n_shared counts)."""
    want = _expected_pairs(spark)
    assert want, "corpus has no planted duplicate passages at this SF?"
    got = _run_chunks(spark, tmp_path, [(0, 10_000)], "single")
    assert got == want


# Both store layouts run the stream==batch suite (round-6 verdict #6):
# the bucketed path is continuously proven, not by one dedicated test.
LAYOUTS = ["plain", "bucketed"]


@pytest.mark.parametrize("layout", LAYOUTS)
def test_stream_equals_batch_chunked(spark, tmp_path, layout):
    want = _expected_pairs(spark)
    got = _run_chunks(
        spark, tmp_path, [(0, 20), (20, 35), (35, 10_000)],
        f"fwd_{layout}", layout=layout,
    )
    assert got == want


@pytest.mark.parametrize("layout", LAYOUTS)
def test_stream_equals_batch_out_of_order(spark, tmp_path, layout):
    want = _expected_pairs(spark)
    got = _run_chunks(
        spark, tmp_path, [(30, 10_000), (0, 30)], f"rev_{layout}",
        layout=layout,
    )
    assert got == want


def test_cap_crossing_mid_stream_stops_new_pairs(spark, tmp_path):
    """Plant one shared passage in many docs, cap=3: batches after the
    cumulative count crosses the cap must emit NO new pairs through
    that gram — the monotone incremental cap semantics."""
    passage = "the quick brown fox jumps over the lazy dog repeatedly"
    rows = [
        (i, f"doc number {i} unique filler text {i * 7} " + passage * 2)
        for i in range(8)
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    landing = tmp_path / "landing_cap"
    landing.mkdir()
    emitted_per_batch: list[int] = []

    def sink(df):
        emitted_per_batch.append(df.count())

    for i in range(4):  # two docs per batch
        chunk = docs.filter(
            (F.col("doc_id") >= 2 * i) & (F.col("doc_id") < 2 * i + 2)
        )
        chunk.coalesce(1).write.mode("overwrite").parquet(
            str(landing / f"chunk{i}")
        )
        run_incremental_substrdup(
            spark,
            str(landing / f"chunk{i}"),
            str(tmp_path / f"ckpt_cap_{i}"),
            str(tmp_path / "state_cap"),
            sink,
            cap=3,
            min_shared=2,
        )
    # batch 0: docs 0,1 → 1 within pair (count 2 ≤ 3). batch 1: docs
    # 2,3 → count hits 4 > 3 → gram dead → 0 pairs. batches 2,3: gram
    # stays dead → 0 pairs.
    assert emitted_per_batch[0] > 0
    assert emitted_per_batch[1] == 0
    assert emitted_per_batch[2] == 0 and emitted_per_batch[3] == 0


def test_checkpoint_resume_emits_nothing(spark, tmp_path):
    docs = load_table(spark, SF_DIR, "documents").select("doc_id", "text")
    landing = tmp_path / "landing_resume"
    docs.coalesce(1).write.mode("overwrite").parquet(str(landing))
    first: list = []
    run_incremental_substrdup(
        spark,
        str(landing),
        str(tmp_path / "ckpt_resume"),
        str(tmp_path / "state_resume"),
        lambda df: first.extend(df.collect()),
    )
    assert first
    second: list = []
    run_incremental_substrdup(
        spark,
        str(landing),
        str(tmp_path / "ckpt_resume"),
        str(tmp_path / "state_resume"),
        lambda df: second.extend(df.collect()),
    )
    assert second == []
