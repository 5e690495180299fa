"""Streaming incremental MinHash-LSH near-dup: any chunking of the
corpus, in any arrival order, must emit EXACTLY the batch operator's
pair set, each pair exactly once; checkpoint resume emits nothing."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from convoy_spark.operators.dedup import minhash_lsh_neardup
from convoy_spark.streaming.neardup import run_incremental_neardup
from convoy_spark.tables import load_table

SF_DIR = "/root/testdata/sf0.001"
MIN_J = 0.8


def _expected_pairs(spark):
    docs = load_table(spark, SF_DIR, "documents").select("doc_id", "text")
    return {
        (r.doc_a, r.doc_b): round(r.jaccard, 9)
        for r in minhash_lsh_neardup(docs, min_jaccard=MIN_J).collect()
    }


def _run_chunks(spark, tmp_path, chunks, tag, layout="plain"):
    landing = tmp_path / f"landing_{tag}"
    landing.mkdir()
    docs = load_table(spark, SF_DIR, "documents").select("doc_id", "text")
    got: dict = {}

    def sink(df):
        for r in df.collect():
            key = (r.doc_a, r.doc_b)
            assert key not in got, f"pair {key} emitted twice"
            got[key] = round(r.jaccard, 9)

    for i, (lo, hi) in enumerate(chunks):
        chunk = docs.filter(
            (F.col("doc_id") >= lo) & (F.col("doc_id") < hi)
        )
        chunk.coalesce(1).write.mode("overwrite").parquet(
            str(landing / f"chunk{i}")
        )
        run_incremental_neardup(
            spark,
            str(landing / f"chunk{i}"),
            str(tmp_path / f"ckpt_{tag}_{i}"),
            str(tmp_path / f"state_{tag}"),
            sink,
            min_jaccard=MIN_J,
            layout=layout,
        )
    return got


# Both store layouts run the full stream==batch suite (round-6 verdict
# #6): the bucketed path is continuously proven, not just by one
# dedicated test — a layout is physical, never semantic.
LAYOUTS = ["plain", "bucketed"]


@pytest.mark.parametrize("layout", LAYOUTS)
def test_stream_equals_batch_in_order(spark, tmp_path, layout):
    want = _expected_pairs(spark)
    assert want, "corpus has no planted near-dups at this SF?"
    got = _run_chunks(
        spark,
        tmp_path,
        [(0, 20), (20, 35), (35, 10_000)],
        f"fwd_{layout}",
        layout=layout,
    )
    assert got == want


@pytest.mark.parametrize("layout", LAYOUTS)
def test_stream_equals_batch_out_of_order(spark, tmp_path, layout):
    """Later crawl delivers EARLIER ids — pair orientation and the
    pair set must still match the batch operator exactly."""
    want = _expected_pairs(spark)
    got = _run_chunks(
        spark, tmp_path, [(30, 10_000), (0, 30)], f"rev_{layout}",
        layout=layout,
    )
    assert got == want


def test_redelivered_doc_no_self_pair_no_store_inflation(spark, tmp_path):
    """A doc_id re-delivered in a LATER file (not fenced by the
    checkpoint) must not emit a (x, x) self-pair against its own
    historical sketch, must not duplicate its band/shingle store rows
    (inflated n_sh skews future jaccards), and overlapping-chunk
    delivery must still yield exactly the batch pair set."""
    want = _expected_pairs(spark)
    # chunks overlap on [20, 35): those docs arrive twice
    got = _run_chunks(
        spark, tmp_path, [(0, 35), (20, 10_000)], "redeliver"
    )
    for a, b in got:
        assert a != b, f"self-pair ({a},{b}) emitted"
    assert got == want
    # store hygiene: one shingle row set per doc (first-crawl-wins)
    sh = spark.read.parquet(str(tmp_path / "state_redeliver" / "shingles"))
    dup = (
        sh.groupBy("doc_id", "h")
        .count()
        .filter(F.col("count") > 1)
        .count()
    )
    assert dup == 0, "re-delivered doc duplicated its shingle rows"


def test_checkpoint_resume_emits_nothing(spark, tmp_path):
    docs = load_table(spark, SF_DIR, "documents").select("doc_id", "text")
    landing = tmp_path / "landing_resume"
    docs.coalesce(1).write.mode("overwrite").parquet(str(landing))
    first: list = []
    run_incremental_neardup(
        spark,
        str(landing),
        str(tmp_path / "ckpt_resume"),
        str(tmp_path / "state_resume"),
        lambda df: first.extend(df.collect()),
        min_jaccard=MIN_J,
    )
    assert first  # the whole corpus in one batch finds the planted dups
    second: list = []
    run_incremental_neardup(
        spark,
        str(landing),
        str(tmp_path / "ckpt_resume"),
        str(tmp_path / "state_resume"),
        lambda df: second.extend(df.collect()),
        min_jaccard=MIN_J,
    )
    assert second == []


def test_partial_append_replay_converges(spark, tmp_path):
    """Crash-consistency: a batch whose crash appended SHINGLES but
    not BANDS must, on replay, reprocess the doc (absent from the
    bands-store processing fence) without duplicating its shingle
    rows (shingle-store append fence)."""
    from convoy_spark.operators.dedup import shingle_hashes
    from convoy_spark.streaming.neardup import apply_neardup_batch

    docs = spark.createDataFrame(
        [(1, "one two three four five six seven eight nine ten")],
        "doc_id long, text string",
    )
    state = str(tmp_path / "state_partial")
    # simulate the crashed first attempt: shingles written, bands not
    shingle_hashes(docs, 3).write.mode("append").parquet(
        f"{state}/shingles"
    )

    apply_neardup_batch(spark, docs, state, lambda df: df.collect())

    sh = spark.read.parquet(f"{state}/shingles")
    bands = spark.read.parquet(f"{state}/bands")
    dup = sh.groupBy("doc_id", "h").count().filter("count > 1").count()
    assert dup == 0, "replay duplicated shingle rows"
    assert bands.filter("doc_id = 1").count() > 0  # bands healed


def test_partial_append_replay_pair_jaccard_exact(spark, tmp_path):
    """Crash-replay of a batch CONTAINING a candidate pair must re-emit
    the pair with the TRUE jaccard: the replayed docs' shingles are
    already in the store, and without excluding them from the history
    read the union double-counts them — inflating n_sh and n_common so
    the re-emitted jaccard is wrong and sink-side dedup (which keys on
    the deterministic pair values) breaks."""
    from convoy_spark.operators.dedup import shingle_hashes
    from convoy_spark.streaming.neardup import apply_neardup_batch

    text_a = "the quick brown fox jumps over the lazy dog again and again"
    docs = spark.createDataFrame(
        [(1, text_a), (2, text_a)],  # identical pair: true jaccard 1.0
        "doc_id long, text string",
    )

    # ground truth from a clean (no pre-crash state) run
    clean: list = []
    apply_neardup_batch(
        spark,
        docs,
        str(tmp_path / "state_clean"),
        lambda df: clean.extend(df.collect()),
    )
    want = {(r.doc_a, r.doc_b): round(r.jaccard, 9) for r in clean}
    assert want == {(1, 2): 1.0}

    # crashed first attempt: shingles persisted, bands not → replay
    state = str(tmp_path / "state_pair_partial")
    shingle_hashes(docs, 3).write.mode("append").parquet(f"{state}/shingles")
    got: list = []
    apply_neardup_batch(spark, docs, state, lambda df: got.extend(df.collect()))
    assert {(r.doc_a, r.doc_b): round(r.jaccard, 9) for r in got} == want


def test_bucketed_band_store_join_no_history_exchange(spark, tmp_path):
    """The point of the bucketed layout: the per-batch candidate join
    must read the band store WITHOUT re-shuffling it (exactly the join
    apply_neardup_batch performs — batch bands vs history on
    (band, key)). Broadcast is disabled so the small test store can't
    cheat its way past the assertion with a BHJ."""
    from convoy_spark.streaming.neardup import (
        BANDS_BUCKET,
        BANDS_SCHEMA,
        apply_neardup_batch,
    )
    from convoy_spark.streaming.util import load_store

    docs = load_table(spark, SF_DIR, "documents").select("doc_id", "text")
    state = str(tmp_path / "state_plan")
    apply_neardup_batch(
        spark, docs, state, lambda df: df.count(), layout="bucketed"
    )

    hist = load_store(
        spark, f"{state}/bands", BANDS_SCHEMA, bucket=BANDS_BUCKET
    )
    batch = spark.createDataFrame(
        [(999_999, 0, "x")], BANDS_SCHEMA
    ).withColumnsRenamed({"doc_id": "batch_id"})
    old_thresh = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    old_aqe = spark.conf.get("spark.sql.adaptive.enabled")
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        spark.conf.set("spark.sql.adaptive.enabled", "false")
        j = batch.join(hist, ["band", "key"])
        plan = j._jdf.queryExecution().executedPlan().toString()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old_thresh)
        spark.conf.set("spark.sql.adaptive.enabled", old_aqe)
    assert plan.count("Exchange") == 1, plan  # batch side only
    assert "Bucketed: true" in plan, plan
