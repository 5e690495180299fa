"""Streaming decontamination: any chunking of the train corpus in any
delivery order yields funnel rows bit-identical to the one-pass batch
twin (per-doc verdicts are pure functions of doc + frozen eval
filter); replay overwrites its own delta; a planted verbatim 13-gram
overlap is flagged contaminated and a disjoint doc is not."""

from __future__ import annotations

from pyspark.sql import functions as F

from convoy_spark.streaming.decontam import (
    apply_decontam_batch,
    batch_funnel,
    decontam_funnel,
    freeze_eval_filter,
    run_incremental_decontam,
)

SF_DIR = "/root/testdata/sf0.001"


def _docs(spark):
    return spark.read.parquet(f"{SF_DIR}/documents.parquet").select(
        "doc_id", "text"
    )


def _state(spark, tmp_path, name):
    docs = _docs(spark)
    state = str(tmp_path / name)
    # eval suite = doc_id % 10 == 0; train corpus = the rest
    freeze_eval_filter(docs.filter("doc_id % 10 = 0"), state)
    return docs.filter("doc_id % 10 <> 0"), state


def _rows(df):
    return sorted(
        (r.train_doc, r.n_grams, r.n_bloom_candidates, r.n_true_hits,
         r.contaminated)
        for r in df.collect()
    )


def test_stream_funnel_equals_batch_bitwise(spark, tmp_path):
    train, state = _state(spark, tmp_path, "state_eq")
    want = _rows(batch_funnel(spark, train, state))
    assert want, "no train docs produced grams?"
    landing = tmp_path / "landing"
    landing.mkdir()
    for i, (lo, hi) in enumerate([(60, 10**9), (0, 25), (25, 60)]):
        chunk = train.filter(
            (F.col("doc_id") >= lo) & (F.col("doc_id") < hi)
        )
        chunk.coalesce(1).write.mode("overwrite").parquet(
            str(landing / f"chunk{i}")
        )
        run_incremental_decontam(
            spark,
            str(landing / f"chunk{i}"),
            str(tmp_path / f"ckpt{i}"),
            state,
        )
    assert _rows(decontam_funnel(spark, state)) == want


def test_batch_replay_is_idempotent(spark, tmp_path):
    train, state = _state(spark, tmp_path, "state_rp")
    b0 = train.filter("doc_id < 50")
    b1 = train.filter("doc_id >= 50")
    apply_decontam_batch(spark, b0, state, "t-0")
    apply_decontam_batch(spark, b1, state, "t-1")
    before = _rows(decontam_funnel(spark, state))
    apply_decontam_batch(spark, b0, state, "t-0")  # replay
    assert _rows(decontam_funnel(spark, state)) == before


def test_planted_overlap_flagged(spark, tmp_path):
    words = [f"w{i}" for i in range(26)]
    shared = " ".join(words[:13])
    ev = spark.createDataFrame(
        [(100, shared), (101, " ".join(f"e{i}" for i in range(20)))],
        ["doc_id", "text"],
    )
    state = str(tmp_path / "state_pl")
    freeze_eval_filter(ev, state)
    train = spark.createDataFrame(
        [
            (1, shared + " " + " ".join(words[13:26])),  # contaminated
            (2, " ".join(f"x{i}" for i in range(20))),  # clean
            (3, "short doc"),  # no grams
        ],
        ["doc_id", "text"],
    )
    apply_decontam_batch(spark, train, state, "t-0")
    got = {r.train_doc: r for r in decontam_funnel(spark, state).collect()}
    assert set(got) == {1, 2}
    assert got[1].contaminated and got[1].n_true_hits == 1
    assert not got[2].contaminated and got[2].n_true_hits == 0
    assert all(
        r.n_true_hits <= r.n_bloom_candidates <= r.n_grams
        for r in got.values()
    )
