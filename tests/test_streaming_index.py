"""Streaming inverted index: incremental builds (any chunking, any
order) must yield BM25 results identical to the batch multi-query
operator over the full corpus; re-delivery is idempotent; checkpoint
resume adds nothing."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from convoy_spark.operators.textops import bm25_search_multi
from convoy_spark.streaming.index import (
    bm25_over_index,
    run_incremental_index,
)
from convoy_spark.tables import load_table

SF_DIR = "/root/testdata/sf0.001"
QUERIES = [
    (0, "spark"), (0, "stream"), (0, "vector"),
    (1, "data"), (1, "query"),
]


def _qdf(spark):
    return spark.createDataFrame(QUERIES, "query_id long, term string")


def _want(spark):
    docs = load_table(spark, SF_DIR, "documents").select("doc_id", "text")
    return sorted(
        (r.query_id, r.doc_id, r.score, r.n_hit_terms)
        for r in bm25_search_multi(docs, _qdf(spark), top_k=20).collect()
    )


def _build_index(spark, tmp_path, chunks, tag, layout="plain"):
    landing = tmp_path / f"landing_{tag}"
    landing.mkdir()
    docs = load_table(spark, SF_DIR, "documents").select("doc_id", "text")
    for i, (lo, hi) in enumerate(chunks):
        chunk = docs.filter(
            (F.col("doc_id") >= lo) & (F.col("doc_id") < hi)
        )
        chunk.coalesce(1).write.mode("overwrite").parquet(
            str(landing / f"chunk{i}")
        )
        run_incremental_index(
            spark,
            str(landing / f"chunk{i}"),
            str(tmp_path / f"ckpt_{tag}_{i}"),
            str(tmp_path / f"state_{tag}"),
            layout=layout,
        )
    return str(tmp_path / f"state_{tag}")


def _got(spark, state, layout="plain"):
    return sorted(
        (r.query_id, r.doc_id, r.score, r.n_hit_terms)
        for r in bm25_over_index(
            spark, state, _qdf(spark), top_k=20, layout=layout
        ).collect()
    )


# Both store layouts run the index==corpus suite (round-6 verdict #6).
LAYOUTS = ["plain", "bucketed"]


@pytest.mark.parametrize("layout", LAYOUTS)
def test_incremental_index_bm25_equals_corpus(spark, tmp_path, layout):
    want = _want(spark)
    assert want, "no query terms in the corpus at this SF?"
    state = _build_index(
        spark, tmp_path, [(0, 25), (25, 60), (60, 10_000)],
        f"fwd_{layout}", layout=layout,
    )
    assert _got(spark, state, layout=layout) == want


@pytest.mark.parametrize("layout", LAYOUTS)
def test_out_of_order_and_redelivery_idempotent(spark, tmp_path, layout):
    """Later chunk re-delivers earlier ids (overlap [10, 40)): the
    anti-join keeps the index single-copy, so scores still equal the
    batch corpus run."""
    want = _want(spark)
    state = _build_index(
        spark, tmp_path, [(10, 10_000), (0, 40)],
        f"redeliver_{layout}", layout=layout,
    )
    assert _got(spark, state, layout=layout) == want


def test_checkpoint_resume_adds_nothing(spark, tmp_path):
    docs = load_table(spark, SF_DIR, "documents").select("doc_id", "text")
    landing = tmp_path / "landing_resume"
    docs.coalesce(1).write.mode("overwrite").parquet(str(landing))
    for _ in range(2):  # second drain must be a no-op
        run_incremental_index(
            spark,
            str(landing),
            str(tmp_path / "ckpt_resume"),
            str(tmp_path / "state_resume"),
        )
    n = spark.read.parquet(str(tmp_path / "state_resume" / "doclens")).count()
    assert n == docs.count()


def test_partial_append_replay_converges(spark, tmp_path):
    """Crash-consistency: a batch whose crash appended POSTINGS but
    not DOCLENS must, on replay, fill only the missing store — both
    stores end with exactly one copy per doc (per-store fences)."""
    from convoy_spark.streaming.index import apply_index_batch

    docs = spark.createDataFrame(
        [(1, "alpha beta alpha"), (2, "beta gamma")],
        "doc_id long, text string",
    )
    state = str(tmp_path / "state_partial")
    # simulate the crashed first attempt: postings written, doclens not
    from convoy_spark.operators.dedup import doc_tokens
    from pyspark.sql import functions as F

    tk = doc_tokens(docs)
    tk.groupBy("token", "doc_id").agg(
        F.count("*").cast("long").alias("tf")
    ).write.mode("append").parquet(f"{state}/postings")

    # the replay
    apply_index_batch(spark, docs, state)

    postings = spark.read.parquet(f"{state}/postings")
    doclens = spark.read.parquet(f"{state}/doclens")
    dup = (
        postings.groupBy("token", "doc_id").count().filter("count > 1").count()
    )
    assert dup == 0, "replay duplicated posting rows"
    assert doclens.count() == 2  # both docs gained their length row
    assert {r.doc_id for r in doclens.collect()} == {1, 2}


def test_bucketed_postings_store_scan_no_exchange(spark, tmp_path):
    """The bucketed postings store must enter the plan as a bucketed
    scan (no store-side exchange into the tf aggregation); score
    equality over both layouts is covered by the parametrized suite
    above."""
    from convoy_spark.streaming.index import (
        POSTINGS_BUCKET,
        POSTINGS_SCHEMA,
    )
    from convoy_spark.streaming.util import load_store

    state = _build_index(
        spark, tmp_path, [(0, 30), (30, 10_000)], "bkt", layout="bucketed"
    )
    # the store read carries the bucket layout into the plan
    postings = load_store(
        spark, f"{state}/postings", POSTINGS_SCHEMA, bucket=POSTINGS_BUCKET
    )
    agg = postings.groupBy("token").count()
    plan = agg._jdf.queryExecution().executedPlan().toString()
    assert "Bucketed: true" in plan, plan
    assert "Exchange" not in plan, plan  # agg keyed on the bucket key
