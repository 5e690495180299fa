"""Streaming funnel == batch funnel: draining an in-order chunking of
the corpus must keep exactly the batch pipeline's surviving train
documents."""

from __future__ import annotations

from pyspark.sql import functions as F

from convoy_spark.queries.funnel import funnel_flags
from convoy_spark.streaming.funnel import run_streaming_funnel
from convoy_spark.tables import load_table

SF_DIR = "/root/testdata/sf0.001"


def _batch_survivors(spark) -> set[int]:
    # Derived from the SAME funnel_flags the batch corpus_funnel query
    # aggregates — drift in the stage semantics breaks this test, not
    # just the hash oracle.
    docs = load_table(spark, SF_DIR, "documents")
    surv = funnel_flags(docs).filter(F.col("c5")).select("doc_id")
    return {r.doc_id for r in surv.collect()}


def test_streaming_funnel_equals_batch(spark, tmp_path):
    want = _batch_survivors(spark)
    assert want, "funnel keeps nothing at this SF — thresholds drifted?"

    docs = load_table(spark, SF_DIR, "documents").select(
        "doc_id", "text", "lang"
    )
    kept: set[int] = set()

    def sink(df):
        for row in df.collect():
            assert row.doc_id not in kept, "doc emitted twice"
            kept.add(row.doc_id)

    # in-order chunks: the dedup stage's min-id canonical == batch
    for i, (lo, hi) in enumerate([(0, 15), (15, 40), (40, 10_000)]):
        chunk = docs.filter(
            (F.col("doc_id") >= lo) & (F.col("doc_id") < hi)
        )
        chunk.coalesce(1).write.mode("overwrite").parquet(
            str(tmp_path / f"chunk{i}")
        )
        run_streaming_funnel(
            spark,
            str(tmp_path / f"chunk{i}"),
            str(tmp_path / f"ckpt{i}"),
            str(tmp_path / "seen"),
            sink,
        )
    assert kept == want
