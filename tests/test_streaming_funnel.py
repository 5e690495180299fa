"""Streaming funnel == batch funnel: draining an in-order chunking of
the corpus must keep exactly the batch pipeline's surviving train
documents."""

from __future__ import annotations

from pyspark.sql import functions as F

from convoy_spark.operators.dedup import exact_dedup_map
from convoy_spark.operators.textops import repetition_signals, text_quality
from convoy_spark.queries.dedup import _split_col
from convoy_spark.queries.funnel import FUNNEL_LANG
from convoy_spark.streaming.funnel import run_streaming_funnel
from convoy_spark.tables import load_table

SF_DIR = "/root/testdata/sf0.001"


def _batch_survivors(spark) -> set[int]:
    docs = load_table(spark, SF_DIR, "documents")
    q = text_quality(docs).select(
        "doc_id", F.col("passes_filter").alias("q_ok")
    )
    r = repetition_signals(docs).select(
        "doc_id", F.col("passes_repetition_filter").alias("r_ok")
    )
    dd = exact_dedup_map(docs).select(
        "doc_id",
        (F.col("doc_id") == F.col("canonical_id")).alias("is_canonical"),
    )
    surv = (
        docs.select("doc_id", "lang", _split_col().alias("split"))
        .join(q, "doc_id", "left")
        .join(r, "doc_id", "left")
        .join(dd, "doc_id", "left")
        .filter(
            F.coalesce("q_ok", F.lit(False))
            & F.coalesce("r_ok", F.lit(False))
            & (F.col("lang") == FUNNEL_LANG)
            & F.coalesce("is_canonical", F.lit(False))
            & (F.col("split") == "train")
        )
    )
    return {r.doc_id for r in surv.select("doc_id").collect()}


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
