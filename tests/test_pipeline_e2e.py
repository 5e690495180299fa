"""End-to-end curation pipeline: the catalog's operators compose into
the full corpus → training-shards path a pretraining pipeline runs —
heuristic funnel → model-based filter → span-level rewrite dedup →
target-mixture sampling → sequence packing → shard assignment — as
ONE chain of DataFrame transforms (no orchestration glue, no
intermediate materialization), with conservation and determinism
asserted at every stage boundary."""

from __future__ import annotations

from pyspark.sql import functions as F

from convoy_spark.operators.dedup import span_dedup
from convoy_spark.operators.loader import (
    mixture_sample,
    pack_sequences,
    shard_assignment,
)
from convoy_spark.operators.textops import model_quality_score
from convoy_spark.queries.funnel import funnel_flags
from convoy_spark.tables import load_table

SF_DIR = "/root/testdata/sf0.001"
TARGETS = {"src1": 0.5, "src3": 0.3, "src7": 0.2}


def test_full_curation_pipeline_composes(spark):
    docs = load_table(spark, SF_DIR, "documents")
    n_docs = docs.count()

    # stage 1-2: heuristic funnel survivors ∩ model-filter keeps
    ff = funnel_flags(docs).select("doc_id", F.col("c4").alias("heur_ok"))
    mf = model_quality_score(docs).select("doc_id", "model_keep")
    kept = (
        docs.join(ff, "doc_id")
        .join(mf, "doc_id")
        .filter(F.col("heur_ok") & F.col("model_keep"))
    )
    n_kept = kept.count()
    assert 0 < n_kept < n_docs  # both filters actually bite

    # stage 3: span-level rewrite dedup over the survivors
    clean = span_dedup(kept).withColumnRenamed("clean_text", "text")
    assert clean.count() == n_kept  # a rewrite, not a row filter
    # rejoin domain for the mixture stage
    clean = clean.join(docs.select("doc_id", "source"), "doc_id")

    # stage 4: target-mixture sampling of the cleaned survivors
    mix = mixture_sample(clean, TARGETS)
    sampled_ids = mix.filter("sampled").select("doc_id")
    n_sampled = sampled_ids.count()
    assert 0 < n_sampled <= n_kept
    sample = clean.join(sampled_ids, "doc_id")

    # stage 5-6: pack the sampled stream, assign training shards
    packed = pack_sequences(sample, seq_len=256)
    assert packed.count() == n_sampled
    total_tokens = packed.agg(F.sum("n_tokens")).first()[0]
    # offsets tile the sampled stream exactly
    assert (
        packed.agg(F.max(F.col("start_offset") + F.col("n_tokens"))).first()[0]
        == total_tokens
    )
    shards = shard_assignment(sample, epoch=1, shard_tokens=1024)
    assert shards.count() == n_sampled
    assert shards.agg(F.sum("n_tokens")).first()[0] == total_tokens

    # the whole chain is deterministic: rerun equals rerun, bitwise
    again = shard_assignment(
        clean.join(
            mixture_sample(clean, TARGETS).filter("sampled").select("doc_id"),
            "doc_id",
        ),
        epoch=1,
        shard_tokens=1024,
    )
    a = sorted(map(tuple, shards.collect()))
    b = sorted(map(tuple, again.collect()))
    assert a == b
