"""Delta-store compaction: derived quantities are BIT-IDENTICAL
before and after (integer/decimal partial sums are associative), the
store shrinks to one partition, and further batches fold on top of the
compacted state correctly."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from convoy_spark.streaming.compact import (
    compact_embstats,
    compact_mixture_counts,
)
from convoy_spark.streaming.embstats import (
    apply_embstats_batch,
    batch_moments,
    embedding_moments,
)
from convoy_spark.streaming.mixture import apply_mixture_batch, mixture_decisions
from convoy_spark.tables import load_table

SF_DIR = "/root/testdata/sf0.001"
TARGETS = {"src1": 0.5, "src3": 0.3, "src7": 0.2}


def _emb(spark):
    return spark.read.parquet(f"{SF_DIR}/embeddings.parquet").select(
        "vec_id", "embedding"
    )


def test_embstats_compaction_preserves_moments_bitwise(spark, tmp_path):
    emb = _emb(spark)
    state = str(tmp_path / "state")
    for i, (lo, hi) in enumerate([(0, 100), (100, 250), (250, 10**9)]):
        apply_embstats_batch(
            emb.filter(
                (F.col("vec_id") >= lo) & (F.col("vec_id") < hi)
            ),
            state,
            batch_tag=f"t-{i}",
        )
    before = sorted(map(tuple, embedding_moments(spark, state).collect()))
    replaced = compact_embstats(spark, state)
    assert replaced > 0
    after = sorted(map(tuple, embedding_moments(spark, state).collect()))
    assert after == before  # exact sums: bitwise equal
    # one partition remains
    assert os.listdir(str(tmp_path / "state/deltas")) == ["batch-compacted"]
    # a post-compaction batch folds on top: equals the full batch pass
    # ... of everything (moments over the whole table)
    apply_embstats_batch(emb.filter("vec_id < 0"), state, batch_tag="t-x")
    whole = sorted(map(tuple, batch_moments(emb).collect()))
    assert sorted(map(tuple, embedding_moments(spark, state).collect())) == whole


def test_mixture_counts_compaction_preserves_rates(spark, tmp_path):
    docs = load_table(spark, SF_DIR, "documents").select("doc_id", "source")
    state = str(tmp_path / "state")
    apply_mixture_batch(docs.filter("doc_id < 200"), state, "t-0", TARGETS)
    apply_mixture_batch(
        docs.filter("doc_id >= 200 and doc_id < 350"), state, "t-1", TARGETS
    )
    replaced = compact_mixture_counts(spark, state)
    assert replaced > 0
    # decisions manifest untouched by compaction
    n_before = mixture_decisions(spark, state).count()
    assert n_before == 350
    # the next batch's rates derive from the compacted cumulative
    # counts — identical to an uncompacted twin
    state2 = str(tmp_path / "state2")
    apply_mixture_batch(docs.filter("doc_id < 200"), state2, "t-0", TARGETS)
    apply_mixture_batch(
        docs.filter("doc_id >= 200 and doc_id < 350"), state2, "t-1", TARGETS
    )
    apply_mixture_batch(docs.filter("doc_id >= 350"), state, "t-2", TARGETS)
    apply_mixture_batch(docs.filter("doc_id >= 350"), state2, "t-2", TARGETS)
    a = sorted(
        map(tuple, mixture_decisions(spark, state).drop("batch_tag").collect())
    )
    b = sorted(
        map(tuple, mixture_decisions(spark, state2).drop("batch_tag").collect())
    )
    assert a == b
