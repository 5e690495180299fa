"""Streaming per-dimension embedding moments — the drift monitor a
continuously-embedded corpus runs: per micro-batch, fold each
dimension's (count, Σx, Σx²) into a persisted moments store; query
time derives mean/variance per dimension from the store alone.
Embedding-distribution drift (encoder swaps, corrupt batches,
collapsed dimensions) shows up here before it poisons ANN/PCA.

Exactness: sums accumulate as Σ⌊x·2⁴⁰⌋ in DECIMAL(38,0) — the PCA
module's scaled-long chain (operators/pca.py header): float32→double
is exact, power-of-two scaling is exact, floor is exact, and integer
sums are exact AND associative, so folding any chunking of the corpus
in any order yields BIT-IDENTICAL moments to one batch pass (tested),
and the derived mean/variance are single deterministic double
expressions over equal integers.

State layout: per-batch DELTA partitions (``deltas/batch-<epoch>``,
written with dynamic overwrite of that one path) rather than a
mutable running total — a replayed epoch (foreachBatch is
at-least-once, streaming/util.py contract) overwrites ITS OWN delta
idempotently instead of double-adding into a total. The store read
aggregates all deltas: dim-count × batches rows of integers, trivial
at any scale, and compactable offline by replacing deltas with their
sum (same schema).

100 TB posture: the per-batch delta is dim rows (one narrow
map-side-combined aggregation over the batch); the query-side
aggregation is over dim × batches rows. Nothing is ever re-scanned.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    FloatType,
    LongType,
    StructField,
    StructType,
)

from convoy_spark.operators.pca import PSCALE

EMB_STREAM_SCHEMA = StructType(
    [
        StructField("vec_id", LongType()),
        StructField("embedding", ArrayType(FloatType())),
    ]
)

MOMENTS_SCHEMA = "d int, n long, s decimal(38,0), s2 decimal(38,0)"


def _dim_deltas(vectors: DataFrame, vec_col: str = "embedding") -> DataFrame:
    """(d, n, s, s2) — one row per dimension of exact scaled-long
    partial sums over ``vectors``."""
    ex = vectors.select(
        F.posexplode(F.col(vec_col)).alias("d", "x")
    ).withColumn("x", F.col("x").cast("double"))
    q = F.floor(F.col("x") * F.lit(float(PSCALE))).cast("decimal(38,0)")
    q2 = F.floor(F.col("x") * F.col("x") * F.lit(float(PSCALE))).cast(
        "decimal(38,0)"
    )
    return ex.groupBy("d").agg(
        F.count("*").alias("n"),
        F.sum(q).alias("s"),
        F.sum(q2).alias("s2"),
    )


def apply_embstats_batch(
    batch: DataFrame,
    state_dir: str,
    batch_tag: str,
) -> None:
    """Fold one micro-batch of (vec_id, embedding): write its
    per-dimension delta to the batch's own partition (idempotent
    under replay — the replayed batch overwrites itself).
    ``batch_tag`` must be unique per logical batch ACROSS drains —
    the runner namespaces the epoch id by a checkpoint-dir hash,
    since Structured Streaming restarts epoch numbering per
    checkpoint and two drains sharing a state dir would otherwise
    overwrite each other's batch-0."""
    path = os.path.join(state_dir, "deltas", f"batch-{batch_tag}")
    _dim_deltas(batch).write.mode("overwrite").parquet(path)


def run_incremental_embstats(
    spark: SparkSession,
    landing_dir: str,
    checkpoint_dir: str,
    state_dir: str,
) -> None:
    """Drain all embedding files present into the moments store; stop
    when caught up. Re-running with the same checkpoint processes
    only new files."""
    # Not streaming/util.py::drain: that helper hardcodes the
    # (doc_id, text) document source and drops the epoch id, both of
    # which this store needs differently (embedding schema; epoch-
    # tagged delta paths).
    stream = (
        spark.readStream.schema(EMB_STREAM_SCHEMA)
        .option("pathGlobFilter", "*.parquet")
        .parquet(landing_dir)
    )
    import hashlib

    ck_tag = hashlib.blake2s(
        os.path.abspath(checkpoint_dir).encode(), digest_size=8
    ).hexdigest()
    q = (
        stream.writeStream.foreachBatch(
            lambda b, eid: apply_embstats_batch(
                b, state_dir, f"{ck_tag}-{eid}"
            )
        )
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def _moments_from_sums(agg: DataFrame) -> DataFrame:
    scale = float(PSCALE)
    mean = (F.col("s").cast("double") / F.lit(scale)) / F.col("n")
    ex2 = (F.col("s2").cast("double") / F.lit(scale)) / F.col("n")
    return agg.select(
        "d",
        "n",
        mean.alias("mean"),
        (ex2 - mean * mean).alias("variance"),
    )


def embedding_moments(spark: SparkSession, state_dir: str) -> DataFrame:
    """(d, n, mean, variance) from the persisted delta store alone;
    an absent store (fresh deployment, state wipe) yields zero rows,
    the same guard as streaming/util.py::load_store."""
    path = os.path.join(state_dir, "deltas")
    if not os.path.isdir(path):
        deltas = spark.createDataFrame([], MOMENTS_SCHEMA)
    else:
        deltas = (
            spark.read.option("recursiveFileLookup", "true")
            .schema(MOMENTS_SCHEMA)
            .parquet(path)
        )
    return _moments_from_sums(
        deltas.groupBy("d").agg(
            F.sum("n").alias("n"),
            F.sum("s").cast("decimal(38,0)").alias("s"),
            F.sum("s2").cast("decimal(38,0)").alias("s2"),
        )
    )


def batch_moments(vectors: DataFrame, vec_col: str = "embedding") -> DataFrame:
    """The one-pass batch twin of :func:`embedding_moments` — same
    exact integer sums, so stream == batch bit-for-bit."""
    return _moments_from_sums(_dim_deltas(vectors, vec_col))


__all__ = [
    "EMB_STREAM_SCHEMA",
    "MOMENTS_SCHEMA",
    "apply_embstats_batch",
    "batch_moments",
    "embedding_moments",
    "run_incremental_embstats",
]
