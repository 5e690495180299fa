"""Shared helpers for the incremental streaming stores.

Crash-consistency contract (applies to every store module here):
``foreachBatch`` gives AT-LEAST-ONCE execution of the batch function —
the checkpoint fences re-processing of already-committed files, but a
crash mid-batch replays the whole batch on restart. Therefore each
module (a) fences every store APPEND on that same store's own
doc-membership (a replay re-appends only what its crash lost — stores
converge to exactly one row-set per doc no matter where the crash
landed), and (b) documents its pair/result emission as at-least-once
under mid-batch crash (exactly-once per delivered FILE in normal
operation); sinks that need stronger semantics deduplicate on the
emitted key, which every emitter here makes deterministic.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession


def load_store(spark: SparkSession, path: str, schema: str) -> DataFrame:
    """Read a persisted parquet store, or an empty typed frame if the
    store does not exist yet."""
    if os.path.isdir(path):
        return spark.read.parquet(path)
    return spark.createDataFrame([], schema)


def drain(
    spark: SparkSession,
    landing_dir: str,
    checkpoint_dir: str,
    batch_fn,
) -> None:
    """Drain all document files present through ``batch_fn(batch_df)``;
    stop when caught up. Re-running with the same checkpoint processes
    only new files."""
    from convoy_spark.streaming.dedup import stream_docs

    q = (
        stream_docs(spark, landing_dir)
        .writeStream.foreachBatch(lambda b, _id: batch_fn(b))
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


__all__ = ["drain", "load_store"]
