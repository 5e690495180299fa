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

import hashlib
import os

from pyspark.sql import DataFrame, SparkSession

# Default bucket count for the bucketed store layout. Local testing
# value; on a cluster size it so each bucket's history fits one task
# comfortably (buckets are FIXED for a store's lifetime — appends must
# match the spec the store was created with).
STORE_BUCKETS = 8


def _bucket_table_name(path: str) -> str:
    """Deterministic catalog name for a bucketed store at ``path`` —
    bucketing metadata lives in the session catalog (a plain parquet
    path read loses the bucket spec), so every store path gets a
    stable table identity derived from its absolute location."""
    h = hashlib.md5(os.path.abspath(path).encode()).hexdigest()[:12]
    return f"convoy_store_{h}"


def _ddl_columns(spark: SparkSession, schema: str) -> str:
    fields = spark.createDataFrame([], schema).schema.fields
    return ", ".join(f"`{f.name}` {f.dataType.simpleString()}" for f in fields)


def _register_bucketed(
    spark: SparkSession,
    path: str,
    schema: str,
    keys: tuple[str, ...],
    n_buckets: int,
) -> str:
    """Ensure the catalog knows ``path`` as an external bucketed table
    (idempotent). Needed on session restart: the files carry the
    bucket layout but only the catalog entry tells Catalyst about it."""
    name = _bucket_table_name(path)
    if not spark.catalog.tableExists(name):
        key_list = ", ".join(f"`{k}`" for k in keys)
        spark.sql(
            f"CREATE TABLE {name} ({_ddl_columns(spark, schema)}) "
            f"USING parquet CLUSTERED BY ({key_list}) "
            f"SORTED BY ({key_list}) INTO {n_buckets} BUCKETS "
            f"LOCATION '{os.path.abspath(path)}'"
        )
    return name


def load_store(
    spark: SparkSession,
    path: str,
    schema: str,
    bucket: tuple[str, ...] | None = None,
) -> DataFrame:
    """Read a persisted store, or an empty typed frame if the store
    does not exist yet. With ``bucket`` (the store's bucket-key
    columns), the read goes through the catalog so Catalyst sees the
    HashPartitioning the files were written with — history-side joins
    keyed on those columns then run WITHOUT re-shuffling the store
    (the 100 TB layout every store module's docstring promises; plain
    parquet reads re-shuffle history every batch)."""
    if bucket is not None:
        name = _bucket_table_name(path)
        if spark.catalog.tableExists(name) or os.path.isdir(path):
            name = _register_bucketed(
                spark, path, schema, bucket, STORE_BUCKETS
            )
            # Catalog tables cache their file listing per session; an
            # append from the streaming thread does not reliably
            # invalidate a listing this thread already holds, and a
            # STALE read here is not just wrong results — these reads
            # are the crash-consistency FENCES (a fence that misses
            # committed rows re-appends them). Refresh is metadata-only
            # (re-list on next scan), paid once per batch.
            spark.catalog.refreshTable(name)
            return spark.table(name)
        return spark.createDataFrame([], schema)
    if os.path.isdir(path):
        return spark.read.parquet(path)
    return spark.createDataFrame([], schema)


def append_store(
    df: DataFrame,
    path: str,
    schema: str,
    bucket: tuple[str, ...] | None = None,
) -> None:
    """Append a batch's rows to a store in the chosen layout: plain
    parquet (default), or bucketed-by-``bucket`` via the catalog —
    every append re-clusters ONLY the batch's own rows (O(batch)
    shuffle into the fixed bucket count); history files are never
    rewritten, so the append stays O(batch) forever."""
    if bucket is None:
        df.write.mode("append").parquet(path)
        return
    spark = df.sparkSession
    name = _register_bucketed(spark, path, schema, bucket, STORE_BUCKETS)
    (
        df.write.mode("append")
        .format("parquet")
        .bucketBy(STORE_BUCKETS, *bucket)
        .sortBy(*bucket)
        .option("path", os.path.abspath(path))
        .saveAsTable(name)
    )


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


__all__ = ["STORE_BUCKETS", "append_store", "drain", "load_store"]
