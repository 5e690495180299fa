"""Per-(session, sf_dir) materialized-frame cache used by the query
families that share one expensive build (the tree descendant-pair
frame, the verified LSH pair graph).

Eviction is by applicationId: entries from STOPPED sessions hold
localCheckpointed DataFrames whose blocks are gone, so on every miss
we drop every entry whose applicationId differs from the live
session's — the current session's frames are never evicted (they are
exactly the ones amortizing the build), and nothing from a dead
session outlives the first build in a new one.
"""

from __future__ import annotations

from typing import Callable

from pyspark.sql import DataFrame, SparkSession


def session_cached(
    cache: dict[tuple[str, str], DataFrame],
    spark: SparkSession,
    sf_dir: str,
    build: Callable[[], DataFrame],
) -> DataFrame:
    app = spark.sparkContext.applicationId
    key = (app, sf_dir)
    df = cache.get(key)
    if df is None:
        for stale in [k for k in cache if k[0] != app]:
            del cache[stale]
        df = build().localCheckpoint()
        cache[key] = df
    return df


def session_cached_obj(
    cache: dict,
    spark: SparkSession,
    sf_dir: str,
    build: Callable[[], object],
) -> object:
    """session_cached for builds that return a TUPLE of frames (the
    PQ/IVF index builds: codebook + codes + exploded). The build is
    responsible for checkpointing its own frames (pq_codebooks /
    ivf_index already do); this cache only pins the tuple per
    (applicationId, sf_dir) with the same stale-session eviction."""
    app = spark.sparkContext.applicationId
    key = (app, sf_dir)
    val = cache.get(key)
    if val is None:
        for stale in [k for k in cache if k[0] != app]:
            del cache[stale]
        val = build()
        cache[key] = val
    return val


__all__ = ["session_cached", "session_cached_obj"]
