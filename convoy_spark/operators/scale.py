"""Scale techniques (SURVEY §4, pyspark_guide): bucketed co-located
joins and salted skew aggregation — the two knobs that matter most
when a 100 TB join/groupBy key misbehaves.

- **Bucketing** pre-shuffles a table once at write time
  (``bucketBy(n, key)`` + ``saveAsTable``): every later equi-join or
  aggregation on that key reads co-located buckets and skips its
  exchange entirely. The warehouse's answer to the reference's
  clustered/covering indexes (`1_initial_load.py:184-185`) — pay the
  shuffle once, amortize it over every downstream query.
- **Salting** splits a skewed key across ``n_salts`` sub-keys for a
  partial aggregate, then merges the partials — two small shuffles
  instead of one stuck straggler task. AQE's skew-join handling
  covers joins automatically; salting is for the aggregation side,
  where AQE cannot split a single giant hash-agg group.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def widen_narrow_scan(df: DataFrame, min_partitions: int | None = None) -> DataFrame:
    """Round-robin repartition a DataFrame whose scan produces fewer
    partitions than the cluster has slots — and a no-op otherwise.

    Why this exists: parquet splits by row group, so a small table
    written as ONE file with ONE row group scans as ONE task no matter
    how many cores exist. Any CPU-heavy per-row stage downstream
    (tokenize/explode/hash pipelines over ``documents``) then runs
    single-threaded — at sf0.1 this was the dominant cost of winnow /
    simhash / lang-ID, hiding as "slope" (one 4 s task on a 32-core
    box). The guard makes it scale-safe: at 100 TB the scan already
    yields orders of magnitude more partitions than slots, the
    condition is false, and NO shuffle is added — this only ever
    trades one tiny-table shuffle for full parallelism on the
    compute-bound stage that follows.
    """
    spark = df.sparkSession
    n = min_partitions or spark.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() >= n:
        return df
    return df.repartition(n)


def write_bucketed(
    df: DataFrame,
    table: str,
    key: str,
    n_buckets: int = 8,
    path: str | None = None,
) -> None:
    """Materialize as a bucketed, bucket-sorted table (external when
    ``path`` is given — the warehouse dir is a static config)."""
    w = (
        df.write.mode("overwrite")
        .bucketBy(n_buckets, key)
        .sortBy(key)
        .format("parquet")
    )
    if path:
        w = w.option("path", path)
    w.saveAsTable(table)


def salted_agg(
    df: DataFrame,
    key: str,
    aggs: list[tuple[str, str]],
    n_salts: int = 16,
) -> DataFrame:
    """Two-phase salted aggregation: ``aggs`` is a list of
    (col, 'sum'|'count') specs — the decomposable aggregates, which
    are the only ones salting can merge exactly.

    Phase 1 groups on (key, salt) — the giant key's rows spread over
    ``n_salts`` tasks; phase 2 merges the per-salt partials on the key
    alone, now at most ``n_salts`` rows per key."""
    salt = (F.rand(seed=42) * n_salts).cast("int").alias("_salt")
    phase1_aggs = []
    phase2_aggs = []
    for col, kind in aggs:
        part = f"_p_{kind}_{col}"
        if kind == "sum":
            phase1_aggs.append(F.sum(col).alias(part))
            phase2_aggs.append(F.sum(part).alias(f"sum_{col}"))
        elif kind == "count":
            phase1_aggs.append(F.count(col).alias(part))
            phase2_aggs.append(F.sum(part).alias(f"count_{col}"))
        else:
            raise ValueError(f"non-decomposable agg: {kind}")
    partial = df.withColumn("_salt", salt).groupBy(key, "_salt").agg(*phase1_aggs)
    return partial.groupBy(key).agg(*phase2_aggs)


def explain_str(df: DataFrame) -> str:
    """Formatted physical plan as a string (for plan assertions)."""
    import contextlib
    import io

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()
