"""Streaming incremental inverted index + BM25 over the persisted
index — the retrieval analog of the dedup state stores
(`streaming/dedup.py`, `streaming/neardup.py`, `streaming/
substrdup.py`): a crawl pipeline that wants ranked retrieval cannot
re-tokenize the corpus per query, so each micro-batch folds its
postings into a persisted index and queries run against the INDEX
alone.

State: two persisted, append-only keyed stores

- ``postings``: (token, doc_id, tf) — term frequencies per doc;
- ``doclens``: (doc_id, dl) — per-doc token counts (the BM25 length
  normalizer).

Per micro-batch: tokenize the batch (O(batch)), aggregate its
(doc, token) term frequencies and doc lengths, append both. Docs
already indexed are dropped first (first-crawl-wins, as in every
other store here). Nothing is re-read at ingest time — ingest cost
is O(batch).

Query time: :func:`bm25_over_index` computes the same scores as
``operators/textops.py::bm25_search_multi`` run over the full corpus
— df from the postings of the query vocabulary only (the token-keyed
store makes this a pushed-down key filter, never a corpus scan),
N/avgdl from the doclens store, decimal-exact per-(query, doc) sums,
per-query row_number top-k — and is tested index==corpus equal.

100 TB posture: plain parquet here; on a cluster the postings store
is written partitioned/bucketed BY TOKEN (so a query's posting lists
are a few partition reads — the distributed restatement of an
inverted index's seek) and doclens bucketed by doc_id. The dataflow
is unchanged by the layout swap, same position as the other stores.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from convoy_spark.operators.dedup import doc_tokens
from convoy_spark.streaming.dedup import stream_docs

POSTINGS_SCHEMA = "token string, doc_id long, tf long"
DOCLENS_SCHEMA = "doc_id long, dl long"


def _load(spark: SparkSession, path: str, schema: str) -> DataFrame:
    if os.path.isdir(path):
        return spark.read.parquet(path)
    return spark.createDataFrame([], schema)


def apply_index_batch(
    spark: SparkSession,
    batch: DataFrame,
    state_dir: str,
) -> None:
    """Fold one micro-batch of (doc_id, text) into the index stores."""
    postings_path = os.path.join(state_dir, "postings")
    doclens_path = os.path.join(state_dir, "doclens")

    seen = _load(spark, doclens_path, DOCLENS_SCHEMA).select("doc_id")
    batch = batch.join(seen, "doc_id", "left_anti")

    tk = doc_tokens(batch).localCheckpoint()
    tf = (
        tk.groupBy("token", "doc_id")
        .agg(F.count("*").cast("long").alias("tf"))
    )
    dl = tk.groupBy("doc_id").agg(F.count("*").cast("long").alias("dl"))
    tf.write.mode("append").parquet(postings_path)
    dl.write.mode("append").parquet(doclens_path)


def run_incremental_index(
    spark: SparkSession,
    landing_dir: str,
    checkpoint_dir: str,
    state_dir: str,
) -> None:
    """Drain all document files present into the index stores; stop
    when caught up. Re-running with the same checkpoint processes
    only new files."""
    docs = stream_docs(spark, landing_dir)
    q = (
        docs.writeStream.foreachBatch(
            lambda b, _id: apply_index_batch(spark, b, state_dir)
        )
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def bm25_over_index(
    spark: SparkSession,
    state_dir: str,
    queries: DataFrame,
    top_k: int = 20,
    k1: float = 1.2,
    b: float = 0.75,
) -> DataFrame:
    """(query_id, doc_id, score, n_hit_terms) — BM25 top-k per query
    computed from the persisted index ALONE; same scoring chain as
    ``bm25_search_multi`` over the corpus (rational idf, decimal-exact
    sums), tested equal."""
    from pyspark.sql import Window

    from convoy_spark.functions.numeric import dsum

    postings = _load(
        spark, os.path.join(state_dir, "postings"), POSTINGS_SCHEMA
    )
    doclens = _load(spark, os.path.join(state_dir, "doclens"), DOCLENS_SCHEMA)

    q = queries.select(
        "query_id", F.lower(F.col("term")).alias("token")
    ).distinct()
    vocab = q.select("token").distinct()
    tf = postings.join(F.broadcast(vocab), "token", "left_semi")
    stats = doclens.agg(
        F.count("*").alias("n_docs"), F.sum("dl").alias("total_len")
    )
    dl_p = doclens.join(tf.select("doc_id").distinct(), "doc_id", "left_semi")
    df_tbl = tf.groupBy("token").agg(F.count("*").alias("df"))
    scored = (
        tf.join(F.broadcast(df_tbl), "token")
        .join(dl_p, "doc_id")
        .join(F.broadcast(stats))
        .withColumn(
            "_idf",
            (F.col("n_docs") - F.col("df") + F.lit(0.5))
            / (F.col("df") + F.lit(0.5)),
        )
        .withColumn(
            "_norm",
            F.col("tf").cast("double") * (1.0 + k1)
            / (
                F.col("tf").cast("double")
                + k1
                * (
                    1.0
                    - b
                    + b
                    * (
                        F.col("dl").cast("double")
                        * F.col("n_docs").cast("double")
                        / F.col("total_len").cast("double")
                    )
                )
            ),
        )
    )
    per_query = (
        scored.join(F.broadcast(q), "token")
        .groupBy("query_id", "doc_id")
        .agg(
            dsum(F.col("_idf") * F.col("_norm")).alias("score"),
            F.count("*").cast("long").alias("n_hit_terms"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("score").desc(), F.col("doc_id").asc()
    )
    return (
        per_query.withColumn("_rk", F.row_number().over(w))
        .filter(F.col("_rk") <= top_k)
        .select("query_id", "doc_id", "score", "n_hit_terms")
    )


__all__ = [
    "DOCLENS_SCHEMA",
    "POSTINGS_SCHEMA",
    "apply_index_batch",
    "bm25_over_index",
    "run_incremental_index",
]
