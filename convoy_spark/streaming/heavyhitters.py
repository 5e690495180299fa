"""Streaming ε-heavy-hitters — the online form of
``operators/heavyhitters.py``: as document batches arrive, fold each
batch through per-partition Misra-Gries summaries and persist them as
immutable per-batch delta partitions; the heavy-hitter view merges the
summaries (mergeable-sketch sum, Agarwal et al. "Mergeable Summaries")
without ever re-scanning corpus history.

Honest-approximation contract (unlike the batch operator, the stream
cannot recount the corpus, so the answer carries its error bounds
instead of pretending exactness):

- each store row (token, c) undercounts the token's true stream
  frequency by at most D = Σ d_p, where d_p is the partition's ACTUAL
  total subtracted shrink mass — persisted in the marker rows, so the
  bound is data-measured, not the worst-case N/(m+1);
- the view returns (token, c_lower, c_upper=c_lower+D) for every
  token with c_upper·K > N: since c_upper ≥ true freq, this is a
  guaranteed SUPERSET of the true 1/K-heavy hitters (tested against
  the exact batch operator under arbitrary chunking);
- rows with c_lower·K > N are GUARANTEED heavy (c_lower ≤ true freq)
  — the certain/candidate split downstream consumers filter on.

State layout (the ``streaming/embstats.py`` pattern): one delta
partition ``summaries/batch-<tag>`` per batch, overwrite-of-own-path
so at-least-once replay is idempotent; data rows (token, c, 0, 0)
plus one marker row per batch partition (NULL, 0, n_p, d_p) carrying
the token total and shrink mass. Store size is partitions × (m+1)
rows per batch — compactable offline (streaming/compact.py pattern);
nothing is ever corpus-proportional.

100 TB posture: per batch ONE Arrow mapInPandas pass over the batch's
tokens and a ≤(m+1)-rows-per-partition write; the view reads
batches × partitions × m rows and does one keyed sum — the vocabulary
never shuffles, the corpus is never re-read.
"""

from __future__ import annotations

import os
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import LongType, StringType, StructField, StructType

from convoy_spark.functions.hashing import WS_SPLIT
from convoy_spark.operators.heavyhitters import HH_K, HH_SUMMARY

DOC_STREAM_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("text", StringType()),
    ]
)

SUMMARY_SCHEMA = "token string, c long, n long, d long"


def _read_deltas(spark: SparkSession, path: str) -> DataFrame:
    if not os.path.isdir(path):
        return spark.createDataFrame([], SUMMARY_SCHEMA)
    return (
        spark.read.option("recursiveFileLookup", "true")
        .schema(SUMMARY_SCHEMA)
        .parquet(path)
    )


def _mg_summary_partition(m: int):
    """Per-partition MG fold over token strings; emits the surviving
    (token, counter) rows plus ONE marker row (token NULL) carrying
    the partition's token total n_p and its exact total shrink mass
    d_p — the measured undercount bound."""

    def fold(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        counters: dict[str, int] = {}
        n_part = 0
        d_part = 0
        for pdf in batches:
            n_part += len(pdf)
            for tok, cnt in pdf["token"].value_counts().items():
                counters[tok] = counters.get(tok, 0) + int(cnt)
            if len(counters) > m:
                delta = sorted(counters.values(), reverse=True)[m]
                d_part += delta
                counters = {
                    t: c - delta for t, c in counters.items() if c > delta
                }
        toks = list(counters.keys())
        yield pd.DataFrame(
            {
                "token": toks + [None],
                "c": [counters[t] for t in toks] + [0],
                "n": [0] * len(toks) + [n_part],
                "d": [0] * len(toks) + [d_part],
            }
        )

    return fold


def apply_hh_batch(
    batch: DataFrame,
    state_dir: str,
    batch_tag: str,
    summary_size: int = HH_SUMMARY,
    text_col: str = "text",
) -> None:
    """Fold one micro-batch of documents into its own summary delta
    partition. Overwrites the batch's own path — replay-idempotent
    (the summary is a pure function of the batch's rows)."""
    toks = F.filter(
        F.split(F.lower(F.col(text_col)), WS_SPLIT), lambda t: t != F.lit("")
    )
    tokens = batch.select(F.explode(toks).alias("token"))
    summary = tokens.mapInPandas(
        _mg_summary_partition(summary_size), SUMMARY_SCHEMA
    )
    summary.write.mode("overwrite").parquet(
        os.path.join(state_dir, "summaries", f"batch-{batch_tag}")
    )


def run_incremental_hh(
    spark: SparkSession,
    landing_dir: str,
    checkpoint_dir: str,
    state_dir: str,
    summary_size: int = HH_SUMMARY,
) -> None:
    """Drain all document files present through the summary fold;
    stop when caught up. Re-running with the same checkpoint processes
    only new files (batch tags namespaced per checkpoint — the
    embstats contract)."""
    import hashlib

    ck_tag = hashlib.blake2s(
        os.path.abspath(checkpoint_dir).encode(), digest_size=8
    ).hexdigest()
    stream = (
        spark.readStream.schema(DOC_STREAM_SCHEMA)
        .option("pathGlobFilter", "*.parquet")
        .parquet(landing_dir)
    )
    q = (
        stream.writeStream.foreachBatch(
            lambda b, eid: apply_hh_batch(
                b, state_dir, f"{ck_tag}-{eid}", summary_size
            )
        )
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def heavy_hitters_over_stream(
    spark: SparkSession, state_dir: str, k_inv: int = HH_K
) -> DataFrame:
    """(token, c_lower, c_upper, guaranteed): every token whose upper
    frequency bound clears the 1/k_inv threshold — a proven superset
    of the stream's true heavy hitters, with ``guaranteed`` marking
    the rows whose LOWER bound already clears it. All threshold
    comparisons are integer (freq·K vs N) — exact on both engines."""
    st = _read_deltas(spark, os.path.join(state_dir, "summaries"))
    tot = st.where(F.col("token").isNull()).agg(
        F.sum("n").alias("n_total"), F.sum("d").alias("d_total")
    )
    merged = (
        st.where(F.col("token").isNotNull())
        .groupBy("token")
        .agg(F.sum("c").alias("c_lower"))
    )
    k = F.lit(int(k_inv))
    return (
        merged.crossJoin(F.broadcast(tot))
        .select(
            "token",
            "c_lower",
            (F.col("c_lower") + F.col("d_total")).alias("c_upper"),
            (F.col("c_lower") * k > F.col("n_total")).alias("guaranteed"),
            "n_total",
        )
        .where(F.col("c_upper") * k > F.col("n_total"))
        .drop("n_total")
    )
