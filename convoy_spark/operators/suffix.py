"""Distributed suffix ranking via prefix doubling, and the EXACT
cross-document repeated-window detector built on it.

The dedup suite's substring members (operators/dedup.py: span_dedup,
substring_dup_pairs) find repeated spans through content-defined GRAM
SAMPLING — probabilistically complete, cheap, the C4/CCNet shape. The
exact literature standard (Lee et al., "Deduplicating Training Data
Makes Language Models Better", ACL 2022) instead builds a SUFFIX ARRAY
over the corpus and reads repeated substrings off equal-prefix runs.
A literal suffix array is a single-node artifact; the distributed
restatement is PREFIX DOUBLING (Manber & Myers 1993, the textbook
O(n log n) construction — each round doubles the compared prefix
length by ranking (rank[i], rank[i + 2^k]) pairs), which is pure
keyed-join/rank dataflow:

- round 0 ranks single tokens (dense rank of the token string);
- round k+1 ranks the pair (r_k(pos), r_k(pos + 2^k)) — two suffixes
  get equal rank IFF their first 2^(k+1) tokens agree;
- after log2(L) rounds, positions sharing a rank are EXACTLY the
  occurrences of a repeated L-token window, corpus-wide.

Spark-first shape: the global dense rank each round is the
``scale.range_rank`` primitive over the DISTINCT key set
(repartitionByRange + per-partition row_number + broadcast offsets —
row_number over sorted distinct keys IS the dense rank, with no
single-task sort), then one equi-join back to the position frame. Per
round: one distinct, one range exchange, one pair-keyed join — times
log2(L) rounds, the classic construction bound, every stage a shuffle
Catalyst plans as hash exchanges. Integer ranks all the way down, so
the whole construction value-hash-checks against an unrolled
dense_rank CTE chain.

Reference parity: the reference has no substring machinery at all
(SURVEY §2 north-star extensions); this is the exact-completion of
the sampled span_dedup pair, the same relationship setsim_prefix_join
(exact) bears to minhash_lsh_neardup (sketch).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from convoy_spark.functions.hashing import WS_SPLIT
from convoy_spark.operators.scale import range_rank

REPEAT_WINDOW = 16  # L: compared window length; log2(L) = 4 rounds
SENTINEL = -1  # rank of the empty suffix (past the doc end)


def token_positions(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """(doc_id, pos, tok) — the house tokenizer (lowercase, WS_SPLIT,
    empties dropped) exploded WITH contiguous 0-based positions."""
    toks = F.filter(
        F.split(F.lower(F.col(text_col)), WS_SPLIT), lambda x: x != ""
    )
    return docs.select(
        F.col(id_col).alias("doc_id"), F.posexplode(toks).alias("pos", "tok")
    )


def suffix_window_ranks(
    positions: DataFrame, window: int = REPEAT_WINDOW
) -> DataFrame:
    """(doc_id, pos, r) — r is the dense equality-rank of the
    ``window``-token sequence starting at (doc_id, pos): two positions
    (across ANY documents) carry the same r IFF their next ``window``
    tokens are identical (suffixes shorter than the window compare as
    sentinel-padded, so they only ever equal other suffixes of the
    same residual length — never a full window). ``window`` must be a
    power of two."""
    assert window & (window - 1) == 0, "window must be a power of two"
    # round 0: dense rank of the single token, via range_rank over the
    # distinct token set (unique keys -> deterministic global rank)
    vocab = range_rank(
        positions.select("tok").distinct(), ["tok"], out_col="r"
    )
    cur = positions.join(vocab, "tok").select("doc_id", "pos", "r")
    step = 1
    while step < window:
        nxt = cur.select(
            "doc_id",
            (F.col("pos") - step).alias("pos"),
            F.col("r").alias("_rb"),
        )
        pair = (
            cur.withColumnRenamed("r", "_ra")
            .join(nxt, ["doc_id", "pos"], "left")
            .select(
                "doc_id",
                "pos",
                "_ra",
                F.coalesce("_rb", F.lit(SENTINEL)).alias("_rb"),
            )
            .localCheckpoint(eager=False)
        )
        ranks = range_rank(
            pair.select("_ra", "_rb").distinct(), ["_ra", "_rb"], out_col="r"
        )
        cur = pair.join(ranks, ["_ra", "_rb"]).select("doc_id", "pos", "r")
        step *= 2
    return cur


def crossdoc_repeat_profile(
    docs: DataFrame,
    window: int = REPEAT_WINDOW,
    positions: DataFrame | None = None,
) -> DataFrame:
    """(doc_id, n_windows, n_repeat_windows, n_crossdoc_windows) — the
    exact repeated-window audit per document: of the doc's full
    ``window``-token windows, how many occur at least twice anywhere
    in the corpus (n_repeat_windows), and how many occur in at least
    one OTHER document (n_crossdoc_windows — the Lee-et-al dedup
    signal). One row per INPUT doc: documents shorter than the window
    report explicit zeros (the bloom_decontaminate absent-row lesson,
    applied from the start).

    Pass ``positions`` — an already-tokenized (doc_id, pos, tok)
    frame, e.g. the streaming twin's accumulated position store
    (streaming/suffixrepeat.py) — to skip the tokenize; ``docs`` still
    supplies the doc universe for the explicit-zero rows. ONE
    definition serves batch and stream (the indexdrift discipline)."""
    pos = (
        positions
        if positions is not None
        else token_positions(docs).localCheckpoint(eager=False)
    )
    ranked = suffix_window_ranks(pos, window)
    ntoks = pos.groupBy("doc_id").agg(F.max("pos").alias("_mx"))
    full = ranked.join(ntoks, "doc_id").filter(
        F.col("pos") + window - 1 <= F.col("_mx")
    )
    grp = full.groupBy("r").agg(
        F.count(F.lit(1)).alias("_gn"),
        F.min("doc_id").alias("_gmin"),
        F.max("doc_id").alias("_gmax"),
    )
    per_doc = (
        full.join(grp, "r")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_windows"),
            F.sum((F.col("_gn") >= 2).cast("long")).alias("n_repeat_windows"),
            F.sum(
                (F.col("_gmin") != F.col("_gmax")).cast("long")
            ).alias("n_crossdoc_windows"),
        )
    )
    return (
        docs.select("doc_id")
        .distinct()
        .join(per_doc, "doc_id", "left")
        .select(
            "doc_id",
            *[
                F.coalesce(c, F.lit(0).cast("long")).alias(c)
                for c in ("n_windows", "n_repeat_windows", "n_crossdoc_windows")
            ],
        )
    )
