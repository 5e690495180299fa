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

- round 0 classes single tokens;
- round k+1 classes the pair (r_k(pos), r_k(pos + 2^k)) — two suffixes
  land in the same class IFF their first 2^(k+1) tokens agree;
- after log2(L) rounds, positions sharing a class are EXACTLY the
  occurrences of a repeated L-token window, corpus-wide.

Spark-first shape (round-11 rewrite; the round-10 verdict's #4):
nothing downstream ever reads the rank as an ORDINAL — every consumer
(the repeat profile, its streaming twin) groups on rank EQUALITY — so
the per-round global dense rank the round-8 form computed
(``scale.range_rank`` over the distinct key set: distinct + range
exchange + checkpoint + row_number window + broadcast-offset join,
per round) is replaced by an equality-CLASS id: the class's first
corpus occurrence, ``min(struct(doc_id, pos))`` per key — ONE
map-side-combined aggregation + one equi-join back on the same key.
The (r, r@pos+step) pair itself comes from a ``lead(r, 2^k)`` window
over the per-doc position order (token positions are contiguous by
construction — ``posexplode`` here, the accumulated whole-doc store in
the streaming twin) instead of the round-8 self-join on
(doc_id, pos). Per round: one doc-keyed window exchange + the
class-keyed aggregate/join exchanges over the once-materialized pair
frame — versus the round-8 form's self-join, distinct, range
exchange, rank window and broadcast-offset join per round (sf0.1
A/B in OPTIMIZATION_r11.md). Class ids are deterministic (min over a unique
(doc_id, pos) domain) and the class PARTITION is bit-identical to the
dense rank's, so the profile output — and its DuckDB value hash — is
unchanged; skew (a hot token / hot window) is absorbed by the
aggregation's map-side combine and the join's AQE skew split, neither
of which a rank-window formulation would get.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from convoy_spark.functions.hashing import WS_SPLIT

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


def _first_occurrence(col: Column) -> Column:
    """min(struct(doc_id, pos)) — the deterministic class id: the
    lexicographically first corpus position carrying ``col``'s key.
    Injective across classes because (doc_id, pos) is unique."""
    return F.min(col).alias("r")


def _pos_struct() -> Column:
    return F.struct(
        F.col("doc_id").cast("long").alias("d"),
        F.col("pos").cast("long").alias("p"),
    )


# the class id of the empty suffix (past the doc end): no real class
# can carry it because real ids are first occurrences, which are
# non-negative positions.
def _sentinel_struct() -> Column:
    return F.struct(
        F.lit(SENTINEL).cast("long").alias("d"),
        F.lit(SENTINEL).cast("long").alias("p"),
    )


def suffix_window_ranks(
    positions: DataFrame,
    window: int = REPEAT_WINDOW,
    checkpoint: bool = True,
) -> DataFrame:
    """(doc_id, pos, r) — r identifies the equality class of the
    ``window``-token sequence starting at (doc_id, pos): two positions
    (across ANY documents) carry the same r IFF their next ``window``
    tokens are identical (suffixes shorter than the window compare as
    sentinel-padded, so they only ever equal other suffixes of the
    same residual length — never a full window). ``window`` must be a
    power of two. ``r`` is a struct class id (first corpus occurrence
    of the class) — an EQUALITY key, not an ordinal; consumers group
    on it.

    Precondition (held by ``token_positions`` and the streaming
    position store, which only ever appends whole-doc tokenizations):
    per-doc positions are contiguous 0-based, so ``lead(r, step)``
    over (doc_id, pos order) IS the rank at pos+step.

    ``checkpoint=False`` exposes the full round lineage for plan
    audits (the setsim pattern); the shipped default materializes each
    round's pair frame once — it feeds BOTH the class aggregate and
    the join back, and their exchange subtrees differ (partial agg
    below one), so without the barrier each consumer would re-derive
    the whole doubling lineage (2^rounds evaluations of round 0)."""
    assert window & (window - 1) == 0, "window must be a power of two"
    w_doc = Window.partitionBy("doc_id").orderBy("pos")
    # round 0: class of the single token = its first corpus occurrence
    vocab = positions.groupBy("tok").agg(_first_occurrence(_pos_struct()))
    cur = positions.join(vocab, "tok").select("doc_id", "pos", "r")
    step = 1
    while step < window:
        pair = cur.select(
            "doc_id",
            "pos",
            F.col("r").alias("_ra"),
            F.coalesce(
                F.lead("r", step).over(w_doc), _sentinel_struct()
            ).alias("_rb"),
        )
        if checkpoint:
            pair = pair.localCheckpoint(eager=False)
        classes = pair.groupBy("_ra", "_rb").agg(
            _first_occurrence(_pos_struct())
        )
        cur = pair.join(classes, ["_ra", "_rb"]).select("doc_id", "pos", "r")
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
    # materialized once: `full` feeds BOTH the per-class group stats
    # and the per-doc rollup join below — without the checkpoint the
    # whole doubling pipeline would execute twice.
    full = (
        ranked.join(ntoks, "doc_id")
        .filter(F.col("pos") + window - 1 <= F.col("_mx"))
        .select("doc_id", "r")
        .localCheckpoint(eager=False)
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
