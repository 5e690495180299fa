"""Loader-prep catalog queries over ``documents`` (the data-mixture /
packing / shuffling last mile of a pretraining pipeline —
operators/loader.py), each with a full DuckDB value-hash oracle."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from convoy_spark.functions.hashing import WS_SPLIT, sql_hash60
from convoy_spark.operators.loader import (
    chunk_documents,
    epoch_shuffle,
    mixture_sample,
    pack_sequences,
    shard_assignment,
)
from convoy_spark.queries.catalog import query
from convoy_spark.tables import load_table

PACK_SEQ_LEN = 512
SHUFFLE_EPOCH = 1
# target mixture over the synthetic corpus's source domains; sources
# absent from the corpus at an SF simply bind nothing, sources absent
# from the TARGETS sample at rate 0 — both paths oracle-checked.
MIXTURE_TARGETS = {"src1": 0.5, "src3": 0.3, "src7": 0.2}

_TGT_VALUES = ", ".join(f"('{d}', {w})" for d, w in MIXTURE_TARGETS.items())


@query(
    "pack_sequences",
    oracle=f"""
    WITH t AS (
      SELECT doc_id,
        CAST(len(list_filter(
          string_split_regex(lower(text), '{WS_SPLIT}'),
          x -> x <> '')) AS BIGINT) AS n_tokens
      FROM documents
    ),
    c AS (
      SELECT doc_id, n_tokens,
             SUM(n_tokens) OVER (ORDER BY doc_id) AS cum
      FROM t
    )
    SELECT doc_id, n_tokens,
      CAST(cum - n_tokens AS BIGINT) AS start_offset,
      CAST((cum - n_tokens) // {PACK_SEQ_LEN} AS BIGINT) AS pack_id,
      CASE WHEN n_tokens > 0
           THEN ((cum - 1) // {PACK_SEQ_LEN})
                > ((cum - n_tokens) // {PACK_SEQ_LEN})
           ELSE FALSE END AS crosses_boundary
    FROM c
    """,
)
def pack_sequences_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Concatenate-and-chunk sequence packing (GPT-style): documents
    laid out in id order as one token stream, cut into fixed
    {n}-token training sequences; per doc its stream offset, owning
    pack, and whether it spans a cut. The global running total is the
    TWO-PHASE block prefix scan (operators/loader.py) — the oracle's
    single ordered window states the same numbers, the Spark plan
    never runs a single-task scan.""".format(n=PACK_SEQ_LEN)
    return pack_sequences(
        load_table(spark, sf_dir, "documents"), seq_len=PACK_SEQ_LEN
    )


CHUNK_SIZE = 64
CHUNK_STRIDE = 48


@query(
    "chunk_documents",
    oracle=f"""
    WITH t AS (
      SELECT doc_id,
             list_filter(string_split_regex(text, '{WS_SPLIT}'),
                         x -> x <> '') AS toks
      FROM documents
    ),
    n AS (
      SELECT doc_id, toks, CAST(len(toks) AS BIGINT) AS n_tokens
      FROM t WHERE len(toks) > 0
    ),
    s AS (
      SELECT doc_id, toks, n_tokens,
             unnest(generate_series(
               CAST(0 AS BIGINT),
               (CASE WHEN n_tokens <= {CHUNK_SIZE} THEN CAST(0 AS BIGINT)
                     ELSE (n_tokens - {CHUNK_SIZE} + {CHUNK_STRIDE} - 1)
                          // {CHUNK_STRIDE} END) * {CHUNK_STRIDE},
               CAST({CHUNK_STRIDE} AS BIGINT))) AS start_token
      FROM n
    )
    SELECT doc_id,
           CAST(start_token // {CHUNK_STRIDE} AS BIGINT) AS chunk_id,
           CAST(start_token AS BIGINT) AS start_token,
           CAST(LEAST({CHUNK_SIZE}, n_tokens - start_token) AS BIGINT)
             AS n_chunk_tokens,
           array_to_string(
             toks[start_token + 1 : start_token + {CHUNK_SIZE}], ' ')
             AS chunk_text
    FROM s
    """,
)
def chunk_documents_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RAG-style overlapping chunking of the corpus into
    {c}-token windows every {s} tokens (operators/loader.py::
    chunk_documents) — the retrieval-index / context-window unit a
    downstream embedder or indexer ingests. Hash-checked INCLUDING
    the reassembled chunk text. Registers PAST the check window: the
    plan is one Generate over a per-doc token array — the same
    zero-shuffle tokenize+explode shape a dozen in-window entries
    prove (the key_skew_profile precedent).""".format(
        c=CHUNK_SIZE, s=CHUNK_STRIDE
    )
    return chunk_documents(
        load_table(spark, sf_dir, "documents"),
        chunk_size=CHUNK_SIZE,
        stride=CHUNK_STRIDE,
    )


@query(
    "epoch_shuffle",
    oracle=f"""
    WITH k AS (
      SELECT doc_id,
        {sql_hash60(f"concat('ep{SHUFFLE_EPOCH}:', CAST(doc_id AS VARCHAR))")}
          AS shuffle_key
      FROM documents
    )
    SELECT doc_id, shuffle_key,
      CAST(ROW_NUMBER() OVER (ORDER BY shuffle_key, doc_id) - 1
           AS BIGINT) AS shuffle_pos
    FROM k
    """,
)
def epoch_shuffle_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic per-epoch global shuffle: rank every doc by the
    cross-engine hash of (epoch, doc_id) — a fresh reproducible
    permutation per epoch, doc_id tiebreak for 60-bit collisions. The
    rank is the block prefix COUNT (two-phase scan), not a
    single-task row_number."""
    return epoch_shuffle(
        load_table(spark, sf_dir, "documents"), epoch=SHUFFLE_EPOCH
    )


@query(
    "mixture_sample",
    oracle=f"""
    WITH base AS (SELECT doc_id, source AS domain FROM documents),
    counts AS (
      SELECT domain, CAST(COUNT(*) AS BIGINT) AS n_d
      FROM base GROUP BY domain
    ),
    tgt(domain, w) AS (VALUES {_TGT_VALUES}),
    rated AS (
      SELECT c.domain, c.n_d, COALESCE(t.w, 0.0) AS w
      FROM counts c LEFT JOIN tgt t ON c.domain = t.domain
    ),
    cap AS (SELECT MIN(n_d / w) AS c FROM rated WHERE w > 0),
    rates AS (
      SELECT domain,
             CASE WHEN w > 0 THEN w * c / n_d ELSE 0.0 END AS accept_rate
      FROM rated CROSS JOIN cap
    )
    SELECT b.doc_id, b.domain, r.accept_rate,
      {sql_hash60("concat('mix0:', CAST(b.doc_id AS VARCHAR))")} % 1000000
        < CAST(FLOOR(r.accept_rate * 1000000.0) AS BIGINT) AS sampled
    FROM base b JOIN rates r ON b.domain = r.domain
    """,
)
def mixture_sample_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Target-mixture sampling: per-domain acceptance rates solve for
    the largest sample hitting the target weights exactly (the binding
    domain samples at rate 1.0); acceptance is the deterministic
    salted-hash threshold, so the sampled set is reproducible on any
    engine and any partitioning. One keyed count + broadcast rates —
    map-side at any scale."""
    return mixture_sample(
        load_table(spark, sf_dir, "documents"), MIXTURE_TARGETS
    )


# small shard budget so the sf0.01 corpus (~28k tokens) spans many
# shards; a real pipeline uses ~100M–1B tokens per shard file
SHARD_TOKENS = 2048


@query(
    "shard_assignment",
    oracle=f"""
    WITH k AS (
      SELECT doc_id,
        {sql_hash60(f"concat('ep{SHUFFLE_EPOCH}:', CAST(doc_id AS VARCHAR))")}
          AS shuffle_key
      FROM documents
    ),
    r AS (
      SELECT doc_id, shuffle_key,
        CAST(ROW_NUMBER() OVER (ORDER BY shuffle_key, doc_id) - 1
             AS BIGINT) AS shuffle_pos
      FROM k
    ),
    t AS (
      SELECT doc_id,
        CAST(len(list_filter(
          string_split_regex(lower(text), '{WS_SPLIT}'),
          x -> x <> '')) AS BIGINT) AS n_tokens
      FROM documents
    ),
    c AS (
      SELECT r.doc_id, r.shuffle_pos, t.n_tokens,
             SUM(t.n_tokens) OVER (ORDER BY r.shuffle_pos) AS cum
      FROM r JOIN t USING (doc_id)
    )
    SELECT doc_id, shuffle_pos, n_tokens,
      CAST((cum - n_tokens) // {SHARD_TOKENS} AS BIGINT) AS shard_id
    FROM c
    """,
)
def shard_assignment_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The training-shard write plan: docs in per-epoch shuffle order,
    greedily packed into ~{n}-token shards (a doc belongs to the shard
    holding its first token; shards are contiguous runs of the
    shuffled stream → one range partition writes one shard file).
    Composes the two proven scans — shuffle rank, then the block
    prefix sum of token counts in rank order; the oracle's ordered
    windows state the same numbers. Past-window by design this round:
    a composition of pack_sequences' scan and epoch_shuffle's rank,
    both machinery in-window via pack_sequences.""".format(
        n=SHARD_TOKENS
    )
    return shard_assignment(
        load_table(spark, sf_dir, "documents"),
        epoch=SHUFFLE_EPOCH,
        shard_tokens=SHARD_TOKENS,
    )


__all__ = [
    "MIXTURE_TARGETS",
    "PACK_SEQ_LEN",
    "SHARD_TOKENS",
    "SHUFFLE_EPOCH",
]


from convoy_spark.operators.loader import (  # noqa: E402
    CURRICULUM_BINS,
    curriculum_order,
    priority_sample,
)
from convoy_spark.operators.textops import text_quality  # noqa: E402
from convoy_spark.queries.textops import quality_score_sql  # noqa: E402

PRIORITY_N = 500


@query(
    "weighted_sample",
    oracle=f"""
    WITH w AS (
      SELECT doc_id,
        CAST(len(list_filter(
          string_split_regex(lower(text), '{WS_SPLIT}'),
          x -> x <> '')) AS BIGINT) AS weight
      FROM documents
    ),
    pr AS (
      SELECT doc_id, weight,
        CAST(weight AS DOUBLE) /
          CAST({sql_hash60("concat('ps1:', CAST(doc_id AS VARCHAR))")} + 1
               AS DOUBLE) AS priority
      FROM w
    )
    SELECT doc_id, weight, priority
    FROM pr ORDER BY priority DESC, doc_id LIMIT {PRIORITY_N}
    """,
)
def weighted_sample_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Duffield–Lund–Thorup priority sampling: weighted (by token
    count) sampling without replacement of {n} docs — one map + a
    distributed top-n, no transcendentals (the u^(1/w) formulation
    would hinge on engine-dependent pow), no corpus shuffle. The
    deterministic salted-hash priority makes the SAMPLE ITSELF
    oracle-checkable — reproducible sampling as a feature, the
    dataset_split ethos."""
    return priority_sample(
        load_table(spark, sf_dir, "documents"), n=PRIORITY_N
    )


@query(
    "curriculum_order",
    oracle=f"""
    WITH t AS (
      SELECT doc_id, text,
             list_filter(string_split_regex(lower(text), '{WS_SPLIT}'),
                         x -> x <> '') AS toks
      FROM documents
    ),
    q AS (
      SELECT doc_id, {quality_score_sql("toks", "text")} AS qs FROM t
    ),
    r AS (
      SELECT doc_id,
             ROW_NUMBER() OVER (ORDER BY qs, doc_id) AS rank FROM q
    ),
    n AS (SELECT COUNT(*) AS n FROM r),
    b AS (
      SELECT doc_id, rank,
             ((rank - 1) * {CURRICULUM_BINS}) // n.n AS bin
      FROM r, n
    ),
    s AS (SELECT bin, MIN(rank) AS bstart FROM b GROUP BY bin)
    SELECT b.doc_id, b.bin,
           CAST(b.rank - s.bstart AS BIGINT) AS within_rank,
           CAST((b.rank - s.bstart) * {CURRICULUM_BINS} + b.bin AS BIGINT)
             AS curriculum_pos
    FROM b JOIN s ON b.bin = s.bin
    """,
)
def curriculum_order_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality-binned round-robin curriculum ordering: global rank by
    (text_quality score, doc_id) via the two-phase block prefix scan,
    ten contiguous quality bins, easy-to-hard interleave position.
    The oracle restates the rank as one ordered window; the Spark
    plan never moves the corpus through a single-task exchange."""
    docs = load_table(spark, sf_dir, "documents")
    quality = text_quality(docs).select("doc_id", "quality_score")
    out = curriculum_order(quality)
    return out.select(
        "doc_id",
        "bin",
        F.col("within_rank").cast("long").alias("within_rank"),
        F.col("curriculum_pos").cast("long").alias("curriculum_pos"),
    )
