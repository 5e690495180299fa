"""The preprocessing funnel — the whole training-data pipeline as ONE
declarative plan.

Every component the catalog proves individually (quality scoring,
repetition filtering, language selection, exact dedup, train split)
composes into the funnel every pretraining pipeline actually runs;
this query materializes the per-stage retention profile — the
dashboard number a data curator watches. Because each stage is a
DataFrame transform, the composition is a SINGLE Catalyst plan: the
per-doc flags compute in parallel branches over one documents scan
family and meet in one doc-keyed join tree — no intermediate
materialization, no orchestration glue, which IS the argument for an
engine over a script pipeline.

Stage semantics are cumulative conjunctions (a doc must survive all
earlier stages to count in a later one), evaluated over ALL documents
so the retention fractions are exact integer ratios — deterministic
across engines. Flags for token-less documents coalesce to FALSE on
both sides.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from convoy_spark.operators.dedup import exact_dedup_map
from convoy_spark.operators.textops import (
    QF_MAX_MEAN_LEN,
    QF_MIN_CHARS,
    QF_MIN_MEAN_LEN,
    QF_MIN_TOKENS,
    REP_DUP_2GRAM_MAX,
    REP_DUP_3GRAM_MAX,
    REP_TOP_TOKEN_MAX,
    repetition_signals,
    text_quality,
)
from convoy_spark.queries.catalog import query
from convoy_spark.queries.dedup import _SPLIT_CASE_SQL, SPLIT_SALT, _split_col
from convoy_spark.queries.textops import _TOKS_SQL, _dup_ratio_sql
from convoy_spark.functions.hashing import sql_hash60
from convoy_spark.tables import load_table

FUNNEL_LANG = "en"

_STAGES = [
    "all_documents",
    "quality_pass",
    "repetition_pass",
    "lang_selected",
    "dedup_canonical",
    "train_split",
]


def funnel_flags(docs: DataFrame) -> DataFrame:
    """Per-document cumulative stage flags (doc_id, c1..c5) of the
    funnel — the SINGLE definition of the stage semantics, consumed by
    the batch retention query below, the streaming funnel's
    equivalence test, and anything else that needs "which docs
    survive stage k"."""
    q = text_quality(docs).select(
        "doc_id", F.col("passes_filter").alias("q_ok")
    )
    r = repetition_signals(docs).select(
        "doc_id", F.col("passes_repetition_filter").alias("r_ok")
    )
    dd = exact_dedup_map(docs).select(
        "doc_id",
        (F.col("doc_id") == F.col("canonical_id")).alias("is_canonical"),
    )
    b = (
        docs.select("doc_id", "lang", _split_col().alias("split"))
        .join(q, "doc_id", "left")
        .join(r, "doc_id", "left")
        .join(dd, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("q_ok", F.lit(False)).alias("c1_"),
            F.coalesce("r_ok", F.lit(False)).alias("r_ok"),
            "lang",
            F.coalesce("is_canonical", F.lit(False)).alias("is_canonical"),
            "split",
        )
    )
    return b.select(
        "doc_id",
        F.col("c1_").alias("c1"),
        (F.col("c1_") & F.col("r_ok")).alias("c2"),
        (F.col("c1_") & F.col("r_ok") & (F.col("lang") == FUNNEL_LANG)).alias(
            "c3"
        ),
        (
            F.col("c1_")
            & F.col("r_ok")
            & (F.col("lang") == FUNNEL_LANG)
            & F.col("is_canonical")
        ).alias("c4"),
        (
            F.col("c1_")
            & F.col("r_ok")
            & (F.col("lang") == FUNNEL_LANG)
            & F.col("is_canonical")
            & (F.col("split") == "train")
        ).alias("c5"),
    )



@query(
    "corpus_funnel",
    oracle=f"""
    WITH {_TOKS_SQL},
    tk AS (
      SELECT doc_id, w, COUNT(*) AS cnt FROM (
        SELECT doc_id, unnest(toks) AS w FROM t
      ) GROUP BY doc_id, w
    ),
    qagg AS (
      SELECT doc_id, SUM(cnt) AS n_tokens, MAX(cnt) AS max_cnt
      FROM tk GROUP BY doc_id
    ),
    qflags AS (
      SELECT t.doc_id,
        COALESCE(
          length(t.text) >= {QF_MIN_CHARS}
          AND a.n_tokens >= {QF_MIN_TOKENS}
          AND CAST(list_sum(list_transform(t.toks, x -> length(x)))
                   AS DOUBLE) / len(t.toks) >= {QF_MIN_MEAN_LEN}
          AND CAST(list_sum(list_transform(t.toks, x -> length(x)))
                   AS DOUBLE) / len(t.toks) <= {QF_MAX_MEAN_LEN},
          FALSE) AS q_ok,
        COALESCE(
          CAST(a.max_cnt AS DOUBLE) / a.n_tokens <= {REP_TOP_TOKEN_MAX}
          AND {_dup_ratio_sql(2)} <= {REP_DUP_2GRAM_MAX}
          AND {_dup_ratio_sql(3)} <= {REP_DUP_3GRAM_MAX},
          FALSE) AS r_ok
      FROM t LEFT JOIN qagg a ON t.doc_id = a.doc_id
    ),
    canon AS (
      SELECT doc_id,
             doc_id = MIN(doc_id) OVER (
               PARTITION BY {sql_hash60('text')}) AS is_canonical
      FROM documents
    ),
    b AS (
      SELECT d.doc_id,
             {sql_hash60(f"concat('{SPLIT_SALT}:', d.doc_id)")} % 100
               AS bucket,
             d.lang, f.q_ok, f.r_ok, c.is_canonical
      FROM documents d
      JOIN qflags f ON d.doc_id = f.doc_id
      JOIN canon c ON d.doc_id = c.doc_id
    ),
    flags AS (
      SELECT q_ok AS c1,
             q_ok AND r_ok AS c2,
             q_ok AND r_ok AND lang = '{FUNNEL_LANG}' AS c3,
             q_ok AND r_ok AND lang = '{FUNNEL_LANG}'
               AND is_canonical AS c4,
             q_ok AND r_ok AND lang = '{FUNNEL_LANG}' AND is_canonical
               AND ({_SPLIT_CASE_SQL}) = 'train' AS c5
      FROM b
    ),
    counts AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n0,
             CAST(COUNT(*) FILTER (c1) AS BIGINT) AS n1,
             CAST(COUNT(*) FILTER (c2) AS BIGINT) AS n2,
             CAST(COUNT(*) FILTER (c3) AS BIGINT) AS n3,
             CAST(COUNT(*) FILTER (c4) AS BIGINT) AS n4,
             CAST(COUNT(*) FILTER (c5) AS BIGINT) AS n5
      FROM flags
    )
    SELECT stage, stage_name, n_docs,
           CAST(n_docs AS DOUBLE) / n0 AS fraction_of_total
    FROM (
      SELECT 0 AS stage, 'all_documents' AS stage_name, n0 AS n_docs, n0 FROM counts
      UNION ALL SELECT 1, 'quality_pass', n1, n0 FROM counts
      UNION ALL SELECT 2, 'repetition_pass', n2, n0 FROM counts
      UNION ALL SELECT 3, 'lang_selected', n3, n0 FROM counts
      UNION ALL SELECT 4, 'dedup_canonical', n4, n0 FROM counts
      UNION ALL SELECT 5, 'train_split', n5, n0 FROM counts
    )
    """,
)
def corpus_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-stage retention of the composed preprocessing funnel:
    quality → repetition → language → exact-dedup canonical → train
    split, as cumulative conjunctions over one documents scan family
    (see module docstring)."""
    docs = load_table(spark, sf_dir, "documents")
    flags = funnel_flags(docs)
    counts = flags.agg(
        F.count("*").alias("n0"),
        *[
            F.count_if(F.col(f"c{i}")).alias(f"n{i}")
            for i in range(1, 6)
        ],
    )
    stack_args = ", ".join(
        f"{i}, '{name}', n{i}" for i, name in enumerate(_STAGES)
    )
    return counts.select(
        F.expr(
            f"stack(6, {stack_args}) AS (stage, stage_name, n_docs)"
        ),
        F.col("n0").alias("_n0"),
    ).select(
        "stage",
        "stage_name",
        "n_docs",
        (F.col("n_docs").cast("double") / F.col("_n0")).alias(
            "fraction_of_total"
        ),
    )
