"""Projection / filter / scalar-expression catalog queries
(SURVEY.md §2.2 P1–P14, §2.7 U1–U4, §2.8 string surface).

All pure narrow transformations: no shuffle, filters and column
pruning push into the parquet scan, everything stays inside
whole-stage codegen (zero Python UDFs).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from convoy_spark.queries.catalog import query
from convoy_spark.tables import load_table


@query(
    "json_extraction",
    oracle="""
    SELECT
      event_id,
      CAST(json_extract_string(props, '$.k') AS BIGINT) AS prop_k
    FROM events
    """,
)
def json_extraction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Schema-on-read JSON field extraction (P1) — the reference pulls
    typed fields out of raw API JSON (`1_initial_load.py:322-329`);
    here the `events.props` JSON string plays the raw payload."""
    events = load_table(spark, sf_dir, "events")
    return events.select(
        "event_id",
        F.get_json_object("props", "$.k").cast("long").alias("prop_k"),
    )


@query(
    "case_analysis",
    oracle="""
    SELECT
      event_id,
      event_type,
      CASE
        WHEN event_type = 'purchase' THEN 'revenue'
        WHEN event_type IN ('click', 'view') THEN 'engagement'
        WHEN event_type = 'error' THEN 'fault'
        ELSE 'other'
      END AS event_class,
      CASE WHEN value >= 100.0 THEN value ELSE NULL END AS big_value
    FROM events
    """,
)
def case_analysis(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-type case analysis (P2) — mirrors the referenced-tweets
    type dispatch retweeted/replied_to/quoted → three different edge
    columns (`1_initial_load.py:121-129`)."""
    events = load_table(spark, sf_dir, "events")
    return events.select(
        "event_id",
        "event_type",
        F.when(F.col("event_type") == "purchase", "revenue")
        .when(F.col("event_type").isin("click", "view"), "engagement")
        .when(F.col("event_type") == "error", "fault")
        .otherwise("other")
        .alias("event_class"),
        F.when(F.col("value") >= 100.0, F.col("value")).alias("big_value"),
    )


@query(
    "coalesce_preference",
    oracle="""
    SELECT
      doc_id,
      COALESCE(
        CASE WHEN lang = 'en' THEN source ELSE NULL END,
        CASE WHEN n_chars > 200 THEN 'long' ELSE NULL END,
        lang
      ) AS resolved,
      NULLIF(lang, 'es') AS lang_or_null
    FROM documents
    """,
)
def coalesce_preference(spark: SparkSession, sf_dir: str) -> DataFrame:
    """COALESCE preference chains (P3/P5/P8): the reference prefers
    unwound_url > expanded_url > url (`1_initial_load.py:99-113`),
    falls back to own conversation_id (`2_enrich_ur_conversation_ids.py:51`),
    and nulls empty strings (`1_initial_load.py:266,270-271`)."""
    docs = load_table(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        F.coalesce(
            F.when(F.col("lang") == "en", F.col("source")),
            F.when(F.col("n_chars") > 200, F.lit("long")),
            F.col("lang"),
        ).alias("resolved"),
        F.nullif(F.col("lang"), F.lit("es")).alias("lang_or_null"),
    )


@query(
    "string_surface",
    oracle="""
    SELECT
      doc_id,
      upper(lang) AS lang_upper,
      substring(text, 1, 20) AS prefix20,
      replace(substring(text, 1, 50), ' ', '_') AS underscored,
      concat(lang, ':', source) AS lang_source,
      length(text) AS text_len,
      CAST(length(text) - length(replace(text, ' ', '')) + 1 AS BIGINT)
        AS n_tokens_ws
    FROM documents
    """,
)
def string_surface(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String function surface (§2.8): replace/concat/substring as in
    `1_initial_load.py:113,134,259-260,267`; whitespace token count
    replaces the reference's stored list lengths (P6,
    `1_initial_load.py:216`)."""
    docs = load_table(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        F.upper("lang").alias("lang_upper"),
        F.substring("text", 1, 20).alias("prefix20"),
        F.replace(F.substring("text", 1, 50), F.lit(" "), F.lit("_")).alias(
            "underscored"
        ),
        F.concat_ws(":", "lang", "source").alias("lang_source"),
        F.length("text").alias("text_len"),
        (
            F.length("text")
            - F.length(F.replace(F.col("text"), F.lit(" "), F.lit("")))
            + 1
        )
        .cast("long")
        .alias("n_tokens_ws"),
    )


@query(
    "explode_tokens",
    oracle="""
    SELECT doc_id, unnest(string_split(text, ' ')) AS token
    FROM documents
    WHERE doc_id % 20 = 0
    """,
)
def explode_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array unnest (U1–U3): hashtags/urls/mentions edge-table
    explosion (`1_initial_load.py:388-396`) restated as text→token
    explosion. Filtered to a doc_id stratum so the result stays
    driver-collectable at any SF; the plan (filter → pushdown →
    generate) is the 100 TB shape regardless."""
    docs = load_table(spark, sf_dir, "documents")
    return (
        docs.filter(F.col("doc_id") % 20 == 0)
        .select("doc_id", F.explode(F.split("text", " ")).alias("token"))
    )


@query(
    "array_projection",
    oracle="""
    SELECT
      doc_id,
      CAST(len(string_split(text, ' ')) AS INT) AS n_tokens,
      string_split(text, ' ')[1] AS first_token,
      array_to_string(string_split(text, ' ')[1:3], '|') AS first3
    FROM documents
    """,
)
def array_projection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array-typed columns kept native (§1.3): size() replaces the
    reference's stored lengths, element_at/slice/array_join cover the
    list handling of `1_initial_load.py:85-87,216`."""
    docs = load_table(spark, sf_dir, "documents")
    toks = F.split("text", " ")
    return docs.select(
        "doc_id",
        F.size(toks).alias("n_tokens"),
        F.element_at(toks, 1).alias("first_token"),
        F.array_join(F.slice(toks, 1, 3), "|").alias("first3"),
    )


@query(
    "scalar_surface",
    oracle="""
    SELECT
      doc_id,
      upper(lang) AS lang_upper,
      substring(text, 1, 20) AS prefix20,
      replace(substring(text, 1, 50), ' ', '_') AS underscored,
      concat(lang, ':', source) AS lang_source,
      length(text) AS text_len,
      CAST(len(string_split(text, ' ')) AS INT) AS n_tokens,
      string_split(text, ' ')[1] AS first_token,
      array_to_string(string_split(text, ' ')[1:3], '|') AS first3
    FROM documents
    """,
)
def scalar_surface(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Combined string + array scalar surface (§2.8 + P6/P14) in one
    scan-side projection: upper/substring/replace/concat from
    `1_initial_load.py:113,134,259-260,267`, size/element_at/slice/
    array_join replacing the reference's stored list lengths
    (`1_initial_load.py:85-87,216`). One catalog slot proving both
    families; `string_surface` / `array_projection` remain as the
    split variants."""
    docs = load_table(spark, sf_dir, "documents")
    toks = F.split("text", " ")
    return docs.select(
        "doc_id",
        F.upper("lang").alias("lang_upper"),
        F.substring("text", 1, 20).alias("prefix20"),
        F.replace(F.substring("text", 1, 50), F.lit(" "), F.lit("_")).alias(
            "underscored"
        ),
        F.concat_ws(":", "lang", "source").alias("lang_source"),
        F.length("text").alias("text_len"),
        F.size(toks).alias("n_tokens"),
        F.element_at(toks, 1).alias("first_token"),
        F.array_join(F.slice(toks, 1, 3), "|").alias("first3"),
    )


@query(
    "filter_suite",
    oracle="""
    SELECT event_id, user_id, value
    FROM events
    WHERE event_type = 'purchase'
      AND value > 50.0
      AND user_id IS NOT NULL
      AND event_id % 2 = 1
    """,
)
def filter_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Predicate suite (P9–P11): null checks, equality, range and
    modulus filters — `WHERE ISNULL(in_reply_to)`
    (`2_enrich_ur_conversation_ids.py:33`), zero-reply branch
    (`extract_conversation_ids.py:25-28`). All pushed to the scan."""
    events = load_table(spark, sf_dir, "events")
    return events.filter(
        (F.col("event_type") == "purchase")
        & (F.col("value") > 50.0)
        & F.col("user_id").isNotNull()
        & (F.col("event_id") % 2 == 1)
    ).select("event_id", "user_id", "value")
