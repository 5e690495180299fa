"""Text-analysis catalog queries over ``documents`` (north-star
extensions, SURVEY §7 M6): token counting, quality scoring,
corpus-trained language-ID, winnowing fingerprints — all pure
built-in expression work with full DuckDB oracles.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from convoy_spark.functions.hashing import MERSENNE31, WS_SPLIT
from convoy_spark.operators.textops import (
    BPE_RE,
    LANGID_TOP_K,
    STOPWORDS,
    WINNOW_B,
    WINNOW_K,
    WINNOW_W,
    langid_predict,
    text_quality,
    token_stats,
    winnow_fingerprints,
)
from convoy_spark.queries.catalog import query
from convoy_spark.tables import load_table

_STOP_SQL = "[" + ", ".join(f"'{s}'" for s in STOPWORDS) + "]"

# WS_SPLIT (explicit char class, not '\s+') is shared verbatim with
# the Spark side: Java \s includes \x0b, RE2 \s does not.
_TOKS_SQL = f"""
t AS (
  SELECT doc_id, text,
         list_filter(string_split_regex(lower(text), '{WS_SPLIT}'),
                     x -> x <> '') AS toks
  FROM documents
)
"""


@query(
    "token_stats",
    oracle=f"""
    WITH {_TOKS_SQL}
    SELECT doc_id,
      CAST(length(text) AS BIGINT) AS n_chars,
      CAST(len(toks) AS BIGINT) AS n_tokens,
      CAST(len(regexp_extract_all(lower(text), '{BPE_RE}')) AS BIGINT)
        AS n_bpe_tokens,
      CAST(len(list_distinct(toks)) AS BIGINT) AS n_unique_tokens,
      CAST(list_sum(list_transform(toks, x -> length(x))) AS DOUBLE)
        / len(toks) AS mean_token_len
    FROM t
    """,
)
def token_stats_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token counting (whitespace + BPE-ish regex + distinct + mean
    length): pure scan-side projection, zero shuffle, whole-stage
    codegen end to end."""
    return token_stats(load_table(spark, sf_dir, "documents"))


@query(
    "text_quality",
    oracle=f"""
    WITH {_TOKS_SQL},
    q AS (
      SELECT doc_id,
        CAST(length(text) AS BIGINT) AS n_chars,
        CAST(len(toks) AS BIGINT) AS n_tokens,
        CAST(len(list_filter(toks, x -> list_contains({_STOP_SQL}, x)))
             AS DOUBLE) / len(toks) AS stopword_ratio,
        CAST(length(regexp_replace(text, '[a-zA-Z0-9 \\t\\n\\x0b\\f\\r]',
                                   '', 'g'))
             AS DOUBLE) / length(text) AS punct_ratio,
        CAST(length(regexp_replace(text, '[^a-zA-Z]', '', 'g'))
             AS DOUBLE) / length(text) AS alpha_ratio,
        CAST(list_sum(list_transform(toks, x -> length(x))) AS DOUBLE)
          / len(toks) AS mean_token_len
      FROM t
    )
    SELECT *,
      least(CAST(n_tokens AS DOUBLE) / 100.0, 1.0) + alpha_ratio
        + least(stopword_ratio * 5.0, 1.0) - punct_ratio AS quality_score,
      (n_chars >= 50 AND n_tokens >= 10
       AND mean_token_len >= 2.0 AND mean_token_len <= 12.0)
        AS passes_filter
    FROM q
    """,
)
def text_quality_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pretraining-style quality signals (length / punctuation /
    stopword / alpha ratios) with a transparent composite score and a
    Gopher-flavored pass flag. Scan-side only."""
    return text_quality(load_table(spark, sf_dir, "documents"))


@query(
    "lang_id",
    oracle=f"""
    WITH g AS (
      SELECT doc_id, lang,
             unnest(list_transform(
               generate_series(1, length(lower(text)) - 2),
               i -> substring(lower(text), CAST(i AS INT), 3))) AS gram
      FROM documents WHERE length(text) >= 3
    ),
    counts AS (SELECT lang, gram, COUNT(*) AS c FROM g GROUP BY lang, gram),
    prof AS (
      SELECT lang, gram FROM (
        SELECT lang, gram,
               row_number() OVER (
                 PARTITION BY lang ORDER BY c DESC, gram ASC) AS rk
        FROM counts
      ) WHERE rk <= {LANGID_TOP_K}
    ),
    dg AS (SELECT DISTINCT doc_id, lang, gram FROM g),
    hits AS (
      SELECT dg.doc_id, dg.lang, p.lang AS cand_lang, COUNT(*) AS n_hits
      FROM dg JOIN prof p ON dg.gram = p.gram
      GROUP BY dg.doc_id, dg.lang, p.lang
    )
    SELECT doc_id, true_lang, pred_lang, CAST(n_hits AS BIGINT) AS n_hits
    FROM (
      SELECT doc_id, lang AS true_lang, cand_lang AS pred_lang, n_hits,
             row_number() OVER (
               PARTITION BY doc_id ORDER BY n_hits DESC, cand_lang ASC) AS rk
      FROM hits
    ) WHERE rk = 1
    """,
)
def lang_id_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Char-trigram language-ID: profiles trained from the labeled
    corpus (top-20 trigrams per language, one map-side-combined
    shuffle), broadcast back, argmax hits per doc with deterministic
    tiebreaks. Train + predict in one declarative plan."""
    return langid_predict(load_table(spark, sf_dir, "documents"))


_FT_TERMS = ("spark", "vector", "merge")
_FT_TERMS_SQL = ", ".join(f"'{t}'" for t in _FT_TERMS)


@query(
    "fulltext_search",
    oracle=f"""
    WITH t AS (
      SELECT doc_id,
             unnest(list_filter(string_split_regex(lower(text),
                                                   '{WS_SPLIT}'),
                                x -> x <> '')) AS tok
      FROM documents
    )
    SELECT doc_id, CAST(count(*) AS BIGINT) AS n_hits
    FROM t
    WHERE tok IN ({_FT_TERMS_SQL})
    GROUP BY doc_id
    HAVING count(DISTINCT tok) = {len(_FT_TERMS)}
    """,
)
def fulltext_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full-text AND search — the analog of the reference's
    `FULLTEXT(text)` index declaration (`4_create_tweets_a.py:35`,
    SURVEY §2.8 divergence). MariaDB keeps an inverted index; the
    Spark-first restatement builds the posting list on the fly:
    tokenize → explode → filter to the query terms BEFORE the shuffle
    (so the aggregate sees only matching postings — at 100 TB the
    shuffled volume is O(occurrences of the terms), not O(corpus)) →
    per-doc term-coverage check (AND semantics) + hit count."""
    docs = load_table(spark, sf_dir, "documents")
    toks = F.filter(
        F.split(F.lower("text"), WS_SPLIT), lambda x: x != F.lit("")
    )
    return (
        docs.select("doc_id", F.explode(toks).alias("tok"))
        .filter(F.col("tok").isin(*_FT_TERMS))
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_hits"),
            F.count_distinct("tok").alias("_n_terms"),
        )
        .filter(F.col("_n_terms") == len(_FT_TERMS))
        .select("doc_id", "n_hits")
    )


def _winnow_horner_oracle(k: int = WINNOW_K) -> str:
    """DuckDB mirror of operators.textops.winnow_gram_hash_sql: Horner
    codepoint polynomial over the k-gram at 1-based position ``pos``
    of lower(text). DuckDB ascii() == Spark ascii() == the Unicode
    codepoint of the first character, so the values are bit-identical."""
    c = "CAST(ascii(substring(lower(text), CAST(pos AS INT) + {j}, 1)) AS BIGINT)"
    expr = c.format(j=0)
    for j in range(1, k):
        expr = f"(({expr}) * {WINNOW_B} + {c.format(j=j)}) % {MERSENNE31}"
    return expr


@query(
    "winnow_fingerprints",
    oracle=f"""
    WITH g AS (
      SELECT doc_id, text,
             unnest(generate_series(1, length(lower(text)) - {WINNOW_K - 1}))
               AS pos
      FROM documents WHERE length(text) >= {WINNOW_K}
    ),
    gh AS (
      SELECT doc_id, pos,
             {_winnow_horner_oracle()}
               AS h
      FROM g
    ),
    w AS (
      SELECT doc_id, pos,
             MIN(h) OVER (PARTITION BY doc_id ORDER BY pos
                          ROWS BETWEEN CURRENT ROW
                          AND {WINNOW_W - 1} FOLLOWING) AS fp,
             COUNT(*) OVER (PARTITION BY doc_id) AS nh
      FROM gh
    )
    -- full w-windows only (mirrors the Spark-side bound); short docs
    -- keep their single clamped window
    SELECT DISTINCT doc_id, fp FROM w
    WHERE pos <= greatest(1, nh - {WINNOW_W - 1})
    """,
)
def winnow_fingerprints_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winnowing document fingerprints (Schleimer et al., SIGMOD '03):
    rolling char-5-gram hashes, per-8-window minima, dedup — any
    shared substring of length ≥ 12 produces a shared fingerprint.
    One shuffle (the per-doc window sort)."""
    return winnow_fingerprints(load_table(spark, sf_dir, "documents"))
