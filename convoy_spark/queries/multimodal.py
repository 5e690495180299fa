"""Multimodal catalog queries (SURVEY §7 M6): the decode stage's
metadata output, oracle-checked — the fake decode is deterministic
byte arithmetic precisely so DuckDB can reproduce it, proving the
mapInPandas plumbing end to end (schema, Arrow batching, values).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from convoy_spark.operators.multimodal import (
    decode_media,
    media_from_documents,
    resize_meta,
)
from convoy_spark.queries.catalog import query
from convoy_spark.tables import load_table


@query(
    "media_decode_meta",
    oracle="""
    SELECT
      doc_id AS media_id,
      ['image', 'audio', 'video'][CAST(doc_id % 3 AS INT) + 1] AS kind,
      CAST(strlen(text) AS BIGINT) AS byte_len,
      CAST(64 + strlen(text) % 512 AS INT) AS width,
      CAST(64 + (strlen(text) * 7) % 512 AS INT) AS height,
      CAST(1 + ascii(substring(text, 1, 1)) % 3 AS INT) AS channels
    FROM documents
    """,
)
def media_decode_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary decode via Arrow-batched mapInPandas: documents → opaque
    utf-8 payload bytes → typed (width, height, channels) metadata.
    The payload column is dropped inside the stage, so bytes never
    reach a shuffle. The decode itself is the documented deterministic
    stub (real codecs are not in this container)."""
    docs = load_table(spark, sf_dir, "documents")
    return decode_media(media_from_documents(docs))


@query(
    "media_resize_plan",
    oracle="""
    WITH meta AS (
      SELECT
        doc_id AS media_id,
        CAST(64 + strlen(text) % 512 AS INT) AS width,
        CAST(64 + (strlen(text) * 7) % 512 AS INT) AS height
      FROM documents
    )
    SELECT media_id, width, height,
      least(1.0, 256.0 / greatest(width, height)) AS scale,
      greatest(1, CAST(floor(width * least(1.0, 256.0 / greatest(width, height)))
                       AS INT)) AS out_width,
      greatest(1, CAST(floor(height * least(1.0, 256.0 / greatest(width, height)))
                       AS INT)) AS out_height
    FROM meta
    """,
)
def media_resize_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Resize planning on top of decode: scale factors and target dims
    as pure JVM column arithmetic — only pixel work belongs in Pandas,
    and this stage has none."""
    docs = load_table(spark, sf_dir, "documents")
    decoded = decode_media(media_from_documents(docs))
    return resize_meta(decoded).select(
        "media_id", "width", "height", "scale", "out_width", "out_height"
    )
