"""Round-3 source/streaming extensions: permissive CSV quarantine and
streaming incremental exact dedup."""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql.types import (
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from convoy_spark.operators.dedup import exact_dedup_map
from convoy_spark.sources.csvsrc import corrupt_rows, read_csv
from convoy_spark.streaming.dedup import run_incremental_dedup

CSV_SCHEMA = StructType(
    [
        StructField("id", LongType()),
        StructField("name", StringType()),
        StructField("qty", IntegerType()),
    ]
)


def test_csv_permissive_quarantine(spark, tmp_path):
    p = tmp_path / "drop.csv"
    p.write_text(
        "id,name,qty\n"
        "1,alpha,10\n"
        "notanint,beta,20\n"  # uncastable id -> quarantined
        "3,gamma,xyz\n"  # uncastable qty -> quarantined
        "4,delta,40\n"
    )
    df = read_csv(spark, str(p), CSV_SCHEMA)
    good = df.filter(F.col("_corrupt_record").isNull())
    assert {(r.id, r.name, r.qty) for r in good.collect()} == {
        (1, "alpha", 10),
        (4, "delta", 40),
    }
    bad = {r._corrupt_record for r in corrupt_rows(df).collect()}
    assert bad == {"notanint,beta,20", "3,gamma,xyz"}
    df.unpersist()


def test_csv_schema_never_inferred(spark, tmp_path):
    # numeric-looking strings must stay the DECLARED types, proving no
    # inference pass happens
    p = tmp_path / "d2.csv"
    p.write_text("id,name,qty\n7,008,9\n")
    df = read_csv(spark, str(p), CSV_SCHEMA)
    row = df.collect()[0]
    assert row.name == "008"  # a string, zeros preserved
    assert isinstance(row.id, int) and isinstance(row.qty, int)


def _drain_dedup(spark, landing, ckpt, seen, kept_rows):
    run_incremental_dedup(
        spark,
        str(landing / "*"),
        ckpt,
        seen,
        lambda df: kept_rows.extend(
            (r.doc_id, r.text) for r in df.collect()
        ),
    )


def test_incremental_dedup_matches_batch_in_order(spark, tmp_path):
    landing = tmp_path / "docs"
    ckpt = str(tmp_path / "ckpt")
    seen = str(tmp_path / "seen")
    schema = "doc_id long, text string"
    b1 = [(1, "aaa"), (2, "bbb"), (3, "aaa")]
    b2 = [(4, "bbb"), (5, "ccc"), (6, "ccc"), (7, "ddd")]

    kept: list = []
    spark.createDataFrame(b1, schema).coalesce(1).write.parquet(
        str(landing / "d1")
    )
    _drain_dedup(spark, landing, ckpt, seen, kept)
    spark.createDataFrame(b2, schema).coalesce(1).write.parquet(
        str(landing / "d2")
    )
    _drain_dedup(spark, landing, ckpt, seen, kept)

    # in-id-order arrival == batch dedup winners
    want = {
        (r.doc_id)
        for r in exact_dedup_map(
            spark.createDataFrame(b1 + b2, schema)
        )
        .filter(F.col("doc_id") == F.col("canonical_id"))
        .collect()
    }
    assert {d for d, _ in kept} == want

    # resume: no new files -> no new kept rows
    n = len(kept)
    _drain_dedup(spark, landing, ckpt, seen, kept)
    assert len(kept) == n


def test_incremental_dedup_first_arrival_wins(spark, tmp_path):
    landing = tmp_path / "docs"
    ckpt = str(tmp_path / "ckpt")
    seen = str(tmp_path / "seen")
    schema = "doc_id long, text string"
    kept: list = []
    # doc 9 arrives first with content X; doc 1 (smaller id) arrives
    # later with the same content — the EARLIER crawl's copy is kept
    # (INSERT IGNORE parity), unlike batch min-id dedup
    spark.createDataFrame([(9, "xxx")], schema).coalesce(1).write.parquet(
        str(landing / "d1")
    )
    _drain_dedup(spark, landing, ckpt, seen, kept)
    spark.createDataFrame(
        [(1, "xxx"), (2, "yyy")], schema
    ).coalesce(1).write.parquet(str(landing / "d2"))
    _drain_dedup(spark, landing, ckpt, seen, kept)
    assert {d for d, _ in kept} == {9, 2}
