"""Custom Python DataSource tests (S2): partition planning matches
the reference's query packing; rows arrive complete and deterministic;
and streaming dedup-within-watermark covers the re-fetch-overlap case."""

from __future__ import annotations

from pyspark.sql import functions as F

from convoy_spark.sources.paginated import (
    QUERY_PACK,
    PaginatedAPISource,
)


def _read(spark, n=60):
    spark.dataSource.register(PaginatedAPISource)
    return (
        spark.read.format("paginated_pages")
        .option("n_conversations", n)
        .load()
    )


def test_partitioning_matches_query_packing(spark):
    df = _read(spark, n=60)
    # 60 conversations / 26 per query batch -> 3 batches
    batches = df.select("query_batch").distinct().count()
    assert batches == (60 + QUERY_PACK - 1) // QUERY_PACK == 3


def test_rows_complete_and_deterministic(spark):
    df = _read(spark, n=60).cache()
    # conversation c yields (c mod 7) + 1 tweets
    per_conv = {
        r.conversation_id: r.n
        for r in df.groupBy("conversation_id").agg(F.count("*").alias("n")).collect()
    }
    assert len(per_conv) == 60
    for c, n in per_conv.items():
        assert n == c % 7 + 1
    again = _read(spark, n=60)
    assert again.exceptAll(df).count() == 0 and df.exceptAll(again).count() == 0


def test_streaming_dedup_within_watermark(spark, tmp_path):
    """Overlapping re-fetches are the reference's INSERT IGNORE case
    in stream form: dropDuplicatesWithinWatermark on the id keeps
    exactly-once rows while state stays bounded by the watermark."""
    import pandas as pd

    events = spark.createDataFrame(
        pd.DataFrame(
            {
                "event_id": [1, 2, 2, 3, 3, 3],
                "ts": pd.to_datetime(
                    ["2024-01-01 10:00"] * 6
                ),
            }
        )
    )
    path = str(tmp_path / "in")
    events.write.mode("overwrite").parquet(path)
    stream = (
        spark.readStream.schema("event_id long, ts timestamp")
        .parquet(path)
        .withWatermark("ts", "1 hour")
        .dropDuplicatesWithinWatermark(["event_id"])
    )
    q = (
        stream.writeStream.format("memory")
        .queryName("dedup_stream")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = sorted(r.event_id for r in spark.table("dedup_stream").collect())
    assert got == [1, 2, 3]
