"""Multimodal plumbing tests: binary schema, Arrow batch shape,
stubbed real path, frame sampling fan-out."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from convoy_spark.operators.multimodal import (
    decode_media,
    frame_sample,
    media_from_documents,
    resize_meta,
)
from convoy_spark.tables import load_table

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def media(spark):
    return media_from_documents(load_table(spark, SF_DIR, "documents")).cache()


def test_payload_is_binary(media):
    assert dict(media.dtypes)["payload"] == "binary"


def test_decode_meta_consistent(media):
    row = decode_media(media).filter(F.col("media_id") == 0).first()
    src = media.filter(F.col("media_id") == 0).first()
    n = len(src.payload)
    assert row.byte_len == n
    assert row.width == 64 + n % 512
    assert row.height == 64 + (n * 7) % 512
    assert row.channels == 1 + src.payload[0] % 3


def test_real_decode_is_stubbed(media):
    with pytest.raises(Exception) as ei:
        decode_media(media, real=True).collect()
    assert "NotImplementedError" in str(ei.value) or isinstance(
        ei.value, NotImplementedError
    )


def test_resize_plan_bounds(media):
    out = resize_meta(decode_media(media), max_side=256)
    bad = out.filter(
        (F.greatest("out_width", "out_height") > 256)
        | (F.col("out_width") < 1)
        | (F.col("out_height") < 1)
        | (F.col("scale") > 1.0)
    ).count()
    assert bad == 0


def test_frame_sample_shape(media):
    frames = frame_sample(media, n_frames=4)
    n_videos = media.filter(F.col("kind") == "video").count()
    assert frames.count() == 4 * n_videos
    per = frames.groupBy("media_id").count().select("count").distinct().collect()
    assert [r["count"] for r in per] == [4]
    # deterministic across partitionings
    f1 = {(r.media_id, r.frame_idx): r.frame_hash for r in frames.collect()}
    f2 = {
        (r.media_id, r.frame_idx): r.frame_hash
        for r in frame_sample(media.repartition(5), 4).collect()
    }
    assert f1 == f2
