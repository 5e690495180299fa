"""Z-order layout: Morton key vs a pure-Python bit-interleave
reference; the skipping-effectiveness property (bucket envelopes
tight on BOTH dimensions, unlike a single-column sort); oracle
differential for the catalog entry."""

from __future__ import annotations

import random

from pyspark.sql import functions as F

from convoy_spark.operators.scale import (
    zorder_bucket_stats,
    zorder_key,
)
from convoy_spark.queries import ORACLES, QUERIES
from tests.conftest import SF_DIR, assert_frames_match


def _morton_py(x: int, y: int, bits: int = 16) -> int:
    out = 0
    for i in range(bits):
        out |= ((x >> i) & 1) << (2 * i)
        out |= ((y >> i) & 1) << (2 * i + 1)
    return out


def test_zorder_key_matches_python(spark):
    rng = random.Random(3)
    rows = [(rng.randrange(65536), rng.randrange(65536)) for _ in range(500)]
    df = spark.createDataFrame(rows, "x long, y long")
    got = df.select(
        "x", "y", zorder_key(F.col("x"), F.col("y")).alias("z")
    ).collect()
    for r in got:
        assert r.z == _morton_py(r.x, r.y)


def test_zorder_buckets_tight_on_both_dims(spark):
    # uniform 2-D data: after Z-bucketing, the mean per-bucket extent
    # on EACH dimension must be far below the global extent — the
    # data-skipping property a single-column sort only has on one dim
    rng = random.Random(9)
    rows = [(rng.randrange(65536), rng.randrange(65536)) for _ in range(20000)]
    df = spark.createDataFrame(rows, "x long, y long")
    stats = zorder_bucket_stats(df, "x", "y", n_bucket_bits=6).collect()
    assert len(stats) == 64
    ext_x = sum(r["max_x"] - r["min_x"] for r in stats) / len(stats)
    ext_y = sum(r["max_y"] - r["min_y"] for r in stats) / len(stats)
    # 64 buckets tile the 2-D space 8x8: each dimension's extent
    # shrinks ~8x; allow slack for edge raggedness
    assert ext_x < 65536 / 4
    assert ext_y < 65536 / 4
    # and a predicate on either single dimension skips most buckets:
    # count buckets whose x-envelope intersects a 1/16-wide slice
    lo, hi = 30000, 30000 + 4096
    touching = sum(
        1 for r in stats if not (r["max_x"] < lo or r["min_x"] > hi)
    )
    assert touching <= len(stats) // 4


def test_zorder_oracle_differential(spark, duck):
    spdf = QUERIES["zorder_layout"](spark, SF_DIR).toPandas()
    opdf = duck.execute(ORACLES["zorder_layout"]).fetchdf()
    assert_frames_match(spdf, opdf, "zorder_layout")
