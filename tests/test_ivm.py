"""Incremental view maintenance: merging ANY split's partials equals
the full recompute, decimal sums included."""

from __future__ import annotations

from pyspark.sql import functions as F

from convoy_spark.queries.relational import (
    merge_rollup_partials,
    rollup_partials,
)
from convoy_spark.tables import load_table

SF_DIR = "/root/testdata/sf0.001"


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_merge_of_any_split_equals_recompute(spark):
    li = load_table(spark, SF_DIR, "lineitem")
    want = _rows(rollup_partials(li))
    for den, rem in [(2, 0), (3, 1), (7, 6)]:
        left = li.filter(F.col("l_linenumber") % den == rem)
        right = li.filter(F.col("l_linenumber") % den != rem)
        got = _rows(
            merge_rollup_partials(
                rollup_partials(left), rollup_partials(right)
            )
        )
        assert got == want, (den, rem)


def test_merge_is_associative_three_way(spark):
    li = load_table(spark, SF_DIR, "lineitem")
    parts = [
        rollup_partials(li.filter(F.col("l_linenumber") % 3 == k))
        for k in range(3)
    ]
    ab_c = merge_rollup_partials(
        merge_rollup_partials(parts[0], parts[1]), parts[2]
    )
    a_bc = merge_rollup_partials(
        parts[0], merge_rollup_partials(parts[1], parts[2])
    )
    assert _rows(ab_c) == _rows(a_bc) == _rows(rollup_partials(li))
