#!/usr/bin/env python
"""Stage-split timing for the graph family (round-6 verdict #3: the
recorded triangle absolutes were not reproducible — re-measure with
medians-of-3 and per-sample loadavg, and split the triangle plan so
the variance has a located owner).

Usage: python tools/time_graph_split.py [sf_dir] [runs]

Splits triangle_part_counts into cumulative prefixes:
  1. edges   — copurchase_edges distinct (per-order self-join)
  2. orient  — + degree table + (deg,id)-oriented edge list
  3. wedges  — + pivot out-neighborhood wedge enumeration
  4. full    — + closing left-semi join + corner counts
Each prefix is an independent noop-sink execution (warm-up + median of
``runs``), so stage cost = prefix_n − prefix_{n−1} up to re-executed
shared work (the oriented frame is localCheckpointed inside
triangle_counts; prefixes reproduce that).
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from convoy_spark.session import get_spark  # noqa: E402


def _med(frame_fn, runs):
    frame_fn().write.format("noop").mode("overwrite").save()
    ts = []
    for _ in range(runs):
        t0 = time.perf_counter()
        frame_fn().write.format("noop").mode("overwrite").save()
        ts.append(round(time.perf_counter() - t0, 3))
    return sorted(ts)[len(ts) // 2], ts


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    runs = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    spark = get_spark("convoy-spark-graphsplit", data_dir=sf_dir)
    from convoy_spark.operators.graph import copurchase_edges
    from convoy_spark.tables import load_table

    spark.range(1000).selectExpr("sum(id)").collect()

    def edges():
        li = load_table(spark, sf_dir, "lineitem")
        return copurchase_edges(li)

    def und():
        e = edges()
        return (
            e.select(F.least("p", "q").alias("a"), F.greatest("p", "q").alias("b"))
            .where(F.col("a") != F.col("b"))
            .distinct()
        )

    def oriented():
        u = und()
        adj = u.select(F.col("a").alias("u"), F.col("b").alias("v")).unionByName(
            u.select(F.col("b").alias("u"), F.col("a").alias("v"))
        )
        deg = adj.groupBy("u").agg(F.count(F.lit(1)).alias("d"))
        return (
            adj.join(deg.withColumnsRenamed({"u": "u1", "d": "du"}),
                     F.col("u") == F.col("u1"))
            .join(deg.withColumnsRenamed({"u": "v1", "d": "dv"}),
                  F.col("v") == F.col("v1"))
            .where(
                (F.col("du") < F.col("dv"))
                | ((F.col("du") == F.col("dv")) & (F.col("u") < F.col("v")))
            )
            .select("u", "v", "dv")
        )

    def wedges():
        o = oriented().localCheckpoint(eager=False)
        e2 = o.select(
            F.col("u").alias("u2"), F.col("v").alias("w"), F.col("dv").alias("dw")
        )
        return (
            o.join(e2, F.col("u") == F.col("u2"))
            .where(
                (F.col("dv") < F.col("dw"))
                | ((F.col("dv") == F.col("dw")) & (F.col("v") < F.col("w")))
            )
            .select("u", "v", "w")
        )

    def full():
        from convoy_spark.operators.graph import triangle_counts

        return triangle_counts(edges())

    for name, fn in [
        ("1_edges_distinct", edges),
        ("2_und_distinct", und),
        ("3_oriented", oriented),
        ("4_wedges", wedges),
        ("5_full_triangles", full),
    ]:
        med, ts = _med(fn, runs)
        print(
            f"{name}: median={med}s samples={ts} "
            f"loadavg={os.getloadavg()[0]:.1f}"
        )
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
