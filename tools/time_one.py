#!/usr/bin/env python
"""Time one (or more) catalog queries at a given SF, bench-style.

Usage: python tools/time_one.py <q1,q2,...> [sf_dir] [runs]

Same protocol as bench.py: one untimed warm-up execution, then the
median of ``runs`` noop-sink executions; loadavg printed per row so a
contended sample self-documents (the round-6 graph-family lesson —
absolute timings recorded without the host state are unreproducible).
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from convoy_spark.session import get_spark  # noqa: E402


def main() -> int:
    names = sys.argv[1].split(",")
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
    runs = int(sys.argv[3]) if len(sys.argv) > 3 else 3
    spark = get_spark("convoy-spark-time-one", data_dir=sf_dir)
    from convoy_spark.queries import QUERIES

    spark.range(1000).selectExpr("sum(id)").collect()
    for name in names:
        QUERIES[name](spark, sf_dir).write.format("noop").mode(
            "overwrite"
        ).save()
        samples = []
        for _ in range(runs):
            t0 = time.perf_counter()
            QUERIES[name](spark, sf_dir).write.format("noop").mode(
                "overwrite"
            ).save()
            samples.append(round(time.perf_counter() - t0, 3))
        med = sorted(samples)[len(samples) // 2]
        print(
            f"{name} @ {sf_dir}: median={med}s samples={samples} "
            f"loadavg={os.getloadavg()[0]:.1f}"
        )
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
