#!/usr/bin/env python
"""Time the DuckDB oracle side of every bench headline query at the
same SF and print the Spark-vs-baseline comparison the targets in
BASELINE.md are stated against. One JSON line:

    {"sf": ..., "duckdb_total": ..., "queries": {name: sec, ...}}

Run bench.py first (or alongside) to get the Spark line.
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb  # noqa: E402

from bench import BENCH_QUERIES  # noqa: E402
from convoy_spark.queries import ORACLES  # noqa: E402
from convoy_spark.tables import TABLE_NAMES  # noqa: E402


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    m = re.search(r"sf([0-9.]+)", sf_dir)
    con = duckdb.connect()
    for t in TABLE_NAMES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{os.path.join(sf_dir, t + '.parquet')}')"
        )
    timings = {}
    names = list(BENCH_QUERIES)
    only = os.environ.get("SPARK_GRAFT_BENCH_ONLY")
    if only:
        keep = {s.strip() for s in only.split(",") if s.strip()}
        names = [n for n in names if n in keep]
    for name in names:
        if name not in ORACLES:
            continue  # rows-only queries have no oracle to time
        t0 = time.perf_counter()
        con.execute(ORACLES[name]).fetchall()
        timings[name] = round(time.perf_counter() - t0, 4)
    print(
        json.dumps(
            {
                "sf": float(m.group(1)) if m else None,
                "duckdb_total": round(sum(timings.values()), 4),
                "queries": timings,
            }
        )
    )


if __name__ == "__main__":
    main()
