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
    # Per-query wall cap (seconds) via duckdb's interrupt — used by
    # the large-SF slope runs, where some oracle CTE chains blow up
    # superlinearly (the re-evaluation cost the engine's checkpointed
    # frames avoid). A timed-out query records -1 and is reported so
    # the comparison can say "oracle did not complete within T".
    cap = float(os.environ.get("SPARK_GRAFT_BASELINE_TIMEOUT_S", "0")) or None
    import threading

    for name in names:
        if name not in ORACLES:
            continue  # rows-only queries have no oracle to time
        t0 = time.perf_counter()
        timer = None
        if cap:
            timer = threading.Timer(cap, con.interrupt)
            timer.start()
        try:
            con.execute(ORACLES[name]).fetchall()
            timings[name] = round(time.perf_counter() - t0, 4)
        except duckdb.InterruptException:
            timings[name] = -1.0  # did not complete within cap
        finally:
            if timer:
                timer.cancel()
        print(f"# {name}: {timings[name]}", file=sys.stderr, flush=True)
    print(
        json.dumps(
            {
                "sf": float(m.group(1)) if m else None,
                "duckdb_total": round(
                    sum(v for v in timings.values() if v >= 0), 4
                ),
                "timed_out": [k for k, v in timings.items() if v < 0],
                "queries": timings,
            }
        )
    )


if __name__ == "__main__":
    main()
