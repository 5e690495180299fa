#!/usr/bin/env python
"""Spot-check named catalog queries against their DuckDB oracles —
the driver_emulator comparison (row count + sorted schema + value
hash) scoped to a comma-separated subset, for fast iteration while
optimizing. Same vanilla session discipline as the emulator.

Usage: python tools/oracle_check.py q1,q2,... [sf_dir]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tools.driver_emulator import value_hash  # noqa: E402


def main() -> int:
    if len(sys.argv) < 2:
        print(__doc__, file=sys.stderr)
        return 2
    names = [s.strip() for s in sys.argv[1].split(",") if s.strip()]
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.01"

    import duckdb
    from pyspark.sql import SparkSession

    from convoy_spark.queries import ORACLES, QUERIES
    from convoy_spark.tables import TABLE_NAMES, table_path

    spark = (
        SparkSession.builder.master("local[8]")
        .appName("oracle-check")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    con = duckdb.connect()
    for name in TABLE_NAMES:
        con.execute(
            f"CREATE VIEW {name} AS SELECT * FROM "
            f"read_parquet('{table_path(sf_dir, name)}')"
        )
    rc = 0
    for name in names:
        spdf = QUERIES[name](spark, sf_dir).toPandas()
        if name not in ORACLES:
            print(f"{name}: rows_only rows={len(spdf)}")
            continue
        opdf = con.execute(ORACLES[name]).fetchdf()
        ok = (
            len(spdf) == len(opdf)
            and sorted(spdf.columns) == sorted(opdf.columns)
            and value_hash(spdf) == value_hash(opdf)
        )
        print(
            f"{name}: {'PASS' if ok else 'FAIL'} "
            f"rows={len(spdf)}/{len(opdf)}"
        )
        rc |= not ok
    spark.stop()
    return rc


if __name__ == "__main__":
    sys.exit(main())
