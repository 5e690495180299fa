#!/usr/bin/env python
"""Spot-check one catalog query vs its DuckDB oracle, emulator-style.

Usage: python tools/check_one.py <query_name> [sf_dir]
"""

from __future__ import annotations

import sys

sys.path.insert(0, "/root/repo")

import duckdb

from tools.driver_emulator import value_hash


def main() -> int:
    name = sys.argv[1]
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.01"
    from pyspark.sql import SparkSession

    from convoy_spark.queries import ORACLES, QUERIES
    from convoy_spark.tables import TABLE_NAMES, table_path

    spark = (
        SparkSession.builder.master("local[8]")
        .appName("check-one")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    spdf = QUERIES[name](spark, sf_dir).toPandas()
    if name not in ORACLES:
        print(f"{name}: rows_only rows={len(spdf)}")
        return 0
    con = duckdb.connect()
    for t in TABLE_NAMES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{table_path(sf_dir, t)}')"
        )
    opdf = con.execute(ORACLES[name]).fetchdf()
    ok_rows = len(spdf) == len(opdf)
    ok_schema = sorted(spdf.columns) == sorted(opdf.columns)
    ok_hash = value_hash(spdf) == value_hash(opdf)
    print(
        f"{name}: rows={len(spdf)}/{len(opdf)} rows_match={ok_rows} "
        f"schema_match={ok_schema} ({sorted(spdf.columns)} vs "
        f"{sorted(opdf.columns)}) hash_match={ok_hash}"
    )
    if not ok_hash and ok_rows and ok_schema:
        cols = sorted(spdf.columns)
        print(spdf[cols].sort_values(cols).head(5))
        print(opdf[cols].sort_values(cols).head(5))
    spark.stop()
    return 0 if (ok_rows and ok_schema and ok_hash) else 1


if __name__ == "__main__":
    sys.exit(main())
