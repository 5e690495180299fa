#!/usr/bin/env python
"""Check a subset of catalog queries against their DuckDB oracles —
same vanilla-session + value-hash contract as driver_emulator.py, but
only for the names given on the command line (fast iteration loop).

Usage: python tools/check_queries.py name1 name2 ... [--sf /root/testdata/sf0.01]
"""

from __future__ import annotations

import importlib.util
import json
import sys

import duckdb

sys.path.insert(0, "/root/repo/tools")
from driver_emulator import value_hash  # noqa: E402


def main() -> int:
    args = sys.argv[1:]
    sf_dir = "/root/testdata/sf0.01"
    if "--sf" in args:
        i = args.index("--sf")
        sf_dir = args[i + 1]
        args = args[:i] + args[i + 2 :]
    names = args

    spec = importlib.util.spec_from_file_location(
        "entry_mod", "/root/repo/__spark_entry__.py"
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)

    from pyspark.sql import SparkSession

    from convoy_spark.tables import TABLE_NAMES, table_path

    spark = (
        SparkSession.builder.master("local[8]")
        .appName("check-queries")
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

    queries = mod.queries()
    oracles = mod.oracle_sql()
    n_fail = 0
    for name in names:
        if name not in queries:
            print(f"{name}: NOT IN CATALOG")
            n_fail += 1
            continue
        spdf = queries[name](spark, sf_dir).toPandas()
        if name not in oracles:
            print(f"{name}: rows_only rows={len(spdf)}")
            continue
        opdf = con.execute(oracles[name]).fetchdf()
        ok_rows = len(spdf) == len(opdf)
        ok_schema = sorted(spdf.columns) == sorted(opdf.columns)
        ok_hash = value_hash(spdf) == value_hash(opdf)
        ok = ok_rows and ok_schema and ok_hash
        print(
            json.dumps(
                {
                    "name": name,
                    "status": "pass" if ok else "FAIL",
                    "rows": len(spdf),
                    "rows_match": ok_rows,
                    "schema_match": ok_schema,
                    "hash_match": ok_hash,
                }
            )
        )
        n_fail += not ok
    spark.stop()
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main())
