"""Registry machinery for the query catalog.

Each entry couples a Spark implementation with (optionally) an ANSI-SQL
oracle string that DuckDB runs over identical parquet. The driver
compares row count + schema + order-insensitive value hash at sf=0.01,
so:

- every computed column is aliased identically on both sides;
- aggregate sums/averages over doubles go through
  :func:`convoy_spark.functions.numeric.dsum` (decimal-exact, then cast
  to double) on both sides, because IEEE summation order differs
  between engines while decimal summation is exact and associative.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

QUERIES: dict[str, QueryFn] = {}
ORACLES: dict[str, str] = {}


def query(name: str, oracle: str | None = None) -> Callable[[QueryFn], QueryFn]:
    """Register a catalog query; ``oracle`` is DuckDB SQL or None for
    non-SQL-expressible operators (driver then runs a rows-only check).
    """

    def deco(fn: QueryFn) -> QueryFn:
        if name in QUERIES:
            raise ValueError(f"duplicate query name: {name}")
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn

    return deco
