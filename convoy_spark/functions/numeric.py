"""Deterministic numeric aggregation helpers.

Floating-point addition is not associative, so ``SUM(double)`` depends
on partition/visit order and differs between Spark and any oracle
engine (and between Spark runs at different parallelism). For every
aggregate the catalog exposes, we sum in fixed-point instead: cast each
operand to ``DECIMAL(18, 6)`` (exact, associative integer arithmetic
under the hood), sum, and cast the total back to double. Both engines
round the *same* IEEE double to 6 decimal digits, so per-row casts
agree; decimal sums are exact; the final decimal→double cast of equal
decimals is equal. Result: bit-identical aggregates at any parallelism
— which is also what makes the result stable across cluster sizes at
100 TB.

The SQL fragments mirror the Spark expressions 1:1; both are generated
here so the two sides cannot drift.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

DEC = "decimal(18,6)"


def dsum(col: Column) -> Column:
    """Order-insensitive double sum (decimal-exact)."""
    return F.sum(col.cast(DEC)).cast("double")


def davg(col: Column) -> Column:
    """Order-insensitive double mean: decimal sum / count."""
    return F.sum(col.cast(DEC)).cast("double") / F.count(col)


def sql_dsum(expr: str) -> str:
    """DuckDB fragment matching :func:`dsum`."""
    return f"CAST(SUM(CAST(({expr}) AS DECIMAL(18,6))) AS DOUBLE)"


def sql_davg(expr: str) -> str:
    """DuckDB fragment matching :func:`davg`."""
    return f"CAST(SUM(CAST(({expr}) AS DECIMAL(18,6))) AS DOUBLE) / COUNT({expr})"
