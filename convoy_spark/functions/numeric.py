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

**The exactness contract, decided (round 3):** decimal accumulation is
the DEFAULT and the shipped contract. The measured cost is ~2.5× on
sum-dominated stages (BENCH_NOTES.md "decimal premium" — pricing
summary pays ~1.2 s vs a ~0.5 s double version at sf0.1); the benefit
is bit-identical results across engines, partitionings and cluster
sizes, which is (a) what makes 70+ catalog queries full-value-hash
verifiable against an independent engine, and (b) the difference
between a reproducible and an unreproducible pipeline at 100 TB —
the silent-wrongness class (long overflow, run-to-run float drift)
this engine refuses. Deployments that explicitly prefer speed over
bit-reproducibility can flip ``CONVOY_EXACT_AGG=0`` (or pass
``exact=False`` per call) to get plain double sums — the two profiles
are cross-checked within float tolerance in
``tests/test_numeric_profiles.py``, so the fast path is tested, not a
footgun. Oracle SQL fragments intentionally have no fast profile: the
oracle's entire job is exact comparison.
"""

from __future__ import annotations

import os

from pyspark.sql import Column
from pyspark.sql import functions as F

DEC = "decimal(18,6)"
# Stored-partial type for mergeable rollups (IVM, streaming stores):
# sums of DEC values widen per merge level, and an unbounded chain of
# merges must keep ONE stable stored schema — so every merge re-narrows
# to this. Single source of truth (round-6 ADVICE #4: this type used to
# exist as string surgery in three hand-synced places, and a DEC
# precision change would have silently broken stream==batch).
DEC_MERGED = "decimal(28,6)"

# Module default for the aggregation profile; see the contract note
# above. Read at call time so tests (and embedding applications) can
# toggle it without re-importing query modules.
EXACT_DEFAULT = os.environ.get("CONVOY_EXACT_AGG", "1") != "0"


def dsum(col: Column, exact: bool | None = None) -> Column:
    """Order-insensitive double sum (decimal-exact by default;
    ``exact=False`` → plain double accumulation, the fast profile)."""
    if exact is None:
        exact = EXACT_DEFAULT
    if not exact:
        return F.sum(col.cast("double"))
    return F.sum(col.cast(DEC)).cast("double")


def davg(col: Column, exact: bool | None = None) -> Column:
    """Order-insensitive double mean: decimal sum / count (or plain
    double mean under the fast profile)."""
    if exact is None:
        exact = EXACT_DEFAULT
    if not exact:
        return F.sum(col.cast("double")) / F.count(col)
    return F.sum(col.cast(DEC)).cast("double") / F.count(col)


def sql_dsum(expr: str) -> str:
    """DuckDB fragment matching :func:`dsum` (exact profile only —
    the oracle exists to compare exactly)."""
    return f"CAST(SUM(CAST(({expr}) AS DECIMAL(18,6))) AS DOUBLE)"


def sql_davg(expr: str) -> str:
    """DuckDB fragment matching :func:`davg`."""
    return f"CAST(SUM(CAST(({expr}) AS DECIMAL(18,6))) AS DOUBLE) / COUNT({expr})"
