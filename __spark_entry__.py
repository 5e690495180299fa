"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

The actual implementations live in :mod:`convoy_spark`; this module is
a thin re-export of the catalog registry.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

# The driver may import this file by path with an arbitrary cwd; make
# the sibling convoy_spark package importable regardless.
_REPO_ROOT = os.path.dirname(os.path.abspath(__file__))
if _REPO_ROOT not in sys.path:
    sys.path.insert(0, _REPO_ROOT)

# Executor Python workers inherit PYTHONPATH from the JVM, which reads
# it at session launch. If the driver imports this module BEFORE
# building its SparkSession (the usual order), exporting here makes
# the package importable inside Pandas-UDF workers without any session
# config; operators that pickle package functions additionally call
# session.ensure_executor_imports (addPyFile) in case the session
# already existed.
_pp = os.environ.get("PYTHONPATH", "")
if _REPO_ROOT not in _pp.split(os.pathsep):
    os.environ["PYTHONPATH"] = _REPO_ROOT + (os.pathsep + _pp if _pp else "")


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    from convoy_spark.queries import QUERIES

    return QUERIES["flagship_conversation_rollup"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    from convoy_spark.queries import QUERIES

    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL oracle per query (omitted entries get a
    rows-only check)."""
    from convoy_spark.queries import ORACLES

    return dict(ORACLES)
