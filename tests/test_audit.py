"""Referential-integrity audit: injected orphans and NULL keys are
counted; a clean edge reports zeros."""

from __future__ import annotations

from pyspark.sql import functions as F

from convoy_spark.queries.relational import (
    _fk_edge_keyrows,
    _fk_edge_profile,
    fk_audit_edge,
)


def test_fk_audit_detects_orphans_and_nulls(spark):
    child = spark.createDataFrame(
        [(1, 10), (2, 10), (3, 20), (4, 99), (5, 99), (6, None)],
        "id long, fk long",
    )
    parent = spark.createDataFrame([(10,), (20,), (30,)], "pk long")
    row = fk_audit_edge(child, "fk", parent, "pk", "child.fk->parent").collect()[0]
    assert row.edge == "child.fk->parent"
    assert row.child_rows == 6
    assert row.null_fk_rows == 1
    assert row.orphan_rows == 2  # the two fk=99 rows
    assert row.orphan_keys == 1  # one distinct orphan value


def test_fk_audit_clean_edge(spark):
    child = spark.createDataFrame([(1, 10), (2, 20)], "id long, fk long")
    parent = spark.createDataFrame([(10,), (20,)], "pk long")
    row = fk_audit_edge(child, "fk", parent, "pk", "e").collect()[0]
    assert (row.null_fk_rows, row.orphan_rows, row.orphan_keys) == (0, 0, 0)


def test_fk_audit_empty_child_still_reports_row(spark):
    """One row per edge ALWAYS: an edge whose child scan produces zero
    key rows must still report an all-zero row (the oracle's per-edge
    global aggregate does; groupBy alone would drop the group)."""
    parent = spark.createDataFrame([(10,), (20,)], "pk long")
    full = spark.createDataFrame([(1, 10), (2, 99)], "id long, fk long")
    empty = full.filter(F.lit(False))
    keyrows = _fk_edge_keyrows(full, "fk", parent, "pk", "full").unionByName(
        _fk_edge_keyrows(empty, "fk", parent, "pk", "empty")
    )
    rows = {
        r.edge: r
        for r in _fk_edge_profile(keyrows, edges=["full", "empty"]).collect()
    }
    assert set(rows) == {"full", "empty"}
    e = rows["empty"]
    assert (e.child_rows, e.null_fk_rows, e.orphan_rows, e.orphan_keys) == (
        0, 0, 0, 0,
    )
    assert rows["full"].orphan_rows == 1

