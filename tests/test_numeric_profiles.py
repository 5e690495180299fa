"""The two aggregation profiles (decimal-exact contract vs double
fast path, functions/numeric.py round-3 decision) must agree within
float tolerance on real queries — the fast profile is a tested,
deliberate trade, not a silent divergence."""

from __future__ import annotations

import math

import pytest

from convoy_spark.functions import numeric
from convoy_spark.queries import QUERIES

SF_DIR = "/root/testdata/sf0.01"

FLOAT_QUERIES = [
    "pricing_summary",
    "flagship_conversation_rollup",
    # round 5: the PCA family's _xsum joins the profile switch — the
    # fast path runs the same power iteration on plain double sums
    "pca_top_component",
]


@pytest.mark.parametrize("name", FLOAT_QUERIES)
def test_fast_profile_tracks_exact(spark, name, monkeypatch):
    exact_rows = {
        tuple(str(v) for v in row[:1]): row.asDict()
        for row in QUERIES[name](spark, SF_DIR).collect()
    }
    monkeypatch.setattr(numeric, "EXACT_DEFAULT", False)
    fast_rows = {
        tuple(str(v) for v in row[:1]): row.asDict()
        for row in QUERIES[name](spark, SF_DIR).collect()
    }
    assert set(exact_rows) == set(fast_rows)
    n_float = 0
    for key, erow in exact_rows.items():
        frow = fast_rows[key]
        for col, ev in erow.items():
            fv = frow[col]
            if isinstance(ev, float) and isinstance(fv, float):
                n_float += 1
                assert math.isclose(ev, fv, rel_tol=1e-9, abs_tol=1e-6), (
                    name,
                    key,
                    col,
                    ev,
                    fv,
                )
            else:
                assert ev == fv, (name, key, col)
    assert n_float > 0, "query exposes no float aggregates to compare"


def test_exact_is_the_default():
    assert numeric.EXACT_DEFAULT is True
