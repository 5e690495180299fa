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

# (name, key width): leading identifier columns that uniquely key a
# row — pca_topk rows are unique on (component, d), the others on
# their first column (pricing's 2-col group key included via width 2).
FLOAT_QUERIES = [
    ("pricing_summary", 2),
    ("flagship_conversation_rollup", 1),
    # round 5: the PCA family's _xsum joins the profile switch — the
    # fast path runs the same power iteration on plain double sums
    # (both the k=1 and the deflation-chain forms, since bench
    # publishes fast timings for both)
    ("pca_top_component", 1),
    ("pca_topk_components", 2),
]


@pytest.mark.parametrize("name,kw", FLOAT_QUERIES)
def test_fast_profile_tracks_exact(spark, name, kw, monkeypatch):
    exact_rows = {
        tuple(str(v) for v in row[:kw]): row.asDict()
        for row in QUERIES[name](spark, SF_DIR).collect()
    }
    monkeypatch.setattr(numeric, "EXACT_DEFAULT", False)
    fast_rows = {
        tuple(str(v) for v in row[:kw]): row.asDict()
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
