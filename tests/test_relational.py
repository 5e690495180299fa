"""DuckDB-oracle parity for the relational-core catalog queries
(SURVEY.md §5 strategy #2, run locally before the driver does)."""

from __future__ import annotations

import pytest

from tests.conftest import run_parity

RELATIONAL_QUERIES = [
    "flagship_conversation_rollup",
    "pricing_summary",
    "singleton_groups",
    "multi_tweet_conversations",
    "semi_join_filter",
    "calendar_projection",
]


@pytest.mark.parametrize("name", RELATIONAL_QUERIES)
def test_oracle_parity(spark, duck, name):
    pdf = run_parity(spark, duck, name)
    assert len(pdf) > 0, f"{name}: empty result at test SF"
