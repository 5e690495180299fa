"""DuckDB-oracle parity for the full catalog: every registered query
with an oracle must hash-match (SURVEY §5 strategy #2). This is the
same check the driver runs at sf0.01; we run it at sf0.001 for speed
and rely on tools/driver_emulator.py for the sf0.01 pass."""

from __future__ import annotations

import pytest

from convoy_spark.queries import ORACLES, QUERIES
from tests.conftest import run_parity

# Queries whose result is legitimately empty at sf0.001 (the assertion
# then only checks parity, not non-emptiness).
MAY_BE_EMPTY: set[str] = set()


@pytest.mark.parametrize("name", sorted(ORACLES))
def test_oracle_parity(spark, duck, name):
    pdf = run_parity(spark, duck, name)
    if name not in MAY_BE_EMPTY:
        assert len(pdf) > 0, f"{name}: empty result at test SF"


def test_all_queries_registered():
    # every oracle refers to a registered query
    assert set(ORACLES) <= set(QUERIES)
