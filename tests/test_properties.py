"""Property-based tests (hypothesis; SURVEY §5 strategy #4): random
forests in, structural invariants out — for the closure and the tree
statistics. Few, large-ish examples: each property round-trips
through Spark, so we trade example count for example size."""

from __future__ import annotations

from hypothesis import given, settings, strategies as st

from convoy_spark.operators.closure import closure_roots
from convoy_spark.operators.treestats import tree_stats

EDGE_SCHEMA = "child_id long, parent_id long"


@st.composite
def forests(draw, max_nodes=60):
    """Random forest as (child, parent) edges: node i may attach to
    any earlier node — acyclic by construction."""
    n = draw(st.integers(min_value=1, max_value=max_nodes))
    edges = []
    for i in range(1, n + 1):
        if i == 1 or draw(st.booleans()):
            edges.append((i, None))
        else:
            edges.append((i, draw(st.integers(min_value=1, max_value=i - 1))))
    return edges


def _true_root(parents, node):
    while parents[node] is not None:
        node = parents[node]
    return node


@given(forests())
@settings(max_examples=8, deadline=None)
def test_closure_finds_true_roots(spark, edges):
    parents = dict(edges)
    got = {
        r.node_id: r.root_id
        for r in closure_roots(
            spark.createDataFrame(edges, EDGE_SCHEMA)
        ).collect()
    }
    assert got == {n: _true_root(parents, n) for n in parents}


@given(forests(max_nodes=40))
@settings(max_examples=6, deadline=None)
def test_tree_stats_invariants(spark, edges):
    """The reference's own guards (`3_create_tweet_stats_i.py:244-247`)
    plus conservation laws: Σ(1+descendants over roots) = n,
    leaf counts bounded by descendants, max_depth ≤ descendants,
    mean depth between 1 and max_depth for non-leaves."""
    n = len(edges)
    parents = dict(edges)
    rows = tree_stats(spark.createDataFrame(edges, EDGE_SCHEMA)).collect()
    assert len(rows) == n
    by_id = {r.node_id: r for r in rows}
    root_mass = sum(
        1 + by_id[i].n_descendants for i in by_id if parents[i] is None
    )
    assert root_mass == n
    for r in rows:
        assert 0 <= r.n_leaf_descendants <= r.n_descendants
        assert r.max_depth <= r.n_descendants
        if r.n_leaf_descendants:
            assert 1.0 <= r.mean_leaf_depth <= r.max_depth
        else:
            assert r.mean_leaf_depth == 0.0 and r.max_depth == 0
