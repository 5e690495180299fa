"""Graph algorithms (operators/graph.py): PageRank on hand-built
graphs vs a pure-Python fixed-point reference, triangle counting vs
brute-force enumeration, and heavy hitters vs exact counting — plus
the oracle differential for all three catalog entries at sf0.001.
"""

from __future__ import annotations

import itertools
import random

import pytest
from pyspark.sql import functions as F

from convoy_spark.operators.graph import (
    PR_BASE,
    PR_DAMP_NUM,
    PR_SCALE,
    pagerank,
    triangle_counts,
)
from convoy_spark.operators.heavyhitters import heavy_hitters
from convoy_spark.queries import ORACLES, QUERIES
from tests.conftest import SF_DIR, assert_frames_match


def _pagerank_py(edges: list[tuple[int, int]], iters: int) -> dict[int, int]:
    deg: dict[int, int] = {}
    for s, _ in edges:
        deg[s] = deg.get(s, 0) + 1
    nodes = {v for e in edges for v in e}
    m = {v: PR_SCALE for v in nodes}
    for _ in range(iters):
        acc: dict[int, int] = {}
        for s, d in edges:
            acc[d] = acc.get(d, 0) + m[s] // deg[s]
        m = {
            v: PR_BASE + (PR_DAMP_NUM * acc.get(v, 0)) // PR_SCALE
            for v in nodes
        }
    return m


def test_pagerank_matches_python_reference(spark):
    rng = random.Random(7)
    nodes = list(range(40))
    und = {
        tuple(sorted(rng.sample(nodes, 2)))
        for _ in range(120)
    }
    edges = [(a, b) for a, b in und] + [(b, a) for a, b in und]
    df = spark.createDataFrame(edges, "src long, dst long")
    got = {r["id"]: r["m"] for r in pagerank(df, iters=4).collect()}
    want = _pagerank_py(edges, iters=4)
    assert got == want


def test_pagerank_chain_masses(spark):
    # directed chain 0->1->2: sources decay to base mass, sinks keep
    # receiving — closed-form fixed-point values after 2 iterations
    edges = [(0, 1), (1, 2)]
    df = spark.createDataFrame(edges, "src long, dst long")
    got = {r["id"]: r["m"] for r in pagerank(df, iters=2).collect()}
    assert got == _pagerank_py(edges, iters=2)
    # explicit closed forms: node 0 has no in-edges at all
    assert got[0] == PR_BASE
    assert got[1] == PR_BASE + (PR_DAMP_NUM * PR_BASE) // PR_SCALE


def _triangles_py(und: set[tuple[int, int]]) -> dict[int, int]:
    adj: dict[int, set[int]] = {}
    for a, b in und:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    counts: dict[int, int] = {}
    for u, v, w in itertools.combinations(sorted(adj), 3):
        if v in adj[u] and w in adj[u] and w in adj[v]:
            for n in (u, v, w):
                counts[n] = counts.get(n, 0) + 1
    return counts


def test_triangle_counts_matches_bruteforce(spark):
    rng = random.Random(13)
    nodes = list(range(30))
    und = {tuple(sorted(rng.sample(nodes, 2))) for _ in range(140)}
    df = spark.createDataFrame(list(und), "p long, q long")
    got = {r["node_id"]: r["n_triangles"] for r in triangle_counts(df).collect()}
    assert got == _triangles_py(und)


def test_triangle_counts_single_triangle(spark):
    df = spark.createDataFrame(
        [(1, 2), (2, 3), (1, 3), (3, 4)], "p long, q long"
    )
    got = {r["node_id"]: r["n_triangles"] for r in triangle_counts(df).collect()}
    assert got == {1: 1, 2: 1, 3: 1}


def test_heavy_hitters_exact_small(spark):
    # skewed synthetic corpus: token "t0" in every doc, long tail unique
    docs = [
        (i, "t0 " + " ".join(f"u{i}_{j}" for j in range(9)))
        for i in range(200)
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    # N = 2000 tokens; threshold freq * 100 > 2000 -> freq > 20
    out = {
        r["token"]: r["freq"]
        for r in heavy_hitters(df, k_inv=100, summary_size=256).collect()
    }
    assert out == {"t0": 200}


def test_heavy_hitters_superset_guarantee_tight(spark):
    # summary barely above threshold (m + 1 == k_inv): guarantee holds
    docs = [(i, " ".join(f"w{j}" for j in range(50))) for i in range(40)]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    out = heavy_hitters(df, k_inv=64, summary_size=63).collect()
    # every one of the 50 tokens has freq 40; N=2000; 40*64=2560 > 2000
    assert len(out) == 50
    assert all(r["freq"] == 40 for r in out)


@pytest.mark.parametrize(
    "name", ["pagerank_scores", "triangle_part_counts", "heavy_hitters"]
)
def test_oracle_differential(spark, duck, name):
    spdf = QUERIES[name](spark, SF_DIR).toPandas()
    opdf = duck.execute(ORACLES[name]).fetchdf()
    assert_frames_match(spdf, opdf, name)


def test_label_propagation_parity(spark, duck):
    from tests.conftest import run_parity

    run_parity(spark, duck, "label_propagation_communities")


def test_community_rollup_parity(spark, duck):
    from tests.conftest import run_parity

    run_parity(spark, duck, "community_rollup")


def test_community_rollup_accounting(spark):
    """Every lineitem whose part appears in the co-purchase graph is
    counted exactly once across communities, and n_parts sums to the
    graph's node count — the rollup neither drops nor double-counts."""
    from convoy_spark.queries.graph import (
        _copurchase_labels,
        community_rollup,
    )
    from convoy_spark.tables import load_table

    prof = community_rollup(spark, SF_DIR).collect()
    labs = _copurchase_labels(spark, SF_DIR)
    li = load_table(spark, SF_DIR, "lineitem")
    in_graph = li.join(
        labs.selectExpr("id AS l_partkey"), "l_partkey"
    ).count()
    assert sum(r["n_lineitems"] for r in prof) == in_graph
    assert sum(r["n_parts"] for r in prof) == labs.count()


def test_label_propagation_planted_communities(spark):
    """Two dense cliques joined by one bridge edge must resolve to two
    communities (each clique converges to its minimum id's label under
    the deterministic argmax), and an isolated node keeps its own
    label."""
    from convoy_spark.operators.graph import label_propagation

    cliqueA = [(u, v) for u in range(5) for v in range(5) if u != v]
    cliqueB = [(u, v) for u in range(10, 15) for v in range(10, 15) if u != v]
    bridge = [(4, 10), (10, 4)]
    loner = [(99, 99)]  # self-loop keeps the node in the graph
    edges = spark.createDataFrame(
        cliqueA + cliqueB + bridge + loner, ["u", "v"]
    )
    labs = {r.id: r.label for r in label_propagation(edges).collect()}
    assert len({labs[i] for i in range(5)}) == 1
    assert len({labs[i] for i in range(10, 15)}) == 1
    assert labs[0] != labs[10]
    assert labs[99] == 99
