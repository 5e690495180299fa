"""transformWithState incremental closure (streaming/stateful_graph).

The ClosureProcessor union-find logic is tested directly against an
in-memory MapState double — first-wins, out-of-order healing, random
arrival order vs the one-shot batch closure. The Spark wiring tests
skip when ``google.protobuf`` is absent: PySpark's transformWithState
Python protocol needs it and this container doesn't ship it (see the
module docstring — environment-blocked, same class as Delta MERGE).
"""

from __future__ import annotations

import random

import pandas as pd
import pytest

from convoy_spark.operators.closure import closure_roots
from convoy_spark.streaming.stateful_graph import ClosureProcessor

EDGE_SCHEMA = "child_id long, parent_id long"


def _protobuf_available() -> bool:
    try:
        from google.protobuf import descriptor  # noqa: F401

        return True
    except ImportError:
        return False


class FakeMapState:
    """Dict-backed stand-in for pyspark MapState (tuple-key/value
    protocol, point lookups only — mirrors the real API surface the
    processor touches)."""

    def __init__(self):
        self.d: dict[tuple, tuple] = {}

    def containsKey(self, k):
        return k in self.d

    def getValue(self, k):
        return self.d[k]

    def updateValue(self, k, v):
        self.d[k] = v

    def removeKey(self, k):
        self.d.pop(k, None)


class FakeHandle:
    def __init__(self):
        self.states = {}

    def getMapState(self, name, _ks, _vs, ttlDurationMs=None):
        self.states[name] = FakeMapState()
        return self.states[name]


def _drive(batches):
    """Feed edge batches through a ClosureProcessor with fake state;
    return (mirror-of-upserts, per-batch upsert counts)."""
    proc = ClosureProcessor()
    proc.init(FakeHandle())
    mirror: dict[int, int] = {}
    counts = []
    for batch in batches:
        pdf = pd.DataFrame(batch, columns=["child_id", "parent_id"])
        out = list(proc.handleInputRows((0,), iter([pdf]), None))
        n = 0
        for opdf in out:
            for node, root in zip(opdf["node_id"], opdf["root_id"]):
                mirror[int(node)] = int(root)
                n += 1
        counts.append(n)
    return mirror, counts


def _batch_want(spark, edges):
    return {
        r.node_id: r.root_id
        for r in closure_roots(
            spark.createDataFrame(edges, EDGE_SCHEMA)
        ).collect()
    }


def test_processor_matches_batch(spark):
    b1 = [(1, None), (2, 1), (10, None)]
    b2 = [(3, 2), (11, 10), (4, 3)]
    mirror, _ = _drive([b1, b2])
    assert mirror == _batch_want(spark, b1 + b2)


def test_processor_out_of_order_heals(spark):
    # round-2 advice scenario, state-store edition: (3→2) arrives
    # before node 2; (2→1) later must heal 3→1 via the upsert stream.
    mirror, counts = _drive([[(3, 2)], [(2, 1), (1, None)]])
    assert mirror == {1: 1, 2: 1, 3: 1}
    # the heal rode the second batch's output (3 upserts: 1, 2, and
    # the corrected 3) — per-batch output stays O(changed)
    assert counts == [1, 3]


def test_processor_first_wins(spark):
    mirror, _ = _drive([[(1, None), (2, 1)], [(2, 9), (9, None)]])
    assert mirror == {1: 1, 2: 1, 9: 9}


def test_processor_random_order_matches_batch(spark):
    rng = random.Random(11)
    edges = []
    for i in range(1, 151):
        if i == 1 or rng.random() < 0.25:
            edges.append((i, None))
        else:
            edges.append((i, rng.randint(1, i - 1)))
    shuffled = edges[:]
    rng.shuffle(shuffled)
    batches = [shuffled[i : i + 25] for i in range(0, len(shuffled), 25)]
    mirror, _ = _drive(batches)
    assert mirror == _batch_want(spark, edges)


def test_processor_deep_chain_reverse_arrival(spark):
    # worst-case healing cascade: a chain delivered leaf-first, one
    # edge per batch — every batch heals the whole suffix
    n = 12
    edges = [(i, i - 1) for i in range(2, n + 1)] + [(1, None)]
    batches = [[e] for e in edges]
    mirror, _ = _drive(batches)
    assert mirror == {i: 1 for i in range(1, n + 1)}


@pytest.mark.skipif(
    not _protobuf_available(),
    reason="google.protobuf not in container — transformWithState "
    "Python protocol unavailable (environment-blocked, see module doc)",
)
def test_stateful_closure_end_to_end(spark, tmp_path):
    spark.conf.set(
        "spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state."
        "RocksDBStateStoreProvider",
    )
    from convoy_spark.streaming.stateful_graph import run_stateful_closure

    landing = tmp_path / "edges"
    ckpt = str(tmp_path / "ckpt")
    mirror: dict[int, int] = {}

    def sink(batch_df, _bid):
        for r in batch_df.collect():
            mirror[r.node_id] = r.root_id

    b1 = [(1, None), (2, 1), (10, None)]
    b2 = [(3, 2), (11, 10), (4, 3)]
    spark.createDataFrame(b1, EDGE_SCHEMA).coalesce(1).write.parquet(
        str(landing / "drop1")
    )
    run_stateful_closure(spark, str(landing / "*"), ckpt, sink)
    spark.createDataFrame(b2, EDGE_SCHEMA).coalesce(1).write.parquet(
        str(landing / "drop2")
    )
    run_stateful_closure(spark, str(landing / "*"), ckpt, sink)
    assert mirror == _batch_want(spark, b1 + b2)
