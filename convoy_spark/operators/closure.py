"""Transitive-closure root finding by pointer jumping (path doubling).

The reference computes every tweet's "ur-conversation" root by looping
an in-place UPDATE over a closure table until rowcount hits zero
(`2_enrich_ur_conversation_ids.py:39-47` — operators O2/J3), then
applies it with a LEFT JOIN + COALESCE (`:49-52` J4). The Spark-first
restatement is a driver-side convergence loop over DataFrame joins:

- every node starts pointing at its parent (roots point at
  themselves);
- each iteration follows the pointer's pointer, *doubling* the
  compressed path length — so a forest of depth d converges in
  ⌈log2 d⌉ iterations, each one self-join + one changed-row count;
- ``localCheckpoint()`` truncates lineage each iteration, otherwise
  Catalyst replans an exponentially growing tree (SURVEY §4);
- the changed-row count both terminates the loop and reproduces the
  reference's convergence logging (O5).

Scale: each iteration shuffles the map on the join key; the map is
|V|-sized regardless of input table size, and the iteration count is
logarithmic in the *depth* of the forest (social reply graphs: < 30
even for pathological chains). AQE's skew handling covers viral-root
fan-in. This is the standard Connected-Components-via-pointer-jumping
formulation (cf. Kiveris et al., "Connected Components in MapReduce
and Beyond", SoCC 2014).
"""

from __future__ import annotations

import logging

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

log = logging.getLogger(__name__)


def closure_roots(
    edges: DataFrame,
    max_iterations: int = 50,
    on_cycle: str = "resolve",
) -> DataFrame:
    """Resolve every node of a forest to its root.

    Parameters
    ----------
    edges:
        One row per node: ``(child_id, parent_id)``; ``parent_id`` is
        NULL for roots. (Multiple parents would make this a DAG — the
        reference's data model guarantees a forest, and the first
        parent wins there via INSERT IGNORE; callers must pre-dedup.)
    max_iterations:
        Bound on doubling iterations — 50 covers depth 2^50; on a
        true forest the loop always exits long before this.
    on_cycle:
        Directed cycles (possible in real data via mutual quote
        edges, despite the reference's forest assumption) make
        pointer jumping oscillate forever — the reference's own
        UPDATE-until-rowcount-0 loop would simply never terminate
        (`2_enrich_ur_conversation_ids.py:39-47`). ``"resolve"``
        (default) switches to a monotone min-combining phase after
        the doubling loop stalls: ``ptr ← least(ptr, ptr's ptr)``
        only ever decreases, so it must converge, and nodes whose
        ancestry ends in a cycle resolve to the smallest id they can
        reach — deterministic under any partitioning. On a forest the
        doubling loop converges first and this phase never runs.
        ``"error"`` keeps the round-1 behavior: raise RuntimeError.

    Returns
    -------
    DataFrame ``(node_id, root_id)`` with exactly one row per node.
    """
    m = edges.select(
        F.col("child_id").alias("node_id"),
        F.coalesce("parent_id", "child_id").alias("ptr"),
    ).localCheckpoint()

    for i in range(max_iterations):
        # Lazy checkpoint + immediate count: the count job materializes
        # the checkpoint, so each iteration costs ONE Spark job instead
        # of two (eager checkpoint job + count job) — half the
        # fixed-overhead at any scale.
        jumped = (
            m.alias("a")
            .join(
                m.select(
                    F.col("node_id").alias("b_node"), F.col("ptr").alias("b_ptr")
                ),
                F.col("a.ptr") == F.col("b_node"),
                "left",
            )
            .select(
                F.col("a.node_id").alias("node_id"),
                F.coalesce("b_ptr", "a.ptr").alias("new_ptr"),
                F.col("a.ptr").alias("old_ptr"),
            )
            .localCheckpoint(eager=False)
        )
        changed = jumped.filter(F.col("new_ptr") != F.col("old_ptr")).count()
        log.info("closure iteration %d: %d pointers moved", i, changed)
        m = jumped.select("node_id", F.col("new_ptr").alias("ptr"))
        if changed == 0:
            break
    else:
        if on_cycle != "resolve":
            raise RuntimeError(
                f"closure did not converge in {max_iterations} iterations"
            )
        log.warning(
            "closure oscillating after %d doubling iterations — "
            "cycle(s) present; switching to min-combining resolution",
            max_iterations,
        )
        for i in range(max_iterations):
            jumped = (
                m.alias("a")
                .join(
                    m.select(
                        F.col("node_id").alias("b_node"),
                        F.col("ptr").alias("b_ptr"),
                    ),
                    F.col("a.ptr") == F.col("b_node"),
                    "left",
                )
                .select(
                    F.col("a.node_id").alias("node_id"),
                    F.least(
                        F.coalesce("b_ptr", "a.ptr"), F.col("a.ptr")
                    ).alias("new_ptr"),
                    F.col("a.ptr").alias("old_ptr"),
                )
                .localCheckpoint(eager=False)
            )
            changed = jumped.filter(F.col("new_ptr") != F.col("old_ptr")).count()
            log.info("closure min-phase %d: %d pointers moved", i, changed)
            m = jumped.select("node_id", F.col("new_ptr").alias("ptr"))
            if changed == 0:
                break
        else:
            raise RuntimeError(
                "closure min-phase did not converge — should be impossible "
                "(the pointer map is monotone decreasing)"
            )

    return m.select("node_id", F.col("ptr").alias("root_id"))


def incremental_closure_update(
    closure_map: DataFrame,
    new_edges: DataFrame,
    max_iterations: int = 50,
) -> DataFrame:
    """Fold a batch of new ``(child_id, parent_id)`` edges into an
    existing ``(node_id, root_id)`` map WITHOUT re-running the full
    closure.

    The reference re-runs its whole UPDATE-until-zero loop over the
    entire table after every crawl (`2_enrich_ur_conversation_ids.py:
    39-47`); its checkpointed-resume ethos (`fetch_conversation_
    tweets.py:71-85`) applied to the closure wants the incremental
    form: parents that the old map already resolves act as *portal*
    nodes (parent → known root), so the doubling loop runs over the
    NEW subgraph plus one portal row per referenced known parent.
    Per-batch cost is O(batch · log new-depth) — proportional to the
    increment, never the corpus, which is what makes continuous
    enrichment viable at 100 TB.

    Semantics match the reference's INSERT IGNORE: an edge whose
    child is already mapped is ignored (first crawl wins); new roots
    (parent NULL or parent unseen by either map or batch) resolve
    within the batch subgraph.
    """
    fresh = new_edges.join(
        closure_map.select(F.col("node_id").alias("child_id")),
        "child_id",
        "left_anti",
    )
    portals = (
        fresh.select(F.col("parent_id").alias("node_id"))
        .filter(F.col("node_id").isNotNull())
        .distinct()
        .join(closure_map, "node_id")
        .select(
            F.col("node_id").alias("child_id"),
            F.col("root_id").alias("parent_id"),
        )
    )
    resolved = closure_roots(fresh.unionByName(portals), max_iterations)
    new_rows = resolved.join(
        closure_map.select("node_id"), "node_id", "left_anti"
    )
    return closure_map.unionByName(new_rows)


def enrich_with_roots(
    facts: DataFrame,
    closure_map: DataFrame,
    key: str,
    out_col: str = "root_id",
) -> DataFrame:
    """LEFT JOIN + COALESCE application of a closure map (J4,
    `2_enrich_ur_conversation_ids.py:49-52`): facts keep their own key
    when the map has no entry — the reference's singleton fallback
    (`:51` COALESCE)."""
    cm = closure_map.select(
        F.col("node_id").alias("__cm_key"), F.col("root_id").alias("__cm_root")
    )
    return facts.join(cm, facts[key] == cm.__cm_key, "left").select(
        *facts.columns,
        F.coalesce("__cm_root", key).alias(out_col),
    )
