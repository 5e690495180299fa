"""Partition floors for intermediates that are input-MULTIPLES.

The session sizes ``spark.sql.shuffle.partitions`` to the INPUT data
(session._sized_shuffle_partitions — one partition per ~64 MB of
parquet, capped at core count locally). That is the right default for
queries whose frames are input-proportional, but a handful of
operators build intermediates that are a large MULTIPLE of the input
— the co-purchase edge frame (items-per-order² fan-out), the oriented
triangle adjacency, the dim-exploded embedding frame (64× the vector
count). Materializing such a frame through ``localCheckpoint`` at
input-sized partitioning unrolls huge DESERIALIZED blocks
concurrently: the round-9 sfg10 run demonstrated the failure exactly
— 32 tasks × ~1/32nd of a 100× co-purchase graph each OOMed the 48g
single JVM at the LPA edge-frame checkpoint, while a hand-set
256-partition config completed (BENCH_NOTES round-9 graph section).

AQE cannot repair this case: coalescing only merges DOWN from the
initial partition count — it never splits an under-partitioned
shuffle — and raising the session-wide initial count would tax every
small input-proportional stage with near-empty tasks (the measured
~30% task-launch overhead that motivated data-sized partitioning in
the first place). So the floor is applied PER OPERATOR, exactly at
the frames whose size the operator knows to be a blow-up, via an
explicit repartition on the frame's downstream join/group key — which
both bounds the checkpoint unroll AND lets every iteration reuse the
partitioning (the checkpointed LogicalRDD preserves outputPartitioning
/ outputOrdering, so per-round joins skip the big side's exchange and
sort entirely — the "bucket the edge table" posture the docstrings
promise, realized in local mode).

On a 1000-executor cluster the same helper scales by the configured
shuffle parallelism (thousands), keeping per-task state bounded by
construction.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

# Intermediate-to-input blow-up allowance: how many times larger than
# the input a flagged intermediate may be before per-partition state
# matters. 8× the data-sized count reproduces the measured-good 256
# partitions at the sfg10 decade (32 × 8) while costing only
# sub-second task-launch tax at sf0.1.
BLOWUP_FACTOR = 8
BLOWUP_MIN_PARTITIONS = 64


def blowup_partitions(df: DataFrame, factor: int = BLOWUP_FACTOR) -> int:
    """Partition count for an input-multiple intermediate: the
    session's shuffle partitioning scaled by the blow-up allowance,
    floored so tiny-SF sessions still bound their unroll. The base is
    clamped to the actual execution parallelism first — a vanilla
    session's static 200 would otherwise scale to 1600 near-empty
    tasks on a 32-thread local run, pure launch tax."""
    spark = df.sparkSession
    base = int(spark.conf.get("spark.sql.shuffle.partitions"))
    par = spark.sparkContext.defaultParallelism
    return max(BLOWUP_MIN_PARTITIONS, min(base, par) * factor)


def keyed_blowup_frame(df: DataFrame, *keys: str) -> DataFrame:
    """Hash-repartition an input-multiple frame on its downstream
    join/group key at the blow-up floor and sort within partitions —
    the materialized (checkpointed) frame then satisfies BOTH the
    distribution and ordering requirements of every later sort-merge
    join / aggregation on ``keys``, so iterated consumers (LPA rounds,
    PageRank iterations, the triangle wedge join) re-exchange only
    their |V|-sized side."""
    return df.repartition(blowup_partitions(df), *keys).sortWithinPartitions(
        *keys
    )
