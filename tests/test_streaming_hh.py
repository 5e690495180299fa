"""Streaming heavy hitters: the merged summary view is a guaranteed
SUPERSET of the exact batch operator's answer under arbitrary
chunking; lower/upper counts bracket true frequencies; guaranteed
rows are truly heavy; batch replay (crash recovery) is idempotent."""

from __future__ import annotations

from pyspark.sql import functions as F

from convoy_spark.functions.hashing import WS_SPLIT
from convoy_spark.operators.heavyhitters import heavy_hitters
from convoy_spark.streaming.heavyhitters import (
    apply_hh_batch,
    heavy_hitters_over_stream,
    run_incremental_hh,
)
from convoy_spark.tables import load_table

SF_DIR = "/root/testdata/sf0.001"
K = 500  # heavier threshold so the small corpus yields hitters
M = 1024


def _docs(spark):
    return load_table(spark, SF_DIR, "documents").select("doc_id", "text")


def _exact_counts(spark) -> dict[str, int]:
    toks = F.filter(
        F.split(F.lower(F.col("text")), WS_SPLIT), lambda t: t != F.lit("")
    )
    rows = (
        _docs(spark)
        .select(F.explode(toks).alias("token"))
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("freq"))
        .collect()
    )
    return {r.token: r.freq for r in rows}


def test_stream_superset_and_brackets_any_chunking(spark, tmp_path):
    docs = _docs(spark)
    counts = _exact_counts(spark)
    n_total = sum(counts.values())
    exact_hh = {t for t, c in counts.items() if c * K > n_total}
    assert exact_hh  # corpus yields hitters at this K
    # adversarial chunking: 3 uneven batches, reversed id order
    state = str(tmp_path / "state")
    splits = [(600, 10**9), (100, 600), (0, 100)]
    for i, (lo, hi) in enumerate(splits):
        b = docs.where((F.col("doc_id") >= lo) & (F.col("doc_id") < hi))
        apply_hh_batch(b, state, f"t{i}", summary_size=M)
    view = heavy_hitters_over_stream(spark, state, k_inv=K).collect()
    got = {r.token for r in view}
    guaranteed = {r.token for r in view if r.guaranteed}
    assert exact_hh <= got  # superset contract
    assert guaranteed <= exact_hh  # guaranteed rows are truly heavy
    for r in view:
        assert r.c_lower <= counts[r.token] <= r.c_upper


def test_single_batch_drain_vs_batch_operator(spark, tmp_path):
    landing = tmp_path / "landing"
    _docs(spark).coalesce(1).write.parquet(str(landing))
    run_incremental_hh(
        spark,
        str(landing),
        str(tmp_path / "ckpt"),
        str(tmp_path / "state"),
        summary_size=M,
    )
    view = heavy_hitters_over_stream(
        spark, str(tmp_path / "state"), k_inv=K
    ).collect()
    exact = {
        r.token: r.freq
        for r in heavy_hitters(_docs(spark), k_inv=K, summary_size=M).collect()
    }
    got = {r.token for r in view}
    assert set(exact) <= got
    for r in view:
        if r.token in exact:
            assert r.c_lower <= exact[r.token] <= r.c_upper


def test_replay_idempotent(spark, tmp_path):
    docs = _docs(spark).where(F.col("doc_id") < 200)
    state = str(tmp_path / "state")
    apply_hh_batch(docs, state, "b0", summary_size=M)
    before = sorted(
        map(tuple, heavy_hitters_over_stream(spark, state, K).collect())
    )
    apply_hh_batch(docs, state, "b0", summary_size=M)  # crash replay
    after = sorted(
        map(tuple, heavy_hitters_over_stream(spark, state, K).collect())
    )
    assert before == after


def test_empty_state_empty_view(spark, tmp_path):
    out = heavy_hitters_over_stream(spark, str(tmp_path / "none"), K)
    assert out.count() == 0


def test_count_min_never_underestimates_under_collisions(spark):
    # 3000 distinct tokens >> 1024 buckets forces collisions: the
    # estimate must never drop below exact, and collisions must show
    # up as strict overestimates somewhere.
    from convoy_spark.operators.heavyhitters import count_min_estimates

    docs = spark.createDataFrame(
        [(i, f"tok{i} tok{i % 7} filler{i % 3000}") for i in range(3000)],
        "doc_id long, text string",
    )
    pdf = count_min_estimates(docs).toPandas()
    assert len(pdf) > 1024
    assert bool(pdf.overestimate.all())
    assert int((pdf.cm_estimate > pdf.exact).sum()) > 0
    assert int(pdf.cm_estimate.min()) >= 1
