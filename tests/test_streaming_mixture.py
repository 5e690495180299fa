"""Streaming quota sampler: a single-batch drain is bit-identical to
the batch mixture_sample operator (shared mixture_rates definition);
multi-batch streams adapt rates from cumulative counts, never sample
non-target domains, and converge to the target mixture; replay of a
batch (crash recovery) is idempotent."""

from __future__ import annotations

from pyspark.sql import functions as F

from convoy_spark.operators.loader import mixture_sample
from convoy_spark.streaming.mixture import (
    apply_mixture_batch,
    cumulative_mixture,
    mixture_decisions,
    run_incremental_mixture,
)
from convoy_spark.tables import load_table

SF_DIR = "/root/testdata/sf0.001"
TARGETS = {"src1": 0.5, "src3": 0.3, "src7": 0.2}


def _docs(spark):
    return load_table(spark, SF_DIR, "documents").select("doc_id", "source")


def _dec_rows(df):
    return sorted(
        (r.doc_id, r.domain, r.accept_rate, r.sampled) for r in df.collect()
    )


def test_single_batch_drain_equals_batch_operator(spark, tmp_path):
    docs = _docs(spark)
    want = sorted(
        (r.doc_id, r.domain, r.accept_rate, r.sampled)
        for r in mixture_sample(
            load_table(spark, SF_DIR, "documents"), TARGETS
        ).collect()
    )
    landing = tmp_path / "landing"
    docs.coalesce(1).write.parquet(str(landing / "all"))
    run_incremental_mixture(
        spark,
        str(landing / "all"),
        str(tmp_path / "ckpt"),
        str(tmp_path / "state"),
        TARGETS,
    )
    got = _dec_rows(
        mixture_decisions(spark, str(tmp_path / "state")).drop("batch_tag")
    )
    assert got == want  # bitwise: same mixture_rates definition


def test_chunked_stream_adapts_and_converges(spark, tmp_path):
    docs = _docs(spark)
    state = str(tmp_path / "state")
    for i, (lo, hi) in enumerate([(0, 150), (150, 320), (320, 10**9)]):
        chunk = docs.filter(
            (F.col("doc_id") >= lo) & (F.col("doc_id") < hi)
        )
        chunk.coalesce(1).write.parquet(str(tmp_path / f"landing{i}/c"))
        run_incremental_mixture(
            spark,
            str(tmp_path / f"landing{i}/c"),
            str(tmp_path / f"ckpt{i}"),
            state,
            TARGETS,
        )
    dec = mixture_decisions(spark, state)
    # every arriving doc got exactly one manifest row
    assert dec.count() == docs.count()
    assert dec.select("doc_id").distinct().count() == docs.count()
    # non-target domains never sample
    assert (
        dec.filter(~F.col("domain").isin(*TARGETS)).filter("sampled").count()
        == 0
    )
    # accepted mixture near target (hash threshold on few hundred
    # rows/domain: generous tolerance; determinism is tested below)
    got = {
        r.domain: r.n_sampled
        for r in cumulative_mixture(spark, state).collect()
        if r.domain in TARGETS
    }
    tot = sum(got.values())
    for d, w in TARGETS.items():
        assert abs(got.get(d, 0) / tot - w) < 0.15, (d, got)
    # determinism: same chunks into a fresh state reproduce the
    # manifest exactly
    state2 = str(tmp_path / "state2")
    for i in range(3):
        run_incremental_mixture(
            spark,
            str(tmp_path / f"landing{i}/c"),
            str(tmp_path / f"ckpt2-{i}"),
            state2,
            TARGETS,
        )
    assert _dec_rows(
        mixture_decisions(spark, state2).drop("batch_tag")
    ) == _dec_rows(dec.drop("batch_tag"))


def test_batch_replay_is_idempotent(spark, tmp_path):
    """A replayed batch (at-least-once foreachBatch, or a crash
    between the counts and decisions writes) overwrites its own
    partitions and converges to the same manifest."""
    docs = _docs(spark)
    state = str(tmp_path / "state")
    first = docs.filter("doc_id < 200")
    apply_mixture_batch(first, state, "t-0", TARGETS)
    once = _dec_rows(mixture_decisions(spark, state))
    apply_mixture_batch(first, state, "t-0", TARGETS)  # full replay
    assert _dec_rows(mixture_decisions(spark, state)) == once
    # counts store did not double-add: a second batch's rates match a
    # fresh run that never saw the replay
    second = docs.filter("doc_id >= 200")
    apply_mixture_batch(second, state, "t-1", TARGETS)
    two = _dec_rows(mixture_decisions(spark, state))
    state2 = str(tmp_path / "state2")
    apply_mixture_batch(first, state2, "t-0", TARGETS)
    apply_mixture_batch(second, state2, "t-1", TARGETS)
    assert _dec_rows(mixture_decisions(spark, state2)) == two


def test_feedback_single_batch_equals_batch_operator(spark, tmp_path):
    """On a first batch the feedback clamp is inactive and the rule
    reduces to the shared rate-targeting expression — the twin
    contract holds for the variant too."""
    docs = _docs(spark)
    want = sorted(
        (r.doc_id, r.domain, r.accept_rate, r.sampled)
        for r in mixture_sample(
            load_table(spark, SF_DIR, "documents"), TARGETS
        ).collect()
    )
    state = str(tmp_path / "state")
    apply_mixture_batch(docs, state, "t-0", TARGETS, feedback=True)
    got = _dec_rows(mixture_decisions(spark, state).drop("batch_tag"))
    assert got == want


def test_feedback_corrects_skewed_arrival(spark, tmp_path):
    """Adversarial arrival order — one domain's docs front-loaded —
    drifts the rate-targeting manifest; the feedback variant pulls
    the accepted totals back toward target and must land at least as
    close on every target domain's share."""
    docs = _docs(spark)
    # front-load src1, then everything else
    chunks = [
        docs.filter(F.col("source") == "src1"),
        docs.filter(F.col("source") != "src1"),
    ]
    shares = {}
    for mode in (False, True):
        state = str(tmp_path / f"state-{mode}")
        for i, c in enumerate(chunks):
            apply_mixture_batch(
                c, state, f"t-{i}", TARGETS, feedback=mode
            )
        got = {
            r.domain: r.n_sampled
            for r in cumulative_mixture(spark, state).collect()
            if r.domain in TARGETS
        }
        tot = sum(got.values())
        shares[mode] = {d: got.get(d, 0) / tot for d in TARGETS}
    err = {
        mode: sum(abs(shares[mode][d] - w) for d, w in TARGETS.items())
        for mode in (False, True)
    }
    assert err[True] <= err[False] + 1e-9, (shares, err)
    assert err[True] < 0.12, shares  # close to target in absolute terms


def test_feedback_replay_idempotent_with_acc_store(spark, tmp_path):
    """Crash AFTER the acc-delta write: the replayed batch reads
    prior-accepted counts EXCLUDING its own tag, so it recomputes the
    same rates and rewrites identical decisions; a follow-up batch
    matches a crash-free run."""
    docs = _docs(spark)
    first = docs.filter("doc_id < 200")
    second = docs.filter("doc_id >= 200")
    state = str(tmp_path / "state")
    apply_mixture_batch(first, state, "t-0", TARGETS, feedback=True)
    once = _dec_rows(mixture_decisions(spark, state))
    # full replay (counts, decisions AND acc partitions all present)
    apply_mixture_batch(first, state, "t-0", TARGETS, feedback=True)
    assert _dec_rows(mixture_decisions(spark, state)) == once
    apply_mixture_batch(second, state, "t-1", TARGETS, feedback=True)
    two = _dec_rows(mixture_decisions(spark, state))
    state2 = str(tmp_path / "state2")
    apply_mixture_batch(first, state2, "t-0", TARGETS, feedback=True)
    apply_mixture_batch(second, state2, "t-1", TARGETS, feedback=True)
    assert _dec_rows(mixture_decisions(spark, state2)) == two
