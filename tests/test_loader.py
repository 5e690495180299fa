"""Loader-prep operators: packing conserves the token stream and is
partition-invariant; the two-phase prefix scan equals a driver-side
cumsum; epoch shuffle is a permutation that changes with the epoch;
mixture sampling hits the target proportions with the binding domain
at rate 1.0."""

from __future__ import annotations

from pyspark.sql import functions as F

from convoy_spark.operators.loader import (
    block_prefix_sum,
    epoch_shuffle,
    mixture_sample,
    pack_sequences,
)
from convoy_spark.tables import load_table

SF_DIR = "/root/testdata/sf0.001"


def test_block_prefix_sum_equals_cumsum_any_partitioning(spark):
    rows = [(i * 7 % 997, (i % 13) + 1) for i in range(400)]  # sparse keys
    df = spark.createDataFrame(rows, "k long, v long")
    got = {
        r.k: r.cum
        for r in block_prefix_sum(
            df.repartition(16), "k", "v", block_size=32
        ).collect()
    }
    run = 0
    for k, v in sorted(rows):
        run += v
        assert got[k] == run


def test_pack_sequences_invariants(spark):
    docs = load_table(spark, SF_DIR, "documents")
    out = pack_sequences(docs, seq_len=256).collect()
    total = sum(r.n_tokens for r in out)
    by_id = sorted(out, key=lambda r: r.doc_id)
    # offsets tile the stream exactly: each doc starts where the
    # previous ended, first at 0, total conserved
    run = 0
    for r in by_id:
        assert r.start_offset == run
        assert r.pack_id == r.start_offset // 256
        end = r.start_offset + r.n_tokens - 1
        assert r.crosses_boundary == (
            r.n_tokens > 0 and end // 256 > r.pack_id
        )
        run += r.n_tokens
    assert run == total


def test_epoch_shuffle_is_permutation_and_epoch_sensitive(spark):
    docs = load_table(spark, SF_DIR, "documents")
    n = docs.count()
    e1 = {r.doc_id: r.shuffle_pos for r in epoch_shuffle(docs, 1).collect()}
    assert sorted(e1.values()) == list(range(n))
    e2 = {r.doc_id: r.shuffle_pos for r in epoch_shuffle(docs, 2).collect()}
    assert sorted(e2.values()) == list(range(n))
    assert e1 != e2  # a fresh permutation per epoch
    # determinism across partitionings
    e1b = {
        r.doc_id: r.shuffle_pos
        for r in epoch_shuffle(docs.repartition(16), 1).collect()
    }
    assert e1b == e1


def test_mixture_sample_rates_and_proportions(spark):
    docs = load_table(spark, SF_DIR, "documents")
    targets = {"src1": 0.5, "src3": 0.3, "src7": 0.2}
    out = mixture_sample(docs, targets)
    rates = {
        r.domain: r.accept_rate
        for r in out.select("domain", "accept_rate").distinct().collect()
    }
    assert all(0.0 <= v <= 1.0 + 1e-12 for v in rates.values())
    # the binding domain samples at rate 1.0
    assert any(abs(v - 1.0) < 1e-9 for d, v in rates.items() if d in targets)
    # domains absent from the targets never sample
    assert all(
        v == 0.0 for d, v in rates.items() if d not in targets
    )
    sampled = (
        out.filter("sampled")
        .groupBy("domain")
        .count()
        .collect()
    )
    got = {r.domain: r["count"] for r in sampled}
    tot = sum(got.values())
    assert set(got) <= set(targets)
    # proportions near target (hash threshold on ~100-300 rows/domain:
    # generous tolerance, determinism is what the oracle checks)
    for d, w in targets.items():
        assert abs(got.get(d, 0) / tot - w) < 0.15, (d, got, tot)


def test_shard_assignment_contiguous_and_balanced(spark):
    from convoy_spark.operators.loader import shard_assignment

    docs = load_table(spark, SF_DIR, "documents")
    out = sorted(
        shard_assignment(docs, epoch=1, shard_tokens=1024).collect(),
        key=lambda r: r.shuffle_pos,
    )
    # shards are contiguous, non-decreasing runs of the shuffled stream
    assert out[0].shard_id == 0
    for a, b in zip(out, out[1:]):
        assert b.shard_id - a.shard_id in (0, 1)
    # every shard holds <= budget tokens of doc STARTS plus one
    # overhanging doc (the doc whose first token lands near the end)
    from collections import defaultdict

    tok = defaultdict(int)
    for r in out:
        tok[r.shard_id] += r.n_tokens
    full_shards = sorted(tok)[:-1]  # last shard is a remainder
    assert all(tok[s] >= 1 for s in tok)
    # a shard's token count can't exceed budget + the longest doc
    longest = max(r.n_tokens for r in out)
    assert all(tok[s] <= 1024 + longest for s in full_shards)
    # partition invariance
    again = sorted(
        shard_assignment(
            docs.repartition(16), epoch=1, shard_tokens=1024
        ).collect(),
        key=lambda r: r.shuffle_pos,
    )
    assert [(r.doc_id, r.shard_id) for r in out] == [
        (r.doc_id, r.shard_id) for r in again
    ]


def test_write_training_shards_layout(spark, tmp_path):
    import os

    from convoy_spark.operators.loader import write_training_shards

    docs = load_table(spark, SF_DIR, "documents")
    out = str(tmp_path / "shards")
    manifest = write_training_shards(
        docs, out, epoch=1, shard_tokens=1024
    ).collect()
    want = {}
    for r in manifest:
        want.setdefault(r.shard_id, set()).add(r.doc_id)
    # one shard_id=<k> directory per shard, holding exactly its docs
    dirs = sorted(
        d for d in os.listdir(out) if d.startswith("shard_id=")
    )
    assert len(dirs) == len(want)
    for d in dirs:
        k = int(d.split("=")[1])
        got = spark.read.parquet(os.path.join(out, d))
        assert {r.doc_id for r in got.select("doc_id").collect()} == want[k]
    # rows inside a shard are stored in shuffle order (what a loader
    # worker streams)
    k0 = os.path.join(out, dirs[0])
    pos = [r.shuffle_pos for r in spark.read.parquet(k0).collect()]
    assert pos == sorted(pos)
    # idempotent re-run (overwrite)
    write_training_shards(docs, out, epoch=1, shard_tokens=1024)
    assert sorted(
        d for d in os.listdir(out) if d.startswith("shard_id=")
    ) == dirs


def test_priority_sample_deterministic_and_weight_biased(spark):
    from convoy_spark.operators.loader import priority_sample

    docs = spark.createDataFrame(
        [(i, "w " * (100 if i < 20 else 1)) for i in range(400)],
        "doc_id long, text string",
    )
    a = priority_sample(docs, n=50).collect()
    b = priority_sample(docs, n=50).collect()
    assert [r.doc_id for r in a] == [r.doc_id for r in b]  # deterministic
    # heavy docs (weight 100 vs 1) dominate the sample
    heavy = sum(1 for r in a if r.doc_id < 20)
    assert heavy == 20  # all 20 heavy docs drawn before most light ones
    # re-salting draws a different sample
    c = priority_sample(docs, n=50, salt="other").collect()
    assert {r.doc_id for r in c} != {r.doc_id for r in a}


def test_priority_sample_matches_python(spark):
    import hashlib

    from convoy_spark.operators.loader import priority_sample

    docs = [(i, "tok " * ((i % 7) + 1)) for i in range(100)]
    df = spark.createDataFrame(docs, "doc_id long, text string")

    def h60(s):
        return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)

    pri = []
    for i, text in docs:
        w = len(text.split())
        q = float(w) / float(h60(f"ps1:{i}") + 1)
        pri.append((-q, i, w))
    want = sorted(pri)[:10]
    got = priority_sample(df, n=10).collect()
    assert [(r.doc_id, r.weight) for r in got] == [(i, w) for _, i, w in want]


def test_curriculum_order_round_robin_property(spark):
    from convoy_spark.operators.loader import curriculum_order

    rows = [(i, float((i * 37) % 101) / 10.0) for i in range(123)]
    df = spark.createDataFrame(rows, "doc_id long, quality_score double")
    out = curriculum_order(df, n_bins=10).collect()
    assert len(out) == 123
    # python reference
    order = sorted(rows, key=lambda r: (r[1], r[0]))
    n = len(order)
    ref = {}
    starts = {}
    for rank0, (i, _) in enumerate(order):
        b = (rank0 * 10) // n
        starts.setdefault(b, rank0 + 1)
        ref[i] = (b, rank0 + 1 - starts[b])
    got = {r.doc_id: (r.bin, r.within_rank) for r in out}
    assert got == ref
    # curriculum_pos is a valid total order: all distinct, and within
    # a bin it increases with quality rank
    pos = sorted((r.curriculum_pos, r.bin, r.within_rank) for r in out)
    assert len({p for p, _, _ in pos}) == len(pos)
    for b in range(10):
        wr = [w for _, bb, w in pos if bb == b]
        assert wr == sorted(wr)


def test_chunk_documents_covers_stream_and_matches_python(spark):
    import re

    from convoy_spark.operators.loader import chunk_documents

    docs = load_table(spark, SF_DIR, "documents")
    out = chunk_documents(docs, chunk_size=16, stride=12).collect()
    raw = {r.doc_id: r.text for r in docs.collect()}
    ws = re.compile(r"[ \t\n\x0b\f\r]+")
    by_doc = {}
    for r in out:
        by_doc.setdefault(r.doc_id, []).append(r)
    for doc_id, text in raw.items():
        toks = [t for t in ws.split(text) if t != ""]
        chunks = sorted(by_doc.get(doc_id, []), key=lambda r: r.chunk_id)
        if not toks:
            assert chunks == []
            continue
        n = len(toks)
        exp_starts = list(range(0, max(n - 16, 0) + 12, 12)) if n > 16 else [0]
        # python reference: every start, exact slice text, short tail
        assert [r.start_token for r in chunks] == [
            s for s in exp_starts
        ], doc_id
        for r in chunks:
            sl = toks[r.start_token : r.start_token + 16]
            assert r.chunk_text == " ".join(sl)
            assert r.n_chunk_tokens == len(sl)
            assert r.chunk_id == r.start_token // 12
        # coverage: union of [start, start+len) tiles [0, n)
        covered = set()
        for r in chunks:
            covered.update(range(r.start_token, r.start_token + r.n_chunk_tokens))
        assert covered == set(range(n))
