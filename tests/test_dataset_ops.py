"""Round-3 dataset-management / text-analysis additions:
connected-components canonicalization, repetition filtering,
deterministic sampling, vocabulary and tf-idf profiles."""

from __future__ import annotations

import random

from pyspark.sql import functions as F

from convoy_spark.operators.closure import connected_components
from convoy_spark.operators.textops import (
    repetition_signals,
    tfidf_top_terms,
    vocab_top_terms,
)

PAIR_SCHEMA = "doc_a long, doc_b long"
SF_DIR = "/root/testdata/sf0.01"


def _components(spark, pairs):
    df = spark.createDataFrame(pairs, PAIR_SCHEMA)
    return {
        r.node_id: r.component_id for r in connected_components(df).collect()
    }


def test_components_chain_and_clique(spark):
    # chain 1-2-3-4 (worst diameter) plus clique {10,11,12}
    got = _components(
        spark, [(1, 2), (2, 3), (3, 4), (10, 11), (11, 12), (10, 12)]
    )
    assert got == {1: 1, 2: 1, 3: 1, 4: 1, 10: 10, 11: 10, 12: 10}


def test_components_long_chain_converges_fast(spark):
    # increasing ids along a 40-chain: naive min creep is O(n); label
    # compression must finish well inside the O(log) budget
    n = 40
    pairs = [(100 + i, 100 + i + 1) for i in range(n)]
    got = _components(
        spark,
        pairs,
    )
    assert got == {100 + i: 100 for i in range(n + 1)}


def test_components_random_graph_matches_union_find(spark):
    rng = random.Random(3)
    nodes = list(range(1, 61))
    pairs = [
        (rng.choice(nodes), rng.choice(nodes)) for _ in range(50)
    ]
    pairs = [(a, b) for a, b in pairs if a != b]

    # reference union-find
    parent = {n: n for n in nodes}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in pairs:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    want = {}
    for a, b in pairs:
        for n in (a, b):
            want[n] = find(n)
    # canonicalize reference roots to min-of-component
    comp_min: dict[int, int] = {}
    for n, r in want.items():
        comp_min[r] = min(comp_min.get(r, n), n)
    want = {n: comp_min[r] for n, r in want.items()}

    assert _components(spark, pairs) == want


def test_repetition_signals_flags_degenerate_doc(spark):
    docs = spark.createDataFrame(
        [
            (1, "spam spam spam spam spam spam spam spam spam spam"),
            (2, "a genuinely varied sentence with many distinct tokens"),
        ],
        "doc_id long, text string",
    )
    got = {r.doc_id: r for r in repetition_signals(docs).collect()}
    assert got[1].top_token_ratio == 1.0
    assert got[1].dup_2gram_ratio == 8.0 / 9.0
    assert got[1].passes_repetition_filter is False
    assert got[2].top_token_ratio < 0.2
    assert got[2].dup_2gram_ratio == 0.0
    assert got[2].passes_repetition_filter is True


def test_corpus_funnel_monotone_and_consistent(spark):
    from convoy_spark.queries.funnel import corpus_funnel
    from convoy_spark.queries import QUERIES

    rows = {r.stage: r for r in corpus_funnel(spark, SF_DIR).collect()}
    assert [rows[i].stage_name for i in range(6)] == [
        "all_documents",
        "quality_pass",
        "repetition_pass",
        "lang_selected",
        "dedup_canonical",
        "train_split",
    ]
    counts = [rows[i].n_docs for i in range(6)]
    assert all(a >= b for a, b in zip(counts, counts[1:]))  # funnel
    assert counts[0] == 500
    assert rows[0].fraction_of_total == 1.0
    for i in range(6):
        assert rows[i].fraction_of_total == counts[i] / counts[0]
    # stage-1 count consistent with the standalone quality query
    q = QUERIES["text_quality"](spark, SF_DIR)
    n_q = q.filter(F.col("passes_filter")).count()
    assert counts[1] == n_q


def test_pii_scrub_categories_and_order(spark):
    from convoy_spark.operators.textops import pii_scrub

    docs = spark.createDataFrame(
        [
            (1, "visit https://ex.com/x?id=1234567 today"),
            (2, "mail john.doe+s@mail.ex.org or call 5551234567"),
            (3, "server 192.168.0.1 is up"),
            (4, "nothing sensitive here"),
        ],
        "doc_id long, text string",
    )
    got = {r.doc_id: r for r in pii_scrub(docs).collect()}
    # digits inside the URL are scrubbed WITH the url, not re-counted
    # as a phone (progressive scrub order)
    assert (got[1].n_urls, got[1].n_phones) == (1, 0)
    assert got[1].scrubbed_text == "visit <URL> today"
    assert (got[2].n_emails, got[2].n_phones) == (1, 1)
    assert got[2].scrubbed_text == "mail <EMAIL> or call <PHONE>"
    # dotted quads are IPs, not phones (dots break the digit run)
    assert (got[3].n_ips, got[3].n_phones) == (1, 0)
    assert got[3].scrubbed_text == "server <IP> is up"
    assert got[4].scrubbed_text == "nothing sensitive here"
    assert (
        got[4].n_urls + got[4].n_emails + got[4].n_ips + got[4].n_phones == 0
    )


def test_sample_deterministic_and_stratified(spark):
    from convoy_spark.queries.dedup import SAMPLE_PCT, stratified_sample

    a = {r.doc_id for r in stratified_sample(spark, SF_DIR).collect()}
    b = {r.doc_id for r in stratified_sample(spark, SF_DIR).collect()}
    assert a == b  # rerun-stable (no RNG)
    n_docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").count()
    # uniform hash → sampled fraction near the target rate
    assert abs(len(a) / n_docs - SAMPLE_PCT / 100) < 0.06


def test_vocab_coverage_monotone(spark):
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    rows = vocab_top_terms(docs).orderBy("rank").collect()
    assert rows[0].rank == 1
    cov = [r.cum_coverage for r in rows]
    assert all(b > a for a, b in zip(cov, cov[1:]))
    assert 0 < cov[-1] <= 1.0
    counts = [r.n_occurrences for r in rows]
    assert counts == sorted(counts, reverse=True)


def test_tfidf_ranks_rare_terms_over_stopwords(spark):
    docs = spark.createDataFrame(
        [
            (1, "the the the zebra"),
            (2, "the the the apple"),
            (3, "the the the apple zebra quark"),
        ],
        "doc_id long, text string",
    )
    got = {
        (r.doc_id, r.term_rank): r.token
        for r in tfidf_top_terms(docs, k=1).collect()
    }
    # 'the' appears in every doc (df=N) → BM25 idf ~0.5/(N+0.5)
    # sinks it below any rarer term despite tf=3
    assert got[(1, 1)] == "zebra"
    assert got[(2, 1)] == "apple"
    assert got[(3, 1)] == "quark"  # df=1, unique to doc 3


def test_split_vocab_shift_detects_skew(spark):
    """A corpus whose val-split docs use a disjoint vocabulary must
    show TV ≈ 1 for the pairs involving val, while a uniform corpus
    shows small TV everywhere."""
    import os, tempfile

    from convoy_spark.queries.dedup import _split_col, split_vocab_shift

    ids = spark.createDataFrame(
        [(i,) for i in range(400)], "doc_id long"
    ).select("doc_id", _split_col().alias("split"))
    by_split = {}
    for r in ids.collect():
        by_split.setdefault(r.split, []).append(r.doc_id)
    assert by_split.get("val") and by_split.get("test")

    common = "alpha beta gamma delta epsilon zeta"
    rows = [(i, common) for i in by_split["train"][:20]]
    rows += [(i, common) for i in by_split["test"][:3]]
    # val docs: entirely different vocabulary
    rows += [(i, "omega psi chi phi upsilon tau") for i in by_split["val"][:3]]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    with tempfile.TemporaryDirectory() as d:
        docs.write.parquet(os.path.join(d, "documents.parquet"))
        tv = {
            (r.split_a, r.split_b): r.tv_distance
            for r in split_vocab_shift(spark, d).collect()
        }
    assert tv[("train", "test")] < 1e-9  # identical distributions
    assert tv[("train", "val")] > 0.999  # disjoint vocabularies
    assert tv[("val", "test")] > 0.999


def test_fuzzy_pairs_dist1_matches_bruteforce(spark):
    import random

    from convoy_spark.operators.dedup import fuzzy_pairs_dist1

    rng = random.Random(5)
    alphabet = "ab"
    names = list(
        {
            "".join(rng.choice(alphabet) for _ in range(rng.randrange(3, 7)))
            for _ in range(120)
        }
    )

    def lev(a, b):
        dp = list(range(len(b) + 1))
        for i, ca in enumerate(a, 1):
            prev, dp[0] = dp[0], i
            for j, cb in enumerate(b, 1):
                prev, dp[j] = dp[j], min(
                    dp[j] + 1, dp[j - 1] + 1, prev + (ca != cb)
                )
        return dp[len(b)]

    want = {
        (min(x, y), max(x, y))
        for i, x in enumerate(names)
        for y in names[i + 1:]
        if lev(x, y) == 1
    }
    df = spark.createDataFrame([(n,) for n in names], "name string")
    got = {
        (r.name_a, r.name_b) for r in fuzzy_pairs_dist1(df).collect()
    }
    assert got == want


def test_cohort_retention_invariants(spark, duck):
    from convoy_spark.queries import ORACLES, QUERIES
    from tests.conftest import SF_DIR, assert_frames_match

    spdf = QUERIES["cohort_retention"](spark, SF_DIR).toPandas()
    opdf = duck.execute(ORACLES["cohort_retention"]).fetchdf()
    assert_frames_match(spdf, opdf, "cohort_retention")
    # day-0 retention is exactly 1.0 for every cohort
    d0 = spdf[spdf.day_offset == 0]
    assert (d0.n_active == d0.n_cohort).all()
    assert (spdf.n_active <= spdf.n_cohort).all()
    assert (spdf.day_offset >= 0).all()
