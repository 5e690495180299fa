"""Dedup operator tests: planted exact/near duplicates, LSH recall
against the exact verifier, SimHash behavior on identical docs."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from convoy_spark.operators.dedup import (
    exact_dedup_map,
    jaccard_pairs,
    lsh_candidate_pairs,
    minhash_lsh_neardup,
    minhash_signatures,
    simhash_neardup,
    simhash_signature,
)

DOCS_SCHEMA = "doc_id long, text string"

BASE = (
    "the quick brown fox jumps over the lazy dog while the cat watches "
    "from the warm window sill and the birds sing in the green garden"
)
NEAR = BASE.replace("green garden", "blue garden")  # one token differs
OTHER = (
    "completely different content about spark query engines and columnar "
    "storage formats with vectorized execution and adaptive planning"
)


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(
        [(1, BASE), (2, BASE), (3, NEAR), (4, OTHER), (5, "tiny doc")],
        DOCS_SCHEMA,
    ).cache()


def test_exact_dedup(spark, docs):
    got = {r.doc_id: r.canonical_id for r in exact_dedup_map(docs).collect()}
    assert got[1] == 1 and got[2] == 1  # identical texts share canonical
    assert got[3] == 3 and got[4] == 4 and got[5] == 5


def test_jaccard_pairs_finds_planted(spark, docs):
    pairs = {
        (r.doc_a, r.doc_b): r.jaccard
        for r in jaccard_pairs(docs, min_jaccard=0.5).collect()
    }
    assert pairs[(1, 2)] == 1.0  # identical
    assert (1, 3) in pairs and 0.5 < pairs[(1, 3)] < 1.0  # near-dup
    assert all(4 not in p and 5 not in p for p in pairs)


def test_lsh_recall_vs_exact(spark, docs):
    """Every exact near-dup pair at J ≥ 0.8 must survive the LSH
    sketch+verify path (recall check, SURVEY §7 M6)."""
    exact = {
        (r.doc_a, r.doc_b)
        for r in jaccard_pairs(docs, min_jaccard=0.8).collect()
    }
    lsh = {
        (r.doc_a, r.doc_b)
        for r in minhash_lsh_neardup(docs, min_jaccard=0.8).collect()
    }
    assert exact, "fixture should contain near-dups"
    assert lsh == exact  # verify step makes precision exact; recall == 1 here


def test_identical_docs_identical_signatures(spark, docs):
    sigs = minhash_signatures(docs).filter(F.col("doc_id").isin(1, 2))
    distinct_sigs = sigs.groupBy("i").agg(
        F.countDistinct("v").alias("nv")
    )
    assert distinct_sigs.filter(F.col("nv") != 1).count() == 0


def test_candidate_pairs_contain_identical(spark, docs):
    cand = {
        (r.doc_a, r.doc_b)
        for r in lsh_candidate_pairs(minhash_signatures(docs)).collect()
    }
    assert (1, 2) in cand


def test_simhash(spark, docs):
    fps = {r.doc_id: r.simhash for r in simhash_signature(docs).collect()}
    assert fps[1] == fps[2]  # identical docs → identical fingerprints
    assert fps[1] != fps[4]
    near = {
        (r.doc_a, r.doc_b): r.hamming
        for r in simhash_neardup(docs, max_hamming=3).collect()
    }
    assert near[(1, 2)] == 0
    assert all(4 not in p for p in near)


def test_simhash_matches_naive_reference(spark):
    """Differential guard for the bit-packed counter aggregation: the
    packed 20-bit fields must reproduce a naive per-bit Python
    SimHash exactly, including repeated tokens (frequency weighting)
    and the tie→0 rule."""
    import hashlib

    def naive_simhash(text, bits=60):
        toks = [t for t in text.lower().split() if t]
        if not toks:
            return None
        sums = [0] * bits
        for t in toks:
            h = int(hashlib.md5(t.encode()).hexdigest()[:15], 16)
            for j in range(bits):
                sums[j] += 1 if (h >> j) & 1 else -1
        return sum(1 << j for j in range(bits) if sums[j] > 0)

    rows = [
        (1, "alpha beta gamma delta"),
        (2, "alpha alpha alpha beta"),          # frequency-weighted
        (3, "x " * 50 + "y"),                   # heavy repetition
        (4, "unique tokens only here now"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r.doc_id: r.simhash for r in simhash_signature(docs).collect()}
    for doc_id, text in rows:
        assert got[doc_id] == naive_simhash(text), doc_id


def test_substring_dup_pairs_planted(spark):
    from convoy_spark.operators.dedup import substring_dup_pairs

    passage = (
        "this exact shared passage of considerable length appears "
        "verbatim in two different documents and nowhere else at all"
    )
    rows = [
        (1, "unique preamble one " + passage + " unique tail one"),
        # same passage at a DIFFERENT offset — content-defined
        # sampling must still align the sampled grams
        (2, "a much longer and quite distinct unique preamble two " + passage),
        (3, "entirely unrelated text about columnar execution engines "
            "and shuffle partitioning strategies for distributed joins"),
    ]
    docs = spark.createDataFrame(rows, DOCS_SCHEMA)
    got = {
        (r.doc_a, r.doc_b): r.n_shared
        for r in substring_dup_pairs(docs, min_shared=2).collect()
    }
    assert (1, 2) in got and got[(1, 2)] >= 2
    assert all(3 not in pair for pair in got)


def test_substring_dup_pairs_identical_docs_share_all(spark):
    from convoy_spark.operators.dedup import substring_dup_pairs

    text = BASE + " " + BASE  # long enough to sample several grams
    docs = spark.createDataFrame([(1, text), (2, text)], DOCS_SCHEMA)
    pairs = substring_dup_pairs(docs, min_shared=1).collect()
    assert len(pairs) == 1
    # every sampled gram of doc 1 is shared with its identical twin
    from convoy_spark.operators.dedup import SUBSTR_MOD
    from convoy_spark.operators.textops import winnow_gram_hash_sql  # noqa: F401
    assert pairs[0].n_shared >= 1


def test_shared_lsh_pairs_cache_matches_fresh(spark):
    """The per-session materialized pair frame must equal a fresh
    pipeline run — guards the cross-query cache against staleness."""
    from convoy_spark.operators.dedup import minhash_lsh_neardup
    from convoy_spark.queries.dedup import NEARDUP_J, shared_lsh_pairs
    from convoy_spark.tables import load_table

    sf = "/root/testdata/sf0.001"
    cached = {
        (r.doc_a, r.doc_b): round(r.jaccard, 9)
        for r in shared_lsh_pairs(spark, sf).collect()
    }
    fresh = {
        (r.doc_a, r.doc_b): round(r.jaccard, 9)
        for r in minhash_lsh_neardup(
            load_table(spark, sf, "documents"), min_jaccard=NEARDUP_J
        ).collect()
    }
    assert cached == fresh
    # second access returns the same materialized frame object
    assert shared_lsh_pairs(spark, sf) is shared_lsh_pairs(spark, sf)


def test_substring_dup_pairs_short_docs_no_error(spark):
    """Docs shorter than the k-gram unit are filtered, not crashed
    on; an all-short corpus yields zero pairs."""
    from convoy_spark.operators.dedup import substring_dup_pairs

    docs = spark.createDataFrame(
        [(1, "tiny"), (2, "also tiny"), (3, "")], DOCS_SCHEMA
    )
    assert substring_dup_pairs(docs).count() == 0


def test_ngram_contamination_exact_overlap(spark):
    """A verbatim >=13-token passage shared across the train/eval
    boundary is caught; a 12-token overlap is not (the n-gram window
    is exact, not fuzzy)."""
    from convoy_spark.queries.dedup import _split_col, ngram_contamination
    from convoy_spark.tables import load_table
    import os, tempfile

    # find ids on each side of the salted split
    ids = spark.createDataFrame(
        [(i,) for i in range(200)], "doc_id long"
    ).select("doc_id", _split_col().alias("split"))
    by_split = {}
    for r in ids.collect():
        by_split.setdefault(r.split, []).append(r.doc_id)
    t1, t2 = by_split["train"][:2]
    e1, e2 = (by_split.get("val", []) + by_split.get("test", []))[:2]

    passage13 = " ".join(f"tok{i}" for i in range(13))
    passage12 = " ".join(f"alt{i}" for i in range(12))
    rows = [
        (t1, f"train doc one begins {passage13} and ends differently"),
        (e1, f"completely other eval framing {passage13} closing words"),
        (t2, f"second train document with {passage12} ending alpha"),
        (e2, f"second eval document has {passage12} finale beta"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    with tempfile.TemporaryDirectory() as d:
        docs.write.parquet(os.path.join(d, "documents.parquet"))
        got = ngram_contamination(spark, d).collect()
    pairs = {(r.train_doc, r.eval_doc) for r in got}
    assert (t1, e1) in pairs
    assert (t2, e2) not in pairs  # only 12 shared tokens


def test_dedup_keep_best_picks_higher_quality(spark):
    """Within a planted near-dup cluster the kept copy is the higher
    quality_score one (not the lower doc_id); singletons keep
    themselves."""
    import os, tempfile

    from convoy_spark.queries.dedup import dedup_keep_best

    base = (
        "the quick brown fox jumps over the lazy dog and then walks "
        "back home through the quiet green park before dinner time "
        "with friends in the warm evening light near the old bridge "
    ) * 5  # long shared body keeps pairwise Jaccard well above 0.8
    rows = [
        (1, base + "!!! ###"),       # noisy copy (punctuation tail)
        (2, base + "calm night"),    # clean copy → higher quality
        (3, "completely unrelated text about databases and queries"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    with tempfile.TemporaryDirectory() as d:
        docs.write.parquet(os.path.join(d, "documents.parquet"))
        got = {r.doc_id: r for r in dedup_keep_best(spark, d).collect()}
    assert got[1].cluster_id == got[2].cluster_id, "near-dups not clustered"
    assert not got[1].is_kept and got[2].is_kept, "kept the noisier copy"
    assert got[3].is_kept  # singleton


# ---- span-level dedup (duplicated-span removal) --------------------


def test_span_dedup_drops_shared_span_first_wins(spark):
    shared = "a b c d e f g h"  # exactly SPAN_K=8 tokens
    rows = [
        (1, shared + " tail1 x"),          # first occurrence: kept
        (2, shared + " other tokens y"),   # later occurrence: dropped
        (3, "completely different words here with no overlap at all"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    from convoy_spark.operators.dedup import span_dedup

    out = {r.doc_id: r for r in span_dedup(df).collect()}
    assert out[1].spans_dropped == 0
    assert out[1].clean_text.startswith(shared)
    assert out[2].spans_dropped == 1
    assert not out[2].clean_text.startswith("a b")
    assert out[2].clean_text == "other tokens y"
    assert out[3].spans_dropped == 0


def test_span_dedup_conserves_spans_and_short_tail_kept(spark):
    from convoy_spark.operators.dedup import SPAN_K, span_dedup
    from convoy_spark.tables import load_table

    docs = load_table(spark, "/root/testdata/sf0.001", "documents")
    out = span_dedup(docs).collect()
    toks = {
        r.doc_id: [t for t in r.text.split() if t]
        for r in docs.select("doc_id", "text").collect()
    }
    for r in out:
        n = len(toks[r.doc_id])
        nch = max(1, -(-n // SPAN_K))
        # every span is either kept or dropped
        assert r.spans_kept + r.spans_dropped == nch
        # a short trailing span is never dropped: if n % K != 0 the
        # tail is ineligible, so at least that span survives
        assert r.spans_kept >= 1
        # clean_text tokens are a subsequence of the original tokens
        ct = r.clean_text.split()
        it = iter(toks[r.doc_id])
        assert all(t in it for t in ct), r.doc_id


def test_span_dedup_partition_invariant(spark):
    from convoy_spark.operators.dedup import span_dedup
    from convoy_spark.tables import load_table

    docs = load_table(spark, "/root/testdata/sf0.001", "documents")
    a = {r.doc_id: r for r in span_dedup(docs).collect()}
    b = {r.doc_id: r for r in span_dedup(docs.repartition(16)).collect()}
    assert a.keys() == b.keys()
    for k in a:
        assert (a[k].clean_text, a[k].spans_kept, a[k].spans_dropped) == (
            b[k].clean_text,
            b[k].spans_kept,
            b[k].spans_dropped,
        )


def test_setsim_prefix_join_matches_allpairs(spark, docs):
    # The prefix-filtered exact join must equal the all-pairs verifier
    # at the same threshold — losslessness of the candidate pruning.
    from convoy_spark.operators.dedup import setsim_prefix_join

    want = {
        (r.doc_a, r.doc_b): round(r.jaccard, 12)
        for r in jaccard_pairs(docs, min_jaccard=0.8).collect()
    }
    got = {
        (r.doc_a, r.doc_b): round(r.jaccard, 12)
        for r in setsim_prefix_join(docs).collect()
    }
    assert got == want
    assert (1, 2) in got and got[(1, 2)] == 1.0


def test_setsim_boundary_pair_inclusive(spark):
    # Two 11-token docs differing in the last token: 9 shingles each,
    # 8 shared -> J = 8/10 = 0.8 EXACTLY. The integer threshold
    # arithmetic must keep the pair (a float ceil(0.8*n) formulation
    # shortens the prefix at n % 5 == 0 and can drop it).
    from convoy_spark.operators.dedup import setsim_prefix_join

    a = "w1 w2 w3 w4 w5 w6 w7 w8 w9 w10 w11"
    b = "w1 w2 w3 w4 w5 w6 w7 w8 w9 w10 w12"
    docs = spark.createDataFrame([(1, a), (2, b)], DOCS_SCHEMA)
    rows = setsim_prefix_join(docs).collect()
    assert len(rows) == 1
    assert rows[0].doc_a == 1 and rows[0].doc_b == 2
    assert abs(rows[0].jaccard - 0.8) < 1e-12


def test_sorted_neighborhood_window_semantics(spark):
    # Brute-force reference: pairs at levenshtein <= 1 that are within
    # window-1 rank distance in the forward OR reversed ordering.
    from convoy_spark.operators.dedup import SNM_WINDOW, sorted_neighborhood_pairs

    names = [
        "alpha", "alphb", "beta", "betb", "gamma", "gamm", "delta",
        "xelta", "omega", "omegb", "zzz",
    ]
    df = spark.createDataFrame([(n,) for n in names], "name string")
    got = {(r.name_a, r.name_b) for r in sorted_neighborhood_pairs(df).collect()}

    def lev(a, b):
        import functools

        @functools.lru_cache(None)
        def d(i, j):
            if i == 0 or j == 0:
                return i + j
            return min(
                d(i - 1, j) + 1,
                d(i, j - 1) + 1,
                d(i - 1, j - 1) + (a[i - 1] != b[j - 1]),
            )
        return d(len(a), len(b))

    want = set()
    for key in (lambda n: n, lambda n: n[::-1]):
        order = sorted(names, key=key)
        rank = {n: i for i, n in enumerate(order)}
        for x in names:
            for y in names:
                if x < y and abs(rank[x] - rank[y]) < SNM_WINDOW and lev(x, y) <= 1:
                    want.add((x, y))
    assert got == want and ("alpha", "alphb") in got


def test_lsh_band_sweep_parity(spark, duck):
    from tests.conftest import run_parity

    run_parity(spark, duck, "lsh_band_sweep")


def test_lsh_band_sweep_invariants(spark):
    """The banding curve's contracts: r=1 (any single hash matches)
    dominates every candidate set, so its recall is maximal and
    candidate volume is monotone non-increasing as r grows; every
    per-point candidate set at r=1 contains each planted J≈1 pair
    (identical docs share all 16 mins, so they are candidates at
    EVERY r); recall never exceeds 1; precision counts only true
    pairs."""
    from convoy_spark.queries import QUERIES

    rows = sorted(
        (
            (r.rows_per_band, r.n_cand, r.cand_hits, r.recall, r.precision)
            for r in QUERIES["lsh_band_sweep"](
                spark, "/root/testdata/sf0.001"
            ).collect()
        )
    )
    assert [r for r, *_ in rows] == [1, 2, 4, 8, 16]
    assert rows[0][3] > 0, "no planted near-dups recalled at r=1?"
    for (r0, c0, h0, _re0, _p0), (r1, c1, h1, _re1, _p1) in zip(
        rows, rows[1:]
    ):
        assert c1 <= c0, f"candidate volume grew r={r0}->{r1}"
        assert h1 <= h0, f"hits grew r={r0}->{r1}"
    for r, c, h, re, p in rows:
        assert 0.0 <= re <= 1.0 and 0.0 <= p <= 1.0
        assert h <= c


def test_bloom_decontaminate_parity(spark, duck):
    from tests.conftest import run_parity

    run_parity(spark, duck, "bloom_decontaminate")


def test_bloom_decontaminate_no_false_negatives(spark):
    """Bloom's one hard guarantee: a gram in the eval set ALWAYS
    passes the filter, so n_true_hits equals the exact overlap count
    computed without any filter — on a constructed corpus with a
    planted 13-gram overlap, a disjoint doc, and a short doc (< 13
    tokens, no grams at all)."""
    from convoy_spark.operators.dedup import (
        bloom_decontaminate,
        shingle_hashes,
    )

    words = [f"w{i}" for i in range(30)]
    shared = " ".join(words[:13])
    rows = [
        (1, shared + " " + " ".join(words[13:26])),  # overlaps eval
        (2, " ".join(f"x{i}" for i in range(20))),  # disjoint
        (3, "too short for grams"),  # < 13 tokens
        (10, shared),  # the eval doc
        (11, " ".join(f"y{i}" for i in range(25))),  # eval noise
    ]
    docs = spark.createDataFrame(rows, ["doc_id", "text"])
    g = shingle_hashes(docs, n=13)
    tr = g.filter(F.col("doc_id") < 10)
    ev = g.filter(F.col("doc_id") >= 10)
    out = {
        r.train_doc: r
        for r in bloom_decontaminate(tr, ev).collect()
    }
    # doc 3 has no grams -> absent; doc 1 shares exactly the planted
    # 13-gram; doc 2 shares nothing (candidates may include Bloom FPs
    # but true hits are exact).
    assert set(out) == {1, 2}
    exact = (
        tr.join(ev.select("h").distinct(), "h", "left_semi")
        .groupBy("doc_id")
        .count()
        .collect()
    )
    exact = {r.doc_id: r["count"] for r in exact}
    assert out[1].n_true_hits == exact.get(1, 0) == 1
    assert out[1].contaminated
    assert out[2].n_true_hits == exact.get(2, 0) == 0
    assert not out[2].contaminated
    for r in out.values():
        assert r.n_true_hits <= r.n_bloom_candidates <= r.n_grams
    # with the doc universe passed, the zero-gram doc 3 becomes an
    # explicit (0, 0, 0, false) row instead of going absent
    uni = docs.filter(F.col("doc_id") < 10).select("doc_id")
    out_u = {
        r.train_doc: r
        for r in bloom_decontaminate(tr, ev, train_docs=uni).collect()
    }
    assert set(out_u) == {1, 2, 3}
    r3 = out_u[3]
    assert (r3.n_grams, r3.n_bloom_candidates, r3.n_true_hits) == (0, 0, 0)
    assert not r3.contaminated
    for d in (1, 2):
        assert (
            out_u[d].n_grams,
            out_u[d].n_bloom_candidates,
            out_u[d].n_true_hits,
            out_u[d].contaminated,
        ) == (
            out[d].n_grams,
            out[d].n_bloom_candidates,
            out[d].n_true_hits,
            out[d].contaminated,
        )


def test_suffix_repeat_profile_parity(spark, duck):
    from tests.conftest import run_parity

    run_parity(spark, duck, "suffix_repeat_profile")


def test_suffix_prefix_doubling_planted_repeats(spark):
    """Constructed corpus: a 16-token run shared verbatim by docs 1
    and 2 (cross-doc repeat, detectable at every window position it
    fully covers... exactly one per doc here), an in-doc doubled run
    in doc 3 (repeat but NOT cross-doc), a unique doc, and a short
    doc (explicit zeros)."""
    from convoy_spark.operators.suffix import crossdoc_repeat_profile

    shared = " ".join(f"s{i}" for i in range(16))
    rows = [
        (1, shared),
        (2, shared),
        (3, " ".join(f"t{i % 16}" for i in range(32))),  # t0..t15 twice
        (4, " ".join(f"u{i}" for i in range(20))),
        (5, "too short"),
    ]
    docs = spark.createDataFrame(rows, ["doc_id", "text"])
    out = {r.doc_id: r for r in crossdoc_repeat_profile(docs).collect()}
    assert set(out) == {1, 2, 3, 4, 5}
    for d in (1, 2):
        assert out[d].n_windows == 1
        assert out[d].n_repeat_windows == 1
        assert out[d].n_crossdoc_windows == 1
    # doc 3: 17 full windows; the cyclic doubling makes window@0 ==
    # window@16 (the only identical full-window pair), both counted
    assert out[3].n_windows == 17
    assert out[3].n_repeat_windows == 2
    assert out[3].n_crossdoc_windows == 0
    assert out[4].n_windows == 5
    assert out[4].n_repeat_windows == 0
    assert out[5].n_windows == 0
    assert out[5].n_repeat_windows == 0
    assert out[5].n_crossdoc_windows == 0
