"""Golden tests for the text-analysis operators."""

from __future__ import annotations

import pytest

from convoy_spark.operators.textops import (
    langid_predict,
    text_quality,
    token_stats,
    winnow_fingerprints,
)

DOCS_SCHEMA = "doc_id long, text string, lang string"


def test_token_stats_golden(spark):
    docs = spark.createDataFrame(
        [(1, "Hello, world! abc123 test", "en")], DOCS_SCHEMA
    )
    r = token_stats(docs).first()
    assert r.n_chars == 25
    assert r.n_tokens == 4  # hello,  world!  abc123  test
    # BPE-ish: hello , world ! abc 123 test -> 7
    assert r.n_bpe_tokens == 7
    assert r.n_unique_tokens == 4
    assert r.mean_token_len == pytest.approx((6 + 6 + 6 + 4) / 4)


def test_quality_golden(spark):
    good = "the quick brown fox jumps over the lazy dog and runs to a tree " * 2
    bad = "@@@ ### !!!"
    docs = spark.createDataFrame([(1, good, "en"), (2, bad, "xx")], DOCS_SCHEMA)
    got = {r.doc_id: r for r in text_quality(docs).collect()}
    assert got[1].passes_filter and not got[2].passes_filter
    assert got[1].quality_score > got[2].quality_score
    assert got[1].stopword_ratio > 0.2  # 'the'/'and'/'to'/'a' rich
    assert got[2].punct_ratio > 0.7


def test_langid_learns_separable_langs(spark):
    # two "languages" with disjoint character inventories
    aaa = [(i, "aaa bbb aab aba bab " * 5, "aa") for i in range(5)]
    zzz = [(i + 10, "zzz yyy zzy zyz yzy " * 5, "zz") for i in range(5)]
    docs = spark.createDataFrame(aaa + zzz, DOCS_SCHEMA)
    preds = langid_predict(docs).collect()
    assert len(preds) == 10
    for r in preds:
        assert r.pred_lang == r.true_lang, f"doc {r.doc_id}"


def test_winnow_shared_substring(spark):
    shared = "abcdefghijklmnopqrstuvwxyz"  # len 26 >= k+w-1 = 12
    docs = spark.createDataFrame(
        [
            (1, "PREFIX-" + shared + "-SUF1", "en"),
            (2, "OTHER**" + shared + "**S2", "en"),
            (3, "no overlap here at all 12345", "en"),
        ],
        DOCS_SCHEMA,
    )
    fps = winnow_fingerprints(docs).collect()
    by_doc = {}
    for r in fps:
        by_doc.setdefault(r.doc_id, set()).add(r.fp)
    # winnowing guarantee: docs sharing a >= k+w-1 substring share a fingerprint
    assert by_doc[1] & by_doc[2]
    assert not (by_doc[1] & by_doc[3] & by_doc[2])


def test_bm25_ranking_sanity(spark):
    from convoy_spark.operators.textops import bm25_search

    rows = [
        (1, "spark stream vector spark stream vector spark"),      # all 3
        (2, "spark spark spark unrelated words here padding out"), # 1 term
        (3, "nothing relevant in this document at all honestly"),  # 0 terms
        (4, "spark stream other filler tokens appear here too"),   # 2 terms
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    got = bm25_search(docs, ["spark", "stream", "vector"], top_k=10).collect()
    ids = [r.doc_id for r in got]
    assert 3 not in ids  # zero-match docs never appear
    assert ids[0] == 1  # the all-terms doc wins
    by_id = {r.doc_id: r for r in got}
    assert by_id[1].n_hit_terms == 3
    assert by_id[4].n_hit_terms == 2
    assert by_id[2].n_hit_terms == 1
    assert by_id[1].score > by_id[4].score > 0.0
    # deterministic across re-evaluation (decimal-exact sums)
    again = bm25_search(docs, ["spark", "stream", "vector"], top_k=10).collect()
    assert [(r.doc_id, r.score) for r in got] == [
        (r.doc_id, r.score) for r in again
    ]


def test_bpe_merge_candidates(spark):
    from convoy_spark.operators.textops import bpe_merge_candidates

    rows = [
        (1, "new york new york new york city"),
        (2, "york new york is not new jersey"),
        (3, "single"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    got = bpe_merge_candidates(docs, top_k=5).collect()
    assert got[0].asDict() == {
        "rank": 1, "left": "new", "right": "york", "n_occurrences": 4,
    }
    # pairs never cross document boundaries: "city"/"york" adjacency
    # between doc 1's tail and doc 2's head must not exist
    assert ("city", "york") not in {(r.left, r.right) for r in got}


def test_bpe_train_steps_applies_merges(spark):
    """The learned merge table on a corpus with a known structure:
    round 1 merges (a, a) GREEDILY (odd-parity within runs), round 2
    must see the post-merge stream — including the fused 'a a' symbol
    — not the original counts."""
    from convoy_spark.operators.textops import bpe_train_steps

    rows = [
        (1, "a a a a b"),   # run of four a's → two 'a a' merges
        (2, "a a a b"),     # run of three → one merge, one bare a
        (3, "c b c b"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    got = [
        (r.step, r.left, r.right, r.n_occurrences)
        for r in bpe_train_steps(docs, n_steps=2).collect()
    ]
    # round 0 counts: (a,a)=5 (overlaps counted), top merge (a,a).
    assert got[0] == (0, "a", "a", 5)
    # post-merge streams: doc1 = [a a, a a, b]; doc2 = [a a, a, b];
    # doc3 unchanged. round-1 counts: ('a a','a a')=1, ('a a','a')=1,
    # ('a a','b')=1, ('a','b')=1, ('c','b')=2, ('b','c')=1 → top is
    # (c,b)=2 — only reachable if the greedy application really ran.
    assert got[1] == (1, "c", "b", 2)


def test_bpe_train_vocab_sennrich_example(spark):
    """The classic word-frequency trainer on a Sennrich-style toy
    vocab (low×3, lower×2, newest×1): freq-weighted counts, char
    symbols, deterministic tie-breaks."""
    from convoy_spark.operators.textops import bpe_train_vocab

    docs = spark.createDataFrame(
        [(1, "low low low"), (2, "lower lower"), (3, "newest")],
        "doc_id long, text string",
    )
    got = [
        (r.step, r.left, r.right, r.n_occurrences)
        for r in bpe_train_vocab(docs, n_merges=3).collect()
    ]
    # round 0: (l,o)=5 ties (o,w)=5 → left-asc tie-break picks (l,o).
    # round 1: (lo,w)=5. round 2: (low,e)=2 ties (e,r)=2 → (e,r).
    assert got == [(0, "l", "o", 5), (1, "lo", "w", 5), (2, "e", "r", 2)]


def test_bm25_multi_query_matches_single(spark):
    """Per-query results of the multi-query form == running the
    single-query operator per term list (same corpus stats)."""
    from convoy_spark.operators.textops import bm25_search, bm25_search_multi

    docs = spark.createDataFrame(
        [
            (1, "spark stream spark vector"),
            (2, "vector vector stream data"),
            (3, "data spark data model"),
            (4, "stream model vector spark"),
        ],
        "doc_id long, text string",
    )
    qdf = spark.createDataFrame(
        [(0, "spark"), (0, "vector"), (1, "data"), (1, "model")],
        "query_id long, term string",
    )
    multi = bm25_search_multi(docs, qdf, top_k=10).collect()
    for qid, terms in [(0, ["spark", "vector"]), (1, ["data", "model"])]:
        single = bm25_search(docs, terms, top_k=10).collect()
        got = sorted(
            (r.doc_id, r.score, r.n_hit_terms)
            for r in multi
            if r.query_id == qid
        )
        want = sorted((r.doc_id, r.score, r.n_hit_terms) for r in single)
        assert got == want, qid


def test_bm25_no_matching_terms_is_empty(spark):
    from convoy_spark.operators.textops import bm25_search

    docs = spark.createDataFrame(
        [(1, "some ordinary text here")], "doc_id long, text string"
    )
    assert bm25_search(docs, ["absent", "terms"]).count() == 0


def test_bm25_multi_semi_join_fallback_matches_isin(spark, monkeypatch):
    """Forcing the large-vocabulary broadcast-semi-join path must
    give identical results to the default isin path."""
    from convoy_spark.operators import textops

    docs = spark.createDataFrame(
        [
            (1, "spark stream spark vector"),
            (2, "vector vector stream data"),
            (3, "data spark data model"),
        ],
        "doc_id long, text string",
    )
    qdf = spark.createDataFrame(
        [(0, "spark"), (0, "vector"), (1, "data")],
        "query_id long, term string",
    )
    isin = sorted(
        (r.query_id, r.doc_id, r.score, r.n_hit_terms)
        for r in textops.bm25_search_multi(docs, qdf, top_k=10).collect()
    )
    monkeypatch.setattr(textops, "BM25_ISIN_MAX", 0)  # force fallback
    semi = sorted(
        (r.query_id, r.doc_id, r.score, r.n_hit_terms)
        for r in textops.bm25_search_multi(docs, qdf, top_k=10).collect()
    )
    assert semi == isin and isin


# ---- model-based quality filter ------------------------------------


def test_model_quality_score_matches_python(spark):
    import hashlib

    from convoy_spark.operators.textops import MODEL_DIM, model_quality_score

    rows = [
        (1, "the quick brown fox jumps over the lazy dog"),
        (2, "one"),
        (3, ""),
        (4, "a b a b a b"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r.doc_id: r for r in model_quality_score(df).collect()}

    def h60(s):
        return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)

    def w(f):
        return ((h60(f) % MODEL_DIM) * 2654435761 + 12345) % 2001 - 1000

    for doc_id, text in rows:
        toks = [t for t in text.lower().split() if t]
        feats = toks + [
            f"{a} {b}" for a, b in zip(toks, toks[1:])
        ]
        n = len(feats)
        sn = sum(w(f) for f in feats)
        r = got[doc_id]
        assert r.n_features == n
        assert r.score_num == sn
        logit = sn / (1000.0 * n) if n else 0.0
        assert r.logit == logit  # pure division: bit-identical
        assert r.model_keep == (sn >= 0)


def test_model_quality_score_zero_shuffle_plan(spark):
    import contextlib
    import io

    from convoy_spark.operators.textops import model_quality_score
    from convoy_spark.tables import load_table

    docs = load_table(spark, "/root/testdata/sf0.001", "documents")
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        model_quality_score(docs).explain("formatted")
    plan = buf.getvalue()
    assert "Exchange" not in plan  # a pure scan: no shuffle anywhere
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_trigram_lm_score_matches_python(spark):
    from collections import Counter

    from convoy_spark.operators.textops import trigram_lm_score

    rows = [
        (1, "a b c a b c a b"),      # repeated pattern: high prob
        (2, "a b x q z c a"),        # rare continuations: low prob
        (3, "one two"),              # < 3 tokens: 0 trigrams
        (4, ""),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r.doc_id: r for r in trigram_lm_score(df).collect()}

    tris = {}
    c3, c2 = Counter(), Counter()
    for doc_id, text in rows:
        tk = text.lower().split()
        t = [(f"{a} {b}", c) for a, b, c in zip(tk, tk[1:], tk[2:])]
        tris[doc_id] = t
        for ctx, nxt in t:
            c3[(ctx, nxt)] += 1
            c2[ctx] += 1
    for doc_id, _ in rows:
        t = tris[doc_id]
        r = got[doc_id]
        assert r.n_trigrams == len(t)
        if not t:
            assert r.lm_score == 0.0
            continue
        want = sum(c3[(c, n)] / c2[c] for c, n in t) / len(t)
        # decimal(18,6) sum: agreement to ~1e-6 of the raw mean
        assert abs(r.lm_score - want) < 2e-6, (doc_id, r.lm_score, want)
    # the repetitive doc scores higher than the erratic one
    assert got[1].lm_score > got[2].lm_score


def test_dsir_importance_matches_python(spark):
    """DSIR importance weights vs a pure-Python reference on a corpus
    where two raw docs share the target's vocabulary and two don't —
    the target-like docs must score strictly higher and be selected."""
    import hashlib
    from collections import Counter

    from pyspark.sql import functions as F

    from convoy_spark.operators.textops import dsir_select

    rows = [
        (1, "solar panels power the solar grid"),       # target
        (2, "wind and solar energy power plants"),      # target
        (10, "solar power grid energy panels"),         # raw, target-like
        (11, "solar panels and wind energy"),           # raw, target-like
        (12, "cats chase mice around the house"),       # raw, unrelated
        (13, "recipe for chocolate cake and butter"),   # raw, unrelated
        (14, ""),                                       # raw, empty
    ]
    dim = 4096
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    target = docs.filter(F.col("doc_id") < 10).select("doc_id")
    got = {
        r.doc_id: r
        for r in dsir_select(docs, target, n_select=2, dim=dim).collect()
    }
    assert sorted(got) == [10, 11, 12, 13, 14]  # raw docs only

    def bucket(f):
        return int(hashlib.md5(f.encode()).hexdigest()[:15], 16) % dim

    def feats(text):
        tk = text.lower().split()
        return [bucket(f) for f in tk + [f"{a} {b}" for a, b in zip(tk, tk[1:])]]

    nt, nr = Counter(), Counter()
    for doc_id, text in rows:
        (nt if doc_id < 10 else nr).update(feats(text))
    Nt, Nr = sum(nt.values()), sum(nr.values())
    for doc_id, text in rows:
        if doc_id < 10:
            continue
        fs = feats(text)
        r = got[doc_id]
        assert r.n_features == len(fs)
        if not fs:
            assert r.importance == 0.0
            continue
        want = sum(
            ((nt[b] + 1) / (Nt + dim)) / ((nr[b] + 1) / (Nr + dim))
            for b in fs
        ) / len(fs)
        assert abs(r.importance - want) < 2e-6, (doc_id, r.importance, want)
    # target-like raw docs outrank the unrelated ones and win selection
    assert min(got[10].importance, got[11].importance) > max(
        got[12].importance, got[13].importance
    )
    assert {d for d, r in got.items() if r.selected} == {10, 11}


def test_bpe_encode_docs_matches_python_reference(spark):
    """Train n merges + encode, vs a pure-Python Sennrich
    train/apply: identical merge table semantics (freq-weighted,
    (count desc, left, right) tie-break, greedy left-to-right apply)
    must yield identical per-doc symbol counts."""
    import re

    from convoy_spark.operators.textops import bpe_encode_docs

    rows = [
        (1, "low low low lower"),
        (2, "lower newest newest widest"),
        (3, "the newest lowest low"),
        (4, "wide wide widest the the the"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    n_merges = 4

    # python reference
    ws = re.compile(r"[ \t\n\x0b\f\r]+")
    vocab = {}
    for _, text in rows:
        for t in ws.split(text.lower()):
            if t:
                vocab[t] = vocab.get(t, 0) + 1
    syms = {w: [c for c in w] for w in vocab}

    def apply_merge(seq, l, r):
        out = []
        for x in seq:
            if out and out[-1] == l and x == r:
                out[-1] = l + r
            else:
                out.append(x)
        return out

    for _ in range(n_merges):
        counts = {}
        for w, s in syms.items():
            for a, b in zip(s, s[1:]):
                counts[(a, b)] = counts.get((a, b), 0) + vocab[w]
        if not counts:
            break
        (l, r), _c = min(counts.items(), key=lambda kv: (-kv[1], kv[0]))
        syms = {w: apply_merge(s, l, r) for w, s in syms.items()}

    expect = {}
    for doc_id, text in rows:
        toks = [t for t in ws.split(text.lower()) if t]
        expect[doc_id] = (
            len(toks),
            sum(len(syms[t]) for t in toks),
            sum(len(t) for t in toks),
        )

    got = {
        r.doc_id: (r.n_tokens, r.n_symbols, r.n_chars)
        for r in bpe_encode_docs(docs, n_merges=n_merges).collect()
    }
    assert got == expect
    # symbols never exceed chars, never fall below token count
    for n_tok, n_sym, n_chr in got.values():
        assert n_tok <= n_sym <= n_chr


def test_hybrid_rrf_parity(spark, duck):
    from tests.conftest import run_parity

    run_parity(spark, duck, "hybrid_rrf_topk")


def test_hybrid_rrf_fusion_invariants(spark):
    """Every fused hit carries provenance from at least one leg, the
    RRF score equals the recomputed 1/(60+r) sum of its leg ranks,
    and a doc ranked by BOTH legs outscores the same ranks split
    across docs (the fusion property that makes RRF work)."""
    from convoy_spark.queries import QUERIES

    rows = QUERIES["hybrid_rrf_topk"](spark, "/root/testdata/sf0.001").collect()
    assert rows
    for r in rows:
        assert r.bm25_rank > 0 or r.cos_rank > 0
        want = (1.0 / (60.0 + r.bm25_rank) if r.bm25_rank else 0.0) + (
            1.0 / (60.0 + r.cos_rank) if r.cos_rank else 0.0
        )
        assert r.rrf_score == want, (r, want)
    # per query, ranks are 1..n with strictly non-increasing scores
    from collections import defaultdict

    by_q = defaultdict(list)
    for r in rows:
        by_q[r.query_id].append(r)
    for q, rs in by_q.items():
        rs.sort(key=lambda r: r.rank)
        assert [r.rank for r in rs] == list(range(1, len(rs) + 1))
        scores = [r.rrf_score for r in rs]
        assert all(a >= b for a, b in zip(scores, scores[1:]))


def test_classifier_eval_parity(spark, duck):
    from tests.conftest import run_parity

    run_parity(spark, duck, "classifier_eval")


def test_classifier_eval_invariants(spark):
    """Confusion-matrix accounting on the real corpus: Σ support ==
    n predicted docs, Σ tp + Σ fn == Σ support, and per-class F1
    equals the harmonic mean recomputed from precision/recall.

    NOTE the testdata's lang labels are RANDOM over one shared
    31-word vocabulary (measured: identical distinct-token sets per
    lang), so accuracy here is pinned near chance (~0.23 for 5
    classes) — the harness honestly reports an undiscriminating
    classifier; separability is asserted on a constructed corpus in
    test_classifier_eval_detects_separable_classes."""
    from convoy_spark.queries import QUERIES

    sf = "/root/testdata/sf0.001"
    rows = QUERIES["classifier_eval"](spark, sf).collect()
    preds = QUERIES["lang_id"](spark, sf).count()
    assert sum(r.support for r in rows) == preds
    assert sum(r.tp + r.fn for r in rows) == preds
    for r in rows:
        if r.precision + r.recall > 0:
            want = 2 * r.precision * r.recall / (r.precision + r.recall)
            assert abs(r.f1 - want) < 1e-9
        else:
            assert r.f1 == 0.0
    micro_acc = sum(r.tp for r in rows) / preds
    assert 0.1 < micro_acc < 0.45, micro_acc  # chance band, see NOTE


def test_classifier_eval_detects_separable_classes(spark):
    """On a corpus whose classes have disjoint character
    distributions the same harness must report near-perfect
    per-class F1 — proving the metric stage (not the corpus) is what
    pinned the real-data accuracy at chance."""
    from convoy_spark.operators.textops import langid_predict
    from pyspark.sql import functions as F

    docs = spark.createDataFrame(
        [
            (i, " ".join(words) * 3, lang)
            for lang, words in [
                ("aa", ["alpha", "arena", "aroma"]),
                ("bb", ["bubble", "bobbin", "burb"]),
                ("cc", ["cocoa", "cycle", "civic"]),
            ]
            for i in range(10)
        ],
        "doc_id long, text string, lang string",
    ).withColumn("doc_id", F.monotonically_increasing_id())
    pred = langid_predict(docs)
    conf = {
        (r.true_lang, r.pred_lang): 1 for r in pred.collect()
    }
    assert all(t == p for t, p in conf), conf


def test_token_cooccurrence_invariants(spark):
    # Tiny constructed corpus: recompute support/df/lift in Python.
    from convoy_spark.operators.textops import token_cooccurrence

    corpus = [
        (1, "a b c"),
        (2, "a b"),
        (3, "a b d"),
        (4, "a c"),
        (5, "b c"),
        (6, "a b"),
        (7, "d e"),
        (8, "a b e"),
    ]
    docs = spark.createDataFrame(corpus, "doc_id long, text string")
    rows = token_cooccurrence(docs, min_pair=3).collect()
    sets = {i: set(t.split()) for i, t in corpus}
    n = len(corpus)

    def n_both(x, y):
        return sum(1 for s in sets.values() if x in s and y in s)

    def df(x):
        return sum(1 for s in sets.values() if x in s)

    want = {}
    vocab = sorted({t for s in sets.values() for t in s})
    for i, x in enumerate(vocab):
        for y in vocab[i + 1:]:
            ab = n_both(x, y)
            if ab >= 3 and ab * n > df(x) * df(y):
                want[(x, y)] = (ab, df(x), df(y))
    got = {(r.token_a, r.token_b): (r.n_ab, r.n_a, r.n_b) for r in rows}
    assert got == want and ("a", "b") in got
    for r in rows:
        assert abs(r.lift - (r.n_ab * n) / (r.n_a * r.n_b)) < 1e-12
        assert r.lift > 1.0


def test_stupid_backoff_levels_and_arithmetic(spark):
    """Constructed corpus pinning all three backoff levels: doc 10
    (scored, not in train) contains a trigram seen in train (level 3),
    a trigram whose bigram tail is in train (level 2, x0.4), and a
    trigram whose last word alone is in train (unigram floor, x0.16);
    plus one fully-OOV word (score 0 for that occurrence)."""
    from convoy_spark.operators.textops import stupid_backoff_score

    train_docs = [
        (0, "a b c"),        # trigram (a,b,c); bigrams (a,b),(b,c)
        (1, "d e"),          # bigram (d,e)
        (2, "f"),            # unigram f
    ]
    # scored doc: "a b c" -> level 3; "x d e" -> (x,d,e): trigram
    # unseen, bigram (d,e) seen -> level 2; "y z f" -> (y,z,f):
    # trigram+bigram unseen, unigram f seen -> floor; "q q q" -> OOV.
    docs = spark.createDataFrame(
        train_docs + [(10, "a b c"), (11, "x d e"), (12, "y z f"),
                      (13, "q q q")],
        "doc_id long, text string",
    )
    train = spark.createDataFrame([(0,), (1,), (2,)], "doc_id long")
    got = {r.doc_id: r for r in stupid_backoff_score(docs, train).collect()}

    # N (train tokens) = 3 + 2 + 1 = 6
    r10 = got[10]  # c(abc)/c(ab) = 1/1
    assert (r10.n_trigrams, r10.n_hit3, r10.n_hit2) == (1, 1, 0)
    assert abs(r10.sb_score - 1.0) < 1e-9
    r11 = got[11]  # 0.4 * c(de)/c(d) = 0.4 * 1/1
    assert (r11.n_trigrams, r11.n_hit3, r11.n_hit2) == (1, 0, 1)
    assert abs(r11.sb_score - 0.4) < 1e-9
    r12 = got[12]  # 0.16 * c(f)/N = 0.16/6
    assert (r12.n_trigrams, r12.n_hit3, r12.n_hit2) == (1, 0, 0)
    assert abs(r12.sb_score - 0.16 / 6) < 1e-9
    r13 = got[13]  # fully OOV: floor branch with c(q) = 0
    assert (r13.n_trigrams, r13.n_hit3, r13.n_hit2) == (1, 0, 0)
    assert r13.sb_score == 0.0
    # train docs score through the same pipeline (self-hits, level 3)
    assert got[0].n_hit3 == 1 and abs(got[0].sb_score - 1.0) < 1e-9


def test_stupid_backoff_parity(spark, duck):
    from tests.conftest import run_parity

    run_parity(spark, duck, "stupid_backoff_score")


# --- CART quality-threshold tree -------------------------------------


def test_cart_parity(spark, duck):
    from tests.conftest import run_parity

    run_parity(spark, duck, "cart_quality_tree")


def test_cart_recovers_planted_threshold_rules(spark):
    """On a corpus whose labels ARE threshold rules of the features,
    the depth-2 trainer must recover them: label = A if f1 <= 10
    else (B if f2 <= 5 else C). Held-out accuracy >= 0.9 (the catalog
    corpus carries no threshold signal, so the catalog query can only
    demonstrate the majority-baseline diagnostic — this pins the
    learning semantics)."""
    from pyspark.sql import functions as F

    from convoy_spark.operators.cart import decision_tree_train

    rows = []
    for i in range(120):
        if i % 2 == 0:  # class A lives at f1 <= 10; gap up to 15
            f1 = (i * 3) % 11  # 0..10
            f2 = (i * 5) % 12  # noise
            label = "A"
        else:
            f1 = 15 + (i * 3) % 5  # 15..19
            f2 = (i * 7) % 12  # 0..11
            label = "B" if f2 <= 5 else "C"
        rows.append((i, label, i % 5 != 0, {"f1": f1, "f2": f2}))
    df = spark.createDataFrame(
        rows, "doc_id long, label string, is_train boolean, fmap map<string,long>"
    )
    out = decision_tree_train(df, depth=2).collect()
    root = next(r for r in out if r.depth == 0)
    assert root.split_feature == "f1" and root.split_value == 10, root
    leaves = [r for r in out if r.depth == 2]
    n_eval = sum(r.n_eval for r in leaves)
    hits = sum(r.eval_hits for r in leaves)
    assert n_eval == 24
    assert hits / n_eval >= 0.9, out
    # the right branch must have found the f2 rule
    right = next(r for r in out if r.depth == 1 and r.node_id == 2)
    assert right.split_feature == "f2" and right.split_value == 5, right


def test_cart_unsplittable_node_persists(spark):
    """A node whose rows are identical on every feature has no valid
    split: it must persist through lower levels with null split
    columns rather than crash or vanish."""
    from convoy_spark.operators.cart import decision_tree_train

    rows = [(i, "A" if i % 2 else "B", True, {"f1": 7}) for i in range(10)]
    df = spark.createDataFrame(
        rows, "doc_id long, label string, is_train boolean, fmap map<string,long>"
    )
    out = {(r.depth, r.node_id): r for r in decision_tree_train(df, depth=2).collect()}
    assert set(out) == {(0, 0), (1, 0), (2, 0)}
    assert all(r.split_feature is None for r in out.values())
    assert all(r.n_train == 10 for r in out.values())


def test_forest_parity(spark, duck):
    from tests.conftest import run_parity

    run_parity(spark, duck, "random_forest_train")


def _apply_tree(nodes, fmap):
    """Route one example through a depth-2 tree from its node rows."""
    node = 0
    for _ in range(2):
        row = nodes.get(node)
        if row is None or row.split_feature is None:
            break
        if fmap[row.split_feature] <= row.split_value:
            node = 2 * node + 1
        else:
            node = 2 * node + 2
    # deepest row that exists for this node id
    leaf = nodes.get(node) or nodes[0]
    return leaf.majority_label


def test_forest_votes_recover_planted_rule_with_diversity(spark):
    """Planted rule over 2 informative + 2 noise features; feature
    subsampling (2 of 4) denies some trees the informative root, so
    root splits DIFFER across trees, yet the majority vote still
    recovers the rule with >= 0.85 held-out accuracy."""
    from convoy_spark.operators.cart import decision_forest_train

    rows = []
    for i in range(200):
        if i % 2 == 0:
            f1, label = (i * 3) % 11, "A"  # A lives at f1 <= 10
        else:
            f1 = 15 + (i * 3) % 5
            label = "B" if (i * 7) % 12 <= 5 else "C"
        f2 = (i * 7) % 12  # informative for B/C
        rows.append(
            (i, label, i % 5 != 0,
             {"f1": f1, "f2": f2, "n1": (i * 13) % 7, "n2": (i * 17) % 9})
        )
    df = spark.createDataFrame(
        rows, "doc_id long, label string, is_train boolean, fmap map<string,long>"
    )
    out = decision_forest_train(df, n_trees=5, depth=2).collect()
    by_tree = {}
    for r in out:
        by_tree.setdefault(r.tree, {})
        # keep the deepest row per node id (leaves override levels)
        prev = by_tree[r.tree].get(r.node_id)
        if prev is None or r.depth > prev.depth:
            by_tree[r.tree][r.node_id] = r
    roots = {t: nodes[0].split_feature for t, nodes in by_tree.items()}
    assert len(set(roots.values())) > 1, roots  # diversity is real
    votes_right = total = 0
    for i, label, is_train, fmap in rows:
        if is_train:
            continue
        votes = [_apply_tree(nodes, fmap) for nodes in by_tree.values()]
        pred = max(set(votes), key=lambda v: (votes.count(v), v))
        votes_right += int(pred == label)
        total += 1
    assert total == 40
    assert votes_right / total >= 0.85, (votes_right, total, roots)


def test_coarsened_split_search_bounds_grid_and_still_learns(spark):
    """The binned-split-search guard: coarsening feature values 2^5x
    shrinks the candidate grid (scale knob) while the planted rule is
    still recovered at bin granularity (>= 0.9 held-out)."""
    from convoy_spark.operators.cart import (
        coarsen_features,
        decision_tree_train,
    )

    rows = []
    for i in range(200):
        if i % 2 == 0:
            f1, label = (i * 37) % 800, "A"  # A lives at f1 < 800
        else:
            f1, label = 1200 + (i * 37) % 800, "B"  # B at >= 1200
        rows.append((i, label, i % 5 != 0, {"f1": f1, "f2": (i * 13) % 997}))
    df = spark.createDataFrame(
        rows, "doc_id long, label string, is_train boolean, fmap map<string,long>"
    )
    fine = decision_tree_train(df, depth=1)
    coarse = decision_tree_train(coarsen_features(df, 5), depth=1)
    froot = next(r for r in fine.collect() if r.depth == 0)
    croot = next(r for r in coarse.collect() if r.depth == 0)
    assert froot.split_feature == croot.split_feature == "f1"
    # coarse threshold is a bin boundary of the fine one
    assert croot.split_value <= froot.split_value // 32 + 1
    leaves = [r for r in coarse.collect() if r.depth == 1]
    hits = sum(r.eval_hits for r in leaves)
    n = sum(r.n_eval for r in leaves)
    assert n > 0 and hits / n >= 0.9
    # the grid really shrank: distinct coarse values per feature
    import pyspark.sql.functions as SF

    nfine = (
        df.select(SF.explode("fmap")).distinct().count()
    )
    ncoarse = (
        coarsen_features(df, 5).select(SF.explode("fmap")).distinct().count()
    )
    assert ncoarse < nfine / 3


def test_isoforest_parity(spark, duck):
    from tests.conftest import run_parity

    run_parity(spark, duck, "isoforest_outliers")


def test_isoforest_isolates_planted_outlier(spark):
    """A point far outside the data cloud on every feature must get
    the smallest leaf-size score (rank 1): random hash-cuts inside
    [min, max] repeatedly slice the empty gap, isolating it early."""
    from convoy_spark.operators.cart import isolation_scores

    rows = [
        (i, {"f1": 100 + (i * 7) % 25, "f2": 200 + (i * 11) % 30,
             "f3": 50 + (i * 3) % 10, "f4": 300 + (i * 5) % 20})
        for i in range(120)
    ]
    rows.append((999, {"f1": 100000, "f2": 900000, "f3": 70000,
                       "f4": 500000}))
    df = spark.createDataFrame(rows, "doc_id long, fmap map<string,long>")
    scores = isolation_scores(df).collect()
    ranked = sorted(scores, key=lambda r: (r.sum_leaf_n, r.doc_id))
    assert ranked[0].doc_id == 999, ranked[:3]
    # scores are exact integers; mean is score/8 exactly
    for r in scores:
        assert r.mean_leaf_n == r.sum_leaf_n / 8.0
