"""Property-based tests (hypothesis; SURVEY §5 strategy #4): random
forests in, structural invariants out — for the closure and the tree
statistics. Few, large-ish examples: each property round-trips
through Spark, so we trade example count for example size."""

from __future__ import annotations

from hypothesis import given, settings, strategies as st

from convoy_spark.operators.closure import closure_roots
from convoy_spark.operators.treestats import tree_stats

EDGE_SCHEMA = "child_id long, parent_id long"


@st.composite
def forests(draw, max_nodes=60):
    """Random forest as (child, parent) edges: node i may attach to
    any earlier node — acyclic by construction."""
    n = draw(st.integers(min_value=1, max_value=max_nodes))
    edges = []
    for i in range(1, n + 1):
        if i == 1 or draw(st.booleans()):
            edges.append((i, None))
        else:
            edges.append((i, draw(st.integers(min_value=1, max_value=i - 1))))
    return edges


def _true_root(parents, node):
    while parents[node] is not None:
        node = parents[node]
    return node


@given(forests())
@settings(max_examples=8, deadline=None)
def test_closure_finds_true_roots(spark, edges):
    parents = dict(edges)
    got = {
        r.node_id: r.root_id
        for r in closure_roots(
            spark.createDataFrame(edges, EDGE_SCHEMA)
        ).collect()
    }
    assert got == {n: _true_root(parents, n) for n in parents}


# Text drawn from a alphabet that deliberately includes every
# whitespace the Java/RE2 engines disagree about (\x0b vertical tab —
# the round-2 advice bug class) plus unicode letters beyond ASCII.
_TEXT_ALPHABET = st.sampled_from(
    list("ab xy.!\t\n\x0b\f\r") + ["é", "Ω", "中"]
)
_texts = st.lists(
    st.text(_TEXT_ALPHABET, min_size=0, max_size=40), min_size=1, max_size=6
)

_WS = set(" \t\n\x0b\f\r")


def _py_tokens(text: str) -> list[str]:
    """Pure-Python mirror of the engine's explicit-class whitespace
    split (hashing.WS_SPLIT): split on runs of the six chars, drop
    empties, lowercase."""
    out, cur = [], []
    for ch in text.lower():
        if ch in _WS:
            if cur:
                out.append("".join(cur))
            cur = []
        else:
            cur.append(ch)
    if cur:
        out.append("".join(cur))
    return out


@given(_texts)
@settings(max_examples=8, deadline=None)
def test_tokenization_matches_python_reference(spark, texts):
    """doc_tokens must agree with the pure-Python split for ANY text,
    including vertical tabs and non-ASCII — the exact class of input
    where `\\s` is engine-dependent (round-2 advice)."""
    from convoy_spark.operators.dedup import doc_tokens

    docs = spark.createDataFrame(
        list(enumerate(texts)), "doc_id long, text string"
    )
    got: dict[int, list[str]] = {i: [] for i in range(len(texts))}
    rows = doc_tokens(docs).collect()
    # doc_tokens explodes; rebuild per-doc multiset (order not defined)
    for r in rows:
        got[r.doc_id].append(r.token)
    for i, t in enumerate(texts):
        assert sorted(got[i]) == sorted(_py_tokens(t)), repr(t)


def _py_winnow(text: str, k: int, w: int, B: int, M: int) -> set:
    low = text.lower()
    if len(low) < k:
        return set()
    codes = [ord(c) for c in low]
    hashes = []
    for i in range(len(codes) - k + 1):
        h = codes[i]
        for j in range(1, k):
            h = (h * B + codes[i + j]) % M
        hashes.append(h)
    n_win = max(1, len(hashes) - (w - 1))
    return {min(hashes[i : i + w]) for i in range(n_win)}


@given(_texts)
@settings(max_examples=8, deadline=None)
def test_winnow_matches_python_reference(spark, texts):
    """The Horner codepoint fingerprints must equal a direct Python
    implementation of Schleimer et al. on arbitrary text (unicode
    codepoints included) — defends both the hash arithmetic and the
    full-window bound."""
    from convoy_spark.functions.hashing import MERSENNE31
    from convoy_spark.operators.textops import (
        WINNOW_B,
        WINNOW_K,
        WINNOW_W,
        winnow_fingerprints,
    )

    docs = spark.createDataFrame(
        list(enumerate(texts)), "doc_id long, text string"
    )
    got: dict[int, set] = {}
    for r in winnow_fingerprints(docs).collect():
        got.setdefault(r.doc_id, set()).add(r.fp)
    for i, t in enumerate(texts):
        want = _py_winnow(t, WINNOW_K, WINNOW_W, WINNOW_B, MERSENNE31)
        assert got.get(i, set()) == want, repr(t)


@given(_texts)
@settings(max_examples=6, deadline=None)
def test_repetition_ratios_match_python_reference(spark, texts):
    from convoy_spark.operators.textops import repetition_signals

    docs = spark.createDataFrame(
        list(enumerate(texts)), "doc_id long, text string"
    )
    rows = {r.doc_id: r for r in repetition_signals(docs).collect()}
    for i, t in enumerate(texts):
        toks = _py_tokens(t)
        if not toks:
            assert i not in rows  # token-less docs emit no row
            continue
        r = rows[i]
        assert r.n_tokens == len(toks)
        top = max(toks.count(x) for x in set(toks))
        assert r.top_token_ratio == top / len(toks)
        for n, col in ((2, r.dup_2gram_ratio), (3, r.dup_3gram_ratio)):
            grams = [
                " ".join(toks[j : j + n]) for j in range(len(toks) - n + 1)
            ]
            want = (
                0.0
                if not grams
                else (len(grams) - len(set(grams))) / len(grams)
            )
            assert col == want, (repr(t), n)


@given(forests(max_nodes=40))
@settings(max_examples=6, deadline=None)
def test_tree_stats_invariants(spark, edges):
    """The reference's own guards (`3_create_tweet_stats_i.py:244-247`)
    plus conservation laws: Σ(1+descendants over roots) = n,
    leaf counts bounded by descendants, max_depth ≤ descendants,
    mean depth between 1 and max_depth for non-leaves."""
    n = len(edges)
    parents = dict(edges)
    rows = tree_stats(spark.createDataFrame(edges, EDGE_SCHEMA)).collect()
    assert len(rows) == n
    by_id = {r.node_id: r for r in rows}
    root_mass = sum(
        1 + by_id[i].n_descendants for i in by_id if parents[i] is None
    )
    assert root_mass == n
    for r in rows:
        assert 0 <= r.n_leaf_descendants <= r.n_descendants
        assert r.max_depth <= r.n_descendants
        if r.n_leaf_descendants:
            assert 1.0 <= r.mean_leaf_depth <= r.max_depth
        else:
            assert r.mean_leaf_depth == 0.0 and r.max_depth == 0


def _py_greedy_merge(syms: list[str], left: str, right: str) -> list[str]:
    """Greedy left-to-right single-merge application — the reference
    semantics the engine's aggregate fold and the oracle's odd-parity
    run selection must both equal."""
    out: list[str] = []
    i = 0
    while i < len(syms):
        if i + 1 < len(syms) and syms[i] == left and syms[i + 1] == right:
            out.append(left + right)
            i += 2
        else:
            out.append(syms[i])
            i += 1
    return out


@given(
    st.lists(st.sampled_from("ab"), min_size=0, max_size=14),
    st.sampled_from(["aa", "ab", "ba", "bb"]),
)
@settings(max_examples=20, deadline=None)
def test_bpe_greedy_fold_matches_python_reference(spark, syms, pair):
    """The JVM aggregate fold inside bpe_train_vocab must equal the
    pure-Python greedy scan for EVERY symbol sequence over a binary
    alphabet — including the overlapping left==right runs where the
    odd-parity subtlety lives."""
    from pyspark.sql import functions as F

    left, right = pair[0], pair[1]
    df = spark.createDataFrame([([*syms],)], "syms array<string>")
    l, r, m = F.lit(left), F.lit(right), F.lit(left + right)
    folded = df.select(
        F.aggregate(
            "syms",
            F.expr("cast(array() as array<string>)"),
            lambda acc, x: F.when(
                (F.size(acc) > 0)
                & (F.element_at(acc, -1) == l)
                & (x == r),
                F.concat(
                    F.slice(acc, F.lit(1), F.size(acc) - 1), F.array(m)
                ),
            ).otherwise(F.concat(acc, F.array(x))),
        ).alias("out")
    ).first()
    assert folded.out == _py_greedy_merge(syms, left, right), (syms, pair)


# --- round-6: block prefix scan and span dedup vs Python references -


@given(
    st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=40),  # dup-heavy keys
            st.integers(min_value=-5, max_value=9),
        ),
        min_size=1,
        max_size=80,
    )
)
@settings(max_examples=6, deadline=None)
def test_block_prefix_sum_matches_cumsum(spark, kvs):
    """Duplicate order keys + a unique tiebreak: the two-phase scan
    equals the driver-side cumulative sum in (key, uid) order for any
    block size and any partitioning."""
    from convoy_spark.operators.loader import block_prefix_sum

    rows = [(k, i, v) for i, (k, v) in enumerate(kvs)]
    df = spark.createDataFrame(rows, "k long, uid long, v long").repartition(7)
    got = {
        (r.k, r.uid): r.cum
        for r in block_prefix_sum(
            df, "k", "v", block_size=8, tiebreak_col="uid"
        ).collect()
    }
    run = 0
    for k, uid, v in sorted(rows):
        run += v
        assert got[(k, uid)] == run


def _py_span_dedup(texts, k):
    """Pure-Python reference for span_dedup (same contract)."""
    seen = {}
    spans_all = []
    for doc_id, text in sorted(texts):
        toks = text.split()
        nch = max(1, -(-len(toks) // k))
        for pos in range(nch):
            chunk = " ".join(toks[pos * k : (pos + 1) * k])
            full = (pos + 1) * k <= len(toks)
            key = chunk
            if full and key in seen:
                kept = False
            else:
                if full:
                    seen[key] = (doc_id, pos)
                kept = True
            spans_all.append((doc_id, pos, chunk, kept))
    out = {}
    for doc_id, _ in texts:
        mine = [s for s in spans_all if s[0] == doc_id]
        kept = [c for _, _, c, kp in sorted(mine, key=lambda s: s[1]) if kp]
        out[doc_id] = (
            " ".join(kept),
            sum(1 for s in mine if s[3]),
            sum(1 for s in mine if not s[3]),
        )
    return out


@given(
    st.lists(
        st.lists(
            st.sampled_from("aa bb cc dd".split()), min_size=0, max_size=12
        ),
        min_size=1,
        max_size=10,
    )
)
@settings(max_examples=6, deadline=None)
def test_span_dedup_matches_python(spark, token_lists):
    """Tiny alphabet → dense span collisions; the Spark rewrite
    matches the pure-Python first-wins reference exactly, including
    reassembled text."""
    from convoy_spark.operators.dedup import span_dedup

    texts = [(i, " ".join(toks)) for i, toks in enumerate(token_lists)]
    df = spark.createDataFrame(texts, "doc_id long, text string")
    got = {
        r.doc_id: (r.clean_text, r.spans_kept, r.spans_dropped)
        for r in span_dedup(df, k=3).collect()
    }
    assert got == _py_span_dedup(texts, 3)
