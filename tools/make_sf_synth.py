#!/usr/bin/env python
"""Synthesize a larger documents/embeddings corpus for the bench
slope checkpoint above sf0.1 (BENCH_NOTES ratio-curve evidence).

Deterministic construction, no RNG state shared with the queries:

- copy 0 is the source corpus verbatim;
- copies i >= 1 re-salt ids (``+= i * ID_STRIDE``) and apply a
  per-copy deterministic SUBSTITUTION CIPHER over [a-zA-Z0-9] (seeded
  alphabet permutation, case-aligned). A character bijection leaves
  token boundaries, token/char counts and every length statistic
  untouched, and maps each word n-gram / char k-gram 1:1 — so two
  docs within a copy share a (ciphered) shingle IFF they shared the
  original: the within-copy near-dup PAIR GRAPH is exactly copy 0's,
  and cross-copy shingle Jaccard is ~0 (different cipher per copy).
  The pair graph therefore scales LINEARLY with copies, which is the
  honest shape for a bigger corpus.

  (Round-5 note: the previous construction — per-copy keyed token
  SORT — canonicalized token order corpus-wide, so unrelated docs
  sharing vocabulary collided into near-equal sequences: each sorted
  copy produced 300–600k LSH candidate pairs vs the real corpus's
  319, inflating every sketch-family sf1.0 number ~1000× in candidate
  volume. The cipher keeps the intended linear structure without that
  artifact.)
- embeddings get per-copy deterministic Gaussian jitter (sigma 0.01,
  seeded by the copy index) so ANN/PCA row volume scales without
  planting exact duplicate vectors.

- round 5 extends the slope to the REFERENCE-CORE families:
  orders/lineitem are scaled the same way (``key += i * KEY_STRIDE``,
  stride a multiple of 1000) — since the synthetic forest's parent
  rule is pure div/mod-block arithmetic (operators/forest.py), a
  stride-shifted copy reproduces copy 0's tree structure EXACTLY
  (parent(k + S) = parent(k) + S for S ≡ 0 mod 1000), so
  closure/tree/rollup workloads see 10× the trees at identical depth
  — more conversations, not deeper ones, matching how a crawl grows.

Remaining tables (events, dims) are symlinked from the source SF so
any catalog query still runs, at source scale.

Usage::

    python tools/make_sf_synth.py [copies] [src_sf_dir] [out_dir]

Defaults: 10 copies, /root/testdata/sf0.1, tools/sf1.0 (the dir name
encodes the effective documents SF for bench.py's sf regex).
"""

from __future__ import annotations

import os
import sys

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

ID_STRIDE = 10_000_000


def _write_table(table: pa.Table, path: str) -> None:
    """Write, NEVER through a symlink: an out dir from an older synth
    version symlinked the relational tables to the SOURCE sf dir —
    following that link would silently clobber the driver's testdata."""
    if os.path.islink(path):
        os.unlink(path)
    pq.write_table(table, path)


def _cipher_table(copy_idx: int) -> dict[int, int]:
    """Deterministic per-copy substitution cipher over a-z / A-Z /
    0-9 (case-aligned: 'a'→'q' implies 'A'→'Q', so lowercasing
    commutes with the cipher and the Spark/DuckDB lowercase token
    pipelines see a consistent bijection)."""
    rng = np.random.RandomState(7000 + copy_idx)
    lower = list("abcdefghijklmnopqrstuvwxyz")
    digits = list("0123456789")
    lp = rng.permutation(lower)
    dp = rng.permutation(digits)
    tbl: dict[int, int] = {}
    for src_ch, dst_ch in zip(lower, lp):
        tbl[ord(src_ch)] = ord(dst_ch)
        tbl[ord(src_ch.upper())] = ord(dst_ch.upper())
    for src_d, dst_d in zip(digits, dp):
        tbl[ord(src_d)] = ord(dst_d)
    return tbl


def synth_documents(src: str, out: str, copies: int) -> int:
    t = pq.read_table(os.path.join(src, "documents.parquet")).to_pandas()
    frames = []
    for i in range(copies):
        c = t.copy()
        c["doc_id"] = c["doc_id"] + i * ID_STRIDE
        if i > 0:
            tbl = _cipher_table(i)
            c["text"] = [txt.translate(tbl) for txt in c["text"]]
        frames.append(c)
    import pandas as pd

    allp = pd.concat(frames, ignore_index=True)
    _write_table(
        pa.Table.from_pandas(allp, preserve_index=False),
        os.path.join(out, "documents.parquet"),
    )
    return len(allp)


def synth_embeddings(src: str, out: str, copies: int) -> int:
    t = pq.read_table(os.path.join(src, "embeddings.parquet")).to_pandas()
    mat = np.stack(t["embedding"].to_numpy())  # (n, dim) float32
    frames = []
    import pandas as pd

    for i in range(copies):
        c = t.copy()
        c["vec_id"] = c["vec_id"] + i * ID_STRIDE
        if i > 0:
            rng = np.random.RandomState(1000 + i)
            jit = (mat + rng.normal(0, 0.01, mat.shape)).astype(np.float32)
            c["embedding"] = list(jit)
        frames.append(c)
    allp = pd.concat(frames, ignore_index=True)
    schema = pa.schema(
        [
            ("vec_id", pa.int64()),
            ("embedding", pa.list_(pa.float32())),
            ("label", pa.int64()),
        ]
    )
    _write_table(
        pa.Table.from_pandas(allp[["vec_id", "embedding", "label"]], schema=schema),
        os.path.join(out, "embeddings.parquet"),
    )
    return len(allp)


KEY_STRIDE = 100_000_000  # multiple of 1000: preserves the forest's
# div-100 parent blocks and div-1000 ur superblocks per copy


def synth_relational(
    src: str, out: str, copies: int, part_stride: bool = False
) -> tuple[int, int]:
    """``part_stride`` additionally strides ``l_partkey`` per copy, so
    the part-derived GRAPHS (co-purchase part-part, bipartite
    order-part) grow `copies`× instead of collapsing onto copy 0's
    part set under the edge DISTINCT — the honest construction for the
    graph-family slope (each copy is a disjoint component with copy
    0's exact structure). Breaks the part FK on purpose (parts stay
    symlinked); use the part-strided dir ONLY for graph workloads."""
    import pandas as pd

    o = pq.read_table(os.path.join(src, "orders.parquet")).to_pandas()
    li = pq.read_table(os.path.join(src, "lineitem.parquet")).to_pandas()
    of, lf = [], []
    for i in range(copies):
        oc = o.copy()
        oc["o_orderkey"] = oc["o_orderkey"] + i * KEY_STRIDE
        of.append(oc)
        lc = li.copy()
        lc["l_orderkey"] = lc["l_orderkey"] + i * KEY_STRIDE
        if part_stride:
            lc["l_partkey"] = lc["l_partkey"] + i * ID_STRIDE
        lf.append(lc)
    oall = pd.concat(of, ignore_index=True)
    lall = pd.concat(lf, ignore_index=True)
    _write_table(
        pa.Table.from_pandas(oall, preserve_index=False),
        os.path.join(out, "orders.parquet"),
    )
    _write_table(
        pa.Table.from_pandas(lall, preserve_index=False),
        os.path.join(out, "lineitem.parquet"),
    )
    return len(oall), len(lall)


def synth_events(src: str, out: str, copies: int) -> int:
    """Round-6: scale events by USER-stride copies — copy i shifts
    ``user_id`` and ``event_id``, keeps ts/type/value verbatim. Each
    copy's users are new users with copy-0's exact per-user history,
    so the keyed-window families (temporal, sessionize, cohorts,
    event-time aggs) see copies× the partition-key groups at identical
    group size — how an event stream actually grows (more users, not
    longer single histories). Outputs of every per-user query scale
    exactly linearly, which makes slope ratios interpretable."""
    import pandas as pd

    ev = pq.read_table(os.path.join(src, "events.parquet")).to_pandas()
    frames = []
    for i in range(copies):
        c = ev.copy()
        c["event_id"] = c["event_id"] + i * ID_STRIDE
        c["user_id"] = c["user_id"] + i * ID_STRIDE
        frames.append(c)
    allv = pd.concat(frames, ignore_index=True)
    _write_table(
        pa.Table.from_pandas(allv, preserve_index=False),
        os.path.join(out, "events.parquet"),
    )
    return len(allv)


def main() -> None:
    copies = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    src = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
    out = (
        sys.argv[3]
        if len(sys.argv) > 3
        else os.path.join(os.path.dirname(os.path.abspath(__file__)), "sf1.0")
    )
    part_stride = "--part-stride" in sys.argv
    os.makedirs(out, exist_ok=True)
    nd = synth_documents(src, out, copies)
    ne = synth_embeddings(src, out, copies)
    no, nl = synth_relational(src, out, copies, part_stride=part_stride)
    nev = synth_events(src, out, copies)
    print(f"orders={no} lineitem={nl} events={nev}")
    for tname in [
        "region",
        "nation",
        "customer",
        "supplier",
        "part",
    ]:
        dst = os.path.join(out, f"{tname}.parquet")
        if not os.path.exists(dst):
            # Relative symlink so a relocated checkout (same layout) still
            # resolves; these dirs are gitignored and regenerated, never
            # committed (round-9 ADVICE: no generated parquet in git).
            target = os.path.relpath(
                os.path.join(os.path.abspath(src), f"{tname}.parquet"),
                os.path.abspath(out),
            )
            os.symlink(target, dst)
    print(f"wrote {out}: documents={nd} embeddings={ne} (copies={copies})")


if __name__ == "__main__":
    main()
