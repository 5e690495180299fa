#!/usr/bin/env python
"""Synthesize a larger documents/embeddings corpus for the bench
slope checkpoint above sf0.1 (BENCH_NOTES ratio-curve evidence).

Deterministic construction, no RNG state shared with the queries:

- copy 0 is the source corpus verbatim;
- copies i >= 1 re-salt ids (``+= i * ID_STRIDE``) and reorder each
  text's token sequence by a per-copy keyed hash. That preserves the
  within-copy near-dup structure (two docs with near-equal token
  multisets sort into near-equal sequences, so their shingle Jaccard
  stays high) while sending cross-copy shingle Jaccard to ~0 (every
  shingle is a hash-ordered k-gram, different per copy) — the LSH
  pair graph therefore scales LINEARLY with copies instead of
  quadratically, which is the honest shape for a bigger corpus; token
  multisets, and hence token counts, char trigram profiles and
  quality ratios, are preserved per doc.
- embeddings get per-copy deterministic Gaussian jitter (sigma 0.01,
  seeded by the copy index) so ANN/PCA row volume scales without
  planting exact duplicate vectors.

Relational tables are NOT synthesized — the slope queries are the
documents/embeddings workloads (the 100 TB argument's subject); the
other tables are symlinked from the source SF so any catalog query
still runs, at source scale.

Usage::

    python tools/make_sf_synth.py [copies] [src_sf_dir] [out_dir]

Defaults: 10 copies, /root/testdata/sf0.1, tools/sf1.0 (the dir name
encodes the effective documents SF for bench.py's sf regex).
"""

from __future__ import annotations

import hashlib
import os
import sys

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

ID_STRIDE = 10_000_000


def _shuffle_key(token: str, salt: str) -> bytes:
    return hashlib.blake2b(
        (token + salt).encode(), digest_size=8
    ).digest()


def synth_documents(src: str, out: str, copies: int) -> int:
    t = pq.read_table(os.path.join(src, "documents.parquet")).to_pandas()
    frames = []
    for i in range(copies):
        c = t.copy()
        c["doc_id"] = c["doc_id"] + i * ID_STRIDE
        if i > 0:
            salt = f"copy{i}"
            c["text"] = [
                " ".join(
                    sorted(txt.split(), key=lambda tok: _shuffle_key(tok, salt))
                )
                for txt in c["text"]
            ]
            c["n_chars"] = [len(x) for x in c["text"]]
        frames.append(c)
    import pandas as pd

    allp = pd.concat(frames, ignore_index=True)
    pq.write_table(
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
    pq.write_table(
        pa.Table.from_pandas(allp[["vec_id", "embedding", "label"]], schema=schema),
        os.path.join(out, "embeddings.parquet"),
    )
    return len(allp)


def main() -> None:
    copies = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    src = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
    out = (
        sys.argv[3]
        if len(sys.argv) > 3
        else os.path.join(os.path.dirname(os.path.abspath(__file__)), "sf1.0")
    )
    os.makedirs(out, exist_ok=True)
    nd = synth_documents(src, out, copies)
    ne = synth_embeddings(src, out, copies)
    for tname in [
        "region",
        "nation",
        "customer",
        "supplier",
        "part",
        "orders",
        "lineitem",
        "events",
    ]:
        dst = os.path.join(out, f"{tname}.parquet")
        if not os.path.exists(dst):
            os.symlink(os.path.join(src, f"{tname}.parquet"), dst)
    print(f"wrote {out}: documents={nd} embeddings={ne} (copies={copies})")


if __name__ == "__main__":
    main()
