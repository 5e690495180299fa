"""Multimodal column plumbing (north-star extensions, SURVEY §7 M6).

Image/audio/video payloads are opaque ``binary`` columns with typed
metadata structs; decode / feature-extract / resize / frame-sample run
as Arrow-batched ``mapInPandas`` stages — the sanctioned Python escape
hatch (SURVEY §2.10), never row-at-a-time UDFs.

The actual codec work is STUBBED: the image/audio libraries are not in
this container, so :func:`decode_media` routes to a clearly-marked
``NotImplementedError`` when asked for a real decode, and to a
**deterministic fake** (dimensions derived arithmetically from payload
bytes) otherwise. What IS real — and tested — is everything Spark
cares about: the binary schema, the Arrow batch shape, the iterator
contract, partition-local execution, and the output schema. Swapping
the fake for Pillow/ffmpeg changes one inner function.

Scale: mapInPandas streams Arrow batches through each task —
``spark.sql.execution.arrow.maxRecordsPerBatch`` bounds peak memory, a
100 MB media blob never collects to the driver, and the stage
preserves the upstream partitioning (no shuffle). Payload-heavy
pipelines should project metadata early and drop bytes before any
shuffle — the plans here do.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from convoy_spark.session import ensure_executor_imports

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

DECODED_SCHEMA = (
    "media_id long, kind string, byte_len long, width int, height int, "
    "channels int"
)

FRAME_SCHEMA = "media_id long, frame_idx int, frame_hash long"


def media_from_documents(docs: DataFrame) -> DataFrame:
    """Synthesize the media table shape from ``documents``: payload =
    utf-8 bytes of the text, kind cycled by id. Stands in for a real
    (id, kind, payload, meta) media lake table."""
    return docs.select(
        F.col("doc_id").alias("media_id"),
        F.element_at(
            F.array(F.lit("image"), F.lit("audio"), F.lit("video")),
            (F.col("doc_id") % 3 + 1).cast("int"),
        ).alias("kind"),
        F.encode(F.col("text"), "utf-8").alias("payload"),
    )


def _fake_decode(payload: bytes) -> tuple[int, int, int]:
    """Deterministic stand-in for a codec: dimensions from byte
    arithmetic. SQL-expressible on purpose so the catalog query
    carries a full oracle."""
    n = len(payload)
    first = payload[0] if n else 0
    return (64 + n % 512, 64 + (n * 7) % 512, 1 + first % 3)


def decode_media(media: DataFrame, real: bool = False) -> DataFrame:
    """Decode stage: (media_id, kind, payload) → typed metadata.

    ``real=True`` is the production path and raises until a codec
    library is wired in; the default fake path exercises the identical
    Spark plumbing (Arrow batches in, Arrow batches out, payload
    dropped from the output schema so bytes never shuffle)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if real:
                raise NotImplementedError(
                    "real media decode needs an image/audio codec library; "
                    "not available in this environment"
                )
            dims = [_fake_decode(p) for p in pdf["payload"]]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "byte_len": [len(p) for p in pdf["payload"]],
                    "width": [d[0] for d in dims],
                    "height": [d[1] for d in dims],
                    "channels": [d[2] for d in dims],
                }
            )

    ensure_executor_imports(media.sparkSession)
    return media.mapInPandas(run, schema=DECODED_SCHEMA)


def resize_meta(decoded: DataFrame, max_side: int = 256) -> DataFrame:
    """Resize planning stage: pure column arithmetic (no Python) —
    the scale factor and target dims every real resize kernel needs,
    computed JVM-side. Keeps the pattern honest: only the pixel work
    belongs in Pandas."""
    scale = F.least(
        F.lit(1.0),
        F.lit(max_side)
        / F.greatest(F.col("width"), F.col("height")).cast("double"),
    )
    return decoded.withColumns(
        {
            "scale": scale,
            "out_width": F.greatest(
                F.lit(1), F.floor(F.col("width") * scale).cast("int")
            ),
            "out_height": F.greatest(
                F.lit(1), F.floor(F.col("height") * scale).cast("int")
            ),
        }
    )


def frame_sample(media: DataFrame, n_frames: int = 4) -> DataFrame:
    """Frame-sampling stage for "video" payloads: split the payload
    into ``n_frames`` even chunks and fingerprint each — the batch
    shape (one input row → n output rows) of a real frame extractor,
    with a deterministic chunk hash standing in for the pixels."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, hashes = [], [], []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                n = len(payload)
                step = max(1, n // n_frames)
                for k in range(n_frames):
                    chunk = payload[k * step: (k + 1) * step]
                    # cheap deterministic fingerprint (FNV-1a 64)
                    h = 0xCBF29CE484222325
                    for b in chunk:
                        h = ((h ^ b) * 0x100000001B3) & 0x7FFFFFFFFFFFFFFF
                    ids.append(mid)
                    idxs.append(k)
                    hashes.append(h)
            yield pd.DataFrame(
                {"media_id": ids, "frame_idx": idxs, "frame_hash": hashes}
            )

    ensure_executor_imports(media.sparkSession)
    return media.filter(F.col("kind") == "video").mapInPandas(
        run, schema=FRAME_SCHEMA
    )
