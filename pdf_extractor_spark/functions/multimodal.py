"""Multimodal column plumbing: opaque ``binary`` payloads + typed
metadata, decoded/feature-extracted through Arrow-batched stages.

Design (task brief "multimodal columns"): image/audio/video payloads
ride as ``binary`` columns with a typed metadata struct. The Spark-side
plumbing — schema, partitioning, ``mapInPandas`` signature, Arrow batch
shape — is real and tested; the actual codec call is STUBBED with a
deterministic fake (this container ships no image/audio libraries).
``decode_image_meta_pandas`` marks the exact line where a real decoder
(PIL/ffmpeg) would plug in.

The fake decode derives every field from ``md5`` + byte length, so a
plain-SQL oracle can verify the whole distributed path value-for-value:

    n_bytes  = octet_length(payload)
    width    = 16 + (first md5 byte  mod 240)
    height   = 16 + (second md5 byte mod 240)
    channels = 3

``resize_plan`` and ``frame_sample_plan`` are pure column math (native,
codegen'd) — at 100 TB only the decode itself is Python, and it is
Arrow-batched with the same url-hash partitioning as the extraction
pipeline.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

DECODE_SCHEMA = (
    "doc_id long, n_bytes long, width int, height int, channels int"
)

MAX_DIM = 64  # resize target (longest edge)


def attach_binary_payload(docs: DataFrame) -> DataFrame:
    """documents → (doc_id, payload binary, meta struct). Synthesizes
    the payload deterministically from ``text`` (no external data); in
    production this column is the raw image/audio bytes."""
    return docs.select(
        "doc_id",
        F.encode("text", "UTF-8").alias("payload"),
        F.struct(
            F.lit("fake/image").alias("format"),
            F.length(F.encode("text", "UTF-8")).alias("n_bytes"),
        ).alias("meta"),
    )


def _fake_decode(payload: bytes) -> tuple[int, int, int]:
    """STUB — deterministic fake decoder.

    A real implementation would be:
        img = PIL.Image.open(io.BytesIO(payload))   # <- real codec here
        return img.width, img.height, len(img.getbands())
    """
    digest = hashlib.md5(payload).digest()
    width = 16 + digest[0] % 240
    height = 16 + digest[1] % 240
    return width, height, 3


def decode_image_meta_pandas(
    batches: Iterator[pd.DataFrame],
) -> Iterator[pd.DataFrame]:
    """mapInPandas body: Arrow batch of (doc_id, payload) → decoded
    metadata frame. One Python hop per batch, never per row."""
    for pdf in batches:
        dims = [_fake_decode(p) for p in pdf["payload"]]
        yield pd.DataFrame(
            {
                "doc_id": pdf["doc_id"].to_numpy(),
                "n_bytes": [len(p) for p in pdf["payload"]],
                "width": [d[0] for d in dims],
                "height": [d[1] for d in dims],
                "channels": [d[2] for d in dims],
            }
        )


def decode_image_meta(docs: DataFrame, num_partitions: int = 8) -> DataFrame:
    """Distributed decode: hash-repartition by doc_id (same layout rule
    as the extraction pipeline — a small parquet arrives as one split
    otherwise), then the Arrow-batched decode stage."""
    payloads = attach_binary_payload(docs).select("doc_id", "payload")
    return payloads.repartition(num_partitions, F.col("doc_id")).mapInPandas(
        decode_image_meta_pandas, DECODE_SCHEMA
    )


def resize_plan(decoded: DataFrame, max_dim: int = MAX_DIM) -> DataFrame:
    """Pure column math: scale so the longest edge == ``max_dim``
    (integer floor, aspect preserved). Native expressions — the actual
    pixel resample would live next to the decoder stub."""
    longest = F.greatest("width", "height")
    return decoded.select(
        "doc_id", "width", "height",
        F.floor(F.col("width") * max_dim / longest).cast("int")
        .alias("new_width"),
        F.floor(F.col("height") * max_dim / longest).cast("int")
        .alias("new_height"),
    )


def frame_sample_plan(decoded: DataFrame, every: int = 10) -> DataFrame:
    """Video-style frame sampling plan: fake frame count from byte
    length, sample indices 0, every, 2·every, … as a native
    ``sequence`` column (no Python)."""
    n_frames = (F.col("n_bytes") % 91 + 1).cast("int")
    return decoded.select(
        "doc_id",
        n_frames.alias("n_frames"),
        F.expr(
            f"sequence(0, cast(n_bytes % 91 as int), {every})"
        ).alias("sampled_frames"),
    )
