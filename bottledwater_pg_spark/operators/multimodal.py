"""Multimodal column plumbing: opaque ``binary`` payloads with typed
metadata, processed by Arrow-batched Pandas functions via
``mapInPandas``.

The container has no image/audio codecs, so the decode itself is a
clearly-marked deterministic fake (or raises ``NotImplementedError``
in strict mode) — but everything Spark-side is real and tested: the
binary column schema, the Arrow batch transfer, the UDF signature and
batch shapes, and the partition-parallel execution. Swapping in a real
``PIL.Image.open`` / ``soundfile.read`` call changes only the body of
``_decode_one``.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

META_SCHEMA = (
    "doc_id long, n_bytes long, width long, height long, content_hash string"
)

STRICT = False  # True -> decode raises NotImplementedError (no codecs here)


def _decode_one(data: bytes) -> dict:
    """Stand-in for a real image decode. Deterministic fake: derives
    fake dimensions from the payload length, hashes the content. A real
    implementation would do `PIL.Image.open(io.BytesIO(data))`."""
    if STRICT:
        raise NotImplementedError("no image codecs in this container")
    n = len(data)
    return {
        "n_bytes": n,
        "width": n % 1024,
        "height": (n * 7) % 768,
        "content_hash": hashlib.md5(data).hexdigest(),
    }


def decode_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """mapInPandas body: per Arrow batch, decode every binary payload.
    Vectorized per batch, never per-row round trips to the JVM."""
    for pdf in batches:
        metas = pdf["data"].map(_decode_one)
        out = pd.DataFrame(
            {
                "doc_id": pdf["doc_id"],
                "n_bytes": metas.map(lambda m: m["n_bytes"]),
                "width": metas.map(lambda m: m["width"]),
                "height": metas.map(lambda m: m["height"]),
                "content_hash": metas.map(lambda m: m["content_hash"]),
            }
        )
        yield out


def with_binary_payload(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Build the opaque-binary representation (here: utf-8 bytes of the
    document text — at production it would be the image/audio blob)."""
    return df.select(
        "doc_id", F.encode(F.col(text_col), "UTF-8").alias("data")
    )


def decode_metadata(df: DataFrame) -> DataFrame:
    """The multimodal decode operator: binary in, typed metadata out,
    executed as Arrow-batched Python per partition."""
    return df.mapInPandas(decode_batches, schema=META_SCHEMA)


def frame_sample(df: DataFrame, every_bytes: int = 64) -> DataFrame:
    """'Frame sampling' plumbing demo over binary payloads: emit one row
    per sampled offset (video-frame-sampling shape: one input row ->
    many output rows, all JVM-side via sequence+explode)."""
    return (
        df.withColumn("n_bytes", F.octet_length("data"))
        .withColumn(
            "frame_offset",
            F.explode(
                F.expr(f"sequence(0, greatest(n_bytes - 1, 0), {every_bytes})")
            ),
        )
        .select(
            "doc_id",
            "frame_offset",
            F.md5(
                F.expr(f"substring(data, frame_offset + 1, {every_bytes})")
            ).alias("chunk_hash"),
        )
    )


RESIZED_SCHEMA = "doc_id long, data binary, width long, height long"
FEATURE_SCHEMA = "doc_id long, features array<double>"


def resize_stub(df: DataFrame, width: int = 64, height: int = 48) -> DataFrame:
    """'Resize' plumbing: binary in, (smaller) binary + new dims out,
    via Arrow-batched mapInPandas. The transform itself is a
    deterministic fake (byte striding to the target "pixel count") —
    a real implementation swaps in PIL's ``Image.resize`` without
    touching the Spark-side schema, batching, or partitioning."""
    target = width * height // 64  # fake: bytes-per-"pixel block"

    def body(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            def shrink(data: bytes) -> bytes:
                if STRICT:
                    raise NotImplementedError("no image codecs here")
                stride = max(len(data) // max(target, 1), 1)
                return data[::stride][:target]

            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "data": pdf["data"].map(shrink),
                    "width": width,
                    "height": height,
                }
            )

    return df.mapInPandas(body, schema=RESIZED_SCHEMA)


def extract_features_stub(df: DataFrame, dim: int = 8) -> DataFrame:
    """'Feature extraction' plumbing: binary in, float vector out
    (the embed-the-image stage). Deterministic fake: dim doubles
    derived from the content digest; a real model call (CLIP et al.)
    replaces only the function body — batch shape, Arrow transfer and
    the array<double> output schema are what's being pinned."""

    def body(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            def feats(data: bytes) -> list[float]:
                if STRICT:
                    raise NotImplementedError("no model runtime here")
                d = hashlib.md5(data).digest()
                return [
                    int.from_bytes(d[2 * i : 2 * i + 2], "big") / 65535.0
                    for i in range(dim)
                ]

            yield pd.DataFrame(
                {"doc_id": pdf["doc_id"], "features": pdf["data"].map(feats)}
            )

    return df.mapInPandas(body, schema=FEATURE_SCHEMA)
