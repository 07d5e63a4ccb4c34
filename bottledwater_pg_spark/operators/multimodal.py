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

STRICT = False  # True -> non-PPM decode raises NotImplementedError

# ------------------------------------------------------------------
# REAL codec for binary PPM (P6) — the one raster format decodable
# with nothing but the standard library + numpy, so the decode stage
# is genuinely implemented here, not stubbed: header parse, pixel
# buffer reshape, channel math. PNG/JPEG/audio still need external
# codecs and keep the explicit gate below.

PPM_MAGIC = b"P6"


def encode_ppm(width: int, height: int, pixels) -> bytes:
    """numpy (height, width, 3) uint8 -> binary PPM bytes."""
    import numpy as np

    arr = np.asarray(pixels, dtype=np.uint8).reshape(height, width, 3)
    return b"P6\n%d %d\n255\n" % (width, height) + arr.tobytes()


def decode_ppm(data: bytes):
    """Binary PPM bytes -> (width, height, numpy (h, w, 3) uint8).
    Raises ValueError on anything that is not a well-formed P6."""
    import numpy as np

    if not data.startswith(PPM_MAGIC):
        raise ValueError("not a P6 ppm")
    # header: magic, width, height, maxval. Parse by scanning — the
    # spec says EXACTLY ONE whitespace byte separates maxval from the
    # pixel buffer, and pixel bytes may themselves look like
    # whitespace, so str.split() would silently eat leading pixels.
    ws = b" \t\r\n"
    idx, fields = len(PPM_MAGIC), []
    try:
        while len(fields) < 3:
            while data[idx] in ws:
                idx += 1
            start = idx
            while data[idx] not in ws:
                idx += 1
            fields.append(int(data[start:idx]))
    except IndexError:
        raise ValueError("truncated ppm header") from None
    w, h, maxval = fields
    if maxval != 255:
        raise ValueError(f"unsupported maxval {maxval}")
    idx += 1  # the single post-maxval separator byte
    rest = data[idx:]
    need = w * h * 3
    if len(rest) < need:
        raise ValueError("truncated ppm pixel buffer")
    return w, h, np.frombuffer(rest[:need], dtype=np.uint8).reshape(h, w, 3)


def _decode_one(data: bytes, strict: bool | None = None) -> dict:
    """Image decode. PPM (P6) payloads decode for REAL (header parse +
    numpy pixel buffer); other formats would need codecs this
    container lacks — deterministic fake (or NotImplementedError in
    strict mode), swapped for `PIL.Image.open` in production.

    ``strict`` must be passed BY VALUE into executor closures: the
    module-level STRICT flag is re-imported fresh (False) on Python
    workers, so a driver-side assignment alone never reaches them."""
    if data.startswith(PPM_MAGIC):
        w, h, _ = decode_ppm(data)
        return {
            "n_bytes": len(data),
            "width": w,
            "height": h,
            "content_hash": hashlib.md5(data).hexdigest(),
        }
    if STRICT if strict is None else strict:
        raise NotImplementedError("no image codecs in this container")
    n = len(data)
    return {
        "n_bytes": n,
        "width": n % 1024,
        "height": (n * 7) % 768,
        "content_hash": hashlib.md5(data).hexdigest(),
    }


def decode_batches(batches: Iterator[pd.DataFrame],
                   strict: bool | None = None) -> Iterator[pd.DataFrame]:
    """mapInPandas body: per Arrow batch, decode every binary payload.
    Vectorized per batch, never per-row round trips to the JVM."""
    for pdf in batches:
        metas = pdf["data"].map(lambda d: _decode_one(d, strict))
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
    executed as Arrow-batched Python per partition. STRICT is captured
    BY VALUE here (driver side) so it actually reaches the executors —
    workers re-import the module fresh with the default False."""
    strict = bool(STRICT)

    def body(batches):
        return decode_batches(batches, strict)

    return df.mapInPandas(body, schema=META_SCHEMA)


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


PPM_STATS_SCHEMA = (
    "doc_id long, width long, height long, "
    "sum_r long, sum_g long, sum_b long"
)


def synth_ppm_payloads(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Deterministic PPM fixture: per doc, a real P6 image whose
    dimensions and pixel bytes are pure functions of the id —
    width = 8 + id%9, height = 8 + id%7, byte i = (id%251 + i) % 256 —
    so an arithmetic SQL oracle can predict the decode output exactly."""
    import numpy as np

    def body(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            def make(doc_id: int) -> bytes:
                w, h = 8 + doc_id % 9, 8 + doc_id % 7
                base = doc_id % 251
                px = (np.arange(w * h * 3, dtype=np.int64) + base) % 256
                return encode_ppm(w, h, px.astype(np.uint8))

            yield pd.DataFrame(
                {"doc_id": pdf[id_col], "data": pdf[id_col].map(make)}
            )

    return df.select(id_col).mapInPandas(body, schema="doc_id long, data binary")


def ppm_channel_stats(df: DataFrame) -> DataFrame:
    """REAL image decode + channel math over binary PPM payloads:
    parse the header, reshape the pixel buffer, integer-sum each RGB
    channel (exact int64 — no float accumulation, so the SQL oracle
    hashes bit-identically). Arrow-batched mapInPandas; one output row
    per image; embarrassingly parallel."""
    import numpy as np

    def body(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, data in zip(pdf["doc_id"], pdf["data"]):
                w, h, px = decode_ppm(bytes(data))
                sums = px.astype(np.int64).sum(axis=(0, 1))
                rows.append(
                    (int(doc_id), w, h, int(sums[0]), int(sums[1]), int(sums[2]))
                )
            yield pd.DataFrame(
                rows,
                columns=["doc_id", "width", "height", "sum_r", "sum_g", "sum_b"],
            )

    return df.mapInPandas(body, schema=PPM_STATS_SCHEMA)


def resize_ppm(df: DataFrame, width: int = 8, height: int = 8) -> DataFrame:
    """REAL nearest-neighbor resize for PPM payloads (pure numpy index
    striding — the actual resampling algorithm, not a byte fake),
    re-encoded as P6. A non-PPM payload in the column falls back to a
    deterministic truncated-bytes stand-in (the stub discipline)
    rather than failing the whole job over one foreign blob."""
    import numpy as np

    def body(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            def shrink(data: bytes) -> bytes:
                data = bytes(data)
                if not data.startswith(PPM_MAGIC):
                    # deterministic non-image fallback, proportional to
                    # the requested size like resize_stub
                    return data[: max(1, width * height)]
                w, h, px = decode_ppm(data)
                xs = (np.arange(width) * w // width).clip(0, w - 1)
                ys = (np.arange(height) * h // height).clip(0, h - 1)
                return encode_ppm(width, height, px[np.ix_(ys, xs)])

            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "data": pdf["data"].map(shrink),
                    "width": width,
                    "height": height,
                }
            )

    return df.mapInPandas(body, schema=RESIZED_SCHEMA)


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


# ------------------------------------------------------------------
# REAL codec #2: RIFF/WAVE PCM16 — like PPM, WAV needs nothing but
# struct + numpy, so the AUDIO modality's decode stage is genuinely
# implemented: RIFF chunk walk, fmt parse, int16 sample buffer.

WAV_STATS_SCHEMA = (
    "doc_id long, sample_rate long, n_samples long, "
    "sum_amp long, sum_abs long, peak long"
)


def encode_wav(sample_rate: int, samples) -> bytes:
    """Minimal canonical RIFF/WAVE container: PCM (format 1), mono,
    16-bit little-endian — fmt chunk then data chunk."""
    import struct

    data = samples.astype("<i2").tobytes()
    fmt = struct.pack(
        "<4sIHHIIHH", b"fmt ", 16, 1, 1, sample_rate, sample_rate * 2, 2, 16
    )
    body = b"WAVE" + fmt + struct.pack("<4sI", b"data", len(data)) + data
    return struct.pack("<4sI", b"RIFF", len(body)) + body


def decode_wav(data: bytes):
    """Parse a RIFF/WAVE PCM16 payload: walk the chunk list (tolerates
    extra chunks before data), validate the fmt contract, return
    (sample_rate, int16 numpy array). A real container parse — not a
    fixed-offset fake."""
    import struct

    import numpy as np

    riff, _size, wave = struct.unpack("<4sI4s", data[:12])
    if riff != b"RIFF" or wave != b"WAVE":
        raise ValueError("not a RIFF/WAVE payload")
    pos, rate, samples = 12, None, None
    while pos + 8 <= len(data):
        cid, clen = struct.unpack("<4sI", data[pos:pos + 8])
        if pos + 8 + clen > len(data):
            # a declared length past the buffer is a truncated payload
            # — fail loudly like the PPM decoder, never return partial
            # sample counts silently
            raise ValueError(
                f"truncated {cid!r} chunk: declares {clen} bytes, "
                f"{len(data) - pos - 8} remain"
            )
        body = data[pos + 8:pos + 8 + clen]
        if cid == b"fmt ":
            if clen < 16:
                raise ValueError("fmt chunk shorter than PCM header")
            fmt_code, channels, rate, _br, _ba, bits = struct.unpack(
                "<HHIIHH", body[:16]
            )
            if (fmt_code, channels, bits) != (1, 1, 16):
                raise ValueError("only PCM16 mono supported")
        elif cid == b"data":
            samples = np.frombuffer(body, dtype="<i2")
        pos += 8 + clen + (clen & 1)  # RIFF chunks are word-aligned
    if rate is None or samples is None:
        raise ValueError("missing fmt/data chunk")
    return rate, samples


def synth_wav_payloads(df: DataFrame, id_col: str = "doc_id",
                       sample_rate: int = 8000) -> DataFrame:
    """Deterministic WAV fixture: per doc a real PCM16 file with
    n = 64 + id%57 samples, sample i = (id%1000)*7 + i*13) % 4096
    - 2048 — pure integer functions of the id, so an arithmetic SQL
    oracle predicts the decoded waveform exactly."""
    import numpy as np

    def body(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            def make(doc_id: int) -> bytes:
                n = 64 + doc_id % 57
                i = np.arange(n, dtype=np.int64)
                vals = ((doc_id % 1000) * 7 + i * 13) % 4096 - 2048
                return encode_wav(sample_rate, vals)

            yield pd.DataFrame(
                {"doc_id": pdf[id_col], "data": pdf[id_col].map(make)}
            )

    return df.select(id_col).mapInPandas(body, schema="doc_id long, data binary")


def wav_stats(df: DataFrame) -> DataFrame:
    """REAL audio decode + waveform math over binary WAV payloads:
    container parse, int16 buffer, exact int64 amplitude sums /
    absolute sums / peak (no float accumulation — hash-parity-safe).
    Arrow-batched mapInPandas, one row per clip."""
    import numpy as np

    def body(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, data in zip(pdf["doc_id"], pdf["data"]):
                rate, s = decode_wav(bytes(data))
                s64 = s.astype(np.int64)
                rows.append(
                    (
                        int(doc_id),
                        int(rate),
                        len(s),
                        int(s64.sum()),
                        int(np.abs(s64).sum()),
                        int(np.abs(s64).max()) if len(s) else 0,
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "doc_id", "sample_rate", "n_samples",
                    "sum_amp", "sum_abs", "peak",
                ],
            )

    return df.mapInPandas(body, schema=WAV_STATS_SCHEMA)
