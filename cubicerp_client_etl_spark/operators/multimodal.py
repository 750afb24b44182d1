"""Multimodal (binary) column handling (SURVEY §2.L-mm1).

Images/audio/video are opaque ``BinaryType`` payloads plus a typed
metadata struct. The Spark-side plumbing — schema, partition sizing,
Arrow batch shape through ``mapInPandas`` — is real and tested; the
actual media decode is STUBBED (the container has no image/audio libs):
``decode_media`` raises ``NotImplementedError`` unless the deterministic
fake decoder is requested, which derives features purely from the bytes
so tests are reproducible.

At 100 TB: binary payloads dominate partition size, so callers should
read with ``spark.sql.files.maxPartitionBytes`` tuned down (payload-heavy
rows) and keep metadata in separate columns so Catalyst can prune the
binary column away for metadata-only queries — the schema here is
deliberately payload-last for that reason.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MEDIA_META_SCHEMA = (
    "media_type string, byte_len bigint, format string, width int, height int"
)


def attach_binary_payload(
    df: DataFrame, text_col: str = "text", media_type: str = "text/plain"
) -> DataFrame:
    """Fixture adapter: treat a text column as an opaque binary payload
    with typed metadata — the same shape a real image/audio table has."""
    payload = F.encode(F.col(text_col), "UTF-8")
    meta = F.struct(
        F.lit(media_type).alias("media_type"),
        F.octet_length(payload).alias("byte_len"),
        F.lit("raw").alias("format"),
        F.lit(None).cast("int").alias("width"),
        F.lit(None).cast("int").alias("height"),
    )
    return df.withColumn("meta", meta).withColumn("payload", payload)


def _pil_image():
    """Optional-dependency gate: PIL when importable, else None."""
    try:
        from PIL import Image  # noqa: PLC0415 — optional extra

        return Image
    except ImportError:
        return None


def decode_media(payload: bytes):
    """Decode an image payload to a PIL Image (the real path, behind the
    optional ``pillow`` extra). Raises NotImplementedError with install
    guidance when PIL is absent — callers fall back to ``fake=True`` for
    the deterministic byte-derived stub."""
    image_mod = _pil_image()
    if image_mod is None:
        raise NotImplementedError(
            "media decode needs the optional 'pillow' extra (pip install "
            "pillow); use extract_features(..., fake=True) for the "
            "deterministic stub"
        )
    import io

    return image_mod.open(io.BytesIO(payload))


def extract_features(df: DataFrame, n_features: int = 8, fake: bool = True) -> DataFrame:
    """Per-payload feature extraction via Arrow-batched ``mapInPandas``.

    The fake decoder derives an ``n_features``-dim vector purely from the
    payload bytes (byte histogram moments) — deterministic, so the
    pipeline shape (binary in → fixed-width float vector out) is testable
    without media libs. With ``fake=False`` (requires the optional
    ``pillow`` extra) the payload is decoded as an image and the vector
    is its n-bucket luminance histogram. Output keeps the row id and
    metadata, drops the payload (feature tables shouldn't carry blobs
    forward).
    """
    if not fake and _pil_image() is None:
        decode_media(b"")  # raises with install guidance

    out_schema = (
        "doc_id bigint, media_type string, byte_len bigint, "
        "features array<double>"
    )

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            feats = []
            for payload in pdf["payload"]:
                b = bytes(payload)
                hist = [0] * n_features
                if fake:
                    # deterministic stand-in for a real decoder: bucketed
                    # byte-histogram mass, normalized by length
                    for byte in b:
                        hist[byte % n_features] += 1
                    total = max(len(b), 1)
                else:
                    pixels = list(decode_media(b).convert("L").getdata())
                    for px in pixels:
                        hist[(px * n_features) // 256] += 1
                    total = max(len(pixels), 1)
                # plain IEEE-754 division, no rounding: the ratio is then
                # bit-identical in any engine that divides the same ints
                # (DuckDB oracle replays it exactly for the fake path)
                feats.append([h / total for h in hist])
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "media_type": [m["media_type"] for m in pdf["meta"]],
                    "byte_len": [m["byte_len"] for m in pdf["meta"]],
                    "features": feats,
                }
            )

    return df.mapInPandas(batches, schema=out_schema)


def resize_media(
    df: DataFrame, width: int, height: int, fake: bool = True
) -> DataFrame:
    """Resize operator (image path): payload in → payload out with updated
    width/height metadata, via Arrow-batched ``mapInPandas``.

    With ``fake=True`` (default when PIL is absent) the resample is a
    deterministic nearest-neighbor index sampling over the byte array —
    output payload is exactly width×height bytes, so round-trips and
    partition shapes behave like the real thing. With ``fake=False``
    (optional ``pillow`` extra) the payload is decoded, resampled with
    PIL, and re-encoded as PNG. 1 row in → 1 row out; payload size
    becomes uniform, which is exactly what downstream partition sizing
    wants after a resize.
    """
    if not fake and _pil_image() is None:
        decode_media(b"")  # raises with install guidance

    out_schema = (
        "doc_id bigint, media_type string, width int, height int, payload binary"
    )
    target = width * height

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import io

        for pdf in it:
            payloads = []
            for payload in pdf["payload"]:
                b = bytes(payload) or b"\x00"
                if not fake:
                    img = decode_media(b).resize((width, height))
                    buf = io.BytesIO()
                    img.save(buf, format="PNG")
                    payloads.append(buf.getvalue())
                    continue
                # nearest-neighbor over the flat byte array: the stub for
                # a real resample, deterministic in (payload, target)
                step = len(b) / target
                payloads.append(bytes(b[min(int(i * step), len(b) - 1)] for i in range(target)))
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "media_type": [m["media_type"] for m in pdf["meta"]],
                    "width": [width] * len(pdf),
                    "height": [height] * len(pdf),
                    "payload": payloads,
                }
            )

    return df.mapInPandas(batches, schema=out_schema)


def sample_frames(
    df: DataFrame, frame_bytes: int = 64, every_n: int = 4, fake: bool = True
) -> DataFrame:
    """Frame sampling (video path): one row in → one row per sampled
    frame out (UDTF shape through ``mapInPandas``).

    The container decode (mp4 → frames) is STUBBED; the fake treats the
    payload as a flat sequence of ``frame_bytes``-sized frames and emits
    every ``every_n``-th — the row-explosion, schema, and batch shapes are
    the real thing. At 100 TB this is the operator that *grows* data
    (rows × frames), so it must run map-side with no shuffle — mapInPandas
    guarantees that — and repartitioning, if needed, happens downstream.
    """
    if not fake:
        raise NotImplementedError(
            "video frame decode needs the optional 'av' extra (PyAV); "
            "use fake=True for the deterministic byte-frame stub"
        )

    out_schema = "doc_id bigint, frame_idx int, frame bytes".replace("bytes", "binary")

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            ids, idxs, frames = [], [], []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                b = bytes(payload)
                n_frames = max(len(b) // frame_bytes, 1)
                for fi in range(0, n_frames, every_n):
                    ids.append(doc_id)
                    idxs.append(fi)
                    frames.append(b[fi * frame_bytes : (fi + 1) * frame_bytes])
            yield pd.DataFrame({"doc_id": ids, "frame_idx": idxs, "frame": frames})

    return df.mapInPandas(batches, schema=out_schema)
