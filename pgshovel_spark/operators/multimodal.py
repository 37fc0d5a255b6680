"""Multimodal (image/audio/video) column operators.

Contract: media travels as an opaque ``binary`` payload column plus
typed metadata (SURVEY.md §2.G / north-star multimodal surface).  All
heavy per-item work runs in Arrow-batched ``mapInPandas`` stages so
the plan parallelizes per partition and never collects to the driver.

Codec policy: full decode libraries (JPEG, MP3, H.264 ...) are not in
this container, so ``decode_image`` / ``decode_audio`` implement the
REAL header parsers for the stdlib-parseable formats (BMP and PNG
dimensions, RIFF/WAV channel/rate/frame counts) and raise ValueError
on anything else; ``fake_decode_dims`` remains the deterministic
stand-in the hash-checked queries use (its outputs are reproducible in
the DuckDB oracle, which a real codec's wouldn't be).  The Spark-side
schema, batching, partitioning, and UDF signatures are identical on
both paths.
"""

from __future__ import annotations

import struct
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    LongType,
    StructField,
    StructType,
)

#: Schema of a decoded-media feature row.
MEDIA_FEATURES_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("n_bytes", LongType()),
        StructField("first_byte", LongType()),
        StructField("width", LongType()),
        StructField("height", LongType()),
    ]
)

#: Schema of a sampled-frame row (one row per sampled frame).
FRAME_SAMPLE_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("frame_idx", LongType()),
        StructField("frame_offset_bytes", LongType()),
    ]
)


def decode_image(payload: bytes) -> tuple[int, int]:
    """Real image dimension decode for the stdlib-parseable formats.

    - BMP ('BM' magic): BITMAPINFOHEADER width/height at byte 18
      (int32 LE; height negative for top-down rows -> abs()).
    - PNG (8-byte signature): IHDR width/height at byte 16 (uint32 BE).

    Raises ValueError on anything else — compressed formats (JPEG,
    WebP ...) need codec libraries this container doesn't ship.
    """
    if len(payload) >= 26 and payload[:2] == b"BM":
        w, h = struct.unpack_from("<ii", payload, 18)
        return int(w), abs(int(h))
    if len(payload) >= 24 and payload[:8] == b"\x89PNG\r\n\x1a\n":
        w, h = struct.unpack_from(">II", payload, 16)
        return int(w), int(h)
    raise ValueError("unsupported image format (BMP and PNG headers only)")


def decode_audio(payload: bytes) -> tuple[int, int, int]:
    """Real audio header decode for RIFF/WAV payloads via the stdlib
    ``wave`` module: returns (n_channels, sample_rate, n_frames).
    Raises ValueError for non-WAV payloads."""
    import io
    import wave

    try:
        with wave.open(io.BytesIO(payload), "rb") as w:
            return w.getnchannels(), w.getframerate(), w.getnframes()
    except (wave.Error, EOFError) as e:
        raise ValueError(f"unsupported audio format: {e}") from e


def fake_decode_dims(payload: bytes) -> tuple[int, int]:
    """Deterministic stand-in for decode: dimensions derived from the
    payload bytes (stable across engines and runs)."""
    n = len(payload)
    first = payload[0] if n else 0
    return (first % 64 + 1) * 16, (n % 64 + 1) * 16


def extract_media_features(
    df: DataFrame, id_col: str, payload_col: str, decoder=fake_decode_dims
) -> DataFrame:
    """Arrow-batched feature extraction over an opaque binary column.

    ``decoder`` maps payload bytes -> (width, height): pass
    ``decode_image`` for real BMP/PNG payloads (the default stays the
    deterministic fake, which the hash-checked queries reproduce in
    their DuckDB oracles).

    ``mapInPandas`` keeps the payload off the driver and lets each
    executor process whole Arrow batches; at 100 TB the input should
    be partitioned so one partition's payloads fit executor memory
    (spark.sql.files.maxPartitionBytes governs the scan side).
    """
    src = df.select(
        F.col(id_col).cast("long").alias("doc_id"),
        F.col(payload_col).cast("binary").alias("payload"),
    )

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            payloads = pdf["payload"]
            dims = [decoder(p if p is not None else b"") for p in payloads]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "n_bytes": [len(p) if p is not None else 0 for p in payloads],
                    "first_byte": [
                        (p[0] if len(p) else 0) if p is not None else 0 for p in payloads
                    ],
                    "width": [w for w, _ in dims],
                    "height": [h for _, h in dims],
                }
            )

    return src.mapInPandas(batches, MEDIA_FEATURES_SCHEMA)


def sample_frames(
    df: DataFrame, id_col: str, payload_col: str, frame_bytes: int = 100, step: int = 3
) -> DataFrame:
    """'Video frame sampling' over opaque bytes: every ``step``-th
    frame of ``frame_bytes``-sized frames, one output row per sampled
    frame (a one-to-many mapInPandas expansion — the same shape a real
    ffmpeg-based sampler would have)."""
    src = df.select(
        F.col(id_col).cast("long").alias("doc_id"),
        F.col(payload_col).cast("binary").alias("payload"),
    )

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out_id, out_idx, out_off = [], [], []
            for doc_id, p in zip(pdf["doc_id"], pdf["payload"]):
                n_frames = (len(p) if p is not None else 0) // frame_bytes
                for idx in range(0, n_frames, step):
                    out_id.append(doc_id)
                    out_idx.append(idx)
                    out_off.append(idx * frame_bytes)
            yield pd.DataFrame(
                {"doc_id": out_id, "frame_idx": out_idx, "frame_offset_bytes": out_off}
            )

    return src.mapInPandas(batches, FRAME_SAMPLE_SCHEMA)
