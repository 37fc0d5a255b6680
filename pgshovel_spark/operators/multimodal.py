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

import numpy as np
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


def _luma(r: int, g: int, b: int) -> int:
    """Integer BT.601-ish luma (/256 keeps it exact) — the ONE
    grayscale definition every codec in this module shares, so the
    documented codec-invariance guarantees (same pixels hash
    identically through BMP/PNG/AVI) cannot silently diverge."""
    return (77 * r + 150 * g + 29 * b) >> 8


def _pack_dib_rows(rows) -> bytes:
    """Row-major grayscale grid (list-of-lists or 2-D uint8 ndarray)
    -> bottom-up padded BGR DIB bytes (r=g=b), the storage layout BMP
    bodies and AVI '00db' frames share.  Vectorized: one repeat + pad
    per grid instead of a per-pixel Python loop (same bytes)."""
    arr = np.asarray(rows, dtype=np.uint8)
    h, w = arr.shape
    stride = (w * 3 + 3) & ~3
    out = np.zeros((h, stride), dtype=np.uint8)
    # positive height => bottom-up storage; r=g=b pixel triples
    out[:, : w * 3] = np.repeat(arr[::-1], 3, axis=1)
    return out.tobytes()


def decode_image(payload: bytes) -> tuple[int, int]:
    """Real image dimension decode for the stdlib-parseable formats.

    - BMP ('BM' magic): BITMAPINFOHEADER width/height at byte 18
      (int32 LE; height negative for top-down rows -> abs()).
    - PNG (8-byte signature): IHDR width/height at byte 16 (uint32 BE).

    Raises ValueError on anything else — compressed formats (JPEG,
    WebP ...) need codec libraries this container doesn't ship.
    """
    if len(payload) >= 26 and payload[:2] == b"BM":
        (hdr_size,) = struct.unpack_from("<I", payload, 14)
        if hdr_size < 40:
            # BITMAPCOREHEADER stores int16 dims at different offsets;
            # blind '<ii' would return garbage like w | (h << 16)
            raise ValueError(
                f"unsupported BMP DIB header size {hdr_size}"
                " (BITMAPINFOHEADER required)"
            )
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


def _decode_wav_np(payload: bytes) -> tuple[int, int, np.ndarray]:
    """``decode_wav_pcm`` returning the first-channel samples as an
    int16 ndarray — the vectorized core the Arrow stage uses (WAV PCM
    is little-endian; ``<i2`` reads it identically on any host)."""
    import io
    import wave

    try:
        with wave.open(io.BytesIO(payload), "rb") as w:
            if w.getsampwidth() != 2:
                raise ValueError(
                    f"unsupported sample width: {w.getsampwidth() * 8}-bit"
                )
            nch = w.getnchannels()
            rate = w.getframerate()
            raw = w.readframes(w.getnframes())
    except (wave.Error, EOFError) as e:
        raise ValueError(f"unsupported audio format: {e}") from e
    samples = np.frombuffer(raw, dtype="<i2", count=len(raw) // 2)
    return rate, nch, samples[::nch]


def decode_wav_pcm(payload: bytes) -> tuple[int, int, list[int]]:
    """REAL sample decode for 16-bit PCM RIFF/WAV: returns
    (sample_rate, n_channels, first-channel samples as ints).  The
    codec seam's audio analog of ``decode_png_gray`` — raises
    ValueError on non-WAV or non-16-bit payloads (the module codec
    policy)."""
    rate, nch, samples = _decode_wav_np(payload)
    return rate, nch, samples.tolist()


#: schema of extract_audio_features (all-integer: deterministic)
AUDIO_FEATURES_SCHEMA = (
    "doc_id long, sample_rate long, n_channels long, n_samples long,"
    " duration_ms long, peak long, rms long, zero_crossings long"
)


def extract_audio_features(df: DataFrame, id_col: str, payload_col: str) -> DataFrame:
    """Arrow-batched audio feature extraction over WAV payloads:
    per-row sample rate, channel count, duration, peak amplitude,
    integer RMS (isqrt of the exact mean square) and zero-crossing
    count — ALL integer arithmetic on the decoded PCM, so the output
    is deterministic across engines/platforms (no float DSP in the
    contract).  Same mapInPandas scale posture as
    ``extract_media_features``."""
    import math

    src = df.select(
        F.col(id_col).cast("long").alias("doc_id"),
        F.col(payload_col).cast("binary").alias("payload"),
    )

    def one(p: bytes) -> tuple:
        rate, nch, s = _decode_wav_np(p)
        n = len(s)
        # vectorized integer DSP — identical arithmetic to the scalar
        # loops (int64 accumulators are exact: n·32767² < 2⁶³ for any
        # clip under ~8.6e9 samples)
        s64 = s.astype(np.int64)
        peak = int(np.abs(s64).max()) if n else 0
        sumsq = int((s64 * s64).sum())
        rms = math.isqrt(sumsq // n) if n else 0
        nonneg = s >= 0
        zc = int((nonneg[1:] != nonneg[:-1]).sum()) if n else 0
        return (
            rate,
            nch,
            n,
            (n * 1000) // rate if rate else 0,
            peak,
            rms,
            zc,
        )

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            feats = [one(p if p is not None else b"") for p in pdf["payload"]]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "sample_rate": [f[0] for f in feats],
                    "n_channels": [f[1] for f in feats],
                    "n_samples": [f[2] for f in feats],
                    "duration_ms": [f[3] for f in feats],
                    "peak": [f[4] for f in feats],
                    "rms": [f[5] for f in feats],
                    "zero_crossings": [f[6] for f in feats],
                }
            )

    return src.mapInPandas(batches, AUDIO_FEATURES_SCHEMA)


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
            n_frames = np.array(
                [(len(p) if p is not None else 0) // frame_bytes for p in pdf["payload"]],
                dtype=np.int64,
            )
            # vectorized one-to-many expansion: k sampled frames per
            # doc, frame_idx = (position within doc) * step
            k = (n_frames + step - 1) // step
            ids = np.repeat(pdf["doc_id"].to_numpy(), k)
            starts = np.cumsum(k) - k
            within = np.arange(int(k.sum()), dtype=np.int64) - np.repeat(starts, k)
            idx = within * step
            yield pd.DataFrame(
                {
                    "doc_id": ids,
                    "frame_idx": idx,
                    "frame_offset_bytes": idx * frame_bytes,
                }
            )

    return src.mapInPandas(batches, FRAME_SAMPLE_SCHEMA)


def encode_avi(frames, fps: int = 10) -> bytes:
    """REAL AVI container encode of grayscale frame grids, stdlib-only:
    a RIFF('AVI ') file with the standard hdrl LIST (avih main header
    + one 'vids'/DIB stream: strh + BITMAPINFOHEADER strf) and a movi
    LIST of uncompressed '00db' DIB frames (bottom-up BGR rows with
    4-byte stride padding, r=g=b — the exact layout decode_bmp_gray
    reverses).  The video analog of the WAV/PNG codec seams."""
    if len(frames) == 0 or len(frames[0]) == 0 or len(frames[0][0]) == 0:
        raise ValueError("empty video")
    h = len(frames[0])
    w = len(frames[0][0])
    stride = (w * 3 + 3) & ~3
    frame_bytes = stride * h

    def chunk(tag: bytes, data: bytes) -> bytes:
        pad = b"\x00" if len(data) % 2 else b""
        return tag + struct.pack("<I", len(data)) + data + pad

    # All frames pack in ONE vectorized pass (r14, guide §4.2): the
    # per-frame DIB layout is row-independent container math, so the
    # repeat+pad runs over the whole (n, h, w) stack at once — same
    # bytes per frame as the former per-frame _pack_dib_rows call.
    try:
        arr = np.asarray(frames, dtype=np.uint8)
    except (ValueError, TypeError) as e:
        raise ValueError("inconsistent frame dimensions") from e
    if arr.ndim != 3 or arr.shape[1] != h or arr.shape[2] != w:
        raise ValueError("inconsistent frame dimensions")
    packed = np.zeros((arr.shape[0], h, stride), dtype=np.uint8)
    packed[:, :, : w * 3] = np.repeat(arr[:, ::-1, :], 3, axis=2)

    def dib(idx: int) -> bytes:
        return packed[idx].tobytes()

    avih = struct.pack(
        "<14I",
        1_000_000 // fps,  # dwMicroSecPerFrame
        frame_bytes * fps,  # dwMaxBytesPerSec
        0, 0,
        len(frames),        # dwTotalFrames
        0, 1,               # dwInitialFrames, dwStreams
        frame_bytes,        # dwSuggestedBufferSize
        w, h,
        0, 0, 0, 0,
    )
    strh = (
        b"vids" + b"DIB " + struct.pack("<10I", 0, 0, 0, 1, fps, 0,
                                        len(frames), frame_bytes, 0, 0)
        + struct.pack("<4H", 0, 0, w, h)
    )
    strf = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, frame_bytes,
                       2835, 2835, 0, 0)
    strl = b"strl" + chunk(b"strh", strh) + chunk(b"strf", strf)
    hdrl = b"hdrl" + chunk(b"avih", avih) + chunk(b"LIST", strl)
    movi = b"movi" + b"".join(
        chunk(b"00db", dib(j)) for j in range(len(frames))
    )
    body = b"AVI " + chunk(b"LIST", hdrl) + chunk(b"LIST", movi)
    return b"RIFF" + struct.pack("<I", len(body)) + body


def _decode_avi_gray_np(payload: bytes) -> tuple[int, int, list[np.ndarray]]:
    """``decode_avi_gray`` returning (h, w) int64 ndarrays per frame —
    the vectorized core the Arrow stage uses (same RIFF walk, same
    integers)."""
    if len(payload) < 12 or payload[:4] != b"RIFF" or payload[8:12] != b"AVI ":
        raise ValueError("not an AVI payload")
    dims: list[int] | None = None
    frames_raw: list[bytes] = []

    def walk(buf: bytes, pos: int, end: int) -> None:
        nonlocal dims
        while pos + 8 <= end:
            tag = buf[pos : pos + 4]
            (ln,) = struct.unpack("<I", buf[pos + 4 : pos + 8])
            data_start = pos + 8
            data_end = data_start + ln
            if data_end > end:
                raise ValueError(
                    f"truncated AVI chunk {tag!r}: declares {ln} bytes"
                )
            if tag == b"LIST":
                walk(buf, data_start + 4, data_end)  # skip list type
            elif tag == b"avih":
                if ln < 40:
                    raise ValueError("truncated AVI main header")
                vals = struct.unpack("<10I", buf[data_start : data_start + 40])
                dims = [vals[4], vals[8], vals[9]]  # frames, w, h
            elif tag in (b"00db", b"00dc"):
                frames_raw.append(buf[data_start:data_end])
            pos = data_end + (ln % 2)  # chunks are word-aligned

    walk(payload, 12, len(payload))
    if dims is None:
        raise ValueError("AVI missing avih main header")
    n, w, h = dims
    if len(frames_raw) != n:
        raise ValueError(
            f"AVI header declares {n} frames, movi carries {len(frames_raw)}"
        )
    stride = (w * 3 + 3) & ~3
    frames: list[np.ndarray] = []
    for raw in frames_raw:
        if len(raw) < stride * h:
            raise ValueError("truncated AVI frame data")
        frames.append(_unpack_dib_rows_np(raw, 0, w, h))
    return w, h, frames


def decode_avi_gray(payload: bytes) -> tuple[int, int, list[list[list[int]]]]:
    """REAL AVI decode: RIFF walk, avih main header for declared
    dimensions/frame count, '00db'/'00dc' movi chunks unpacked from
    bottom-up padded BGR DIB rows into row-major grayscale grids (the
    BMP luma path).  Raises ValueError on non-AVI payloads or a
    frame-count/dimension mismatch between the header and the movi
    data (module codec policy)."""
    w, h, frames = _decode_avi_gray_np(payload)
    return w, h, [f.tolist() for f in frames]


#: schema of extract_video_features (all-integer: deterministic)
VIDEO_FEATURES_SCHEMA = (
    "doc_id long, n_frames long, width long, height long,"
    " sampled_frames long, sampled_checksum long"
)


def extract_video_features(
    df: DataFrame, id_col: str, payload_col: str, step: int = 2
) -> DataFrame:
    """Arrow-batched video feature extraction through the REAL AVI
    codec: per row, declared-and-verified frame count, dimensions,
    then FRAME SAMPLING (every ``step``-th frame — the real-codec
    version of sample_frames' byte-offset stand-in) with an integer
    checksum over the sampled frames' mean gray values
    (Σ (i+1)·mean_i).  Row-local mapInPandas, zero shuffles."""
    src = df.select(
        F.col(id_col).cast("long").alias("doc_id"),
        F.col(payload_col).cast("binary").alias("payload"),
    )

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out = {
                "doc_id": [], "n_frames": [], "width": [], "height": [],
                "sampled_frames": [], "sampled_checksum": [],
            }
            for doc_id, p in zip(pdf["doc_id"], pdf["payload"]):
                w, h, frames = _decode_avi_gray_np(p if p is not None else b"")
                sampled = frames[::step]
                npix = w * h
                checksum = 0
                for k, fr in enumerate(sampled):
                    mean = int(fr.sum()) // npix
                    checksum += (k * step + 1) * mean  # (frame_idx + 1)·mean
                out["doc_id"].append(doc_id)
                out["n_frames"].append(len(frames))
                out["width"].append(w)
                out["height"].append(h)
                out["sampled_frames"].append(len(sampled))
                out["sampled_checksum"].append(checksum)
            yield pd.DataFrame(out)

    return src.mapInPandas(batches, VIDEO_FEATURES_SCHEMA)


#: Schema of a perceptual-hash feature row.
IMAGE_HASH_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("width", LongType()),
        StructField("height", LongType()),
        StructField("ahash", LongType()),
    ]
)


def _luma_np(bgr: np.ndarray) -> np.ndarray:
    """Vectorized ``_luma`` over an (..., 3) uint8 BGR array — the
    identical integer BT.601-ish arithmetic, returned as int64."""
    b = bgr[..., 0].astype(np.int64)
    g = bgr[..., 1].astype(np.int64)
    r = bgr[..., 2].astype(np.int64)
    return (77 * r + 150 * g + 29 * b) >> 8


def _unpack_dib_rows_np(
    raw: bytes, off: int, w: int, h: int, top_down: bool = False
) -> np.ndarray:
    """Bottom-up (or top-down) padded BGR DIB bytes -> row-major
    grayscale (h, w) int64 grid — the vectorized inverse of
    ``_pack_dib_rows`` shared by the BMP and AVI decoders."""
    stride = (w * 3 + 3) & ~3
    arr = np.frombuffer(raw, dtype=np.uint8, count=stride * h, offset=off)
    bgr = arr.reshape(h, stride)[:, : w * 3].reshape(h, w, 3)
    if not top_down:
        bgr = bgr[::-1]
    return _luma_np(bgr)


def _decode_bmp_gray_np(payload: bytes) -> tuple[int, int, np.ndarray]:
    """``decode_bmp_gray`` returning an (h, w) int64 ndarray — the
    vectorized core the Arrow stages use (same bytes, same integers)."""
    if len(payload) < 54 or payload[:2] != b"BM":
        raise ValueError("not a BMP payload")
    (data_off,) = struct.unpack_from("<I", payload, 10)
    hdr_size, w, h = struct.unpack_from("<Iii", payload, 14)
    (bpp,) = struct.unpack_from("<H", payload, 28)
    (compression,) = struct.unpack_from("<I", payload, 30)
    if hdr_size < 40 or bpp != 24 or compression != 0:
        raise ValueError("only uncompressed 24-bit BMP supported")
    top_down = h < 0
    h = abs(h)
    stride = (w * 3 + 3) & ~3
    if len(payload) < data_off + stride * h:
        raise ValueError("truncated BMP pixel data")
    return w, h, _unpack_dib_rows_np(payload, data_off, w, h, top_down)


def decode_bmp_gray(payload: bytes) -> tuple[int, int, list[list[int]]]:
    """Decode an uncompressed 24-bit BITMAPINFOHEADER BMP into a
    row-major grayscale grid (top-down).  Stdlib+numpy; raises
    ValueError on anything else (see module codec policy)."""
    w, h, arr = _decode_bmp_gray_np(payload)
    return w, h, arr.tolist()


_PNG_MAGIC = b"\x89PNG\r\n\x1a\n"


def _decode_png_gray_np(payload: bytes) -> tuple[int, int, np.ndarray]:
    """``decode_png_gray`` returning an (h, w) int64 ndarray — the
    vectorized core the Arrow stages use.  Scanlines whose filter
    bytes are all 0 (None — what ``encode_png`` emits) unfilter as one
    reshape; any other filter mix falls back to the reference
    per-byte loop (Sub/Average/Paeth carry an intra-line sequential
    dependency), byte-for-byte identical either way."""
    import zlib

    if payload[:8] != _PNG_MAGIC:
        raise ValueError("not a PNG payload")
    pos = 8
    ihdr = None
    idat = bytearray()
    while pos + 8 <= len(payload):
        (ln,) = struct.unpack_from(">I", payload, pos)
        typ = payload[pos + 4 : pos + 8]
        data = payload[pos + 8 : pos + 8 + ln]
        if typ == b"IHDR":
            if len(data) != 13:
                raise ValueError("truncated PNG IHDR chunk")
            ihdr = struct.unpack(">IIBBBBB", data)
        elif typ == b"IDAT":
            idat += data
        elif typ == b"IEND":
            break
        pos += 12 + ln  # length + type + data + crc
    if ihdr is None:
        raise ValueError("PNG missing IHDR")
    w, h, depth, color, comp, filt, interlace = ihdr
    if depth != 8 or comp != 0 or filt != 0 or interlace != 0 or color not in (0, 2):
        raise ValueError("only 8-bit gray/truecolor non-interlaced PNG supported")
    nch = 1 if color == 0 else 3
    if not idat:
        raise ValueError("PNG missing IDAT data")
    try:
        raw = zlib.decompress(bytes(idat))
    except zlib.error as exc:
        raise ValueError(f"corrupt PNG IDAT stream: {exc}") from exc
    stride = w * nch
    if len(raw) < h * (stride + 1):
        raise ValueError("truncated PNG pixel data")
    scan = np.frombuffer(raw, dtype=np.uint8, count=h * (stride + 1)).reshape(
        h, stride + 1
    )
    fts = scan[:, 0]
    if (fts == 0).all():  # the encode_png path: no filtering at all
        lines = scan[:, 1:]
    else:
        lines = _png_unfilter_ref(raw, h, stride, nch)
    if nch == 1:
        return w, h, lines.astype(np.int64)
    return w, h, _luma_np(lines.reshape(h, w, 3)[..., ::-1])


def _png_unfilter_ref(raw: bytes, h: int, stride: int, nch: int) -> np.ndarray:
    """Reference per-byte PNG unfilter (None/Sub/Up/Average/Paeth) —
    the exact RFC 2083 recurrences, kept as the fallback for payloads
    whose scanlines actually use filters 1-4."""
    out = np.empty((h, stride), dtype=np.uint8)
    prev = bytearray(stride)
    off = 0
    for y in range(h):
        ft = raw[off]
        line = bytearray(raw[off + 1 : off + 1 + stride])
        off += 1 + stride
        if ft == 1:  # Sub
            for i in range(nch, stride):
                line[i] = (line[i] + line[i - nch]) & 255
        elif ft == 2:  # Up
            for i in range(stride):
                line[i] = (line[i] + prev[i]) & 255
        elif ft == 3:  # Average
            for i in range(stride):
                a = line[i - nch] if i >= nch else 0
                line[i] = (line[i] + ((a + prev[i]) >> 1)) & 255
        elif ft == 4:  # Paeth
            for i in range(stride):
                a = line[i - nch] if i >= nch else 0
                b = prev[i]
                c = prev[i - nch] if i >= nch else 0
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                line[i] = (line[i] + pred) & 255
        elif ft != 0:
            raise ValueError(f"unknown PNG filter type {ft}")
        prev = line
        out[y] = np.frombuffer(bytes(line), dtype=np.uint8)
    return out


def decode_png_gray(payload: bytes) -> tuple[int, int, list[list[int]]]:
    """Decode a REAL compressed PNG (8-bit grayscale or truecolor,
    non-interlaced — the common cases) into a row-major grayscale
    grid: chunk walk, zlib inflate of the concatenated IDAT stream,
    full scanline unfiltering (None/Sub/Up/Average/Paeth), then the
    same integer luma as the BMP path.  Raises ValueError on anything
    else (module codec policy)."""
    w, h, arr = _decode_png_gray_np(payload)
    return w, h, arr.tolist()


def _decode_image_gray_np(payload: bytes) -> tuple[int, int, np.ndarray]:
    """Magic-dispatched grayscale decode returning an (h, w) int64
    ndarray — the vectorized core the Arrow stages share."""
    if payload[:2] == b"BM":
        return _decode_bmp_gray_np(payload)
    if payload[:8] == _PNG_MAGIC:
        return _decode_png_gray_np(payload)
    raise ValueError("unsupported image format (BMP and PNG supported)")


def decode_image_gray(payload: bytes) -> tuple[int, int, list[list[int]]]:
    """Magic-dispatched grayscale decode: BMP or PNG (both real
    decoders); ValueError on anything else."""
    w, h, arr = _decode_image_gray_np(payload)
    return w, h, arr.tolist()


def average_hash(payload: bytes, grid: int = 8) -> tuple[int, int, int]:
    """64-bit perceptual average-hash over real decoded pixels (BMP or
    PNG, magic-dispatched): block-mean downsample to ``grid`` x
    ``grid`` grayscale, threshold each cell at the global mean (bit=1
    when >= mean), MSB-first row-major.  All-integer arithmetic, so
    the hash is deterministic across platforms — and codec-invariant:
    the same pixels hash identically through either decoder.  Returns
    (width, height, hash)."""
    w, h, arr = _decode_image_gray_np(payload)
    return w, h, grid_average_hash(w, h, arr, grid)


def grid_average_hash(w: int, h: int, rows, grid: int = 8) -> int:
    """The block-mean/threshold half of ``average_hash`` over an
    already-decoded grayscale grid (list-of-lists or 2-D ndarray;
    shared by the image-feature extractor so one decode serves hash
    AND checksum).  Per-cell sums are C-vectorized slice reductions;
    the cell/bounds arithmetic is unchanged."""
    if w < 1 or h < 1:
        raise ValueError("empty image")
    arr = np.asarray(rows, dtype=np.int64)
    cells = []
    for gy in range(grid):
        y0, y1 = gy * h // grid, max(gy * h // grid + 1, (gy + 1) * h // grid)
        for gx in range(grid):
            x0, x1 = gx * w // grid, max(gx * w // grid + 1, (gx + 1) * w // grid)
            block = arr[y0 : min(y1, h), x0 : min(x1, w)]
            cells.append(int(block.sum()) // max(block.size, 1))
    mean = sum(cells) // len(cells)
    bits = 0
    for c in cells:
        bits = (bits << 1) | (1 if c >= mean else 0)
    # interpret as signed 64-bit so it fits Spark's LongType
    if bits >= 1 << 63:
        bits -= 1 << 64
    return bits


def _png_chunk(typ: bytes, data: bytes) -> bytes:
    import zlib

    return (
        struct.pack(">I", len(data))
        + typ
        + data
        + struct.pack(">I", zlib.crc32(typ + data) & 0xFFFFFFFF)
    )


def encode_png(rows: list[list[int]], color: bool = False) -> bytes:
    """REAL PNG encode of a row-major 8-bit grid, stdlib-only (zlib
    IDAT, filter 0 scanlines): grayscale (color=False) or truecolor
    with r=g=b (color=True — the decoder's BT.601 luma of an equal-
    channel pixel is exactly the input value, so both color types
    round-trip losslessly).  The encode/decode pair is the image
    analog of the WAV codec seam."""
    import zlib

    arr = np.asarray(rows, dtype=np.uint8)
    h, w = arr.shape if arr.ndim == 2 else (len(arr), 0)
    if not (w and h):
        raise ValueError("empty image")
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2 if color else 0, 0, 0, 0)
    # filter-0 scanlines, built as one (h, 1+stride) array: a zero
    # filter byte per row, then the row's samples (r=g=b for color)
    stride = w * (3 if color else 1)
    scan = np.zeros((h, 1 + stride), dtype=np.uint8)
    scan[:, 1:] = np.repeat(arr, 3, axis=1) if color else arr
    return (
        _PNG_MAGIC
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"IDAT", zlib.compress(scan.tobytes()))
        + _png_chunk(b"IEND", b"")
    )


def encode_bmp(rows: list[list[int]]) -> bytes:
    """REAL uncompressed 24-bit BMP encode of a row-major 8-bit grid
    (r=g=b pixels; bottom-up rows, 4-byte stride padding — the layout
    decode_bmp_gray reverses)."""
    h = len(rows)
    w = len(rows[0]) if h else 0
    if not (w and h):
        raise ValueError("empty image")
    body = _pack_dib_rows(rows)
    header = b"BM" + struct.pack("<IHHI", 54 + len(body), 0, 0, 54)
    info = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(body), 2835, 2835, 0, 0)
    return bytes(header + info + body)


#: schema of extract_image_features (all-integer: deterministic)
IMAGE_FEATURES_SCHEMA = (
    "doc_id long, width long, height long, ahash long, pixel_sum long"
)


def extract_image_features(df: DataFrame, id_col: str, payload_col: str) -> DataFrame:
    """Arrow-batched image feature extraction through the REAL
    stdlib codecs (BMP / PNG, magic-dispatched): per row, width,
    height, 64-bit perceptual average-hash, and the exact grayscale
    pixel checksum — one decode serves both (grid_average_hash over
    the decoded grid).  All-integer, so deterministic across engines.
    Same mapInPandas scale posture as extract_media_features: row-
    local, zero shuffles."""
    src = df.select(
        F.col(id_col).cast("long").alias("doc_id"),
        F.col(payload_col).cast("binary").alias("payload"),
    )

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out = {"doc_id": [], "width": [], "height": [], "ahash": [], "pixel_sum": []}
            for doc_id, p in zip(pdf["doc_id"], pdf["payload"]):
                w, h, arr = _decode_image_gray_np(p if p is not None else b"")
                out["doc_id"].append(doc_id)
                out["width"].append(w)
                out["height"].append(h)
                out["ahash"].append(grid_average_hash(w, h, arr))
                out["pixel_sum"].append(int(arr.sum()))
            yield pd.DataFrame(out)

    return src.mapInPandas(batches, IMAGE_FEATURES_SCHEMA)


def image_hash_features(df: DataFrame, id_col: str, payload_col: str) -> DataFrame:
    """Arrow-batched perceptual hashing over an opaque BMP binary
    column — the near-duplicate-image fingerprint step of a multimodal
    curation pipeline (pairs within small hamming distance of their
    ahash are near-dup candidates; the banding machinery of
    q_simhash_pairs applies unchanged to these 64-bit hashes)."""
    src = df.select(
        F.col(id_col).cast("long").alias("doc_id"),
        F.col(payload_col).cast("binary").alias("payload"),
    )

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out = {"doc_id": [], "width": [], "height": [], "ahash": []}
            for doc_id, p in zip(pdf["doc_id"], pdf["payload"]):
                w, h, arr = _decode_image_gray_np(p if p is not None else b"")
                out["doc_id"].append(doc_id)
                out["width"].append(w)
                out["height"].append(h)
                out["ahash"].append(grid_average_hash(w, h, arr))
            yield pd.DataFrame(out)

    return src.mapInPandas(batches, IMAGE_HASH_SCHEMA)
