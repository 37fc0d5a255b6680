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


def _luma(r: int, g: int, b: int) -> int:
    """Integer BT.601-ish luma (/256 keeps it exact) — the ONE
    grayscale definition every codec in this module shares, so the
    documented codec-invariance guarantees (same pixels hash
    identically through BMP/PNG/AVI) cannot silently diverge."""
    return (77 * r + 150 * g + 29 * b) >> 8


def _pack_dib_rows(rows: list[list[int]]) -> bytes:
    """Row-major grayscale grid -> bottom-up padded BGR DIB bytes
    (r=g=b), the storage layout BMP bodies and AVI '00db' frames
    share."""
    w = len(rows[0])
    stride = (w * 3 + 3) & ~3
    body = bytearray()
    for r in reversed(rows):  # positive height => bottom-up storage
        line = bytearray()
        for v in r:
            line += bytes((v, v, v))
        line += b"\x00" * (stride - len(line))
        body += line
    return bytes(body)


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


def decode_wav_pcm(payload: bytes) -> tuple[int, int, list[int]]:
    """REAL sample decode for 16-bit PCM RIFF/WAV: returns
    (sample_rate, n_channels, first-channel samples as ints).  The
    codec seam's audio analog of ``decode_png_gray`` — stdlib-only
    (``wave`` + ``array``), raises ValueError on non-WAV or non-16-bit
    payloads (the module codec policy)."""
    import array
    import io
    import sys
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
    samples = array.array("h")
    samples.frombytes(raw[: len(raw) - (len(raw) % 2)])
    if sys.byteorder == "big":  # WAV PCM is little-endian
        samples.byteswap()
    return rate, nch, list(samples[::nch])


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
        rate, nch, s = decode_wav_pcm(p)
        n = len(s)
        peak = max((abs(v) for v in s), default=0)
        sumsq = sum(v * v for v in s)
        rms = math.isqrt(sumsq // n) if n else 0
        zc = sum(
            1 for a, b in zip(s, s[1:]) if (a >= 0) != (b >= 0)
        )
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


def encode_avi(frames: list[list[list[int]]], fps: int = 10) -> bytes:
    """REAL AVI container encode of grayscale frame grids, stdlib-only:
    a RIFF('AVI ') file with the standard hdrl LIST (avih main header
    + one 'vids'/DIB stream: strh + BITMAPINFOHEADER strf) and a movi
    LIST of uncompressed '00db' DIB frames (bottom-up BGR rows with
    4-byte stride padding, r=g=b — the exact layout decode_bmp_gray
    reverses).  The video analog of the WAV/PNG codec seams."""
    if not frames or not frames[0] or not frames[0][0]:
        raise ValueError("empty video")
    h = len(frames[0])
    w = len(frames[0][0])
    stride = (w * 3 + 3) & ~3
    frame_bytes = stride * h

    def chunk(tag: bytes, data: bytes) -> bytes:
        pad = b"\x00" if len(data) % 2 else b""
        return tag + struct.pack("<I", len(data)) + data + pad

    def dib(rows: list[list[int]]) -> bytes:
        if len(rows) != h or any(len(r) != w for r in rows):
            raise ValueError("inconsistent frame dimensions")
        return _pack_dib_rows(rows)

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
    movi = b"movi" + b"".join(chunk(b"00db", dib(f)) for f in frames)
    body = b"AVI " + chunk(b"LIST", hdrl) + chunk(b"LIST", movi)
    return b"RIFF" + struct.pack("<I", len(body)) + body


def decode_avi_gray(payload: bytes) -> tuple[int, int, list[list[list[int]]]]:
    """REAL AVI decode, stdlib-only: RIFF walk, avih main header for
    declared dimensions/frame count, '00db'/'00dc' movi chunks
    unpacked from bottom-up padded BGR DIB rows into row-major
    grayscale grids (the BMP luma path).  Raises ValueError on
    non-AVI payloads or a frame-count/dimension mismatch between the
    header and the movi data (module codec policy)."""
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
    frames: list[list[list[int]]] = []
    for raw in frames_raw:
        if len(raw) < stride * h:
            raise ValueError("truncated AVI frame data")
        rows = []
        for y in range(h):
            base = (h - 1 - y) * stride  # bottom-up
            row = []
            for x in range(w):
                b, g, r = raw[base + 3 * x : base + 3 * x + 3]
                row.append(_luma(r, g, b))
            rows.append(row)
        frames.append(rows)
    return w, h, frames


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
                w, h, frames = decode_avi_gray(p if p is not None else b"")
                sampled = frames[::step]
                npix = w * h
                checksum = 0
                for k, fr in enumerate(sampled):
                    mean = sum(sum(r) for r in fr) // npix
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


def decode_bmp_gray(payload: bytes) -> tuple[int, int, list[list[int]]]:
    """Decode an uncompressed 24-bit BITMAPINFOHEADER BMP into a
    row-major grayscale grid (top-down).  Stdlib-only; raises
    ValueError on anything else (see module codec policy)."""
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
    rows: list[list[int]] = []
    for y in range(h):
        src_y = y if top_down else h - 1 - y
        base = data_off + src_y * stride
        row = []
        for x in range(w):
            b, g, r = payload[base + 3 * x : base + 3 * x + 3]
            row.append(_luma(r, g, b))
        rows.append(row)
    return w, h, rows


_PNG_MAGIC = b"\x89PNG\r\n\x1a\n"


def decode_png_gray(payload: bytes) -> tuple[int, int, list[list[int]]]:
    """Decode a REAL compressed PNG (8-bit grayscale or truecolor,
    non-interlaced — the common cases) into a row-major grayscale
    grid, stdlib-only: chunk walk, zlib inflate of the concatenated
    IDAT stream, full scanline unfiltering (None/Sub/Up/Average/
    Paeth), then the same integer luma as the BMP path.  Raises
    ValueError on anything else (module codec policy)."""
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
    rows: list[list[int]] = []
    prev = bytearray(stride)
    off = 0
    for _y in range(h):
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
        if nch == 1:
            rows.append(list(line))
        else:
            rows.append(
                [
                    _luma(line[3 * x], line[3 * x + 1], line[3 * x + 2])
                    for x in range(w)
                ]
            )
    return w, h, rows


def decode_image_gray(payload: bytes) -> tuple[int, int, list[list[int]]]:
    """Magic-dispatched grayscale decode: BMP or PNG (both real
    decoders, stdlib-only); ValueError on anything else."""
    if payload[:2] == b"BM":
        return decode_bmp_gray(payload)
    if payload[:8] == _PNG_MAGIC:
        return decode_png_gray(payload)
    raise ValueError("unsupported image format (BMP and PNG supported)")


def average_hash(payload: bytes, grid: int = 8) -> tuple[int, int, int]:
    """64-bit perceptual average-hash over real decoded pixels (BMP or
    PNG, magic-dispatched): block-mean downsample to ``grid`` x
    ``grid`` grayscale, threshold each cell at the global mean (bit=1
    when >= mean), MSB-first row-major.  All-integer arithmetic, so
    the hash is deterministic across platforms — and codec-invariant:
    the same pixels hash identically through either decoder.  Returns
    (width, height, hash)."""
    w, h, rows = decode_image_gray(payload)
    return w, h, grid_average_hash(w, h, rows, grid)


def grid_average_hash(w: int, h: int, rows: list[list[int]], grid: int = 8) -> int:
    """The block-mean/threshold half of ``average_hash`` over an
    already-decoded grayscale grid (shared by the image-feature
    extractor so one decode serves hash AND checksum)."""
    if w < 1 or h < 1:
        raise ValueError("empty image")
    cells = []
    for gy in range(grid):
        y0, y1 = gy * h // grid, max(gy * h // grid + 1, (gy + 1) * h // grid)
        for gx in range(grid):
            x0, x1 = gx * w // grid, max(gx * w // grid + 1, (gx + 1) * w // grid)
            acc = n = 0
            for y in range(y0, min(y1, h)):
                for x in range(x0, min(x1, w)):
                    acc += rows[y][x]
                    n += 1
            cells.append(acc // max(n, 1))
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

    h = len(rows)
    w = len(rows[0]) if h else 0
    if not (w and h):
        raise ValueError("empty image")
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2 if color else 0, 0, 0, 0)
    raw = bytearray()
    for r in rows:
        raw.append(0)  # filter type None
        if color:
            for v in r:
                raw += bytes((v, v, v))
        else:
            raw += bytes(r)
    return (
        _PNG_MAGIC
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"IDAT", zlib.compress(bytes(raw)))
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
                w, h, rows = decode_image_gray(p if p is not None else b"")
                out["doc_id"].append(doc_id)
                out["width"].append(w)
                out["height"].append(h)
                out["ahash"].append(grid_average_hash(w, h, rows))
                out["pixel_sum"].append(sum(sum(r) for r in rows))
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
                w, h, bits = average_hash(p if p is not None else b"")
                out["doc_id"].append(doc_id)
                out["width"].append(w)
                out["height"].append(h)
                out["ahash"].append(bits)
            yield pd.DataFrame(out)

    return src.mapInPandas(batches, IMAGE_HASH_SCHEMA)
