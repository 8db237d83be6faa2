"""Multimodal column plumbing — image/audio/video as opaque ``binary``
columns with typed metadata, processed through Arrow-batched
``mapInPandas`` pipelines.

Decode kernels, by availability (feature-gated at runtime):

- ``PIL`` when importable — full-format decode (production path);
- a dependency-free PNG decoder (zlib inflate + scanline unfilter,
  8-bit gray/RGB/RGBA, non-interlaced) — real decode that works in
  codec-less containers like this one;
- the deterministic fake (seeded by content hash) — stable features
  for oracle checks regardless of environment (``fake=True``).

Video/audio codecs are genuinely absent; those kernels raise
NotImplementedError outside the fake path.

Scale notes: binary payloads dominate row size, so these operators
repartition by byte budget (``target_rows_per_batch``) before the
Python stage, select only the payload + id columns into the Arrow
boundary (column pruning), and return slim feature rows.
"""

from __future__ import annotations

import hashlib
import struct
import zlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

IMAGE_META_SCHEMA = T.StructType([
    T.StructField("width", T.IntegerType()),
    T.StructField("height", T.IntegerType()),
    T.StructField("format", T.StringType()),
])

IMAGE_FEATURES_SCHEMA = T.StructType([
    T.StructField("doc_id", T.LongType()),
    T.StructField("width", T.IntegerType()),
    T.StructField("height", T.IntegerType()),
    T.StructField("mean_luma", T.DoubleType()),
    T.StructField("phash", T.LongType()),
])


def attach_binary_column(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Testing helper: synthesize a deterministic binary payload column
    from text (stands in for real image bytes in fixtures)."""
    return df.withColumn("payload", F.encode(F.col(text_col), "utf-8")) \
             .withColumn("media_type", F.lit("image/fake"))


def _fake_decode(payload: bytes) -> tuple[int, int, float, int]:
    """Deterministic fake image decode: dimensions/luma/phash derived
    from the content digest, stable across runs and partitionings."""
    h = hashlib.md5(payload).digest()
    width = 64 + h[0] % 192
    height = 64 + h[1] % 192
    mean_luma = h[2] / 255.0
    phash = int.from_bytes(h[4:12], "big", signed=True)
    return width, height, mean_luma, phash


_PNG_MAGIC = b"\x89PNG\r\n\x1a\n"


def _png_decode_luma(data: bytes):
    """Dependency-free PNG decode to a luma (grayscale) pixel matrix:
    ``(width, height, [[float]])``.  Supports the baseline bit depth
    (8) for gray / gray+alpha / RGB / RGBA, non-interlaced — what an
    in-pipeline thumbnailer emits.  Anything else raises
    NotImplementedError (a production cluster installs PIL and never
    reaches this decoder)."""
    if data[:8] != _PNG_MAGIC:
        raise NotImplementedError("not a PNG payload")
    pos, idat = 8, b""
    w = h = bitd = ctype = interlace = None
    while pos + 8 <= len(data):
        ln = int.from_bytes(data[pos:pos + 4], "big")
        typ = data[pos + 4:pos + 8]
        chunk = data[pos + 8:pos + 8 + ln]
        pos += 12 + ln                       # len + type + data + crc
        if typ == b"IHDR":
            w, h, bitd, ctype = struct.unpack(">IIBB", chunk[:10])
            interlace = chunk[12]
        elif typ == b"IDAT":
            idat += chunk
        elif typ == b"IEND":
            break
    if w is None or bitd != 8 or interlace or ctype not in (0, 2, 4, 6):
        raise NotImplementedError(
            f"PNG variant not supported by the built-in decoder "
            f"(bit depth {bitd}, color type {ctype}, interlace "
            f"{interlace}) — install PIL for full-format decode")
    nch = {0: 1, 2: 3, 4: 2, 6: 4}[ctype]
    raw = zlib.decompress(idat)
    stride = w * nch
    prev = bytearray(stride)
    rows = []
    i = 0
    for _ in range(h):
        f = raw[i]
        line = bytearray(raw[i + 1:i + 1 + stride])
        i += 1 + stride
        if f == 1:                           # Sub
            for x in range(nch, stride):
                line[x] = (line[x] + line[x - nch]) & 0xFF
        elif f == 2:                         # Up
            for x in range(stride):
                line[x] = (line[x] + prev[x]) & 0xFF
        elif f == 3:                         # Average
            for x in range(stride):
                a = line[x - nch] if x >= nch else 0
                line[x] = (line[x] + ((a + prev[x]) >> 1)) & 0xFF
        elif f == 4:                         # Paeth
            for x in range(stride):
                a = line[x - nch] if x >= nch else 0
                b = prev[x]
                c = prev[x - nch] if x >= nch else 0
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pr = a if pa <= pb and pa <= pc else (b if pb <= pc else c)
                line[x] = (line[x] + pr) & 0xFF
        elif f != 0:
            raise NotImplementedError(f"PNG filter type {f}")
        if ctype in (0, 4):                  # gray / gray+alpha
            rows.append([float(line[x * nch]) for x in range(w)])
        else:                                # RGB / RGBA
            rows.append([0.299 * line[x * nch] + 0.587 * line[x * nch + 1]
                         + 0.114 * line[x * nch + 2] for x in range(w)])
        prev = line
    return w, h, rows


def _ahash(rows, w: int, h: int) -> int:
    """64-bit average hash: 8x8 block-mean luma thresholded by the
    global mean — the standard perceptual near-dup fingerprint."""
    cells = []
    for by in range(8):
        y0, y1 = by * h // 8, max(by * h // 8 + 1, (by + 1) * h // 8)
        for bx in range(8):
            x0, x1 = bx * w // 8, max(bx * w // 8 + 1, (bx + 1) * w // 8)
            vals = [rows[y][x] for y in range(y0, min(y1, h))
                    for x in range(x0, min(x1, w))]
            cells.append(sum(vals) / len(vals) if vals else 0.0)
    mean = sum(cells) / len(cells)
    bits = 0
    for c in cells:
        bits = (bits << 1) | (1 if c > mean else 0)
    return bits - (1 << 64) if bits >= (1 << 63) else bits


def _real_decode(payload: bytes) -> tuple[int, int, float, int]:
    """Real image decode → (width, height, mean_luma, ahash).  PIL if
    installed (any format), else the built-in PNG decoder."""
    try:
        from PIL import Image                # pragma: no cover - no PIL here
        import io
        img = Image.open(io.BytesIO(bytes(payload))).convert("L")
        w, h = img.size
        px = list(img.getdata())
        rows = [[float(px[y * w + x]) for x in range(w)] for y in range(h)]
    except ImportError:
        w, h, rows = _png_decode_luma(bytes(payload))
    mean = sum(sum(r) for r in rows) / (w * h * 255.0)
    return w, h, mean, _ahash(rows, w, h)


def encode_png(rows: list[list[int]], filter_type: int = 0) -> bytes:
    """Minimal grayscale PNG encoder (test fixture generator — the
    round-trip partner of :func:`_png_decode_luma`).  ``filter_type``
    applies one PNG scanline filter to every row, exercising each
    unfilter branch of the decoder."""
    h, w = len(rows), len(rows[0])

    def chunk(typ: bytes, data: bytes) -> bytes:
        return (struct.pack(">I", len(data)) + typ + data
                + struct.pack(">I", zlib.crc32(typ + data) & 0xFFFFFFFF))

    raw = bytearray()
    prev = bytearray(w)
    for r in rows:
        line = bytearray(r)
        filt = bytearray(w)
        for x in range(w):
            a = line[x - 1] if x >= 1 else 0
            b = prev[x]
            c = prev[x - 1] if x >= 1 else 0
            if filter_type == 0:
                pred = 0
            elif filter_type == 1:
                pred = a
            elif filter_type == 2:
                pred = b
            elif filter_type == 3:
                pred = (a + b) >> 1
            else:
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if pa <= pb and pa <= pc else (b if pb <= pc else c)
            filt[x] = (line[x] - pred) & 0xFF
        raw += bytes([filter_type]) + filt
        prev = line
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 0, 0, 0, 0)
    return (_PNG_MAGIC + chunk(b"IHDR", ihdr)
            + chunk(b"IDAT", zlib.compress(bytes(raw)))
            + chunk(b"IEND", b""))


def extract_image_features(df: DataFrame, id_col: str = "doc_id",
                           payload_col: str = "payload",
                           fake: bool = True,
                           target_rows_per_batch: int = 1024) -> DataFrame:
    """Decode + feature-extract over binary payloads via mapInPandas.

    ``fake=True`` (default) keeps the deterministic content-hash
    kernel — environment-independent, which is what the q47 value
    oracle checks.  ``fake=False`` decodes for real: PIL when
    installed, the built-in PNG decoder otherwise; unsupported
    formats raise NotImplementedError at execution.
    """
    from preql_spark.operators.text import ensure_parallelism
    # Arrow batch size bounds peak memory at the Python boundary
    # (payloads are MBs each in real pipelines); session-level knob,
    # applied here so callers get it without touching configs
    df.sparkSession.conf.set(
        "spark.sql.execution.arrow.maxRecordsPerBatch",
        str(target_rows_per_batch))
    slim = ensure_parallelism(
        df.select(F.col(id_col).alias("doc_id"), F.col(payload_col)))

    decode = _fake_decode if fake else _real_decode

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [decode(bytes(p)) for p in pdf[payload_col]]
            yield pd.DataFrame({
                "doc_id": pdf["doc_id"].values,
                "width": [f[0] for f in feats],
                "height": [f[1] for f in feats],
                "mean_luma": [f[2] for f in feats],
                "phash": [f[3] for f in feats],
            })

    return slim.mapInPandas(kernel, IMAGE_FEATURES_SCHEMA)


def frame_sample_plan(df: DataFrame, id_col: str, n_frames: int) -> DataFrame:
    """Video frame-sampling plumbing: fan each payload row out into
    ``n_frames`` (frame_idx) rows *before* the decode stage so frame
    decodes parallelize across the cluster, not within one task."""
    return df.select(F.col(id_col),
                     F.explode(F.sequence(F.lit(0), F.lit(n_frames - 1)))
                     .alias("frame_idx"))


# ---- audio ----------------------------------------------------------------

AUDIO_FEATURES_SCHEMA = T.StructType([
    T.StructField("doc_id", T.LongType()),
    T.StructField("sample_rate", T.IntegerType()),
    T.StructField("n_samples", T.LongType()),
    T.StructField("duration_s", T.DoubleType()),
    T.StructField("rms", T.DoubleType()),
])


def encode_wav(samples: list, sample_rate: int = 16000) -> bytes:
    """Test/fixture helper: 16-bit mono PCM WAV from [-1, 1] floats
    (stdlib ``wave`` — no codecs needed)."""
    import io
    import wave
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(sample_rate)
        w.writeframes(b"".join(
            struct.pack("<h", max(-32768, min(32767, round(s * 32767))))
            for s in samples))
    return buf.getvalue()


def _wav_decode(payload: bytes) -> tuple[int, int, float, float]:
    """Real audio decode for PCM WAV via stdlib ``wave`` + numpy RMS —
    like the PNG path, a genuine kernel that needs no external codecs.
    Non-WAV payloads raise NotImplementedError (compressed formats
    need real codec libraries)."""
    import io
    import wave

    import numpy as np
    if payload[:4] != b"RIFF":
        raise NotImplementedError(
            "only PCM WAV decodes without codec libraries")
    with wave.open(io.BytesIO(bytes(payload))) as w:
        sr = w.getframerate()
        n = w.getnframes()
        width = w.getsampwidth()
        raw = w.readframes(n)
    dtype = {1: np.uint8, 2: np.int16, 4: np.int32}[width]
    x = np.frombuffer(raw, dtype=dtype).astype("float64")
    if width == 1:
        x = x - 128.0
    peak = float(2 ** (8 * width - 1))
    rms = float(np.sqrt(np.mean((x / peak) ** 2))) if len(x) else 0.0
    return sr, n, n / sr if sr else 0.0, rms


def _fake_audio_decode(payload: bytes) -> tuple[int, int, float, float]:
    """Deterministic fake audio features from the content digest."""
    h = hashlib.md5(payload).digest()
    sr = (8000, 16000, 22050, 44100)[h[0] % 4]
    n = 1000 + int.from_bytes(h[1:4], "big") % 100000
    return sr, n, n / sr, h[4] / 255.0


def extract_audio_features(df: DataFrame, id_col: str = "doc_id",
                           payload_col: str = "payload",
                           fake: bool = True,
                           target_rows_per_batch: int = 1024) -> DataFrame:
    """Audio decode + feature extraction (sample rate, length,
    duration, RMS level) via the same Arrow ``mapInPandas`` shape as
    the image path: payload-pruned input, slim feature rows out.
    ``fake=False`` decodes real PCM WAV (stdlib wave + numpy)."""
    from preql_spark.operators.text import ensure_parallelism
    df.sparkSession.conf.set(
        "spark.sql.execution.arrow.maxRecordsPerBatch",
        str(target_rows_per_batch))
    slim = ensure_parallelism(
        df.select(F.col(id_col).alias("doc_id"), F.col(payload_col)))
    decode = _fake_audio_decode if fake else _wav_decode

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [decode(bytes(p)) for p in pdf[payload_col]]
            yield pd.DataFrame({
                "doc_id": pdf["doc_id"].values,
                "sample_rate": [f[0] for f in feats],
                "n_samples": [f[1] for f in feats],
                "duration_s": [f[2] for f in feats],
                "rms": [f[3] for f in feats],
            })

    return slim.mapInPandas(kernel, AUDIO_FEATURES_SCHEMA)


# ---- image resize ---------------------------------------------------------

RESIZED_SCHEMA = T.StructType([
    T.StructField("doc_id", T.LongType()),
    T.StructField("width", T.IntegerType()),
    T.StructField("height", T.IntegerType()),
    T.StructField("payload", T.BinaryType()),
])


def _resize_builtin(payload: bytes, w: int, h: int) -> bytes:
    """Nearest-neighbor luma resize through the dependency-free PNG
    decode/encode pair (PIL, when installed, handles richer formats —
    tried first by :func:`_real_resize`)."""
    sw, sh, rows = _png_decode_luma(bytes(payload))
    out = [[int(rows[y * sh // h][x * sw // w]) for x in range(w)]
           for y in range(h)]
    return encode_png(out)


def _real_resize(payload: bytes, w: int, h: int) -> bytes:
    try:
        import io

        from PIL import Image
        img = Image.open(io.BytesIO(bytes(payload))).convert("L")
        img = img.resize((w, h), Image.NEAREST)
        buf = io.BytesIO()
        img.save(buf, format="PNG")
        return buf.getvalue()
    except ImportError:
        return _resize_builtin(payload, w, h)


def resize_images(df: DataFrame, width: int, height: int,
                  id_col: str = "doc_id", payload_col: str = "payload",
                  target_rows_per_batch: int = 256) -> DataFrame:
    """Batch image resize: payload in, resized PNG payload out —
    the standard multimodal-preprocessing step (fixed input dims for
    vision encoders).  Arrow-batched like the other kernels; batch
    size defaults lower because BOTH sides of this boundary carry
    image bytes."""
    from preql_spark.operators.text import ensure_parallelism
    df.sparkSession.conf.set(
        "spark.sql.execution.arrow.maxRecordsPerBatch",
        str(target_rows_per_batch))
    slim = ensure_parallelism(
        df.select(F.col(id_col).alias("doc_id"), F.col(payload_col)))

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame({
                "doc_id": pdf["doc_id"].values,
                "width": width,
                "height": height,
                "payload": [_real_resize(p, width, height)
                            for p in pdf[payload_col]],
            })

    return slim.mapInPandas(kernel, RESIZED_SCHEMA)


FRAME_FEATURES_SCHEMA = T.StructType([
    T.StructField("doc_id", T.LongType()),
    T.StructField("frame_idx", T.IntegerType()),
    T.StructField("mean_luma", T.DoubleType()),
    T.StructField("phash", T.LongType()),
])


def _fake_frame_decode(payload: bytes, idx: int) -> tuple[float, int]:
    """Deterministic fake frame decode: features derive from the
    (content digest, frame index) pair — stable across runs and
    partitionings, distinct per frame."""
    h = hashlib.md5(payload + struct.pack("<i", idx)).digest()
    return h[0] / 255.0, int.from_bytes(h[4:12], "big", signed=True)


def extract_frame_features(df: DataFrame, n_frames: int,
                           id_col: str = "doc_id",
                           payload_col: str = "payload",
                           fake: bool = True,
                           target_rows_per_batch: int = 256) -> DataFrame:
    """Video frame sampling + per-frame feature extraction: the
    (id, frame_idx) fan-out happens BEFORE the Arrow boundary
    (:func:`frame_sample_plan`) so frame decodes parallelize across
    the cluster rather than within one task, then each (payload,
    frame_idx) row decodes independently.

    Video codecs are genuinely absent in this container, so the real
    path raises NotImplementedError at execution; the plumbing —
    fan-out order, Arrow batch shape, per-frame determinism — is real
    and tested.  At scale the payload is joined back AFTER the
    fan-out on the id (broadcast/bucketed), so n_frames copies of the
    bytes exist only inside the decode stage, never in a shuffle."""
    from preql_spark.operators.text import ensure_parallelism
    df.sparkSession.conf.set(
        "spark.sql.execution.arrow.maxRecordsPerBatch",
        str(target_rows_per_batch))
    base = df.select(F.col(id_col).alias("doc_id"), F.col(payload_col))
    frames = frame_sample_plan(base, "doc_id", n_frames)
    slim = ensure_parallelism(
        frames.join(base, "doc_id").select("doc_id", "frame_idx",
                                           payload_col))

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not fake:
                raise NotImplementedError(
                    "video decode needs codec libraries")
            feats = [_fake_frame_decode(bytes(p), int(i))
                     for p, i in zip(pdf[payload_col], pdf["frame_idx"])]
            yield pd.DataFrame({
                "doc_id": pdf["doc_id"].values,
                "frame_idx": pdf["frame_idx"].values.astype("int32"),
                "mean_luma": [f[0] for f in feats],
                "phash": [f[1] for f in feats],
            })

    return slim.mapInPandas(kernel, FRAME_FEATURES_SCHEMA)
