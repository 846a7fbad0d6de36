"""Multimodal columns: opaque binary payloads + typed metadata, with REAL
decode kernels for the formats parseable with the stdlib + NumPy alone.

Image/audio/video travel as ``binary`` columns with a metadata struct.
The Spark side — schema, partitioning, Arrow batch shape, UDF signatures —
is real and tested, and so is decode for two concrete codecs:

- WAV (RIFF/PCM) via the stdlib ``wave`` module → sample array →
  duration / RMS / zero-crossing rate / log-energy FFT bands;
- BMP (uncompressed 24-bit BI_RGB) via ``struct`` header parsing →
  HxWx3 array → mean-RGB / luma histogram, plus nearest-neighbor resize;
- PNG (8-bit gray/RGB/RGBA, non-interlaced) via stdlib ``zlib`` chunk
  parsing with all five scanline filters un-applied.

Other codecs (JPEG/MP4...) need external libraries that are not in
this container; payloads in those formats raise ``NotImplementedError``
naming the magic bytes — loudly, per batch, so a misconfigured cluster
job fails fast instead of producing garbage features. ``fake=True``
substitutes a deterministic hash-seeded featurizer for everything (test
plumbing / schema work without any decodable payloads).

Design notes for 100 TB:
- payloads stay opaque bytes until the last possible operator — filters
  and joins run on metadata columns so parquet scans prune payload pages;
- ``mapInPandas`` (iterator form) keeps per-batch memory bounded by
  ``spark.sql.execution.arrow.maxRecordsPerBatch`` — size it so
  batch_rows × max_payload fits the executor;
- feature extraction emits fixed-size float arrays → downstream joins and
  ANN reuse the embedding operators unchanged.
"""

from __future__ import annotations

import hashlib
import io
import struct
import wave
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),        # image|audio|video
        T.StructField("payload", T.BinaryType(), True),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("mime", T.StringType()),
                    T.StructField("width", T.IntegerType()),
                    T.StructField("height", T.IntegerType()),
                    T.StructField("duration_ms", T.IntegerType()),
                ]
            ),
        ),
    ]
)


# ---------------------------------------------------------------------------
# codecs (pure stdlib + NumPy)
# ---------------------------------------------------------------------------


def encode_wav(samples: np.ndarray, rate: int = 8000) -> bytes:
    """float samples in [-1, 1] -> mono 16-bit PCM WAV bytes."""
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(rate)
        w.writeframes(
            (np.clip(samples, -1, 1) * 32767).astype("<i2").tobytes()
        )
    return buf.getvalue()


def decode_wav(payload: bytes) -> tuple[int, np.ndarray]:
    """WAV bytes -> (sample_rate, float32 mono samples in [-1, 1])."""
    with wave.open(io.BytesIO(payload), "rb") as w:
        rate = w.getframerate()
        n = w.getnframes()
        width = w.getsampwidth()
        ch = w.getnchannels()
        raw = w.readframes(n)
    if width == 2:
        x = np.frombuffer(raw, dtype="<i2").astype(np.float32) / 32768.0
    elif width == 1:
        x = (np.frombuffer(raw, dtype=np.uint8).astype(np.float32) - 128.0) / 128.0
    else:
        raise NotImplementedError(f"WAV sample width {width} not supported")
    if ch > 1:
        x = x.reshape(-1, ch).mean(axis=1)
    return rate, x


def encode_bmp(img: np.ndarray) -> bytes:
    """HxWx3 uint8 RGB -> uncompressed 24-bit BI_RGB BMP bytes."""
    h, w = img.shape[:2]
    row_size = (w * 3 + 3) // 4 * 4
    pix = bytearray()
    for r in range(h - 1, -1, -1):  # bottom-up rows, BGR channel order
        row = img[r][:, ::-1].tobytes()
        pix += row + b"\x00" * (row_size - len(row))
    header = struct.pack("<2sIHHI", b"BM", 54 + len(pix), 0, 0, 54)
    info = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(pix),
                       2835, 2835, 0, 0)
    return bytes(header) + info + bytes(pix)


def decode_bmp(payload: bytes) -> np.ndarray:
    """Uncompressed 24-bit BMP bytes -> HxWx3 uint8 RGB array."""
    magic, _size, _r1, _r2, off = struct.unpack_from("<2sIHHI", payload, 0)
    if magic != b"BM":
        raise ValueError("not a BMP payload")
    _hdrsz, w, h, _planes, bpp, comp = struct.unpack_from("<IiiHHI", payload, 14)
    if bpp != 24 or comp != 0:
        raise NotImplementedError(f"BMP bpp={bpp} compression={comp} not supported")
    row_size = (w * 3 + 3) // 4 * 4
    arr = np.frombuffer(payload, np.uint8, row_size * abs(h), off)
    img = arr.reshape(abs(h), row_size)[:, : w * 3].reshape(abs(h), w, 3)[:, :, ::-1]
    if h > 0:
        img = img[::-1]
    return np.ascontiguousarray(img)


def encode_png(img: np.ndarray) -> bytes:
    """HxWx3 uint8 RGB -> PNG bytes (8-bit truecolor, filter 0 rows,
    zlib via the stdlib — no external imaging library)."""
    import zlib

    h, w = img.shape[:2]

    def chunk(tag: bytes, data: bytes) -> bytes:
        return (struct.pack(">I", len(data)) + tag + data
                + struct.pack(">I", zlib.crc32(tag + data) & 0xFFFFFFFF))

    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)  # 8-bit RGB
    raw = b"".join(b"\x00" + img[r].tobytes() for r in range(h))
    return (b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr)
            + chunk(b"IDAT", zlib.compress(raw)) + chunk(b"IEND", b""))


def decode_png(payload: bytes) -> np.ndarray:
    """PNG bytes -> HxWx3 uint8 RGB. Supports 8-bit truecolor (type 2),
    truecolor+alpha (6, alpha dropped), and grayscale (0), non-interlaced
    — the common cases decodable with stdlib zlib alone. All five scanline
    filters are un-applied: None/Sub/Up vectorized (Sub is a per-channel
    cumsum mod 256), Average/Paeth per-pixel (rare in practice; our
    encoder always writes filter 0)."""
    import zlib

    if payload[:8] != b"\x89PNG\r\n\x1a\n":
        raise ValueError("not a PNG payload")
    pos, w = 8, 0
    idat, ihdr = [], None
    while pos < len(payload):
        (length,) = struct.unpack_from(">I", payload, pos)
        tag = payload[pos + 4: pos + 8]
        data = payload[pos + 8: pos + 8 + length]
        pos += 12 + length
        if tag == b"IHDR":
            ihdr = struct.unpack(">IIBBBBB", data)
        elif tag == b"IDAT":
            idat.append(data)
        elif tag == b"IEND":
            break
    if ihdr is None:
        raise ValueError("PNG missing IHDR")
    w, h, depth, ctype, _comp, _filt, interlace = ihdr
    if depth != 8 or interlace != 0 or ctype not in (0, 2, 6):
        raise NotImplementedError(
            f"PNG depth={depth} color_type={ctype} interlace={interlace} "
            "not supported (8-bit gray/RGB/RGBA, non-interlaced only)")
    ch = {0: 1, 2: 3, 6: 4}[ctype]
    raw = np.frombuffer(zlib.decompress(b"".join(idat)), dtype=np.uint8)
    stride = w * ch
    raw = raw.reshape(h, stride + 1)
    filters, rows = raw[:, 0], raw[:, 1:].astype(np.int16)
    recon = np.zeros((h, stride), dtype=np.uint8)
    for r in range(h):
        f, line = int(filters[r]), rows[r]
        prev = recon[r - 1].astype(np.int16) if r else np.zeros(stride, np.int16)
        if f == 0:
            out = line
        elif f == 1:  # Sub: per-channel running sum mod 256
            out = line.reshape(-1, ch).copy()
            np.cumsum(out, axis=0, out=out)
            out = (out % 256).reshape(-1)
        elif f == 2:  # Up
            out = line + prev
        else:  # Average (3) / Paeth (4): sequential in x
            out = np.zeros(stride, dtype=np.int16)
            for x in range(stride):
                # predictors read RECONSTRUCTED bytes (mod 256 applied)
                a = int(out[x - ch]) if x >= ch else 0
                b = int(prev[x])
                if f == 3:
                    out[x] = (int(line[x]) + ((a + b) >> 1)) % 256
                else:
                    c = int(prev[x - ch]) if x >= ch else 0
                    p = a + b - c
                    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                    pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                    out[x] = (int(line[x]) + pred) % 256
        recon[r] = (out % 256).astype(np.uint8)
    img = recon.reshape(h, w, ch)
    if ch == 1:
        img = np.repeat(img, 3, axis=2)
    elif ch == 4:
        img = img[:, :, :3]
    return np.ascontiguousarray(img)


def resize_nearest(img: np.ndarray, out_h: int, out_w: int) -> np.ndarray:
    """Nearest-neighbor resize (the Spark-side contract is fixed-shape
    features; NN keeps it dependency-free and deterministic)."""
    h, w = img.shape[:2]
    ri = (np.arange(out_h) * h // out_h).clip(0, h - 1)
    ci = (np.arange(out_w) * w // out_w).clip(0, w - 1)
    return img[ri][:, ci]


def _check_dim(dim: int) -> None:
    if dim < 4:
        raise ValueError(f"feature dim must be >= 4 (got {dim}): the first "
                         "3 slots are summary stats, the rest the histogram/bands")


def audio_features(rate: int, x: np.ndarray, dim: int) -> np.ndarray:
    """Fixed-dim audio descriptor: [duration_s, rms, zero-crossing rate]
    + (dim-3) log-energy FFT bands."""
    _check_dim(dim)
    out = np.zeros(dim, dtype=np.float32)
    if len(x) == 0:
        return out
    out[0] = len(x) / max(rate, 1)
    out[1] = float(np.sqrt(np.mean(x * x)))
    out[2] = float(np.mean(np.abs(np.diff(np.signbit(x).astype(np.int8)))))
    spec = np.abs(np.fft.rfft(x))
    bands = np.array_split(spec, max(dim - 3, 1))
    out[3:] = [float(np.log1p(b.mean())) if len(b) else 0.0 for b in bands]
    return out


def image_features(img: np.ndarray, dim: int) -> np.ndarray:
    """Fixed-dim image descriptor: [mean R, G, B] + (dim-3)-bin luma
    histogram (mass-normalized)."""
    _check_dim(dim)
    out = np.zeros(dim, dtype=np.float32)
    if img.size == 0:
        return out
    out[:3] = img.reshape(-1, 3).mean(axis=0) / 255.0
    luma = img @ np.array([0.299, 0.587, 0.114])
    hist, _ = np.histogram(luma, bins=max(dim - 3, 1), range=(0, 255))
    out[3:] = hist / max(hist.sum(), 1)
    return out


def decode_features(payload: bytes, dim: int) -> np.ndarray:
    """Magic-byte dispatch: BMP and WAV decode for real; anything else
    raises naming the format (fail fast, never garbage features)."""
    if payload is None or len(payload) < 4:
        return np.zeros(dim, dtype=np.float32)
    if payload[:2] == b"BM":
        return image_features(decode_bmp(payload), dim)
    if payload[:8] == b"\x89PNG\r\n\x1a\n":
        return image_features(decode_png(payload), dim)
    if payload[:4] == b"RIFF" and payload[8:12] == b"WAVE":
        rate, x = decode_wav(payload)
        return audio_features(rate, x, dim)
    raise NotImplementedError(
        f"no decoder for payload magic {payload[:4]!r}: only BMP, PNG and "
        "RIFF/WAV decode with the stdlib; other codecs need external "
        "libraries (register a kernel, or pass fake=True for the "
        "deterministic stand-in)"
    )


# ---------------------------------------------------------------------------
# Spark surface
# ---------------------------------------------------------------------------


def synth_media(spark, n: int = 64, seed: int = 5) -> DataFrame:
    """Deterministic media table with REAL payloads: gradient BMPs and
    sine WAVs (decodable by the real kernels), plus undecodable 'video'
    blobs for the fail-fast/fake paths."""
    rows = []
    kinds = ["image", "audio", "video"]
    for i in range(n):
        kind = kinds[i % 3]
        if kind == "image":
            w, h = 16 + i % 8, 12 + i % 6
            img = np.zeros((h, w, 3), dtype=np.uint8)
            img[:, :, 0] = (np.arange(w) * (i + 3)) % 256
            img[:, :, 1] = (np.arange(h)[:, None] * (i + 7)) % 256
            img[:, :, 2] = (i * 11) % 256
            if i % 2 == 0:
                payload = encode_bmp(img)
                meta = ("image/bmp", w, h, 0)
            else:
                payload = encode_png(img)
                meta = ("image/png", w, h, 0)
        elif kind == "audio":
            t = np.arange(800) / 8000.0
            payload = encode_wav(np.sin(2 * np.pi * (200 + 20 * i) * t), 8000)
            meta = ("audio/wav", 0, 0, 100)
        else:
            payload = hashlib.sha256(f"{seed}:{i}".encode()).digest() * 4
            meta = ("video/fake", 64 + i % 8, 48 + i % 6, 1000 + i)
        rows.append((i, kind, bytearray(payload), meta))
    return spark.createDataFrame(rows, schema=MEDIA_SCHEMA)


def _fake_decode(payload: bytes, dim: int) -> np.ndarray:
    """Deterministic fake 'decode + featurize': hash-seeded projection.
    Stands in for codecs that need external libraries."""
    h = hashlib.sha256(payload or b"").digest()
    rng = np.random.default_rng(int.from_bytes(h[:8], "big"))
    v = rng.standard_normal(dim).astype(np.float32)
    n = float(np.linalg.norm(v))
    return v / n if n else v


def extract_features(
    media: DataFrame,
    dim: int = 64,
    fake: bool = False,
    batch_col: str = "payload",
) -> DataFrame:
    """media -> DataFrame[media_id, kind, feature array<float>].

    Real decode for BMP images and RIFF/WAV audio (stdlib + NumPy);
    ``dim`` must be >= 4 (3 summary slots + histogram/bands);
    other payloads raise NotImplementedError naming the magic bytes.
    ``fake=True`` substitutes the deterministic hash featurizer for
    every payload (plumbing tests / codec-free environments)."""

    _check_dim(dim)

    def kernel(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            if fake:
                feats = [_fake_decode(p, dim) for p in pdf[batch_col]]
            else:
                feats = [decode_features(p, dim) for p in pdf[batch_col]]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "feature": [list(map(float, f)) for f in feats],
                }
            )

    return media.select("media_id", "kind", batch_col).mapInPandas(
        kernel, schema="media_id long, kind string, feature array<float>"
    )


def frame_sample_plan(media: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Video frame-sampling *plan*: expand (media_id, duration) into one
    row per sampled timestamp (the per-frame decode would plug into
    ``extract_features``-style kernels). Pure Catalyst sequence/explode —
    the expansion is the Spark-side work."""
    return (
        media.where(F.col("kind") == "video")
        .select(
            "media_id",
            F.explode(
                F.sequence(
                    F.lit(0),
                    F.coalesce(F.col("meta.duration_ms"), F.lit(0)),
                    F.lit(every_ms),
                )
            ).alias("ts_ms"),
        )
    )
