"""Multimodal column plumbing: opaque binary media + typed metadata.

Decode tiers:
- ``decoder="headers"`` (default): REAL container parsing from file bytes
  with stdlib ``struct`` only — PNG IHDR / GIF screen descriptor / JPEG
  SOFn width+height, WAV fmt/data sample-frame count — plus a real
  byte-histogram feature vector. This is what a user hits first and needs
  no external libraries.
- ``decoder="real"``: the pixel-decode seam — raises NotImplementedError
  naming the integration point (Pillow/opencv are not in this container).
  A production deployment swaps one function (``_decode_image_real``) and
  nothing else moves.
- ``decoder="fake"``: deterministic hash-derived dims/features for
  schema-only tests.
All tiers share the same Spark plumbing — schema, Arrow batch shape,
mapInPandas signature, partitioning.

Scale notes: media bytes dominate row size, so every operator here
projects the binary column as late as possible and returns metadata-only
frames (Catalyst prunes ``media`` out of downstream scans). Feature
extraction emits fixed-length float arrays compatible with
dataops.similarity for media near-dup search.
"""

from __future__ import annotations

import hashlib
from typing import Iterable, Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("url", T.StringType(), True),
        T.StructField("mime", T.StringType(), True),
        T.StructField("media", T.BinaryType(), True),
        T.StructField("meta", T.StructType([
            T.StructField("source", T.StringType(), True),
            T.StructField("bytes", T.LongType(), True),
        ]), True),
    ]
)

DECODED_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("mime", T.StringType(), True),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("n_frames", T.IntegerType(), True),
        T.StructField("features", T.ArrayType(T.FloatType()), True),
        T.StructField("decode_error", T.StringType(), True),
    ]
)


def _decode_image_real(content: bytes):  # pragma: no cover - integration seam
    raise NotImplementedError(
        "real image decode requires Pillow/opencv (not in this container); "
        "plug the decoder in here — the Spark plumbing is decoder-agnostic"
    )


def _decode_headers(content: bytes, feat_dim: int):
    """REAL container-header decode with stdlib ``struct`` only — no
    Pillow/opencv needed: PNG IHDR, GIF logical screen descriptor, JPEG
    SOFn scan (0xC0–0xCF minus DHT/JPG/DAC, fill-byte tolerant, stops at
    SOS), WAV RIFF fmt/data chunks (n_frames = sample frames =
    data_size / block_align). Features are a normalized byte histogram
    (``feat_dim`` bins) — a real, deterministic content feature. Unknown
    or truncated containers raise, isolating into decode_error."""
    import struct

    if not content:
        raise ValueError("empty media payload")
    w = h = None
    nf = 1
    if content[:8] == b"\x89PNG\r\n\x1a\n":
        if len(content) < 24 or content[12:16] != b"IHDR":
            raise ValueError("PNG missing IHDR")
        w, h = struct.unpack(">II", content[16:24])
    elif content[:6] in (b"GIF87a", b"GIF89a"):
        if len(content) < 10:
            raise ValueError("GIF truncated")
        w, h = struct.unpack("<HH", content[6:10])
    elif content[:2] == b"\xff\xd8":
        # Spec-correct marker walk: markers may be preceded by runs of
        # 0xFF fill bytes (skip them before reading the marker code, else
        # seg_len is read from the next marker byte and the walk desyncs);
        # dimension-bearing frames are the full SOFn family 0xC0–0xCF
        # minus DHT/JPG/DAC (0xC4/0xC8/0xCC); stop at SOS (0xDA) — after
        # it comes entropy-coded data, not a marker segment stream.
        i = 2
        while i + 1 < len(content):
            if content[i] != 0xFF:
                raise ValueError("JPEG marker desync")
            while i + 1 < len(content) and content[i + 1] == 0xFF:
                i += 1  # 0xFF fill bytes before the marker code
            if i + 1 >= len(content):
                break
            marker = content[i + 1]
            if 0xD0 <= marker <= 0xD9 or marker == 0x01:
                i += 2  # standalone markers (RSTn/SOI/EOI/TEM): no length
                continue
            if marker == 0xDA:  # SOS — no SOF seen before scan data
                break
            if i + 3 >= len(content):
                break
            if 0xC0 <= marker <= 0xCF and marker not in (0xC4, 0xC8, 0xCC):
                if i + 9 > len(content):
                    raise ValueError("JPEG SOF truncated")
                h, w = struct.unpack(">HH", content[i + 5 : i + 9])
                break
            (seg_len,) = struct.unpack(">H", content[i + 2 : i + 4])
            if seg_len < 2:
                raise ValueError("JPEG bad segment length")
            i += 2 + seg_len
        if w is None:
            raise ValueError("JPEG SOF not found")
    elif content[:4] == b"RIFF" and content[8:12] == b"WAVE":
        i = 12
        block_align = data_size = None
        while i + 8 <= len(content):
            cid = content[i : i + 4]
            (sz,) = struct.unpack("<I", content[i + 4 : i + 8])
            if cid == b"fmt " and i + 22 <= len(content):
                (block_align,) = struct.unpack("<H", content[i + 20 : i + 22])
            elif cid == b"data":
                data_size = sz
            i += 8 + sz + (sz & 1)  # chunks are word-aligned
        if block_align is None or data_size is None:
            raise ValueError("WAV missing fmt/data chunk")
        w = h = 0
        nf = data_size // max(block_align, 1)
    else:
        raise ValueError("unknown container signature")
    hist, _ = np.histogram(
        np.frombuffer(content, dtype=np.uint8), bins=feat_dim, range=(0, 256)
    )
    feats = (hist / max(len(content), 1)).astype(np.float32)
    return int(w), int(h), int(nf), feats


def _decode_fake(content: bytes, feat_dim: int):
    """Deterministic fake decode: dims + features from the content digest."""
    digest = hashlib.sha256(content or b"").digest()
    width = 64 + digest[0] % 192
    height = 64 + digest[1] % 192
    n_frames = 1 + digest[2] % 4
    rs = np.random.RandomState(int.from_bytes(digest[:4], "big"))
    feats = rs.rand(feat_dim).astype(np.float32)
    return width, height, n_frames, feats


def decode_media(
    media_df: DataFrame, decoder: str = "headers", feat_dim: int = 32
) -> DataFrame:
    """media table → decoded metadata + feature vectors (binary pruned).

    One mapInPandas stage; per-item failures isolate into decode_error.
    decoder: "headers" (default — REAL stdlib container parse, see
    _decode_headers), "fake" (hash-derived dims, schema-only testing), or
    "real" (the pixel-decoder integration seam)."""

    def run(batches: Iterable[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = {k: [] for k in (
                "media_id", "mime", "width", "height", "n_frames",
                "features", "decode_error",
            )}
            for mid, mime, content in zip(
                pdf["media_id"], pdf["mime"], pdf["media"]
            ):
                rows["media_id"].append(mid)
                rows["mime"].append(mime)
                try:
                    if decoder == "headers":
                        w, h, nf, feats = _decode_headers(content, feat_dim)
                    elif decoder == "fake":
                        w, h, nf, feats = _decode_fake(content, feat_dim)
                    else:
                        w, h, nf, feats = _decode_image_real(content)
                    rows["width"].append(w)
                    rows["height"].append(h)
                    rows["n_frames"].append(nf)
                    rows["features"].append([float(x) for x in feats])
                    rows["decode_error"].append(None)
                except Exception as exc:
                    rows["width"].append(None)
                    rows["height"].append(None)
                    rows["n_frames"].append(None)
                    rows["features"].append(None)
                    rows["decode_error"].append(f"{type(exc).__name__}: {exc}")
            yield pd.DataFrame(rows)

    return media_df.select("media_id", "mime", "media").mapInPandas(
        run, schema=DECODED_SCHEMA
    )


def frame_sample_plan(decoded_df: DataFrame, every_n: int = 2) -> DataFrame:
    """Frame-sampling plumbing: one row per sampled frame index (explode);
    the actual pixel fetch is the decoder seam's concern."""
    return decoded_df.filter(F.col("decode_error").isNull()).select(
        "media_id",
        "mime",
        F.explode(
            F.sequence(F.lit(0), F.greatest(F.col("n_frames") - 1, F.lit(0)), F.lit(every_n))
        ).alias("frame_idx"),
    )


def synthetic_png(width: int, height: int, rng) -> bytes:
    """A real PNG signature + IHDR chunk (CRC faked) + random tail."""
    import struct

    ihdr = struct.pack(">II", width, height) + b"\x08\x02\x00\x00\x00"
    return (
        b"\x89PNG\r\n\x1a\n"
        + struct.pack(">I", len(ihdr)) + b"IHDR" + ihdr + b"\x00" * 4
        + bytes(rng.getrandbits(8) for _ in range(64))
    )


def synthetic_gif(width: int, height: int, rng) -> bytes:
    import struct

    return (
        b"GIF89a" + struct.pack("<HH", width, height)
        + bytes(rng.getrandbits(8) for _ in range(64))
    )


def synthetic_jpeg(width: int, height: int, rng) -> bytes:
    """SOI + APP0 + SOF0 carrying the dimensions."""
    import struct

    app0 = b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00" + bytes(9)
    sof0 = (
        b"\xff\xc0" + struct.pack(">H", 11) + b"\x08"
        + struct.pack(">HH", height, width) + b"\x01\x11\x00"
    )
    return b"\xff\xd8" + app0 + sof0


def synthetic_wav(n_frames: int, rng, channels: int = 2, bits: int = 16) -> bytes:
    """A real RIFF/WAVE container: fmt chunk + data chunk of n_frames
    sample frames."""
    import struct

    block_align = channels * bits // 8
    data = bytes(rng.getrandbits(8) for _ in range(n_frames * block_align))
    fmt = struct.pack("<HHIIHH", 1, channels, 44100, 44100 * block_align,
                      block_align, bits)
    body = (
        b"WAVE"
        + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"data" + struct.pack("<I", len(data)) + data
    )
    return b"RIFF" + struct.pack("<I", len(body)) + body


def synthetic_media_df(spark, n: int = 64, seed: int = 42) -> DataFrame:
    """Deterministic media table with REAL container bytes (planted
    dimensions/frame counts recoverable by the headers decoder), plus a
    corrupt payload every 16th row so decode_error isolation is exercised."""
    import random

    rng = random.Random(seed)
    rows = []
    for i in range(n):
        kind = i % 4
        w, h = 16 + (i * 7) % 240, 16 + (i * 13) % 240
        if i % 16 == 15:
            payload, mime = bytes(rng.getrandbits(8) for _ in range(96)), "image/png"
        elif kind == 0:
            payload, mime = synthetic_png(w, h, rng), "image/png"
        elif kind == 1:
            payload, mime = synthetic_gif(w, h, rng), "image/gif"
        elif kind == 2:
            payload, mime = synthetic_jpeg(w, h, rng), "image/jpeg"
        else:
            payload, mime = synthetic_wav(100 + i, rng), "audio/wav"
        rows.append(
            (i, f"https://media.example.org/{i}", mime, payload,
             {"source": f"src{i % 7}", "bytes": len(payload)})
        )
    return spark.createDataFrame(rows, MEDIA_SCHEMA)
