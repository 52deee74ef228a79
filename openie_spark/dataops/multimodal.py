"""Multimodal column plumbing: opaque binary media + typed metadata.

The image/audio decode libraries are not in this container, so the decode
kernels are seams: ``decoder="stub"`` raises NotImplementedError with the
exact integration point named; ``decoder="fake"`` is a deterministic fake
(dimensions/features derived from a content hash) that keeps every piece of
Spark plumbing — schema, Arrow batch shape, mapInPandas signature,
partitioning — real and testable. A production deployment swaps one
function (``_decode_image_real``) and nothing else moves.

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
    media_df: DataFrame, decoder: str = "fake", feat_dim: int = 32
) -> DataFrame:
    """media table → decoded metadata + feature vectors (binary pruned).

    One mapInPandas stage; per-item failures isolate into decode_error.
    """

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
                    if decoder == "fake":
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


def synthetic_media_df(spark, n: int = 64, seed: int = 42) -> DataFrame:
    """Deterministic fake media table for tests/benchmarks."""
    import random

    rng = random.Random(seed)
    rows = []
    for i in range(n):
        payload = bytes(rng.getrandbits(8) for _ in range(128 + rng.randrange(256)))
        mime = rng.choice(["image/jpeg", "image/png", "video/mp4", "audio/wav"])
        rows.append(
            (i, f"https://media.example.org/{i}", mime, payload,
             {"source": f"src{i % 7}", "bytes": len(payload)})
        )
    return spark.createDataFrame(rows, MEDIA_SCHEMA)
