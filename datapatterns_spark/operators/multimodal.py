"""Multimodal (image/audio/video) column plumbing.

Media travel as opaque ``binary`` columns with a typed metadata
struct.  The Spark side — schema, partitioning, Arrow batch shape,
``mapInPandas`` UDF signatures — is real and tested; the actual codec
work is stubbed (no image/audio libraries in this container): decode
raises :class:`NotImplementedError` unless ``fake=True``, which
substitutes a deterministic hash-derived feature vector so pipelines
remain end-to-end testable.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_META_SCHEMA = T.StructType(
    [
        T.StructField("media_type", T.StringType()),  # image|audio|video
        T.StructField("format", T.StringType()),  # png|jpeg|wav|mp4|...
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("duration_ms", T.LongType()),
    ]
)

FEATURE_DIM = 16


def _fake_features(payload: bytes) -> list[float]:
    """Deterministic stand-in for a real decoder+encoder: FEATURE_DIM
    floats derived from a sha256 of the bytes."""
    h = hashlib.sha256(payload or b"").digest()
    return [int.from_bytes(h[2 * i : 2 * i + 2], "big") / 65535.0 for i in range(FEATURE_DIM)]


def extract_features(
    df: DataFrame,
    media_col: str = "media",
    id_col: str = "media_id",
    fake: bool = False,
    batch_size_rows: int = 1024,
) -> DataFrame:
    """Decode + feature-extract each media payload via ``mapInPandas``
    (Arrow-batched; the scale-correct shape for binary columns: bytes
    never pass through Python row-at-a-time).

    Real decode is stubbed; ``fake=True`` produces deterministic
    features so downstream similarity/dedup plumbing can be tested.
    """
    out_schema = T.StructType(
        [
            T.StructField("media_id", T.LongType()),
            T.StructField("features", T.ArrayType(T.FloatType())),
            T.StructField("n_bytes", T.LongType()),
        ]
    )

    dim = FEATURE_DIM

    # self-contained closure: everything it touches is a local or
    # stdlib, so cloudpickle ships it by value and workers need no
    # importable copy of this package
    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib as _hl

        def feats(payload: bytes) -> list[float]:
            h = _hl.sha256(payload or b"").digest()
            return [
                int.from_bytes(h[2 * i : 2 * i + 2], "big") / 65535.0
                for i in range(dim)
            ]

        for pdf in it:
            if not fake:
                raise NotImplementedError(
                    "media decoding requires codec libraries not present in "
                    "this environment; pass fake=True for the deterministic stub"
                )
            yield pd.DataFrame(
                {
                    "media_id": pdf[id_col],
                    "features": [feats(b) for b in pdf[media_col]],
                    "n_bytes": [len(b or b"") for b in pdf[media_col]],
                }
            )

    slim = df.select(id_col, media_col)
    return slim.mapInPandas(batches, out_schema)


def sample_frames(
    df: DataFrame,
    media_col: str = "media",
    id_col: str = "media_id",
    every_ms: int = 1000,
    fake: bool = False,
) -> DataFrame:
    """Frame-sampling plumbing for video payloads: one output row per
    sampled frame with a frame timestamp.  Decode stubbed as above;
    the fake path derives frame count from the metadata duration."""
    out_schema = T.StructType(
        [
            T.StructField("media_id", T.LongType()),
            T.StructField("frame_ms", T.LongType()),
            T.StructField("frame", T.BinaryType()),
        ]
    )

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib as _hl  # self-contained: see extract_features

        for pdf in it:
            if not fake:
                raise NotImplementedError(
                    "video decoding requires codec libraries not present in "
                    "this environment; pass fake=True for the deterministic stub"
                )
            ids, times, frames = [], [], []
            for mid, payload, dur in zip(
                pdf[id_col], pdf[media_col], pdf["duration_ms"]
            ):
                for t in range(0, int(dur or 0), every_ms):
                    ids.append(mid)
                    times.append(t)
                    frames.append(
                        _hl.sha256((payload or b"") + t.to_bytes(8, "big")).digest()
                    )
            yield pd.DataFrame({"media_id": ids, "frame_ms": times, "frame": frames})

    slim = df.select(id_col, media_col, F.col("meta.duration_ms").alias("duration_ms"))
    return slim.mapInPandas(batches, out_schema)


def resize_media(
    df: DataFrame,
    media_col: str = "media",
    id_col: str = "media_id",
    width: int = 64,
    height: int = 48,
    fake: bool = False,
) -> DataFrame:
    """Resize plumbing for image payloads: one output row per input
    with the re-encoded payload and updated dimensions.  Real decode/
    re-encode is stubbed (no codec libraries here); ``fake=True``
    derives the "resized" payload deterministically as the hex digest
    of (payload + "WxH") — keeping the ASCII-text payload convention of
    :func:`make_fake_media_table` so a SQL oracle reproduces it."""
    out_schema = T.StructType(
        [
            T.StructField("media_id", T.LongType()),
            T.StructField("media", T.BinaryType()),
            T.StructField("width", T.IntegerType()),
            T.StructField("height", T.IntegerType()),
        ]
    )
    w, h = int(width), int(height)

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib as _hl  # self-contained: see extract_features

        for pdf in it:
            if not fake:
                raise NotImplementedError(
                    "image resizing requires codec libraries not present in "
                    "this environment; pass fake=True for the deterministic stub"
                )
            yield pd.DataFrame(
                {
                    "media_id": pdf[id_col],
                    "media": [
                        _hl.sha256((b or b"") + f"{w}x{h}".encode())
                        .hexdigest()
                        .encode()
                        for b in pdf[media_col]
                    ],
                    "width": w,
                    "height": h,
                }
            )

    slim = df.select(id_col, media_col)
    return slim.mapInPandas(batches, out_schema)


def make_fake_media_table(spark, n: int = 100, seed: int = 42) -> DataFrame:
    """Deterministic synthetic media table for tests: binary payloads
    + typed metadata."""
    rows = []
    for i in range(n):
        # hex-digest bytes (ASCII) rather than raw digest bytes: the
        # payload stays an opaque binary column to Spark, but a SQL
        # oracle can reproduce it exactly (DuckDB's sha256 only takes
        # VARCHAR, so the bytes must be valid text)
        payload = (hashlib.sha256(f"{seed}:{i}".encode()).hexdigest() * 8).encode()
        rows.append(
            (
                i,
                payload,
                ("image" if i % 3 else "video", "png" if i % 3 else "mp4",
                 64, 64, 0 if i % 3 else 5000),
            )
        )
    schema = T.StructType(
        [
            T.StructField("media_id", T.LongType()),
            T.StructField("media", T.BinaryType()),
            T.StructField("meta", MEDIA_META_SCHEMA),
        ]
    )
    return spark.createDataFrame(rows, schema)
