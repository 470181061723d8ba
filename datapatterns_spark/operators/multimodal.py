"""Multimodal (image/audio/video) column plumbing.

Media travel as opaque ``binary`` columns with a typed metadata
struct.  The Spark side — schema, partitioning, Arrow batch shape,
``mapInPandas`` UDF signatures — is real and tested.  The REAL decode
path (``fake=False``, the default) uses the stdlib-only codecs in
:mod:`datapatterns_spark.functions.codecs`: 8-bit PNG (all five
scanline filters), baseline sequential JPEG (DCT/Huffman per ITU-T
T.81), animated GIF and PCM WAV, dispatched on the payload's magic
bytes — features are a 4x4 mean-intensity grid for images and a
16-bin RMS envelope for audio, and :func:`resize_media` really
decodes, box-resamples, and re-encodes (PNG->PNG, JPEG->JPEG).  The
one format needing codec libraries this container lacks (MP4/H.264
video) raises :class:`NotImplementedError` naming what IS supported.
``fake=True`` substitutes a deterministic hash-derived result so SQL
oracles can replay the pipeline exactly.
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

    The default real path dispatches on the payload's magic bytes —
    PNG -> 4x4 mean-intensity grid, WAV -> 16-bin RMS envelope (both
    ``FEATURE_DIM`` floats, stdlib-only codecs); other formats raise.
    ``fake=True`` substitutes deterministic sha256-derived features so
    a SQL oracle can replay the pipeline.
    """
    out_schema = T.StructType(
        [
            T.StructField("media_id", T.LongType()),
            T.StructField("features", T.ArrayType(T.FloatType())),
            T.StructField("n_bytes", T.LongType()),
        ]
    )

    dim = FEATURE_DIM

    # the fake path's closure is stdlib-only; the real path imports the
    # package's codec module on the worker (present under local mode or
    # spark-submit --py-files, the deployment contract)
    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib as _hl

        def fake_feats(payload: bytes) -> list[float]:
            h = _hl.sha256(payload or b"").digest()
            return [
                int.from_bytes(h[2 * i : 2 * i + 2], "big") / 65535.0
                for i in range(dim)
            ]

        if not fake:
            from datapatterns_spark.functions import codecs as _cd

            def real_feats(payload: bytes) -> list[float]:
                b = bytes(payload or b"")
                if b.startswith(_cd.PNG_SIG):
                    return _cd.image_features(b, grid=4)
                if b.startswith(_cd.JPEG_SIG):
                    return _cd.jpeg_features(b, grid=4)
                if b[:6] in _cd.GIF_SIGS:
                    return _cd.gif_features(b, grid=4)
                if b[:4] == b"RIFF" and b[8:12] == b"WAVE":
                    return _cd.audio_features(b, bins=dim)
                if b[:4] == b"RIFF" and b[8:12] == b"AVI ":
                    return _cd.avi_features(b, grid=4)
                raise NotImplementedError(
                    "real decode supports 8-bit PNG, baseline JPEG, GIF, "
                    "MJPEG AVI, and PCM WAV payloads (stdlib codecs); MP4 "
                    "needs codec libraries not in this environment — pass "
                    "fake=True for the stub"
                )

        feats = fake_feats if fake else real_feats
        for pdf in it:
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
    """Frame sampling: one output row per sampled timestamp with the
    frame active at that time.

    The real path decodes animated GIF (the one video-like container
    with a stdlib-implementable codec — see ``functions/codecs.py``):
    frames are composed onto the canvas, the animation timeline is the
    cumulative per-frame delay, and each sampled instant emits the
    active frame re-encoded as PNG.  MP4/H.264 raises (no stdlib
    decoder exists).  ``fake=True`` derives sha256 frames from the
    metadata duration so a SQL oracle can replay the pipeline."""
    out_schema = T.StructType(
        [
            T.StructField("media_id", T.LongType()),
            T.StructField("frame_ms", T.LongType()),
            T.StructField("frame", T.BinaryType()),
        ]
    )

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib as _hl  # fake path: stdlib-only

        if not fake:
            from datapatterns_spark.functions import codecs as _cd

            def real_frames(payload: bytes):
                b = bytes(payload or b"")
                if b[:4] == b"RIFF" and b[8:12] == b"WAVE":
                    # audio "frames": one WAV slice per sampled window
                    return _cd.wav_slices(b, every_ms)
                if b[:4] == b"RIFF" and b[8:12] == b"AVI ":
                    # MJPEG AVI: constant frame duration from the
                    # container header; emit the frame active at each
                    # sampled instant, PNG-re-encoded (same output
                    # convention as the GIF path)
                    vw, vh, frame_ms, jpegs = _cd.avi_mjpeg_decode(b)
                    total = frame_ms * len(jpegs)
                    out = []
                    for ts in range(0, total, every_ms):
                        fi = min(ts // frame_ms, len(jpegs) - 1)
                        fw, fh, fc, px = _cd.jpeg_decode(jpegs[fi])
                        out.append((ts, _cd.png_encode(px, fw, fh, fc)))
                    return out
                if b[:6] not in _cd.GIF_SIGS:
                    raise NotImplementedError(
                        "real frame sampling supports animated GIF, MJPEG "
                        "AVI, and PCM WAV (stdlib codecs); MP4/H.264 need "
                        "codec libraries not in this environment — pass "
                        "fake=True for the stub"
                    )
                w, h, frs = _cd.gif_decode(b)
                # timeline: frame i active on [start_i, start_i+delay_i)
                starts, t = [], 0
                for delay, _ in frs:
                    starts.append(t)
                    t += delay
                total = t
                out = []
                fi = 0
                for ts in range(0, total, every_ms):
                    while fi + 1 < len(frs) and starts[fi + 1] <= ts:
                        fi += 1
                    out.append(
                        (ts, _cd.png_encode(frs[fi][1], w, h, 3))
                    )
                return out

        for pdf in it:
            ids, times, frames = [], [], []
            if fake:
                for mid, payload, dur in zip(
                    pdf[id_col], pdf[media_col], pdf["duration_ms"]
                ):
                    for t in range(0, int(dur or 0), every_ms):
                        ids.append(mid)
                        times.append(t)
                        frames.append(
                            _hl.sha256(
                                (payload or b"") + t.to_bytes(8, "big")
                            ).digest()
                        )
            else:
                for mid, payload in zip(pdf[id_col], pdf[media_col]):
                    for t, fr in real_frames(payload):
                        ids.append(mid)
                        times.append(t)
                        frames.append(fr)
            yield pd.DataFrame({"media_id": ids, "frame_ms": times, "frame": frames})

    # the metadata duration is only the FAKE path's input; the real
    # path derives the timeline from the payload itself, so media-only
    # frames need no meta column
    if fake:
        slim = df.select(
            id_col, media_col, F.col("meta.duration_ms").alias("duration_ms")
        )
    else:
        slim = df.select(id_col, media_col)
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
    with the re-encoded payload and updated dimensions.  The real path
    decodes 8-bit PNG, box-resamples to (width, height), and
    re-encodes PNG (stdlib codecs; other formats raise).  ``fake=True``
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
        import hashlib as _hl  # fake path: stdlib-only

        if fake:
            def resize(b: bytes) -> bytes:
                return (
                    _hl.sha256((b or b"") + f"{w}x{h}".encode())
                    .hexdigest()
                    .encode()
                )
        else:
            from datapatterns_spark.functions import codecs as _cd

            def resize(b: bytes) -> bytes:
                b = bytes(b or b"")
                if b.startswith(_cd.PNG_SIG):
                    sw, sh, c, px = _cd.png_decode(b)
                    return _cd.png_encode(
                        _cd.resize_box(px, sw, sh, c, w, h), w, h, c
                    )
                if b.startswith(_cd.JPEG_SIG):
                    # keep the source container: JPEG in -> JPEG out
                    sw, sh, c, px = _cd.jpeg_decode(b)
                    return _cd.jpeg_encode(
                        bytes(_cd.resize_box(px, sw, sh, c, w, h)), w, h, c
                    )
                raise NotImplementedError(
                    "real resize supports 8-bit PNG and baseline JPEG "
                    "payloads (stdlib codecs); pass fake=True for the stub"
                )

        for pdf in it:
            yield pd.DataFrame(
                {
                    "media_id": pdf[id_col],
                    "media": [resize(b) for b in pdf[media_col]],
                    "width": w,
                    "height": h,
                }
            )

    slim = df.select(id_col, media_col)
    return slim.mapInPandas(batches, out_schema)


def real_media_rows(n: int = 24, seed: int = 42) -> list[tuple]:
    """The driver-side row list behind :func:`make_real_media_table` —
    a pure function of (n, seed) with no Spark dependency, so the
    expected-output fixture generator
    (scripts/make_multimodal_fixture.py) can rebuild the identical
    payloads outside any Spark session."""
    import io as _io
    import math as _math
    import wave as _wave

    from datapatterns_spark.functions import codecs as _cd

    rows = []
    for i in range(n):
        if i % 4 == 2:  # video rows: GIF and MJPEG-AVI alternating
            w, h, nf = 16, 12, 4
            if (i // 4) % 2:  # MJPEG AVI: brightness ramp frames
                raw = [
                    bytes(bytearray([(30 + 50 * f + seed + i) % 200] * (w * h * 3)))
                    for f in range(nf)
                ]
                payload = _cd.avi_mjpeg_encode(raw, w, h, frame_ms=250)
                meta = ("video", "avi", w, h, nf * 250)
            else:  # animated GIF: a bar sweeping across
                frames = []
                for f in range(nf):
                    px = bytearray(b"\x10\x10\x10" * (w * h))
                    bar = (f * w // nf + seed + i) % w
                    for y in range(h):
                        o = (y * w + bar) * 3
                        px[o : o + 3] = b"\xff\xc8\x00"
                    frames.append((250, px))
                payload = _cd.gif_encode(frames, w, h)
                meta = ("video", "gif", w, h, nf * 250)
        elif i % 4 == 1:  # PNG image rows
            w, h = 24, 16
            px = bytearray(w * h * 3)
            for y in range(h):
                for x in range(w):
                    o = (y * w + x) * 3
                    px[o] = (x * 255 // (w - 1) + seed + i) % 256
                    px[o + 1] = (y * 255 // (h - 1) + 2 * i) % 256
                    px[o + 2] = 255 if (x // 4 + y // 4 + i) % 2 else 0
            payload = _cd.png_encode(px, w, h, 3)
            meta = ("image", "png", w, h, 0)
        elif i % 4 == 3:  # baseline-JPEG image rows: smooth gradients
            w, h = 24, 16
            px = bytearray(w * h * 3)
            for y in range(h):
                for x in range(w):
                    o = (y * w + x) * 3
                    px[o] = (x * 200 // (w - 1) + seed + i) % 256
                    px[o + 1] = (y * 200 // (h - 1) + 3 * i) % 256
                    px[o + 2] = ((x + y) * 100 // (w + h - 2) + i) % 256
            payload = _cd.jpeg_encode(bytes(px), w, h, 3)
            meta = ("image", "jpeg", w, h, 0)
        else:  # audio rows: 0.05s of a seeded sine at 8kHz, PCM-16
            rate, dur_ms = 8000, 50
            freq = 200.0 + 37.0 * ((seed + i) % 11)
            nsamp = rate * dur_ms // 1000
            buf = _io.BytesIO()
            with _wave.open(buf, "wb") as wv:
                wv.setnchannels(1)
                wv.setsampwidth(2)
                wv.setframerate(rate)
                wv.writeframes(
                    b"".join(
                        int(
                            20000 * _math.sin(2 * _math.pi * freq * t / rate)
                        ).to_bytes(2, "little", signed=True)
                        for t in range(nsamp)
                    )
                )
            payload = buf.getvalue()
            meta = ("audio", "wav", 0, 0, dur_ms)
        rows.append((i, payload, meta))
    return rows


def make_real_media_table(spark, n: int = 24, seed: int = 42) -> DataFrame:
    """Deterministic media table whose payloads are REAL encoded
    formats — 8-bit RGB PNGs (seeded gradient+checker patterns),
    baseline JPEGs (seeded smooth gradients), animated GIFs
    (moving-bar frames), MJPEG AVIs, and PCM-16 WAV tones — so the
    non-fake decode path can run end-to-end with no external fixtures.
    Pure function of (n, seed)."""
    schema = T.StructType(
        [
            T.StructField("media_id", T.LongType()),
            T.StructField("media", T.BinaryType()),
            T.StructField("meta", MEDIA_META_SCHEMA),
        ]
    )
    return spark.createDataFrame(real_media_rows(n, seed), schema)


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
