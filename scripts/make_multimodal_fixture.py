#!/usr/bin/env python3
"""Generate the checked-in expected-output fixture for the
``multimodal_real`` correctness entry.

The real decode path (PNG/JPEG/GIF/AVI/WAV stdlib codecs inside Arrow
``mapInPandas`` workers) is not SQL-expressible, so its DuckDB oracle
is a SELECT against this parquet of expected rows.  The rows here are
derived WITHOUT Spark: payloads come from
``multimodal.real_media_rows`` (a pure function of (n, seed)) and the
expected values are computed by direct calls into the pure-Python
codecs — the same codec layer whose Spark-vs-pure parity is pinned by
tests/test_codecs.py, which is what makes this an expected-output
fixture rather than a replay of Spark output.

Row shape (part, media_id, k, v):

* part='features' — one row per media: k = payload byte length,
  v = round(float32(features[0]) * 65535) — the first feature scaled
  to a long exactly like the entry's projection (float32 models the
  Arrow FloatType round-trip; generation asserts every scaled value
  sits far from a .5 rounding boundary, so pure-float64 vs float32
  discrepancies cannot flip a row).
* part='frames' — one row per sampled video frame (every 250 ms):
  k = frame timestamp ms, v = byte length of the PNG-re-encoded
  active frame.

Usage: python3 scripts/make_multimodal_fixture.py  (rewrites
tests/fixtures/multimodal_real_expected.parquet; run after any codec
change and commit the result).
"""

from __future__ import annotations

import os
import struct
import sys
from decimal import ROUND_HALF_UP, Decimal

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pyarrow as pa
import pyarrow.parquet as pq

from datapatterns_spark.functions import codecs as cd
from datapatterns_spark.operators.multimodal import FEATURE_DIM, real_media_rows

N, SEED, EVERY_MS, SCALE = 24, 42, 250, 65535


def f32(x: float) -> float:
    """The Arrow FloatType round-trip the Spark path applies when the
    worker's float64 feature list lands in an array<float> column."""
    return struct.unpack("<f", struct.pack("<f", x))[0]


def round_half_up(x: float) -> int:
    """Spark's ROUND semantics (HALF_UP on the double value)."""
    return int(Decimal(repr(x)).quantize(0, rounding=ROUND_HALF_UP))


def features_for(payload: bytes) -> list[float]:
    b = bytes(payload)
    if b.startswith(cd.PNG_SIG):
        return cd.image_features(b, grid=4)
    if b.startswith(cd.JPEG_SIG):
        return cd.jpeg_features(b, grid=4)
    if b[:6] in cd.GIF_SIGS:
        return cd.gif_features(b, grid=4)
    if b[:4] == b"RIFF" and b[8:12] == b"WAVE":
        return cd.audio_features(b, bins=FEATURE_DIM)
    if b[:4] == b"RIFF" and b[8:12] == b"AVI ":
        return cd.avi_features(b, grid=4)
    raise NotImplementedError("unexpected fixture payload format")


def frame_rows(media_id: int, payload: bytes) -> list[tuple]:
    """Expected (media_id, frame_ms, png_bytes) rows for one video
    payload — the GIF timeline walk / AVI constant-duration sampling,
    re-derived here from the pure codecs."""
    b = bytes(payload)
    out = []
    if b[:4] == b"RIFF" and b[8:12] == b"AVI ":
        vw, vh, frame_ms, jpegs = cd.avi_mjpeg_decode(b)
        total = frame_ms * len(jpegs)
        for ts in range(0, total, EVERY_MS):
            fi = min(ts // frame_ms, len(jpegs) - 1)
            fw, fh, fc, px = cd.jpeg_decode(jpegs[fi])
            out.append((media_id, ts, len(cd.png_encode(px, fw, fh, fc))))
    else:
        w, h, frs = cd.gif_decode(b)
        starts, t = [], 0
        for delay, _ in frs:
            starts.append(t)
            t += delay
        fi = 0
        for ts in range(0, t, EVERY_MS):
            while fi + 1 < len(frs) and starts[fi + 1] <= ts:
                fi += 1
            out.append((media_id, ts, len(cd.png_encode(frs[fi][1], w, h, 3))))
    return out


def expected_rows() -> list[tuple[str, int, int, int]]:
    """The full expected (part, media_id, k, v) row list — exposed so
    tests can assert the checked-in parquet never goes stale vs the
    codecs."""
    parts, ids, ks, vs = [], [], [], []
    for media_id, payload, meta in real_media_rows(N, SEED):
        f0 = f32(features_for(payload)[0])
        scaled = f0 * SCALE
        # rounding-boundary safety: the Spark side computes the same
        # value through a float32 element; if any scaled feature sat
        # near a .5 boundary, float64-vs-float32 noise could flip the
        # long.  Assert a wide margin so the fixture is robust by
        # construction.
        frac = abs(scaled - int(scaled) - 0.5)
        assert frac > 0.05, (media_id, scaled)
        parts.append("features")
        ids.append(media_id)
        ks.append(len(payload))
        vs.append(round_half_up(scaled))
        if meta[0] == "video":
            for mid, ts, nbytes in frame_rows(media_id, payload):
                parts.append("frames")
                ids.append(mid)
                ks.append(ts)
                vs.append(nbytes)
    return list(zip(parts, ids, ks, vs))


def main() -> None:
    rows = expected_rows()
    table = pa.table(
        {
            "part": pa.array([r[0] for r in rows], pa.string()),
            "media_id": pa.array([r[1] for r in rows], pa.int64()),
            "k": pa.array([r[2] for r in rows], pa.int64()),
            "v": pa.array([r[3] for r in rows], pa.int64()),
        }
    )
    dest = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "tests",
        "fixtures",
        "multimodal_real_expected.parquet",
    )
    os.makedirs(os.path.dirname(dest), exist_ok=True)
    pq.write_table(table, dest)
    print(f"wrote {table.num_rows} expected rows -> {dest}")


if __name__ == "__main__":
    main()
