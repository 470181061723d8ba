"""Stdlib codec layer (functions/codecs.py) + the REAL (non-fake)
multimodal decode path: PNG round-trips, all five PNG scanline
filters, WAV decode, feature extractors, and the Arrow mapInPandas
operators running on real encoded payloads."""

from __future__ import annotations

import io
import math
import struct
import wave
import zlib

import pytest

from datapatterns_spark.functions import codecs as cd


def _gradient(w, h, c):
    px = bytearray(w * h * c)
    for y in range(h):
        for x in range(w):
            for ch in range(c):
                px[(y * w + x) * c + ch] = (x * 7 + y * 13 + ch * 31) % 256
    return px


@pytest.mark.parametrize("channels", [1, 2, 3, 4])
def test_png_roundtrip(channels):
    w, h = 13, 9  # odd sizes: no stride alignment luck
    px = _gradient(w, h, channels)
    data = cd.png_encode(px, w, h, channels)
    w2, h2, c2, px2 = cd.png_decode(data)
    assert (w2, h2, c2) == (w, h, channels)
    assert px2 == px


def _encode_with_filter(px, w, h, c, fbyte):
    """Build a valid PNG whose every scanline uses filter `fbyte` —
    exercises the decoder's un-filtering, which png_encode (filter 0)
    never does."""
    stride, bpp = w * c, c
    raw = bytearray()
    prev = bytes(stride)
    for y in range(h):
        line = px[y * stride : (y + 1) * stride]
        raw.append(fbyte)
        for x in range(stride):
            left = line[x - bpp] if x >= bpp else 0
            up = prev[x]
            ul = prev[x - bpp] if x >= bpp else 0
            if fbyte == 0:
                f = line[x]
            elif fbyte == 1:
                f = line[x] - left
            elif fbyte == 2:
                f = line[x] - up
            elif fbyte == 3:
                f = line[x] - ((left + up) >> 1)
            else:
                f = line[x] - cd._paeth(left, up, ul)
            raw.append(f & 0xFF)
        prev = line

    def chunk(ctype, body):
        return (
            struct.pack(">I", len(body))
            + ctype
            + body
            + struct.pack(">I", zlib.crc32(ctype + body) & 0xFFFFFFFF)
        )

    color_type = {1: 0, 2: 4, 3: 2, 4: 6}[c]
    ihdr = struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 0)
    return (
        cd.PNG_SIG
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(bytes(raw)))
        + chunk(b"IEND", b"")
    )


@pytest.mark.parametrize("fbyte", [0, 1, 2, 3, 4])
def test_png_decode_all_filters(fbyte):
    w, h, c = 11, 7, 3
    px = _gradient(w, h, c)
    data = _encode_with_filter(px, w, h, c, fbyte)
    w2, h2, c2, px2 = cd.png_decode(data)
    assert (w2, h2, c2) == (w, h, c)
    assert px2 == px


def test_png_rejects_unsupported():
    with pytest.raises(ValueError):
        cd.png_decode(b"not a png at all")
    # palette image header (color type 3)
    ihdr = struct.pack(">IIBBBBB", 4, 4, 8, 3, 0, 0, 0)

    def chunk(ctype, body):
        return (
            struct.pack(">I", len(body))
            + ctype
            + body
            + struct.pack(">I", zlib.crc32(ctype + body) & 0xFFFFFFFF)
        )

    with pytest.raises(NotImplementedError):
        cd.png_decode(cd.PNG_SIG + chunk(b"IHDR", ihdr) + chunk(b"IEND", b""))


def test_resize_box_constant_and_dims():
    w, h, c = 16, 12, 3
    px = bytearray([100, 150, 200] * (w * h))
    out = cd.resize_box(px, w, h, c, 4, 3)
    assert len(out) == 4 * 3 * c
    assert set(out[0::3]) == {100} and set(out[1::3]) == {150}
    assert set(out[2::3]) == {200}  # box average of a constant is itself


def _wav_bytes(freq=440.0, rate=8000, nsamp=400, amp=20000):
    buf = io.BytesIO()
    with wave.open(buf, "wb") as wv:
        wv.setnchannels(1)
        wv.setsampwidth(2)
        wv.setframerate(rate)
        wv.writeframes(
            b"".join(
                int(amp * math.sin(2 * math.pi * freq * t / rate)).to_bytes(
                    2, "little", signed=True
                )
                for t in range(nsamp)
            )
        )
    return buf.getvalue()


def test_wav_decode_and_features():
    data = _wav_bytes()
    nch, rate, samples = cd.wav_decode(data)
    assert (nch, rate, len(samples)) == (1, 8000, 400)
    assert max(abs(s) for s in samples) <= 1.0
    feats = cd.audio_features(data, bins=16)
    assert len(feats) == 16
    # a steady sine's RMS is ~amp/sqrt(2) in every bin
    expected = (20000 / 32768.0) / math.sqrt(2)
    assert all(abs(f - expected) < 0.05 for f in feats)


def test_image_features_grid():
    # left half black, right half white -> grid columns 0,1 dark and
    # 2,3 bright
    w, h, c = 16, 16, 3
    px = bytearray(w * h * c)
    for y in range(h):
        for x in range(w // 2, w):
            o = (y * w + x) * c
            px[o : o + 3] = b"\xff\xff\xff"
    feats = cd.image_features(cd.png_encode(px, w, h, c), grid=4)
    assert len(feats) == 16
    for row in range(4):
        assert feats[4 * row] == 0.0 and feats[4 * row + 1] == 0.0
        assert feats[4 * row + 2] == 1.0 and feats[4 * row + 3] == 1.0


def test_gif_roundtrip():
    """Animated-GIF encode -> decode reproduces every frame's pixels
    and delays (LZW, palette, canvas composition)."""
    w, h = 11, 7
    frames = []
    for f in range(3):
        px = bytearray(b"\x20\x40\x60" * (w * h))
        for y in range(h):
            o = (y * w + (f * 3) % w) * 3
            px[o : o + 3] = b"\xff\x00\x80"
        frames.append((150 + 10 * f, px))
    data = cd.gif_encode(frames, w, h)
    w2, h2, got = cd.gif_decode(data)
    assert (w2, h2, len(got)) == (w, h, 3)
    for (d_in, px_in), (d_out, px_out) in zip(frames, got):
        assert d_out == (d_in // 10) * 10  # delay stored in 1/100 s
        assert bytes(px_out) == bytes(px_in)


def test_gif_lzw_long_stream():
    """LZW survives a table-filling stream (forces code-width growth
    and a mid-stream clear)."""
    import random

    rng = random.Random(5)
    idx = bytes(rng.randrange(64) for _ in range(20000))
    assert bytes(cd._lzw_decode(6, cd._lzw_encode(6, idx))) == idx


def test_gif_rejects_garbage():
    with pytest.raises(ValueError):
        cd.gif_decode(b"definitely not a gif")


def test_extract_features_real_path(spark):
    """The non-fake mapInPandas path decodes real PNG, JPEG, GIF, and
    WAV payloads and matches the pure-Python codec output exactly."""
    from datapatterns_spark.operators.multimodal import (
        extract_features,
        make_real_media_table,
    )

    media = make_real_media_table(spark, n=12)
    out = {r["media_id"]: r for r in extract_features(media).collect()}
    assert len(out) == 12
    local = {r["media_id"]: bytes(r["media"]) for r in media.collect()}
    kinds = set()
    for mid, payload in local.items():
        if payload.startswith(cd.PNG_SIG):
            want = cd.image_features(payload)
            kinds.add("png")
        elif payload.startswith(cd.JPEG_SIG):
            want = cd.jpeg_features(payload)
            kinds.add("jpeg")
        elif payload[:6] in cd.GIF_SIGS:
            want = cd.gif_features(payload)
            kinds.add("gif")
        elif payload[:4] == b"RIFF" and payload[8:12] == b"AVI ":
            want = cd.avi_features(payload)
            kinds.add("avi")
        else:
            want = cd.audio_features(payload)
            kinds.add("wav")
        got = out[mid]["features"]
        assert len(got) == 16
        assert all(abs(a - b) < 1e-6 for a, b in zip(got, want))
        assert out[mid]["n_bytes"] == len(payload)
    # all five real decode paths ran
    assert kinds == {"png", "jpeg", "gif", "avi", "wav"}


def test_sample_frames_real_path(spark):
    """Non-fake frame sampling decodes BOTH video containers (animated
    GIF and MJPEG AVI) and emits the frame active at each sampled
    instant, PNG-encoded."""
    from datapatterns_spark.operators.multimodal import (
        make_real_media_table,
        sample_frames,
    )

    media = make_real_media_table(spark, n=12).filter(
        "meta.media_type = 'video'"
    )
    out = sample_frames(media, every_ms=300).collect()
    by_media = {}
    for r in out:
        by_media.setdefault(r["media_id"], []).append(r)
    src = {r["media_id"]: bytes(r["media"]) for r in media.collect()}
    assert set(by_media) == set(src)
    containers = set()
    for mid, rows in by_media.items():
        rows.sort(key=lambda r: r["frame_ms"])
        # 4 frames x 250ms = 1000ms timeline, sampled at 0/300/600/900
        assert [r["frame_ms"] for r in rows] == [0, 300, 600, 900]
        payload = src[mid]
        if payload[:6] in cd.GIF_SIGS:
            containers.add("gif")
            w, h, frames = cd.gif_decode(payload)
            want = [bytes(frames[fi][1]) for fi in (0, 1, 2, 3)]
        else:
            containers.add("avi")
            w, h, frame_ms, jpegs = cd.avi_mjpeg_decode(payload)
            assert frame_ms == 250
            want = []
            for ts in (0, 300, 600, 900):
                fi = min(ts // frame_ms, len(jpegs) - 1)
                _, _, _, px = cd.jpeg_decode(jpegs[fi])
                want.append(bytes(px))
        for r, w_px in zip(rows, want):
            fw, fh, fc, px = cd.png_decode(bytes(r["frame"]))
            assert (fw, fh, fc) == (w, h, 3)
            assert bytes(px) == w_px
    assert containers == {"gif", "avi"}  # both video containers ran


def test_resize_media_real_path(spark):
    """Non-fake resize really decodes, box-resamples, and re-encodes
    in the SOURCE container (PNG->PNG, JPEG->JPEG): output payloads
    are byte-identical to a local codec replay."""
    from datapatterns_spark.operators.multimodal import (
        make_real_media_table,
        resize_media,
    )

    media = make_real_media_table(spark, n=12).filter(
        "meta.media_type = 'image'"
    )
    out = resize_media(media, width=6, height=4).collect()
    assert len(out) == media.count()
    src = {r["media_id"]: bytes(r["media"]) for r in media.collect()}
    formats = set()
    for r in out:
        assert (r["width"], r["height"]) == (6, 4)
        payload = src[r["media_id"]]
        if payload.startswith(cd.PNG_SIG):
            formats.add("png")
            sw, sh, sc, spx = cd.png_decode(payload)
            want = cd.png_encode(cd.resize_box(spx, sw, sh, sc, 6, 4), 6, 4, sc)
        else:
            formats.add("jpeg")
            sw, sh, sc, spx = cd.jpeg_decode(payload)
            want = cd.jpeg_encode(
                bytes(cd.resize_box(spx, sw, sh, sc, 6, 4)), 6, 4, sc
            )
        assert bytes(r["media"]) == want
    assert formats == {"png", "jpeg"}  # both containers exercised


def test_sample_frames_real_wav_slices(spark):
    """Non-fake frame sampling over WAV payloads emits standalone WAV
    windows that concatenate back to the original sample stream."""
    from pyspark.sql import types as T

    from datapatterns_spark.operators.multimodal import sample_frames

    data = _wav_bytes(freq=330.0, rate=8000, nsamp=2000)  # 250ms
    schema = T.StructType(
        [
            T.StructField("media_id", T.LongType()),
            T.StructField("media", T.BinaryType()),
        ]
    )
    df = spark.createDataFrame([(7, data)], schema)
    rows = sorted(
        sample_frames(df, every_ms=100).collect(),
        key=lambda r: r["frame_ms"],
    )
    assert [r["frame_ms"] for r in rows] == [0, 100, 200]
    # slices decode and re-concatenate to the original samples
    _, _, orig = cd.wav_decode(data)
    joined = []
    for r in rows:
        _, rate, s = cd.wav_decode(bytes(r["frame"]))
        assert rate == 8000
        joined.extend(s)
    assert joined == orig


def test_extract_features_real_path_rejects_unknown_format(spark):
    from pyspark.sql import types as T
    from pyspark.errors import PythonException

    from datapatterns_spark.operators.multimodal import extract_features

    schema = T.StructType(
        [
            T.StructField("media_id", T.LongType()),
            T.StructField("media", T.BinaryType()),
        ]
    )
    # an MP4-shaped payload: the one format the real path documents out
    # (JPEG is decoded for real since round 3, so it no longer triggers
    # the unsupported-format error)
    df = spark.createDataFrame(
        [(1, b"\x00\x00\x00\x18ftypmp42 not a real box")], schema
    )
    with pytest.raises(PythonException, match="NotImplementedError"):
        extract_features(df).collect()


# ---------------------------------------------------------------------------
# round-3: GCE scoping + truncated-payload error contract
# ---------------------------------------------------------------------------
def _mini_gif(frames_idx, w, h, palette, gce_for=(), tidx=0):
    """Hand-assemble a GIF where only the frames in ``gce_for`` get a
    Graphic Control Extension (transparency on ``tidx``) — gif_encode
    always writes a GCE per frame, so GCE-scoping needs a manual
    fixture."""
    import struct

    data = bytearray(b"GIF89a")
    data += struct.pack("<HH", w, h)
    data += bytes([0x80, 0, 0])  # GCT present, 2 entries; bg=0
    for c in palette:
        data += bytes(c)
    for i, idx in enumerate(frames_idx):
        if i in gce_for:
            # flags: transparency on; delay 10 (1/100s units); tidx
            data += bytes([0x21, 0xF9, 4, 0x01, 10, 0, tidx, 0])
        data += bytes([0x2C]) + struct.pack("<HHHH", 0, 0, w, h) + bytes([0])
        lzw = cd._lzw_encode(2, bytes(idx))
        data += bytes([2])
        for off in range(0, len(lzw), 255):
            blk = lzw[off : off + 255]
            data += bytes([len(blk)]) + blk
        data += bytes([0])
    data += bytes([0x3B])
    return bytes(data)


def test_gif_gce_governs_only_next_image():
    """Per GIF89a a GCE applies ONLY to the image that directly
    follows it: a second frame WITHOUT its own GCE must not inherit
    the first frame's transparency index (previous behavior skipped
    pixels whose palette index equalled the stale tidx)."""
    black, white = (0, 0, 0), (255, 255, 255)
    data = _mini_gif(
        [bytes([1, 0]), bytes([0, 0])],
        w=2, h=1, palette=[black, white], gce_for={0}, tidx=0,
    )
    w, h, frames = cd.gif_decode(data)
    assert (w, h, len(frames)) == (2, 1, 2)
    # frame 1: pixel0 white, pixel1 transparent -> background black
    assert bytes(frames[0][1]) == bytes(white) + bytes(black)
    # frame 2 (no GCE): BOTH pixels drawn black — index 0 is opaque
    # again because the previous GCE's transparency no longer applies
    assert bytes(frames[1][1]) == bytes(black) + bytes(black)
    # and the delay resets to the 100 ms default
    assert frames[0][0] == 100 and frames[1][0] == 100


def test_gif_truncated_raises_valueerror():
    """Truncated GIF payloads must surface the decode-error contract
    (ValueError), never IndexError, at any cut point."""
    frames = [(100, bytearray(b"\x10\x20\x30" * 35))]
    data = cd.gif_encode(frames, 7, 5)
    assert cd.gif_decode(data)[2]  # sanity: full payload decodes
    for cut in (8, 12, 20, len(data) // 2, len(data) - 2):
        with pytest.raises(ValueError):
            cd.gif_decode(data[:cut])


def test_png_truncated_raises_valueerror():
    """Truncated PNG payloads: the chunk walker must not index past
    the buffer or hand zlib a half-chunk."""
    px = bytes(_gradient(6, 4, 3))
    data = cd.png_encode(px, 6, 4, 3)
    assert cd.png_decode(data)[3]  # sanity
    for cut in (16, 30, len(data) - 3):
        with pytest.raises(ValueError):
            cd.png_decode(data[:cut])


# ---------------------------------------------------------------------------
# round-3: baseline JPEG codec
# ---------------------------------------------------------------------------
def test_jpeg_roundtrip_solid_and_gradient():
    """Baseline JPEG encode->decode: DC-dominated content reproduces
    near-exactly; smooth gradients stay within the Annex-K-table
    quantization error envelope."""
    w, h = 16, 16
    solid = bytes([120, 200, 40] * (w * h))
    _, _, c, out = cd.jpeg_decode(cd.jpeg_encode(solid, w, h, 3))
    assert c == 3
    assert max(abs(a - b) for a, b in zip(solid, out)) <= 2

    gw, gh = 24, 16
    grad = bytearray(gw * gh * 3)
    for y in range(gh):
        for x in range(gw):
            o = (y * gw + x) * 3
            grad[o] = x * 255 // (gw - 1)
            grad[o + 1] = y * 255 // (gh - 1)
            grad[o + 2] = 128
    w2, h2, c2, out2 = cd.jpeg_decode(cd.jpeg_encode(bytes(grad), gw, gh, 3))
    assert (w2, h2, c2) == (gw, gh, 3)
    errs = [abs(a - b) for a, b in zip(grad, out2)]
    assert max(errs) <= 12 and sum(errs) / len(errs) < 4


def test_jpeg_odd_dimensions_and_grayscale():
    """Non-multiple-of-8 dimensions (edge-replicated MCU padding) and
    single-component grayscale both round-trip."""
    px = bytes([100] * (13 * 9 * 3))
    w, h, c, out = cd.jpeg_decode(cd.jpeg_encode(px, 13, 9, 3))
    assert (w, h, c) == (13, 9, 3)
    assert max(abs(a - b) for a, b in zip(px, out)) <= 2

    g = bytes((x * 9 + y * 5) % 256 for y in range(16) for x in range(16))
    w, h, c, out = cd.jpeg_decode(cd.jpeg_encode(g, 16, 16, 1))
    assert (w, h, c) == (16, 16, 1)
    errs = [abs(a - b) for a, b in zip(g, out)]
    assert sum(errs) / len(errs) < 8


def test_jpeg_reference_pins():
    """Checked-in byte/pixel pins: the encoder's output bytes AND the
    decoder's pixel dump for fixed fixtures must not drift (both are
    pure functions of the input)."""
    import hashlib

    px = bytes(((x * 31 + y * 17) % 256) for y in range(8) for x in range(8))
    data = cd.jpeg_encode(px, 8, 8, 1)
    assert hashlib.sha256(data).hexdigest() == (
        "89d79a1682ca6624ff8d78c02bec8802c3eb621a15a11ebf427d41866d24b2ec"
    )
    _, _, _, out = cd.jpeg_decode(data)
    assert hashlib.sha256(bytes(out)).hexdigest() == (
        "9ec93bfbff4afeb30e774719171bd53f6b72879b6160296b50becf2c3498b6a0"
    )

    px3 = bytes(
        ((x * 20 + y * 13 + ch * 40) % 256)
        for y in range(10)
        for x in range(12)
        for ch in range(3)
    )
    d3 = cd.jpeg_encode(px3, 12, 10, 3)
    assert hashlib.sha256(d3).hexdigest() == (
        "61e9ea1ab1722df0d9a60ff42dcee05ddddbd191b97055b1c9e05ae0eaf189fc"
    )
    _, _, _, o3 = cd.jpeg_decode(d3)
    assert hashlib.sha256(bytes(o3)).hexdigest() == (
        "724b6336c780a243a95d2acc60f46b0d97a330a0863f9f3ee223f250c7407e8c"
    )


def test_jpeg_error_contracts():
    """Garbage / truncation / unsupported-variant payloads all raise
    the decode-error contract."""
    with pytest.raises(ValueError):
        cd.jpeg_decode(b"definitely not a jpeg")
    data = cd.jpeg_encode(bytes([50, 60, 70] * 256), 16, 16, 3)
    for cut in (6, 40, len(data) // 2):
        with pytest.raises(ValueError):
            cd.jpeg_decode(data[:cut])
    # progressive SOF2 is rejected by name, not misdecoded
    prog = bytearray(data)
    sof = prog.find(b"\xff\xc0")
    prog[sof + 1] = 0xC2
    with pytest.raises(NotImplementedError):
        cd.jpeg_decode(bytes(prog))
    with pytest.raises(NotImplementedError):
        cd.jpeg_encode(bytes(16), 2, 2, 2)  # 2-channel unsupported


def test_avi_mjpeg_roundtrip():
    """MJPEG-AVI encode -> decode: container metadata survives and
    every frame's JPEG decodes to the source pixels within the
    baseline-JPEG error envelope (exact for solid frames)."""
    w, h = 16, 12
    raw = [bytes(bytearray([40 + 60 * f] * (w * h * 3))) for f in range(4)]
    data = cd.avi_mjpeg_encode(raw, w, h, frame_ms=100)
    w2, h2, dur, jpegs = cd.avi_mjpeg_decode(data)
    assert (w2, h2, dur, len(jpegs)) == (w, h, 100, 4)
    for f, j in enumerate(jpegs):
        fw, fh, fc, px = cd.jpeg_decode(j)
        assert (fw, fh, fc) == (w, h, 3)
        assert max(abs(p - (40 + 60 * f)) for p in px) <= 2


def test_avi_error_contracts():
    """Wrong RIFF type / truncation / non-MJPEG codec all raise."""
    w, h = 8, 8
    data = cd.avi_mjpeg_encode([bytes(w * h * 3)], w, h)
    with pytest.raises(ValueError):
        cd.avi_mjpeg_decode(b"RIFF\x04\x00\x00\x00WAVE")
    with pytest.raises(ValueError):
        cd.avi_mjpeg_decode(data[: len(data) // 2])
    hacked = bytearray(data)
    p = hacked.find(b"vidsMJPG")
    hacked[p + 4 : p + 8] = b"H264"
    with pytest.raises(NotImplementedError):
        cd.avi_mjpeg_decode(bytes(hacked))


def test_multimodal_fixture_up_to_date():
    """The checked-in expected-output parquet for the multimodal_real
    oracle must match a fresh derivation from the pure-Python codecs —
    a codec change without `python3 scripts/make_multimodal_fixture.py`
    fails here instead of at the correctness gate."""
    import importlib.util

    import pyarrow.parquet as pq

    spec = importlib.util.spec_from_file_location(
        "make_multimodal_fixture",
        "/root/repo/scripts/make_multimodal_fixture.py",
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    fresh = mod.expected_rows()
    stored = pq.read_table(
        "/root/repo/tests/fixtures/multimodal_real_expected.parquet"
    ).to_pylist()
    assert [
        (r["part"], r["media_id"], r["k"], r["v"]) for r in stored
    ] == fresh
