"""Hypothesis property tests for the stdlib codec layer: encode ->
decode must be the identity for arbitrary images/streams, not just the
fixtures the unit tests pin."""

from __future__ import annotations

from hypothesis import given, settings, strategies as st

from datapatterns_spark.functions import codecs as cd


@settings(max_examples=30, deadline=None)
@given(
    w=st.integers(1, 21),
    h=st.integers(1, 17),
    c=st.integers(1, 4),
    data=st.data(),
)
def test_png_roundtrip_property(w, h, c, data):
    px = bytes(
        data.draw(
            st.lists(
                st.integers(0, 255), min_size=w * h * c, max_size=w * h * c
            )
        )
    )
    w2, h2, c2, px2 = cd.png_decode(cd.png_encode(px, w, h, c))
    assert (w2, h2, c2) == (w, h, c)
    assert bytes(px2) == px


@settings(max_examples=30, deadline=None)
@given(
    mcs=st.integers(2, 8),
    data=st.data(),
)
def test_lzw_roundtrip_property(mcs, data):
    idx = bytes(
        data.draw(
            st.lists(st.integers(0, (1 << mcs) - 1), min_size=0, max_size=3000)
        )
    )
    assert bytes(cd._lzw_decode(mcs, cd._lzw_encode(mcs, idx))) == idx


@settings(max_examples=20, deadline=None)
@given(
    w=st.integers(1, 14),
    h=st.integers(1, 10),
    nframes=st.integers(1, 4),
    data=st.data(),
)
def test_gif_roundtrip_property(w, h, nframes, data):
    # palette-bounded pixels: draw from at most 8 distinct colors
    palette = [
        bytes(data.draw(st.lists(st.integers(0, 255), min_size=3, max_size=3)))
        for _ in range(8)
    ]
    frames = []
    for _ in range(nframes):
        px = bytearray()
        for _ in range(w * h):
            px += palette[data.draw(st.integers(0, 7))]
        frames.append((data.draw(st.integers(10, 500)), px))
    w2, h2, got = cd.gif_decode(cd.gif_encode(frames, w, h))
    assert (w2, h2, len(got)) == (w, h, nframes)
    for (_, px_in), (_, px_out) in zip(frames, got):
        assert bytes(px_out) == bytes(px_in)


@settings(max_examples=30, deadline=None)
@given(
    w=st.integers(1, 16),
    h=st.integers(1, 12),
    nw=st.integers(1, 16),
    nh=st.integers(1, 12),
    data=st.data(),
)
def test_resize_box_bounds_property(w, h, nw, nh, data):
    c = 3
    px = bytes(
        data.draw(
            st.lists(st.integers(0, 255), min_size=w * h * c, max_size=w * h * c)
        )
    )
    out = cd.resize_box(px, w, h, c, nw, nh)
    assert len(out) == nw * nh * c
    # every output channel value is within the source's [min, max]
    for ch in range(c):
        src = px[ch::c]
        lo, hi = min(src), max(src)
        assert all(lo <= v <= hi for v in out[ch::c])


@settings(max_examples=15, deadline=None)
@given(
    w=st.integers(1, 20),
    h=st.integers(1, 16),
    c=st.sampled_from([1, 3]),
    base=st.integers(0, 255),
    amp=st.integers(0, 60),
    data=st.data(),
)
def test_jpeg_roundtrip_property(w, h, c, base, amp, data):
    """Baseline JPEG is lossy but BOUNDED: for smooth content (a base
    level plus a small random ripple) the decode error stays within
    the quantization envelope; dimensions and channels always
    survive — any width/height, including non-multiples of 8."""
    px = bytes(
        max(0, min(255, base + data.draw(st.integers(-amp, amp))))
        for _ in range(w * h * c)
    )
    w2, h2, c2, out = cd.jpeg_decode(cd.jpeg_encode(px, w, h, c))
    assert (w2, h2, c2) == (w, h, c)
    assert len(out) == len(px)
    errs = [abs(a - b) for a, b in zip(px, out)]
    # per-pixel bound scales with ripple amplitude (high-frequency
    # content quantizes coarser); the mean stays tight
    assert max(errs) <= 3 * amp + 4
    assert sum(errs) / len(errs) <= amp + 3


@settings(max_examples=10, deadline=None)
@given(
    w=st.integers(1, 16),
    h=st.integers(1, 12),
    nframes=st.integers(1, 4),
    frame_ms=st.integers(20, 400),
    base=st.integers(0, 255),
    data=st.data(),
)
def test_avi_roundtrip_property(w, h, nframes, frame_ms, base, data):
    """MJPEG-AVI container round-trip: frame count, dimensions and
    duration survive exactly; each frame decodes within the JPEG
    envelope of its (near-solid) source."""
    frames = []
    for _ in range(nframes):
        lvl = max(0, min(255, base + data.draw(st.integers(-10, 10))))
        frames.append(bytes([lvl] * (w * h * 3)))
    payload = cd.avi_mjpeg_encode(frames, w, h, frame_ms=frame_ms)
    w2, h2, dur, jpegs = cd.avi_mjpeg_decode(payload)
    assert (w2, h2, dur, len(jpegs)) == (w, h, frame_ms, nframes)
    for src, j in zip(frames, jpegs):
        fw, fh, fc, out = cd.jpeg_decode(j)
        assert (fw, fh, fc) == (w, h, 3)
        assert max(abs(a - b) for a, b in zip(src, out)) <= 4
