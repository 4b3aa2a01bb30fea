"""Differential fuzz of the lockstep PNG unfilter
(kgt/textops/png_simd.py) against the serial decoder
(kgt/textops/multimodal.py:decode_png) — the serial path is the
oracle for both pixel bytes and error behavior.

The test encoder below emits ARBITRARY per-row filter schedules
(encode_png only ever emits filter 0), exercising every filter and
mixed schedules across lanes — the exact shape the lockstep kernel's
per-row masks must handle.
"""

import struct
import zlib

import numpy as np
import pytest

import kgt.textops.png_simd as P
from kgt.textops.multimodal import _PNG_SIG, decode_png, encode_png


@pytest.fixture(autouse=True)
def _restore_knobs():
    en, ml, rb = (
        P.LOCKSTEP_ENABLED, P.UNFILTER_MIN_LANES, P.UNFILTER_RAW_BUDGET
    )
    yield
    P.LOCKSTEP_ENABLED, P.UNFILTER_MIN_LANES, P.UNFILTER_RAW_BUDGET = (
        en, ml, rb
    )


def _chunk(tag, data):
    return (
        struct.pack(">I", len(data))
        + tag
        + data
        + struct.pack(">I", zlib.crc32(tag + data) & 0xFFFFFFFF)
    )


_CTYPE = {1: 0, 3: 2, 2: 4, 4: 6}


def make_png(img: np.ndarray, filters) -> bytes:
    """PNG with an explicit per-row filter schedule (delegates to the
    engine encoder's `filters` parameter — one forward-filter
    implementation serves the fuzz AND the bench corpus, so fixtures
    can't drift from the decoder semantics). img is (h, w, ch)."""
    h, w, ch = img.shape
    return encode_png(
        w, h, img.tobytes(), color_type=_CTYPE[ch], filters=filters
    )


def _serial(pay):
    P.LOCKSTEP_ENABLED = False
    try:
        return ("ok", decode_png(pay))
    except Exception as ex:
        return ("err", type(ex).__name__, str(ex))
    finally:
        P.LOCKSTEP_ENABLED = True


SCHEDULES = [
    [0], [1], [2], [3], [4],
    [4, 3], [0, 1, 2, 3, 4], [3, 4, 4, 3], [2, 4],
]


def test_filter_schedule_matrix_differential():
    rng = np.random.default_rng(67)
    P.LOCKSTEP_ENABLED = True
    P.UNFILTER_MIN_LANES = 4
    for w, h in [(1, 1), (3, 5), (17, 13), (32, 32)]:
        for ch in (1, 2, 3, 4):
            pays, refs = [], []
            for sched in SCHEDULES:
                img = rng.integers(0, 256, (h, w, ch), dtype=np.uint8)
                pay = make_png(img, sched)
                ref = _serial(pay)
                assert ref == ("ok", (w, h, ch, img.tobytes())), (
                    "serial round-trip",
                    w, h, ch, sched,
                )
                pays.append(pay)
                refs.append(ref[1])
            out = P.decode_png_batch(pays)
            assert out == refs, (w, h, ch)
            dims = P.decode_png_batch(pays, dims_only=True)
            assert dims == [(w, h, ch, None)] * len(pays)


def test_lockstep_engages_and_small_groups_stay_serial():
    rng = np.random.default_rng(71)
    P.LOCKSTEP_ENABLED = True
    P.UNFILTER_MIN_LANES = 8
    img = lambda: rng.integers(0, 256, (9, 11, 3), dtype=np.uint8)
    wide = [make_png(img(), [4, 3, 1]) for _ in range(12)]
    narrow = [make_png(img()[:5, :7], [4]) for _ in range(3)]
    refs = [_serial(p)[1] for p in wide + narrow]
    before_l = P.STATS["lockstep_lanes"]
    out = P.decode_png_batch(wide + narrow)
    assert out == refs
    assert P.STATS["lockstep_lanes"] == before_l + 12  # narrow: serial


def test_malformed_and_mixed_error_order():
    rng = np.random.default_rng(73)
    img = rng.integers(0, 256, (8, 8, 3), dtype=np.uint8)
    good = make_png(img, [4, 2])
    P.LOCKSTEP_ENABLED = True
    P.UNFILTER_MIN_LANES = 2

    # bad filter byte: rebuild IDAT with filter 7 on row 3
    h, w, ch = img.shape
    raw = bytearray()
    prev = np.zeros((w, ch), np.uint8)
    for r in range(h):
        raw.append(7 if r == 3 else 0)
        raw += img[r].tobytes()
    bad_filter = (
        _PNG_SIG
        + _chunk(b"IHDR", struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0))
        + _chunk(b"IDAT", zlib.compress(bytes(raw)))
        + _chunk(b"IEND", b"")
    )
    cases = {
        "crc": good[:20] + bytes([good[20] ^ 1]) + good[21:],
        "trunc": good[: len(good) - 9],
        "filter7": bad_filter,
        "sig": b"\x89PNX" + good[4:],
    }
    for tag, bad in cases.items():
        ref = _serial(bad)
        assert ref[0] == "err", tag
        out = P.decode_png_batch([good, bad, good], keep_errors=True)
        assert out[0] == out[2] == _serial(good)[1], tag
        assert isinstance(out[1], Exception), tag
        assert (type(out[1]).__name__, str(out[1])) == ref[1:], tag
        with pytest.raises(Exception) as ei:
            P.decode_png_batch([good, bad], dims_only=True)
        assert (type(ei.value).__name__, str(ei.value)) == ref[1:], tag


def test_wiring_media_map_covers_both_formats():
    from kgt.textops.jpeg import encode_jpeg
    from kgt.textops.multimodal import (
        _batch_media_map,
        _decode_one,
        _media_meta_one,
    )

    rng = np.random.default_rng(79)
    img = rng.integers(0, 256, (6, 10, 3), dtype=np.uint8)
    png = make_png(img, [4])
    jpg = encode_jpeg(10, 6, img.tobytes(), quality=85)
    wav = b"RIFF\x00\x00\x00\x00WAVE"
    bad_png = png[: len(png) - 7]
    payloads = [png, jpg, wav, bad_png]
    m = _batch_media_map(payloads)
    assert set(m) == {0, 1, 3}
    assert m[0] == (10, 6, 3, None)
    assert m[1][:2] == (10, 6)
    assert isinstance(m[3], Exception)
    assert _decode_one(png, False, m[0]) == _decode_one(png, False)
    assert _media_meta_one(1, png, m[0]) == _media_meta_one(1, png)
    with pytest.raises(type(m[3])):
        _decode_one(bad_png, False, m[3])
    with pytest.raises(type(m[3])):
        _media_meta_one(4, bad_png, m[3])
    assert _batch_media_map(payloads, fake=True) == {}


def test_degenerate_geometry_matches_serial():
    # w=0 (each row is a lone filter byte; the kernel's Sub reshape
    # can't hold it) routes serial; h=0 runs the zero-row kernel —
    # both must match decode_png exactly
    P.LOCKSTEP_ENABLED = True
    P.UNFILTER_MIN_LANES = 1
    ihdr_w0 = struct.pack(">IIBBBBB", 0, 2, 8, 2, 0, 0, 0)
    pay_w0 = (
        _PNG_SIG
        + _chunk(b"IHDR", ihdr_w0)
        + _chunk(b"IDAT", zlib.compress(bytes([1, 1])))
        + _chunk(b"IEND", b"")
    )
    ihdr_h0 = struct.pack(">IIBBBBB", 3, 0, 8, 2, 0, 0, 0)
    pay_h0 = (
        _PNG_SIG
        + _chunk(b"IHDR", ihdr_h0)
        + _chunk(b"IDAT", zlib.compress(b""))
        + _chunk(b"IEND", b"")
    )
    for pay in (pay_w0, pay_h0):
        ref = _serial(pay)
        assert ref[0] == "ok" and ref[1][3] == b""
        assert P.decode_png_batch([pay] * 40) == [ref[1]] * 40
        assert P.decode_png_batch([pay], dims_only=True) == [
            ref[1][:3] + (None,)
        ]


def test_stats_count_every_serial_route():
    rng = np.random.default_rng(83)
    img = rng.integers(0, 256, (4, 6, 3), dtype=np.uint8)
    good = make_png(img, [4])
    P.LOCKSTEP_ENABLED = True
    P.UNFILTER_MIN_LANES = 8
    before_s, before_l = P.STATS["serial_routed"], P.STATS["lockstep_lanes"]
    # 3 same-geometry (under min -> serial), 1 parse-fail, and the
    # under-min group must still decode without re-parsing (values ==
    # serial decode)
    out = P.decode_png_batch(
        [good, good, good, good[:-4]], keep_errors=True
    )
    assert out[:3] == [_serial(good)[1]] * 3
    assert isinstance(out[3], Exception)
    assert P.STATS["serial_routed"] == before_s + 4
    assert P.STATS["lockstep_lanes"] == before_l


def test_raw_budget_waves_match_serial():
    """Groups bigger than the raw-byte budget unfilter in waves:
    results identical to serial across wave boundaries, including a
    tail wave too narrow for lockstep (routed to the serial unfilter
    on the held stream)."""
    rng = np.random.default_rng(97)
    P.LOCKSTEP_ENABLED = True
    P.UNFILTER_MIN_LANES = 4
    h, w, ch = 6, 5, 3
    pays, refs = [], []
    for _ in range(23):  # 4 waves of 5 + tail wave of 3 (< min -> serial)
        img = rng.integers(0, 256, (h, w, ch), dtype=np.uint8)
        pay = make_png(img, rng.integers(0, 5, size=h).tolist())
        pays.append(pay)
        refs.append(_serial(pay)[1])
    P.UNFILTER_RAW_BUDGET = 5 * h * (w * ch + 1)  # 5 lanes per wave
    before_l, before_s = P.STATS["lockstep_lanes"], P.STATS["serial_routed"]
    assert P.decode_png_batch(pays) == refs
    assert P.STATS["lockstep_lanes"] == before_l + 20
    assert P.STATS["serial_routed"] == before_s + 3


def test_randomized_schedule_differential():
    # 120 images, random geometry from a small pool (so groups form),
    # fully random per-row filter schedules — lockstep == serial
    rng = np.random.default_rng(89)
    P.LOCKSTEP_ENABLED = True
    P.UNFILTER_MIN_LANES = 8
    geoms = [(9, 7, 3), (9, 7, 1), (16, 16, 4), (5, 23, 2)]
    pays, refs = [], []
    for _ in range(120):
        h, w, ch = geoms[rng.integers(0, len(geoms))]
        img = rng.integers(0, 256, (h, w, ch), dtype=np.uint8)
        sched = rng.integers(0, 5, size=h).tolist()
        pay = make_png(img, sched)
        pays.append(pay)
        refs.append((w, h, ch, img.tobytes()))
        assert _serial(pay)[1] == refs[-1]
    assert P.decode_png_batch(pays) == refs
    assert P.decode_png_batch(pays, dims_only=True) == [
        r[:3] + (None,) for r in refs
    ]
