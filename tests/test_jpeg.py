"""From-scratch baseline JPEG codec tests — the compressed third of
the multimodal codec family (test_png.py / test_wav.py / test_y4m.py).

Strategy: there is no libjpeg in this environment, so correctness is
pinned four independent ways: (1) solid-color images decode to the
arithmetic closed form (the oracle contract), (2) the decoder's IDCT
agrees with a straight-line scipy-free reference DCT implemented here
from the T.81 definition, via a hand-built single-block stream, (3)
encoder→decoder round-trips stay within quantization error on smooth
images (and byte stuffing occurs naturally at high quality), (4) the
huffman tables are internally consistent and every encodable symbol
has a code.
"""

import math
import struct

import numpy as np
import pytest

from kgt.textops.jpeg import (
    AC_CHROMA_BITS,
    AC_CHROMA_VALS,
    AC_LUMA_BITS,
    AC_LUMA_VALS,
    DC_CHROMA_BITS,
    DC_CHROMA_VALS,
    DC_LUMA_BITS,
    DC_LUMA_VALS,
    ZIGZAG,
    _canonical_codes,
    decode_jpeg,
    encode_jpeg,
    scale_qtable,
    solid_color_roundtrip,
)


def test_zigzag_is_the_spec_walk():
    assert sorted(ZIGZAG) == list(range(64))
    assert ZIGZAG[:10] == [0, 1, 8, 16, 9, 2, 3, 10, 17, 24]
    assert ZIGZAG[-3:] == [55, 62, 63]


def test_huffman_tables_internally_consistent():
    """Canonical code assignment must be prefix-free and cover every
    symbol the encoder can emit (DC categories 0..11; AC (run,size)
    with size 1..10 plus EOB and ZRL)."""
    for bits, vals in [
        (DC_LUMA_BITS, DC_LUMA_VALS),
        (DC_CHROMA_BITS, DC_CHROMA_VALS),
        (AC_LUMA_BITS, AC_LUMA_VALS),
        (AC_CHROMA_BITS, AC_CHROMA_VALS),
    ]:
        codes = _canonical_codes(bits, vals)
        assert len(codes) == len(vals)
        seen = set()
        for _sym, length, code in codes:
            assert code < (1 << length)  # fits its length
            padded = format(code, f"0{length}b")
            for p in seen:
                assert not padded.startswith(p) and not p.startswith(padded)
            seen.add(padded)
    ac_syms = {v for v in AC_LUMA_VALS}
    for run in range(16):
        for size in range(1, 11):
            assert (run << 4) | size in ac_syms
    assert 0x00 in ac_syms and 0xF0 in ac_syms
    assert set(DC_LUMA_VALS) >= set(range(12))


@pytest.mark.parametrize(
    "rgb", [(0, 0, 0), (255, 255, 255), (200, 30, 90), (17, 123, 250)]
)
@pytest.mark.parametrize("subsample", ["444", "420"])
def test_solid_color_closed_form(rgb, subsample):
    """Every pixel of a decoded solid-color JPEG must equal
    solid_color_roundtrip(rgb) exactly — the DC-only fast path the
    multimodal_jpeg_real oracle reproduces in SQL. Dims straddle the
    8/16-pixel MCU boundary to exercise edge padding + crop."""
    for w, h in [(16, 8), (13, 9), (1, 1), (17, 33)]:
        p = encode_jpeg(w, h, bytes(rgb) * (w * h), quality=75, subsample=subsample)
        gw, gh, ch, out = decode_jpeg(p)
        assert (gw, gh, ch) == (w, h, 3)
        arr = np.frombuffer(out, np.uint8).reshape(h, w, 3)
        expect = solid_color_roundtrip(rgb, 75)
        assert set(map(tuple, arr.reshape(-1, 3))) == {expect}


def _reference_idct(S):
    """Straight-line T.81 IDCT definition — independent of the
    codec's matrix/einsum implementation."""
    out = np.zeros((8, 8))
    for x in range(8):
        for y in range(8):
            acc = 0.0
            for u in range(8):
                for v in range(8):
                    cu = 1 / math.sqrt(2) if u == 0 else 1.0
                    cv = 1 / math.sqrt(2) if v == 0 else 1.0
                    acc += (
                        cu * cv / 4.0 * S[u, v]
                        * math.cos((2 * x + 1) * u * math.pi / 16)
                        * math.cos((2 * y + 1) * v * math.pi / 16)
                    )
            out[x, y] = acc
    return out


def test_single_block_stream_matches_reference_idct():
    """Hand-build a one-block grayscale JPEG with known quantized
    coefficients (flat q=16 table, huffman-coded by the codec's own
    writer), decode it, and pin against the straight-line spec IDCT."""
    from kgt.textops.jpeg import _BitWriter, _enc_codes, _encode_block

    coeffs_nat = np.zeros(64, dtype=np.int32)
    coeffs_nat[0] = 5        # DC
    coeffs_nat[1] = -3       # (0,1)
    coeffs_nat[8] = 2        # (1,0)
    coeffs_nat[27] = 7       # mid-band
    coeffs_nat[63] = -1      # forces a long AC run to the last index
    zz = coeffs_nat[ZIGZAG]

    bw = _BitWriter()
    _encode_block(
        bw, zz, 0,
        _enc_codes(DC_LUMA_BITS, DC_LUMA_VALS),
        _enc_codes(AC_LUMA_BITS, AC_LUMA_VALS),
    )
    entropy = bw.flush()

    q = 16
    dqt = bytes([0]) + bytes([q] * 64)
    sof = struct.pack(">BHHB", 8, 8, 8, 1) + bytes([1, 0x11, 0])
    dht_dc = bytes([0x00]) + bytes(DC_LUMA_BITS) + bytes(DC_LUMA_VALS)
    dht_ac = bytes([0x10]) + bytes(AC_LUMA_BITS) + bytes(AC_LUMA_VALS)
    sos = bytes([1, 1, 0x00, 0, 63, 0])

    def seg(marker, body):
        return bytes([0xFF, marker]) + struct.pack(">H", len(body) + 2) + body

    payload = (
        b"\xff\xd8"
        + seg(0xDB, dqt)
        + seg(0xC0, sof)
        + seg(0xC4, dht_dc)
        + seg(0xC4, dht_ac)
        + seg(0xDA, sos)
        + entropy
        + b"\xff\xd9"
    )
    w, h, ch, out = decode_jpeg(payload)
    assert (w, h, ch) == (8, 8, 1)
    got = np.frombuffer(out, np.uint8).reshape(8, 8).astype(float)

    S = np.zeros((8, 8))
    for i in range(64):
        S[i // 8, i % 8] = coeffs_nat[i] * q
    expect = np.clip(np.floor(_reference_idct(S) + 128.5), 0, 255)
    assert np.array_equal(got, expect)


def test_roundtrip_smooth_within_quantization_error():
    w, h = 40, 24
    xx, yy = np.meshgrid(np.arange(w), np.arange(h))
    img = np.zeros((h, w, 3))
    img[:, :, 0] = 128 + 80 * np.sin(xx / 9.0)
    img[:, :, 1] = 128 + 60 * np.cos(yy / 7.0)
    img[:, :, 2] = 128 + 50 * np.sin((xx + yy) / 11.0)
    px = np.clip(img, 0, 255).astype(np.uint8)
    for q, ss, tol in [(90, "444", 8), (75, "444", 14), (90, "420", 20)]:
        p = encode_jpeg(w, h, px.tobytes(), quality=q, subsample=ss)
        gw, gh, ch, out = decode_jpeg(p)
        assert (gw, gh, ch) == (w, h, 3)
        arr = np.frombuffer(out, np.uint8).reshape(h, w, 3).astype(float)
        assert np.abs(arr - px.astype(float)).max() <= tol, (q, ss)


def test_roundtrip_grayscale():
    w, h = 24, 16
    px = np.clip(
        128 + 90 * np.sin(np.arange(w * h).reshape(h, w) / 13.0), 0, 255
    ).astype(np.uint8)
    p = encode_jpeg(w, h, px.tobytes(), n_channels=1, quality=90)
    gw, gh, ch, out = decode_jpeg(p)
    assert (gw, gh, ch) == (w, h, 1)
    arr = np.frombuffer(out, np.uint8).reshape(h, w).astype(float)
    assert np.abs(arr - px).max() <= 6


def test_roundtrip_noise_exercises_byte_stuffing():
    """Random noise at quality 95 produces dense AC runs and 0xFF
    bytes in the entropy stream (stuffing) — decode must survive and
    the stream must actually contain stuffed bytes."""
    rng = np.random.RandomState(7)
    w, h = 32, 16
    px = rng.randint(0, 256, (h, w, 3)).astype(np.uint8)
    p = encode_jpeg(w, h, px.tobytes(), quality=95)
    scan_at = p.find(b"\xff\xda")
    assert b"\xff\x00" in p[scan_at:], "expected byte stuffing in entropy data"
    gw, gh, ch, _ = decode_jpeg(p)
    assert (gw, gh, ch) == (w, h, 3)


def test_bad_inputs_raise_valueerror():
    with pytest.raises(ValueError, match="SOI"):
        decode_jpeg(b"\x89PNG" + bytes(32))
    p = encode_jpeg(8, 8, bytes(192), quality=75)
    with pytest.raises(ValueError):
        decode_jpeg(p[:40])  # truncated mid-segment
    with pytest.raises(ValueError, match="terminating marker"):
        decode_jpeg(p[:-2])  # EOI cut off


def test_progressive_decodes_identical_to_baseline():
    """SOF2 is supported: the entropy layer is lossless, so spectral-
    selection ('ss') and successive-approximation ('sa') encodings of
    the same image must decode to pixels IDENTICAL to the baseline
    encoding — across all samplings and grayscale. This pins the DC
    first/refinement scans, AC first (EOB/ZRL) and AC refinement
    (correction bits) against the sequential path in one shot."""
    w, h = 40, 24
    xx, yy = np.meshgrid(np.arange(w), np.arange(h))
    img = np.zeros((h, w, 3))
    img[:, :, 0] = 128 + 80 * np.sin(xx / 9.0)
    img[:, :, 1] = 128 + 60 * np.cos(yy / 7.0)
    img[:, :, 2] = 128 + 50 * np.sin((xx + yy) / 11.0)
    px = np.clip(img, 0, 255).astype(np.uint8).tobytes()
    for ss in ["444", "420", "422"]:
        base = decode_jpeg(encode_jpeg(w, h, px, quality=80, subsample=ss))
        for mode in ["ss", "sa"]:
            got = decode_jpeg(
                encode_jpeg(w, h, px, quality=80, subsample=ss, progressive=mode)
            )
            assert got == base, (ss, mode)
    pxg = np.clip(img[:, :, 0], 0, 255).astype(np.uint8).tobytes()
    baseg = decode_jpeg(encode_jpeg(w, h, pxg, n_channels=1, quality=80))
    for mode in ["ss", "sa"]:
        got = decode_jpeg(
            encode_jpeg(w, h, pxg, n_channels=1, quality=80, progressive=mode)
        )
        assert got == baseg, mode


def test_progressive_noise_and_odd_dims():
    """Dense-AC noise (refinement ZRL + correction-bit pressure) and
    dims that are not MCU multiples (the non-interleaved true-block
    grid differs from the padded interleaved grid at 4:2:0)."""
    rng = np.random.RandomState(11)
    for w, h, ss in [(37, 21, "420"), (33, 15, "444"), (18, 26, "422")]:
        px = rng.randint(0, 256, (h, w, 3)).astype(np.uint8).tobytes()
        base = decode_jpeg(encode_jpeg(w, h, px, quality=92, subsample=ss))
        for mode in ["ss", "sa"]:
            got = decode_jpeg(
                encode_jpeg(w, h, px, quality=92, subsample=ss, progressive=mode)
            )
            assert got == base, (w, h, ss, mode)


def test_progressive_solid_color_closed_form():
    """The oracle closed form must hold through the progressive scan
    sequence too (DC-only blocks at every precision level)."""
    rgb = (200, 30, 90)
    for mode in ["ss", "sa"]:
        p = encode_jpeg(16, 16, bytes(rgb) * 256, quality=75, progressive=mode)
        _, _, _, out = decode_jpeg(p)
        arr = np.frombuffer(out, np.uint8).reshape(16, 16, 3)
        assert set(map(tuple, arr.reshape(-1, 3))) == {
            solid_color_roundtrip(rgb, 75)
        }


def test_progressive_sparse_exercises_eob_and_zrl():
    """A mostly-flat image with isolated high-frequency spikes: long
    zero runs (ZRL) and early EOBs in both first and refinement
    passes."""
    w, h = 48, 48
    img = np.full((h, w, 3), 128.0)
    img[5, 7] = (250, 10, 90)
    img[30, 41] = (0, 255, 0)
    px = np.clip(img, 0, 255).astype(np.uint8).tobytes()
    base = decode_jpeg(encode_jpeg(w, h, px, quality=95))
    for mode in ["ss", "sa"]:
        got = decode_jpeg(encode_jpeg(w, h, px, quality=95, progressive=mode))
        assert got == base, mode


def test_dri_zero_interval_is_a_noop():
    """DRI with interval 0 (explicitly 'no restarts') must decode
    exactly like a stream without the segment."""
    p = encode_jpeg(8, 8, bytes(192), quality=75)
    i = p.find(b"\xff\xda")
    dri = b"\xff\xdd" + struct.pack(">HH", 4, 0)
    assert decode_jpeg(p[:i] + dri + p[i:]) == decode_jpeg(p)


def test_quality_scaling_monotone_and_clamped():
    q10 = scale_qtable([16] * 64, 10)
    q50 = scale_qtable([16] * 64, 50)
    q95 = scale_qtable([16] * 64, 95)
    assert q10[0] > q50[0] > q95[0] >= 1
    assert scale_qtable([255] * 64, 1)[0] == 255  # clamped high
    assert scale_qtable([1] * 64, 100)[0] == 1  # clamped low
    with pytest.raises(ValueError):
        scale_qtable([16] * 64, 0)


def test_decode_features_routes_jpeg(spark):
    """multimodal.decode_features(fake=False) must recognize the JPEG
    signature and emit the real decoded dims through the mapInPandas
    plumbing."""
    import pandas as pd

    from kgt.textops.multimodal import decode_features

    w, h = 11, 5
    payload = encode_jpeg(w, h, bytes((10, 20, 30)) * (w * h), quality=75)
    media = spark.createDataFrame(
        pd.DataFrame(
            {"doc_id": [1], "payload": [payload], "media_type": ["image/jpeg"]}
        )
    )
    row = decode_features(media, fake=False).collect()[0]
    assert (row["width"], row["height"]) == (w, h)


def test_restart_interval_roundtrip_identical_to_plain():
    """DRI/RSTn streams: same image encoded with and without restarts
    must decode to IDENTICAL pixels (restarts change framing, not
    values), the stream must actually contain cycling RST markers, and
    DC predictor reset must be exercised across segment boundaries."""
    w, h = 48, 24  # 6x3 = 18 MCUs at 4:4:4
    xx, yy = np.meshgrid(np.arange(w), np.arange(h))
    img = np.zeros((h, w, 3))
    img[:, :, 0] = 100 + 90 * np.sin(xx / 5.0)
    img[:, :, 1] = 120 + 70 * np.cos(yy / 3.0)
    img[:, :, 2] = (xx * 4 + yy * 2) % 256
    px = np.clip(img, 0, 255).astype(np.uint8).tobytes()
    plain = decode_jpeg(encode_jpeg(w, h, px, quality=80))
    p_rst = encode_jpeg(w, h, px, quality=80, restart_interval=2)
    scan_at = p_rst.find(b"\xff\xda")
    # 18 MCUs / interval 2 → 8 RST markers cycling RST0..RST7
    for n in range(8):
        assert bytes([0xFF, 0xD0 + n]) in p_rst[scan_at:]
    assert decode_jpeg(p_rst) == plain
    # 4:2:0 too (MCU = 16x16 → 6 MCUs, 2 RSTs)
    plain420 = decode_jpeg(encode_jpeg(w, h, px, quality=80, subsample="420"))
    p420 = encode_jpeg(w, h, px, quality=80, subsample="420", restart_interval=2)
    assert decode_jpeg(p420) == plain420


def test_restart_marker_sequence_validated():
    w, h = 48, 8
    px = (bytes(range(256)) * (w * h * 3 // 256 + 1))[: w * h * 3]
    p = bytearray(encode_jpeg(w, h, px, quality=80, restart_interval=2))
    i = p.find(b"\xff\xd0")  # first RST0 → corrupt to RST5
    assert i > 0
    p[i + 1] = 0xD5
    with pytest.raises(ValueError, match="out of sequence"):
        decode_jpeg(bytes(p))


def test_rst_without_dri_rejected():
    w, h = 48, 8
    px = bytes(w * h * 3)
    p = encode_jpeg(w, h, px, quality=80, restart_interval=2)
    i = p.find(b"\xff\xdd")  # strip the DRI segment (6 bytes)
    stripped = p[:i] + p[i + 6 :]
    with pytest.raises(ValueError, match="no restart interval"):
        decode_jpeg(stripped)


def test_solid_color_closed_form_with_restarts():
    """The oracle closed form must hold under restart framing too."""
    rgb = (77, 140, 201)
    w, h = 32, 16
    p = encode_jpeg(w, h, bytes(rgb) * (w * h), quality=75, restart_interval=3)
    gw, gh, ch, out = decode_jpeg(p)
    arr = np.frombuffer(out, np.uint8).reshape(h, w, 3)
    assert set(map(tuple, arr.reshape(-1, 3))) == {solid_color_roundtrip(rgb, 75)}


def test_roundtrip_422_sampling():
    """4:2:2 (2x1 luma factors): horizontal-only chroma subsampling —
    the decoder's (hmax, vmax) == (2, 1) MCU path."""
    w, h = 40, 24
    xx, yy = np.meshgrid(np.arange(w), np.arange(h))
    img = np.zeros((h, w, 3))
    img[:, :, 0] = 128 + 80 * np.sin(xx / 9.0)
    img[:, :, 1] = 128 + 60 * np.cos(yy / 7.0)
    img[:, :, 2] = 128 + 50 * np.sin((xx + yy) / 11.0)
    px = np.clip(img, 0, 255).astype(np.uint8)
    p = encode_jpeg(w, h, px.tobytes(), quality=90, subsample="422")
    gw, gh, ch, out = decode_jpeg(p)
    assert (gw, gh, ch) == (w, h, 3)
    arr = np.frombuffer(out, np.uint8).reshape(h, w, 3).astype(float)
    assert np.abs(arr - px.astype(float)).max() <= 16
    # and a solid color still hits the exact closed form
    rgb = (90, 180, 40)
    p2 = encode_jpeg(16, 8, bytes(rgb) * 128, quality=75, subsample="422")
    _, _, _, out2 = decode_jpeg(p2)
    arr2 = np.frombuffer(out2, np.uint8).reshape(8, 16, 3)
    assert set(map(tuple, arr2.reshape(-1, 3))) == {solid_color_roundtrip(rgb, 75)}


def test_progressive_identity_fuzz():
    """Property fuzz over the mode matrix: random dims/content/quality,
    progressive must decode pixel-identical to baseline every time."""
    from hypothesis import given, settings, strategies as st

    @settings(max_examples=12, deadline=None)
    @given(
        w=st.integers(1, 24),
        h=st.integers(1, 24),
        seed=st.integers(0, 2**31 - 1),
        q=st.sampled_from([40, 75, 92]),
        ss=st.sampled_from(["444", "420", "422"]),
        mode=st.sampled_from(["ss", "sa", "nc"]),
    )
    def check(w, h, seed, q, ss, mode):
        rng = np.random.RandomState(seed)
        px = rng.randint(0, 256, (h, w, 3)).astype(np.uint8).tobytes()
        base = decode_jpeg(encode_jpeg(w, h, px, quality=q, subsample=ss))
        got = decode_jpeg(
            encode_jpeg(w, h, px, quality=q, subsample=ss, progressive=mode)
        )
        assert got == base

    check()


def test_progressive_noninterleaved_dc_scan():
    """'nc' mode emits one single-component DC scan per component over
    its TRUE block grid (T.81 A.2.2). Regression for the decoder
    iterating the MCU-padded grid instead: at 4:2:0 with a dim not a
    multiple of 16 (20x20 → luma true grid 3x3 vs padded 4x4) the two
    differ and decode used to consume units the encoder never wrote."""
    for w, h in [(20, 20), (16, 16), (24, 8), (32, 32), (17, 11)]:
        rng = np.random.RandomState(7)
        px = rng.randint(0, 256, (h, w, 3)).astype(np.uint8).tobytes()
        for ss in ("420", "422", "444"):
            base = decode_jpeg(
                encode_jpeg(w, h, px, quality=80, subsample=ss)
            )
            got = decode_jpeg(
                encode_jpeg(
                    w, h, px, quality=80, subsample=ss, progressive="nc"
                )
            )
            assert got == base, (w, h, ss)
    # grayscale single-component path too
    pxg = bytes(range(20)) * 20
    assert decode_jpeg(
        encode_jpeg(20, 20, pxg, n_channels=1, progressive="nc")
    ) == decode_jpeg(encode_jpeg(20, 20, pxg, n_channels=1))


def test_fill_bytes_before_markers():
    """T.81 B.1.1.2: any number of 0xFF fill bytes may precede a
    marker — in the header segment walk, before RSTn inside a scan,
    and before the scan-terminating marker."""
    rng = np.random.RandomState(3)
    px = rng.randint(0, 256, (16, 16, 3)).astype(np.uint8).tobytes()
    p = encode_jpeg(16, 16, px, quality=75)
    base = decode_jpeg(p)
    # fills at the end of the entropy stream, before EOI
    assert p.endswith(b"\xff\xd9")
    assert decode_jpeg(p[:-2] + b"\xff\xff\xff\xd9") == base
    # fill between two header segments (before DQT)
    i = p.index(b"\xff\xdb")
    assert decode_jpeg(p[:i] + b"\xff" + p[i:]) == base
    # fill before a restart marker mid-scan
    pr = encode_jpeg(32, 16, bytes(32 * 16 * 3), restart_interval=1)
    j = pr.index(b"\xff\xd0")
    assert decode_jpeg(pr[:j] + b"\xff" + pr[j:]) == decode_jpeg(pr)


def test_malformed_streams_keep_the_valueerror_contract():
    """Round-6 review finds: attacker-controlled malformed bytes must
    raise ValueError/NotImplementedError, never IndexError /
    ZeroDivisionError / struct.error."""
    base = encode_jpeg(8, 8, bytes(192), quality=75)

    def patched(marker, mutate):
        i = base.index(marker)
        b = bytearray(base)
        mutate(b, i)
        return bytes(b)

    # overfull canonical spec: three 1-bit codes cannot exist
    from kgt.textops.jpeg import _decode_lut

    with pytest.raises(ValueError, match="overfull"):
        _decode_lut((3,) + (0,) * 15, (0, 1, 2))
    # zero sampling factor in SOF
    i = base.index(b"\xff\xc0")
    b = bytearray(base)
    b[i + 2 + 2 + 6 + 1] = 0x00  # first component's Hi/Vi nibble pair
    with pytest.raises(ValueError, match="sampling factors"):
        decode_jpeg(bytes(b))
    # SOF with a lying (short) length field
    b = bytearray(base)
    b[i + 2 : i + 4] = (5).to_bytes(2, "big")
    with pytest.raises(ValueError):
        decode_jpeg(bytes(b))
    # 4-component frames reject EARLY with the honest gap message
    b = bytearray(base)
    with pytest.raises(NotImplementedError, match="components"):
        bb = bytearray(base)
        bb[i + 2 + 2 + 5] = 4  # ncomp byte
        decode_jpeg(bytes(bb))


def test_bitwriter_is_linear_and_cache_bounded():
    """Round-6 review finds: the entropy accumulator must not grow into
    an all-bits bigint (O(n²) encode), and the LUT cache must stay
    bounded under per-image Huffman tables."""
    from kgt.textops.jpeg import _BitWriter, _LUT_CACHE, _decode_lut

    bw = _BitWriter()
    for i in range(100_000):
        bw.write(i & 0x3F, 7)
    assert bw.acc.bit_length() <= 8  # never more than the residue
    assert len(bw.flush()) >= 80_000

    _LUT_CACHE.clear()
    for n in range(70):  # distinct tables, more than the 64 cap
        bits = [0] * 16
        bits[7] = 2
        _decode_lut(tuple(bits), (n & 0xFF, (n + 1) & 0xFF))
    assert len(_LUT_CACHE) <= 64


def test_fused_lut_differential_vs_spec_semantics():
    """Round-7 fused peek-16 tables, pinned window-by-window against
    independently-implemented T.81 semantics: for every 16-bit window
    and every (random, adversarial) canonical table, the fused entry
    must agree with 'walk the canonical code prefix, then read SIZE
    mantissa bits and EXTEND them' — including the slow-path marker
    whenever codelen + size > 16 (the boundary the >99% fast path is
    allowed to skip) and the bad-AC-symbol / EOB / ZRL specials.
    The engine's own encoder only emits K.3-style tables, so without
    this the fused path was never exercised against the per-image
    optimized tables real corpora (mozjpeg, jpegtran -optimize)
    contain."""
    import random

    from kgt.textops.jpeg import _FUSED_CACHE, _fused_lut

    def extend(raw, size):  # T.81 F.2.2.1 EXTEND
        return raw - ((1 << size) - 1) if raw < (1 << (size - 1)) else raw

    def spec_decode(window, codes, kind):
        """Independent window decode: longest-prefix canonical match,
        then mantissa per the DC/AC symbol semantics."""
        for sym, length, code in codes:
            if (window >> (16 - length)) == code:
                if kind == "dc":
                    size = sym
                    run = None
                else:
                    run, size = sym >> 4, sym & 15
                    if size == 0:
                        if sym == 0:
                            return ("eob", length)
                        if run == 15:
                            return ("val", 0, 16, length)
                        return ("bad",)
                if kind == "dc" and size == 0:
                    return ("val", 0, None, length)
                if size > 15 or length + size > 16:
                    return ("slow", sym, length)
                raw = (window >> (16 - length - size)) & ((1 << size) - 1)
                return ("val", extend(raw, size), run, length + size)
        return ("none",)

    def check(kind, bits, vals):
        codes = []
        code = 0
        k = 0
        for length in range(1, 17):  # canonical walk, re-derived here
            for _ in range(bits[length - 1]):
                codes.append((vals[k], length, code))
                code += 1
                k += 1
            code <<= 1
        lut = _fused_lut(kind, tuple(bits), tuple(vals))
        for w in range(65536):
            got = lut[w]
            want = spec_decode(w, codes, kind)
            if want[0] == "none":
                assert got == 0, (kind, w)
            elif want[0] == "bad":
                assert got == 1, (kind, w)
            elif want[0] == "eob":
                assert got == 32 | want[1], (kind, w)
            elif want[0] == "slow":
                assert got == -((want[1] << 5) | want[2]), (kind, w)
            else:
                _tag, v, run, nbits = want
                if kind == "dc":
                    assert got == ((v + 32768) << 6) | nbits, (kind, w, want)
                else:
                    assert got == ((v + 32768) << 11) | (
                        (16 if run is None else run) << 6
                    ) | nbits, (kind, w, want)

    rng = random.Random(42)

    def random_table(kind):
        # random VALID canonical spec: at each length, assign at most
        # the remaining code space minus one slot (keep it non-overfull)
        bits = [0] * 16
        vals = []
        code = 0
        for li in range(16):
            avail = (1 << (li + 1)) - code
            take = rng.randint(0, min(avail - 1, 5)) if avail > 1 else 0
            if li == 15 and avail > 0 and rng.random() < 0.5:
                take = min(avail, 5)  # allow a full last level sometimes
            bits[li] = take
            code = (code + take) << 1
            for _ in range(take):
                if kind == "dc":
                    # mostly legal sizes 0-15; occasionally a corrupt
                    # DHT symbol > 15, which must route to the slow
                    # path (where the scan loop rejects it), never
                    # into a bogus fused fast entry
                    vals.append(
                        rng.randint(16, 255) if rng.random() < 0.1
                        else rng.randint(0, 15)
                    )
                else:
                    # bias toward edge symbols: EOB, ZRL, bad size-0
                    # runs, and big sizes that force the slow path
                    r = rng.random()
                    if r < 0.15:
                        vals.append(rng.choice([0x00, 0xF0, 0x30, 0x70]))
                    else:
                        vals.append(
                            (rng.randint(0, 15) << 4) | rng.randint(0, 15)
                        )
        return bits, vals

    for kind in ("dc", "ac"):
        for _ in range(12):
            bits, vals = random_table(kind)
            if sum(bits) == 0:
                continue
            _FUSED_CACHE.clear()
            check(kind, bits, vals)
