"""From-scratch GIF codec tests (kgt/textops/gif.py) — LZW
round-trips (GIF is lossless, so encode→decode must reproduce every
index), variable code widths across the 2^n boundaries, dictionary
overflow + mid-stream clear codes, interlace reordering, multi-frame
compositing with transparency and disposal, and malformed-stream
errors."""

import struct

import pytest

from kgt.textops.gif import (
    decode_gif,
    encode_gif,
    lzw_decode,
    lzw_encode,
)


def _palette(n):
    return [((i * 7) % 256, (i * 11) % 256, (i * 13) % 256) for i in range(n)]


def _rgb_frame(indices, pal):
    return b"".join(bytes(pal[i]) for i in indices)


class TestLzw:
    def test_round_trip_simple(self):
        data = bytes([0, 1, 2, 1, 0, 2, 2, 1] * 10)
        enc = lzw_encode(data, 2)
        assert lzw_decode(enc, 2, len(data)) == data

    @pytest.mark.parametrize("mcs", [9, 10, 11, 12])
    def test_mcs_over_8_rejected(self, mcs):
        """GIF literal codes are palette indices (bytes), so mcs >= 9
        is invalid; the batched decoder must reject it like the
        per-symbol decoder did (bytes([i]) raised at table init for
        i >= 256) rather than wrap literals mod 256 into silently
        wrong pixels (r7 review)."""
        from kgt.textops.gif import _lzw_decode_ref

        with pytest.raises(ValueError):
            lzw_decode(b"\x00\x01\x02\x03", mcs, 4)
        with pytest.raises(ValueError):
            _lzw_decode_ref(b"\x00\x01\x02\x03", mcs, 4)

    @pytest.mark.parametrize("mcs", [2, 4, 8])
    def test_round_trip_width_growth(self, mcs):
        """Enough distinct sequences to push the code width past
        several 2^n boundaries."""
        import random

        rng = random.Random(3)
        data = bytes(rng.randrange(1 << mcs) for _ in range(20000))
        assert lzw_decode(lzw_encode(data, mcs), mcs, len(data)) == data

    def test_round_trip_dictionary_overflow_clears(self):
        """>4096 dictionary entries force a mid-stream clear code —
        both sides must resynchronize."""
        import random

        rng = random.Random(9)
        data = bytes(rng.randrange(256) for _ in range(60000))
        assert lzw_decode(lzw_encode(data, 8), 8, len(data)) == data

    def test_kwkwk_pattern(self):
        """The classic code==len(table) case (cScSc): decoder must
        synthesize prev + prev[0]."""
        data = b"\x00\x01\x00\x01\x00" * 8
        assert lzw_decode(lzw_encode(data, 2), 2, len(data)) == data

    def test_truncated_stream_raises(self):
        enc = lzw_encode(bytes(100), 2)
        with pytest.raises(ValueError, match="truncated GIF LZW|ended early"):
            lzw_decode(enc[: len(enc) // 2], 2, 100)

    def test_differential_vs_reference_decoder(self):
        """The round-7 batched decoder (numpy code extraction +
        two-pass literal-scatter/copy emission) against the per-symbol
        reference, over all encoder-reachable stream shapes PLUS
        truncated/junk-suffixed streams and short `expect` reads —
        outcome (bytes or error class) must match exactly."""
        import random

        from kgt.textops.gif import _lzw_decode_ref

        rng = random.Random(23)
        for trial in range(120):
            mcs = rng.choice([2, 3, 4, 5, 6, 7, 8])
            n = rng.randrange(0, 2500)
            style = rng.randrange(5)
            if style == 0:
                data = bytes(rng.randrange(1 << mcs) for _ in range(n))
            elif style == 1:
                data = bytes([rng.randrange(1 << mcs)]) * n if n else b""
            elif style == 2:
                pat = bytes(
                    rng.randrange(1 << mcs)
                    for _ in range(rng.randrange(1, 9))
                )
                data = (pat * (n // len(pat) + 1))[:n]
            elif style == 3:
                data = bytes(
                    min(i % (1 << mcs), (i // 7) % (1 << mcs))
                    for i in range(n)
                )
            else:
                half = n // 2
                data = bytes(
                    rng.randrange(1 << mcs) for _ in range(half)
                ) + bytes([1] * (n - half))
            enc = lzw_encode(data, mcs)
            assert lzw_decode(enc, mcs, n) == data
            if n:
                e2 = rng.randrange(0, n)
                assert lzw_decode(enc, mcs, e2) == _lzw_decode_ref(
                    enc, mcs, e2
                )
            for cut in (len(enc) // 3, len(enc) - 1):
                blob = enc[:cut] + bytes(
                    rng.randrange(256) for _ in range(rng.randrange(4))
                )
                try:
                    r1 = ("ok", _lzw_decode_ref(blob, mcs, n))
                except ValueError as e:
                    r1 = ("err", str(e).split(":")[0])
                try:
                    r2 = ("ok", lzw_decode(blob, mcs, n))
                except ValueError as e:
                    r2 = ("err", str(e).split(":")[0])
                assert r1 == r2, (trial, cut, r1[0], r2[0])


class TestGif:
    def test_single_frame_round_trip(self):
        w, h = 13, 9
        pal = _palette(16)
        idx = bytes((i * 5) % 16 for i in range(w * h))
        payload = encode_gif(w, h, [idx], pal)
        gw, gh, frames, delays = decode_gif(payload)
        assert (gw, gh, len(frames)) == (w, h, 1)
        assert frames[0] == _rgb_frame(idx, pal)

    def test_interlaced_round_trip(self):
        """Interlaced storage must decode to the same raster order."""
        w, h = 10, 17  # odd height exercises all four passes
        pal = _palette(8)
        idx = bytes((x + 3 * y) % 8 for y in range(h) for x in range(w))
        plain = decode_gif(encode_gif(w, h, [idx], pal))
        inter = decode_gif(encode_gif(w, h, [idx], pal, interlace=True))
        assert inter[2][0] == plain[2][0] == _rgb_frame(idx, pal)

    def test_multi_frame_delays(self):
        w, h = 6, 4
        pal = _palette(4)
        f1 = bytes([1] * (w * h))
        f2 = bytes([2] * (w * h))
        payload = encode_gif(w, h, [f1, f2], pal, delays=[10, 25])
        gw, gh, frames, delays = decode_gif(payload)
        assert len(frames) == 2 and delays == [10, 25]
        assert frames[0] == _rgb_frame(f1, pal)
        assert frames[1] == _rgb_frame(f2, pal)

    def test_transparency_composites_over_previous_frame(self):
        """A transparent index must leave the underlying pixel — build
        the GCE by hand (the fixture encoder doesn't emit
        transparency)."""
        w, h = 4, 1
        pal = _palette(4)
        base = bytes([1, 1, 1, 1])
        top = bytes([3, 2, 3, 2])  # 3 = transparent
        payload = bytearray(encode_gif(w, h, [base, top], pal))
        # insert a GCE with transparency flag + index 3 before the
        # SECOND image descriptor
        second = payload.index(b"\x2c", payload.index(b"\x2c") + 1)
        gce = bytes([0x21, 0xF9, 4]) + struct.pack("<BH", 1, 0) + bytes([3, 0])
        payload[second:second] = gce
        _, _, frames, _ = decode_gif(bytes(payload))
        assert frames[1] == _rgb_frame(bytes([1, 2, 1, 2]), pal)

    def test_disposal_restore_background(self):
        """Disposal 2 clears the frame's rect to the background color
        before the next frame composites."""
        w, h = 2, 1
        pal = _palette(4)
        f1 = bytes([2, 2])
        f2 = bytes([3, 3])
        payload = bytearray(encode_gif(w, h, [f1, f2], pal))
        first = payload.index(b"\x2c")
        gce = bytes([0x21, 0xF9, 4]) + struct.pack("<BH", 2 << 2, 0) + bytes([0, 0])
        payload[first:first] = gce
        # make frame 2 transparent on index 3 so the restored
        # background (palette[0]) shows through
        second = payload.index(b"\x2c", payload.index(b"\x2c") + 1)
        gce2 = bytes([0x21, 0xF9, 4]) + struct.pack("<BH", 1, 0) + bytes([3, 0])
        payload[second:second] = gce2
        _, _, frames, _ = decode_gif(bytes(payload))
        assert frames[0] == _rgb_frame(f1, pal)
        assert frames[1] == _rgb_frame(bytes([0, 0]), pal)

    def test_disposal_restore_previous(self):
        """Disposal 3: after a frame is displayed, the canvas reverts
        to its pre-frame state, so the NEXT frame composites over what
        was there BEFORE the disposal-3 frame — not over that frame."""
        w, h = 3, 1
        pal = _palette(4)
        f1 = bytes([1, 1, 1])
        f2 = bytes([2, 2, 2])  # marked disposal 3
        f3 = bytes([3, 0, 3])  # index 3 transparent → base shows through
        payload = bytearray(encode_gif(w, h, [f1, f2, f3], pal))
        second = payload.index(b"\x2c", payload.index(b"\x2c") + 1)
        gce2 = bytes([0x21, 0xF9, 4]) + struct.pack("<BH", 3 << 2, 0) + bytes([0, 0])
        payload[second:second] = gce2
        third = payload.index(b"\x2c", second + len(gce2) + 1)
        gce3 = bytes([0x21, 0xF9, 4]) + struct.pack("<BH", 1, 0) + bytes([3, 0])
        payload[third:third] = gce3
        _, _, frames, _ = decode_gif(bytes(payload))
        assert frames[0] == _rgb_frame(f1, pal)
        assert frames[1] == _rgb_frame(f2, pal)  # frame 2 IS displayed
        # frame 3's transparent pixels reveal frame 1 (restored), and
        # its opaque pixel draws over it
        assert frames[2] == _rgb_frame(bytes([1, 0, 1]), pal)

    def test_disposal_restore_previous_subrect(self):
        """Disposal 3 with a sub-rect image: only the rect was drawn,
        and the revert restores exactly the pre-frame canvas."""
        w, h = 4, 2
        pal = _palette(4)
        base = bytes([1] * 8)
        payload = bytearray(encode_gif(w, h, [base], pal))
        # hand-append: GCE(disposal 3) + a 2×1 image at (1,1) drawing
        # index 2, then GCE(transparent 3) + a full-canvas frame of 3s
        from kgt.textops.gif import lzw_encode

        trailer = payload.pop()  # 0x3B
        payload += bytes([0x21, 0xF9, 4]) + struct.pack("<BH", 3 << 2, 0) + bytes([0, 0])
        payload += bytes([0x2C]) + struct.pack("<HHHHB", 1, 1, 2, 1, 0)
        sub = lzw_encode(bytes([2, 2]), 2)
        payload += bytes([2, len(sub)]) + sub + b"\x00"
        payload += bytes([0x21, 0xF9, 4]) + struct.pack("<BH", 1, 0) + bytes([3, 0])
        payload += bytes([0x2C]) + struct.pack("<HHHHB", 0, 0, w, h, 0)
        full = lzw_encode(bytes([3] * 8), 2)
        payload += bytes([2, len(full)]) + full + b"\x00"
        payload.append(trailer)
        _, _, frames, _ = decode_gif(bytes(payload))
        assert frames[0] == _rgb_frame(base, pal)
        assert frames[1] == _rgb_frame(bytes([1, 1, 1, 1, 1, 2, 2, 1]), pal)
        # the disposal-3 revert means frame 3 (all transparent) shows
        # the ORIGINAL base, with no trace of the 2×1 rect
        assert frames[2] == _rgb_frame(base, pal)

    def test_bad_inputs(self):
        pal = _palette(4)
        p = encode_gif(4, 4, [bytes(16)], pal)
        with pytest.raises(ValueError, match="signature"):
            decode_gif(b"NOTAGIF" + bytes(20))
        with pytest.raises(ValueError, match="trailer|truncated|sub-block"):
            decode_gif(p[:-2])
        # corrupt an index to point past the palette: re-encode with a
        # 2-entry palette but indices up to 3
        with pytest.raises(ValueError, match="index outside"):
            encode_gif(2, 2, [bytes([0, 1, 2, 3])], _palette(2))

    def test_87a_header_accepted(self):
        pal = _palette(2)
        p = bytearray(encode_gif(2, 2, [bytes([0, 1, 1, 0])], pal))
        p[3:6] = b"87a"
        _, _, frames, _ = decode_gif(bytes(p))
        assert frames[0] == _rgb_frame(bytes([0, 1, 1, 0]), pal)


def test_frame_sample_routes_gif(spark):
    """multimodal.frame_sample(fake=False) must recognize GIF payloads
    and emit real frame rows (timestamps from the GCE delay chain)."""
    import hashlib

    import pandas as pd

    from kgt.textops.multimodal import frame_sample

    pal = _palette(4)
    frames = [bytes([f] * 4) for f in range(3)]
    payload = encode_gif(2, 2, frames, pal, delays=[5, 10, 15])
    media = spark.createDataFrame(
        pd.DataFrame(
            {"doc_id": [7], "payload": [payload], "media_type": ["image/gif"]}
        )
    )
    rows = frame_sample(media, n_frames=3, fake=False).collect()
    assert [r["frame_idx"] for r in rows] == [0, 1, 2]
    assert [r["ts_ms"] for r in rows] == [0, 50, 150]  # cumulative cs*10
    want = [
        hashlib.md5(_rgb_frame(f, pal)).hexdigest() for f in frames
    ]
    assert [r["frame_checksum"] for r in rows] == want
