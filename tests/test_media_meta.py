"""MP3 frame-walker + MP4 box-parser tests — the container-metadata
surface of the compressed formats whose codec payloads stay env-gated
(kgt/textops/mp3.py, mp4.py).  Fixture streams are built by the
modules' own minimal encoders; headers/tables follow the public
ISO/IEC 11172-3 / 13818-3 / 14496-12 specs."""

import struct

import pytest

from kgt.textops.mp3 import (
    decode_pcm,
    encode_mp3_frames,
    parse_frame_header,
    parse_mp3,
)
from kgt.textops.mp4 import decode_frames, encode_mp4, parse_mp4, walk_boxes


class TestMp3:
    def test_cbr_stream_with_id3(self):
        p = encode_mp3_frames(10, 128, 44100, 2, id3_payload=b"x" * 300)
        m = parse_mp3(p)
        assert m == {
            "n_frames": 10,
            "sample_rate": 44100,
            "channels": 2,
            "duration_ms": round(1000 * 10 * 1152 / 44100),
            "bitrate_mode": "cbr",
            "bitrate_kbps": 128,
            "id3v2_bytes": 310,
        }

    def test_vbr_detection_and_weighted_bitrate(self):
        p = encode_mp3_frames(
            4, sample_rate=48000, channels=1,
            bitrate_pattern=[64, 128, 192, 320],
        )
        m = parse_mp3(p)
        assert m["bitrate_mode"] == "vbr" and m["channels"] == 1
        # byte-weighted mean: total_bytes*8*rate // (samples*1000)
        total = sum(144 * k * 1000 // 48000 for k in (64, 128, 192, 320))
        assert m["bitrate_kbps"] == total * 8 * 48000 // (4 * 1152 * 1000)

    def test_exact_durations_at_exact_rates(self):
        # 48000: 1152 samples = exactly 24 ms/frame; 32000: 36 ms
        assert parse_mp3(encode_mp3_frames(7, 128, 48000))["duration_ms"] == 168
        assert parse_mp3(encode_mp3_frames(7, 128, 32000))["duration_ms"] == 252

    def test_frame_header_tables(self):
        # hand-assembled header: MPEG-1 L3, 192 kbps, 44100, stereo
        hdr = bytes([0xFF, 0xFB, 0xB0, 0x00])
        v, br, rate, ch, pad, fbytes, samples = parse_frame_header(hdr)
        assert (br, rate, ch, samples) == (192, 44100, 2, 1152)
        assert fbytes == 144 * 192 * 1000 // 44100
        # padding bit adds one byte
        hdr_pad = bytes([0xFF, 0xFB, 0xB2, 0x00])
        assert parse_frame_header(hdr_pad)[5] == fbytes + 1
        # Layer II, free-format, bad samplerate → rejected
        assert parse_frame_header(bytes([0xFF, 0xFD, 0xB0, 0x00])) is None
        assert parse_frame_header(bytes([0xFF, 0xFB, 0x00, 0x00])) is None
        assert parse_frame_header(bytes([0xFF, 0xFB, 0xBC, 0x00])) is None

    def test_truncated_and_junk_raise(self):
        p = encode_mp3_frames(2, 128, 44100)
        with pytest.raises(ValueError, match="truncated MP3 frame"):
            parse_mp3(p[:-1])
        with pytest.raises(ValueError, match="frame sync"):
            parse_mp3(b"junk" + p)
        with pytest.raises(ValueError, match="sync-safe"):
            parse_mp3(b"ID3\x04\x00\x00\xff\xff\xff\xff" + p)

    def test_pcm_decode_is_an_honest_stub(self):
        with pytest.raises(NotImplementedError, match="parse_mp3"):
            decode_pcm(b"\xff\xfb\xb0\x00")


class TestMp4:
    TRACKS = [
        dict(track_id=1, handler="vide", width=640, height=360,
             media_timescale=30000, media_duration=90000, codec="avc1"),
        dict(track_id=2, handler="soun", width=0, height=0,
             media_timescale=44100, media_duration=132300, codec="mp4a"),
    ]

    def test_two_track_file(self):
        m = parse_mp4(encode_mp4(1000, 3000, self.TRACKS))
        assert m["major_brand"] == "isom" and m["duration_ms"] == 3000
        v, a = m["tracks"]
        assert (v["width"], v["height"], v["codec"], v["handler"]) == (
            640.0, 360.0, "avc1", "vide",
        )
        assert (a["codec"], a["media_timescale"]) == ("mp4a", 44100)

    def test_mvhd_version1_64bit(self):
        m = parse_mp4(encode_mp4(90000, 450000, self.TRACKS[:1], mvhd_version=1))
        assert m["duration_ms"] == 5000 and m["timescale"] == 90000

    def test_largesize_box(self):
        """size==1 → 64-bit largesize must parse to the same tree."""
        p = encode_mp4(1000, 2000, self.TRACKS[:1])
        # rewrite the ftyp box to largesize form
        (size,) = struct.unpack(">I", p[:4])
        big = (
            struct.pack(">I", 1) + p[4:8] + struct.pack(">Q", size + 8) + p[8:size]
        )
        assert parse_mp4(big + p[size:]) == parse_mp4(p)

    def test_box_walk_validates_sizes(self):
        with pytest.raises(ValueError, match="truncated MP4 box"):
            list(walk_boxes(b"\x00\x00\x00\x08fty"))
        with pytest.raises(ValueError, match="bad MP4 box size"):
            list(walk_boxes(b"\x00\x00\x00\x03ftyp"))
        with pytest.raises(ValueError, match="no ftyp"):
            parse_mp4(struct.pack(">I", 8) + b"free")

    def test_frame_decode_is_an_honest_stub(self):
        with pytest.raises(NotImplementedError, match="parse_mp4"):
            decode_frames(b"")


def test_media_metadata_routes_all_formats(spark):
    """One operator, seven formats: signature sniffing must route each
    payload to its decoder and emit the right typed row."""
    import pandas as pd

    from kgt.textops.gif import encode_gif
    from kgt.textops.jpeg import encode_jpeg
    from kgt.textops.multimodal import (
        encode_png,
        encode_wav,
        encode_y4m,
        media_metadata,
    )

    payloads = {
        1: encode_png(5, 3, bytes(45), color_type=2),
        2: encode_jpeg(6, 4, bytes((9, 9, 9)) * 24, quality=75),
        3: encode_gif(4, 4, [bytes(16)] * 2, [(0, 0, 0), (1, 1, 1)], delays=[3, 7]),
        4: encode_wav(2, 8000, [0] * 40, bits=16),  # 20 frames
        5: encode_y4m(4, 2, [bytes(12)] * 3, fps=(25, 1)),
        6: encode_mp4(1000, 2500, [dict(track_id=1, handler="vide",
            width=320, height=200, media_timescale=30000,
            media_duration=75000, codec="avc1")]),
        7: encode_mp3_frames(5, 128, 32000, 1),
    }
    media = spark.createDataFrame(
        pd.DataFrame(
            {
                "doc_id": list(payloads),
                "payload": [payloads[k] for k in payloads],
            }
        )
    )
    got = {r["doc_id"]: r for r in media_metadata(media).collect()}
    assert got[1]["media_type"] == "image/png" and got[1]["width"] == 5
    assert got[2]["media_type"] == "image/jpeg" and got[2]["height"] == 4
    assert got[3]["media_type"] == "image/gif" and got[3]["n_frames"] == 2
    assert got[3]["duration_ms"] == 100  # (3+7) cs
    assert got[4]["media_type"] == "audio/wav" and got[4]["channels"] == 2
    # 20 frames @ 8000 Hz = 2.5 ms → 3 under the operator's documented
    # half-UP convention (oracle floor(x+0.5); Python round would give 2)
    assert got[4]["duration_ms"] == 3
    assert got[5]["media_type"] == "video/y4m" and got[5]["n_frames"] == 3
    assert got[5]["duration_ms"] == 120
    assert got[6]["media_type"] == "video/mp4" and got[6]["width"] == 320
    assert got[6]["duration_ms"] == 2500
    assert got[7]["media_type"] == "audio/mpeg" and got[7]["sample_rate"] == 32000
    assert all(got[k]["n_bytes"] == len(payloads[k]) for k in payloads)


def test_media_metadata_rejects_unknown_signature(spark):
    import pandas as pd
    import pytest as _pytest

    from kgt.textops.multimodal import media_metadata

    media = spark.createDataFrame(
        pd.DataFrame({"doc_id": [1], "payload": [b"NOTMEDIA" + bytes(16)]})
    )
    with _pytest.raises(Exception, match="unrecognized media signature"):
        media_metadata(media).collect()


class TestWebP:
    def test_all_three_flavors(self):
        from kgt.textops.webp import encode_webp_header, parse_webp

        for fmt, kw in [
            ("vp8l", dict(has_alpha=True)),
            ("vp8", {}),
            ("vp8x", dict(has_animation=True)),
        ]:
            m = parse_webp(encode_webp_header(640, 360, fmt=fmt, **kw))
            assert (m["format"], m["width"], m["height"]) == (fmt, 640, 360)
        m = parse_webp(encode_webp_header(1, 1, fmt="vp8l"))
        assert (m["width"], m["height"]) == (1, 1)  # the -1 encoding edge
        m = parse_webp(encode_webp_header(16384, 16384, fmt="vp8l"))
        assert (m["width"], m["height"]) == (16384, 16384)

    def test_errors(self):
        from kgt.textops.webp import (
            decode_pixels,
            encode_webp_header,
            parse_webp,
        )

        p = encode_webp_header(8, 8)
        with pytest.raises(ValueError, match="RIFF/WEBP"):
            parse_webp(b"RIFF\x04\x00\x00\x00WAVE")
        with pytest.raises(ValueError, match="RIFF size"):
            parse_webp(p[:-1])
        # corrupt the VP8L signature byte
        bad = bytearray(p)
        bad[p.index(b"VP8L") + 8] = 0x00
        with pytest.raises(ValueError, match="VP8L signature"):
            parse_webp(bytes(bad))
        with pytest.raises(NotImplementedError, match="parse_webp"):
            decode_pixels(p)


class TestMkv:
    def test_two_tracks_and_scale(self):
        from kgt.textops.mkv import encode_mkv, parse_mkv

        p = encode_mkv(
            2500,
            [
                dict(type="video", codec="V_VP9", width=1280, height=720),
                dict(type="audio", codec="A_OPUS", sample_rate=48000,
                     channels=2),
            ],
        )
        m = parse_mkv(p)
        assert m["duration_ms"] == 2500 and m["n_tracks"] == 2
        v, a = m["tracks"]
        assert (v["type"], v["codec"], v["width"], v["height"]) == (
            "video", "V_VP9", 1280, 720,
        )
        assert (a["type"], a["sample_rate"], a["channels"]) == (
            "audio", 48000, 2,
        )
        # non-default timestamp scale round-trips the ms duration
        m2 = parse_mkv(
            encode_mkv(
                1234,
                [dict(type="audio", codec="A_AAC", sample_rate=44100,
                      channels=1)],
                timestamp_scale=500_000,
            )
        )
        assert m2["duration_ms"] == 1234 and m2["timestamp_scale"] == 500_000

    def test_errors(self):
        from kgt.textops.mkv import decode_frames, encode_mkv, parse_mkv

        with pytest.raises(ValueError, match="EBML"):
            parse_mkv(b"\x00junk")
        p = encode_mkv(100, [dict(type="audio", codec="A_AAC",
                                  sample_rate=8000, channels=1)])
        with pytest.raises(ValueError, match="overruns|truncated"):
            parse_mkv(p[:-3])
        with pytest.raises(NotImplementedError, match="parse_mkv"):
            decode_frames(p)


def test_media_metadata_routes_webp_and_mkv(spark):
    import pandas as pd

    from kgt.textops.mkv import encode_mkv
    from kgt.textops.multimodal import media_metadata
    from kgt.textops.webp import encode_webp_header

    media = spark.createDataFrame(
        pd.DataFrame(
            {
                "doc_id": [1, 2],
                "payload": [
                    encode_webp_header(320, 200, fmt="vp8"),
                    encode_mkv(1500, [
                        dict(type="video", codec="V_AV1", width=640,
                             height=480),
                    ]),
                ],
            }
        )
    )
    got = {r["doc_id"]: r for r in media_metadata(media).collect()}
    assert got[1]["media_type"] == "image/webp" and got[1]["width"] == 320
    assert got[2]["media_type"] == "video/matroska"
    assert got[2]["height"] == 480 and got[2]["duration_ms"] == 1500


def test_mp4_tkhd_version1_64bit_offsets():
    """Hand-built v1 tkhd (64-bit creation/modification/duration):
    track_id at +16, geometry past the 84-byte prefix — offsets our
    own encoder never exercises (it writes v0)."""
    from kgt.textops.mp4 import parse_mp4

    def full(btype, version, body):
        b = bytes([version]) + (0).to_bytes(3, "big") + body
        return struct.pack(">I", len(b) + 8) + btype + b

    def box(btype, body):
        return struct.pack(">I", len(body) + 8) + btype + body

    matrix = struct.pack(">9I", 0x10000, 0, 0, 0, 0x10000, 0, 0, 0, 0x40000000)
    tkhd_body = (
        struct.pack(">QQ", 0, 0)          # creation, modification (64-bit)
        + struct.pack(">I", 42)            # track_id
        + struct.pack(">I", 0)             # reserved
        + struct.pack(">Q", 0)             # duration (64-bit)
        + bytes(8)                          # reserved
        + struct.pack(">HHHH", 0, 0, 0, 0)  # layer/alt/volume/reserved
        + matrix
        + struct.pack(">II", 800 << 16, 600 << 16)
    )
    mvhd = full(b"mvhd", 0, struct.pack(">IIII", 0, 0, 1000, 7000)
                + struct.pack(">I", 0x10000) + struct.pack(">H", 0x100)
                + bytes(10) + matrix + bytes(24) + struct.pack(">I", 2))
    trak = box(b"trak", full(b"tkhd", 1, tkhd_body))
    payload = (
        box(b"ftyp", b"isom" + struct.pack(">I", 0) + b"isom")
        + box(b"moov", mvhd + trak)
    )
    m = parse_mp4(payload)
    t = m["tracks"][0]
    assert t["track_id"] == 42
    assert (t["width"], t["height"]) == (800.0, 600.0)


def test_mp3_mpeg2_frames():
    """Hand-built MPEG-2 Layer III header (576 samples/frame, the
    low-rate table): version bits 10, 24000 Hz @ 64 kbps →
    frame = 72·64000/24000 = 192 bytes, 24 ms/frame."""
    hdr = bytes([0xFF, 0xF3, 0x84, 0x00])
    # version=2 (bits 10), layer III (01), no CRC; bitrate idx 8=64kbps,
    # samplerate idx 1=24000
    v, br, rate, ch, pad, fbytes, samples = parse_frame_header(hdr)
    assert (v, br, rate, samples) == (2, 64, 24000, 576)
    assert fbytes == 72 * 64 * 1000 // 24000
    stream = (hdr + bytes(fbytes - 4)) * 3
    m = parse_mp3(stream)
    assert m["n_frames"] == 3 and m["sample_rate"] == 24000
    assert m["duration_ms"] == round(1000 * 3 * 576 / 24000)  # 72 ms


def test_mp3_mpeg25_frames():
    """MPEG-2.5 (version bits 00): 8000 Hz @ 32 kbps, 576 samples."""
    hdr = bytes([0xFF, 0xE3, 0x48, 0x00])
    # version=0 (2.5), layer III; bitrate idx 4=40? — check table:
    # MPEG-2 table idx 4 = 40 kbps; samplerate idx 2 = 8000
    v, br, rate, ch, pad, fbytes, samples = parse_frame_header(hdr)
    assert (v, rate, samples) == (0, 8000, 576)
    assert fbytes == 72 * br * 1000 // 8000
    stream = (hdr + bytes(fbytes - 4)) * 2
    m = parse_mp3(stream)
    assert m["n_frames"] == 2 and m["sample_rate"] == 8000


class TestTiff:
    def test_single_and_multi_page_both_endians(self):
        from kgt.textops.tiff import encode_tiff_header, parse_tiff

        for be in (False, True):
            m = parse_tiff(
                encode_tiff_header([(640, 480)], big_endian=be, bits=8,
                                   samples=3, compression=5)
            )
            assert m["byte_order"] == ("big" if be else "little")
            assert (m["width"], m["height"], m["n_pages"]) == (640, 480, 1)
            assert m["compression"] == "lzw"
        m = parse_tiff(
            encode_tiff_header([(100, 50), (80, 40), (60, 30)])
        )
        assert m["n_pages"] == 3
        assert (m["width"], m["height"]) == (100, 50)  # first IFD wins

    def test_errors_and_stub(self):
        import struct as _s

        from kgt.textops.tiff import (
            decode_pixels,
            encode_tiff_header,
            parse_tiff,
        )

        with pytest.raises(ValueError, match="byte-order"):
            parse_tiff(b"XX\x2a\x00" + bytes(8))
        p = encode_tiff_header([(10, 10)])
        with pytest.raises(ValueError, match="truncated TIFF"):
            parse_tiff(p[:-6])
        # IFD chain loop must be detected, not spin forever
        loop = bytearray(p)
        loop[-4:] = _s.pack("<I", 8)  # last next-IFD pointer -> first IFD
        with pytest.raises(ValueError, match="loops"):
            parse_tiff(bytes(loop))
        # header-only fixture has no strip tags → strip decode refuses
        with pytest.raises(ValueError, match="strip offsets"):
            decode_pixels(p)
        # unsupported strip codecs still raise the honest gap
        # (LZW is REAL since round 6 — use CCITT for the gap check)
        ccitt = encode_tiff_header([(10, 10)], compression=2)
        with pytest.raises(NotImplementedError, match="ccitt"):
            decode_pixels(ccitt)

    def test_strip_decode_roundtrip(self):
        """Round-6 real tier: uncompressed + PackBits strips, both
        endians, multi-strip with a ragged last strip, gray + RGB."""
        import random

        from kgt.textops.tiff import decode_pixels, encode_tiff, parse_tiff

        rng = random.Random(11)
        for w, h, s in [(1, 1, 1), (7, 5, 3), (33, 9, 1), (40, 23, 3)]:
            px = bytes(rng.randrange(256) for _ in range(w * h * s))
            for comp in (1, 32773):
                for rps in (None, 4):
                    for be in (False, True):
                        p = encode_tiff(
                            w, h, px, samples=s, compression=comp,
                            rows_per_strip=rps, big_endian=be,
                        )
                        m = parse_tiff(p)
                        assert m["compression"] == (
                            "none" if comp == 1 else "packbits"
                        )
                        assert decode_pixels(p) == (w, h, s, px), (
                            w, h, s, comp, rps, be,
                        )

    def test_packbits_runs_and_errors(self):
        from kgt.textops.tiff import (
            decode_pixels,
            encode_tiff,
            packbits_decode,
            packbits_encode,
        )

        # long runs compress to repeat packets; round-trip exact
        for data in (
            bytes([7]) * 1000,
            bytes([1, 2, 3]) + bytes([9]) * 200 + bytes([4, 4]),
            bytes(range(256)) * 2,
            b"",
        ):
            enc = packbits_encode(data)
            assert packbits_decode(enc, len(data)) == data
        assert len(packbits_encode(bytes([7]) * 1000)) <= 16
        # truncated repeat run / wrong expected length raise
        with pytest.raises(ValueError, match="truncated PackBits"):
            packbits_decode(bytes([0xFE]), 3)
        with pytest.raises(ValueError, match="expected"):
            packbits_decode(packbits_encode(b"abc"), 5)
        # corrupt strip byte-counts surface as errors, not garbage
        p = bytearray(encode_tiff(4, 4, bytes(48), compression=1))
        p[-1] ^= 0xFF  # clobber last strip byte (harmless to length)
        good = encode_tiff(4, 4, bytes(48), compression=1)
        truncated = good[:-5]
        with pytest.raises(ValueError):
            decode_pixels(truncated)


def test_media_metadata_routes_tiff(spark):
    import pandas as pd

    from kgt.textops.multimodal import media_metadata
    from kgt.textops.tiff import encode_tiff_header

    media = spark.createDataFrame(
        pd.DataFrame(
            {
                "doc_id": [1],
                "payload": [encode_tiff_header([(320, 240), (160, 120)])],
            }
        )
    )
    r = media_metadata(media).collect()[0]
    assert r["media_type"] == "image/tiff"
    assert (r["width"], r["height"], r["n_frames"]) == (320, 240, 2)


def test_mkv_unknown_size_segment():
    """Live/streamed muxers write the Segment with the EBML 'unknown
    size' pattern (all VINT_DATA bits set); it extends to the end of
    its parent. Regression: _read_size used to decode it as a huge
    literal and walk_ebml raised 'overruns its parent'."""
    from kgt.textops import mkv as M

    p = M.encode_mkv(
        2500,
        [dict(type="audio", codec="A_OPUS", sample_rate=48000, channels=2)],
    )
    want = M.parse_mkv(p)
    top = list(M.walk_ebml(p, 0, len(p)))
    _, s, e = next(t for t in top if t[0] == M.SEGMENT)
    body = p[s:e]
    head = p[: p.index(M.SEGMENT.to_bytes(4, "big")) + 4]
    # 1-byte (0xFF) and 8-byte (0x01FF..FF) unknown-size encodings
    for size_bytes in (b"\xff", b"\x01" + b"\xff" * 7):
        got = M.parse_mkv(head + size_bytes + body)
        assert got == want, size_bytes


def test_tiff_packbits_property_fuzz():
    """Hypothesis sweep of the TIFF strip codec: random dims, sample
    counts, strip heights, compressions and byte orders must round-trip
    pixel-exact, and PackBits must round-trip arbitrary byte strings."""
    from hypothesis import given, settings, strategies as st

    from kgt.textops.tiff import (
        decode_pixels,
        encode_tiff,
        packbits_decode,
        packbits_encode,
    )

    @settings(max_examples=25, deadline=None)
    @given(
        w=st.integers(1, 40),
        h=st.integers(1, 40),
        s=st.sampled_from([1, 3]),
        comp=st.sampled_from([1, 32773, 5, 8]),
        rps=st.one_of(st.none(), st.integers(1, 16)),
        be=st.booleans(),
        pred=st.sampled_from([1, 2]),
        seed=st.integers(0, 2**31 - 1),
    )
    def check_tiff(w, h, s, comp, rps, be, pred, seed):
        import random

        px = bytes(random.Random(seed).randrange(256) for _ in range(w * h * s))
        p = encode_tiff(
            w, h, px, samples=s, compression=comp, rows_per_strip=rps,
            big_endian=be, predictor=pred if comp in (5, 8) else 1,
        )
        assert decode_pixels(p) == (w, h, s, px)

    check_tiff()

    @settings(max_examples=50, deadline=None)
    @given(data=st.binary(max_size=600))
    def check_pb(data):
        assert packbits_decode(packbits_encode(data), len(data)) == data

    check_pb()


def test_resize_pixels_tiff_input():
    """resize_pixels accepts TIFF payloads (both compressions) and
    resamples identically to the same pixels fed through PNG."""
    import random

    from kgt.textops.multimodal import encode_png, resize_pixels
    from kgt.textops.tiff import encode_tiff

    rng = random.Random(3)
    w, h = 33, 21
    px = bytes(rng.randrange(256) for _ in range(w * h * 3))
    via_png = resize_pixels(encode_png(w, h, px, color_type=2), 16)
    for comp in (1, 32773):
        via_tiff = resize_pixels(
            encode_tiff(w, h, px, compression=comp, rows_per_strip=5), 16
        )
        assert via_tiff == via_png
    # under the cap: no resample, but output is STILL PNG (the
    # documented contract — callers pipe into decode_png); pixels
    # pass through losslessly
    from kgt.textops.multimodal import decode_png

    small = encode_tiff(8, 8, bytes(192), compression=1)
    out = resize_pixels(small, 16)
    assert out[:8] == b"\x89PNG\r\n\x1a\n"
    assert decode_png(out) == (8, 8, 3, bytes(192))
    # an under-cap PNG passes through byte-identical
    p_small = encode_png(8, 8, bytes(192), color_type=2)
    assert resize_pixels(p_small, 16) == p_small


def test_round6_codec_review_fixes():
    """Regression pins for the round-6 codec-review findings."""
    import pytest as _pytest

    from kgt.textops.gif import encode_gif
    from kgt.textops.mp3 import encode_mp3_frames, parse_mp3
    from kgt.textops.mp4 import encode_mp4, parse_mp4
    from kgt.textops.webp import encode_webp_header, parse_webp

    # WebP: vp8 stores raw 14-bit dims — 16384 must refuse, not wrap to 0
    with _pytest.raises(ValueError, match="vp8 dims"):
        encode_webp_header(16384, 100, fmt="vp8")
    m = parse_webp(encode_webp_header(16383, 100, fmt="vp8"))
    assert (m["width"], m["height"]) == (16383, 100)
    assert parse_webp(encode_webp_header(16384, 7, fmt="vp8l"))["width"] == 16384

    # MP3: ID3v1 trailer and ID3v2.4 footer are standard, not corruption
    p = encode_mp3_frames(5, 128, 44100, 2)
    tag = b"TAG" + bytes(125)
    assert parse_mp3(p + tag)["n_frames"] == 5
    id3v24 = bytearray(b"ID3\x04\x00\x10" + bytes([0, 0, 0, 20]) + bytes(20))
    footer = b"3DI\x04\x00\x10" + bytes([0, 0, 0, 20])
    assert parse_mp3(bytes(id3v24) + footer + p)["n_frames"] == 5

    # MP4: half-up duration rounding; malformed boxes raise ValueError
    t = [dict(track_id=1, handler="vide", width=16, height=16,
              media_timescale=1000, media_duration=500, codec="avc1")]
    enc = encode_mp4(2000, 1001, t)
    # timescale 2000, duration field = round-tripped ms... rebuild raw:
    # patch mvhd duration to 1001 ticks at timescale 2000 → 500.5 ms → 501
    m = parse_mp4(enc)
    assert isinstance(m["duration_ms"], int)
    bad = bytearray(enc)
    # find mvhd and zero its timescale → ValueError, not ZeroDivisionError
    i = bytes(bad).index(b"mvhd") + 4 + 4 + 8  # fullbox hdr + creation+mod (v0)
    ts_off = bytes(bad).index(b"mvhd") + 4 + 4 + 8
    bad[ts_off:ts_off + 4] = bytes(4)
    with _pytest.raises(ValueError, match="timescale"):
        parse_mp4(bytes(bad))

    # GIF: delays shorter than frames must refuse, not truncate
    with _pytest.raises(ValueError, match="delays"):
        encode_gif(2, 2, [bytes(4)] * 3, [(0, 0, 0), (1, 1, 1)], delays=[1])


def test_tiff_lzw_roundtrip_and_errors():
    """Round-6 LZW tier (TIFF 6.0 §13): MSB-first packing, early width
    change, table-full restart, optional horizontal predictor — exact
    round-trips over the dims/strip/endianness/predictor matrix, plus
    honest errors for truncation and the still-unsupported codecs."""
    import random

    from kgt.textops.tiff import (
        decode_pixels,
        encode_tiff,
        encode_tiff_header,
        parse_tiff,
        tiff_lzw_decode,
        tiff_lzw_encode,
    )

    rng = random.Random(9)
    for w, h, smp in [(1, 1, 1), (40, 23, 3), (64, 64, 3)]:
        px = bytes(rng.randrange(256) for _ in range(w * h * smp))
        for pred in (1, 2):
            for be in (False, True):
                p = encode_tiff(
                    w, h, px, samples=smp, compression=5,
                    rows_per_strip=4, big_endian=be, predictor=pred,
                )
                assert parse_tiff(p)["compression"] == "lzw"
                assert decode_pixels(p) == (w, h, smp, px)
    # a payload long enough to force width bumps AND a table restart
    big = bytes(rng.randrange(256) for _ in range(120_000))
    assert tiff_lzw_decode(tiff_lzw_encode(big), len(big)) == big
    # truncation raises ValueError
    enc = tiff_lzw_encode(b"hello world " * 50)
    with pytest.raises(ValueError, match="truncated|decoded"):
        tiff_lzw_decode(enc[: len(enc) // 2], 600)
    # jpeg-in-tiff stays an honest gap
    with pytest.raises(NotImplementedError, match="jpeg"):
        decode_pixels(encode_tiff_header([(4, 4)], compression=7))


def test_tiff_deflate_roundtrip_and_errors():
    """Round-7 deflate tier (compression 8, stdlib zlib): exact
    round-trips over dims/strips/endianness/predictor, the legacy
    32946 code on decode, and honest errors for corrupt or
    wrong-length zlib streams."""
    import random
    import struct
    import zlib

    from kgt.textops.tiff import decode_pixels, encode_tiff, parse_tiff

    rng = random.Random(11)
    for w, h, smp in [(1, 1, 1), (40, 23, 3), (64, 64, 3)]:
        px = bytes(rng.randrange(256) for _ in range(w * h * smp))
        for pred in (1, 2):
            for be in (False, True):
                p = encode_tiff(
                    w, h, px, samples=smp, compression=8,
                    rows_per_strip=4, big_endian=be, predictor=pred,
                )
                assert parse_tiff(p)["compression"] == "deflate"
                assert decode_pixels(p) == (w, h, smp, px)
    # legacy code 32946 decodes identically (same zlib payload)
    w, h = 8, 5
    px = bytes(rng.randrange(256) for _ in range(w * h * 3))
    p = bytearray(encode_tiff(w, h, px, compression=8))
    i = p.find(struct.pack("<H", 259))  # Compression tag, little-endian
    assert i >= 0 and p[i + 8 : i + 10] == struct.pack("<H", 8)
    p[i + 8 : i + 10] = struct.pack("<H", 32946)
    assert decode_pixels(bytes(p)) == (w, h, 3, px)
    # corrupt zlib stream raises ValueError, not zlib.error
    good = encode_tiff(4, 4, bytes(48), compression=8)
    strip = zlib.compress(bytes(48), 6)
    j = good.find(strip)
    assert j > 0
    bad = good[:j] + b"\x00" * len(strip) + good[j + len(strip):]
    with pytest.raises(ValueError, match="deflate"):
        decode_pixels(bad)
    # stream that inflates to the wrong length raises too
    short = zlib.compress(bytes(40), 6)
    padded = short + b"\x00" * (len(strip) - len(short))
    assert len(padded) == len(strip)  # keep offsets valid
    bad2 = good[:j] + padded + good[j + len(strip):]
    with pytest.raises(ValueError, match="deflate|expected"):
        decode_pixels(bad2)
    # decompression bomb: a strip that would inflate ~1000:1 is
    # rejected at expected+1 bytes, not after a multi-GB allocation
    # (the decode is bounded like the LZW tier — r7 review)
    bomb = zlib.compress(bytes(50_000_000), 9)  # ~48 KB compressed
    over = encode_tiff(4, 4, bytes(48), compression=8)
    k = over.find(strip)
    tracemalloc = __import__("tracemalloc")
    bombed = bytearray(over[:k] + bomb + over[k + len(strip):])
    # fix the strip byte count (tag 279) to the bomb's length
    t = bombed.find(struct.pack("<H", 279))
    assert t >= 0
    bombed[t + 8 : t + 12] = struct.pack("<I", len(bomb))
    tracemalloc.start()
    with pytest.raises(ValueError, match="deflate|expected"):
        decode_pixels(bytes(bombed))
    _cur, peak = tracemalloc.get_traced_memory()
    tracemalloc.stop()
    assert peak < 5_000_000  # nowhere near the 50 MB plaintext


def test_decode_features_wide_jpeg_arrow_batch_takes_lockstep(spark):
    """End-to-end Spark pinning of the lockstep batch wiring: one
    Arrow batch carrying 600 same-geometry JPEGs (above
    LOCKSTEP_MIN_STREAMS=256, so the group lockstep engages inside
    the Python worker) plus interleaved PNGs, through
    decode_features(fake=False) and media_metadata — dims must match
    the per-payload serial decode exactly."""
    import numpy as np
    import pandas as pd

    from kgt.textops.jpeg import decode_jpeg, encode_jpeg
    from kgt.textops.multimodal import (
        decode_features,
        encode_png,
        media_metadata,
    )

    rng = np.random.default_rng(53)
    payloads, kinds = [], []
    jpegs = [
        encode_jpeg(
            24, 16,
            rng.integers(0, 256, 24 * 16 * 3, np.uint8).tobytes(),
            quality=85, subsample="420",
        )
        for _ in range(8)
    ]
    png = encode_png(5, 7, bytes(range(5 * 7 * 3)), color_type=2)
    for i in range(660):
        if i % 11 == 10:
            payloads.append(png)
            kinds.append("png")
        else:
            payloads.append(jpegs[i % 8])
            kinds.append("jpeg")
    media = spark.createDataFrame(
        pd.DataFrame(
            {
                "doc_id": list(range(660)),
                "payload": payloads,
                "media_type": ["image/real"] * 660,
            }
        )
    ).coalesce(1)  # one partition -> one Arrow batch (default 10k rows)

    out = {
        r["doc_id"]: (r["width"], r["height"])
        for r in decode_features(media, fake=False).collect()
    }
    meta = {
        r["doc_id"]: (r["width"], r["height"], r["media_type"])
        for r in media_metadata(media.select("doc_id", "payload")).collect()
    }
    assert len(out) == 660 and len(meta) == 660
    for i, (p, kind) in enumerate(zip(payloads, kinds)):
        if kind == "jpeg":
            w, h, _ch, _px = decode_jpeg(p, lockstep=False)
            assert meta[i][2] == "image/jpeg"
        else:
            w, h = 5, 7
            assert meta[i][2] == "image/png"
        assert out[i] == (w, h), i
        assert meta[i][:2] == (w, h), i
