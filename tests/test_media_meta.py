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
