"""From-scratch YUV4MPEG2 codec + the real frame_sample path — the
video third of test_png.py / test_wav.py."""

import hashlib

import pytest
from hypothesis import given, settings, strategies as st

from kgt.textops.multimodal import decode_y4m, encode_y4m


@settings(max_examples=30, deadline=None)
@given(
    w2=st.integers(1, 16),
    h2=st.integers(1, 16),
    n_frames=st.integers(1, 6),
    seed=st.integers(0, 255),
)
def test_roundtrip(w2, h2, n_frames, seed):
    w, h = w2 * 2, h2 * 2
    fsz = w * h * 3 // 2
    frames = [
        bytes((seed + f * 31 + j) % 256 for j in range(fsz))
        for f in range(n_frames)
    ]
    payload = encode_y4m(w, h, frames, fps=(30, 1))
    gw, gh, fn, fd, got = decode_y4m(payload)
    assert (gw, gh, fn, fd) == (w, h, 30, 1)
    assert got == frames


def test_per_frame_params_tolerated():
    """The spec allows parameters after FRAME; the walk must skip them."""
    p = encode_y4m(2, 2, [bytes(6)])
    spliced = p.replace(b"FRAME\n", b"FRAME Xsay-what\n")
    assert decode_y4m(spliced)[4] == [bytes(6)]


def test_bad_magic():
    with pytest.raises(ValueError, match="magic"):
        decode_y4m(b"MPEG4 W2 H2\n")


def test_truncated_frame():
    p = encode_y4m(2, 2, [bytes(6), bytes(6)])
    with pytest.raises(ValueError, match="truncated"):
        decode_y4m(p[:-1])


def test_missing_frame_marker():
    p = encode_y4m(2, 2, [bytes(6)]) + b"JUNK"
    with pytest.raises(ValueError, match="FRAME marker"):
        decode_y4m(p)


def test_non_420_colorspace_capability_error():
    p = encode_y4m(2, 2, [bytes(6)]).replace(b"C420jpeg", b"C444aaaa")
    with pytest.raises(NotImplementedError, match="C444"):
        decode_y4m(p)


def test_odd_dims_rejected():
    with pytest.raises(ValueError, match="even"):
        encode_y4m(3, 2, [bytes(9)])


@pytest.mark.spark
def test_frame_sample_real_path(spark):
    """fake=False genuinely walks Y4M frames: sampled indices are the
    even temporal spread, timestamps follow the header fps, and the
    checksums are of the REAL plane bytes."""
    from kgt.textops.multimodal import frame_sample

    fsz = 4 * 2 * 3 // 2
    frames = [bytes((f * 7 + j) % 256 for j in range(fsz)) for f in range(8)]
    payload = encode_y4m(4, 2, frames, fps=(25, 1))
    media = spark.createDataFrame(
        [(1, payload, "video/y4m")],
        "doc_id long, payload binary, media_type string",
    )
    rows = sorted(
        frame_sample(media, n_frames=4, fake=False).collect(),
        key=lambda r: r["frame_idx"],
    )
    assert [r["frame_idx"] for r in rows] == [0, 2, 4, 6]
    assert [r["ts_ms"] for r in rows] == [0, 80, 160, 240]
    assert rows[1]["frame_checksum"] == hashlib.md5(frames[2]).hexdigest()
    # non-Y4M payload in real mode raises the capability error
    bad = spark.createDataFrame(
        [(2, b"\x00\x01\x02", "video/mp4")],
        "doc_id long, payload binary, media_type string",
    )
    with pytest.raises(Exception, match="YUV4MPEG2"):
        frame_sample(bad, n_frames=2, fake=False).collect()


def test_frame_marker_must_be_delimited():
    """'FRAMExyz' is not a frame header — the byte after FRAME must be
    a space (parameter list) or newline (round-4 ADVICE)."""
    p = encode_y4m(2, 2, [bytes(6)])
    junk = p.replace(b"FRAME\n", b"FRAMEX\n", 1)
    with pytest.raises(ValueError, match="FRAME marker"):
        decode_y4m(junk)
