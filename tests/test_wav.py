"""From-scratch RIFF/WAVE codec (kgt/textops/multimodal.py): round
trips, chunk-walk padding, and the documented error surface — the WAV
twin of test_png.py."""

import struct

import pytest
from hypothesis import given, settings, strategies as st

from kgt.textops.multimodal import decode_wav, encode_wav


@settings(max_examples=40, deadline=None)
@given(
    nch=st.integers(1, 4),
    rate=st.sampled_from([8000, 16000, 22050, 44100]),
    n_frames=st.integers(1, 200),
    data=st.data(),
)
def test_roundtrip_16bit(nch, rate, n_frames, data):
    samples = data.draw(
        st.lists(
            st.integers(-32768, 32767),
            min_size=n_frames * nch,
            max_size=n_frames * nch,
        )
    )
    payload = encode_wav(nch, rate, samples)
    dn, dr, bits, nf, raw = decode_wav(payload)
    assert (dn, dr, bits, nf) == (nch, rate, 16, n_frames)
    assert list(struct.unpack(f"<{len(samples)}h", raw)) == samples


def test_roundtrip_8bit():
    payload = encode_wav(1, 8000, [0, 1, 127, 128, 255], bits=8)
    dn, dr, bits, nf, raw = decode_wav(payload)
    assert (dn, dr, bits, nf) == (1, 8000, 8, 5)
    assert list(raw) == [0, 1, 127, 128, 255]


def test_chunk_walk_skips_padded_metadata_chunk():
    """Chunks are even-padded per the RIFF spec; an odd-length LIST
    chunk between fmt and data must be stepped over correctly."""
    good = encode_wav(1, 8000, [1, 2, 3])
    extra = b"LIST" + struct.pack("<I", 3) + b"abc" + b"\x00"
    body = good[8:36] + extra + good[36:]
    spliced = b"RIFF" + struct.pack("<I", len(body)) + body
    dn, dr, bits, nf, raw = decode_wav(spliced)
    assert (dn, dr, bits, nf) == (1, 8000, 16, 3)
    assert list(struct.unpack("<3h", raw)) == [1, 2, 3]


def test_bad_signature():
    with pytest.raises(ValueError, match="RIFF/WAVE"):
        decode_wav(b"OggS" + b"\x00" * 40)


def test_truncation_detected():
    payload = encode_wav(1, 8000, [1, 2, 3])
    with pytest.raises(ValueError, match="RIFF size"):
        decode_wav(payload[:-2])


def test_data_before_fmt_rejected():
    body = b"WAVE" + b"data" + struct.pack("<I", 0)
    payload = b"RIFF" + struct.pack("<I", len(body)) + body
    with pytest.raises(ValueError, match="before fmt"):
        decode_wav(payload)


def test_partial_frame_rejected():
    good = encode_wav(2, 8000, [1, 2, 3, 4])
    # shrink the data chunk by one byte: 7 bytes is not whole 4-byte frames
    body = bytearray(good[8:])
    body[32:36] = struct.pack("<I", 7)  # the data chunk's length field
    payload = (
        b"RIFF" + struct.pack("<I", len(body) - 1) + bytes(body[:-1])
    )
    with pytest.raises(ValueError, match="whole number"):
        decode_wav(payload)


def test_non_pcm_format_raises_capability_error():
    fmt = struct.pack("<HHIIHH", 3, 1, 8000, 32000, 4, 32)  # IEEE float
    body = (
        b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"data" + struct.pack("<I", 0)
    )
    payload = b"RIFF" + struct.pack("<I", len(body)) + body
    with pytest.raises(NotImplementedError, match="format tag 3"):
        decode_wav(payload)


def test_mismatched_interleave_rejected():
    with pytest.raises(ValueError, match="interleave"):
        encode_wav(2, 8000, [1, 2, 3])


@pytest.mark.spark
def test_decode_audio_features_real_and_fake(spark):
    """The operator surface: fake mode derives checksum metadata; real
    mode genuinely parses the WAV bytes (and they disagree on purpose —
    proof the real path is not the stub)."""
    import pandas as pd

    from kgt.textops.multimodal import decode_audio_features

    rows = []
    for doc_id in range(6):
        nch = doc_id % 2 + 1
        rate = 8000 * (doc_id % 3 + 1)
        samples = [(doc_id * 7 + k) % 200 - 100 for k in range(10 * nch)]
        rows.append(
            (doc_id, encode_wav(nch, rate, samples), "audio/wav")
        )
    media = spark.createDataFrame(
        rows, "doc_id long, payload binary, media_type string"
    )
    real = {
        r["doc_id"]: r
        for r in decode_audio_features(media, fake=False).collect()
    }
    for doc_id in range(6):
        r = real[doc_id]
        assert r["n_channels"] == doc_id % 2 + 1
        assert r["sample_rate"] == 8000 * (doc_id % 3 + 1)
        assert r["bits"] == 16
        assert r["n_frames"] == 10
    fake = {
        r["doc_id"]: r
        for r in decode_audio_features(media, fake=True).collect()
    }
    assert any(
        fake[d]["sample_rate"] != real[d]["sample_rate"] for d in range(6)
    )
