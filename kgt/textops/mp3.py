"""From-scratch MPEG audio (MP3) FRAME WALKER — pure stdlib.

Scope, stated honestly: this parses the container framing — ID3v2
skip, frame-header sync, bitrate/samplerate tables, frame lengths,
CBR/VBR detection, duration — which is the metadata a training-data
curation pipeline extracts at scale.  It does NOT decode PCM: full
Layer III synthesis (huffman, IMDCT, polyphase filterbank) stays an
env-gated NotImplementedError in kgt.textops.multimodal, and
``decode_pcm`` here raises the same way.

Tables are from the public MPEG-1/2 audio spec (ISO/IEC 11172-3 /
13818-3).  The companion ``encode_mp3_frames`` builds structurally
valid fixture streams (correct headers + sized zero payloads) so the
walker is testable offline without codec libraries.
"""

from __future__ import annotations

# bitrate kbps by [version_key][bitrate_index 1..14]; version_key:
# 1 = MPEG-1 Layer III, 2 = MPEG-2/2.5 Layer III
_BITRATES = {
    1: [None, 32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320],
    2: [None, 8, 16, 24, 32, 40, 48, 56, 64, 80, 96, 112, 128, 144, 160],
}
# sample rate by [version_bits][samplerate_index 0..2]
_RATES = {
    3: [44100, 48000, 32000],  # MPEG-1  (version bits 11)
    2: [22050, 24000, 16000],  # MPEG-2  (version bits 10)
    0: [11025, 12000, 8000],   # MPEG-2.5 (version bits 00)
}
_SAMPLES_PER_FRAME = {3: 1152, 2: 576, 0: 576}  # Layer III
_CHANNELS = {0: 2, 1: 2, 2: 2, 3: 1}  # stereo/joint/dual/mono


def _id3v2_size(payload: bytes) -> int:
    """Bytes to skip for a leading ID3v2 tag (0 if none).  The size
    field is a 28-bit sync-safe integer (4×7 bits)."""
    if payload[:3] != b"ID3" or len(payload) < 10:
        return 0
    b = payload[6:10]
    if any(x & 0x80 for x in b):
        raise ValueError("ID3v2 size bytes must be sync-safe (high bit 0)")
    size = (b[0] << 21) | (b[1] << 14) | (b[2] << 7) | b[3]
    # ID3v2.4 footer flag (bit 4 of the flags byte): a 10-byte '3DI'
    # footer FOLLOWS the size-counted body (round-6 review find —
    # ignoring it left the footer mid-stream and broke the frame walk)
    footer = 10 if payload[5] & 0x10 else 0
    return 10 + size + footer


def parse_frame_header(b: bytes):
    """4 header bytes → (version_bits, bitrate_kbps, sample_rate,
    channels, padding, frame_bytes, samples) or None if not a valid
    Layer III frame header."""
    if len(b) < 4 or b[0] != 0xFF or (b[1] & 0xE0) != 0xE0:
        return None
    version = (b[1] >> 3) & 3
    layer = (b[1] >> 1) & 3
    if version == 1 or layer != 1:  # reserved version, or not Layer III
        return None
    br_idx = (b[2] >> 4) & 15
    sr_idx = (b[2] >> 2) & 3
    if br_idx in (0, 15) or sr_idx == 3:  # free-format / bad indices
        return None
    padding = (b[2] >> 1) & 1
    mode = (b[3] >> 6) & 3
    vkey = 1 if version == 3 else 2
    bitrate = _BITRATES[vkey][br_idx]
    rate = _RATES[version][sr_idx]
    samples = _SAMPLES_PER_FRAME[version]
    frame_bytes = (samples // 8) * bitrate * 1000 // rate + padding
    return (version, bitrate, rate, _CHANNELS[mode], padding, frame_bytes, samples)


def parse_mp3(payload: bytes) -> dict:
    """Walk every frame → stream metadata dict:

    n_frames, sample_rate, channels, duration_ms (sum of per-frame
    samples/rate, exact integer math: round(1000·total_samples/rate)),
    bitrate_mode ('cbr'/'vbr'), bitrate_kbps (CBR value or
    byte-weighted mean rounded down), id3v2_bytes.

    Strict walking: after the optional ID3v2 tag, the stream must be
    frames back-to-back; junk between frames raises ValueError (a
    curation pipeline wants corrupt files flagged, not resynced
    silently).
    """
    skip = _id3v2_size(payload)
    pos = skip
    if pos >= len(payload):
        raise ValueError("MP3 has no audio frames after the ID3v2 tag")
    n_frames = 0
    total_samples = 0
    rate = channels = None
    bitrates = []
    frame_byte_total = 0
    while pos < len(payload):
        if len(payload) - pos < 4:
            raise ValueError(f"truncated MP3 frame header at offset {pos}")
        if payload[pos : pos + 3] == b"TAG" and len(payload) - pos == 128:
            # standard 128-byte ID3v1 trailer — end of audio frames
            # (round-6 review find: it was rejected as bad frame sync,
            # flagging a large share of real-world MP3s as corrupt)
            break
        hdr = parse_frame_header(payload[pos : pos + 4])
        if hdr is None:
            raise ValueError(f"invalid MP3 frame sync at offset {pos}")
        _v, bitrate, r, ch, _pad, fbytes, samples = hdr
        if rate is None:
            rate, channels = r, ch
        elif r != rate:
            raise ValueError(
                f"sample-rate change mid-stream at offset {pos} "
                f"({rate} -> {r})"
            )
        if pos + fbytes > len(payload):
            raise ValueError(
                f"truncated MP3 frame at offset {pos}: need {fbytes} bytes, "
                f"have {len(payload) - pos}"
            )
        n_frames += 1
        total_samples += samples
        bitrates.append(bitrate)
        frame_byte_total += fbytes
        pos += fbytes
    cbr = len(set(bitrates)) == 1
    if cbr:
        kbps = bitrates[0]
    else:
        # byte-weighted mean: total bits / duration, floored
        kbps = frame_byte_total * 8 * rate // (total_samples * 1000)
    return {
        "n_frames": n_frames,
        "sample_rate": rate,
        "channels": channels,
        "duration_ms": round(1000 * total_samples / rate),
        "bitrate_mode": "cbr" if cbr else "vbr",
        "bitrate_kbps": kbps,
        "id3v2_bytes": skip,
    }


def encode_mp3_frames(
    n_frames: int,
    bitrate_kbps: int = 128,
    sample_rate: int = 44100,
    channels: int = 2,
    id3_payload: bytes = b"",
    bitrate_pattern: list[int] | None = None,
) -> bytes:
    """Structurally valid MPEG-1 Layer III fixture stream: correct
    frame headers and frame lengths with zeroed payloads (the walker
    parses framing, not audio — see module docstring).  Pass
    ``bitrate_pattern`` for a VBR fixture."""
    sr_idx = {44100: 0, 48000: 1, 32000: 2}.get(sample_rate)
    if sr_idx is None:
        raise ValueError("fixture encoder supports MPEG-1 rates 44100/48000/32000")
    out = bytearray()
    if id3_payload:
        size = len(id3_payload)
        if size >= 1 << 28:
            raise ValueError("ID3v2 payload too large")
        ss = bytes(
            [(size >> 21) & 0x7F, (size >> 14) & 0x7F, (size >> 7) & 0x7F, size & 0x7F]
        )
        out += b"ID3\x04\x00\x00" + ss + id3_payload
    rates = bitrate_pattern or [bitrate_kbps] * n_frames
    if len(rates) != n_frames:
        raise ValueError("bitrate_pattern length must equal n_frames")
    for kbps in rates:
        br_idx = _BITRATES[1].index(kbps)
        b1 = 0xFF
        b2 = 0xE0 | (3 << 3) | (1 << 1) | 1  # MPEG-1, Layer III, no CRC
        b3 = (br_idx << 4) | (sr_idx << 2)  # no padding
        b4 = (0 if channels == 2 else 3) << 6
        fbytes = 144 * kbps * 1000 // sample_rate
        frame = bytearray([b1, b2, b3, b4]) + bytes(fbytes - 4)
        out += frame
    return bytes(out)


def decode_pcm(payload: bytes):
    """Full Layer III PCM synthesis is not implemented — huffman,
    IMDCT and the polyphase filterbank need either a codec library or
    several thousand lines of spec tables; the frame walker above
    covers the metadata surface.  Raises NotImplementedError naming
    the gap (same contract as the other compressed-codec stubs)."""
    raise NotImplementedError(
        "MP3 PCM decode is not implemented (frame walking/metadata is — "
        "use parse_mp3); full Layer III synthesis needs a codec library "
        "not present in this environment"
    )
