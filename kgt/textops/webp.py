"""From-scratch WebP CONTAINER parser — pure stdlib.

Scope, stated honestly: parses the RIFF/WEBP chunk layout and the
three frame-header flavors — lossy VP8 keyframe (3-byte frame tag +
9D 01 2A start code + 14-bit dims), lossless VP8L (0x2F signature +
packed 14-bit dims + alpha/version bits) and extended VP8X (flag byte
+ 24-bit canvas dims) — the dims/flags/format metadata a curation
pipeline extracts.  It does NOT decode pixels: VP8 (boolean-coded
DCT) and VP8L (huffman+LZ77+transforms) payload decoding stays an
env-gated NotImplementedError, same contract as the other
compressed-codec stubs.

``encode_webp_header`` builds structurally valid fixture files (real
headers + zero payloads) so the parser is testable offline.
"""

from __future__ import annotations

import struct


def parse_webp(payload: bytes) -> dict:
    """WebP → {format: 'vp8'|'vp8l'|'vp8x', width, height, has_alpha,
    has_animation}.  Dims come from the first frame header (vp8/vp8l)
    or the canvas (vp8x)."""
    if payload[:4] != b"RIFF" or payload[8:12] != b"WEBP":
        raise ValueError("not a WebP (bad RIFF/WEBP signature)")
    (riff_size,) = struct.unpack("<I", payload[4:8])
    if riff_size != len(payload) - 8:
        raise ValueError(
            f"RIFF size {riff_size} != payload size {len(payload) - 8}"
        )
    pos = 12
    while pos + 8 <= len(payload):
        tag = payload[pos : pos + 4]
        (ln,) = struct.unpack("<I", payload[pos + 4 : pos + 8])
        data = payload[pos + 8 : pos + 8 + ln]
        if len(data) != ln:
            raise ValueError(f"truncated WebP chunk {tag!r}")
        if tag == b"VP8 ":
            if ln < 10:
                raise ValueError("VP8 chunk too short for a frame header")
            if data[0] & 1:
                raise ValueError("VP8 first frame is not a keyframe")
            if data[3:6] != b"\x9d\x01\x2a":
                raise ValueError("VP8 keyframe start code missing")
            w, h = struct.unpack("<HH", data[6:10])
            return {
                "format": "vp8",
                "width": w & 0x3FFF,
                "height": h & 0x3FFF,
                "has_alpha": False,
                "has_animation": False,
            }
        if tag == b"VP8L":
            if ln < 5:
                raise ValueError("VP8L chunk too short for a header")
            if data[0] != 0x2F:
                raise ValueError("VP8L signature byte missing")
            (bits,) = struct.unpack("<I", data[1:5])
            w = (bits & 0x3FFF) + 1
            h = ((bits >> 14) & 0x3FFF) + 1
            alpha = bool((bits >> 28) & 1)
            version = (bits >> 29) & 7
            if version != 0:
                raise ValueError(f"unknown VP8L version {version}")
            return {
                "format": "vp8l",
                "width": w,
                "height": h,
                "has_alpha": alpha,
                "has_animation": False,
            }
        if tag == b"VP8X":
            if ln < 10:
                raise ValueError("VP8X chunk too short")
            flags = data[0]
            w = int.from_bytes(data[4:7], "little") + 1
            h = int.from_bytes(data[7:10], "little") + 1
            return {
                "format": "vp8x",
                "width": w,
                "height": h,
                "has_alpha": bool(flags & 0x10),
                "has_animation": bool(flags & 0x02),
            }
        pos += 8 + ln + (ln & 1)  # chunks pad to even offsets
    raise ValueError("WebP has no VP8/VP8L/VP8X chunk")


def encode_webp_header(
    width: int,
    height: int,
    fmt: str = "vp8l",
    has_alpha: bool = False,
    has_animation: bool = False,
) -> bytes:
    """Structurally valid fixture: real frame/canvas header, zeroed
    payload (the parser reads headers, not pixels)."""
    # VP8 stores RAW 14-bit dims (max 16383); VP8L/VP8X store dim-1
    # (max 16384) — 16384 in a vp8 header would silently wrap to 0
    # with bit 14 bleeding into the scale flag (round-6 review find)
    max_dim = 0x3FFF if fmt == "vp8" else 0x4000
    if not (1 <= width <= max_dim and 1 <= height <= max_dim):
        raise ValueError(f"WebP {fmt} dims must be 1..{max_dim}")
    if fmt == "vp8l":
        bits = (width - 1) | ((height - 1) << 14) | (int(has_alpha) << 28)
        body = bytes([0x2F]) + struct.pack("<I", bits) + bytes(8)
        chunk = b"VP8L" + struct.pack("<I", len(body)) + body
    elif fmt == "vp8":
        body = (
            bytes([0x00, 0x00, 0x00])  # keyframe tag
            + b"\x9d\x01\x2a"
            + struct.pack("<HH", width, height)
            + bytes(8)
        )
        chunk = b"VP8 " + struct.pack("<I", len(body)) + body
    elif fmt == "vp8x":
        flags = (0x10 if has_alpha else 0) | (0x02 if has_animation else 0)
        body = (
            bytes([flags, 0, 0, 0])
            + (width - 1).to_bytes(3, "little")
            + (height - 1).to_bytes(3, "little")
        )
        chunk = b"VP8X" + struct.pack("<I", len(body)) + body
    else:
        raise ValueError("fmt must be 'vp8', 'vp8l' or 'vp8x'")
    if len(chunk) % 2:
        chunk += b"\x00"
    body_all = b"WEBP" + chunk
    return b"RIFF" + struct.pack("<I", len(body_all)) + body_all


def decode_pixels(payload: bytes):
    """VP8/VP8L payload decoding is not implemented (boolean-coded DCT
    / huffman+LZ77 transforms need far more than header parsing);
    raises NotImplementedError naming the gap — use parse_webp for the
    metadata surface."""
    raise NotImplementedError(
        "WebP pixel decode is not implemented (container/header parsing "
        "is — use parse_webp); VP8/VP8L payloads need codec machinery "
        "out of scope for this engine"
    )
