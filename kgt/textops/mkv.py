"""From-scratch Matroska/WebM (EBML) CONTAINER parser — pure stdlib.

Scope, stated honestly: walks the EBML element tree — variable-length
element IDs and sizes, Segment → Info (TimestampScale, Duration) and
Tracks → TrackEntry (type, CodecID, Video dims, Audio rate/channels)
— the metadata a curation pipeline extracts from .mkv/.webm files.
It does NOT decode frames (codec payloads stay env-gated, same
contract as mp4.py).  ``encode_mkv`` builds a minimal structurally
valid fixture so the walker is testable offline.
"""

from __future__ import annotations

import struct

# element IDs (with marker bits, as they appear on the wire)
EBML_HEADER = 0x1A45DFA3
SEGMENT = 0x18538067
INFO = 0x1549A966
TIMESTAMP_SCALE = 0x2AD7B1
DURATION = 0x4489
TRACKS = 0x1654AE6B
TRACK_ENTRY = 0xAE
TRACK_TYPE = 0x83
CODEC_ID = 0x86
VIDEO = 0xE0
PIXEL_WIDTH = 0xB0
PIXEL_HEIGHT = 0xBA
AUDIO = 0xE1
SAMPLING_FREQUENCY = 0xB5
CHANNELS = 0x9F

_CONTAINERS = {SEGMENT, INFO, TRACKS, TRACK_ENTRY, VIDEO, AUDIO}


def _read_id(payload: bytes, pos: int) -> tuple[int, int]:
    """EBML element ID: 1-4 bytes, length from leading zeros of the
    first byte; marker bit KEPT (IDs are conventionally written with
    it)."""
    if pos >= len(payload):
        raise ValueError("truncated EBML element id")
    b0 = payload[pos]
    for n in range(1, 5):
        if b0 & (0x80 >> (n - 1)):
            if pos + n > len(payload):
                raise ValueError("truncated EBML element id")
            return int.from_bytes(payload[pos : pos + n], "big"), pos + n
    raise ValueError(f"invalid EBML id byte 0x{b0:02X} at offset {pos}")


def _read_size(payload: bytes, pos: int) -> tuple[int, int]:
    """EBML data size: 1-8 bytes, marker bit STRIPPED."""
    if pos >= len(payload):
        raise ValueError("truncated EBML size")
    b0 = payload[pos]
    for n in range(1, 9):
        if b0 & (0x80 >> (n - 1)):
            if pos + n > len(payload):
                raise ValueError("truncated EBML size")
            raw = int.from_bytes(payload[pos : pos + n], "big")
            val = raw - ((0x80 >> (n - 1)) << (8 * (n - 1)))
            if val == (1 << (7 * n)) - 1:
                # all VINT_DATA bits set = EBML "unknown size" (live/
                # streamed muxers write the Segment this way); signal
                # the caller to extend the element to its parent's end
                return None, pos + n
            return val, pos + n
    raise ValueError(f"invalid EBML size byte 0x{b0:02X} at offset {pos}")


def walk_ebml(payload: bytes, start: int, end: int):
    """Yield (element_id, body_start, body_end) for the elements of
    payload[start:end]."""
    pos = start
    while pos < end:
        eid, pos = _read_id(payload, pos)
        size, pos = _read_size(payload, pos)
        if size is None:
            # unknown-size element: extends to the end of its parent
            # (the spec's termination-by-next-sibling refinement only
            # matters for mid-parent unknown sizes, which real muxers
            # don't emit — they use it for the trailing Segment/Cluster)
            yield eid, pos, end
            return
        if pos + size > end:
            raise ValueError(
                f"EBML element 0x{eid:X} overruns its parent at {pos}"
            )
        yield eid, pos, pos + size
        pos += size


def _uint(payload: bytes, s: int, e: int) -> int:
    return int.from_bytes(payload[s:e], "big")


def _float(payload: bytes, s: int, e: int) -> float:
    if e - s == 4:
        return struct.unpack(">f", payload[s:e])[0]
    if e - s == 8:
        return struct.unpack(">d", payload[s:e])[0]
    raise ValueError(f"EBML float must be 4 or 8 bytes, got {e - s}")


def parse_mkv(payload: bytes) -> dict:
    """Matroska/WebM → {timestamp_scale, duration_ms, n_tracks,
    tracks: [{type: 'video'|'audio'|other-int, codec, width, height,
    sample_rate, channels}]}.

    duration_ms = floor(duration·scale/1e6 + 0.5), half-up like the
    engine's other duration fields.
    """
    top = list(walk_ebml(payload, 0, len(payload)))
    if not top or top[0][0] != EBML_HEADER:
        raise ValueError("not an EBML/Matroska stream (missing header)")
    seg = next(((s, e) for i, s, e in top if i == SEGMENT), None)
    if seg is None:
        raise ValueError("Matroska stream has no Segment")
    scale = 1_000_000  # nanoseconds per tick, the spec default
    duration_ticks = None
    tracks = []
    for eid, s, e in walk_ebml(payload, *seg):
        if eid == INFO:
            for iid, is_, ie in walk_ebml(payload, s, e):
                if iid == TIMESTAMP_SCALE:
                    scale = _uint(payload, is_, ie)
                elif iid == DURATION:
                    duration_ticks = _float(payload, is_, ie)
        elif eid == TRACKS:
            for tid, ts, te in walk_ebml(payload, s, e):
                if tid != TRACK_ENTRY:
                    continue
                tr = {
                    "type": None, "codec": None, "width": None,
                    "height": None, "sample_rate": None, "channels": None,
                }
                for fid, fs, fe in walk_ebml(payload, ts, te):
                    if fid == TRACK_TYPE:
                        t = _uint(payload, fs, fe)
                        tr["type"] = {1: "video", 2: "audio"}.get(t, t)
                    elif fid == CODEC_ID:
                        tr["codec"] = payload[fs:fe].decode("latin-1")
                    elif fid == VIDEO:
                        for vid, vs, ve in walk_ebml(payload, fs, fe):
                            if vid == PIXEL_WIDTH:
                                tr["width"] = _uint(payload, vs, ve)
                            elif vid == PIXEL_HEIGHT:
                                tr["height"] = _uint(payload, vs, ve)
                    elif fid == AUDIO:
                        for aid, as_, ae in walk_ebml(payload, fs, fe):
                            if aid == SAMPLING_FREQUENCY:
                                tr["sample_rate"] = int(
                                    _float(payload, as_, ae)
                                )
                            elif aid == CHANNELS:
                                tr["channels"] = _uint(payload, as_, ae)
                tracks.append(tr)
    import math

    duration_ms = (
        None
        if duration_ticks is None
        else int(math.floor(duration_ticks * scale / 1e6 + 0.5))
    )
    return {
        "timestamp_scale": scale,
        "duration_ms": duration_ms,
        "n_tracks": len(tracks),
        "tracks": tracks,
    }


# ------------------------------------------------------------- fixtures


def _esize(n: int) -> bytes:
    """Encode a data size in the shortest EBML form."""
    for ln in range(1, 9):
        if n < (0x80 >> (ln - 1)) << (8 * (ln - 1)):
            raw = n | ((0x80 >> (ln - 1)) << (8 * (ln - 1)))
            return raw.to_bytes(ln, "big")
    raise ValueError("size too large")


def _elem(eid: int, body: bytes) -> bytes:
    nid = (eid.bit_length() + 7) // 8
    return eid.to_bytes(nid, "big") + _esize(len(body)) + body


def encode_mkv(
    duration_ms: float,
    tracks: list[dict],
    timestamp_scale: int = 1_000_000,
) -> bytes:
    """Minimal structurally-valid Matroska fixture.  Track dicts:
    type ('video'/'audio'), codec, width/height or
    sample_rate/channels."""
    header = _elem(EBML_HEADER, b"")
    info = _elem(
        INFO,
        _elem(TIMESTAMP_SCALE, timestamp_scale.to_bytes(4, "big"))
        + _elem(
            DURATION,
            struct.pack(">d", duration_ms * 1e6 / timestamp_scale),
        ),
    )
    entries = b""
    for t in tracks:
        body = _elem(
            TRACK_TYPE, bytes([1 if t["type"] == "video" else 2])
        ) + _elem(CODEC_ID, t["codec"].encode("latin-1"))
        if t["type"] == "video":
            body += _elem(
                VIDEO,
                _elem(PIXEL_WIDTH, t["width"].to_bytes(2, "big"))
                + _elem(PIXEL_HEIGHT, t["height"].to_bytes(2, "big")),
            )
        else:
            body += _elem(
                AUDIO,
                _elem(
                    SAMPLING_FREQUENCY,
                    struct.pack(">d", float(t["sample_rate"])),
                )
                + _elem(CHANNELS, bytes([t["channels"]])),
            )
        entries += _elem(TRACK_ENTRY, body)
    segment = _elem(SEGMENT, info + _elem(TRACKS, entries))
    return header + segment


def decode_frames(payload: bytes):
    """Matroska frame decode needs the track codec — not in scope;
    raises NotImplementedError naming the gap (use parse_mkv for the
    metadata surface)."""
    raise NotImplementedError(
        "Matroska frame decode is not implemented (EBML walking/metadata "
        "is — use parse_mkv); codec payloads need libraries not present "
        "in this environment"
    )
