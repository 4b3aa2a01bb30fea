"""From-scratch MP4 / ISO-BMFF (ISO/IEC 14496-12) BOX PARSER — pure
stdlib.

Scope, stated honestly: this walks the box tree — ftyp brand, movie
header (timescale/duration, 32- and 64-bit versions), per-track
headers (dimensions as 16.16 fixed point), media headers, handler
types, sample-description codec fourccs — the metadata a curation
pipeline extracts from video at scale.  It does NOT decode frames:
codec payloads (H.264/H.265/AAC…) stay env-gated
NotImplementedErrors in kgt.textops.multimodal, and ``decode_frames``
here raises the same way.

``encode_mp4`` builds a minimal structurally-valid fixture file
(ftyp + moov with mvhd and per-track trak/tkhd/mdia/mdhd/hdlr/stsd)
so the parser is testable offline.
"""

from __future__ import annotations

import struct


def walk_boxes(payload: bytes, start: int = 0, end: int | None = None):
    """Yield (box_type, body_start, body_end) for the top-level boxes
    of payload[start:end], validating sizes (size 1 → 64-bit
    largesize; size 0 → box extends to the end)."""
    end = len(payload) if end is None else end
    pos = start
    while pos < end:
        if end - pos < 8:
            raise ValueError(f"truncated MP4 box header at offset {pos}")
        (size,) = struct.unpack(">I", payload[pos : pos + 4])
        btype = payload[pos + 4 : pos + 8]
        body = pos + 8
        if size == 1:
            if end - pos < 16:
                raise ValueError(f"truncated 64-bit box size at offset {pos}")
            (size,) = struct.unpack(">Q", payload[pos + 8 : pos + 16])
            body = pos + 16
        elif size == 0:
            size = end - pos
        if size < body - pos or pos + size > end:
            raise ValueError(
                f"bad MP4 box size {size} for {btype!r} at offset {pos}"
            )
        yield btype, body, pos + size
        pos += size


def _full_box(payload: bytes, body: int):
    """(version, flags, payload offset after the version/flags word)."""
    if body + 4 > len(payload):
        raise ValueError(f"truncated MP4 full box at offset {body}")
    version = payload[body]
    flags = int.from_bytes(payload[body + 1 : body + 4], "big")
    return version, flags, body + 4


def _unpack_at(fmt: str, payload: bytes, p: int, what: str):
    """struct.unpack with the module's ValueError contract for
    truncation (struct.error would escape a curation pipeline's
    malformed-file handling)."""
    n = struct.calcsize(fmt)
    if p + n > len(payload):
        raise ValueError(f"truncated MP4 {what} at offset {p}")
    return struct.unpack(fmt, payload[p : p + n])


def _half_up_ms(duration: int, timescale: int) -> int:
    """floor(1000·duration/timescale + 0.5) in pure integers — the
    engine-wide half-UP duration convention (_media_meta_one), exact
    for 64-bit v1 durations where a float multiply would lose
    precision past 2^53."""
    return (2000 * duration + timescale) // (2 * timescale)


def parse_mp4(payload: bytes) -> dict:
    """Box-tree walk → metadata dict:

    major_brand, timescale, duration_ms (half-up
    floor(1000·duration/timescale + 0.5), integer-exact), n_tracks, and per-track dicts (track_id, handler
    'vide'/'soun'/…, width/height from tkhd 16.16 fixed point, media
    timescale/duration, codec fourcc from the first stsd entry).
    """
    major_brand = None
    timescale = duration = None
    tracks = []
    saw_moov = False
    for btype, body, bend in walk_boxes(payload):
        if btype == b"ftyp":
            major_brand = payload[body : body + 4].decode("latin-1")
        elif btype == b"moov":
            saw_moov = True
            for ctype, cbody, cend in walk_boxes(payload, body, bend):
                if ctype == b"mvhd":
                    v, _f, p = _full_box(payload, cbody)
                    if v == 1:
                        _c, _m, timescale, duration = _unpack_at(
                            ">QQIQ", payload, p, "mvhd v1"
                        )
                    else:
                        _c, _m, timescale, duration = _unpack_at(
                            ">IIII", payload, p, "mvhd"
                        )
                elif ctype == b"trak":
                    tracks.append(_parse_trak(payload, cbody, cend))
    if major_brand is None:
        raise ValueError("MP4 has no ftyp box")
    if not saw_moov or timescale is None:
        raise ValueError("MP4 has no moov/mvhd box")
    if timescale == 0:
        raise ValueError("MP4 mvhd timescale must be non-zero")
    return {
        "major_brand": major_brand,
        "timescale": timescale,
        "duration_ms": _half_up_ms(duration, timescale),
        "n_tracks": len(tracks),
        "tracks": tracks,
    }


def _parse_trak(payload: bytes, start: int, end: int) -> dict:
    track = {
        "track_id": None,
        "width": None,
        "height": None,
        "handler": None,
        "media_timescale": None,
        "media_duration": None,
        "codec": None,
    }
    for btype, body, bend in walk_boxes(payload, start, end):
        if btype == b"tkhd":
            v, _f, p = _full_box(payload, body)
            # v0: creation(4) mod(4) track_id(4) reserved(4) duration(4)
            #     reserved(8) layer/alt/volume/reserved(8) matrix(36) w h
            # v1: creation(8) mod(8) track_id(4) reserved(4) duration(8) ...
            if v == 1:
                track["track_id"] = _unpack_at(">I", payload, p + 16, "tkhd v1")[0]
                geo = p + 32 + 8 + 8 + 36
            else:
                track["track_id"] = _unpack_at(">I", payload, p + 8, "tkhd")[0]
                geo = p + 20 + 8 + 8 + 36
            w_fp, h_fp = _unpack_at(">II", payload, geo, "tkhd geometry")
            track["width"] = w_fp / 65536.0
            track["height"] = h_fp / 65536.0
        elif btype == b"mdia":
            for ctype, cbody, cend in walk_boxes(payload, body, bend):
                if ctype == b"mdhd":
                    v, _f, p = _full_box(payload, cbody)
                    if v == 1:
                        _c, _m, ts, dur = _unpack_at(
                            ">QQIQ", payload, p, "mdhd v1"
                        )
                    else:
                        _c, _m, ts, dur = _unpack_at(
                            ">IIII", payload, p, "mdhd"
                        )
                    track["media_timescale"], track["media_duration"] = ts, dur
                elif ctype == b"hdlr":
                    _v, _f, p = _full_box(payload, cbody)
                    track["handler"] = payload[p + 4 : p + 8].decode("latin-1")
                elif ctype == b"minf":
                    for mtype, mbody, mend in walk_boxes(payload, cbody, cend):
                        if mtype == b"stbl":
                            for stype, sbody, send in walk_boxes(
                                payload, mbody, mend
                            ):
                                if stype == b"stsd":
                                    _v, _f, p = _full_box(payload, sbody)
                                    (n_entries,) = _unpack_at(
                                        ">I", payload, p, "stsd"
                                    )
                                    if n_entries:
                                        track["codec"] = payload[
                                            p + 8 : p + 12
                                        ].decode("latin-1")
    return track


# ------------------------------------------------------------- fixtures


def _box(btype: bytes, body: bytes) -> bytes:
    return struct.pack(">I", len(body) + 8) + btype + body


def _full(btype: bytes, version: int, flags: int, body: bytes) -> bytes:
    return _box(btype, bytes([version]) + flags.to_bytes(3, "big") + body)


def encode_mp4(
    timescale: int,
    duration: int,
    tracks: list[dict],
    major_brand: str = "isom",
    mvhd_version: int = 0,
) -> bytes:
    """Minimal structurally-valid fixture: ftyp + moov(mvhd + trak*).
    Each track dict: track_id, handler ('vide'/'soun'), width, height
    (ints), media_timescale, media_duration, codec (4 chars)."""
    ftyp = _box(b"ftyp", major_brand.encode("latin-1") + struct.pack(">I", 0) + b"isomiso2")
    if mvhd_version == 1:
        mvhd_body = struct.pack(">QQIQ", 0, 0, timescale, duration)
    else:
        mvhd_body = struct.pack(">IIII", 0, 0, timescale, duration)
    mvhd_body += struct.pack(">I", 0x00010000) + struct.pack(">H", 0x0100)
    mvhd_body += bytes(10) + _IDENTITY_MATRIX + bytes(24) + struct.pack(">I", len(tracks) + 1)
    moov_children = _full(b"mvhd", mvhd_version, 0, mvhd_body)
    for t in tracks:
        tkhd_body = struct.pack(">II", 0, 0) + struct.pack(">I", t["track_id"])
        tkhd_body += struct.pack(">II", 0, 0)  # reserved + duration
        tkhd_body += bytes(8)  # reserved(8)
        tkhd_body += struct.pack(">HHHH", 0, 0, 0, 0) + _IDENTITY_MATRIX
        tkhd_body += struct.pack(
            ">II", int(t["width"]) << 16, int(t["height"]) << 16
        )
        tkhd = _full(b"tkhd", 0, 7, tkhd_body)
        mdhd_body = struct.pack(
            ">IIII", 0, 0, t["media_timescale"], t["media_duration"]
        ) + struct.pack(">HH", 0x55C4, 0)  # language 'und'
        mdhd = _full(b"mdhd", 0, 0, mdhd_body)
        hdlr = _full(
            b"hdlr",
            0,
            0,
            struct.pack(">I", 0)
            + t["handler"].encode("latin-1")
            + bytes(12)
            + b"\x00",
        )
        entry = struct.pack(">I", 16) + t["codec"].encode("latin-1") + bytes(8)
        stsd = _full(b"stsd", 0, 0, struct.pack(">I", 1) + entry)
        stbl = _box(b"stbl", stsd)
        minf = _box(b"minf", stbl)
        mdia = _box(b"mdia", mdhd + hdlr + minf)
        moov_children += _box(b"trak", tkhd + mdia)
    return ftyp + _box(b"moov", moov_children)


_IDENTITY_MATRIX = struct.pack(
    ">9I", 0x00010000, 0, 0, 0, 0x00010000, 0, 0, 0, 0x40000000
)


def decode_frames(payload: bytes):
    """Frame decode needs the track's codec (H.264/H.265/AAC…) — not
    implementable pure-stdlib at reasonable size.  Raises
    NotImplementedError naming the gap (same contract as the other
    compressed-codec stubs); use parse_mp4 for the metadata surface."""
    raise NotImplementedError(
        "MP4 frame decode is not implemented (box walking/metadata is — "
        "use parse_mp4); codec payloads need libraries not present in "
        "this environment"
    )
