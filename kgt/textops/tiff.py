"""From-scratch TIFF (baseline 6.0) IFD METADATA parser — pure stdlib.

Scope, stated honestly: walks the image file directory — byte-order
header (II/MM + magic 42), IFD entry table (tag/type/count/value with
inline-vs-offset resolution for the numeric types) — extracting dims,
bits per sample, samples per pixel, compression and page count (IFD
chain).  Strip/tile pixel data is NOT decoded (LZW/PackBits/JPEG-in-
TIFF payloads stay out of scope; ``decode_pixels`` raises the usual
env-gated NotImplementedError).  ``encode_tiff_header`` writes a
minimal valid single- or multi-page fixture.
"""

from __future__ import annotations

import struct

_TYPE_SIZES = {1: 1, 2: 1, 3: 2, 4: 4, 5: 8}  # BYTE ASCII SHORT LONG RATIONAL

TAG_WIDTH = 256
TAG_HEIGHT = 257
TAG_BITS = 258
TAG_COMPRESSION = 259
TAG_SAMPLES = 277

_COMPRESSION_NAMES = {
    1: "none", 2: "ccitt-rle", 5: "lzw", 6: "jpeg-old", 7: "jpeg",
    8: "deflate", 32773: "packbits",
}


def _read_value(payload: bytes, endian: str, etype: int, count: int, raw: bytes):
    """First numeric value of an IFD entry (inline when it fits the
    4-byte field, else at the pointed offset)."""
    size = _TYPE_SIZES.get(etype)
    if size is None:
        return None
    total = size * count
    if total <= 4:
        data = raw[:total]
    else:
        (off,) = struct.unpack(endian + "I", raw)
        data = payload[off : off + total]
        if len(data) != total:
            raise ValueError("TIFF value offset out of bounds")
    if etype == 3:
        return struct.unpack(endian + "H", data[:2])[0]
    if etype == 4:
        return struct.unpack(endian + "I", data[:4])[0]
    if etype == 1:
        return data[0]
    return None


def parse_tiff(payload: bytes) -> dict:
    """TIFF → {byte_order: 'little'|'big', n_pages, width, height,
    bits_per_sample, samples_per_pixel, compression} (dims etc. from
    the FIRST IFD; n_pages counts the IFD chain)."""
    if payload[:4] == b"II\x2a\x00":
        endian = "<"
        order = "little"
    elif payload[:4] == b"MM\x00\x2a":
        endian = ">"
        order = "big"
    else:
        raise ValueError("not a TIFF (bad byte-order/magic header)")
    (ifd_off,) = struct.unpack(endian + "I", payload[4:8])
    first = None
    n_pages = 0
    seen = set()
    while ifd_off:
        if ifd_off in seen:
            raise ValueError("TIFF IFD chain loops")
        seen.add(ifd_off)
        if ifd_off + 2 > len(payload):
            raise ValueError("truncated TIFF IFD")
        (n_entries,) = struct.unpack(
            endian + "H", payload[ifd_off : ifd_off + 2]
        )
        end = ifd_off + 2 + 12 * n_entries
        if end + 4 > len(payload):
            raise ValueError("truncated TIFF IFD entry table")
        if first is None:
            first = {}
            for i in range(n_entries):
                e = payload[ifd_off + 2 + 12 * i : ifd_off + 2 + 12 * i + 12]
                tag, etype, count = struct.unpack(endian + "HHI", e[:8])
                first[tag] = _read_value(payload, endian, etype, count, e[8:])
        n_pages += 1
        (ifd_off,) = struct.unpack(endian + "I", payload[end : end + 4])
    if first is None:
        raise ValueError("TIFF has no IFD")
    if TAG_WIDTH not in first or TAG_HEIGHT not in first:
        raise ValueError("TIFF first IFD lacks ImageWidth/ImageLength")
    comp = first.get(TAG_COMPRESSION, 1)
    return {
        "byte_order": order,
        "n_pages": n_pages,
        "width": first[TAG_WIDTH],
        "height": first[TAG_HEIGHT],
        "bits_per_sample": first.get(TAG_BITS, 1),
        "samples_per_pixel": first.get(TAG_SAMPLES, 1),
        "compression": _COMPRESSION_NAMES.get(comp, str(comp)),
    }


def encode_tiff_header(
    pages: list[tuple[int, int]],
    bits: int = 8,
    samples: int = 3,
    compression: int = 1,
    big_endian: bool = False,
) -> bytes:
    """Minimal valid fixture: one IFD per (width, height) page, SHORT/
    LONG entries only, no pixel data."""
    endian = ">" if big_endian else "<"
    out = bytearray(
        (b"MM\x00\x2a" if big_endian else b"II\x2a\x00")
        + struct.pack(endian + "I", 8)
    )
    for pi, (w, h) in enumerate(pages):
        entries = [
            (TAG_WIDTH, 4, 1, w),
            (TAG_HEIGHT, 4, 1, h),
            (TAG_BITS, 3, 1, bits),
            (TAG_COMPRESSION, 3, 1, compression),
            (TAG_SAMPLES, 3, 1, samples),
        ]
        out += struct.pack(endian + "H", len(entries))
        for tag, etype, count, val in entries:
            raw = struct.pack(
                endian + ("H" if etype == 3 else "I"), val
            )
            raw = raw + bytes(4 - len(raw))
            out += struct.pack(endian + "HHI", tag, etype, count) + raw
        next_off = len(out) + 4 if pi + 1 < len(pages) else 0
        out += struct.pack(endian + "I", next_off)
    return bytes(out)


def decode_pixels(payload: bytes):
    """TIFF strip/tile decode (LZW/PackBits/JPEG-in-TIFF) is out of
    scope; raises NotImplementedError naming the gap — use parse_tiff
    for the metadata surface."""
    raise NotImplementedError(
        "TIFF pixel decode is not implemented (IFD metadata parsing is "
        "— use parse_tiff); strip/tile codecs are out of scope for this "
        "engine"
    )
