"""From-scratch TIFF (baseline 6.0) parser — pure stdlib.

Metadata: walks the image file directory — byte-order header (II/MM +
magic 42), IFD entry table (tag/type/count/value with inline-vs-offset
resolution for the numeric types) — extracting dims, bits per sample,
samples per pixel, compression and page count (IFD chain).

Pixels (round 6): ``decode_pixels`` decodes the strip tiers real
corpora actually contain — compression 1 (uncompressed), 32773
(PackBits, TIFF 6.0 §9), 5 (LZW, TIFF 6.0 §13: MSB-first packing,
early width change, optional horizontal predictor tag 317) and, since
round 7, 8/32946 (Adobe/legacy deflate via stdlib zlib, optionally
predictor 2) — for 8-bit samples, both byte orders, multi-strip via
RowsPerStrip.  ``encode_tiff`` writes the matching real files (strip
layout + external value areas). The codec tiers no sandbox should
hand-roll (JPEG-in-TIFF, CCITT) still raise NotImplementedError
naming the gap.
"""

from __future__ import annotations

import struct
import zlib

_TYPE_SIZES = {1: 1, 2: 1, 3: 2, 4: 4, 5: 8}  # BYTE ASCII SHORT LONG RATIONAL

TAG_WIDTH = 256
TAG_HEIGHT = 257
TAG_BITS = 258
TAG_COMPRESSION = 259
TAG_PHOTOMETRIC = 262
TAG_STRIP_OFFSETS = 273
TAG_SAMPLES = 277
TAG_ROWS_PER_STRIP = 278
TAG_STRIP_BYTE_COUNTS = 279
TAG_PLANAR_CONFIG = 284
TAG_PREDICTOR = 317

# magic headers (shared by the multimodal sniffers — one source of
# truth instead of per-call-site tuples)
TIFF_SIGNATURES = (b"II\x2a\x00", b"MM\x00\x2a")


def is_tiff(payload: bytes) -> bool:
    return payload[:4] in TIFF_SIGNATURES

_COMPRESSION_NAMES = {
    1: "none", 2: "ccitt-rle", 5: "lzw", 6: "jpeg-old", 7: "jpeg",
    8: "deflate", 32773: "packbits", 32946: "deflate-old",
}

# strip compressions decode_pixels can actually decompress
_DECODABLE_COMPRESSIONS = (1, 32773, 5, 8, 32946)


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


def _read_value_list(payload, endian, etype, count, raw):
    """All numeric values of an IFD entry as a list (inline when they
    fit the 4-byte field, else at the pointed offset)."""
    size = _TYPE_SIZES.get(etype)
    if size is None or etype not in (1, 3, 4):
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
        return list(struct.unpack(endian + "H" * count, data))
    if etype == 4:
        return list(struct.unpack(endian + "I" * count, data))
    return list(data)


def packbits_decode(data: bytes, expected: int) -> bytes:
    """Apple PackBits (TIFF 6.0 §9): control byte n — 0..127 copies
    n+1 literals, 129..255 repeats the next byte 257-n times, 128 is a
    no-op. Decodes exactly ``expected`` bytes or raises."""
    out = bytearray()
    i = 0
    while i < len(data) and len(out) < expected:
        n = data[i]
        i += 1
        if n < 128:
            lit = data[i : i + n + 1]
            if len(lit) != n + 1:
                raise ValueError("truncated PackBits literal run")
            out += lit
            i += n + 1
        elif n > 128:
            if i >= len(data):
                raise ValueError("truncated PackBits repeat run")
            out += bytes([data[i]]) * (257 - n)
            i += 1
        # n == 128: no-op per spec
    if len(out) != expected:
        raise ValueError(
            f"PackBits strip decoded {len(out)} bytes, expected {expected}"
        )
    return bytes(out)


def packbits_encode(data: bytes) -> bytes:
    """PackBits encoder (repeat packets for runs ≥ 3, literal packets
    otherwise, 128-byte packet cap) — the round-trip partner of
    packbits_decode for fixtures and the encode_tiff strip writer."""
    out = bytearray()
    i = 0
    n = len(data)
    while i < n:
        # measure the run at i
        run = 1
        while i + run < n and run < 128 and data[i + run] == data[i]:
            run += 1
        if run >= 3:
            out += bytes([257 - run, data[i]])
            i += run
            continue
        # literal: scan until a run of >=3 starts (or 128-byte cap)
        j = i
        while j < n and j - i < 128:
            r = 1
            while j + r < n and r < 3 and data[j + r] == data[j]:
                r += 1
            if r >= 3:
                break
            j += 1
        out += bytes([j - i - 1]) + data[i:j]
        i = j
    return bytes(out)


def _header_endian(payload: bytes) -> str:
    if payload[:4] == b"II\x2a\x00":
        return "<"
    if payload[:4] == b"MM\x00\x2a":
        return ">"
    raise ValueError("not a TIFF (bad byte-order/magic header)")


def decode_pixels(payload: bytes) -> tuple[int, int, int, bytes]:
    """TIFF → (width, height, samples_per_pixel, pixel bytes
    row-major, sample-interleaved) for the baseline strip tiers:
    compression 1 (uncompressed) and 32773 (PackBits), 8-bit samples,
    either byte order, multi-strip.  LZW / JPEG-in-TIFF / deflate
    strips raise NotImplementedError naming the gap; malformed strip
    geometry raises ValueError."""
    endian = _header_endian(payload)
    (ifd_off,) = struct.unpack(endian + "I", payload[4:8])
    if ifd_off + 2 > len(payload):
        raise ValueError("truncated TIFF IFD")
    (n_entries,) = struct.unpack(endian + "H", payload[ifd_off : ifd_off + 2])
    if ifd_off + 2 + 12 * n_entries > len(payload):
        raise ValueError("truncated TIFF IFD entry table")
    entries: dict[int, list[int] | None] = {}
    for i in range(n_entries):
        e = payload[ifd_off + 2 + 12 * i : ifd_off + 2 + 12 * i + 12]
        tag, etype, count = struct.unpack(endian + "HHI", e[:8])
        entries[tag] = _read_value_list(payload, endian, etype, count, e[8:])

    def one(tag, default=None):
        v = entries.get(tag)
        return v[0] if v else default

    w, h = one(TAG_WIDTH), one(TAG_HEIGHT)
    if not w or not h:
        raise ValueError("TIFF first IFD lacks ImageWidth/ImageLength")
    bits = one(TAG_BITS, 1)
    samples = one(TAG_SAMPLES, 1)
    comp = one(TAG_COMPRESSION, 1)
    if comp not in _DECODABLE_COMPRESSIONS:
        name = _COMPRESSION_NAMES.get(comp, str(comp))
        raise NotImplementedError(
            f"TIFF strip decode supports compression none/packbits/lzw/"
            f"deflate; this file uses {name} (strip codec out of scope)"
        )
    predictor = one(TAG_PREDICTOR, 1)
    if predictor not in (1, 2):
        raise NotImplementedError(
            f"TIFF predictor {predictor} not supported (1=none, "
            f"2=horizontal differencing)"
        )
    if predictor == 2 and comp not in (5, 8, 32946):
        raise ValueError(
            "TIFF predictor 2 without LZW/deflate is not a layout this "
            "decoder recognizes"
        )
    if bits != 8:
        raise NotImplementedError(
            f"TIFF strip decode supports 8 bits per sample, got {bits}"
        )
    planar = one(TAG_PLANAR_CONFIG, 1)
    if planar != 1:
        # plane-ordered strips would decode "successfully" into
        # channel-scrambled bytes if ignored — refuse loudly instead
        raise NotImplementedError(
            f"TIFF strip decode supports chunky PlanarConfiguration=1, "
            f"got {planar} (planar strip layout out of scope)"
        )
    photometric = one(TAG_PHOTOMETRIC, 1 if samples == 1 else 2)
    if photometric not in (1, 2):
        raise NotImplementedError(
            f"TIFF strip decode supports PhotometricInterpretation "
            f"1 (BlackIsZero) / 2 (RGB), got {photometric}"
        )
    offsets = entries.get(TAG_STRIP_OFFSETS)
    counts = entries.get(TAG_STRIP_BYTE_COUNTS)
    if not offsets or not counts or len(offsets) != len(counts):
        raise ValueError("TIFF strip offsets/byte-counts missing or unequal")
    rows_per_strip = one(TAG_ROWS_PER_STRIP, h)
    if not rows_per_strip or rows_per_strip < 1:
        raise ValueError(f"TIFF RowsPerStrip must be >= 1, got {rows_per_strip}")
    if -(-h // rows_per_strip) != len(offsets):
        raise ValueError(
            f"TIFF strip count {len(offsets)} does not cover "
            f"{h} rows at {rows_per_strip} rows/strip"
        )
    row_bytes = w * samples
    out = bytearray()
    for si, (off, cnt) in enumerate(zip(offsets, counts)):
        rows = min(rows_per_strip, h - si * rows_per_strip)
        expected = rows * row_bytes
        data = payload[off : off + cnt]
        if len(data) != cnt:
            raise ValueError("TIFF strip data out of bounds")
        if comp == 1:
            if len(data) != expected:
                raise ValueError(
                    f"TIFF uncompressed strip holds {len(data)} bytes, "
                    f"expected {expected}"
                )
            strip = data
        elif comp == 5:
            strip = tiff_lzw_decode(data, expected)
        elif comp in (8, 32946):
            # bound decompression by the declared strip size (+1 to
            # detect overflow) — a crafted strip must not be able to
            # inflate multi-GB before the length check rejects it
            try:
                dec = zlib.decompressobj()
                strip = dec.decompress(data, expected + 1)
            except zlib.error as exc:
                raise ValueError(f"bad TIFF deflate strip: {exc}") from exc
            if (
                len(strip) != expected
                or dec.unconsumed_tail
                or dec.unused_data
                or not dec.eof
            ):
                raise ValueError(
                    f"TIFF deflate strip decoded {len(strip)} bytes "
                    f"(eof={dec.eof}), expected {expected}"
                )
        else:
            strip = packbits_decode(data, expected)
        if predictor == 2:
            buf = bytearray(strip)
            for r in range(rows):
                row = buf[r * row_bytes : (r + 1) * row_bytes]
                _predict2_decode(row, samples)
                buf[r * row_bytes : (r + 1) * row_bytes] = row
            strip = bytes(buf)
        out += strip
    return w, h, samples, bytes(out)


def encode_tiff(
    width: int,
    height: int,
    pixels: bytes,
    samples: int = 3,
    compression: int = 1,
    rows_per_strip: int | None = None,
    big_endian: bool = False,
    predictor: int = 1,
) -> bytes:
    """Real single-page TIFF with strip data — the round-trip partner
    of decode_pixels. compression 1 (none), 32773 (PackBits), 5
    (LZW) or 8 (deflate) — LZW/deflate optionally with the horizontal
    predictor; multi-strip when rows_per_strip < height; external
    value areas for the strip offset/count arrays when they outgrow
    the inline field."""
    if compression not in (1, 32773, 5, 8):
        raise ValueError("encode_tiff supports compression 1, 5, 8 or 32773")
    if predictor not in (1, 2):
        raise ValueError("predictor must be 1 (none) or 2 (horizontal)")
    if predictor == 2 and compression not in (5, 8):
        raise ValueError("predictor 2 is only written with LZW/deflate here")
    if len(pixels) != width * height * samples:
        raise ValueError("pixel buffer does not match dims")
    if rows_per_strip is None:
        rows_per_strip = height
    endian = ">" if big_endian else "<"
    row_bytes = width * samples
    strips = []
    for r0 in range(0, height, rows_per_strip):
        raw = pixels[r0 * row_bytes : (r0 + rows_per_strip) * row_bytes]
        if predictor == 2:
            raw = b"".join(
                _predict2_encode(
                    raw[i : i + row_bytes], samples
                )
                for i in range(0, len(raw), row_bytes)
            )
        if compression == 1:
            strips.append(raw)
        elif compression == 5:
            strips.append(tiff_lzw_encode(raw))
        elif compression == 8:
            strips.append(zlib.compress(raw, 6))
        else:
            strips.append(packbits_encode(raw))
    n_strips = len(strips)

    entries = [  # (tag, etype, count) — values resolved below
        (TAG_WIDTH, 4, 1, [width]),
        (TAG_HEIGHT, 4, 1, [height]),
        (TAG_BITS, 3, 1, [8]),
        (TAG_COMPRESSION, 3, 1, [compression]),
        (TAG_STRIP_OFFSETS, 4, n_strips, None),  # patched below
        (TAG_SAMPLES, 3, 1, [samples]),
        (TAG_ROWS_PER_STRIP, 4, 1, [rows_per_strip]),
        (TAG_STRIP_BYTE_COUNTS, 4, n_strips, [len(s) for s in strips]),
    ]
    if predictor == 2:
        entries.append((TAG_PREDICTOR, 3, 1, [2]))
    ifd_off = 8
    ifd_size = 2 + 12 * len(entries) + 4
    ext_off = ifd_off + ifd_size  # external value area
    ext = bytearray()

    def field(etype, count, values):
        """Inline value field or (ext-area append + offset field)."""
        nonlocal ext
        fmt = "H" if etype == 3 else "I"
        raw = struct.pack(endian + fmt * count, *values)
        if len(raw) <= 4:
            return raw + bytes(4 - len(raw))
        off = ext_off + len(ext)
        ext += raw
        return struct.pack(endian + "I", off)

    # two passes: sizes of external arrays are knowable up front, so
    # compute where strip data starts, then resolve offsets
    ext_bytes = sum(
        4 * count
        for _tag, etype, count, _v in entries
        if ("H" if etype == 3 else "I") == "I" and 4 * count > 4
    ) + sum(
        2 * count
        for _tag, etype, count, _v in entries
        if etype == 3 and 2 * count > 4
    )
    data_off = ext_off + ext_bytes
    strip_offsets = []
    pos = data_off
    for s in strips:
        strip_offsets.append(pos)
        pos += len(s)

    out = bytearray(
        (b"MM\x00\x2a" if big_endian else b"II\x2a\x00")
        + struct.pack(endian + "I", ifd_off)
    )
    out += struct.pack(endian + "H", len(entries))
    for tag, etype, count, values in entries:
        if tag == TAG_STRIP_OFFSETS:
            values = strip_offsets
        out += struct.pack(endian + "HHI", tag, etype, count)
        out += field(etype, count, values)
    out += struct.pack(endian + "I", 0)  # no next IFD
    out += ext
    for s in strips:
        out += s
    return bytes(out)


# ------------------------------------------------------------- LZW tier
# TIFF 6.0 §13: MSB-first bit packing, 9-bit initial width, codes
# 256=Clear / 257=EOI, first table entry 258, EARLY width change
# (bump when the table reaches 2^width - 1 — one entry before GIF's
# LSB-first variant would). Strips compress independently. The
# horizontal predictor (tag 317 = 2) differences samples per row
# before compression; decode integrates back.

_LZW_CLEAR, _LZW_EOI = 256, 257


def tiff_lzw_decode(data: bytes, expected: int) -> bytes:
    """One LZW-compressed strip → exactly ``expected`` bytes."""
    out = bytearray()
    acc = nbits = pos = 0
    width = 9
    table: list[bytes] = []
    prev: bytes | None = None

    def reset():
        nonlocal table, width, prev
        table = [bytes([i]) for i in range(256)] + [b"", b""]
        width = 9
        prev = None

    reset()
    while len(out) < expected:
        while nbits < width:
            if pos >= len(data):
                raise ValueError("truncated TIFF LZW strip")
            acc = (acc << 8) | data[pos]
            pos += 1
            nbits += 8
        code = (acc >> (nbits - width)) & ((1 << width) - 1)
        nbits -= width
        if code == _LZW_CLEAR:
            reset()
            continue
        if code == _LZW_EOI:
            break
        if prev is None:
            if code >= 256:
                raise ValueError("TIFF LZW stream starts with a table code")
            entry = table[code]
        elif code < len(table):
            entry = table[code]
            table.append(prev + entry[:1])
        elif code == len(table):
            entry = prev + prev[:1]  # the KwKwK case
            table.append(entry)
        else:
            raise ValueError(f"invalid TIFF LZW code {code}")
        out += entry
        prev = entry
        if len(table) >= (1 << width) - 1 and width < 12:
            width += 1  # EARLY change (TIFF convention)
    if len(out) != expected:
        raise ValueError(
            f"TIFF LZW strip decoded {len(out)} bytes, expected {expected}"
        )
    return bytes(out)


def tiff_lzw_encode(data: bytes) -> bytes:
    """Round-trip partner of tiff_lzw_decode (fixtures + encode_tiff):
    standard LZW with the same MSB packing. Width timing is kept in
    lockstep by SIMULATING the decoder: its table grows one entry per
    received code except the first after a clear, and its read width
    bumps when that table reaches 2^width - 1 — the encoder tracks
    (dec_len, emitted) and emits every code at exactly the width the
    decoder will read it with."""
    out = bytearray()
    acc = nbits = 0
    width = 9
    dec_len = 258  # the decoder's table size (256 literals + 2 specials)
    emitted = 0  # data codes since the last clear

    def put(code: int):
        nonlocal acc, nbits
        acc = (acc << width) | code
        nbits += width
        while nbits >= 8:
            nbits -= 8
            out.append((acc >> nbits) & 0xFF)

    def emit(code: int):
        nonlocal width, dec_len, emitted
        put(code)
        emitted += 1
        if emitted >= 2:
            dec_len += 1
        if dec_len >= (1 << width) - 1 and width < 12:
            width += 1

    def clear():
        nonlocal width, dec_len, emitted, table, next_code
        put(_LZW_CLEAR)
        width = 9
        dec_len = 258
        emitted = 0
        table = {bytes([i]): i for i in range(256)}
        next_code = 258

    table: dict[bytes, int] = {}
    next_code = 0
    clear()
    w = b""
    for byte in data:
        wc = w + bytes([byte])
        if wc in table:
            w = wc
            continue
        emit(table[w])
        table[wc] = next_code
        next_code += 1
        w = bytes([byte])
        if next_code >= 4090:  # table nearly full → restart
            # w is a single byte, present in the fresh table — it
            # simply carries across the clear
            clear()
    if w:
        emit(table[w])
    put(_LZW_EOI)
    if nbits:
        out.append((acc << (8 - nbits)) & 0xFF)
    return bytes(out)


def _predict2_encode(row: bytes, samples: int) -> bytes:
    out = bytearray(row)
    for i in range(len(row) - 1, samples - 1, -1):
        out[i] = (row[i] - row[i - samples]) & 0xFF
    return bytes(out)


def _predict2_decode(row: bytearray, samples: int) -> None:
    for i in range(samples, len(row)):
        row[i] = (row[i] + row[i - samples]) & 0xFF
