"""From-scratch GIF (87a/89a) codec — pure stdlib.

Decoder (the product): header + logical screen descriptor, global and
local color tables, extension blocks (graphic control: delay,
transparency), image descriptors, variable-width LZW decompression
(clear/end codes, dictionary growth to 12 bits), 4-pass interlace
reordering, and multi-frame compositing with all four disposal
methods: 0/1 (draw over), 2 (restore to background) and, since
round 7, 3 (restore previous — the canvas reverts to its state
before the frame was rendered).  Output is RGB frames via the
palette.

Encoder (fixture generator): single- or multi-frame GIF with a global
color table and a real LZW compressor (emits clear codes on dictionary
overflow), so round-trips are testable offline — GIF is lossless, so
encode→decode must reproduce indices exactly.
"""

from __future__ import annotations

import struct

import numpy as np

_TRAILER = 0x3B
_IMAGE = 0x2C
_EXTENSION = 0x21
_GCE = 0xF9


def _sub_blocks(payload: bytes, pos: int) -> tuple[bytes, int]:
    """Concatenate data sub-blocks starting at pos; return (data,
    position after the 0-length terminator)."""
    out = bytearray()
    while True:
        if pos >= len(payload):
            raise ValueError("truncated GIF sub-block stream")
        n = payload[pos]
        pos += 1
        if n == 0:
            return bytes(out), pos
        if pos + n > len(payload):
            raise ValueError("truncated GIF sub-block")
        out += payload[pos : pos + n]
        pos += n


def lzw_decode(data: bytes, min_code_size: int, expect: int) -> bytes:
    """GIF-variant LZW: variable code width starting min_code_size+1,
    clear = 2^mcs, end = clear+1, dictionary grows to 4096 entries.
    Decodes exactly ``expect`` indices (trailing junk tolerated per
    the many real-world writers that pad)."""
    clear = 1 << min_code_size
    end = clear + 1
    out = bytearray()
    # bit reader, LSB-first per GIF
    acc = nbits = 0
    pos = 0
    width = min_code_size + 1
    table: list[bytes] = []

    def reset_table():
        nonlocal table, width
        table = [bytes([i]) for i in range(clear)] + [b"", b""]
        width = min_code_size + 1

    reset_table()
    prev = None
    while len(out) < expect:
        while nbits < width:
            if pos >= len(data):
                raise ValueError("truncated GIF LZW stream")
            acc |= data[pos] << nbits
            nbits += 8
            pos += 1
        code = acc & ((1 << width) - 1)
        acc >>= width
        nbits -= width
        if code == clear:
            reset_table()
            prev = None
            continue
        if code == end:
            break
        if prev is None:
            if code >= len(table):
                raise ValueError("GIF LZW code before any literal")
            entry = table[code]
        elif code < len(table):
            entry = table[code]
            if len(table) < 4096:
                table.append(prev + entry[:1])
        elif code == len(table) and len(table) < 4096:
            entry = prev + prev[:1]
            table.append(entry)
        else:
            raise ValueError(f"GIF LZW code {code} out of range")
        out += entry
        prev = entry
        if len(table) == (1 << width) and width < 12:
            width += 1
    if len(out) < expect:
        raise ValueError(
            f"GIF LZW stream ended early: {len(out)}/{expect} pixels"
        )
    return bytes(out[:expect])


def lzw_encode(indices: bytes, min_code_size: int) -> bytes:
    """GIF-variant LZW compressor (the decoder's exact inverse;
    emits an initial clear code and clears on dictionary overflow)."""
    clear = 1 << min_code_size
    end = clear + 1
    out = bytearray()
    acc = nbits = 0

    def emit(code, width):
        nonlocal acc, nbits
        acc |= code << nbits
        nbits += width
        while nbits >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8

    table = {bytes([i]): i for i in range(clear)}
    next_code = end + 1
    width = min_code_size + 1
    emit(clear, width)
    cur = b""
    for b in indices:
        nxt = cur + bytes([b])
        if nxt in table:
            cur = nxt
            continue
        emit(table[cur], width)
        if next_code < 4096:
            table[nxt] = next_code
            if next_code == (1 << width) and width < 12:
                width += 1
            next_code += 1
        else:
            emit(clear, width)
            table = {bytes([i]): i for i in range(clear)}
            next_code = end + 1
            width = min_code_size + 1
        cur = bytes([b])
    if cur:
        emit(table[cur], width)
    emit(end, width)
    if nbits:
        out.append(acc & 0xFF)
    return bytes(out)


_INTERLACE_PASSES = ((0, 8), (4, 8), (2, 4), (1, 2))


def _deinterlace(indices: bytes, w: int, h: int) -> bytes:
    rows = [indices[y * w : (y + 1) * w] for y in range(h)]
    out: list[bytes | None] = [None] * h
    src = 0
    for start, step in _INTERLACE_PASSES:
        for y in range(start, h, step):
            out[y] = rows[src]
            src += 1
    return b"".join(out)  # type: ignore[arg-type]


def decode_gif(payload: bytes):
    """GIF → (width, height, [frame RGB bytes], [delay_cs]).

    Frames are the COMPOSITED canvas after each image block (what a
    viewer shows), RGB row-major; transparent pixels keep the pixel
    underneath (or the background color on a fresh canvas)."""
    if payload[:6] not in (b"GIF87a", b"GIF89a"):
        raise ValueError("not a GIF (bad signature)")
    if len(payload) < 13:
        raise ValueError("truncated GIF header")
    w, h, packed, bg, _aspect = struct.unpack("<HHBBB", payload[6:13])
    pos = 13
    gct = None
    if packed & 0x80:
        n = 2 << (packed & 7)
        gct = payload[pos : pos + 3 * n]
        if len(gct) != 3 * n:
            raise ValueError("truncated GIF global color table")
        pos += 3 * n
    frames: list[bytes] = []
    delays: list[int] = []
    transparent = None
    delay = 0
    disposal = 0
    # canvas of palette-resolved RGB; start = background color (or black)
    if gct and bg * 3 + 3 <= len(gct):
        bg_rgb = gct[bg * 3 : bg * 3 + 3]
    else:
        bg_rgb = b"\x00\x00\x00"
    canvas = bytearray(bg_rgb * (w * h))
    while True:
        if pos >= len(payload):
            raise ValueError("GIF missing trailer")
        block = payload[pos]
        pos += 1
        if block == _TRAILER:
            break
        if block == _EXTENSION:
            label = payload[pos]
            pos += 1
            data, pos = _sub_blocks(payload, pos)
            if label == _GCE and len(data) >= 4:
                flags, delay = struct.unpack("<BH", data[:3])
                disposal = (flags >> 2) & 7
                transparent = data[3] if flags & 1 else None
        elif block == _IMAGE:
            ix, iy, iw, ih, ipacked = struct.unpack(
                "<HHHHB", payload[pos : pos + 9]
            )
            pos += 9
            if ix + iw > w or iy + ih > h:
                raise ValueError("GIF image block exceeds the canvas")
            if ipacked & 0x80:
                n = 2 << (ipacked & 7)
                pal = payload[pos : pos + 3 * n]
                if len(pal) != 3 * n:
                    raise ValueError("truncated GIF local color table")
                pos += 3 * n
            else:
                pal = gct
            if pal is None:
                raise ValueError("GIF image has no color table")
            mcs = payload[pos]
            pos += 1
            if not 2 <= mcs <= 11:
                raise ValueError(f"bad GIF LZW minimum code size {mcs}")
            data, pos = _sub_blocks(payload, pos)
            idx = lzw_decode(data, mcs, iw * ih)
            if ipacked & 0x40:
                idx = _deinterlace(idx, iw, ih)
            # numpy compositing: palette applied by fancy indexing over
            # the whole sub-rect, transparency as a boolean mask — no
            # per-pixel Python (the PNG-unfilter lesson)
            # disposal 3 restores the PRE-frame canvas after display
            saved = bytes(canvas) if disposal == 3 else None
            ia = np.frombuffer(idx, dtype=np.uint8).reshape(ih, iw)
            # bound-check only RENDERED indices — a transparent index
            # outside the palette is legal (it is never looked up)
            chk = ia if transparent is None else ia[ia != transparent]
            if chk.size and int(chk.max()) * 3 + 3 > len(pal):
                raise ValueError("GIF pixel index outside palette")
            pal_arr = np.frombuffer(pal, dtype=np.uint8).reshape(-1, 3)
            rgb = pal_arr[np.minimum(ia, len(pal) // 3 - 1)]  # (ih, iw, 3)
            cv = np.frombuffer(bytes(canvas), dtype=np.uint8).reshape(h, w, 3)
            cv = cv.copy()
            sub = cv[iy : iy + ih, ix : ix + iw]
            if transparent is None:
                sub[:] = rgb
            else:
                opaque = ia != transparent
                sub[opaque] = rgb[opaque]
            canvas = bytearray(cv.tobytes())
            frames.append(bytes(canvas))
            delays.append(delay)
            if disposal == 2:  # restore to background in the sub-rect
                for y in range(ih):
                    off = ((iy + y) * w + ix) * 3
                    canvas[off : off + 3 * iw] = bg_rgb * iw
            elif disposal == 3:  # restore previous: revert the render
                canvas = bytearray(saved)
            transparent = None
            delay = 0
            disposal = 0
        else:
            raise ValueError(f"unknown GIF block 0x{block:02X} at {pos - 1}")
    if not frames:
        raise ValueError("GIF has no image blocks")
    return w, h, frames, delays


def encode_gif(
    width: int,
    height: int,
    frames: list[bytes],
    palette: list[tuple[int, int, int]],
    delays: list[int] | None = None,
    interlace: bool = False,
) -> bytes:
    """Fixture encoder: frames are palette-INDEX bytes (full canvas),
    one global color table (padded to a power of two ≥ 2 entries)."""
    n = len(palette)
    if not 2 <= n <= 256:
        raise ValueError("palette must have 2..256 entries")
    bits = max(1, (n - 1).bit_length())
    size = 1 << bits
    mcs = max(2, bits)
    out = bytearray(b"GIF89a")
    out += struct.pack("<HHBBB", width, height, 0x80 | (bits - 1), 0, 0)
    for i in range(size):
        r, g, b = palette[i] if i < n else (0, 0, 0)
        out += bytes([r, g, b])
    delays = delays or [0] * len(frames)
    if len(delays) != len(frames):
        # zip would silently truncate, dropping frames (review find)
        raise ValueError(
            f"{len(delays)} delays for {len(frames)} frames"
        )
    for frame, delay in zip(frames, delays):
        if len(frame) != width * height:
            raise ValueError("frame index buffer does not match dims")
        if max(frame) >= size:
            raise ValueError("frame index outside the palette")
        if delay:
            out += bytes([_EXTENSION, _GCE, 4]) + struct.pack(
                "<BH", 0, delay
            ) + bytes([0, 0])
        idx = frame
        if interlace:
            rows = [frame[y * width : (y + 1) * width] for y in range(height)]
            ordered = []
            for start, step in _INTERLACE_PASSES:
                for y in range(start, height, step):
                    ordered.append(rows[y])
            idx = b"".join(ordered)
        out += bytes([_IMAGE]) + struct.pack(
            "<HHHHB", 0, 0, width, height, 0x40 if interlace else 0
        )
        out += bytes([mcs])
        data = lzw_encode(idx, mcs)
        for i in range(0, len(data), 255):
            chunk = data[i : i + 255]
            out += bytes([len(chunk)]) + chunk
        out += b"\x00"
    out += bytes([_TRAILER])
    return bytes(out)
