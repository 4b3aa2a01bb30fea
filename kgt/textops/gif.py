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


# bit_length LUT for table sizes 0..4096 (code width = clamp of the
# table size's bit length — the decoder bumps width exactly when the
# table hits 1<<width, so width tracks bit_length(table_size))
_BITLEN = np.zeros(4097, dtype=np.int64)
_BITLEN[1:] = np.floor(np.log2(np.arange(1, 4097))).astype(np.int64) + 1


def lzw_decode(data: bytes, min_code_size: int, expect: int) -> bytes:
    """GIF-variant LZW: variable code width starting min_code_size+1,
    clear = 2^mcs, end = clear+1, dictionary grows to 4096 entries.
    Decodes exactly ``expect`` indices (trailing junk tolerated per
    the many real-world writers that pad).

    Batched, not per-symbol (round-7 kernel rewrite, differentially
    fuzzed against _lzw_decode_ref):

    * code extraction is numpy-vectorized per CLEAR segment — between
      clear codes the width schedule is a pure function of the code
      index (the table grows by exactly one entry per non-first code
      until 4096), so all code bit-offsets are a cumsum and the codes
      gather as three byte lanes instead of a Python bit-reservoir
      loop;
    * the table never materializes strings: every new entry is
      ``prev + first char of current``, which is exactly the
      contiguous OUTPUT span [opos - len(prev), opos] — two int lists
      (start, len) replace the bytes dictionary;
    * emission is two-pass per chunk: a pure-int planning loop
      (no byte writes) records literal pixels and entry copies, then
      all literals scatter in ONE numpy fancy-index write and entry
      copies replay in order as memoryview memcpys. Copy sources
      always lie strictly left of their destination (an entry's span
      ends at or before the next emission start), so left-to-right
      replay after the literal scatter is race-free — and per-pixel
      cost FALLS as entries lengthen.
    """
    if min_code_size > 8:
        # GIF literal codes are palette indices (bytes); mcs >= 9 would
        # put literals >= 256, which the uint8 scatter below would wrap
        # silently. The per-symbol decoder rejected these at table init
        # (bytes([i]) raises for i >= 256) — keep that contract.
        raise ValueError(f"bad GIF LZW minimum code size {min_code_size}")
    clear = 1 << min_code_size
    end = clear + 1
    w0 = min_code_size + 1
    d = np.frombuffer(data, dtype=np.uint8).astype(np.uint32)
    d = np.concatenate([d, np.zeros(2, dtype=np.uint32)])
    bits_total = len(data) * 8

    # One table entry may overshoot `expect`: an entry grows by 1 pixel
    # per code after its segment's clear, so its length is bounded by
    # the entries added per segment (4096 - (clear + 2)) plus the two
    # chars an entry starts with — derive the pad from that invariant
    # instead of a magic constant (the tlen check below re-asserts it).
    _max_entry = 4096 - (clear + 2) + 2
    out = bytearray(expect + _max_entry)
    outnp = np.frombuffer(out, dtype=np.uint8)  # writable view
    mv = memoryview(out)
    # table entry c (c >= clear+2): output span tstart[c] : +tlen[c]
    tstart = [0] * (clear + 2)
    tlen = [0] * (clear + 2)
    opos = 0
    bitpos = 0
    k_seg = 0  # codes consumed in the current clear-segment
    prev_len = 0  # 0 <=> no prev (segment start)
    prev_start = 0
    ended = False

    while opos < expect and not ended:
        # ---- batch-extract codes for the current segment tail ----
        chunk = 8192
        k = np.arange(k_seg, k_seg + chunk)
        # table size before reading code k of the segment
        t = np.minimum((clear + 2) + np.maximum(0, k - 1), 4096)
        w = np.clip(_BITLEN[t], w0, 12)
        offs = bitpos + np.concatenate(([0], np.cumsum(w)[:-1]))
        ends = offs + w
        m = int(np.searchsorted(ends, bits_total, side="right"))
        if m == 0:
            raise ValueError("truncated GIF LZW stream")
        byte = offs[:m] >> 3
        sh = (offs[:m] & 7).astype(np.uint32)
        codes = (
            (d[byte] | (d[byte + 1] << 8) | (d[byte + 2] << 16)) >> sh
        ) & ((np.uint32(1) << w[:m].astype(np.uint32)) - np.uint32(1))
        # widths computed above assume no clear before each code in
        # THIS segment — truncate at the first clear/end, whose own
        # width is still valid
        stop = np.nonzero((codes == clear) | (codes == end))[0]
        lim = min((int(stop[0]) if len(stop) else m) + 1, m)
        code_list = codes[:lim].tolist()
        end_list = ends[:lim].tolist()
        # next non-literal index at or after j (literal-run fast path)
        nonlit = np.nonzero(codes[:lim] >= clear)[0].tolist()

        # ---- pass 1: pure-int planning (no byte writes) ----
        lit_runs: list[tuple[int, int, int]] = []  # (opos, j0, r)
        lit_pos: list[int] = []
        lit_val: list[int] = []
        copies: list[tuple[int, int, int]] = []
        err = None
        ni = 0  # cursor into nonlit
        j = 0
        while j < lim:
            code = code_list[j]
            # maximal literal-run fast path: r consecutive codes
            # < clear, each emitting one pixel and adding one
            # length-2 table entry at closed-form positions
            if code < clear and prev_len != 0:
                while ni < len(nonlit) and nonlit[ni] < j:
                    ni += 1
                j_end = nonlit[ni] if ni < len(nonlit) else lim
                r = j_end - j
                if r > 1:
                    if opos + r > expect:
                        r = expect - opos  # ref stops AT expect
                    n = len(tstart)
                    r_add = min(r, 4096 - n)
                    if r_add > 0:
                        tstart.append(opos - prev_len)
                        tlen.append(prev_len + 1)
                        if r_add > 1:
                            tstart.extend(range(opos, opos + r_add - 1))
                            tlen.extend([2] * (r_add - 1))
                    lit_runs.append((opos, j, r))
                    prev_start = opos + r - 1
                    prev_len = 1
                    opos += r
                    k_seg += r
                    j += r
                    bitpos = end_list[j - 1]
                    if opos >= expect:
                        break
                    continue
            if code == clear:
                tstart = [0] * (clear + 2)
                tlen = [0] * (clear + 2)
                k_seg = 0
                prev_len = 0
                bitpos = end_list[j]
                break
            if code == end:
                ended = True
                bitpos = end_list[j]
                break
            k_seg += 1
            bitpos = end_list[j]
            n = len(tstart)
            if prev_len == 0:
                if code >= n:
                    err = "GIF LZW code before any literal"
                    break
                lit_pos.append(opos)
                lit_val.append(code)
                prev_start = opos
                prev_len = 1
                opos += 1
            elif code < n:
                if code < clear:
                    cur_len = 1
                    lit_pos.append(opos)
                    lit_val.append(code)
                else:
                    cur_len = tlen[code]
                    copies.append((opos, tstart[code], cur_len))
                if n < 4096:
                    tstart.append(opos - prev_len)
                    tlen.append(prev_len + 1)
                prev_start = opos
                prev_len = cur_len
                opos += cur_len
            elif code == n and n < 4096:
                # entry = prev + prev[0]; its content IS this emission
                copies.append((opos, prev_start, prev_len))
                copies.append((opos + prev_len, prev_start, 1))
                cur_len = prev_len + 1
                tstart.append(opos)
                tlen.append(cur_len)
                prev_start = opos
                prev_len = cur_len
                opos += cur_len
            else:
                err = f"GIF LZW code {code} out of range"
                break
            if opos >= expect:
                break
            j += 1

        # ---- pass 2: vectorized literal scatter, then entry copies
        # in order (sources are strictly left of destinations) ----
        for p0, j0, r in lit_runs:
            outnp[p0 : p0 + r] = codes[j0 : j0 + r]
        if lit_pos:
            outnp[np.array(lit_pos)] = np.array(lit_val, dtype=np.uint8)
        for dst, src, ln in copies:
            if ln == 1:
                out[dst] = out[src]
            else:
                e = dst + ln
                mv[dst:e] = mv[src : src + ln]
        if err is not None:
            raise ValueError(err)

    if opos < expect:
        raise ValueError(
            f"GIF LZW stream ended early: {opos}/{expect} pixels"
        )
    return bytes(out[:expect])


def _lzw_decode_ref(data: bytes, min_code_size: int, expect: int) -> bytes:
    """Per-symbol reference decoder (the pre-round-7 implementation),
    kept as the differential-fuzz oracle for lzw_decode."""
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
            if not 2 <= mcs <= 8:
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
