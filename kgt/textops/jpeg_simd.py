"""Lockstep (batch-SIMD) baseline JPEG entropy decoding.

The sequential per-symbol decoder in jpeg.py pays ~0.25-1 us of
CPython dispatch per Huffman symbol — the measured floor after the
fused peek-16 tables (BENCH.md).  This module removes that floor
wherever the input offers INDEPENDENT entropy streams: restart-
interval segments within one scan (T.81 E.1.4 — DC predictors reset
at every RSTn, so each segment decodes standalone) and same-geometry
images across a batch (`decode_jpeg_batch`).

The kernel is a SYMBOL-LEVEL lockstep interpreter: every lane
(stream) decodes exactly one Huffman symbol per numpy step.  All
per-lane state lives in fixed-shape arrays (no per-step compression):
one gather reads a 16-bit bit-window per lane, a second gather
through a UNIFIED DC/AC LUT (phase picked by a +65536 offset, so DC
and AC lanes share every instruction) yields advance + zero-run +
EOB + coefficient in one int64, and vectorized bookkeeping writes
coefficients and advances block programs.  Lanes that finish park on
a NOP LUT segment (advance 0, no write) and the state arrays repack
when live occupancy halves — O(n log n) total repack cost.  Long
codes (codelen + mantissa > 16 bits) take a vectorized second gather
for the mantissa; the interpreter overhead is paid once per
SYMBOL-STEP, not once per symbol-per-stream.

Semantics: the serial decoder is the oracle.  Any lane that hits a
true anomaly — an invalid code, a bad AC symbol, an AC coefficient
overflow, or reading past its segment end — retires its whole image
to the serial decoder, which reproduces the exact error (or the
serial path's lenient zero-fed tail) on a fresh decode.  Differential
fuzz in tests/test_jpeg_simd.py pins lockstep == serial across the
encoder's full mode matrix and on malformed streams.

This is a pure execution-strategy twin of jpeg.py:_decode_sequential
(no new format semantics; reference-parity notes live in jpeg.py).
"""

from __future__ import annotations

import numpy as np

from .jpeg import ZIGZAG, _fused_lut_np

_ZZ_NP = np.asarray(ZIGZAG, dtype=np.int64)

# Below this many independent streams the per-step numpy overhead
# loses to the serial loop (measured crossover; see BENCH.md).
LOCKSTEP_MIN_STREAMS = 256

# Per-wave cap on the lockstep coefficient store (int32 bytes): a
# group bigger than this decodes in successive waves so the kernel's
# working set stays flat no matter the Arrow batch size.
LOCKSTEP_COEFF_BUDGET = 128 << 20

# Master switch (tests flip it to force serial for differentials).
LOCKSTEP_ENABLED = True

# Introspection for tests/bench: never read on the hot path.
STATS = {"slow_symbols": 0, "serial_retries": 0, "lockstep_streams": 0}


class _Streams:
    """Concatenated zero-padded byte plane + per-stream bit cursors.

    `buf32[i]` holds bytes i..i+3 big-endian, so a 16-bit peek at any
    bit position is one gather + shift + mask.  Each stream is padded
    with 16 zero bytes; gathers clamp to `off + len + 4`, which keeps
    every gathered byte inside the stream's own pad — a lane that runs
    past its data reads zeros (the serial decoder's zero-feed) and can
    never see a neighbouring stream's bytes.
    """

    __slots__ = ("buf32", "off", "lens", "clamp", "limit_bits")

    _PAD = 16

    def __init__(self, seg_bytes):
        n = len(seg_bytes)
        lens = np.fromiter((len(s) for s in seg_bytes), np.int64, count=n)
        off = np.zeros(n, np.int64)
        if n > 1:
            np.cumsum(lens[:-1] + self._PAD, out=off[1:])
        total = int(off[-1] + lens[-1] + self._PAD)
        buf = np.zeros(total, np.uint8)
        for i, s in enumerate(seg_bytes):
            if lens[i]:
                buf[off[i] : off[i] + lens[i]] = np.frombuffer(s, np.uint8)
        # overlapping big-endian u32 window view: buf32[i] = bytes
        # i..i+3 BE with ZERO copy (byte-stride 1); the kernel's n-wide
        # gathers byteswap on access, so the O(total-bytes) shift/or
        # materialization this replaced never happens
        self.buf32 = np.lib.stride_tricks.as_strided(
            buf[:4].view(">u4"), shape=(total - 3,), strides=(1,)
        )
        self.off = off
        self.lens = lens
        self.clamp = off + lens + 4
        self.limit_bits = lens * 8


_SIMD_CACHE: dict = {}

# Unified SIMD entry layout (int64):
#   bits 0..5   advance (code + mantissa bits); 0 for NOP
#   bits 6..10  k delta (AC zero-run; 16 for ZRL; 0 for DC/EOB)
#   bit  11     EOB flag
#   bits 13..28 value + 32768 (DC diff / AC coefficient; 32768 = "no
#               value", which doubles as the write flag for AC)
#   entry == 0      invalid code / bad AC symbol (lane retires)
#   entry < 0       long code: -(sym<<5 | codelen) — the kernel reads
#                   the mantissa with a second vectorized gather
_E_EOB = 1 << 11
_E_NOVAL = 32768 << 13
_NOP_ENTRY = _E_NOVAL  # advance 0, kd 0, no EOB, no value


def _simd_lut_np(kind: str, bits: tuple, vals: tuple) -> np.ndarray:
    """Unified-layout twin of jpeg.py:_fused_lut (derived from it
    vectorized) so the lockstep kernel runs ONE code path for DC and
    AC symbols.  Bounded cache like the other LUT caches."""
    key = (kind, bits, vals)
    e = _SIMD_CACHE.get(key)
    if e is not None:
        return e
    f = _fused_lut_np(kind, bits, vals)
    e = np.zeros_like(f)
    if kind == "dc":
        fast = f > 0
        e[fast] = (f[fast] & 63) | (((f[fast] >> 6) & 0xFFFF) << 13)
    else:
        fa = f >= 2048
        e[fa] = (
            (f[fa] & 63)
            | (((f[fa] >> 6) & 31) << 6)
            | (((f[fa] >> 11) & 0xFFFF) << 13)
        )
        eob = (f >= 32) & ~fa
        e[eob] = (f[eob] & 31) | _E_EOB | _E_NOVAL
        # f == 1 (bad AC symbol) stays 0: retires like an invalid code
    neg = f < 0
    e[neg] = f[neg]
    if len(_SIMD_CACHE) >= 16:
        _SIMD_CACHE.clear()
    _SIMD_CACHE[key] = e
    return e


def _lockstep(st, img_idx, start_mcu, n_mcus, plan, rows_per, n_imgs, mcux):
    """Fixed-shape symbol-level lockstep over every stream.  Returns
    (coeff2d, comp_row_base, dead_imgs): coeff2d stacks every image's
    every component's block rows (int32, shape (total_rows + 1, 64);
    the LAST row is scratch for parked/dead lanes); component ci of
    image gi lives at rows
    [comp_row_base[ci] + gi*rows_per[ci], +rows_per[ci]).
    dead_imgs is the set of image indices that must retry serially
    (their rows in coeff2d are garbage)."""
    n0 = img_idx.size
    C = len(plan)

    # --- per-MCU block program (identical for every stream) ---
    p_ci, p_by, p_bx = [], [], []
    for ci, (hi, vi, _d, _a) in enumerate(plan):
        for by in range(vi):
            for bx in range(hi):
                p_ci.append(ci)
                p_by.append(by)
                p_bx.append(bx)
    B = len(p_ci)
    p_ci = np.asarray(p_ci, np.int64)
    p_by = np.asarray(p_by, np.int64)
    p_bx = np.asarray(p_bx, np.int64)
    hi_arr = np.asarray([p[0] for p in plan], np.int64)
    vi_arr = np.asarray([p[1] for p in plan], np.int64)
    cols_arr = mcux * hi_arr

    comp_row_base = np.zeros(C + 1, np.int64)
    np.cumsum(np.asarray(rows_per, np.int64) * n_imgs, out=comp_row_base[1:])
    scratch_row = int(comp_row_base[-1])
    coeff2d = np.zeros((scratch_row + 1, 64), np.int32)
    # global row of (img, comp) block 0, per ORIGINAL lane id
    img_base2d = comp_row_base[:C, None] + (
        np.asarray(rows_per, np.int64)[:, None] * img_idx[None, :]
    )

    # stacked unified LUTs: [dc0, ac0, dc1, ac1, ..., NOP, NOP] — one
    # gather serves every component and phase; lane LUT base is
    # ci*131072 (+65536 when the next symbol is AC); parked lanes sit
    # on the NOP pair and decode a no-op forever at zero advance.
    nop = np.full(65536, _NOP_ENTRY, np.int64)
    lut_stack = np.concatenate(
        [a for p in plan for a in (p[2], p[3])] + [nop, nop]
    )
    nop_base = C * 131072

    # --- per-lane interpreter state (fixed shape, repacked on decay) --
    lane0 = np.arange(n0, dtype=np.int64)  # original lane id
    bit = np.zeros(n0, np.int64)
    off = st.off.copy()
    clamp = st.clamp.copy()
    limit_bits = st.limit_bits.copy()
    img = img_idx.copy()
    start = start_mcu.copy()
    t = np.zeros(n0, np.int64)  # blocks consumed within the stream
    blocks_left = (n_mcus * B).astype(np.int64)
    k = np.zeros(n0, np.int64)  # 0 = next symbol is DC, else AC index
    cur_ci = np.zeros(n0, np.int64)
    lbase = np.empty(n0, np.int64)  # LUT base: ci*131072 | parked NOP
    row = np.empty(n0, np.int64)
    pred = np.zeros(n0, np.int64)  # DC predictor of the CURRENT comp
    preds2d = np.zeros((C, n0), np.int64)  # parked predictors per comp
    lane_dead = np.zeros(n0, bool)
    dead_imgs: set[int] = set()
    n_live = n0

    def set_block(L):
        """Advance lanes L (compressed indices) to their next block:
        swap the DC predictor register to the block's component and
        compute the destination row."""
        tt = t[L]
        mcu = start[L] + tt // B
        im = tt - (tt // B) * B
        ci = p_ci[im]
        old = cur_ci[L]
        preds2d[old, lane0[L]] = pred[L]
        pred[L] = preds2d[ci, lane0[L]]
        cur_ci[L] = ci
        lbase[L] = ci * 131072
        my = mcu // mcux
        mx = mcu - my * mcux
        row[L] = (
            img_base2d[ci, lane0[L]]
            + (my * vi_arr[ci] + p_by[im]) * cols_arr[ci]
            + mx * hi_arr[ci]
            + p_bx[im]
        )

    def park(L):
        """Retire lanes L (compressed indices): NOP LUT, scratch row."""
        nonlocal n_live
        lbase[L] = nop_base - 65536  # +65536 AC phase lands on NOP too
        k[L] = 1
        row[L] = scratch_row
        n_live -= L.size

    def kill(L):
        """Lanes L hit an anomaly: retire every lane of their images."""
        for li in L:
            dead_imgs.add(int(img[li]))
        mask = np.isin(img, np.fromiter(dead_imgs, np.int64))
        fresh = mask & ~lane_dead
        lane_dead[fresh] = True
        # a finished lane of a dead image is already parked — parking
        # it again would double-decrement n_live and end the loop with
        # live lanes of OTHER images undecoded
        park(np.flatnonzero(fresh & (lbase != nop_base - 65536)))

    set_block(np.arange(n0))
    buf32 = st.buf32

    while n_live > 0:
        # ---- one symbol for every lane (parked lanes decode a NOP) --
        o = np.minimum(off + (bit >> 3), clamp)
        pk16 = (buf32[o].astype(np.int64) >> (16 - (bit & 7))) & 0xFFFF
        isac = k > 0
        e = lut_stack[lbase + isac * 65536 + pk16]

        slow = e < 0
        if slow.any():  # vectorized long-code patch (rare)
            s = np.flatnonzero(slow)
            STATS["slow_symbols"] += s.size
            pk = -e[s]
            sym = pk >> 5
            clen = pk & 31
            sac = isac[s]
            size = np.where(sac, sym & 15, sym)
            # DC size>16 kills the lane; the serial decoder decodes
            # these without error (garbage mantissa), so the kill
            # routes the image to the serial oracle and reproduces its
            # result — do NOT add a raise here to "match". AC size==0
            # can't come off the fused table — guard anyway
            bad = np.where(sac, size == 0, size > 16)
            sz = np.where(bad, 0, size)
            bq = bit[s] + clen
            o2 = np.minimum(off[s] + (bq >> 3), clamp[s])
            w = buf32[o2].astype(np.int64)
            mant = (w >> (32 - (bq & 7) - sz)) & ((1 << sz) - 1)
            mant -= (mant < (1 << np.maximum(sz - 1, 0))) * ((1 << sz) - 1)
            e[s] = (
                (clen + sz)
                | (np.where(sac, sym >> 4, 0) << 6)
                | ((np.where(bad, 0, mant) + 32768) << 13)
            )
            if bad.any():
                kill(s[bad])

        err = e == 0
        if err.any():  # invalid huffman code / bad AC symbol
            kill(np.flatnonzero(err))

        # ---- unified decode of the entry ----
        bit += e & 63
        val = (e >> 13) - 32768
        knew = k + ((e >> 6) & 31)
        pred += np.where(isac, 0, val)
        wrote = isac & (val != 0)
        over = wrote & (knew > 63)
        if over.any():  # serial raises: AC coefficient overflow
            kill(np.flatnonzero(over))
        wr = (wrote | ~isac) & ~lane_dead & ~over
        wi = np.flatnonzero(wr)
        coeff2d[
            row[wi], _ZZ_NP[np.where(isac[wi], knew[wi] & 63, 0)]
        ] = np.where(isac[wi], val[wi], pred[wi])
        k = np.where(isac, knew + wrote, 1)

        done = isac & (((e & _E_EOB) != 0) | (k > 63)) & ~lane_dead
        if done.any():
            tr = np.flatnonzero(done)
            t[tr] += 1
            blocks_left[tr] -= 1
            # serial checks per block: a lane that consumed zero-fed
            # bits retires to serial, which then applies the exact
            # per-block tolerance / error
            tru = bit[tr] > limit_bits[tr]
            if tru.any():
                kill(tr[tru])
            fin = (blocks_left[tr] == 0) & ~lane_dead[tr]
            if fin.any():
                park(tr[fin])
            cont = tr[~fin & ~lane_dead[tr]]
            if cont.size:
                k[cont] = 0
                set_block(cont)
            # repack when live occupancy halves (O(n log n) total)
            if n_live * 2 < bit.size and bit.size >= 64:
                keep = np.flatnonzero(lbase != nop_base - 65536)
                (lane0, bit, off, clamp, limit_bits, img, start, t,
                 blocks_left, k, cur_ci, lbase, row, pred,
                 lane_dead) = (
                    a[keep]
                    for a in (lane0, bit, off, clamp, limit_bits, img,
                              start, t, blocks_left, k, cur_ci, lbase,
                              row, pred, lane_dead)
                )
    return coeff2d, comp_row_base, dead_imgs


def _scan_plan(comps, scomps, specs):
    """(hi, vi, dc_lut, ac_lut) per scan component for one interleaved
    sequential scan, or None when a scan component is unknown (the
    serial path raises the exact error)."""
    by_id = {cid: (hi, vi, tq) for cid, hi, vi, tq in comps}
    plan = []
    for cs, td, ta in scomps:
        if cs not in by_id:
            return None
        hi, vi, _tq = by_id[cs]
        plan.append(
            (
                hi,
                vi,
                _simd_lut_np("dc", *specs[(0, td)]),
                _simd_lut_np("ac", *specs[(1, ta)]),
            )
        )
    return plan


def maybe_lockstep_sequential(comps, scans, mcux, mcuy):
    """Lockstep twin of jpeg.py:_decode_sequential for a single image
    whose scan carries enough restart segments to batch.  Returns a
    coeff_store, or None when ineligible or when any lane retired —
    the caller falls back to the serial path, which reproduces exact
    error semantics (and the zero-fed tail leniency) from scratch."""
    if not LOCKSTEP_ENABLED:
        return None
    if len(scans) != 1 or len(scans[0][0]) != len(comps):
        return None
    scomps, _ss, _se, _ah, _al, segments, ri, specs = scans[0]
    if ri <= 0:
        return None
    total = mcux * mcuy
    expected = -(-total // ri)
    if expected < LOCKSTEP_MIN_STREAMS or len(segments) < expected:
        return None
    try:
        plan = _scan_plan(comps, scomps, specs)
    except Exception:
        # LUT build failed (e.g. overfull DHT): the serial path builds
        # the same tables and raises the same error at its own point
        plan = None
    if plan is None:
        return None
    rows_per = [mcuy * vi * mcux * hi for hi, vi, _d, _a in plan]
    start = np.arange(expected, dtype=np.int64) * ri
    n_mcus = np.minimum(ri, total - start)
    img_idx = np.zeros(expected, np.int64)
    st = _Streams(list(segments[:expected]))
    STATS["lockstep_streams"] += expected
    coeff2d, base, dead = _lockstep(
        st, img_idx, start, n_mcus, plan, rows_per, 1, mcux
    )
    if dead:
        STATS["serial_retries"] += 1
        return None
    return [
        coeff2d[base[ci] : base[ci] + rows_per[ci]] for ci in range(len(plan))
    ]


def _reconstruct_group(
    w, h, comps, qt_list, coeff2d, base, rows_per, hmax, vmax, mcux, mcuy
):
    """Batched twin of jpeg.py:_reconstruct for a same-geometry group:
    one dequant, one BLAS IDCT matmul, one plane assembly / upsample /
    color-convert over ALL images at once (the per-image version is
    numpy-call-overhead-bound on thumbnail-sized images).  Applies the
    identical per-block arithmetic — DC-only closed form vs batched
    AᵀSA, floor(+128.5), clip — so every image's bytes are
    bit-identical to the serial path.  qt_list holds each image's
    qtables dict (quantization is per image; entropy groups ignore it).
    Returns [(w, h, ch, bytes)] in group order."""
    from .jpeg import _dct_matrix

    A = _dct_matrix()
    G = len(qt_list)
    planes_all = []
    for ci, (_cid, hi, vi, tq) in enumerate(comps):
        r = int(rows_per[ci])
        rows = coeff2d[int(base[ci]) : int(base[ci]) + G * r]
        q_arr = np.asarray([qt_list[gi][tq] for gi in range(G)], np.float64)
        coeffs = rows.astype(np.float64) * np.repeat(q_arr, r, axis=0)
        ac_zero = ~np.any(rows[:, 1:], axis=1)
        blocks = np.empty((G * r, 8, 8), np.float64)
        if ac_zero.any():
            const = np.floor(coeffs[ac_zero, 0] / 8.0 + 128.5)
            blocks[ac_zero] = const[:, None, None]
        rest = ~ac_zero
        if rest.any():
            s = coeffs[rest].reshape(-1, 8, 8)
            blocks[rest] = np.floor(np.matmul(np.matmul(A.T, s), A) + 128.5)
        blocks = np.clip(blocks, 0, 255)
        rows_b, cols_b = mcuy * vi, mcux * hi
        plane = (
            blocks.reshape(G, rows_b, cols_b, 8, 8)
            .transpose(0, 1, 3, 2, 4)
            .reshape(G, rows_b * 8, cols_b * 8)
        )
        plane = np.repeat(
            np.repeat(plane, vmax // vi, axis=1), hmax // hi, axis=2
        )[:, :h, :w]
        planes_all.append(plane)

    if len(planes_all) == 1:
        u8 = planes_all[0].astype(np.uint8)
        return [(w, h, 1, u8[g].tobytes()) for g in range(G)]
    y, cb, cr = planes_all
    r_ = np.floor(y + 1.402 * (cr - 128.0) + 0.5)
    g_ = np.floor(
        y - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0) + 0.5
    )
    b_ = np.floor(y + 1.772 * (cb - 128.0) + 0.5)
    rgb = np.empty((G, h, w, 3), np.uint8)
    rgb[..., 0] = np.clip(r_, 0, 255, out=r_)
    rgb[..., 1] = np.clip(g_, 0, 255, out=g_)
    rgb[..., 2] = np.clip(b_, 0, 255, out=b_)
    return [(w, h, 3, rgb[g].tobytes()) for g in range(G)]


def decode_jpeg_batch(
    payloads, keep_errors: bool = False, dims_only: bool = False
) -> list:
    """Decode a batch of JPEGs, lockstepping same-geometry baseline
    images (each image contributes one stream per restart segment)
    through one numpy kernel.  Progressive, structurally ineligible,
    or anomalous images — and groups too small to amortize the numpy
    step — decode serially.  Per-image results are bit-identical to
    :func:`kgt.textops.jpeg.decode_jpeg`; the first failing image in
    input order raises, matching a plain per-image decode loop.

    ``keep_errors=True`` returns the exception OBJECT in that image's
    result slot instead of raising — for callers interleaving JPEGs
    with other formats (multimodal.py's mixed-media Arrow batches) who
    must re-raise at the original ROW position to keep the per-row
    loop's error order.

    ``dims_only=True`` returns (w, h, channels, None) per image: the
    full entropy decode still runs (validation — reconstruct is pure
    arithmetic and never raises, so errors are identical), but pixel
    reconstruction is skipped and no pixel buffer outlives its image.
    Without it, a 10k-row Arrow batch of megapixel JPEGs would hold
    every decoded frame in memory at once just to read (w, h) — the
    metadata/feature callers in multimodal.py all use this mode.

    Group key = frame geometry + scan layout + huffman table content
    (NOT quantization tables — entropy decode never touches those, so
    images differing only in quality still share a group; dequant runs
    per image in _reconstruct)."""
    from .jpeg import _parse_structure, _reconstruct, decode_jpeg

    payloads = [bytes(p) for p in payloads]
    results: list = [None] * len(payloads)
    serial: list[int] = []
    retry: set[int] = set()  # lockstep already ran and died: skip it
    groups: dict = {}
    if LOCKSTEP_ENABLED:
        for i, p in enumerate(payloads):
            try:
                parsed = _parse_structure(p)
            except Exception:
                # decode_jpeg(p) below re-parses and raises identically
                serial.append(i)
                continue
            (w, h, comps, _qt, scans, prog, _hx, _vx, mcux, mcuy) = parsed
            if prog or len(scans) != 1 or len(scans[0][0]) != len(comps):
                serial.append(i)
                continue
            # Ss/Se/Ah/Al are ignored by the sequential decoder (like
            # jpeg.py:_decode_sequential), so they don't gate grouping.
            scomps, _ss, _se, _ah, _al, segments, ri, specs = scans[0]
            total = mcux * mcuy
            expected = -(-total // ri) if ri > 0 else 1
            if len(segments) < expected:
                serial.append(i)  # serial raises "missing RST" exactly
                continue
            if {cs for cs, _t, _a in scomps} - {c[0] for c in comps}:
                serial.append(i)
                continue
            key = (
                w,
                h,
                tuple(comps),
                tuple(scomps),
                ri,
                tuple(sorted(specs.items())),
            )
            groups.setdefault(key, []).append((i, parsed, expected))
    else:
        serial = list(range(len(payloads)))

    for key, members in groups.items():
        per_img = members[0][2]
        if per_img * len(members) < LOCKSTEP_MIN_STREAMS:
            serial.extend(i for i, _p, _e in members)
            continue
        (w, h, comps, _qt, scans, _pr, hmax, vmax, mcux, mcuy) = members[0][1]
        scomps, _ss, _se, _ah, _al, _segs, ri, specs = scans[0]
        try:
            plan = _scan_plan(comps, scomps, specs)
        except Exception:
            # LUT build failed (e.g. overfull DHT, which parses fine):
            # the serial decoder builds the same tables and raises the
            # same error PER IMAGE — crucial for keep_errors and for
            # first-failing-image order in mixed batches
            plan = None
        if plan is None:
            # (also: unknown scan component — serial raises exactly)
            serial.extend(i for i, _p, _e in members)
            continue
        total = mcux * mcuy
        rows_per = [mcuy * vi * mcux * hi for hi, vi, _d, _a in plan]
        # decode the group in WAVES bounded by coefficient-store
        # memory: coeff2d holds every wave image's int32 coefficients
        # at once (~6× the pixel bytes at 4:2:0), so an unbounded
        # group of megapixel images would OOM the executor regardless
        # of dims_only. Waves keep the kernel's working set flat;
        # a tail wave too narrow to amortize numpy goes serial.
        per_img_bytes = sum(rows_per) * 64 * 4
        wave = max(1, LOCKSTEP_COEFF_BUDGET // max(1, per_img_bytes))
        for m0 in range(0, len(members), wave):
            sub = members[m0 : m0 + wave]
            if per_img * len(sub) < LOCKSTEP_MIN_STREAMS:
                serial.extend(i for i, _p, _e in sub)
                continue
            seg_bytes = []
            img_idx = []
            start = []
            n_mcus = []
            for gi, (_i, parsed, expected) in enumerate(sub):
                segments = parsed[4][0][5]
                for s in range(expected):
                    seg_bytes.append(segments[s])
                    img_idx.append(gi)
                    s0 = s * ri if ri > 0 else 0
                    start.append(s0)
                    n_mcus.append(min(ri, total - s0) if ri > 0 else total)
            img_idx = np.asarray(img_idx, np.int64)
            start = np.asarray(start, np.int64)
            n_mcus = np.asarray(n_mcus, np.int64)
            st = _Streams(seg_bytes)
            STATS["lockstep_streams"] += len(seg_bytes)
            coeff2d, base, dead = _lockstep(
                st, img_idx, start, n_mcus, plan, rows_per, len(sub), mcux
            )
            if dead:
                # anomalous wave: retry dead images serially,
                # reconstruct the survivors per image (rare; keeps the
                # batched path contiguous-slice simple)
                for gi, (i, parsed, _e) in enumerate(sub):
                    if gi in dead:
                        STATS["serial_retries"] += 1
                        serial.append(i)
                        retry.add(i)
                        continue
                    if dims_only:
                        results[i] = (
                            w, h, 1 if len(comps) == 1 else 3, None
                        )
                        continue
                    slices = [
                        coeff2d[base[ci] + gi * r : base[ci] + (gi + 1) * r]
                        for ci, r in enumerate(rows_per)
                    ]
                    results[i] = _reconstruct(
                        w, h, comps, parsed[3], slices, hmax, vmax,
                        mcux, mcuy,
                    )
                continue
            if dims_only:
                nch = 1 if len(comps) == 1 else 3
                for i, _p, _e in sub:
                    results[i] = (w, h, nch, None)
                continue
            # batched reconstruct, chunked so the float64 plane working
            # set stays cache-resident (~64k output px per chunk — the
            # measured sweet spot; bigger chunks go bandwidth-bound,
            # the per-image path pays numpy call overhead per
            # thumbnail)
            step = max(1, 64_000 // max(1, w * h))
            for c0 in range(0, len(sub), step):
                chunk = sub[c0 : c0 + step]
                cbase = [base[ci] + c0 * r for ci, r in enumerate(rows_per)]
                recs = _reconstruct_group(
                    w, h, comps, [m[1][3] for m in chunk], coeff2d, cbase,
                    rows_per, hmax, vmax, mcux, mcuy,
                )
                for (i, _p, _e), rec in zip(chunk, recs):
                    results[i] = rec

    for i in sorted(serial):
        try:
            results[i] = decode_jpeg(
                payloads[i], lockstep=i not in retry, dims_only=dims_only
            )
        except Exception as ex:
            if not keep_errors:
                raise
            results[i] = ex
    return results
