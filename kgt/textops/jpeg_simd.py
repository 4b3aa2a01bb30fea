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
STATS = {
    "slow_symbols": 0,
    "serial_retries": 0,
    "lockstep_streams": 0,
    # per-image coverage (decode_jpeg_batch): how many images of a
    # batch actually took the lockstep kernels vs the serial path
    # (including lockstep-then-retry) — the no-silent-fallback
    # counter the bench extras report
    "batch_images": 0,
    "serial_images": 0,
}


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
    prog_groups: dict = {}
    if LOCKSTEP_ENABLED:
        for i, p in enumerate(payloads):
            try:
                parsed = _parse_structure(p)
            except Exception:
                # decode_jpeg(p) below re-parses and raises identically
                serial.append(i)
                continue
            (w, h, comps, _qt, scans, prog, _hx, _vx, mcux, mcuy) = parsed
            if prog:
                # progressive: group by geometry + the FULL scan-sequence
                # structure (per scan: components, band, approximation,
                # restart interval, huffman table content) — everything
                # the per-scan kernels branch on; qtables stay per image
                pkey = (
                    w,
                    h,
                    tuple(comps),
                    tuple(
                        (
                            tuple(sc[0]), sc[1], sc[2], sc[3], sc[4],
                            sc[6], tuple(sorted(sc[7].items())),
                        )
                        for sc in scans
                    ),
                )
                prog_groups.setdefault(pkey, []).append((i, parsed))
                continue
            if len(scans) != 1 or len(scans[0][0]) != len(comps):
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

    for pkey, members in prog_groups.items():
        (w, h, comps, _qt0, scans0, _pr, hmax, vmax, mcux, mcuy) = members[0][1]
        # every scan has at least one lane per image (restart segments
        # only add lanes), so the group size lower-bounds the lane
        # count of the least-parallel scan
        if len(members) < LOCKSTEP_MIN_STREAMS:
            serial.extend(i for i, _p in members)
            continue
        rows_est = sum(
            mcuy * vi * mcux * hi for _c, hi, vi, _t in comps
        )
        per_img_bytes = rows_est * 64 * 4
        wave = max(1, LOCKSTEP_COEFF_BUDGET // max(1, per_img_bytes))
        for m0 in range(0, len(members), wave):
            sub = members[m0 : m0 + wave]
            if len(sub) < LOCKSTEP_MIN_STREAMS:
                serial.extend(i for i, _p in sub)
                continue
            try:
                coeff2d, base, rows_per, dead = _prog_group_decode(
                    sub, comps, sub[0][1][4], hmax, vmax, mcux, mcuy, w, h
                )
            except _ProgDead:
                # structure-level ineligibility: serial reproduces the
                # exact per-image error (or decodes the edge case)
                serial.extend(i for i, _p in sub)
                continue
            nch = 1 if len(comps) == 1 else 3
            if dead:
                for gi, (i, parsed) in enumerate(sub):
                    if gi in dead:
                        STATS["serial_retries"] += 1
                        serial.append(i)
                        retry.add(i)
                        continue
                    if dims_only:
                        results[i] = (w, h, nch, None)
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
                for i, _p in sub:
                    results[i] = (w, h, nch, None)
                continue
            step = max(1, 64_000 // max(1, w * h))
            for c0 in range(0, len(sub), step):
                chunk = sub[c0 : c0 + step]
                cbase = [base[ci] + c0 * r for ci, r in enumerate(rows_per)]
                recs = _reconstruct_group(
                    w, h, comps, [m[1][3] for m in chunk], coeff2d, cbase,
                    rows_per, hmax, vmax, mcux, mcuy,
                )
                for (i, _p), rec in zip(chunk, recs):
                    results[i] = rec

    STATS["serial_images"] += len(serial)
    STATS["batch_images"] += len(payloads) - len(serial)
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


# =====================================================================
# Progressive (SOF2) lockstep kernels — round 8.
#
# The sequential kernel above covers baseline scans; progressive images
# previously always fell back to the serial per-symbol floor
# (the routing in decode_jpeg_batch), which left ~2/3 of a typical
# progressive-heavy corpus un-lockstepped.  Progressive scans are
# sequential WITHIN an image, but images (and restart segments within
# one scan) are independent lanes — so each scan kind runs as its own
# fixed-shape lockstep kernel over all lanes of a same-structure group,
# with the scans iterated in order and the shared coefficient store
# (coeff2d) accumulating across them, exactly like the serial
# _decode_progressive.
#
# Kernel shapes (semantics mirror jpeg.py:_prog_dc_scan/_prog_ac_scan
# line for line; the serial decoder remains the byte/error oracle and
# any lane anomaly retires its image to a serial retry):
#
#  * DC first:   exactly ONE DC symbol per block, and the block
#    program is data-independent — every lane sits at the same
#    (unit, block) at every step, so the kernel is a plain loop over
#    the block sequence with one vectorized symbol decode per step
#    (no parking, no repack).
#  * DC refine:  ONE raw bit per block, no Huffman at all — a pure
#    vectorized bit-gather per block step.
#  * AC first:   symbol-level stepping like the sequential kernel, but
#    band-limited (Ss..Se), with EOB-RUN symbols (s==0, r<15: skip
#    1 + (1<<r)-1 + extra blocks in ONE step) and values shifted by
#    the point transform (<< Al).  Lanes desync across blocks → the
#    park/repack machinery of the sequential kernel.
#  * AC refine:  COEFFICIENT-level stepping (the serial loop is
#    per-coefficient too): each step a lane either decodes one symbol
#    or advances one band position — consuming a correction bit at
#    positions with nonzero history, decrementing its zero-run
#    otherwise, placing the pending ±2^Al when the run is spent.
#    History reads come straight from coeff2d (lanes own disjoint
#    rows, and the walk never revisits a position).
# =====================================================================

_POW2 = np.uint64(1) << np.arange(64, dtype=np.uint64)
_POW2IDX = np.arange(64, dtype=np.uint64)

_RAW_LUT_CACHE: dict = {}


def _raw_lut_np(bits: tuple, vals: tuple) -> np.ndarray:
    """numpy copy of jpeg.py:_decode_lut (entry = sym<<5 | len, 0 =
    invalid) for the progressive kernels, which decode symbol and
    operand bits in separate vectorized gathers. Bounded cache like
    the other LUT caches."""
    key = (bits, vals)
    e = _RAW_LUT_CACHE.get(key)
    if e is None:
        from .jpeg import _decode_lut

        e = np.asarray(_decode_lut(bits, vals), dtype=np.int64)
        if len(_RAW_LUT_CACHE) >= 16:
            _RAW_LUT_CACHE.clear()
        _RAW_LUT_CACHE[key] = e
    return e


def _recv_bits(st, off, clamp, bit, n):
    """Vectorized _SegBits.receive: n[i] bits (0..16) at cursor bit[i]
    for each lane — one clamped 32-bit window gather. Zero-feed past a
    lane's data matches the serial reader (the pad bytes are zeros);
    the consumed-bits kill check at block ends routes any lane that
    USED fed zeros to the serial oracle."""
    o = np.minimum(off + (bit >> 3), clamp)
    w = st.buf32[o].astype(np.int64)
    return (w >> (32 - (bit & 7) - n)) & ((1 << n) - 1)


def _sign_ext(v, s):
    """JPEG EXTEND: v in [0, 2^s) decoded from s bits → signed."""
    return v - (v < (1 << np.maximum(s - 1, 0))) * ((1 << s) - 1) * (s > 0)


class _ProgDead(Exception):
    """Internal: structure-level ineligibility — route the group serial."""


def _prog_scan_layout(comps, scomps, ss, se, hmax, vmax, mcux, mcuy, w, h):
    """Per-scan unit geometry, mirroring the serial decoder exactly.
    Returns (n_units, block_prog, geom) where block_prog lists the
    blocks of one unit as (ci, by, bx) and geom carries the per-
    component constants needed to turn (unit, prog-index) into a
    coefficient row offset."""
    by_id = {cid: i for i, (cid, _hi, _vi, _tq) in enumerate(comps)}
    idxs = []
    for cs, _td, _ta in scomps:
        if cs not in by_id:
            raise _ProgDead("unknown scan component")
        idxs.append(by_id[cs])
    if ss == 0 and len(idxs) > 1:
        # interleaved DC scan: MCU order, full block program
        prog = []
        for ci in idxs:
            _cid, hi, vi, _tq = comps[ci]
            for by in range(vi):
                for bx in range(hi):
                    prog.append((ci, by, bx))
        return mcux * mcuy, prog, ("mcu", None)
    # non-interleaved: raster over the component's TRUE block grid
    ci = idxs[0]
    _cid, hi, vi, _tq = comps[ci]
    comp_w = -(-w * hi // hmax)
    comp_h = -(-h * vi // vmax)
    cbw = -(-comp_w // 8)
    cbh = -(-comp_h // 8)
    return cbh * cbw, [(ci, 0, 0)], ("raster", (ci, cbw, mcux * hi))


def _prog_row(geom, comps, mcux, base_rows, lane_img, prog_entry, unit):
    """Coefficient-store row for each lane's current block."""
    kind, info = geom
    if kind == "mcu":
        ci, by, bx = prog_entry
        _cid, hi, vi, _tq = comps[ci]
        cols = mcux * hi
        my = unit // mcux
        mx = unit - my * mcux
        return ci, base_rows[ci][lane_img] + (my * vi + by) * cols + mx * hi + bx
    ci, cbw, cols = info
    r = unit // cbw
    c = unit - r * cbw
    return ci, base_rows[ci][lane_img] + r * cols + c


def _prog_dc_scan_ls(
    st, lane_img, start_unit, n_units, comps, prog, geom, mcux,
    dc_luts, ah, al, base_rows, coeff2d, limit_bits, kill_img,
):
    """Lockstep DC scan (first pass ah==0 via dc_luts, refinement via
    raw bits). All lanes advance through the identical block sequence,
    so the step index IS the block index — one vectorized symbol (or
    bit) per step. dc_luts maps prog-index → raw LUT (per-component
    tables). kill_img(mask_of_lane_ids) marks anomalous images."""
    n = lane_img.size
    B = len(prog)
    bit = np.zeros(n, np.int64)
    off, clamp = st.off, st.clamp
    C = len(comps)
    preds = np.zeros((C, n), np.int64)
    alive = np.ones(n, bool)
    max_blocks = int((n_units * B).max()) if n else 0
    nblk = n_units * B
    for b in range(max_blocks):
        act = alive & (b < nblk)
        if not act.any():
            break
        j = b % B
        unit_local = b // B
        L = np.flatnonzero(act)
        unit = start_unit[L] + unit_local
        ci, rows = _prog_row(geom, comps, mcux, base_rows, lane_img[L], prog[j], unit)
        if ah == 0:
            e = dc_luts[j][
                _recv_bits(st, off[L], clamp[L], bit[L], 16)
            ]
            bad = e == 0
            s = e >> 5
            ln = e & 31
            bad |= s > 16  # serial would spin >32-bit fills → truncated
            if bad.any():
                kb = L[bad]
                kill_img(lane_img[kb])
                alive[np.isin(lane_img, lane_img[kb])] = False
                L = L[~bad]
                if L.size == 0:
                    continue
                unit = start_unit[L] + unit_local
                _ci, rows = _prog_row(
                    geom, comps, mcux, base_rows, lane_img[L], prog[j], unit
                )
                e = dc_luts[j][_recv_bits(st, off[L], clamp[L], bit[L], 16)]
                s = e >> 5
                ln = e & 31
            v = _recv_bits(st, off[L], clamp[L], bit[L] + ln, s)
            v = _sign_ext(v, s)
            preds[ci, L] += v
            coeff2d[rows, 0] = preds[ci, L] << al
            bit[L] += ln + s
        else:
            bv = _recv_bits(st, off[L], clamp[L], bit[L], 1)
            coeff2d[rows, 0] |= (bv << al).astype(np.int32)
            bit[L] += 1
        over = bit[L] > limit_bits[L]
        if over.any():
            kb = L[over]
            kill_img(lane_img[kb])
            alive[np.isin(lane_img, lane_img[kb])] = False
    return


def _prog_ac_first_ls(
    st, lane_img, start_unit, n_units, base_arr, cbw_arr, cols_arr,
    ss, se, al, lut_stack, lbase_arr, coeff2d, limit_bits, kill_img,
    zz=_ZZ_NP,
):
    """Lockstep AC first pass (band Ss..Se, EOB runs). Lanes desync
    across blocks; parked lanes drop out via repack. Geometry
    (base row, component block width/stride) and the Huffman table
    (an offset into the stacked ``lut_stack``) are PER LANE, so
    consecutive AC scans on distinct components — independent by
    construction: disjoint coefficients, separate entropy segments —
    merge into one invocation with their lanes side by side."""
    n0 = lane_img.size
    lane = np.arange(n0)
    img = lane_img.copy()
    bit = np.zeros(n0, np.int64)
    off = st.off.copy()
    clamp = st.clamp.copy()
    lim = limit_bits.copy()
    start = start_unit.copy()
    nblk = n_units.copy()
    t = np.zeros(n0, np.int64)
    k = np.full(n0, ss, np.int64)
    base = base_arr.copy()
    cbwA = cbw_arr.copy()
    colsA = cols_arr.copy()
    lb = lbase_arr.copy()
    dead = np.zeros(n0, bool)

    def compact(keep):
        nonlocal lane, img, bit, off, clamp, lim, start, nblk, t, k, \
            base, cbwA, colsA, lb, dead
        (lane, img, bit, off, clamp, lim, start, nblk, t, k, base, cbwA,
         colsA, lb, dead) = (
            a[keep]
            for a in (lane, img, bit, off, clamp, lim, start, nblk, t, k,
                      base, cbwA, colsA, lb, dead)
        )

    while True:
        live = ~dead & (t < nblk)
        if not live.any():
            break
        if live.sum() * 2 < live.size and live.size >= 64:
            compact(np.flatnonzero(live))
            live = np.ones(lane.size, bool)
        L = np.flatnonzero(live)
        e = lut_stack[lb[L] + _recv_bits(st, off[L], clamp[L], bit[L], 16)]
        bad = e == 0
        if bad.any():
            kb = L[bad]
            kill_img(img[kb])
            dead[np.isin(img, img[kb])] = True
            L = L[~bad]
            if L.size == 0:
                continue
            e = e[~bad]
        sym = e >> 5
        ln = e & 31
        rr = sym >> 4
        s = sym & 15
        bit[L] += ln
        t_new = t[L].copy()
        k_new = k[L].copy()
        # --- EOB run: s==0, rr<15 → current block ends + (2^rr -1 +
        #     extra) more blocks skip entirely, all in this one step
        is_eob = (s == 0) & (rr < 15)
        if is_eob.any():
            i = np.flatnonzero(is_eob)
            extra = _recv_bits(st, off[L][i], clamp[L][i], bit[L][i], rr[i])
            bit[L[i]] += rr[i]
            t_new[i] += 1 + (1 << rr[i]) - 1 + extra
            k_new[i] = ss
        # --- ZRL: k += 16; band exhausted → block ends (serial's loop
        #     condition simply stops without error)
        is_zrl = (s == 0) & (rr == 15)
        if is_zrl.any():
            i = np.flatnonzero(is_zrl)
            k_new[i] += 16
            done = k_new[i] > se
            t_new[i[done]] += 1
            k_new[i[done]] = ss
        # --- coefficient: k += rr; overflow kills (serial raises);
        #     write (EXTEND(v) << al) at zz[k]; k += 1
        is_cf = s > 0
        if is_cf.any():
            i = np.flatnonzero(is_cf)
            k_new[i] += rr[i]
            over = k_new[i] > se
            if over.any():
                kb = L[i[over]]
                kill_img(img[kb])
                dead[np.isin(img, img[kb])] = True
                i = i[~over]
            if i.size:
                v = _recv_bits(st, off[L][i], clamp[L][i], bit[L][i], s[i])
                v = _sign_ext(v, s[i])
                bit[L[i]] += s[i]
                u = start[L[i]] + t_new[i]
                r_ = u // cbwA[L[i]]
                c_ = u - r_ * cbwA[L[i]]
                rows = base[L[i]] + r_ * colsA[L[i]] + c_
                coeff2d[rows, zz[k_new[i]]] = (v << al).astype(np.int64)
                k_new[i] += 1
                done = k_new[i] > se
                t_new[i[done]] += 1
                k_new[i[done]] = ss
        moved = t_new > t[L]
        if moved.any():
            i = np.flatnonzero(moved)
            overbits = bit[L[i]] > lim[L[i]]
            if overbits.any():
                kb = L[i[overbits]]
                kill_img(img[kb])
                dead[np.isin(img, img[kb])] = True
        t[L] = t_new
        k[L] = k_new
    return


def _popcount64(v):
    """Vectorized 64-bit population count (SWAR; numpy 1.x has no
    bitwise_count). v must be uint64."""
    v = v - ((v >> np.uint64(1)) & np.uint64(0x5555555555555555))
    v = (v & np.uint64(0x3333333333333333)) + (
        (v >> np.uint64(2)) & np.uint64(0x3333333333333333)
    )
    v = (v + (v >> np.uint64(4))) & np.uint64(0x0F0F0F0F0F0F0F0F)
    return (v * np.uint64(0x0101010101010101)) >> np.uint64(56)


def _prog_ac_refine_ls(
    st, lane_img, start_unit, n_units, base_arr, cbw_arr, cols_arr,
    ss, se, al, lut_stack, lbase_arr, coeff2d, limit_bits, kill_img,
    zz=_ZZ_NP,
):
    """Lockstep AC refinement (T.81 G.1.2.3).

    Every live lane does one unit of work per step:

      * band exhausted (k > Se): block boundary — EOB-run blocks
        decrement their run, the consumed-bits check runs, the lane
        advances to its next block and its band COEFFICIENT CACHE
        refreshes (one fancy gather per block, not per step);
      * mode 0: decode one (rr, s) symbol (s > 1 kills — serial raises
        'bad AC refinement symbol'); EOB symbols read their run
        extension immediately and become an EOB-run walk that keeps
        the current position;
      * walk (same step as the symbol that started it): the stop
        position is the (rr+1)-th zero-history coefficient of the
        remaining band — prefix sums over the cached band — every
        nonzero-history position before it consumes one correction
        bit, the pending ±2^Al lands on the stop, and a walk that
        exhausts the band drops the value exactly like the serial
        loop. EOB-run walks are the same machinery with no stop.

    The walk decisions read the per-block cache: within one block the
    cursor only moves forward and corrections/placements only land at
    or behind it, so the cache can never serve a stale value to a
    later walk of the same block. Writes go to coeff2d (the real
    store). Serial remains the byte/error oracle; any anomaly retires
    the lane's image to a serial retry."""
    n0 = lane_img.size
    p1 = 1 << al
    m1 = -p1
    Wb = se - ss + 1
    band = np.arange(ss, se + 1, dtype=np.int64)
    band2d = band[None, :]
    zz_band = zz[band]
    img = lane_img.copy()
    bit = np.zeros(n0, np.int64)
    off = st.off.copy()
    clamp = st.clamp.copy()
    lim = limit_bits.copy()
    start = start_unit.copy()
    nblk = n_units.copy()
    t = np.zeros(n0, np.int64)
    k = np.full(n0, ss, np.int64)
    mode = np.zeros(n0, np.int8)  # 0 symbol; 1 walk w/ stop; 2 EOB walk
    rr = np.zeros(n0, np.int64)
    val = np.zeros(n0, np.int64)
    eobn = np.zeros(n0, np.int64)
    base = base_arr.copy()
    cbwA = cbw_arr.copy()
    colsA = cols_arr.copy()
    lb = lbase_arr.copy()
    dead = np.zeros(n0, bool)
    flat = coeff2d.reshape(-1)
    cvc = np.zeros((n0, Wb), np.int32)  # band cache of the CURRENT block
    fidxc = np.zeros((n0, Wb), np.int64)  # flat indices of the cache
    nzbits = np.zeros(n0, np.uint64)  # bit j = band pos ss+j nonzero

    def block_rows(I):
        u = start[I] + t[I]
        r_ = u // cbwA[I]
        c_ = u - r_ * cbwA[I]
        return base[I] + r_ * colsA[I] + c_

    def refresh(I):
        ok = I[t[I] < nblk[I]]
        if ok.size:
            fidxc[ok] = block_rows(ok)[:, None] * 64 + zz_band[None, :]
            cvc[ok] = flat[fidxc[ok]]
            nzbits[ok] = (
                (cvc[ok] != 0).astype(np.uint64) * _POW2[None, :Wb]
            ).sum(axis=1, dtype=np.uint64)

    def compact(keep):
        nonlocal img, bit, off, clamp, lim, start, nblk, t, k, mode, \
            rr, val, eobn, base, cbwA, colsA, lb, dead, cvc, fidxc, nzbits
        (img, bit, off, clamp, lim, start, nblk, t, k, mode, rr, val,
         eobn, base, cbwA, colsA, lb, dead, cvc, fidxc, nzbits) = (
            a[keep]
            for a in (img, bit, off, clamp, lim, start, nblk, t, k,
                      mode, rr, val, eobn, base, cbwA, colsA, lb, dead,
                      cvc, fidxc, nzbits)
        )

    refresh(np.arange(n0))
    while True:
        live = ~dead & (t < nblk)
        if not live.any():
            break
        if live.sum() * 2 < live.size and live.size >= 64:
            compact(np.flatnonzero(live))
            live = ~dead & (t < nblk)

        # ---- 1. symbol decode for mode-0 lanes ----
        D = np.flatnonzero(live & (mode == 0))
        if D.size:
            e = lut_stack[lb[D] + _recv_bits(st, off[D], clamp[D], bit[D], 16)]
            sym = e >> 5
            ln = e & 31
            r0 = sym >> 4
            s0 = sym & 15
            bad = (e == 0) | (s0 > 1)
            if bad.any():
                kb = D[bad]
                kill_img(img[kb])
                dead[np.isin(img, img[kb])] = True
                D, ln, r0, s0 = D[~bad], ln[~bad], r0[~bad], s0[~bad]
            if D.size:
                bit[D] += ln
                eob = (s0 == 0) & (r0 < 15)
                if eob.any():
                    i = D[eob]
                    extra = _recv_bits(st, off[i], clamp[i], bit[i], r0[eob])
                    bit[i] += r0[eob]
                    eobn[i] = (1 << r0[eob]) + extra
                    mode[i] = 2  # walk rest of CURRENT block (k kept)
                zrl = (s0 == 0) & (r0 == 15)
                if zrl.any():
                    i = D[zrl]
                    val[i] = 0
                    rr[i] = 15
                    mode[i] = 1
                cf = s0 == 1
                if cf.any():
                    i = D[cf]
                    sign = _recv_bits(st, off[i], clamp[i], bit[i], np.int64(1))
                    bit[i] += 1
                    val[i] = np.where(sign == 1, p1, m1)
                    rr[i] = r0[cf]
                    mode[i] = 1

        # ---- 2a. multi-block EOB-run fast path: a run sitting at a
        # fresh block (k == Ss) walks up to 8 WHOLE blocks in one step
        # — gather their bands side by side, one prefix-sum gives every
        # correction bit's offset across the J blocks. Semantically
        # identical to J single-block walks back to back (full band
        # each, k = Ss); the consumed-bits kill check runs at the
        # batched boundary, which only changes WHEN an overrun lane is
        # noticed, never whether (it always is, before the scan ends).
        W2 = np.flatnonzero(
            (~dead) & (t < nblk) & (mode == 2) & (k == ss) & (eobn > 0)
        )
        if W2.size:
            J = np.minimum(np.minimum(eobn[W2], 8), nblk[W2] - t[W2])
            Jm = int(J.max())
            fidx3 = np.empty((W2.size, Jm, Wb), np.int64)
            for j in range(Jm):
                u = start[W2] + t[W2] + j
                u = np.minimum(u, nblk[W2] + start[W2] - 1)
                r_ = u // cbwA[W2]
                c_ = u - r_ * cbwA[W2]
                fidx3[:, j, :] = (
                    (base[W2] + r_ * colsA[W2] + c_)[:, None] * 64
                    + zz_band[None, :]
                )
            validj = (np.arange(Jm)[None, :] < J[:, None])[:, :, None]
            cv3 = flat[fidx3]
            use3 = (cv3 != 0) & validj
            u2 = use3.reshape(W2.size, -1)
            bo = np.cumsum(u2, axis=1, dtype=np.int32) - u2
            nb = u2.sum(axis=1)
            A = np.flatnonzero(nb > 0)
            if A.size:
                b = _recv_bits(
                    st, off[W2[A], None], clamp[W2[A], None],
                    bit[W2[A], None] + bo[A], np.int64(1),
                )
                cvf = cv3.reshape(W2.size, -1)
                upd = u2[A] & (b == 1) & ((cvf[A] & p1) == 0)
                if upd.any():
                    flat[fidx3.reshape(W2.size, -1)[A][upd]] = (
                        cvf[A][upd] + np.where(cvf[A][upd] > 0, p1, m1)
                    ).astype(np.int32)
                bit[W2[A]] += nb[A]
            eobn[W2] -= J
            t[W2] += J
            mode[W2[eobn[W2] == 0]] = 0
            overb = bit[W2] > lim[W2]
            if overb.any():
                kb = W2[overb]
                kill_img(img[kb])
                dead[np.isin(img, img[kb])] = True
            refresh(W2[~dead[W2]])

        # ---- 2b. walks (same step as the symbol that started them) ----
        W = np.flatnonzero((~dead) & (t < nblk) & (mode != 0) & (k <= se))
        if W.size:
            # 1D bitmask walk: the whole remaining band as uint64 bit
            # arithmetic (SWAR popcount + vectorized select-nth-bit) —
            # the 2D correction grid below only materializes for lanes
            # that actually owe bits this step.
            rel = (k[W] - ss).astype(np.uint64)
            ones = np.uint64(0xFFFFFFFFFFFFFFFF)
            validb = (ones >> rel) << rel  # positions >= k (bits < Wb)
            nzw = nzbits[W] & validb
            zw = ~nzbits[W] & validb & (
                (np.uint64(1) << np.uint64(Wb)) - np.uint64(1)
            )
            is1 = mode[W] == 1
            target = (rr[W] + 1).astype(np.uint64)
            has_stop = is1 & (_popcount64(zw) >= target)
            # select the target-th set bit of zw (binary search over
            # prefix popcounts; p ends as that bit's 0-based position)
            p = np.zeros(W.size, np.uint64)
            for step_ in (32, 16, 8, 4, 2, 1):
                trial = p + np.uint64(step_)
                pre = _popcount64(
                    zw & ((np.uint64(1) << trial) - np.uint64(1))
                )
                p += np.uint64(step_) * (pre < target)
            stop = np.where(has_stop, ss + p.astype(np.int64), se + 1)
            below = np.where(
                has_stop,
                (np.uint64(1) << (stop - ss).astype(np.uint64))
                - np.uint64(1),
                ones,
            )
            use_bits = nzw & below
            nb = _popcount64(use_bits).astype(np.int64)
            A = np.flatnonzero(nb > 0)
            if A.size:
                u2 = (
                    (use_bits[A][:, None] >> _POW2IDX[None, :Wb])
                    & np.uint64(1)
                ).astype(bool)
                bit_off = np.cumsum(u2, axis=1, dtype=np.int32) - u2
                b = _recv_bits(
                    st, off[W[A], None], clamp[W[A], None],
                    bit[W[A], None] + bit_off, np.int64(1),
                )
                cvA = cvc[W[A]]
                upd = u2 & (b == 1) & ((cvA & p1) == 0)
                if upd.any():
                    flat[fidxc[W[A]][upd]] = (
                        cvA[upd] + np.where(cvA[upd] > 0, p1, m1)
                    ).astype(np.int32)
                bit[W[A]] += nb[A]
            place = np.flatnonzero(has_stop & (val[W] != 0))
            if place.size:
                flat[fidxc[W[place], stop[place] - ss]] = val[
                    W[place]
                ].astype(np.int32)
                # the placed value becomes nonzero HISTORY only for
                # later blocks; within this block the cursor moves past
                # it, so nzbits needn't change — but keep it exact for
                # the multi-block fast path's gather-free reads
                nzbits[W[place]] |= np.uint64(1) << (
                    stop[place] - ss
                ).astype(np.uint64)
            k[W] = stop + 1  # mode-2 / no-stop lanes: se+1 → boundary
            mode[W[is1]] = 0  # EOB walks keep mode 2 for the boundary

        # ---- 3. block boundaries (immediately after the walk) ----
        Bd = np.flatnonzero((~dead) & (t < nblk) & (k > se))
        if Bd.size:
            e2 = mode[Bd] == 2
            if e2.any():
                i = Bd[e2]
                eobn[i] -= 1
                mode[i[eobn[i] == 0]] = 0
            mode[Bd[~e2]] = 0
            overb = bit[Bd] > lim[Bd]
            if overb.any():
                kb = Bd[overb]
                kill_img(img[kb])
                dead[np.isin(img, img[kb])] = True
            t[Bd] += 1
            k[Bd] = ss
            refresh(Bd[~dead[Bd]])
    return


def _prog_group_decode(members, comps, scans0, hmax, vmax, mcux, mcuy, w, h):
    """Run every scan of a same-structure progressive group through the
    lockstep kernels. members = [(orig_idx, parsed)] — all sharing the
    group key (geometry + full scan-sequence structure + huffman table
    content). Returns (coeff2d, comp_row_base, rows_per, dead_gi_set).
    Raises _ProgDead for structure-level ineligibility (whole group →
    serial, which reproduces the exact error per image)."""
    C = len(comps)
    G = len(members)
    rows_per = []
    for _cid, hi, vi, _tq in comps:
        rows_per.append(mcuy * vi * mcux * hi)
    comp_row_base = np.zeros(C + 1, np.int64)
    np.cumsum(np.asarray(rows_per, np.int64) * G, out=comp_row_base[1:])
    coeff2d = np.zeros((int(comp_row_base[-1]), 64), np.int32)
    base_rows = [
        comp_row_base[ci] + np.arange(G, dtype=np.int64) * rows_per[ci]
        for ci in range(C)
    ]
    dead: set[int] = set()

    # validate the scan sequence once (identical across the group);
    # mirrors _decode_progressive's checks — any violation routes the
    # whole group to the serial path for the exact per-image error
    layouts = []
    for scomps, ss, se, ah, al, _segs, ri, specs in scans0:
        if ss == 0 and se != 0:
            raise _ProgDead("DC scan must have Se == 0")
        if ss > 0 and len(scomps) != 1:
            raise _ProgDead("AC scans must be single-component")
        if ss > 0 and not 1 <= ss <= se <= 63:
            raise _ProgDead("bad spectral band")
        layouts.append(
            _prog_scan_layout(comps, scomps, ss, se, hmax, vmax, mcux, mcuy, w, h)
        )

    def kill_img(img_ids):
        for x in np.unique(np.asarray(img_ids)):
            dead.add(int(x))

    # ---- partition the scan sequence into execution LEVELS ----
    # Consecutive AC scans with identical (Ss, Se, Ah, Al, ri) on
    # pairwise-DISTINCT components are mutually independent: they touch
    # disjoint coefficients and read separate entropy segments, and
    # nothing executes between them — so they merge into ONE kernel
    # call whose lanes sit side by side (per-lane geometry + stacked
    # LUTs). For the standard progressive layering that turns the
    # three per-component AC scans of each layer into one call with 3×
    # the lanes and ~⅓ the lockstep steps. DC scans stay per-scan.
    levels: list[list[int]] = []
    si = 0
    while si < len(scans0):
        sc = scans0[si]
        if sc[1] == 0:
            levels.append([si])
            si += 1
            continue
        lvl = [si]
        seen_comps = {sc[0][0][0]}
        sj = si + 1
        while sj < len(scans0):
            nx = scans0[sj]
            if (
                nx[1] == 0
                or (nx[1], nx[2], nx[3], nx[4], nx[6])
                != (sc[1], sc[2], sc[3], sc[4], sc[6])
                or nx[0][0][0] in seen_comps
            ):
                break
            lvl.append(sj)
            seen_comps.add(nx[0][0][0])
            sj += 1
        levels.append(lvl)
        si = sj

    for lvl in levels:
        s0i = lvl[0]
        scomps, ss, se, ah, al, _segs, ri, specs = scans0[s0i]

        if ss == 0:
            # DC scan (interleaved or single-component) — per-scan call
            n_units, prog, geom = layouts[s0i]
            expected = -(-n_units // ri) if ri > 0 else 1
            seg_bytes, lane_img, start_unit, lane_units = [], [], [], []
            for gi, (oi, parsed) in enumerate(members):
                if gi in dead:
                    continue
                segs = parsed[4][s0i][5]
                if len(segs) < expected:
                    dead.add(gi)  # serial raises "missing RST" exactly
                    continue
                for s_ in range(expected):
                    seg_bytes.append(segs[s_])
                    lane_img.append(gi)
                    u0 = s_ * ri if ri > 0 else 0
                    start_unit.append(u0)
                    lane_units.append(
                        min(ri, n_units - u0) if ri > 0 else n_units
                    )
            if not seg_bytes:
                continue
            st = _Streams(seg_bytes)
            lane_img = np.asarray(lane_img, np.int64)
            start_unit = np.asarray(start_unit, np.int64)
            lane_units = np.asarray(lane_units, np.int64)
            STATS["lockstep_streams"] += len(seg_bytes)
            try:
                if ah == 0:
                    dc_by_ci = {}
                    for cs, td, _ta in scomps:
                        for i2, (cid, _h, _v, _tq) in enumerate(comps):
                            if cid == cs:
                                dc_by_ci[i2] = _raw_lut_np(*specs[(0, td)])
                    dc_luts = [dc_by_ci[ci] for (ci, _by, _bx) in prog]
                else:
                    dc_luts = [None] * len(prog)
            except ValueError:
                raise _ProgDead("overfull huffman table")
            _prog_dc_scan_ls(
                st, lane_img, start_unit, lane_units, comps, prog, geom,
                mcux, dc_luts, ah, al, base_rows, coeff2d, st.limit_bits,
                kill_img,
            )
            continue

        # AC level: one call over every member scan's lanes
        seg_bytes, lane_img, start_unit, lane_units = [], [], [], []
        base_l, cbw_l, cols_l, lb_l = [], [], [], []
        luts = []
        try:
            for mi, sj in enumerate(lvl):
                sc_j = scans0[sj]
                _cs, _td, ta = sc_j[0][0]
                luts.append(_raw_lut_np(*sc_j[7][(1, ta)]))
        except ValueError:
            raise _ProgDead("overfull huffman table")
        lut_stack = np.concatenate(luts)
        for mi, sj in enumerate(lvl):
            n_units, _prog_j, geom_j = layouts[sj]
            ci_j, cbw_j, cols_j = geom_j[1]
            expected = -(-n_units // ri) if ri > 0 else 1
            for gi, (oi, parsed) in enumerate(members):
                if gi in dead:
                    continue
                segs = parsed[4][sj][5]
                if len(segs) < expected:
                    dead.add(gi)  # serial raises "missing RST" exactly
                    continue
                for s_ in range(expected):
                    seg_bytes.append(segs[s_])
                    lane_img.append(gi)
                    u0 = s_ * ri if ri > 0 else 0
                    start_unit.append(u0)
                    lane_units.append(
                        min(ri, n_units - u0) if ri > 0 else n_units
                    )
                    base_l.append(int(base_rows[ci_j][gi]))
                    cbw_l.append(cbw_j)
                    cols_l.append(cols_j)
                    lb_l.append(mi * 65536)
        if not seg_bytes:
            continue
        st = _Streams(seg_bytes)
        lane_img = np.asarray(lane_img, np.int64)
        start_unit = np.asarray(start_unit, np.int64)
        lane_units = np.asarray(lane_units, np.int64)
        base_arr = np.asarray(base_l, np.int64)
        cbw_arr = np.asarray(cbw_l, np.int64)
        cols_arr = np.asarray(cols_l, np.int64)
        lb_arr = np.asarray(lb_l, np.int64)
        STATS["lockstep_streams"] += len(seg_bytes)
        fn = _prog_ac_first_ls if ah == 0 else _prog_ac_refine_ls
        fn(
            st, lane_img, start_unit, lane_units, base_arr, cbw_arr,
            cols_arr, ss, se, al, lut_stack, lb_arr, coeff2d,
            st.limit_bits, kill_img,
        )
    return coeff2d, comp_row_base, rows_per, dead
