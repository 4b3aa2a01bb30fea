"""Differential fuzz of the PROGRESSIVE lockstep kernels
(jpeg_simd.py round 8: DC-first / DC-refine / AC-first / AC-refine)
against the serial progressive decoder — the serial path stays the
byte/error oracle, exactly like the baseline lockstep tests.

Also pins the cross-block EOB-run paths (EOBRUN > 1 with run
extension bits) that the project's own encoder never emits (it writes
EOB0 per block): a test-local emitter re-encodes scans with batched
EOB runs, and both decoders must agree on the result.
"""

import struct

import numpy as np
import pytest

import kgt.textops.jpeg as J
import kgt.textops.jpeg_simd as S


@pytest.fixture(autouse=True)
def _restore_knobs():
    en, ms, cb = (
        S.LOCKSTEP_ENABLED, S.LOCKSTEP_MIN_STREAMS, S.LOCKSTEP_COEFF_BUDGET
    )
    yield
    S.LOCKSTEP_ENABLED, S.LOCKSTEP_MIN_STREAMS, S.LOCKSTEP_COEFF_BUDGET = (
        en, ms, cb
    )


def _img(rng, w, h, ch=3, kind="mixed"):
    x, y = np.meshgrid(np.arange(w), np.arange(h))
    if kind == "noise":
        px = rng.integers(0, 256, (h, w, ch))
    elif kind == "flat":
        px = np.full((h, w, ch), int(rng.integers(0, 256)))
    else:
        planes = [
            (128 + 100 * np.sin((x + 7 * c) / (3.0 + c)) * np.cos(y / 5.0))
            for c in range(ch)
        ]
        px = np.clip(np.stack(planes, axis=-1), 0, 255)
    return px.astype(np.uint8).tobytes()


def _serial_batch(payloads):
    S.LOCKSTEP_ENABLED = False
    try:
        return S.decode_jpeg_batch(payloads, keep_errors=True)
    finally:
        S.LOCKSTEP_ENABLED = True


def _norm(res):
    return [
        (type(r).__name__, str(r)) if isinstance(r, Exception) else r
        for r in res
    ]


def test_progressive_mode_matrix_differential():
    """Same-geometry batches across every progressive mode, sampling,
    channel count, content class and awkward sizes — lockstep bytes
    must equal serial bytes (no retries hiding a kernel bug)."""
    rng = np.random.default_rng(11)
    S.LOCKSTEP_MIN_STREAMS = 8
    cases = [
        ("ss", "444", 3, 17, 9),
        ("ss", "420", 3, 16, 16),
        ("sa", "444", 3, 24, 18),
        ("sa", "420", 3, 33, 31),  # non-MCU-aligned under 2x2 sampling
        ("sa", "422", 3, 15, 8),
        ("nc", "420", 3, 19, 13),
        ("ss", "444", 1, 8, 8),
        ("sa", "444", 1, 1, 1),
        ("sa", "444", 1, 7, 3),
    ]
    for mode, sub, ch, w, h in cases:
        for kind in ("mixed", "noise", "flat"):
            batch = [
                J.encode_jpeg(
                    w, h, _img(rng, w, h, ch, kind), n_channels=ch,
                    quality=int(rng.integers(30, 96)), subsample=sub,
                    progressive=mode,
                )
                for _ in range(12)
            ]
            ref = _norm(_serial_batch(batch))
            S.STATS["serial_retries"] = 0
            out = _norm(S.decode_jpeg_batch(batch, keep_errors=True))
            assert out == ref, (mode, sub, ch, w, h, kind)
            assert S.STATS["serial_retries"] == 0, (mode, sub, ch, w, h, kind)


def test_progressive_malformed_streams_match_serial_errors():
    """Truncations and bit flips anywhere in a progressive payload:
    the batch path must reproduce the serial outcome (value or exact
    error) for every image."""
    rng = np.random.default_rng(23)
    S.LOCKSTEP_MIN_STREAMS = 4
    base = J.encode_jpeg(
        22, 14, _img(rng, 22, 14), quality=70, subsample="420",
        progressive="sa",
    )
    muts = [base]
    for cut in (len(base) - 1, len(base) - 7, int(len(base) * 0.85)):
        muts.append(base[:cut])
    for _ in range(40):
        i = int(rng.integers(len(base) // 2, len(base)))
        b = bytearray(base)
        b[i] ^= 1 << int(rng.integers(8))
        muts.append(bytes(b))
    ref = _norm(_serial_batch(muts))
    out = _norm(S.decode_jpeg_batch(muts, keep_errors=True))
    assert out == ref


def test_progressive_mixed_geometry_groups():
    """A batch mixing geometries, modes and baseline images: grouping
    must route each image correctly and the output order / values must
    match a serial loop."""
    rng = np.random.default_rng(5)
    S.LOCKSTEP_MIN_STREAMS = 4
    batch = []
    for i in range(48):
        w, h = [(9, 7), (16, 16), (21, 5)][i % 3]
        mode = [False, "ss", "sa"][i % 3]
        batch.append(
            J.encode_jpeg(
                w, h, _img(rng, w, h, 3, "mixed"), quality=75,
                subsample="420" if i % 2 else "444", progressive=mode,
            )
        )
    ref = _norm(_serial_batch(batch))
    out = _norm(S.decode_jpeg_batch(batch, keep_errors=True))
    assert out == ref


# ---------------------------------------------------------------------
# Cross-block EOB runs (EOBRUN > 1): a valid T.81 form the project
# encoder never produces. Re-encode the AC scans of an 'ss'/'sa'
# payload with batched runs and check serial == lockstep byte-for-byte.
# ---------------------------------------------------------------------


def _reencode_with_eob_runs(payload):
    """Rewrite every AC scan's entropy data with cross-block EOB-run
    batching (first passes AND refinement), preserving the decoded
    coefficients. Parses with the project decoder's own structure
    walker, re-derives each scan's block stream from the DECODED
    coefficient store, and re-emits it."""
    (w, h, comps, qt, scans, prog, hmax, vmax, mcux, mcuy) = (
        J._parse_structure(payload)
    )
    assert prog
    store = J._decode_progressive(w, h, comps, scans, hmax, vmax, mcux, mcuy)
    by_id = {cid: i for i, (cid, _hi, _vi, _tq) in enumerate(comps)}

    # the standard K.3 AC tables carry no EOBn symbols beyond EOB0 —
    # swap the header's class-1 (AC) DHTs for a trivial all-256-symbol
    # canonical table (256 nine-bit codes) that can express every
    # (rr << 4) EOB-run symbol, and emit the AC scans with it
    full_bits = [0] * 16
    full_bits[8] = 255  # DHT counts are bytes: 255 nine-bit codes...
    full_bits[9] = 1  # ...plus one ten-bit code = all 256 symbols
    full_vals = list(range(256))
    full_codes = J._enc_codes(full_bits, full_vals)

    def swap_ac_dhts(header):
        # proper marker/segment walk (0xFFC4 can occur inside other
        # segments' DATA, so a byte-blind scan would corrupt them)
        out = bytearray(header[:2])  # SOI
        pos = 2
        while pos < len(header):
            assert header[pos] == 0xFF, "lost marker sync"
            marker = header[pos + 1]
            ln = struct.unpack(">H", header[pos + 2 : pos + 4])[0]
            segment = header[pos : pos + 2 + ln]
            if marker == 0xC4:
                seg = segment[4:]
                keep = bytearray()
                i = 0
                while i < len(seg):
                    tc_th = seg[i]
                    nv = sum(seg[i + 1 : i + 17])
                    sub = seg[i : i + 17 + nv]
                    i += 17 + nv
                    if tc_th >> 4 == 0:
                        keep += sub  # DC tables unchanged
                if keep:
                    out += b"\xff\xc4" + struct.pack(">H", len(keep) + 2)
                    out += keep
            else:
                out += segment
            pos += 2 + ln
        # append the replacement AC tables (ids 0 and 1)
        for th in (0, 1):
            seg = bytes([0x10 | th]) + bytes(full_bits) + bytes(full_vals)
            out += b"\xff\xc4" + struct.pack(">H", len(seg) + 2) + seg
        return bytes(out)

    # split the original payload into (header, [scan hdr/entropy...])
    # by re-walking markers: everything up to the first SOS is kept.
    first_sos = payload.find(b"\xff\xda")
    out = bytearray(swap_ac_dhts(payload[:first_sos]))
    pos = first_sos
    scan_i = 0
    while pos < len(payload) and payload[pos : pos + 2] == b"\xff\xda":
        ln = struct.unpack(">H", payload[pos + 2 : pos + 4])[0]
        sos_hdr = payload[pos : pos + 2 + ln]
        data_start = pos + 2 + ln
        _segs, marker_pos = J._entropy_segments(payload, data_start, 0)
        scomps, ss, se, ah, al, _sg, _ri, _specs = scans[scan_i]
        if ss == 0:
            out += payload[pos:marker_pos]  # DC scans unchanged
        else:
            out += sos_hdr
            ci = by_id[scomps[0][0]]
            _cid, hi, vi, _tq = comps[ci]
            comp_w = -(-w * hi // hmax)
            comp_h = -(-h * vi // vmax)
            cbw = -(-comp_w // 8)
            cbh = -(-comp_h // 8)
            cols = mcux * hi
            blocks = [
                # the decode store is NATURAL-order; the emitters (like
                # the encoder's comp_zz) take ZIGZAG-ordered blocks
                [store[ci][r * cols + c][J.ZIGZAG[k]] for k in range(64)]
                for r in range(cbh)
                for c in range(cbw)
            ]
            out += _emit_ac_scan_with_runs(blocks, full_codes, ah, al)
        pos = marker_pos
        scan_i += 1
    out += payload[pos:]
    return bytes(out)


def _emit_ac_scan_with_runs(blocks, ac_codes, ah, al):
    """Emit one AC scan (band 1..63) with cross-block EOB-run
    batching. For ah == 0 this is the first-pass form; for ah > 0 the
    refinement form (correction bits inside the run per T.81
    G.1.2.3)."""
    bw = J._BitWriter()
    pending = 0  # blocks covered by the open EOB run
    pend_corr: list[int] = []  # refinement: bits owed inside the run

    def flush_run():
        nonlocal pending, pend_corr
        while pending:
            m = min(pending, 1 << 14)
            rr = m.bit_length() - 1
            code, length = ac_codes[rr << 4]
            bw.write(code, length)
            if rr:
                bw.write(m - (1 << rr), rr)
            # refinement: the run's correction bits follow immediately
            for b in pend_corr:
                bw.write(b, 1)
            pend_corr = []
            pending -= m

    p1 = 1 << al
    for zzblk in blocks:
        if ah == 0:
            vals = [
                (int(c) >> al if c >= 0 else -((-int(c)) >> al))
                for c in zzblk[1:64]
            ]
            last = 0
            for i, v in enumerate(vals):
                if v:
                    last = i + 1
            if last == 0:
                if pending:
                    pending += 1
                else:
                    pending = 1
                continue
            flush_run()
            run = 0
            for k in range(1, last + 1):
                v = vals[k - 1]
                if v == 0:
                    run += 1
                    continue
                while run > 15:
                    code, length = ac_codes[0xF0]
                    bw.write(code, length)
                    run -= 16
                size = (v if v >= 0 else -v).bit_length()
                code, length = ac_codes[(run << 4) | size]
                bw.write(code, length)
                bw.write(v if v >= 0 else v + (1 << size) - 1, size)
                run = 0
            if last < 63:
                pending = 1
        else:
            kinds = []
            newk = []
            for k in range(1, 64):
                c = int(zzblk[k])
                mag = -c if c < 0 else c
                if mag >> (al + 1):
                    kinds.append(("h", (mag >> al) & 1))
                elif mag >> al:
                    kinds.append(("n", 1 if c > 0 else 0))
                    newk.append(k)
                else:
                    kinds.append(("z", 0))
            kend = newk[-1] if newk else 0
            if kend == 0:
                # whole block joins / starts an EOB run; its history
                # correction bits ride inside the run
                corr = [b for kind, b in kinds if kind == "h"]
                if pending:
                    pending += 1
                    pend_corr += corr
                else:
                    pending = 1
                    pend_corr = corr
                continue
            flush_run()
            pending_bits: list[int] = []
            run = 0
            for k in range(1, kend + 1):
                kind, b = kinds[k - 1]
                if kind == "h":
                    pending_bits.append(b)
                elif kind == "z":
                    run += 1
                    if run == 16:
                        code, length = ac_codes[0xF0]
                        bw.write(code, length)
                        for pb in pending_bits:
                            bw.write(pb, 1)
                        pending_bits = []
                        run = 0
                else:
                    code, length = ac_codes[(run << 4) | 1]
                    bw.write(code, length)
                    bw.write(b, 1)
                    for pb in pending_bits:
                        bw.write(pb, 1)
                    pending_bits = []
                    run = 0
            if kend < 63:
                pending = 1
                pend_corr = pending_bits + [
                    b for kind, b in kinds[kend:] if kind == "h"
                ]
            else:
                for pb in pending_bits:
                    bw.write(pb, 1)
    flush_run()
    return bw.flush()


@pytest.mark.parametrize("mode", ["ss", "sa"])
@pytest.mark.parametrize("kind", ["flat", "mixed"])
def test_cross_block_eob_runs_differential(mode, kind):
    rng = np.random.default_rng(31)
    S.LOCKSTEP_MIN_STREAMS = 4
    batch = []
    for i in range(16):
        base = J.encode_jpeg(
            24, 24, _img(rng, 24, 24, 3, kind), quality=85,
            subsample="420", progressive=mode,
        )
        batch.append(_reencode_with_eob_runs(base))
    ref = _norm(_serial_batch(batch))
    out = _norm(S.decode_jpeg_batch(batch, keep_errors=True))
    assert out == ref
    # the rewrite is not a no-op: at least one payload must differ from
    # a plain re-encode (i.e. runs actually appeared)
    plain = J.encode_jpeg(
        24, 24, _img(np.random.default_rng(31), 24, 24, 3, kind),
        quality=85, subsample="420", progressive=mode,
    )
    assert any(p != plain for p in batch)


def test_eob_run_rewrite_preserves_pixels():
    """The run-batched re-encode must decode (serially) to the same
    pixels as the original payload — validates the test emitter."""
    rng = np.random.default_rng(43)
    base = J.encode_jpeg(
        24, 24, _img(rng, 24, 24, 3, "mixed"), quality=85,
        subsample="420", progressive="sa",
    )
    S.LOCKSTEP_ENABLED = False
    try:
        assert J.decode_jpeg(_reencode_with_eob_runs(base)) == J.decode_jpeg(
            base
        )
    finally:
        S.LOCKSTEP_ENABLED = True


# ---------------------------------------------------------------------
# Restart intervals in progressive scans: the project encoder refuses
# DRI+progressive, so no full-container fixture can exercise the
# kernels' per-segment lanes (predictor/EOB-run resets, per-segment
# unit ranges). Drive the SCAN layer directly instead: synthesize
# segmented entropy streams with a local emitter, decode them with the
# serial scan functions (the oracle) and with a lockstep group of
# several images, and require identical coefficient stores.
# ---------------------------------------------------------------------


def _emit_dc_segments(blocks_dc, ri, dc_codes, ah, al):
    """Per-segment DC scan bytes for a single-component raster of
    `blocks_dc` DC values: first pass (ah==0, diffs reset per
    segment) or refinement (one bit per unit)."""
    segs = []
    bw = J._BitWriter()
    pred = 0
    for u, dc in enumerate(blocks_dc):
        if ri and u and u % ri == 0:
            segs.append(bw.flush())
            bw = J._BitWriter()
            pred = 0
        if ah == 0:
            t = dc >> al
            diff = t - pred
            pred = t
            size = (diff if diff >= 0 else -diff).bit_length()
            code, length = dc_codes[size]
            bw.write(code, length)
            if size:
                bw.write(diff if diff >= 0 else diff + (1 << size) - 1, size)
        else:
            bw.write((dc >> al) & 1, 1)
    segs.append(bw.flush())
    return segs


def _emit_ac_segments(blocks_zz, ri, ac_codes, ah, al):
    """Per-segment AC scan bytes (band 1..63) with EOB runs NOT
    crossing segment boundaries (the decoder resets eobrun per
    segment, so an emitter must too)."""
    segs = []
    start = 0
    n = len(blocks_zz)
    step = ri if ri else n
    while start < n:
        chunk = blocks_zz[start : start + step]
        segs.append(_emit_ac_scan_with_runs(chunk, ac_codes, ah, al))
        start += step
    return segs


@pytest.mark.parametrize("ri", [0, 3, 5])
def test_restart_interval_scan_lanes_match_serial(ri):
    """DC first/refine + AC first/refine kernels vs the serial scan
    functions on the SAME segmented streams, across several images of
    one lockstep group — per-segment predictor and EOB-run resets must
    reproduce exactly."""
    import numpy as np
    import kgt.textops.jpeg_simd as S

    rng = np.random.default_rng(77)
    comps = [(1, 1, 1, 0)]  # one component, 1x1 sampling
    mcux, mcuy = 4, 3  # 12 blocks per image
    nb = mcux * mcuy
    G = 6  # images in the lockstep group
    al = 1
    dc_bits, dc_vals = J.DC_LUMA_BITS, J.DC_LUMA_VALS
    full_bits = [0] * 16
    full_bits[8] = 255
    full_bits[9] = 1
    ac_bits, ac_vals = tuple(full_bits), tuple(range(256))
    dc_codes = J._enc_codes(list(dc_bits), list(dc_vals))
    ac_codes = J._enc_codes(list(full_bits), list(range(256)))

    # random coefficient truth per image (small values, sparse)
    truths = []
    for g in range(G):
        blocks = np.zeros((nb, 64), np.int64)
        blocks[:, 0] = rng.integers(-40, 40, nb)
        for b in range(nb):
            for _ in range(rng.integers(0, 6)):
                blocks[b, rng.integers(1, 64)] = rng.integers(-7, 8)
        truths.append(blocks)

    # scan layering: DC first (al), AC first (al), DC refine, AC refine
    def serial_decode(blocks):
        store = [[[0] * 64 for _ in range(nb)]]
        zz_blocks = [[int(blocks[b, J.ZIGZAG[k]]) for k in range(64)]
                     for b in range(nb)]
        dc_vals_list = [z[0] for z in zz_blocks]
        luts = {(0, 0): J._decode_lut(tuple(dc_bits), tuple(dc_vals)),
                (1, 0): J._decode_lut(ac_bits, ac_vals)}
        J._prog_dc_scan(
            mcux * 8, mcuy * 8, comps, store, [(0, 0, 0)], 0, al,
            _emit_dc_segments(dc_vals_list, ri, dc_codes, 0, al), ri,
            luts, 1, 1, mcux, mcuy,
        )
        J._prog_ac_scan(
            mcux * 8, mcuy * 8, comps, store, (0, 0, 0), 1, 63, 0, al,
            _emit_ac_segments(zz_blocks, ri, ac_codes, 0, al), ri, luts,
            1, 1, mcux,
        )
        J._prog_dc_scan(
            mcux * 8, mcuy * 8, comps, store, [(0, 0, 0)], 1, 0,
            _emit_dc_segments(dc_vals_list, ri, dc_codes, 1, 0), ri,
            luts, 1, 1, mcux, mcuy,
        )
        J._prog_ac_scan(
            mcux * 8, mcuy * 8, comps, store, (0, 0, 0), 1, 63, 1, 0,
            _emit_ac_segments(zz_blocks, ri, ac_codes, 1, 0), ri, luts,
            1, 1, mcux,
        )
        return [list(b) for b in store[0]]

    serial_stores = [serial_decode(t) for t in truths]

    # lockstep: drive _prog_group_decode with hand-built parsed tuples
    specs_dc = {(0, 0): (tuple(dc_bits), tuple(dc_vals))}
    specs_ac = {(1, 0): (ac_bits, ac_vals)}
    scans = []
    members = []
    for g, blocks in enumerate(truths):
        zz_blocks = [[int(blocks[b, J.ZIGZAG[k]]) for k in range(64)]
                     for b in range(nb)]
        dc_vals_list = [z[0] for z in zz_blocks]
        sc = [
            ([(1, 0, 0)], 0, 0, 0, al,
             _emit_dc_segments(dc_vals_list, ri, dc_codes, 0, al), ri,
             specs_dc),
            ([(1, 0, 0)], 1, 63, 0, al,
             _emit_ac_segments(zz_blocks, ri, ac_codes, 0, al), ri,
             specs_ac),
            ([(1, 0, 0)], 0, 0, 1, 0,
             _emit_dc_segments(dc_vals_list, ri, dc_codes, 1, 0), ri,
             specs_dc),
            ([(1, 0, 0)], 1, 63, 1, 0,
             _emit_ac_segments(zz_blocks, ri, ac_codes, 1, 0), ri,
             specs_ac),
        ]
        parsed = (mcux * 8, mcuy * 8, comps, {0: [1] * 64}, sc, True,
                  1, 1, mcux, mcuy)
        members.append((g, parsed))
        if g == 0:
            scans = sc
    coeff2d, base, rows_per, dead = S._prog_group_decode(
        members, comps, scans, 1, 1, mcux, mcuy, mcux * 8, mcuy * 8
    )
    assert not dead, f"lockstep killed images {dead}"
    for g in range(G):
        got = coeff2d[base[0] + g * rows_per[0] : base[0] + (g + 1) * rows_per[0]]
        assert [list(map(int, r)) for r in got] == serial_stores[g], (
            f"image {g} store mismatch at ri={ri}"
        )
