"""Lockstep (batch-SIMD) PNG unfiltering.

The serial decoder (multimodal.py:decode_png) pays a tight scalar
Python loop for Average/Paeth scanlines — the filters carry a true
left-dependency, so a single image can't vectorize along x (measured:
~1 Mpx/s on Paeth-heavy photographic content vs ~40 Mpx/s on
filter-0/Up content). But different IMAGES are independent, so a
same-geometry Arrow batch unfilters as parallel numpy lanes: one row
step processes row r of every lane at once — None/Up rows as whole
slabs, Sub rows as a per-channel cumsum, and only the lanes whose
row r chose Average/Paeth walk the per-pixel recurrence, as (L,)-wide
vector ops. The per-pixel CPython dispatch is paid once per
PIXEL-STEP, not once per pixel-per-image.

Unlike JPEG entropy decode, the filter schedule is known UP FRONT
(byte 0 of each scanline), so there is no anomaly/kill machinery:
images whose filter bytes are invalid are routed to the serial
decoder before the kernel runs, and the serial decoder — the oracle
for bytes and errors — raises its exact per-row error. Container
errors (bad CRC, truncated IDAT, length mismatch) are raised by the
shared parser (multimodal.py:_parse_png) identically on both paths.

``dims_only`` skips the unfilter arithmetic entirely — parse,
inflate, and filter-byte validation are the only steps of a PNG
decode that can fail, so the metadata callers get identical error
behavior at a fraction of the cost and never hold a decoded frame.

This is a pure execution-strategy twin of decode_png (no new format
semantics; reference-parity notes live in multimodal.py).
"""

from __future__ import annotations

import numpy as np

# Below this many same-geometry lanes the per-step numpy overhead
# loses to the serial scalar loop (measured crossover; see BENCH.md).
UNFILTER_MIN_LANES = 32

# Per-wave cap on the raw filter+scanline bytes the kernel holds at
# once (the joined lane buffer): a group bigger than this unfilters in
# successive waves so the full-pixel path's working set stays flat no
# matter the Arrow batch size (mirrors jpeg_simd's LOCKSTEP_COEFF_BUDGET).
UNFILTER_RAW_BUDGET = 128 << 20

# Master switch (tests flip it to force serial for differentials).
LOCKSTEP_ENABLED = True

# Introspection for tests/bench: never read on the hot path.
# serial_routed counts EVERY image the batch handed to a serial-path
# decode while lockstep was enabled (parse failure, bad filter byte,
# degenerate geometry, under-min-lanes group or tail wave).
STATS = {"lockstep_lanes": 0, "serial_routed": 0}


def _unfilter_lockstep(raws, w: int, h: int, ch: int):
    """Unfilter G same-geometry images in lockstep. raws holds each
    image's inflated filter+scanline stream (validated: length
    h*(stride+1), every filter byte in 0..4). Returns a list of G
    pixel-byte strings, bit-identical to decode_png's per-image
    unfilter — the arithmetic below mirrors it case for case
    (uint8 wraparound adds; Sub as cumsum mod 256; Average's
    (left+up)>>1 with the up-only first pixel; Paeth's exact
    predictor cascade with the b/up choice on the first pixel)."""
    G = len(raws)
    stride = w * ch
    A = np.frombuffer(b"".join(raws), np.uint8).reshape(G, h, stride + 1)
    fb = A[:, :, 0]
    lines = A[:, :, 1:]
    out = np.empty((G, h, stride), np.uint8)
    prev = np.zeros((G, stride), np.uint8)
    for r in range(h):
        f = fb[:, r]
        line = lines[:, r]
        res = np.empty((G, stride), np.uint8)
        m0 = f == 0
        if m0.any():
            res[m0] = line[m0]
        m2 = f == 2
        if m2.any():
            res[m2] = line[m2] + prev[m2]  # uint8 add wraps mod 256
        m1 = f == 1
        if m1.any():
            px = line[m1].reshape(-1, w, ch).astype(np.uint64)
            res[m1] = (
                (np.cumsum(px, axis=1) & 0xFF)
                .astype(np.uint8)
                .reshape(-1, stride)
            )
        m34 = f >= 3
        if m34.any():
            idx = np.flatnonzero(m34)
            isavg = f[idx] == 3
            ln = line[idx].astype(np.int16)
            up = prev[idx].astype(np.int16)
            o = np.empty((idx.size, stride), np.int16)
            # first pixel: Average has no left (pred = up >> 1);
            # Paeth's cascade with a = c = 0 always picks b (up)
            o[:, :ch] = (
                ln[:, :ch]
                + np.where(isavg[:, None], up[:, :ch] >> 1, up[:, :ch])
            ) & 0xFF
            all_avg = bool(isavg.all())
            all_paeth = not isavg.any()
            for i in range(ch, stride):
                a = o[:, i - ch]
                b = up[:, i]
                if all_avg:
                    pred = (a + b) >> 1
                else:
                    c = up[:, i - ch]
                    p = a + b - c
                    pa = np.abs(p - a)
                    pb = np.abs(p - b)
                    pc = np.abs(p - c)
                    pred = np.where(
                        (pa <= pb) & (pa <= pc),
                        a,
                        np.where(pb <= pc, b, c),
                    )
                    if not all_paeth:
                        pred = np.where(isavg, (a + b) >> 1, pred)
                o[:, i] = (ln[:, i] + pred) & 0xFF
            res[idx] = o.astype(np.uint8)
        out[:, r] = res
        prev = res
    return [out[g].tobytes() for g in range(G)]


def decode_png_batch(
    payloads, keep_errors: bool = False, dims_only: bool = False
) -> list:
    """Decode a batch of PNGs, unfiltering same-geometry images in
    lockstep. Per-image results are bit-identical to
    :func:`kgt.textops.multimodal.decode_png`; the first failing
    image in input order raises, matching a plain per-image loop.
    ``keep_errors=True`` stores the exception object in that image's
    slot instead (for mixed-format Arrow callers that re-raise at the
    row). ``dims_only=True`` returns (w, h, ch, None) after full
    container validation (parse + CRC + inflate + filter bytes — the
    only failure surface of a PNG decode) without materializing any
    pixels.

    Memory: the JPEG kernel's ~6× coefficient amplification doesn't
    apply, but the full-pixel path still holds each wave's joined lane
    buffer + output array + result strings (~3× the wave's pixels) on
    top of the group's parsed raw streams, so groups are unfiltered in
    UNFILTER_RAW_BUDGET-bounded waves (consumed raws are released as
    waves complete); a tail wave too narrow to amortize numpy takes
    the serial unfilter on the held stream. dims_only holds no frames
    at all."""
    from .multimodal import _parse_png, _unfilter_image, decode_png

    payloads = [bytes(p) for p in payloads]
    results: list = [None] * len(payloads)
    serial: list[int] = []
    groups: dict = {}
    if LOCKSTEP_ENABLED:
        for i, p in enumerate(payloads):
            try:
                w, h, ch, raw = _parse_png(p)
            except Exception:
                serial.append(i)  # decode_png re-raises identically
                STATS["serial_routed"] += 1
                continue
            fb = np.frombuffer(raw, np.uint8).reshape(h, w * ch + 1)[:, 0]
            if (fb > 4).any():
                # serial raises "unknown PNG filter type" at the first
                # bad ROW (earlier rows can't fail) — reproduce exactly
                serial.append(i)
                STATS["serial_routed"] += 1
                continue
            if dims_only:
                results[i] = (w, h, ch, None)
                continue
            if w == 0:
                # degenerate geometry the kernel's Sub reshape can't
                # hold (rows are a lone filter byte) — the serial
                # unfilter returns the same empty pixel string
                results[i] = (w, h, ch, _unfilter_image(raw, w, h, ch))
                STATS["serial_routed"] += 1
                continue
            groups.setdefault((w, h, ch), []).append((i, raw))
    else:
        serial = list(range(len(payloads)))

    for (w, h, ch), members in groups.items():
        per_img = h * (w * ch + 1)
        wave = max(1, UNFILTER_RAW_BUDGET // max(1, per_img))
        while members:
            sub = members[:wave]
            del members[:wave]  # release consumed raw streams
            if len(sub) < UNFILTER_MIN_LANES:
                # container already parsed + filter bytes screened:
                # the serial unfilter on the held stream can't raise,
                # and re-parsing (CRC walk + inflate) would double the
                # container cost a plain per-image loop pays once
                for i, raw in sub:
                    results[i] = (w, h, ch, _unfilter_image(raw, w, h, ch))
                STATS["serial_routed"] += len(sub)
                continue
            STATS["lockstep_lanes"] += len(sub)
            pix = _unfilter_lockstep([r for _i, r in sub], w, h, ch)
            for (i, _r), px in zip(sub, pix):
                results[i] = (w, h, ch, px)

    for i in sorted(serial):
        try:
            r = decode_png(payloads[i])
            results[i] = (r[0], r[1], r[2], None) if dims_only else r
        except Exception as ex:
            if not keep_errors:
                raise
            results[i] = ex
    return results
