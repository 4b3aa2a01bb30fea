"""Supplementary benchmarks (bench.py is FROZEN for measurement — the
round-8 driver times the round-start copy — so new kernel evidence
lives here). Prints ONE JSON line.

Covers the round-8 verdict items:
  1. progressive (SOF2) lockstep decode rate + speedup vs serial on a
     progressive corpus (ss + sa layerings, photographic-like fixture
     in the style of the existing bench fixtures);
  3. lockstep COVERAGE on the driver gate corpora — the fraction of
     images that actually took the batch kernels vs the serial path
     (no-silent-fallback), for the real doc_id/L-derived payload
     distribution at Arrow-batch granularity, plus a deliberately
     mixed-geometry fixture.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np


def _doc_lens(sf_dir, limit=5000):
    """(doc_id, len(text)) straight from the driver's parquet via
    pyarrow — the same distribution the gate's mapInPandas sees."""
    import pyarrow.parquet as pq

    tb = pq.read_table(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    ids = tb.column("doc_id").to_pylist()[:limit]
    lens = [len(t) for t in tb.column("text").to_pylist()[:limit]]
    return list(zip(ids, lens))


def main():
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    out: dict = {}

    from kgt.textops.jpeg import encode_jpeg
    import kgt.textops.jpeg_simd as jsimd
    import kgt.textops.png_simd as psimd
    from kgt.textops.multimodal import encode_png

    # ---- 1. progressive lockstep kernel rate (single core) ----
    # photographic-like 64x64 fixtures (smooth gradients + mild
    # texture — the existing bench fixtures' style), both progressive
    # layerings the encoder emits; 1024 same-geometry lanes = the
    # Arrow-batch shape of a thumbnail corpus.
    x, y = np.meshgrid(np.arange(64), np.arange(64))

    def mk(i):
        r = 128 + 90 * np.sin((x + 11 * i) / 9.0) * np.cos((y + 5 * i) / 7.0)
        g = 128 + 80 * np.cos((x - 3 * i) / 13.0) + 8 * ((x + y + i) % 3)
        b = ((x * 2 + y + 7 * i) % 256) * 0.5 + 64
        return np.clip(np.stack([r, g, b], axis=-1), 0, 255).astype(
            np.uint8
        ).tobytes()

    prog_batch = [
        encode_jpeg(
            64, 64, mk(i % 64), quality=80, subsample="420",
            progressive="ss" if i % 2 == 0 else "sa",
        )
        for i in range(1024)
    ]
    mpx = 64 * 64 * len(prog_batch) / 1e6
    jsimd.LOCKSTEP_ENABLED = False
    ser = best_s = None
    for _ in range(2):
        t0 = time.perf_counter()
        ser = jsimd.decode_jpeg_batch(prog_batch)
        dt = time.perf_counter() - t0
        best_s = dt if best_s is None else min(best_s, dt)
    jsimd.LOCKSTEP_ENABLED = True
    best_l = None
    for _ in range(2):
        t0 = time.perf_counter()
        lk = jsimd.decode_jpeg_batch(prog_batch)
        dt = time.perf_counter() - t0
        best_l = dt if best_l is None else min(best_l, dt)
    if lk != ser:  # correctness before speed (survives python -O)
        raise AssertionError("progressive lockstep != serial")
    out["jpeg_prog_batch_decode_mpx_per_sec"] = round(mpx / best_l, 3)
    out["jpeg_prog_serial_mpx_per_sec"] = round(mpx / best_s, 3)
    out["jpeg_prog_lockstep_speedup"] = round(best_s / best_l, 2)

    # per-mode split so neither layering hides behind the other
    # (min-of-2 on both legs, the pinned A/B method)
    for mode in ("ss", "sa"):
        sub = [
            encode_jpeg(64, 64, mk(i % 64), quality=80, subsample="420",
                        progressive=mode)
            for i in range(1024)
        ]
        ts = tl = None
        for _ in range(2):
            jsimd.LOCKSTEP_ENABLED = False
            t0 = time.perf_counter()
            s_ = jsimd.decode_jpeg_batch(sub)
            dt = time.perf_counter() - t0
            ts = dt if ts is None else min(ts, dt)
            jsimd.LOCKSTEP_ENABLED = True
            t0 = time.perf_counter()
            l_ = jsimd.decode_jpeg_batch(sub)
            dt = time.perf_counter() - t0
            tl = dt if tl is None else min(tl, dt)
        if l_ != s_:
            raise AssertionError(f"progressive {mode} lockstep != serial")
        out[f"jpeg_prog_{mode}_lockstep_speedup"] = round(ts / tl, 2)

    # ---- 3. lockstep coverage on the GATE corpora ----
    # multimodal_jpeg_real's exact payload law (dims from text length,
    # mode cycling baseline/ss/sa by doc_id), decoded at the same
    # Arrow-batch granularity Spark uses (2048-row batches).
    docs = _doc_lens(sf_dir)
    payloads = []
    for d, L in docs:
        w, h = L % 29 + 1, (L * 5) % 23 + 1
        rgb = bytes(((d * 37) % 256, (d * 57) % 256, (d * 77) % 256))
        payloads.append(
            encode_jpeg(
                w, h, rgb * (w * h), quality=75,
                subsample="444" if d % 2 == 0 else "420",
                progressive=[False, "ss", "sa"][d % 3],
            )
        )
    jsimd.STATS["batch_images"] = jsimd.STATS["serial_images"] = 0
    for b0 in range(0, len(payloads), 2048):
        jsimd.decode_jpeg_batch(payloads[b0 : b0 + 2048])
    tot = jsimd.STATS["batch_images"] + jsimd.STATS["serial_images"]
    out["jpeg_gate_lockstep_coverage"] = round(
        jsimd.STATS["batch_images"] / max(tot, 1), 4
    )
    out["jpeg_gate_images"] = tot

    # PNG gate corpus (multimodal_decode_real's PNG branch: doc_id%5==0)
    png_payloads = []
    for d, L in docs:
        if d % 5 != 0:
            continue
        w = L % 40 + 1
        h = (L * 7) % 40 + 1
        px = bytes((d * 31 + i) % 256 for i in range(w * h * 3))
        png_payloads.append(encode_png(w, h, px, color_type=2))
    psimd.STATS["lockstep_lanes"] = psimd.STATS["serial_routed"] = 0
    for b0 in range(0, len(png_payloads), 2048):
        psimd.decode_png_batch(png_payloads[b0 : b0 + 2048])
    lanes = psimd.STATS["lockstep_lanes"]
    ser_r = psimd.STATS["serial_routed"]
    out["png_gate_lockstep_coverage"] = round(lanes / max(lanes + ser_r, 1), 4)
    out["png_gate_images"] = lanes + ser_r

    # deliberately MIXED-geometry fixtures: every image a different
    # size — the same-geometry group key can send everything serial;
    # report it instead of letting the uniform-thumbnail numbers imply
    # universal coverage (restart-segment JPEGs still lockstep as
    # single images; PNGs have no equivalent, coverage honestly ~0)
    jm = [
        encode_jpeg(17 + i % 37, 11 + (i * 3) % 29,
                    bytes(((i * 37) % 256, 10, 200)) * ((17 + i % 37) * (11 + (i * 3) % 29)),
                    quality=75)
        for i in range(512)
    ]
    jsimd.STATS["batch_images"] = jsimd.STATS["serial_images"] = 0
    jsimd.decode_jpeg_batch(jm)
    out["jpeg_mixed_geometry_coverage"] = round(
        jsimd.STATS["batch_images"]
        / max(jsimd.STATS["batch_images"] + jsimd.STATS["serial_images"], 1),
        4,
    )
    pm = []
    for i in range(256):
        w = 9 + i % 31
        h = 7 + (i * 5) % 23
        pm.append(encode_png(w, h, bytes((i + j) % 256 for j in range(w * h * 3)), color_type=2))
    psimd.STATS["lockstep_lanes"] = psimd.STATS["serial_routed"] = 0
    psimd.decode_png_batch(pm)
    out["png_mixed_geometry_coverage"] = round(
        psimd.STATS["lockstep_lanes"]
        / max(psimd.STATS["lockstep_lanes"] + psimd.STATS["serial_routed"], 1),
        4,
    )

    # grounding for the stride-bucketed-padding evaluation (verdict
    # item 3): at the PNG gate corpus' sizes, how much of a serial
    # decode is the unfilter at all? If it's a small fraction, padded
    # cross-geometry lanes cannot buy a meaningful speedup on this
    # corpus no matter how well they batch.
    from kgt.textops.multimodal import _parse_png, _unfilter_image, decode_png

    t0 = time.perf_counter()
    parsed = [_parse_png(p) for p in png_payloads]
    t_parse = time.perf_counter() - t0
    t0 = time.perf_counter()
    for w, h, ch, raw in parsed:
        _unfilter_image(raw, w, h, ch)
    t_unf = time.perf_counter() - t0
    t0 = time.perf_counter()
    for p in png_payloads:
        decode_png(p)
    t_full = time.perf_counter() - t0
    out["png_gate_unfilter_frac_of_decode"] = round(t_unf / t_full, 4)
    out["png_gate_parse_frac_of_decode"] = round(t_parse / t_full, 4)

    print(json.dumps({"metric": "bench_extra_r08", "extra": out}))


if __name__ == "__main__":
    main()
