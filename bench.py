"""Bench harness: headline queries at $SPARK_GRAFT_SF_DIR on
local[$SPARK_GRAFT_CPUS]. Prints ONE JSON line:
  {"metric": ..., "value": total_sec, "unit": "sec",
   "queries": {name: sec, ...}, "sf": ..., "extra": {...}}

Headline set = the flagship KG extraction (the engine's reason to
exist) + one representative per operator family, so regressions in any
family show up here.
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main():
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1)) if m else -1.0

    from kgt.spark.session import get_spark

    spark = get_spark("kgt-bench", cpus=cpus)

    import __spark_entry__ as entrymod

    # bench_queries() = queries() + the per-variant slots consolidated
    # into suite queries for the driver gate — keeps per-slot times
    # comparable with earlier rounds' BENCH files
    qs = entrymod.bench_queries()
    headline = [
        "kg_triples_orders",
        "kg_triples_bnodes",
        "kg_recovery_quarantine",
        "kg_stream_separators",
        "kg_entity_links",
        "q1_pricing_summary",
        "q3_top_orders",
        "events_sessionize",
        "kg_dict_links",
        "kg_fuzzy_link",
        "dedup_exact",
        "dedup_minhash_lsh",
        "dedup_ngram_jaccard",
        "dedup_near_verified",
        "dedup_clusters",
        "dedup_embedding",
        "kg_pretty_nested",
        "sim_topk",
        "sim_topk_ivf",
        "doc_quality",
        "doc_unigram_logprob",
        "dedup_spans",
        "multimodal_decode",
        "multimodal_jpeg_real",
        "multimodal_media_meta",
        "multimodal_frames",
        # round 6: the streaming family's driver gate (stateful LSH
        # near-dup replay, availableNow + drain) timed end-to-end
        "streaming_near_dup",
    ]

    # warm the JVM/Arrow paths once with a tiny action
    spark.range(1000).count()

    # Per-query time = MIN of n_samples back-to-back runs (default 2).
    # The sandbox VM's run-to-run noise reached 3.6× on identical jobs
    # in round 4 (see BENCH.md "noise methodology"); a single cold
    # sample per query made per-round comparisons lottery draws, and
    # min-of-samples is the established low-interference estimator the
    # scaling bench already uses. Set KGT_BENCH_SAMPLES=1 to reproduce
    # the old single-shot behavior.
    n_samples = int(os.environ.get("KGT_BENCH_SAMPLES", "2"))
    # The two CPU-bound slots that moved against the trend in round 4
    # (both inside the box's noise band, per the r4 verdict) get one
    # extra sample: min-of-3 keeps one bad draw from labelling the
    # round a regression.
    noisy_extra_sample = {"dedup_embedding", "kg_parse_throughput"}
    times = {}
    extra = {}
    total = 0.0
    for name in headline:
        fn = qs[name]
        best = first = None
        n = 0
        k = max(n_samples, 1) + (1 if name in noisy_extra_sample else 0)
        for _ in range(k):
            t0 = time.perf_counter()
            n = fn(spark, sf_dir).count()
            dt = time.perf_counter() - t0
            if first is None:
                first = dt
            best = dt if best is None else min(best, dt)
        times[name] = round(best, 3)
        total += best
        extra[f"{name}_rows"] = n
        # min-of-samples interacts with the session caches some slots
        # share (e.g. _recovery_cache's localCheckpoint: sample 1 pays
        # the parse, sample 2 counts checkpointed blocks) — when the
        # first sample is much slower, surface it so the one-time
        # materialization cost stays visible instead of min() hiding a
        # regression in the cached computation (r7 review)
        if first is not None and best > 0 and first > 1.5 * best:
            extra[f"{name}_first_sample_sec"] = round(first, 3)

    # streaming state bound (round-6 verdict): rows in the state store
    # == live buckets, members per bucket ≤ bucket_cap — measured on
    # the persisted store of the streaming_near_dup run above via the
    # Spark 4 state-store reader, not inferred from the operator code
    extra.update(entrymod.collect_stream_gate_metrics(spark))

    # ANN quality: IVF recall@5 vs brute force (the bench's accuracy
    # counterweight to the ivf speedup) at nprobe 1/2/4, plus the LSH
    # candidate ratio (banded candidates / jaccard-confirmed pairs —
    # 1.0 is perfect)
    from kgt.textops.similarity import (
        brute_force_topk,
        ivf_topk,
        recall_at_k,
        seed_centroids,
    )

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    qs_df = emb.filter(emb.vec_id < 8)
    exact5 = brute_force_topk(emb, qs_df, k=5)
    cents = seed_centroids(emb, 16)
    for nprobe in (1, 2, 4):
        extra[f"ivf_recall_at_5_nprobe{nprobe}"] = round(
            recall_at_k(
                ivf_topk(emb, qs_df, k=5, nprobe=nprobe, centroids=cents),
                exact5,
            ),
            4,
        )
    extra["ivf_recall_at_5"] = extra["ivf_recall_at_5_nprobe2"]
    # trained-quantizer recall: the deterministic Lloyd's cells the
    # sim_topk_ivf_trained oracle pins, same nprobe=2 probe budget
    from kgt.textops.similarity import train_centroids_det

    extra["ivf_recall_at_5_trained"] = round(
        recall_at_k(
            ivf_topk(
                emb, qs_df, k=5, nprobe=2,
                centroids=train_centroids_det(emb, n_cells=16, n_iter=2),
            ),
            exact5,
        ),
        4,
    )
    if "dedup_ngram_jaccard_rows" in extra and extra["dedup_ngram_jaccard_rows"]:
        extra["lsh_candidate_ratio"] = round(
            extra["dedup_minhash_lsh_rows"] / extra["dedup_ngram_jaccard_rows"], 3
        )

    # NO SILENT CAPS: report exactly what the dedup skew guards dropped
    # this run (df-capped shingles; quarantined SimHash buckets) — zero
    # on this corpus, but the claim is now measured, not assumed
    from kgt.textops.dedup import cap_stats, simhash64, simhash_bucket_stats

    sh_cap = cap_stats(entrymod._dup_shingles(spark, sf_dir), max_df=1000).first()
    extra["capped_shingles"] = sh_cap["capped_shingles"]
    extra["capped_shingle_rows"] = sh_cap["capped_shingle_rows"]
    sim_cap = simhash_bucket_stats(
        simhash64(entrymod._dup_corpus(spark, sf_dir)), bucket_cap=10000
    ).first()
    extra["simhash_quarantined_buckets"] = sim_cap["quarantined_buckets"]
    extra["simhash_quarantined_bucket_rows"] = sim_cap["quarantined_bucket_rows"]

    # IVF cell-size audit for dedup_embedding (round-5 verdict): the
    # distribution behind the intra-cell self-join — max cell size is
    # the worst single-key join cost, quarantined_* what the cell_cap
    # dropped (zero here; non-zero = the guard earning its keep).
    # Audited over the SAME tripled dup corpus the gated query joins
    # (its exact-copy clusters are precisely the skew the cap guards),
    # under the same auto √N cell rule.
    from kgt.textops.similarity import embedding_cell_stats

    cell_st = embedding_cell_stats(
        entrymod._dup_embeddings(spark, sf_dir),
        n_cells=None,  # the auto ≈√N rule dedup_embedding runs under
        nprobe=2,
        cell_cap=100_000,
    ).first()
    extra["ivf_cells_used"] = cell_st["cells_used"]
    extra["ivf_max_cell_rows"] = cell_st["max_cell_rows"]
    extra["ivf_quarantined_cells"] = cell_st["quarantined_cells"]
    extra["ivf_quarantined_cell_rows"] = cell_st["quarantined_cell_rows"]

    # fuzzy-link blocking audit: candidate volume (df-bounded by the
    # gram cap), ratio vs linked surfaces, and blocking RECALL (linked
    # typos / typo surfaces — the reason the hybrid blocking exists)
    from kgt.spark.link import _gram_tables, fuzzy_candidates
    from pyspark.sql import functions as F

    cust = spark.read.parquet(f"{sf_dir}/customer.parquet")
    surf = cust.select(F.regexp_replace("c_name", "^.", "").alias("surface"))
    fdict = cust.select(
        F.col("c_name").alias("surface"),
        F.concat(F.lit("urn:cust:"), F.col("c_custkey").cast("string")).alias(
            "iri"
        ),
    )
    # gram_size AND the df-cap form mirror _q_kg_fuzzy_link (q=4,
    # max_df_frac=0.2 — NOT a pre-floored integer, which diverges for
    # dict sizes not divisible by 5) so the audit measures the blocking
    # the timed slot actually runs
    sg, dg = _gram_tables(
        surf, fdict, max_df=None, max_df_frac=0.2, gram_size=4
    )
    n_cand = fuzzy_candidates(sg, dg).count()
    n_surf = surf.distinct().count()
    extra["fuzzy_link_candidates"] = n_cand
    if extra.get("kg_fuzzy_link_rows"):
        extra["fuzzy_link_candidate_ratio"] = round(
            n_cand / extra["kg_fuzzy_link_rows"], 3
        )
        extra["fuzzy_link_blocking_recall"] = round(
            extra["kg_fuzzy_link_rows"] / n_surf, 4
        )

    # PNG decode rate (single core): pin the unfilter-kernel speed so
    # codec regressions are visible independently of Spark scheduling.
    # Deterministic 256×256 RGB image, filter types cycling 0..4 per
    # scanline — the mixed shape a real encoder emits.
    import struct as _struct
    import zlib as _zlib

    from kgt.textops.multimodal import _PNG_SIG, _paeth, decode_png

    def _png_chunk(tag, data):
        return (
            _struct.pack(">I", len(data))
            + tag
            + data
            + _struct.pack(">I", _zlib.crc32(tag + data) & 0xFFFFFFFF)
        )

    _w = _h = 256
    _ch = 3
    _stride = _w * _ch
    _px = bytes((i * 31 + 7) % 256 for i in range(_h * _stride))
    _raw = bytearray()
    _prev = bytes(_stride)
    for _y in range(_h):
        _line = _px[_y * _stride : (_y + 1) * _stride]
        _f = _y % 5
        _raw.append(_f)
        for _i in range(_stride):
            _left = _line[_i - _ch] if _i >= _ch else 0
            _up = _prev[_i]
            _ul = _prev[_i - _ch] if _i >= _ch else 0
            if _f == 0:
                _raw.append(_line[_i])
            elif _f == 1:
                _raw.append((_line[_i] - _left) & 0xFF)
            elif _f == 2:
                _raw.append((_line[_i] - _up) & 0xFF)
            elif _f == 3:
                _raw.append((_line[_i] - (_left + _up) // 2) & 0xFF)
            else:
                _raw.append((_line[_i] - _paeth(_left, _up, _ul)) & 0xFF)
        _prev = _line
    _payload = (
        _PNG_SIG
        + _png_chunk(b"IHDR", _struct.pack(">IIBBBBB", _w, _h, 8, 2, 0, 0, 0))
        + _png_chunk(b"IDAT", _zlib.compress(bytes(_raw)))
        + _png_chunk(b"IEND", b"")
    )
    assert decode_png(_payload)[3] == _px  # correctness before speed
    _best = None
    for _ in range(3):
        _t0 = time.perf_counter()
        decode_png(_payload)
        _dt = time.perf_counter() - _t0
        _best = _dt if _best is None else min(_best, _dt)
    extra["png_decode_mpx_per_sec"] = round(_w * _h / _best / 1e6, 3)

    # JPEG decode rate (single core): deterministic smooth 256×256 RGB
    # at quality 85 — dense-enough AC to exercise the huffman scan.
    from kgt.textops.jpeg import decode_jpeg, encode_jpeg

    import numpy as _np

    _jx, _jy = _np.meshgrid(_np.arange(256), _np.arange(256))
    _jimg = _np.clip(
        _np.stack(
            [
                128 + 100 * _np.sin(_jx / 7.0) * _np.cos(_jy / 5.0),
                128 + 90 * _np.cos(_jx / 11.0),
                (_jx + _jy) % 256,
            ],
            axis=-1,
        ),
        0,
        255,
    ).astype(_np.uint8)
    _jp = encode_jpeg(256, 256, _jimg.tobytes(), quality=85, subsample="420")
    decode_jpeg(_jp)  # warm the huffman LUT cache
    _best = None
    for _ in range(3):
        _t0 = time.perf_counter()
        decode_jpeg(_jp)
        _dt = time.perf_counter() - _t0
        _best = _dt if _best is None else min(_best, _dt)
    extra["jpeg_decode_mpx_per_sec"] = round(256 * 256 / _best / 1e6, 3)

    # JPEG lockstep batch-decode rate (single core): 1024 same-geometry
    # 64×64 thumbnails (8 source images tiled — the Arrow-batch shape
    # the mapInPandas decode paths see on a thumbnail corpus; Spark's
    # default Arrow batch is 10k rows) through decode_jpeg_batch's
    # numpy symbol-level lockstep kernel, vs the same list serially.
    import kgt.textops.jpeg_simd as _jsimd

    _thumbs = []
    for _i in range(8):
        _tpx = _np.clip(
            128
            + 100 * _np.sin((_jx[:64, :64] + 13 * _i) / (5.0 + _i))
            + _jy[:64, :64] % 3,
            0,
            255,
        ).astype(_np.uint8)
        _thumbs.append(
            encode_jpeg(
                64, 64,
                _np.repeat(_tpx[..., None], 3, axis=-1).tobytes(),
                quality=85, subsample="420",
            )
        )
    _batch = _thumbs * 128  # 1024 images = 1024 lockstep lanes
    _mpx_in = 64 * 64 * len(_batch) / 1e6
    _jsimd.LOCKSTEP_ENABLED = False
    _ser_dt = None
    for _ in range(2):  # min-of-N on BOTH legs (pinned A/B method)
        _t0 = time.perf_counter()
        _ser = _jsimd.decode_jpeg_batch(_batch)
        _dt = time.perf_counter() - _t0
        _ser_dt = _dt if _ser_dt is None else min(_ser_dt, _dt)
    _jsimd.LOCKSTEP_ENABLED = True
    _best = None
    for _ in range(2):
        _t0 = time.perf_counter()
        _lk = _jsimd.decode_jpeg_batch(_batch)
        _dt = time.perf_counter() - _t0
        _best = _dt if _best is None else min(_best, _dt)
    assert _lk == _ser  # correctness before speed
    extra["jpeg_batch_decode_mpx_per_sec"] = round(_mpx_in / _best, 3)
    extra["jpeg_lockstep_speedup"] = round(_ser_dt / _best, 2)

    # PNG lockstep unfilter rate (single core): Paeth/Average rows are
    # the serial decoder's worst case (scalar left-dependency loop,
    # ~1-2 Mpx/s); 256 same-geometry 64×64 Paeth-heavy PNGs through
    # png_simd's per-row lane kernel, plus the dims_only path the
    # metadata callers take (full container validation, no unfilter).
    import kgt.textops.png_simd as _psimd
    from kgt.textops.multimodal import decode_png as _dpng
    from kgt.textops.multimodal import encode_png as _epng

    _pngs = []
    for _i in range(8):
        _gx, _gy = _np.meshgrid(_np.arange(64), _np.arange(64))
        _pim = _np.stack(
            [
                (_gx * 3 + _gy * 5 + 13 * _i) % 256,
                (_gx + 2 * _gy) % 256,
                (_gx * 7 + _i) % 256,
            ],
            axis=-1,
        ).astype(_np.uint8)
        _pngs.append(_epng(64, 64, _pim.tobytes(), filters=[4]))
    _pbatch = _pngs * 32  # 256 lanes
    _pmpx = 64 * 64 * len(_pbatch) / 1e6
    _pser = None
    for _ in range(2):
        _t0 = time.perf_counter()
        _sref = [_dpng(p) for p in _pbatch]
        _dt = time.perf_counter() - _t0
        _pser = _dt if _pser is None else min(_pser, _dt)
    _pbest = _pdims = None
    for _ in range(2):
        _t0 = time.perf_counter()
        _lref = _psimd.decode_png_batch(_pbatch)
        _dt = time.perf_counter() - _t0
        _pbest = _dt if _pbest is None else min(_pbest, _dt)
        _t0 = time.perf_counter()
        _psimd.decode_png_batch(_pbatch, dims_only=True)
        _dt = time.perf_counter() - _t0
        _pdims = _dt if _pdims is None else min(_pdims, _dt)
    assert _lref == _sref  # correctness before speed
    extra["png_paeth_decode_mpx_per_sec"] = round(_pmpx / _pser, 3)
    extra["png_batch_unfilter_mpx_per_sec"] = round(_pmpx / _pbest, 3)
    extra["png_lockstep_speedup"] = round(_pser / _pbest, 2)
    extra["png_dims_only_mpx_per_sec"] = round(_pmpx / _pdims, 3)

    # turns/sec: the north-rule throughput metric over the parse path
    from kgt.spark.parse import extract_triples
    from kgt.spark.transcripts import orders_transcripts

    tx = orders_transcripts(spark, sf_dir, with_errors=True).cache()
    n_turns = tx.count()  # materialize input so we time parse, not gen
    # min-of-3: the single-shot number wandered ±50% across sessions on
    # identical code (the pinned A/B in BENCH.md is the ground truth),
    # and round 4's min-of-2 still disagreed 4× with the same-session
    # scaling corpus; three samples inside one session is the r4-verdict
    # prescription for this slot
    parse_sec = None
    # same sample policy as the headline loop: KGT_BENCH_SAMPLES is
    # honored (KGT_BENCH_SAMPLES=1 really is single-shot + the noisy
    # extra), instead of a hardcoded 3
    n_parse_samples = max(n_samples, 1) + (
        1 if "kg_parse_throughput" in noisy_extra_sample else 0
    )
    for _ in range(n_parse_samples):
        t0 = time.perf_counter()
        n_rows = extract_triples(tx).count()
        dt = time.perf_counter() - t0
        parse_sec = dt if parse_sec is None else min(parse_sec, dt)
    tx.unpersist()
    extra["n_turns"] = n_turns
    extra["parse_rows"] = n_rows
    extra["turns_per_sec"] = round(n_turns / parse_sec, 1)
    times["kg_parse_throughput"] = round(parse_sec, 3)
    total += parse_sec

    print(
        json.dumps(
            {
                "metric": "headline_suite_sec",
                "value": round(total, 3),
                "unit": "sec",
                "queries": times,
                "sf": sf,
                "extra": extra,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
