"""Differential fuzz of the lockstep (batch-SIMD) JPEG entropy
decoder (kgt/textops/jpeg_simd.py) against the serial per-symbol
decoder (kgt/textops/jpeg.py) — the serial path is the oracle for
both decoded bytes and error behavior.

Covers: the encoder's full mode matrix (sizes incl. 1x1 and
non-MCU-aligned, qualities, 4:4:4/4:2:0/4:2:2, grayscale, restart
intervals, progressive fallbacks), malformed streams (truncations,
bit flips — the serial-retry path must reproduce exact errors),
mixed and mixed-quality batches, reconstruct chunk boundaries, and
the single-image restart-segment lockstep dispatch.
"""

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


def _serial(pay):
    S.LOCKSTEP_ENABLED = False
    try:
        return ("ok", J.decode_jpeg(pay))
    except Exception as ex:
        return ("err", type(ex).__name__, str(ex))
    finally:
        S.LOCKSTEP_ENABLED = True


def _both(pay):
    """(single-decode outcome, 20x-batch outcome) under lockstep."""
    S.LOCKSTEP_ENABLED = True
    S.LOCKSTEP_MIN_STREAMS = 16
    try:
        single = ("ok", J.decode_jpeg(pay))
    except Exception as ex:
        single = ("err", type(ex).__name__, str(ex))
    try:
        batch = ("ok", S.decode_jpeg_batch([pay] * 20))
    except Exception as ex:
        batch = ("err", type(ex).__name__, str(ex))
    return single, batch


def _assert_parity(pay, tag):
    ref = _serial(pay)
    single, batch = _both(pay)
    assert single == ref, f"single {tag}: {ref[:2]} != {single[:2]}"
    if ref[0] == "ok":
        assert batch[0] == "ok" and all(
            o == ref[1] for o in batch[1]
        ), f"batch {tag}"
    else:
        # the batch contract: first failing image raises identically
        assert batch[:3] == ref[:3], f"batch err {tag}: {ref} != {batch[:3]}"


def test_mode_matrix_differential():
    rng = np.random.default_rng(11)
    for w, h in [(8, 8), (17, 13), (33, 31), (1, 1), (7, 3)]:
        for q in (30, 85, 97):
            for nch, subs in ((3, ("444", "420", "422")), (1, ("444",))):
                for sub in subs:
                    for ri, prog in [
                        (0, False), (1, False), (3, False),
                        (0, "ss"), (0, "sa"),
                    ]:
                        px = rng.integers(
                            0, 256, size=w * h * nch, dtype=np.uint8
                        ).tobytes()
                        pay = J.encode_jpeg(
                            w, h, px, n_channels=nch, quality=q,
                            subsample=sub, restart_interval=ri,
                            progressive=prog,
                        )
                        _assert_parity(pay, (w, h, q, nch, sub, ri, prog))


def test_malformed_streams_retry_serially_with_exact_errors():
    rng = np.random.default_rng(13)
    px = rng.integers(0, 256, size=48 * 48 * 3, dtype=np.uint8).tobytes()
    good = J.encode_jpeg(
        48, 48, px, quality=85, subsample="420", restart_interval=1
    )
    before = S.STATS["serial_retries"]
    for cut in range(len(good) - 1, len(good) - 100, -7):
        _assert_parity(good[:cut], ("trunc", cut))
    for pos in range(30, len(good) - 10, 53):
        bad = bytearray(good)
        bad[pos] ^= 0x5A
        _assert_parity(bytes(bad), ("flip", pos))
    # the anomaly path (lane kill -> serial retry) must have fired
    assert S.STATS["serial_retries"] > before


def test_mixed_batch_and_first_failure_raises_like_a_loop():
    rng = np.random.default_rng(17)
    mix = []
    for i in range(60):
        wi, hi = 16 + (i % 5) * 8, 16 + (i % 3) * 16
        px = rng.integers(0, 256, size=wi * hi * 3, dtype=np.uint8).tobytes()
        prog = [False, False, "ss"][i % 3]
        mix.append(
            J.encode_jpeg(
                wi, hi, px, quality=[50, 75, 95][i % 3],
                subsample=["444", "420"][i % 2],
                restart_interval=([0, 2][i % 2] if not prog else 0),
                progressive=prog,
            )
        )
    refs = [_serial(p) for p in mix]
    assert all(r[0] == "ok" for r in refs)
    S.LOCKSTEP_ENABLED = True
    S.LOCKSTEP_MIN_STREAMS = 16
    assert S.decode_jpeg_batch(mix) == [r[1] for r in refs]
    # inject a truncated image: the batch raises the loop's exact error
    broken = mix[:10] + [mix[0][: len(mix[0]) // 2]] + mix[10:]
    ref = _serial(broken[10])
    assert ref[0] == "err"
    with pytest.raises(Exception) as ei:
        S.decode_jpeg_batch(broken)
    assert (type(ei.value).__name__, str(ei.value)) == ref[1:]


def test_mixed_quality_entropy_group_dequantizes_per_image():
    # same huffman tables + geometry (one lockstep group), different
    # quantization tables per image — dequant must stay per-image
    rng = np.random.default_rng(19)
    pays, refs = [], []
    for i in range(30):
        px = rng.integers(0, 256, size=32 * 32 * 3, dtype=np.uint8).tobytes()
        p = J.encode_jpeg(
            32, 32, px, quality=[50, 75, 95][i % 3], subsample="420"
        )
        pays.append(p)
        refs.append(_serial(p)[1])
    S.LOCKSTEP_ENABLED = True
    S.LOCKSTEP_MIN_STREAMS = 16
    assert S.decode_jpeg_batch(pays) == refs


def test_reconstruct_chunk_boundaries():
    # group sizes straddling the batched-reconstruct chunk step for
    # 16x16 images (step = 64000 // 256 = 250)
    rng = np.random.default_rng(23)
    base = []
    for i in range(7):
        px = rng.integers(0, 256, size=16 * 16 * 3, dtype=np.uint8).tobytes()
        base.append(J.encode_jpeg(16, 16, px, quality=85, subsample="420"))
    refs = [_serial(p)[1] for p in base]
    S.LOCKSTEP_ENABLED = True
    S.LOCKSTEP_MIN_STREAMS = 16
    for n in (249, 250, 251, 501):
        pays = (base * ((n + 6) // 7))[:n]
        outs = S.decode_jpeg_batch(pays)
        assert outs == [refs[i % 7] for i in range(n)], n


def test_single_image_restart_segments_take_lockstep():
    # one image whose scan splits into >= MIN_STREAMS restart segments
    # decodes through maybe_lockstep_sequential (STATS proves engagement)
    rng = np.random.default_rng(29)
    px = rng.integers(0, 256, size=128 * 128 * 3, dtype=np.uint8).tobytes()
    pay = J.encode_jpeg(
        128, 128, px, quality=85, subsample="420", restart_interval=1
    )  # 64 MCUs -> 64 segments
    ref = _serial(pay)[1]
    S.LOCKSTEP_ENABLED = True
    S.LOCKSTEP_MIN_STREAMS = 32
    before = S.STATS["lockstep_streams"]
    assert J.decode_jpeg(pay) == ref
    assert S.STATS["lockstep_streams"] == before + 64


def test_keep_errors_returns_exceptions_in_slot():
    rng = np.random.default_rng(31)
    px = rng.integers(0, 256, size=24 * 24 * 3, dtype=np.uint8).tobytes()
    good = J.encode_jpeg(24, 24, px, quality=85)
    bad = good[: len(good) // 2]
    ref_good = _serial(good)
    ref_bad = _serial(bad)
    assert ref_bad[0] == "err"
    out = S.decode_jpeg_batch([good, bad, good], keep_errors=True)
    assert out[0] == ref_good[1] and out[2] == ref_good[1]
    assert isinstance(out[1], Exception)
    assert (type(out[1]).__name__, str(out[1])) == ref_bad[1:]


def test_mixed_format_arrow_batch_keeps_row_error_order():
    # the Spark UDF wiring: _batch_jpeg_map pre-decodes the JPEG rows
    # (storing exceptions), _decode_one re-raises AT the row — so a
    # bad PNG at an earlier row still fails before a bad JPEG later
    from kgt.textops.multimodal import (
        _batch_jpeg_map,
        _decode_one,
        _media_meta_one,
        encode_png,
    )

    rng = np.random.default_rng(37)
    px = rng.integers(0, 256, size=16 * 16 * 3, dtype=np.uint8).tobytes()
    good_jpeg = J.encode_jpeg(16, 16, px, quality=85)
    bad_jpeg = good_jpeg[:40]
    good_png = encode_png(4, 4, bytes(48), color_type=2)
    bad_png = good_png[:-8]
    payloads = [good_jpeg, bad_png, bad_jpeg, good_png]
    jmap = _batch_jpeg_map(payloads)
    assert set(jmap) == {0, 2}
    assert isinstance(jmap[2], Exception)
    # row 0: precomputed rec == fresh per-row decode
    assert _decode_one(payloads[0], False, jmap[0]) == _decode_one(
        payloads[0], False
    )
    assert _media_meta_one(7, payloads[0], jmap[0]) == _media_meta_one(
        7, payloads[0]
    )
    # the per-row loop hits row 1 (bad PNG) before row 2 (bad JPEG)
    with pytest.raises(Exception):
        _decode_one(payloads[1], False, jmap.get(1))
    with pytest.raises(type(jmap[2])):
        _decode_one(payloads[2], False, jmap[2])
    with pytest.raises(type(jmap[2])):
        _media_meta_one(9, payloads[2], jmap[2])
    assert _batch_jpeg_map(payloads, fake=True) == {}
    assert _batch_jpeg_map([good_png]) == {}


def _overfull_dht(pay: bytes) -> bytes:
    """Mutate the first DHT's bits counts (same total) so the
    canonical code space overflows: counts[0] += 2 fills the whole
    space with 1-bit codes, so any further code is overfull. The
    stream still PARSES (structure is legal); only LUT build fails."""
    i = pay.find(b"\xff\xc4")
    assert i >= 0
    counts = bytearray(pay[i + 5 : i + 21])
    j = next(k for k in range(2, 16) if counts[k] >= 2)
    counts[0] += 2
    counts[j] -= 2
    return pay[: i + 5] + bytes(counts) + pay[i + 21 :]


def test_overfull_dht_group_keeps_error_contract():
    # LUT build raising inside group setup must not escape the batch:
    # every slot gets the serial error (keep_errors), and a truncated
    # image EARLIER in the batch still wins first-failure order
    rng = np.random.default_rng(41)
    px = rng.integers(0, 256, size=16 * 16 * 3, dtype=np.uint8).tobytes()
    good = J.encode_jpeg(16, 16, px, quality=85)
    bad = _overfull_dht(good)
    ref = _serial(bad)
    assert ref[0] == "err" and "overfull" in ref[2]
    S.LOCKSTEP_ENABLED = True
    S.LOCKSTEP_MIN_STREAMS = 16
    out = S.decode_jpeg_batch([bad] * 20, keep_errors=True)
    assert all(
        isinstance(o, Exception)
        and (type(o).__name__, str(o)) == ref[1:]
        for o in out
    )
    trunc = good[: len(good) // 3]
    tref = _serial(trunc)
    assert tref[0] == "err"
    with pytest.raises(Exception) as ei:
        S.decode_jpeg_batch([trunc] + [bad] * 20)
    assert (type(ei.value).__name__, str(ei.value)) == tref[1:]
    # the single-image restart-segment path: same error as serial
    seg = J.encode_jpeg(
        64, 64, rng.integers(0, 256, 64 * 64 * 3, np.uint8).tobytes(),
        quality=85, restart_interval=1,
    )
    bad_seg = _overfull_dht(seg)
    sref = _serial(bad_seg)
    assert sref[0] == "err" and "overfull" in sref[2]
    try:
        J.decode_jpeg(bad_seg)
        raised = None
    except Exception as ex:
        raised = (type(ex).__name__, str(ex))
    assert raised == sref[1:]


def test_dims_only_matches_serial_dims_and_errors():
    rng = np.random.default_rng(43)
    pays = []
    for i in range(25):
        w, h = 8 + (i % 4) * 8, 8 + (i % 3) * 8
        px = rng.integers(0, 256, size=w * h * 3, dtype=np.uint8).tobytes()
        pays.append(
            J.encode_jpeg(w, h, px, quality=85, subsample="420")
        )
    gray = J.encode_jpeg(
        16, 16, bytes(rng.integers(0, 256, 256, np.uint8)),
        n_channels=1, quality=85,
    )
    bad = pays[0][:50]
    batch = pays + [gray, bad]
    refs = [_serial(p) for p in batch]
    S.LOCKSTEP_ENABLED = True
    S.LOCKSTEP_MIN_STREAMS = 16
    out = S.decode_jpeg_batch(batch, keep_errors=True, dims_only=True)
    for o, r in zip(out, refs):
        if r[0] == "ok":
            w, h, ch, _px = r[1]
            assert o == (w, h, ch, None)
        else:
            assert isinstance(o, Exception)
            assert (type(o).__name__, str(o)) == r[1:]


def test_dead_image_retries_serially_without_relockstep():
    # an anomalous image whose own restart segments exceed MIN_STREAMS
    # must not run the lockstep kernel twice (group pass + retry)
    rng = np.random.default_rng(47)
    px = rng.integers(0, 256, size=96 * 96 * 3, dtype=np.uint8).tobytes()
    good = J.encode_jpeg(
        96, 96, px, quality=85, subsample="420", restart_interval=1
    )  # 36 MCUs -> 36 segments
    # flip a bit deep in the LAST entropy segment so parse succeeds
    # but a lane dies; hunt for a flip position that yields an error
    bad = None
    for back in range(8, 160, 4):
        cand = bytearray(good)
        cand[len(cand) - back] ^= 0x10
        r = _serial(bytes(cand))
        if r[0] == "err":
            bad = bytes(cand)
            ref = r
            break
    assert bad is not None, "no error-producing flip found"
    S.LOCKSTEP_ENABLED = True
    S.LOCKSTEP_MIN_STREAMS = 16
    before = S.STATS["lockstep_streams"]
    out = S.decode_jpeg_batch([bad], keep_errors=True)
    assert (type(out[0]).__name__, str(out[0])) == ref[1:]
    # exactly one kernel engagement (the group pass), not two
    assert S.STATS["lockstep_streams"] == before + 36


def test_coeff_budget_waves_match_serial_and_bound_memory():
    """Groups decode in coefficient-memory-bounded waves: results are
    identical to serial across wave boundaries (incl. a tail wave too
    narrow for lockstep), and the kernel's peak working set tracks
    the wave budget, not the batch size."""
    import tracemalloc

    rng = np.random.default_rng(59)
    base = []
    for i in range(5):
        px = rng.integers(0, 256, size=32 * 32 * 3, dtype=np.uint8).tobytes()
        base.append(J.encode_jpeg(32, 32, px, quality=85, subsample="420"))
    refs = [_serial(p)[1] for p in base]
    pays = (base * 20)[:97]  # odd count -> ragged tail wave
    S.LOCKSTEP_ENABLED = True
    S.LOCKSTEP_MIN_STREAMS = 8
    # 32x32 @420: rows_per sums to 24 rows -> 6144 B/image; budget of
    # 8 images/wave => 13 waves, tail wave of 1 image < MIN -> serial
    S.LOCKSTEP_COEFF_BUDGET = 8 * 24 * 64 * 4
    before = S.STATS["lockstep_streams"]
    out = S.decode_jpeg_batch(pays)
    assert out == [refs[i % 5] for i in range(97)]
    assert S.STATS["lockstep_streams"] == before + 96  # 12 waves of 8

    # memory bound: dims_only over a wide batch must not retain
    # per-image pixel or coefficient buffers across waves — peak
    # must be FLAT in batch size (the measured ~6 MB constant is the
    # per-wave unified LUT stack, 8 x 512 KB, plus the wave's coeff
    # store). 360 solid 96x96 images would hold ~20 MB of
    # coefficients + ~10 MB of pixels if retained at once.
    def peak_for(n):
        big = [
            J.encode_jpeg(
                96, 96, bytes((40 + i % 4, 90, 200 - i % 4)) * (96 * 96),
                quality=85, subsample="420",
            )
            for i in range(4)
        ] * (n // 4)
        tracemalloc.start()
        dims = S.decode_jpeg_batch(big, dims_only=True)
        _cur, peak = tracemalloc.get_traced_memory()
        tracemalloc.stop()
        assert dims == [(96, 96, 3, None)] * n
        return peak

    S.LOCKSTEP_MIN_STREAMS = 4
    S.LOCKSTEP_COEFF_BUDGET = 6 * (216 * 64 * 4)  # 6 images per wave
    peak_for(24)  # warm LUT caches outside the measured pair
    p_small, p_big = peak_for(24), peak_for(360)
    # +336 images may add parse METADATA (~6.5 KB/image of qtable/
    # spec dicts held by grouping) but must not add retained FRAMES
    # (~80 KB/image of coefficients+pixels would be ~27 MB here)
    assert p_big < 12 << 20, f"peak {p_big} bytes"
    assert p_big < p_small + (4 << 20), (p_small, p_big)


def test_wave_boundary_differential_fuzz():
    # the mode-matrix shapes, re-decoded with a budget small enough
    # that every batch splits into multiple waves — wave boundaries
    # must be invisible in both bytes and error behavior
    rng = np.random.default_rng(61)
    S.LOCKSTEP_ENABLED = True
    S.LOCKSTEP_MIN_STREAMS = 4
    for w, h, q, sub, ri in [
        (17, 13, 85, "420", 0),
        (33, 31, 97, "444", 2),
        (8, 8, 30, "422", 1),
        (7, 3, 85, "420", 0),
    ]:
        pays = []
        for _ in range(11):
            px = rng.integers(0, 256, size=w * h * 3, dtype=np.uint8)
            pays.append(
                J.encode_jpeg(
                    w, h, px.tobytes(), quality=q, subsample=sub,
                    restart_interval=ri,
                )
            )
        pays.append(pays[0][: len(pays[0]) - 3])  # truncated tail image
        refs = [_serial(p) for p in pays]
        # budget of ~4 images per wave, whatever the geometry
        S.LOCKSTEP_COEFF_BUDGET = 4 * (w * h * 8 + 64 * 64 * 4)
        out = S.decode_jpeg_batch(pays, keep_errors=True)
        for o, r in zip(out, refs):
            if r[0] == "ok":
                assert o == r[1]
            else:
                assert isinstance(o, Exception)
                assert (type(o).__name__, str(o)) == r[1:]
