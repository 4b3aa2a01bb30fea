"""Dedup operator tests: banded LSH geometry, df-cap skew guard,
SimHash blocking completeness + bucket quarantine.

These pin the scale-critical behaviors the sf-level oracles can't see:
that banding actually suppresses low-similarity candidates, that one
boilerplate shingle can't create a quadratic hot key, and that a
degenerate SimHash bucket is quarantined instead of self-joined.
"""

import pytest
from pyspark.sql import functions as F

from kgt.textops.dedup import (
    cap_shingle_df,
    lsh_candidate_pairs,
    minhash_signatures,
    ngram_jaccard_pairs,
    shingles,
    simhash64,
    simhash_near_pairs,
)


def _corpus(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


UNIQUE = [
    (i, f"alpha{i} bravo{i} charlie{i} delta{i} echo{i} foxtrot{i} golf{i} hotel{i}")
    for i in range(20)
]


def test_banded_lsh_exact_copies_always_collide(spark):
    docs = _corpus(spark, UNIQUE + [(i + 100, t) for i, t in UNIQUE])
    sh = shingles(docs)
    pairs = {
        (r["doc_a"], r["doc_b"])
        for r in lsh_candidate_pairs(
            minhash_signatures(sh, n_hashes=32, rows_per_band=4)
        ).collect()
    }
    for i, _ in UNIQUE:
        assert (i, i + 100) in pairs  # identical shingle sets → every band agrees
    # documents with disjoint shingle sets must not collide
    assert all(a % 100 == b % 100 for a, b in pairs)


def test_banded_lsh_suppresses_low_similarity(spark):
    # all docs share ONE shingle-window of overlap ("common ground here")
    # but are otherwise disjoint → pairwise jaccard ≈ 1/13 — far below
    # any dedup threshold. r=1 banding admits such pairs whenever a
    # single minhash lands on the shared shingle; 4-row bands require 4
    # simultaneous agreements.
    rows = [
        (i, f"common ground here alpha{i} bravo{i} charlie{i} delta{i} echo{i}")
        for i in range(30)
    ]
    sh = shingles(_corpus(spark, rows))
    r1 = lsh_candidate_pairs(
        minhash_signatures(sh, n_hashes=8, rows_per_band=1)
    ).count()
    banded = lsh_candidate_pairs(
        minhash_signatures(sh, n_hashes=32, rows_per_band=4)
    ).count()
    assert banded < r1
    assert banded == 0  # j≈0.08, collision prob per band ≈ j^4 ≈ 4e-5


def test_minhash_rejects_ragged_bands():
    with pytest.raises(ValueError):
        minhash_signatures(None, n_hashes=10, rows_per_band=4)


def test_ngram_jaccard_df_cap_drops_boilerplate_hot_key(spark):
    # every doc carries the same boilerplate prefix; one true near-dup
    # pair (100, 101). With the cap, boilerplate shingles (df=22 > 10)
    # leave the universe: unrelated docs share nothing, the true pair
    # keeps jaccard 1.0 on its distinctive shingles.
    boiler = "terms of service apply to all content on this site"
    rows = [(i, f"{boiler} alpha{i} bravo{i} charlie{i}") for i in range(20)]
    rows += [
        (100, f"{boiler} unique penguin waddles south quickly"),
        (101, f"{boiler} unique penguin waddles south quickly"),
    ]
    sh = shingles(_corpus(spark, rows))
    out = ngram_jaccard_pairs(sh, threshold=0.6, max_df=10)
    got = {(r["doc_a"], r["doc_b"]): r["jaccard"] for r in out.collect()}
    assert got == {(100, 101): 1.0}
    # and the capped shingle table is strictly smaller
    assert cap_shingle_df(sh, 10).count() < sh.count()


def test_ngram_jaccard_cap_disabled_matches_reference_semantics(spark):
    # with max_df=None the full universe is used — boilerplate-sharing
    # docs surface with their (low) true jaccard if above threshold
    rows = [
        (1, "aa bb cc dd ee"),
        (2, "aa bb cc dd ff"),  # jaccard 2/4 on 3-shingles vs doc 1
    ]
    sh = shingles(_corpus(spark, rows))
    out = ngram_jaccard_pairs(sh, threshold=0.4, max_df=None).collect()
    assert len(out) == 1 and out[0]["jaccard"] == 0.5


def test_simhash_halves_are_32bit(spark):
    sim = simhash64(_corpus(spark, UNIQUE[:5]))
    for r in sim.collect():
        assert 0 <= r["sim_hi"] < 2**32
        assert 0 <= r["sim_lo"] < 2**32


def test_simhash_blocking_complete_within_radius(spark):
    # identical docs: hamming 0 — must always be found (every chunk agrees)
    docs = _corpus(spark, UNIQUE + [(i + 100, t) for i, t in UNIQUE])
    pairs = {
        (r["doc_a"], r["doc_b"], r["hamming"])
        for r in simhash_near_pairs(simhash64(docs), max_hamming=3).collect()
    }
    for i, _ in UNIQUE:
        assert (i, i + 100, 0) in pairs


def test_simhash_rejects_radius_beyond_blocking_guarantee():
    with pytest.raises(ValueError):
        simhash_near_pairs(None, max_hamming=6)


def test_simhash_bucket_cap_quarantines_degenerate_bucket(spark):
    # 40 identical docs collapse to one fingerprint → 4 buckets of 40;
    # with bucket_cap=10 all are quarantined → no O(n²) pair blowup.
    # A distinctive pair in a small bucket is still found.
    rows = [(i, "same exact degenerate text") for i in range(40)]
    rows += [
        (100, "rare distinctive marsupial nocturnal burrow"),
        (101, "rare distinctive marsupial nocturnal burrow"),
    ]
    sim = simhash64(_corpus(spark, rows))
    out = {
        (r["doc_a"], r["doc_b"])
        for r in simhash_near_pairs(sim, max_hamming=3, bucket_cap=10).collect()
    }
    assert out == {(100, 101)}


def test_cap_drop_volumes_are_observable(spark):
    """NO SILENT CAPS: when the df-cap and the SimHash bucket cap
    actually fire, the dropped volumes are reported by the stats
    audits — the counts a 100-TB run must surface."""
    from kgt.textops.dedup import cap_stats, simhash_bucket_stats

    boiler = "terms of service apply to all content on this site"
    rows = [(i, f"{boiler} alpha{i} bravo{i} charlie{i}") for i in range(20)]
    sh = shingles(_corpus(spark, rows))
    got = cap_stats(sh, max_df=10).first()
    # the boilerplate prefix contributes 8 within-boiler 3-shingles with
    # df=20 each; the bridge shingles spanning into the per-doc tail are
    # unique → exactly 8 shingles capped, 20 rows each
    assert got["capped_shingles"] == 8
    assert got["capped_shingle_rows"] == 160
    # and the cap itself removes exactly those rows from the universe
    assert sh.count() - cap_shingle_df(sh, 10).count() == 160

    deg = [(i, "same exact degenerate text") for i in range(40)]
    deg += [(100, "rare distinctive marsupial nocturnal burrow")]
    sim = simhash64(_corpus(spark, deg))
    got2 = simhash_bucket_stats(sim, bucket_cap=10).first()
    # 40 identical fingerprints → all 4 chunk buckets over-cap
    assert got2["quarantined_buckets"] == 4
    assert got2["quarantined_bucket_rows"] == 160


def test_cap_stats_zero_when_nothing_fires(spark):
    from kgt.textops.dedup import cap_stats, simhash_bucket_stats

    sh = shingles(_corpus(spark, UNIQUE))
    got = cap_stats(sh, max_df=1000).first()
    assert got["capped_shingles"] == 0
    assert got["capped_shingle_rows"] == 0
    got2 = simhash_bucket_stats(
        simhash64(_corpus(spark, UNIQUE)), bucket_cap=10000
    ).first()
    assert got2["quarantined_buckets"] == 0
    assert got2["quarantined_bucket_rows"] == 0


def test_connected_components_shapes(spark):
    """Clustering fixpoint on the shapes that break naive grouping:
    a chain (transitivity), a cycle, a star, and an isolated pair."""
    from kgt.textops.dedup import connected_components

    pairs = spark.createDataFrame(
        [
            (1, 2), (2, 3), (3, 4),          # chain → comp 1
            (10, 11), (11, 12), (12, 10),    # cycle → comp 10
            (20, 21), (20, 22), (20, 23),    # star → comp 20
            (30, 31),                        # isolated pair → comp 30
        ],
        "doc_a long, doc_b long",
    )
    got = {
        r["doc_id"]: r["comp"]
        for r in connected_components(pairs).collect()
    }
    assert got == {
        1: 1, 2: 1, 3: 1, 4: 1,
        10: 10, 11: 10, 12: 10,
        20: 20, 21: 20, 22: 20, 23: 20,
        30: 30, 31: 30,
    }


def test_connected_components_long_chain_converges(spark):
    """A 40-node chain needs ~diameter rounds of plain min-label
    propagation — must converge within the budget, and every node must
    land on the chain head."""
    from kgt.textops.dedup import connected_components

    n = 40
    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(n)], "doc_a long, doc_b long"
    )
    got = connected_components(pairs, max_iter=n + 2).collect()
    assert all(r["comp"] == 0 for r in got) and len(got) == n + 1


def test_connected_components_raises_on_budget_exhaustion(spark):
    from kgt.textops.dedup import connected_components

    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(12)], "doc_a long, doc_b long"
    )
    with pytest.raises(RuntimeError, match="did not converge"):
        connected_components(pairs, max_iter=2, algorithm="minlabel")


def test_connected_components_star_agrees_with_minlabel(spark):
    """Both implementations must produce the identical (doc_id, comp)
    table on every shape the min-label test pins — chain, cycle, star,
    isolated pair — plus two components that merge through a shared
    middle node."""
    from kgt.textops.dedup import connected_components

    pairs = spark.createDataFrame(
        [
            (1, 2), (2, 3), (3, 4),
            (10, 11), (11, 12), (12, 10),
            (20, 21), (20, 22), (20, 23),
            (30, 31),
            (40, 45), (45, 41), (41, 44), (44, 42),
        ],
        "doc_a long, doc_b long",
    )
    minlabel = {
        r["doc_id"]: r["comp"]
        for r in connected_components(pairs, algorithm="minlabel").collect()
    }
    star = {
        r["doc_id"]: r["comp"]
        for r in connected_components(pairs, algorithm="star").collect()
    }
    assert star == minlabel
    assert star[44] == 40 and star[4] == 1


def test_connected_components_star_long_chain_few_rounds(spark):
    """The 100-TB skew case the star variant exists for: a 1000-doc
    mutation CHAIN. Min-label needs ~1000 rounds (the 25-round default
    budget must raise); large-star/small-star contracts it within
    ~log2(1000) ≈ 10 alternating rounds (15 is generous headroom)."""
    from kgt.textops.dedup import connected_components

    n = 1000
    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(n)], "doc_a long, doc_b long"
    )
    with pytest.raises(RuntimeError, match="did not converge"):
        connected_components(pairs, algorithm="minlabel")
    got = connected_components(pairs, algorithm="star", max_iter=15).collect()
    assert len(got) == n + 1 and all(r["comp"] == 0 for r in got)


def test_connected_components_rejects_unknown_algorithm(spark):
    from kgt.textops.dedup import connected_components

    pairs = spark.createDataFrame([(1, 2)], "doc_a long, doc_b long")
    with pytest.raises(ValueError, match="unknown algorithm"):
        connected_components(pairs, algorithm="labelprop")


def test_simhash_matches_duckdb_bit_construction(spark):
    """The md5→two-32-bit-halves construction must be reproducible in
    SQL (the oracle depends on it): recompute one doc's fingerprint in
    pure Python and compare."""
    import hashlib

    text = "the quick brown fox jumps"
    sim = simhash64(_corpus(spark, [(1, text)])).collect()[0]
    votes_hi = [0] * 32
    votes_lo = [0] * 32
    for w in set(text.split()):
        d = hashlib.md5(w.encode()).hexdigest()
        h_hi, h_lo = int(d[:8], 16), int(d[8:16], 16)
        for b in range(32):
            votes_hi[b] += 1 if (h_hi >> b) & 1 else -1
            votes_lo[b] += 1 if (h_lo >> b) & 1 else -1
    exp_hi = sum(1 << b for b in range(32) if votes_hi[b] > 0)
    exp_lo = sum(1 << b for b in range(32) if votes_lo[b] > 0)
    assert (sim["sim_hi"], sim["sim_lo"]) == (exp_hi, exp_lo)


def test_connected_components_auto_shallow_uses_minlabel(spark, monkeypatch):
    """auto on a shallow graph must converge inside the min-label probe
    and never touch the star fallback."""
    import kgt.textops.dedup as dd

    def boom(*a, **k):
        raise AssertionError("star fallback must not run on shallow graphs")

    monkeypatch.setattr(dd, "_cc_star", boom)
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (10, 11)], "doc_a long, doc_b long"
    )
    got = {
        r["doc_id"]: r["comp"]
        for r in dd.connected_components(pairs, algorithm="auto").collect()
    }
    assert got == {1: 1, 2: 1, 3: 1, 10: 10, 11: 10}


def test_connected_components_auto_chain_falls_back_to_star(spark, monkeypatch):
    """auto on the 1000-doc chain: the min-label probe exhausts its
    round budget and auto must hand the full budget to star — same
    fixpoint, O(log n) rounds."""
    import kgt.textops.dedup as dd

    called = {}
    real_star = dd._cc_star

    def spy(pairs, id_a, id_b, max_iter):
        called["max_iter"] = max_iter
        return real_star(pairs, id_a, id_b, max_iter)

    monkeypatch.setattr(dd, "_cc_star", spy)
    n = 1000
    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(n)], "doc_a long, doc_b long"
    )
    got = dd.connected_components(pairs, algorithm="auto", max_iter=15).collect()
    assert called["max_iter"] == 15
    assert len(got) == n + 1 and all(r["comp"] == 0 for r in got)


def test_unigram_logprob_hand_computed(spark):
    """4-word corpus with known counts: 'a' x3, 'b' x2, 'c' x1 over
    N=6; doc scores are exact means of ln(count/6)."""
    import math

    from kgt.textops.quality import unigram_logprob

    docs = spark.createDataFrame(
        [(1, "a  a b"), (2, "A b"), (3, "c"), (4, "   ")],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: r for r in unigram_logprob(docs).collect()}
    assert set(got) == {1, 2, 3}  # whitespace-only doc drops out
    la, lb, lc = (math.log(x / 6) for x in (3, 2, 1))
    assert got[1]["n_words"] == 3
    assert got[1]["avg_logprob"] == round((2 * la + lb) / 3, 6)
    assert got[2]["avg_logprob"] == round((la + lb) / 2, 6)  # case-folded
    assert got[3]["avg_logprob"] == round(lc, 6)
    # rarer-word docs score lower — the property the filter uses
    assert got[3]["avg_logprob"] < got[1]["avg_logprob"]


def test_duplicated_spans_profile(spark):
    """Span-level dedup (Lee et al. style k-gram fingerprints): exact
    copies hit ratio 1.0, docs sharing a long prefix mark exactly the
    shared windows, unique docs sit at 0, short docs report an empty
    profile (round 6 — they used to drop out)."""
    from kgt.textops.dedup import duplicated_spans

    shared = "the quick brown fox jumps over the lazy dog"  # 44 chars
    rows = [
        (1, shared + " in the morning sunlight today"),
        (2, shared + " in the evening rainfall tonight"),
        (3, "completely different content here sharing nothing with them"),
        (4, shared + " in the morning sunlight today"),  # exact copy of 1
        (5, "tiny"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc_id"]: r for r in duplicated_spans(docs, k=30).collect()}
    assert set(got) == {1, 2, 3, 4, 5}
    assert got[5]["n_windows"] == 0 and got[5]["dup_ratio"] is None
    assert got[1]["dup_ratio"] == 1.0 and got[4]["dup_ratio"] == 1.0
    assert got[3]["dup_ratio"] == 0.0
    # docs 1/2: every window fully inside the true common prefix
    # ("... lazy dog in the ") is duplicated
    import os

    common = len(os.path.commonprefix([rows[0][1], rows[1][1]]))
    assert got[2]["n_dup_windows"] == common - 30 + 1
    assert 0 < got[2]["dup_ratio"] < 1


def test_langid_cjk_and_adjacent_word_counts(spark):
    """Round-6 review finds: (a) zh/ja markers must match UNSEGMENTED
    CJK text (substring counting — space-token matching never fires);
    (b) adjacent repeated words count exactly ('the the the' = 3, the
    old padded-replace arithmetic counted 2)."""
    from kgt.textops.quality import language_id, quality_score

    docs = spark.createDataFrame(
        [
            (1, "这是一个测试的例子，的确是的。"),
            (2, "の例です。これはテストのためのものです。"),
            (3, "the the the"),
            (4, "a a"),
            (5, "the quick brown fox and the lazy dog of the farm"),
        ],
        "doc_id long, text string",
    )
    lang = {r["doc_id"]: r for r in language_id(docs).collect()}
    assert lang[1]["lang_pred"] == "zh" and lang[1]["marker_hits"] >= 3
    assert lang[2]["lang_pred"] == "ja" and lang[2]["marker_hits"] >= 3
    assert lang[3]["marker_hits"] == 3  # exact adjacent count
    assert lang[5]["lang_pred"] == "en"
    q = {r["doc_id"]: r for r in quality_score(docs).collect()}
    assert q[3]["stop_ratio"] == 1.0  # 3 'the' / 3 words
    assert q[4]["stop_ratio"] == 1.0  # 2 'a' / 2 words


def test_duplicated_spans_covers_short_docs(spark):
    """Round-6 review find: docs shorter than k normalized chars must
    still get a profile row (n_windows 0, dup_ratio NULL), not vanish."""
    from kgt.textops.dedup import duplicated_spans

    docs = spark.createDataFrame(
        [(1, "x" * 50), (2, "x" * 50), (3, "tiny"), (4, "")],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: r for r in duplicated_spans(docs, k=30).collect()}
    assert set(got) == {1, 2, 3, 4}
    assert got[1]["dup_ratio"] == 1.0  # exact copies share all windows
    for d in (3, 4):
        assert got[d]["n_windows"] == 0
        assert got[d]["n_dup_windows"] == 0
        assert got[d]["dup_ratio"] is None


def test_exact_duplicates_ignores_null_text(spark):
    """Round-6 review find: NULL texts must not collapse into one giant
    'duplicate' group (md5(NULL) = NULL and groupBy equates NULLs)."""
    from kgt.textops.dedup import exact_duplicates

    docs = spark.createDataFrame(
        [(1, None), (2, None), (3, None), (4, "same"), (5, "same"), (6, "")],
        "doc_id long, text string",
    )
    got = exact_duplicates(docs).collect()
    assert len(got) == 1  # only the real 'same' pair
    assert got[0]["n_docs"] == 2 and got[0]["keep_doc_id"] == 4


def test_ngram_jaccard_candidate_pushdown_equivalence(spark):
    """Round-6 review find: with `candidates`, the shingle self-join now
    runs over candidate docs only — results must be IDENTICAL to the
    unrestricted run filtered to the candidate pairs."""
    from kgt.textops.dedup import ngram_jaccard_pairs, shingles

    texts = [
        (1, "alpha beta gamma delta epsilon zeta eta theta"),
        (2, "alpha beta gamma delta epsilon zeta eta iota"),
        (3, "one two three four five six seven eight"),
        (4, "one two three four five six seven nine"),
        (5, "completely different content with no overlap at all"),
    ]
    docs = spark.createDataFrame(texts, "doc_id long, text string")
    sh = shingles(docs)
    cands = spark.createDataFrame(
        [(1, 2)], "doc_a long, doc_b long"
    )
    blocked = ngram_jaccard_pairs(sh, threshold=0.3, candidates=cands)
    full = ngram_jaccard_pairs(sh, threshold=0.3)
    want = {
        (r["doc_a"], r["doc_b"]): r["jaccard"]
        for r in full.collect()
        if (r["doc_a"], r["doc_b"]) == (1, 2)
    }
    got = {(r["doc_a"], r["doc_b"]): r["jaccard"] for r in blocked.collect()}
    assert got == want and (1, 2) in got


def test_simhash_blocking_completeness_fuzz(spark):
    """Pigeonhole completeness, fuzzed: over synthetic 64-bit
    fingerprints (planted ≤3-bit flips + random noise) the blocked
    pair set must EQUAL the brute-force hamming ≤ 3 pair set — the
    lossless-blocking claim checked against ground truth instead of
    only hamming-0 copies."""
    import itertools
    import random

    from kgt.textops.dedup import simhash_near_pairs

    rng = random.Random(77)
    fps = {}
    for i in range(60):
        fps[i] = rng.getrandbits(64)
    # planted near pairs: flip 1..3 random bits of an existing fp
    for i in range(60, 110):
        srcv = fps[rng.randrange(60)]
        for b in rng.sample(range(64), rng.randrange(1, 4)):
            srcv ^= 1 << b
        fps[i] = srcv

    def halves(v):
        # the engine's md5-derived halves are UNSIGNED 32-bit values
        # carried in longs (never sign-extended) — hamming via
        # bit_count(xor) over 64-bit longs depends on that
        return (v >> 32) & 0xFFFFFFFF, v & 0xFFFFFFFF

    rows = [(i, *halves(v)) for i, v in fps.items()]
    df = spark.createDataFrame(rows, "doc_id long, sim_hi long, sim_lo long")
    got = {
        (r["doc_a"], r["doc_b"], r["hamming"])
        for r in simhash_near_pairs(df, max_hamming=3).collect()
    }
    want = set()
    for a, b in itertools.combinations(sorted(fps), 2):
        h = bin(fps[a] ^ fps[b]).count("1")
        if h <= 3:
            want.add((a, b, h))
    assert got == want
    assert len(want) >= 40  # the planting actually created near pairs


def test_connected_components_random_graph_fuzz(spark):
    """Both CC implementations against a Python union-find ground
    truth over random graphs (mixed densities, self-loops, duplicate
    and reversed edges)."""
    import random

    from kgt.textops.dedup import connected_components

    for seed, n, m in [(1, 40, 25), (2, 60, 80), (3, 30, 5), (4, 25, 60)]:
        rng = random.Random(seed)
        edges = []
        for _ in range(m):
            a, b = rng.randrange(n), rng.randrange(n)
            edges.append((a, b))
            if rng.random() < 0.3:
                edges.append((b, a))  # reversed duplicate
        parent = list(range(n))

        def find(x):
            while parent[x] != x:
                parent[x] = parent[parent[x]]
                x = parent[x]
            return x

        for a, b in edges:
            ra, rb = find(a), find(b)
            if ra != rb:
                parent[max(ra, rb)] = min(ra, rb)
        touched = {a for e in edges for a in e}
        want = {x: find(x) for x in sorted(touched)}
        pairs = spark.createDataFrame(edges, "doc_a long, doc_b long")
        for algo in ("minlabel", "star"):
            got = {
                r["doc_id"]: r["comp"]
                for r in connected_components(pairs, algorithm=algo).collect()
            }
            assert got == want, (seed, algo)


def test_duplicated_spans_matches_python_ground_truth(spark):
    """The window-fingerprint profile against a direct Python
    computation of the same normalized k-char windows over a random
    corpus with planted shared spans."""
    import random

    from kgt.textops.dedup import duplicated_spans

    rng = random.Random(5)
    words = ["alpha", "beta", "gamma", "delta", "epsilon", "zeta"]
    shared = " ".join(rng.choice(words) for _ in range(12))
    docs = []
    for d in range(30):
        own = " ".join(rng.choice(words) for _ in range(rng.randrange(3, 15)))
        text = own if d % 3 else own + " " + shared
        if d % 7 == 0:
            text = "  " + text.upper() + "  "  # normalization fodder
        docs.append((d, text))
    k = 12
    norm = {d: " ".join(t.lower().split()) for d, t in docs}
    from collections import Counter

    allw = Counter()
    wins = {}
    for d, x in norm.items():
        ws = [x[i : i + k] for i in range(len(x) - k + 1)] if len(x) >= k else []
        wins[d] = ws
        allw.update(set())  # keep Counter import obvious
        for w in ws:
            allw[w] += 1
    want = {}
    for d, ws in wins.items():
        dup = sum(1 for w in ws if allw[w] > 1)
        want[d] = (
            len(ws),
            dup,
            round(dup / len(ws), 6) if ws else None,
        )
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = {
        r["doc_id"]: (r["n_windows"], r["n_dup_windows"], r["dup_ratio"])
        for r in duplicated_spans(df, k=k).collect()
    }
    assert got == want
    assert any(v[1] > 0 for v in want.values())  # planting worked
