"""Deduplication operators: exact, MinHash+LSH, SimHash, n-gram Jaccard.

Scale design:
  - exact dedup: one hash-groupBy (map-side partial agg) — no sort
  - MinHash/LSH: shingle → per-band min-hash → band-bucket self-join;
    candidate pairs only ever meet inside a bucket, so the join is an
    equi-join Catalyst can shuffle-hash; buckets are tiny at any scale
    unless data is pathological (then AQE skew-join splits them)
  - hashes are md5-derived (reproducible in SQL oracles); at 100 TB
    you'd swap in xxhash64 for speed — the wiring is identical
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def normalize_text(col):
    """Lowercase + collapse whitespace — shared by all dedup ops."""
    return F.trim(F.regexp_replace(F.lower(col), r"\s+", " "))


def exact_duplicates(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Groups of exact duplicates after normalization.

    Returns (fp, n_docs, min_doc_id) for groups with n_docs > 1 —
    min_doc_id is the canonical representative to keep.
    """
    return (
        docs.select(
            F.col(id_col), F.md5(normalize_text(F.col(text_col))).alias("fp")
        )
        .groupBy("fp")
        .agg(
            F.count("*").alias("n_docs"),
            F.min(id_col).alias("keep_doc_id"),
        )
        .filter(F.col("n_docs") > 1)
    )


def shingles(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text", k: int = 3) -> DataFrame:
    """(doc_id, shingle) — distinct k-word shingles of the normalized text.

    Documents shorter than k words produce a single whole-text shingle so
    they still participate.
    """
    words = F.split(normalize_text(F.col(text_col)), " ")
    n = F.size(words)
    sh = F.when(
        n >= k,
        F.transform(
            F.sequence(F.lit(1), n - (k - 1)),
            lambda i: F.concat_ws(" ", F.slice(words, i, k)),
        ),
    ).otherwise(F.array(F.concat_ws(" ", words)))
    return (
        docs.select(F.col(id_col).alias("doc_id"), F.explode(sh).alias("shingle"))
        .distinct()
    )


def minhash_signatures(
    shingle_df: DataFrame, n_hashes: int = 16
) -> DataFrame:
    """(doc_id, band 0..n-1, minhash) — one min-md5 per seeded band.

    One shuffle: groupBy(doc_id) with n_hashes map-side min aggregates,
    then posexplode. Seeding = md5(seed || shingle) so every band is an
    independent permutation approximation.
    """
    aggs = [
        F.min(F.md5(F.concat(F.lit(f"b{b}:"), F.col("shingle")))).alias(f"h{b}")
        for b in range(n_hashes)
    ]
    sig = shingle_df.groupBy("doc_id").agg(*aggs)
    return sig.select(
        "doc_id",
        F.posexplode(F.array(*[F.col(f"h{b}") for b in range(n_hashes)])).alias(
            "band", "minhash"
        ),
    )


def lsh_candidate_pairs(signatures: DataFrame) -> DataFrame:
    """Self-join on (band, minhash) buckets → distinct candidate pairs
    (a < b). With one row per band this is 1-row bands ≡ LSH with
    r=1, b=n_hashes (recall-heavy; verify with jaccard afterwards)."""
    left = signatures.alias("l")
    right = signatures.alias("r")
    return (
        left.join(
            right,
            (F.col("l.band") == F.col("r.band"))
            & (F.col("l.minhash") == F.col("r.minhash"))
            & (F.col("l.doc_id") < F.col("r.doc_id")),
        )
        .select(
            F.col("l.doc_id").alias("doc_a"), F.col("r.doc_id").alias("doc_b")
        )
        .distinct()
    )


def ngram_jaccard_pairs(
    shingle_df: DataFrame, threshold: float = 0.8, candidates: DataFrame | None = None
) -> DataFrame:
    """Exact Jaccard over shingle sets for candidate pairs.

    Without explicit candidates, pairs sharing ≥1 shingle are considered
    (the shingle self-join IS the blocking step — never a full cross
    join). Returns (doc_a, doc_b, jaccard) with jaccard ≥ threshold.
    """
    sizes = shingle_df.groupBy("doc_id").agg(F.count("*").alias("n_sh"))
    a = shingle_df.alias("a")
    b = shingle_df.alias("b")
    common = (
        a.join(
            b,
            (F.col("a.shingle") == F.col("b.shingle"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .groupBy(
            F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b")
        )
        .agg(F.count("*").alias("n_common"))
    )
    if candidates is not None:
        common = common.join(candidates, ["doc_a", "doc_b"], "left_semi")
    sa = sizes.select(
        F.col("doc_id").alias("doc_a"), F.col("n_sh").alias("n_a")
    )
    sb = sizes.select(
        F.col("doc_id").alias("doc_b"), F.col("n_sh").alias("n_b")
    )
    return (
        common.join(sa, "doc_a")
        .join(sb, "doc_b")
        .withColumn(
            "jaccard",
            F.col("n_common") / (F.col("n_a") + F.col("n_b") - F.col("n_common")),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("doc_a", "doc_b", F.round("jaccard", 6).alias("jaccard"))
    )


def simhash64(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """64-bit SimHash over word tokens: per-bit majority vote of token
    hashes. Pure column algebra: explode tokens → 64 signed bit
    contributions from xxhash64 → sum → sign → reassemble.

    Returns (doc_id, simhash long).
    """
    words = F.explode(
        F.array_distinct(F.split(normalize_text(F.col(text_col)), " "))
    ).alias("w")
    tok = docs.select(F.col(id_col).alias("doc_id"), words).withColumn(
        "h", F.xxhash64("w")
    )
    # bit b of h: shiftright + &1 → contribution ±1
    aggs = [
        F.sum(
            F.when(F.shiftright(F.col("h"), b).bitwiseAND(F.lit(1)) == 1, 1)
            .otherwise(-1)
        ).alias(f"s{b}")
        for b in range(64)
    ]
    votes = tok.groupBy("doc_id").agg(*aggs)
    sim = None
    for b in range(64):
        bit = F.when(F.col(f"s{b}") > 0, F.lit(1).cast("long")).otherwise(
            F.lit(0).cast("long")
        )
        term = F.shiftleft(bit, b)
        sim = term if sim is None else sim.bitwiseXOR(term)
    return votes.select("doc_id", sim.alias("simhash"))


def simhash_near_pairs(sim_df: DataFrame, max_hamming: int = 3) -> DataFrame:
    """Near-dup pairs by SimHash: block on 4×16-bit chunks (a pair within
    hamming ≤ 3 must agree on ≥1 chunk), then exact hamming filter."""
    chunks = sim_df.select(
        "doc_id",
        "simhash",
        F.posexplode(
            F.array(
                *[
                    F.shiftright(F.col("simhash"), 16 * c).bitwiseAND(
                        F.lit(0xFFFF)
                    )
                    for c in range(4)
                ]
            )
        ).alias("chunk_idx", "chunk"),
    )
    a = chunks.alias("a")
    b = chunks.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.chunk_idx") == F.col("b.chunk_idx"))
            & (F.col("a.chunk") == F.col("b.chunk"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            F.col("a.simhash").alias("ha"),
            F.col("b.simhash").alias("hb"),
        )
        .distinct()
    )
    hamming = F.bit_count(F.col("ha").bitwiseXOR(F.col("hb")))
    return pairs.withColumn("hamming", hamming).filter(
        F.col("hamming") <= max_hamming
    ).select("doc_a", "doc_b", "hamming")
