"""Entity linking & canonicalization (north-rule stage 4).

Mentions (speakers/roles, tool names, IRIs referenced in turn text) are
detected with vectorized regex/column ops — never per-row Python — and
linked against a broadcast IRI/prefix dictionary. Near-miss surfaces
(typos, case, spacing) fall back to character-3-gram MinHash blocking +
Jaccard scoring, reusing the dedup LSH machinery.

Scale notes: the dictionary join is a broadcast hash join (dict is
~1k-1M rows — small side by construction); the LSH fallback only sees
UNLINKED surfaces (anti-join first), so its self-join is tiny relative
to the corpus.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from kgt.textops.dedup import normalize_text

# IRIs in free text: detected with one vectorized regexp (no UDF)
_IRI_IN_TEXT = r"<(https?://[^\s<>\"{}|^`\\]+|urn:[^\s<>\"{}|^`\\]+)>"


def detect_mentions(transcripts: DataFrame) -> DataFrame:
    """(conv_id, turn_idx, kind, surface): role mentions per turn, tool
    mentions on tool turns, IRI mentions found in the text body.

    Single scan: all mention kinds are collected into one array per
    turn and exploded once — a 3-way union would re-read (and here
    re-generate) the source once per kind.
    """
    mk = lambda kind, col: F.when(  # noqa: E731
        col.isNotNull(),
        F.array(F.struct(F.lit(kind).alias("kind"), col.alias("surface"))),
    ).otherwise(F.array().cast("array<struct<kind:string,surface:string>>"))
    iri_structs = F.transform(
        F.regexp_extract_all("text", F.lit(_IRI_IN_TEXT), 1),
        lambda s: F.struct(F.lit("iri").alias("kind"), s.alias("surface")),
    )
    all_mentions = F.concat(
        mk("role", F.col("role")), mk("tool", F.col("tool")), iri_structs
    )
    return transcripts.select(
        "conv_id",
        "turn_idx",
        F.explode(all_mentions).alias("m"),
    ).select("conv_id", "turn_idx", F.col("m.kind").alias("kind"), F.col("m.surface").alias("surface"))


def build_iri_dictionary(*sources: DataFrame) -> DataFrame:
    """Union (surface, iri, kind) sources into ONE broadcast-ready
    canonicalization dictionary: surfaces normalized, duplicates
    resolved deterministically (min iri per surface — stable across
    retries and engines).

    This is the north-star's shared dictionary: built once per job from
    the dimension tables (+ constant agent/tool rows), broadcast into
    every linking join. Dictionary size is dimension-bounded (~1k-1M
    rows), never corpus-bounded.
    """
    out = None
    for src in sources:
        part = src.select(
            normalize_text(F.col("surface")).alias("surface"),
            F.col("iri"),
            F.col("kind"),
        )
        out = part if out is None else out.unionByName(part)
    # the (iri, kind) pair is aggregated ATOMICALLY (min over the
    # struct): kind always comes from the row that won the min-iri
    # tiebreak — independent min('iri')/min('kind') could stitch a
    # pair from two different source rows when a surface collides
    # across sources
    return out.groupBy("surface").agg(
        F.min(F.struct("iri", "kind")).alias("_w")
    ).select(
        "surface",
        F.col("_w.iri").alias("iri"),
        F.col("_w.kind").alias("kind"),
    )


def link_mentions(mentions: DataFrame, iri_dict: DataFrame) -> DataFrame:
    """Exact (normalized) broadcast-join linking.

    iri_dict: (surface, iri). Returns mentions + canonical iri
    (null = unlinked, feed to `fuzzy_link`).
    """
    d = F.broadcast(
        iri_dict.select(
            normalize_text(F.col("surface")).alias("_k"),
            F.col("iri").alias("iri"),
        ).dropDuplicates(["_k"])
    )
    m = mentions.withColumn("_k", normalize_text(F.col("surface")))
    return m.join(d, "_k", "left").drop("_k")


def mentions_to_triples(linked: DataFrame) -> DataFrame:
    """Linked mentions → provenance triples joining the graph:

        <urn:conv:C> <urn:kg:mentions> <iri>        (per linked mention)
        <urn:conv:C> <urn:kg:turnMention> "kind:surface"@? per turn

    stmt_idx continues a per-conversation dense order (turn_idx-based)
    so mention triples coexist with parse triples in one table.
    """
    m = linked.filter(F.col("iri").isNotNull())
    return m.select(
        "conv_id",
        (F.col("turn_idx").cast("long")).alias("stmt_idx"),
        F.concat(F.lit("<urn:conv:"), F.col("conv_id"), F.lit(">")).alias(
            "subj"
        ),
        F.lit("<urn:kg:mentions>").alias("pred"),
        F.concat(F.lit("<"), F.col("iri"), F.lit(">")).alias("obj"),
        F.lit(False).alias("is_quoted"),
    ).distinct()


def _char3grams(col):
    padded = F.concat(F.lit("  "), normalize_text(col), F.lit("  "))
    n = F.length(padded)
    return F.array_distinct(
        F.transform(
            F.sequence(F.lit(1), F.greatest(n - 2, F.lit(1))),
            lambda i: F.substring(padded, i, 3),
        )
    )


def _gram_sigs(df, id_cols, n_hashes: int, rows_per_band: int):
    """BANDED char-gram MinHash signatures: (id_cols..., band, mh).

    Same geometry as kgt.textops.dedup.minhash_signatures — n_hashes
    independent min-md5 lanes (4 lanes per md5: 8 hex chars each, so
    hashing costs ceil(n/4) md5s per gram), grouped into bands of
    rows_per_band; the emitted mh is the md5 of the band's concatenated
    minhashes. A pair collides only when an ENTIRE band agrees:
    P(collide | jaccard j) = 1-(1-j^r)^b, so low-similarity pairs are
    suppressed exponentially. The r=1 shape this replaces collided
    linearly in j (P ≈ 57% at j=0.1 with 8 bands) — candidate
    over-generation that returns at corpus-scale surface counts.
    """
    if n_hashes % rows_per_band:
        raise ValueError("n_hashes must be a multiple of rows_per_band")
    n_bands = n_hashes // rows_per_band
    g = df.select(*id_cols, F.explode("grams").alias("gram"))
    aggs = [
        F.min(
            F.substring(
                F.md5(F.concat(F.lit(f"s{i // 4}:"), F.col("gram"))),
                1 + 8 * (i % 4),
                8,
            )
        ).alias(f"h{i}")
        for i in range(n_hashes)
    ]
    sig = g.groupBy(*id_cols).agg(*aggs)
    band_keys = [
        F.md5(
            F.concat_ws(
                "|",
                *[F.col(f"h{b * rows_per_band + j}") for j in range(rows_per_band)],
            )
        )
        for b in range(n_bands)
    ]
    return sig.select(
        *id_cols, F.posexplode(F.array(*band_keys)).alias("band", "mh")
    )


def fuzzy_candidates(
    surfaces: DataFrame,
    dict_grams: DataFrame,
    n_hashes: int = 16,
    rows_per_band: int = 2,
) -> DataFrame:
    """LSH candidate pairs (m_surface, surface, iri) between surface
    grams and dictionary grams — the blocking stage of fuzzy_link,
    exposed so callers can report the candidate count / ratio
    (no-silent-caps: blocking selectivity is a measured quantity)."""
    ss = _gram_sigs(surfaces, ["surface"], n_hashes, rows_per_band)
    ds = _gram_sigs(dict_grams, ["surface", "iri"], n_hashes, rows_per_band)
    return (
        ss.withColumnRenamed("surface", "m_surface")
        .join(ds, ["band", "mh"])
        .select("m_surface", "surface", "iri")
        .distinct()
    )


def fuzzy_link(
    unlinked_surfaces: DataFrame,
    iri_dict: DataFrame,
    n_hashes: int = 16,
    rows_per_band: int = 2,
    min_jaccard: float = 0.5,
) -> DataFrame:
    """Char-3-gram banded-MinHash blocking between UNLINKED surfaces and
    dict surfaces, then exact 3-gram Jaccard ≥ threshold, best match per
    surface. Input: (surface); output (surface, iri, jaccard).

    Feed this only the surfaces the exact broadcast join left unlinked
    (link_mentions → filter iri IS NULL): the LSH self-join then sees
    the typo tail, not the whole corpus. Defaults: 16 hashes in 8 bands
    × 2 rows — for ~20-gram surfaces, j=0.9 true matches collide w.p.
    ~0.9998 while j=0.1 noise collides w.p. ~0.077.
    """
    s = unlinked_surfaces.select("surface").distinct().withColumn(
        "grams", _char3grams(F.col("surface"))
    )
    d = iri_dict.select("surface", "iri").withColumn(
        "grams", _char3grams(F.col("surface"))
    )
    cand = fuzzy_candidates(s, d, n_hashes, rows_per_band)
    scored = (
        cand.join(s.withColumnRenamed("surface", "m_surface").select("m_surface", F.col("grams").alias("ga")), "m_surface")
        .join(d.select("surface", F.col("grams").alias("gb")), "surface")
        .withColumn(
            "jaccard",
            F.size(F.array_intersect("ga", "gb"))
            / F.size(F.array_union("ga", "gb")),
        )
        .filter(F.col("jaccard") >= min_jaccard)
    )
    best = scored.groupBy("m_surface").agg(
        F.max(F.struct("jaccard", F.col("iri"))).alias("b")
    )
    return best.select(
        F.col("m_surface").alias("surface"),
        F.col("b.iri").alias("iri"),
        F.round("b.jaccard", 6).alias("jaccard"),
    )
