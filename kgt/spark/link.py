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

from pyspark.sql import DataFrame, Window, functions as F

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


def _gram_sigs(gram_rows, id_cols, n_hashes: int, rows_per_band: int):
    """BANDED char-gram MinHash signatures from exploded (id…, gram)
    rows: (id_cols..., band, mh).

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
    sig = gram_rows.groupBy(*id_cols).agg(*aggs)
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


def _gram_tables(
    unlinked_surfaces: DataFrame, iri_dict: DataFrame, max_df: int | None
):
    """Exploded, optionally df-capped gram tables for both sides:
    sg(surface, gram), dg(surface, iri, gram).

    The df-cap is the dedup family's boilerplate guard applied to
    LINKING: grams shared by more than max_df DICTIONARY entries (a
    constant name prefix, zero-padding runs) carry no discriminative
    signal but dominate both the LSH buckets and the verify join — one
    hot gram is an O(df²) key. Dropping them from the UNIVERSE (both
    sides: signatures, intersection, set sizes) is the standard
    stopword semantics; document frequency is computed on the
    dictionary side, which is dimension-bounded, so the cap list
    broadcasts. A surface whose grams are ALL capped has no signature
    and simply stays unlinked.
    """
    sg = (
        unlinked_surfaces.select("surface")
        .distinct()
        .withColumn("grams", _char3grams(F.col("surface")))
        .select("surface", F.explode("grams").alias("gram"))
    )
    dg = iri_dict.select(
        "surface", "iri", F.explode(_char3grams(F.col("surface"))).alias("gram")
    )
    if max_df is not None:
        hot = (
            dg.groupBy("gram")
            .agg(F.count("*").alias("df"))
            .filter(F.col("df") > max_df)
            .select("gram")
        )
        sg = sg.join(F.broadcast(hot), "gram", "left_anti")
        dg = dg.join(F.broadcast(hot), "gram", "left_anti")
    return sg, dg


def _prefix_grams(gram_rows, id_cols, gram_df, t: float):
    """Restrict exploded (id…, gram) rows to each entity's PREFIX: its
    p rarest grams in a single global (df, gram) order, with
    p = m − ⌈t·m⌉ + 1 for an m-gram entity.

    This is prefix filtering (SSJoin/PPJoin): two sets with jaccard ≥ t
    MUST share at least one prefix gram under a consistent global
    order, so blocking on prefixes alone is EXACT for the verify
    threshold — no minhash variance — while candidates shrink from
    "every shared gram" to "shared RARE gram": the moderately-common
    grams (df in the hundreds-to-thousands) that turn all-gram blocking
    into Σ df² pair explosions never enter a prefix. df comes from the
    dictionary side (dimension-bounded, broadcast); grams unseen there
    rank rarest and match nothing.
    """
    g = gram_rows.join(F.broadcast(gram_df), "gram", "left").withColumn(
        "_df", F.coalesce(F.col("df"), F.lit(0))
    )
    w = Window.partitionBy(*id_cols).orderBy("_df", "gram")
    wc = Window.partitionBy(*id_cols)
    return (
        g.withColumn("_rn", F.row_number().over(w))
        .withColumn("_m", F.count(F.lit(1)).over(wc))
        .filter(
            F.col("_rn")
            <= F.col("_m") - F.ceil(F.lit(float(t)) * F.col("_m")) + 1
        )
        .select(*id_cols, "gram")
    )


def fuzzy_candidates(
    sg: DataFrame,
    dg: DataFrame,
    n_hashes: int = 24,
    rows_per_band: int = 3,
    prefix_t: float = 0.5,
    prefix_max_grams: int = 64,
    dedupe: bool = True,
) -> DataFrame:
    """Hybrid blocking candidates (m_surface, surface, iri) between
    surface grams sg(surface, gram) and dictionary grams
    dg(surface, iri, gram) — exposed so callers can report the
    candidate count / ratio (no-silent-caps: blocking selectivity is a
    measured quantity).

    Mixed granularity: an entity with ≤ prefix_max_grams kept grams
    blocks on its PREFIX grams (see _prefix_grams — exact for
    jaccard ≥ prefix_t, variance-free where MinHash over small sets
    leaves a deterministic recall hole, and immune to the Σ df²
    explosion of all-gram blocking). Longer surfaces use banded
    MinHash (the dedup geometry) — there prefixes grow linearly while
    signatures stay fixed-size. The dictionary side emits BOTH key
    kinds (it is dimension-bounded), so either surface class finds its
    match.
    """
    gram_df = dg.groupBy("gram").agg(F.count("*").alias("df"))
    s_counts = sg.groupBy("surface").agg(F.count("*").alias("_m"))
    sg2 = sg.join(s_counts, "surface")
    gram_key = lambda g: F.md5(F.concat(F.lit("g:"), g))  # noqa: E731
    ss_short = _prefix_grams(
        sg2.filter(F.col("_m") <= prefix_max_grams).select("surface", "gram"),
        ["surface"],
        gram_df,
        prefix_t,
    ).select(
        "surface", F.lit(-1).alias("band"), gram_key(F.col("gram")).alias("mh")
    )
    ss_long = _gram_sigs(
        sg2.filter(F.col("_m") > prefix_max_grams).select("surface", "gram"),
        ["surface"],
        n_hashes,
        rows_per_band,
    )
    ss = ss_short.unionByName(ss_long)
    ds = _gram_sigs(dg, ["surface", "iri"], n_hashes, rows_per_band).unionByName(
        _prefix_grams(dg, ["surface", "iri"], gram_df, prefix_t).select(
            "surface",
            "iri",
            F.lit(-1).alias("band"),
            gram_key(F.col("gram")).alias("mh"),
        )
    )
    out = (
        ss.withColumnRenamed("surface", "m_surface")
        .join(ds, ["band", "mh"])
        .select("m_surface", "surface", "iri")
    )
    # a pair sharing k prefix grams appears k times; the audit/count
    # callers need distinct pairs, but a downstream that ends in a
    # per-pair max/groupBy (fuzzy_link's best-match) can skip the
    # multi-hundred-MB dedupe exchange — duplicates don't change a max
    return out.distinct() if dedupe else out


def fuzzy_link(
    unlinked_surfaces: DataFrame,
    iri_dict: DataFrame,
    n_hashes: int = 24,
    rows_per_band: int = 3,
    min_jaccard: float = 0.5,
    max_df: int | None = None,
    materialize: bool = True,
) -> DataFrame:
    """Char-3-gram banded-MinHash blocking between UNLINKED surfaces and
    dict surfaces, then exact gram-Jaccard ≥ threshold inside the
    candidate set, best match per surface. Input: (surface); output
    (surface, iri, jaccard).

    Feed this only the surfaces the exact broadcast join left unlinked
    (link_mentions → filter iri IS NULL): the LSH join then sees the
    typo tail, not the whole corpus. Defaults: 24 hashes in 8 bands ×
    3 rows, whose LSH S-curve threshold (1/b)^(1/r) = 0.5 sits exactly
    on the default jaccard gate — j=0.9 matches collide w.p. ~1,
    j=0.2 noise w.p. ~0.06. For ID-like dictionaries (constant prefix,
    zero padding) pass ``max_df``: common grams leave the universe
    (see _gram_tables), which both collapses the candidate set toward
    the true pair set and makes the jaccard discriminative.

    The verify stage scores ONLY the candidate pairs: each side's
    capped gram set is collected to an array once, the candidate list
    joins both arrays (dictionary side broadcast), and jaccard is an
    array_intersect per pair — O(|candidates|) work, never the
    Σ df_s·df_d gram-join blowup that scoring via a shared-gram
    groupBy costs when moderately-common grams survive the cap.

    ``materialize`` localCheckpoints the gram tables: four plan
    branches consume them (df ranking, prefixes/signatures, arrays ×2)
    and without persistence each branch re-derives grams from the
    source — measured ~1.7× slower at sf0.1. At 100 TB the gram tables
    would be a staged intermediate anyway.
    """
    sg, dg = _gram_tables(unlinked_surfaces, iri_dict, max_df)
    if materialize:
        sg = sg.localCheckpoint(eager=False)
        dg = dg.localCheckpoint(eager=False)
    cand = fuzzy_candidates(
        sg, dg, n_hashes, rows_per_band, min_jaccard, dedupe=False
    )
    # the scoring stage is CPU-bound (one array_intersect per candidate
    # row) over a byte-SMALL frame — left to AQE the coalesced join
    # output runs on 1-2 cores (same pitfall reassemble() documents);
    # hash by m_surface so the stage is sized by cores and the final
    # best-match groupBy reuses the partitioning
    cand = cand.repartition(
        cand.sparkSession.sparkContext.defaultParallelism, "m_surface"
    )
    s_arr = sg.groupBy("surface").agg(F.collect_list("gram").alias("ga"))
    d_arr = dg.groupBy("surface", "iri").agg(F.collect_list("gram").alias("gb"))
    inter = F.size(F.array_intersect("ga", "gb"))
    scored = (
        cand.withColumnRenamed("surface", "d_surface")
        .join(s_arr.withColumnRenamed("surface", "m_surface"), "m_surface")
        .join(
            F.broadcast(d_arr.withColumnRenamed("surface", "d_surface")),
            ["d_surface", "iri"],
        )
        .withColumn(
            "jaccard",
            inter / (F.size("ga") + F.size("gb") - inter),
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
