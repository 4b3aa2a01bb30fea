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

# the default agent/tool canonicalization rows — ONE definition for
# the driver queries and jobs/build_graph's default dictionary (three
# copies used to drift independently; round-6 review find)
DEFAULT_AGENT_DICT = [
    ("user", "urn:agent:user", "agent"),
    ("assistant", "urn:agent:assistant", "agent"),
    ("tool", "urn:agent:tool", "agent"),
    ("turtle_emitter", "urn:tool:turtle_emitter", "tool"),
]

# mention triples' stmt_idx offset: parse-triple stmt_idx is dense per
# conversation and realistically bounded (a conversation with 10^9
# statements is not a row, it's a bug), so this base keeps the two
# families disjoint in one table
MENTION_STMT_BASE = 1_000_000_000

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
    iri_structs = F.coalesce(
        F.transform(
            F.regexp_extract_all("text", F.lit(_IRI_IN_TEXT), 1),
            lambda s: F.struct(
                F.lit("iri").alias("kind"), s.alias("surface")
            ),
        ),
        # F.concat is null-propagating: a NULL text (e.g. a bare tool
        # call) must contribute an EMPTY iri array, not null the whole
        # mentions array and silently drop the turn's role/tool
        # mentions (round-6 review find)
        F.array().cast("array<struct<kind:string,surface:string>>"),
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
    if not sources:
        raise ValueError(
            "build_iri_dictionary needs at least one (surface, iri, "
            "kind) source"
        )
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
        )
        # min-iri tiebreak, NOT dropDuplicates: two dict surfaces that
        # normalize to the same key must link deterministically across
        # runs/retries (same rule as build_iri_dictionary)
        .groupBy("_k")
        .agg(F.min("iri").alias("iri"))
    )
    m = mentions.withColumn("_k", normalize_text(F.col("surface")))
    return m.join(d, "_k", "left").drop("_k")


def mentions_to_triples(linked: DataFrame) -> DataFrame:
    """Linked mentions → provenance triples joining the graph:

        <urn:conv:C> <urn:kg:mentions> <iri>        (per linked mention)
        <urn:conv:C> <urn:kg:turnMention> "kind:surface"@? per turn

    stmt_idx = MENTION_STMT_BASE + turn_idx: mention triples sort
    AFTER every parse triple of the conversation (parse stmt_idx is
    statement-dense from 0 and bounded far below the base), so the two
    families union into one table without stmt_idx collisions — a
    collision would make the streaming writer's lag()-window separator
    choice nondeterministic on ties (round-6 review find; the old
    turn_idx-based stmt_idx collided with parse rows).
    """
    m = linked.filter(F.col("iri").isNotNull())
    return m.select(
        "conv_id",
        (MENTION_STMT_BASE + F.col("turn_idx").cast("long")).alias(
            "stmt_idx"
        ),
        F.concat(F.lit("<urn:conv:"), F.col("conv_id"), F.lit(">")).alias(
            "subj"
        ),
        F.lit("<urn:kg:mentions>").alias("pred"),
        F.concat(F.lit("<"), F.col("iri"), F.lit(">")).alias("obj"),
        F.lit(False).alias("is_quoted"),
    ).distinct()


def _chargrams(col, q: int = 3):
    """Distinct padded character q-grams of the normalized surface.

    ``q`` is the ID-like-dictionary SCALE dial: on dictionaries whose
    entries differ only in a short digit/ID tail (TPC-H names, SKUs,
    user handles) the kept-gram universe after the df-cap is the
    alphabet^q of the varying span (~10^q for digits). Blocking
    candidates grow as Σ df² ≈ |dict|²·grams/universe, so once
    |dict| approaches the universe size the candidate set turns
    quadratic — measured 65 → 654 candidates per true link going
    15k → 150k dictionary entries at q=3 (universe ~10³). Pick q so
    the varying-span universe comfortably exceeds |dict|: q=3 to
    ~10k entries, q=4 to ~1M, q=5 to ~100M; cost is only slightly
    larger gram tables (one extra char per gram, ~same gram count).
    Typo-recall is barely affected: an edit disturbs q adjacent
    grams out of ~len(surface), so jaccard falls gently with q and
    the prefix/banded blocking keys remain exact for the threshold.
    """
    pad = F.lit(" " * (q - 1))
    padded = F.concat(pad, normalize_text(col), pad)
    n = F.length(padded)
    return F.array_distinct(
        F.transform(
            F.sequence(F.lit(1), F.greatest(n - (q - 1), F.lit(1))),
            lambda i: F.substring(padded, i, q),
        )
    )


def auto_gram_size(
    n_dict: int, load: int = 30, floor: int = 3, ceiling: int = 8
) -> int:
    """The _chargrams scale rule made self-setting: the smallest q
    whose worst-case varying-span gram universe (digit-only spans:
    10^q) keeps the dictionary-per-universe LOAD under ``load``.

    Calibration is the round-7 sf1 measurement: at q=3 (universe 10³)
    a 15k-entry dictionary blocked fine (candidate ratio ~13) while
    150k entries went quadratic (65 → 654 candidates per link) — i.e.
    load 15 is safe, load 150 is broken. load=30 sits a 5× margin
    under the measured breakdown: q=3 to 30k entries, q=4 to 300k,
    q=5 to 3M, … Digit-only spans are the worst case, so mixed
    alphabets only get more headroom. Deterministic in |dict| only."""
    q = floor
    while q < ceiling and load * (10 ** q) < max(n_dict, 1):
        q += 1
    return q


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
    sig = gram_rows.groupBy(*id_cols).agg(
        *aggs, F.count(F.lit(1)).alias("m")
    )
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
        *id_cols, "m", F.posexplode(F.array(*band_keys)).alias("band", "mh")
    )


def _gram_tables(
    unlinked_surfaces: DataFrame,
    iri_dict: DataFrame,
    max_df: int | None,
    max_df_frac: float | None = None,
    gram_size: int = 3,
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

    ``max_df_frac`` is the LAZY form: hot ⇔ df > frac · |dict|, with
    |dict| a 1-row broadcast scalar computed inside the plan — no
    eager count() job at query-construction time. The threshold is
    exact-decimal arithmetic (matching a SQL engine's
    ``count(*) * 0.2``), never a double product that could land on the
    wrong side of an integer df.
    """
    sg = (
        unlinked_surfaces.select("surface")
        .distinct()
        .withColumn("grams", _chargrams(F.col("surface"), gram_size))
        .select("surface", F.explode("grams").alias("gram"))
    )
    dg = iri_dict.select(
        "surface",
        "iri",
        F.explode(_chargrams(F.col("surface"), gram_size)).alias("gram"),
    )
    if max_df is not None or max_df_frac is not None:
        dfs = dg.groupBy("gram").agg(F.count("*").alias("df"))
        if max_df is not None:
            hot = dfs.filter(F.col("df") > max_df)
        else:
            from decimal import Decimal

            total = iri_dict.select(F.count("*").alias("_n"))
            hot = dfs.join(F.broadcast(total)).filter(
                F.col("df")
                > F.col("_n") * F.lit(Decimal(str(max_df_frac)))
            )
        hot = hot.select("gram")
        sg = sg.join(F.broadcast(hot), "gram", "left_anti")
        dg = dg.join(F.broadcast(hot), "gram", "left_anti")
    return sg, dg


def _prefix_grams(gram_rows, id_cols, gram_df, t: float):
    """Restrict exploded (id…, gram) rows to each entity's PREFIX: its
    p rarest grams in a single global (df, gram) order, with
    p = m − ⌈t·m⌉ + 1 for an m-gram entity. Returns
    (id_cols..., gram, pos, m) — pos is the gram's 1-based rank in the
    entity's FULL global-order gram list, m the entity's (capped) gram
    count; both feed the exact positional/length filters downstream.

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
        g.withColumn("pos", F.row_number().over(w))
        .withColumn("m", F.count(F.lit(1)).over(wc))
        .filter(
            F.col("pos")
            <= F.col("m") - F.ceil(F.lit(float(t)) * F.col("m")) + 1
        )
        .select(*id_cols, "gram", "pos", "m")
    )


def fuzzy_candidates(
    sg: DataFrame,
    dg: DataFrame,
    n_hashes: int = 24,
    rows_per_band: int = 3,
    prefix_t: float = 0.5,
    prefix_max_grams: int = 64,
    dedupe: bool = True,
    band_path: str = "auto",
) -> DataFrame:
    """Hybrid blocking candidates (m_surface, surface, iri) between
    surface grams sg(surface, gram) and dictionary grams
    dg(surface, iri, gram) — exposed so callers can report the
    candidate count / ratio (no-silent-caps: blocking selectivity is a
    measured quantity).

    ``band_path``: 'on' always builds the banded-MinHash branch for
    long surfaces, 'auto' (default) probes whether any surface exceeds
    prefix_max_grams (one metadata-sized LIMIT-1 job) and skips the
    branch — including its unconditionally-computed dictionary-side
    signature table — when none can use it, 'off' asserts the caller
    knows no surface qualifies. Output is identical in all modes on
    short-surface inputs; recall is untouched because only a provably
    empty branch is skipped.

    Mixed granularity: an entity with ≤ prefix_max_grams kept grams
    blocks on its PREFIX grams (see _prefix_grams — exact for
    jaccard ≥ prefix_t, variance-free where MinHash over small sets
    leaves a deterministic recall hole, and immune to the Σ df²
    explosion of all-gram blocking). Longer surfaces use banded
    MinHash (the dedup geometry) — there prefixes grow linearly while
    signatures stay fixed-size. The dictionary side emits BOTH key
    kinds (it is dimension-bounded), so either surface class finds its
    match.

    Two further filters, both EXACT for jaccard ≥ prefix_t (so the
    verified output is unchanged — only the candidate set shrinks):

    * length filter (both paths): |A∩B| ≤ min(|A|,|B|) and
      |A∪B| ≥ max(|A|,|B|), so j ≥ t forces t·|A| ≤ |B| ≤ |A|/t.
      On ID-like dictionaries this alone removes most cross-length
      noise pairs the rare-gram collisions admit.
    * positional filter (prefix path; PPJoin, Xiao et al. 2008), the
      ACCUMULATED form: both prefixes are ranked by ONE global
      (df, gram) order, so rank is monotone in that order inside every
      gram set — any common gram at or below the pair's largest shared
      prefix gram g* is itself in BOTH prefixes (its ranks are below
      g*'s). Hence overlap = k + |commons > g*| ≤
      k + min(|A|−ps*, |B|−pd*), with k the pair's shared-prefix-gram
      count and (ps*, pd*) g*'s ranks; j ≥ t forces overlap ≥
      ⌈t/(1+t)·(|A|+|B|)⌉. The filter groups candidate rows per pair
      (one map-side-combinable aggregate — the same exchange a
      distinct would cost) and drops pairs whose bound misses the
      requirement; a qualifying pair always satisfies it, so recall
      is exactly preserved.

    On ID-like dictionaries the measured floor of these filters is
    ~65 candidates per true link at sf0.1 (from 199 unfiltered):
    kept-gram sets are tiny after the df-cap (6-8 grams), prefixes are
    nearly the whole set, and surviving noise shares one genuinely
    rare gram at compatible ranks — rank arithmetic alone cannot
    separate that from a true match; only the verify join's content
    comparison can, and it is O(candidates).
    """
    t = float(prefix_t)
    eps = 1e-9  # double-rounding guard: never tighter than the exact bound
    gram_df = dg.groupBy("gram").agg(F.count("*").alias("df"))
    s_counts = sg.groupBy("surface").agg(F.count("*").alias("_m"))
    sg2 = sg.join(s_counts, "surface")
    length_ok = (F.col("_md") >= t * F.col("_ms") - eps) & (
        F.col("_ms") >= t * F.col("_md") - eps
    )
    sp = _prefix_grams(
        sg2.filter(F.col("_m") <= prefix_max_grams).select("surface", "gram"),
        ["surface"],
        gram_df,
        t,
    ).select(
        F.col("surface").alias("m_surface"),
        "gram",
        F.col("pos").alias("_ps"),
        F.col("m").alias("_ms"),
    )
    dp = _prefix_grams(dg, ["surface", "iri"], gram_df, t).select(
        "surface",
        "iri",
        "gram",
        F.col("pos").alias("_pd"),
        F.col("m").alias("_md"),
    )
    alpha_row = F.ceil(
        t / (1.0 + t) * (F.col("_ms") + F.col("_md")) - eps
    )
    # row-level positional pre-filter (the k=1 bound at each shared
    # gram) BEFORE the pair aggregate: a plain codegen filter that cuts
    # the exchange ~3×. Exact, and it composes with the accumulated
    # bound below: the row bound is monotone non-increasing in gram
    # rank, so the surviving rows are a downward-closed prefix of each
    # pair's shared grams in the global order — the accumulated bound
    # computed over them is still a valid overlap upper bound
    row_ok = (
        1 + F.least(F.col("_ms") - F.col("_ps"), F.col("_md") - F.col("_pd"))
        >= alpha_row
    )
    grouped = (
        sp.join(dp, "gram")
        .filter(length_ok & row_ok)
        .groupBy("m_surface", "surface", "iri")
        .agg(
            F.count(F.lit(1)).alias("_k"),
            F.max("_ps").alias("_psx"),
            F.max("_pd").alias("_pdx"),
            F.first("_ms").alias("_ms"),
            F.first("_md").alias("_md"),
        )
    )
    alpha = F.ceil(
        t / (1.0 + t) * (F.col("_ms") + F.col("_md")) - eps
    )
    cand_prefix = grouped.filter(
        F.col("_k")
        + F.least(
            F.col("_ms") - F.col("_psx"), F.col("_md") - F.col("_pdx")
        )
        >= alpha
    ).select("m_surface", "surface", "iri")
    # The banded-MinHash path only serves surfaces LONGER than
    # prefix_max_grams — but its dictionary side (_gram_sigs over dg:
    # ceil(n_hashes/4) md5s per dictionary gram + a signature groupBy)
    # is computed unconditionally, and Spark cannot elide it when the
    # long-surface side turns out empty (AQE materializes both join
    # stages concurrently, so the empty side is discovered too late).
    # On short-surface corpora — entity names, the common case — that
    # was ~40% of the whole candidate stage for zero candidates
    # (measured 2.7 → 1.6 s at sf0.1, identical 203,424 candidates).
    # One metadata-sized probe (LIMIT 1 over the per-surface counts)
    # decides the plan shape; recall is untouched because the probe
    # only skips the path when NO surface can use it.
    if band_path == "on":
        has_long = True
    elif band_path == "off":
        has_long = False
    else:
        has_long = (
            s_counts.filter(F.col("_m") > prefix_max_grams)
            .limit(1)
            .count()
            > 0
        )
    if has_long:
        ss_long = (
            _gram_sigs(
                sg2.filter(F.col("_m") > prefix_max_grams).select(
                    "surface", "gram"
                ),
                ["surface"],
                n_hashes,
                rows_per_band,
            )
            .withColumnRenamed("surface", "m_surface")
            .withColumnRenamed("m", "_ms")
        )
        ds = _gram_sigs(
            dg, ["surface", "iri"], n_hashes, rows_per_band
        ).withColumnRenamed("m", "_md")
        cand_band = (
            ss_long.join(ds, ["band", "mh"])
            .filter(length_ok)
            .select("m_surface", "surface", "iri")
        )
        out = cand_prefix.unionByName(cand_band)
    else:
        out = cand_prefix
    # the prefix path is already pair-distinct (the positional filter's
    # groupBy doubles as the dedupe); only the band path can repeat a
    # pair (one hit per agreeing band). The audit/count callers need
    # fully distinct pairs, but a downstream that ends in a per-pair
    # max/groupBy (fuzzy_link's best-match) can skip the extra
    # exchange — duplicates don't change a max
    return out.distinct() if dedupe else out


def fuzzy_link(
    unlinked_surfaces: DataFrame,
    iri_dict: DataFrame,
    n_hashes: int = 24,
    rows_per_band: int = 3,
    min_jaccard: float = 0.5,
    max_df: int | None = None,
    max_df_frac: float | None = None,
    materialize: bool = True,
    gram_size: int | str = 3,
) -> DataFrame:
    """Char-q-gram (default q=3) banded-MinHash blocking between
    UNLINKED surfaces and dict surfaces, then exact gram-Jaccard ≥
    threshold inside the candidate set, best match per surface. Input:
    (surface); output (surface, iri, jaccard).

    ``gram_size`` is the dictionary-cardinality scale dial — see
    _chargrams: for ID-like dictionaries pick q so the varying-span
    gram universe exceeds |dict| (q=3 → ~10k entries, q=4 → ~1M,
    q=5 → ~100M), else blocking candidates grow quadratically in
    |dict| no matter how exact the prefix/positional filters are.
    ``gram_size='auto'`` applies that documented rule itself:
    q = auto_gram_size(|dict|) — one metadata-sized count of the
    dimension-bounded dictionary at build time — so the dial is
    self-setting instead of hand-picked per corpus scale.

    Feed this only the surfaces the exact broadcast join left unlinked
    (link_mentions → filter iri IS NULL): the LSH join then sees the
    typo tail, not the whole corpus. Defaults: 24 hashes in 8 bands ×
    3 rows, whose LSH S-curve threshold (1/b)^(1/r) = 0.5 sits exactly
    on the default jaccard gate — j=0.9 matches collide w.p. ~1,
    j=0.2 noise w.p. ~0.06. For ID-like dictionaries (constant prefix,
    zero padding) pass ``max_df`` — or ``max_df_frac``, the lazy form
    (hot ⇔ df > frac·|dict|, threshold computed inside the plan, no
    eager count job): common grams leave the universe (see
    _gram_tables), which both collapses the candidate set toward the
    true pair set and makes the jaccard discriminative.

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
    if gram_size == "auto":
        gram_size = auto_gram_size(iri_dict.count())
    sg, dg = _gram_tables(
        unlinked_surfaces, iri_dict, max_df, max_df_frac, gram_size
    )
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
