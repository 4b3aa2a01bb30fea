"""Similarity search over embedding columns (array<float>).

Baseline: brute-force cosine top-k with JVM-side column algebra
(F.zip_with product + F.aggregate sum — no Python in the loop).
Scale path: IVF-style coarse partitioning — candidates restricted to
the query's cell so the join is an equi-join on cell id instead of a
cross join; at 100 TB cells come from a trained coarse quantizer, here
the table's own label column (or a hash bucket) plays that role.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def _as_double(col):
    return F.transform(col, lambda x: x.cast("double"))


def dot(a, b):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def norm(a):
    return F.sqrt(
        F.aggregate(a, F.lit(0.0), lambda acc, x: acc + x * x)
    )


def cosine(a, b):
    return dot(a, b) / (norm(a) * norm(b))


def brute_force_topk(
    embeddings: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Top-k cosine neighbors for each query vector (excluding itself).

    queries is small (it gets broadcast); embeddings is the big side —
    the cross join streams the big side once per partition with the
    broadcast queries in memory: no shuffle of the big side at all.
    Deterministic output: rank by (rounded sim desc, neighbor id asc).
    """
    q = F.broadcast(
        queries.select(
            F.col(id_col).alias("query_id"),
            _as_double(F.col(vec_col)).alias("qv"),
        ).withColumn("qn", norm(F.col("qv")))
    )
    # norms computed once per ROW, not once per scored pair
    e = embeddings.select(
        F.col(id_col).alias("neighbor_id"),
        _as_double(F.col(vec_col)).alias("ev"),
    ).withColumn("en", norm(F.col("ev")))
    scored = (
        e.crossJoin(q)
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select(
            "query_id",
            "neighbor_id",
            F.round(
                dot(F.col("qv"), F.col("ev")) / (F.col("qn") * F.col("en")), 6
            ).alias("sim"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("sim").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "sim", "rank")
    )


def seed_centroids(
    embeddings: DataFrame,
    n_cells: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> list[tuple[int, list[float]]]:
    """Deterministic coarse quantizer: the n_cells lowest-id vectors
    become Voronoi seeds (cid 0..n_cells-1 in id order).

    Not as tight as k-means, but a REAL Voronoi partition that both
    engines (Spark and the DuckDB oracle) reproduce bit-for-bit — use
    train_centroids for the quality path. The collect is n_cells rows
    (metadata-sized)."""
    rows = (
        embeddings.select(F.col(id_col), _as_double(F.col(vec_col)).alias("v"))
        .orderBy(id_col)
        .limit(n_cells)
        .collect()
    )
    return [(i, list(r["v"])) for i, r in enumerate(rows)]


def train_centroids(
    embeddings: DataFrame,
    n_cells: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 13,
    max_iter: int = 20,
) -> list[tuple[int, list[float]]]:
    """K-means coarse quantizer (pyspark.ml, k-means|| init) — the
    quality path for IVF cells. Returns [(cid, centroid_vector)],
    driver-sized (n_cells × dim)."""
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    feats = embeddings.select(
        array_to_vector(_as_double(F.col(vec_col))).alias("features")
    )
    model = KMeans(k=n_cells, seed=seed, maxIter=max_iter).fit(feats)
    return [(i, [float(x) for x in c]) for i, c in enumerate(model.clusterCenters())]


def _round6_half_up(x: float) -> float:
    """Half-away-from-zero 6-decimal rounding — the convention Spark's
    F.round and DuckDB's round() share (Python's builtin round is
    banker's, which would drift at exact midpoints)."""
    import math

    return math.copysign(math.floor(abs(x) * 1e6 + 0.5), x) / 1e6


def train_centroids_det(
    embeddings: DataFrame,
    n_cells: int = 16,
    n_iter: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> list[tuple[int, list[float]]]:
    """Deterministic distributed Lloyd's trainer — the ORACLE-CHECKABLE
    trained quantizer (train_centroids' pyspark.ml k-means is higher
    quality but not reproducible outside Spark).

    Determinism engineering, per iteration:

    * assignment: top-1 cell by the same rounded-cosine/cid-tiebreak
      ranking ivf_topk uses (bit-identical across engines, pinned by
      the existing IVF oracles);
    * update: each member component is quantized to 1e-6
      (round(val·1e6) as int64) BEFORE the per-cell sum, so the
      reduction is integer arithmetic — exact and order-independent,
      immune to float summation-order nondeterminism in either engine;
      centroid component = round(sum / (n·1e6), 6), half away from
      zero on both sides.
    * empty cells drop out (their cid simply stops existing) — both
      engines mirror this, no re-numbering.

    At scale each iteration is one codegen projection + one partial-
    agg shuffle of N·dim (cid, pos) rows; the collect is n_cells × dim
    (metadata-sized). Returns [(cid, centroid)] like seed_centroids.
    """
    cents = seed_centroids(embeddings, n_cells, id_col, vec_col)
    e = embeddings.select(
        F.col(id_col).alias("vec_id"),
        _as_double(F.col(vec_col)).alias("v"),
    )
    for _ in range(n_iter):
        ranked = _cell_ranking(F.col("v"), cents)
        assigned = e.select("v", ranked[0].alias("cid"))
        ex = assigned.select(
            "cid", F.posexplode("v").alias("pos", "val")
        )
        sums = ex.groupBy("cid", "pos").agg(
            F.sum(F.round(F.col("val") * 1e6, 0).cast("long")).alias("s"),
            F.count(F.lit(1)).alias("n"),
        )
        rows = (
            sums.groupBy("cid")
            .agg(
                F.array_sort(
                    F.collect_list(F.struct("pos", "s", "n"))
                ).alias("comps")
            )
            .collect()
        )
        cents = sorted(
            (
                int(r["cid"]),
                [
                    _round6_half_up(c["s"] / (c["n"] * 1e6))
                    for c in r["comps"]
                ],
            )
            for r in rows
        )
    return cents


def _cell_ranking(vec_col, centroids):
    """Array of cids ordered by cosine-to-centroid desc (ties → lower
    cid): a PURE PROJECTION — the centroid table rides into the plan as
    literals, so assigning a cell to N vectors costs zero joins and
    zero shuffles (the O(N·C) multiply happens inside codegen).

    The vector's own norm is computed ONCE (not per centroid) and each
    centroid's norm is a Python-side constant — sqrt and left-to-right
    summation match the SQL oracle's list_dot_product bit-for-bit."""
    import math

    vnorm = norm(vec_col)
    entries = []
    for cid, cv in centroids:
        cvec = F.array(*[F.lit(float(x)) for x in cv])
        cnorm = 0.0
        for x in cv:  # left-to-right, like F.aggregate / list_dot_product
            cnorm += float(x) * float(x)
        cnorm = math.sqrt(cnorm)
        # round like the emitted sim so the SQL oracle (which matches
        # our rounded sims exactly) orders cells identically
        sim = F.round(dot(vec_col, cvec) / (vnorm * F.lit(cnorm)), 6)
        entries.append(
            F.struct(
                sim.alias("sim"), F.lit(-cid).cast("int").alias("ncid")
            )
        )
    ranked = F.reverse(F.array_sort(F.array(*entries)))
    return F.transform(ranked, lambda s: -s["ncid"])


def _cells_df(spark, centroids):
    """Centroids as a broadcast-able DataFrame (cid, cv, cn) with norms
    precomputed driver-side the same way the literal path does (Python
    float left-to-right sum, then sqrt) so both paths round to
    IDENTICAL sims."""
    import math

    rows = []
    for cid, cv in centroids:
        cn = 0.0
        for x in cv:
            cn += float(x) * float(x)
        rows.append((int(cid), [float(x) for x in cv], math.sqrt(cn)))
    return spark.createDataFrame(rows, "cid int, cv array<double>, cn double")


def _rank_cells_join(df, id_name, vec_name, norm_name, centroids, nprobe):
    """Broadcast-join cell ranking — the LITERAL path's scale twin.

    ``_cell_ranking`` rides the centroid table into the plan as
    literals: elegant and shuffle-free, but the codegen expression is
    O(n_cells)-ary — fine at 16-256 cells, an expression-tree explosion
    at a realistic 4k-64k. Above that crossover the centroids belong in
    a BROADCAST join: explode df × cells inside the join stage (rows
    never hit disk), then reduce to top-nprobe cells per vector with a
    map-side-combinable aggregate — the shuffle carries N rows, not
    N·C. nprobe=1 (base-side assignment) uses a plain max; nprobe>1
    (query side, small by construction) collects and slices.

    Returns df with an exploded ``cid`` column (one row per probed
    cell), same contract as the literal path.
    """
    cells = F.broadcast(_cells_df(df.sparkSession, centroids))
    scored = df.crossJoin(cells).withColumn(
        "_csim",
        F.round(
            dot(F.col(vec_name), F.col("cv"))
            / (F.col(norm_name) * F.col("cn")),
            6,
        ),
    )
    pick = F.struct(
        F.col("_csim").alias("sim"), (-F.col("cid")).cast("int").alias("ncid")
    )
    if nprobe == 1:
        agg = scored.groupBy(id_name).agg(
            F.first(vec_name).alias(vec_name),
            F.first(norm_name).alias(norm_name),
            F.max(pick).alias("_top"),
        )
        return agg.select(
            id_name, vec_name, norm_name, (-F.col("_top.ncid")).alias("cid")
        )
    agg = scored.groupBy(id_name).agg(
        F.first(vec_name).alias(vec_name),
        F.first(norm_name).alias(norm_name),
        F.slice(
            F.reverse(F.array_sort(F.collect_list(pick))), 1, nprobe
        ).alias("_top"),
    )
    return agg.select(
        id_name,
        vec_name,
        norm_name,
        F.explode(F.transform("_top", lambda s: -s["ncid"])).alias("cid"),
    )


def ivf_topk(
    embeddings: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_cells: int = 16,
    nprobe: int = 2,
    centroids: list[tuple[int, list[float]]] | None = None,
    assign: str = "auto",
    literal_max_cells: int = 256,
) -> DataFrame:
    """IVF ANN: base vectors live in their nearest Voronoi cell
    (nprobe=1 assignment); each query probes its nprobe nearest cells;
    candidates meet in an equi-join on cid.

    At scale this is O(N·Q·nprobe/n_cells) scored pairs instead of
    O(N·Q), the base side is never shuffled on the literal path
    (queries broadcast, cell assignment is codegen), and recall is the
    standard IVF tradeoff — measured against brute_force_topk in tests
    (recall@k report).

    ``assign`` picks the cell-assignment strategy: 'literal' (centroids
    as plan literals — zero shuffle, O(n_cells) expression size),
    'join' (broadcast-join + map-side-combined top-cell reduce — one
    partial-agg shuffle of N rows, constant expression size), or
    'auto' = literal up to ``literal_max_cells`` cells, join above.
    Both paths produce bit-identical sims (tests pin the agreement).

    centroids defaults to the deterministic seed quantizer (oracle-
    reproducible); pass train_centroids(...) output for k-means cells.
    """
    if centroids is None:
        centroids = seed_centroids(embeddings, n_cells, id_col, vec_col)
    if assign == "auto":
        assign = "literal" if len(centroids) <= literal_max_cells else "join"
    if assign not in ("literal", "join"):
        raise ValueError(f"unknown assign strategy: {assign!r}")

    e = embeddings.select(
        F.col(id_col).alias("neighbor_id"),
        _as_double(F.col(vec_col)).alias("ev"),
    ).withColumn("en", norm(F.col("ev")))
    q = queries.select(
        F.col(id_col).alias("query_id"),
        _as_double(F.col(vec_col)).alias("qv"),
    ).withColumn("qn", norm(F.col("qv")))

    if assign == "literal":
        e = e.withColumn("cid", _cell_ranking(F.col("ev"), centroids)[0])
        q = q.withColumn(
            "cid",
            F.explode(
                F.slice(_cell_ranking(F.col("qv"), centroids), 1, nprobe)
            ),
        )
    else:
        e = _rank_cells_join(e, "neighbor_id", "ev", "en", centroids, 1)
        q = _rank_cells_join(q, "query_id", "qv", "qn", centroids, nprobe)

    scored = (
        e.join(F.broadcast(q), "cid")
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select(
            "query_id",
            "neighbor_id",
            F.round(
                dot(F.col("qv"), F.col("ev")) / (F.col("qn") * F.col("en")), 6
            ).alias("sim"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("sim").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "sim", "rank")
    )


def auto_n_cells(n_vectors: int, floor: int = 16, ceiling: int = 65536) -> int:
    """The IVF cell-count rule used when callers don't dial n_cells:
    ≈ √N (the standard IVF sizing — keeps E[|cell|] ≈ √N, so the
    intra-cell self-join does O(N·√N) work instead of O(N²)), clamped
    to [floor, ceiling]. Deterministic in N only."""
    import math

    return max(floor, min(ceiling, int(math.isqrt(max(n_vectors, 1)))))


def _probe_assignments(
    embeddings, id_col, vec_col, n_cells, nprobe, centroids, assign,
    literal_max_cells: int = 256,
):
    """(vid, v, vn, cid) multi-probe assignment table shared by
    embedding_near_pairs and embedding_cell_stats — one row per
    (vector, probed cell). n_cells=None → auto_n_cells(count);
    ``literal_max_cells`` is the same auto literal/join crossover dial
    ivf_topk exposes (it was a magic 256 here — review find)."""
    if centroids is None:
        if n_cells is None:
            n_cells = auto_n_cells(embeddings.count())
        centroids = seed_centroids(embeddings, n_cells, id_col, vec_col)
    if assign == "auto":
        assign = "literal" if len(centroids) <= literal_max_cells else "join"

    e = embeddings.select(
        F.col(id_col).alias("vid"), _as_double(F.col(vec_col)).alias("v")
    ).withColumn("vn", norm(F.col("v")))
    if assign == "literal":
        return e.withColumn(
            "cid",
            F.explode(F.slice(_cell_ranking(F.col("v"), centroids), 1, nprobe)),
        )
    return _rank_cells_join(e, "vid", "v", "vn", centroids, nprobe)


def embedding_cell_stats(
    embeddings: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_cells: int | None = 16,
    nprobe: int = 2,
    cell_cap: int = 100_000,
    centroids: list[tuple[int, list[float]]] | None = None,
    assign: str = "auto",
    literal_max_cells: int = 256,
) -> DataFrame:
    """One-row audit of the IVF cell distribution feeding
    embedding_near_pairs: (cells_used, max_cell_rows,
    quarantined_cells, quarantined_cell_rows). The explicit
    NO-SILENT-CAPS counterpart of ``simhash_bucket_stats`` — at 100 TB
    a clustered real-embedding corpus can put O(N) vectors in one
    Voronoi cell, and this row is how you see the cap working instead
    of discovering the skew as a straggler task."""
    e = _probe_assignments(
        embeddings, id_col, vec_col, n_cells, nprobe, centroids, assign,
        literal_max_cells,
    )
    per_cell = e.groupBy("cid").agg(F.count("*").alias("n"))
    return per_cell.agg(
        F.count(F.lit(1)).alias("cells_used"),
        F.coalesce(F.max("n"), F.lit(0)).alias("max_cell_rows"),
        F.coalesce(
            F.sum((F.col("n") > cell_cap).cast("long")), F.lit(0)
        ).alias("quarantined_cells"),
        F.coalesce(
            F.sum(F.when(F.col("n") > cell_cap, F.col("n")).otherwise(0)),
            F.lit(0),
        ).alias("quarantined_cell_rows"),
    )


def embedding_near_pairs(
    embeddings: DataFrame,
    threshold: float = 0.9,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_cells: int | None = 16,
    nprobe: int = 2,
    centroids: list[tuple[int, list[float]]] | None = None,
    assign: str = "auto",
    cell_cap: int = 100_000,
    literal_max_cells: int = 256,
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs: (vec_a, vec_b, sim) with
    vec_a < vec_b and rounded cosine ≥ threshold.

    Scale shape: every vector lands in its ``nprobe`` nearest Voronoi
    cells (multi-probe on BOTH sides — two near-identical vectors that
    straddle a cell boundary still meet in each other's second cell),
    pairs meet in an equi-join on cid, and the exact cosine runs only
    inside cells — O(Σ|cell|²·nprobe²) instead of O(N²). The standard
    recall/cost dial is (n_cells, nprobe); the brute-force truth is the
    same join with one cell. Assignment strategy as in ivf_topk
    (literal centroids under the crossover, broadcast join above) —
    but unlike ivf_topk's tiny query side, here EVERY corpus row
    evaluates the assignment, and the broadcast-join path measured
    2.3× faster than the literal expression already at ~50 cells
    (sf0.1, identical output); pass assign='join' for this shape.

    Skew guards, because real embedding corpora cluster: cells with
    more than ``cell_cap`` probe rows are QUARANTINED from the
    self-join (one groupBy + broadcast anti-join — the simhash
    ``bucket_cap`` pattern; a hot Voronoi cell would otherwise
    degrade the equi-join to O(|cell|²) on one key), and
    ``embedding_cell_stats`` reports exactly what the cap dropped —
    NO SILENT CAPS. ``n_cells=None`` scales the quantizer to the
    corpus (auto_n_cells ≈ √N) instead of a fixed 16.
    """
    e = _probe_assignments(
        embeddings, id_col, vec_col, n_cells, nprobe, centroids, assign,
        literal_max_cells,
    )
    big = (
        e.groupBy("cid")
        .agg(F.count("*").alias("n"))
        .filter(F.col("n") > cell_cap)
        .select("cid")
    )
    e = e.join(F.broadcast(big), "cid", "left_anti")
    a = e.alias("a")
    b = e.alias("b")
    sim = F.round(
        dot(F.col("a.v"), F.col("b.v")) / (F.col("a.vn") * F.col("b.vn")), 6
    )
    return (
        a.join(
            b,
            (F.col("a.cid") == F.col("b.cid"))
            & (F.col("a.vid") < F.col("b.vid")),
        )
        .select(
            F.col("a.vid").alias("vec_a"),
            F.col("b.vid").alias("vec_b"),
            sim.alias("sim"),
        )
        .filter(F.col("sim") >= threshold)
        .distinct()
    )


def recall_at_k(approx: DataFrame, exact: DataFrame) -> float:
    """Fraction of exact top-k pairs the approximate search recovered."""
    hits = approx.join(exact, ["query_id", "neighbor_id"], "left_semi").count()
    total = exact.count()
    return hits / total if total else 1.0
