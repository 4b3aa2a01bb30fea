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


def ivf_topk(
    embeddings: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_cells: int = 16,
    nprobe: int = 2,
    centroids: list[tuple[int, list[float]]] | None = None,
) -> DataFrame:
    """IVF ANN: base vectors live in their nearest Voronoi cell
    (nprobe=1 assignment, a shuffle-free projection); each query probes
    its nprobe nearest cells; candidates meet in an equi-join on cid.

    At scale this is O(N·Q·nprobe/n_cells) scored pairs instead of
    O(N·Q), the base side is never shuffled (queries broadcast, cell
    assignment is codegen), and recall is the standard IVF tradeoff —
    measured against brute_force_topk in tests (recall@k report).

    centroids defaults to the deterministic seed quantizer (oracle-
    reproducible); pass train_centroids(...) output for k-means cells.
    """
    if centroids is None:
        centroids = seed_centroids(embeddings, n_cells, id_col, vec_col)

    e = (
        embeddings.select(
            F.col(id_col).alias("neighbor_id"),
            _as_double(F.col(vec_col)).alias("ev"),
        )
        .withColumn("en", norm(F.col("ev")))
        .withColumn("cid", _cell_ranking(F.col("ev"), centroids)[0])
    )

    q = (
        queries.select(
            F.col(id_col).alias("query_id"),
            _as_double(F.col(vec_col)).alias("qv"),
        )
        .withColumn("qn", norm(F.col("qv")))
        .withColumn(
            "cid",
            F.explode(
                F.slice(_cell_ranking(F.col("qv"), centroids), 1, nprobe)
            ),
        )
    )

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


def recall_at_k(approx: DataFrame, exact: DataFrame) -> float:
    """Fraction of exact top-k pairs the approximate search recovered."""
    hits = approx.join(exact, ["query_id", "neighbor_id"], "left_semi").count()
    total = exact.count()
    return hits / total if total else 1.0
