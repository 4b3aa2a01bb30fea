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
        )
    )
    e = embeddings.select(
        F.col(id_col).alias("neighbor_id"),
        _as_double(F.col(vec_col)).alias("ev"),
    )
    scored = (
        e.crossJoin(q)
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select(
            "query_id",
            "neighbor_id",
            F.round(cosine(F.col("qv"), F.col("ev")), 6).alias("sim"),
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


def ivf_topk(
    embeddings: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    cell_col: str = "label",
) -> DataFrame:
    """IVF-style ANN: candidates restricted to the query's coarse cell.

    The cross join becomes an equi-join on cell id — at scale this is
    the difference between O(N·Q) and O(N·Q / n_cells) with co-located
    partitions. Recall tradeoff is the standard IVF one (nprobe=1 here).
    """
    q = F.broadcast(
        queries.select(
            F.col(id_col).alias("query_id"),
            F.col(cell_col).alias("cell"),
            _as_double(F.col(vec_col)).alias("qv"),
        )
    )
    e = embeddings.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(cell_col).alias("cell"),
        _as_double(F.col(vec_col)).alias("ev"),
    )
    scored = (
        e.join(q, "cell")
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select(
            "query_id",
            "neighbor_id",
            F.round(cosine(F.col("qv"), F.col("ev")), 6).alias("sim"),
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
