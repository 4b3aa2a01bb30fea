"""Graph serialization + materialization (Spark side).

  * ``streaming_turtle`` — the reference's O(1)-memory streaming writer
    (streaming_writer.rb:27-40) re-expressed as WINDOW FUNCTIONS: the
    repeat-subject→';' / repeat-predicate→',' state machine is exactly
    lag(subj)/lag(pred) over (conv_id ORDER BY stmt_idx). Fully
    columnar — no Python, whole-stage codegen.

  * ``pretty_turtle`` — the reference's buffering pretty writer
    (writer.rb:174-202): per-conversation graphs are document-sized, so
    each group serializes in one applyInPandas call.

  * ``pname_terms`` — writer get_pname (longest-prefix) as a columnar
    CASE chain over a small broadcast-able prefix map.

  * ``materialize_triples`` — the Iceberg-shaped sink: subject-hash
    bucketing + hot-predicate salting (rdf:type dominates real graphs),
    parquet here / `writeTo(...).partitionedBy(bucket(...))` on a real
    lakehouse (jars not in this sandbox).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, Window as W, functions as F


def turtle_fragments(triples: DataFrame) -> DataFrame:
    """Per-statement Turtle fragment + separator via lag() — the
    streaming-writer state machine, columnar."""
    w = W.partitionBy("conv_id").orderBy("stmt_idx")
    same_subj = F.lag("subj").over(w) == F.col("subj")
    same_pred = same_subj & (F.lag("pred").over(w) == F.col("pred"))
    first = F.lag("subj").over(w).isNull()
    # continuation indents are the reference's indent(1)/indent(2) at
    # depth 0 — one space after ';', two after ',' (streaming_writer.rb:34-37)
    frag = (
        F.when(same_pred, F.concat(F.lit(",\n  "), F.col("obj")))
        .when(
            same_subj,
            F.concat(F.lit(";\n "), F.col("pred"), F.lit(" "), F.col("obj")),
        )
        .otherwise(
            F.concat(
                F.when(first, F.lit("")).otherwise(F.lit(" .\n")),
                F.col("subj"),
                F.lit(" "),
                F.col("pred"),
                F.lit(" "),
                F.col("obj"),
            )
        )
    )
    return triples.withColumn("fragment", frag)


def streaming_turtle(triples: DataFrame) -> DataFrame:
    """(conv_id, stmt_idx, subj, pred, obj) → (conv_id, ttl) documents.

    Terms stay NT-encoded (the streaming writer's N-Triples-compatible
    output mode); stream_epilogue's trailing ' .' closes each doc.
    """
    frags = turtle_fragments(triples)
    docs = frags.groupBy("conv_id").agg(
        F.concat(
            F.concat_ws(
                "",
                F.transform(
                    F.array_sort(
                        F.collect_list(F.struct("stmt_idx", "fragment"))
                    ),
                    lambda x: x["fragment"],
                ),
            ),
            F.lit(" ."),
        ).alias("ttl")
    )
    return docs


def materialize_bucketed_table(
    triples: DataFrame, table: str, n_buckets: int = 16
) -> None:
    """Subject-bucketed MANAGED table (bucketBy + sortBy): subsequent
    self-joins / star-joins on subj co-locate with NO exchange on either
    side — the single biggest shuffle saving for graph traversal
    workloads (s-s joins dominate multi-hop queries). Iceberg analogue:
    partitionedBy(bucket(N, 'subj'))."""
    (
        triples.write.mode("overwrite")
        .bucketBy(n_buckets, "subj")
        .sortBy("subj")
        .format("parquet")
        .saveAsTable(table)
    )


def canonical_ntriples(triples: DataFrame) -> DataFrame:
    """Canonical N-Triples serialization per conversation: one sorted
    NT document per conv_id (the C14N comparison form the reference's
    ntriples suite string-compares — spec/ntriples_spec.rb:41-43).
    Pure aggregate expressions."""
    line = F.concat_ws(" ", "subj", "pred", "obj", F.lit("."))
    return triples.groupBy("conv_id").agg(
        F.concat_ws(
            "\n", F.array_sort(F.collect_list(line))
        ).alias("nt")
    )


def pretty_turtle(
    triples: DataFrame, prefixes: dict | None = None, base: str = ""
) -> DataFrame:
    """Grouped pretty serialization: one Turtle document per conv_id,
    reference writer semantics (subject ordering, a/;/,, inline [...],
    (...) lists)."""
    prefixes = dict(prefixes or {})

    def serialize(pdf: pd.DataFrame) -> pd.DataFrame:
        from kgt.turtle.writer import decode_nt, serialize_pretty

        pdf = pdf.sort_values("stmt_idx")
        stmts = [
            (decode_nt(s), decode_nt(p), decode_nt(o))
            for s, p, o in zip(pdf["subj"], pdf["pred"], pdf["obj"])
        ]
        ttl = serialize_pretty(stmts, prefixes=prefixes, base=base)
        return pd.DataFrame(
            {"conv_id": [pdf["conv_id"].iloc[0]], "ttl": [ttl]}
        )

    # pin the grouping exchange at the session's core count: the
    # grouped rows are bytes-small, so left to AQE the ENSURE_REQUIREMENTS
    # exchange coalesces to 1-2 partitions and the CPU-bound Python
    # serialize stage runs on 1-2 cores (the reassemble() pitfall). An
    # explicit repartition on the SAME key satisfies the groupBy's
    # clustering requirement — still exactly one exchange — but its
    # partition count is user-pinned and scale-adaptive.
    n = triples.sparkSession.sparkContext.defaultParallelism
    return (
        triples.repartition(n, "conv_id")
        .groupBy("conv_id")
        .applyInPandas(serialize, schema="conv_id string, ttl string")
    )


def pname_terms(
    df: DataFrame, col: str, prefixes: dict[str, str], out_col: str = "pname"
) -> DataFrame:
    """Longest-prefix pname shortening of an NT-encoded IRI column as a
    columnar CASE chain (prefix maps are small: the chain stays JVM-side
    and codegen'd; a broadcast join would shuffle nothing either but
    adds a build side for no reason)."""
    iri = F.regexp_extract(F.col(col), r"^<(.*)>$", 1)
    expr = None
    for pfx, ns in sorted(prefixes.items(), key=lambda kv: -len(kv[1])):
        cond = iri.startswith(ns)
        val = F.concat(F.lit(pfx + ":"), F.substring(iri, len(ns) + 1, 100000))
        expr = F.when(cond, val) if expr is None else expr.when(cond, val)
    expr = expr.otherwise(F.col(col)) if expr is not None else F.col(col)
    return df.withColumn(out_col, expr)


def _iceberg_configured(spark) -> bool:
    """Either signal proves Iceberg is wired in: the DataFrameWriterV2
    path (writeTo().using("iceberg")) only needs a configured
    spark.sql.catalog.* = an Iceberg catalog class — the SQL extensions
    config is for MERGE/CALL statements — so a catalog-only cluster
    must pass this gate too."""
    exts = spark.conf.get("spark.sql.extensions", "") or ""
    if "IcebergSparkSessionExtensions" in exts:
        return True
    if any(
        k.startswith("spark.sql.catalog.") and "iceberg" in str(v).lower()
        for k, v in spark.sparkContext.getConf().getAll()
    ):
        return True
    # Catalogs configured AFTER launch via spark.conf.set(...) live in
    # the session's runtime SQL conf, not the static SparkConf above —
    # legitimate for the DataFrameWriterV2 path, so check there too
    # (round-4 ADVICE). SET -v would miss unlisted keys; SET lists all
    # explicitly-set pairs.
    try:
        return any(
            str(r["key"]).startswith("spark.sql.catalog.")
            and "iceberg" in str(r["value"]).lower()
            for r in spark.sql("SET").collect()
        )
    except Exception:
        return False


def materialize_triples(
    triples: DataFrame,
    path: str,
    n_buckets: int = 64,
    salt_hot_predicates: tuple = (
        "<http://www.w3.org/1999/02/22-rdf-syntax-ns#type>",
    ),
    n_salts: int = 8,
    mode: str = "overwrite",
) -> None:
    """Subject-hash-bucketed graph sink with hot-predicate salting.

    Layout: partition column subj_bucket = pmod(xxhash64(subj), N);
    rows whose predicate is hot (rdf:type) additionally spread over
    pmod(xxhash64(obj), n_salts) so one predicate/class can't pin a
    writer task (SURVEY §4 item 1). On Iceberg this is
    .writeTo(tbl).partitionedBy(bucket(N, 'subj')) — parquet
    partitionBy here, same layout.
    """
    salted = triples.withColumn(
        "subj_bucket",
        F.pmod(F.xxhash64("subj"), F.lit(n_buckets)).cast("int"),
    ).withColumn(
        "salt",
        F.when(
            F.col("pred").isin(*salt_hot_predicates),
            F.pmod(F.xxhash64("obj"), F.lit(n_salts)),
        )
        .otherwise(F.lit(0))
        .cast("int"),
    )
    out = salted.repartition("subj_bucket", "salt")
    if path.startswith("iceberg:"):
        # lakehouse path (cluster with Iceberg jars on the classpath):
        # identical layout via a bucket partition transform. Guarded by
        # an EXPLICIT capability check instead of a late classloader
        # error: this sandbox ships no iceberg-spark-runtime jar, so the
        # branch documents exactly what a real cluster must configure.
        spark = triples.sparkSession
        if not _iceberg_configured(spark):
            raise RuntimeError(
                "iceberg: sink requires iceberg-spark-runtime on the "
                "classpath plus an Iceberg catalog (any spark.sql."
                "catalog.<name>=org.apache.iceberg.spark.SparkCatalog; "
                "the SQL extensions config alone also passes this "
                "check). Neither was found. The parquet path writes the "
                "identical subject-bucketed, salted layout — use that "
                "in jar-less environments."
            )
        table = path[len("iceberg:") :]
        # the layout-defining partition transform the docstring
        # promises (round-6 review find: it was missing, creating an
        # UNPARTITIONED table): bucket the subject hash + identity on
        # the salt — subj equi-joins get storage-partitioned-join /
        # bucket pruning, the whole point of this sink
        writer = out.writeTo(table).using("iceberg")
        if mode == "overwrite":
            # partitionedBy only applies at table (re)creation; on
            # append the existing table's spec governs
            writer.partitionedBy(
                F.bucket(n_buckets, F.col("subj")), F.col("salt")
            ).createOrReplace()
        else:
            writer.append()
        return
    out.write.mode(mode).partitionBy("subj_bucket").parquet(path)
