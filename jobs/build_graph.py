"""The production entry point: transcripts → KG triple tables.

Launch (cluster):
    zip -r kgt.zip kgt
    spark-submit --py-files kgt.zip jobs/build_graph.py \
        --input <transcripts parquet/iceberg> --output <graph dir> \
        --chunks 256 --rdfstar --resume

Local smoke:
    python jobs/build_graph.py --input /root/testdata/sf0.001 \
        --synthetic-orders --output /tmp/kgt_graph

Stages: stage input by conv-hash chunk → per-chunk reassemble+parse
with lineage records (resume skips finished chunks) → materialize the
union into the subject-hash-bucketed graph table → print metrics.
"""

from __future__ import annotations

import argparse
import os
import sys
import time

# local runs: make the repo root importable (spark-submit ships kgt.zip
# via --py-files instead)
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv=None, stop_session=True):
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", required=True, help="transcripts parquet dir (or sf dir with --synthetic-orders)")
    ap.add_argument("--output", required=True)
    ap.add_argument("--run-id", default=None)
    ap.add_argument("--chunks", type=int, default=16)
    ap.add_argument("--base-uri", default="")
    ap.add_argument("--rdfstar", action="store_true")
    ap.add_argument("--validate", action="store_true")
    ap.add_argument("--resume", action="store_true", help="skip staging; reuse lineage")
    ap.add_argument("--cpus", type=int, default=None)
    ap.add_argument("--n-buckets", type=int, default=64)
    ap.add_argument(
        "--synthetic-orders",
        action="store_true",
        help="derive transcripts from <input>/orders.parquet (test rig)",
    )
    ap.add_argument(
        "--fastpath",
        action=argparse.BooleanOptionalAction,
        default=True,
        help="route documents matching the regular N-Triples+pnames "
        "subset through the zero-Python columnar parser (DEFAULT ON — "
        "the is_regular_doc gate is conservative and both paths are "
        "cross-checked in tests); the rest (multi-line strings, "
        "collections, property lists) take the grammar path. "
        "--no-fastpath forces the grammar path for everything",
    )
    ap.add_argument(
        "--batch-chunks",
        type=int,
        default=8,
        help="chunks per Spark job: one scan/parse/write covers the "
        "batch so large --chunks don't serialize driver-side jobs; "
        "lineage stays per-chunk",
    )
    ap.add_argument(
        "--link",
        action="store_true",
        help="entity-linking stage (north-rule stage 4): detect "
        "speaker/tool/IRI mentions in the staged transcripts, link "
        "them against the broadcast IRI dictionary, fuzzy-link the "
        "unlinked tail (prefix-filtered gram blocking + jaccard), and "
        "union the resulting <urn:kg:mentions> provenance triples into "
        "the materialized graph",
    )
    ap.add_argument(
        "--dict",
        default=None,
        help="canonicalization dictionary parquet with columns "
        "(surface, iri, kind); defaults to the built-in agent/tool rows",
    )
    ap.add_argument(
        "--fuzzy-min-jaccard", type=float, default=0.5,
    )
    args = ap.parse_args(argv)

    from kgt.spark.lineage import metrics, read_triples, run_extraction, stage_input
    from kgt.spark.session import get_spark
    from kgt.spark.write import materialize_triples

    spark = get_spark("kgt-build-graph", cpus=args.cpus)
    run_id = args.run_id or f"run-{int(time.time())}"

    if args.synthetic_orders:
        from kgt.spark.transcripts import orders_transcripts

        transcripts = orders_transcripts(spark, args.input, with_errors=True)
    else:
        transcripts = spark.read.parquet(args.input)

    if not args.resume:
        stage_input(transcripts, args.output, args.chunks)

    stats = run_extraction(
        spark,
        args.output,
        run_id,
        n_chunks=args.chunks,
        parse_options={
            "base_uri": args.base_uri,
            "rdfstar": args.rdfstar,
            "validate": args.validate,
        },
        use_fastpath=args.fastpath,
        batch_chunks=args.batch_chunks,
    )
    print(f"extraction: {stats}", file=sys.stderr)

    triples = read_triples(spark, args.output).drop("chunk")

    if args.link:
        from pyspark.sql import functions as F

        from kgt.spark.link import (
            DEFAULT_AGENT_DICT,
            build_iri_dictionary,
            detect_mentions,
            fuzzy_link,
            link_mentions,
            mentions_to_triples,
        )

        if args.dict:
            dict_src = spark.read.parquet(args.dict)
        else:
            dict_src = spark.createDataFrame(
                DEFAULT_AGENT_DICT,
                "surface string, iri string, kind string",
            )
        iri_dict = build_iri_dictionary(dict_src)
        staged = spark.read.parquet(f"{args.output}/staged")
        linked = link_mentions(detect_mentions(staged), iri_dict)
        # anti-join-first: only the unlinked tail reaches the LSH stage
        unlinked = linked.filter(F.col("iri").isNull()).select("surface")
        fuzzy = fuzzy_link(
            unlinked,
            iri_dict.select("surface", "iri"),
            min_jaccard=args.fuzzy_min_jaccard,
        ).select("surface", F.col("iri").alias("_fuzzy_iri"))
        resolved = linked.join(fuzzy, "surface", "left").withColumn(
            "iri", F.coalesce(F.col("iri"), F.col("_fuzzy_iri"))
        )
        mention_triples = mentions_to_triples(resolved).withColumn(
            "stmt_idx", F.col("stmt_idx").cast("long")
        ).localCheckpoint(eager=False)
        # materialized ONCE: the count below and the materialize union
        # both consume it (the uncached plan re-ran the whole
        # detect/link/LSH pipeline twice — review find)
        n_mentions = mention_triples.count()
        print(f"linking: {n_mentions} mention triples", file=sys.stderr)
        triples = triples.unionByName(mention_triples)

    materialize_triples(
        triples, f"{args.output}/graph", n_buckets=args.n_buckets
    )
    metrics(spark, args.output).orderBy("chunk").show(200, truncate=False)
    n = spark.read.parquet(f"{args.output}/graph").count()
    print(f"graph rows: {n}", file=sys.stderr)
    if stop_session:  # tests share the session; the CLI owns it
        spark.stop()


if __name__ == "__main__":
    main()
