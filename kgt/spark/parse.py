"""Conversation reassembly + distributed triple extraction.

Pipeline stages (SURVEY §3.1 Spark re-expression):
  1. scan transcripts (Iceberg/parquet)
  2. reassemble per conversation, stable-ordered by turn_idx
     (shuffle #1: hash by conv_id — the only shuffle before the sink)
  3. mapInPandas parse (Arrow batches into the Spark-free kgt.turtle.batch
     core; no per-row Python)
  4. split triples / quarantined errors

Scale notes:
  - conversations are the parallelism unit; giant conversations are the
    skew risk → reassembly exposes a length-aware repartition knob
    (SURVEY §7.3 known-hard item 3)
  - skolemization is content-hashed inside the batch (retry-stable)
  - stmt_idx preserves the reference's emission order per conversation
    so downstream per-turn text equality / streaming-writer semantics
    stay computable without re-parsing
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, functions as F

from kgt.turtle.batch import DEFAULT_SKOLEM_SALT, parse_batch

TRIPLES_SCHEMA = (
    "conv_id string, stmt_idx long, kind string, "
    "subj string, pred string, obj string, is_quoted boolean, "
    "lineno int, production string, message string"
)

TRANSCRIPT_COLUMNS = ["conv_id", "turn_idx", "role", "text", "tool", "ts"]


def reassemble(transcripts: DataFrame, num_partitions: int | None = None) -> DataFrame:
    """transcripts(conv_id, turn_idx, text, ...) → docs(conv_id, text, n_turns).

    Stable ordering: sort_array over (turn_idx, text) structs — the
    aggregate-side equivalent of Window.partitionBy(conv_id)
    .orderBy(turn_idx) + collect_list, but with ONE shuffle and a
    map-side partial aggregate instead of window + dropDuplicates.
    Turn texts are joined with '\\n' (turns carry whole lines of the
    conversation's Turtle payload).

    Parallelism: we hash-repartition by conv_id BEFORE the groupBy; the
    aggregate then reuses that partitioning (no second exchange), and —
    critically — the downstream Python parse stage inherits
    ``num_partitions`` tasks. Left to AQE, a bytes-small shuffle gets
    coalesced to 1 partition and the CPU-bound parse runs on one core;
    the parse stage must be sized by docs/CPU, not bytes.
    """
    if num_partitions is None:
        num_partitions = transcripts.sparkSession.sparkContext.defaultParallelism
    return (
        # project BEFORE the exchange: the shuffle carries only the 3
        # columns the aggregate needs (role/tool/ts would otherwise
        # ride along — measurably slower at high core counts where the
        # single exchange is bandwidth-bound)
        transcripts.select("conv_id", "turn_idx", "text")
        .repartition(num_partitions, "conv_id")
        .groupBy("conv_id")
        .agg(
            F.concat_ws(
                "\n",
                F.transform(
                    F.array_sort(F.collect_list(F.struct("turn_idx", "text"))),
                    lambda x: x["text"],
                ),
            ).alias("text"),
            F.count("*").alias("n_turns"),
        )
    )


def quarantine_oversized(docs: DataFrame, max_doc_chars: int):
    """Split docs into (within-limit, oversized-as-E-rows).

    Giant conversations are the parse stage's skew/OOM risk (one doc is
    atomic — no partitioning can split it; SURVEY §7.3 item 3). The
    production guardrail is a size cap: over-limit docs become
    quarantine rows instead of stalling or OOM-ing a worker.
    """
    ok = docs.filter(F.length("text") <= max_doc_chars)
    bad = docs.filter(F.length("text") > max_doc_chars).select(
        "conv_id",
        F.lit(-1).cast("long").alias("stmt_idx"),
        F.lit("E").alias("kind"),
        F.lit(None).cast("string").alias("subj"),
        F.lit(None).cast("string").alias("pred"),
        F.lit(None).cast("string").alias("obj"),
        F.lit(False).alias("is_quoted"),
        F.lit(None).cast("int").alias("lineno"),
        F.lit("size_cap").alias("production"),
        F.concat(
            F.lit("document exceeds max_doc_chars: "),
            F.length("text").cast("string"),
        ).alias("message"),
    )
    return ok, bad


def extract_triples(
    transcripts: DataFrame,
    base_uri: str = "",
    prefixes: dict | None = None,
    validate: bool = False,
    canonicalize: bool = False,
    rdfstar: bool = False,
    skolem_salt: str | None = DEFAULT_SKOLEM_SALT,
    max_doc_chars: int | None = None,
    num_partitions: int | None = None,
) -> DataFrame:
    """Full extraction: reassembled docs → one row per statement/error.

    Returns the union frame (kind 'T'|'E'); use `triples()` / `errors()`
    to split. All parse options are closure-captured (tiny — no
    broadcast needed; the per-document prefix/base env lives inside the
    parser, SURVEY §1.4). ``num_partitions`` sizes the CPU-bound parse
    stage (reassemble's docs/CPU knob — it was documented but not
    reachable from this public entry point).
    """
    docs = reassemble(transcripts, num_partitions=num_partitions)
    quarantined = None
    if max_doc_chars is not None:
        # materialize the reassembly ONCE: the ok/bad split is two
        # filters over the same aggregation, and without pinning it the
        # shuffle-read + groupBy would execute per branch (the size-cap
        # guardrail used to double the reassembly stage)
        docs = docs.localCheckpoint(eager=False)
        docs, quarantined = quarantine_oversized(docs, max_doc_chars)
    out = parse_documents(
        docs,
        base_uri=base_uri,
        prefixes=prefixes,
        validate=validate,
        canonicalize=canonicalize,
        rdfstar=rdfstar,
        skolem_salt=skolem_salt,
    )
    if quarantined is not None:
        out = out.unionByName(quarantined)
    return out


def parse_documents(
    docs: DataFrame,
    base_uri: str = "",
    prefixes: dict | None = None,
    validate: bool = False,
    canonicalize: bool = False,
    rdfstar: bool = False,
    skolem_salt: str | None = DEFAULT_SKOLEM_SALT,
    freebase: bool = False,
) -> DataFrame:
    """docs(conv_id, text) → statement/error rows via Arrow batches.

    ``freebase=True`` mirrors the reference's ``Reader.new(freebase:
    true)`` class dispatch (reader.rb:58-66): the document set is
    routed through the zero-Python columnar FreebaseReader equivalent
    (kgt.spark.fastpath) instead of the grammar parser; per-line
    quarantine replaces recovery, like the reference's optimized
    reader. The other parse options don't apply on that path (the
    fastpath grammar subset has no bnodes/literals needing them)."""
    if freebase:
        from kgt.spark.fastpath import parse_fastpath

        return parse_fastpath(docs)
    prefixes = dict(prefixes or {})

    def run(batches):
        for pdf in batches:
            cols = parse_batch(
                pdf["conv_id"].tolist(),
                pdf["text"].tolist(),
                base_uri=base_uri,
                prefixes=prefixes,
                validate=validate,
                canonicalize=canonicalize,
                rdfstar=rdfstar,
                skolem_salt=skolem_salt,
            )
            yield pd.DataFrame(cols)

    return docs.select("conv_id", "text").mapInPandas(run, schema=TRIPLES_SCHEMA)


def with_metrics(extracted: DataFrame, observation) -> DataFrame:
    """Attach an observe() metric set (rows/triples/errors/quoted) to a
    pyspark Observation; read `observation.get` after an action —
    replaces the reference's debug-log counters with executor-side
    accumulation (SURVEY §4: metrics via observe, not log strings)."""
    return extracted.observe(
        observation,
        F.count(F.lit(1)).alias("rows"),
        F.count_if(F.col("kind") == "T").alias("triples"),
        F.count_if(F.col("kind") == "E").alias("errors"),
        F.count_if(F.col("is_quoted")).alias("quoted"),
    )


def triples(extracted: DataFrame) -> DataFrame:
    """The statement stream: T rows with parse bookkeeping dropped."""
    return extracted.filter(F.col("kind") == "T").select(
        "conv_id", "stmt_idx", "subj", "pred", "obj", "is_quoted"
    )


def errors(extracted: DataFrame) -> DataFrame:
    """Quarantine stream (reference recovery/validation duality)."""
    return extracted.filter(F.col("kind") == "E").select(
        "conv_id", "lineno", "production", "message"
    )
