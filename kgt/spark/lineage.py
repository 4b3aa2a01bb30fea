"""Checkpoint/resume with per-partition lineage + metrics tables.

Batch bookkeeping (SURVEY §4 item 4) — not Structured Streaming
checkpoints. The unit of work is a conv_id hash chunk:

  chunk = pmod(xxhash64(conv_id), n_chunks)

Layout under ``out_dir``:
  staged/chunk=K/      input transcripts, hash-partitioned ONCE
                       (so resume re-reads only pending chunks — never
                       a full rescan per chunk)
  triples/chunk=K/     extracted statements (T rows)
  errors/chunk=K/      quarantine rows
  _lineage/chunk=K/    one completion record per finished chunk

Resume = read _lineage, skip completed chunks. A chunk's outputs are
(over)written before its lineage record, so a crash mid-chunk leaves a
re-runnable chunk, and re-running is idempotent: content-hash
skolemization makes output rows identical across retries.
"""

from __future__ import annotations

import time

from pyspark.sql import DataFrame, SparkSession, functions as F

LINEAGE_SCHEMA = (
    "run_id string, chunk int, status string, n_turns long, "
    "n_triples long, n_errors long, started_ts double, finished_ts double"
)


def chunk_of(conv_id_col, n_chunks: int):
    return F.pmod(F.xxhash64(conv_id_col), F.lit(n_chunks)).cast("int")


def stage_input(transcripts: DataFrame, out_dir: str, n_chunks: int) -> None:
    """One shuffle: hash-partition the input by chunk and persist, so
    each resume step reads only its own partition directories."""
    (
        transcripts.withColumn("chunk", chunk_of(F.col("conv_id"), n_chunks))
        .repartition("chunk")
        .write.mode("overwrite")
        .partitionBy("chunk")
        .parquet(f"{out_dir}/staged")
    )
    # record the staging fan-out: resume MUST use the same n_chunks
    # (a different value would silently skip staged chunks >= n_chunks
    # and clobber other batches' output — round-6 review find)
    spark = transcripts.sparkSession
    spark.createDataFrame([(int(n_chunks),)], "n_chunks int").coalesce(
        1
    ).write.mode("overwrite").parquet(f"{out_dir}/_meta")


def completed_chunks(spark: SparkSession, out_dir: str) -> set[int]:
    from pyspark.errors import AnalysisException

    try:
        rows = (
            spark.read.schema(LINEAGE_SCHEMA)
            .parquet(f"{out_dir}/_lineage")
            .filter(F.col("status") == "done")
            .select("chunk")
            .distinct()
            .collect()
        )
        return {r["chunk"] for r in rows}
    except AnalysisException:
        # no lineage yet (fresh run). Anything else — IO errors, a
        # corrupt parquet — propagates: swallowing it would silently
        # re-parse the whole job as if from scratch (review find)
        return set()


def run_extraction(
    spark: SparkSession,
    out_dir: str,
    run_id: str,
    n_chunks: int = 16,
    parse_options: dict | None = None,
    fail_on_chunk: int | None = None,
    use_fastpath: bool = False,
    batch_chunks: int = 8,
) -> dict:
    """Process every pending chunk of the staged input; returns metrics.

    Pending chunks run in BATCHES of ``batch_chunks`` per Spark job —
    one scan, one parse stage, and one dynamic-partition write cover
    the whole batch, so ``--chunks 256`` fills the cluster instead of
    serializing 256 driver-side jobs. Lineage stays per-chunk (a crash
    mid-batch re-runs only that batch; outputs are idempotent via
    content-hash skolemization). ``batch_chunks=1`` reproduces the
    strictly sequential behavior.

    ``use_fastpath`` routes documents in the regular N-Triples+pnames
    subset through the zero-Python columnar parser; everything else
    takes the grammar path. ``fail_on_chunk`` injects a failure after
    the outputs of the batch containing that chunk but before any of
    the batch's lineage records — the crash point tests must survive.
    """
    from pyspark.errors import AnalysisException

    from kgt.spark.parse import parse_documents, reassemble

    try:
        staged_n = spark.read.parquet(f"{out_dir}/_meta").collect()[0][
            "n_chunks"
        ]
    except AnalysisException:
        staged_n = None  # pre-meta staging layout
    if staged_n is not None and staged_n != n_chunks:
        raise ValueError(
            f"staged with n_chunks={staged_n} but run requested "
            f"{n_chunks}; resume must reuse the staging fan-out"
        )
    opts = parse_options or {}
    # the fast path has no base/prefix/validate/canonicalize machinery
    # — routing through it with those options set would silently
    # diverge from the grammar path (relative IRIs unresolved, no
    # validation); fall back to all-grammar instead (review find)
    fastpath_ok = use_fastpath and not any(
        opts.get(k)
        for k in ("base_uri", "prefixes", "validate", "canonicalize")
    )

    done = completed_chunks(spark, out_dir)
    pending = [c for c in range(n_chunks) if c not in done]
    stats = {"run_id": run_id, "chunks_done": len(done), "chunks_run": 0}
    for i in range(0, len(pending), max(batch_chunks, 1)):
        batch = pending[i : i + max(batch_chunks, 1)]
        t0 = time.time()
        # partition-PRUNED read (chunk is a partition column): only the
        # batch's chunk dirs are listed/scanned, and — unlike explicit
        # chunk=K paths — a chunk that received zero conversations at
        # staging time (hash imbalance at small N) doesn't fail the read
        part = spark.read.parquet(f"{out_dir}/staged").filter(
            F.col("chunk").isin([int(c) for c in batch])
        )
        docs = reassemble(part.select("conv_id", "turn_idx", "text"))
        if fastpath_ok:
            from kgt.spark.fastpath import is_regular_doc, parse_fastpath

            regular = docs.filter(is_regular_doc(F.col("text")))
            rest = docs.filter(~is_regular_doc(F.col("text")))
            ext = parse_fastpath(regular).unionByName(
                parse_documents(rest, **(parse_options or {}))
            )
        else:
            ext = parse_documents(docs, **(parse_options or {}))
        # chunk is a pure function of conv_id — re-derive instead of
        # threading it through the parse stage
        ext = ext.withColumn(
            "chunk", chunk_of(F.col("conv_id"), n_chunks)
        ).cache()
        triples = ext.filter(F.col("kind") == "T").drop(
            "lineno", "production", "message", "kind"
        )
        errors = ext.filter(F.col("kind") == "E").select(
            "conv_id", "lineno", "production", "message", "chunk"
        )
        # dynamic partition overwrite: only this batch's chunk dirs are
        # replaced, earlier completed chunks stay untouched
        (
            triples.write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("chunk")
            .parquet(f"{out_dir}/triples")
        )
        (
            errors.write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("chunk")
            .parquet(f"{out_dir}/errors")
        )
        tri_counts = {
            r["chunk"]: r["count"]
            for r in triples.groupBy("chunk").count().collect()
        }
        err_counts = {
            r["chunk"]: r["count"]
            for r in errors.groupBy("chunk").count().collect()
        }
        turn_counts = {
            r["chunk"]: r["count"]
            for r in part.groupBy("chunk").count().collect()
        }
        # dynamic overwrite only replaces partitions PRESENT in the new
        # output: a batch chunk that produced zero triples (or zero
        # errors) must still (a) clear stale rows from an aborted
        # earlier attempt under that chunk dir and (b) leave a
        # schema-bearing file so read_triples never sees a directory
        # with no parquet footers — write an empty typed frame per
        # missing chunk, directly at the partition path
        for c in batch:
            if c not in tri_counts:
                spark.createDataFrame(
                    [], triples.drop("chunk").schema
                ).write.mode("overwrite").parquet(f"{out_dir}/triples/chunk={c}")
            if c not in err_counts:
                spark.createDataFrame(
                    [], errors.drop("chunk").schema
                ).write.mode("overwrite").parquet(f"{out_dir}/errors/chunk={c}")
        ext.unpersist()
        if fail_on_chunk is not None and fail_on_chunk in batch:
            raise RuntimeError(
                f"injected failure after batch {batch} outputs"
            )
        finished = time.time()
        # ONE write per batch (dynamic overwrite keeps other batches'
        # lineage): the old per-chunk loop serialized batch_chunks tiny
        # Spark jobs — exactly the overhead batching exists to avoid
        recs = [
            (
                run_id,
                chunk,
                "done",
                turn_counts.get(chunk, 0),
                tri_counts.get(chunk, 0),
                err_counts.get(chunk, 0),
                t0,
                finished,
            )
            for chunk in batch
        ]
        (
            spark.createDataFrame(recs, LINEAGE_SCHEMA)
            .coalesce(1)
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("chunk")
            .parquet(f"{out_dir}/_lineage")
        )
        stats["chunks_run"] += len(batch)
    return stats


def read_triples(spark: SparkSession, out_dir: str) -> DataFrame:
    return spark.read.parquet(f"{out_dir}/triples")


def metrics(spark: SparkSession, out_dir: str) -> DataFrame:
    """The per-partition metrics table the north rule asks for."""
    return (
        spark.read.schema(LINEAGE_SCHEMA)
        .parquet(f"{out_dir}/_lineage")
        .withColumn(
            "sec", F.round(F.col("finished_ts") - F.col("started_ts"), 3)
        )
    )
