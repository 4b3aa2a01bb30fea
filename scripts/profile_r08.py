"""Round-8 phase profiler: noop-sink sub-phase timings for the
expensive headline slots (guide §1.4 — time the computation, not the
sink; §1.5 — label jobs). NOT a replacement for bench.py (frozen);
numbers feed OPTIMIZATION_r08.md.

Usage: python scripts/profile_r08.py [slot ...]
Slots: parse fuzzy dedup embedding ivf jpeg media pretty streaming
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def noop(df):
    df.write.format("noop").mode("overwrite").save()


def timeit(spark, label, fn, n=2):
    best = None
    for _ in range(n):
        spark.sparkContext.setJobDescription(label)
        t0 = time.perf_counter()
        out = fn()
        dt = time.perf_counter() - t0
        best = dt if best is None else min(best, dt)
    spark.sparkContext.setJobDescription(None)
    print(f"  {label:55s} {best:8.3f}s" + (f"  (out={out})" if out is not None else ""))
    return best


def prof_parse(spark):
    from kgt.spark.parse import extract_triples, reassemble, triples
    from kgt.spark.transcripts import orders_transcripts

    print("kg_triples_orders phases:")
    tx = orders_transcripts(spark, SF_DIR)
    timeit(spark, "parse: tx gen (noop)", lambda: noop(tx))
    doc = reassemble(tx)
    timeit(spark, "parse: gen+reassemble (noop)", lambda: noop(doc))
    ext = extract_triples(orders_transcripts(spark, SF_DIR))
    timeit(spark, "parse: gen+reassemble+parse (noop)", lambda: noop(ext))
    timeit(spark, "parse: full triples count", lambda: triples(ext).count())


def prof_fuzzy(spark):
    import __spark_entry__ as m
    from pyspark.sql import functions as F
    from kgt.spark.link import _gram_tables, fuzzy_candidates

    print("kg_fuzzy_link phases:")
    cust = m._read(spark, SF_DIR, "customer")
    surf = cust.select(F.regexp_replace("c_name", "^.", "").alias("surface"))
    fdict = cust.select(
        F.col("c_name").alias("surface"),
        F.concat(F.lit("urn:cust:"), F.col("c_custkey").cast("string")).alias("iri"),
    )
    sg, dg = _gram_tables(surf, fdict, max_df=None, max_df_frac=0.2, gram_size=4)
    timeit(spark, "fuzzy: gram tables sg (noop)", lambda: noop(sg))
    timeit(spark, "fuzzy: gram tables dg (noop)", lambda: noop(dg))
    timeit(spark, "fuzzy: candidates count", lambda: fuzzy_candidates(sg, dg).count())
    timeit(spark, "fuzzy: full slot count", lambda: m._q_kg_fuzzy_link(spark, SF_DIR).count())


def prof_dedup(spark):
    import __spark_entry__ as m
    from kgt.textops.dedup import (
        connected_components,
        lsh_candidate_pairs,
        minhash_signatures,
        ngram_jaccard_pairs,
    )

    print("dedup family phases (shingles shared/localCheckpointed):")
    sh = m._dup_shingles(spark, SF_DIR)
    timeit(spark, "dedup: shingles (noop, cached after 1st)", lambda: noop(sh))
    sig = minhash_signatures(sh, n_hashes=32, rows_per_band=4)
    timeit(spark, "dedup: signatures (noop)", lambda: noop(sig))
    timeit(
        spark,
        "dedup: lsh cands count",
        lambda: lsh_candidate_pairs(
            minhash_signatures(sh, n_hashes=32, rows_per_band=4)
        ).count(),
    )
    cands = lsh_candidate_pairs(minhash_signatures(sh, n_hashes=32, rows_per_band=4))
    timeit(
        spark,
        "dedup: verify count (near_verified)",
        lambda: ngram_jaccard_pairs(sh, threshold=0.6, candidates=cands, max_df=1000).count(),
    )
    pairs = ngram_jaccard_pairs(sh, threshold=0.6, candidates=cands, max_df=1000)
    timeit(spark, "dedup: CC over pairs count", lambda: connected_components(pairs).count(), n=1)
    timeit(spark, "dedup: ngram_jaccard (no cands)", lambda: m._q_dedup_ngram_jaccard(spark, SF_DIR).count())


def prof_embedding(spark):
    import __spark_entry__ as m
    from kgt.textops.similarity import _probe_assignments

    print("dedup_embedding phases:")
    corpus = m._dup_embeddings(spark, SF_DIR)
    timeit(spark, "emb: corpus (noop)", lambda: noop(corpus))
    e = _probe_assignments(corpus, "vec_id", "embedding", None, 2, None, "join")
    timeit(spark, "emb: probe assignments (noop)", lambda: noop(e))
    timeit(spark, "emb: full pairs count", lambda: m._q_dedup_embedding(spark, SF_DIR).count())


def prof_ivf(spark):
    import __spark_entry__ as m
    from pyspark.sql import functions as F
    from kgt.textops.similarity import ivf_topk, seed_centroids

    print("sim_topk_ivf phases:")
    emb = m._read(spark, SF_DIR, "embeddings")
    timeit(spark, "ivf: seed_centroids (collect)", lambda: len(seed_centroids(emb, 16)))
    cents = seed_centroids(emb, 16)
    timeit(
        spark,
        "ivf: topk w/ prebuilt centroids",
        lambda: ivf_topk(emb, emb.filter(F.col("vec_id") < 8), k=5, centroids=cents).count(),
    )
    timeit(spark, "ivf: full slot count", lambda: m._q_sim_topk_ivf(spark, SF_DIR).count())


def prof_jpeg(spark):
    import __spark_entry__ as m

    print("multimodal_jpeg_real phases:")
    docs = m._read(spark, SF_DIR, "documents")
    print("  input partitions:", docs.rdd.getNumPartitions())
    timeit(spark, "jpeg: full slot count", lambda: m._q_multimodal_jpeg_real(spark, SF_DIR).count())


def prof_media(spark):
    import __spark_entry__ as m

    print("multimodal_media_meta phases:")
    timeit(spark, "media: full slot count", lambda: m._q_multimodal_media_meta(spark, SF_DIR).count())


def prof_pretty(spark):
    import __spark_entry__ as m

    print("kg_pretty_nested phases:")
    timeit(spark, "pretty: full slot count", lambda: m._q_kg_pretty_nested(spark, SF_DIR).count())


def prof_streaming(spark):
    """Sub-phase timing of the streaming_near_dup gate (one pass)."""
    import atexit
    import shutil
    import tempfile

    from pyspark.sql import functions as F

    import __spark_entry__ as m
    from kgt.streaming.extract import drain_streaming_query, streaming_near_dup

    print("streaming_near_dup phases (single pass):")
    corpus = m._dup_corpus(spark, SF_DIR)
    tmp = tempfile.mkdtemp(prefix="kgt_prof_stream_")
    atexit.register(lambda: shutil.rmtree(tmp, ignore_errors=True))
    src, out, ckpt = f"{tmp}/src", f"{tmp}/out", f"{tmp}/ckpt"

    t0 = time.perf_counter()
    corpus.filter(F.col("doc_id") % 2 == 0).coalesce(1).write.parquet(src)
    corpus.filter(F.col("doc_id") % 2 == 1).coalesce(1).write.mode("append").parquet(src)
    t1 = time.perf_counter()
    print(f"  {'stream: src write':55s} {t1 - t0:8.3f}s")

    stream = (
        spark.readStream.schema("doc_id long, text string")
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    n_state = int(
        os.environ.get(
            "KGT_STREAM_STATE_PARTITIONS",
            str(max(8, spark.sparkContext.defaultParallelism // 2)),
        )
    )
    prev_parts = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", str(n_state))
    try:
        q = streaming_near_dup(stream, out, ckpt, ttl_seconds=3600)
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev_parts)
    # watch progress: record wall time of each batch as it reports
    t_start = time.perf_counter()
    seen = {}
    data_batches = 0
    while q.isActive and time.perf_counter() - t_start < 300:
        p = q.lastProgress
        if p is not None and p["batchId"] not in seen:
            seen[p["batchId"]] = (
                round(time.perf_counter() - t_start, 3),
                p["numInputRows"],
                p.get("batchDuration"),
            )
            if p["numInputRows"] > 0:
                data_batches += 1
            if p["numInputRows"] == 0 and data_batches >= 2 and len(seen) - data_batches >= 2:
                break
        time.sleep(0.05)
    t2 = time.perf_counter()
    q.stop()
    q.awaitTermination(60)
    t3 = time.perf_counter()
    print(f"  {'stream: run to drained':55s} {t2 - t1:8.3f}s")
    print(f"  {'stream: stop+await':55s} {t3 - t2:8.3f}s")
    for bid, (wall, rows, dur) in sorted(seen.items()):
        print(f"    batch {bid}: t={wall}s rows={rows} batchDuration={dur}ms")
    t4 = time.perf_counter()
    n = spark.read.parquet(f"{out}/stream_near_dup").select("doc_a", "doc_b").distinct().count()
    t5 = time.perf_counter()
    print(f"  {'stream: sink read+distinct+count':55s} {t5 - t4:8.3f}s  rows={n}")


PROFS = {
    "parse": prof_parse,
    "fuzzy": prof_fuzzy,
    "dedup": prof_dedup,
    "embedding": prof_embedding,
    "ivf": prof_ivf,
    "jpeg": prof_jpeg,
    "media": prof_media,
    "pretty": prof_pretty,
    "streaming": prof_streaming,
}


def main():
    from kgt.spark.session import get_spark

    spark = get_spark("kgt-prof-r08", cpus=CPUS)
    spark.range(1000).count()  # warm
    names = sys.argv[1:] or list(PROFS)
    for nm in names:
        t0 = time.perf_counter()
        PROFS[nm](spark)
        print(f"[{nm}] total {time.perf_counter() - t0:.2f}s\n")
    spark.stop()


if __name__ == "__main__":
    main()
