"""Capture .explain('formatted') for headline queries into plans/r08/.

Usage: python scripts/capture_plans.py <before|after> [query ...]

Notes: queries that run eager driver loops (dedup_clusters' CC rounds,
streaming_near_dup's stream) execute those during construction; the
captured plan is the final returned frame, which is still what the
bench's .count() executes last. streaming_near_dup is skipped (its
plan is a trivial sink read; the work is the stream itself).
"""

from __future__ import annotations

import contextlib
import io
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

DEFAULT = [
    "kg_triples_orders",
    "kg_stream_separators",
    "kg_fuzzy_link",
    "kg_pretty_nested",
    "kg_entity_links",
    "dedup_minhash_lsh",
    "dedup_ngram_jaccard",
    "dedup_near_verified",
    "dedup_embedding",
    "sim_topk_ivf",
    "multimodal_jpeg_real",
    "multimodal_media_meta",
    "multimodal_decode",
    "multimodal_frames",
]


def main():
    tag = sys.argv[1]
    names = sys.argv[2:] or DEFAULT
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    from kgt.spark.session import get_spark

    import __spark_entry__ as entrymod

    spark = get_spark("kgt-plans", cpus=int(os.environ.get("SPARK_GRAFT_CPUS", "32")))
    qs = entrymod.bench_queries()
    out_dir = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "plans", "r08")
    os.makedirs(out_dir, exist_ok=True)
    for name in names:
        df = qs[name](spark, sf_dir)
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            df.explain("formatted")
        path = os.path.join(out_dir, f"{name}_{tag}.txt")
        with open(path, "w") as f:
            f.write(buf.getvalue())
        print("wrote", path)
    spark.stop()


if __name__ == "__main__":
    main()
