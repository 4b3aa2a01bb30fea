"""Scaling-efficiency evidence: the same extraction job at two
parallelism levels (local[8] vs local[32], CPU-pinned) on the same
input — the sandbox proxy for the north rule's N vs 4N executor
clusters (no real cluster available). See BENCH.md for methodology and
interpretation; writes BENCH_SCALING.json.

The sandbox VM has ±2-3× run-to-run noise (shared hypervisor, JVM JIT,
page cache), so: fresh session per sample, levels interleaved, several
samples, min as the low-interference estimator. The child reports BOTH
the full pipeline (includes the conv_id shuffle — bounded by the box's
single disk/memory fabric, which unlike a real cluster does not grow
with cores) and the parse stage alone (the compute that dominates at
scale), plus the pure-python multiprocessing ideal of the same kernel
(the box's turbo/bandwidth ceiling — separate cluster nodes don't share
those budgets).

Usage: python scripts/scaling_bench.py [sf_dir] [rounds] [replicate]
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_SPARK_CHILD = r"""
import json, sys, time
sys.path.insert(0, {repo!r})
from pyspark.sql import functions as F
from kgt.spark.session import get_spark
from kgt.spark.transcripts import orders_transcripts, customer_bnode_transcripts
from kgt.spark.parse import extract_triples, parse_documents, reassemble

cpus = {cpus}
sf_dir = {sf_dir!r}
replicate = {replicate}

spark = get_spark(f"scale-{{cpus}}", cpus=cpus)
base = orders_transcripts(spark, sf_dir, with_errors=True).unionByName(
    customer_bnode_transcripts(spark, sf_dir)
)
# replicate the corpus (distinct conv_ids per copy) so the parallel
# fraction dominates fixed stage overhead
tx = base.crossJoin(
    spark.range(replicate).select(F.col("id").alias("rep"))
).select(
    F.concat(F.col("rep").cast("string"), F.lit("_"), F.col("conv_id")).alias("conv_id"),
    "turn_idx", "role", "text", "tool", "ts",
).cache()
n_turns = tx.count()  # materialize input: we time the job, not the gen

# JIT/python-worker warm-up pass, then timed passes (min)
n_rows = extract_triples(tx).count()
full = []
for _ in range(3):
    t0 = time.perf_counter()
    extract_triples(tx).count()
    full.append(round(time.perf_counter() - t0, 3))

# parse stage alone: docs cached (post-shuffle), so this isolates the
# Arrow+python compute that dominates at scale
docs = reassemble(tx).cache()
docs.count()
parse = []
for _ in range(3):
    t0 = time.perf_counter()
    parse_documents(docs).count()
    parse.append(round(time.perf_counter() - t0, 3))

print(json.dumps({{"cpus": cpus, "n_turns": n_turns, "n_rows": n_rows,
                   "full_samples": full, "parse_samples": parse}}))
spark.stop()
"""

_PY_CHILD = r"""
import json, multiprocessing as mp, sys, time
sys.path.insert(0, {repo!r})

def work(args):
    seed, n = args
    from kgt.turtle.batch import parse_batch
    ids = [f"c{{seed}}_{{i}}" for i in range(n)]
    texts = ["@prefix ord: <urn:ord:> .\n@prefix p: <urn:p:> .\n"
             f"ord:{{seed}}x{{i}} a p:Order ;\n  p:cust <urn:cust:{{i % 1500}}> ;\n"
             f'  p:status "F" ;\n  p:total {{140000 + i}} ;\n'
             f'  p:priority "3-MEDIUM{{i}}"@en, "alt" .\n'
             for i in range(n)]
    parse_batch(ids, texts)
    return n

if __name__ == "__main__":
    nproc = {cpus}
    docs_per = 3000
    with mp.Pool(nproc) as p:
        args = [(j, docs_per) for j in range(nproc * 4)]
        t0 = time.perf_counter()
        p.map(work, args)
        dt = time.perf_counter() - t0
    print(json.dumps({{"cpus": nproc, "docs_per_sec": round(docs_per * nproc * 4 / dt, 1)}}))
"""


def _run_pinned(cpus: int, code: str) -> dict:
    cmd = [sys.executable, "-c", code]
    if os.path.exists("/usr/bin/taskset"):
        cmd = ["taskset", "-c", f"0-{cpus - 1}"] + cmd
    out = subprocess.run(
        cmd, capture_output=True, text=True, check=True, cwd=REPO
    )
    line = [l for l in out.stdout.splitlines() if l.startswith("{")][-1]
    return json.loads(line)


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"
    )
    rounds = int(sys.argv[2]) if len(sys.argv) > 2 else 2
    replicate = int(sys.argv[3]) if len(sys.argv) > 3 else 4
    lo_n, hi_n = 8, 32

    py_lo = _run_pinned(lo_n, _PY_CHILD.format(repo=REPO, cpus=lo_n))
    py_hi = _run_pinned(hi_n, _PY_CHILD.format(repo=REPO, cpus=hi_n))
    ceiling = (py_hi["docs_per_sec"] / py_lo["docs_per_sec"]) / (hi_n / lo_n)
    print(f"python ideal: {py_lo} -> {py_hi} ceiling={ceiling:.3f}", flush=True)

    samples = {lo_n: [], hi_n: []}
    meta = {}
    for r in range(rounds):
        for cpus in (lo_n, hi_n):  # interleave levels against drift
            res = _run_pinned(
                cpus,
                _SPARK_CHILD.format(
                    repo=REPO, cpus=cpus, sf_dir=sf_dir, replicate=replicate
                ),
            )
            print(f"local[{cpus}] round {r}: {res}", flush=True)
            samples[cpus].append(res)
            meta[cpus] = res

    def best(cpus, key):
        return min(min(s[key]) for s in samples[cpus])

    n_turns = meta[lo_n]["n_turns"]
    lo_full, hi_full = best(lo_n, "full_samples"), best(hi_n, "full_samples")
    lo_parse, hi_parse = best(lo_n, "parse_samples"), best(hi_n, "parse_samples")
    factor = hi_n / lo_n
    raw_full = (lo_full / hi_full) / factor
    raw_parse = (lo_parse / hi_parse) / factor
    result = {
        "sf_dir": sf_dir,
        "n_turns": n_turns,
        "cpu_pinned": True,
        "low_cpus": lo_n,
        "high_cpus": hi_n,
        "full_pipeline": {
            "low_sec": lo_full,
            "high_sec": hi_full,
            "low_turns_per_sec": round(n_turns / lo_full, 1),
            "high_turns_per_sec": round(n_turns / hi_full, 1),
            "speedup": round(lo_full / hi_full, 3),
            "raw_efficiency": round(raw_full, 3),
        },
        "parse_stage": {
            "low_sec": lo_parse,
            "high_sec": hi_parse,
            "speedup": round(lo_parse / hi_parse, 3),
            "raw_efficiency": round(raw_parse, 3),
            "normalized_efficiency": round(raw_parse / ceiling, 3),
        },
        "python_ideal": {
            "low": py_lo,
            "high": py_hi,
            "hardware_ceiling": round(ceiling, 3),
        },
        "samples": {str(k): v for k, v in samples.items()},
        "target": 0.8,
        "note": (
            "single-box proxy: the parse stage (the compute that scales "
            "with executors) is measured separately from the conv_id "
            "shuffle, whose fabric on one machine does not grow with "
            "cores the way a cluster's does; hardware_ceiling is the "
            "pure-python multiprocessing efficiency of the same kernel "
            "on the same cores (turbo/membw limit of the box)"
        ),
    }
    print(json.dumps(result))
    out = os.environ.get("KGT_SCALING_OUT", "BENCH_SCALING.json")
    with open(os.path.join(REPO, out), "w") as f:
        json.dump(result, f, indent=2)


if __name__ == "__main__":
    main()
