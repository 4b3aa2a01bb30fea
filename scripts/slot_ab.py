"""Interleaved cross-revision A/B of Spark bench slots.

The round-5 verdict flagged three slots that moved >1.5× in the final
bench run (kg_entity_links 3.2→7.3 s, dedup_minhash_lsh 3.3→5.5 s,
dedup_ngram_jaccard) but ran fast in the OTHER same-round run on
identical code — the noise-vs-regression question the parse_ab
methodology answers for the parse core, asked here at the Spark-slot
level: each revision's full tree (kgt/ + __spark_entry__.py) is
extracted side-by-side, one fresh subprocess per (revision, round)
runs the slots once in a fresh Spark session, rounds interleave the
revisions round-robin in one sitting, and the estimator is min-of-N
per (revision, slot). A real regression shows up as a persistent gap
between the two mins; VM noise shows up as overlapping spreads.

Usage:
    python scripts/slot_ab.py --rev r4=fc52d51 \
        --slots kg_entity_links,dedup_minhash_lsh,dedup_ngram_jaccard \
        --rounds 5 --sf /root/testdata/sf0.1 --cpus 32
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_RUNNER = r"""
import importlib.util
import json, sys, time

root, sf_dir, slots, cpus = (
    sys.argv[1], sys.argv[2], sys.argv[3].split(","), int(sys.argv[4])
)
sys.path.insert(0, root)
from kgt.spark.session import get_spark

spark = get_spark("slot-ab", cpus=cpus)
spec = importlib.util.spec_from_file_location(
    "entry_ab", root + "/__spark_entry__.py"
)
m = importlib.util.module_from_spec(spec)
spec.loader.exec_module(m)
qs = m.bench_queries() if hasattr(m, "bench_queries") else m.queries()
spark.range(1000).count()  # warm JVM/Arrow
out = {}
for s in slots:
    t0 = time.perf_counter()
    qs[s](spark, sf_dir).count()
    out[s] = round(time.perf_counter() - t0, 3)
print("ABJSON:" + json.dumps(out))
"""


def _extract(rev: str, name: str) -> str:
    commit = subprocess.run(
        ["git", "rev-parse", rev], cwd=REPO, check=True,
        capture_output=True, text=True,
    ).stdout.strip()
    root = os.path.join(REPO, ".ab", name + "full")
    marker = os.path.join(root, ".ab-commit")
    # cache keyed by the RESOLVED commit, not the variant name — a
    # stale tree under a reused name would silently A/B the wrong code
    if os.path.isdir(root):
        cached = (
            open(marker).read().strip() if os.path.exists(marker) else ""
        )
        if cached != commit:
            import shutil

            shutil.rmtree(root)
    if not os.path.isdir(root):
        os.makedirs(root)
        tar = subprocess.run(
            ["git", "archive", commit], cwd=REPO, check=True,
            capture_output=True,
        ).stdout
        subprocess.run(
            ["tar", "-x", "-C", root], input=tar, check=True
        )
        with open(marker, "w") as f:
            f.write(commit)
    return root


def _run_once(root: str, sf_dir: str, slots: list[str], cpus: int) -> dict:
    env = dict(os.environ, PYTHONPATH=root)
    p = subprocess.run(
        [sys.executable, "-c", _RUNNER, root, sf_dir, ",".join(slots),
         str(cpus)],
        cwd=root, env=env, capture_output=True, text=True, timeout=900,
    )
    for line in p.stdout.splitlines():
        if line.startswith("ABJSON:"):
            return json.loads(line[len("ABJSON:"):])
    raise RuntimeError(
        f"runner produced no ABJSON (rc={p.returncode}):\n"
        + p.stderr[-2000:]
    )


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--rev", action="append", default=[],
                    help="name=commit to A/B against the current tree")
    ap.add_argument("--slots", required=True)
    ap.add_argument("--rounds", type=int, default=5)
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    ap.add_argument("--cpus", type=int, default=32)
    args = ap.parse_args()

    slots = args.slots.split(",")
    variants = [("cur", REPO)]
    for spec_ in args.rev:
        name, commit = spec_.split("=", 1)
        variants.insert(0, (name, _extract(commit, name)))

    samples: dict[str, dict[str, list[float]]] = {
        n: {s: [] for s in slots} for n, _ in variants
    }
    for rnd in range(args.rounds):
        for name, root in variants:
            res = _run_once(root, args.sf, slots, args.cpus)
            for s in slots:
                samples[name][s].append(res[s])
            print(f"round {rnd} {name}: {res}", flush=True)

    summary = {
        n: {s: {"min": min(v), "samples": v} for s, v in d.items()}
        for n, d in samples.items()
    }
    print(json.dumps({"sf": args.sf, "cpus": args.cpus,
                      "rounds": args.rounds, "slots": summary}, indent=2))


if __name__ == "__main__":
    main()
