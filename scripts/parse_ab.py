"""Pinned same-session A/B of the pure-Python parse path.

The round-2 bench moved kg_recovery_quarantine 12.1 -> 22.5 s and
kg_stream_separators 4.0 -> 6.8 s across rounds, in a sandbox with
±2-3× VM noise. Those queries are parse-dominated, and the parse is
pure Python inside Arrow batches — so the noise-robust experiment is to
time the BATCH CORE itself (kgt.turtle.batch.parse_batch), with every
variant's code checked out side-by-side and the runs interleaved
round-robin in one sitting, min-of-N per variant. Spark, shuffle, and
Arrow are out of the loop by construction; what remains is exactly the
code that changed between rounds.

Usage:
    python scripts/parse_ab.py                    # current tree only
    python scripts/parse_ab.py --rev r1=a14acef --rev r2=ea7b289
        # extracts each rev's kgt/ into .ab/<name> (git worktree),
        # interleaves: r1, r2, cur, r1, r2, cur, ... x rounds

Each timing runs in a FRESH subprocess (two kgt versions can't share a
process) with PYTHONPATH pinned to the variant root. Corpus = the
bench's orders-shaped documents (with the every-10th recovery error),
generated in pure Python, identical bytes for every variant.
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_RUNNER = r"""
import json, sys, time
root = sys.argv[1]
n_docs = int(sys.argv[2])
reps = int(sys.argv[3])
sys.path.insert(0, root)
from kgt.turtle.batch import parse_batch

def corpus(n):
    conv_ids, texts = [], []
    for k in range(1, n + 1):
        lines = [
            "@prefix ord: <urn:ord:> .",
            "@prefix p: <urn:p:> .",
            f"ord:{k} a p:Order ;",
            f"  p:cust <urn:cust:{k % 997}> ;",
            '  p:status "O" ;',
            f"  p:total {100000 + k} ;",
            '  p:priority "1-URGENT"@en, "alt" .',
        ]
        if k % 10 == 0:
            lines.append(f"ord:{k} p:bad _:-x .")
        conv_ids.append(f"o{k}")
        texts.append("\n".join(lines))
    return conv_ids, texts

conv_ids, texts = corpus(n_docs)
best = None
n_rows = 0
for _ in range(reps):
    t0 = time.perf_counter()
    out = parse_batch(conv_ids, texts)
    dt = time.perf_counter() - t0
    n_rows = len(out["conv_id"])
    best = dt if best is None else min(best, dt)
print(json.dumps({"sec": best, "rows": n_rows,
                  "docs_per_sec": round(n_docs / best, 1)}))
"""


def _ensure_worktree(name: str, rev: str) -> str:
    path = os.path.join(REPO, ".ab", name)
    if not os.path.isdir(os.path.join(path, "kgt")):
        os.makedirs(os.path.join(REPO, ".ab"), exist_ok=True)
        subprocess.run(
            ["git", "worktree", "add", "--detach", path, rev],
            cwd=REPO,
            check=True,
            capture_output=True,
        )
    return path


def _time_variant(root: str, n_docs: int, reps: int) -> dict:
    out = subprocess.run(
        [sys.executable, "-c", _RUNNER, root, str(n_docs), str(reps)],
        check=True,
        capture_output=True,
        text=True,
    )
    return json.loads(out.stdout.strip().splitlines()[-1])


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument(
        "--rev",
        action="append",
        default=[],
        help="name=gitrev to A/B against (worktree under .ab/)",
    )
    ap.add_argument("--docs", type=int, default=20000)
    ap.add_argument("--rounds", type=int, default=5)
    ap.add_argument("--reps", type=int, default=2, help="inner repeats, min taken")
    args = ap.parse_args()

    variants = []
    for spec in args.rev:
        name, _, rev = spec.partition("=")
        variants.append((name, _ensure_worktree(name, rev)))
    variants.append(("cur", REPO))

    results: dict[str, list[float]] = {name: [] for name, _ in variants}
    rows = {}
    for rnd in range(args.rounds):
        for name, root in variants:  # interleaved: same-minute conditions
            r = _time_variant(root, args.docs, args.reps)
            results[name].append(r["sec"])
            rows[name] = r["rows"]
            print(
                f"round {rnd} {name:>4}: {r['sec']:.3f} s "
                f"({r['docs_per_sec']:.0f} docs/s)",
                file=sys.stderr,
            )

    summary = {
        name: {
            "min_sec": round(min(secs), 4),
            "median_sec": round(sorted(secs)[len(secs) // 2], 4),
            "docs_per_sec": round(args.docs / min(secs), 1),
            "rows": rows[name],
        }
        for name, secs in results.items()
    }
    base = min(v["min_sec"] for v in summary.values())
    for name, v in summary.items():
        v["vs_best"] = round(v["min_sec"] / base, 3)
    print(json.dumps({"docs": args.docs, "rounds": args.rounds, "variants": summary}))


if __name__ == "__main__":
    main()
