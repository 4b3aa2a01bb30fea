"""Time individual bench slots exactly like bench.py (fn().count(),
min of N samples). Usage:
  python scripts/slot_time.py [-nN] slot [slot ...]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    args = sys.argv[1:]
    n = 2
    if args and args[0].startswith("-n"):
        n = int(args[0][2:])
        args = args[1:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    from kgt.spark.session import get_spark

    import __spark_entry__ as entrymod

    spark = get_spark(
        "kgt-slot", cpus=int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    )
    spark.range(1000).count()
    qs = entrymod.bench_queries()
    for name in args:
        fn = qs[name]
        best = first = None
        for _ in range(n):
            t0 = time.perf_counter()
            rows = fn(spark, sf_dir).count()
            dt = time.perf_counter() - t0
            if first is None:
                first = dt
            best = dt if best is None else min(best, dt)
        print(f"{name:28s} best={best:7.3f}s first={first:7.3f}s rows={rows}")
    spark.stop()


if __name__ == "__main__":
    main()
