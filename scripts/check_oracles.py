"""Local stand-in for the driver's correctness gate.

Runs every queries() entry on Spark and its oracle_sql() on DuckDB over
the same sf dir, compares row count, column names, and an
order-insensitive value hash (rows sorted by their string form, columns
sorted by name). Usage:

    python scripts/check_oracles.py [sf_dir] [query ...]
"""

from __future__ import annotations

import hashlib
import os
import sys

import duckdb

# script-relative, not cwd-relative: the gate must import THIS repo's
# __spark_entry__ no matter where it's invoked from
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def norm_cell(v):
    """Type-TAGGED normalization. The driver's hash distinguishes value
    types (DuckDB HUGEINT arrives as Decimal/float64 via Arrow and
    hash-mismatches Spark's LongType even when numerically equal), so
    the local gate must be at least as strict: an int, a float, and a
    Decimal of the same value must hash differently here."""
    import datetime
    import decimal

    if v is None:
        return "∅"
    if isinstance(v, bool):
        return "b:" + ("true" if v else "false")
    if isinstance(v, int):
        return f"i:{v}"
    if isinstance(v, decimal.Decimal):
        return f"dec:{v}"
    if isinstance(v, float):
        return f"f:{repr(round(v, 9))}"
    if isinstance(v, datetime.datetime):
        return f"ts:{v.isoformat()}"
    if isinstance(v, datetime.date):
        return f"d:{v.isoformat()}"
    return str(v)


def table_hash(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    lines = sorted(
        "\x1f".join(norm_cell(r[i]) for i in order) for r in rows
    )
    h = hashlib.md5("\n".join(lines).encode()).hexdigest()
    return h


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    only = set(sys.argv[2:])

    import __spark_entry__ as entrymod
    from kgt.spark.session import get_spark

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    unknown = only - qs.keys()
    if unknown:
        # a typo'd name must not read as a green gate for a query that
        # was never checked — and fail before paying Spark startup
        print(f"unknown query name(s): {sorted(unknown)}")
        sys.exit(2)

    spark = get_spark("oracle-check", cpus=8)

    con = duckdb.connect()
    for t in (
        "region nation customer supplier part orders lineitem events "
        "documents embeddings".split()
    ):
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )

    n_pass = n_fail = n_rowsonly = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        try:
            df = fn(spark, sf_dir)
            cols = df.columns
            rows = [tuple(r) for r in df.collect()]
        except Exception as e:
            print(f"FAIL  {name}: spark error {type(e).__name__}: {e}")
            n_fail += 1
            continue
        if name not in oracles:
            print(f"rows  {name}: {len(rows)} rows (rows-only check)")
            n_rowsonly += 1
            continue
        try:
            # fetch through Arrow, like the driver: this is what exposes
            # DuckDB's HUGEINT widening as decimal128 instead of silently
            # converting to Python int
            tbl = con.execute(oracles[name]).arrow()
            ocols = tbl.column_names
            odicts = tbl.to_pylist()
            orows = [tuple(d[c] for c in ocols) for d in odicts]
        except Exception as e:
            print(f"FAIL  {name}: oracle error {e}")
            n_fail += 1
            continue
        problems = []
        if sorted(cols) != sorted(ocols):
            problems.append(f"cols {sorted(cols)} != {sorted(ocols)}")
        if len(rows) != len(orows):
            problems.append(f"rows {len(rows)} != {len(orows)}")
        if not problems:
            hs, ho = table_hash(cols, rows), table_hash(ocols, orows)
            if hs != ho:
                problems.append("value-hash mismatch")
                # show a few differing lines
                order_s = sorted(range(len(cols)), key=lambda i: cols[i])
                order_o = sorted(range(len(ocols)), key=lambda i: ocols[i])
                ls = sorted(
                    "\x1f".join(norm_cell(r[i]) for i in order_s) for r in rows
                )
                lo = sorted(
                    "\x1f".join(norm_cell(r[i]) for i in order_o) for r in orows
                )
                set_lo, set_ls = set(lo), set(ls)
                diff_s = [x for x in ls if x not in set_lo][:3]
                diff_o = [x for x in lo if x not in set_ls][:3]
                problems.append(f"spark-only: {diff_s}")
                problems.append(f"oracle-only: {diff_o}")
        if problems:
            print(f"FAIL  {name}: " + " | ".join(problems))
            n_fail += 1
        else:
            print(f"ok    {name}: {len(rows)} rows")
            n_pass += 1
    print(f"\n{n_pass} ok, {n_rowsonly} rows-only, {n_fail} FAIL")
    spark.stop()
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
