"""Deterministic 10x scale-up of the driver's sf0.1 tables -> sf1.

The driver only ships sf{0.001,0.01,0.1}; the round-6 verdict asks for
scale EVIDENCE at 10x bench scale.  This script synthesises sf1 from
sf0.1 with structure-preserving copy transforms (seed-free, pure
functions of the copy index k = 0..9; copy 0 is the identity):

* dimensions `region`/`nation` stay fixed (TPC-H-style scaling);
* key columns shift by k * (table cardinality) so every FK join still
  resolves within its copy and group-key cardinality scales 10x;
* `documents.text` applies a per-copy BIJECTIVE token map
  (token -> token + "x{k}"): shingle equality -- and therefore the
  MinHash/SimHash/Jaccard near-dup pair structure -- is preserved
  EXACTLY within each copy, while cross-copy similarity collapses, so
  dup density per doc stays realistic instead of every doc gaining 9
  planted near-clones (which would make dedup timings O(copies^2)
  fiction);
* `embeddings.embedding` applies a per-copy fixed permutation + sign
  flip of dimensions: within-copy cosine is preserved exactly
  (orthogonal transform), cross-copy pairs decorrelate.

Usage: python scripts/make_sf1.py [outdir]   (default .bench_sf1)
"""

from __future__ import annotations

import re
import sys

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

SRC = "/root/testdata/sf0.1"
COPIES = 10

# key column -> stride (cardinality of the keyspace at sf0.1)
KEY_STRIDES = {
    "customer": {"c_custkey": 15_000},
    "supplier": {"s_suppkey": 1_000},
    "part": {"p_partkey": 20_000},
    "orders": {"o_orderkey": 600_000, "o_custkey": 15_000},
    "lineitem": {
        "l_orderkey": 600_000,
        "l_partkey": 20_000,
        "l_suppkey": 1_000,
    },
    "events": {"event_id": 1_000_000, "user_id": 100_000},
    "documents": {"doc_id": 100_000},
    "embeddings": {"vec_id": 100_000},
}

_TOKEN_RE = re.compile(r"(\s+)")


def _remap_text(text: str, k: int) -> str:
    suffix = f"x{k}"
    parts = _TOKEN_RE.split(text)
    # even indices are tokens, odd are the whitespace separators
    return "".join(
        p + suffix if i % 2 == 0 and p else p for i, p in enumerate(parts)
    )


def scale_table(name: str, outdir: str) -> int:
    src = pq.read_table(f"{SRC}/{name}.parquet")
    if name in ("region", "nation"):
        pq.write_table(src, f"{outdir}/{name}.parquet")
        return src.num_rows

    strides = KEY_STRIDES[name]
    for col, stride in strides.items():
        mx = pc.max(src[col]).as_py()
        if mx >= stride:
            raise AssertionError(
                f"{name}.{col} max {mx} >= stride {stride}; copies collide"
            )

    copies = []
    for k in range(COPIES):
        t = src
        for col, stride in strides.items():
            idx = t.schema.get_field_index(col)
            shifted = pc.add(t[col], pa.scalar(k * stride, t[col].type))
            t = t.set_column(idx, t.schema.field(col), shifted)
        if name == "customer" and k > 0:
            # c_name is key-derived ("Customer#%09d") — regenerate from
            # the shifted key, as a real 10x corpus would, instead of
            # leaving 10 verbatim copies of every name (which made the
            # fuzzy-link dictionary artificially 10x-duplicated and
            # inflated LSH candidates ~100x in the first sf1 run)
            ni = t.schema.get_field_index("c_name")
            names = pa.array(
                ["Customer#%09d" % v for v in t["c_custkey"].to_pylist()]
            )
            t = t.set_column(ni, t.schema.field("c_name"), names)
        if name == "supplier" and k > 0:
            ni = t.schema.get_field_index("s_name")
            names = pa.array(
                ["Supplier#%09d" % v for v in t["s_suppkey"].to_pylist()]
            )
            t = t.set_column(ni, t.schema.field("s_name"), names)
        if name == "documents" and k > 0:
            texts = t["text"].to_pylist()
            remapped_list = [_remap_text(x, k) for x in texts]
            remapped = pa.array(remapped_list, type=pa.string())
            ti = t.schema.get_field_index("text")
            t = t.set_column(ti, t.schema.field("text"), remapped)
            ni = t.schema.get_field_index("n_chars")
            n_chars = pa.array(
                [len(x) for x in remapped_list], type=pa.int64()
            )
            t = t.set_column(ni, t.schema.field("n_chars"), n_chars)
        if name == "embeddings" and k > 0:
            emb = t["embedding"].combine_chunks()
            dim = len(emb[0])
            mat = np.asarray(emb.flatten(), dtype=np.float32).reshape(
                -1, dim
            )
            rs = np.random.RandomState(1000 + k)
            perm = rs.permutation(dim)
            signs = rs.choice([-1.0, 1.0], size=dim).astype(np.float32)
            mat = mat[:, perm] * signs
            arr = pa.FixedSizeListArray.from_arrays(
                pa.array(mat.reshape(-1), type=pa.float32()), dim
            ).cast(pa.list_(pa.float32()))
            ei = t.schema.get_field_index("embedding")
            t = t.set_column(ei, t.schema.field("embedding"), arr)
        copies.append(t)
    out = pa.concat_tables(copies)
    pq.write_table(out, f"{outdir}/{name}.parquet")
    return out.num_rows


def main() -> None:
    import os

    outdir = sys.argv[1] if len(sys.argv) > 1 else ".bench_sf1"
    os.makedirs(outdir, exist_ok=True)
    for name in (
        "region nation customer supplier part orders lineitem events "
        "documents embeddings".split()
    ):
        n = scale_table(name, outdir)
        print(f"{name}: {n} rows")


if __name__ == "__main__":
    main()
