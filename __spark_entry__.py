"""Driver contract for the kgt engine.

``queries()`` exposes the engine's operators over the driver's parquet
tables; ``oracle_sql()`` gives the DuckDB-equivalent SQL for EVERY
query — since round 4 there are no rows-only entries: each of the
driver queries carries a full rows+schema+hash gate.

The kg_* family is the flagship: Turtle documents are DERIVED
deterministically from the orders/customer tables, split across
multi-turn transcripts, reassembled, and parsed by the full pipeline —
and the oracle constructs the exact expected triples (including md5
skolem labels) directly in SQL. Parser correctness is thus
oracle-checked end-to-end, not just row-counted.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import DataFrame, SparkSession, functions as F, Window as W

RDF_TYPE = "http://www.w3.org/1999/02/22-rdf-syntax-ns#type"
XSD_INT = "http://www.w3.org/2001/XMLSchema#integer"


# ---------------------------------------------------------------------
# helpers
# ---------------------------------------------------------------------

def _read(spark, sf_dir, name):
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def _fanout(df, *cols):
    """Hash-repartition to the session's core count so a downstream
    CPU-bound Python stage (mapInPandas codec/parse work) runs one task
    per core instead of inheriting the scan's input-split count.

    The driver's tables are single parquet files — ONE input split —
    so without this every mapInPandas chained directly onto a scan
    executes on a single core (the same pitfall reassemble() documents
    for the parse stage: a Python stage must be sized by rows/CPU, not
    bytes). The explicit numPartitions pins the exchange against AQE
    coalescing (the shuffled rows are bytes-small: ids + lengths);
    defaultParallelism tracks the cluster's core count, so the fan-out
    is scale-adaptive rather than a local[32] constant."""
    n = df.sparkSession.sparkContext.defaultParallelism
    return df.repartition(n, *(cols if cols else ("doc_id",)))


def _orders_extracted(spark, sf_dir, with_errors=False):
    from kgt.spark.parse import extract_triples
    from kgt.spark.transcripts import orders_transcripts

    return extract_triples(orders_transcripts(spark, sf_dir, with_errors=with_errors))


def _bnodes_extracted(spark, sf_dir):
    from kgt.spark.parse import extract_triples
    from kgt.spark.transcripts import customer_bnode_transcripts

    return extract_triples(customer_bnode_transcripts(spark, sf_dir))


import weakref as _weakref

_shingle_cache: "_weakref.WeakKeyDictionary" = _weakref.WeakKeyDictionary()
_sig_cache: "_weakref.WeakKeyDictionary" = _weakref.WeakKeyDictionary()
# working dirs of streaming_near_dup runs (previous run cleaned at the
# next invocation; the last at interpreter exit)
_stream_gate_dirs: list = []
# state-store bound metrics from the LAST streaming_near_dup run
# (bench.py reports them as extras: the measured evidence that state
# is live-buckets × ≤cap, not unbounded)
_stream_gate_metrics: dict = {}
_recovery_cache: "_weakref.WeakKeyDictionary" = _weakref.WeakKeyDictionary()


def collect_stream_gate_metrics(spark) -> dict:
    """State-bound metrics for the LAST streaming_near_dup run,
    measured on the persisted store via the Spark 4 state-store
    reader: rows == live buckets, members per bucket ≤ bucket_cap.
    Deliberately a separate call so the measurement scan is never
    billed to the timed bench slot (r7 review)."""
    ckpt = _stream_gate_metrics.get("_ckpt")
    if not ckpt:
        return {}
    try:
        st = spark.read.format("statestore").load(ckpt)
        agg = st.select(
            F.size("value.groupState.doc_ids").alias("n")
        ).agg(
            F.count("*"), F.max("n"), F.avg("n")
        ).first()
        return {
            "stream_state_buckets": int(agg[0]),
            "stream_state_max_docs_per_bucket": (
                int(agg[1]) if agg[1] is not None else 0
            ),
            "stream_state_avg_docs_per_bucket": (
                round(float(agg[2]), 2) if agg[2] is not None else 0.0
            ),
        }
    except Exception as e:
        # no-silent-caps: the round's "measured, not assumed" state
        # evidence must not vanish without a trace if the statestore
        # reader schema drifts — ship a marker instead of nothing
        return {"stream_state_error": f"{type(e).__name__}: {e}"[:200]}


def _recovery_extracted(spark, sf_dir):
    """The with_errors orders extraction, materialized ONCE per
    (session, sf_dir) — kg_recovery_quarantine and kg_recovery_triples
    consume the same parse (one wants the E rows, one the T rows), and
    without sharing each re-parses the full corpus. Same localCheckpoint
    pattern as `_dup_shingles`; at 100 TB this is the staged
    triples/errors table the lineage sink already persists."""
    per_session = _recovery_cache.get(spark)
    if per_session is None:
        per_session = _recovery_cache[spark] = {}
    df = per_session.get(sf_dir)
    if df is None:
        df = _orders_extracted(spark, sf_dir, with_errors=True).localCheckpoint(
            eager=False
        )
        per_session[sf_dir] = df
    return df


def _dup_shingles(spark, sf_dir):
    """Shingle table of the dup corpus, materialized ONCE
    (localCheckpoint): every dedup operator fans out into 3-4 consumers
    of the same shingle stream (signatures, self-join sides, sizes,
    df-cap), and without persistence each consumer rescans the corpus —
    measured 2.5× slower at sf0.1. At 100 TB you'd persist this table
    to storage; localCheckpoint is the single-job equivalent. Cached
    per (session, sf_dir) so the three dedup queries in one driver run
    share one materialization instead of three."""
    from kgt.textops.dedup import shingles

    # keyed by a WEAK session ref, not id(spark): CPython reuses ids
    # after GC, so a new session could alias a dead session's cached
    # checkpointed frames (review find); dead-session entries also
    # drop out instead of accumulating
    per_session = _shingle_cache.get(spark)
    if per_session is None:
        per_session = _shingle_cache[spark] = {}
    df = per_session.get(sf_dir)
    if df is None:
        df = shingles(_dup_corpus(spark, sf_dir)).localCheckpoint(eager=False)
        per_session[sf_dir] = df
    return df


def _dup_signatures(spark, sf_dir):
    """Banded MinHash signature table of the dup corpus, materialized
    ONCE per (session, sf_dir) — the same staged-intermediate pattern
    as `_dup_shingles`, one level up the pipeline: four queries
    (minhash_lsh, near_verified, clusters, corpus_keep + the suite
    variants) all start from the identical 32-hash/8-band signature
    aggregation, and without persistence each recomputes the 8-md5-
    per-shingle projection and the groupBy from the shingle stream.
    At 100 TB the signature table is persisted storage between the
    blocking and verify stages (the lineage sink's staged-table shape);
    localCheckpoint is the single-job equivalent."""
    from kgt.textops.dedup import minhash_signatures

    per_session = _sig_cache.get(spark)
    if per_session is None:
        per_session = _sig_cache[spark] = {}
    df = per_session.get(sf_dir)
    if df is None:
        df = minhash_signatures(
            _dup_shingles(spark, sf_dir), n_hashes=32, rows_per_band=4
        ).localCheckpoint(eager=False)
        per_session[sf_dir] = df
    return df


def _dup_corpus(spark, sf_dir):
    """documents ∪ near-duplicate mutants (doc_id%10==0, first word
    dropped, id+10^7) ∪ exact copies (doc_id%7==0, id+2·10^7) — gives
    every dedup operator true positives, reproducibly on both engines."""
    docs = _read(spark, sf_dir, "documents").select("doc_id", "text")
    mutants = docs.filter(F.col("doc_id") % 10 == 0).select(
        (F.col("doc_id") + 10_000_000).alias("doc_id"),
        F.regexp_replace("text", r"^\S+\s+", "").alias("text"),
    )
    copies = docs.filter(F.col("doc_id") % 7 == 0).select(
        (F.col("doc_id") + 20_000_000).alias("doc_id"), "text"
    )
    return docs.unionByName(mutants).unionByName(copies)


_DUP_CORPUS_SQL = """
    SELECT doc_id, text FROM documents
    UNION ALL
    SELECT doc_id + 10000000 AS doc_id,
           regexp_replace(text, '^\\S+\\s+', '') AS text
    FROM documents WHERE doc_id % 10 = 0
    UNION ALL
    SELECT doc_id + 20000000 AS doc_id, text
    FROM documents WHERE doc_id % 7 = 0
"""

# expected triples of the orders corpus, constructed directly in SQL
_ORDERS_TRIPLES_SQL = f"""
    WITH o AS (
      SELECT 'o' || CAST(o_orderkey AS VARCHAR) AS conv_id,
             '<urn:ord:' || CAST(o_orderkey AS VARCHAR) || '>' AS subj,
             CAST(o_custkey AS VARCHAR) AS ck,
             o_orderstatus AS st,
             CAST(CAST(FLOOR(o_totalprice) AS BIGINT) AS VARCHAR) AS cents,
             o_orderpriority AS prio
      FROM orders
    )
    SELECT conv_id, 0 AS stmt_idx, subj, '<{RDF_TYPE}>' AS pred,
           '<urn:p:Order>' AS obj FROM o
    UNION ALL SELECT conv_id, 1, subj, '<urn:p:cust>',
           '<urn:cust:' || ck || '>' FROM o
    UNION ALL SELECT conv_id, 2, subj, '<urn:p:status>',
           '"' || st || '"' FROM o
    UNION ALL SELECT conv_id, 3, subj, '<urn:p:total>',
           '"' || cents || '"^^<{XSD_INT}>' FROM o
    UNION ALL SELECT conv_id, 4, subj, '<urn:p:priority>',
           '"' || prio || '"@en' FROM o
    UNION ALL SELECT conv_id, 5, subj, '<urn:p:priority>',
           '"alt"' FROM o
"""

# expected triples of the customer bnode/collection corpus (md5 skolems)
_BNODES_TRIPLES_SQL = f"""
    WITH c AS (
      SELECT 'b' || CAST(c_custkey AS VARCHAR) AS conv_id,
             '<urn:cust:' || CAST(c_custkey AS VARCHAR) || '>' AS cust,
             CAST(CAST(FLOOR(c_acctbal) AS BIGINT) AS VARCHAR) AS bal,
             c_mktsegment AS seg, c_name AS name
      FROM customer
    ), s AS (
      SELECT *,
        '_:m' || md5('kgt1:' || conv_id || ':g0') AS g0,
        '_:m' || md5('kgt1:' || conv_id || ':g1') AS g1,
        '_:m' || md5('kgt1:' || conv_id || ':g2') AS g2,
        '_:m' || md5('kgt1:' || conv_id || ':g3') AS g3
      FROM c
    )
    SELECT conv_id, 0 AS stmt_idx, g0 AS subj, '<urn:p:bal>' AS pred,
           '"' || bal || '"^^<{XSD_INT}>' AS obj FROM s
    UNION ALL SELECT conv_id, 1, g0, '<urn:p:seg>', '"' || seg || '"' FROM s
    UNION ALL SELECT conv_id, 2, cust, '<urn:p:acct>', g0 FROM s
    UNION ALL SELECT conv_id, 3, g1,
           '<http://www.w3.org/1999/02/22-rdf-syntax-ns#first>', '"A"' FROM s
    UNION ALL SELECT conv_id, 4, g1,
           '<http://www.w3.org/1999/02/22-rdf-syntax-ns#rest>', g2 FROM s
    UNION ALL SELECT conv_id, 5, g2,
           '<http://www.w3.org/1999/02/22-rdf-syntax-ns#first>',
           '"' || name || '"' FROM s
    UNION ALL SELECT conv_id, 6, g2,
           '<http://www.w3.org/1999/02/22-rdf-syntax-ns#rest>', g3 FROM s
    UNION ALL SELECT conv_id, 7, g3,
           '<http://www.w3.org/1999/02/22-rdf-syntax-ns#first>', cust FROM s
    UNION ALL SELECT conv_id, 8, g3,
           '<http://www.w3.org/1999/02/22-rdf-syntax-ns#rest>',
           '<http://www.w3.org/1999/02/22-rdf-syntax-ns#nil>' FROM s
    UNION ALL SELECT conv_id, 9, cust, '<urn:p:tags>', g1 FROM s
"""

_SHINGLES_SQL = """
    SELECT doc_id, unnest(CASE WHEN len(w) >= 3 THEN
             list_distinct(list_transform(generate_series(1, len(w)-2),
               i -> array_to_string(w[i:i+2], ' ')))
           ELSE [array_to_string(w, ' ')] END) AS shingle
    FROM (SELECT doc_id,
                 string_split(trim(regexp_replace(lower(text), '\\s+', ' ', 'g')), ' ') AS w
          FROM corpus)
"""


# ---------------------------------------------------------------------
# queries
# ---------------------------------------------------------------------

def _q_kg_triples_orders(spark, sf_dir):
    from kgt.spark.parse import triples

    return triples(_orders_extracted(spark, sf_dir)).select(
        "conv_id", "stmt_idx", "subj", "pred", "obj"
    )


def _q_kg_triples_bnodes(spark, sf_dir):
    from kgt.spark.parse import triples

    return triples(_bnodes_extracted(spark, sf_dir)).select(
        "conv_id", "stmt_idx", "subj", "pred", "obj"
    )


def _q_kg_recovery_quarantine(spark, sf_dir):
    from kgt.spark.parse import errors

    return (
        errors(_recovery_extracted(spark, sf_dir))
        .select("conv_id")
        .distinct()
    )


def _q_kg_recovery_triples(spark, sf_dir):
    from kgt.spark.parse import triples

    return (
        triples(_recovery_extracted(spark, sf_dir))
        .groupBy("conv_id")
        .agg(F.count("*").alias("n_triples"))
    )


def _q_kg_stream_separators(spark, sf_dir):
    """Streaming-writer separator choice (streaming_writer.rb:27-40) as
    a window expression: ',' on repeated (subj, pred), ';' on repeated
    subj, 'new' otherwise."""
    from kgt.spark.parse import triples

    t = triples(_orders_extracted(spark, sf_dir))
    w = W.partitionBy("conv_id").orderBy("stmt_idx")
    return t.select(
        "conv_id",
        "stmt_idx",
        F.when(
            (F.lag("subj").over(w) == F.col("subj"))
            & (F.lag("pred").over(w) == F.col("pred")),
            ",",
        )
        .when(F.lag("subj").over(w) == F.col("subj"), ";")
        .otherwise("new")
        .alias("sep"),
    )


def _q_kg_refcounts(spark, sf_dir):
    """Writer preprocess ref-counts (writer.rb:408-451): how many times
    each term appears as object — drives inline-[...]-vs-label choice."""
    from kgt.spark.parse import triples

    t = triples(_bnodes_extracted(spark, sf_dir))
    return t.groupBy("obj").agg(F.count("*").alias("ref_count"))


def _q_kg_entity_links(spark, sf_dir):
    from kgt.spark.link import detect_mentions, link_mentions
    from kgt.spark.transcripts import orders_transcripts

    tx = orders_transcripts(spark, sf_dir)
    from kgt.spark.link import DEFAULT_AGENT_DICT

    dict_rows = [(sf, iri) for sf, iri, _k in DEFAULT_AGENT_DICT]
    iri_dict = spark.createDataFrame(dict_rows, "surface string, iri string")
    linked = link_mentions(detect_mentions(tx), iri_dict)
    return (
        linked.filter(F.col("kind").isin("role", "tool"))
        .groupBy("iri")
        .agg(F.count("*").alias("n_mentions"))
    )


def _q_kg_mention_triples(spark, sf_dir):
    """Detected+linked entities materialized AS TRIPLES (the north-star
    'entities are linked and triples are exploded' loop): distinct
    <urn:conv:C> <urn:kg:mentions> <iri> per conversation."""
    from kgt.spark.link import detect_mentions, link_mentions, mentions_to_triples
    from kgt.spark.transcripts import orders_transcripts

    tx = orders_transcripts(spark, sf_dir)
    from kgt.spark.link import DEFAULT_AGENT_DICT

    iri_dict = spark.createDataFrame(
        [(sf, iri) for sf, iri, _k in DEFAULT_AGENT_DICT],
        "surface string, iri string",
    )
    t = mentions_to_triples(link_mentions(detect_mentions(tx), iri_dict))
    return t.select("conv_id", "subj", "pred", "obj").distinct()


def _q_kg_ntriples_c14n(spark, sf_dir):
    """Canonical N-Triples document per conversation (sorted lines —
    the suite's C14N string-compare form)."""
    from kgt.spark.parse import triples
    from kgt.spark.write import canonical_ntriples

    return canonical_ntriples(triples(_orders_extracted(spark, sf_dir)))


def _q_kg_rdfstar(spark, sf_dir):
    """RDF-star annotations (reader.rb:406-460): each order's status
    triple is annotated {| p:src "oms" |} → asserted triple + an
    annotation triple whose subject is the quoted triple. Oracle
    constructs both, including the << >> NT encoding."""
    from kgt.spark.parse import parse_documents

    orders = _read(spark, sf_dir, "orders")
    key = F.col("o_orderkey").cast("string")
    doc = F.concat(
        F.lit("@prefix p: <urn:p:> .\n<urn:ord:"),
        key,
        F.lit('> p:status "'),
        F.col("o_orderstatus"),
        F.lit('" {| p:src "oms" |} .\n'),
    )
    docs = _fanout(
        orders.select(
            F.concat(F.lit("s"), key).alias("conv_id"), doc.alias("text")
        ),
        "conv_id",
    )
    out = parse_documents(docs, rdfstar=True)
    return out.filter(F.col("kind") == "T").select(
        "conv_id", "stmt_idx", "subj", "pred", "obj", "is_quoted"
    )


def _q_kg_fuzzy_link(spark, sf_dir):
    """Banded MinHash-LSH fuzzy entity linking, oracle-checked
    end-to-end, with the anti-join-first flow the linking module
    documents: the surface stream mixes exact customer names (which the
    broadcast dictionary join links directly) with misspelled ones
    (first char dropped); only the UNLINKED tail reaches the LSH stage,
    where char-4-gram banded minhash blocking (8 bands × 3 rows,
    S-curve threshold = the 0.5 jaccard gate) feeds exact Jaccard ≥ 0.5
    inside the candidate set, best match per surface. Grams shared by
    >20% of the dictionary (the constant 'Customer#0…' prefix) are
    df-capped out of the universe — TPC-H names are the ID-like worst
    case where common grams both flood the LSH buckets and drown the
    jaccard signal. The cap is the LAZY fractional form (max_df_frac):
    the dictionary count rides inside the plan as a broadcast scalar,
    so building this DataFrame costs no eager Spark job."""
    from kgt.spark.link import fuzzy_link, link_mentions

    cust = _read(spark, sf_dir, "customer")
    exact = cust.filter(F.col("c_custkey") % 3 == 0).select(
        F.col("c_name").alias("surface")
    )
    typos = cust.select(
        F.regexp_replace("c_name", "^.", "").alias("surface")
    )
    iri_dict = cust.select(
        F.col("c_name").alias("surface"),
        F.concat(
            F.lit("urn:cust:"), F.col("c_custkey").cast("string")
        ).alias("iri"),
    )
    linked = link_mentions(exact.unionByName(typos), iri_dict)
    unlinked = linked.filter(F.col("iri").isNull()).select("surface")
    return fuzzy_link(
        unlinked,
        iri_dict,
        n_hashes=24,
        rows_per_band=3,
        min_jaccard=0.5,
        max_df_frac=0.2,
        # q=4: the digit-span gram universe (10⁴) must exceed the
        # dictionary cardinality or candidates go quadratic in |dict| —
        # measured 65 → 654 candidates/link at q=3 going sf0.1 → sf1
        # (15k → 150k names). q=4 holds the ratio flat to ~1M entries.
        gram_size=4,
    )


def _q_kg_streaming_writer(spark, sf_dir):
    """O(1) streaming Turtle writer as window functions — one doc per
    conversation (streaming_writer.rb:27-40 semantics)."""
    from kgt.spark.parse import triples
    from kgt.spark.write import streaming_turtle

    return streaming_turtle(triples(_orders_extracted(spark, sf_dir)))


_PNAME_PREFIXES = {
    "p": "urn:p:",
    "u": "urn:",
    "rdf": "http://www.w3.org/1999/02/22-rdf-syntax-ns#",
}


def _q_kg_pname(spark, sf_dir):
    """Writer get_pname (longest-prefix match, writer.rb:207-246) over
    the distinct predicates+objects of the orders graph."""
    from kgt.spark.parse import triples
    from kgt.spark.write import pname_terms

    t = triples(_orders_extracted(spark, sf_dir))
    terms = (
        t.select(F.col("pred").alias("term"))
        .unionByName(
            t.filter(F.col("obj").startswith("<")).select(
                F.col("obj").alias("term")
            )
        )
        .distinct()
    )
    return pname_terms(terms, "term", _PNAME_PREFIXES)


def _q_kg_dict_links(spark, sf_dir):
    """The north-star dictionary loop end-to-end: build the shared
    canonicalization dictionary from the DIMENSION tables (nation +
    region + constant agent rows), detect free-text surface mentions
    with one vectorized regex, broadcast-link, aggregate per IRI.
    Oracle reconstructs the counts relationally."""
    from kgt.spark.link import build_iri_dictionary, link_mentions

    nation = _read(spark, sf_dir, "nation")
    region = _read(spark, sf_dir, "region")
    iri_dict = build_iri_dictionary(
        nation.select(
            F.col("n_name").alias("surface"),
            F.concat(
                F.lit("urn:nation:"), F.col("n_nationkey").cast("string")
            ).alias("iri"),
            F.lit("nation").alias("kind"),
        ),
        region.select(
            F.col("r_name").alias("surface"),
            F.concat(
                F.lit("urn:region:"), F.col("r_regionkey").cast("string")
            ).alias("iri"),
            F.lit("region").alias("kind"),
        ),
        spark.createDataFrame(
            [("user", "urn:agent:user", "agent")],
            "surface string, iri string, kind string",
        ),
    )
    # corpus: each order's shipping line mentions the customer's nation
    orders = _read(spark, sf_dir, "orders")
    cust = _read(spark, sf_dir, "customer")
    nat = nation.select("n_nationkey", "n_name")
    lines = (
        orders.join(cust, orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nat), cust.c_nationkey == nat.n_nationkey)
        .select(
            F.concat(F.lit("d"), F.col("o_orderkey").cast("string")).alias(
                "conv_id"
            ),
            F.concat(
                F.lit("route to "), F.col("n_name"), F.lit(" .")
            ).alias("text"),
        )
    )
    mentions = lines.select(
        "conv_id",
        F.regexp_extract("text", r"route to (.+?) \.", 1).alias("surface"),
    )
    linked = link_mentions(mentions, iri_dict)
    return (
        linked.filter(F.col("iri").isNotNull())
        .groupBy("iri")
        .agg(F.count("*").alias("n_links"))
    )


def _q_nt_fastpath(spark, sf_dir):
    """Columnar freebase-style fast path (zero Python): N-Triples+pnames
    docs derived from lineitem, parsed with pure Catalyst expressions
    (kgt.spark.fastpath; template freebase_reader.rb §2.6)."""
    from kgt.spark.fastpath import parse_fastpath

    li = _read(spark, sf_dir, "lineitem")
    key = F.concat(
        F.col("l_orderkey").cast("string"),
        F.lit("_"),
        F.col("l_linenumber").cast("string"),
    )
    doc = F.concat(
        F.lit("@prefix li: <urn:li:> .\n@prefix p: <urn:p:> .\n"),
        F.lit("li:"), key, F.lit(" a p:Line .\n"),
        F.lit("li:"), key, F.lit(" p:qty "),
        F.col("l_quantity").cast("long").cast("string"), F.lit(" .\n"),
        F.lit("li:"), key, F.lit(' p:flag "'),
        F.col("l_returnflag"), F.lit('" .\n'),
        F.lit("li:"), key, F.lit(" p:part li:part_"),
        F.col("l_partkey").cast("string"), F.lit(" .\n"),
    )
    docs = li.select(
        F.concat(F.lit("n"), key).alias("conv_id"), doc.alias("text")
    )
    out = parse_fastpath(docs)
    return out.filter(F.col("kind") == "T").select(
        "conv_id", "stmt_idx", "subj", "pred", "obj"
    )


def _q1_pricing_summary(spark, sf_dir):
    li = _read(spark, sf_dir, "lineitem")
    cents = lambda c: F.round(F.col(c) * 100).cast("long")  # noqa: E731
    return (
        li.filter(F.col("l_shipdate") <= "1998-09-02")
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum(F.col("l_quantity").cast("long")).alias("sum_qty"),
            F.sum(cents("l_extendedprice")).alias("sum_base_cents"),
            F.sum(
                F.round(
                    F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100
                ).cast("long")
            ).alias("sum_disc_cents"),
            F.count("*").alias("count_order"),
        )
        .withColumn(
            "avg_qty", F.round(F.col("sum_qty") / F.col("count_order"), 4)
        )
    )


def _q3_top_orders(spark, sf_dir):
    cust = _read(spark, sf_dir, "customer").filter(
        F.col("c_mktsegment") == "BUILDING"
    )
    orders = _read(spark, sf_dir, "orders")
    li = _read(spark, sf_dir, "lineitem")
    rev = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .groupBy("l_orderkey")
        .agg(
            F.sum(
                F.round(
                    F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100
                ).cast("long")
            ).alias("revenue_cents")
        )
        .orderBy(F.col("revenue_cents").desc(), F.col("l_orderkey").asc())
        .limit(10)
    )
    return rev


def _q_kg_canonicalize(spark, sf_dir):
    """Opt-in canonicalization (reader.rb canonicalize matrix): messy
    lexicals ('+0'-padded integers, upper-case lang tags) parse to
    canonical forms. Docs built inline from orders; oracle constructs
    the canonical triples directly."""
    from kgt.spark.parse import parse_documents

    orders = _read(spark, sf_dir, "orders")
    key = F.col("o_orderkey").cast("string")
    doc = F.concat(
        F.lit("@prefix p: <urn:p:> .\n<urn:ord:"),
        key,
        F.lit("> p:total +0"),
        F.floor("o_totalprice").cast("long").cast("string"),
        F.lit(' ; p:prio "'),
        F.col("o_orderpriority"),
        F.lit('"@EN .\n'),
    )
    docs = _fanout(
        orders.select(
            F.concat(F.lit("k"), key).alias("conv_id"), doc.alias("text")
        ),
        "conv_id",
    )
    out = parse_documents(docs, canonicalize=True)
    return out.filter(F.col("kind") == "T").select(
        "conv_id", "stmt_idx", "subj", "pred", "obj"
    )


def _q_kg_pretty_writer(spark, sf_dir):
    """Reference pretty writer per conversation (applyInPandas):
    round-trip pinned in tests AND a full-text hash gate here — the
    oracle string-assembles the expected document per conversation, so
    every emitted byte (prefix block, subject grouping, ';' layout) is
    driver-checked, not just row counts."""
    from kgt.spark.parse import triples
    from kgt.spark.write import pretty_turtle

    t = triples(_bnodes_extracted(spark, sf_dir))
    return pretty_turtle(t, prefixes={"p": "urn:p:", "c": "urn:cust:"})


def _q_kg_pretty_nested(spark, sf_dir):
    """Second pretty-writer hash gate: NESTED bnode property lists
    (two levels) plus two collections per subject, derived from
    supplier — pins the deeper recursion of the layout algorithm
    (indent stacking, ';' placement inside nested [ ], list rendering
    at both nesting depths, alphabetical property sort at each level)
    that the bnodes-corpus gate can't see."""
    from kgt.spark.parse import parse_documents, triples
    from kgt.spark.write import pretty_turtle

    sup = _read(spark, sf_dir, "supplier")
    key = F.col("s_suppkey").cast("string")
    doc = F.concat(
        F.lit("@prefix p: <urn:p:> .\n@prefix s: <urn:supp:> .\n"),
        F.lit("s:"), key,
        F.lit(' p:info [ p:contact [ p:name "'), F.col("s_name"),
        F.lit('" ; p:bal '), F.floor("s_acctbal").cast("long").cast("string"),
        F.lit(' ] ; p:tags ("x" "n'), F.col("s_nationkey").cast("string"),
        F.lit('") ] ; p:alts ("a" "b") .\n'),
    )
    docs = _fanout(
        sup.select(
            F.concat(F.lit("sp"), key).alias("conv_id"), doc.alias("text")
        ),
        "conv_id",
    )
    t = triples(parse_documents(docs))
    return pretty_turtle(t, prefixes={"p": "urn:p:", "s": "urn:supp:"})


def _q5_region_revenue(spark, sf_dir):
    """5-table star join: broadcast the dimension chain, shuffle only
    the fact tables."""
    region = _read(spark, sf_dir, "region")
    nation = _read(spark, sf_dir, "nation")
    cust = _read(spark, sf_dir, "customer")
    orders = _read(spark, sf_dir, "orders")
    li = _read(spark, sf_dir, "lineitem")
    dims = F.broadcast(
        region.join(nation, region.r_regionkey == nation.n_regionkey)
    )
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(dims, cust.c_nationkey == dims.n_nationkey)
        .groupBy("r_name", "n_name")
        .agg(
            F.sum(
                F.round(
                    F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100
                ).cast("long")
            ).alias("revenue_cents"),
            F.count("*").alias("n_items"),
        )
    )


def _q_supplier_topk_per_nation(spark, sf_dir):
    """Top-3 suppliers by account balance per nation (window top-k)."""
    sup = _read(spark, sf_dir, "supplier")
    w = W.partitionBy("s_nationkey").orderBy(
        F.col("bal_cents").desc(), F.col("s_suppkey").asc()
    )
    return (
        sup.withColumn(
            "bal_cents", F.round(F.col("s_acctbal") * 100).cast("long")
        )
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= 3)
        .select("s_nationkey", "s_suppkey", "bal_cents", "rank")
    )


def _q_events_windowed(spark, sf_dir):
    """Tumbling 1-hour window aggregation over the event stream (the
    batch shape of the streaming windowed agg)."""
    ev = _read(spark, sf_dir, "events")
    return (
        ev.groupBy(
            F.window("ts", "1 hour").getField("start").alias("hour_start"),
            "event_type",
        )
        .agg(
            F.count("*").alias("n"),
            F.sum(F.round(F.col("value") * 100).cast("long")).alias(
                "value_cents"
            ),
        )
    )


def _q_part_projection(spark, sf_dir):
    """Filter+projection pushdown demo over part (plan check: scan reads
    only 2 columns and carries PushedFilters)."""
    part = _read(spark, sf_dir, "part")
    # no column fallback: the oracle hardcodes p_size, so a missing
    # column must fail fast here (unresolved column) instead of
    # silently projecting something else into a hash mismatch
    return (
        part.select("p_partkey", F.col("p_size").alias("size_attr"))
        .filter(F.col("p_partkey") % 10 == 3)
    )


def _q_lineitem_pivot(spark, sf_dir):
    """Pivot (groupBy+pivot → one column per linestatus) with exact
    cent sums; oracle expresses the same as conditional aggregation."""
    li = _read(spark, sf_dir, "lineitem")
    cents = F.round(F.col("l_extendedprice") * 100).cast("long")
    out = (
        li.groupBy("l_returnflag")
        .pivot("l_linestatus", ["O", "F", "P"])
        .agg(F.sum(cents))
    )
    return out.select(
        "l_returnflag",
        F.coalesce("O", F.lit(0)).alias("o_cents"),
        F.coalesce("F", F.lit(0)).alias("f_cents"),
        F.coalesce("P", F.lit(0)).alias("p_cents"),
    )


def _q_orders_distinct_customers(spark, sf_dir):
    """Distinct aggregation family: exact countDistinct + count per
    order status."""
    o = _read(spark, sf_dir, "orders")
    return o.groupBy("o_orderstatus").agg(
        F.countDistinct("o_custkey").alias("n_customers"),
        F.count("*").alias("n_orders"),
    )


def _q_lineitem_cube(spark, sf_dir):
    """CUBE grouping sets over (returnflag, linestatus) — subtotal and
    grand-total rows with exact cent sums."""
    li = _read(spark, sf_dir, "lineitem")
    cents = F.round(F.col("l_extendedprice") * 100).cast("long")
    return li.cube("l_returnflag", "l_linestatus").agg(
        F.sum(cents).alias("sum_cents"), F.count("*").alias("n")
    )


def _q_events_sessionize(spark, sf_dir):
    ev = _read(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    # integer microseconds, NOT unix_timestamp: whole-second truncation
    # mislabeled a 1799.34 s gap as a session boundary at sf0.1 (real
    # session_window compares full-precision timestamps; the oracle's
    # epoch_us is the same exact integer)
    # ts is TIMESTAMP_NTZ; the cast to TIMESTAMP is exact under the
    # session's pinned UTC zone (session.py), which unix_micros needs
    us = F.unix_micros(F.col("ts").cast("timestamp"))
    us_prev = F.unix_micros(F.lag("ts").over(w).cast("timestamp"))
    gap = us - us_prev
    sess = (
        ev.withColumn(
            "new_sess",
            # >= : session_window semantics (half-open [start, last+gap))
            F.when(gap.isNull() | (gap >= 1800 * 1_000_000), 1).otherwise(
                0
            ),
        )
        .withColumn(
            "sess_id",
            F.sum("new_sess").over(
                w.rowsBetween(W.unboundedPreceding, 0)
            ),
        )
    )
    return sess.groupBy("user_id").agg(
        F.max("sess_id").alias("n_sessions"),
        F.count("*").alias("n_events"),
    )


def _q_dedup_exact(spark, sf_dir):
    from kgt.textops.dedup import exact_duplicates

    return exact_duplicates(_dup_corpus(spark, sf_dir))


def _q_dedup_minhash_lsh(spark, sf_dir):
    """Banded MinHash LSH: 32 hashes in 8 bands × 4 rows — a candidate
    pair must agree on a whole band, so low-similarity pairs are
    suppressed exponentially (vs r=1 banding's linear collision rate)."""
    from kgt.textops.dedup import lsh_candidate_pairs

    return lsh_candidate_pairs(_dup_signatures(spark, sf_dir))


def _q_dedup_ngram_jaccard(spark, sf_dir):
    from kgt.textops.dedup import ngram_jaccard_pairs

    sh = _dup_shingles(spark, sf_dir)
    return ngram_jaccard_pairs(sh, threshold=0.6, max_df=1000)


def _q_dedup_near_verified(spark, sf_dir):
    """The canonical near-dup pipeline end-to-end: banded-LSH blocking
    feeds exact Jaccard verification — candidates ∩ (jaccard ≥ 0.6).
    At 100 TB this is THE shape: the exact self-join only ever runs
    inside LSH candidate pairs."""
    from kgt.textops.dedup import (
        lsh_candidate_pairs,
        ngram_jaccard_pairs,
    )

    sh = _dup_shingles(spark, sf_dir)
    cands = lsh_candidate_pairs(_dup_signatures(spark, sf_dir))
    return ngram_jaccard_pairs(sh, threshold=0.6, candidates=cands, max_df=1000)


def _q_dedup_clusters(spark, sf_dir):
    """Near-dup CLUSTERING end-to-end: banded-LSH blocking → exact
    Jaccard verify → connected components (iterative min-label
    propagation) — (doc_id, comp) with comp = the cluster's canonical
    representative (min id), i.e. the keep/drop decision table. The
    oracle computes the same fixpoint with a recursive CTE."""
    from kgt.textops.dedup import (
        connected_components,
        lsh_candidate_pairs,
        ngram_jaccard_pairs,
    )

    sh = _dup_shingles(spark, sf_dir)
    cands = lsh_candidate_pairs(_dup_signatures(spark, sf_dir))
    pairs = ngram_jaccard_pairs(sh, threshold=0.6, candidates=cands, max_df=1000)
    return connected_components(pairs)


def _q_dedup_clusters_star(spark, sf_dir):
    """Same clustering fixpoint as dedup_clusters, computed by the
    large-star/small-star edge-contraction variant (O(log n) rounds on
    chains, the 100-TB skew shape) instead of min-label propagation —
    both implementations must land on the identical (doc_id, comp)
    table, so this shares dedup_clusters' recursive-CTE oracle and the
    driver hash-gates their agreement end-to-end."""
    from kgt.textops.dedup import (
        connected_components,
        lsh_candidate_pairs,
        ngram_jaccard_pairs,
    )

    sh = _dup_shingles(spark, sf_dir)
    cands = lsh_candidate_pairs(_dup_signatures(spark, sf_dir))
    pairs = ngram_jaccard_pairs(sh, threshold=0.6, candidates=cands, max_df=1000)
    return connected_components(pairs, algorithm="star")


def _q_corpus_keep(spark, sf_dir):
    """The training-data GATE, composed end-to-end: every document gets
    (quality, dup_drop, keep) where dup_drop marks non-representative
    members of near-dup clusters (LSH → Jaccard → components, min-id
    representative survives) and keep = quality ≥ 0.67 AND NOT dup_drop
    — the decision table a corpus-curation pipeline materializes."""
    from kgt.textops.dedup import (
        connected_components,
        lsh_candidate_pairs,
        ngram_jaccard_pairs,
    )
    from kgt.textops.quality import quality_score

    corpus = _dup_corpus(spark, sf_dir)
    sh = _dup_shingles(spark, sf_dir)
    pairs = ngram_jaccard_pairs(
        sh,
        threshold=0.6,
        candidates=lsh_candidate_pairs(_dup_signatures(spark, sf_dir)),
        max_df=1000,
    )
    comps = connected_components(pairs)
    dropped = comps.filter(F.col("comp") != F.col("doc_id")).select(
        "doc_id", F.lit(True).alias("_dd")
    )
    q = quality_score(corpus).select("doc_id", "quality")
    return (
        q.join(dropped, "doc_id", "left")
        .select(
            "doc_id",
            "quality",
            F.coalesce(F.col("_dd"), F.lit(False)).alias("dup_drop"),
        )
        .withColumn(
            "keep", (F.col("quality") >= 0.67) & ~F.col("dup_drop")
        )
    )


def _q_dedup_simhash(spark, sf_dir):
    """md5-derived SimHash (two 32-bit halves) with 4×16-bit chunk
    blocking — lossless for hamming ≤ 3 — and a bucket-size cap.
    Fully SQL-expressible, so oracle-checked (was rows-only in r1)."""
    from kgt.textops.dedup import simhash64, simhash_near_pairs

    return simhash_near_pairs(
        simhash64(_dup_corpus(spark, sf_dir)), max_hamming=3, bucket_cap=10000
    )


def _dup_embeddings(spark, sf_dir):
    """The embedding dup corpus dedup_embedding joins: embeddings ∪
    exact copies (id%5, +10^6) ∪ one-component perturbations (id%7,
    +2·10^6, first component ×1.1 — cosine just under 1). Shared with
    bench.py's cell-size audit so the audit describes the SAME corpus
    and the same auto n_cells the gated query runs under."""
    emb = _read(spark, sf_dir, "embeddings")
    v = F.transform(F.col("embedding"), lambda x: x.cast("double"))
    base = emb.select("vec_id", v.alias("embedding"))
    copies = base.filter(F.col("vec_id") % 5 == 0).select(
        (F.col("vec_id") + 1_000_000).alias("vec_id"), "embedding"
    )
    pert = base.filter(F.col("vec_id") % 7 == 0).select(
        (F.col("vec_id") + 2_000_000).alias("vec_id"),
        F.concat(
            F.array(F.element_at("embedding", 1) * 1.1),
            F.slice("embedding", 2, 100000),
        ).alias("embedding"),
    )
    return base.unionByName(copies).unionByName(pert)


def _q_dedup_embedding(spark, sf_dir):
    """Embedding-cosine near-dup with IVF cell blocking: the corpus is
    embeddings ∪ exact copies (id%5, +10^6) ∪ one-component
    perturbations (id%7, +2·10^6 — first component ×1.1, cosine just
    under 1), every vector multi-probes its 2 nearest Voronoi cells,
    and exact cosine runs only inside cells. Round 6: the cell count is
    the AUTO rule (auto_n_cells ≈ √N, clamped [16, 65536]) instead of a
    static 16 — the oracle computes the same LIMIT from its own corpus
    count (FLOOR(SQRT(count)) ≡ Python isqrt for these magnitudes,
    parity-swept in tests) — and hot cells beyond cell_cap=100000 are
    quarantined on both engines. Oracle mirrors the seed quantizer,
    probing, and rounding bit-for-bit."""
    from kgt.textops.similarity import embedding_near_pairs

    corpus = _dup_embeddings(spark, sf_dir)
    # assign='join': the broadcast-centroid assignment (the >256-cell
    # scale path) measured 2.3× faster than the literal expression
    # even at ~50 auto cells for this self-join shape (8.9 → 3.9 s at
    # sf0.1, identical 744 pairs) — the driver gate now runs the same
    # path a 100-TB corpus would
    return embedding_near_pairs(
        corpus, threshold=0.9, n_cells=None, nprobe=2, assign="join"
    )


def _q_sim_topk(spark, sf_dir):
    from kgt.textops.similarity import brute_force_topk

    emb = _read(spark, sf_dir, "embeddings")
    return brute_force_topk(emb, emb.filter(F.col("vec_id") < 8), k=5)


def _q_sim_topk_ivf(spark, sf_dir):
    """IVF ANN with real Voronoi cells (16 deterministic seed
    centroids, nprobe=2): queries probe 2 cells, equi-join on cid. The
    k-means-trained variant is pinned in tests (recall@k vs brute
    force); the oracle uses the seed quantizer so DuckDB reproduces the
    exact cells. assign='join': the broadcast-centroid assignment
    measured 2.3× faster than the literal-expression path even at 16
    cells for the full-corpus base side (3.4 → 1.5 s at sf0.1,
    identical 40 rows — the same crossover dedup_embedding hit in r7:
    the O(n_cells)-ary ranking expression is interpreter-bound, and
    here EVERY base vector evaluates it), so the driver gate now runs
    the path a 100-TB corpus would; the literal path stays gated by
    sim_topk_ivf_trained + the path-agreement tests."""
    from kgt.textops.similarity import ivf_topk

    emb = _read(spark, sf_dir, "embeddings")
    return ivf_topk(emb, emb.filter(F.col("vec_id") < 8), k=5, assign="join")


def _q_sim_topk_ivf_join(spark, sf_dir):
    """IVF ANN at 300 cells — past the literal/join crossover
    (literal_max_cells=256), so cell assignment runs the SCALE path
    end-to-end under the oracle: centroids ride a broadcast join, the
    per-vector cell choice is a map-side-combined top-cell reduce (the
    shuffle carries N rows, never N·C), and the codegen expression
    stays constant-size where the literal path would inline a
    300-way expression tree. Same rounded-cosine cell ordering as the
    literal path (bit-identical sims, pinned in tests), so the oracle
    only changes the seed LIMIT."""
    from kgt.textops.similarity import ivf_topk

    emb = _read(spark, sf_dir, "embeddings")
    return ivf_topk(
        emb,
        emb.filter(F.col("vec_id") < 8),
        k=5,
        n_cells=300,
        nprobe=2,
        assign="join",
    )


def _q_sim_topk_ivf_trained(spark, sf_dir):
    """IVF ANN over TRAINED cells, end-to-end under the oracle: two
    deterministic Lloyd's iterations (train_centroids_det — quantized
    integer centroid updates, so the training itself is bit-
    reproducible in SQL), then the same literal-path probe/join as
    sim_topk_ivf. The oracle unrolls both training iterations as CTEs,
    so a drifting assignment rank, a wrong mean, or a float summation-
    order dependence all hash-fail."""
    from kgt.textops.similarity import ivf_topk, train_centroids_det

    emb = _read(spark, sf_dir, "embeddings")
    cents = train_centroids_det(emb, n_cells=16, n_iter=2)
    return ivf_topk(emb, emb.filter(F.col("vec_id") < 8), k=5, centroids=cents)


def _q_dedup_spans(spark, sf_dir):
    """Substring-level duplication profile (dedup.duplicated_spans —
    the k-gram fingerprint form of Lee et al. 2022's suffix-array
    dedup) over the dup corpus: exact copies push dup_ratio to 1.0,
    near-dup mutants share most windows, unique docs sit at their
    corpus-boilerplate floor. Oracle rebuilds the windows with
    generate_series + substr and counts the RAW window text (ground
    truth), so Spark's 8-byte xxhash64 fingerprinting must agree
    exactly — a collision would hash-fail."""
    from kgt.textops.dedup import duplicated_spans

    return duplicated_spans(_dup_corpus(spark, sf_dir), k=30)


def _q_doc_unigram_logprob(spark, sf_dir):
    """Corpus-trained unigram LM scoring (quality.unigram_logprob):
    vocabulary counts + per-occurrence ln(count/N) averages, the
    CCNet-style likelihood filter's oracle-checkable core. Fully
    SQL-expressible — the DuckDB twin retrains the same counts."""
    from kgt.textops.quality import unigram_logprob

    return unigram_logprob(_read(spark, sf_dir, "documents"))


def _q_doc_langid(spark, sf_dir):
    from kgt.textops.quality import language_id

    return language_id(_read(spark, sf_dir, "documents"))


def _q_doc_token_count(spark, sf_dir):
    from kgt.textops.quality import token_count

    return token_count(_read(spark, sf_dir, "documents"))


def _q_doc_quality(spark, sf_dir):
    from kgt.textops.quality import quality_score

    return quality_score(_read(spark, sf_dir, "documents"))


def _q_doc_fingerprint(spark, sf_dir):
    from kgt.textops.quality import fingerprint

    return fingerprint(_read(spark, sf_dir, "documents"))


def _q_multimodal_decode(spark, sf_dir):
    from kgt.textops.multimodal import decode_features, to_media

    # no _fanout here: the fake decode is byte-slicing (~0.3 s for the
    # whole slot), so the extra text-column shuffle has nothing to buy
    # back — fan-out only pays where the Python stage is the cost (the
    # real codec slots); A/B at sf0.1 showed no win on the fake paths
    return decode_features(to_media(_read(spark, sf_dir, "documents")), fake=True)


def _q_multimodal_decode_real(spark, sf_dir):
    """The REAL codec path under the oracle (fake=False): per doc a
    deterministic RGB image — dims from text length, pixel
    i = (doc_id·31+i) mod 256 — is ENCODED in one mapInPandas stage
    and DECODED in a second, with the CODEC chosen by doc_id % 5:
    PNG (from-scratch stdlib: IHDR/IDAT/IEND, zlib, CRC32, scanline
    unfilter), TIFF uncompressed strips, TIFF PackBits strips,
    TIFF LZW strips with the horizontal predictor, or TIFF deflate
    strips (round 7; compression 8, stdlib zlib inflate + predictor 2)
    (kgt/textops/tiff.py decode_pixels — MSB-first LZW, early width
    change; rows_per_strip=8
    so multi-strip assembly is exercised); the decoder sniffs the
    signature. The oracle reproduces dims and the pixel-byte sum
    arithmetically (generate_series) — codec-independent, so every
    branch must land on identical pixels: a mis-parsed chunk, broken
    inflate/unfilter, bad strip geometry or PackBits run mis-decode
    all hash-fail."""
    import pandas as pd

    from kgt.textops.multimodal import decode_png, encode_png
    from kgt.textops.tiff import decode_pixels as decode_tiff
    from kgt.textops.tiff import encode_tiff, is_tiff

    docs = _fanout(
        _read(spark, sf_dir, "documents").select(
            "doc_id", F.length("text").alias("L")
        )
    )

    def enc(batches):
        for pdf in batches:
            payloads = []
            for doc_id, L in zip(pdf["doc_id"], pdf["L"]):
                w = int(L) % 40 + 1
                h = (int(L) * 7) % 40 + 1
                px = bytes(
                    (int(doc_id) * 31 + i) % 256 for i in range(w * h * 3)
                )
                sel = int(doc_id) % 5
                if sel == 0:
                    payloads.append(encode_png(w, h, px, color_type=2))
                elif sel == 1:
                    payloads.append(
                        encode_tiff(w, h, px, compression=1, rows_per_strip=8)
                    )
                elif sel == 2:
                    payloads.append(
                        encode_tiff(
                            w, h, px, compression=32773, rows_per_strip=8,
                            big_endian=True,
                        )
                    )
                elif sel == 3:
                    payloads.append(
                        encode_tiff(
                            w, h, px, compression=5, rows_per_strip=8,
                            predictor=2,
                        )
                    )
                else:
                    payloads.append(
                        encode_tiff(
                            w, h, px, compression=8, rows_per_strip=8,
                            predictor=2,
                        )
                    )
            yield pd.DataFrame(
                {"doc_id": pdf["doc_id"], "payload": payloads}
            )

    media = docs.mapInPandas(enc, schema="doc_id long, payload binary")

    def dec(batches):
        for pdf in batches:
            recs = []
            for doc_id, p in zip(pdf["doc_id"], pdf["payload"]):
                p = bytes(p)
                if is_tiff(p):
                    w, h, _ch, px = decode_tiff(p)
                else:
                    w, h, _ch, px = decode_png(p)
                recs.append((int(doc_id), w, h, len(px), sum(px)))
            yield pd.DataFrame(
                recs,
                columns=[
                    "doc_id", "width", "height", "n_pixel_bytes", "pixel_sum"
                ],
            )

    return media.mapInPandas(
        dec,
        schema=(
            "doc_id long, width int, height int, "
            "n_pixel_bytes long, pixel_sum long"
        ),
    )


def _q_multimodal_jpeg_real(spark, sf_dir):
    """The COMPRESSED codec path under the oracle (baseline JPEG,
    from-scratch huffman/DCT codec — kgt/textops/jpeg.py): per doc a
    deterministic solid-color image (color from doc_id, dims from text
    length, subsampling alternating 4:4:4 / 4:2:0 by doc parity) is
    ENCODED in one mapInPandas stage and DECODED in a second.  A
    constant block's AC coefficients are exactly zero, so the decode
    takes the exact DC-only path and the decoded color has a closed
    form (solid_color_roundtrip): RGB→YCbCr floor+0.5 → DC
    quantization at the quality-75-scaled table heads (8 luma, 9
    chroma) → floor(dc·q/8 + 128.5) → YCbCr→RGB floor+0.5.  The
    oracle reproduces that arithmetic per doc, so a huffman mis-decode,
    wrong dequant, broken MCU interleave, bad 4:2:0 upsample, or a
    rounding-convention drift all hash-fail."""
    import pandas as pd

    from kgt.textops.jpeg import decode_jpeg, encode_jpeg

    docs = _fanout(
        _read(spark, sf_dir, "documents").select(
            "doc_id", F.length("text").alias("L")
        )
    )

    def enc(batches):
        for pdf in batches:
            payloads = []
            for doc_id, L in zip(pdf["doc_id"], pdf["L"]):
                d, L = int(doc_id), int(L)
                w, h = L % 29 + 1, (L * 5) % 23 + 1
                rgb = bytes(((d * 37) % 256, (d * 57) % 256, (d * 77) % 256))
                # cycle the encoder's full mode matrix: baseline and
                # BOTH progressive scan layerings (spectral selection,
                # successive approximation) — the decoded solid color
                # is mode-invariant, so one closed form gates them all
                payloads.append(
                    encode_jpeg(
                        w,
                        h,
                        rgb * (w * h),
                        quality=75,
                        subsample="444" if d % 2 == 0 else "420",
                        progressive=[False, "ss", "sa"][d % 3],
                    )
                )
            yield pd.DataFrame({"doc_id": pdf["doc_id"], "payload": payloads})

    media = docs.mapInPandas(enc, schema="doc_id long, payload binary")

    def dec(batches):
        for pdf in batches:
            recs = []
            for doc_id, p in zip(pdf["doc_id"], pdf["payload"]):
                w, h, _ch, px = decode_jpeg(bytes(p))
                recs.append((int(doc_id), w, h, len(px), sum(px)))
            yield pd.DataFrame(
                recs,
                columns=[
                    "doc_id", "width", "height", "n_pixel_bytes", "pixel_sum"
                ],
            )

    return media.mapInPandas(
        dec,
        schema=(
            "doc_id long, width int, height int, "
            "n_pixel_bytes long, pixel_sum long"
        ),
    )


def _q_multimodal_audio_real(spark, sf_dir):
    """The REAL audio codec path under the oracle (fake=False), the
    WAV twin of multimodal_decode_real: deterministic 16-bit PCM —
    frames from text length, channels/rate from doc_id, sample k =
    (doc_id·7+k) mod 65536 − 32768 — is ENCODED to canonical RIFF/WAVE
    in one mapInPandas stage (from-scratch stdlib encoder) and DECODED
    in a second (signature + RIFF-size + chunk-walk + whole-frame
    validation), emitting the decoded format params and PCM sum. The
    oracle reproduces every column arithmetically (the same wraparound
    CASE as the PNG pixel sum, modulus 65536), so a decoder that
    mis-walks chunks, mis-reads fmt, or mis-frames data hash-fails."""
    import pandas as pd

    from kgt.textops.multimodal import decode_wav, encode_wav

    docs = _fanout(
        _read(spark, sf_dir, "documents").select(
            "doc_id", F.length("text").alias("L")
        )
    )

    def enc(batches):
        for pdf in batches:
            payloads = []
            for doc_id, L in zip(pdf["doc_id"], pdf["L"]):
                doc_id, L = int(doc_id), int(L)
                n_frames = L % 80 + 1
                nch = doc_id % 2 + 1
                rate = 8000 * (doc_id % 3 + 1)
                n = n_frames * nch
                samples = [
                    ((doc_id * 7 + k) % 65536) - 32768 for k in range(n)
                ]
                payloads.append(encode_wav(nch, rate, samples))
            yield pd.DataFrame(
                {"doc_id": pdf["doc_id"], "payload": payloads}
            )

    media = docs.mapInPandas(enc, schema="doc_id long, payload binary")

    def dec(batches):
        import struct

        for pdf in batches:
            recs = []
            for doc_id, p in zip(pdf["doc_id"], pdf["payload"]):
                nch, rate, bits, n_frames, data = decode_wav(bytes(p))
                vals = struct.unpack(f"<{n_frames * nch}h", data)
                recs.append(
                    (int(doc_id), nch, rate, bits, n_frames, sum(vals))
                )
            yield pd.DataFrame(
                recs,
                columns=[
                    "doc_id", "n_channels", "sample_rate", "bits",
                    "n_frames", "pcm_sum",
                ],
            )

    return media.mapInPandas(
        dec,
        schema=(
            "doc_id long, n_channels int, sample_rate int, bits int, "
            "n_frames long, pcm_sum long"
        ),
    )


def _q_multimodal_video_real(spark, sf_dir):
    """The REAL video path under the oracle (fake=False semantics),
    completing the PNG/WAV/Y4M trio: deterministic C420 YUV4MPEG2 —
    even dims from text length, total frames L%7+2, frame f byte j =
    (doc_id + f·31 + j) mod 256 — is ENCODED in one mapInPandas stage
    (from-scratch stdlib Y4M writer) and DECODED in a second (magic +
    header params + FRAME walk + plane-size validation), emitting one
    row per frame with its 25fps timestamp and plane-byte sum. The
    oracle reproduces geometry, frame fan-out (unnest(range)), ts and
    the sum arithmetically (the PNG wraparound CASE), so a decoder
    that mis-parses the header or mis-walks frames hash-fails."""
    import pandas as pd

    from kgt.textops.multimodal import decode_y4m, encode_y4m

    docs = _fanout(
        _read(spark, sf_dir, "documents").select(
            "doc_id", F.length("text").alias("L")
        )
    )

    def enc(batches):
        for pdf in batches:
            payloads = []
            for doc_id, L in zip(pdf["doc_id"], pdf["L"]):
                doc_id, L = int(doc_id), int(L)
                w = (L % 16 + 1) * 2
                h = ((L * 3) % 16 + 1) * 2
                n = w * h * 3 // 2
                frames = [
                    bytes((doc_id + f * 31 + j) % 256 for j in range(n))
                    for f in range(L % 7 + 2)
                ]
                payloads.append(encode_y4m(w, h, frames, fps=(25, 1)))
            yield pd.DataFrame(
                {"doc_id": pdf["doc_id"], "payload": payloads}
            )

    media = docs.mapInPandas(enc, schema="doc_id long, payload binary")

    def dec(batches):
        for pdf in batches:
            recs = []
            for doc_id, p in zip(pdf["doc_id"], pdf["payload"]):
                w, h, fn, fd, frames = decode_y4m(bytes(p))
                for f, fb in enumerate(frames):
                    recs.append(
                        (
                            int(doc_id), f, w, h,
                            f * 1000 * fd // fn, sum(fb),
                        )
                    )
            yield pd.DataFrame(
                recs,
                columns=[
                    "doc_id", "frame_idx", "width", "height",
                    "ts_ms", "frame_sum",
                ],
            )

    return media.mapInPandas(
        dec,
        schema=(
            "doc_id long, frame_idx int, width int, height int, "
            "ts_ms long, frame_sum long"
        ),
    )


def _q_multimodal_resize(spark, sf_dir):
    """Longest-side-cap resize plumbing (mapInPandas, 1→1); stubbed
    decode, real batch shape — dims + integer scaling oracle-checked."""
    from kgt.textops.multimodal import resize, to_media

    # no _fanout: same reasoning as multimodal_decode's fake path
    return resize(to_media(_read(spark, sf_dir, "documents")), max_side=256, fake=True)


def _q_multimodal_resize_real(spark, sf_dir):
    """REAL resize across codecs under the oracle: per doc a
    solid-color baseline JPEG (color/dims from doc_id and text length,
    always above the max_side cap) is decoded by the from-scratch JPEG
    codec, nearest-neighbor-resampled (numpy fancy-indexing, integer
    ⌊i·src/dst⌋ mapping), re-encoded as PNG (lossless container), and
    decoded again — four codec passes per row.  The oracle reproduces
    the resized dims with the same integer arithmetic and the pixel
    sum via the JPEG solid-color closed form (constant images are
    invariant under nearest-neighbor), so a broken resample grid, a
    codec mismatch, or a color drift all hash-fail."""
    import pandas as pd

    from kgt.textops.jpeg import encode_jpeg
    from kgt.textops.multimodal import decode_png, resize_pixels

    docs = _fanout(
        _read(spark, sf_dir, "documents").select(
            "doc_id", F.length("text").alias("L")
        )
    )

    def run(batches):
        for pdf in batches:
            recs = []
            for doc_id, L in zip(pdf["doc_id"], pdf["L"]):
                d, L = int(doc_id), int(L)
                w, h = L % 23 + 17, (L * 3) % 19 + 17  # 17..39 ≥ max_side+1
                rgb = bytes(((d * 41) % 256, (d * 61) % 256, (d * 83) % 256))
                payload = encode_jpeg(w, h, rgb * (w * h), quality=75)
                rw, rh, ch, px = decode_png(resize_pixels(payload, max_side=16))
                recs.append((d, rw, rh, len(px), sum(px)))
            yield pd.DataFrame(
                recs,
                columns=[
                    "doc_id", "width", "height", "n_pixel_bytes", "pixel_sum"
                ],
            )

    return docs.mapInPandas(
        run,
        schema=(
            "doc_id long, width int, height int, "
            "n_pixel_bytes long, pixel_sum long"
        ),
    )


def _q_multimodal_media_meta(spark, sf_dir):
    """The unified mixed-media metadata scan (multimodal.media_metadata)
    under the oracle: doc_id%9 picks the payload format — PNG, JPEG,
    GIF, WAV, Y4M, MP4, MP3, WebP, Matroska — each synthesized
    deterministically with the engine's own encoders, then ONE
    operator sniffs signatures and routes to the right decoder/walker.
    The oracle is a per-format CASE of closed forms over every
    metadata column, so a wrong signature route, dimension, frame
    count, rate or duration in ANY of the nine formats hash-fails one
    query."""
    import pandas as pd

    from kgt.textops.gif import encode_gif
    from kgt.textops.jpeg import encode_jpeg
    from kgt.textops.mp3 import encode_mp3_frames
    from kgt.textops.mp4 import encode_mp4
    from kgt.textops.multimodal import (
        encode_png,
        encode_wav,
        encode_y4m,
        media_metadata,
    )

    docs = _fanout(
        _read(spark, sf_dir, "documents").select(
            "doc_id", F.length("text").alias("L")
        )
    )

    def mk_payload(d, L):
        t = d % 9
        if t == 0:
            w, h = L % 20 + 1, (L * 3) % 20 + 1
            px = bytes((d * 31 + i) % 256 for i in range(w * h * 3))
            return encode_png(w, h, px, color_type=2)
        if t == 1:
            w, h = L % 29 + 1, (L * 5) % 23 + 1
            rgb = bytes(((d * 37) % 256, (d * 57) % 256, (d * 77) % 256))
            return encode_jpeg(w, h, rgb * (w * h), quality=75)
        if t == 2:
            w, h, nf = L % 21 + 4, (L * 7) % 17 + 4, d % 3 + 1
            pal = [(c, c, c) for c in range(4)]
            return encode_gif(
                w, h, [bytes(w * h) for _ in range(nf)], pal,
                delays=[(f + 1) * 2 for f in range(nf)],
            )
        if t == 3:
            ch, rate, nfr = d % 2 + 1, 8000 * (d % 3 + 1), L % 80 + 1
            return encode_wav(ch, rate, [0] * (nfr * ch), bits=16)
        if t == 4:
            w, h, n = (L % 10 + 1) * 2, (L % 7 + 1) * 2, d % 4 + 1
            fsz = w * h * 3 // 2
            return encode_y4m(w, h, [bytes(fsz)] * n, fps=(25, 1))
        if t == 5:
            w, h = (d * 16) % 1920 + 2, (d * 9) % 1080 + 2
            dur = (d * 13) % 5000 + 1000
            return encode_mp4(
                1000, dur,
                [
                    dict(track_id=1, handler="vide", width=w, height=h,
                         media_timescale=30000, media_duration=dur * 30,
                         codec="avc1"),
                    dict(track_id=2, handler="soun", width=0, height=0,
                         media_timescale=48000, media_duration=dur * 48,
                         codec="mp4a"),
                ],
            )
        if t == 6:
            return encode_mp3_frames(
                n_frames=L % 20 + 1,
                bitrate_kbps=[32, 64, 96, 128, 160, 192, 256, 320][d % 8],
                sample_rate=[44100, 48000, 32000][d % 3],
                channels=1 + (d % 2),
            )
        if t == 7:
            from kgt.textops.webp import encode_webp_header

            return encode_webp_header(
                (d * 11) % 1000 + 1, (d * 17) % 800 + 1,
                fmt=["vp8l", "vp8", "vp8x"][d % 3],
            )
        from kgt.textops.mkv import encode_mkv as _emkv

        return _emkv(
            (d * 19) % 6000 + 500,
            [
                dict(type="video", codec="V_VP9",
                     width=(d * 8) % 1000 + 2, height=(d * 5) % 700 + 2),
                dict(type="audio", codec="A_OPUS",
                     sample_rate=[48000, 44100, 32000][d % 3],
                     channels=d % 2 + 1),
            ],
        )

    def enc(batches):
        for pdf in batches:
            payloads = [
                mk_payload(int(d), int(L))
                for d, L in zip(pdf["doc_id"], pdf["L"])
            ]
            yield pd.DataFrame({"doc_id": pdf["doc_id"], "payload": payloads})

    media = docs.mapInPandas(enc, schema="doc_id long, payload binary")
    # n_bytes is honest but not closed-form for compressed payloads —
    # keep the oracle to the format-derived columns
    return media_metadata(media).drop("n_bytes")


def _q_multimodal_gif_real(spark, sf_dir):
    """REAL GIF decode under the oracle (from-scratch LZW +
    compositor, kgt/textops/gif.py): per doc a deterministic animated
    paletted GIF (palette size, dims, frame count and per-frame index
    pattern all functions of doc_id and text length; per-frame GCE
    delays (f+1)·2 cs) is encoded with the real LZW compressor and
    decoded back.  GIF is lossless, so the decoded RGB pixel sum has
    an exact closed form — Σ_frames Σ_colors count·rgbsum with
    count = ⌊wh/C⌋ + cycle remainder — which the oracle reproduces;
    a broken LZW width transition, palette indexing bug, or GCE
    mis-parse hash-fails."""
    import pandas as pd

    from kgt.textops.gif import decode_gif, encode_gif

    docs = _fanout(
        _read(spark, sf_dir, "documents").select(
            "doc_id", F.length("text").alias("L")
        )
    )

    def run(batches):
        for pdf in batches:
            recs = []
            for doc_id, L in zip(pdf["doc_id"], pdf["L"]):
                d, L = int(doc_id), int(L)
                C = [8, 16, 32][d % 3]
                w, h = L % 21 + 4, (L * 7) % 17 + 4
                nf = d % 3 + 1
                pal = [
                    ((c * 7) % 256, (c * 11) % 256, (c * 13) % 256)
                    for c in range(C)
                ]
                frames = [
                    bytes((d + f + i) % C for i in range(w * h))
                    for f in range(nf)
                ]
                delays = [(f + 1) * 2 for f in range(nf)]
                payload = encode_gif(w, h, frames, pal, delays=delays)
                gw, gh, out_frames, out_delays = decode_gif(payload)
                recs.append(
                    (
                        d, gw, gh, len(out_frames),
                        sum(sum(fr) for fr in out_frames),
                        sum(out_delays),
                    )
                )
            yield pd.DataFrame(
                recs,
                columns=[
                    "doc_id", "width", "height", "n_frames",
                    "pixel_sum", "delay_total_cs",
                ],
            )

    return docs.mapInPandas(
        run,
        schema=(
            "doc_id long, width int, height int, n_frames int, "
            "pixel_sum long, delay_total_cs long"
        ),
    )


def _q_multimodal_mp3_meta(spark, sf_dir):
    """REAL MP3 container parsing under the oracle (frame walker,
    kgt/textops/mp3.py — ID3v2 sync-safe skip, MPEG-1 Layer III
    header tables, frame-length arithmetic): per doc a deterministic
    CBR stream (frame count / bitrate / rate / channels / ID3 size all
    functions of doc_id and text length) is synthesized and walked.
    The oracle recomputes every field arithmetically — including
    duration from the per-frame sample count and the 10+syncsafe ID3
    size — so a wrong table entry, a broken frame-length formula, or a
    mis-skipped tag all hash-fail.  (PCM synthesis stays an env-gated
    stub; framing/metadata IS the curation-pipeline surface.)"""
    import pandas as pd

    from kgt.textops.mp3 import encode_mp3_frames, parse_mp3

    _BR = [32, 64, 96, 128, 160, 192, 256, 320]
    _SR = [44100, 48000, 32000]

    docs = _fanout(
        _read(spark, sf_dir, "documents").select(
            "doc_id", F.length("text").alias("L")
        )
    )

    def run(batches):
        for pdf in batches:
            recs = []
            for doc_id, L in zip(pdf["doc_id"], pdf["L"]):
                d, L = int(doc_id), int(L)
                payload = encode_mp3_frames(
                    n_frames=L % 20 + 1,
                    bitrate_kbps=_BR[d % 8],
                    sample_rate=_SR[d % 3],
                    channels=1 + (d % 2),
                    id3_payload=b"m" * (d % 100),
                )
                m = parse_mp3(payload)
                recs.append(
                    (
                        d, m["n_frames"], m["sample_rate"], m["channels"],
                        m["duration_ms"], m["bitrate_kbps"], m["id3v2_bytes"],
                    )
                )
            yield pd.DataFrame(
                recs,
                columns=[
                    "doc_id", "n_frames", "sample_rate", "channels",
                    "duration_ms", "bitrate_kbps", "id3v2_bytes",
                ],
            )

    return docs.mapInPandas(
        run,
        schema=(
            "doc_id long, n_frames int, sample_rate int, channels int, "
            "duration_ms long, bitrate_kbps int, id3v2_bytes long"
        ),
    )


def _q_multimodal_mp4_meta(spark, sf_dir):
    """REAL MP4/ISO-BMFF box parsing under the oracle (box-tree
    walker, kgt/textops/mp4.py — sized box walk, full-box versions,
    16.16 fixed-point track dims, handler/codec extraction): per doc a
    deterministic two-track file (video avc1 + audio mp4a; dims,
    durations and mvhd version functions of doc_id) is muxed and
    parsed.  The oracle recomputes the flattened metadata row, so a
    wrong box offset (e.g. the tkhd matrix skip), a version-1 64-bit
    misread, or a bad fixed-point shift all hash-fail."""
    import pandas as pd

    from kgt.textops.mp4 import encode_mp4, parse_mp4

    docs = _fanout(
        _read(spark, sf_dir, "documents").select(
            "doc_id", F.length("text").alias("L")
        )
    )

    def run(batches):
        for pdf in batches:
            recs = []
            for doc_id, L in zip(pdf["doc_id"], pdf["L"]):
                d, L = int(doc_id), int(L)
                w, h = (d * 16) % 1920 + 2, (d * 9) % 1080 + 2
                dur = (d * 13) % 5000 + 1000
                tracks = [
                    dict(
                        track_id=1, handler="vide", width=w, height=h,
                        media_timescale=30000, media_duration=dur * 30,
                        codec="avc1",
                    ),
                    dict(
                        track_id=2, handler="soun", width=0, height=0,
                        media_timescale=48000, media_duration=dur * 48,
                        codec="mp4a",
                    ),
                ]
                m = parse_mp4(
                    encode_mp4(1000, dur, tracks, mvhd_version=d % 2)
                )
                v, a = m["tracks"][0], m["tracks"][1]
                recs.append(
                    (
                        d, m["major_brand"], m["duration_ms"], m["n_tracks"],
                        int(v["width"]), int(v["height"]), v["codec"],
                        a["codec"], a["media_timescale"],
                    )
                )
            yield pd.DataFrame(
                recs,
                columns=[
                    "doc_id", "major_brand", "duration_ms", "n_tracks",
                    "video_w", "video_h", "video_codec", "audio_codec",
                    "audio_rate",
                ],
            )

    return docs.mapInPandas(
        run,
        schema=(
            "doc_id long, major_brand string, duration_ms long, "
            "n_tracks int, video_w int, video_h int, video_codec string, "
            "audio_codec string, audio_rate int"
        ),
    )


def _q_multimodal_frames(spark, sf_dir):
    """Frame-sampling plumbing (mapInPandas, 1→n fan-out); stubbed
    decoder, deterministic fake frames oracle-checked."""
    from kgt.textops.multimodal import frame_sample, to_media

    # no _fanout: same reasoning as multimodal_decode's fake path
    return frame_sample(
        to_media(_read(spark, sf_dir, "documents")), n_frames=4, fake=True
    )


# ---------------------------------------------------------------------
# consolidated suite queries — the driver gates the first 50 queries()
# entries per round, so same-shaped per-operator gates are unioned (with
# a `variant` column naming the original query) or joined into one slot
# each; every operator stays under the hash gate, and ALL families now
# fit the 50-slot window. bench_queries() still times each variant
# individually so per-slot numbers stay comparable across rounds.
# ---------------------------------------------------------------------

def _q_dedup_near_pairs(spark, sf_dir):
    """Consolidated near-dup PAIR gate — three operators, one slot,
    identical row shape (variant, doc_a, doc_b, jaccard):
      'dedup_minhash_lsh'   banded-LSH candidates (jaccard NULL)
      'dedup_ngram_jaccard' df-capped exact n-gram Jaccard, all pairs
      'dedup_near_verified' LSH blocking → exact verify (the 100-TB shape)
    Each variant's subplan is exactly the former standalone query's."""
    lsh = _q_dedup_minhash_lsh(spark, sf_dir).select(
        F.lit("dedup_minhash_lsh").alias("variant"),
        "doc_a", "doc_b", F.lit(None).cast("double").alias("jaccard"),
    )
    jac = _q_dedup_ngram_jaccard(spark, sf_dir).select(
        F.lit("dedup_ngram_jaccard").alias("variant"),
        "doc_a", "doc_b", "jaccard",
    )
    ver = _q_dedup_near_verified(spark, sf_dir).select(
        F.lit("dedup_near_verified").alias("variant"),
        "doc_a", "doc_b", "jaccard",
    )
    return lsh.unionByName(jac).unionByName(ver)


def _q_dedup_clusters_suite(spark, sf_dir):
    """Both connected-components implementations (min-label propagation
    and large-star/small-star) under one slot — they must land on the
    identical (doc_id, comp) table, so the union against a shared
    oracle hash-gates their agreement AND their correctness."""
    a = _q_dedup_clusters(spark, sf_dir).select(
        F.lit("dedup_clusters").alias("variant"), "doc_id", "comp"
    )
    b = _q_dedup_clusters_star(spark, sf_dir).select(
        F.lit("dedup_clusters_star").alias("variant"), "doc_id", "comp"
    )
    return a.unionByName(b)


def _q_sim_topk_suite(spark, sf_dir):
    """All four ANN paths under one slot (variant, query_id,
    neighbor_id, sim, rank): brute-force exact top-k, IVF with literal
    cell assignment, IVF past the literal/join crossover (300 cells,
    broadcast-join assignment — the scale path), and IVF over
    deterministically TRAINED centroids (training unrolled in the
    oracle)."""
    parts = [
        ("sim_topk", _q_sim_topk),
        ("sim_topk_ivf", _q_sim_topk_ivf),
        ("sim_topk_ivf_join", _q_sim_topk_ivf_join),
        ("sim_topk_ivf_trained", _q_sim_topk_ivf_trained),
    ]
    out = None
    for tag, fn in parts:
        df = fn(spark, sf_dir).select(
            F.lit(tag).alias("variant"),
            "query_id", "neighbor_id", "sim", "rank",
        )
        out = df if out is None else out.unionByName(df)
    return out


def _q_doc_signals(spark, sf_dir):
    """All five text-analysis operators as one per-doc signal table —
    quality.doc_signals: the four per-row families run as ONE fused
    zero-shuffle projection (not four shuffle joins), plus the
    corpus-trained unigram-LM join whose count shuffle is inherent.
    One driver slot hash-gates every signal value."""
    from kgt.textops.quality import doc_signals

    return doc_signals(_read(spark, sf_dir, "documents"))


def _q_streaming_near_dup(spark, sf_dir):
    """Driver gate for the STREAMING near-dup state machine
    (kgt/streaming/extract.py streaming_near_dup): the dup corpus is
    replayed through the availableNow streaming pipeline — two source
    files under maxFilesPerTrigger=1, so near-dup pairs span
    micro-batches and cross-batch state retention is on the hook — and
    the DISTINCT (doc_a, doc_b) emitted by the stateful bucket stage
    must equal batch lsh_candidate_pairs on the same corpus, so the
    oracle is the batch LSH SQL. Covers banded_signatures_rowwise
    parity, applyInPandasWithState emission, and state carry-over
    end-to-end under the hash gate. The streaming job runs eagerly
    inside this callable (a stream cannot be returned lazily); the
    returned DataFrame reads the parquet sink, so the working dir must
    outlive the call — each invocation deletes the PREVIOUS one's dir
    (the caller has consumed that DataFrame by then) and an atexit
    hook removes the last."""
    import atexit
    import shutil
    import tempfile

    from kgt.streaming.extract import streaming_near_dup

    corpus = _dup_corpus(spark, sf_dir)
    if not _stream_gate_dirs:
        atexit.register(
            lambda: [
                shutil.rmtree(d, ignore_errors=True)
                for d in _stream_gate_dirs
            ]
        )
    while _stream_gate_dirs:
        shutil.rmtree(_stream_gate_dirs.pop(), ignore_errors=True)
    tmp = tempfile.mkdtemp(prefix="kgt_stream_gate_")
    _stream_gate_dirs.append(tmp)
    src, out, ckpt = f"{tmp}/src", f"{tmp}/out", f"{tmp}/ckpt"
    # materialize the corpus once (localCheckpoint): both parity writes
    # consume the same 3-branch union, and without pinning each write
    # job re-derives it from the documents scan
    corpus = corpus.localCheckpoint(eager=False)
    corpus.filter(F.col("doc_id") % 2 == 0).coalesce(1).write.parquet(src)
    corpus.filter(F.col("doc_id") % 2 == 1).coalesce(1).write.mode(
        "append"
    ).parquet(src)
    stream = (
        spark.readStream.schema("doc_id long, text string")
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    # State-store partition count for the stateful stage. The batch
    # cost is dominated by the applyInPandasWithState update loop —
    # one Python call per (band, bucket) GROUP, ~20k state-row updates
    # per sf0.1 batch (progress metrics: allUpdatesTimeMs ≈ 70 s
    # summed vs ≈ 2 s commit) — and that loop parallelizes across
    # partitions, so size it to the session's core count: interleaved
    # A/B at sf0.1 measured 32 partitions beating 16 in all three
    # rounds (10.4/10.4/7.9 s vs 12.1/22.9/11.2 s). On a real cluster
    # KGT_STREAM_STATE_PARTITIONS sizes it to max(total cores,
    # live-bucket volume / ~100k rows per store). The conf is set only
    # around the stream start — the partitioning is baked into the new
    # checkpoint at start — and restored right after, so batch queries
    # are untouched.
    n_state = int(
        os.environ.get(
            "KGT_STREAM_STATE_PARTITIONS",
            str(spark.sparkContext.defaultParallelism),
        )
    )
    prev_parts = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", str(n_state))
    try:
        q = streaming_near_dup(stream, out, ckpt, ttl_seconds=3600)
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev_parts)
    # ProcessingTimeTimeout state keeps availableNow scheduling empty
    # batches forever — stop as soon as the source is drained. The
    # source is exactly 2 files under maxFilesPerTrigger=1 → exactly 2
    # data micro-batches; a batch's progress report follows its sink
    # commit, so the sink is complete when the 2nd one reports and the
    # trailing empty state-sweep batches never need to run.
    from kgt.streaming.extract import drain_streaming_query

    drain_streaming_query(q, expected_data_batches=2)
    # stash the checkpoint path; the state-bound metrics scan runs
    # OUTSIDE the timed slot via collect_stream_gate_metrics (an eager
    # statestore aggregation here would bill a 386k-row measurement
    # read to every bench sample — r7 review)
    _stream_gate_metrics.clear()
    _stream_gate_metrics["_ckpt"] = ckpt
    return (
        spark.read.parquet(f"{out}/stream_near_dup")
        .select("doc_a", "doc_b")
        .distinct()
    )


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: full KG extraction over both derived corpora at sf0.001."""
    from kgt.spark.parse import triples

    sf = "/root/testdata/sf0.001"
    ext_o = _orders_extracted(spark, sf, with_errors=True)
    ext_b = _bnodes_extracted(spark, sf)
    return triples(ext_o).unionByName(triples(ext_b))


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        "kg_triples_orders": _q_kg_triples_orders,
        "kg_triples_bnodes": _q_kg_triples_bnodes,
        "kg_recovery_quarantine": _q_kg_recovery_quarantine,
        "kg_recovery_triples": _q_kg_recovery_triples,
        "kg_stream_separators": _q_kg_stream_separators,
        "kg_refcounts": _q_kg_refcounts,
        "kg_entity_links": _q_kg_entity_links,
        "kg_dict_links": _q_kg_dict_links,
        "kg_streaming_writer": _q_kg_streaming_writer,
        "kg_pname": _q_kg_pname,
        "kg_mention_triples": _q_kg_mention_triples,
        "kg_ntriples_c14n": _q_kg_ntriples_c14n,
        "kg_rdfstar": _q_kg_rdfstar,
        "kg_fuzzy_link": _q_kg_fuzzy_link,
        "nt_fastpath": _q_nt_fastpath,
        "q1_pricing_summary": _q1_pricing_summary,
        "q3_top_orders": _q3_top_orders,
        "events_sessionize": _q_events_sessionize,
        "kg_canonicalize": _q_kg_canonicalize,
        "kg_pretty_writer": _q_kg_pretty_writer,
        "kg_pretty_nested": _q_kg_pretty_nested,
        "q5_region_revenue": _q5_region_revenue,
        "q_supplier_topk_per_nation": _q_supplier_topk_per_nation,
        "q_events_windowed": _q_events_windowed,
        "q_part_projection": _q_part_projection,
        "q_lineitem_pivot": _q_lineitem_pivot,
        "q_lineitem_cube": _q_lineitem_cube,
        "q_orders_distinct_customers": _q_orders_distinct_customers,
        "dedup_exact": _q_dedup_exact,
        "dedup_near_pairs": _q_dedup_near_pairs,
        "dedup_clusters_suite": _q_dedup_clusters_suite,
        "corpus_keep": _q_corpus_keep,
        "dedup_simhash": _q_dedup_simhash,
        "dedup_embedding": _q_dedup_embedding,
        "sim_topk_suite": _q_sim_topk_suite,
        "dedup_spans": _q_dedup_spans,
        "doc_signals": _q_doc_signals,
        "multimodal_decode": _q_multimodal_decode,
        "multimodal_decode_real": _q_multimodal_decode_real,
        "multimodal_jpeg_real": _q_multimodal_jpeg_real,
        "multimodal_audio_real": _q_multimodal_audio_real,
        "multimodal_video_real": _q_multimodal_video_real,
        "multimodal_resize": _q_multimodal_resize,
        "multimodal_resize_real": _q_multimodal_resize_real,
        "multimodal_media_meta": _q_multimodal_media_meta,
        "multimodal_gif_real": _q_multimodal_gif_real,
        "multimodal_mp3_meta": _q_multimodal_mp3_meta,
        "multimodal_mp4_meta": _q_multimodal_mp4_meta,
        "multimodal_frames": _q_multimodal_frames,
        "streaming_near_dup": _q_streaming_near_dup,
    }


def bench_queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """queries() plus the per-variant slots that were consolidated into
    suite queries to fit the driver's 50-slot window — bench.py times
    the variants individually so per-slot numbers stay comparable with
    earlier rounds' BENCH files."""
    qs = queries()
    qs.update(
        {
            "dedup_minhash_lsh": _q_dedup_minhash_lsh,
            "dedup_ngram_jaccard": _q_dedup_ngram_jaccard,
            "dedup_near_verified": _q_dedup_near_verified,
            "dedup_clusters": _q_dedup_clusters,
            "dedup_clusters_star": _q_dedup_clusters_star,
            "sim_topk": _q_sim_topk,
            "sim_topk_ivf": _q_sim_topk_ivf,
            "sim_topk_ivf_join": _q_sim_topk_ivf_join,
            "sim_topk_ivf_trained": _q_sim_topk_ivf_trained,
            "doc_unigram_logprob": _q_doc_unigram_logprob,
            "doc_langid": _q_doc_langid,
            "doc_token_count": _q_doc_token_count,
            "doc_quality": _q_doc_quality,
            "doc_fingerprint": _q_doc_fingerprint,
        }
    )
    return qs


def oracle_sql() -> dict[str, str]:
    sqls: dict[str, str] = {}
    _norm = "trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))"

    sqls["kg_triples_orders"] = _ORDERS_TRIPLES_SQL

    sqls["kg_triples_bnodes"] = _BNODES_TRIPLES_SQL

    sqls["kg_recovery_quarantine"] = """
        SELECT DISTINCT 'o' || CAST(o_orderkey AS VARCHAR) AS conv_id
        FROM orders WHERE o_orderkey % 10 = 0
    """

    sqls["kg_recovery_triples"] = """
        SELECT 'o' || CAST(o_orderkey AS VARCHAR) AS conv_id,
               CAST(6 AS BIGINT) AS n_triples
        FROM orders
    """

    sqls["kg_stream_separators"] = f"""
        WITH t AS ({_ORDERS_TRIPLES_SQL})
        SELECT conv_id, stmt_idx,
          CASE
            WHEN lag(subj) OVER w = subj AND lag(pred) OVER w = pred THEN ','
            WHEN lag(subj) OVER w = subj THEN ';'
            ELSE 'new'
          END AS sep
        FROM t
        WINDOW w AS (PARTITION BY conv_id ORDER BY stmt_idx)
    """

    sqls["kg_refcounts"] = f"""
        WITH t AS ({_BNODES_TRIPLES_SQL})
        SELECT obj, count(*) AS ref_count FROM t GROUP BY obj
    """

    # roles cycle user/assistant/tool by turn_idx; orders docs have
    # 7 turns (0..6): roles u,a,t,u,a,t,u → 3 user, 2 assistant,
    # 2 tool per conversation; tool turns add a tool mention each
    sqls["kg_entity_links"] = """
        WITH n AS (SELECT count(*) AS c FROM orders)
        SELECT 'urn:agent:user' AS iri, c * 3 AS n_mentions FROM n
        UNION ALL SELECT 'urn:agent:assistant', c * 2 FROM n
        UNION ALL SELECT 'urn:agent:tool', c * 2 FROM n
        UNION ALL SELECT 'urn:tool:turtle_emitter', c * 2 FROM n
    """

    sqls["kg_dict_links"] = """
        SELECT 'urn:nation:' || CAST(n_nationkey AS VARCHAR) AS iri,
               count(*) AS n_links
        FROM orders
        JOIN customer ON o_custkey = c_custkey
        JOIN nation ON c_nationkey = n_nationkey
        GROUP BY 1
    """

    sqls["kg_rdfstar"] = """
        WITH o AS (
          SELECT 's' || CAST(o_orderkey AS VARCHAR) AS conv_id,
                 '<urn:ord:' || CAST(o_orderkey AS VARCHAR) || '>' AS subj,
                 '"' || o_orderstatus || '"' AS obj
          FROM orders
        )
        SELECT conv_id, 0 AS stmt_idx, subj, '<urn:p:status>' AS pred,
               obj, FALSE AS is_quoted
        FROM o
        UNION ALL
        SELECT conv_id, 1,
               '<< ' || subj || ' <urn:p:status> ' || obj || ' >>',
               '<urn:p:src>', '"oms"', TRUE
        FROM o
    """

    # 4-grams (mirrors gram_size=4 in _q_kg_fuzzy_link: digit-span
    # universe 10⁴ > |dict|, so candidates stay linear at 10× scale)
    _grams = (
        "list_distinct(list_transform("
        "generate_series(1, greatest(length(p) - 3, 1)), i -> substr(p, i, 4)))"
    )
    _pad = (
        "'   ' || trim(regexp_replace(lower(surface), '\\s+', ' ', 'g')) || '   '"
    )
    # banded gram-minhash: 24 hashes (4 md5 lanes × 6 seeds) → 8 bands
    # × 3 rows (S-curve threshold (1/8)^(1/3) = 0.5); grams shared by
    # >20% of the dictionary are df-capped out of the universe —
    # mirrors kgt.spark.link._gram_tables/_gram_sigs exactly
    _gmins = ",\n               ".join(
        f"min(substr(md5('s{i // 4}:' || gram), {1 + 8 * (i % 4)}, 8)) AS h{i}"
        for i in range(24)
    )
    _gbks = ",\n               ".join(
        f"md5(h{3 * b} || '|' || h{3 * b + 1} || '|' || h{3 * b + 2}) AS bk{b}"
        for b in range(8)
    )
    _s_band_union = "\n          UNION ALL ".join(
        f"SELECT surface, {b} AS band, bk{b} AS mh FROM sbk" for b in range(8)
    )
    _d_band_union = "\n          UNION ALL ".join(
        f"SELECT surface, iri, {b} AS band, bk{b} AS mh FROM dbk"
        for b in range(8)
    )
    _knorm = "trim(regexp_replace(lower(surface), '\\s+', ' ', 'g'))"
    sqls["kg_fuzzy_link"] = f"""
        WITH dict AS (
          SELECT c_name AS surface,
                 'urn:cust:' || CAST(c_custkey AS VARCHAR) AS iri
          FROM customer
        ),
        surfaces AS (
          SELECT c_name AS surface FROM customer WHERE c_custkey % 3 = 0
          UNION ALL
          SELECT regexp_replace(c_name, '^.', '') FROM customer
        ),
        dkeys AS (SELECT DISTINCT {_knorm} AS k FROM dict),
        surf AS (
          SELECT DISTINCT surface FROM surfaces
          WHERE {_knorm} NOT IN (SELECT k FROM dkeys)
        ),
        sg AS (SELECT surface, {_grams} AS grams
               FROM (SELECT surface, {_pad} AS p FROM surf)),
        dg AS (SELECT surface, iri, {_grams} AS grams
               FROM (SELECT surface, iri, {_pad} AS p FROM dict)),
        sgrams0 AS (SELECT surface, unnest(grams) AS gram FROM sg),
        dgrams0 AS (SELECT surface, iri, unnest(grams) AS gram FROM dg),
        hot AS (
          SELECT gram FROM dgrams0 GROUP BY gram
          HAVING count(*) > (SELECT count(*) * 0.2 FROM customer)
        ),
        sgrams AS (SELECT sgrams0.* FROM sgrams0 ANTI JOIN hot USING (gram)),
        dgrams AS (SELECT dgrams0.* FROM dgrams0 ANTI JOIN hot USING (gram)),
        dfs AS (SELECT gram, count(*) AS df FROM dgrams GROUP BY gram),
        scount AS (SELECT surface, count(*) AS m FROM sgrams GROUP BY surface),
        sprefix AS (
          SELECT surface, gram FROM (
            SELECT s.surface, s.gram,
                   row_number() OVER (PARTITION BY s.surface
                     ORDER BY coalesce(d.df, 0), s.gram) AS rn,
                   count(*) OVER (PARTITION BY s.surface) AS m
            FROM sgrams s LEFT JOIN dfs d USING (gram)
          ) WHERE rn <= m - ceil(0.5 * m) + 1
        ),
        dprefix AS (
          SELECT surface, iri, gram FROM (
            SELECT g.surface, g.iri, g.gram,
                   row_number() OVER (PARTITION BY g.surface, g.iri
                     ORDER BY coalesce(d.df, 0), g.gram) AS rn,
                   count(*) OVER (PARTITION BY g.surface, g.iri) AS m
            FROM dgrams g LEFT JOIN dfs d USING (gram)
          ) WHERE rn <= m - ceil(0.5 * m) + 1
        ),
        swide AS (
          SELECT surface,
               {_gmins}
          FROM sgrams
          WHERE surface IN (SELECT surface FROM scount WHERE m > 64)
          GROUP BY surface
        ),
        sbk AS (SELECT surface, {_gbks} FROM swide),
        ssig AS (
          SELECT s.surface, -1 AS band, md5('g:' || s.gram) AS mh
          FROM sprefix s
          WHERE s.surface IN (SELECT surface FROM scount WHERE m <= 64)
          UNION ALL
          {_s_band_union}
        ),
        dwide AS (
          SELECT surface, iri,
               {_gmins}
          FROM dgrams
          GROUP BY surface, iri
        ),
        dbk AS (SELECT surface, iri, {_gbks} FROM dwide),
        dsig AS (
          SELECT surface, iri, -1 AS band, md5('g:' || gram) AS mh
          FROM dprefix
          UNION ALL
          {_d_band_union}
        ),
        cand AS (
          SELECT DISTINCT s.surface AS m_surface, d.surface AS d_surface, d.iri
          FROM ssig s JOIN dsig d ON s.band = d.band AND s.mh = d.mh
        ),
        sarr AS (SELECT surface, list(gram) AS ga FROM sgrams GROUP BY surface),
        darr AS (SELECT surface, iri, list(gram) AS gb
                 FROM dgrams GROUP BY surface, iri),
        scored AS (
          SELECT c.m_surface, c.iri,
                 CAST(len(list_intersect(sa.ga, da.gb)) AS DOUBLE)
                 / (len(sa.ga) + len(da.gb)
                    - len(list_intersect(sa.ga, da.gb))) AS j
          FROM cand c
          JOIN sarr sa ON sa.surface = c.m_surface
          JOIN darr da ON da.surface = c.d_surface AND da.iri = c.iri
        ),
        best AS (
          SELECT m_surface AS surface, iri, j,
                 row_number() OVER (PARTITION BY m_surface
                                    ORDER BY j DESC, iri DESC) AS rn
          FROM scored WHERE j >= 0.5
        )
        SELECT surface, iri, round(j, 6) AS jaccard FROM best WHERE rn = 1
    """

    sqls["kg_mention_triples"] = """
        WITH iris AS (
          SELECT unnest(['urn:agent:user', 'urn:agent:assistant',
                         'urn:agent:tool', 'urn:tool:turtle_emitter']) AS iri
        )
        SELECT 'o' || CAST(o_orderkey AS VARCHAR) AS conv_id,
               '<urn:conv:o' || CAST(o_orderkey AS VARCHAR) || '>' AS subj,
               '<urn:kg:mentions>' AS pred,
               '<' || iri || '>' AS obj
        FROM orders CROSS JOIN iris
    """

    sqls["kg_ntriples_c14n"] = f"""
        WITH t AS ({_ORDERS_TRIPLES_SQL}),
        lines AS (
          SELECT conv_id, subj || ' ' || pred || ' ' || obj || ' .' AS line
          FROM t
        )
        SELECT conv_id,
               string_agg(line, chr(10) ORDER BY line) AS nt
        FROM lines GROUP BY conv_id
    """

    sqls["kg_streaming_writer"] = f"""
        WITH t AS ({_ORDERS_TRIPLES_SQL}),
        f AS (
          SELECT conv_id, stmt_idx,
            CASE
              WHEN lag(subj) OVER w = subj AND lag(pred) OVER w = pred
                THEN ',' || chr(10) || '  ' || obj
              WHEN lag(subj) OVER w = subj
                THEN ';' || chr(10) || ' ' || pred || ' ' || obj
              ELSE (CASE WHEN lag(subj) OVER w IS NULL THEN ''
                         ELSE ' .' || chr(10) END)
                   || subj || ' ' || pred || ' ' || obj
            END AS fragment
          FROM t
          WINDOW w AS (PARTITION BY conv_id ORDER BY stmt_idx)
        )
        SELECT conv_id,
               string_agg(fragment, '' ORDER BY stmt_idx) || ' .' AS ttl
        FROM f GROUP BY conv_id
    """

    sqls["kg_pname"] = f"""
        WITH t AS ({_ORDERS_TRIPLES_SQL}),
        terms AS (
          SELECT DISTINCT term FROM (
            SELECT pred AS term FROM t
            UNION ALL
            SELECT obj AS term FROM t WHERE obj LIKE '<%'
          )
        ), iri AS (
          SELECT term, substr(term, 2, length(term) - 2) AS i FROM terms
        )
        SELECT term,
          CASE
            WHEN i LIKE 'http://www.w3.org/1999/02/22-rdf-syntax-ns#%'
              THEN 'rdf:' || substr(i, 44)
            WHEN i LIKE 'urn:p:%' THEN 'p:' || substr(i, 7)
            WHEN i LIKE 'urn:%' THEN 'u:' || substr(i, 5)
            ELSE term
          END AS pname
        FROM iri
    """

    sqls["nt_fastpath"] = f"""
        WITH l AS (
          SELECT 'n' || CAST(l_orderkey AS VARCHAR) || '_' || CAST(l_linenumber AS VARCHAR) AS conv_id,
                 '<urn:li:' || CAST(l_orderkey AS VARCHAR) || '_' || CAST(l_linenumber AS VARCHAR) || '>' AS subj,
                 CAST(CAST(l_quantity AS BIGINT) AS VARCHAR) AS qty,
                 l_returnflag AS flag,
                 CAST(l_partkey AS VARCHAR) AS pk
          FROM lineitem
        )
        SELECT conv_id, 2 AS stmt_idx, subj, '<{RDF_TYPE}>' AS pred,
               '<urn:p:Line>' AS obj FROM l
        UNION ALL SELECT conv_id, 3, subj, '<urn:p:qty>',
               '"' || qty || '"^^<{XSD_INT}>' FROM l
        UNION ALL SELECT conv_id, 4, subj, '<urn:p:flag>',
               '"' || flag || '"' FROM l
        UNION ALL SELECT conv_id, 5, subj, '<urn:p:part>',
               '<urn:li:part_' || pk || '>' FROM l
    """

    # NOTE: DuckDB widens sum(BIGINT) to HUGEINT (decimal128 over Arrow,
    # float64 over pandas) while Spark keeps LongType — every final sum
    # below is re-cast to BIGINT so the driver's value hash sees the
    # same type on both sides.
    sqls["q1_pricing_summary"] = """
        SELECT l_returnflag, l_linestatus,
               CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty,
               CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS BIGINT) AS sum_base_cents,
               CAST(sum(CAST(round(l_extendedprice * (1 - l_discount) * 100) AS BIGINT)) AS BIGINT) AS sum_disc_cents,
               count(*) AS count_order,
               round(CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) / count(*), 4) AS avg_qty
        FROM lineitem
        WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
        GROUP BY l_returnflag, l_linestatus
    """

    sqls["q3_top_orders"] = """
        SELECT l_orderkey,
               CAST(sum(CAST(round(l_extendedprice * (1 - l_discount) * 100) AS BIGINT)) AS BIGINT) AS revenue_cents
        FROM lineitem
        JOIN orders ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        WHERE c_mktsegment = 'BUILDING'
        GROUP BY l_orderkey
        ORDER BY revenue_cents DESC, l_orderkey ASC
        LIMIT 10
    """

    sqls["kg_canonicalize"] = """
        SELECT 'k' || CAST(o_orderkey AS VARCHAR) AS conv_id,
               0 AS stmt_idx,
               '<urn:ord:' || CAST(o_orderkey AS VARCHAR) || '>' AS subj,
               '<urn:p:total>' AS pred,
               '"' || CAST(CAST(FLOOR(o_totalprice) AS BIGINT) AS VARCHAR)
                   || '"^^<http://www.w3.org/2001/XMLSchema#integer>' AS obj
        FROM orders
        UNION ALL
        SELECT 'k' || CAST(o_orderkey AS VARCHAR), 1,
               '<urn:ord:' || CAST(o_orderkey AS VARCHAR) || '>',
               '<urn:p:prio>',
               '"' || o_orderpriority || '"@en'
        FROM orders
    """

    # the pretty writer's layout is char-deterministic for the bnodes
    # corpus (every conversation has the same graph shape: one inline
    # [...] bnode + one (...) collection), so the full document text is
    # SQL-constructible — this upgrades kg_pretty_writer from the
    # rows-only check it had in round 1 to a hard hash gate
    sqls["kg_pretty_writer"] = """
        SELECT 'b' || CAST(c_custkey AS VARCHAR) AS conv_id,
               '@prefix c: <urn:cust:> .' || chr(10) ||
               '@prefix p: <urn:p:> .' || chr(10) || chr(10) ||
               'c:' || CAST(c_custkey AS VARCHAR) || ' p:acct [' || chr(10) ||
               '    p:bal ' || CAST(CAST(FLOOR(c_acctbal) AS BIGINT) AS VARCHAR) || ';' || chr(10) ||
               '    p:seg "' || c_mktsegment || '"' || chr(10) ||
               '  ];' || chr(10) ||
               '  p:tags ("A" "' || c_name || '" c:' || CAST(c_custkey AS VARCHAR) || ') .' || chr(10) AS ttl
        FROM customer
    """

    # nested recursion gate: every supplier doc has the same graph
    # shape (outer [ ] holding an inner [ ] + a list, plus a top-level
    # list), so the full document text — indents, ';' placement,
    # per-level alphabetical property order — is SQL-constructible
    sqls["kg_pretty_nested"] = """
        SELECT 'sp' || CAST(s_suppkey AS VARCHAR) AS conv_id,
               '@prefix p: <urn:p:> .' || chr(10) ||
               '@prefix s: <urn:supp:> .' || chr(10) || chr(10) ||
               's:' || CAST(s_suppkey AS VARCHAR) || ' p:alts ("a" "b");' || chr(10) ||
               '  p:info [' || chr(10) ||
               '    p:contact [' || chr(10) ||
               '      p:bal ' || CAST(CAST(FLOOR(s_acctbal) AS BIGINT) AS VARCHAR) || ';' || chr(10) ||
               '      p:name "' || s_name || '"' || chr(10) ||
               '    ];' || chr(10) ||
               '    p:tags ("x" "n' || CAST(s_nationkey AS VARCHAR) || '")' || chr(10) ||
               '  ] .' || chr(10) AS ttl
        FROM supplier
    """

    sqls["q5_region_revenue"] = """
        SELECT r_name, n_name,
               CAST(sum(CAST(round(l_extendedprice * (1 - l_discount) * 100) AS BIGINT)) AS BIGINT) AS revenue_cents,
               count(*) AS n_items
        FROM lineitem
        JOIN orders ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        JOIN nation ON c_nationkey = n_nationkey
        JOIN region ON n_regionkey = r_regionkey
        GROUP BY r_name, n_name
    """

    sqls["q_supplier_topk_per_nation"] = """
        WITH s AS (
          SELECT s_nationkey, s_suppkey,
                 CAST(round(s_acctbal * 100) AS BIGINT) AS bal_cents
          FROM supplier
        ), r AS (
          SELECT *, row_number() OVER (PARTITION BY s_nationkey
                    ORDER BY bal_cents DESC, s_suppkey ASC) AS rank
          FROM s
        )
        SELECT s_nationkey, s_suppkey, bal_cents, rank FROM r WHERE rank <= 3
    """

    sqls["q_events_windowed"] = """
        SELECT time_bucket(INTERVAL '1 hour', ts) AS hour_start, event_type,
               count(*) AS n,
               CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS value_cents
        FROM events
        GROUP BY 1, 2
    """

    sqls["q_part_projection"] = """
        SELECT p_partkey, p_size AS size_attr
        FROM part WHERE p_partkey % 10 = 3
    """

    sqls["doc_fingerprint"] = f"""
        WITH w AS (
          SELECT doc_id,
                 string_split({_norm}, ' ') AS words,
                 {_norm} AS norm
          FROM documents
        )
        SELECT doc_id, md5(norm) AS fp_exact,
               CASE WHEN len(words) >= 8 THEN
                 list_min(list_transform(generate_series(1, len(words) - 7),
                   i -> md5(array_to_string(words[i:i+7], ' '))))
               ELSE md5(array_to_string(words, ' ')) END AS fp_rolling_min
        FROM w
    """

    sqls["q_lineitem_pivot"] = """
        SELECT l_returnflag,
               CAST(coalesce(sum(CASE WHEN l_linestatus = 'O'
                 THEN CAST(round(l_extendedprice * 100) AS BIGINT) END), 0) AS BIGINT) AS o_cents,
               CAST(coalesce(sum(CASE WHEN l_linestatus = 'F'
                 THEN CAST(round(l_extendedprice * 100) AS BIGINT) END), 0) AS BIGINT) AS f_cents,
               CAST(coalesce(sum(CASE WHEN l_linestatus = 'P'
                 THEN CAST(round(l_extendedprice * 100) AS BIGINT) END), 0) AS BIGINT) AS p_cents
        FROM lineitem GROUP BY l_returnflag
    """

    sqls["q_lineitem_cube"] = """
        SELECT l_returnflag, l_linestatus,
               CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS BIGINT) AS sum_cents,
               count(*) AS n
        FROM lineitem GROUP BY CUBE (l_returnflag, l_linestatus)
    """

    sqls["q_orders_distinct_customers"] = """
        SELECT o_orderstatus,
               count(DISTINCT o_custkey) AS n_customers,
               count(*) AS n_orders
        FROM orders GROUP BY o_orderstatus
    """

    sqls["events_sessionize"] = """
        WITH g AS (
          SELECT user_id, ts, event_id,
                 CASE WHEN epoch_us(ts) - epoch_us(lag(ts) OVER w) >= 1800000000
                      OR lag(ts) OVER w IS NULL THEN 1 ELSE 0 END AS new_sess
          FROM events
          WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        ), s AS (
          SELECT user_id,
                 sum(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sess_id
          FROM g
        )
        SELECT user_id, CAST(max(sess_id) AS BIGINT) AS n_sessions,
               count(*) AS n_events
        FROM s GROUP BY user_id
    """

    sqls["dedup_exact"] = f"""
        WITH corpus AS ({_DUP_CORPUS_SQL})
        SELECT md5(trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))) AS fp,
               count(*) AS n_docs, min(doc_id) AS keep_doc_id
        FROM corpus GROUP BY 1 HAVING count(*) > 1
    """

    # banded MinHash: 32 hashes → 8 bands × 4 rows; band key = md5 of
    # the band's concatenated minhashes (mirrors kgt.textops.dedup)
    # 4 independent 32-bit lanes per md5, mirroring minhash_signatures
    _mins = ",\n               ".join(
        f"min(substr(md5('s{i // 4}:' || shingle), {1 + 8 * (i % 4)}, 8)) AS h{i}"
        for i in range(32)
    )
    _bks = ",\n               ".join(
        "md5(" + " || '|' || ".join(f"h{4 * b + j}" for j in range(4)) + f") AS bk{b}"
        for b in range(8)
    )
    _band_union = "\n          UNION ALL ".join(
        f"SELECT doc_id, {b} AS band, bk{b} AS minhash FROM bk" for b in range(8)
    )
    sqls["dedup_minhash_lsh"] = f"""
        WITH corpus AS ({_DUP_CORPUS_SQL}),
        sh AS ({_SHINGLES_SQL}),
        wide AS (
          SELECT doc_id,
               {_mins}
          FROM sh GROUP BY doc_id
        ),
        bk AS (
          SELECT doc_id,
               {_bks}
          FROM wide
        ),
        sig AS (
          {_band_union}
        )
        SELECT DISTINCT l.doc_id AS doc_a, r.doc_id AS doc_b
        FROM sig l JOIN sig r
          ON l.band = r.band AND l.minhash = r.minhash AND l.doc_id < r.doc_id
    """

    sqls["dedup_ngram_jaccard"] = f"""
        WITH corpus AS ({_DUP_CORPUS_SQL}),
        sh0 AS ({_SHINGLES_SQL}),
        hot AS (SELECT shingle FROM sh0 GROUP BY shingle HAVING count(*) > 1000),
        sh AS (SELECT sh0.* FROM sh0 ANTI JOIN hot USING (shingle)),
        sizes AS (SELECT doc_id, count(*) AS n_sh FROM sh GROUP BY doc_id),
        common AS (
          SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS n_common
          FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
          GROUP BY 1, 2
        )
        SELECT doc_a, doc_b,
               round(CAST(n_common AS DOUBLE) / (sa.n_sh + sb.n_sh - n_common), 6) AS jaccard
        FROM common
        JOIN sizes sa ON sa.doc_id = doc_a
        JOIN sizes sb ON sb.doc_id = doc_b
        WHERE CAST(n_common AS DOUBLE) / (sa.n_sh + sb.n_sh - n_common) >= 0.6
    """

    # end-to-end near-dup: LSH candidates (from UNCAPPED shingles, like
    # the Spark side) ∩ exact Jaccard over df-capped shingles
    _near_verified_sql = f"""
        WITH corpus AS ({_DUP_CORPUS_SQL}),
        sh0 AS ({_SHINGLES_SQL}),
        wide AS (
          SELECT doc_id,
               {_mins}
          FROM sh0 GROUP BY doc_id
        ),
        bk AS (
          SELECT doc_id,
               {_bks}
          FROM wide
        ),
        sig AS (
          {_band_union}
        ),
        cand AS (
          SELECT DISTINCT l.doc_id AS doc_a, r.doc_id AS doc_b
          FROM sig l JOIN sig r
            ON l.band = r.band AND l.minhash = r.minhash AND l.doc_id < r.doc_id
        ),
        hot AS (SELECT shingle FROM sh0 GROUP BY shingle HAVING count(*) > 1000),
        sh AS (SELECT sh0.* FROM sh0 ANTI JOIN hot USING (shingle)),
        sizes AS (SELECT doc_id, count(*) AS n_sh FROM sh GROUP BY doc_id),
        common AS (
          SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS n_common
          FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
          GROUP BY 1, 2
        ),
        blocked AS (
          SELECT common.* FROM common SEMI JOIN cand USING (doc_a, doc_b)
        )
        SELECT doc_a, doc_b,
               round(CAST(n_common AS DOUBLE) / (sa.n_sh + sb.n_sh - n_common), 6) AS jaccard
        FROM blocked
        JOIN sizes sa ON sa.doc_id = doc_a
        JOIN sizes sb ON sb.doc_id = doc_b
        WHERE CAST(n_common AS DOUBLE) / (sa.n_sh + sb.n_sh - n_common) >= 0.6
    """
    sqls["dedup_near_verified"] = _near_verified_sql

    # near-dup clusters: connected components over the verified pairs —
    # comp = min doc_id reachable (recursive CTE; the Spark side runs
    # min-label propagation to the same fixpoint)
    sqls["dedup_clusters"] = f"""
        WITH RECURSIVE pairs AS ({_near_verified_sql}),
        edges AS (
          SELECT doc_a AS a, doc_b AS b FROM pairs
          UNION
          SELECT doc_b, doc_a FROM pairs
        ),
        nodes AS (SELECT DISTINCT a AS node FROM edges),
        reach AS (
          SELECT node, node AS comp FROM nodes
          UNION
          SELECT e.a AS node, r.comp AS comp
          FROM edges e JOIN reach r ON r.node = e.b
        )
        SELECT node AS doc_id, min(comp) AS comp FROM reach GROUP BY node
    """
    # the star variant must land on the IDENTICAL fixpoint — one oracle,
    # two engine implementations, both hash-gated
    sqls["dedup_clusters_star"] = sqls["dedup_clusters"]

    # SimHash: md5-derived 64-bit fingerprint as two 32-bit halves —
    # bit-for-bit the same construction as kgt.textops.dedup.simhash64,
    # so the op is oracle-checked (was rows-only in round 1)
    _vote_sums = ",\n               ".join(
        f"sum(CASE WHEN ((h_{half} >> {b}) & 1) = 1 THEN 1 ELSE -1 END) AS s_{half}_{b}"
        for half in ("lo", "hi")
        for b in range(32)
    )
    _sim_expr = {
        half: " + ".join(
            f"(CASE WHEN s_{half}_{b} > 0 THEN CAST({1 << b} AS BIGINT) ELSE 0 END)"
            for b in range(32)
        )
        for half in ("lo", "hi")
    }
    sqls["dedup_simhash"] = f"""
        WITH corpus AS ({_DUP_CORPUS_SQL}),
        tok AS (
          SELECT doc_id, unnest(list_distinct(string_split({_norm}, ' '))) AS w
          FROM corpus
        ),
        h AS (
          SELECT doc_id,
                 ('0x' || substr(md5(w), 1, 8))::BIGINT AS h_hi,
                 ('0x' || substr(md5(w), 9, 8))::BIGINT AS h_lo
          FROM tok
        ),
        votes AS (
          SELECT doc_id,
               {_vote_sums}
          FROM h GROUP BY doc_id
        ),
        sim AS (
          SELECT doc_id,
                 {_sim_expr["hi"]} AS sim_hi,
                 {_sim_expr["lo"]} AS sim_lo
          FROM votes
        ),
        chunks AS (
          SELECT doc_id, sim_hi, sim_lo, 0 AS chunk_idx, sim_lo & 65535 AS chunk FROM sim
          UNION ALL SELECT doc_id, sim_hi, sim_lo, 1, (sim_lo >> 16) & 65535 FROM sim
          UNION ALL SELECT doc_id, sim_hi, sim_lo, 2, sim_hi & 65535 FROM sim
          UNION ALL SELECT doc_id, sim_hi, sim_lo, 3, (sim_hi >> 16) & 65535 FROM sim
        ),
        big AS (
          SELECT chunk_idx, chunk FROM chunks
          GROUP BY 1, 2 HAVING count(*) > 10000
        ),
        pruned AS (
          SELECT chunks.* FROM chunks ANTI JOIN big USING (chunk_idx, chunk)
        ),
        pairs AS (
          SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
                 a.sim_hi AS a_hi, a.sim_lo AS a_lo,
                 b.sim_hi AS b_hi, b.sim_lo AS b_lo
          FROM pruned a JOIN pruned b
            ON a.chunk_idx = b.chunk_idx AND a.chunk = b.chunk
           AND a.doc_id < b.doc_id
        )
        SELECT doc_a, doc_b,
               CAST(bit_count(xor(a_hi, b_hi)) + bit_count(xor(a_lo, b_lo)) AS INTEGER) AS hamming
        FROM pairs
        WHERE bit_count(xor(a_hi, b_hi)) + bit_count(xor(a_lo, b_lo)) <= 3
    """

    _cos = (
        "round(list_dot_product(a.v, b.v) / "
        "(sqrt(list_dot_product(a.v, a.v)) * sqrt(list_dot_product(b.v, b.v))), 6)"
    )

    # embedding near-dup: same seed-quantizer + rounded-cosine cell
    # ranking as sim_topk_ivf, multi-probe (rn <= 2) on BOTH sides,
    # exact cosine inside shared cells only — mirrors
    # kgt.textops.similarity.embedding_near_pairs
    _ecos = (
        "round(list_dot_product({a}, {b}) / "
        "(sqrt(list_dot_product({a}, {a})) * sqrt(list_dot_product({b}, {b}))), 6)"
    )
    sqls["dedup_embedding"] = f"""
        WITH base AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
        corpus AS (
          SELECT vec_id, v FROM base
          UNION ALL
          SELECT vec_id + 1000000, v FROM base WHERE vec_id % 5 = 0
          UNION ALL
          SELECT vec_id + 2000000, [v[1] * 1.1] || v[2:] FROM base
          WHERE vec_id % 7 = 0
        ),
        seeds AS (
          -- auto_n_cells ≈ √N clamped [16, 65536]; FLOOR(SQRT(n)) ==
          -- Python isqrt(n) at these magnitudes (parity-swept)
          SELECT row_number() OVER (ORDER BY vec_id) - 1 AS cid, v AS cv
          FROM (SELECT vec_id, v FROM corpus ORDER BY vec_id
                LIMIT (SELECT GREATEST(16, LEAST(65536,
                       CAST(FLOOR(SQRT(count(*))) AS BIGINT)))
                       FROM corpus))
        ),
        rnk AS (
          SELECT c.vec_id, s.cid, c.v,
                 row_number() OVER (PARTITION BY c.vec_id
                   ORDER BY {_ecos.format(a="c.v", b="s.cv")} DESC, s.cid ASC) AS rn
          FROM corpus c CROSS JOIN seeds s
        ),
        assigned AS (SELECT vec_id, cid, v FROM rnk WHERE rn <= 2),
        big AS (
          SELECT cid FROM assigned GROUP BY cid HAVING count(*) > 100000
        ),
        pruned AS (
          SELECT assigned.* FROM assigned ANTI JOIN big USING (cid)
        ),
        pairs AS (
          SELECT DISTINCT a.vec_id AS vec_a, b.vec_id AS vec_b,
                 {_ecos.format(a="a.v", b="b.v")} AS sim
          FROM pruned a JOIN pruned b
            ON a.cid = b.cid AND a.vec_id < b.vec_id
        )
        SELECT vec_a, vec_b, sim FROM pairs WHERE sim >= 0.9
    """

    sqls["sim_topk"] = f"""
        WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
        scored AS (
          SELECT b.vec_id AS query_id, a.vec_id AS neighbor_id, {_cos} AS sim
          FROM e a CROSS JOIN e b
          WHERE b.vec_id < 8 AND a.vec_id <> b.vec_id
        ), ranked AS (
          SELECT *, row_number() OVER (PARTITION BY query_id
                    ORDER BY sim DESC, neighbor_id ASC) AS rank
          FROM scored
        )
        SELECT query_id, neighbor_id, sim, rank FROM ranked WHERE rank <= 5
    """

    # IVF with 16 deterministic Voronoi seed cells, nprobe=2 — mirrors
    # kgt.textops.similarity.ivf_topk exactly (same rounded-cosine cell
    # ordering, cid tiebreak)
    _ccos = (
        "round(list_dot_product({a}, {b}) / "
        "(sqrt(list_dot_product({a}, {a})) * sqrt(list_dot_product({b}, {b}))), 6)"
    )
    _ivf_sql = lambda n_cells: f"""
        WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
        seeds AS (
          SELECT row_number() OVER (ORDER BY vec_id) - 1 AS cid, v AS cv
          FROM (SELECT vec_id, v FROM e ORDER BY vec_id LIMIT {n_cells})
        ),
        base_rank AS (
          SELECT e.vec_id, s.cid,
                 row_number() OVER (PARTITION BY e.vec_id
                   ORDER BY {_ccos.format(a="e.v", b="s.cv")} DESC, s.cid ASC) AS rn
          FROM e CROSS JOIN seeds s
        ),
        base AS (
          SELECT b.vec_id AS neighbor_id, b.cid, e.v AS ev
          FROM base_rank b JOIN e ON e.vec_id = b.vec_id WHERE rn = 1
        ),
        q AS (SELECT vec_id AS query_id, v AS qv FROM e WHERE vec_id < 8),
        qrank AS (
          SELECT q.query_id, s.cid, q.qv,
                 row_number() OVER (PARTITION BY q.query_id
                   ORDER BY {_ccos.format(a="q.qv", b="s.cv")} DESC, s.cid ASC) AS rn
          FROM q CROSS JOIN seeds s
        ),
        probe AS (SELECT query_id, cid, qv FROM qrank WHERE rn <= 2),
        scored AS (
          SELECT p.query_id, b.neighbor_id,
                 {_ccos.format(a="p.qv", b="b.ev")} AS sim
          FROM probe p JOIN base b USING (cid)
          WHERE b.neighbor_id <> p.query_id
        ),
        ranked AS (
          SELECT *, row_number() OVER (PARTITION BY query_id
                    ORDER BY sim DESC, neighbor_id ASC) AS rank
          FROM scored
        )
        SELECT query_id, neighbor_id, sim, rank FROM ranked WHERE rank <= 5
    """
    sqls["sim_topk_ivf"] = _ivf_sql(16)
    # the join-assignment scale path computes bit-identical sims, so
    # its oracle differs only in the seed count (300 > the 256-cell
    # literal/join crossover)
    sqls["sim_topk_ivf_join"] = _ivf_sql(300)

    # TRAINED-cell IVF: unroll train_centroids_det's two Lloyd's
    # iterations as CTE pairs. Each iteration: top-1 assignment by the
    # shared rounded-cosine/cid ranking, then a QUANTIZED integer mean
    # (round(val·1e6) summed as BIGINT — order-independent, so SQL and
    # Spark agree bit-for-bit) → round(sum/(n·1e6), 6) per component.
    # Empty cells drop out on both sides. Mirrors
    # kgt.textops.similarity.train_centroids_det exactly.
    def _lloyd_iter(i):
        prev = "seeds0" if i == 1 else f"cents{i - 1}"
        return f"""
        r{i} AS (
          SELECT e.vec_id, e.v, s.cid,
                 row_number() OVER (PARTITION BY e.vec_id
                   ORDER BY {_ccos.format(a="e.v", b="s.cv")} DESC, s.cid ASC) AS rn
          FROM e CROSS JOIN {prev} s
        ),
        a{i} AS (SELECT v, cid FROM r{i} WHERE rn = 1),
        x{i} AS (SELECT cid, generate_subscripts(v, 1) AS pos, unnest(v) AS val
                 FROM a{i}),
        s{i} AS (SELECT cid, pos,
                        SUM(CAST(round(val * 1000000) AS BIGINT)) AS s,
                        COUNT(*) AS n
                 FROM x{i} GROUP BY cid, pos),
        cents{i} AS (SELECT cid,
                            list(round(s / (n * 1000000.0), 6) ORDER BY pos) AS cv
                     FROM s{i} GROUP BY cid)"""

    sqls["sim_topk_ivf_trained"] = f"""
        WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
        seeds0 AS (
          SELECT row_number() OVER (ORDER BY vec_id) - 1 AS cid, v AS cv
          FROM (SELECT vec_id, v FROM e ORDER BY vec_id LIMIT 16)
        ),{_lloyd_iter(1)},{_lloyd_iter(2)},
        base_rank AS (
          SELECT e.vec_id, s.cid,
                 row_number() OVER (PARTITION BY e.vec_id
                   ORDER BY {_ccos.format(a="e.v", b="s.cv")} DESC, s.cid ASC) AS rn
          FROM e CROSS JOIN cents2 s
        ),
        base AS (
          SELECT b.vec_id AS neighbor_id, b.cid, e.v AS ev
          FROM base_rank b JOIN e ON e.vec_id = b.vec_id WHERE rn = 1
        ),
        q AS (SELECT vec_id AS query_id, v AS qv FROM e WHERE vec_id < 8),
        qrank AS (
          SELECT q.query_id, s.cid, q.qv,
                 row_number() OVER (PARTITION BY q.query_id
                   ORDER BY {_ccos.format(a="q.qv", b="s.cv")} DESC, s.cid ASC) AS rn
          FROM q CROSS JOIN cents2 s
        ),
        probe AS (SELECT query_id, cid, qv FROM qrank WHERE rn <= 2),
        scored AS (
          SELECT p.query_id, b.neighbor_id,
                 {_ccos.format(a="p.qv", b="b.ev")} AS sim
          FROM probe p JOIN base b USING (cid)
          WHERE b.neighbor_id <> p.query_id
        ),
        ranked AS (
          SELECT *, row_number() OVER (PARTITION BY query_id
                    ORDER BY sim DESC, neighbor_id ASC) AS rank
          FROM scored
        )
        SELECT query_id, neighbor_id, sim, rank FROM ranked WHERE rank <= 5
    """

    # exact token counts for segmented scripts; substring counts for
    # the unsegmented CJK markers (mirrors quality._word_count /
    # _substr_count — round-6 fix: padded-replace arithmetic
    # undercounted adjacent repeats and never fired on CJK)
    _tok_occ = (
        lambda w: f"CAST(len(list_filter(toks, x -> x = '{w}')) AS BIGINT)"
    )
    _sub_occ = (
        lambda w: f"CAST((length(n) - length(replace(n, '{w}', ''))) / {len(w)} AS BIGINT)"
    )
    # the oracle is GENERATED from the engine's marker table, so the
    # two sides can never drift
    from kgt.textops.quality import LANG_MARKERS as markers
    from kgt.textops.quality import UNSEGMENTED_LANGS as unseg

    score_exprs = {
        lang: " + ".join(
            (_sub_occ if lang in unseg else _tok_occ)(w) for w in ws
        )
        for lang, ws in markers.items()
    }
    scores_sql = ", ".join(
        f"({e}) AS s_{lang}" for lang, e in score_exprs.items()
    )
    max_sql = (
        "greatest(" + ", ".join(f"s_{lang}" for lang in sorted(markers)) + ")"
    )
    first_lang = (
        "CASE "
        + " ".join(
            f"WHEN s_{lang} = {max_sql} THEN '{lang}'"
            for lang in sorted(markers)
        )
        + " END"
    )
    # substring-duplication profile: identical window fingerprints
    # rebuilt with lateral generate_series + substr + md5 over the
    # same normalized text; a window is duplicated when its corpus
    # count exceeds 1
    sqls["dedup_spans"] = f"""
        WITH corpus AS ({_DUP_CORPUS_SQL}),
        t AS (
          SELECT doc_id, {_norm} AS x FROM corpus
          WHERE length({_norm}) >= 30
        ),
        pos AS (
          SELECT doc_id, x,
                 unnest(generate_series(1, length(x) - 29)) AS i
          FROM t
        ),
        w AS (SELECT doc_id, substr(x, i, 30) AS h FROM pos),
        hc AS (SELECT h, count(*) AS c FROM w GROUP BY h),
        prof AS (
          SELECT w.doc_id,
                 count(*) AS n_windows,
                 CAST(sum(CASE WHEN hc.c > 1 THEN 1 ELSE 0 END) AS BIGINT)
                     AS n_dup_windows,
                 round(CAST(sum(CASE WHEN hc.c > 1 THEN 1 ELSE 0 END) AS DOUBLE)
                       / count(*), 6) AS dup_ratio
          FROM w JOIN hc USING (h)
          GROUP BY w.doc_id
        )
        SELECT c.doc_id,
               COALESCE(prof.n_windows, CAST(0 AS BIGINT)) AS n_windows,
               COALESCE(prof.n_dup_windows, CAST(0 AS BIGINT)) AS n_dup_windows,
               prof.dup_ratio
        FROM (SELECT DISTINCT doc_id FROM corpus) c
        LEFT JOIN prof ON prof.doc_id = c.doc_id
    """

    # unigram LM: retrain the same corpus counts in SQL; avg of
    # ln(count/N) rounded 6 dp (engine log/avg agree well inside the
    # rounding margin — same convention as the cosine oracles)
    sqls["doc_unigram_logprob"] = f"""
        WITH wrds AS (
          SELECT doc_id,
                 unnest(string_split({_norm}, ' ')) AS word
          FROM documents WHERE length(trim(text)) > 0
        ),
        vc AS (SELECT word, count(*) AS c FROM wrds GROUP BY word),
        tot AS (SELECT count(*) AS n FROM wrds)
        SELECT w.doc_id,
               count(*) AS n_words,
               round(avg(ln(CAST(vc.c AS DOUBLE) / tot.n)), 6) AS avg_logprob
        FROM wrds w JOIN vc USING (word) CROSS JOIN tot
        GROUP BY w.doc_id
    """

    sqls["doc_langid"] = f"""
        WITH p0 AS (SELECT doc_id, {_norm} AS n,
                           string_split({_norm}, ' ') AS toks
                    FROM documents),
        sc AS (SELECT doc_id, {scores_sql} FROM p0)
        SELECT doc_id,
               CASE WHEN {max_sql} > 0 THEN {first_lang} ELSE 'und' END AS lang_pred,
               {max_sql} AS marker_hits
        FROM sc
    """

    sqls["doc_token_count"] = """
        SELECT doc_id,
               CASE WHEN length(trim(text)) = 0 THEN 0
                    ELSE len(regexp_split_to_array(trim(text), '\\s+')) END AS ws_tokens,
               CAST(len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]')) AS BIGINT) AS re_tokens,
               CAST(ceil(length(text) / 4.0) AS BIGINT) AS bpe_tokens_est,
               length(text) AS n_chars
        FROM documents
    """

    stop_occ = " + ".join(
        _tok_occ(w) for w in ["the", "and", "of", "a", "in"]
    )
    sqls["doc_quality"] = f"""
        WITH b AS (
          SELECT doc_id,
                 length(text) AS n_chars,
                 length(regexp_replace(text, '[^A-Za-z]', '', 'g')) AS n_alpha,
                 length(regexp_replace(text, '[^.,;:!?]', '', 'g')) AS n_punct,
                 len(regexp_split_to_array(trim(text), '\\s+')) AS n_words,
                 string_split({_norm}, ' ') AS toks
          FROM documents
        ), r AS (
          SELECT doc_id,
                 round(CAST(n_alpha AS DOUBLE) / greatest(n_chars, 1), 6) AS alpha_ratio,
                 round(CAST(n_punct AS DOUBLE) / greatest(n_chars, 1), 6) AS punct_ratio,
                 round(CAST(({stop_occ}) AS DOUBLE) / greatest(n_words, 1), 6) AS stop_ratio,
                 CASE WHEN n_chars < 20 THEN 0.2
                      WHEN n_chars < 2000 THEN 1.0 ELSE 0.6 END AS len_band
          FROM b
        )
        SELECT doc_id, alpha_ratio, punct_ratio, stop_ratio,
               round((alpha_ratio + least(stop_ratio * 5, 1.0) + len_band) / 3, 6) AS quality
        FROM r
    """

    # the corpus-curation gate: near-dup components (recursive CTE) ×
    # quality score over the SAME dup corpus → (doc_id, quality,
    # dup_drop, keep); mirrors _q_corpus_keep's composition exactly
    _quality_over_corpus = sqls["doc_quality"].replace(
        "FROM documents", "FROM corpus"
    )
    sqls["corpus_keep"] = f"""
        WITH RECURSIVE pairs AS ({_near_verified_sql}),
        edges AS (
          SELECT doc_a AS a, doc_b AS b FROM pairs
          UNION
          SELECT doc_b, doc_a FROM pairs
        ),
        nodes AS (SELECT DISTINCT a AS node FROM edges),
        reach AS (
          SELECT node, node AS comp FROM nodes
          UNION
          SELECT e.a AS node, r.comp AS comp
          FROM edges e JOIN reach r ON r.node = e.b
        ),
        comps AS (SELECT node AS doc_id, min(comp) AS comp
                  FROM reach GROUP BY node),
        corpus AS ({_DUP_CORPUS_SQL}),
        qual AS ({_quality_over_corpus})
        SELECT q.doc_id, q.quality,
               coalesce(c.comp <> c.doc_id, FALSE) AS dup_drop,
               (q.quality >= 0.67)
                 AND NOT coalesce(c.comp <> c.doc_id, FALSE) AS keep
        FROM qual q LEFT JOIN comps c ON c.doc_id = q.doc_id
    """

    sqls["multimodal_decode"] = """
        SELECT doc_id, 'image/fake' AS media_type,
               CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
               md5(text) AS checksum,
               CAST(('0x' || substr(md5(text), 1, 4))::INTEGER % 1024 + 1 AS INTEGER) AS width,
               CAST(('0x' || substr(md5(text), 5, 4))::INTEGER % 1024 + 1 AS INTEGER) AS height
        FROM documents
    """

    # the REAL codec path: dims + pixel-byte sum of the deterministic
    # PNGs reproduced arithmetically — the Spark side must round-trip
    # actual zlib/CRC/filter bytes to land on these numbers
    # pixel_sum closed form: sum_{i<n} (a+i) mod 256 with a=(31*doc_id)
    # mod 256 = full 0..255 cycles (32640 each) + a possibly-wrapping
    # arithmetic remainder
    sqls["multimodal_decode_real"] = """
        WITH dims AS (
          SELECT doc_id,
                 CAST(length(text) % 40 + 1 AS INTEGER) AS width,
                 CAST((length(text) * 7) % 40 + 1 AS INTEGER) AS height,
                 (doc_id * 31) % 256 AS a,
                 (length(text) % 40 + 1) * ((length(text) * 7) % 40 + 1) * 3 AS n
          FROM documents
        )
        SELECT doc_id, width, height,
               CAST(n AS BIGINT) AS n_pixel_bytes,
               CAST((n // 256) * 32640 +
                 CASE WHEN a + (n % 256) <= 256
                      THEN (n % 256) * a + (n % 256) * ((n % 256) - 1) // 2
                      ELSE (256 - a) * a + (256 - a) * (255 - a) // 2
                           + ((n % 256) - 256 + a) * ((n % 256) - 256 + a - 1) // 2
                 END AS BIGINT) AS pixel_sum
        FROM dims
    """

    # JPEG twin: solid-color fixtures decode through the exact DC-only
    # path, so the decoded color is closed-form (see
    # kgt.textops.jpeg.solid_color_roundtrip): JFIF RGB→YCbCr with
    # floor(x+0.5), per-channel DC quantization at the quality-75
    # table heads (luma 16→8, chroma 17→9 under the libjpeg scaling),
    # exact reconstruction floor(k·q/8 + 128.5), YCbCr→RGB floor+0.5.
    # sign()·floor(abs()/q + 0.5) is half-away-from-zero, matching the
    # codec's _quantize. Subsampling (4:4:4 vs 4:2:0 by doc parity)
    # does not change a constant image, so one closed form covers both.
    sqls["multimodal_jpeg_real"] = """
        WITH cdims AS (
          SELECT doc_id,
                 CAST(length(text) % 29 + 1 AS INTEGER) AS width,
                 CAST((length(text) * 5) % 23 + 1 AS INTEGER) AS height,
                 CAST((doc_id * 37) % 256 AS DOUBLE) AS r,
                 CAST((doc_id * 57) % 256 AS DOUBLE) AS g,
                 CAST((doc_id * 77) % 256 AS DOUBLE) AS b
          FROM documents
        ),
        ycc AS (
          SELECT doc_id, width, height,
                 least(255.0, greatest(0.0, floor(0.299*r + 0.587*g + 0.114*b + 0.5))) AS y,
                 least(255.0, greatest(0.0, floor(-0.168736*r - 0.331264*g + 0.5*b + 128.0 + 0.5))) AS cb,
                 least(255.0, greatest(0.0, floor(0.5*r - 0.418688*g - 0.081312*b + 128.0 + 0.5))) AS cr
          FROM cdims
        ),
        dcq AS (
          SELECT doc_id, width, height,
                 least(255.0, greatest(0.0, floor(
                   sign(8.0*(y-128.0)) * floor(abs(8.0*(y-128.0))/8.0 + 0.5) * 8.0/8.0 + 128.5))) AS y2,
                 least(255.0, greatest(0.0, floor(
                   sign(8.0*(cb-128.0)) * floor(abs(8.0*(cb-128.0))/9.0 + 0.5) * 9.0/8.0 + 128.5))) AS cb2,
                 least(255.0, greatest(0.0, floor(
                   sign(8.0*(cr-128.0)) * floor(abs(8.0*(cr-128.0))/9.0 + 0.5) * 9.0/8.0 + 128.5))) AS cr2
          FROM ycc
        ),
        rgb2 AS (
          SELECT doc_id, width, height,
                 least(255.0, greatest(0.0, floor(y2 + 1.402*(cr2-128.0) + 0.5))) AS r2,
                 least(255.0, greatest(0.0, floor(y2 - 0.344136*(cb2-128.0) - 0.714136*(cr2-128.0) + 0.5))) AS g2,
                 least(255.0, greatest(0.0, floor(y2 + 1.772*(cb2-128.0) + 0.5))) AS b2
          FROM dcq
        )
        SELECT doc_id, width, height,
               CAST(width * height * 3 AS BIGINT) AS n_pixel_bytes,
               CAST(width * height * CAST(r2 + g2 + b2 AS BIGINT) AS BIGINT) AS pixel_sum
        FROM rgb2
    """

    # resize_real: JPEG solid-color closed form (multipliers 41/61/83,
    # same quality-75 DC chain as multimodal_jpeg_real) + the integer
    # nearest-neighbor dims max(1, side·16 // longest); a constant
    # image is invariant under nearest-neighbor, so the resized pixel
    # sum is rw·rh·(r2+g2+b2)
    sqls["multimodal_resize_real"] = """
        WITH cdims AS (
          SELECT doc_id,
                 CAST(length(text) % 23 + 17 AS INTEGER) AS w,
                 CAST((length(text) * 3) % 19 + 17 AS INTEGER) AS h,
                 CAST((doc_id * 41) % 256 AS DOUBLE) AS r,
                 CAST((doc_id * 61) % 256 AS DOUBLE) AS g,
                 CAST((doc_id * 83) % 256 AS DOUBLE) AS b
          FROM documents
        ),
        rdims AS (
          SELECT doc_id, r, g, b,
                 CAST(greatest(1, (w * 16) // greatest(w, h)) AS INTEGER) AS width,
                 CAST(greatest(1, (h * 16) // greatest(w, h)) AS INTEGER) AS height
          FROM cdims
        ),
        ycc AS (
          SELECT doc_id, width, height,
                 least(255.0, greatest(0.0, floor(0.299*r + 0.587*g + 0.114*b + 0.5))) AS y,
                 least(255.0, greatest(0.0, floor(-0.168736*r - 0.331264*g + 0.5*b + 128.0 + 0.5))) AS cb,
                 least(255.0, greatest(0.0, floor(0.5*r - 0.418688*g - 0.081312*b + 128.0 + 0.5))) AS cr
          FROM rdims
        ),
        dcq AS (
          SELECT doc_id, width, height,
                 least(255.0, greatest(0.0, floor(
                   sign(8.0*(y-128.0)) * floor(abs(8.0*(y-128.0))/8.0 + 0.5) * 8.0/8.0 + 128.5))) AS y2,
                 least(255.0, greatest(0.0, floor(
                   sign(8.0*(cb-128.0)) * floor(abs(8.0*(cb-128.0))/9.0 + 0.5) * 9.0/8.0 + 128.5))) AS cb2,
                 least(255.0, greatest(0.0, floor(
                   sign(8.0*(cr-128.0)) * floor(abs(8.0*(cr-128.0))/9.0 + 0.5) * 9.0/8.0 + 128.5))) AS cr2
          FROM ycc
        ),
        rgb2 AS (
          SELECT doc_id, width, height,
                 least(255.0, greatest(0.0, floor(y2 + 1.402*(cr2-128.0) + 0.5))) AS r2,
                 least(255.0, greatest(0.0, floor(y2 - 0.344136*(cb2-128.0) - 0.714136*(cr2-128.0) + 0.5))) AS g2,
                 least(255.0, greatest(0.0, floor(y2 + 1.772*(cb2-128.0) + 0.5))) AS b2
          FROM dcq
        )
        SELECT doc_id, width, height,
               CAST(width * height * 3 AS BIGINT) AS n_pixel_bytes,
               CAST(width * height * CAST(r2 + g2 + b2 AS BIGINT) AS BIGINT) AS pixel_sum
        FROM rgb2
    """

    # unified media scan: per-format CASE of the same closed forms the
    # individual codec oracles use; t = doc_id%9 routes the format
    sqls["multimodal_media_meta"] = """
        WITH d AS (
          SELECT doc_id, doc_id % 9 AS t, length(text) AS L FROM documents
        )
        SELECT doc_id,
               CASE t WHEN 0 THEN 'image/png' WHEN 1 THEN 'image/jpeg'
                      WHEN 2 THEN 'image/gif' WHEN 3 THEN 'audio/wav'
                      WHEN 4 THEN 'video/y4m' WHEN 5 THEN 'video/mp4'
                      WHEN 6 THEN 'audio/mpeg' WHEN 7 THEN 'image/webp'
                      ELSE 'video/matroska' END AS media_type,
               CAST(CASE t WHEN 0 THEN L % 20 + 1 WHEN 1 THEN L % 29 + 1
                    WHEN 2 THEN L % 21 + 4 WHEN 4 THEN (L % 10 + 1) * 2
                    WHEN 5 THEN (doc_id * 16) % 1920 + 2
                    WHEN 7 THEN (doc_id * 11) % 1000 + 1
                    WHEN 8 THEN (doc_id * 8) % 1000 + 2
                    ELSE NULL END AS INTEGER) AS width,
               CAST(CASE t WHEN 0 THEN (L * 3) % 20 + 1
                    WHEN 1 THEN (L * 5) % 23 + 1
                    WHEN 2 THEN (L * 7) % 17 + 4
                    WHEN 4 THEN (L % 7 + 1) * 2
                    WHEN 5 THEN (doc_id * 9) % 1080 + 2
                    WHEN 7 THEN (doc_id * 17) % 800 + 1
                    WHEN 8 THEN (doc_id * 5) % 700 + 2
                    ELSE NULL END AS INTEGER) AS height,
               CAST(CASE t WHEN 0 THEN 1 WHEN 1 THEN 1
                    WHEN 2 THEN doc_id % 3 + 1 WHEN 4 THEN doc_id % 4 + 1
                    WHEN 6 THEN L % 20 + 1 WHEN 7 THEN 1
                    ELSE NULL END AS INTEGER) AS n_frames,
               CAST(CASE t WHEN 3 THEN 8000 * (doc_id % 3 + 1)
                    WHEN 5 THEN 48000
                    WHEN 6 THEN CASE doc_id % 3 WHEN 0 THEN 44100
                         WHEN 1 THEN 48000 ELSE 32000 END
                    WHEN 8 THEN CASE doc_id % 3 WHEN 0 THEN 48000
                         WHEN 1 THEN 44100 ELSE 32000 END
                    ELSE NULL END AS INTEGER) AS sample_rate,
               CAST(CASE t WHEN 3 THEN doc_id % 2 + 1
                    WHEN 6 THEN 1 + doc_id % 2
                    WHEN 8 THEN doc_id % 2 + 1
                    ELSE NULL END AS INTEGER) AS channels,
               CAST(CASE t
                    WHEN 2 THEN (doc_id % 3 + 1) * (doc_id % 3 + 2) * 10
                    WHEN 3 THEN floor(1000.0 * (L % 80 + 1)
                                      / (8000 * (doc_id % 3 + 1)) + 0.5)
                    WHEN 4 THEN (doc_id % 4 + 1) * 40
                    WHEN 5 THEN (doc_id * 13) % 5000 + 1000
                    WHEN 6 THEN floor(1000.0 * (L % 20 + 1) * 1152
                         / (CASE doc_id % 3 WHEN 0 THEN 44100
                            WHEN 1 THEN 48000 ELSE 32000 END) + 0.5)
                    WHEN 8 THEN (doc_id * 19) % 6000 + 500
                    ELSE NULL END AS BIGINT) AS duration_ms
        FROM d
    """

    # GIF oracle: lossless codec → exact closed form. Per (frame,
    # color): count of pixels with (doc_id+f+i) % C == c over i<w·h is
    # wh//C plus 1 when the color falls in the cycle remainder;
    # pixel_sum = Σ count · ((c·7)%256 + (c·11)%256 + (c·13)%256).
    # Delays (f+1)·2 cs sum to nf·(nf+1).
    sqls["multimodal_gif_real"] = """
        WITH d AS (
          SELECT doc_id,
                 CAST(length(text) % 21 + 4 AS INTEGER) AS w,
                 CAST((length(text) * 7) % 17 + 4 AS INTEGER) AS h,
                 CAST(CASE doc_id % 3 WHEN 0 THEN 8 WHEN 1 THEN 16
                      ELSE 32 END AS INTEGER) AS C,
                 CAST(doc_id % 3 + 1 AS INTEGER) AS nf
          FROM documents
        ),
        x AS (
          SELECT d.doc_id, d.w, d.h, d.nf,
                 (d.w * d.h) // d.C
                 + CASE WHEN ((c.c - (d.doc_id + f.f)) % d.C + d.C) % d.C
                        < (d.w * d.h) % d.C THEN 1 ELSE 0 END AS cnt,
                 (c.c * 7) % 256 + (c.c * 11) % 256 + (c.c * 13) % 256 AS rgbsum
          FROM d
          CROSS JOIN generate_series(0, 2) f(f)
          CROSS JOIN generate_series(0, 31) c(c)
          WHERE f.f < d.nf AND c.c < d.C
        )
        SELECT doc_id,
               CAST(max(w) AS INTEGER) AS width,
               CAST(max(h) AS INTEGER) AS height,
               CAST(max(nf) AS INTEGER) AS n_frames,
               CAST(SUM(cnt * rgbsum) AS BIGINT) AS pixel_sum,
               CAST(max(nf) * (max(nf) + 1) AS BIGINT) AS delay_total_cs
        FROM x GROUP BY doc_id
    """

    # MP3 frame-walker oracle: every field recomputed arithmetically.
    # duration: MPEG-1 Layer III = 1152 samples/frame; at 48000/32000
    # the ms value is exact (24n/36n) and at 44100 it is never an
    # exact .5, so floor(x+0.5) ≡ Python round here. ID3 size is
    # 10 + payload only when a payload exists.
    sqls["multimodal_mp3_meta"] = """
        SELECT doc_id,
               CAST(length(text) % 20 + 1 AS INTEGER) AS n_frames,
               CAST(CASE doc_id % 3 WHEN 0 THEN 44100 WHEN 1 THEN 48000
                    ELSE 32000 END AS INTEGER) AS sample_rate,
               CAST(1 + doc_id % 2 AS INTEGER) AS channels,
               CAST(floor(1000.0 * (length(text) % 20 + 1) * 1152 /
                    (CASE doc_id % 3 WHEN 0 THEN 44100 WHEN 1 THEN 48000
                     ELSE 32000 END) + 0.5) AS BIGINT) AS duration_ms,
               CAST(CASE doc_id % 8 WHEN 0 THEN 32 WHEN 1 THEN 64
                    WHEN 2 THEN 96 WHEN 3 THEN 128 WHEN 4 THEN 160
                    WHEN 5 THEN 192 WHEN 6 THEN 256 ELSE 320
                    END AS INTEGER) AS bitrate_kbps,
               CAST(CASE WHEN doc_id % 100 = 0 THEN 0
                    ELSE 10 + doc_id % 100 END AS BIGINT) AS id3v2_bytes
        FROM documents
    """

    # MP4 box-walker oracle: timescale 1000 makes duration_ms exact;
    # dims survive the 16.16 round trip exactly (integers << 16)
    sqls["multimodal_mp4_meta"] = """
        SELECT doc_id,
               'isom' AS major_brand,
               CAST((doc_id * 13) % 5000 + 1000 AS BIGINT) AS duration_ms,
               CAST(2 AS INTEGER) AS n_tracks,
               CAST((doc_id * 16) % 1920 + 2 AS INTEGER) AS video_w,
               CAST((doc_id * 9) % 1080 + 2 AS INTEGER) AS video_h,
               'avc1' AS video_codec,
               'mp4a' AS audio_codec,
               CAST(48000 AS INTEGER) AS audio_rate
        FROM documents
    """

    # WAV twin of the PNG oracle: same wraparound-sum CASE at modulus
    # 65536, then the signed-PCM shift (-32768 per sample). n < 65536
    # always (<= 160 samples), so the sum never wraps twice.
    sqls["multimodal_audio_real"] = """
        WITH dims AS (
          SELECT doc_id,
                 CAST(doc_id % 2 + 1 AS INTEGER) AS n_channels,
                 CAST(8000 * (doc_id % 3 + 1) AS INTEGER) AS sample_rate,
                 CAST(length(text) % 80 + 1 AS BIGINT) AS n_frames,
                 (doc_id * 7) % 65536 AS a,
                 (length(text) % 80 + 1) * (doc_id % 2 + 1) AS n
          FROM documents
        )
        SELECT doc_id, n_channels, sample_rate,
               CAST(16 AS INTEGER) AS bits,
               n_frames,
               CAST(
                 CASE WHEN a + n <= 65536
                      THEN n * a + n * (n - 1) // 2
                      ELSE (65536 - a) * a + (65536 - a) * (65535 - a) // 2
                           + (n - 65536 + a) * (n - 65536 + a - 1) // 2
                 END - n * 32768 AS BIGINT) AS pcm_sum
        FROM dims
    """

    # Y4M triplet of the PNG/WAV oracles: frame fan-out via
    # unnest(range(T)), per-frame byte sum via the mod-256 wraparound
    # CASE with a = (doc_id + f*31) % 256
    sqls["multimodal_video_real"] = """
        WITH dims AS (
          SELECT doc_id,
                 CAST((length(text) % 16 + 1) * 2 AS INTEGER) AS width,
                 CAST(((length(text) * 3) % 16 + 1) * 2 AS INTEGER) AS height,
                 length(text) % 7 + 2 AS T,
                 (length(text) % 16 + 1) * 2
                   * ((length(text) * 3) % 16 + 1) * 2 * 3 // 2 AS n
          FROM documents
        ), frames AS (
          SELECT doc_id, width, height, n,
                 CAST(unnest(range(0, T)) AS INTEGER) AS frame_idx
          FROM dims
        )
        SELECT doc_id, frame_idx, width, height,
               CAST(frame_idx * 40 AS BIGINT) AS ts_ms,
               CAST((n // 256) * 32640 +
                 CASE WHEN (doc_id + frame_idx * 31) % 256 + (n % 256) <= 256
                      THEN (n % 256) * ((doc_id + frame_idx * 31) % 256)
                           + (n % 256) * ((n % 256) - 1) // 2
                      ELSE (256 - (doc_id + frame_idx * 31) % 256)
                             * ((doc_id + frame_idx * 31) % 256)
                           + (256 - (doc_id + frame_idx * 31) % 256)
                             * (255 - (doc_id + frame_idx * 31) % 256) // 2
                           + ((n % 256) - 256 + (doc_id + frame_idx * 31) % 256)
                             * ((n % 256) - 256 + (doc_id + frame_idx * 31) % 256 - 1) // 2
                 END AS BIGINT) AS frame_sum
        FROM frames
    """

    sqls["multimodal_resize"] = """
        WITH m AS (
          SELECT doc_id, 'image/fake' AS media_type,
                 CAST(('0x' || substr(md5(text), 1, 4))::INTEGER % 1024 + 1 AS INTEGER) AS width,
                 CAST(('0x' || substr(md5(text), 5, 4))::INTEGER % 1024 + 1 AS INTEGER) AS height
          FROM documents
        )
        SELECT doc_id, media_type, width, height,
               CAST(CASE WHEN greatest(width, height) <= 256 THEN width
                    ELSE greatest(1, (width * 256) // greatest(width, height))
                    END AS INTEGER) AS resized_width,
               CAST(CASE WHEN greatest(width, height) <= 256 THEN height
                    ELSE greatest(1, (height * 256) // greatest(width, height))
                    END AS INTEGER) AS resized_height
        FROM m
    """

    sqls["multimodal_frames"] = """
        WITH m AS (
          SELECT doc_id, md5(text) AS cs,
                 octet_length(encode(text)) % 100000 AS dur
          FROM documents
        )
        SELECT doc_id,
               CAST(i AS INTEGER) AS frame_idx,
               CAST((i * dur) // 4 AS BIGINT) AS ts_ms,
               md5(cs || ':' || CAST(i AS VARCHAR)) AS frame_checksum
        FROM (SELECT doc_id, cs, dur, unnest(generate_series(0, 3)) AS i FROM m)
    """

    # ---------------------------------------------------------------
    # suite consolidation: the per-variant SQLs above stay the source
    # of truth; the driver-facing keys wrap them so every operator
    # family fits the driver's 50-slot window (variant values = the
    # former standalone query names).
    # ---------------------------------------------------------------
    sqls["dedup_near_pairs"] = f"""
        SELECT 'dedup_minhash_lsh' AS variant, doc_a, doc_b,
               CAST(NULL AS DOUBLE) AS jaccard
        FROM ({sqls.pop("dedup_minhash_lsh")})
        UNION ALL
        SELECT 'dedup_ngram_jaccard' AS variant, doc_a, doc_b, jaccard
        FROM ({sqls.pop("dedup_ngram_jaccard")})
        UNION ALL
        SELECT 'dedup_near_verified' AS variant, doc_a, doc_b, jaccard
        FROM ({sqls.pop("dedup_near_verified")})
    """

    _clusters_sql = sqls.pop("dedup_clusters")
    sqls.pop("dedup_clusters_star")  # same SQL — both variants share it
    sqls["dedup_clusters_suite"] = f"""
        SELECT 'dedup_clusters' AS variant, doc_id, comp
        FROM ({_clusters_sql})
        UNION ALL
        SELECT 'dedup_clusters_star' AS variant, doc_id, comp
        FROM ({_clusters_sql})
    """

    sqls["sim_topk_suite"] = f"""
        SELECT 'sim_topk' AS variant, query_id, neighbor_id, sim, rank
        FROM ({sqls.pop("sim_topk")})
        UNION ALL
        SELECT 'sim_topk_ivf' AS variant, query_id, neighbor_id, sim, rank
        FROM ({sqls.pop("sim_topk_ivf")})
        UNION ALL
        SELECT 'sim_topk_ivf_join' AS variant, query_id, neighbor_id, sim, rank
        FROM ({sqls.pop("sim_topk_ivf_join")})
        UNION ALL
        SELECT 'sim_topk_ivf_trained' AS variant, query_id, neighbor_id, sim, rank
        FROM ({sqls.pop("sim_topk_ivf_trained")})
    """

    # LM columns join LEFT (unigram_logprob drops wordless docs by
    # construction; every document still gets a signals row)
    sqls["doc_signals"] = f"""
        SELECT doc_id, COALESCE(lm.n_words, 0) AS n_words,
               lm.avg_logprob, lang_pred, marker_hits,
               ws_tokens, re_tokens, bpe_tokens_est, n_chars,
               alpha_ratio, punct_ratio, stop_ratio, quality,
               fp_exact, fp_rolling_min
        FROM ({sqls.pop("doc_langid")}) li
        JOIN ({sqls.pop("doc_token_count")}) tc USING (doc_id)
        JOIN ({sqls.pop("doc_quality")}) q USING (doc_id)
        JOIN ({sqls.pop("doc_fingerprint")}) fp USING (doc_id)
        LEFT JOIN ({sqls.pop("doc_unigram_logprob")}) lm USING (doc_id)
    """

    # the streaming state machine must emit exactly the batch LSH
    # candidate pair set on the same corpus (the former
    # dedup_minhash_lsh SQL, re-derived from its wrapped form)
    sqls["streaming_near_dup"] = f"""
        SELECT doc_a, doc_b
        FROM ({sqls["dedup_near_pairs"]})
        WHERE variant = 'dedup_minhash_lsh'
    """

    return sqls
