"""Deterministic synthetic transcript corpora.

Two sources:

  * ``orders_transcripts`` / ``customer_bnode_transcripts`` — multi-turn
    conversations whose text carries Turtle deterministically derived
    from the driver's TPC-H-ish tables. Because the payload is a pure
    function of table rows, the expected triples are expressible in
    ANSI SQL — this is what makes the parse pipeline ORACLE-CHECKABLE
    end-to-end (DuckDB derives the same triples directly).

  * ``grammar_corpus`` — a seeded corpus cycling through the reference
    test suite's payload classes (FIXTURES.md §1: directives, pname
    escapes, literal forms, bnodes, collections, rdf-star, recovery)
    for the grammar-fidelity pytest suite and the bench harness.

Everything is generated with Spark expressions (no driver-side loops),
so corpus size scales with spark.range().
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

# role cycle per FIXTURES.md: user / assistant / tool
_ROLES = ["user", "assistant", "tool"]


def _turns_from_lines(df: DataFrame) -> DataFrame:
    """(conv_id, lines array<string>) → transcript rows, shuffled order.

    Rows get a deterministic pseudo-shuffle (sorted by a hash) so the
    window/sort over turn_idx is load-bearing in tests, per FIXTURES.md.

    The input is fanned out to the session's core count FIRST: the
    driver's tables are single parquet files (one input split), so
    without this the posexplode + per-turn text expressions — the
    single most expensive Catalyst stage of corpus generation — run on
    one core and then feed the pseudo-shuffle exchange from one task.
    The fan-out shuffles only the pre-explode rows (1 row per conv, ~7×
    fewer than post-explode) and is scale-adaptive (defaultParallelism).
    """
    df = df.repartition(
        df.sparkSession.sparkContext.defaultParallelism, "conv_id"
    )
    out = (
        df.select(
            "conv_id",
            F.posexplode("lines").alias("turn_idx", "text"),
        )
        .withColumn(
            "role",
            F.element_at(
                F.array(*[F.lit(r) for r in _ROLES]),
                (F.col("turn_idx") % 3 + 1).cast("int"),
            ),
        )
        .withColumn(
            "tool",
            F.when(F.col("role") == "tool", F.lit("turtle_emitter")),
        )
        .withColumn(
            "ts",
            F.to_timestamp(F.lit("2026-01-01 00:00:00")) + F.make_interval(
                mins=F.col("turn_idx")
            ),
        )
        .withColumn("turn_idx", F.col("turn_idx").cast("int"))
        .select("conv_id", "turn_idx", "role", "text", "tool", "ts")
    )
    # deterministic shuffle: order rows by content hash
    return out.repartition(F.xxhash64("conv_id", "turn_idx")).sortWithinPartitions(
        F.xxhash64("turn_idx", "conv_id")
    )


def orders_transcripts(spark: SparkSession, sf_dir: str, with_errors: bool = False) -> DataFrame:
    """Multi-turn Turtle transcripts derived from the orders table.

    Per order (conv_id 'o<key>'), the reassembled document is:

        @prefix ord: <urn:ord:> .
        @prefix p: <urn:p:> .
        ord:<key> a p:Order ;
          p:cust <urn:cust:<custkey>> ;
          p:status "<status>" ;
          p:total <floor(totalprice)> ;
          p:priority "<priority>"@en, "alt" .

    → 6 triples/order (the object list exercises ',' fan-out and the
    streaming-writer ',' separator). With ``with_errors``, orders with
    key % 10 == 0
    get one extra malformed statement (lexer-level error) that recovery
    must drop without losing the good triples.
    """
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    key = F.col("o_orderkey").cast("string")
    lines = [
        F.lit("@prefix ord: <urn:ord:> ."),
        F.lit("@prefix p: <urn:p:> ."),
        F.concat(F.lit("ord:"), key, F.lit(" a p:Order ;")),
        F.concat(
            F.lit("  p:cust <urn:cust:"),
            F.col("o_custkey").cast("string"),
            F.lit("> ;"),
        ),
        F.concat(F.lit('  p:status "'), F.col("o_orderstatus"), F.lit('" ;')),
        F.concat(
            F.lit("  p:total "),
            F.floor("o_totalprice").cast("long").cast("string"),
            F.lit(" ;"),
        ),
        F.concat(
            F.lit('  p:priority "'),
            F.col("o_orderpriority"),
            F.lit('"@en, "alt" .'),
        ),
    ]
    arr = F.array(*lines)
    if with_errors:
        bad = F.concat(F.lit("ord:"), key, F.lit(" p:bad _:-x ."))
        arr = F.when(
            F.col("o_orderkey") % 10 == 0, F.concat(arr, F.array(bad))
        ).otherwise(arr)
    docs = orders.select(
        F.concat(F.lit("o"), key).alias("conv_id"), arr.alias("lines")
    )
    return _turns_from_lines(docs)


def customer_bnode_transcripts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Transcripts exercising bnode property lists + collections,
    derived from the customer table (conv_id 'b<key>'):

        @prefix c: <urn:cust:> .
        @prefix p: <urn:p:> .
        c:<key> p:acct [ p:bal <floor(acctbal)> ; p:seg "<segment>" ] ;
          p:tags ("A" "<name>" c:<key>) .

    → 10 triples/customer with 4 deterministic skolemized bnodes
    (g0 property list; g1..g3 collection cells).
    """
    cust = spark.read.parquet(f"{sf_dir}/customer.parquet")
    key = F.col("c_custkey").cast("string")
    lines = [
        F.lit("@prefix c: <urn:cust:> ."),
        F.lit("@prefix p: <urn:p:> ."),
        F.concat(
            F.lit("c:"),
            key,
            F.lit(" p:acct [ p:bal "),
            F.floor("c_acctbal").cast("long").cast("string"),
            F.lit(' ; p:seg "'),
            F.col("c_mktsegment"),
            F.lit('" ] ;'),
        ),
        F.concat(
            F.lit('  p:tags ("A" "'),
            F.col("c_name"),
            F.lit('" c:'),
            key,
            F.lit(") ."),
        ),
    ]
    docs = cust.select(
        F.concat(F.lit("b"), key).alias("conv_id"),
        F.array(*lines).alias("lines"),
    )
    return _turns_from_lines(docs)


# ---------------------------------------------------------------------
# Grammar-exercising corpus (FIXTURES.md payload classes)
# ---------------------------------------------------------------------

_PAYLOAD_TEMPLATES = [
    # 0 simple-triple
    '<http://example/s{i}> <http://xmlns.com/foaf/0.1/name> "N{i}" .',
    # 1 directives + pnames
    "@prefix ex: <http://ex{i}.org/> .\nex:a{i} ex:p ex:b{i} .",
    # 2 literal forms
    '<tag:s{i}> <tag:p> 1{i}, 1.{i}, .{i}e2, true, "x{i}"@en-US, "d"^^<tag:dt> .',
    # 3 bnode structures
    "<tag:s{i}> <tag:p> [ <tag:q> \"v{i}\" ; <tag:r> _:shared{i} ] .",
    # 4 collections
    '@prefix : <http://e{i}/> . :g :l ("a" "b{i}" :c) .',
    # 5 long strings + escapes
    '<tag:s{i}> <tag:p> """line1\nline\\t{i}""" .',
    # 6 predicate/object lists
    "<tag:s{i}> <tag:p1> <tag:o1> ; <tag:p2> \"l{i}\", \"m\" .",
    # 7 relative IRIs vs base
    "@base <http://b{i}/dir/> . <sub> <tag:p> <../up{i}> .",
]


def grammar_corpus(spark: SparkSession, n_convs: int) -> DataFrame:
    """n_convs conversations cycling the payload template classes;
    each conversation = 3 payload statements split across turns."""
    base = spark.range(n_convs).select(
        F.concat(F.lit("g"), F.col("id").cast("string")).alias("conv_id"),
        F.col("id"),
    )
    texts = []
    for j in range(3):
        idx = (F.col("id") * 3 + j) % len(_PAYLOAD_TEMPLATES)
        parts = []
        for k, tpl in enumerate(_PAYLOAD_TEMPLATES):
            # render {i} with a per-conv integer via format_string
            fmt = tpl.replace("{i}", "%s")
            n = fmt.count("%s")
            args = [F.col("id").cast("string")] * n
            rendered = F.format_string(fmt, *args) if n else F.lit(tpl)
            parts.append((k, rendered))
        expr = None
        for k, rendered in parts:
            cond = idx == k
            expr = F.when(cond, rendered) if expr is None else expr.when(cond, rendered)
        texts.append(expr)
    docs = base.select(
        "conv_id",
        F.flatten(
            F.array(*[F.split(t, "\n") for t in texts])
        ).alias("lines"),
    )
    return _turns_from_lines(docs)
