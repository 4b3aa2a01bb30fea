"""Spark pipeline integration tests: reassembly invariant, extraction,
skolem determinism, quarantine, entity linking.

Run via `python -m pytest -x -q` (the driver's gate). These need a
local SparkSession (session fixture, local[4]).
"""

import pytest
from pyspark.sql import functions as F

pytestmark = pytest.mark.spark


def test_per_turn_text_equality(spark, sf_dir):
    """input_hint invariant: reassembled doc == '\\n'-join of turn texts
    under stable turn ordering, regardless of row order on disk."""
    from kgt.spark.parse import reassemble
    from kgt.spark.transcripts import orders_transcripts

    tx = orders_transcripts(spark, sf_dir).cache()
    docs = {r["conv_id"]: r["text"] for r in reassemble(tx).collect()}
    turns = tx.orderBy("conv_id", "turn_idx").collect()
    by_conv = {}
    for r in turns:
        by_conv.setdefault(r["conv_id"], []).append((r["turn_idx"], r["text"]))
    assert set(docs) == set(by_conv)
    for conv_id, pairs in by_conv.items():
        idxs = [i for i, _ in pairs]
        assert idxs == sorted(idxs)
        assert docs[conv_id] == "\n".join(t for _, t in pairs)
    tx.unpersist()


def test_transcript_schema(spark, sf_dir):
    from kgt.spark.transcripts import orders_transcripts

    tx = orders_transcripts(spark, sf_dir)
    assert [f.name for f in tx.schema.fields] == [
        "conv_id",
        "turn_idx",
        "role",
        "text",
        "tool",
        "ts",
    ]
    types = {f.name: f.dataType.simpleString() for f in tx.schema.fields}
    assert types["turn_idx"] == "int"
    assert types["ts"] == "timestamp"


def test_extract_counts_and_quarantine(spark, sf_dir):
    from kgt.spark.parse import errors, extract_triples, triples
    from kgt.spark.transcripts import orders_transcripts

    n_orders = spark.read.parquet(f"{sf_dir}/orders.parquet").count()
    ext = extract_triples(
        orders_transcripts(spark, sf_dir, with_errors=True)
    ).cache()
    # every order yields its 6 triples even when its doc has a bad stmt
    assert triples(ext).count() == 6 * n_orders
    bad_convs = errors(ext).select("conv_id").distinct().count()
    n_bad = spark.read.parquet(f"{sf_dir}/orders.parquet").filter(
        F.col("o_orderkey") % 10 == 0
    ).count()
    assert bad_convs == n_bad
    ext.unpersist()


def test_skolem_determinism_across_runs(spark, sf_dir):
    """Re-running extraction yields byte-identical skolem labels
    (content-hash, not counter/partition-dependent) — the task-retry
    stability requirement."""
    from kgt.spark.parse import extract_triples, triples
    from kgt.spark.transcripts import customer_bnode_transcripts

    def run(parts):
        tx = customer_bnode_transcripts(spark, sf_dir).repartition(parts)
        rows = (
            triples(extract_triples(tx))
            .orderBy("conv_id", "stmt_idx")
            .collect()
        )
        return [(r["conv_id"], r["stmt_idx"], r["subj"], r["obj"]) for r in rows]

    assert run(2) == run(7)


def test_grammar_corpus_parses_clean(spark):
    from kgt.spark.parse import errors, extract_triples, triples
    from kgt.spark.transcripts import grammar_corpus

    ext = extract_triples(grammar_corpus(spark, 64), rdfstar=True).cache()
    assert errors(ext).count() == 0
    assert triples(ext).count() > 64  # every conv emits something
    ext.unpersist()


def test_entity_linking(spark, sf_dir):
    from kgt.spark.link import detect_mentions, link_mentions
    from kgt.spark.transcripts import orders_transcripts

    tx = orders_transcripts(spark, sf_dir)
    iri_dict = spark.createDataFrame(
        [("user", "urn:agent:user"), ("turtle_emitter", "urn:tool:te")],
        "surface string, iri string",
    )
    linked = link_mentions(detect_mentions(tx), iri_dict).cache()
    assert linked.filter(
        (F.col("kind") == "role") & (F.col("surface") == "user")
    ).filter(F.col("iri") != "urn:agent:user").count() == 0
    # unlinked mentions present (assistant role has no dict entry)
    assert linked.filter(F.col("iri").isNull()).count() > 0
    linked.unpersist()


def test_fuzzy_link(spark):
    from kgt.spark.link import fuzzy_link

    surfaces = spark.createDataFrame(
        [("turtle emiter",), ("assistnat",), ("zzzz",)], "surface string"
    )
    d = spark.createDataFrame(
        [
            ("turtle_emitter", "urn:tool:te"),
            ("assistant", "urn:agent:assistant"),
        ],
        "surface string, iri string",
    )
    got = {r["surface"]: r["iri"] for r in fuzzy_link(surfaces, d, min_jaccard=0.3).collect()}
    assert got.get("turtle emiter") == "urn:tool:te"
    assert got.get("assistnat") == "urn:agent:assistant"
    assert "zzzz" not in got


def test_fuzzy_link_hybrid_blocking(spark):
    """Short surfaces (≤ n_hashes kept grams) block on exact gram keys
    — variance-free, so a true near-match can NEVER be missed by
    minhash luck; long surfaces go through banded LSH, which must find
    high-jaccard pairs and suppress disjoint ones."""
    from kgt.spark.link import _gram_tables, fuzzy_candidates, fuzzy_link

    long_a = " ".join(f"tok{i}" for i in range(30))
    long_b = " ".join(f"tok{i}" for i in range(29)) + " tokX"  # high j
    unrelated = " ".join(f"zzz{i}" for i in range(30))  # disjoint
    surfaces = spark.createDataFrame(
        [(long_b,), ("cart",)], "surface string"
    )
    d = spark.createDataFrame(
        [(long_a, "urn:e:long"), (unrelated, "urn:e:other"), ("card", "urn:e:card")],
        "surface string, iri string",
    )
    got = {r["surface"]: r["iri"] for r in fuzzy_link(surfaces, d, min_jaccard=0.3).collect()}
    assert got.get(long_b) == "urn:e:long"  # LSH path found the near-dup
    assert got.get("cart") == "urn:e:card"  # gram-key path: j=3/9≈0.33
    # blocking suppresses the disjoint pair entirely
    sg, dg = _gram_tables(surfaces, d, None)
    cand = {
        (r["m_surface"], r["iri"]) for r in fuzzy_candidates(sg, dg).collect()
    }
    assert (long_b, "urn:e:other") not in cand


def test_fuzzy_link_df_cap_recall_on_id_like_names(spark):
    """ID-like dictionaries (constant prefix + serial digits) are the
    LSH worst case: every cross pair shares most grams. The df-cap
    removes the constant prefix from the universe, and the hybrid
    gram-key blocking then links every typo to its right entry."""
    from kgt.spark.link import fuzzy_link
    from pyspark.sql import functions as F

    n = 60
    d = spark.createDataFrame(
        [(f"Account#{i:07d}", f"urn:a:{i}") for i in range(n)],
        "surface string, iri string",
    )
    typos = d.select(
        F.regexp_replace("surface", "^.", "").alias("surface"), "iri"
    )
    got = {
        r["surface"]: r["iri"]
        for r in fuzzy_link(
            typos.select("surface"), d, min_jaccard=0.5, max_df=n // 5
        ).collect()
    }
    want = {r["surface"]: r["iri"] for r in typos.collect()}
    hits = sum(1 for s, iri in want.items() if got.get(s) == iri)
    assert hits == n, f"linked {hits}/{n}"


def test_auto_gram_size_pins_measured_crossover():
    """gram_size='auto' must reproduce the round-7 measured dial: q=3
    held at a 15k-entry dictionary (candidate ratio ~13) and went
    quadratic at 150k, where q=4 held flat — the rule picks exactly
    those values at those scales, deterministically in |dict| alone."""
    from kgt.spark.link import auto_gram_size

    assert auto_gram_size(15_000) == 3
    assert auto_gram_size(150_000) == 4
    # monotone, clamped
    assert auto_gram_size(1) == 3
    assert auto_gram_size(10**12) == 8
    sizes = [auto_gram_size(n) for n in (10, 10**3, 10**5, 10**7, 10**9)]
    assert sizes == sorted(sizes)


def test_fuzzy_link_auto_gram_size_matches_explicit(spark):
    """gram_size='auto' end-to-end: identical links to the explicit q
    the rule derives for this dictionary size."""
    from kgt.spark.link import auto_gram_size, fuzzy_link
    from pyspark.sql import functions as F

    n = 50
    d = spark.createDataFrame(
        [(f"Account#{i:07d}", f"urn:a:{i}") for i in range(n)],
        "surface string, iri string",
    )
    typos = d.select(
        F.regexp_replace("surface", "^.", "").alias("surface")
    )
    q = auto_gram_size(n)
    explicit = {
        (r["surface"], r["iri"], r["jaccard"])
        for r in fuzzy_link(
            typos, d, min_jaccard=0.5, max_df=n // 5, gram_size=q
        ).collect()
    }
    auto = {
        (r["surface"], r["iri"], r["jaccard"])
        for r in fuzzy_link(
            typos, d, min_jaccard=0.5, max_df=n // 5, gram_size="auto"
        ).collect()
    }
    assert auto == explicit
    assert len(auto) == n


def test_multimodal_stub_raises_without_fake(spark, sf_dir):
    from kgt.textops.multimodal import decode_features, to_media

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").limit(2)
    with pytest.raises(Exception):
        decode_features(to_media(docs), fake=False).collect()


def test_multimodal_stub_deterministic(spark, sf_dir):
    import hashlib

    from kgt.textops.multimodal import decode_features, to_media

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").limit(5)
    rows = decode_features(to_media(docs), fake=True).collect()
    src = {r["doc_id"]: r for r in docs.collect()}
    for r in rows:
        payload = src[r["doc_id"]]["text"].encode()
        assert r["n_bytes"] == len(payload)
        assert r["checksum"] == hashlib.md5(payload).hexdigest()


def test_observe_metrics(spark, sf_dir):
    from pyspark.sql import Observation

    from kgt.spark.parse import extract_triples, with_metrics
    from kgt.spark.transcripts import orders_transcripts

    obs = Observation("kgt_extract")
    ext = with_metrics(
        extract_triples(orders_transcripts(spark, sf_dir, with_errors=True)),
        obs,
    )
    n_orders = spark.read.parquet(f"{sf_dir}/orders.parquet").count()
    n_bad = spark.read.parquet(f"{sf_dir}/orders.parquet").filter(
        F.col("o_orderkey") % 10 == 0
    ).count()
    ext.write.format("noop").mode("overwrite").save()  # action
    got = obs.get
    assert got["triples"] == 6 * n_orders
    assert got["errors"] == n_bad
    assert got["quoted"] == 0


def test_pretty_turtle_spark_roundtrip(spark, sf_dir):
    """pretty writer output re-parses to the same triple set, through
    Spark on both legs (writer_spec.rb:760-791 analog)."""
    from kgt.spark.parse import parse_documents, triples
    from kgt.spark.write import pretty_turtle

    t = triples(_extract_bnodes(spark, sf_dir)).cache()
    docs = pretty_turtle(
        t, prefixes={"p": "urn:p:", "c": "urn:cust:"}
    ).withColumnRenamed("ttl", "text")
    reparsed = parse_documents(docs, skolem_salt=None)
    assert reparsed.filter(F.col("kind") == "E").count() == 0
    from tests.helpers import canon_bnodes

    def lines(df, cols=("subj", "pred", "obj")):
        by_conv = {}
        for r in df.collect():
            by_conv.setdefault(r["conv_id"], []).append(
                f"{r['subj']} {r['pred']} {r['obj']} ."
            )
        return {k: canon_bnodes(v) for k, v in by_conv.items()}

    left = lines(t)
    right = lines(reparsed.filter(F.col("kind") == "T"))
    assert left == right
    t.unpersist()


def _extract_bnodes(spark, sf_dir):
    from kgt.spark.parse import extract_triples
    from kgt.spark.transcripts import customer_bnode_transcripts

    return extract_triples(customer_bnode_transcripts(spark, sf_dir))


def test_size_cap_quarantine(spark, sf_dir):
    from kgt.spark.parse import errors, extract_triples, triples
    from kgt.spark.transcripts import orders_transcripts

    tx = orders_transcripts(spark, sf_dir)
    ext = extract_triples(tx, max_doc_chars=100).cache()
    # every orders doc exceeds 100 chars → all quarantined, none parsed
    assert triples(ext).count() == 0
    q = errors(ext)
    n_orders = spark.read.parquet(f"{sf_dir}/orders.parquet").count()
    assert q.count() == n_orders
    assert q.filter(F.col("production") == "size_cap").count() == n_orders
    ext.unpersist()
    # generous cap: nothing quarantined
    ext2 = extract_triples(tx, max_doc_chars=10_000)
    assert errors(ext2).filter(F.col("production") == "size_cap").count() == 0


def test_hot_predicate_salting(spark, tmp_path):
    """rdf:type rows spread across salts by object hash so one hot
    predicate can't pin a writer task; other predicates stay salt 0."""
    from kgt.spark.write import materialize_triples

    rdf_type = "<http://www.w3.org/1999/02/22-rdf-syntax-ns#type>"
    rows = [
        (f"c{i}", i, f"<urn:s:{i}>", rdf_type, f"<urn:class:{i % 50}>", False)
        for i in range(200)
    ] + [
        (f"c{i}", i, f"<urn:s:{i}>", "<urn:p:x>", f"<urn:o:{i}>", False)
        for i in range(200)
    ]
    t = spark.createDataFrame(
        rows,
        "conv_id string, stmt_idx long, subj string, pred string, obj string, is_quoted boolean",
    )
    path = str(tmp_path / "salted")
    materialize_triples(t, path, n_buckets=4, n_salts=8)
    g = spark.read.parquet(path)
    hot_salts = (
        g.filter(F.col("pred") == rdf_type).select("salt").distinct().count()
    )
    assert hot_salts > 1  # 50 distinct classes spread over salts
    cold_salts = (
        g.filter(F.col("pred") != rdf_type).select("salt").distinct().collect()
    )
    assert [r["salt"] for r in cold_salts] == [0]


def test_bucketed_self_join_no_shuffle(spark, sf_dir, tmp_path):
    """Subject-bucketed table: a subj-subj self-join plans with ZERO
    exchanges (co-located buckets) — the multi-hop graph-join saving."""
    from kgt.spark.parse import extract_triples, triples
    from kgt.spark.transcripts import orders_transcripts
    from kgt.spark.write import materialize_bucketed_table

    spark.sql("DROP TABLE IF EXISTS kgt_test_bucketed")
    t = triples(extract_triples(orders_transcripts(spark, sf_dir)))
    materialize_bucketed_table(t, "kgt_test_bucketed", n_buckets=4)
    g = spark.table("kgt_test_bucketed")
    a = g.alias("a")
    b = g.alias("b")
    joined = a.join(b, F.col("a.subj") == F.col("b.subj")).filter(
        F.col("a.pred") != F.col("b.pred")
    )
    # disable auto-broadcast: at real scale both sides are huge and the
    # point is that bucketing removes the SHUFFLE from the sort-merge join
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold", "10485760")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" in plan, plan[:1500]
        assert "Exchange" not in plan, plan[:1500]
        assert joined.count() > 0
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
        spark.sql("DROP TABLE IF EXISTS kgt_test_bucketed")


def test_simhash_finds_exact_copies(spark, sf_dir):
    from kgt.textops.dedup import simhash64, simhash_near_pairs

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").limit(50).select(
        "doc_id", "text"
    )
    copies = docs.select((F.col("doc_id") + 1000).alias("doc_id"), "text")
    sim = simhash64(docs.unionByName(copies))
    pairs = simhash_near_pairs(sim, max_hamming=0)
    got = {(r["doc_a"], r["doc_b"]) for r in pairs.collect()}
    for r in docs.collect():
        assert (r["doc_id"], r["doc_id"] + 1000) in got


def test_parse_documents_freebase_dispatch(spark, sf_dir):
    """parse_documents(freebase=True) ≡ Reader.new(freebase: true)
    class dispatch (reader.rb:58-66): same triples as the grammar path
    for fastpath-eligible docs, zero Python in the plan."""
    from kgt.spark.parse import parse_documents

    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet").limit(50)
    doc = F.concat(
        F.lit("@prefix p: <urn:p:> .\n<urn:li:"),
        F.col("l_orderkey").cast("string"),
        F.lit("> p:qty "),
        F.col("l_quantity").cast("long").cast("string"),
        F.lit(" .\n"),
    )
    docs = li.select(
        F.concat(F.lit("f"), F.col("l_orderkey").cast("string"),
                 F.lit("_"), F.col("l_linenumber").cast("string")).alias("conv_id"),
        doc.alias("text"),
    )
    fast = parse_documents(docs, freebase=True)
    plan = fast._jdf.queryExecution().executedPlan().toString()
    assert "ArrowEvalPython" not in plan and "mapInPandas" not in plan.lower()
    slow = parse_documents(docs, skolem_salt=None)
    cols = ["conv_id", "subj", "pred", "obj"]
    a = {tuple(r) for r in fast.filter(F.col("kind") == "T").select(*cols).collect()}
    b = {tuple(r) for r in slow.filter(F.col("kind") == "T").select(*cols).collect()}
    assert a == b and a


def test_multimodal_resize_and_frames_plumbing(spark, sf_dir):
    """Resize (1→1) and frame-sample (1→n fan-out) mapInPandas batch
    shapes; real codec path stays a guarded stub."""
    import pytest as _pytest

    from kgt.textops.multimodal import frame_sample, resize, to_media

    media = to_media(
        spark.read.parquet(f"{sf_dir}/documents.parquet").limit(20)
    )
    rs = resize(media, max_side=128).collect()
    assert len(rs) == 20
    for r in rs:
        assert max(r["resized_width"], r["resized_height"]) <= 128
        assert r["resized_width"] >= 1 and r["resized_height"] >= 1
        # aspect ratio preserved within integer rounding
        if max(r["width"], r["height"]) > 128:
            assert r["resized_width"] <= r["width"]

    fr = frame_sample(media, n_frames=3).collect()
    assert len(fr) == 60  # 1→n fan-out
    per_doc = {}
    for r in fr:
        per_doc.setdefault(r["doc_id"], []).append(r["frame_idx"])
    assert all(sorted(v) == [0, 1, 2] for v in per_doc.values())

    with _pytest.raises(Exception, match="NotImplementedError|codec"):
        frame_sample(media, n_frames=2, fake=False).collect()


def test_streaming_writer_scalar_columnar_equal(spark, sf_dir):
    """serialize_stream (scalar O(1)-state port of streaming_writer.rb)
    and streaming_turtle (window-function columnar twin) must emit the
    same bytes for the same statement stream."""
    from kgt.spark.parse import extract_triples, triples
    from kgt.spark.write import streaming_turtle
    from kgt.spark.transcripts import orders_transcripts
    from kgt.turtle.writer import decode_nt, serialize_stream

    t = triples(
        extract_triples(orders_transcripts(spark, sf_dir))
    ).filter(F.col("conv_id").isin("o1", "o2", "o3"))
    columnar = {
        r["conv_id"]: r["ttl"] for r in streaming_turtle(t).collect()
    }
    rows = sorted(
        t.collect(), key=lambda r: (r["conv_id"], r["stmt_idx"])
    )
    by_conv = {}
    for r in rows:
        by_conv.setdefault(r["conv_id"], []).append(
            (decode_nt(r["subj"]), decode_nt(r["pred"]), decode_nt(r["obj"]))
        )
    assert set(by_conv) == set(columnar)
    for conv, stmts in by_conv.items():
        scalar = serialize_stream(stmts, literal_shorthand=False)
        assert scalar.strip() == columnar[conv].strip(), conv


def test_language_id_ten_languages(spark):
    """Each language's marker sentence classifies correctly; junk falls
    back to 'und'; ties break deterministically by code order."""
    from kgt.textops.quality import LANG_MARKERS, language_id

    rows = [
        (i, " ".join(words))
        for i, (lang, words) in enumerate(sorted(LANG_MARKERS.items()))
    ]
    rows.append((99, "zzz qqq xxx"))
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc_id"]: r["lang_pred"] for r in language_id(docs).collect()}
    for i, (lang, _) in enumerate(sorted(LANG_MARKERS.items())):
        assert got[i] == lang, (lang, got[i])
    assert got[99] == "und"


def test_token_count_bpe_regex(spark):
    from kgt.textops.quality import token_count

    docs = spark.createDataFrame(
        [(1, "Hello, world! x2"), (2, ""), (3, "a-b_c")],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: r for r in token_count(docs).collect()}
    # Hello , world ! x 2 → 6 regex tokens; 3 ws tokens
    assert got[1]["re_tokens"] == 6 and got[1]["ws_tokens"] == 3
    assert got[2]["re_tokens"] == 0 and got[2]["ws_tokens"] == 0
    # a - b _ c → 5 (underscore is a glyph token)
    assert got[3]["re_tokens"] == 5


def test_doc_signals_fused_projection(spark):
    """quality.doc_signals must equal the five standalone operators
    joined on doc_id — and do it with the 100-TB plan: the four
    per-row signal families fused into ONE projection, so the only
    exchanges in the whole plan are the unigram-LM core's (vocabulary
    count + occurrence join + per-doc agg + final join), never extra
    shuffles for language/token/quality/fingerprint columns."""
    from kgt.textops.quality import (
        doc_signals,
        fingerprint,
        language_id,
        quality_score,
        token_count,
        unigram_logprob,
    )

    docs = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog"),
            (2, "der schnelle braune Fuchs, und der faule Hund!"),
            (3, "x " * 40),
            (4, "short"),
            (5, ""),
            (6, "   "),
        ],
        "doc_id long, text string",
    )
    fused = doc_signals(docs)
    joined = (
        unigram_logprob(docs)
        .join(language_id(docs), "doc_id")
        .join(token_count(docs), "doc_id")
        .join(quality_score(docs), "doc_id")
        .join(fingerprint(docs), "doc_id")
    )
    assert sorted(fused.columns) == sorted(joined.columns)
    cols = sorted(fused.columns)
    rows = lambda df: sorted(  # noqa: E731
        tuple(r[c] for c in cols) for r in df.collect()
    )
    # wordless docs: the join-of-five DROPS them (unigram_logprob has
    # no row to inner-join); doc_signals must keep them with
    # n_words = 0 and avg_logprob NULL — on the worded docs the two
    # agree exactly
    got = {r[0]: r for r in fused.collect()}
    assert set(got) == {1, 2, 3, 4, 5, 6}
    for d in (5, 6):
        assert got[d]["n_words"] == 0 and got[d]["avg_logprob"] is None
        assert got[d]["ws_tokens"] == 0
    worded = fused.filter(fused.doc_id <= 4)
    assert rows(worded) == rows(joined)
    # plan shape: exchanges only from the unigram core + one join —
    # strictly fewer than the join-of-five plan
    import re

    nex = lambda df: len(  # noqa: E731
        re.findall(
            r"\bExchange\b",
            df._jdf.queryExecution().executedPlan().toString(),
        )
    )
    assert nex(fused) < nex(joined)


def test_detect_mentions_null_text_keeps_role_and_tool(spark):
    """Round-6 review find: F.concat is null-propagating, so a turn
    with NULL text (a bare tool call) used to null the whole mentions
    array and silently drop its role/tool mentions."""
    from kgt.spark.link import detect_mentions

    tx = spark.createDataFrame(
        [
            ("c1", 0, "user", None, "hello <urn:x:1>"),
            ("c1", 1, "tool", "calc", None),
        ],
        "conv_id string, turn_idx int, role string, tool string, text string",
    )
    got = {
        (r["turn_idx"], r["kind"], r["surface"])
        for r in detect_mentions(tx).collect()
    }
    assert (1, "role", "tool") in got
    assert (1, "tool", "calc") in got
    assert (0, "iri", "urn:x:1") in got


def test_link_mentions_deterministic_on_surface_collision(spark):
    """Two dictionary surfaces normalizing to one key must link to the
    MIN iri on every run (the build_iri_dictionary rule) — the old
    dropDuplicates kept an arbitrary row."""
    from kgt.spark.link import link_mentions

    mentions = spark.createDataFrame(
        [("c1", 0, "role", "Foo  Bar")],
        "conv_id string, turn_idx int, kind string, surface string",
    )
    iri_dict = spark.createDataFrame(
        [("Foo Bar", "urn:b"), ("foo  bar", "urn:a"), ("FOO BAR", "urn:c")],
        "surface string, iri string",
    )
    for _ in range(3):
        rows = link_mentions(mentions, iri_dict).collect()
        assert len(rows) == 1 and rows[0]["iri"] == "urn:a"


def test_mention_stmt_idx_disjoint_from_parse_rows(spark, sf_dir):
    """Round-6 review find: mention triples used stmt_idx = turn_idx,
    colliding with parse-triple stmt_idx (both dense from 0). They now
    sit above MENTION_STMT_BASE so the two families union without
    ties."""
    from kgt.spark.link import (
        MENTION_STMT_BASE,
        detect_mentions,
        link_mentions,
        mentions_to_triples,
    )
    from kgt.spark.transcripts import orders_transcripts

    tx = orders_transcripts(spark, sf_dir)
    iri_dict = spark.createDataFrame(
        [("user", "urn:agent:user")], "surface string, iri string"
    )
    m = mentions_to_triples(link_mentions(detect_mentions(tx), iri_dict))
    lo = m.agg(F.min("stmt_idx")).collect()[0][0]
    assert lo >= MENTION_STMT_BASE


def test_build_iri_dictionary_requires_sources(spark):
    from kgt.spark.link import build_iri_dictionary

    with pytest.raises(ValueError, match="at least one"):
        build_iri_dictionary()
