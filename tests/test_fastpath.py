"""Columnar N-Triples+pnames fast path: correctness vs the grammar
parser (same documents, same triples) + error tolerance."""

import pytest
from pyspark.sql import functions as F

pytestmark = pytest.mark.spark


def _docs(spark, rows):
    return spark.createDataFrame(rows, "conv_id string, text string")


def _triples_set(df):
    return {
        (r["conv_id"], r["subj"], r["pred"], r["obj"])
        for r in df.filter(F.col("kind") == "T").collect()
    }


DOC = """@prefix ns: <http://rdf.freebase.com/ns/> .
@prefix key: <http://rdf.freebase.com/key/> .
ns:m.012rkqx ns:type.object.key "/wikipedia/en/x" .
ns:m.012rkqx a ns:film.performance .
ns:m.012rkqx ns:film.performance.actor ns:m.02661h .
ns:m.012rkqx ns:rating 8.5e0 .
ns:m.012rkqx ns:votes 1234 .
ns:m.012rkqx ns:score .75 .
ns:m.012rkqx ns:active true .
ns:m.012rkqx ns:label "Biff Tannen"@en .
ns:m.012rkqx ns:alias "Biff"@EN-Latn .
ns:m.012rkqx ns:len "2.5"^^<http://www.w3.org/2001/XMLSchema#decimal> .
"""


def test_fastpath_matches_grammar_parser(spark):
    from kgt.spark.fastpath import parse_fastpath
    from kgt.spark.parse import parse_documents

    docs = _docs(spark, [("c1", DOC)])
    fast = _triples_set(parse_fastpath(docs))
    slow = _triples_set(parse_documents(docs))
    assert fast == slow
    assert len(fast) == 10
    # language tags downcase at construction on BOTH paths (@EN-Latn)
    assert any(o.endswith('"@en-latn') for *_, o in fast)


def test_fastpath_is_python_free(spark):
    """The physical plan must contain no Python/Arrow evaluation."""
    from kgt.spark.fastpath import parse_fastpath

    plan = parse_fastpath(_docs(spark, [("c1", DOC)]))._jdf.queryExecution().executedPlan().toString()
    assert "ArrowEvalPython" not in plan
    assert "BatchEvalPython" not in plan
    assert "FlatMapsInPandas" not in plan and "MapInPandas" not in plan


def test_fastpath_quarantines_garbage(spark):
    from kgt.spark.fastpath import parse_fastpath

    doc = (
        "@prefix ns: <http://x/> .\n"
        "ns:a ns:p ns:b .\n"
        "this line is garbage\n"
        "undefined:pfx ns:p ns:b .\n"
        "ns:c ns:p 42 .\n"
    )
    out = parse_fastpath(_docs(spark, [("c1", doc)]))
    t = out.filter(F.col("kind") == "T")
    e = out.filter(F.col("kind") == "E")
    assert t.count() == 2
    assert e.count() == 2  # garbage line + undefined prefix


def test_freebase_sample_both_paths_agree(spark):
    """The reference's real freebase fixture parses identically through
    the columnar fast path and the grammar parser."""
    from kgt.spark.fastpath import parse_fastpath
    from kgt.spark.parse import parse_documents

    sample = open(
        "/root/reference/examples/freebase-sample.ttl", encoding="utf-8"
    ).read()
    docs = _docs(spark, [("fb", sample)])
    fast = _triples_set(parse_fastpath(docs))
    slow = _triples_set(parse_documents(docs))
    assert fast == slow
    assert len(fast) > 20


def test_routing_split_matches_grammar_only(spark):
    """The is_regular_doc routed union (fastpath + grammar) produces the
    same triples as sending everything through the grammar parser."""
    from kgt.spark.fastpath import is_regular_doc, parse_fastpath
    from kgt.spark.parse import parse_documents

    rows = [
        ("r1", DOC),  # regular: fast path eligible
        ("g1", "@prefix p: <http://x/> . p:s p:p [ p:q 1 ] ; p:r (1 2) ."),
        ("g2", '<tag:s> <tag:p> """long\nstring""" .'),
    ]
    docs = _docs(spark, rows)
    import pyspark.sql.functions as SF

    regular = docs.filter(is_regular_doc(SF.col("text")))
    rest = docs.filter(~is_regular_doc(SF.col("text")))
    assert {r["conv_id"] for r in regular.collect()} == {"r1"}
    routed = _triples_set(
        parse_fastpath(regular).unionByName(parse_documents(rest))
    )
    all_grammar = _triples_set(parse_documents(docs))
    assert routed == all_grammar


def test_fastpath_pn_local_escapes(spark):
    from kgt.spark.fastpath import parse_fastpath

    doc = "@prefix k: <http://k/> .\n" + r"k:a\%25b k:p k:\#frag ." + "\n"
    rows = parse_fastpath(_docs(spark, [("c1", doc)])).filter(
        F.col("kind") == "T"
    ).collect()
    assert rows[0]["subj"] == "<http://k/a%25b>"
    # no '#' in prefix IRI → leading escaped '#' kept
    assert rows[0]["obj"] == "<http://k/#frag>"


def test_gate_rejects_valid_turtle_the_line_parser_would_quarantine(spark):
    """Round-6 review find: is_regular_doc must NEVER pass valid
    Turtle that parse_fastpath would quarantine — default-prefix docs,
    blank-node labels, @base/SPARQL directives, empty-local pnames,
    UCHAR escapes, wrapped statements. Each doc below is VALID for the
    grammar path; under the routed split its triples must come out as
    kind='T', never 'E'."""
    import pyspark.sql.functions as SF

    from kgt.spark.fastpath import is_regular_doc, parse_fastpath
    from kgt.spark.parse import parse_documents

    tricky = [
        ("d1", "@prefix : <urn:x:> .\n:a :p :b ."),
        ("d2", "_:b0 <urn:p:q> <urn:o:1> ."),
        ("d3", "@base <urn:base:> .\n<s> <urn:p:q> <urn:o:1> ."),
        ("d4", "PREFIX p: <urn:x:>\np:a p:q p:b ."),
        ("d5", "@prefix p: <urn:x:> .\np:a p:q\n  p: ."),  # wrapped + empty local
        ("d6", "<urn:s:\\u00e9x> <urn:p:q> <urn:o:1> ."),
        ("d7", "@prefix p: <urn:x:> .\np:s p:q p: ."),  # empty-local object
    ]
    docs = spark.createDataFrame(tricky, "conv_id string, text string")
    assert docs.filter(is_regular_doc(SF.col("text"))).count() == 0
    # the routed union therefore parses them ALL via the grammar path
    regular = docs.filter(is_regular_doc(SF.col("text")))
    rest = docs.filter(~is_regular_doc(SF.col("text")))
    ext = parse_fastpath(regular).unionByName(
        parse_documents(rest), allowMissingColumns=True
    )
    kinds = {
        r["conv_id"]: r["kinds"]
        for r in ext.groupBy("conv_id")
        .agg(SF.collect_set("kind").alias("kinds"))
        .collect()
    }
    assert set(kinds) == {c for c, _ in tricky}
    for c, ks in kinds.items():
        assert ks == ["T"], (c, ks)


def test_fastpath_differential_corpus_vs_grammar(spark):
    """Differential fuzz between the two parser implementations: 300
    generated regular docs (pname/IRI subjects, 'a' verbs, every
    object shape the flat grammar supports, prefix redefinitions,
    comments, malformed lines) must produce IDENTICAL T rows through
    parse_fastpath and the grammar parser — and identical quarantine
    conv_ids (line-level E semantics differ in detail, so E rows
    compare by conv only)."""
    import random

    from pyspark.sql import functions as SF

    from kgt.spark.fastpath import is_regular_doc, parse_fastpath
    from kgt.spark.parse import parse_documents

    rng = random.Random(1234)
    objs = [
        lambda r: f"ns:o{r.randrange(50)}",
        lambda r: f"<urn:o:{r.randrange(50)}>",
        lambda r: str(r.randrange(-999999, 999999)),
        lambda r: f"{r.randrange(100)}.{r.randrange(1, 999)}",
        lambda r: f"{r.randrange(1, 99)}.{r.randrange(10)}e{r.randrange(-9, 9)}",
        lambda r: r.choice(["true", "false"]),
        lambda r: '"plain text %d"' % r.randrange(100),
        lambda r: '"tagged %d"@en-US' % r.randrange(100),
        lambda r: '"42"^^<http://www.w3.org/2001/XMLSchema#byte>',
        lambda r: '"t%d"^^ns:custom' % r.randrange(10),
    ]
    docs = []
    for d in range(300):
        lines = ["@prefix ns: <urn:ns%d:> ." % (d % 7)]
        if rng.random() < 0.3:
            lines.append("# a comment line")
        if rng.random() < 0.2:
            lines.append("@prefix ns: <urn:redef%d:> ." % d)  # redefinition
        for i in range(rng.randrange(1, 6)):
            subj = rng.choice(
                [f"ns:s{i}", f"<urn:s:{d}_{i}>"]
            )
            verb = rng.choice([f"ns:p{i % 5}", "a", f"<urn:v:{i}>"])
            lines.append(f"{subj} {verb} {objs[rng.randrange(len(objs))](rng)} .")
        if rng.random() < 0.15:
            lines.append("ns:bad ns:worse")  # malformed (no object/dot)
        docs.append((f"d{d}", "\n".join(lines)))
    df = spark.createDataFrame(docs, "conv_id string, text string")
    # every generated doc must be fastpath-eligible except... the
    # malformed line has no trailing '.', which the round-6 gate
    # rejects — those route to the grammar side, which is exactly the
    # production behavior; compare each doc through the path that
    # would actually serve it AND through the grammar directly
    eligible = df.filter(is_regular_doc(SF.col("text")))
    fast = parse_fastpath(eligible)
    slow = parse_documents(eligible)

    def t_rows(ext):
        return {
            (r["conv_id"], r["subj"], r["pred"], r["obj"])
            for r in ext.filter(SF.col("kind") == "T").collect()
        }

    def e_convs(ext):
        return {
            r["conv_id"]
            for r in ext.filter(SF.col("kind") == "E").collect()
        }

    assert eligible.count() >= 200  # the generator mostly stays regular
    assert t_rows(fast) == t_rows(slow)
    assert e_convs(fast) == e_convs(slow)
