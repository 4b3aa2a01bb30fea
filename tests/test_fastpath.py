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
ns:m.012rkqx ns:len "2.5"^^<http://www.w3.org/2001/XMLSchema#decimal> .
"""


def test_fastpath_matches_grammar_parser(spark):
    from kgt.spark.fastpath import parse_fastpath
    from kgt.spark.parse import parse_documents

    docs = _docs(spark, [("c1", DOC)])
    fast = _triples_set(parse_fastpath(docs))
    slow = _triples_set(parse_documents(docs))
    assert fast == slow
    assert len(fast) == 9


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


def test_fastpath_pn_local_escapes(spark):
    from kgt.spark.fastpath import parse_fastpath

    doc = "@prefix k: <http://k/> .\n" + r"k:a\%25b k:p k:\#frag ." + "\n"
    rows = parse_fastpath(_docs(spark, [("c1", doc)])).filter(
        F.col("kind") == "T"
    ).collect()
    assert rows[0]["subj"] == "<http://k/a%25b>"
    # no '#' in prefix IRI → leading escaped '#' kept
    assert rows[0]["obj"] == "<http://k/#frag>"
