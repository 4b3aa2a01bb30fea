"""Manifest-DRIVEN conformance suite, the reference's backbone test
strategy (spec/suite_helper.rb:74-103) over the SHIPPED manifests:
examples/turtle/manifest.ttl (good: parse + compare to .out golden)
and manifest-bad.ttl (must fail in validate mode).

Dogfooding: the manifests are themselves Turtle documents — our parser
parses them, we walk the mf:entries collection (bnode property lists +
rdf lists) to enumerate the tests, then run each one. The test list is
therefore exactly what the reference ships, not a hand-copied table.
"""

import os

import pytest

from kgt.turtle import TurtleParser, nt_encode
from kgt.turtle.lexer import unescape
from tests.helpers import canon_bnodes, normalize_nt
from tests.test_golden_pairs import _canon_numeric, KNOWN_PRE_W3C

EXAMPLES = "/root/reference/examples/turtle"
BASE_ROOT = "http://www.w3.org/2001/sw/DataAccess/df1/tests/"
MF = "http://www.w3.org/2001/sw/DataAccess/tests/test-manifest#"
QT = "http://www.w3.org/2001/sw/DataAccess/tests/test-query#"
RDF = "http://www.w3.org/1999/02/22-rdf-syntax-ns#"


def _load_manifest(path):
    """Parse a manifest with OUR parser and walk its entries list.

    Returns [(name, action_file, result_file_or_None)]."""
    stmts, errs = TurtleParser().parse(open(path, encoding="utf-8").read())
    assert not errs, errs[:3]
    by_subject = {}
    for s, p, o in stmts:
        by_subject.setdefault(s, {}).setdefault(p[1], []).append(o)

    manifest = ("I", "")  # <> with no base stays the empty relative IRI
    entries_head = by_subject[manifest][MF + "entries"][0]

    # walk the rdf:List of entry bnodes
    entries = []
    cur = entries_head
    while cur != ("I", RDF + "nil"):
        props = by_subject[cur]
        entries.append(props[RDF + "first"][0])
        cur = props[RDF + "rest"][0]

    out = []
    for e in entries:
        props = by_subject[e]
        name = props[MF + "name"][0][1]
        action = by_subject[props[MF + "action"][0]][QT + "data"][0][1]
        result = props.get(MF + "result")
        out.append((name, action, result[0][1] if result else None))
    return out


GOOD = _load_manifest(f"{EXAMPLES}/manifest.ttl")
BAD = _load_manifest(f"{EXAMPLES}/manifest-bad.ttl")


def test_manifests_enumerate_the_shipped_suite():
    assert len(GOOD) >= 30 and all(r for _, _, r in GOOD)
    assert len(BAD) >= 14 and all(r is None for _, _, r in BAD)


@pytest.mark.parametrize(
    "name,action,result", GOOD, ids=[g[0] for g in GOOD]
)
def test_good(name, action, result):
    if f"{name}.ttl" in KNOWN_PRE_W3C:
        pytest.skip("pre-W3C IRI grammar (reference lexer rejects it too)")
    ttl = open(f"{EXAMPLES}/{action}", encoding="utf-8").read()
    golden = open(f"{EXAMPLES}/{result}", encoding="utf-8").read()
    base = BASE_ROOT + action
    stmts, errs = TurtleParser(base_uri=base).parse(ttl)
    assert not errs, errs[:3]
    got = canon_bnodes(
        [
            unescape(
                _canon_numeric(f"{nt_encode(s)} {nt_encode(p)} {nt_encode(o)} .")
            )
            for s, p, o in stmts
        ]
    )
    want = canon_bnodes(
        [unescape(_canon_numeric(line)) for line in normalize_nt(golden)]
    )
    assert got == want


@pytest.mark.parametrize("name,action,result", BAD, ids=[b[0] for b in BAD])
def test_bad_must_fail(name, action, result):
    ttl = open(f"{EXAMPLES}/{action}", encoding="utf-8").read()
    parser = TurtleParser(validate=True)
    parser.validate_raises = False
    _, errs = parser.parse(ttl)
    assert errs, f"{name} parsed clean but the manifest says it must fail"
