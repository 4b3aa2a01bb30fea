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


# ---------------------------------------------------------------------
# Vendored rdf12 Turtle-star snapshot (W3C-style manifest vocabulary) —
# the reference's spec/star_spec.rb:9-11 drives the remote
# rdf12/rdf-turtle syntax+eval manifests; this is the same pattern over
# a local snapshot, with rdft:Test* types instead of result-presence
# deciding the test mode.
# ---------------------------------------------------------------------

RDFT = "http://www.w3.org/ns/rdftest#"
VENDOR = os.path.join(os.path.dirname(__file__), "vendor", "rdf12-star")


def _load_w3c_manifest(path):
    """Parse a W3C-vocabulary manifest with OUR parser: entries are an
    rdf:List of IRIs; each entry has rdf:type rdft:TestTurtle*,
    mf:name, mf:action (file IRI) and, for eval tests, mf:result.
    Returns [(name, kind, action_file, result_file_or_None)]."""
    stmts, errs = TurtleParser().parse(open(path, encoding="utf-8").read())
    assert not errs, errs[:3]
    by_subject = {}
    for s, p, o in stmts:
        by_subject.setdefault(s, {}).setdefault(p[1], []).append(o)
    cur = by_subject[("I", "")][MF + "entries"][0]
    out = []
    while cur != ("I", RDF + "nil"):
        props = by_subject[cur]
        e = props[RDF + "first"][0]
        ep = by_subject[e]
        kind = ep[RDF + "type"][0][1].removeprefix(RDFT)
        name = ep[MF + "name"][0][1]
        action = ep[MF + "action"][0][1]
        result = ep.get(MF + "result")
        out.append((name, kind, action, result[0][1] if result else None))
        cur = props[RDF + "rest"][0]
    return out


STAR = _load_w3c_manifest(os.path.join(VENDOR, "manifest.ttl"))
STAR_POS = [t for t in STAR if t[1] == "TestTurtlePositiveSyntax"]
STAR_NEG = [t for t in STAR if t[1] == "TestTurtleNegativeSyntax"]
STAR_EVAL = [t for t in STAR if t[1] == "TestTurtleEval"]


def test_star_manifest_enumerates_the_snapshot():
    assert len(STAR_POS) >= 12 and len(STAR_NEG) >= 7 and len(STAR_EVAL) >= 19
    assert all(r for *_, r in STAR_EVAL)


@pytest.mark.parametrize(
    "name,kind,action,result", STAR_POS, ids=[t[0] for t in STAR_POS]
)
def test_star_positive_syntax(name, kind, action, result):
    ttl = open(os.path.join(VENDOR, action), encoding="utf-8").read()
    parser = TurtleParser(validate=True, rdfstar=True)
    parser.validate_raises = False
    stmts, errs = parser.parse(ttl)
    assert not errs, errs[:3]
    assert stmts


@pytest.mark.parametrize(
    "name,kind,action,result", STAR_NEG, ids=[t[0] for t in STAR_NEG]
)
def test_star_negative_syntax(name, kind, action, result):
    ttl = open(os.path.join(VENDOR, action), encoding="utf-8").read()
    parser = TurtleParser(validate=True, rdfstar=True)
    parser.validate_raises = False
    _, errs = parser.parse(ttl)
    assert errs, f"{name} parsed clean but must fail"


# ---------------------------------------------------------------------
# Vendored rdf11 Turtle syntax snapshot — same vocabulary and driver as
# the rdf12-star suite; recreated from the W3C rdf11/rdf-turtle layout
# the reference's suite_spec.rb fetches remotely.
# ---------------------------------------------------------------------

VENDOR11 = os.path.join(os.path.dirname(__file__), "vendor", "rdf11")
R11 = _load_w3c_manifest(os.path.join(VENDOR11, "manifest.ttl"))
R11_POS = [t for t in R11 if t[1] == "TestTurtlePositiveSyntax"]
R11_NEG = [t for t in R11 if t[1] == "TestTurtleNegativeSyntax"]
R11_EVAL = [t for t in R11 if t[1] == "TestTurtleEval"]
R11_NEGEVAL = [t for t in R11 if t[1] == "TestTurtleNegativeEval"]


def test_rdf11_manifest_enumerates_the_snapshot():
    # round-5 expansion ×2: ≥ 250 rdf11 cases — with rdf12-star's 38
    # the vendored total (292) now matches the ~290-test networked
    # battery the reference runs remotely (suite_spec.rb:9)
    assert len(R11) >= 250
    assert len(R11_POS) >= 59 and len(R11_NEG) >= 75 and len(R11_EVAL) >= 94
    assert len(R11_NEGEVAL) >= 4
    assert all(r for *_, r in R11_EVAL)


@pytest.mark.parametrize(
    "name,kind,action,result", R11_EVAL, ids=[t[0] for t in R11_EVAL]
)
def test_rdf11_eval(name, kind, action, result):
    ttl = open(os.path.join(VENDOR11, action), encoding="utf-8").read()
    golden = open(os.path.join(VENDOR11, result), encoding="utf-8").read()
    stmts, errs = TurtleParser().parse(ttl)
    assert not errs, errs[:3]
    got = canon_bnodes(
        sorted(
            unescape(f"{nt_encode(s)} {nt_encode(p)} {nt_encode(o)} .")
            for s, p, o in stmts
        )
    )
    want = canon_bnodes(sorted(unescape(line) for line in normalize_nt(golden)))
    assert got == want


@pytest.mark.parametrize(
    "name,kind,action,result", R11_POS, ids=[t[0] for t in R11_POS]
)
def test_rdf11_positive_syntax(name, kind, action, result):
    ttl = open(os.path.join(VENDOR11, action), encoding="utf-8").read()
    parser = TurtleParser(
        validate=True, base_uri="http://www.w3.org/2013/TurtleTests/" + action
    )
    parser.validate_raises = False
    _, errs = parser.parse(ttl)
    assert not errs, errs[:3]


@pytest.mark.parametrize(
    "name,kind,action,result", R11_NEG, ids=[t[0] for t in R11_NEG]
)
def test_rdf11_negative_syntax(name, kind, action, result):
    ttl = open(os.path.join(VENDOR11, action), encoding="utf-8").read()
    parser = TurtleParser(
        validate=True, base_uri="http://www.w3.org/2013/TurtleTests/" + action
    )
    parser.validate_raises = False
    _, errs = parser.parse(ttl)
    assert errs, f"{name} parsed clean but must fail"


@pytest.mark.parametrize(
    "name,kind,action,result", R11_NEGEVAL, ids=[t[0] for t in R11_NEGEVAL]
)
def test_rdf11_negative_eval(name, kind, action, result):
    """NegativeEval: the document is SYNTACTICALLY legal Turtle but
    produces invalid RDF (IRI with UCHAR-smuggled illegal characters,
    ill-typed literal) — rejected under validate, accepted without."""
    ttl = open(os.path.join(VENDOR11, action), encoding="utf-8").read()
    lax = TurtleParser(validate=False)
    stmts, errs = lax.parse(ttl)
    assert not errs and stmts, f"{name} must be syntactically legal"
    strict = TurtleParser(validate=True)
    strict.validate_raises = False
    _, errs = strict.parse(ttl)
    assert errs, f"{name} validated clean but the RDF is invalid"


@pytest.mark.parametrize(
    "name,kind,action,result",
    R11_EVAL + R11_POS,
    ids=[t[0] for t in R11_EVAL + R11_POS],
)
def test_rdf11_writer_roundtrip(name, kind, action, result):
    """Pretty-writer fuzz over the W3C corpus: every parseable rdf11
    snapshot document must survive parse → serialize_pretty → re-parse
    graph-identically (writer_spec.rb's round-trip strategy, driven by
    the same manifest as the reader tests)."""
    from kgt.turtle.writer import serialize_pretty

    ttl = open(os.path.join(VENDOR11, action), encoding="utf-8").read()
    base = "http://www.w3.org/2013/TurtleTests/" + action
    stmts, errs = TurtleParser(base_uri=base).parse(ttl)
    assert not errs, errs[:3]
    out = serialize_pretty(stmts)
    # numeric literals compare by VALUE: the writer canonicalizes
    # not-bare-writable lexical forms exactly like the reference
    # (writer.rb:282-296 falls back to literal.canonicalize for e.g.
    # "-.25"), so "-.25" legitimately round-trips as "-0.25"
    lines1 = [
        _canon_numeric(f"{nt_encode(s)} {nt_encode(p)} {nt_encode(o)} .")
        for s, p, o in stmts
    ]
    re_stmts, re_errs = TurtleParser().parse(out)
    assert not re_errs, (re_errs[:3], out)
    lines2 = [
        _canon_numeric(f"{nt_encode(s)} {nt_encode(p)} {nt_encode(o)} .")
        for s, p, o in re_stmts
    ]
    assert canon_bnodes(lines1) == canon_bnodes(lines2), out


@pytest.mark.parametrize(
    "name,kind,action,result",
    STAR_EVAL + STAR_POS,
    ids=[t[0] for t in STAR_EVAL + STAR_POS],
)
def test_star_writer_roundtrip(name, kind, action, result):
    """Pretty-writer fuzz over the Turtle-star snapshot: quoted triples
    and annotations must survive parse → serialize_pretty → re-parse."""
    from kgt.turtle.writer import serialize_pretty

    ttl = open(os.path.join(VENDOR, action), encoding="utf-8").read()
    stmts, errs = TurtleParser(rdfstar=True).parse(ttl)
    assert not errs, errs[:3]
    out = serialize_pretty(stmts)
    lines1 = [
        _canon_numeric(f"{nt_encode(s)} {nt_encode(p)} {nt_encode(o)} .")
        for s, p, o in stmts
    ]
    re_stmts, re_errs = TurtleParser(rdfstar=True).parse(out)
    assert not re_errs, (re_errs[:3], out)
    lines2 = [
        _canon_numeric(f"{nt_encode(s)} {nt_encode(p)} {nt_encode(o)} .")
        for s, p, o in re_stmts
    ]
    assert canon_bnodes(lines1) == canon_bnodes(lines2), out


@pytest.mark.parametrize(
    "name,kind,action,result", STAR_EVAL, ids=[t[0] for t in STAR_EVAL]
)
def test_star_eval(name, kind, action, result):
    ttl = open(os.path.join(VENDOR, action), encoding="utf-8").read()
    golden = open(os.path.join(VENDOR, result), encoding="utf-8").read()
    stmts, errs = TurtleParser(rdfstar=True).parse(ttl)
    assert not errs, errs[:3]
    got = canon_bnodes(
        sorted(
            unescape(f"{nt_encode(s)} {nt_encode(p)} {nt_encode(o)} .")
            for s, p, o in stmts
        )
    )
    want = canon_bnodes(sorted(unescape(line) for line in normalize_nt(golden)))
    assert got == want
