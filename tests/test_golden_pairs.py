"""Legacy golden pairs (examples/turtle/test-NN.ttl → .out, bad-NN.ttl).

These are Dave Beckett's 2004 Turtle conformance pairs shipped with the
reference (examples/turtle/README.txt). Comparison mirrors the reference's
be_equivalent_graph semantics: numeric literals compare by VALUE (so
"000000"^^xsd:integer == "0"), goldens' \\uXXXX escapes are decoded, and
the assumed base is http://www.w3.org/2001/sw/DataAccess/df1/tests/<file>
(per-file, as RDF::Graph.load would use).

test-29 is excluded: it predates the W3C grammar and puts raw spaces,
quotes and angle brackets inside an IRIREF — the current reference lexer
(terminals.rb IRI_RANGE) rejects those too, so exclusion preserves parity.
"""

import glob
import os
import re

import pytest

from kgt.turtle import TurtleParser, ParseError, nt_encode
from kgt.turtle.lexer import unescape
from kgt.turtle.terms import canonicalize
from tests.helpers import canon_bnodes, normalize_nt

EXAMPLES = "/root/reference/examples/turtle"
BASE_ROOT = "http://www.w3.org/2001/sw/DataAccess/df1/tests/"

KNOWN_PRE_W3C = {"test-29.ttl"}

_NUM_RE = re.compile(
    r'"([^"]*)"\^\^<(http://www\.w3\.org/2001/XMLSchema#'
    r'(?:integer|decimal|double|boolean))>'
)


def _canon_numeric(line: str) -> str:
    """Rewrite numeric literals to value-canonical form (value equality;
    decimals via double value — the 2004 goldens carry float-rounded
    expectations, e.g. test-28)."""

    def sub(m):
        lex, dt = m.group(1), m.group(2)
        if dt.endswith("#decimal") or dt.endswith("#double"):
            try:
                return f'"{float(lex)!r}"^^<{dt}>'
            except ValueError:
                pass
        t = canonicalize(("L", lex, dt, None, None))
        return nt_encode(t)

    return _NUM_RE.sub(sub, line)


def _load_pairs():
    pairs = []
    for ttl_path in sorted(glob.glob(f"{EXAMPLES}/test-*.ttl")):
        out_path = ttl_path[:-4] + ".out"
        name = os.path.basename(ttl_path)
        if os.path.exists(out_path) and name not in KNOWN_PRE_W3C:
            pairs.append((name, ttl_path, out_path))
    return pairs


PAIRS = _load_pairs()
BAD = sorted(glob.glob(f"{EXAMPLES}/bad-*.ttl"))


@pytest.mark.skipif(not PAIRS, reason="reference examples not available")
@pytest.mark.parametrize("name,ttl_path,out_path", PAIRS, ids=[p[0] for p in PAIRS])
def test_golden_pair(name, ttl_path, out_path):
    ttl = open(ttl_path, encoding="utf-8").read()
    expected_nt = open(out_path, encoding="utf-8").read()
    base = BASE_ROOT + name
    stmts, _errors = TurtleParser(base_uri=base).parse(ttl)
    # compare fully UNESCAPED on both sides: the goldens mix raw and
    # \uXXXX-escaped forms; our NT encoder always escapes controls
    got_lines = [
        unescape(_canon_numeric(f"{nt_encode(s)} {nt_encode(p)} {nt_encode(o)} ."))
        for s, p, o in stmts
    ]
    exp_lines = [
        unescape(_canon_numeric(line)) for line in normalize_nt(expected_nt)
    ]
    got, exp = canon_bnodes(got_lines), canon_bnodes(exp_lines)
    assert got == exp, (
        f"only-got: {sorted(got - exp)[:5]}\nonly-exp: {sorted(exp - got)[:5]}"
    )


@pytest.mark.skipif(not BAD, reason="reference examples not available")
@pytest.mark.parametrize("ttl_path", BAD, ids=[os.path.basename(b) for b in BAD])
def test_bad_rejected(ttl_path):
    ttl = open(ttl_path, encoding="utf-8").read()
    with pytest.raises(ParseError):
        TurtleParser(validate=True, base_uri=BASE_ROOT).parse(ttl)
