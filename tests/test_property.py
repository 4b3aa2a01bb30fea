"""Property-based hardening (hypothesis): the parser must never crash —
only recover — on arbitrary input; writer→parser round-trips must hold
for arbitrary generated graphs; NT encode/decode must be inverse.

(The reference has no property tests — SURVEY §5.1; this is added
hardening for the pipeline setting, where arbitrary transcript text
reaches the parser.)
"""

import string

from hypothesis import given, settings, strategies as st

from kgt.turtle import TurtleParser, nt_encode
from kgt.turtle.writer import decode_nt, serialize_pretty
from tests.helpers import canon_bnodes, parse_nt

# --- 1. total robustness: any text parses without raising ------------


@settings(max_examples=300, deadline=None)
@given(st.text(max_size=400))
def test_parser_never_crashes_on_arbitrary_text(text):
    stmts, errors = TurtleParser().parse(text)
    assert isinstance(stmts, list) and isinstance(errors, list)


@settings(max_examples=200, deadline=None)
@given(st.text(alphabet="<>\"'{}|^`\\@.;,()[]_:a1 \n\t#", max_size=200))
def test_parser_never_crashes_on_adversarial_punctuation(text):
    stmts, errors = TurtleParser(rdfstar=True).parse(text)
    assert isinstance(stmts, list)


# --- 1b. the document scanner and the production machinery agree ------


class _SlowOnlyParser(TurtleParser):
    """Forces the statement-level/recursive-descent pipeline: the
    document fast path reports failure without touching state."""

    def _fast_parse_doc(self, text):
        return False


_TURTLE_ISH = st.text(
    alphabet=(
        '<>"\'.;,()[]_:@^ \n\t#'
        + string.ascii_letters
        + string.digits
        + "+-"
    ),
    max_size=250,
)


@settings(max_examples=400, deadline=None)
@given(_TURTLE_ISH)
def test_scanner_agrees_with_slow_path(text):
    """Byte-identical statements AND errors whether the one-pass
    document scanner runs or the machinery parses everything —
    hypothesis hunts the token shapes where the scanner's bail/commit
    boundary could diverge."""
    fast_stmts, fast_errs = TurtleParser().parse(text)
    slow_stmts, slow_errs = _SlowOnlyParser().parse(text)
    assert fast_stmts == slow_stmts
    assert fast_errs == slow_errs


_SIMPLE_DOC = st.lists(
    st.tuples(
        st.from_regex(r"[a-z][a-z0-9]{0,6}", fullmatch=True),
        st.from_regex(r"[a-z][a-z0-9]{0,6}", fullmatch=True),
        st.one_of(
            st.from_regex(r"[a-z][a-z0-9]{0,6}", fullmatch=True).map(
                lambda s: f"p:{s}"
            ),
            st.integers(-999, 999).map(str),
            st.from_regex(r"[A-Za-z ]{0,12}", fullmatch=True).map(
                lambda s: '"' + s + '"'
            ),
        ),
    ),
    min_size=1,
    max_size=8,
).map(
    lambda rows: "@prefix p: <urn:p:> .\n"
    + "\n".join(f"p:{s} p:{p} {o} ." for s, p, o in rows)
)


@settings(max_examples=300, deadline=None)
@given(_SIMPLE_DOC)
def test_scanner_agrees_on_wellformed_docs(doc):
    """On the scanner's own happy-path shapes the agreement must hold
    with ZERO errors on both sides (no silent divergence hiding in the
    recovery path)."""
    fast_stmts, fast_errs = TurtleParser().parse(doc)
    slow_stmts, slow_errs = _SlowOnlyParser().parse(doc)
    assert fast_stmts == slow_stmts
    assert not fast_errs and not slow_errs


# --- 2. term encode/decode inverse ------------------------------------

_iri = st.from_regex(r"http://e/[A-Za-z0-9_]{1,10}", fullmatch=True).map(
    lambda s: ("I", s)
)
_bnode = st.from_regex(r"[A-Za-z][A-Za-z0-9]{0,8}", fullmatch=True).map(
    lambda s: ("B", s)
)
_plain_text = st.text(
    alphabet=string.printable + "é漢 ", max_size=30
)
_literal = st.one_of(
    _plain_text.map(lambda s: ("L", s, None, None, None)),
    _plain_text.map(
        lambda s: ("L", s, "http://www.w3.org/2001/XMLSchema#token", None, None)
    ),
    st.tuples(
        # lowercase only: language tags downcase at term construction
        # (kgt/turtle/terms.py literal_term), so a mixed-case tag in a
        # raw tuple is not a constructible term
        _plain_text, st.from_regex(r"[a-z]{2}(-[a-z0-9]{1,4})?", fullmatch=True)
    ).map(lambda t: ("L", t[0], None, t[1], None)),
)
_term = st.one_of(_iri, _bnode, _literal)


@settings(max_examples=300, deadline=None)
@given(_term)
def test_nt_encode_decode_inverse(term):
    assert decode_nt(nt_encode(term)) == term


@settings(max_examples=100, deadline=None)
@given(st.tuples(_term, _iri, _term))
def test_quoted_triple_encode_decode_inverse(spo):
    q = ("Q", spo[0], spo[1], spo[2])
    assert decode_nt(nt_encode(q)) == q


# --- 3. writer round-trip for generated graphs -------------------------

_subject = st.one_of(_iri, _bnode)
_statement = st.tuples(_subject, _iri, _term)


@settings(max_examples=150, deadline=None)
@given(st.lists(_statement, min_size=1, max_size=12))
def test_pretty_writer_roundtrip_random_graphs(stmts):
    out = serialize_pretty(stmts)
    lines1 = canon_bnodes(
        [f"{nt_encode(s)} {nt_encode(p)} {nt_encode(o)} ." for s, p, o in stmts]
    )
    reparsed = parse_nt(out)
    assert canon_bnodes(reparsed) == lines1, out
