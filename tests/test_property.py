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


# --- 4. rich-grammar document fuzz ------------------------------------
# A generator covering the syntax the simple-doc strategy doesn't:
# directives (both forms), ';'/',' lists, all literal shapes (long
# strings, langs/dirs, datatypes, numerics), bnode property lists,
# collections, and quoted triples — then three differential checks:
# clean parse, fused-vs-slow lexer agreement, and a full pretty-writer
# graph round-trip.

_pn = st.from_regex(r"[a-z][a-z0-9]{0,6}", fullmatch=True)
_obj_atom = st.one_of(
    _pn.map(lambda s: f"p:{s}"),
    st.from_regex(r"[A-Za-z0-9_]{1,8}", fullmatch=True).map(
        lambda s: f"<urn:o:{s}>"
    ),
    st.integers(-10**6, 10**6).map(str),
    st.from_regex(r"-?[0-9]{1,4}\.[0-9]{1,4}", fullmatch=True),
    st.from_regex(r"-?[0-9]{1,3}\.[0-9]{1,3}[eE][+-]?[0-9]{1,2}", fullmatch=True),
    st.sampled_from(["true", "false"]),
    st.text(alphabet=string.ascii_letters + " .,'é漢", max_size=12).map(
        lambda s: '"' + s.replace("\\", "").replace('"', "") + '"'
    ),
    st.text(alphabet=string.ascii_letters + " \n\t", max_size=15).map(
        lambda s: '"""' + s.replace("\\", "").replace('"', "") + '"""'
    ),
    st.tuples(
        st.from_regex(r"[A-Za-z ]{0,8}", fullmatch=True),
        st.from_regex(r"[a-z]{2}(-[A-Za-z0-9]{1,3})?", fullmatch=True),
    ).map(lambda t: f'"{t[0]}"@{t[1]}'),
    st.from_regex(r"[0-9]{1,6}", fullmatch=True).map(
        lambda s: f'"{s}"^^<http://www.w3.org/2001/XMLSchema#integer>'
    ),
)


def _obj(depth):
    if depth <= 0:
        return _obj_atom
    sub = _obj(depth - 1)
    return st.one_of(
        _obj_atom,
        # collection
        st.lists(sub, max_size=3).map(
            lambda xs: "(" + " ".join(xs) + ")"
        ),
        # bnode property list
        st.lists(st.tuples(_pn, sub), min_size=1, max_size=2).map(
            lambda po: "[ " + " ; ".join(f"p:{p} {o}" for p, o in po) + " ]"
        ),
        # quoted triple (subject/object positions per rdf12)
        st.tuples(_pn, _pn, _obj_atom).map(
            lambda t: f"<< p:{t[0]} p:{t[1]} {t[2]} >>"
        ),
    )


_rich_stmt = st.tuples(
    st.one_of(
        _pn.map(lambda s: f"p:{s}"),
        _pn.map(lambda s: f"_:{s}"),
        st.just("[]"),
    ),
    st.lists(
        st.tuples(
            st.one_of(_pn.map(lambda s: f"p:{s}"), st.just("a")),
            st.lists(_obj(2), min_size=1, max_size=3),
        ),
        min_size=1,
        max_size=3,
    ),
).map(
    lambda t: t[0]
    + " "
    + " ; ".join(f"{verb} " + " , ".join(objs) for verb, objs in t[1])
    + " ."
)

_RICH_DOC = st.lists(_rich_stmt, min_size=1, max_size=6).map(
    lambda stmts: "@prefix p: <urn:p:> .\nPREFIX q: <urn:q:>\n"
    + "\n".join(stmts)
)


@settings(max_examples=200, deadline=None)
@given(_RICH_DOC)
def test_rich_grammar_fuzz(doc):
    """Every generated document is valid Turtle-star: it must (a)
    parse clean, (b) lex identically on the fused and slow scanner
    paths, (c) survive parse → serialize_pretty → re-parse with the
    identical canonical graph — the differential net that caught the
    round-4 writer data-loss bugs, now driven by a generator instead
    of the fixed W3C corpus."""
    fast_stmts, fast_errs = TurtleParser(rdfstar=True).parse(doc)
    assert not fast_errs, (fast_errs[:2], doc)
    slow_stmts, slow_errs = _SlowOnlyParser(rdfstar=True).parse(doc)
    assert not slow_errs and fast_stmts == slow_stmts, doc

    out = serialize_pretty(fast_stmts)
    reparsed, errs2 = TurtleParser(rdfstar=True).parse(out)
    assert not errs2, (errs2[:2], out)

    def lines(ss):
        # SET semantics: the parser is a statement stream (duplicates
        # preserved, like the reference reader), the writer serializes
        # the GRAPH (a set) — a generated duplicate triple legally
        # collapses on round trip
        return sorted(
            {
                f"{nt_encode(s)} {nt_encode(p)} {nt_encode(o)} ."
                for s, p, o in ss
            }
        )

    l1, l2 = lines(fast_stmts), lines(reparsed)
    try:
        assert canon_bnodes(l2) == canon_bnodes(l1), out
    except ValueError:
        # bnode-heavy graphs exceed the exact-isomorphism helper's
        # budget: fall back to label-blinded multiset equality (plus
        # the implied statement-count equality) — weaker than
        # isomorphism but still catches every data-loss/duplication
        # shape this fuzz hunts
        import re as _re

        def blind(ls):
            return sorted(_re.sub(r"_:\S+", "_:b", ln) for ln in ls)

        assert blind(l2) == blind(l1), out
