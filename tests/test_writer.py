"""Writer core + round-trip tests (mirrors spec/writer_spec.rb:760-791:
golden → writer → re-parse → isomorphic)."""

import pytest

from kgt.turtle import TurtleParser, nt_encode
from kgt.turtle.writer import (
    decode_nt,
    format_literal,
    format_uri,
    get_pname,
    quoted,
    serialize_pretty,
)
from tests.helpers import canon_bnodes, parse_nt

XSD = "http://www.w3.org/2001/XMLSchema#"


class TestDecodeNT:
    @pytest.mark.parametrize(
        "s,term",
        [
            ("<http://e/x>", ("I", "http://e/x")),
            ("_:b0", ("B", "b0")),
            ('"plain"', ("L", "plain", None, None, None)),
            (f'"1"^^<{XSD}integer>', ("L", "1", XSD + "integer", None, None)),
            ('"x"@en', ("L", "x", None, "en", None)),
            ('"x"@en--ltr', ("L", "x", None, "en", "ltr")),
            (
                '<< <tag:s> <tag:p> "o" >>',
                ("Q", ("I", "tag:s"), ("I", "tag:p"), ("L", "o", None, None, None)),
            ),
        ],
    )
    def test_cases(self, s, term):
        assert decode_nt(s) == term

    def test_roundtrip_escapes(self):
        t = ("L", 'a"b\\c\nd', None, None, None)
        assert decode_nt(nt_encode(t)) == t

    def test_nested_quoted(self):
        t = (
            "Q",
            ("Q", ("I", "a:s"), ("I", "a:p"), ("I", "a:o")),
            ("I", "a:q"),
            ("B", "b1"),
        )
        assert decode_nt(nt_encode(t)) == t


class TestGetPname:
    P = {"foaf": "http://xmlns.com/foaf/0.1/", "ex": "http://e/", "": "http://d/"}

    def test_basic(self):
        assert get_pname("http://xmlns.com/foaf/0.1/name", self.P) == "foaf:name"

    def test_longest_prefix_wins(self):
        p = {"a": "http://e/", "ab": "http://e/sub/"}
        assert get_pname("http://e/sub/x", p) == "ab:x"

    def test_empty_prefix(self):
        assert get_pname("http://d/y", self.P) == ":y"

    def test_no_match(self):
        assert get_pname("urn:other:x", self.P) is None

    def test_invalid_local_part_rejected(self):
        # a suffix that is not a valid PN_LOCAL must not produce a pname
        assert get_pname("http://e/a b", self.P) is None


class TestFormatLiteral:
    # writer shorthand matrix (spec/writer_spec.rb:365-600 behavior)
    @pytest.mark.parametrize(
        "term,expected",
        [
            (("L", "true", XSD + "boolean", None, None), "true"),
            (("L", "1", XSD + "integer", None, None), "1"),
            (("L", "1.0", XSD + "decimal", None, None), "1.0"),
            (("L", "1.0e1", XSD + "double", None, None), "1.0e1"),
            # out-of-form lexicals fall back to quoted+datatype
            (
                ("L", "bad", XSD + "integer", None, None),
                f'"bad"^^<{XSD}integer>',
            ),
            (("L", "s", None, None, None), '"s"'),
            (("L", "s", None, "en", None), '"s"@en'),
            (("L", "s", None, "en", "ltr"), '"s"@en--ltr'),
            (("L", "s", XSD + "string", None, None), '"s"'),
        ],
    )
    def test_matrix(self, term, expected):
        assert format_literal(term) == expected

    def test_quoted_long_form(self):
        assert quoted("a\nb") == '"""a\nb"""'
        assert quoted('say "hi"') == '"say \\"hi\\""'


class TestFormatUri:
    def test_relativize(self):
        assert format_uri(("I", "http://b/x/y"), base="http://b/x/") == "<y>"

    def test_pname_fallback(self):
        assert format_uri(("I", "http://e/z"), {"ex": "http://e/"}) == "ex:z"

    def test_plain(self):
        assert format_uri(("I", "urn:x:1")) == "<urn:x:1>"


def _roundtrip(ttl_in: str, prefixes=None, **popts):
    """parse → serialize_pretty → re-parse → compare canonical sets."""
    p1 = TurtleParser(**popts)
    stmts, errs = p1.parse(ttl_in)
    assert not errs
    out = serialize_pretty(stmts, prefixes=prefixes)
    lines1 = [
        f"{nt_encode(s)} {nt_encode(p)} {nt_encode(o)} ." for s, p, o in stmts
    ]
    lines2 = parse_nt(out, **popts)
    assert canon_bnodes(lines1) == canon_bnodes(lines2), out
    return out


class TestPrettyRoundTrip:
    def test_simple(self):
        _roundtrip("<tag:s> <tag:p> <tag:o> ; <tag:q> 1, 2.5, true .")

    def test_rdf_type_as_a(self):
        out = _roundtrip("<tag:s> a <tag:C> .")
        assert " a " in out

    def test_prefix_shortening(self):
        out = _roundtrip(
            "<http://e/s> <http://e/p> <http://e/o> .",
            prefixes={"ex": "http://e/"},
        )
        assert "ex:s ex:p ex:o ." in out
        assert "@prefix ex: <http://e/> ." in out

    def test_inline_bnode(self):
        # reference object-position bNPL has no inner padding:
        # writer.rb:561 writes '[' then the predicateObjectList directly
        out = _roundtrip('<tag:s> <tag:p> [ <tag:q> "v" ] .')
        assert '[<tag:q> "v"]' in out

    def test_shared_bnode_not_inlined(self):
        out = _roundtrip(
            "<tag:s> <tag:p> _:x . <tag:t> <tag:q> _:x . _:x <tag:r> 1 ."
        )
        assert "[" not in out

    def test_collection(self):
        out = _roundtrip('@prefix : <http://e/> . :s :l ("a" "b" "c") .')
        assert '("a" "b" "c")' in out

    def test_nested_structures(self):
        _roundtrip(
            '@prefix : <http://e/> . :s :p [ :q ( 1 2 ) ; :r [ :t "x" ] ] .'
        )

    def test_empty_collection(self):
        out = _roundtrip("@prefix : <http://e/> . :s :l () .")
        assert "()" in out

    def test_object_grouping_with_comma(self):
        out = _roundtrip('<tag:s> <tag:p> "a", "b", "c" .')
        assert out.count("<tag:p>") == 1

    def test_predicate_order_type_first(self):
        out = _roundtrip(
            '<tag:s> <tag:z> "v" ; a <tag:C> .'
        )
        assert out.index(" a ") < out.index("<tag:z>")


class TestWriterOptions:
    # writer.rb:109-130 option semantics
    def test_literal_shorthand_off(self):
        out = _roundtrip("<tag:s> <tag:p> 1, true .", )
        assert " 1" in out and "true" in out
        from kgt.turtle import TurtleParser
        stmts, _ = TurtleParser().parse("<tag:s> <tag:p> 1, true .")
        long = serialize_pretty(stmts, literal_shorthand=False)
        assert '"1"^^' in long and '"true"^^' in long

    def test_max_depth_limits_inlining(self):
        ttl = '<tag:s> <tag:p> [ <tag:q> [ <tag:r> [ <tag:t> "deep" ] ] ] .'
        deep = _roundtrip(ttl)
        assert deep.count("[") == 3
        from kgt.turtle import TurtleParser
        stmts, _ = TurtleParser().parse(ttl)
        shallow = serialize_pretty(stmts, max_depth=1)
        # beyond depth 1, bnodes fall back to labels
        assert shallow.count("[") < 3 and "_:" in shallow
        # still round-trips
        from tests.helpers import canon_bnodes, parse_nt
        lines1 = [
            f"{nt_encode(s)} {nt_encode(p)} {nt_encode(o)} ."
            for s, p, o in stmts
        ]
        assert canon_bnodes(lines1) == canon_bnodes(parse_nt(shallow))

    def test_default_namespace(self):
        from kgt.turtle import TurtleParser
        stmts, _ = TurtleParser().parse("<http://d/s> <http://d/p> 1 .")
        out = serialize_pretty(stmts, default_namespace="http://d/")
        assert ":s :p 1 ." in out
        assert "@prefix : <http://d/> ." in out

    def test_standard_prefixes(self):
        from kgt.turtle import TurtleParser
        stmts, _ = TurtleParser().parse(
            "<tag:s> <http://xmlns.com/foaf/0.1/name> 'x' ."
        )
        out = serialize_pretty(stmts, standard_prefixes=True)
        assert "foaf:name" in out

    def test_unique_bnodes(self):
        from kgt.turtle import TurtleParser
        stmts, _ = TurtleParser().parse(
            "_:a <tag:p> _:a . _:b <tag:q> _:a ."
        )
        out = serialize_pretty(stmts, unique_bnodes=True)
        # unique labels match RDF.rb's to_unique_base shape: _:g\w+
        import re as _re

        assert _re.search(r"_:g\w+", out), out
        from tests.helpers import canon_bnodes, parse_nt
        lines1 = [
            f"{nt_encode(s)} {nt_encode(p)} {nt_encode(o)} ."
            for s, p, o in stmts
        ]
        assert canon_bnodes(lines1) == canon_bnodes(parse_nt(out))


class TestCollectionDataLossDeviations:
    """Two shapes where the REFERENCE writer silently drops triples
    (documented deviations; see collection() and serialize() in
    kgt/turtle/writer.py): every statement must survive the round trip.
    """

    def test_nested_collection_as_subject(self):
        # writer.rb:546 would emit a dangling bare label for the inner
        # list and lose its 4 triples
        _roundtrip("@prefix : <http://e/> . ((1 2) (3 4)) :p :o .")

    def test_single_nested_collection_as_subject(self):
        _roundtrip("@prefix : <http://e/> . ((1 2)) :p :o .")

    def test_list_element_bnode_referenced_elsewhere(self):
        # _:b is a list element AND an object of another triple
        # (ref_count 2): not inlinable, excluded from top-level by
        # order_subjects — the no-data-loss net must emit it
        _roundtrip(
            "@prefix : <http://e/> . :s :p (_:b) . :x :q _:b . "
            "_:b :r :z ."
        )


def test_plain_and_xsd_string_literals_are_one_term():
    """RDF 1.1 Concepts §3.3: a simple literal IS the xsd:string
    literal — they must dedupe as one term (review find, round 6: the
    writer printed '"x", "x"' for '"x", "x"^^xsd:string')."""
    from kgt.turtle import TurtleParser
    from kgt.turtle.writer import serialize_pretty

    XSD = "http://www.w3.org/2001/XMLSchema#"
    stmts, errs = TurtleParser().parse(
        f'<http://e/s> <http://e/p> "x", "x"^^<{XSD}string> .'
    )
    assert not errs
    assert len(set(stmts)) == 1  # one term, one statement after dedup
    out = serialize_pretty(set(stmts))
    assert out.count('"x"') == 1
    reparsed, errs2 = TurtleParser().parse(out)
    assert not errs2 and set(reparsed) == set(stmts)


def test_referenced_list_head_with_type_keeps_all_triples():
    """Review find (round 6): a referenced list head carrying `a :X`
    used to inline as (...) and silently DROP the rdf:type triple
    (the reference's prop_count excludes type — writer.rb:494-499 —
    and collection() marks the node done). Any extra property now
    blocks inlining so every statement reaches the document."""
    from kgt.turtle import TurtleParser, nt_encode
    from kgt.turtle.writer import serialize_pretty
    from tests.helpers import canon_bnodes

    R = "http://www.w3.org/1999/02/22-rdf-syntax-ns#"
    doc = (
        f"<http://e/s> <http://e/p> _:l . "
        f"_:l <{R}first> 1 ; <{R}rest> <{R}nil> ; "
        f"<{R}type> <http://e/X> ."
    )
    stmts, errs = TurtleParser().parse(doc)
    assert not errs and len(stmts) == 4
    out = serialize_pretty(stmts)
    reparsed, errs2 = TurtleParser().parse(out)
    assert not errs2

    def canon(ss):
        return canon_bnodes(
            sorted(
                f"{nt_encode(s)} {nt_encode(p)} {nt_encode(o)} ."
                for s, p, o in ss
            )
        )

    assert canon(reparsed) == canon(stmts)
    # an UNREFERENCED typed list head (subject position) still works
    doc2 = (
        f"_:m <{R}first> 1 ; <{R}rest> <{R}nil> ; "
        f"<{R}type> <http://e/X> ."
    )
    stmts2, _ = TurtleParser().parse(doc2)
    reparsed2, e2 = TurtleParser().parse(serialize_pretty(stmts2))
    assert not e2 and canon(reparsed2) == canon(stmts2)
