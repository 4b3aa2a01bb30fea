"""Parser behavior matrices, mirroring spec/reader_spec.rb's coverage:
literals, directives, pname escapes, bnodes, collections, object/predicate
lists, canonicalization, malformed datatypes, validation, recovery, RDF-star.
"""

import pytest

from kgt.turtle import TurtleParser, ParseError
from tests.helpers import assert_equivalent, parse_nt

XSD = "http://www.w3.org/2001/XMLSchema#"
RDF = "http://www.w3.org/1999/02/22-rdf-syntax-ns#"


def obj_of(ttl, **kw):
    lines = parse_nt(ttl, **kw)
    assert len(lines) == 1, lines
    # strip "<s> <p> " prefix and " ." suffix
    return lines[0].split(" ", 2)[2][:-2].strip()


class TestLiterals:
    # numeric shorthand matrix (spec/reader_spec.rb:387-404)
    @pytest.mark.parametrize(
        "lit,expected",
        [
            ("1", f'"1"^^<{XSD}integer>'),
            ("+1", f'"+1"^^<{XSD}integer>'),
            ("-1", f'"-1"^^<{XSD}integer>'),
            ("1.0", f'"1.0"^^<{XSD}decimal>'),
            (".1", f'"0.1"^^<{XSD}decimal>'),
            ("1.0e1", f'"1.0e1"^^<{XSD}double>'),
            ("1.0E1", f'"1.0E1"^^<{XSD}double>'),
            ("123.E+1", f'"123.0E+1"^^<{XSD}double>'),
            ("true", f'"true"^^<{XSD}boolean>'),
            ("false", f'"false"^^<{XSD}boolean>'),
        ],
    )
    def test_numeric_shorthand(self, lit, expected):
        assert obj_of(f"<tag:a> <tag:b> {lit} .") == expected

    def test_plain_string(self):
        assert obj_of('<tag:a> <tag:b> "s" .') == '"s"'

    def test_single_quoted(self):
        assert obj_of("<tag:a> <tag:b> 's' .") == '"s"'

    @pytest.mark.parametrize(
        "lit,expected",
        [
            ('"s"@en', '"s"@en'),
            # downcased at construction, like RDF.rb's Literal (the
            # reference's mixed-case-language spec expects @en from @EN
            # with NO canonicalization)
            ('"s"@EN', '"s"@en'),
            ('"s"@en-US', '"s"@en-us'),
            ('"s"@en--ltr', '"s"@en--ltr'),
            ('"""s"""@en--rtl', '"s"@en--rtl'),
        ],
    )
    def test_language_direction(self, lit, expected):
        assert obj_of(f"<tag:a> <tag:b> {lit} .") == expected

    def test_typed_literal_iriref(self):
        assert (
            obj_of('<tag:a> <tag:b> "s"^^<tag:dt> .') == '"s"^^<tag:dt>'
        )

    def test_typed_literal_pname(self):
        ttl = f'@prefix xsd: <{XSD}> . <tag:a> <tag:b> "1"^^xsd:int .'
        assert obj_of(ttl) == f'"1"^^<{XSD}int>'

    def test_long_string_multiline(self):
        ttl = '<tag:a> <tag:b> """line1\nline2 "quoted"\n""" .'
        assert obj_of(ttl) == '"line1\\nline2 \\"quoted\\"\\n"'

    def test_string_escapes(self):
        assert obj_of(r'<tag:a> <tag:b> "\t\n\"\\" .') == r'"\t\n\"\\"'

    def test_uchar_in_string(self):
        assert obj_of(r'<tag:a> <tag:b> "A\U00000042" .') == '"AB"'

    def test_xsd_string_datatype_simplifies(self):
        # "s"^^xsd:string is a simple literal in RDF 1.1 NT encoding
        assert obj_of(f'<tag:a> <tag:b> "s"^^<{XSD}string> .') == '"s"'


class TestCanonicalization:
    # spec/reader_spec.rb:1056-1075
    @pytest.mark.parametrize(
        "lit,expected",
        [
            ('"+1"^^xsd:integer', f'"1"^^<{XSD}integer>'),
            ("+1", f'"1"^^<{XSD}integer>'),
            (".1", f'"0.1"^^<{XSD}decimal>'),
            ("123.E+1", f'"1.23E3"^^<{XSD}double>'),
            ("true", f'"true"^^<{XSD}boolean>'),
            ('"lang"@EN', '"lang"@en'),
            ('"""lang"""@EN', '"lang"@en'),
            ('"""lang"""@EN--ltr', '"lang"@en--ltr'),
            ('"""+1"""^^xsd:integer', f'"1"^^<{XSD}integer>'),
        ],
    )
    def test_matrix(self, lit, expected):
        ttl = f"@prefix xsd: <{XSD}> . <http://example/a> <http://example/b> {lit} ."
        assert obj_of(ttl, canonicalize=True) == expected

    def test_iri_unicode_kept(self):
        ttl = "<http://example/a> <http://example/b> <http://example/Dürst> ."
        assert obj_of(ttl, canonicalize=True) == "<http://example/Dürst>"


class TestDirectives:
    def test_prefix_redefinition_mid_document(self):
        # spec/reader_spec.rb:460-473
        ttl = """
        @prefix a: <http://host/A#> .
        a:b a:p a:v .
        @prefix a: <http://host/Z#> .
        a:b a:p a:v .
        """
        lines = parse_nt(ttl)
        assert "<http://host/A#b> <http://host/A#p> <http://host/A#v> ." in lines
        assert "<http://host/Z#b> <http://host/Z#p> <http://host/Z#v> ." in lines

    def test_relative_base_chain(self):
        # spec/reader_spec.rb:580-597: new @base resolves against previous
        ttl = """
        @base <http://example.com/products/>.
        <> <tag:p> <prod123> .
        @base <prod456/>.
        <> <tag:p> <sub> .
        """
        lines = parse_nt(ttl)
        assert (
            "<http://example.com/products/> <tag:p> <http://example.com/products/prod123> ."
            in lines
        )
        assert (
            "<http://example.com/products/prod456/> <tag:p> <http://example.com/products/prod456/sub> ."
            in lines
        )

    def test_sparql_form_case_insensitive(self):
        ttl = 'PrEfIx p: <http://x/> BASE <http://y/> p:a <tag:p> <z> .'
        lines = parse_nt(ttl)
        assert lines == ["<http://x/a> <tag:p> <http://y/z> ."]

    @pytest.mark.parametrize(
        "ttl",
        [
            "@prefix p: <http://x/> .  p:a <tag:q> p:b .",  # @ + terminated: ok
            "PREFIX p: <http://x/>  p:a <tag:q> p:b .",  # SPARQL + bare: ok
        ],
    )
    def test_valid_directive_forms(self, ttl):
        assert parse_nt(ttl) == ["<http://x/a> <tag:q> <http://x/b> ."]

    @pytest.mark.parametrize(
        "ttl",
        [
            "@PREFIX p: <http://x/> .  p:a <tag:q> p:b .",  # must be downcased
            "PREFIX p: <http://x/> .  p:a <tag:q> p:b .",  # must not terminate
            "@prefix p: <http://x/>  p:a <tag:q> p:b .",  # must terminate
        ],
    )
    def test_invalid_directive_forms_raise_validating(self, ttl):
        with pytest.raises(ParseError):
            TurtleParser(validate=True).parse(ttl)

    def test_empty_prefix_fallback_to_base(self):
        # undefined empty prefix → string concat against base (reader.rb:221-229)
        ttl = ":a :b :c ."
        lines = parse_nt(ttl, base_uri="http://host/path")
        # string CONCATENATION against the in-scope base (reader.rb:211),
        # not RFC 3986 resolution
        assert lines == [
            "<http://host/patha> <http://host/pathb> <http://host/pathc> ."
        ]

    def test_undefined_prefix_errors(self):
        errs = TurtleParser().parse("q:a <tag:p> <tag:o> .")[1]
        assert errs


class TestPnames:
    # PN_LOCAL_ESC table (spec/reader_spec.rb:492-526)
    @pytest.mark.parametrize(
        "esc,char",
        [(f"\\{c}", c) for c in "_~.-!$&'()*+,;=/?#@%"],
    )
    def test_pn_local_esc(self, esc, char):
        ttl = f"@prefix p: <http://x/> . p:a <tag:q> p:{esc}x ."
        assert obj_of(ttl) == f"<http://x/{char}x>"

    def test_percent_encoded_kept(self):
        ttl = "@prefix p: <http://x/> . p:a <tag:q> p:%25b ."
        assert obj_of(ttl) == "<http://x/%25b>"

    def test_redundant_hash_dropped(self):
        # prefix IRI contains '#' → redundant leading '#' of the (escaped)
        # suffix dropped, avoiding "y##frag" (reader.rb:236)
        ttl = r"@prefix p: <http://x/y#> . p:a <tag:q> p:\#frag ."
        assert obj_of(ttl) == "<http://x/y#frag>"
        # unescaped '#' starts a comment: object is just the prefix IRI
        ttl2 = "@prefix p: <http://x/y#> . p:a <tag:q> p:#frag ."
        assert obj_of(ttl2) == "<http://x/y#>"

    def test_pname_expansion_is_concatenation(self):
        # "../x" suffix is NOT resolved segment-wise at concat time, but the
        # concatenated result, if relative, resolves against base
        ttl = "@prefix p: <rel/> . p:a <tag:q> p:b ."
        lines = parse_nt(ttl, base_uri="http://h/d/e")
        assert lines == ["<http://h/d/rel/a> <tag:q> <http://h/d/rel/b> ."]


class TestBnodesAndLists:
    def test_labeled_bnode_identity(self):
        ttl = "_:a <tag:p> _:b . _:a <tag:q> _:a ."
        lines = parse_nt(ttl)
        assert lines == [
            "_:ua <tag:p> _:ub .",
            "_:ua <tag:q> _:ua .",
        ]

    def test_anon_distinct(self):
        ttl = "<tag:s> <tag:p> [], [] ."
        lines = parse_nt(ttl)
        assert lines == [
            "<tag:s> <tag:p> _:g0 .",
            "<tag:s> <tag:p> _:g1 .",
        ]

    def test_property_list_emission_order(self):
        ttl = "@prefix : <http://e/> . :s :p [ :q [ :r 'deep' ] ; :t 'mid' ] ."
        assert parse_nt(ttl) == [
            '_:g1 <http://e/r> "deep" .',
            "_:g0 <http://e/q> _:g1 .",
            '_:g0 <http://e/t> "mid" .',
            "<http://e/s> <http://e/p> _:g0 .",
        ]

    def test_bnode_property_list_as_subject_no_pol(self):
        ttl = "[ <tag:p> 1 ] ."
        assert parse_nt(ttl) == [
            f'_:g0 <tag:p> "1"^^<{XSD}integer> .'
        ]

    def test_empty_collection(self):
        assert_equivalent(
            "@prefix :<http://example.com/>. :empty :set ().",
            f"<http://example.com/empty> <http://example.com/set> <{RDF}nil> .",
        )

    def test_single_element_collection(self):
        assert_equivalent(
            '@prefix :<http://example.com/>. :gregg :wrote ("RdfContext").',
            f"""
            _:b0 <{RDF}first> "RdfContext" .
            _:b0 <{RDF}rest> <{RDF}nil> .
            <http://example.com/gregg> <http://example.com/wrote> _:b0 .
            """,
        )

    def test_multi_element_collection_order(self):
        ttl = '@prefix : <http://e/>. :g :name ("A" "B").'
        assert parse_nt(ttl) == [
            f'_:g0 <{RDF}first> "A" .',
            f"_:g0 <{RDF}rest> _:g1 .",
            f'_:g1 <{RDF}first> "B" .',
            f"_:g1 <{RDF}rest> <{RDF}nil> .",
            "<http://e/g> <http://e/name> _:g0 .",
        ]

    def test_collection_as_subject_recovers(self):
        # spec "as subject": cell triples emitted, containing stmt dropped
        ttl = '("1" "2") . () .'
        lines = parse_nt(ttl)
        assert len(lines) == 4  # 2 first + 2 rest
        with pytest.raises(ParseError):
            TurtleParser(validate=True).parse(ttl)

    def test_nil_list_as_subject_with_property(self):
        assert_equivalent(
            '@prefix a: <http://foo/a#> . () a:prop "nilProp" .',
            f'<{RDF}nil> <http://foo/a#prop> "nilProp" .',
        )

    def test_object_and_predicate_lists(self):
        ttl = """@prefix a: <http://foo/a#> .
        a:b a:p1 "123", "456" .
        a:b a:p2 a:v1 ; a:p3 a:v2 .
        """
        assert_equivalent(
            ttl,
            """
            <http://foo/a#b> <http://foo/a#p1> "123" .
            <http://foo/a#b> <http://foo/a#p1> "456" .
            <http://foo/a#b> <http://foo/a#p2> <http://foo/a#v1> .
            <http://foo/a#b> <http://foo/a#p3> <http://foo/a#v2> .
            """,
        )

    def test_trailing_semicolons_tolerated(self):
        ttl = "<tag:s> <tag:p> <tag:o> ;; ;  ."
        assert parse_nt(ttl) == ["<tag:s> <tag:p> <tag:o> ."]

    def test_verb_a_and_A(self):
        # both 'a' and 'A' match rdf:type (README "Variations")
        assert parse_nt("<tag:s> a <tag:C> .") == [
            f"<tag:s> <{RDF}type> <tag:C> ."
        ]
        assert parse_nt("<tag:s> A <tag:C> .") == [
            f"<tag:s> <{RDF}type> <tag:C> ."
        ]


class TestMalformedDatatypes:
    # spec/reader_spec.rb:1077-1111
    CASES = [
        ("boolean", "foo"),
        ("date", "+2010-01-01Z"),
        ("date", "2010-01-01TFOO"),
        ("date", "02010-01-01"),
        ("date", "2010-1-1"),
        ("date", "0000-01-01"),
        ("date", "2011-07"),
        ("date", "2011"),
        ("dateTime", "+2010-01-01T00:00:00Z"),
        ("dateTime", "2010-01-01T00:00:00FOO"),
        ("dateTime", "02010-01-01T00:00:00"),
        ("dateTime", "2010-01-01"),
        ("dateTime", "2010-1-1T00:00:00"),
        ("dateTime", "0000-01-01T00:00:00"),
        ("dateTime", "2011-07"),
        ("dateTime", "2011"),
        ("decimal", "12.xyz"),
        ("double", "xy.z"),
        ("double", "+1.0z"),
        ("integer", "+1.0z"),
        ("integer", "foo"),
        ("time", "+00:00:00Z"),
        ("time", "-00:00:00Z"),
        ("time", "00:00"),
        ("time", "00"),
    ]

    @pytest.mark.parametrize("dt,value", CASES)
    def test_invalid_kept_when_not_validating(self, dt, value):
        ttl = f'@prefix xsd: <{XSD}> . <tag:s> <tag:p> "{value}"^^xsd:{dt} .'
        assert obj_of(ttl) == f'"{value}"^^<{XSD}{dt}>'

    @pytest.mark.parametrize("dt,value", CASES)
    def test_invalid_raises_when_validating(self, dt, value):
        ttl = f'@prefix xsd: <{XSD}> . <tag:s> <tag:p> "{value}"^^xsd:{dt} .'
        with pytest.raises(ParseError):
            TurtleParser(validate=True).parse(ttl)

    @pytest.mark.parametrize(
        "dt,value",
        [
            ("date", "2010-01-01Z"),
            ("date", "2010-01-01"),
            ("dateTime", "2010-01-01T00:00:00Z"),
            ("dateTime", "2010-01-01T00:00:00.123"),
            ("time", "00:00:00Z"),
            ("integer", "+1"),
            ("double", "1.0e0"),
            ("boolean", "true"),
        ],
    )
    def test_valid_forms_pass_validation(self, dt, value):
        ttl = f'@prefix xsd: <{XSD}> . <tag:s> <tag:p> "{value}"^^xsd:{dt} .'
        stmts, errs = TurtleParser(validate=True).parse(ttl)
        assert len(stmts) == 1 and not errs


class TestValidation:
    # spec/reader_spec.rb:1113-1141
    @pytest.mark.parametrize(
        "ttl",
        [
            '<a> <b> "xyz"^^<http://www.w3.org/2001/XMLSchema#integer> .',
            '<a> <b> "12xyz"^^<http://www.w3.org/2001/XMLSchema#integer> .',
            '<a> <b> "xy.z"^^<http://www.w3.org/2001/XMLSchema#double> .',
            '<a> <b> "+1.0z"^^<http://www.w3.org/2001/XMLSchema#double> .',
            '<a> <b> "a"@EN--utd .',
            "<a> <b> .",
            "<a> <b> <c>",
            "<a> <b> <c> ;",
            '<a> "literal value" <b> .',
            "@keywords prefix. :e prefix :f .",
            "@base",
        ],
    )
    def test_raises(self, ttl):
        with pytest.raises(ParseError):
            TurtleParser(validate=True, base_uri="http://a/b").parse(ttl)


class TestRecovery:
    # spec/reader_spec.rb:1143-1205 goldens
    CASES = {
        "malformed bnode subject": (
            "_:.1 <http://example/a> <http://example/b> . _:bn <http://example/a> <http://example/c> .",
            ["_:ubn <http://example/a> <http://example/c> ."],
        ),
        "malformed bnode object(1)": (
            "<http://example/a> <http://example/b> _:.1 . <http://example/a> <http://example/c> <http://example/d> .",
            ["<http://example/a> <http://example/c> <http://example/d> ."],
        ),
        "malformed bnode object(2)": (
            """
            <http://example/a> <http://example/b> _:-a;
                               <http://example/c> <http://example/d> .
            <http://example/e> <http://example/f>  <http://example/g> .""",
            ["<http://example/e> <http://example/f> <http://example/g> ."],
        ),
        "malformed bnode object(3)": (
            "<http://example/a> <http://example/b> _:-a, <http://example/d> .",
            [],
        ),
        "malformed uri subject": (
            '<"quoted"> <http://example/a> <http://example/b> . <http://example/c> <http://example/d> <http://example/e> .',
            ["<http://example/c> <http://example/d> <http://example/e> ."],
        ),
        "malformed uri predicate(1)": (
            '<http://example/a> <"quoted"> <http://example/b> . <http://example/c> <http://example/d> <http://example/e> .',
            ["<http://example/c> <http://example/d> <http://example/e> ."],
        ),
        "malformed uri predicate(2)": (
            '<http://example/a> <"quoted"> <http://example/b>; <http://example/d> <http://example/e> .',
            [],
        ),
        "malformed uri object(1)": (
            '<http://example/a> <http://example/b> <"quoted"> . <http://example/c> <http://example/d> <http://example/e> .',
            ["<http://example/c> <http://example/d> <http://example/e> ."],
        ),
        "malformed uri object(2)": (
            '<http://example/a> <http://example/b> <"quoted">; <http://example/d> <http://example/e> .',
            [],
        ),
        "malformed uri object(freebase)": (
            """
            <http://example/a> <http://example/b> <http://http:urbis.com> .
            <http://example/a> <http://example/b> <http://example/e> .""",
            [
                "<http://example/a> <http://example/b> <http://http:urbis.com> .",
                "<http://example/a> <http://example/b> <http://example/e> .",
            ],
        ),
    }

    @pytest.mark.parametrize("name", list(CASES))
    def test_continues_after_error(self, name):
        ttl, expected = self.CASES[name]
        assert parse_nt(ttl) == expected

    @pytest.mark.parametrize(
        "name", [n for n in CASES if n != "malformed uri object(freebase)"]
    )
    def test_raises_when_validating(self, name):
        ttl, _ = self.CASES[name]
        with pytest.raises(ParseError):
            TurtleParser(validate=True).parse(ttl)


class TestRdfStar:
    def test_rejected_by_default(self):
        stmts, errs = TurtleParser().parse(
            "<<<tag:s> <tag:p> <tag:o>>> <tag:q> <tag:z> ."
        )
        assert stmts == [] and errs

    def test_quoted_subject(self):
        assert parse_nt(
            "<<<tag:s> <tag:p> <tag:o>>> <tag:q> <tag:z> .", rdfstar=True
        ) == ["<< <tag:s> <tag:p> <tag:o> >> <tag:q> <tag:z> ."]

    def test_quoted_object(self):
        assert parse_nt(
            "<tag:x> <tag:q> <<<tag:s> <tag:p> 1>> .", rdfstar=True
        ) == [
            f'<tag:x> <tag:q> << <tag:s> <tag:p> "1"^^<{XSD}integer> >> .'
        ]

    def test_recursive_quoted(self):
        assert parse_nt(
            "<<<<<tag:a> <tag:b> <tag:c>>> <tag:p> <tag:o>>> <tag:q> <tag:z> .",
            rdfstar=True,
        ) == [
            "<< << <tag:a> <tag:b> <tag:c> >> <tag:p> <tag:o> >> <tag:q> <tag:z> ."
        ]

    def test_annotation_asserts_and_reifies(self):
        # spec/reader_spec.rb:1012-1053: annotated triple asserted AND
        # annotation triples with quoted-triple subject
        assert parse_nt(
            '<tag:s> <tag:p> <tag:o> {| <tag:q> "v" |} .', rdfstar=True
        ) == [
            "<tag:s> <tag:p> <tag:o> .",
            '<< <tag:s> <tag:p> <tag:o> >> <tag:q> "v" .',
        ]

    def test_literal_not_allowed_as_qt_subject(self):
        stmts, errs = TurtleParser(rdfstar=True).parse(
            '<<"lit" <tag:p> <tag:o>>> <tag:q> <tag:z> .'
        )
        assert errs


class TestReaderOptionParity:
    """reader.rb:58-117 option surface: anon_base, intern, freebase
    dispatch (see README 'Variations' for the documented deviations)."""

    def test_anon_base_default_g(self):
        stmts, _ = TurtleParser().parse("[] <urn:p> [] .")
        assert stmts[0][0] == ("B", "g0") and stmts[0][2] == ("B", "g1")

    def test_anon_base_reference_style(self):
        stmts, _ = TurtleParser(anon_base="b0").parse("[] <urn:p> [] .")
        assert stmts[0][0] == ("B", "b0") and stmts[0][2] == ("B", "b1")

    def test_anon_base_offset(self):
        stmts, _ = TurtleParser(anon_base="n5").parse("[] <urn:p> 1 .")
        assert stmts[0][0] == ("B", "n5")

    def test_intern_shares_iri_storage(self):
        stmts, _ = TurtleParser(intern=True).parse(
            "<urn:s> <urn:p> <urn:s> . <urn:s> <urn:q> 1 ."
        )
        assert stmts[0][0][1] is stmts[0][2][1]
        assert stmts[0][0][1] is stmts[1][0][1]

    def test_intern_off_by_default(self):
        p = TurtleParser()
        assert p.intern is False


class TestRepeatedSeparators:
    """The reference collapses runs of ',' and ';' (reader.rb:362,
    reader.rb:344-ish predicateObjectList) — all three parse paths
    (document scanner, statement fast path, recursive descent) must
    agree on that."""

    def test_repeated_commas_collapse(self):
        from kgt.turtle import TurtleParser

        stmts, errs = TurtleParser().parse('<t:s> <t:p> "a",, "b" .')
        assert len(stmts) == 2 and not errs

    def test_repeated_semicolons_collapse(self):
        from kgt.turtle import TurtleParser

        stmts, errs = TurtleParser().parse('<t:s> <t:p> "a" ;; <t:q> "b" .')
        assert len(stmts) == 2 and not errs

    def test_scanner_path_matches_on_multistatement_doc(self):
        from kgt.turtle import TurtleParser

        doc = '@prefix x: <t:> .\nx:s x:p "a",, "b" ;; x:q "c" .\nx:t x:p x:o .'
        stmts, errs = TurtleParser().parse(doc)
        assert len(stmts) == 4 and not errs


def test_canonical_double_roundtrips_every_value():
    """XSD-canonical doubles must map back to the SAME double — the
    shortest-round-trip rule (Python repr / Ruby Float#to_s, which is
    how the reference pins canonical(0.1) = 1.0E-1); a fixed %.15E
    collapsed 0.30000000000000004 onto 0.3 (review find, round 6)."""
    from kgt.turtle.terms import _canonical_double

    cases = [
        "0.30000000000000004", "0.3", "1.7976931348623157E308",
        "5E-324", "123.E+1", "-2.5", "1e0", "0.1",
    ]
    seen = {}
    for lex in cases:
        canon = _canonical_double(lex)
        assert float(canon) == float(lex), (lex, canon)
        # distinct values stay distinct through canonicalization
        seen.setdefault(float(lex), set()).add(canon)
    assert all(len(v) == 1 for v in seen.values())
    assert _canonical_double("0.30000000000000004") != _canonical_double("0.3")
    # shape invariants: one digit before '.', no '+' exponent sign
    assert _canonical_double("123.E+1") == "1.23E3"
    assert _canonical_double("0") == "0.0E0" or _canonical_double("0.0") == "0.0E0"


def test_validate_recurses_into_quoted_triples():
    """reader.rb:173 statement.invalid? walks embedded RDF::Statement
    terms: an ill-typed literal or illegal IRI inside << ... >> must
    invalidate the asserting statement under validate (review find,
    round 6 — the same literal at top level already failed)."""
    from kgt.turtle import TurtleParser

    XSD = "http://www.w3.org/2001/XMLSchema#"
    bad_lit = (
        f'<< <http://e/s> <http://e/p> "abc"^^<{XSD}integer> >> '
        "<http://e/q> <http://e/o> ."
    )
    bad_iri = "<< <rel> <http://e/p> <http://e/o> >> <http://e/q> <http://e/o> ."
    good = '<< <http://e/s> <http://e/p> "1"^^<%sinteger> >> <http://e/q> <http://e/o> .' % XSD
    for doc, ok in [(bad_lit, False), (bad_iri, False), (good, True)]:
        parser = TurtleParser(validate=True, rdfstar=True)
        parser.validate_raises = False
        stmts, errs = parser.parse(doc)
        assert bool(errs) != ok, (doc, errs[:2])
    # non-validate mode still accepts them all (quarantine-free lax path)
    for doc in (bad_lit, bad_iri, good):
        stmts, errs = TurtleParser(rdfstar=True).parse(doc)
        assert not errs and stmts


def test_canonicalize_normalizes_iris():
    """reader.rb:188 calls value.canonicalize! under the canonicalize
    option (review find, round 6 — the flag was literal-only here):
    RFC 3986 §6.2.2 — scheme/host case, default port, dot segments;
    off by default."""
    from kgt.turtle import TurtleParser

    doc = (
        "<HTTP://EXAMPLE.COM:80/a/./b/../c> <http://e/p> "
        "<https://User@HOST.org/x//y> ."
    )
    stmts, errs = TurtleParser(canonicalize=True).parse(doc)
    assert not errs
    s, p, o = stmts[0]
    assert s == ("I", "http://example.com/a/c")
    assert p == ("I", "http://e/p")
    assert o == ("I", "https://User@host.org/x/y")
    # without the flag, written form is preserved
    stmts2, _ = TurtleParser().parse(doc)
    assert stmts2[0][0] == ("I", "HTTP://EXAMPLE.COM:80/a/./b/../c")
