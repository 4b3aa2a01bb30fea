"""Char-level pretty-writer goldens ported from the reference
spec/writer_spec.rb (simple tests :32-150, lists :152-300, literals
:303-600, quoted triples :603-712, annotations :714-770).

Each case parses the spec's input with our parser (or builds term
tuples directly where the spec constructs RDF objects / where bnode
labels must survive verbatim), serializes with serialize_pretty, and
asserts the spec's regexes (translated: Ruby ^/$ are always
line-anchored → re.M; Ruby //m → re.S)."""

import re

import pytest

from kgt.turtle import TurtleParser, nt_encode
from kgt.turtle.writer import _PrettyWriter, serialize_pretty

EX = "http://example.com/"
XSD = "http://www.w3.org/2001/XMLSchema#"


def _parse(ttl):
    stmts, errors = TurtleParser().parse(ttl)
    assert not errors, errors
    return stmts


def _serialize(ttl_or_stmts, regexps, **opts):
    stmts = _parse(ttl_or_stmts) if isinstance(ttl_or_stmts, str) else ttl_or_stmts
    out = serialize_pretty(stmts, **opts)
    for rx in regexps:
        flags = re.M | (re.S if isinstance(rx, tuple) else 0)
        pat = rx[0] if isinstance(rx, tuple) else rx
        assert re.search(pat, out, flags), f"{pat!r} not found in:\n{out}"
    return out


# --- simple tests (writer_spec.rb:32-150) ------------------------------


class TestSimple:
    def test_full_uris_without_base(self):
        _serialize(
            "<http://a/b> <http://a/c> <http://a/d> .",
            [r"^<http://a/b> <http://a/c> <http://a/d> \.$"],
        )

    def test_relative_uris_with_base(self):
        _serialize(
            "<http://a/b> <http://a/c> <http://a/d> .",
            [r"^@base <http://a/> \.$", r"^<b> <c> <d> \.$"],
            base="http://a/",
        )

    def test_pname_uris_with_prefix(self):
        _serialize(
            f"<{EX}b> <{EX}c> <{EX}d> .",
            [rf"^@prefix ex: <{EX}> \.$", r"^ex:b ex:c ex:d \.$"],
            prefixes={"ex": EX},
        )

    def test_pname_uris_with_empty_prefix(self):
        _serialize(
            f"<{EX}b> <{EX}c> <{EX}d> .",
            [rf"^@prefix : <{EX}> \.$", r"^:b :c :d \.$"],
            prefixes={"": EX},
        )

    def test_order_properties(self):
        ttl = f"""
          @prefix ex: <{EX}> .
          @prefix dc: <http://purl.org/dc/elements/1.1/> .
          @prefix rdfs: <http://www.w3.org/2000/01/rdf-schema#> .
          ex:b ex:c ex:d .
          ex:b dc:title "title" .
          ex:b a ex:class .
          ex:b rdfs:label "label" .
        """
        _serialize(
            ttl,
            [
                r"^ex:b a ex:class;$",
                (r'ex:class;\s+rdfs:label "label"',),
                (r'"label";\s+ex:c ex:d',),
                (r'ex:d;\s+dc:title "title" \.$',),
            ],
            prefixes={
                "ex": EX,
                "dc": "http://purl.org/dc/elements/1.1/",
                "rdfs": "http://www.w3.org/2000/01/rdf-schema#",
            },
        )

    def test_object_list(self):
        _serialize(
            f"@prefix ex: <{EX}> . ex:b ex:c ex:d, ex:e .",
            [
                rf"^@prefix ex: <{EX}> \.$",
                (r"^ex:b ex:c ex:[de],\s+ex:[de] \.$",),
            ],
            prefixes={"ex": EX},
        )

    def test_property_list(self):
        _serialize(
            f"@prefix ex: <{EX}> . ex:b ex:c ex:d; ex:e ex:f .",
            [
                rf"^@prefix ex: <{EX}> \.$",
                r"^ex:b ex:c ex:d;$",
                r"^\s+ex:e ex:f \.$",
            ],
            prefixes={"ex": EX},
        )

    def test_bare_anon(self):
        stmts = [(("B", "a"), ("I", EX + "a"), ("I", EX + "b"))]
        _serialize(stmts, [r"^\s*\[ex:a ex:b\] \.$"], prefixes={"ex": EX})

    def test_anon_as_subject(self):
        b = ("B", "x")
        stmts = [
            (b, ("I", EX + "a"), ("I", EX + "b")),
            (b, ("I", EX + "c"), ("I", EX + "d")),
        ]
        _serialize(
            stmts,
            [(r"^\s*\[\s*ex:a ex:b;$",), (r"^\s+ex:c ex:d\s*\] \.$",)],
            prefixes={"ex": EX},
        )

    def test_anon_as_object(self):
        _serialize(
            f"@prefix ex: <{EX}> . ex:a ex:b [ex:c ex:d] .",
            [r"^ex:a ex:b \[ex:c ex:d\] \.$"],
            prefixes={"ex": EX},
        )

    def test_reuses_bnode_labels_by_default(self):
        stmts = [(("B", "a"), ("I", EX + "b"), ("B", "a"))]
        _serialize(stmts, [r"^\s*_:a ex:b _:a \.$"], prefixes={"ex": EX})

    def test_generated_bnodes_with_unique_bnodes(self):
        stmts = [(("B", "a"), ("I", EX + "b"), ("B", "a"))]
        _serialize(
            stmts,
            [r"^\s*_:g\w+ ex:b _:g\w+ \.$"],
            prefixes={"ex": EX},
            unique_bnodes=True,
        )

    def test_standard_prefixes(self):
        ttl = (
            '<http://x/a> a <http://xmlns.com/foaf/0.1/Person>; '
            '<http://purl.org/dc/terms/title> "Person" .'
        )
        _serialize(
            ttl,
            [
                r"^@prefix foaf: <http://xmlns\.com/foaf/0\.1/> \.$",
                r"^@prefix dc: <http://purl\.org/dc/terms/> \.$",
                r"^<http://x/a> a foaf:Person;$",
                r'dc:title "Person" \.$',
            ],
            standard_prefixes=True,
        )


# --- lists (writer_spec.rb:152-300) -------------------------------------

RDF_NS = "http://www.w3.org/1999/02/22-rdf-syntax-ns#"
FIRST, REST, NIL = (
    ("I", RDF_NS + "first"),
    ("I", RDF_NS + "rest"),
    ("I", RDF_NS + "nil"),
)


class TestLists:
    def test_literal_list(self):
        _serialize(
            f'@prefix ex: <{EX}> . ex:a ex:b ( "apple" "banana" ) .',
            [r'^ex:a ex:b \(\s*"apple" "banana"\s*\) \.$'],
            prefixes={"ex": EX},
        )

    def test_empty_list(self):
        _serialize(
            f"@prefix ex: <{EX}> . ex:a ex:b () .",
            [r"^ex:a ex:b \(\s*\) \.$"],
            prefixes={"ex": EX},
        )

    def test_empty_list_as_subject(self):
        _serialize(
            f"@prefix ex: <{EX}> . () ex:a ex:b .",
            [r"^\(\s*\) ex:a ex:b \.$"],
            prefixes={"ex": EX},
        )

    def test_list_as_subject(self):
        _serialize(
            f"@prefix ex: <{EX}> . (ex:a) ex:b ex:c .",
            [r"^\(\s*ex:a\s*\) ex:b ex:c \.$"],
            prefixes={"ex": EX},
        )

    def test_list_of_empties(self):
        _serialize(
            f"@prefix ex: <{EX}> . [ex:listOf2Empties (() ())] .",
            [r"\[ex:listOf2Empties \(\s*\(\s*\) \(\s*\)\s*\)\s*\] \.$"],
            prefixes={"ex": EX},
        )

    def test_list_anon(self):
        _serialize(
            f"@prefix ex: <{EX}> . [ex:twoAnons ([a ex:mother] [a ex:father])] .",
            [r"\[ex:twoAnons \(\s*\[\s*a ex:mother\s*\] \[\s*a ex:father\s*\]\)\] \.$"],
            prefixes={"ex": EX},
        )

    def test_bare_list(self):
        # (ex:a ex:b) . — only the first/rest statements, list floating
        l1, l2 = ("B", "l1"), ("B", "l2")
        stmts = [
            (l1, FIRST, ("I", EX + "a")),
            (l1, REST, l2),
            (l2, FIRST, ("I", EX + "b")),
            (l2, REST, NIL),
        ]
        _serialize(stmts, [r"^\(\s*ex:a ex:b\s*\) \.$"], prefixes={"ex": EX})

    def test_list_subjects(self):
        l1, l2 = ("B", "l1"), ("B", "l2")
        stmts = [
            (l1, FIRST, ("I", EX + "a")),
            (l1, REST, l2),
            (l2, FIRST, ("I", EX + "b")),
            (l2, REST, NIL),
            (("I", EX + "a"), ("I", RDF_NS + "type"), ("I", EX + "Thing")),
            (("I", EX + "b"), ("I", RDF_NS + "type"), ("I", EX + "Thing")),
        ]
        _serialize(
            stmts,
            [
                r"\(ex:a ex:b\) \.",
                r"ex:a a ex:Thing \.",
                r"ex:b a ex:Thing \.",
            ],
            prefixes={"ex": EX},
        )

    def test_owl_unionof_list(self):
        ttl = f"""
          @prefix ex: <{EX}> .
          @prefix owl: <http://www.w3.org/2002/07/owl#> .
          @prefix rdf: <{RDF_NS}> .
          @prefix rdfs: <http://www.w3.org/2000/01/rdf-schema#> .
          ex:a rdfs:domain [
            a owl:Class;
            owl:unionOf [
              a owl:Class;
              rdf:first ex:b;
              rdf:rest [
                a owl:Class;
                rdf:first ex:c;
                rdf:rest rdf:nil
              ]
            ]
          ] .
        """
        # DOCUMENTED DEVIATION from writer_spec.rb's pinned bytes
        # (owl:unionOf (ex:b ex:c)): the reference INLINES the list and
        # silently DROPS the interior nodes' `a owl:Class` triples
        # (prop_count excludes rdf:type, writer.rb:494-499; the spec's
        # regex never checks for them). Under this repo's no-data-loss
        # policy (README deviation table) a referenced list node with
        # ANY extra property — type included — renders as a nested
        # property list instead, and every input statement must
        # round-trip.
        out = _serialize(
            ttl,
            [
                (r"ex:a rdfs:domain \[\s*a owl:Class;\s+owl:unionOf\s+\[",),
                rf"@prefix ex: <{EX}> \.",
            ],
            prefixes={
                "ex": EX,
                "owl": "http://www.w3.org/2002/07/owl#",
                "rdf": RDF_NS,
                "rdfs": "http://www.w3.org/2000/01/rdf-schema#",
            },
        )
        from tests.helpers import canon_bnodes

        stmts = _parse(ttl)
        reparsed, errs = TurtleParser().parse(out)
        assert not errs

        def canon(ss):
            return canon_bnodes(
                sorted(
                    f"{nt_encode(a)} {nt_encode(b)} {nt_encode(c)} ."
                    for a, b, c in ss
                )
            )

        assert canon(reparsed) == canon(stmts)  # 10/10 triples survive

    def test_list_with_first_subject_a_uri(self):
        u = ("I", "http://example.com")
        b1, b2 = ("B", "g1"), ("B", "g2")
        one = ("L", "1", XSD + "integer", None, None)
        two = ("L", "2", XSD + "integer", None, None)
        three = ("L", "3", XSD + "integer", None, None)
        stmts = [
            (u, FIRST, one),
            (u, REST, b1),
            (b1, FIRST, two),
            (b1, REST, b2),
            (b2, FIRST, three),
            (b2, REST, NIL),
        ]
        _serialize(
            stmts,
            [
                rf"@prefix rdf: <{RDF_NS}> \.",
                r"<http://example.com> rdf:first 1;",
                r"rdf:rest \(\s*2 3\s*\) \.",
            ],
            standard_prefixes=True,
        )

    def test_list_pattern_without_rdf_nil(self):
        u = ("I", "http://example.com")
        a, b, c = ("B", "a"), ("B", "b"), ("B", "c")
        stmts = [
            (u, ("I", "http://example.com/property"), a),
            (a, FIRST, ("L", "a", None, None, None)),
            (a, REST, b),
            (b, FIRST, ("L", "b", None, None, None)),
            (b, REST, c),
            (c, FIRST, ("L", "c", None, None, None)),
        ]
        _serialize(
            stmts,
            [
                r"<http://example.com> <http://example.com/property> \[",
                r'rdf:first "a";',
                r"rdf:rest \[",
                r'rdf:first "b";',
                (r'rdf:rest \[\s*rdf:first "c"\s*\]',),
            ],
            standard_prefixes=True,
        )

    def test_list_pattern_with_extra_properties(self):
        u = ("I", "http://example.com")
        a, b, c = ("B", "a"), ("B", "b"), ("B", "c")
        note = (
            "L",
            "This list node has also properties other than rdf:first and rdf:rest",
            None,
            None,
            None,
        )
        stmts = [
            (u, ("I", "http://example.com/property"), a),
            (a, FIRST, ("L", "a", None, None, None)),
            (a, REST, b),
            (b, FIRST, ("L", "b", None, None, None)),
            (a, ("I", "http://example.com/other-property"), note),
            (b, REST, c),
            (c, FIRST, ("L", "c", None, None, None)),
            (c, REST, NIL),
        ]
        _serialize(
            stmts,
            [
                r"<http://example.com> <http://example.com/property> \[",
                r"<http://example.com/other-property> \"This list node has also properties other than rdf:first and rdf:rest\";",
                r'rdf:first "a";',
                (r'rdf:rest \(\s*"b" "c"\s*\)',),
            ],
            standard_prefixes=True,
        )

    def test_list_with_empty_list(self):
        u = ("I", "http://example.com/a")
        l1 = ("B", "l1")
        stmts = [
            (u, ("I", "http://example.com/property"), l1),
            (l1, FIRST, NIL),
            (l1, REST, NIL),
        ]
        _serialize(
            stmts,
            [r"<http://example.com/a> <http://example.com/property> \(\s*\(\)\) ."],
            standard_prefixes=True,
        )

    def test_list_with_multiple_lists(self):
        u = ("I", "http://example.com/a")
        a, b, l1, l2 = ("B", "a"), ("B", "b"), ("B", "l1"), ("B", "l2")
        stmts = [
            (u, ("I", "http://example.com/property"), l1),
            (a, FIRST, ("L", "a", None, None, None)),
            (a, REST, NIL),
            (b, FIRST, ("L", "b", None, None, None)),
            (b, REST, NIL),
            (l1, FIRST, a),
            (l1, REST, l2),
            (l2, FIRST, b),
            (l2, REST, NIL),
        ]
        _serialize(
            stmts,
            [
                r'<http://example.com/a> <http://example.com/property> \(\s*\(\s*"a"\) \(\s*"b"\)\) .'
            ],
            standard_prefixes=True,
        )


# --- literals (writer_spec.rb:303-600) ----------------------------------


class TestLiterals:
    def test_triple_quote_delimited(self):
        _serialize(
            '<http://a> <http:/b> """testing string parsing in Turtle.\n""" .',
            [r"testing string parsing in Turtle.\n"],
        )

    def test_embedded_quote(self):
        _serialize(
            '<http://a> <http:/b> """string with " escaped quote marks""" .',
            [r'string with \\" escaped quote mark'],
        )

    def test_embedded_backslash(self):
        _serialize(
            '<http://a> <http:/b> "string with \\\\ escaped quote marks" .',
            [r"string with \\\\ escaped quote mark"],
        )

    def test_embedded_backslash_multiline(self):
        stmts = [
            (
                ("I", "http://x/a"),
                ("I", "http://x/b"),
                ("L", "string with \\ escaped quote marks\n", None, None, None),
            )
        ]
        _serialize(stmts, [r"string with \\\\ escaped quote mark"])

    def test_embedded_triple_quote_multiline(self):
        stmts = [
            (
                ("I", "http://x/a"),
                ("I", "http://x/b"),
                ("L", 'string with """ escaped triple-quote marks\n', None, None, None),
            )
        ]
        _serialize(stmts, [r'string with \\"\\"\\" escaped triple-quote marks'])

    def test_ending_quote_multiline(self):
        stmts = [
            (
                ("I", "http://x/a"),
                ("I", "http://x/b"),
                ("L", 'multi-line \nstring with ending "quote marks"', None, None, None),
            )
        ]
        _serialize(stmts, [r'multi-line \nstring with ending \\"quote marks\\"'])

    def test_language(self):
        _serialize('<http://a> <http:/b> "string"@en .', [r'"string"@en'])

    def test_language_direction(self):
        stmts = [
            (
                ("I", "http://a"),
                ("I", "http:/b"),
                ("L", "string", None, "en", "ltr"),
            )
        ]
        _serialize(stmts, [r'"string"@en--ltr'])

    def test_xsd_anyuri(self):
        _serialize(
            f'@prefix xsd: <{XSD}> . <http://a> <http:/b> "http://foo/"^^xsd:anyURI .',
            [
                rf"@prefix xsd: <{XSD}> \.",
                r'"http://foo/"\^\^xsd:anyURI \.',
            ],
            prefixes={"xsd": XSD},
        )

    # boolean / integer / decimal / double tokens under canonicalize
    # (writer_spec.rb:366-470)
    @pytest.mark.parametrize(
        "lit,rx",
        [
            ('"true"^^xsd:boolean', r"true \."),
            ('"TrUe"^^xsd:boolean', r"true \."),
            ('"1"^^xsd:boolean', r"true \."),
            ("true", r"true \."),
            ('"false"^^xsd:boolean', r"false \."),
            ('"FaLsE"^^xsd:boolean', r"false \."),
            ('"0"^^xsd:boolean', r"false \."),
            ("false", r"false \."),
            ('"1"^^xsd:integer', r"1 \."),
            ("1", r"1 \."),
            ('"0"^^xsd:integer', r"0 \."),
            ("0", r"0 \."),
            ('"10"^^xsd:integer', r"10 \."),
            ("10", r"10 \."),
            ('"1.0"^^xsd:decimal', r"1.0 \."),
            ("1.0", r"1.0 \."),
            ('"0.1"^^xsd:decimal', r"0.1 \."),
            ("0.1", r"0.1 \."),
            ('"10.02"^^xsd:decimal', r"10.02 \."),
            ("10.02", r"10.02 \."),
            ('"1.0e1"^^xsd:double', r"1.0e1 \."),
            ("1.0e1", r"1.0e1 \."),
            ('"0.1e1"^^xsd:double', r"1.0e0 \."),
            ("0.1e1", r"1.0e0 \."),
            ('"10.02e1"^^xsd:double', r"1.002e2 \."),
            ("10.02e1", r"1.002e2 \."),
            ('"14"^^xsd:double', r"1.4e1 \."),
            # xsd:int is NOT shorthand — stays quoted with pname datatype
            ('"1"^^xsd:int', r'"1"\^\^xsd:int \.'),
            ('"0"^^xsd:int', r'"0"\^\^xsd:int \.'),
            ('"10"^^xsd:int', r'"10"\^\^xsd:int \.'),
        ],
    )
    def test_numeric_tokens_canonicalize(self, lit, rx):
        _serialize(
            f"@prefix xsd: <{XSD}> . <http://a> <http:/b> {lit} .",
            [rx],
            prefixes={"xsd": XSD},
            canonicalize=True,
        )

    # format_literal value matrices (string rows; writer_spec.rb:385-600)
    @pytest.mark.parametrize(
        "lex,dt,expected",
        [
            ("true", "boolean", "true"),
            ("false", "boolean", "false"),
            ("1", "boolean", "true"),
            ("0", "boolean", "false"),
            ("string", "boolean", f'"string"^^<{XSD}boolean>'),
            ("0", "integer", "0"),
            ("10", "integer", "10"),
            ("-1", "integer", "-1"),
            ("true", "integer", f'"true"^^<{XSD}integer>'),
            ("string", "integer", f'"string"^^<{XSD}integer>'),
            ("0", "decimal", "0.0"),
            ("10", "decimal", "10.0"),
            ("-1", "decimal", "-1.0"),
            ("1.0", "decimal", "1.0"),
            ("0.1", "decimal", "0.1"),
            ("10.01", "decimal", "10.01"),
            ("true", "decimal", f'"true"^^<{XSD}decimal>'),
            ("string", "decimal", f'"string"^^<{XSD}decimal>'),
            ("0", "double", "0.0e0"),
            ("10", "double", "1.0e1"),
            ("-1", "double", "-1.0e0"),
            ("1.0", "double", "1.0e0"),
            ("0.1", "double", "1.0e-1"),
            ("10.01", "double", "1.001e1"),
            ("true", "double", f'"true"^^<{XSD}double>'),
            ("string", "double", f'"string"^^<{XSD}double>'),
        ],
    )
    def test_format_literal_matrix(self, lex, dt, expected):
        w = _PrettyWriter()
        assert w.format_literal(("L", lex, XSD + dt, None, None)) == expected

    @pytest.mark.parametrize(
        "lex,dt,expected",
        [
            ("true", "boolean", f'"true"^^<{XSD}boolean>'),
            ("1", "boolean", f'"1"^^<{XSD}boolean>'),
            ("0", "integer", f'"0"^^<{XSD}integer>'),
            ("10", "decimal", f'"10"^^<{XSD}decimal>'),
            ("1.0", "decimal", f'"1.0"^^<{XSD}decimal>'),
            ("0.1", "double", f'"0.1"^^<{XSD}double>'),
        ],
    )
    def test_format_literal_no_shorthand(self, lex, dt, expected):
        w = _PrettyWriter(literal_shorthand=False)
        assert w.format_literal(("L", lex, XSD + dt, None, None)) == expected


# --- quoted triples + annotations (writer_spec.rb:603-770) ---------------

EXQ = "http://example/"


class TestQuotedTriples:
    def _q(self, s, p, o):
        return ("Q", s, p, o)

    def test_subject_iii(self):
        q = self._q(("I", EXQ + "s1"), ("I", EXQ + "p1"), ("I", EXQ + "o1"))
        _serialize(
            [(q, ("I", EXQ + "p"), ("I", EXQ + "o"))],
            [r"<<ex:s1 ex:p1 ex:o1>> ex:p ex:o \."],
            prefixes={"ex": EXQ},
        )

    def test_subject_iib(self):
        q = self._q(("I", EXQ + "s1"), ("I", EXQ + "p1"), ("B", "o1"))
        _serialize(
            [(q, ("I", EXQ + "p"), ("I", EXQ + "o"))],
            [r"<<ex:s1 ex:p1 _:o1>> ex:p ex:o \."],
            prefixes={"ex": EXQ},
        )

    def test_subject_iil(self):
        q = self._q(
            ("I", EXQ + "s1"), ("I", EXQ + "p1"), ("L", "o1", None, None, None)
        )
        _serialize(
            [(q, ("I", EXQ + "p"), ("I", EXQ + "o"))],
            [r'<<ex:s1 ex:p1 "o1">> ex:p ex:o \.'],
            prefixes={"ex": EXQ},
        )

    def test_object_iii(self):
        q = self._q(("I", EXQ + "s1"), ("I", EXQ + "p1"), ("I", EXQ + "o1"))
        _serialize(
            [(("I", EXQ + "s"), ("I", EXQ + "p"), q)],
            [r"ex:s ex:p <<ex:s1 ex:p1 ex:o1>> ."],
            prefixes={"ex": EXQ},
        )

    def test_recursive_subject(self):
        inner = self._q(("I", EXQ + "s2"), ("I", EXQ + "p2"), ("I", EXQ + "o2"))
        q = self._q(inner, ("I", EXQ + "p1"), ("I", EXQ + "o1"))
        _serialize(
            [(q, ("I", EXQ + "p"), ("I", EXQ + "o"))],
            [(r"<<\s*<<\s*ex:s2 ex:p2 ex:o2\s*>>\s*ex:p1 ex:o1\s*>> ex:p ex:o \.",)],
            prefixes={"ex": EXQ},
        )

    def test_annotation_1(self):
        s, p, o = ("I", EXQ + "s"), ("I", EXQ + "p"), ("I", EXQ + "o")
        stmts = [
            (s, p, o),
            (("Q", s, p, o), ("I", EXQ + "r"), ("I", EXQ + "z")),
        ]
        _serialize(
            stmts,
            [r"ex:s ex:p ex:o \{\| ex:r ex:z \|\} \."],
            prefixes={"ex": EXQ},
        )


# --- round-trips over reference example docs (writer_spec.rb:760-791
# replays the W3C suite; we replay the repo fixtures + shipped examples
# through parse → pretty → reparse → isomorphism) ------------------------


class TestRoundTrips:
    @pytest.mark.parametrize(
        "ttl",
        [
            '<http://a/b> <http://a/c> "lit"@en-Latn .',
            "@prefix ex: <http://e/> . ex:s a ex:C; ex:p (1 2.5 true), [ex:q ex:r] .",
            '@prefix : <http://e/> . :s :p """multi\nline""" .',
            "@prefix : <http://e/> . [:p (:a [:q ()])] .",
            "PREFIX : <http://example/>\n:s :p :o {| :r :z |} .",
        ],
    )
    def test_pretty_roundtrip(self, ttl):
        from kgt.turtle.terms import nt_encode
        from tests.helpers import canon_bnodes, parse_nt

        parser = TurtleParser(rdfstar=True)
        stmts, errs = parser.parse(ttl)
        assert not errs
        out = serialize_pretty(stmts)
        lines1 = canon_bnodes(
            [f"{nt_encode(s)} {nt_encode(p)} {nt_encode(o)} ." for s, p, o in stmts]
        )
        lines2 = canon_bnodes(parse_nt(out, rdfstar=True))
        assert lines1 == lines2, out


# --- stream mode (writer_spec.rb regexp_stream rows) ---------------------


class TestStreamMode:
    def test_full_uris(self):
        from kgt.turtle.writer import serialize_stream

        out = serialize_stream(
            _parse("<http://a/b> <http://a/c> <http://a/d> ."),
        )
        assert re.search(r"^<http://a/b> <http://a/c> <http://a/d> \.$", out, re.M)

    def test_bare_anon_stream(self):
        from kgt.turtle.writer import serialize_stream

        out = serialize_stream(
            [(("B", "a"), ("I", EX + "a"), ("I", EX + "b"))],
            prefixes={"ex": EX},
        )
        assert re.search(r"_:\w+ ex:a ex:b \.$", out, re.M)

    def test_anon_as_subject_stream(self):
        from kgt.turtle.writer import serialize_stream

        b = ("B", "x")
        out = serialize_stream(
            [
                (b, ("I", EX + "a"), ("I", EX + "b")),
                (b, ("I", EX + "c"), ("I", EX + "d")),
            ],
            prefixes={"ex": EX},
        )
        assert re.search(r"_:\w+ ex:a ex:b;$", out, re.M)
        assert re.search(r"^\s+ex:c ex:d \.$", out, re.M)

    def test_standard_prefixes_stream_rdf_type_not_a(self):
        from kgt.turtle.writer import serialize_stream

        ttl = (
            '<http://x/a> a <http://xmlns.com/foaf/0.1/Person>; '
            '<http://purl.org/dc/terms/title> "Person" .'
        )
        out = serialize_stream(_parse(ttl), standard_prefixes=True)
        assert re.search(
            r"^@prefix foaf: <http://xmlns\.com/foaf/0\.1/> \.$", out, re.M
        )
        assert re.search(r"^@prefix dc: <http://purl\.org/dc/terms/> \.$", out, re.M)
        # stream mode writes the predicate term — never the 'a' shorthand
        assert re.search(r"^<http://x/a> rdf:type foaf:Person;$", out, re.M)
        assert re.search(r'dc:title "Person" \.$', out, re.M)

    def test_object_list_stream(self):
        from kgt.turtle.writer import serialize_stream

        out = serialize_stream(
            _parse(f"@prefix ex: <{EX}> . ex:b ex:c ex:d, ex:e ."),
            prefixes={"ex": EX},
        )
        assert "ex:b ex:c ex:d,\n  ex:e .\n" in out

    def test_property_list_stream(self):
        from kgt.turtle.writer import serialize_stream

        out = serialize_stream(
            _parse(f"@prefix ex: <{EX}> . ex:b ex:c ex:d; ex:e ex:f ."),
            prefixes={"ex": EX},
        )
        assert "ex:b ex:c ex:d;\n ex:e ex:f .\n" in out

