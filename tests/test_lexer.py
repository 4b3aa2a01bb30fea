"""Lexer-level goldens, mirroring spec/ll1/lexer_spec.rb's coverage."""

from kgt.turtle.lexer import tokens, unescape


def types_values(text):
    return [(t, v) for t, v, _ in tokens(text)]


class TestTerminalOrder:
    def test_numbers_maximal_munch(self):
        # DOUBLE before DECIMAL before INTEGER (reader.rb:17-19)
        assert types_values("1.0e1 1.0 1") == [
            ("DOUBLE", "1.0e1"),
            ("DECIMAL", "1.0"),
            ("INTEGER", "1"),
        ]

    def test_integer_then_statement_dot(self):
        # "1." lexes INTEGER then '.' — not DECIMAL
        assert types_values("1. ") == [("INTEGER", "1"), (None, ".")]

    def test_signed(self):
        assert types_values("+1 -42 .5 123.E+1") == [
            ("INTEGER", "+1"),
            ("INTEGER", "-42"),
            ("DECIMAL", ".5"),
            ("DOUBLE", "123.E+1"),
        ]

    def test_anon_vs_brackets(self):
        assert types_values("[] [ ] [\n] [ <p> 1 ]")[:3] == [
            ("ANON", "[]"),
            ("ANON", "[ ]"),
            ("ANON", "[\n]"),
        ]
        assert types_values("[ <p> 1 ]")[0] == (None, "[")

    def test_anon_with_comment_inside(self):
        assert types_values("[ # comment\n ]") == [("ANON", "[ # comment\n ]")]

    def test_prefix_base_keywords(self):
        assert types_values("@prefix @base PREFIX base @PREFIX") == [
            ("PREFIX", "@prefix"),
            ("BASE", "@base"),
            ("PREFIX", "PREFIX"),
            ("BASE", "base"),
            ("PREFIX", "@PREFIX"),
        ]

    def test_langdir_after_keywords(self):
        assert types_values('@en @en-US @en--ltr') == [
            ("LANG_DIR", "@en"),
            ("LANG_DIR", "@en-US"),
            ("LANG_DIR", "@en--ltr"),
        ]

    def test_punct(self):
        assert types_values("( ) , . ; ^^ {| |} << >> a A true false") == [
            (None, v)
            for v in "( ) , . ; ^^ {| |} << >> a A true false".split(" ")
        ]


class TestNames:
    def test_pnames(self):
        assert types_values("foaf:name : p: :x a:b-c") == [
            ("PNAME_LN", "foaf:name"),
            ("PNAME_NS", ":"),
            ("PNAME_NS", "p:"),
            ("PNAME_LN", ":x"),
            ("PNAME_LN", "a:b-c"),
        ]

    def test_pname_internal_dot(self):
        # dot allowed internally, not trailing
        assert types_values("a:b.c ") == [("PNAME_LN", "a:b.c")]
        assert types_values("a:b. ")[0] == ("PNAME_LN", "a:b")

    def test_pname_local_esc_preserved_for_parser(self):
        # PN_LOCAL_ESC stays escaped at lex time (pname() unescapes it)
        assert types_values(r"p:\%25 p:\_x") == [
            ("PNAME_LN", r"p:\%25"),
            ("PNAME_LN", r"p:\_x"),
        ]

    def test_bnode_labels(self):
        assert types_values("_:b0 _:0x _:a.b _:a. ") == [
            ("BLANK_NODE_LABEL", "_:b0"),
            ("BLANK_NODE_LABEL", "_:0x"),
            ("BLANK_NODE_LABEL", "_:a.b"),
            ("BLANK_NODE_LABEL", "_:a"),
            (None, "."),
        ]

    def test_unicode_pname(self):
        assert types_values("üm:laut") == [("PNAME_LN", "üm:laut")]


class TestStringsAndIris:
    def test_echar_unescape(self):
        assert types_values(r'"a\tb\nc\\d\"e"') == [
            ("STRING_LITERAL_QUOTE", '"a\tb\nc\\d"e"')
        ]

    def test_uchar_unescape(self):
        assert types_values(r'"a\u0062c" "\U0001F600"') == [
            ("STRING_LITERAL_QUOTE", '"abc"'),
            ("STRING_LITERAL_QUOTE", '"\U0001F600"'),
        ]

    def test_long_strings(self):
        assert types_values('"""multi\nline "quoted" body"""') == [
            ("STRING_LITERAL_LONG_QUOTE", '"""multi\nline "quoted" body"""')
        ]
        assert types_values("'''x''y'''") == [
            ("STRING_LITERAL_LONG_SINGLE_QUOTE", "'''x''y'''")
        ]

    def test_single_line_string_rejects_newline(self):
        # raw newline cannot appear in a single-quoted string
        toks = types_values('"a\nb"')
        assert ("STRING_LITERAL_QUOTE", '"a\nb"') not in toks

    def test_iriref_unescape(self):
        assert types_values(r"<http://example/\u0044>") == [
            ("IRIREF", "<http://example/D>")
        ]

    def test_iriref_rejects_space(self):
        toks = types_values("<http://bad iri>")
        assert toks[0][0] != "IRIREF"


class TestWhitespaceAndComments:
    def test_comments_skipped(self):
        assert types_values("# comment\n1 # trailing\n2") == [
            ("INTEGER", "1"),
            ("INTEGER", "2"),
        ]

    def test_line_numbers(self):
        toks = tokens("1\n2\n\n3")
        assert [t[2] for t in toks] == [1, 2, 4]


def test_unescape_function():
    assert unescape(r"\u0041\U00000042\n") == "AB\n"
    assert unescape("plain") == "plain"


def test_ws_is_ascii_only_reference_parity():
    """terminals.rb:68 WS uses Ruby \\s = ASCII [ \\t\\n\\v\\f\\r];
    Python's Unicode-aware \\s accepted NEL/NBSP/U+2028 as separators
    the reference rejects (round-6 review find). Exact parity: the
    Ruby set including \\f and \\v, nothing above ASCII."""
    from kgt.turtle import TurtleParser

    doc = "<urn:s>{0}<urn:p>{0}<urn:o>{0}."
    for sep in ("\x85", "\xa0", " ", "　"):
        _, errs = TurtleParser().parse(doc.format(sep))
        assert errs, f"{sep!r} accepted as whitespace"
    for sep in (" ", "\t", "\r", "\n", "\x0c", "\x0b"):
        stmts, errs = TurtleParser().parse(doc.format(sep))
        assert not errs and len(stmts) == 1, (repr(sep), errs[:1])
