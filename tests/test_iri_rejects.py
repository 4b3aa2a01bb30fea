"""IRIREF reject matrix (spec/reader_spec.rb:341-364): forbidden
characters inside <...> must fail — lexer-level for raw characters,
validation-level for escaped control/forbidden codepoints."""

import pytest

from kgt.turtle import ParseError, TurtleParser

RAW_FORBIDDEN = [
    "\x00",
    "\x01",
    "\x0f",
    "\x10",
    "\x1f",
    " ",
    "<",
    '"',
    "{",
    "}",
    "|",
    "\\",
    "^",
    "``",
]


@pytest.mark.parametrize("bad", RAW_FORBIDDEN, ids=[repr(b) for b in RAW_FORBIDDEN])
def test_raw_forbidden_chars_reject(bad):
    ttl = f"<http://example/s> <http://example/p> <http://e/{bad}> ."
    with pytest.raises(ParseError):
        TurtleParser(validate=True).parse(ttl)


@pytest.mark.parametrize("bad", RAW_FORBIDDEN, ids=[repr(b) for b in RAW_FORBIDDEN])
def test_raw_forbidden_chars_recover(bad):
    # non-validating: statement dropped, parse completes
    ttl = (
        f"<http://example/s> <http://example/p> <http://e/{bad}> .\n"
        "<tag:a> <tag:b> <tag:c> ."
    )
    stmts, errors = TurtleParser().parse(ttl)
    assert errors
    lines = {tuple(t[1] for t in s) for s in stmts}
    assert ("tag:a", "tag:b", "tag:c") in lines
