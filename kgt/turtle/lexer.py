"""Ordered-terminal Turtle lexer.

Re-expresses the reference's EBNF::LL1::Lexer configuration
(/root/reference/lib/rdf/turtle/reader.rb:13-39) as ONE combined Python
regex with named groups in the reference's registration order — first
match wins, exactly like the ordered terminal table (maximal munch via
DOUBLE before DECIMAL before INTEGER, strings before punctuation,
PREFIX/BASE before LANG_DIR).

Unescaping (ECHAR + UCHAR) happens at lex time for the terminals the
reference registers with `unescape: true` (IRIREF, PNAME_LN, all four
string forms — reader.rb:16-25).

Tokens are plain tuples ``(type, value, lineno)`` — no per-token objects
beyond that, since this runs in the Arrow-batch hot path.
"""

from __future__ import annotations

import re

from kgt.turtle import terminals as T

# Registration order mirrors reader.rb:14-39. Group names are token types;
# PUNCT tokens get type None downstream (string terminals in the reference).
_TERMINALS = [
    ("ANON", T.ANON),
    ("BLANK_NODE_LABEL", T.BLANK_NODE_LABEL),
    ("IRIREF", T.IRIREF),
    ("DOUBLE", T.DOUBLE),
    ("DECIMAL", T.DECIMAL),
    ("INTEGER", T.INTEGER),
    ("PNAME_LN", T.PNAME_LN),
    ("PNAME_NS", T.PNAME_NS),
    ("STRING_LITERAL_LONG_SINGLE_QUOTE", T.STRING_LITERAL_LONG_SINGLE_QUOTE),
    ("STRING_LITERAL_LONG_QUOTE", T.STRING_LITERAL_LONG_QUOTE),
    ("STRING_LITERAL_QUOTE", T.STRING_LITERAL_QUOTE),
    ("STRING_LITERAL_SINGLE_QUOTE", T.STRING_LITERAL_SINGLE_QUOTE),
    ("PUNCT", T.PUNCT),
    ("PREFIX", T.PREFIX_KW),
    ("BASE", T.BASE_KW),
    ("LANG_DIR", T.LANG_DIR),
]

_SCANNER = re.compile(
    "|".join(f"(?P<{name}>{pattern})" for name, pattern in _TERMINALS)
)
_WS = re.compile(T.WS)

# Terminals the reference lexes with unescape: true (reader.rb:16-25).
_UNESCAPE_TYPES = frozenset(
    [
        "IRIREF",
        "PNAME_LN",
        "STRING_LITERAL_LONG_SINGLE_QUOTE",
        "STRING_LITERAL_LONG_QUOTE",
        "STRING_LITERAL_QUOTE",
        "STRING_LITERAL_SINGLE_QUOTE",
    ]
)

_ECHAR_MAP = {
    "t": "\t",
    "b": "\b",
    "n": "\n",
    "r": "\r",
    "f": "\f",
    "\\": "\\",
    '"': '"',
    "'": "'",
}

_UNESCAPE_RE = re.compile(
    r"\\u([0-9A-Fa-f]{4})|\\U([0-9A-Fa-f]{8})|\\([tbnrf\\\"'])"
)


def _unescape_sub(m: re.Match) -> str:
    u4, u8, ech = m.groups()
    if u4 is not None:
        return chr(int(u4, 16))
    if u8 is not None:
        return chr(int(u8, 16))
    return _ECHAR_MAP[ech]


def unescape(value: str) -> str:
    """ECHAR + UCHAR unescape (etc/turtle.bnf:46-47 semantics)."""
    if "\\" not in value:
        return value
    return _UNESCAPE_RE.sub(_unescape_sub, value)


class LexerError(Exception):
    """Illegal character/token at ``pos`` (reference: EBNF::LL1::Lexer::Error)."""

    def __init__(self, message: str, pos: int, lineno: int):
        super().__init__(message)
        self.pos = pos
        self.lineno = lineno


class Lexer:
    """Pull lexer with 1-token lookahead over a whole in-memory document.

    The reference reads incrementally (partial_regexp, reader.rb:22-23);
    with Arrow batches the whole document is already in memory per row,
    so this lexer is a straight scan.
    """

    __slots__ = ("text", "pos", "lineno", "_tok", "_n")

    def __init__(self, text: str):
        self.text = text
        self.pos = 0
        self.lineno = 1
        self._tok = None  # cached lookahead token or None
        self._n = len(text)

    def _advance_ws(self) -> None:
        m = _WS.match(self.text, self.pos)
        if m is not None:
            seg = m.group(0)
            self.lineno += seg.count("\n")
            self.pos = m.end()

    def first(self):
        """Peek the next token; raises LexerError on illegal input.

        Returns None at EOF.
        """
        if self._tok is not None:
            return self._tok
        self._advance_ws()
        if self.pos >= self._n:
            return None
        m = _SCANNER.match(self.text, self.pos)
        if m is None:
            raise LexerError(
                f"invalid token at {self.text[self.pos:self.pos + 10]!r}",
                self.pos,
                self.lineno,
            )
        ttype = m.lastgroup
        value = m.group(0)
        lineno = self.lineno
        if ttype in _UNESCAPE_TYPES:
            value = unescape(value)
        if ttype == "PUNCT":
            ttype = None  # string terminals carry type nil in the reference
        tok = (ttype, value, lineno, m.end())
        self._tok = tok
        return tok

    def shift(self):
        """Consume and return the next token (None at EOF)."""
        tok = self.first()
        if tok is None:
            return None
        self._tok = None
        raw = self.text[self.pos : tok[3]]
        self.lineno += raw.count("\n")
        self.pos = tok[3]
        return tok

    def recover(self) -> None:
        """Skip one char after an illegal token, then scan forward until
        the scanner matches again (reference lexer.recover behavior:
        discard input until something lexes)."""
        self._tok = None
        if self.pos < self._n and self.text[self.pos] == "\n":
            self.lineno += 1
        self.pos += 1
        while self.pos < self._n:
            m = _WS.match(self.text, self.pos)
            if m is not None:
                seg = m.group(0)
                self.lineno += seg.count("\n")
                self.pos = m.end()
                continue
            if _SCANNER.match(self.text, self.pos) is not None:
                return
            if self.text[self.pos] == "\n":
                self.lineno += 1
            self.pos += 1


def tokens(text: str):
    """Eagerly lex a document; skips illegal chars. Test/debug helper."""
    lx = Lexer(text)
    out = []
    while True:
        try:
            tok = lx.shift()
        except LexerError:
            lx.recover()
            continue
        if tok is None:
            return out
        out.append((tok[0], tok[1], tok[2]))
