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

# Terminals the reference lexes with unescape: true (reader.rb:16-25) —
# the ONE list both the fused path and the <3.11 two-step fallback use.
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

_SCANNER = re.compile(
    "|".join(f"(?P<{name}>{pattern})" for name, pattern in _TERMINALS)
)
_WS = re.compile(T.WS)
# Fused whitespace+token pattern: ONE C-level match per token instead
# of a ws-match + token-match pair. The ws prefix is ATOMIC ((?>...),
# Python 3.11+) so a failed token match can never backtrack INTO a
# comment and lex its content (e.g. "# 123" must not yield INTEGER).
# On interpreters without atomic groups (< 3.11), tokenize falls back
# to the two-regex loop below instead of failing at import time.
try:
    _SCANNER_WS = re.compile(
        rf"(?>{T.WS})?"
        + "(?:"
        + "|".join(f"(?P<{name}>{pattern})" for name, pattern in _TERMINALS)
        + ")"
    )
except re.error:  # pragma: no cover — Python < 3.11
    _SCANNER_WS = None

# Index-based dispatch tables: the 16 terminals are top-level
# alternatives with no inner capture groups, so ``m.lastindex`` IS the
# matched terminal — integer indexing beats name-based group lookup by
# ~2× in the hot loop (measured: name lookup + lastgroup cost ~15% of
# tokenize). _EMIT[i] is the emitted token type (None for PUNCT, the
# string-terminal convention); _UNESC[i] marks unescape:true terminals.
_EMIT = [None] * (len(_TERMINALS) + 1)
_UNESC = [False] * (len(_TERMINALS) + 1)
if _SCANNER_WS is not None:
    for _name, _ in _TERMINALS:
        _gi = _SCANNER_WS.groupindex[_name]
        _EMIT[_gi] = None if _name == "PUNCT" else _name
        _UNESC[_gi] = _name in _UNESCAPE_TYPES

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


ERR = "*ERR*"


def lineno_at(text: str, pos: int) -> int:
    """1-based line number of a char offset (computed lazily — only
    error paths ever need line numbers)."""
    return text.count("\n", 0, min(pos, len(text))) + 1


def tokenize(text: str) -> list:
    """Lex a whole document in one pass → list of (type, value, pos).

    Illegal input produces ONE (ERR, snippet, pos) marker per illegal
    run (the reference lexer raises once, then `recover` discards input
    until something lexes — reader.rb:580-581); lexing then resumes at
    the next scannable position. Pre-lexing the whole document beats a
    pull lexer ~2× in Python: one tight loop, no lookahead caching, no
    exception plumbing per token — and Arrow batches hold whole
    documents anyway (the reference's incremental partial_regexp IO is
    moot here). The third tuple element is the CHAR OFFSET of the
    token; convert with ``lineno_at`` when reporting (line counting in
    the hot loop cost ~15% of lexing and only errors consume it).
    """
    if _SCANNER_WS is None:  # pragma: no cover — Python < 3.11
        return _tokenize_twostep(text)
    toks = []
    append = toks.append
    scan = _SCANNER_WS.match
    ws = _WS.match
    pos, n = 0, len(text)
    emit, unesc = _EMIT, _UNESC
    sub = _UNESCAPE_RE.sub
    unescape_sub = _unescape_sub
    while pos < n:
        m = scan(text, pos)
        if m is None:
            # either trailing whitespace to EOF, or an illegal char
            m2 = ws(text, pos)
            if m2 is not None:
                pos = m2.end()
                if pos >= n:
                    break
            append((ERR, text[pos : pos + 10], pos))
            # discard: one char, then forward until something lexes
            pos += 1
            while pos < n:
                m2 = ws(text, pos)
                if m2 is not None:
                    pos = m2.end()
                    continue
                if scan(text, pos) is not None:
                    break
                pos += 1
            continue
        li = m.lastindex
        value = m.group(li)
        end = m.end()
        tpos = end - len(value)
        if unesc[li] and "\\" in value:
            value = sub(unescape_sub, value)
        append((emit[li], value, tpos))
        pos = end
    return toks


def _tokenize_twostep(text: str) -> list:  # pragma: no cover — Python < 3.11
    """Fallback lexing loop for interpreters without atomic groups:
    explicit ws-match then token-match (the pre-fused shape). Same
    output contract as ``tokenize``."""
    toks = []
    append = toks.append
    scan = _SCANNER.match
    ws = _WS.match
    pos, n = 0, len(text)
    unescape_types = _UNESCAPE_TYPES
    while pos < n:
        m2 = ws(text, pos)
        if m2 is not None and m2.end() > pos:
            pos = m2.end()
            if pos >= n:
                break
        m = scan(text, pos)
        if m is None:
            append((ERR, text[pos : pos + 10], pos))
            pos += 1
            while pos < n:
                m2 = ws(text, pos)
                if m2 is not None and m2.end() > pos:
                    pos = m2.end()
                    continue
                if scan(text, pos) is not None:
                    break
                pos += 1
            continue
        ttype = m.lastgroup
        value = m.group(ttype)
        end = m.end()
        tpos = end - len(value)
        if ttype == "PUNCT":
            append((None, value, tpos))
        elif ttype in unescape_types:
            append((ttype, unescape(value), tpos))
        else:
            append((ttype, value, tpos))
        pos = end
    return toks


class TokenStream:
    """Index cursor over a pre-lexed token list, with the same
    first/shift/recover contract the parser's recovery machinery uses:
    first() RAISES LexerError on an ERR marker; recover() steps past it.

    Tokens carry char offsets; ``lineno``/``lineno_of`` convert lazily
    (only error reporting consumes line numbers).
    """

    __slots__ = ("toks", "i", "n", "text")

    def __init__(self, text: str):
        self.toks = tokenize(text)
        self.i = 0
        self.n = len(self.toks)
        self.text = text

    def first(self):
        if self.i >= self.n:
            return None
        tok = self.toks[self.i]
        if tok[0] is ERR:
            raise LexerError(
                f"invalid token at {tok[1]!r}", tok[2],
                lineno_at(self.text, tok[2]),
            )
        return tok

    def shift(self):
        tok = self.first()
        if tok is not None:
            self.i += 1
        return tok

    def recover(self) -> None:
        if self.i < self.n and self.toks[self.i][0] is ERR:
            self.i += 1

    @property
    def at_end(self) -> bool:
        return self.i >= self.n

    def lineno_of(self, tok) -> int:
        return lineno_at(self.text, tok[2])

    @property
    def lineno(self) -> int:
        if self.i < self.n:
            return lineno_at(self.text, self.toks[self.i][2])
        if self.toks:
            return lineno_at(self.text, self.toks[-1][2])
        return 1


def tokens(text: str):
    """Eagerly lex a document; skips illegal runs. Test/debug helper —
    returns (type, value, LINENO) tuples (offsets converted)."""
    return [
        (t[0], t[1], lineno_at(text, t[2]))
        for t in tokenize(text)
        if t[0] is not ERR
    ]
