"""RDF term model + N-Triples encoding + literal semantics.

Terms are plain tuples (hot path inside Arrow batches):

    ('I', iri)                                  IRI
    ('B', label)                                blank node
    ('L', lexical, datatype|None, lang|None, dir|None)   literal
    ('Q', s, p, o)                              quoted triple (RDF 1.2)

Semantics mirrored from the reference:
  - numeric lexical fixups: lib/rdf/turtle/reader.rb:463-508
  - canonicalization matrix: spec/reader_spec.rb:1056-1075
  - datatype validity matrix: spec/reader_spec.rb:1077-1111
  - NT encoding convention: examples/turtle/README.txt golden pairs
"""

from __future__ import annotations

import re

RDF_NS = "http://www.w3.org/1999/02/22-rdf-syntax-ns#"
XSD_NS = "http://www.w3.org/2001/XMLSchema#"

RDF_TYPE = ("I", RDF_NS + "type")
RDF_FIRST = ("I", RDF_NS + "first")
RDF_REST = ("I", RDF_NS + "rest")
RDF_NIL = ("I", RDF_NS + "nil")

XSD_INTEGER = XSD_NS + "integer"
XSD_DECIMAL = XSD_NS + "decimal"
XSD_DOUBLE = XSD_NS + "double"
XSD_BOOLEAN = XSD_NS + "boolean"
XSD_STRING = XSD_NS + "string"
RDF_LANGSTRING = RDF_NS + "langString"
RDF_DIRLANGSTRING = RDF_NS + "dirLangString"


def iri_term(iri: str):
    return ("I", iri)


def bnode_term(label: str):
    return ("B", label)


def literal_term(lexical: str, datatype=None, lang=None, direction=None):
    # RDF.rb downcases language tags at Literal CONSTRUCTION, not just
    # under canonicalize (rdf gem model/literal.rb; pinned by the
    # reference's "should allow mixed-case language" spec, which expects
    # "xyz"@en from @EN with validate:false and no canonicalization) —
    # BCP 47 tags are case-insensitive, RDF 1.1 Concepts normalizes to
    # lowercase in the value space.
    #
    # RDF 1.1 makes a simple literal and the same lexical typed
    # xsd:string ONE term (Concepts §3.3) — normalize at construction
    # so term equality (graph dedup, writer object lists, join keys)
    # sees one value; the encoders already printed them identically.
    if datatype == XSD_STRING and lang is None:
        datatype = None
    return ("L", lexical, datatype, lang.lower() if lang else lang, direction)


def quoted_term(s, p, o):
    return ("Q", s, p, o)


# ---------------------------------------------------------------------
# N-Triples encoding (golden-pair convention; join-friendly single string)
# ---------------------------------------------------------------------

_NT_ESCAPES = {
    "\\": "\\\\",
    '"': '\\"',
    "\n": "\\n",
    "\r": "\\r",
    "\t": "\\t",
    "\b": "\\b",
    "\f": "\\f",
}
_NT_ESC_RE = re.compile(r'[\\"\n\r\t\b\f]')


def _nt_escape(s: str) -> str:
    return _NT_ESC_RE.sub(lambda m: _NT_ESCAPES[m.group(0)], s)


def nt_encode(term) -> str:
    """Encode a term tuple as its N-Triples lexical form."""
    kind = term[0]
    if kind == "I":
        return f"<{term[1]}>"
    if kind == "B":
        return f"_:{term[1]}"
    if kind == "L":
        _, lex, dt, lang, direction = term
        body = f'"{_nt_escape(lex)}"'
        if lang is not None:
            if direction is not None:
                return f"{body}@{lang}--{direction}"
            return f"{body}@{lang}"
        if dt is not None and dt != XSD_STRING:
            return f"{body}^^<{dt}>"
        return body
    if kind == "Q":
        return (
            f"<< {nt_encode(term[1])} {nt_encode(term[2])} "
            f"{nt_encode(term[3])} >>"
        )
    raise ValueError(f"unknown term kind: {term!r}")


# ---------------------------------------------------------------------
# Datatype validity (validate mode; spec/reader_spec.rb:1077-1111 matrix)
# ---------------------------------------------------------------------

# XSD 1.1 lexical spaces; year 0000 is excluded (matrix pins 0000-01-01 invalid),
# leading '+' on dates invalid, 5-digit years must not start with 0.
_YEAR = r"-?(?:[1-9][0-9]{3,}|0[0-9]{3})"
# month/day/hour/minute/second/timezone FRAGMENT ranges are part of the
# XSD 1.1 LEXICAL grammar (monthFrag 01-12, dayFrag 01-31, hourFrag
# 00-23 with the special 24:00:00 end-of-day form, tz -14:00..+14:00) —
# "2026-13-40" is lexically invalid, not just value-invalid, and
# RDF::Literal::Date#valid? rejects it under the reader's validate
# option. Day-in-month semantics (Feb 30, leap years) are value-space
# and not checked here.
_MONTH = r"(?:0[1-9]|1[0-2])"
_DAY = r"(?:0[1-9]|[12][0-9]|3[01])"
_DATE_BODY = rf"{_YEAR}-{_MONTH}-{_DAY}"
_TZ = r"(?:Z|[+-](?:0[0-9]|1[0-3]):[0-5][0-9]|[+-]14:00)?"
_TIME_BODY = (
    r"(?:(?:[01][0-9]|2[0-3]):[0-5][0-9]:[0-5][0-9](?:\.[0-9]+)?"
    r"|24:00:00(?:\.0+)?)"
)

_DT_PATTERNS = {
    XSD_BOOLEAN: re.compile(r"\A(?:true|false|1|0)\Z"),
    XSD_INTEGER: re.compile(r"\A[+-]?[0-9]+\Z"),
    XSD_DECIMAL: re.compile(r"\A[+-]?(?:[0-9]+(?:\.[0-9]*)?|\.[0-9]+)\Z"),
    XSD_DOUBLE: re.compile(
        r"\A(?:[+-]?(?:[0-9]+(?:\.[0-9]*)?|\.[0-9]+)(?:[eE][+-]?[0-9]+)?|[+-]?INF|NaN)\Z"
    ),
    XSD_NS + "float": re.compile(
        r"\A(?:[+-]?(?:[0-9]+(?:\.[0-9]*)?|\.[0-9]+)(?:[eE][+-]?[0-9]+)?|[+-]?INF|NaN)\Z"
    ),
    XSD_NS + "date": re.compile(rf"\A{_DATE_BODY}{_TZ}\Z"),
    XSD_NS + "dateTime": re.compile(rf"\A{_DATE_BODY}T{_TIME_BODY}{_TZ}\Z"),
    XSD_NS + "time": re.compile(rf"\A{_TIME_BODY}{_TZ}\Z"),
}

# But 0000 in the 4-digit-with-leading-zero branch must be rejected:
_YEAR_0000 = re.compile(r"\A-?0000-")

_LANGTAG_RE = re.compile(r"\A[a-zA-Z]+(?:-[a-zA-Z0-9]+)*\Z")
_VALID_DIRECTIONS = frozenset(["ltr", "rtl"])


def literal_valid(term) -> bool:
    """Whether a literal's lexical form fits its datatype's lexical space.

    Unknown datatypes are always valid (reference keeps them unless they
    fail RDF::Literal construction).
    """
    _, lex, dt, lang, direction = term
    if lang is not None:
        if not _LANGTAG_RE.match(lang):
            return False
        if direction is not None and direction not in _VALID_DIRECTIONS:
            return False
        return True
    if dt is None:
        return True
    pat = _DT_PATTERNS.get(dt)
    if pat is None:
        return True
    if not pat.match(lex):
        return False
    if dt in (XSD_NS + "date", XSD_NS + "dateTime") and _YEAR_0000.match(lex):
        return False
    return True


# ---------------------------------------------------------------------
# Canonicalization (opt-in; spec/reader_spec.rb:1056-1075 matrix)
# ---------------------------------------------------------------------


def _canonical_integer(lex: str) -> str:
    neg = lex.startswith("-")
    digits = lex.lstrip("+-").lstrip("0") or "0"
    return f"-{digits}" if neg and digits != "0" else digits


def _canonical_decimal(lex: str) -> str:
    neg = lex.startswith("-")
    body = lex.lstrip("+-")
    if "." in body:
        ip, fp = body.split(".", 1)
    else:
        ip, fp = body, ""
    ip = ip.lstrip("0") or "0"
    fp = fp.rstrip("0") or "0"
    out = f"{ip}.{fp}"
    return f"-{out}" if neg and out != "0.0" else out


def _canonical_double(lex: str) -> str:
    # XSD canonical: single non-zero digit before '.', 'E', no exponent sign '+',
    # mantissa keeps at least one fractional digit.
    if lex in ("INF", "+INF", "-INF", "NaN"):
        return lex.lstrip("+") if lex != "NaN" else lex
    f = float(lex)
    if f == 0.0:
        return "0.0E0"
    # SHORTEST round-trip digits (Python repr — the same
    # shortest-representation rule Ruby Float#to_s uses, which is what
    # makes the reference's pinned canonical forms like 0.1 → "1.0E-1"
    # come out): every distinct double keeps a distinct canonical form
    # (a fixed %.15E collapsed e.g. 0.30000000000000004 onto 0.3), and
    # common values stay short instead of growing 17-digit noise.
    from decimal import Decimal

    sign, digits, exp = Decimal(repr(f)).as_tuple()
    adj = exp + len(digits) - 1
    frac = "".join(map(str, digits[1:])).rstrip("0") or "0"
    return f"{'-' if sign else ''}{digits[0]}.{frac}E{adj}"


def canonicalize(term):
    """Return the canonical form of a literal term (identity otherwise)."""
    if term[0] != "L":
        return term
    _, lex, dt, lang, direction = term
    if lang is not None:
        return ("L", lex, dt, lang.lower(), direction)
    if dt == XSD_INTEGER and literal_valid(term):
        return ("L", _canonical_integer(lex), dt, None, None)
    if dt == XSD_DECIMAL and literal_valid(term):
        return ("L", _canonical_decimal(lex), dt, None, None)
    if dt == XSD_DOUBLE and literal_valid(term):
        return ("L", _canonical_double(lex), dt, None, None)
    if dt == XSD_BOOLEAN and literal_valid(term):
        lex2 = {"1": "true", "0": "false"}.get(lex, lex)
        return ("L", lex2, dt, None, None)
    return term
