"""Format detection — content sniffing for Turtle vs neighbors.

Re-expresses the reference's sample matcher
(/root/reference/lib/rdf/turtle/format.rb:41-57): positive signals are
Turtle keywords / long strings / typed-or-language literals / runs of
terms; negative signals disambiguate TriG, N3, HTML/RDF-XML, N-Quads
and JSON-LD. In the pipeline this gates mixed corpora between the
grammar parser and quarantine (as a vectorized `rlike` pair of
expressions, no UDF — see `sniff_column`).
"""

from __future__ import annotations

import re

_POSITIVE = re.compile(
    r"""
    (?:@(?:base|prefix))                              # Turtle keywords
    | ["']{3}                                         # long strings
    | "[^"]*"\^\^ | "[^"]*"@                          # typed/lang literals
    | (?:
        (?:\s*(?:<[^>]*>|\w*:\w+|"[^"]*")\s*[,;])
        | (?:\s*(?:<[^>]*>|\w*:\w+|"[^"]*")){3}
      )
    """,
    re.M | re.X,
)

_NEGATIVE = [
    re.compile(r"[{}]"),                # TriG graphs
    re.compile(r"@keywords|=>|\{"),     # N3
    re.compile(r"<(?:/|html|rdf)", re.I),  # HTML / RDF-XML
    re.compile(r"^(?:\s*<[^>]*>){4}.*\.\s*$", re.M),  # N-Quads
    re.compile(r'"@(?:context|subject|iri)"'),  # JSON-LD
]

# the same signals as Spark-SQL-compatible (Java regex) strings, for a
# columnar rlike() gate over mixed corpora
POSITIVE_RLIKE = (
    r'@(base|prefix)|["\x27]{3}|"[^"]*"\^\^|"[^"]*"@'
    r'|(\s*(<[^>]*>|\w*:\w+|"[^"]*")\s*[,;])'
    r'|((\s*(<[^>]*>|\w*:\w+|"[^"]*")){3})'
)
NEGATIVE_RLIKE = (
    r'[{}]|@keywords|=>|<(/|html|rdf)|"@(context|subject|iri)"'
)


def detect(sample: str) -> bool:
    """True when the first ~1K of input is probably Turtle/N-Triples."""
    if not _POSITIVE.search(sample):
        return False
    return not any(p.search(sample) for p in _NEGATIVE)


def sniff_column(text_col):
    """Columnar form: Spark BooleanType expression over a text column."""
    from pyspark.sql import functions as F

    return text_col.rlike(POSITIVE_RLIKE) & ~text_col.rlike(NEGATIVE_RLIKE)


# ---------------------------------------------------------------------
# Format registry — the reference's RDF::Format.for dispatch surface
# (/root/reference/lib/rdf/turtle/format.rb:17-33 registration,
# rdf core Format.for lookup semantics): formats register content
# types (with q-weighted aliases), file extensions and a sample
# matcher; lookup goes by file name, extension, content type or
# content sample.
# ---------------------------------------------------------------------


def _detect_ntriples(sample: str) -> bool:
    """Line-oriented N-Triples: every non-blank, non-comment line is
    subject IRI/bnode + predicate IRI + one term + ' .' — and none of
    Turtle's abbreviation syntax appears (directives, ';'/',' runs,
    collections, ANON)."""
    lines = [
        ln.strip()
        for ln in sample.splitlines()
        if ln.strip() and not ln.lstrip().startswith("#")
    ]
    if not lines:
        return False
    term = r'(?:<[^>]*>|_:\S+|"(?:[^"\\]|\\.)*"(?:\^\^<[^>]*>|@[\w-]+)?)'
    line_re = re.compile(
        rf"^(?:<[^>]*>|_:\S+)\s+<[^>]*>\s+{term}\s*\.$"
    )
    body, tail = lines[:-1], lines[-1]
    if not all(line_re.match(ln) for ln in body):
        return False
    if line_re.match(tail):
        return True
    # the last sample line may be cut mid-statement (~1K prefix): give
    # it a pass ONLY when it looks truncated (no statement terminator)
    # — a COMPLETE final line that isn't an N-Triples statement (e.g.
    # Turtle abbreviation syntax appearing only there) must veto
    return bool(body) and not tail.rstrip().endswith(".")


class FormatSpec:
    """One registry row: name, media types (first = canonical,
    q-weighted aliases after), file extensions (first = canonical),
    format IRI, lazy reader/writer factories, sample matcher."""

    def __init__(
        self, name, content_types, extensions, uri, reader, writer, detect
    ):
        self.name = name
        self.content_types = content_types
        self.extensions = extensions
        self.uri = uri
        self._reader = reader
        self._writer = writer
        self.detect = detect

    @property
    def reader(self):
        return self._reader()

    @property
    def writer(self):
        return self._writer()

    def __repr__(self):
        return f"FormatSpec({self.name})"


def _turtle_reader():
    from kgt.turtle.parser import TurtleParser

    return TurtleParser


def _turtle_writer():
    from kgt.turtle.writer import serialize_pretty

    return serialize_pretty


def _nt_reader():
    # N-Triples ⊂ Turtle for the scalar path; the columnar zero-Python
    # fast path is kgt.spark.fastpath.parse_fastpath
    from kgt.turtle.parser import TurtleParser

    return TurtleParser


def _nt_writer():
    # document-level like the turtle writer: statements in, text out
    # (the per-term encoder stays available as kgt.turtle.nt_encode)
    from kgt.turtle.terms import nt_encode

    def serialize_ntriples(statements) -> str:
        return "".join(
            f"{nt_encode(s)} {nt_encode(p)} {nt_encode(o)} .\n"
            for s, p, o in statements
        )

    return serialize_ntriples


REGISTRY = [
    FormatSpec(
        "turtle",
        [
            "text/turtle",
            "text/rdf+turtle",
            "application/turtle;q=0.2",
            "application/x-turtle;q=0.2",
        ],
        ["ttl"],
        "http://www.w3.org/ns/formats/Turtle",
        _turtle_reader,
        _turtle_writer,
        detect,
    ),
    FormatSpec(
        "ntriples",
        ["application/n-triples", "text/plain;q=0.2"],
        ["nt"],
        "http://www.w3.org/ns/formats/N-Triples",
        _nt_reader,
        _nt_writer,
        _detect_ntriples,
    ),
]


def _strip_q(ct: str) -> str:
    return ct.split(";", 1)[0].strip().lower()


def for_(
    target: str | None = None,
    *,
    file_name: str | None = None,
    file_extension: str | None = None,
    content_type: str | None = None,
    sample: str | None = None,
):
    """Resolve a FormatSpec like RDF::Format.for: a positional string
    is a file name (or a bare extension); keyword lookups match the
    reference's option surface; `sample` runs each format's matcher
    (more specific formats first — N-Triples before Turtle, since
    every N-Triples document is also valid Turtle). Returns None when
    nothing matches."""
    if target is not None:
        if "." in target:
            file_name = target
        else:
            file_extension = target
    if file_name is not None and file_extension is None:
        file_extension = file_name.rsplit(".", 1)[-1].lower()
    if file_extension is not None:
        ext = file_extension.lstrip(".").lower()
        for spec in REGISTRY:
            if ext in spec.extensions:
                return spec
    if content_type is not None:
        ct = _strip_q(content_type)
        for spec in REGISTRY:
            if ct in (_strip_q(c) for c in spec.content_types):
                return spec
    if sample is not None:
        for spec in sorted(REGISTRY, key=lambda s: s.name != "ntriples"):
            if spec.detect(sample):
                return spec
    return None


def content_types() -> dict[str, list[FormatSpec]]:
    """{media type (q-stripped) → [FormatSpec]} — RDF::Format.content_types."""
    out: dict[str, list[FormatSpec]] = {}
    for spec in REGISTRY:
        for ct in spec.content_types:
            out.setdefault(_strip_q(ct), []).append(spec)
    return out


def file_extensions() -> dict[str, str]:
    """{extension → canonical media type} — RDF::Format.file_extensions."""
    return {
        ext: _strip_q(spec.content_types[0])
        for spec in REGISTRY
        for ext in spec.extensions
    }
