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
