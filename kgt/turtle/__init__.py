"""Spark-free Turtle core: tokenizer, parser, terms, RFC 3986 resolver.

Grammar fidelity target: ruby-rdf/rdf-turtle 3.3.1
(/root/reference/lib/rdf/turtle/{terminals,reader}.rb, etc/turtle.bnf).
This package is deliberately importable without pyspark so the same code
is unit-testable standalone and runs inside Arrow-batched UDFs.
"""

from kgt.turtle.parser import TurtleParser, ParseError
from kgt.turtle.terms import (
    iri_term,
    bnode_term,
    literal_term,
    quoted_term,
    nt_encode,
)

__all__ = [
    "TurtleParser",
    "ParseError",
    "iri_term",
    "bnode_term",
    "literal_term",
    "quoted_term",
    "nt_encode",
]
