"""Format sniffing (format.rb:41-57 semantics), mirroring the
reference's spec/format_spec.rb detection matrix."""

import pytest

from kgt.turtle.format import detect


@pytest.mark.parametrize(
    "sample",
    [
        "@prefix foo: <http://e/> .",
        "@base <http://e/> .",
        '<a> <b> "1"^^<dt> .',
        '<a> <b> "x"@en .',
        "<a> <b> <c> .",
        '<s> <p> """long\nstring""" .',
        "foo:a foo:b foo:c .",
        "<a> <b> <c> ; <d> <e> .",
    ],
)
def test_turtle_detected(sample):
    assert detect(sample)


@pytest.mark.parametrize(
    "sample",
    [
        "<http://g> { <a> <b> <c> }",          # TriG
        "@keywords a. x a y.",                   # N3
        "{ ?s ?p ?o } => { ?s <b> <c> }.",      # N3 rules
        "<html><body>hi</body></html>",          # HTML
        "<rdf:RDF xmlns:rdf='...'/>",            # RDF/XML
        "<a> <b> <c> <g> .",                     # N-Quads
        '{"@context": {"x": "http://e/"}}',     # JSON-LD
        "plain prose with no rdf in it",         # nothing
    ],
)
def test_others_rejected(sample):
    assert not detect(sample)
