"""W3C Turtle spec examples (reader_spec.rb:1933-2102 set): both sides
of each pair parse to the same graph."""

import pytest

from kgt.turtle import TurtleParser
from tests.helpers import canon_bnodes, parse_nt

EXAMPLES = {
    "example 1 (bnode property list)": (
        """
        @prefix rdf: <http://www.w3.org/1999/02/22-rdf-syntax-ns#> .
        @prefix dc: <http://purl.org/dc/elements/1.1/> .
        @prefix ex: <http://example/stuff/1.0/> .

        <https://www.w3.org/TR/rdf-syntax-grammar>
          dc:title "RDF/XML Syntax Specification (Revised)" ;
          ex:editor [
            ex:fullname "Dave Beckett";
            ex:homePage <http://purl.org/net/dajobe/>
          ] .
        """,
        """
        @prefix rdf: <http://www.w3.org/1999/02/22-rdf-syntax-ns#> .
        @prefix dc: <http://purl.org/dc/elements/1.1/> .
        @prefix ex: <http://example/stuff/1.0/> .

        <https://www.w3.org/TR/rdf-syntax-grammar>
          dc:title "RDF/XML Syntax Specification (Revised)";
          ex:editor _:a .
        _:a ex:fullname "Dave Beckett";
          ex:homePage <http://purl.org/net/dajobe/> .
        """,
    ),
    "example 2 (collection sugar)": (
        """
        @prefix : <http://example/stuff/1.0/> .
        <http://e/a> :b ( "apple" "banana" ) .
        """,
        """
        @prefix : <http://example/stuff/1.0/> .
        @prefix rdf: <http://www.w3.org/1999/02/22-rdf-syntax-ns#> .
        <http://e/a> :b
          [ rdf:first "apple";
            rdf:rest [ rdf:first "banana";
                       rdf:rest rdf:nil ]
          ] .
        """,
    ),
    "example 3 (long string ≡ escaped string)": (
        r"""
        @prefix : <http://example/stuff/1.0/> .
        :a :b "The first line\nThe second line\n  more" .
        """,
        '''
        @prefix : <http://example/stuff/1.0/> .
        :a :b """The first line
The second line
  more""" .
        ''',
    ),
    "example 4 (collection as subject)": (
        '(1 2.0 3E1) <http://e/p> "w" .',
        """
        @prefix rdf: <http://www.w3.org/1999/02/22-rdf-syntax-ns#> .
        _:b0  rdf:first  1 ;
              rdf:rest   _:b1 .
        _:b1  rdf:first  2.0 ;
              rdf:rest   _:b2 .
        _:b2  rdf:first  3E1 ;
              rdf:rest   rdf:nil .
        _:b0 <http://e/p> "w" .
        """,
    ),
}


@pytest.mark.parametrize("name", list(EXAMPLES))
def test_spec_example_pairs(name):
    left, right = EXAMPLES[name]
    got_l = canon_bnodes(parse_nt(left))
    got_r = canon_bnodes(parse_nt(right))
    assert got_l == got_r, (
        f"\nleft-only: {sorted(got_l - got_r)[:4]}"
        f"\nright-only: {sorted(got_r - got_l)[:4]}"
    )
    assert got_l  # non-empty


def test_bbc_style_predicate_object_lists():
    # reader_spec.rb:2021-2031 shape: long ;-chains with typed objects
    ttl = """
    @prefix po: <http://purl.org/ontology/po/> .
    @prefix dc: <http://purl.org/dc/elements/1.1/> .
    _:broadcast a po:Broadcast ;
      po:schedule_date "2008-06-24"^^<http://www.w3.org/2001/XMLSchema#date> ;
      po:broadcast_of _:version ;
      po:broadcast_on <http://www.bbc.co.uk/services/6music> .
    _:version a po:Version .
    """
    lines = parse_nt(ttl)
    assert len(lines) == 5
    assert sum(1 for l in lines if "22-rdf-syntax-ns#type" in l) == 2
