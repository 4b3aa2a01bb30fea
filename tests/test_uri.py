"""RFC 3986 resolver: unit cases + the 306-case battery
(spec/reader_spec.rb:1216-1931, from RubenVerborgh's public RFC 3986 gist)
replayed through the full parser."""

import re
from pathlib import Path

import pytest

from kgt.turtle import TurtleParser, nt_encode
from kgt.turtle.uri import remove_dot_segments, resolve, split_iri

FIXTURES = Path(__file__).parent / "fixtures"


class TestSplit:
    def test_full(self):
        assert split_iri("http://a:1/p/q?x=1#f") == (
            "http",
            "a:1",
            "/p/q",
            "x=1",
            "f",
        )

    def test_urn(self):
        assert split_iri("urn:ex:s001") == ("urn", None, "ex:s001", None, None)

    def test_relative(self):
        assert split_iri("../g") == (None, None, "../g", None, None)

    def test_network_path(self):
        assert split_iri("//g") == (None, "g", "", None, None)


class TestRemoveDotSegments:
    @pytest.mark.parametrize(
        "path,expected",
        [
            ("/a/b/c/./../../g", "/a/g"),
            ("mid/content=5/../6", "mid/6"),
            ("/./g", "/g"),
            ("/../g", "/g"),
            (".", ""),
            ("..", ""),
            ("/a/../..", "/"),
            ("g.", "g."),
            ("..g", "..g"),
        ],
    )
    def test_cases(self, path, expected):
        assert remove_dot_segments(path) == expected


class TestResolveUnits:
    BASE = "http://a/bb/ccc/d;p?q"

    @pytest.mark.parametrize(
        "ref,expected",
        [
            ("g:h", "g:h"),
            ("g", "http://a/bb/ccc/g"),
            ("//g", "http://g"),
            ("?y", "http://a/bb/ccc/d;p?y"),
            ("#s", "http://a/bb/ccc/d;p?q#s"),
            ("", "http://a/bb/ccc/d;p?q"),
            ("../../g", "http://a/g"),
            ("../../../../g", "http://a/g"),
            ("http:g", "http:g"),  # strict: scheme present → kept
        ],
    )
    def test_rfc_examples(self, ref, expected):
        assert resolve(self.BASE, ref) == expected

    def test_empty_base_identity(self):
        assert resolve("", "g") == "g"


def _battery_cases():
    ttl = (FIXTURES / "base_resolution.ttl").read_text()
    nt = (FIXTURES / "base_resolution.nt").read_text()
    stmts, errors = TurtleParser().parse(ttl)
    assert errors == []
    got = {nt_encode(s): nt_encode(o) for s, _, o in stmts}
    cases = []
    for line in nt.splitlines():
        m = re.match(r"\s*(<urn:ex:s\d+>) <urn:ex:p> (<[^>]*>)\.", line.strip())
        if m:
            cases.append((m.group(1), m.group(2), got.get(m.group(1))))
    assert len(cases) == 306
    return cases


@pytest.mark.parametrize(
    "subj,expected,got",
    _battery_cases(),
    ids=[c[0][1:-1] for c in _battery_cases()],
)
def test_base_resolution_battery(subj, expected, got):
    assert got == expected
