"""Shared test helpers: parse → NT-line sets, golden comparison.

Mirrors the reference's eval-style assertions (spec/suite_spec.rb:33-38)
but uses deterministic bnode labels + set comparison instead of graph
isomorphism (SURVEY §5.2 documented deviation): our parser mints stable
labels (u<label> / g<counter>), so renaming goldens' bnode labels by
first-occurrence order makes plain set-compare sufficient.
"""

from __future__ import annotations

import re

from kgt.turtle import TurtleParser, nt_encode


def parse_nt(ttl: str, **options) -> list[str]:
    """Parse Turtle → list of NT statement lines (emission order)."""
    stmts, _errors = TurtleParser(**options).parse(ttl)
    return [f"{nt_encode(s)} {nt_encode(p)} {nt_encode(o)} ." for s, p, o in stmts]


def parse_errors(ttl: str, **options):
    _, errors = TurtleParser(**options).parse(ttl)
    return errors


_BNODE_RE = re.compile(r"_:[A-Za-z0-9_]+")


def canon_bnodes(lines) -> set:
    """Rename bnode labels by first occurrence (per line set, sorted for
    determinism) so two graphs with different label schemes compare equal.

    Adequate for tree-shaped fixtures (the reference's own goldens);
    NOT a general isomorphism check.
    """
    mapping = {}

    def sub(m):
        lbl = m.group(0)
        if lbl not in mapping:
            mapping[lbl] = f"_:c{len(mapping)}"
        return mapping[lbl]

    # visit lines in an order independent of label choice: sort by the
    # bnode-masked text, so both sides assign c0, c1, ... identically
    ordered = sorted(lines, key=lambda l: _BNODE_RE.sub("_:*", l))
    return {_BNODE_RE.sub(sub, line) for line in ordered}


def normalize_nt(text: str) -> list[str]:
    """Split an expected-NT blob into statement lines (tolerates the
    reference specs' indentation and blank lines)."""
    out = []
    for line in text.splitlines():
        line = line.strip()
        if not line or line.startswith("#"):
            continue
        # normalize "<s> <p> <o>." and "<s> <p> <o> ." forms
        line = re.sub(r"\s*\.\s*$", " .", line)
        line = re.sub(r"\s+", " ", line)
        out.append(line)
    return out


def assert_equivalent(ttl: str, expected_nt: str, **options):
    got = canon_bnodes(parse_nt(ttl, **options))
    exp = canon_bnodes(normalize_nt(expected_nt))
    assert got == exp, (
        f"graphs differ\n  only-got: {sorted(got - exp)}\n"
        f"  only-exp: {sorted(exp - got)}"
    )
