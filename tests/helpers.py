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


# BLANK_NODE_LABEL chars are PN_CHARS_U/PN_CHARS — full Unicode, dots
# allowed INSIDE but not final. Every NT encoding this helper sees puts
# whitespace after a label (statement terminators are " ."), so
# "everything up to whitespace" captures exactly the label — including
# "_:a.b" and non-ASCII labels an ASCII class would truncate. Fixture
# assumption (pre-existing): literals in compared lines don't contain
# the substring "_:".
_BNODE_RE = re.compile(r"_:[^\s]+")


def canon_bnodes(lines) -> set:
    """Canonicalize bnode labels so two graphs with different label
    schemes compare equal: iterative color refinement, then — when
    refinement leaves automorphism classes (several bnodes sharing a
    color) — individualization with lexicographic-minimum selection,
    the standard I-R canonical-labeling scheme. Independent per-class
    relabeling is NOT sound there: in {B→C, D→A} (all bnodes, same
    shape) the subject class and object class must be relabeled with a
    CONSISTENT pairing or isomorphic graphs diverge; trying each
    individualization and keeping the smallest resulting line set is
    label-independent and exact. Fixture graphs are small (≤ ~12
    bnodes), so the branching cost is negligible.
    """
    import hashlib

    lines = sorted(set(lines))  # graph semantics: duplicates don't exist
    bnodes = sorted({m for line in lines for m in _BNODE_RE.findall(line)})
    if not bnodes:
        return set(lines)
    incident = {
        b: [line for line in lines if b in _BNODE_RE.findall(line)]
        for b in bnodes
    }

    def refine(colors):
        for _ in range(len(bnodes) + 1):
            new = {}
            for b in bnodes:
                sig = sorted(
                    _BNODE_RE.sub(
                        lambda m: "SELF"
                        if m.group(0) == b
                        else f"C{colors[m.group(0)]}",
                        line,
                    )
                    for line in incident[b]
                )
                new[b] = hashlib.md5(
                    (colors[b] + "|" + "|".join(sig)).encode()
                ).hexdigest()
            if len(set(new.values())) == len(set(colors.values())):
                return new
            colors = new
        return colors

    def solve(colors):
        colors = refine(colors)
        classes: dict = {}
        for b in bnodes:
            classes.setdefault(colors[b], []).append(b)
        multi = [cls for cls in classes.values() if len(cls) > 1]
        if not multi:
            mapping = {
                b: f"_:c{i}"
                for i, b in enumerate(sorted(bnodes, key=lambda b: colors[b]))
            }
            return tuple(
                sorted(
                    _BNODE_RE.sub(lambda m: mapping[m.group(0)], line)
                    for line in lines
                )
            )
        # individualize each member of the first (smallest-color)
        # non-singleton class; the lexicographic minimum over the
        # branches is the canonical form
        cls = min(multi, key=lambda c: colors[c[0]])
        best = None
        for b in cls:
            branch = dict(colors)
            branch[b] = "!" + branch[b]
            got = solve(branch)
            if best is None or got < best:
                best = got
        return best

    if len(bnodes) > 24:  # I-R branching guard; fixtures never hit it
        raise ValueError("canon_bnodes: too many bnodes for exact I-R")
    return set(solve(dict.fromkeys(bnodes, "0")))


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
        out.append(_collapse_ws_outside_strings(line))
    return out


def _collapse_ws_outside_strings(line: str) -> str:
    """Collapse whitespace runs to one space, but NEVER inside a quoted
    literal — an NT-escaped literal can legitimately contain multiple
    consecutive spaces (e.g. examples/arnau-stack-overflow.ttl)."""
    out = []
    in_str = False
    i = 0
    while i < len(line):
        c = line[i]
        if in_str:
            out.append(c)
            if c == "\\" and i + 1 < len(line):
                out.append(line[i + 1])
                i += 2
                continue
            if c == '"':
                in_str = False
            i += 1
        elif c == '"':
            in_str = True
            out.append(c)
            i += 1
        elif c in " \t":
            out.append(" ")
            while i < len(line) and line[i] in " \t":
                i += 1
        else:
            out.append(c)
            i += 1
    return "".join(out)


def assert_equivalent(ttl: str, expected_nt: str, **options):
    got = canon_bnodes(parse_nt(ttl, **options))
    exp = canon_bnodes(normalize_nt(expected_nt))
    assert got == exp, (
        f"graphs differ\n  only-got: {sorted(got - exp)}\n"
        f"  only-exp: {sorted(exp - got)}"
    )
