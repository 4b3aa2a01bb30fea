"""Reference-shipped example corpus (examples/*.ttl, *.nt) pinned in
the unit suite: every file parses error-free, NT files are their own
goldens, and every example survives a pretty-writer round trip.

The full Spark-pipeline replay of the same corpus lives in
scripts/pr_eval.py (corpora 'shipped_nt' / 'shipped_examples') and
feeds PR_EVAL.json.
"""

import glob
import os

import pytest

from kgt.turtle import TurtleParser, nt_encode
from tests.helpers import canon_bnodes, normalize_nt, parse_nt

EXAMPLES = "/root/reference/examples"

TTL_FILES = sorted(
    os.path.basename(p) for p in glob.glob(f"{EXAMPLES}/*.ttl")
)
NT_FILES = sorted(os.path.basename(p) for p in glob.glob(f"{EXAMPLES}/*.nt"))


def _read(name):
    return open(f"{EXAMPLES}/{name}", encoding="utf-8").read()


@pytest.mark.parametrize("name", TTL_FILES + NT_FILES)
def test_parses_clean(name):
    stmts, errors = TurtleParser(rdfstar=True).parse(_read(name))
    assert not errors, errors[:3]
    assert stmts


@pytest.mark.parametrize("name", NT_FILES)
def test_nt_files_are_their_own_goldens(name):
    body = _read(name)
    stmts, _ = TurtleParser().parse(body)
    got = {f"{nt_encode(s)} {nt_encode(p)} {nt_encode(o)} ." for s, p, o in stmts}
    assert got == set(normalize_nt(body))


@pytest.mark.parametrize("name", TTL_FILES)
def test_pretty_roundtrip(name):
    from kgt.turtle.writer import serialize_pretty

    stmts, _ = TurtleParser(rdfstar=True).parse(_read(name))
    out = serialize_pretty(stmts)
    lines1 = canon_bnodes(
        [f"{nt_encode(s)} {nt_encode(p)} {nt_encode(o)} ." for s, p, o in stmts]
    )
    lines2 = canon_bnodes(parse_nt(out, rdfstar=True))
    assert lines1 == lines2
