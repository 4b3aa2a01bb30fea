"""EARL conformance report generator — the reference's `script/tc`
EARL mode (script/tc:15-35 earl_preamble, :120-133 per-test
earl:Assertion emission) re-expressed over THIS engine's vendored
conformance battery.

Runs every case the manifest-driven suite runs (shipped examples
good/bad, the rdf11 snapshot, the rdf12-star snapshot) through the kgt
parser with exactly the semantics of tests/test_manifest_suite.py —
the test functions themselves are invoked, so report and CI can never
disagree — and emits a W3C EARL report: one earl:Assertion per test
with earl:outcome earl:passed / earl:failed / earl:untested (skips).

Dogfooding: the report is serialized by the ENGINE'S OWN pretty writer
(kgt/turtle/writer.py serialize_pretty), so generating it exercises
bnode inlining, prefix selection and literal shorthand end-to-end; the
pytest gate re-parses the emitted document with our parser.

Usage: python scripts/earl_report.py [out.ttl]   (default EARL.ttl)
"""

from __future__ import annotations

import os
import sys
from datetime import datetime, timezone

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

EARL = "http://www.w3.org/ns/earl#"
DOAP = "http://usefulinc.com/ns/doap#"
DC = "http://purl.org/dc/terms/"
XSD = "http://www.w3.org/2001/XMLSchema#"
RDF_TYPE = "http://www.w3.org/1999/02/22-rdf-syntax-ns#type"

PROJECT = "urn:kgt:engine"
ASSERTOR = "urn:kgt:assertor"

PREFIXES = {
    "earl": EARL,
    "doap": DOAP,
    "dc": DC,
    "xsd": XSD,
}


def _run_cases():
    """(suite, name, outcome) for every vendored conformance case,
    evaluated by the ACTUAL test functions."""
    import pytest

    import tests.test_manifest_suite as M

    skipped = pytest.skip.Exception

    def run(fn, args):
        try:
            fn(*args)
            return "passed"
        except skipped:
            return "untested"
        except Exception:
            return "failed"

    out = []
    for name, action, result in M.GOOD:
        out.append(
            ("examples-good", name, run(M.test_good, (name, action, result)))
        )
    for name, action, result in M.BAD:
        out.append(
            (
                "examples-bad",
                name,
                run(M.test_bad_must_fail, (name, action, result)),
            )
        )
    for suite, cases, fn in [
        ("rdf12-star-pos", M.STAR_POS, M.test_star_positive_syntax),
        ("rdf12-star-neg", M.STAR_NEG, M.test_star_negative_syntax),
        ("rdf12-star-eval", M.STAR_EVAL, M.test_star_eval),
        (
            "rdf12-star-writer-roundtrip",
            M.STAR_EVAL + M.STAR_POS,
            M.test_star_writer_roundtrip,
        ),
        ("rdf11-eval", M.R11_EVAL, M.test_rdf11_eval),
        ("rdf11-pos", M.R11_POS, M.test_rdf11_positive_syntax),
        ("rdf11-neg", M.R11_NEG, M.test_rdf11_negative_syntax),
        ("rdf11-negeval", M.R11_NEGEVAL, M.test_rdf11_negative_eval),
        (
            "rdf11-writer-roundtrip",
            M.R11_EVAL + M.R11_POS,
            M.test_rdf11_writer_roundtrip,
        ),
    ]:
        for case in cases:
            out.append((suite, case[0], run(fn, case)))
    return out


def build_report(run_time: str | None = None) -> tuple[str, dict]:
    """Run the battery and return (EARL Turtle document, outcome
    counts). run_time: xsd:dateTime string (defaults to now UTC)."""
    from kgt.turtle.writer import serialize_pretty

    if run_time is None:
        run_time = (
            datetime.now(timezone.utc).replace(microsecond=0).isoformat()
        )
    date = ("L", run_time, XSD + "dateTime", None, None)

    def I(x):  # noqa: E743
        return ("I", x)

    def L(x, lang=None):
        return ("L", x, None, lang, None)

    triples = [
        (I(PROJECT), I(RDF_TYPE), I(DOAP + "Project")),
        (I(PROJECT), I(RDF_TYPE), I(EARL + "TestSubject")),
        (I(PROJECT), I(RDF_TYPE), I(EARL + "Software")),
        (I(PROJECT), I(DOAP + "name"), L("kgt")),
        (I(PROJECT), I(DOAP + "programming-language"), L("Python")),
        (
            I(PROJECT),
            I(DOAP + "description"),
            L(
                "PySpark-native Turtle engine: distributed parser, "
                "writers and training-data operators",
                "en",
            ),
        ),
        (I(ASSERTOR), I(RDF_TYPE), I(EARL + "Assertor")),
        (I(ASSERTOR), I(DOAP + "name"), L("kgt conformance harness")),
        (I(PROJECT), I(DC + "issued"), date),
    ]
    counts: dict[str, int] = {}
    for i, (suite, name, outcome) in enumerate(_run_cases()):
        counts[outcome] = counts.get(outcome, 0) + 1
        a = ("B", f"assert{i}")
        r = ("B", f"result{i}")
        triples += [
            (a, I(RDF_TYPE), I(EARL + "Assertion")),
            (a, I(EARL + "assertedBy"), I(ASSERTOR)),
            (a, I(EARL + "subject"), I(PROJECT)),
            (a, I(EARL + "test"), I(f"urn:kgt:tests:{suite}#{name}")),
            (a, I(EARL + "result"), r),
            (a, I(EARL + "mode"), I(EARL + "automatic")),
            (r, I(RDF_TYPE), I(EARL + "TestResult")),
            (r, I(EARL + "outcome"), I(EARL + outcome)),
            (r, I(DC + "date"), date),
        ]
    return serialize_pretty(triples, prefixes=PREFIXES), counts


def main():
    out_path = sys.argv[1] if len(sys.argv) > 1 else "EARL.ttl"
    doc, counts = build_report()
    with open(out_path, "w", encoding="utf-8") as f:
        f.write(doc)
    total = sum(counts.values())
    print(f"wrote {out_path}: {total} assertions, {counts}")


if __name__ == "__main__":
    main()
