"""EARL report generator gate (scripts/earl_report.py — the
reference's script/tc EARL mode over the vendored battery).

The report must (a) contain exactly one earl:Assertion per conformance
case the manifest suite enumerates, (b) show zero earl:failed (the
battery is green — a failure here IS a conformance regression), and
(c) round-trip through OUR parser, since it is serialized by OUR
pretty writer."""

from kgt.turtle import TurtleParser

from scripts.earl_report import EARL, build_report


def test_earl_report_roundtrip_and_green():
    doc, counts = build_report(run_time="2026-01-01T00:00:00+00:00")
    assert counts.get("failed", 0) == 0, counts
    assert counts["passed"] >= 320

    import tests.test_manifest_suite as M

    expected_total = (
        len(M.GOOD) + len(M.BAD) + len(M.STAR_POS) + len(M.STAR_NEG)
        + len(M.STAR_EVAL) + len(M.R11_EVAL) + len(M.R11_POS)
        + len(M.R11_NEG) + len(M.R11_NEGEVAL)
        # writer-roundtrip suites: one assertion per roundtripped case
        + len(M.STAR_EVAL) + len(M.STAR_POS)
        + len(M.R11_EVAL) + len(M.R11_POS)
    )
    assert sum(counts.values()) == expected_total

    stmts, errs = TurtleParser(validate=True).parse(doc)
    assert not errs, errs[:3]
    assertions = [
        s for s, p, o in stmts
        if p[1].endswith("#type") and o == ("I", EARL + "Assertion")
    ]
    assert len(assertions) == expected_total
    outcomes = [o for _s, p, o in stmts if p[1] == EARL + "outcome"]
    assert ("I", EARL + "failed") not in outcomes
    assert outcomes.count(("I", EARL + "passed")) == counts["passed"]
