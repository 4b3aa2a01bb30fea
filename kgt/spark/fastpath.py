"""Freebase-style columnar fast path — zero Python in the data plane.

The reference ships a line-oriented reader for "very regular" N-Triples-
with-pnames dumps (lib/rdf/turtle/freebase_reader.rb). That regularity
is exactly what makes a PURE CATALYST implementation possible: one
split+explode, a handful of regexp_extract/when-chains, a per-document
prefix map — all whole-stage-codegen'd JVM expressions, no Arrow
round-trip at all. This is the template SURVEY §2.6 calls for and the
scale path for bulk loads whose input fits the regular subset; anything
irregular falls through to the mapInPandas grammar parser.

Per-line semantics mirrored from the reference:
  - `@prefix pfx: <iri> .` lines define prefixes (freebase_reader.rb:47-53)
  - subject/predicate are pnames (or IRIs; 'a' = rdf:type as in Turtle)
  - objects: pname | <iri> | boolean | numeric (double→decimal→integer
    order, with the same lexical fixups) | quoted literal with optional
    @lang/^^dt (freebase_reader.rb:86-127)
  - malformed lines are skipped and reported, never fatal
    (freebase_reader.rb:31-38) → quarantine rows here
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

_PREFIX_LINE = r"^@prefix\s+(\w+):\s+<([^>]*)>\s*\.$"
# one triple per line: term whitespace term whitespace rest ' .'
_TRIPLE_LINE = r"^(\S+)\s+(\S+)\s+(.+?)\s*\.$"

_PNAME = r"^\w+:\S+$"
_IRIREF = r"^<[^<>\"{}|^`\\\x00-\x20]*>$"
_INTEGER = r"^[+-]?[0-9]+$"
_DECIMAL = r"^[+-]?[0-9]*\.[0-9]+$"
_DOUBLE = r"^[+-]?(?:[0-9]+\.[0-9]*[eE][+-]?[0-9]+|\.?[0-9]+[eE][+-]?[0-9]+)$"
_LITERAL = r'^("(?:[^"\\]|\\.)*")\s*(@[A-Za-z]+(?:-[A-Za-z0-9]+)*(?:--[a-z]+)?|\^\^\S+)?$'

XSD = "http://www.w3.org/2001/XMLSchema#"
RDF_TYPE_NT = "<http://www.w3.org/1999/02/22-rdf-syntax-ns#type>"


def _lines(docs: DataFrame) -> DataFrame:
    return docs.select(
        "conv_id",
        F.posexplode(F.split("text", r"\r?\n")).alias("line_no", "line"),
    ).withColumn("line", F.trim("line"))


def _prefix_map(lines: DataFrame) -> DataFrame:
    """(conv_id, pfx_map map<string,string>) from the doc's @prefix lines.

    Redefinitions collapse to the LAST definition (max_by line_no) —
    the regular-dump assumption; true mid-document rebinding semantics
    belong to the grammar path."""
    p = lines.filter(F.col("line").rlike(_PREFIX_LINE)).select(
        "conv_id",
        "line_no",
        F.regexp_extract("line", _PREFIX_LINE, 1).alias("pfx"),
        F.regexp_extract("line", _PREFIX_LINE, 2).alias("ns"),
    )
    last = p.groupBy("conv_id", "pfx").agg(
        F.max_by("ns", "line_no").alias("ns")
    )
    return last.groupBy("conv_id").agg(
        F.map_from_entries(F.collect_list(F.struct("pfx", "ns"))).alias(
            "pfx_map"
        )
    )


def is_regular_doc(text_col):
    """Conservative eligibility gate for the fast path: reject any doc
    containing constructs the flat per-line parser can't express —
    long strings, property lists, collections, RDF-star, ';'
    continuations, blank-node labels, @base/SPARQL directives,
    default-prefix declarations, empty-local pnames, UCHAR escapes,
    and statements wrapped across lines (a non-blank non-comment line
    not ending in '.'). False negatives only cost the fast path,
    never correctness: VALID Turtle the line parser would quarantine
    must never pass this gate (round-6 review find — `@prefix :`,
    `_:b0` and wrapped statements used to slip through and their
    triples silently became E rows)."""
    return ~text_col.rlike(
        r"(?m)"
        r'"""|\'\'\'|[\[\(;]|\{\||<<'  # grammar-only constructs
        r"|_:"  # blank-node labels
        r"|\\[uU]"  # UCHAR escapes (passthrough would skip unescaping)
        r"|^\s*@base\s|^\s*[Bb][Aa][Ss][Ee]\s|^\s*[Pp][Rr][Ee][Ff][Ii][Xx]\s"
        r"|^\s*@prefix\s*:"  # default-prefix declaration
        # empty-local pname term (`ex:` / `:`), excluding the pfx token
        # of @prefix declaration lines
        r"|^(?!\s*@prefix\s).*[ \t]\w*:([ \t]|$)"
        r"|^\w*:([ \t]|$)"
        r"|^(?!\s*$)(?!\s*#).*[^.\s][ \t]*$"  # line not ending in '.'
    )


def parse_fastpath(docs: DataFrame) -> DataFrame:
    """docs(conv_id, text) → same T/E union schema as the grammar path
    (conv_id, stmt_idx=line_no, kind, subj, pred, obj, is_quoted, ...)."""
    lines = _lines(docs)
    pmaps = _prefix_map(lines)

    stmts = (
        lines.filter(
            (F.length("line") > 0)
            & ~F.col("line").startswith("#")
            & ~F.col("line").rlike(_PREFIX_LINE)
        )
        .select(
            "conv_id",
            "line_no",
            "line",
            F.regexp_extract("line", _TRIPLE_LINE, 1).alias("s_raw"),
            F.regexp_extract("line", _TRIPLE_LINE, 2).alias("p_raw"),
            F.regexp_extract("line", _TRIPLE_LINE, 3).alias("o_raw"),
        )
        .join(pmaps, "conv_id", "left")
    )

    def term_to_nt(raw, pfx_map, allow_literal):
        is_iri = raw.rlike(_IRIREF)
        is_pname = raw.rlike(_PNAME)
        pfx = F.regexp_extract(raw, r"^(\w+):", 1)
        ns = F.element_at(pfx_map, pfx)
        local = F.regexp_replace(
            F.regexp_extract(raw, r"^\w+:(.*)$", 1),
            r"\\([_~.\-!$&'()*+,;=/?#@%])",
            r"$1",
        )
        local = F.when(
            ns.isNotNull() & ns.contains("#") & local.startswith("#"),
            F.substring(local, 2, 1000000),
        ).otherwise(local)
        pname_nt = F.when(
            ns.isNotNull(), F.concat(F.lit("<"), ns, local, F.lit(">"))
        )
        out = F.when(is_iri, raw).when(is_pname, pname_nt)
        if not allow_literal:
            return out
        # object literals: boolean → numeric (double→decimal→integer,
        # reference fixups) → quoted literal with @lang / ^^dt
        lit_body = F.regexp_extract(raw, _LITERAL, 1)
        lit_suffix = F.regexp_extract(raw, _LITERAL, 2)
        dt_raw = F.when(
            lit_suffix.startswith("^^"), F.substring(lit_suffix, 3, 1000000)
        )
        dt_pfx = F.regexp_extract(dt_raw, r"^(\w+):", 1)
        dt_ns = F.element_at(pfx_map, dt_pfx)
        dt_nt = F.when(dt_raw.rlike(_IRIREF), dt_raw).when(
            dt_raw.rlike(_PNAME) & dt_ns.isNotNull(),
            F.concat(
                F.lit("<"),
                dt_ns,
                F.regexp_extract(dt_raw, r"^\w+:(.*)$", 1),
                F.lit(">"),
            ),
        )
        quoted_nt = F.when(
            # language tags downcase at construction (RDF.rb Literal
            # behavior; kgt/turtle/terms.py literal_term) — the --dir
            # suffix is already lowercase-only per the LANG_DIR terminal
            lit_suffix.startswith("@"), F.concat(lit_body, F.lower(lit_suffix))
        ).when(
            lit_suffix.startswith("^^"),
            F.concat(lit_body, F.lit("^^"), dt_nt),
        ).otherwise(lit_body)
        return (
            out.when(
                raw.isin("true", "false"),
                F.concat(F.lit('"'), raw, F.lit(f'"^^<{XSD}boolean>')),
            )
            .when(
                raw.rlike(_DOUBLE),
                F.concat(
                    F.lit('"'),
                    F.regexp_replace(raw, r"\.([eE])", ".0$1"),
                    F.lit(f'"^^<{XSD}double>'),
                ),
            )
            .when(
                raw.rlike(_DECIMAL),
                F.concat(
                    F.lit('"'),
                    F.when(raw.startswith("."), F.concat(F.lit("0"), raw)).otherwise(raw),
                    F.lit(f'"^^<{XSD}decimal>'),
                ),
            )
            .when(
                raw.rlike(_INTEGER),
                F.concat(F.lit('"'), raw, F.lit(f'"^^<{XSD}integer>')),
            )
            .when(raw.rlike(_LITERAL), quoted_nt)
        )

    subj = term_to_nt(F.col("s_raw"), F.col("pfx_map"), False)
    # 'a' OR 'A': the grammar path mirrors the reference's [Aa] verb
    # terminal, so the fast path must too (differential fuzz found
    # 'A' docs quarantining here while parsing clean there)
    pred = F.when(
        F.col("p_raw").isin("a", "A"), F.lit(RDF_TYPE_NT)
    ).otherwise(
        term_to_nt(F.col("p_raw"), F.col("pfx_map"), False)
    )
    obj = term_to_nt(F.col("o_raw"), F.col("pfx_map"), True)

    typed = stmts.select(
        "conv_id",
        "line_no",
        "line",
        subj.alias("subj"),
        pred.alias("pred"),
        obj.alias("obj"),
    )
    ok = (
        F.col("subj").isNotNull()
        & F.col("pred").isNotNull()
        & F.col("obj").isNotNull()
    )
    return typed.select(
        "conv_id",
        F.col("line_no").cast("long").alias("stmt_idx"),
        F.when(ok, F.lit("T")).otherwise(F.lit("E")).alias("kind"),
        F.when(ok, F.col("subj")).alias("subj"),
        F.when(ok, F.col("pred")).alias("pred"),
        F.when(ok, F.col("obj")).alias("obj"),
        F.lit(False).alias("is_quoted"),
        F.when(~ok, F.col("line_no") + 1).cast("int").alias("lineno"),
        F.when(~ok, F.lit("fastpath")).alias("production"),
        F.when(~ok, F.concat(F.lit("unparseable line: "), F.substring("line", 1, 200))).alias(
            "message"
        ),
    )
