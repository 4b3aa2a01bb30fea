"""Batch-in / batch-out parse API — the unit mapInPandas wraps.

Takes lists of documents (one reassembled conversation each), returns
columnar lists: one output row per emitted statement plus one row per
parse error (kind 'T' / 'E'). This module is Spark-free so the exact
code that runs inside Arrow batches is unit-testable standalone
(SURVEY §7.0 design stance).

Skolemization happens here when requested: document-scoped bnode labels
become content-hash skolem labels m<md5(salt:conv_id:label)> — stable
under Spark task retries (never counter- or partition-id-based;
SURVEY §4 explicit-engineering item 3) and reproducible in SQL oracles
via DuckDB's md5().
"""

from __future__ import annotations

import hashlib

from kgt.turtle.parser import TurtleParser
from kgt.turtle.terms import nt_encode

TRIPLES_COLUMNS = [
    "conv_id",
    "stmt_idx",
    "kind",
    "subj",
    "pred",
    "obj",
    "is_quoted",
    "lineno",
    "production",
    "message",
]

DEFAULT_SKOLEM_SALT = "kgt1"


def _skolem_label(conv_id: str, label: str, salt: str) -> str:
    h = hashlib.md5(f"{salt}:{conv_id}:{label}".encode()).hexdigest()
    return f"m{h}"


def _encode_term(term, conv_id, salt):
    """NT-encode a term, skolemizing bnodes (recursing into quoted triples)."""
    kind = term[0]
    if kind == "B" and salt is not None:
        return "_:" + _skolem_label(conv_id, term[1], salt)
    if kind == "Q":
        return (
            f"<< {_encode_term(term[1], conv_id, salt)} "
            f"{_encode_term(term[2], conv_id, salt)} "
            f"{_encode_term(term[3], conv_id, salt)} >>"
        )
    return nt_encode(term)


def parse_batch(
    conv_ids,
    texts,
    base_uri: str = "",
    prefixes: dict | None = None,
    validate: bool = False,
    canonicalize: bool = False,
    rdfstar: bool = False,
    skolem_salt: str | None = DEFAULT_SKOLEM_SALT,
):
    """Parse a batch of documents → dict of TRIPLES_COLUMNS lists.

    One 'T' row per emitted statement (NT-encoded terms, stmt_idx in
    emission order), one 'E' row per recovered parse error. validate
    mode still recovers; errors mark the run (reference duality,
    reader.rb:142-144) — here every error is always a quarantine row.
    """
    parser = TurtleParser(
        base_uri=base_uri,
        prefixes=prefixes,
        validate=validate,
        canonicalize=canonicalize,
        rdfstar=rdfstar,
    )
    # never raise mid-batch: validate-mode "raise at end of document"
    # (reader.rb:142-144) becomes "drop the document's statements and
    # keep its E rows" — the pipeline equivalent of a failed document.
    parser.validate_raises = False
    rows: list[tuple] = []
    rapp = rows.append
    # NT-encoding memo for conv-independent terms (everything except
    # bnodes / quoted triples, whose skolem labels depend on conv_id):
    # repeated predicates/namespace IRIs/common literals encode once per
    # batch instead of once per statement. The parser's IRI memo hands
    # back the SAME tuple objects, so hashing the key is cheap.
    enc_memo: dict = {}
    memo_get = enc_memo.get

    # per-document skolem memo: a bnode (property-list head, collection
    # cell) typically appears in several statements of its conversation
    # — hash 'salt:conv:label' once per (doc, label), not per occurrence
    # (the same repeated-term reason the batch-level enc_memo exists)
    bnode_memo: dict = {}
    bmemo_get = bnode_memo.get

    def enc(term, conv_id):
        kind = term[0]
        if kind == "B":
            got = bmemo_get(term)
            if got is None:
                got = _encode_term(term, conv_id, skolem_salt)
                bnode_memo[term] = got
            return got
        if kind == "Q":
            return (
                f"<< {enc(term[1], conv_id)} {enc(term[2], conv_id)} "
                f"{enc(term[3], conv_id)} >>"
            )
        got = memo_get(term)
        if got is None:
            got = nt_encode(term)
            if len(enc_memo) > 262144:
                enc_memo.clear()
            enc_memo[term] = got
        return got

    for conv_id, text in zip(conv_ids, texts):
        if text is None:
            text = ""
        bnode_memo.clear()  # skolem labels are conv_id-scoped
        stmts, errors = parser.parse(text)
        if validate and errors:
            stmts = []
        idx = 0
        for s, p, o in stmts:
            rapp(
                (
                    conv_id,
                    idx,
                    "T",
                    enc(s, conv_id),
                    enc(p, conv_id),
                    enc(o, conv_id),
                    s[0] == "Q" or o[0] == "Q",
                    None,
                    None,
                    None,
                )
            )
            idx += 1
        for lineno, production, message in errors:
            rapp(
                (
                    conv_id,
                    -1,
                    "E",
                    None,
                    None,
                    None,
                    False,
                    lineno,
                    production,
                    message[:500] if message else message,
                )
            )
    if not rows:
        return {c: [] for c in TRIPLES_COLUMNS}
    cols = zip(*rows)  # one C-level transpose instead of 10 appends/row
    return dict(zip(TRIPLES_COLUMNS, (list(c) for c in cols)))
