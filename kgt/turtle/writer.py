"""Turtle serialization core (Spark-free).

Re-expresses the reference writer's operators
(/root/reference/lib/rdf/turtle/writer.rb):
  - get_pname: longest-prefix match, validity-checked (writer.rb:207-246)
  - format_literal: numeric/boolean shorthand when lexically in-form,
    else quoted + @lang--dir + ^^dt (writer.rb:276-307)
  - format_uri: relativize-vs-base, pname, else <iri> (writer.rb:315-319)
  - quoted: long-quote when the value has \\t\\n\\r (writer.rb:474-482)
  - serialize_pretty: whole-graph pretty printer — ref-counts, list
    detection, subject ordering, inline [...] (writer.rb:174-202,
    366-451, 530-668)

The streaming writer (streaming_writer.rb) is NOT here: its
repeat-subject/;-, logic re-expresses as window functions in
kgt.spark.write (a genuinely columnar form).

Terms are the tuples of kgt.turtle.terms; `decode_nt` turns the
pipeline's NT-encoded strings back into term tuples.
"""

from __future__ import annotations

import re

from kgt.turtle import terms as tm
from kgt.turtle import terminals as T
from kgt.turtle.lexer import unescape

_PNAME_NS_RE = re.compile(f"\\A{T.PN_PREFIX}\\Z")
_PN_LOCAL_RE = re.compile(f"\\A{T.PN_LOCAL}\\Z")

RDF_TYPE = tm.RDF_NS + "type"
RDF_FIRST = tm.RDF_NS + "first"
RDF_REST = tm.RDF_NS + "rest"
RDF_NIL = tm.RDF_NS + "nil"

# predicate emission order (writer.rb:360): rdf:type, rdfs:label,
# dc:title first, then lexicographic
_PREDICATE_ORDER = {
    RDF_TYPE: 0,
    "http://www.w3.org/2000/01/rdf-schema#label": 1,
    "http://purl.org/dc/terms/title": 2,
}
# subjects typed by these classes serialize first (writer.rb:355)
_TOP_CLASSES = {"http://www.w3.org/2000/01/rdf-schema#Class"}


# ---------------------------------------------------------------------
# NT term decoding (pipeline strings → term tuples)
# ---------------------------------------------------------------------

_NT_LITERAL_RE = re.compile(
    r'\A"(?P<lex>(?:[^"\\]|\\.)*)"'
    r"(?:\^\^<(?P<dt>[^>]*)>|@(?P<lang>[A-Za-z0-9\-]+?)(?:--(?P<dir>[a-z]+))?)?\Z",
    re.S,
)


def decode_nt(s: str):
    """Decode one NT-encoded term string to a term tuple."""
    if s.startswith("<<"):
        inner = s[2:-2].strip()
        parts = _split_quoted_triple(inner)
        return ("Q",) + tuple(decode_nt(p) for p in parts)
    if s.startswith("<") and s.endswith(">"):
        return ("I", s[1:-1])
    if s.startswith("_:"):
        return ("B", s[2:])
    m = _NT_LITERAL_RE.match(s)
    if m:
        return (
            "L",
            unescape(m.group("lex")),
            m.group("dt"),
            m.group("lang"),
            m.group("dir"),
        )
    raise ValueError(f"not an NT term: {s!r}")


def _split_quoted_triple(inner: str):
    """Split '<< s p o >>' innards into 3 term strings (nesting-aware)."""
    parts, depth, start, in_str = [], 0, 0, False
    i = 0
    while i < len(inner):
        c = inner[i]
        if in_str:
            if c == "\\":
                i += 2
                continue
            if c == '"':
                in_str = False
        elif c == '"':
            in_str = True
        elif inner.startswith("<<", i):
            depth += 1
            i += 2
            continue
        elif inner.startswith(">>", i):
            depth -= 1
            i += 2
            continue
        elif c == " " and depth == 0:
            seg = inner[start:i].strip()
            if seg:
                parts.append(seg)
            start = i + 1
        i += 1
    seg = inner[start:].strip()
    if seg:
        parts.append(seg)
    if len(parts) != 3:
        raise ValueError(f"bad quoted triple: {inner!r}")
    return parts


# ---------------------------------------------------------------------
# scalar formatters
# ---------------------------------------------------------------------


def get_pname(iri: str, prefixes: dict[str, str], _cache: dict | None = None) -> str | None:
    """URI → pname by LONGEST matching prefix IRI; None when no match or
    the result isn't a valid PNAME (writer.rb:207-246)."""
    if _cache is not None and iri in _cache:
        return _cache[iri]
    best = None
    for pfx, ns in prefixes.items():
        if ns and iri.startswith(ns) and (best is None or len(ns) > len(prefixes[best])):
            best = pfx
    out = None
    if best is not None:
        suffix = iri[len(prefixes[best]) :]
        if (best == "" or _PNAME_NS_RE.match(best)) and (
            suffix == "" or _PN_LOCAL_RE.match(suffix)
        ):
            out = f"{best}:{suffix}"
    if _cache is not None:
        _cache[iri] = out
    return out


_INTEGER_RE = re.compile(r"\A[+-]?[0-9]+\Z")
_DECIMAL_RE = re.compile(r"\A[+-]?[0-9]*\.[0-9]+\Z")
_DOUBLE_RE = re.compile(
    r"\A[+-]?(?:[0-9]+\.[0-9]*[eE][+-]?[0-9]+|\.?[0-9]+[eE][+-]?[0-9]+)\Z"
)

_ESCAPES = {
    "\\": "\\\\",
    '"': '\\"',
    "\n": "\\n",
    "\r": "\\r",
    "\t": "\\t",
    "\b": "\\b",
    "\f": "\\f",
}
_ESC_RE = re.compile(r'[\\"\n\r\t\b\f]')
_LONG_ESC_RE = re.compile(r'[\\]|"""')


def quoted(value: str) -> str:
    """Pick long-quote form when the value contains \\t/\\n/\\r
    (writer.rb:474-482), else escaped single-line quotes."""
    if any(c in value for c in "\t\n\r"):
        body = value.replace("\\", "\\\\").replace('"""', '\\"""')
        if body.endswith('"'):
            body = body[:-1] + '\\"'
        return f'"""{body}"""'
    return '"' + _ESC_RE.sub(lambda m: _ESCAPES[m.group(0)], value) + '"'


def format_literal(
    term, prefixes: dict[str, str] | None = None, literal_shorthand: bool = True
) -> str:
    """Literal → Turtle: bare shorthand for boolean/integer/decimal/
    double whose lexical form is in-shorthand-form (writer.rb:276-307);
    ``literal_shorthand=False`` always quotes (writer.rb:130,279)."""
    _, lex, dt, lang, direction = term
    if lang is None and literal_shorthand:
        if dt == tm.XSD_BOOLEAN and lex in ("true", "false"):
            return lex
        if dt == tm.XSD_INTEGER and _INTEGER_RE.match(lex):
            return lex
        if dt == tm.XSD_DECIMAL and _DECIMAL_RE.match(lex) and "." in lex:
            return lex
        if dt == tm.XSD_DOUBLE and _DOUBLE_RE.match(lex):
            return lex
    body = quoted(lex)
    if lang is not None:
        return f"{body}@{lang}--{direction}" if direction else f"{body}@{lang}"
    if dt is not None and dt != tm.XSD_STRING:
        return f"{body}^^{format_uri(('I', dt), prefixes)}"
    return body


def format_uri(term, prefixes: dict[str, str] | None = None, base: str = "") -> str:
    iri = term[1]
    if base and iri.startswith(base) and len(iri) > len(base):
        rel = iri[len(base) :]
        if re.match(r"\A[A-Za-z0-9_\-./#?=&%]+\Z", rel):
            return f"<{rel}>"
    if prefixes:
        pn = get_pname(iri, prefixes)
        if pn is not None:
            return pn
    return f"<{iri}>"


def format_term(term, prefixes=None, base: str = "", literal_shorthand: bool = True) -> str:
    k = term[0]
    if k == "I":
        return format_uri(term, prefixes, base)
    if k == "B":
        return f"_:{term[1]}"
    if k == "L":
        return format_literal(term, prefixes, literal_shorthand)
    if k == "Q":
        return (
            f"<< {format_term(term[1], prefixes, base, literal_shorthand)} "
            f"{format_term(term[2], prefixes, base, literal_shorthand)} "
            f"{format_term(term[3], prefixes, base, literal_shorthand)} >>"
        )
    raise ValueError(f"bad term {term!r}")


# ---------------------------------------------------------------------
# pretty printer (whole-graph; per-conversation graphs are doc-sized)
# ---------------------------------------------------------------------


# standard prefixes injected by standard_prefixes: true (the reference
# scans RDF::Vocabulary — we carry the common subset)
STANDARD_PREFIXES = {
    "rdf": tm.RDF_NS,
    "rdfs": "http://www.w3.org/2000/01/rdf-schema#",
    "xsd": tm.XSD_NS,
    "owl": "http://www.w3.org/2002/07/owl#",
    "dc": "http://purl.org/dc/terms/",
    "foaf": "http://xmlns.com/foaf/0.1/",
    "schema": "http://schema.org/",
}


def serialize_pretty(
    statements,
    prefixes=None,
    base: str = "",
    max_depth: int = 3,
    literal_shorthand: bool = True,
    unique_bnodes: bool = False,
    default_namespace: str | None = None,
    standard_prefixes: bool = False,
) -> str:
    """Pretty-print a graph the way the reference writer does:
    @prefix header, subjects ordered (top-classes first, then by
    node-kind/ref-count), rdf:type as 'a', `;`/`,` grouping, inline
    [...] for single-reference bnodes (bounded by ``max_depth``,
    writer.rb:179), (...) for well-formed lists. Options mirror
    writer.rb:109-130: literal_shorthand, unique_bnodes (doc-unique
    relabeling), default_namespace (empty-prefix binding),
    standard_prefixes (inject the common vocab prefixes).

    statements: iterable of (s, p, o) term tuples.
    """
    prefixes = dict(prefixes or {})
    if standard_prefixes:
        for k, v in STANDARD_PREFIXES.items():
            prefixes.setdefault(k, v)
    if default_namespace:
        prefixes[""] = default_namespace
    stmts = [tuple(s) for s in statements]

    if unique_bnodes:
        # doc-unique relabeling (reference to_unique_base, writer.rb:328)
        remap: dict = {}

        def uniq(t):
            if t[0] == "B":
                if t not in remap:
                    remap[t] = ("B", f"u{len(remap)}b{t[1]}")
                return remap[t]
            if t[0] == "Q":
                return ("Q", uniq(t[1]), uniq(t[2]), uniq(t[3]))
            return t

        stmts = [(uniq(s), uniq(p), uniq(o)) for s, p, o in stmts]

    # preprocess (writer.rb:408-451): ref counts + subject properties
    ref_count: dict = {}
    by_subject: dict = {}
    for s, p, o in stmts:
        ref_count[o] = ref_count.get(o, 0) + 1
        by_subject.setdefault(s, []).append((p, o))

    # well-formed list detection: bnode subjects with exactly
    # rdf:first + rdf:rest, chains ending in rdf:nil, no other props
    def list_node(t):
        props = by_subject.get(t)
        if t[0] != "B" or not props or len(props) != 2:
            return None
        d = dict(props)
        if set(d) == {("I", RDF_FIRST), ("I", RDF_REST)}:
            return d
        return None

    lists = {}  # head term -> ([values], {interior nodes})
    # a head is a list node not referenced by any rdf:rest
    rest_targets = {
        o for props in by_subject.values() for p, o in props if p == ("I", RDF_REST)
    }
    for t in by_subject:
        if list_node(t) and t not in rest_targets:
            values, cur, ok, seen = [], t, True, set()
            while cur != ("I", RDF_NIL):
                if cur in seen:
                    ok = False
                    break
                seen.add(cur)
                d = list_node(cur)
                if d is None:
                    ok = False
                    break
                values.append(d[("I", RDF_FIRST)])
                cur = d[("I", RDF_REST)]
            if ok:
                lists[t] = (values, seen)

    serialized = set()

    def is_inlineable_bnode(t):
        return (
            t[0] == "B"
            and ref_count.get(t, 0) == 1
            and t in by_subject
            and t not in lists
        )

    def fmt(t, depth):
        if t in lists:
            vals, _nodes = lists[t]
            inner = " ".join(fmt(v, depth + 1) for v in vals)
            mark_list(t)
            return f"({inner})"
        if t == ("I", RDF_NIL):
            return "()"
        if is_inlineable_bnode(t) and t not in serialized and depth < max_depth:
            serialized.add(t)
            inner = props_block(t, depth + 1)
            return f"[ {inner} ]"
        return format_term(t, prefixes, base, literal_shorthand)

    def mark_list(t):
        for node in lists[t][1]:
            serialized.add(node)

    def props_block(subj, depth) -> str:
        props = sorted(
            by_subject[subj],
            key=lambda po: (
                _PREDICATE_ORDER.get(po[0][1], 9),
                po[0][1],
                tm.nt_encode(po[1]),
            ),
        )
        groups: list = []
        for p, o in props:
            if groups and groups[-1][0] == p:
                groups[-1][1].append(o)
            else:
                groups.append((p, [o]))
        parts = []
        for p, objs in groups:
            pred = "a" if p == ("I", RDF_TYPE) else format_term(p, prefixes, base)
            objs_s = ", ".join(fmt(o, depth) for o in objs)
            parts.append(f"{pred} {objs_s}")
        return " ;\n  ".join(parts)

    # order subjects (writer.rb:366-405): top-class-typed first, then
    # IRIs before bnodes, higher ref-count later, stable by encoding
    def subject_key(t):
        typed_top = any(
            p == ("I", RDF_TYPE) and o[1] in _TOP_CLASSES
            for p, o in by_subject[t]
            if o[0] == "I"
        )
        return (
            0 if typed_top else 1,
            0 if t[0] == "I" else 1,
            ref_count.get(t, 0),
            tm.nt_encode(t),
        )

    out = []
    if base:
        out.append(f"@base <{base}> .")
    for pfx in sorted(prefixes):
        out.append(f"@prefix {pfx}: <{prefixes[pfx]}> .")
    if out:
        out.append("")

    for subj in sorted(by_subject, key=subject_key):
        if subj in serialized:
            continue
        # skip list interior nodes — they render inside (...)
        if subj in rest_targets and list_node(subj):
            continue
        if subj in lists:
            # a list head used as a subject: render (...) props .
            head = fmt(subj, 0)
            body = props_block(subj, 0)
            out.append(f"{head} {body} .")
            continue
        serialized.add(subj)
        head = format_term(subj, prefixes, base)
        if subj[0] == "B" and ref_count.get(subj, 0) == 0:
            body = props_block(subj, 0)
            out.append(f"[ {body} ] .")
            continue
        body = props_block(subj, 0)
        out.append(f"{head} {body} .")
    return "\n".join(out) + "\n"
