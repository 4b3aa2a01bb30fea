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


def quoted(value: str) -> str:
    """Pick long-quote form when the value contains \\t/\\n/\\r
    (writer.rb:474-482), else escaped single-line quotes. The long form
    escapes every backslash and every double quote, exactly like the
    reference (writer.rb:475-478)."""
    if any(c in value for c in "\t\n\r"):
        body = value.replace("\\", "\\\\").replace('"', '\\"')
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
    canonicalize: bool = False,
) -> str:
    """Pretty-print a graph CHAR-IDENTICALLY to the reference writer
    (writer.rb write_epilogue path, 174-202 + 530-668): @base/@prefix
    header (used prefixes only, sorted), a blank line before every
    top-level statement, properties split with ``;\\n`` + 2-space
    indent, object lists with ``,\\n`` + 4-space indent, rdf:type as
    'a', inline ``[...]`` for single-reference bnodes, ``(...)`` for
    well-formed lists, ``{| ... |}`` RDF-star annotations. Options
    mirror writer.rb:109-130.

    statements: iterable of (s, p, o) term tuples.
    """
    return _PrettyWriter(
        prefixes=prefixes,
        base=base,
        max_depth=max_depth,
        literal_shorthand=literal_shorthand,
        unique_bnodes=unique_bnodes,
        default_namespace=default_namespace,
        standard_prefixes=standard_prefixes,
        canonicalize=canonicalize,
    ).serialize(statements)


_RDF_FIRST_T = ("I", RDF_FIRST)
_RDF_REST_T = ("I", RDF_REST)
_RDF_TYPE_T = ("I", RDF_TYPE)
_RDF_NIL_T = ("I", RDF_NIL)

# writer.rb:360 predicate_order: rdf:type, rdfs:label, dcterms:title
_PREDICATE_ORDER_LIST = [
    RDF_TYPE,
    "http://www.w3.org/2000/01/rdf-schema#label",
    "http://purl.org/dc/terms/title",
]


class _PrettyWriter:
    """Faithful port of the reference pretty-writer layout algorithm.

    Each method mirrors its writer.rb counterpart (cited inline) so the
    emitted bytes match the reference for the same graph + options.
    State: depth drives indent(); serialized/lists/ref_count mirror
    @serialized/@lists/@references.
    """

    def __init__(
        self,
        prefixes=None,
        base: str = "",
        max_depth: int = 3,
        literal_shorthand: bool = True,
        unique_bnodes: bool = False,
        default_namespace: str | None = None,
        standard_prefixes: bool = False,
        canonicalize: bool = False,
    ):
        self.base = base
        self.max_depth = max_depth
        self.literal_shorthand = literal_shorthand
        self.unique_bnodes = unique_bnodes
        self.standard_prefixes = standard_prefixes
        self.canonicalize = canonicalize
        # candidate namespaces for get_pname matching (writer.rb:218-237)
        self.candidates = dict(prefixes or {})
        if standard_prefixes:
            for k, v in STANDARD_PREFIXES.items():
                self.candidates.setdefault(k, v)
        if default_namespace:
            self.candidates[""] = default_namespace
        # like the reference, only prefixes actually used are declared
        # (preprocess resets options[:prefixes], get_pname re-adds) —
        # except default_namespace, declared eagerly (writer.rb:417)
        self.used_prefixes: dict[str, str] = {}
        if default_namespace:
            self.used_prefixes[""] = default_namespace
        self.uri_to_pname: dict[str, str | None] = {}
        self.out: list[str] = []
        self.depth = 0

    # -- emit helpers ---------------------------------------------------

    def write(self, s: str):
        self.out.append(s)

    def indent(self, modifier: int = 0) -> str:
        # writer.rb:456
        return " " * (self.depth * 2 + modifier)

    # -- pname / term formatting ---------------------------------------

    def get_pname(self, iri: str) -> str | None:
        """writer.rb:207-246 — longest-namespace match among candidate
        prefixes; registers the prefix as used; validity-checked."""
        if iri in self.uri_to_pname:
            return self.uri_to_pname[iri]
        best = None
        for pfx, ns in self.candidates.items():
            if (
                ns
                and iri.startswith(ns)
                and (best is None or len(ns) > len(self.candidates[best]))
            ):
                best = pfx
        out = None
        if best is not None:
            suffix = iri[len(self.candidates[best]) :]
            if (best == "" or _PNAME_NS_RE.match(best)) and (
                suffix == "" or _PN_LOCAL_RE.match(suffix)
            ):
                out = f"{best}:{suffix}"
                self.used_prefixes[best] = self.candidates[best]
        self.uri_to_pname[iri] = out
        return out

    def format_uri(self, iri: str) -> str:
        # writer.rb:315-319: relativize against base, else pname, else <iri>
        if self.base and iri.startswith(self.base) and len(iri) > len(self.base):
            rel = iri[len(self.base) :]
            if re.match(r"\A[A-Za-z0-9_\-./#?=&%]+\Z", rel):
                return f"<{rel}>"
        pn = self.get_pname(iri)
        return pn if pn is not None else f"<{iri}>"

    def format_term(self, t) -> str:
        k = t[0]
        if k == "I":
            return "()" if t == _RDF_NIL_T else self.format_uri(t[1])
        if k == "B":
            return f"_:{self.bnode_label(t)}"
        if k == "L":
            return self.format_literal(t)
        if k == "Q":
            # writer.rb:337-342 format_quotedTriple: no inner padding
            return "<<%s %s %s>>" % (
                self.format_term(t[1]),
                self.format_term(t[2]),
                self.format_term(t[3]),
            )
        raise ValueError(f"bad term {t!r}")

    # reference format_literal (writer.rb:276-307): shorthand types emit
    # the bare value when lexically in-form and not canonicalizing, else
    # the CANONICAL lexical (doubles with a lowercase 'e'). Validity for
    # booleans follows RDF.rb's case-insensitive grammar.
    _BOOL_VALID = re.compile(r"(?i)\A(?:true|false|1|0)\Z")
    _DEC_IN_FORM = re.compile(r"\A[+-]?[0-9]+\.[0-9]+\Z")
    _DBL_IN_FORM = re.compile(
        r"(?i)\A[+-]?(?:[0-9]+\.[0-9]*|\.[0-9]+|[0-9]+)E[+-]?[0-9]+\Z"
    )

    def format_literal(self, t) -> str:
        _, lex, dt, lang, direction = t
        if lang is None and self.literal_shorthand:
            if dt == tm.XSD_BOOLEAN and self._BOOL_VALID.match(lex):
                if lex in ("true", "false"):
                    return lex
                return {"1": "true", "0": "false"}.get(lex, lex.lower())
            if dt == tm.XSD_INTEGER and tm.literal_valid(t):
                if _INTEGER_RE.match(lex) and not self.canonicalize:
                    return lex
                return tm._canonical_integer(lex)
            if dt == tm.XSD_DECIMAL and tm.literal_valid(t):
                if self._DEC_IN_FORM.match(lex) and not self.canonicalize:
                    return lex
                return tm._canonical_decimal(lex)
            if dt == tm.XSD_DOUBLE and tm.literal_valid(t):
                if self._DBL_IN_FORM.match(lex) and not self.canonicalize:
                    return lex
                return tm._canonical_double(lex).replace("E", "e")
        body = quoted(lex)
        if lang is not None:
            return f"{body}@{lang}--{direction}" if direction else f"{body}@{lang}"
        if dt is not None and dt != tm.XSD_STRING:
            return f"{body}^^{self.format_uri(dt)}"
        return body

    def bnode_label(self, t) -> str:
        # node.to_base vs to_unique_base (writer.rb:327-334); unique
        # labels start with 'g' like RDF.rb's to_unique_base
        if not self.unique_bnodes:
            return t[1]
        if t not in self._unique_labels:
            self._unique_labels[t] = f"g{len(self._unique_labels)}u{t[1]}"
        return self._unique_labels[t]

    # -- preprocess (writer.rb:408-451) ---------------------------------

    def _preprocess(self, statements):
        stmts = []
        seen_stmt = set()  # RDF::Graph dedupes on insert
        for s, p, o in statements:
            key = (tuple_term(s), tuple_term(p), tuple_term(o))
            if key in seen_stmt:
                continue
            seen_stmt.add(key)
            stmts.append(key)
        self.stmts = stmts
        self._unique_labels: dict = {}

        self.ref_count: dict = {}
        self.by_subject: dict = {}  # subject -> {pred_iri: [objects]} in order
        self.subject_order: list = []
        def bump_embedded(t):
            # a bnode inside a quoted triple is a REFERENCE to that
            # node: if it also has its own statements, anonymizing them
            # as [...] would sever the co-reference (<< _:b :p :o >>
            # and _:b :name "Bob" must reparse as ONE node). The
            # reference's preprocess misses this (writer.rb:429 bumps
            # only statement.object) and loses the link — documented
            # deviation, same no-data-loss rationale as collection().
            if t[0] == "Q":
                for inner in t[1:]:
                    if inner[0] == "B":
                        self.ref_count[inner] = (
                            self.ref_count.get(inner, 0) + 1
                        )
                    bump_embedded(inner)

        for s, p, o in stmts:
            self.ref_count[o] = self.ref_count.get(o, 0) + 1
            bump_embedded(s)
            bump_embedded(o)
            if s not in self.by_subject:
                self.by_subject[s] = {}
                self.subject_order.append(s)
            self.by_subject[s].setdefault(p[1], []).append(o)

        # @lists: EVERY node with a valid first/rest chain to nil
        # (preprocess_statement writer.rb:428-451 + RDF::List#valid?)
        def chain_ok(t, seen):
            while t != _RDF_NIL_T:
                if t in seen or t[0] != "B":
                    return False
                seen.add(t)
                props = self.by_subject.get(t)
                if not props:
                    return False
                firsts = props.get(RDF_FIRST, [])
                rests = props.get(RDF_REST, [])
                if len(firsts) != 1 or len(rests) != 1:
                    return False
                t = rests[0]
            return True

        self.lists: dict = {}
        for s, p, o in stmts:
            if p == _RDF_FIRST_T and s not in self.lists and chain_ok(s, set()):
                # collect values + interior nodes
                values, nodes, cur = [], [], s
                while cur != _RDF_NIL_T:
                    nodes.append(cur)
                    props = self.by_subject[cur]
                    values.append(props[RDF_FIRST][0])
                    cur = props[RDF_REST][0]
                self.lists[s] = (values, nodes)
            if o == _RDF_NIL_T or s == _RDF_NIL_T:
                self.lists.setdefault(_RDF_NIL_T, ([], []))

        # writer.rb:190-193: a referenced list with non-list properties
        # can't render as (...). DOCUMENTED DEVIATION: the reference's
        # prop_count excludes rdf:type (writer.rb:494-499), so a
        # referenced list head carrying `a :X` inlines as (...) and its
        # type triple is silently DROPPED (collection() marks the node
        # done). Here ANY extra property — type included — blocks
        # inlining: the head renders as a bare bnode label and all its
        # triples reach the document (losing statements is worse than
        # byte parity; no inlinable W3C-corpus shape changes).
        def _extra_props(n):
            props = self.by_subject.get(n, {})
            return sum(
                len(objs)
                for pred, objs in props.items()
                if pred not in (RDF_FIRST, RDF_REST)
            )

        self.lists = {
            n: v
            for n, v in self.lists.items()
            if not (self.ref_count.get(n, 0) > 0 and _extra_props(n) > 0)
        }

        self.serialized: set = set()

        # pre-fetch pnames so start_document knows the used prefixes
        # (preprocess_statement writer.rb:445-450)
        for s, p, o in stmts:
            for t in (s, p, o):
                if t[0] == "I":
                    self.get_pname(t[1])
                elif t[0] == "L" and t[2] is not None:
                    self.get_pname(t[2])

    def prop_count(self, subject) -> int:
        # statements with this subject, excluding type/first/rest
        # (writer.rb:494-499)
        props = self.by_subject.get(subject, {})
        return sum(
            len(objs)
            for pred, objs in props.items()
            if pred not in (RDF_TYPE, RDF_FIRST, RDF_REST)
        )

    def is_done(self, subject) -> bool:
        return subject in self.serialized

    def subject_done(self, subject):
        self.serialized.add(subject)

    # -- ordering (writer.rb:252-270, 366-405) --------------------------

    def sort_properties(self, properties: dict) -> list:
        prop_list = [p for p in _PREDICATE_ORDER_LIST if p in properties]
        for p in sorted(properties):
            if p not in prop_list:
                prop_list.append(p)
        return prop_list

    def order_subjects(self) -> list:
        seen = set()
        subjects = []
        base_t = ("I", self.base) if self.base else None
        if base_t and base_t in self.by_subject:
            subjects.append(base_t)
            seen.add(base_t)
        # distinguished (top-class-typed) subjects, term-sorted
        tops = sorted(
            {
                s
                for s in self.subject_order
                if any(
                    o[0] == "I" and o[1] in _TOP_CLASSES
                    for o in self.by_subject[s].get(RDF_TYPE, [])
                )
            },
            key=tm.nt_encode,
        )
        for s in tops:
            if s not in seen:
                subjects.append(s)
                seen.add(s)
        # lists nested in other lists, and interior chain nodes, are
        # not top-level (writer.rb:389-393 marks list-statement objects
        # that are themselves lists — rest targets and nested heads)
        for values, nodes in self.lists.values():
            for v in values:
                if v in self.lists:
                    seen.add(v)
            for n in nodes[1:]:
                seen.add(n)
        # list ELEMENTS that are bnodes aren't top-level either
        list_elements = {
            v
            for values, _nodes in self.lists.values()
            for v in values
            if v[0] == "B"
        }
        kind_rank = {"I": 0, "L": 0, "Q": 1, "B": 2}
        recursable = sorted(
            (
                s
                for s in self.subject_order
                if s not in seen and s not in list_elements
            ),
            key=lambda s: (
                kind_rank.get(s[0], 0),
                self.ref_count.get(s, 0),
                tm.nt_encode(s),
            ),
        )
        return subjects + recursable

    # -- layout (writer.rb:530-668) --------------------------------------

    def blank_node_property_list_p(self, resource, position) -> bool:
        # writer.rb:485-491
        return (
            resource[0] == "B"
            and resource not in self.lists
            and (not self.is_done(resource) or position == "subject")
            and self.ref_count.get(resource, 0)
            == (1 if position == "object" else 0)
        )

    def collection(self, node, position) -> bool:
        # writer.rb:530-553
        if node not in self.lists:
            return False
        if position == "subject" and self.ref_count.get(node, 0) > 0:
            return False
        if position == "object" and self.prop_count(node) > 0:
            return False
        self.write("(")
        self.depth += 1
        values, nodes = self.lists[node]
        self.subject_done(_RDF_NIL_T)
        for index, value in enumerate(values):
            if index > 0:
                self.write(" ")
            # DOCUMENTED DEVIATION from writer.rb:546: the reference
            # passes the COLLECTION's position through to its first
            # element, so a nested list heading a subject-position
            # collection hits collection(inner, :subject)'s
            # ref_count>0 refusal, falls to a bare bnode label, and —
            # because order_subjects excludes list-internal heads
            # (writer.rb:391-400) — the inner list's triples are
            # silently DROPPED from the document. Elements of a
            # collection are rdf:first objects by construction, so
            # "object" is the semantically correct position and makes
            # ((1 2) (3 4)) :p :o . round-trip; object-position
            # collections are byte-identical either way (their
            # position is already "object").
            self.path(value, "object")
        for n in nodes:
            self.subject_done(n)
        self.depth -= 1
        self.write(")")
        return True

    def blank_node_property_list(self, resource, position) -> bool:
        # writer.rb:556-565 (+ max_depth bound on inlining in object
        # position — documented deviation: the reference stores
        # max_depth but never applies it; we honor it)
        if not self.blank_node_property_list_p(resource, position):
            return False
        if position == "object" and self.depth >= self.max_depth:
            return False
        self.subject_done(resource)
        self.write("\n" + self.indent() + " [" if position == "subject" else "[")
        self.depth += 1
        num_props = self.predicate_object_list(resource, True)
        self.depth -= 1
        self.write(
            ("\n" + self.indent(2) if num_props > 1 else "")
            + ("]" if position == "object" else "] .")
        )
        return True

    def p_term(self, resource, position):
        # writer.rb:568-576
        self.write(self.format_term(resource))

    def path(self, resource, position):
        # writer.rb:580-591
        if not (
            self.collection(resource, position)
            or self.blank_node_property_list(resource, position)
        ):
            self.p_term(resource, position)

    def predicate(self, pred_iri: str):
        # writer.rb:594-600
        if pred_iri == RDF_TYPE:
            self.write("a")
        else:
            self.path(("I", pred_iri), "predicate")

    def object_list(self, subject, pred_iri, objects):
        # writer.rb:604-626 (incl. RDF-star annotation blocks)
        for i, obj in enumerate(objects):
            if i > 0 and self.blank_node_property_list_p(obj, "object"):
                self.write(", ")
            elif i > 0:
                self.write(",\n" + self.indent(4))
            self.path(obj, "object")
            emb = ("Q", subject, ("I", pred_iri), obj)
            if emb in self.by_subject and not self.is_done(emb):
                self.write(" {| ")
                self.predicate_object_list(emb, True)
                self.write(" |}")
                self.subject_done(emb)

    def predicate_object_list(self, subject, from_bpl: bool = False) -> int:
        # writer.rb:629-651; returns the TOTAL property count (the
        # reference returns properties.keys.length, pre-filtering)
        properties = self.by_subject.get(subject, {})
        prop_list = self.sort_properties(properties)
        if subject in self.lists:
            prop_list = [p for p in prop_list if p not in (RDF_FIRST, RDF_REST)]
        if not prop_list:
            return 0
        if len(properties) > 1 and from_bpl:
            self.write("\n" + self.indent(2))
        for i, prop in enumerate(prop_list):
            if i > 0:
                self.write(";\n" + self.indent(2))
            self.predicate(prop)
            self.write(" ")
            self.object_list(subject, prop, properties[prop])
        return len(properties)

    def triples(self, subject):
        # writer.rb:654-660
        self.write("\n" + self.indent())
        self.path(subject, "subject")
        self.write(" ")
        num_props = self.predicate_object_list(subject)
        self.write((" " if num_props > 0 else "") + ".")

    def statement(self, subject):
        # writer.rb:663-667
        self.subject_done(subject)
        if not self.blank_node_property_list(subject, "subject"):
            self.triples(subject)
        self.write("\n")

    def start_document(self):
        # writer.rb:344-352: @base, then used prefixes name-sorted
        if self.base:
            self.write(f"{self.indent()}@base <{self.base}> .\n")
        for pfx in sorted(self.used_prefixes):
            self.write(f"{self.indent()}@prefix {pfx}: <{self.used_prefixes[pfx]}> .\n")

    def serialize(self, statements) -> str:
        # write_epilogue (writer.rb:174-202)
        self._preprocess(statements)
        self.start_document()
        for subject in self.order_subjects():
            if not self.is_done(subject):
                self.statement(subject)
        # No-data-loss net (deviation, see collection()): order_subjects
        # excludes list-internal nodes on the assumption they were
        # inlined; a bnode list ELEMENT that is also referenced
        # elsewhere (ref_count > 1) is excluded but NOT inlinable, and
        # the reference silently drops its triples (writer.rb:395-400).
        # Emit anything still pending so every input statement reaches
        # the document; on all inlinable shapes this loop writes
        # nothing and the output is byte-identical to the reference's.
        for subject in self.subject_order:
            if not self.is_done(subject):
                self.statement(subject)
        return "".join(self.out)


def tuple_term(t):
    """Deep-tuple a term (lists from Arrow/JSON arrive as lists)."""
    if t[0] == "Q":
        return ("Q", tuple_term(t[1]), tuple_term(t[2]), tuple_term(t[3]))
    return tuple(t)


_STREAM_START = object()


def serialize_stream(
    statements,
    prefixes=None,
    base: str = "",
    literal_shorthand: bool = True,
    unique_bnodes: bool = False,
    standard_prefixes: bool = False,
    canonicalize: bool = False,
) -> str:
    """The reference's `stream: true` writer path
    (streaming_writer.rb:11-48), scalar: O(1) state (current subject +
    predicate), NO graph buffering — predicates always written as
    terms (rdf:type is NOT shortened to 'a'), repeated subjects group
    with ';\\n ' + predicate, repeated (subject, predicate) with
    ',\\n  '. Stream-mode preprocess declares ALL given prefixes
    (writer.rb:418-421 doesn't prune in stream mode).

    The columnar twin is kgt.spark.write.turtle_fragments /
    streaming_turtle (same bytes, window functions); pinned equal in
    tests.
    """
    w = _PrettyWriter(
        prefixes=prefixes,
        base=base,
        literal_shorthand=literal_shorthand,
        unique_bnodes=unique_bnodes,
        standard_prefixes=standard_prefixes,
        canonicalize=canonicalize,
    )
    w._unique_labels = {}
    # stream mode declares every candidate prefix up front
    w.used_prefixes.update(w.candidates)
    w.start_document()
    w.write("\n")
    cur_s = cur_p = _STREAM_START
    for s, p, o in statements:
        s, p, o = tuple_term(s), tuple_term(p), tuple_term(o)
        if s != cur_s:
            if cur_s is not _STREAM_START:
                w.write(" .\n")
            cur_s, cur_p = s, p
            w.write(f"{w.format_term(s)} {w.format_term(p)} ")
        elif p != cur_p:
            cur_p = p
            w.write(f";\n {w.format_term(p)} ")
        else:
            w.write(",\n  ")
        w.write(w.format_term(o))
    if cur_s is not _STREAM_START:
        w.write(" .\n")
    return "".join(w.out)
