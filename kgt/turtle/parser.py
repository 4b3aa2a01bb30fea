"""Recursive-descent Turtle parser with follow-set error recovery.

From-scratch re-expression of the reference reader's production set
(/root/reference/lib/rdf/turtle/reader.rb:251-618, grammar
etc/turtle.bnf:1-29). Behavioral contract:

  - one emitted (subject, predicate, object) per read_object, in the
    reference's emission order (collection cells before the containing
    triple, bnode-property-list innards before the outer statement,
    annotation triples after the annotated one)
  - literal fixups: leading-dot decimals get "0" prepended, "N.E±x"
    doubles get ".0" inserted (reader.rb:467-473)
  - prefixed names expand by string concatenation, then relative-IRI
    resolution against the in-scope base (reader.rb:220-240)
  - '@base'/'@prefix' forms demand a '.'; SPARQL BASE/PREFIX forms
    reject one; '@'-forms must be lowercase — violations are logged
    errors with recovery (reader.rb:271-315; README "Variations")
  - both 'a' and 'A' are rdf:type (README "Variations")
  - error recovery: skip tokens to the innermost production whose
    follow set contains the lookahead, consume it, continue
    (reader.rb:566-618); validate mode still recovers but the run is
    marked failed
  - RDF-star quoted triples / annotations gated on ``rdfstar=True``
    (reader.rb:406-460)

Blank-node labels are deterministic per document: user labels map to
``u<label>``, anonymous nodes to ``g<counter>`` — collision-free and
stable, so downstream skolemization is pure hashing (no isomorphism
checks needed; SURVEY §7.3.2 deviation note).
"""

from __future__ import annotations

from kgt.turtle import uri as urilib
from kgt.turtle.lexer import (
    _SCANNER_WS as _FUSED,
    _UNESC as _UNESC_TABLE,
    _WS as _WS_RE,
    LexerError,
    TokenStream,
    unescape as _lex_unescape,
)
from kgt.turtle import terms as tm
from kgt.turtle.terms import (
    RDF_FIRST,
    RDF_NIL,
    RDF_REST,
    RDF_TYPE,
    XSD_BOOLEAN,
    XSD_DECIMAL,
    XSD_DOUBLE,
    XSD_INTEGER,
)

import re
import sys as _sys

_PN_LOCAL_ESC_RE = re.compile(r"\\([_~.\-!$&'()*+,;=/?#@%])")
_DOT_E_RE = re.compile(r"\.([eE])")

# fused-scanner group indices (terminals are top-level alternatives, so
# Match.lastindex identifies the terminal; see kgt.turtle.lexer)
if _FUSED is not None:
    _GI = _FUSED.groupindex
    _IX_ANON = _GI["ANON"]
    _IX_BNODE = _GI["BLANK_NODE_LABEL"]
    _IX_IRIREF = _GI["IRIREF"]
    _IX_DOUBLE = _GI["DOUBLE"]
    _IX_DECIMAL = _GI["DECIMAL"]
    _IX_INTEGER = _GI["INTEGER"]
    _IX_PNAME_LN = _GI["PNAME_LN"]
    _IX_PNAME_NS = _GI["PNAME_NS"]
    _IX_LSQ = _GI["STRING_LITERAL_LONG_SINGLE_QUOTE"]
    _IX_LQ = _GI["STRING_LITERAL_LONG_QUOTE"]
    _IX_SQ = _GI["STRING_LITERAL_QUOTE"]
    _IX_SSQ = _GI["STRING_LITERAL_SINGLE_QUOTE"]
    _IX_PUNCT = _GI["PUNCT"]
    _IX_PREFIX = _GI["PREFIX"]
    _IX_BASE = _GI["BASE"]
    _IX_LANG = _GI["LANG_DIR"]


class _Bail(Exception):
    """Abort the document fast pass; the full machinery re-parses."""


class ParseError(Exception):
    """Raised by parse() in validate mode when any error was logged."""


class _SyntaxErr(Exception):
    pass


class _Recovery(Exception):
    pass


class _EOFInRecovery(Exception):
    pass


class TurtleParser:
    """One parser instance per document. Use ``parse(text)``.

    Options mirror the reference reader's (reader.rb:58-117):
    base_uri, prefixes, validate, canonicalize, rdfstar.
    """

    def __init__(
        self,
        base_uri: str = "",
        prefixes: dict | None = None,
        validate: bool = False,
        canonicalize: bool = False,
        rdfstar: bool = False,
        anon_base: str = "g0",
        intern: bool = False,
    ):
        self.base_uri = base_uri or ""
        self.initial_prefixes = dict(prefixes or {})
        self.validate = validate
        self.canonicalize = canonicalize
        self.rdfstar = rdfstar
        # anon_base (reader.rb:81-82,97): basis for fresh bnode labels.
        # The reference defaults to "b0"; we default to "g0" — a
        # DOCUMENTED deviation (README Variations): the Spark pipeline
        # content-hash-skolemizes labels anyway, and the g-prefix
        # matches RDF.rb's to_unique_base shape used by our writer.
        m = re.match(r"\A([A-Za-z_]*?)([0-9]*)\Z", anon_base)
        if not m:
            raise ValueError(f"bad anon_base: {anon_base!r}")
        self._anon_prefix = m.group(1) or "g"
        self._anon_start = int(m.group(2) or 0)
        # intern (reader.rb:107 semantics): share IRI string storage
        # across terms. In Ruby this dedups RDF::URI objects; here
        # sys.intern dedups the str payloads. Off by default (moot for
        # the Spark pipeline, where terms become columnar data).
        self.intern = intern
        # batch mode sets this False: errors are returned, never raised
        self.validate_raises = True

    # -- public API -----------------------------------------------------

    def parse(self, text: str):
        """Parse one document → (statements, errors).

        statements: list of (subj, pred, obj) term tuples, emission order.
        errors: list of (lineno, production, message).
        Raises ParseError in validate mode if any error was logged.
        """
        self.prefixes = dict(self.initial_prefixes)
        self.base = self.base_uri
        self.statements = []
        self.errors = []
        self._bnode_cache = {}
        self._anon_counter = 0
        self._prod_stack = []
        self.recovering = False
        # IRI-term memo: machine-generated corpora repeat predicates and
        # namespace IRIs across statements AND documents (the parser
        # instance is reused per Arrow batch), so resolve/validate each
        # distinct (base, raw-iri) once. Keyed by base because @base can
        # change resolution mid-document; disabled in validate mode
        # (validation wants the per-occurrence error bookkeeping).
        # Survives across parse() calls on purpose; bounded in
        # _process_iri.
        if not hasattr(self, "_iri_memo"):
            self._iri_memo = {}

        # document-level fast path (the multi-statement scanner): the
        # common token shapes parse in ONE pass straight off the fused
        # lexer regex — no token list is materialized and no second
        # walk happens. ANY anomaly anywhere in the document discards
        # the whole fast pass and the document re-parses from scratch
        # through the machinery below, so recovery/error semantics are
        # byte-identical. Documents are conversation-sized, so the
        # double-lex on anomaly is bounded and rare (error docs only).
        use_fast = not self.validate
        if use_fast and _FUSED is not None:
            self.lexer = None  # _error must not read a stale lexer
            if self._fast_parse_doc(text):
                return self.statements, self.errors
            # reset everything the aborted fast pass may have touched
            self.prefixes = dict(self.initial_prefixes)
            self.base = self.base_uri
            self.statements = []
            self.errors = []
            self._bnode_cache = {}
            self._anon_counter = 0
            self.recovering = False

        self.lexer = TokenStream(text)
        self._first = self.lexer.first
        self._shift = self.lexer.shift

        # statement-level fast path: same idea at statement granularity
        # — feeds the anomaly documents, so only the anomalous statement
        # pays for the production machinery; rewind keeps semantics
        # byte-identical to the slow path. validate mode always takes
        # the slow path (it wants the exact error bookkeeping).
        while True:
            if use_fast and self._fast_statement():
                continue
            try:
                if self.lexer.first() is None:
                    break
            except LexerError:
                pass  # let read_statement's recovery handle it
            try:
                self._read_statement()
            except (LexerError, _SyntaxErr, _Recovery, _EOFInRecovery):
                break

        if self.validate and self.errors and self.validate_raises:
            raise ParseError(
                f"{len(self.errors)} errors found during processing: "
                f"{self.errors[:3]}"
            )
        return self.statements, self.errors

    # -- document-level fast path (multi-statement scanner) ---------------

    def _fast_parse_doc(self, text: str) -> bool:
        """Scan-parse the whole document in ONE pass over the fused
        lexer regex: statements of the common shapes (simple triples
        with ';'/',' lists, well-formed directives, all literal forms)
        are assembled straight from match objects — no token list, no
        second walk. Returns True iff the ENTIRE document committed;
        any anomaly (bnode property lists, collections, RDF-star,
        malformed directives, illegal tokens) raises _Bail and the
        caller re-parses from scratch, so anomaly documents behave
        byte-identically to the slow path. Repeated separators (',,'
        and ';;') are NOT anomalies: both paths collapse them, matching
        reader.rb:362's forgiving objectList/predicateObjectList.
        """
        scan = _FUSED.match
        wsm = _WS_RE.match
        unesc_table = _UNESC_TABLE
        unescape = _lex_unescape
        n = len(text)
        pos = 0
        pend = None  # one-token pushback: (lastindex, value)
        stmts = self.statements
        append = stmts.append
        process_iri = self._process_iri
        literal = self._literal
        err0 = len(self.errors)

        def nxt():
            nonlocal pos, pend
            if pend is not None:
                t = pend
                pend = None
                return t
            m = scan(text, pos)
            if m is None:
                w = wsm(text, pos)
                if w is not None:
                    pos = w.end()
                if pos >= n:
                    return (-1, None)  # clean EOF
                raise _Bail
            li = m.lastindex
            v = m.group(li)
            pos = m.end()
            if unesc_table[li] and "\\" in v:
                v = unescape(v)
            return (li, v)

        def pname_term(v):
            pfx, _, sfx = v.partition(":")
            return self._pname(pfx, sfx)

        def iri_term(li, v, allow_bnode):
            """subject/verb/datatype position: IRI-ish terms only."""
            if li == _IX_IRIREF:
                return process_iri(v[1:-1])
            if li == _IX_PNAME_LN or li == _IX_PNAME_NS:
                return pname_term(v)
            if allow_bnode and li == _IX_BNODE:
                return self._bnode(v[2:])
            raise _Bail

        try:
            while True:
                li, v = nxt()
                if li == -1:
                    return True  # clean EOF: whole document committed
                if li == _IX_PREFIX or li == _IX_BASE:
                    # mirror _fast_directive exactly: '@'-forms demand a
                    # '.', bare SPARQL forms reject one, other casings
                    # bail for the slow path's error bookkeeping
                    if li == _IX_PREFIX:
                        pli, pv = nxt()
                        if pli != _IX_PNAME_NS:
                            raise _Bail
                        ili, iv = nxt()
                        if ili != _IX_IRIREF:
                            raise _Bail
                        dli, dv = nxt()
                        dot = dli == _IX_PUNCT and dv == "."
                        if v == "@prefix":
                            if not dot:
                                raise _Bail
                        elif v == "prefix" or v == "PREFIX":
                            if dot:
                                raise _Bail
                            pend = (dli, dv) if dli != -1 else None
                        else:
                            raise _Bail
                        self.prefixes[pv[:-1]] = process_iri(iv[1:-1])[1]
                    else:
                        ili, iv = nxt()
                        if ili != _IX_IRIREF:
                            raise _Bail
                        dli, dv = nxt()
                        dot = dli == _IX_PUNCT and dv == "."
                        if v == "@base":
                            if not dot:
                                raise _Bail
                        elif v == "base" or v == "BASE":
                            if dot:
                                raise _Bail
                            pend = (dli, dv) if dli != -1 else None
                        else:
                            raise _Bail
                        self.base = process_iri(iv[1:-1])[1]
                    continue

                subject = iri_term(li, v, True)
                buf = []
                bapp = buf.append
                while True:  # predicateObjectList
                    li, v = nxt()
                    if li == _IX_PUNCT and (v == "a" or v == "A"):
                        verb = RDF_TYPE
                    else:
                        verb = iri_term(li, v, False)
                    while True:  # objectList
                        li, v = nxt()
                        if li == _IX_IRIREF:
                            obj = process_iri(v[1:-1])
                        elif li == _IX_PNAME_LN or li == _IX_PNAME_NS:
                            obj = pname_term(v)
                        elif li == _IX_BNODE:
                            obj = self._bnode(v[2:])
                        elif li == _IX_INTEGER:
                            obj = literal(v, datatype=XSD_INTEGER)
                        elif li == _IX_DECIMAL:
                            if v.startswith("."):
                                v = "0" + v
                            obj = literal(v, datatype=XSD_DECIMAL)
                        elif li == _IX_DOUBLE:
                            obj = literal(
                                _DOT_E_RE.sub(r".0\1", v), datatype=XSD_DOUBLE
                            )
                        elif li == _IX_PUNCT and (v == "true" or v == "false"):
                            obj = literal(v, datatype=XSD_BOOLEAN)
                        elif li == _IX_SQ or li == _IX_SSQ or li == _IX_LQ or li == _IX_LSQ:
                            body = v[1:-1] if (li == _IX_SQ or li == _IX_SSQ) else v[3:-3]
                            lli, lv = nxt()
                            if lli == _IX_LANG:
                                lang_dir = lv[1:]
                                if "--" in lang_dir:
                                    lang, direction = lang_dir.split("--", 1)
                                else:
                                    lang, direction = lang_dir, None
                                obj = literal(body, lang=lang, direction=direction)
                            elif lli == _IX_PUNCT and lv == "^^":
                                dli, dv = nxt()
                                obj = literal(
                                    body, datatype=iri_term(dli, dv, False)[1]
                                )
                            else:
                                pend = (lli, lv) if lli != -1 else None
                                obj = literal(body)
                        else:
                            raise _Bail
                        bapp((subject, verb, obj))
                        sli, sv = nxt()
                        if sli != _IX_PUNCT:
                            raise _Bail
                        if sv == ",":
                            # repeated ',' collapses, like the reference
                            # (reader.rb:362)
                            while True:
                                sli, sv = nxt()
                                if not (sli == _IX_PUNCT and sv == ","):
                                    break
                            pend = (sli, sv) if sli != -1 else None
                            if sli == -1:
                                raise _Bail
                            continue
                        break
                    if sv == ".":
                        stmts.extend(buf)
                        break
                    if sv == ";":
                        # repeated ';' is grammar-legal; a trailing ';'
                        # before '.' closes the statement
                        while True:
                            sli, sv = nxt()
                            if not (sli == _IX_PUNCT and sv == ";"):
                                break
                        if sli == _IX_PUNCT and sv == ".":
                            stmts.extend(buf)
                            break
                        pend = (sli, sv) if sli != -1 else None
                        if sli == -1:
                            raise _Bail
                        continue
                    raise _Bail
        except (_Bail, _SyntaxErr):
            del self.errors[err0:]
            return False

    # -- statement-level fast path ---------------------------------------

    def _rewind(self, i0: int, err0: int, rec0: bool) -> bool:
        self.lexer.i = i0
        del self.errors[err0:]
        self.recovering = rec0
        return False

    def _fast_statement(self) -> bool:
        """Parse ONE statement of the common token shapes in a flat
        loop; emissions buffer until the closing '.', and any anomaly
        rewinds everything so the production machinery re-parses the
        exact same tokens. Returns True iff a statement was committed.
        """
        lx = self.lexer
        toks = lx.toks
        n = lx.n
        i0 = lx.i
        if i0 >= n:
            return False
        err0 = len(self.errors)
        rec0 = self.recovering
        t0 = toks[i0]
        tt0 = t0[0]
        try:
            if tt0 == "PREFIX" or tt0 == "BASE":
                return self._fast_directive(i0, err0, rec0)
            if tt0 not in (
                "IRIREF",
                "PNAME_LN",
                "PNAME_NS",
                "BLANK_NODE_LABEL",
            ):
                return False

            def term_at(i, allow_literal):
                if i >= n:
                    return None
                t = toks[i]
                tt, tv = t[0], t[1]
                if tt == "IRIREF":
                    return self._process_iri(tv[1:-1]), i + 1
                if tt == "PNAME_LN" or tt == "PNAME_NS":
                    pfx, _, sfx = tv.partition(":")
                    return self._pname(pfx, sfx), i + 1
                if tt == "BLANK_NODE_LABEL":
                    return self._bnode(tv[2:]), i + 1
                if not allow_literal:
                    return None
                if tt == "INTEGER":
                    return self._literal(tv, datatype=XSD_INTEGER), i + 1
                if tt == "DECIMAL":
                    if tv.startswith("."):
                        tv = "0" + tv
                    return self._literal(tv, datatype=XSD_DECIMAL), i + 1
                if tt == "DOUBLE":
                    tv = _DOT_E_RE.sub(r".0\1", tv)
                    return self._literal(tv, datatype=XSD_DOUBLE), i + 1
                if tt is None and (tv == "true" or tv == "false"):
                    return self._literal(tv, datatype=XSD_BOOLEAN), i + 1
                if tt == "STRING_LITERAL_QUOTE" or tt == "STRING_LITERAL_SINGLE_QUOTE":
                    body = tv[1:-1]
                elif (
                    tt == "STRING_LITERAL_LONG_QUOTE"
                    or tt == "STRING_LITERAL_LONG_SINGLE_QUOTE"
                ):
                    body = tv[3:-3]
                else:
                    return None
                j = i + 1
                if j < n:
                    nt = toks[j]
                    if nt[0] == "LANG_DIR":
                        lang_dir = nt[1][1:]
                        if "--" in lang_dir:
                            lang, direction = lang_dir.split("--", 1)
                        else:
                            lang, direction = lang_dir, None
                        return (
                            self._literal(body, lang=lang, direction=direction),
                            j + 1,
                        )
                    if nt[0] is None and nt[1] == "^^":
                        dt = term_at(j + 1, False)
                        if dt is None or dt[0][0] != "I":
                            return None
                        return self._literal(body, datatype=dt[0][1]), dt[1]
                return self._literal(body), j

            got = term_at(i0, False)
            if got is None:
                return self._rewind(i0, err0, rec0)
            subject, i = got
            buf = []
            while True:  # predicateObjectList
                if i >= n:
                    return self._rewind(i0, err0, rec0)
                vt = toks[i]
                if vt[0] is None and (vt[1] == "a" or vt[1] == "A"):
                    verb = RDF_TYPE
                    i += 1
                elif vt[0] in ("IRIREF", "PNAME_LN", "PNAME_NS"):
                    verb, i = term_at(i, False)
                else:
                    return self._rewind(i0, err0, rec0)
                while True:  # objectList
                    got = term_at(i, True)
                    if got is None:
                        return self._rewind(i0, err0, rec0)
                    obj, i = got
                    buf.append((subject, verb, obj))
                    if i >= n:
                        return self._rewind(i0, err0, rec0)
                    st = toks[i]
                    if st[0] is not None:
                        return self._rewind(i0, err0, rec0)
                    sv = st[1]
                    if sv == ",":
                        # repeated ',' collapses, like the reference
                        # (reader.rb:362 shifts while the lookahead is ',')
                        while i < n and toks[i][0] is None and toks[i][1] == ",":
                            i += 1
                        continue
                    break
                if sv == ".":
                    self.statements.extend(buf)
                    lx.i = i + 1
                    return True
                if sv == ";":
                    while i < n and toks[i][0] is None and toks[i][1] == ";":
                        i += 1
                    if i < n and toks[i][0] is None and toks[i][1] == ".":
                        # trailing ';' before '.'
                        self.statements.extend(buf)
                        lx.i = i + 1
                        return True
                    continue
                return self._rewind(i0, err0, rec0)
        except (_SyntaxErr, LexerError):
            return self._rewind(i0, err0, rec0)

    def _fast_directive(self, i0: int, err0: int, rec0: bool) -> bool:
        """Well-formed @prefix/@base (terminated) and bare-lowercase
        SPARQL forms commit here; every other form (case errors,
        termination violations) rewinds for the slow path's error
        bookkeeping."""
        lx = self.lexer
        toks = lx.toks
        n = lx.n
        t = toks[i0]
        kw = t[1]
        if t[0] == "PREFIX":
            if i0 + 2 >= n:
                return self._rewind(i0, err0, rec0)
            p, iri = toks[i0 + 1], toks[i0 + 2]
            if p[0] != "PNAME_NS" or iri[0] != "IRIREF":
                return self._rewind(i0, err0, rec0)
            j = i0 + 3
            dot = j < n and toks[j][0] is None and toks[j][1] == "."
            if kw == "@prefix":
                if not dot:
                    return self._rewind(i0, err0, rec0)
                j += 1
            elif kw == "prefix" or kw == "PREFIX":
                if dot:
                    return self._rewind(i0, err0, rec0)
            else:
                return self._rewind(i0, err0, rec0)
            try:
                self.prefixes[p[1][:-1]] = self._process_iri(iri[1][1:-1])[1]
            except _SyntaxErr:
                return self._rewind(i0, err0, rec0)
            lx.i = j
            return True
        # BASE
        if i0 + 1 >= n:
            return self._rewind(i0, err0, rec0)
        iri = toks[i0 + 1]
        if iri[0] != "IRIREF":
            return self._rewind(i0, err0, rec0)
        j = i0 + 2
        dot = j < n and toks[j][0] is None and toks[j][1] == "."
        if kw == "@base":
            if not dot:
                return self._rewind(i0, err0, rec0)
            j += 1
        elif kw == "base" or kw == "BASE":
            if dot:
                return self._rewind(i0, err0, rec0)
        else:
            return self._rewind(i0, err0, rec0)
        try:
            self.base = self._process_iri(iri[1][1:-1])[1]
        except _SyntaxErr:
            return self._rewind(i0, err0, rec0)
        lx.i = j
        return True

    # -- infrastructure ---------------------------------------------------

    def _error(self, message: str, production: str = "", token=None):
        # tokens carry char offsets; line numbers materialize only here.
        # lexer is None during the document fast pass — those errors are
        # discarded on bail, so the placeholder lineno is never surfaced.
        if self.lexer is None:
            lineno = 0
        else:
            lineno = (
                self.lexer.lineno_of(token)
                if token is not None
                else self.lexer.lineno
            )
        self.errors.append((lineno, production, message))
        self.recovering = True
        raise _SyntaxErr(message)

    def _first(self):  # shadowed by a bound TokenStream.first in parse()
        return self.lexer.first()

    def _shift(self):  # shadowed by a bound TokenStream.shift in parse()
        return self.lexer.shift()

    @staticmethod
    def _tok_is(tok, value) -> bool:
        """Match a token against a string terminal (case-insensitive value,
        like EBNF token matching — this is what makes 'A' ≡ 'a')."""
        if tok is None:
            return False
        v = tok[1]
        return v == value or tok[0] == value or v.lower() == value.lower()

    def _prod(self, production: str, recover_to, fn):
        """Production wrapper with follow-set recovery (reader.rb:566-618)."""
        self._prod_stack.append(recover_to)
        self.recovering = False
        try:
            return fn()
        except (LexerError, _SyntaxErr, _Recovery) as e:
            if isinstance(e, LexerError):
                self.lexer.recover()
                self.errors.append((e.lineno, production, f"lexer: {e}"))
                self.recovering = True
            try:
                tok = self.lexer.first()
            except LexerError:
                self.lexer.recover()
                tok = None
            if tok is None and self.lexer.at_end:
                raise _EOFInRecovery("end of input while recovering")
            # union of stacked follow sets
            follows = [t for rt in self._prod_stack for t in rt]
            while True:
                try:
                    tok = self.lexer.first()
                except LexerError:
                    self.lexer.recover()
                    continue
                if tok is None:
                    raise _Recovery()
                if any(self._tok_is(tok, f) for f in follows):
                    break
                self._shift()
            if not any(self._tok_is(tok, f) for f in recover_to):
                raise _Recovery()
            return self._shift()  # truthy: consumed follow token
        finally:
            self._prod_stack.pop()

    # -- term helpers -----------------------------------------------------

    def _process_iri(self, iri: str):
        """Resolve against base; validate/canonicalize flags
        (reader.rb:181-191)."""
        if not self.validate:
            key = (self.base, iri)
            got = self._iri_memo.get(key)
            if got is not None:
                return got
            raw = iri
            if not urilib.is_absolute(iri) and self.base:
                iri = urilib.resolve(self.base, iri)
            if self.canonicalize:
                # reader.rb:188 value.canonicalize! — RFC 3986 §6.2.2
                # syntax normalization (scheme/host case, default port,
                # dot segments)
                iri = urilib.canonicalize(iri)
            if self.intern:
                iri = _sys.intern(iri)
            term = ("I", iri)
            if len(self._iri_memo) > 262144:  # bound batch-lifetime growth
                self._iri_memo.clear()
            self._iri_memo[(self.base, raw)] = term
            return term
        if not urilib.is_absolute(iri) and self.base:
            iri = urilib.resolve(self.base, iri)
        if not urilib.is_absolute(iri):
            self._error(f"relative IRI without base: {iri!r}", "process_iri")
        if self.canonicalize:
            iri = urilib.canonicalize(iri)
        if self.intern:
            iri = _sys.intern(iri)
        return ("I", iri)

    def _pname(self, prefix: str, suffix: str):
        """String-concatenation pname expansion (reader.rb:220-240)."""
        if prefix in self.prefixes:
            base = self.prefixes[prefix]
        elif prefix == "" and not self.validate:
            base = self.base
        else:
            self._error("undefined prefix", "pname", None)
        if "\\" in suffix:
            suffix = _PN_LOCAL_ESC_RE.sub(r"\1", suffix)
        if "#" in base and suffix.startswith("#"):
            suffix = suffix[1:]
        return self._process_iri(base + suffix)

    def _bnode(self, label: str | None = None):
        if label is None:
            n = self._anon_start + self._anon_counter
            self._anon_counter += 1
            return ("B", f"{self._anon_prefix}{n}")
        got = self._bnode_cache.get(label)
        if got is None:
            got = ("B", "u" + label)
            self._bnode_cache[label] = got
        return got

    def _literal(self, lexical, datatype=None, lang=None, direction=None):
        # language tags downcase at construction (see tm.literal_term)
        t = tm.literal_term(lexical, datatype, lang, direction)
        if self.canonicalize:
            t = tm.canonicalize(t)
        return t

    def _add_statement(self, production, s, p, o):
        """Emission gate (reader.rb:172-178)."""
        if s is None or p is None or o is None:
            return
        if self.validate and not self._statement_valid(s, p, o):
            self._error("Statement is invalid", production)
        self.statements.append((s, p, o))

    def _statement_valid(self, s, p, o) -> bool:
        for t in (s, p, o):
            if t[0] == "L" and not tm.literal_valid(t):
                return False
            if t[0] == "I" and (
                not urilib.is_absolute(t[1])
                or urilib.has_illegal_chars(t[1])
            ):
                return False
            # quoted triples recurse: reader.rb:173 statement.invalid?
            # walks embedded RDF::Statement terms, so an ill-typed
            # literal or illegal IRI INSIDE << ... >> invalidates the
            # asserting statement too
            if t[0] == "Q" and not self._statement_valid(
                t[1], t[2], t[3]
            ):
                return False
        return True

    # -- productions (etc/turtle.bnf:1-29) --------------------------------

    def _read_statement(self):
        def body():
            tok = self._first()
            if tok is None:
                self._error("Unexpected end of file", "statement")
            if tok[0] in ("BASE", "PREFIX"):
                if not self._read_directive():
                    self._error("Failed to parse directive", "directive", tok)
            else:
                if not self._read_triples():
                    self._error("Expected token", "statement", tok)
                if not self.recovering or self._tok_is(self._first(), "."):
                    t = self._shift()
                    if t is None or t[1] != ".":
                        self._error(
                            "Expected '.' following triple", "statement", t
                        )

        return self._prod("statement", ["."], body)

    def _read_directive(self):
        def body():
            tok = self._first()
            if tok[0] == "BASE":
                return self._prod("base", [], lambda: self._directive_base(tok))
            if tok[0] == "PREFIX":
                return self._prod(
                    "prefixID", ["."], lambda: self._directive_prefix(tok)
                )
            return None

        return self._prod("directive", ["."], body)

    def _directive_base(self, tok):
        self._shift()
        terminated = tok[1] == "@base"
        iri = self._shift()
        if iri is None or iri[0] != "IRIREF":
            self._error("Expected IRIREF", "base", iri)
        self.base = self._process_iri(iri[1][1:-1])[1]
        if tok[1].startswith("@") and tok[1] != "@base":
            self._error(f"{tok[1]} should be downcased", "base", tok)
        if terminated:
            if not self._tok_is(self._first(), "."):
                self._error(f"Expected {tok[1]} to be terminated", "base")
            self._shift()
        elif self._tok_is(self._first(), "."):
            self._error(f"Expected {tok[1]} not to be terminated", "base")
        return True

    def _directive_prefix(self, tok):
        self._shift()
        pfx, iri = self._shift(), self._shift()
        terminated = tok[1] == "@prefix"
        if pfx is None or pfx[0] != "PNAME_NS":
            self._error("Expected PNAME_NS", "prefix", pfx)
        if iri is None or iri[0] != "IRIREF":
            self._error("Expected IRIREF", "prefix", iri)
        # prefix IRIs resolve against the current base (reader.rb:212-216)
        self.prefixes[pfx[1][:-1]] = self._process_iri(iri[1][1:-1])[1]
        if tok[1].startswith("@") and tok[1] != "@prefix":
            self._error(f"{tok[1]} should be downcased", "prefixID", tok)
        if terminated:
            if not self._tok_is(self._first(), "."):
                self._error(f"Expected {tok[1]} to be terminated", "prefixID")
            self._shift()
        elif self._tok_is(self._first(), "."):
            self._error(f"Expected {tok[1]} not to be terminated", "prefixID")
        return True

    def _read_triples(self):
        def body():
            tok = self._first()
            if tok is None:
                self._error("Unexpected end of file", "triples")
            if tok[0] is None and tok[1] == "[":
                subject = self._read_blankNodePropertyList()
                if subject is None:
                    self._error(
                        "Failed to parse blankNodePropertyList",
                        "triples",
                        self._first(),
                    )
                return self._read_predicateObjectList(subject) or subject
            subject = self._read_subject()
            if subject is None:
                self._error("Failed to parse subject", "triples", self._first())
            pol = self._read_predicateObjectList(subject)
            if not pol:
                self._error(
                    "Expected predicateObjectList", "triples", self._first()
                )
            return pol

        return self._prod("triples", ["."], body)

    def _read_predicateObjectList(self, subject):
        def body():
            last_verb = None
            while True:
                verb = self._read_verb()
                if verb is None:
                    break
                last_verb = verb

                def inner():
                    if not self._read_objectList(subject, verb):
                        self._error(
                            "Expected objectList",
                            "predicateObjectList",
                            self._first(),
                        )
                    return True

                self._prod("_predicateObjectList_5", [], inner)
                if not self._tok_is(self._first(), ";"):
                    break
                while self._tok_is(self._first(), ";"):
                    self._shift()
            return last_verb

        return self._prod("predicateObjectList", [";"], body)

    def _read_objectList(self, subject, predicate):
        def body():
            last_object = None
            while True:
                obj = self._prod(
                    "_objectList_2", [], lambda: self._read_object(subject, predicate)
                )
                if obj is None:
                    break
                last_object = obj
                self._read_annotation(subject, predicate, obj)
                if not self._tok_is(self._first(), ","):
                    break
                while self._tok_is(self._first(), ","):
                    self._shift()
            return last_object

        return self._prod("objectList", [","], body)

    def _read_verb(self):
        tok = self._first()
        if tok is None:
            self._error("Unexpected end of file", "verb")
        if tok[0] is None and tok[1] in ("a", "A"):
            # both 'a' and 'A' match rdf:type (README "Variations")
            def body():
                self._shift()
                return RDF_TYPE

            return self._prod("verb", [], body)
        return self._prod("verb", [], self._read_iri)

    def _read_subject(self):
        def body():
            r = (
                self._read_iri()
                or self._read_BlankNode()
                or self._read_collection()
                or self._read_quotedTriple()
            )
            if r is None:
                self._error("Expected subject", "subject", self._first())
            return r

        return self._prod("subject", [], body)

    def _read_object(self, subject=None, predicate=None):
        def body():
            obj = (
                self._read_iri()
                or self._read_BlankNode()
                or self._read_collection()
                or self._read_blankNodePropertyList()
                or self._read_literal()
                or self._read_quotedTriple()
            )
            if obj is not None and subject is not None and predicate is not None:
                self._add_statement("object", subject, predicate, obj)
            return obj

        return self._prod("object", [], body)

    def _read_quotedTriple(self):
        if not self.rdfstar:
            return None
        tok = self._first()
        if tok is None or tok[1] != "<<":
            return None

        def body():
            self._shift()
            s = self._read_qtSubject()
            if s is None:
                self._error(
                    "Failed to parse subject", "quotedTriple", self._first()
                )
            p = self._read_verb()
            if p is None:
                self._error(
                    "Failed to parse predicate", "quotedTriple", self._first()
                )
            o = self._read_qtObject()
            if o is None:
                self._error(
                    "Failed to parse object", "quotedTriple", self._first()
                )
            end = self._first()
            if end is None or end[1] != ">>":
                self._error(
                    "Failed to end of embedded triple",
                    "quotedTriple",
                    end,
                )
            self._shift()
            return ("Q", s, p, o)

        return self._prod("quotedTriple", [], body)

    def _read_qtSubject(self):
        def body():
            r = (
                self._read_iri()
                or self._read_BlankNode()
                or self._read_quotedTriple()
            )
            if r is None:
                self._error(
                    "Expected embedded subject", "qtSubject", self._first()
                )
            return r

        return self._prod("qtSubject", [], body)

    def _read_qtObject(self):
        def body():
            return (
                self._read_iri()
                or self._read_BlankNode()
                or self._read_literal()
                or self._read_quotedTriple()
            )

        return self._prod("qtObject", [], body)

    def _read_annotation(self, subject, predicate, obj):
        tok = self._first()
        if tok is None:
            self._error("Unexpected end of file", "annotation")
        if tok[1] != "{|":
            return None

        def body():
            self._shift()
            statement = ("Q", subject, predicate, obj)
            if not self._read_predicateObjectList(statement):
                self._error(
                    "Expected predicateObjectList", "annotation", self._first()
                )
            if not self._tok_is(self._first(), "|}"):
                self._error("Expected closing '|}'", "annotation")
            self._shift()
            return True

        return self._prod("annotation", ["|}"], body)

    def _read_literal(self):
        tok = self._first()
        if tok is None:
            self._error("Unexpected end of file", "literal")
        ttype = tok[0]
        tval = tok[1]
        if ttype == "INTEGER":
            return self._prod(
                "literal",
                [],
                lambda: self._literal(self._shift()[1], datatype=XSD_INTEGER),
            )
        if ttype == "DECIMAL":

            def dec():
                v = self._shift()[1]
                # only the bare leading-dot form gets "0" prepended
                # (reader.rb:470-471; "+.1" stays "+.1")
                if v.startswith("."):
                    v = "0" + v
                return self._literal(v, datatype=XSD_DECIMAL)

            return self._prod("literal", [], dec)
        if ttype == "DOUBLE":

            def dbl():
                v = _DOT_E_RE.sub(r".0\1", self._shift()[1])
                return self._literal(v, datatype=XSD_DOUBLE)

            return self._prod("literal", [], dbl)
        if ttype is None and tval in ("true", "false"):
            return self._prod(
                "literal",
                [],
                lambda: self._literal(self._shift()[1], datatype=XSD_BOOLEAN),
            )
        if ttype in ("STRING_LITERAL_QUOTE", "STRING_LITERAL_SINGLE_QUOTE"):
            return self._prod("literal", [], lambda: self._string_literal(1, 1))
        if ttype in (
            "STRING_LITERAL_LONG_QUOTE",
            "STRING_LITERAL_LONG_SINGLE_QUOTE",
        ):
            return self._prod("literal", [], lambda: self._string_literal(3, 3))
        return None

    def _string_literal(self, lstrip: int, rstrip: int):
        value = self._shift()[1][lstrip:-rstrip]
        tok = self._first()
        if tok is None:
            self._error("Unexpected end of file", "literal")
        if tok[0] == "LANG_DIR":
            lang_dir = self._shift()[1][1:]
            if "--" in lang_dir:
                language, direction = lang_dir.split("--", 1)
            else:
                language, direction = lang_dir, None
            return self._literal(value, lang=language, direction=direction)
        if tok[0] is None and tok[1] == "^^":
            self._shift()
            dt = self._read_iri()
            if dt is None:
                self._error("Expected datatype IRI", "literal", self._first())
            return self._literal(value, datatype=dt[1])
        return self._literal(value)

    def _read_blankNodePropertyList(self):
        tok = self._first()
        # bare [] / [ ] lexes as ANON and is a BlankNode, not a property list
        if tok is None or tok[0] is not None or tok[1] != "[":
            return None

        def body():
            self._shift()
            node = self._bnode()
            self._read_predicateObjectList(node)
            if not self._tok_is(self._first(), "]"):
                self._error("Expected closing ']'", "blankNodePropertyList")
            self._shift()
            return node

        return self._prod("blankNodePropertyList", ["]"], body)

    def _read_collection(self):
        tok = self._first()
        if tok is None or not (tok[0] is None and tok[1] == "("):
            return None

        def body():
            self._shift()
            objects = []
            while True:
                obj = self._read_object()
                if obj is None:
                    break
                objects.append(obj)
            # cons-list expansion (reader.rb:527-546 via RDF::List):
            # cell triples are emitted HERE, before the containing triple
            if objects:
                cells = [self._bnode() for _ in objects]
                for i, (cell, obj) in enumerate(zip(cells, objects)):
                    self._add_statement("collection", cell, RDF_FIRST, obj)
                    rest = cells[i + 1] if i + 1 < len(cells) else RDF_NIL
                    self._add_statement("collection", cell, RDF_REST, rest)
                head = cells[0]
            else:
                head = RDF_NIL
            if not self._tok_is(self._first(), ")"):
                self._error("Expected closing ')'", "collection")
            self._shift()
            return head

        return self._prod("collection", [")"], body)

    def _read_iri(self):
        tok = self._first()
        if tok is None:
            return None
        if tok[0] == "IRIREF":
            return self._prod(
                "iri", [], lambda: self._process_iri(self._shift()[1][1:-1])
            )
        if tok[0] in ("PNAME_LN", "PNAME_NS"):

            def body():
                v = self._shift()[1]
                prefix, _, suffix = v.partition(":")
                return self._pname(prefix, suffix)

            return self._prod("iri", [], body)
        return None

    def _read_BlankNode(self):
        tok = self._first()
        if tok is None:
            return None
        if tok[0] == "BLANK_NODE_LABEL":
            return self._prod(
                "BlankNode", [], lambda: self._bnode(self._shift()[1][2:])
            )
        if tok[0] == "ANON":
            self._shift()
            return self._prod("BlankNode", [], lambda: self._bnode())
        return None
