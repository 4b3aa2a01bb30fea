"""RFC 3986 reference resolution (strict), matching RDF.rb's choices.

The reference resolves relative IRIs with RDF::URI#join
(lib/rdf/turtle/reader.rb:181-191); behavior is pinned by the 306-case
battery at spec/reader_spec.rb:1216-1931 (RubenVerborgh's RFC 3986 gist).
Python's urllib.parse.urljoin deviates on several cases (e.g. <http:g>,
scheme-relative refs for unknown schemes), so this is a from-scratch
implementation of RFC 3986 §5.2.

No normalization beyond dot-segment removal: case, percent-encoding and
default ports are preserved (RDF.rb joins without canonicalizing).
"""

from __future__ import annotations

import re

_SPLIT_RE = re.compile(
    r"\A(?:([A-Za-z][A-Za-z0-9+.\-]*):)?"  # scheme
    r"(?://([^/?#]*))?"                      # authority
    r"([^?#]*)"                              # path
    r"(?:\?([^#]*))?"                        # query
    r"(?:#(.*))?\Z",
    re.S,
)


def split_iri(iri: str):
    """Split into (scheme, authority, path, query, fragment); None = absent."""
    m = _SPLIT_RE.match(iri)
    return m.groups()


def unsplit(scheme, authority, path, query, fragment) -> str:
    out = []
    if scheme is not None:
        out.append(scheme + ":")
    if authority is not None:
        out.append("//" + authority)
    out.append(path or "")
    if query is not None:
        out.append("?" + query)
    if fragment is not None:
        out.append("#" + fragment)
    return "".join(out)


def remove_dot_segments(path: str) -> str:
    """RFC 3986 §5.2.4."""
    if not path or ("." not in path):
        return path
    output = []
    while path:
        if path.startswith("../"):
            path = path[3:]
        elif path.startswith("./"):
            path = path[2:]
        elif path.startswith("/./"):
            path = "/" + path[3:]
        elif path == "/.":
            path = "/"
        elif path.startswith("/../"):
            path = "/" + path[4:]
            if output:
                output.pop()
        elif path == "/..":
            path = "/"
            if output:
                output.pop()
        elif path in (".", ".."):
            path = ""
        else:
            # move first segment (incl. leading '/') to output
            i = path.find("/", 1)
            if i == -1:
                output.append(path)
                path = ""
            else:
                output.append(path[:i])
                path = path[i:]
    return "".join(output)


def _merge(base_authority, base_path: str, ref_path: str) -> str:
    """RFC 3986 §5.2.3."""
    if base_authority is not None and not base_path:
        return "/" + ref_path
    i = base_path.rfind("/")
    if i == -1:
        return ref_path
    return base_path[: i + 1] + ref_path


def is_absolute(iri: str) -> bool:
    return split_iri(iri)[0] is not None


def resolve(base: str, ref: str) -> str:
    """Resolve ``ref`` against ``base`` per RFC 3986 §5.2.2 (strict),
    with one documented reference-parity deviation: an EMPTY relative
    reference returns the base verbatim, INCLUDING its fragment.
    Strict §5.2.2 drops the fragment (T.fragment = R.fragment,
    undefined), but RDF.rb's URI#join keeps it and the reference's own
    spec pins ``@base <http://foo/bar#> . <> <a> <b>`` resolving to
    ``<http://foo/bar#>`` (reader_spec.rb "absolute base (trailing
    #)"); the two conventions differ only when the base carries a
    fragment."""
    if not base:
        return ref
    if not ref:
        return base
    r_scheme, r_auth, r_path, r_query, r_frag = split_iri(ref)
    if r_scheme is not None:
        return unsplit(
            r_scheme, r_auth, remove_dot_segments(r_path), r_query, r_frag
        )
    b_scheme, b_auth, b_path, b_query, _ = split_iri(base)
    if r_auth is not None:
        t = (b_scheme, r_auth, remove_dot_segments(r_path), r_query, r_frag)
    elif not r_path:
        t = (b_scheme, b_auth, b_path, r_query if r_query is not None else b_query, r_frag)
    elif r_path.startswith("/"):
        t = (b_scheme, b_auth, remove_dot_segments(r_path), r_query, r_frag)
    else:
        merged = _merge(b_auth, b_path, r_path)
        t = (b_scheme, b_auth, remove_dot_segments(merged), r_query, r_frag)
    return unsplit(*t)


# Characters an IRI may never contain in ANY component (RFC 3987's
# iunreserved/ipchar exclusions that IRIREF's raw-char class also bans:
# C0 controls, space, <>"{}|^`\ ). The lexer rejects them RAW, but UCHAR
# escapes (  etc.) smuggle them past the terminal — RDF.rb's
# RDF::URI#valid? catches that at statement level (reader.rb:173
# statement.invalid? under validate), so validate mode must too.
_ILLEGAL_IRI_RE = re.compile(r'[\x00-\x20<>"{}|^`\\]')


def has_illegal_chars(iri: str) -> bool:
    return _ILLEGAL_IRI_RE.search(iri) is not None


# RDF::URI::PORT_MAPPING defaults the canonicalizer drops
_DEFAULT_PORTS = {
    "http": "80", "https": "443", "ftp": "21",
    "ws": "80", "wss": "443", "gopher": "70",
}


def canonicalize(iri: str) -> str:
    """RFC 3986 §6.2.2 syntax-based normalization, mirroring
    RDF::URI#canonicalize! (rdf gem uri.rb — the reader calls it under
    the ``canonicalize`` option, reader.rb:187): scheme and host
    downcased, the scheme's default port dropped, dot-segments removed
    and duplicate slashes squeezed in the path (RDF.rb's
    normalized_path .squeeze('/')), empty path with an authority
    normalized to '/'. Query/fragment/userinfo are left as written."""
    scheme, authority, path, query, fragment = split_iri(iri)
    if scheme is not None:
        scheme = scheme.lower()
    if authority is not None:
        userinfo, _, hostport = authority.rpartition("@")
        host, colon, port = hostport.partition(":")
        host = host.lower()
        if colon and port == _DEFAULT_PORTS.get(scheme, None):
            colon, port = "", ""
        authority = (userinfo + "@" if userinfo else "") + host + colon + port
        if not path:
            path = "/"
    if path:
        path = remove_dot_segments(path)
        if "//" in path:
            head = ""
            if path.startswith("/"):
                head, path = "/", path.lstrip("/")
            while "//" in path:
                path = path.replace("//", "/")
            path = head + path
    return unsplit(scheme, authority, path, query, fragment)
