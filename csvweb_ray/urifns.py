"""URI resolution helpers with .NET ``System.Uri``-flavored semantics.

The reference engine resolves relative IRIs with ``new Uri(base, rel)``
(see ``/root/reference/src/DataDock.CsvWeb/Rdf/Converter.cs:602`` and
``Parsing/JsonMetadataParser.cs:715``).  .NET applies RFC 3986 reference
resolution plus canonicalization of the resulting absolute URI
(dot-segment compression).  Unlike ``urllib``, the reference never
percent-encodes characters that are already present in the string — the
``escaping`` fixture (``Tests/data/escaping.out.ttl:3``) expects a raw
space inside an IRI — so everything here is purely textual.
"""

from __future__ import annotations

import re

_SCHEME_RE = re.compile(r"^[A-Za-z][A-Za-z0-9+.\-]*:")
_ABS_RE = re.compile(r"^[A-Za-z][A-Za-z0-9+.\-]*://")


def is_absolute_uri(s: str) -> bool:
    """True when ``s`` carries a URI scheme (``http:``, ``file:``, ...)."""
    return bool(_SCHEME_RE.match(s))


def _split(uri: str):
    """Split into (scheme, authority, path, query, fragment); textual only."""
    fragment = None
    if "#" in uri:
        uri, fragment = uri.split("#", 1)
    query = None
    if "?" in uri:
        uri, query = uri.split("?", 1)
    scheme = None
    m = _SCHEME_RE.match(uri)
    if m and "//" not in uri[: m.end()]:
        scheme = uri[: m.end() - 1]
        uri = uri[m.end():]
    authority = None
    if uri.startswith("//"):
        rest = uri[2:]
        slash = rest.find("/")
        if slash < 0:
            authority, uri = rest, ""
        else:
            authority, uri = rest[:slash], rest[slash:]
    return scheme, authority, uri, query, fragment


def _join_parts(scheme, authority, path, query, fragment) -> str:
    out = []
    if scheme is not None:
        out.append(scheme + ":")
    if authority is not None:
        out.append("//" + authority)
    out.append(path)
    if query is not None:
        out.append("?" + query)
    if fragment is not None:
        out.append("#" + fragment)
    return "".join(out)


def remove_dot_segments(path: str) -> str:
    """RFC 3986 §5.2.4, as .NET applies to absolute URIs."""
    # fast path: dot SEGMENTS only ever appear as a leading "."/".." or
    # after a slash ("/.", "/.."); a path with neither is already
    # canonical ("data.csv" has dots but no dot segments).  This is the
    # hot line of the whole conversion core — one C-level substring scan
    # instead of the segment loop for the overwhelmingly common case.
    if "/." not in path and (not path or path[0] != "."):
        return path
    output: list[str] = []
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
            if path.startswith("/"):
                nxt = path.find("/", 1)
            else:
                nxt = path.find("/")
            if nxt < 0:
                output.append(path)
                path = ""
            else:
                output.append(path[:nxt])
                path = path[nxt:]
    return "".join(output)


_BASE_SPLIT_CACHE: dict[str, tuple] = {}


def _split_base(base: str) -> tuple:
    """Memoized ``_split`` for resolution bases: every cell of a table
    resolves against the same table URL, so the base split is effectively
    per-table, not per-cell.  Bounded (bases are table/metadata URLs)."""
    r = _BASE_SPLIT_CACHE.get(base)
    if r is None:
        if len(_BASE_SPLIT_CACHE) > 4096:
            _BASE_SPLIT_CACHE.clear()
        r = _BASE_SPLIT_CACHE[base] = _split(base)
    return r


def _merge(base_authority, base_path: str, rel_path: str) -> str:
    if base_authority is not None and not base_path:
        return "/" + rel_path
    slash = base_path.rfind("/")
    if slash < 0:
        return rel_path
    return base_path[: slash + 1] + rel_path


def resolve_uri(base: str | None, rel: str) -> str:
    """Resolve ``rel`` against ``base`` like ``new Uri(base, rel)``.

    Raises ``ValueError`` when no base is given and ``rel`` is relative.
    """
    if is_absolute_uri(rel):
        # "/." absent anywhere → the path component certainly has no dot
        # segments → already canonical (a "/." in query/fragment would
        # defeat the shortcut, and correctly falls through to the split)
        if "/." not in rel:
            return rel
        s, a, p, q, f = _split(rel)
        return _join_parts(s, a, remove_dot_segments(p), q, f)
    if base is None:
        raise ValueError(f"cannot resolve relative reference {rel!r} without a base URI")
    bs, ba, bp, bq, bf = _split_base(base)
    if rel == "":
        # .NET: new Uri(base, "") == base without fragment changes; keep base as-is
        return _join_parts(bs, ba, remove_dot_segments(bp), bq, bf)
    if rel.startswith("#"):
        return _join_parts(bs, ba, remove_dot_segments(bp), bq, rel[1:])
    rs, ra, rp, rq, rf = _split(rel)
    if ra is not None:
        return _join_parts(bs, ra, remove_dot_segments(rp), rq, rf)
    if rp == "":
        return _join_parts(bs, ba, remove_dot_segments(bp), rq if rq is not None else bq, rf)
    if rp.startswith("/"):
        return _join_parts(bs, ba, remove_dot_segments(rp), rq, rf)
    return _join_parts(bs, ba, remove_dot_segments(_merge(ba, bp, rp)), rq, rf)


def normalize_absolute(uri: str) -> str:
    """Canonicalize an absolute URI the way .NET does on construction
    (dot-segment compression only; no percent-(un)escaping)."""
    s, a, p, q, f = _split(uri)
    return _join_parts(s, a, remove_dot_segments(p), q, f)
