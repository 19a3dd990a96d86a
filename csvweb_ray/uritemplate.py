"""Simplified RFC 6570 URI templates, CSVW-flavored.

Semantics follow the reference implementation
(``/root/reference/src/DataDock.CsvWeb/UriTemplate.cs:30-118``):

- expressions are ``{...}`` groups; each is an optional operator followed
  by a comma-separated variable list;
- an unbound or empty binding raises :class:`UriTemplateBindingError`
  (the converter turns that into a silently dropped triple);
- in *reference-parity* mode substituted values are NOT percent-encoded
  (``Tests/data/escaping.out.ttl`` expects a literal space in an IRI);
- in *spec* mode (``encode=True``) simple expansion percent-encodes
  everything outside the RFC 3986 unreserved set, while ``+`` and ``#``
  expansions keep reserved characters — RFC 6570 levels 1-2, which is
  what the W3C CSVW test suite expects.
"""

from __future__ import annotations

import re
from typing import Callable

_EXPR_RE = re.compile(r"\{([^{}]+)\}")

_UNRESERVED = set("ABCDEFGHIJKLMNOPQRSTUVWXYZabcdefghijklmnopqrstuvwxyz0123456789-._~")
_RESERVED = set(":/?#[]@!$&'()*+,;=") | _UNRESERVED


class UriTemplateBindingError(Exception):
    """Raised when a template variable is unbound or binds to ''."""

    def __init__(self, variable: str):
        super().__init__(f"No binding for URI template variable {variable!r}")
        self.variable = variable


def _pct_encode(value: str, safe: set) -> str:
    out = []
    for ch in value:
        if ch in safe:
            out.append(ch)
        else:
            out.append("".join(f"%{b:02X}" for b in ch.encode("utf-8")))
    return "".join(out)


def _decode_var(var: str) -> str:
    # Variable names in templates may be percent-encoded (e.g. {URI%20t})
    if "%" in var:
        try:
            return re.sub(
                r"%([0-9A-Fa-f]{2})(?:%([0-9A-Fa-f]{2}))*",
                lambda m: bytes(
                    int(h, 16) for h in re.findall(r"%([0-9A-Fa-f]{2})", m.group(0))
                ).decode("utf-8"),
                var,
            )
        except (ValueError, UnicodeDecodeError):
            return var
    return var


class UriTemplate:
    """A compiled URI template. ``resolve`` accepts a dict or a callable."""

    __slots__ = ("template", "encode", "_parts")

    def __init__(self, template: str, encode: bool = False):
        self.template = template
        self.encode = encode
        # Pre-split into literal / expression parts at compile time so the
        # row loop does no regex work.
        parts: list[tuple[bool, object]] = []
        pos = 0
        for m in _EXPR_RE.finditer(template):
            if m.start() > pos:
                parts.append((False, template[pos : m.start()]))
            expr = m.group(1)
            operator = ""
            if expr and expr[0] in "#+":
                operator, expr = expr[0], expr[1:]
            variables = tuple(_decode_var(v) for v in expr.split(","))
            parts.append((True, (operator, variables)))
            pos = m.end()
        if pos < len(template):
            parts.append((False, template[pos:]))
        self._parts = parts

    @property
    def variables(self) -> list[str]:
        out = []
        for is_expr, payload in self._parts:
            if is_expr:
                out.extend(payload[1])
        return out

    def resolve(self, bindings) -> str:
        """Expand the template. ``bindings`` is a mapping or a callable
        ``var -> value``; a missing/None/empty value raises
        :class:`UriTemplateBindingError` (reference ``UriTemplate.cs:105-117``).
        """
        if callable(bindings):
            lookup: Callable[[str], object] = bindings
        else:
            d = bindings

            def lookup(var: str):
                if var not in d:
                    raise UriTemplateBindingError(var)
                return d[var]

        out = []
        for is_expr, payload in self._parts:
            if not is_expr:
                out.append(payload)
                continue
            operator, variables = payload
            values = []
            for var in variables:
                value = lookup(var)
                if value is None or value == "":
                    raise UriTemplateBindingError(var)
                value = str(value)
                if self.encode:
                    safe = _RESERVED if operator in ("#", "+") else _UNRESERVED
                    value = _pct_encode(value, safe)
                values.append(value)
            joined = ",".join(values)
            out.append(("#" + joined) if operator == "#" else joined)
        return "".join(out)

    def __repr__(self) -> str:  # pragma: no cover
        return f"UriTemplate({self.template!r}, encode={self.encode})"
