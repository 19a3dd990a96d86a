"""N-Triples rendering of term tuples (final projection of the pipeline's
triples table; reference sink analogue: ``IRdfHandler`` → file writer)."""

from __future__ import annotations

_LITERAL_ESCAPES = {
    "\\": "\\\\", '"': '\\"', "\n": "\\n", "\r": "\\r", "\t": "\\t",
}


def _escape_literal(text: str) -> str:
    return "".join(_LITERAL_ESCAPES.get(ch, ch) for ch in text)


def _escape_iri(text: str) -> str:
    out = []
    for ch in text:
        code = ord(ch)
        if code <= 0x20 or ch in '<>"{}|^`\\':
            out.append(f"\\u{code:04X}")
        else:
            out.append(ch)
    return "".join(out)


def render_node(node) -> str:
    kind = node[0]
    if kind == "i":
        return f"<{_escape_iri(node[1])}>"
    if kind == "b":
        return f"_:{node[1]}"
    _, value, datatype, lang = node
    body = f'"{_escape_literal(value)}"'
    if lang:
        return f"{body}@{lang}"
    if datatype:
        return f"{body}^^<{_escape_iri(datatype)}>"
    return body


def render_triple(triple) -> str:
    s, p, o = triple
    return f"{render_node(s)} <{_escape_iri(p)}> {render_node(o)} ."


def render_ntriples(triples) -> str:
    return "\n".join(render_triple(t) for t in triples) + ("\n" if triples else "")
