"""A compact Turtle parser (W3C Turtle subset sufficient for the CSVW
fixture corpus: prefixes, base, bnode property lists, collections, all
literal forms, numeric/boolean shorthands).

Used only by the test oracle to load expected ``.ttl`` graphs — rdflib is
not available in this environment.  Emits triples in the tuple form of
``csvweb_ray.rdf.terms``.
"""

from __future__ import annotations

import re

from ..urifns import resolve_uri
from .terms import XSD_STRING

RDF_NS = "http://www.w3.org/1999/02/22-rdf-syntax-ns#"
XSD_NS = "http://www.w3.org/2001/XMLSchema#"

_TOKEN_RE = re.compile(
    r"""
    (?P<ws>\s+|\#[^\n]*)
  | (?P<triple_quote>\"\"\"(?:[^"\\]|\\.|"(?!""))*\"\"\"|'''(?:[^'\\]|\\.|'(?!''))*''')
  | (?P<string>"(?:[^"\\\n]|\\.)*"|'(?:[^'\\\n]|\\.)*')
  | (?P<iri><(?:[^<>"{}|^`\\\s]|\\u[0-9A-Fa-f]{4}|\\U[0-9A-Fa-f]{8})*>)
  | (?P<prefix_decl>@prefix|@base|PREFIX|BASE)
  | (?P<langtag>@[a-zA-Z]+(?:-[a-zA-Z0-9]+)*)
  | (?P<double>[+-]?(?:\d+\.\d*|\.?\d+)[eE][+-]?\d+)
  | (?P<decimal>[+-]?\d*\.\d+)
  | (?P<integer>[+-]?\d+)
  | (?P<punct>\^\^|[;,.\[\]()])
  | (?P<bnode>_:[A-Za-z0-9_][A-Za-z0-9_.\-]*)
  | (?P<pname>(?:[A-Za-z0-9_\-À-￿][A-Za-z0-9_\-.À-￿]*)?:[^\s;,)\]]*|a\b)
  | (?P<kw>true|false)
    """,
    re.VERBOSE,
)

_ESCAPES = {
    "t": "\t", "b": "\b", "n": "\n", "r": "\r", "f": "\f",
    '"': '"', "'": "'", "\\": "\\",
}


class TurtleParseError(Exception):
    pass


def _unescape(text: str) -> str:
    out = []
    i = 0
    while i < len(text):
        ch = text[i]
        if ch == "\\" and i + 1 < len(text):
            nxt = text[i + 1]
            if nxt == "u":
                out.append(chr(int(text[i + 2 : i + 6], 16)))
                i += 6
                continue
            if nxt == "U":
                out.append(chr(int(text[i + 2 : i + 10], 16)))
                i += 10
                continue
            if nxt in _ESCAPES:
                out.append(_ESCAPES[nxt])
                i += 2
                continue
        out.append(ch)
        i += 1
    return "".join(out)


class TurtleParser:
    def __init__(self, base: str | None = None):
        self.base = base
        self.prefixes: dict[str, str] = {}
        self.triples: list = []
        self._bnode_counter = 0

    # -- tokenization -------------------------------------------------------

    def _tokenize(self, text: str):
        pos = 0
        tokens = []
        n = len(text)
        while pos < n:
            m = _TOKEN_RE.match(text, pos)
            if not m:
                raise TurtleParseError(f"Unexpected input at offset {pos}: {text[pos:pos+40]!r}")
            pos = m.end()
            kind = m.lastgroup
            if kind == "ws":
                continue
            tokens.append((kind, m.group(0)))
        return tokens

    # -- parsing ------------------------------------------------------------

    def parse(self, text: str) -> list:
        self.tokens = self._tokenize(text)
        self.i = 0
        while self.i < len(self.tokens):
            kind, value = self.tokens[self.i]
            if kind == "prefix_decl":
                self._parse_directive(value)
            else:
                self._parse_statement()
        return self.triples

    def _peek(self):
        if self.i < len(self.tokens):
            return self.tokens[self.i]
        return (None, None)

    def _next(self):
        tok = self._peek()
        if tok[0] is None:
            raise TurtleParseError("Unexpected end of input")
        self.i += 1
        return tok

    def _expect_punct(self, value: str):
        kind, tok = self._next()
        if kind != "punct" or tok != value:
            raise TurtleParseError(f"Expected {value!r}, found {tok!r}")

    def _parse_directive(self, decl: str):
        self.i += 1
        if decl in ("@prefix", "PREFIX"):
            kind, pname = self._next()
            if not pname.endswith(":"):
                raise TurtleParseError(f"Bad prefix declaration near {pname!r}")
            prefix = pname[:-1]
            kind, iri_tok = self._next()
            if kind != "iri":
                raise TurtleParseError("Expected IRI in prefix declaration")
            iri_value = _unescape(iri_tok[1:-1])
            if self.base is not None and not re.match(r"^[A-Za-z][A-Za-z0-9+.\-]*:", iri_value):
                iri_value = resolve_uri(self.base, iri_value)
            self.prefixes[prefix] = iri_value
        else:  # @base / BASE
            kind, iri_tok = self._next()
            if kind != "iri":
                raise TurtleParseError("Expected IRI in base declaration")
            value = _unescape(iri_tok[1:-1])
            self.base = resolve_uri(self.base, value) if self.base else value
        if decl.startswith("@"):
            self._expect_punct(".")

    def _parse_statement(self):
        subject = self._parse_subject()
        self._parse_predicate_object_list(subject)
        self._expect_punct(".")

    def _fresh_bnode(self):
        self._bnode_counter += 1
        return ("b", f"genid{self._bnode_counter}")

    def _parse_subject(self):
        kind, value = self._peek()
        if kind == "iri" or kind == "pname":
            return self._parse_iri_like()
        if kind == "bnode":
            self._next()
            return ("b", value[2:])
        if kind == "punct" and value == "[":
            return self._parse_bnode_property_list()
        if kind == "punct" and value == "(":
            return self._parse_collection()
        raise TurtleParseError(f"Bad subject token: {value!r}")

    def _parse_iri_like(self):
        kind, value = self._next()
        if kind == "iri":
            iri_value = _unescape(value[1:-1])
            if self.base is not None and not re.match(r"^[A-Za-z][A-Za-z0-9+.\-]*:", iri_value):
                iri_value = resolve_uri(self.base, iri_value)
            return ("i", iri_value)
        # pname
        if value == "a":
            return ("i", RDF_NS + "type")
        # a trailing '.' on a prefixed name belongs to the statement
        # terminator (locals ending in '.' are invalid Turtle anyway)
        if value.endswith("."):
            value = value.rstrip(".")
            self.tokens.insert(self.i, ("punct", "."))
        prefix, _, local = value.partition(":")
        if prefix not in self.prefixes:
            raise TurtleParseError(f"Undefined prefix {prefix!r} in {value!r}")
        local = re.sub(r"\\(.)", r"\1", local)
        return ("i", self.prefixes[prefix] + local)

    def _parse_predicate_object_list(self, subject):
        while True:
            kind, value = self._peek()
            if kind == "punct" and value in (".", "]"):
                return
            predicate = self._parse_iri_like()
            if predicate[0] != "i":
                raise TurtleParseError("Predicate must be an IRI")
            self._parse_object_list(subject, predicate[1])
            kind, value = self._peek()
            if kind == "punct" and value == ";":
                self._next()
                continue
            return

    def _parse_object_list(self, subject, predicate: str):
        while True:
            obj = self._parse_object()
            self.triples.append((subject, predicate, obj))
            kind, value = self._peek()
            if kind == "punct" and value == ",":
                self._next()
                continue
            return

    def _parse_object(self):
        kind, value = self._peek()
        if kind in ("iri", "pname"):
            return self._parse_iri_like()
        if kind == "bnode":
            self._next()
            return ("b", value[2:])
        if kind == "punct" and value == "[":
            return self._parse_bnode_property_list()
        if kind == "punct" and value == "(":
            return self._parse_collection()
        if kind in ("string", "triple_quote"):
            return self._parse_literal()
        if kind == "integer":
            self._next()
            return ("l", value, XSD_NS + "integer", None)
        if kind == "decimal":
            self._next()
            return ("l", value, XSD_NS + "decimal", None)
        if kind == "double":
            self._next()
            return ("l", value, XSD_NS + "double", None)
        if kind == "kw":
            self._next()
            return ("l", value, XSD_NS + "boolean", None)
        raise TurtleParseError(f"Bad object token: {value!r}")

    def _parse_literal(self):
        kind, value = self._next()
        if kind == "triple_quote":
            text = _unescape(value[3:-3])
        else:
            text = _unescape(value[1:-1])
        kind, nxt = self._peek()
        if kind == "langtag":
            self._next()
            return ("l", text, None, nxt[1:])
        if kind == "punct" and nxt == "^^":
            self._next()
            dt = self._parse_iri_like()
            return ("l", text, dt[1], None)
        return ("l", text, None, None)

    def _parse_bnode_property_list(self):
        self._expect_punct("[")
        node = self._fresh_bnode()
        kind, value = self._peek()
        if not (kind == "punct" and value == "]"):
            self._parse_predicate_object_list(node)
        self._expect_punct("]")
        return node

    def _parse_collection(self):
        self._expect_punct("(")
        items = []
        while True:
            kind, value = self._peek()
            if kind == "punct" and value == ")":
                self._next()
                break
            items.append(self._parse_object())
        if not items:
            return ("i", RDF_NS + "nil")
        head = None
        prev = None
        for item in items:
            node = self._fresh_bnode()
            if head is None:
                head = node
            if prev is not None:
                self.triples.append((prev, RDF_NS + "rest", node))
            self.triples.append((node, RDF_NS + "first", item))
            prev = node
        self.triples.append((prev, RDF_NS + "rest", ("i", RDF_NS + "nil")))
        return head


def parse_turtle(text: str, base: str | None = None) -> list:
    """Parse Turtle text → list of (subject, predicate_iri, object) triples."""
    return TurtleParser(base=base).parse(text.lstrip("﻿"))
