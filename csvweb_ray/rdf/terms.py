"""RDF term / triple representation.

Nodes are plain tuples for cheap hashing and pickling across Ray tasks:

- ``("i", iri)`` — IRI node
- ``("b", label)`` — blank node
- ``("l", lexical, datatype_iri_or_None, lang_or_None)`` — literal

A triple is ``(subject, predicate_iri, object)`` where subject is an IRI or
bnode tuple and predicate is a bare IRI string.
"""

from __future__ import annotations

IRI = "i"
BNODE = "b"
LITERAL = "l"

XSD_STRING = "http://www.w3.org/2001/XMLSchema#string"


def iri(value: str):
    return (IRI, value)


def bnode(label: str):
    return (BNODE, label)


def make_literal(value: str, datatype: str | None = None, lang: str | None = None):
    return (LITERAL, value, datatype, lang)


class Triple(tuple):
    """(subject, predicate, object) with null checks, mirroring dotNetRDF's
    ``Triple`` constructor which throws on null nodes — the reference relies
    on that throw to surface template-binding failures as conversion errors
    (``Rdf/Converter.cs:456-461``)."""

    def __new__(cls, s, p, o):
        if s is None or p is None or o is None:
            raise ValueError("Triple nodes must not be null")
        return super().__new__(cls, (s, p, o))


def literal_key(node):
    """Canonical form for comparison: plain literals ≡ xsd:string literals
    (the suite harness applies the same normalization,
    ``Tests/CsvwTestCasesSpec.cs:171-190``)."""
    if node[0] == LITERAL:
        _, value, datatype, lang = node
        if lang:
            return (LITERAL, value, None, lang.lower())
        return (LITERAL, value, datatype or XSD_STRING, None)
    return node
