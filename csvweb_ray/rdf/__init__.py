"""Minimal RDF toolkit: term model, Turtle parsing, N-Triples rendering,
bnode-isomorphism comparison. No third-party RDF library required."""

from .terms import IRI, BNODE, LITERAL, Triple, make_literal  # noqa: F401
