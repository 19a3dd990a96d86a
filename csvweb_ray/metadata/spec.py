"""CSVW metadata property classification + the embedded csvw context.

Property classes follow the CSVW metadata spec as enumerated by the
reference (``Parsing/MetadataSpecHelper.cs:10-75``).  The prefix map comes
from the public W3C CSVW JSON-LD context document (shipped verbatim in
``resources/csvw.jsonld``).
"""

from __future__ import annotations

import json
from functools import lru_cache
from pathlib import Path

ARRAY_PROPERTIES = frozenset(
    {"tables", "transformations", "notes", "@context", "foreignKeys", "columns", "lineTerminators"}
)
LINK_PROPERTIES = frozenset(
    {"url", "targetFormat", "scriptFormat", "@id", "resource", "schemaReference"}
)
URI_TEMPLATE_PROPERTIES = frozenset({"aboutUrl", "propertyUrl", "valueUrl"})
COLUMN_REFERENCE_PROPERTIES = frozenset({"columnReference", "primaryKey", "rowTitles"})
OBJECT_PROPERTIES = frozenset({"reference", "tableSchema", "dialect"})
NATURAL_LANGUAGE_PROPERTIES = frozenset({"titles"})
ATOMIC_PROPERTIES = frozenset(
    {
        "source", "@type", "null", "lang", "textDirection", "separator", "ordered",
        "default", "datatype", "required",
        "base", "format", "length", "minLength", "maxLength", "minimum", "maximum",
        "minInclusive", "maxInclusive", "minExclusive", "maxExclusive",
        "decimalChar", "groupChar", "pattern",
        "tableDirection", "suppressOutput",
        "@language", "@base",
        "commentPrefix", "doubleQuote", "delimiter", "encoding", "header",
        "headerRowCount", "quoteChar", "skipBlankRows", "skipColumns",
        "skipInitialSpace", "skipRows", "trim",
        "names", "virtual",
    }
)

CSVW_METADATA_CONTEXT = "http://www.w3.org/ns/csvw"


def is_common_property(name: str) -> bool:
    """A common property name is prefixed (``dc:title``) but not a URL
    (reference ``MetadataSpecHelper.cs:71-74``)."""
    return ":" in name and "://" not in name


@lru_cache(maxsize=1)
def csvw_context() -> dict:
    """The ``@context`` object of the public W3C csvw.jsonld document."""
    path = Path(__file__).resolve().parent.parent / "resources" / "csvw.jsonld"
    with open(path, "r", encoding="utf-8") as fh:
        return json.load(fh)["@context"]


@lru_cache(maxsize=1)
def csvw_prefix_map() -> dict[str, str]:
    """String-valued context entries only (prefix → IRI), which is all the
    reference consults for prefix expansion (``MetadataNormalizer.cs:295-309``)."""
    return {k: v for k, v in csvw_context().items() if isinstance(v, str)}


def resolve_prefixed_id(identifier: str) -> str:
    """Expand ``prefix:suffix`` via the csvw context; leave ``_:`` blank-node
    labels and ``scheme://`` URLs alone (reference ``MetadataNormalizer.cs:295-309``)."""
    if ":" in identifier:
        prefix, suffix = identifier.split(":", 1)
        if prefix != "_" and not suffix.startswith("//"):
            mapped = csvw_prefix_map().get(prefix)
            if mapped is not None:
                return mapped + suffix
    return identifier


def expand_url(value: str) -> str:
    """Term/prefix expansion used during RDF emission
    (reference ``Rdf/Converter.cs:775-799``). Raises ``ValueError`` when the
    value cannot be expanded to an absolute URL."""
    ctx = csvw_prefix_map()
    term = ctx.get(value)
    if term is not None:
        # context terms may themselves be prefixed (e.g. "Table" →
        # "csvw:Table"); expand once more (W3C test263)
        if ":" in term and "://" not in term:
            prefix, suffix = term.split(":", 1)
            mapped = ctx.get(prefix)
            if mapped is not None:
                return mapped + suffix
        return term
    if ":" in value:
        prefix, suffix = value.split(":", 1)
        if suffix.startswith("//"):
            return value
        mapped = ctx.get(prefix)
        if mapped is not None:
            return mapped + suffix
    raise ValueError(f"Unable to expand URL value: {value}")
