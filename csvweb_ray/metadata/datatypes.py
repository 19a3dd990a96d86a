"""CSVW datatype-annotation registry.

Mirrors the ~45 id→IRI mappings registered by the reference
(``/root/reference/src/DataDock.CsvWeb/Metadata/DatatypeAnnotation.cs:48-109``),
including the alias entries (``number``→xsd:double, ``binary``→base64Binary,
``datetime``→xsd:dateTime, ``any``→anyAtomicType, ``xml``→rdf:XMLLiteral,
``html``→rdf:HTML, ``json``→csvw:JSON).  The registration function is the
user-extension surface (``DatatypeAnnotation.cs:111-118``).
"""

from __future__ import annotations

XSD = "http://www.w3.org/2001/XMLSchema#"
RDF = "http://www.w3.org/1999/02/22-rdf-syntax-ns#"
CSVW = "http://www.w3.org/ns/csvw#"

RDF_TYPE = RDF + "type"
XSD_STRING = XSD + "string"
XSD_INTEGER = XSD + "integer"
XSD_BOOLEAN = XSD + "boolean"
XSD_DOUBLE = XSD + "double"
XSD_DATE = XSD + "date"
XSD_DATETIME = XSD + "dateTime"

_ANNOTATIONS: dict[str, str] = {}


def register_annotation(annotation_id: str, datatype_iri: str) -> None:
    """Register (or override) a datatype annotation id → IRI mapping."""
    _ANNOTATIONS[annotation_id] = datatype_iri


def get_annotation_iri(annotation_id: str | None) -> str | None:
    """IRI for a datatype annotation id, or None when unknown."""
    if annotation_id is None:
        return None
    return _ANNOTATIONS.get(annotation_id)


def is_valid_base(annotation_id: str) -> bool:
    return annotation_id in _ANNOTATIONS


for _id, _iri in [
    ("number", XSD + "double"),
    ("binary", XSD + "base64Binary"),
    ("datetime", XSD + "dateTime"),
    ("any", XSD + "anyAtomicType"),
    ("anyAtomicType", XSD + "anyAtomicType"),
    ("anyURI", XSD + "anyURI"),
    ("base64Binary", XSD + "base64Binary"),
    ("boolean", XSD + "boolean"),
    ("date", XSD + "date"),
    ("dateTime", XSD + "dateTime"),
    ("dateTimeStamp", XSD + "dateTimeStamp"),
    ("decimal", XSD + "decimal"),
    ("integer", XSD + "integer"),
    ("long", XSD + "long"),
    ("int", XSD + "int"),
    ("short", XSD + "short"),
    ("byte", XSD + "byte"),
    ("nonNegativeInteger", XSD + "nonNegativeInteger"),
    ("positiveInteger", XSD + "positiveInteger"),
    ("unsignedLong", XSD + "unsignedLong"),
    ("unsignedInt", XSD + "unsignedInt"),
    ("unsignedShort", XSD + "unsignedShort"),
    ("unsignedByte", XSD + "unsignedByte"),
    ("nonPositiveInteger", XSD + "nonPositiveInteger"),
    ("negativeInteger", XSD + "negativeInteger"),
    ("double", XSD + "double"),
    ("duration", XSD + "duration"),
    ("dayTimeDuration", XSD + "dayTimeDuration"),
    ("yearMonthDuration", XSD + "yearMonthDuration"),
    ("float", XSD + "float"),
    ("gDay", XSD + "gDay"),
    ("gMonth", XSD + "gMonth"),
    ("gMonthDay", XSD + "gMonthDay"),
    ("gYear", XSD + "gYear"),
    ("gYearMonth", XSD + "gYearMonth"),
    ("hexBinary", XSD + "hexBinary"),
    ("QName", XSD + "QName"),
    ("string", XSD + "string"),
    ("langString", RDF + "langString"),
    ("normalizedString", XSD + "normalizedString"),
    ("token", XSD + "token"),
    ("language", XSD + "language"),
    ("Name", XSD + "Name"),
    ("NMTOKEN", XSD + "NMTOKEN"),
    ("xml", RDF + "XMLLiteral"),
    ("html", RDF + "HTML"),
    ("json", CSVW + "JSON"),
    ("time", XSD + "time"),
]:
    register_annotation(_id, _iri)


# Datatype classes used by the cell parser's whitespace rules
# (reference ``Rdf/CellParser.cs:36-51``).
RETAINS_LINE_ENDINGS = frozenset({"string", "json", "html", "anyAtomicType"})
RETAINS_LEADING_TRAILING_WS = frozenset(
    {"string", "json", "html", "anyAtomicType", "normalizedString"}
)
RETAINS_WS_IN_LIST = frozenset({"string", "anyAtomicType"})
