"""CSVW metadata normalization (the pre-pass over raw metadata JSON).

Mirrors ``Parsing/MetadataNormalizer.cs:34-309``: pull ``@context``
(``@base`` / ``@language``), then normalize every property according to its
property class (common / array / link / object / natural-language / atomic /
URI-template), re-attaching the canonical csvw context string at the end.

Pure Python over plain dicts/lists — runs inside the metadata-compile
``map_batches`` stage with no Ray state.
"""

from __future__ import annotations

import json
import re
from typing import Callable, Optional

from ..urifns import resolve_uri
from .langtag import is_valid_language_tag
from .model import MetadataParseError, ParserWarning
from .spec import (
    ARRAY_PROPERTIES,
    ATOMIC_PROPERTIES,
    CSVW_METADATA_CONTEXT,
    LINK_PROPERTIES,
    NATURAL_LANGUAGE_PROPERTIES,
    OBJECT_PROPERTIES,
    URI_TEMPLATE_PROPERTIES,
    is_common_property,
    resolve_prefixed_id,
)

# json resolver: absolute URI -> parsed JSON object (or raise KeyError/None)
JsonResolver = Callable[[str], Optional[dict]]

_TRAILING_COMMA_RE = re.compile(r",(\s*[}\]])")


def lenient_json_loads(text: str):
    """Parse JSON, tolerating byte-order marks and trailing commas (the
    reference uses Newtonsoft.Json which accepts both; fixture
    ``Tests/data/dateTime.json`` has trailing commas)."""
    text = text.lstrip("﻿")
    try:
        return json.loads(text)
    except json.JSONDecodeError:
        # Remove trailing commas outside of string literals.
        out = []
        in_str = False
        escape = False
        for i, ch in enumerate(text):
            if in_str:
                out.append(ch)
                if escape:
                    escape = False
                elif ch == "\\":
                    escape = True
                elif ch == '"':
                    in_str = False
                continue
            if ch == '"':
                in_str = True
                out.append(ch)
                continue
            if ch == ",":
                j = i + 1
                while j < len(text) and text[j] in " \t\r\n":
                    j += 1
                if j < len(text) and text[j] in "}]":
                    continue  # drop the trailing comma
            out.append(ch)
        return json.loads("".join(out))


class NormalizationContext:
    __slots__ = ("base_uri", "default_language")

    def __init__(self, base_uri: str, default_language: Optional[str] = None):
        self.base_uri = base_uri
        self.default_language = default_language


class MetadataNormalizer:
    """Reference ``Parsing/MetadataNormalizer.cs``."""

    def __init__(self, base_uri: str, default_language: Optional[str] = None,
                 resolver: Optional[JsonResolver] = None):
        if base_uri is None:
            raise ValueError("base_uri is required")
        self.base_uri = base_uri
        self.default_language = default_language
        self.resolver = resolver
        self.warnings: list[ParserWarning] = []

    # -- public ------------------------------------------------------------

    def normalize(self, obj: dict) -> dict:
        context = NormalizationContext(self.base_uri, self.default_language)
        if "@context" in obj:
            context = self._process_context(obj["@context"])
            del obj["@context"]
        self._normalize_object(obj, context, None)
        obj["@context"] = CSVW_METADATA_CONTEXT
        # expose the resolved default language for the parser's title→name
        # fallback (the reference loses it; see parser docstring)
        self._resolved_default_language = context.default_language
        return obj

    @property
    def resolved_default_language(self) -> Optional[str]:
        return getattr(self, "_resolved_default_language", self.default_language)

    # -- internals ---------------------------------------------------------

    def _ensure_type(self, o: dict, ensure_value: str) -> None:
        if "@type" in o:
            if o["@type"] != ensure_value:
                raise MetadataParseError(
                    f"Expected @type property to be set to '{ensure_value}', "
                    f"but found '{o['@type']}'"
                )
        else:
            o["@type"] = ensure_value

    def _normalize_object(self, o: dict, context: NormalizationContext,
                          parent_property: Optional[str]) -> None:
        if "tables" in o:
            self._ensure_type(o, "TableGroup")
        if parent_property == "tables" or (parent_property is None and "url" in o):
            self._ensure_type(o, "Table")
        if parent_property == "tableSchema":
            self._ensure_type(o, "Schema")
        if parent_property == "columns":
            self._ensure_type(o, "Column")
        if parent_property == "dialect":
            self._ensure_type(o, "Dialect")
        if parent_property == "transformations":
            self._ensure_type(o, "Template")

        for name in list(o.keys()):
            value = o[name]
            if is_common_property(name) or name == "notes":
                o[name] = self._normalize_common_property_value(value, context)
            elif name in ARRAY_PROPERTIES:
                if not isinstance(value, list):
                    # spec: warn and proceed as if supplied with an empty
                    # array (W3C test100); the reference drops the property
                    # entirely (``MetadataNormalizer.cs:107-111``)
                    self.warnings.append(ParserWarning(
                        name,
                        "Expected property value to be an array. "
                        "The given property value will not be processed."))
                    o[name] = []
                else:
                    for item in value:
                        if isinstance(item, dict):
                            self._normalize_object(item, context, name)
            elif name in LINK_PROPERTIES:
                if name == "@id" and isinstance(value, str) and value.startswith("_:"):
                    raise MetadataParseError(
                        "An @id property may not start with the string '_:'")
                if isinstance(value, str):
                    o[name] = resolve_uri(context.base_uri, value)
            elif name in OBJECT_PROPERTIES:
                if isinstance(value, str):
                    o[name] = self._resolve_object_reference(value, context, name)
                elif isinstance(value, dict):
                    self._normalize_object(value, context, name)
                else:
                    # spec: warn + act as if it were an empty object
                    # (W3C test106/test107); the reference raises
                    # (``MetadataNormalizer.cs:146-150``)
                    self.warnings.append(ParserWarning(
                        name, f"Property {name} must be either a URI reference "
                        f"or an object. Found {type(value).__name__}"))
                    o[name] = {}
                    self._normalize_object(o[name], context, name)
            elif name in NATURAL_LANGUAGE_PROPERTIES:
                if isinstance(value, str):
                    o[name] = {context.default_language or "und": [value]}
                elif isinstance(value, list):
                    o[name] = {context.default_language or "und":
                               [v for v in value if isinstance(v, str)]}
                elif not isinstance(value, dict):
                    self.warnings.append(ParserWarning(
                        name, f"Property {name} must be either a string, an "
                        f"array of string or an object. Found {type(value).__name__}"))
                    del o[name]
            elif name in ATOMIC_PROPERTIES:
                if isinstance(value, str) and name == "datatype":
                    o[name] = {"base": value}
            elif name in URI_TEMPLATE_PROPERTIES:
                if not isinstance(value, str):
                    self.warnings.append(ParserWarning(
                        name, f"The value of the {name} property must be a string"))
                    value = ""
                o[name] = resolve_prefixed_id(value)

    def _resolve_object_reference(self, href: str, context: NormalizationContext,
                                  property_name: str) -> dict:
        uri = resolve_uri(context.base_uri, href)
        if self.resolver is None:
            raise MetadataParseError(
                f"Cannot resolve metadata object reference {href!r}: no resolver")
        obj = self.resolver(uri)
        if obj is None:
            raise MetadataParseError(
                f"Could not resolve metadata object reference {uri!r}")
        self._normalize_object(
            obj, NormalizationContext(uri, context.default_language), property_name)
        return obj

    def _process_context(self, context) -> NormalizationContext:
        if isinstance(context, list):
            for item in context:
                if isinstance(item, dict):
                    return self._process_context(item)
        if isinstance(context, dict):
            extra = [k for k in context if k not in ("@base", "@language")]
            if extra:
                raise MetadataParseError(
                    "A local @context object may only contain @base and "
                    f"@language; found {extra}")
            nc = NormalizationContext(self.base_uri)
            if "@base" in context:
                nc.base_uri = resolve_uri(self.base_uri, context["@base"])
            if "@language" in context:
                language = context["@language"]
                if isinstance(language, str) and is_valid_language_tag(language):
                    nc.default_language = language
                else:
                    self.warnings.append(ParserWarning(
                        "@language",
                        "The value of the '@language' property must be a valid "
                        "BCP-47 language tag."))
            return nc
        return NormalizationContext(self.base_uri, self.default_language)

    def _normalize_common_property_value(self, value, context: NormalizationContext):
        if isinstance(value, list):
            return [self._normalize_common_property_value(v, context) for v in value]
        if isinstance(value, str):
            ret = {"@value": value}
            if context.default_language:
                ret["@language"] = context.default_language
            return ret
        if isinstance(value, dict):
            if "@value" in value:
                # @value objects may carry @type XOR @language and nothing
                # else (W3C test142/test143)
                extra = [k for k in value if k not in ("@value", "@type", "@language")]
                if extra:
                    raise MetadataParseError(
                        f"A @value object may not contain properties {extra}")
                if "@type" in value and "@language" in value:
                    raise MetadataParseError(
                        "A @value object may not have both @type and @language")
                return value
            for name in list(value.keys()):
                if name == "@id":
                    vid = value[name]
                    if isinstance(vid, str) and vid.startswith("_:"):
                        raise MetadataParseError(
                            "An @id property must not start with '_:'")
                    value[name] = resolve_prefixed_id(vid)
                elif name == "@type":
                    pass
                elif name.startswith("@"):
                    # @list/@set/@language/@graph and faux-keywords are not
                    # allowed outside a @value object (W3C test135/136/144/146)
                    raise MetadataParseError(
                        f"Property {name} is not allowed in a common property "
                        "object without @value")
                else:
                    value[name] = self._normalize_common_property_value(value[name], context)
            return value
        return value
