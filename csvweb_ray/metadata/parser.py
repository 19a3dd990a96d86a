"""CSVW metadata parsing: normalized JSON → compiled plans.

Mirrors ``Parsing/JsonMetadataParser.cs:54-751`` but resolves the
inherited-property chain eagerly (see ``model.py``).  One deliberate
improvement over the reference: the context ``@language`` resolved by the
normalizer is used for the titles→name fallback (the reference's parser
never sees it, so language-tagged titles fall through to ``_col.N``; the
W3C expected outputs assume the title is used).
"""

from __future__ import annotations

import codecs
from typing import Optional

from ..uritemplate import UriTemplate
from ..urifns import resolve_uri, is_absolute_uri
from . import formats as fmt
from .datatypes import is_valid_base
from .langtag import is_valid_language_tag
from .model import (
    ColumnPlan,
    CompiledTable,
    CompiledTableGroup,
    DatatypeSpec,
    Dialect,
    Inherited,
    MetadataParseError,
    ParserWarning,
    ValueConstraint,
)
from .normalizer import MetadataNormalizer, lenient_json_loads
from .spec import is_common_property


def parse_metadata(text: str, base_uri: str, resolver=None,
                   default_language: Optional[str] = None,
                   encode_templates: bool = False) -> CompiledTableGroup:
    """Parse a CSVW metadata JSON document into a compiled table group.

    ``resolver`` resolves ``tableSchema: "<url>"`` style object references
    (absolute URI → parsed JSON dict).  ``encode_templates`` selects RFC 6570
    percent-encoding in URI templates (spec mode) vs the reference's raw
    substitution (see ``uritemplate.py``).
    """
    root = lenient_json_loads(text)
    if not isinstance(root, dict):
        raise MetadataParseError("Expected root of JSON document to be an object.")
    normalizer = MetadataNormalizer(base_uri, default_language, resolver)
    root = normalizer.normalize(root)
    parser = _Parser(base_uri, normalizer.resolved_default_language, encode_templates)
    group = parser.parse_root(root)
    group.warnings = list(normalizer.warnings) + parser.warnings
    return group


class _Parser:
    def __init__(self, base_uri: str, default_language: Optional[str],
                 encode_templates: bool):
        self.base_uri = base_uri
        self.default_language = default_language
        self.encode = encode_templates
        self.warnings: list[ParserWarning] = []

    # -- helpers -----------------------------------------------------------

    def warn(self, path: str, msg: str) -> None:
        self.warnings.append(ParserWarning(path, msg))

    def _resolve_link(self, link: str) -> str:
        if self.base_uri is None:
            if not is_absolute_uri(link):
                raise MetadataParseError(
                    f"The value '{link}' could not be parsed as an absolute IRI "
                    "and no base IRI is available for resolving relative links.")
            return link
        try:
            return resolve_uri(self.base_uri, link)
        except ValueError:
            raise MetadataParseError(
                f"The value '{link}' could not be parsed as either an absolute "
                "or relative IRI.") from None

    def _parse_link_property(self, value, property_name: str) -> str:
        if not isinstance(value, str):
            self.warn(property_name, f"Value of property '{property_name}' must be a string")
            return self._resolve_link("")
        return self._resolve_link(value)

    def _string_prop(self, root: dict, name: str, default, allow_null=False):
        if name in root:
            value = root[name]
            if isinstance(value, str):
                return value
            if allow_null and value is None:
                return None
            self.warn(name, "Value must be a string" + (" or null" if allow_null else ""))
        return default

    def _bool_prop(self, root: dict, name: str, default: bool) -> bool:
        if name in root:
            value = root[name]
            if isinstance(value, bool):
                return value
            self.warn(name, "Value must be a boolean")
        return default

    def _nonneg_int_prop(self, root: dict, name: str, default: int) -> int:
        if name in root:
            value = root[name]
            if isinstance(value, int) and not isinstance(value, bool):
                if value >= 0:
                    return value
                self.warn(name, f"Expected value to be a non-negative integer. Found {value}.")
                return default
            self.warn(name, "Value must be an integer")
        return default

    def _string_array_prop(self, root: dict, name: str, default: tuple) -> tuple:
        if name not in root:
            return default
        value = root[name]
        if isinstance(value, list):
            return tuple(v for v in value if isinstance(v, str))
        if isinstance(value, str):
            return (value,)
        self.warn(name, "Value must be an array of strings or a string")
        return default

    # -- root --------------------------------------------------------------

    def parse_root(self, root: dict) -> CompiledTableGroup:
        if "tables" in root:
            return self.parse_table_group(root)
        if "url" in root:
            group = CompiledTableGroup()
            group_inherited = Inherited()
            group_dialect = Dialect()
            table = self.parse_table(root, group_inherited, group_dialect)
            group.tables.append(table)
            return group
        raise MetadataParseError("Unrecognized root object type")

    def parse_table_group(self, root: dict) -> CompiledTableGroup:
        tables = root.get("tables")
        if not isinstance(tables, list):
            raise MetadataParseError("The value of the 'tables' property must be an array")
        group = CompiledTableGroup()
        if "dialect" in root:
            if not isinstance(root["dialect"], dict):
                raise MetadataParseError("The value of the 'dialect' property must be a JSON object")
            group_dialect = self.parse_dialect(root["dialect"])
        else:
            group_dialect = Dialect()
        if "@id" in root:
            group.id = self._parse_link_property(root["@id"], "@id")
        group_inherited = self.parse_inherited(root)
        for item in tables:
            if not isinstance(item, dict):
                raise MetadataParseError("Items in the 'tables' array must be objects")
            group.tables.append(self.parse_table(item, group_inherited, group_dialect))
        group.common_properties = self._collect_common_properties(root)
        group.notes = self._parse_notes(root)
        return group

    def parse_table(self, root: dict, group_inherited: Inherited,
                    group_dialect: Dialect) -> CompiledTable:
        if "url" not in root:
            raise MetadataParseError("Did not find required 'url' property on table object")
        url = self._parse_link_property(root["url"], "url")
        table = CompiledTable(url=url)
        if "@id" in root:
            table.id = self._parse_link_property(root["@id"], "@id")
        if "dialect" in root:
            if not isinstance(root["dialect"], dict):
                raise MetadataParseError("The value of the 'dialect' property must be a JSON object")
            table.dialect = self.parse_dialect(root["dialect"])
        else:
            table.dialect = group_dialect
        table.suppress_output = self._parse_suppress_output(root)
        table_inherited = self.parse_inherited(root).overlay(group_inherited)
        if "tableSchema" in root:
            schema = root["tableSchema"]
            if not isinstance(schema, dict):
                raise MetadataParseError("The value of the 'tableSchema' property must be a JSON object")
            self._parse_table_schema(table, schema, table_inherited)
        else:
            table.columns_declared = False
            table.schema_inherited = table_inherited
        table.common_properties = self._collect_common_properties(root)
        table.notes = self._parse_notes(root)
        return table

    def _parse_table_schema(self, table: CompiledTable, root: dict,
                            table_inherited: Inherited) -> None:
        schema_inherited = self.parse_inherited(root).overlay(table_inherited)
        table.schema_inherited = schema_inherited
        if "columns" in root:
            cols = root["columns"]
            if not isinstance(cols, list):
                raise MetadataParseError("The value of the 'columns' property must be a JSON array")
            table.columns_declared = True
            for i, item in enumerate(cols):
                if not isinstance(item, dict):
                    raise MetadataParseError("The items in the 'columns' array must be JSON objects")
                table.columns.append(self.parse_column(item, i + 1, schema_inherited))
        else:
            table.columns_declared = False

    def parse_column(self, root: dict, column_number: int,
                     schema_inherited: Inherited) -> ColumnPlan:
        name = None
        if "name" in root:
            if not isinstance(root["name"], str):
                raise MetadataParseError("The value of the 'name' property must be a string")
            name = root["name"]
            if name.startswith("_"):
                raise MetadataParseError(
                    f"Column name {name} is not valid. Column names must not "
                    "start with an _ character.")
        titles: list[tuple[str, str]] = []
        if "titles" in root:
            titles = self._parse_natural_language(root["titles"])
        virtual = False
        if "virtual" in root:
            if not isinstance(root["virtual"], bool):
                raise MetadataParseError("The value of the 'virtual' property must be a boolean")
            virtual = root["virtual"]
        if name is None and titles:
            for want in (self.default_language, "und"):
                if want is None:
                    continue
                for tag, value in titles:
                    if tag == want:
                        name = value
                        break
                if name is not None:
                    break
            if name is None:
                # spec-order fallback: first title in any language
                name = titles[0][1]
        if name is None:
            name = f"_col.{column_number}"
        suppress = self._parse_suppress_output(root)
        inh = self.parse_inherited(root).overlay(schema_inherited)
        if "default" in root and not isinstance(root["default"], str):
            raise MetadataParseError("The value of the 'default' property must be a string")
        return ColumnPlan.from_inherited(
            name, inh, titles=titles, suppress_output=suppress, virtual=virtual)

    def _parse_suppress_output(self, root: dict) -> bool:
        if "suppressOutput" in root:
            value = root["suppressOutput"]
            if not isinstance(value, bool):
                raise MetadataParseError(
                    "The value of the 'suppressOutput' property must be a boolean")
            return value
        return False

    def _parse_natural_language(self, tok) -> list:
        ret: list[tuple[str, str]] = []
        if isinstance(tok, str):
            ret.append((self.default_language or "und", tok))
        elif isinstance(tok, dict):
            for tag, value in tok.items():
                if isinstance(value, list):
                    for v in value:
                        ret.append((tag, str(v)))
                else:
                    ret.append((tag, str(value)))
        elif isinstance(tok, list):
            for item in tok:
                ret.extend(self._parse_natural_language(item))
        return ret

    # -- dialect -----------------------------------------------------------

    def parse_dialect(self, root: dict) -> Dialect:
        dialect = Dialect(
            comment_prefix=self._string_prop(root, "commentPrefix", "#"),
            delimiter=self._string_prop(root, "delimiter", ","),
            double_quote=self._bool_prop(root, "doubleQuote", True),
            encoding=self._string_prop(root, "encoding", "utf-8"),
            header=self._bool_prop(root, "header", True),
            line_terminators=self._string_array_prop(root, "lineTerminators", ("\r\n", "\n")),
            quote_char=self._string_prop(root, "quoteChar", '"', allow_null=True),
            skip_blank_rows=self._bool_prop(root, "skipBlankRows", False),
            skip_columns=self._nonneg_int_prop(root, "skipColumns", 0),
            skip_initial_space=self._bool_prop(root, "skipInitialSpace", False),
            skip_rows=self._nonneg_int_prop(root, "skipRows", 0),
        )
        dialect.header_row_count = self._nonneg_int_prop(
            root, "headerRowCount", 1 if dialect.header else 0)
        if "trim" in root:
            value = root["trim"]
            if isinstance(value, bool):
                dialect.trim = "true" if value else "false"
            elif isinstance(value, str):
                if value in ("true", "false", "start", "end"):
                    dialect.trim = value
                else:
                    self.warn("trim",
                              "Expected value to be one of 'true', 'false', "
                              f"'start', or 'end'. Found {value}. Using default value 'true'")
                    dialect.trim = "true"
        else:
            dialect.trim = "start" if dialect.skip_initial_space else "false"
        try:
            codecs.lookup(dialect.encoding)
        except LookupError:
            self.warn("encoding",
                      f"{dialect.encoding} is not a recognized text encoding. "
                      "Using default value 'utf-8'")
            dialect.encoding = "utf-8"
        return dialect

    # -- inherited properties ----------------------------------------------

    def parse_inherited(self, root: dict) -> Inherited:
        inh = Inherited()
        if "datatype" in root:
            value = root["datatype"]
            if isinstance(value, str):
                # pre-normalization shorthand (normalizer turns this into
                # {"base": ...}; kept for direct-parse robustness)
                if is_valid_base(value):
                    inh.datatype = DatatypeSpec(base=value)
                else:
                    self.warn("datatype", f"Unsupported base datatype '{value}'")
            elif isinstance(value, dict):
                inh.datatype = self.parse_datatype(value)
            else:
                raise MetadataParseError(
                    "The value of the 'datatype' property must be a string or a JSON object")
        if "lang" in root:
            value = root["lang"]
            if isinstance(value, str):
                if is_valid_language_tag(value):
                    inh.lang = value
                else:
                    self.warn("lang", f"The value '{value}' is not a valid BCP-47 language tag.")
            else:
                self.warn("lang", "The value of the 'lang' property must be a string")
        for prop, attr in (("aboutUrl", "about_url"), ("propertyUrl", "property_url"),
                           ("valueUrl", "value_url")):
            if prop in root:
                value = root[prop]
                if not isinstance(value, str):
                    raise MetadataParseError(
                        f"The value of the '{prop}' property must be a string")
                setattr(inh, attr, UriTemplate(value, encode=self.encode))
        if "null" in root:
            value = root["null"]
            if isinstance(value, list):
                inh.null = tuple(str(v) if v is not None else "" for v in value)
            elif isinstance(value, str):
                inh.null = (value,)
            elif value is not None:
                inh.null = (str(value),)
        if "separator" in root:
            value = root["separator"]
            if isinstance(value, str) or value is None:
                inh.separator = value
            else:
                raise MetadataParseError("The value of the 'separator' property must be a string")
        if "required" in root:
            value = root["required"]
            if isinstance(value, bool):
                inh.required = value
            else:
                self.warn("required", "The value of the 'required' property must be a boolean")
        if "ordered" in root:
            if isinstance(root["ordered"], bool):
                inh.ordered = root["ordered"]
        if "textDirection" in root:
            if isinstance(root["textDirection"], str):
                inh.text_direction = root["textDirection"]
        if "default" in root:
            value = root["default"]
            if isinstance(value, str):
                inh.default = value
            else:
                raise MetadataParseError("The value of the 'default' property must be a string")
        return inh

    # -- datatype ----------------------------------------------------------

    def parse_datatype(self, root: dict) -> DatatypeSpec:
        dt = DatatypeSpec()
        if "base" in root:
            value = root["base"]
            if not isinstance(value, str):
                raise MetadataParseError("The value of the 'base' property must be a string")
            if is_valid_base(value):
                dt.base = value
            else:
                self.warn("base", f"Unsupported base datatype '{value}'")
                dt.base = "string"
        else:
            dt.base = "string"
        if "@id" in root and isinstance(root["@id"], str):
            dt.id = root["@id"]
        if "format" in root:
            value = root["format"]
            try:
                if dt.base == "boolean":
                    dt.format = fmt.BooleanFormat(_as_format_string(value))
                elif dt.base == "date":
                    dt.format = fmt.DateFormat(_as_format_string(value))
                elif dt.base == "time":
                    dt.format = fmt.TimeFormat(_as_format_string(value))
                elif dt.base in ("datetime", "dateTime", "dateTimeStamp"):
                    dt.format = fmt.DateTimeFormat(_as_format_string(value))
                elif dt.base in ("number", "decimal", "double", "float"):
                    if isinstance(value, dict):
                        dt.format = fmt.NumericFormat(
                            value.get("decimalChar", ".")[:1] or ".",
                            (value.get("groupChar", ",")[:1] or ","),
                            value.get("pattern"))
                    else:
                        dt.format = fmt.NumericFormat(pattern=_as_format_string(value))
                else:
                    # The reference raises NotImplementedException here
                    # (``JsonMetadataParser.cs:647``); per the CSVW spec a
                    # format on other datatypes is a validation regex — record
                    # a warning and ignore (validation is permissive anyway).
                    self.warn("format",
                              f"Format annotations on datatype '{dt.base}' are ignored")
            except fmt.MetadataFormatError as ex:
                raise MetadataParseError(str(ex)) from None
        constraints = []
        for key, kind in (("minimum", "min"), ("minInclusive", "min"),
                          ("minExclusive", "minExclusive"), ("maximum", "max"),
                          ("maxInclusive", "max"), ("maxExclusive", "maxExclusive")):
            if key in root:
                value = root[key]
                if isinstance(value, (int, float)) and not isinstance(value, bool):
                    constraints.append(ValueConstraint(kind=kind, threshold=float(value)))
                else:
                    self.warn(key, "Only numeric minimum and maximum constraints are supported")
        dt.constraints = tuple(constraints)
        return dt

    # -- common properties / notes -----------------------------------------

    def _collect_common_properties(self, root: dict) -> dict:
        return {k: v for k, v in root.items() if is_common_property(k)}

    def _parse_notes(self, root: dict):
        if "notes" in root:
            value = root["notes"]
            if not isinstance(value, list):
                raise MetadataParseError("The value of the 'notes' property must be a JSON array")
            return value
        return None


def _as_format_string(value) -> str:
    if isinstance(value, str):
        return value
    raise MetadataParseError("Expected format to be a string")
