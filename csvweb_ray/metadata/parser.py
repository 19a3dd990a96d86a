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
            if property_name == "url":
                # a table cannot be located without a usable url (W3C test103)
                raise MetadataParseError(
                    "Value of the 'url' property must be a string")
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
            group = self.parse_table_group(root)
        elif "url" in root:
            group = CompiledTableGroup()
            group_inherited = Inherited()
            group_dialect = Dialect()
            table = self.parse_table(root, group_inherited, group_dialect)
            group.tables.append(table)
        else:
            raise MetadataParseError("Unrecognized root object type")
        self._validate_foreign_keys(group)
        return group

    def _validate_foreign_keys(self, group: CompiledTableGroup) -> None:
        """Cross-table foreign-key checks (W3C test104/251/252/253): the
        referenced columns must exist *with explicit names*, and the
        referenced table must be part of the group."""
        by_url = {t.url: t for t in group.tables}

        def named(table):
            return {c.name for c in table.columns if c.name_explicit}

        def refs(value):
            return value if isinstance(value, list) else [value]

        for table in group.tables:
            for fk in table.foreign_keys:
                for col in refs(fk["columnReference"]):
                    if col not in named(table):
                        raise MetadataParseError(
                            f"Foreign key columnReference '{col}' does not "
                            "match a named column")
                ref = fk["reference"]
                if "resource" in ref:
                    target = by_url.get(ref["resource"])
                    if target is None:
                        raise MetadataParseError(
                            f"Foreign key resource '{ref['resource']}' does "
                            "not reference a table in the group")
                    for col in refs(ref["columnReference"]):
                        if col not in named(target):
                            raise MetadataParseError(
                                f"Foreign key reference columnReference "
                                f"'{col}' does not match a named column")

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
        # a present-but-empty schema object means "declared, no columns"
        # (→ _col.N fabrication), not header inference (W3C test100/test107)
        table.columns_declared = True
        if "columns" in root:
            cols = root["columns"]
            if not isinstance(cols, list):
                raise MetadataParseError("The value of the 'columns' property must be a JSON array")
            for i, item in enumerate(cols):
                if not isinstance(item, dict):
                    raise MetadataParseError("The items in the 'columns' array must be JSON objects")
                table.columns.append(self.parse_column(item, i + 1, schema_inherited))
            # duplicate explicit names are fatal (W3C test128)
            seen: dict = {}
            for col in table.columns:
                if col.name and not col.name.startswith("_col."):
                    if col.name in seen:
                        raise MetadataParseError(
                            f"Duplicate column name '{col.name}'")
                    seen[col.name] = col
            # virtual columns must come after all non-virtual ones (test133)
            saw_virtual = False
            for col in table.columns:
                if col.virtual:
                    saw_virtual = True
                elif saw_virtual:
                    raise MetadataParseError(
                        "Virtual columns must appear after all non-virtual columns")
        table.foreign_keys = self._parse_foreign_keys(root)
        table.primary_key = root.get("primaryKey")
        rt = root.get("rowTitles")
        if isinstance(rt, str):
            table.row_titles = [rt]
        elif isinstance(rt, list):
            table.row_titles = [r for r in rt if isinstance(r, str)]

    def _parse_foreign_keys(self, schema_root: dict) -> list:
        """Structural validation of ``foreignKeys`` (W3C test104/108/251-253/
        271/272); the reference ignores foreign keys entirely."""
        fks = schema_root.get("foreignKeys")
        if fks is None:
            return []
        if not isinstance(fks, list):
            raise MetadataParseError("The value of 'foreignKeys' must be an array")
        out = []
        for fk in fks:
            if not isinstance(fk, dict):
                # inconsistent entry types → warn + skip entry (W3C test097)
                self.warn("foreignKeys", "Each foreign key must be an object")
                continue
            extra = [k for k in fk if k not in ("columnReference", "reference")]
            if extra:
                raise MetadataParseError(
                    f"Foreign key contains invalid properties {extra}")
            if "columnReference" not in fk or "reference" not in fk:
                raise MetadataParseError(
                    "A foreign key requires columnReference and reference")
            ref = fk["reference"]
            if not isinstance(ref, dict):
                raise MetadataParseError("Foreign key reference must be an object")
            ref_extra = [k for k in ref
                         if k not in ("resource", "schemaReference", "columnReference")]
            if ref_extra:
                raise MetadataParseError(
                    f"Foreign key reference contains invalid properties {ref_extra}")
            if "columnReference" not in ref:
                raise MetadataParseError(
                    "A foreign key reference requires columnReference")
            if ("resource" in ref) == ("schemaReference" in ref):
                raise MetadataParseError(
                    "A foreign key reference requires exactly one of resource "
                    "or schemaReference")
            out.append(fk)
        return out

    def parse_column(self, root: dict, column_number: int,
                     schema_inherited: Inherited) -> ColumnPlan:
        name = None
        name_explicit = False
        if "name" in root:
            if not isinstance(root["name"], str):
                # spec: warn + ignore invalid name (W3C test114/test129);
                # the reference raises (``JsonMetadataParser.cs:213``)
                self.warn("name", "The value of the 'name' property must be a string")
            elif not _is_valid_column_name(root["name"]):
                # names must be URI-template variables and must not start
                # with '_' (W3C test130/test131): warn + fall back to titles
                self.warn("name", f"Column name {root['name']} is not valid.")
            else:
                name = root["name"]
                name_explicit = True
        titles: list[tuple[str, str]] = []
        if "titles" in root:
            titles = self._parse_natural_language(root["titles"])
        virtual = False
        if "virtual" in root:
            if not isinstance(root["virtual"], bool):
                self.warn("virtual", "The value of the 'virtual' property must be a boolean")
            else:
                virtual = root["virtual"]
        if name is None and titles:
            # first title with the context default language, else 'und'
            # (W3C test149: a title in another language does NOT become the
            # name — such columns fall through to _col.N)
            for want in (self.default_language, "und"):
                if want is None:
                    continue
                for tag, value in titles:
                    if tag == want or (want != "und" and
                                       tag.split("-")[0] == want.split("-")[0]):
                        name = value
                        break
                if name is not None:
                    break
        if name is None:
            name = f"_col.{column_number}"
        suppress = self._parse_suppress_output(root)
        inh = self.parse_inherited(root).overlay(schema_inherited)
        return ColumnPlan.from_inherited(
            name, inh, titles=titles, suppress_output=suppress, virtual=virtual,
            name_explicit=name_explicit)

    def _parse_suppress_output(self, root: dict) -> bool:
        if "suppressOutput" in root:
            value = root["suppressOutput"]
            if not isinstance(value, bool):
                self.warn("suppressOutput",
                          "The value of the 'suppressOutput' property must be a boolean")
                return False
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
            comment_prefix=self._string_prop(root, "commentPrefix", None, allow_null=True),
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
                self.warn("separator", "The value of the 'separator' property must be a string")
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
                self.warn("default", "The value of the 'default' property must be a string")
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
            dt_id = root["@id"]
            # @id must not be a bnode label nor redefine a built-in datatype
            # (W3C test243/test244/test267)
            if dt_id.startswith("_:"):
                raise MetadataParseError("A datatype @id must not start with '_:'")
            from .datatypes import _ANNOTATIONS
            if dt_id in set(_ANNOTATIONS.values()):
                raise MetadataParseError(
                    f"A datatype @id must not be a built-in datatype IRI: {dt_id}")
            dt.id = dt_id
        if "format" in root:
            value = root["format"]
            try:
                if dt.base in ("boolean", "date", "time", "datetime", "dateTime",
                               "dateTimeStamp") and isinstance(value, dict):
                    # only numeric formats take the object form; elsewhere it
                    # is a bad format string → warn + ignore (W3C test184/191)
                    self.warn("format",
                              f"The format for datatype '{dt.base}' must be a string")
                elif dt.base == "boolean":
                    try:
                        dt.format = fmt.BooleanFormat(_as_format_string(value))
                    except fmt.MetadataFormatError:
                        # bad boolean format string → warn + ignore (test269)
                        self.warn("format",
                                  "The format specifier for a boolean datatype "
                                  "must be two strings separated by |")
                elif dt.base == "date":
                    dt.format = fmt.DateFormat(_as_format_string(value),
                                               full_offsets=self.encode)
                elif dt.base == "time":
                    dt.format = fmt.TimeFormat(_as_format_string(value),
                                               full_offsets=self.encode)
                elif dt.base in ("datetime", "dateTime", "dateTimeStamp"):
                    dt.format = fmt.DateTimeFormat(_as_format_string(value),
                                                   full_offsets=self.encode)
                elif dt.base in _NUMERIC_BASES:
                    # the reference only accepts formats on
                    # number/decimal/double/float (``JsonMetadataParser.cs:
                    # 628-645``); the spec applies them to every numeric type
                    # (W3C test282 uses integer patterns)
                    try:
                        if isinstance(value, dict):
                            dt.format = fmt.NumericFormat(
                                value.get("decimalChar", ".")[:1] or ".",
                                (value.get("groupChar", ",")[:1] or ","),
                                value.get("pattern"))
                        else:
                            dt.format = fmt.NumericFormat(pattern=_as_format_string(value))
                    except fmt.MetadataFormatError:
                        # bad pattern → warn + ignore format (W3C test156/159)
                        self.warn("format", "Invalid numeric format pattern")
                else:
                    # other datatypes take a regular-expression format
                    # (W3C test194); the reference raises
                    # NotImplementedException (``JsonMetadataParser.cs:647``)
                    try:
                        dt.format = fmt.RegexFormat(_as_format_string(value))
                    except fmt.MetadataFormatError:
                        self.warn("format",
                                  f"Invalid regex format on datatype '{dt.base}'")
            except fmt.MetadataFormatError as ex:
                raise MetadataParseError(str(ex)) from None
        # constraint applicability + consistency (W3C test201/216-227):
        numericish = dt.base in _VALUE_CONSTRAINABLE
        stringish = dt.base in _LENGTH_CONSTRAINABLE
        if any(k in root for k in ("minimum", "maximum", "minInclusive",
                                   "maxInclusive", "minExclusive", "maxExclusive")):
            if not numericish:
                raise MetadataParseError(
                    f"Value constraints are not allowed on datatype '{dt.base}'")
        if any(k in root for k in ("length", "minLength", "maxLength")):
            if not stringish:
                raise MetadataParseError(
                    f"Length constraints are not allowed on datatype '{dt.base}'")
        if ("minInclusive" in root or "minimum" in root) and "minExclusive" in root:
            raise MetadataParseError(
                "minInclusive and minExclusive must not both be specified")
        if ("maxInclusive" in root or "maximum" in root) and "maxExclusive" in root:
            raise MetadataParseError(
                "maxInclusive and maxExclusive must not both be specified")

        def _num(key):
            v = root.get(key)
            if isinstance(v, bool):
                return None
            if isinstance(v, (int, float)):
                return float(v)
            if isinstance(v, str):
                # temporal thresholds: ISO lexical forms compare
                # lexicographically (W3C test218-221)
                return v
            return None

        min_inc = _num("minInclusive") if "minInclusive" in root else _num("minimum")
        max_inc = _num("maxInclusive") if "maxInclusive" in root else _num("maximum")
        min_exc, max_exc = _num("minExclusive"), _num("maxExclusive")
        for a, b in ((min_inc, max_inc), (min_inc, max_exc), (min_exc, max_exc),
                     (min_exc, max_inc)):
            if a is not None and b is not None and type(a) is not type(b):
                raise MetadataParseError("Inconsistent constraint value types")
        if min_inc is not None and max_inc is not None and max_inc < min_inc:
            raise MetadataParseError("maxInclusive must be >= minInclusive")
        if min_inc is not None and max_exc is not None and max_exc <= min_inc:
            raise MetadataParseError("maxExclusive must be > minInclusive")
        if min_exc is not None and max_exc is not None and max_exc < min_exc:
            raise MetadataParseError("maxExclusive must be >= minExclusive")
        if min_exc is not None and max_inc is not None and max_inc <= min_exc:
            raise MetadataParseError("maxInclusive must be > minExclusive")

        length = root.get("length")
        min_length = root.get("minLength")
        max_length = root.get("maxLength")
        if (isinstance(min_length, int) and isinstance(max_length, int)
                and min_length > max_length):
            raise MetadataParseError(
                "minLength must not be greater than maxLength (W3C test261)")
        if isinstance(length, int):
            if isinstance(min_length, int) and length < min_length:
                raise MetadataParseError("length must not be less than minLength")
            if isinstance(max_length, int) and length > max_length:
                raise MetadataParseError("length must not be greater than maxLength")
        constraints = []
        for key, kind in (("minimum", "min"), ("minInclusive", "min"),
                          ("minExclusive", "minExclusive"), ("maximum", "max"),
                          ("maxInclusive", "max"), ("maxExclusive", "maxExclusive")):
            if key in root:
                value = root[key]
                if isinstance(value, (int, float)) and not isinstance(value, bool):
                    constraints.append(ValueConstraint(kind=kind, threshold=float(value)))
                elif isinstance(value, str):
                    # temporal constraints compare ISO lexical forms
                    # (W3C test210-215)
                    constraints.append(ValueConstraint(kind=kind, threshold=value))
                else:
                    self.warn(key, "Unsupported constraint value type")
        lc = []
        for key, attr in (("length", "length"), ("minLength", "min_length"),
                          ("maxLength", "max_length")):
            if key in root and isinstance(root[key], int):
                lc.append((attr, root[key]))
        if lc:
            from .model import LengthConstraint
            constraints.append(LengthConstraint(**dict(lc)))
        dt.constraints = tuple(constraints)
        return dt

    # -- common properties / notes -----------------------------------------

    def _collect_common_properties(self, root: dict) -> dict:
        return {k: v for k, v in root.items() if is_common_property(k)}

    def _parse_notes(self, root: dict):
        if "notes" in root:
            value = root["notes"]
            if not isinstance(value, list):
                self.warn("notes", "The value of the 'notes' property must be a JSON array")
                return None
            return value
        return None


def _as_format_string(value) -> str:
    if isinstance(value, str):
        return value
    raise MetadataParseError("Expected format to be a string")


_NUMERIC_BASES = frozenset({
    "number", "decimal", "double", "float", "integer", "long", "int", "short",
    "byte", "nonNegativeInteger", "positiveInteger", "unsignedLong",
    "unsignedInt", "unsignedShort", "unsignedByte", "nonPositiveInteger",
    "negativeInteger",
})

# datatype bases that accept value (min/max) constraints
_VALUE_CONSTRAINABLE = frozenset({
    "number", "decimal", "double", "float", "integer", "long", "int", "short",
    "byte", "nonNegativeInteger", "positiveInteger", "unsignedLong",
    "unsignedInt", "unsignedShort", "unsignedByte", "nonPositiveInteger",
    "negativeInteger", "date", "dateTime", "datetime", "dateTimeStamp", "time",
    "gYear", "gYearMonth", "gMonth", "gMonthDay", "gDay", "duration",
    "dayTimeDuration", "yearMonthDuration",
})

# datatype bases that accept length constraints
_LENGTH_CONSTRAINABLE = frozenset({
    "string", "normalizedString", "token", "language", "Name", "NMTOKEN",
    "xml", "html", "json", "anyAtomicType", "any", "base64Binary", "binary",
    "hexBinary",
})

_COLUMN_NAME_RE = __import__("re").compile(
    r"^(?:[A-Za-z0-9_]|%[0-9A-Fa-f]{2})(?:[A-Za-z0-9_.]|%[0-9A-Fa-f]{2})*$")


def _is_valid_column_name(name: str) -> bool:
    """URI-template variable syntax (RFC 6570 varname) and the CSVW rule
    that names must not begin with ``_``."""
    return bool(_COLUMN_NAME_RE.match(name)) and not name.startswith("_")
