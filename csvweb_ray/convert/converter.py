"""CSV → RDF triples conversion for a single (CSV content, compiled
metadata) pair.

Re-expresses the csv2rdf algorithm of the reference converter
(``/root/reference/src/DataDock.CsvWeb/Rdf/Converter.cs:227-471``) as a
pure function: whole-file-in, list-of-triples-out.  This is deliberate —
inside the Ray pipeline one corpus row carries one whole file, so a single
``map_batches`` UDF invocation converts whole files and row numbering needs
no cross-block state (SURVEY.md §7 "per-file ordering").

Differences from the reference, all deliberate and documented:

- **Deterministic blank nodes.** The reference mints fresh bnodes per row
  (``Converter.cs:340,371``); labels are irrelevant there because tests
  compare by graph isomorphism.  Distributed retries and global dedup need
  stable labels, so every bnode label is a content hash of
  ``(bnode_seed, ordinal)`` where ``bnode_seed`` identifies the input file
  (repo|path|commit) — identical output for identical input, on any worker.
- **Dialect fidelity.** ``skipRows`` / ``skipColumns`` / ``trim`` are
  honored per the CSVW spec (the reference parses but drops them —
  ``Converter.cs:491-511`` configures neither), because the W3C expected
  outputs assume they work.
- **Default lexical normalization** additionally canonicalizes boolean
  (``1``/``0`` → ``true``/``false``) per the csv2rdf spec.
"""

from __future__ import annotations

import csv as _csv
import hashlib
import io
from dataclasses import dataclass, field

from ..metadata.datatypes import (
    CSVW,
    RDF_TYPE,
    XSD_BOOLEAN,
    XSD_DATE,
    XSD_DATETIME,
    XSD_DOUBLE,
    XSD_INTEGER,
    XSD_STRING,
    get_annotation_iri,
)
from ..metadata.formats import FormatError, format_double_invariant
from ..metadata.model import CompiledTable, CompiledTableGroup, Dialect
from ..metadata.spec import expand_url
from ..uritemplate import UriTemplateBindingError
from ..urifns import is_absolute_uri, resolve_uri
from ..rdf.terms import Triple
from .cells import normalize_cell_value

MODE_STANDARD = "standard"
MODE_MINIMAL = "minimal"


class ConversionError(Exception):
    pass


@dataclass
class ConversionResult:
    triples: list = field(default_factory=list)
    #: Arrow term tables (subj_kind..obj_lang) from the vectorized fast
    #: path — only populated when the converter ran with
    #: ``fast_tables=True`` (the batch UDF opts in; tuple-consuming
    #: callers like the conformance harness never see these)
    tables: list = field(default_factory=list)
    errors: list = field(default_factory=list)
    rows: int = 0


class _BnodeFactory:
    """Deterministic bnode labels: sha1(seed|ordinal), stable across
    retries and cluster sizes (SURVEY.md §7 hard parts)."""

    __slots__ = ("seed", "counter")

    def __init__(self, seed: str):
        self.seed = seed
        self.counter = 0

    def __call__(self) -> tuple:
        label = hashlib.sha1(f"{self.seed}|{self.counter}".encode()).hexdigest()[:20]
        self.counter += 1
        return ("b", "b" + label)


class Converter:
    """Converts one compiled table group + its CSV file contents.

    ``csv_texts`` maps table url → CSV text.  ``mode`` is standard/minimal
    (``Rdf/ConverterMode.cs``).  ``suppress_string_datatype`` emits plain
    literals instead of ``^^xsd:string`` (RDF 1.1), as the reference's test
    harness does (``Tests/CsvwTestCasesSpec.cs:140``).
    """

    def __init__(self, mode: str = MODE_STANDARD, suppress_string_datatype: bool = False,
                 bnode_seed: str = "", encode_iris: bool = False,
                 fast_tables: bool = False):
        self.mode = mode
        self.suppress_string_datatype = suppress_string_datatype
        self.encode_iris = encode_iris
        self.fast_tables = fast_tables
        self._bnode = _BnodeFactory(bnode_seed)
        self.result = ConversionResult()
        # per-(table, column) memo for the default predicate IRI — it is
        # row-invariant but was being re-resolved for every cell, which
        # profiling put on the conversion hot path
        self._pred_cache: dict = {}

    # -- public -------------------------------------------------------------

    def convert(self, group: CompiledTableGroup, csv_texts,
                only_table_url: str | None = None) -> ConversionResult:
        """``only_table_url`` filters emission to one table WITHOUT
        mutating the (possibly shared/cached) group — the non-mutating
        equivalent of setting ``suppress_output`` on every other table."""
        if not group.tables:
            self._error("The CSV metadata must contain at least one table definition.")
            return self.result
        emit = self.result.triples.append
        group_node = None
        if self.mode == MODE_STANDARD:
            group_node = ("i", group.id) if group.id else self._bnode()
            emit(Triple(group_node, RDF_TYPE, ("i", CSVW + "TableGroup")))
            self._emit_common_properties(group_node, group.common_properties)
        for table in group.tables:
            if table.suppress_output or (only_table_url is not None
                                         and table.url != only_table_url):
                continue
            text = csv_texts(table.url) if callable(csv_texts) else csv_texts.get(table.url)
            if text is None:
                self._error(f"Could not resolve table URL {table.url}")
                continue
            self._convert_table(group_node, table, text, emit)
        return self.result

    # -- internals ----------------------------------------------------------

    def _error(self, message: str) -> None:
        self.result.errors.append(message)

    def _convert_table(self, group_node, table: CompiledTable, text: str, emit) -> None:
        if self.fast_tables and self.mode == MODE_MINIMAL:
            from .fastpath import try_fast_table

            fast = try_fast_table(
                table, text,
                suppress_string_datatype=self.suppress_string_datatype,
                encode_iris=self.encode_iris,
                bnode_seed=self._bnode.seed,
                bnode_start=self._bnode.counter)
            if fast is not None:
                term_tbl, nrows = fast
                self.result.tables.append(term_tbl)
                self.result.rows += nrows
                # the row loop allocates one default-subject bnode per row
                # whether used or not — advance the counter identically so
                # any later (slow-path) table in this group mints the same
                # labels it would in an all-slow run
                self._bnode.counter += nrows
                return
        table_node = None
        if self.mode == MODE_STANDARD:
            table_node = ("i", table.id) if table.id else self._bnode()
            emit(Triple(group_node, CSVW + "table", table_node))
            emit(Triple(table_node, RDF_TYPE, ("i", CSVW + "Table")))
            emit(Triple(table_node, CSVW + "url", ("i", table.url)))
            self._emit_common_properties(table_node, table.common_properties)
            if table.notes is not None:
                self._emit_common_property(table_node, CSVW + "note", table.notes)

        dialect = table.dialect
        header_row_count = dialect.effective_header_row_count()
        records = _read_csv(text, dialect)

        # header consumption + schema inference
        header: list | None = None
        consumed = 0
        it = iter(records)
        for _ in range(header_row_count):
            try:
                header_rec = next(it)
                consumed += 1
                if header is None:
                    header = header_rec
            except StopIteration:
                break

        columns = list(table.columns)
        if not table.columns_declared and not columns:
            if header is not None:
                seen = set()
                for name in header:
                    if name in seen:
                        continue
                    seen.add(name)
                    columns.append(table.inferred_column(name))

        trim = dialect.effective_trim()
        skip_cols = dialect.skip_columns
        name_to_index = {c.name: i for i, c in enumerate(columns) if c.name}

        row = 0
        source_row = dialect.skip_rows + header_row_count
        for record in it:
            row += 1
            source_row += 1
            fields = record[skip_cols:] if skip_cols else record
            if trim == "true":
                fields = [f.strip() for f in fields]
            elif trim == "start":
                fields = [f.lstrip() for f in fields]
            elif trim == "end":
                fields = [f.rstrip() for f in fields]

            row_node = None
            if self.mode == MODE_STANDARD:
                row_node = self._bnode()
                emit(Triple(table_node, CSVW + "row", row_node))
                emit(Triple(row_node, RDF_TYPE, ("i", CSVW + "Row")))
                emit(Triple(row_node, CSVW + "rownum",
                            ("l", str(row), XSD_INTEGER, None)))
                emit(Triple(row_node, CSVW + "url",
                            ("i", f"{table.url}#row={source_row}")))
                if table.row_titles:
                    # 4.6.6: row titles from the named columns (W3C test235/236)
                    for title_col in table.row_titles:
                        idx = name_to_index.get(title_col)
                        if idx is None or idx >= len(fields):
                            continue
                        tv = fields[idx]
                        if tv is None or tv == "":
                            continue
                        lang = columns[idx].lang
                        if lang:
                            emit(Triple(row_node, CSVW + "title", ("l", tv, None, lang)))
                        elif self.suppress_string_datatype:
                            emit(Triple(row_node, CSVW + "title", ("l", tv, None, None)))
                        else:
                            emit(Triple(row_node, CSVW + "title",
                                        ("l", tv, XSD_STRING, None)))

            s_default = self._bnode()
            source_column_count = len(fields)
            col_ix = 0
            while col_ix < max(source_column_count, len(columns)):
                if col_ix >= len(columns):
                    columns.append(table.default_column(col_ix + 1))
                    if columns[-1].name:
                        name_to_index.setdefault(columns[-1].name, col_ix)
                column = columns[col_ix]
                if column.suppress_output:
                    col_ix += 1
                    continue
                ctx = _CellContext(
                    row=row, source_row=source_row,
                    column=col_ix + 1, source_column=skip_cols + col_ix + 1,
                    name=column.name)
                try:
                    self._convert_cell(table, columns, name_to_index, fields,
                                       column, col_ix, ctx, row_node, s_default, emit)
                except Exception as ex:  # per-cell error channel (Converter.cs:456-461)
                    self._error(
                        f"Conversion error at row {source_row}, column "
                        f"'{column.name}'. {ex}")
                col_ix += 1
        self.result.rows += row

    def _convert_cell(self, table, columns, name_to_index, fields, column,
                      col_ix, ctx, row_node, s_default, emit) -> None:
        bindings = _Bindings(table, columns, name_to_index, fields, ctx,
                             self.encode_iris)
        if column.about_url is None:
            s = s_default
        else:
            s = self._resolve_template(table, column.about_url, bindings)
            if s is None:
                # the reference's Triple ctor throws on a null subject,
                # caught by the per-cell handler → error channel
                # (Rdf/Converter.cs:397-399,456-461); without this the
                # None subject would crash the batch UDF downstream
                raise ConversionError(
                    "aboutUrl template did not resolve to a subject node")
        if self.mode == MODE_STANDARD:
            emit(Triple(row_node, CSVW + "describes", s))
        if column.property_url is None:
            key = (table.url, column.name, col_ix)
            p = self._pred_cache.get(key)
            if p is None:
                name = column.name or f"_col.{col_ix + 1}"
                if self.encode_iris:
                    # the name annotation MUST be percent-encoded per RFC
                    # 3986 before use as a fragment identifier (W3C
                    # test132); the reference skips this (golden
                    # 'escaping' fixture expects a raw space), hence the
                    # flag.
                    name = _pct_encode_name(name)
                p = self._pred_cache[key] = resolve_uri(table.url, "#" + name)
        else:
            p_node = self._resolve_template(table, column.property_url, bindings)
            if p_node is None:  # null predicate → per-cell error (see above)
                raise ConversionError(
                    "propertyUrl template did not resolve to a predicate node")
            p = p_node[1]
        if column.value_url is not None:
            o = self._resolve_template(table, column.value_url, bindings)
            if o is not None:
                emit(Triple(s, p, o))
            return
        raw = column.default if column.virtual else (
            fields[col_ix] if col_ix < len(fields) else column.default)
        cell = normalize_cell_value(raw, column)
        for err in cell.errors:
            self._error(err)
        if cell.is_list and cell.value_list is not None:
            values = [v for v in cell.value_list if v is not None]
            if column.ordered and values:
                # ordered lists become rdf:List structures (csv2rdf 4.6.8.5,
                # W3C test306/307); unordered lists repeat the predicate
                RDF_NS = "http://www.w3.org/1999/02/22-rdf-syntax-ns#"
                head = None
                prev = None
                for v in values:
                    node = self._bnode()
                    if head is None:
                        head = node
                    else:
                        emit(Triple(prev, RDF_NS + "rest", node))
                    emit(Triple(node, RDF_NS + "first", self._create_literal(v, column)))
                    prev = node
                emit(Triple(prev, RDF_NS + "rest", ("i", RDF_NS + "nil")))
                emit(Triple(s, p, head))
            else:
                for v in values:
                    emit(Triple(s, p, self._create_literal(v, column)))
        elif not cell.is_list and cell.value is not None:
            emit(Triple(s, p, self._create_literal(cell.value, column)))

    def _resolve_template(self, table, template, bindings):
        """Reference ``Converter.ResolveTemplate``: binding failure → None
        (triple silently dropped by the caller where allowed)."""
        try:
            uri = template.resolve(bindings)
        except UriTemplateBindingError:
            return None
        if not is_absolute_uri(uri):
            uri = resolve_uri(table.url, uri)
        return ("i", uri)

    def _create_literal(self, value: str, column) -> tuple:
        datatype = column.datatype
        datatype_iri = self._annotated_datatype_iri(datatype)
        if datatype_iri == XSD_STRING:
            if column.lang:
                return ("l", value, None, column.lang)
            if self.suppress_string_datatype:
                return ("l", value, None, None)
        try:
            value = self._normalize_literal(value, datatype, datatype_iri)
            base = datatype.base if datatype is not None else "string"
            if not _lexical_ok(base, value):
                raise ConversionError(
                    f"Value '{value}' is not in the lexical space of {base}")
        except ConversionError as ex:
            # csv2rdf: a value that fails its format/parse gets a warning and
            # is emitted as a string (W3C test162/test192); the reference
            # turns this into a dropped triple + error instead.
            self._error(str(ex))
            if self.suppress_string_datatype:
                return ("l", value, None, None)
            return ("l", value, XSD_STRING, None)
        if datatype is not None and datatype.constraints:
            if not self._check_constraints(value, datatype):
                # violation → warning + string value (W3C test203-215)
                if self.suppress_string_datatype:
                    return ("l", value, None, None)
                return ("l", value, XSD_STRING, None)
        return ("l", value, datatype_iri, None)

    def _check_constraints(self, value: str, datatype) -> bool:
        """Value/length-constraint enforcement (the reference stubs this out,
        ``Converter.cs:527-531``); violations are reported as errors."""
        from ..metadata.model import LengthConstraint

        ok = True
        for constraint in datatype.constraints:
            subject = value
            if isinstance(constraint, LengthConstraint):
                # binary types measure the decoded byte length (W3C test195)
                if datatype.base in ("base64Binary", "binary"):
                    import base64 as _b64
                    try:
                        subject = _b64.b64decode(value)
                    except Exception:
                        pass
                elif datatype.base == "hexBinary":
                    subject = bytes(len(value) // 2)
            if not constraint.is_satisfied(subject):
                ok = False
                self._error(f"Value '{value}' violates a constraint "
                            f"({constraint})")
        return ok

    @staticmethod
    def _annotated_datatype_iri(datatype) -> str:
        if datatype is None:
            return XSD_STRING
        if datatype.id is not None:
            return datatype.id
        annotation = get_annotation_iri(datatype.base)
        if annotation is None:
            raise ConversionError(
                f"Could not determine the correct IRI for the datatype "
                f"annotation {datatype.base}")
        return annotation

    @staticmethod
    def _normalize_literal(lit: str, datatype, datatype_iri: str) -> str:
        if datatype is not None and datatype.format is not None:
            fmt = datatype.format
            try:
                if hasattr(fmt, "is_valid") and not fmt.is_valid(lit):
                    raise ConversionError(
                        f"Value '{lit}' does not match the format specification")
                return fmt.normalize(lit)
            except FormatError as ex:
                raise ConversionError(str(ex)) from None
        if datatype_iri == XSD_DATE:
            return _default_date_normalize(lit)
        if datatype_iri == XSD_DATETIME:
            return _default_datetime_normalize(lit)
        if datatype_iri == XSD_BOOLEAN:
            if lit == "1":
                return "true"
            if lit == "0":
                return "false"
        return lit

    # -- JSON-LD common properties (Rdf/Converter.cs:638-765) ---------------

    def _emit_common_properties(self, subject, common_properties: dict) -> None:
        for name, value in common_properties.items():
            self._emit_common_property(subject, expand_url(name), value)

    def _emit_common_property(self, subject, predicate: str, value) -> None:
        emit = self.result.triples.append
        if isinstance(value, list):
            for item in value:
                self._emit_common_property(subject, predicate, item)
        elif isinstance(value, dict):
            if "@value" in value:
                lit_val = _scalar_to_string(value["@value"])
                if "@type" in value:
                    emit(Triple(subject, predicate,
                                ("l", lit_val, expand_url(value["@type"]), None)))
                elif "@language" in value:
                    emit(Triple(subject, predicate,
                                ("l", lit_val, None, value["@language"])))
                else:
                    emit(Triple(subject, predicate, ("l", lit_val, XSD_STRING, None)))
            else:
                if "@id" in value:
                    s = ("i", value["@id"])
                else:
                    s = self._bnode()
                emit(Triple(subject, predicate, s))
                if "@type" in value:
                    types = value["@type"]
                    for t in types if isinstance(types, list) else [types]:
                        emit(Triple(s, RDF_TYPE, ("i", expand_url(t))))
                for name, v in value.items():
                    if not name.startswith("@"):
                        self._emit_common_property(s, expand_url(name), v)
        elif isinstance(value, bool):
            emit(Triple(subject, predicate,
                        ("l", "true" if value else "false", XSD_BOOLEAN, None)))
        elif isinstance(value, int):
            emit(Triple(subject, predicate, ("l", str(value), XSD_INTEGER, None)))
        elif isinstance(value, float):
            emit(Triple(subject, predicate,
                        ("l", _format_double_E(value), XSD_DOUBLE, None)))
        else:
            emit(Triple(subject, predicate, ("l", str(value), XSD_STRING, None)))


@dataclass
class _CellContext:
    row: int
    source_row: int
    column: int
    source_column: int
    name: str | None


class _Bindings:
    """Template variable lookup (reference ``Converter.ResolveProperty``):
    ``_row``/``_sourceRow``/``_column``/``_sourceColumn``/``_name`` context
    variables, else the cell value of the named column; null-set values bind
    as null → UriTemplateBindingError → dropped triple."""

    __slots__ = ("table", "columns", "name_to_index", "fields", "ctx", "encode")

    def __init__(self, table, columns, name_to_index, fields, ctx, encode=False):
        self.table = table
        self.columns = columns
        self.name_to_index = name_to_index
        self.fields = fields
        self.ctx = ctx
        self.encode = encode

    def __call__(self, variable: str):
        ctx = self.ctx
        if variable == "_row":
            return str(ctx.row)
        if variable == "_sourceRow":
            return str(ctx.source_row)
        if variable == "_column":
            return str(ctx.column)
        if variable == "_sourceColumn":
            return str(ctx.source_column)
        if variable == "_name":
            return _pct_encode_name(ctx.name) if self.encode else ctx.name
        index = self.name_to_index.get(variable)
        if index is None:
            raise ConversionError(
                f"Could not find a column named {variable} in the CSV metadata.")
        column = self.columns[index]
        if column.virtual:
            value = column.default
        else:
            value = self.fields[index] if index < len(self.fields) else None
        if value is None or value in column.null:
            return None  # → UriTemplateBindingError in the template
        return value


import re as _re2

_INT_RE = _re2.compile(r"^[+-]?\d+$")
_DEC_RE = _re2.compile(r"^[+-]?(\d+(\.\d*)?|\.\d+)$")
_FLOAT_RE = _re2.compile(r"^([+-]?(\d+(\.\d*)?|\.\d+)([Ee][+-]?\d+)?|NaN|[+-]?INF)$")
_TIME_RE = _re2.compile(r"^\d{2}:\d{2}:\d{2}(\.\d+)?(Z|[+-]\d{2}:\d{2})?$")
_DATETIME_RE = _re2.compile(
    r"^-?\d{4,}-\d{2}-\d{2}T\d{2}:\d{2}:\d{2}(\.\d+)?(Z|[+-]\d{2}:?\d{2}|[+-]\d{2})?$")
_DATE_RE = _re2.compile(r"^-?\d{4,}-\d{2}-\d{2}(Z|[+-]\d{2}:\d{2})?$")
_DURATION_RE = _re2.compile(
    r"^-?P(?=.)(\d+Y)?(\d+M)?(\d+D)?(T(?=.)(\d+H)?(\d+M)?(\d+(\.\d+)?S)?)?$")
_GYEAR_RE = _re2.compile(r"^-?\d{4,}(Z|[+-]\d{2}:\d{2})?$")
_GYEARMONTH_RE = _re2.compile(r"^-?\d{4,}-\d{2}(Z|[+-]\d{2}:\d{2})?$")
_GMONTH_RE = _re2.compile(r"^--\d{2}(Z|[+-]\d{2}:\d{2})?$")
_GMONTHDAY_RE = _re2.compile(r"^--\d{2}-\d{2}(Z|[+-]\d{2}:\d{2})?$")
_GDAY_RE = _re2.compile(r"^---\d{2}(Z|[+-]\d{2}:\d{2})?$")
_HEX_RE = _re2.compile(r"^([0-9A-Fa-f]{2})*$")
_B64_RE = _re2.compile(r"^[A-Za-z0-9+/=\s]*$")

_INT_RANGES = {
    "byte": (-128, 127), "short": (-32768, 32767),
    "int": (-2147483648, 2147483647),
    "long": (-9223372036854775808, 9223372036854775807),
    "unsignedByte": (0, 255), "unsignedShort": (0, 65535),
    "unsignedInt": (0, 4294967295), "unsignedLong": (0, 18446744073709551615),
    "nonNegativeInteger": (0, None), "positiveInteger": (1, None),
    "negativeInteger": (None, -1), "nonPositiveInteger": (None, 0),
    "integer": (None, None),
}


def _lexical_ok(base: str, value: str) -> bool:
    """Post-normalization check that a value is in the lexical space of its
    datatype base (csv2rdf requires a warning + string fallback when not —
    W3C test157, the test162-182 family)."""
    if base in _INT_RANGES:
        if not _INT_RE.match(value):
            return False
        lo, hi = _INT_RANGES[base]
        n = int(value)
        if lo is not None and n < lo:
            return False
        if hi is not None and n > hi:
            return False
        return True
    if base == "decimal":
        return bool(_DEC_RE.match(value))
    if base in ("double", "float", "number"):
        return bool(_FLOAT_RE.match(value))
    if base == "boolean":
        return value in ("true", "false", "1", "0")
    if base == "time":
        return bool(_TIME_RE.match(value))
    if base in ("dateTime", "datetime"):
        return bool(_DATETIME_RE.match(value))
    if base == "dateTimeStamp":
        return bool(_DATETIME_RE.match(value)) and value[-1] in "Z0123456789"
    if base == "date":
        return bool(_DATE_RE.match(value))
    if base == "duration":
        return bool(_DURATION_RE.match(value))
    if base == "dayTimeDuration":
        return bool(_DURATION_RE.match(value)) and "Y" not in value and (
            "M" not in value.split("T")[0])
    if base == "yearMonthDuration":
        return bool(_DURATION_RE.match(value)) and "T" not in value and "D" not in value
    if base == "gYear":
        return bool(_GYEAR_RE.match(value))
    if base == "gYearMonth":
        return bool(_GYEARMONTH_RE.match(value))
    if base == "gMonth":
        return bool(_GMONTH_RE.match(value))
    if base == "gMonthDay":
        return bool(_GMONTHDAY_RE.match(value))
    if base == "gDay":
        return bool(_GDAY_RE.match(value))
    if base == "hexBinary":
        return bool(_HEX_RE.match(value))
    if base == "base64Binary":
        return bool(_B64_RE.match(value))
    if base == "language":
        from ..metadata.langtag import is_valid_language_tag
        return is_valid_language_tag(value)
    return True


# URI-template varchar set: letters, digits, '_' and '.'; everything else
# (including '-' and '~') is percent-encoded in name annotations
# (W3C test188 expects "M%2Dd%2Dyyyy", test283 "%2B0")
_NAME_SAFE = set(
    "ABCDEFGHIJKLMNOPQRSTUVWXYZabcdefghijklmnopqrstuvwxyz0123456789_.")


def _pct_encode_name(name: str) -> str:
    out = []
    for ch in name:
        if ch in _NAME_SAFE:
            out.append(ch)
        else:
            out.append("".join(f"%{b:02X}" for b in ch.encode("utf-8")))
    return "".join(out)


def _read_csv(text: str, dialect: Dialect) -> list:
    """Parse CSV text per the CSVW dialect.  Comment lines (outside quoted
    fields) and the first ``skipRows`` physical rows are removed before
    record parsing; blank rows are dropped when ``skipBlankRows``."""
    lines = io.StringIO(text, newline="")
    prefix = dialect.comment_prefix
    kwargs = dict(delimiter=dialect.delimiter or ",")
    if dialect.quote_char:
        kwargs["quotechar"] = dialect.quote_char
        kwargs["doublequote"] = dialect.double_quote
    else:
        kwargs["quoting"] = _csv.QUOTE_NONE
    reader = _csv.reader(lines, **kwargs)
    records = []
    physical = 0
    for record in reader:
        physical += 1
        if physical <= dialect.skip_rows:
            continue
        if prefix and record and record[0].startswith(prefix):
            continue
        if dialect.skip_blank_rows and all(f == "" for f in record):
            continue
        if not record:
            if dialect.skip_blank_rows:
                continue
            record = [""]
        records.append(record)
    return records


def _default_date_normalize(lit: str) -> str:
    """No-format xsd:date default normalization (reference uses
    ``DateTime.Parse(lit).ToString("yyyy-MM-dd")``, ``Converter.cs:587-588``)."""
    import datetime as _dt
    import re as _re

    text = lit.strip()
    # xsd:date allows an optional timezone suffix; preserve it verbatim
    tz = ""
    m = _re.match(r"^(.*?)(Z|[+-]\d{2}:\d{2})$", text)
    if m:
        text, tz = m.group(1), m.group(2)
    try:
        return _dt.date.fromisoformat(text).isoformat() + tz
    except ValueError:
        pass
    for pattern in ("%Y-%m-%d", "%d/%m/%Y", "%m/%d/%Y", "%d %b %Y", "%d %B %Y"):
        try:
            return _dt.datetime.strptime(text, pattern).date().isoformat() + tz
        except ValueError:
            continue
    raise ConversionError(f"Could not parse '{lit}' as a date")


def _default_datetime_normalize(lit: str) -> str:
    """No-format xsd:dateTime normalization → ISO, fraction kept only when
    nonzero, UTC rendered as ``Z``."""
    import datetime as _dt

    text = lit.strip()
    iso = text.replace("Z", "+00:00") if text.endswith("Z") else text
    try:
        value = _dt.datetime.fromisoformat(iso)
    except ValueError:
        raise ConversionError(f"Could not parse '{lit}' as a dateTime") from None
    out = value.strftime("%Y-%m-%dT%H:%M:%S")
    if value.microsecond:
        out += ("%.6f" % (value.microsecond / 1e6))[1:].rstrip("0")
    if value.tzinfo is not None:
        offset = value.utcoffset()
        total = int(offset.total_seconds())
        if total == 0:
            out += "Z"
        else:
            sign = "+" if total >= 0 else "-"
            total = abs(total)
            hh, mm = divmod(total // 60, 60)
            out += f"{sign}{hh:02d}:{mm:02d}"
    return out


def _scalar_to_string(value) -> str:
    if isinstance(value, bool):
        return "true" if value else "false"
    if isinstance(value, float):
        return format_double_invariant(value)
    return str(value)


def _format_double_E(value: float) -> str:
    """C# ``double.ToString("E")``: 6-digit mantissa, 3-digit exponent
    (``Rdf/Converter.cs:752``)."""
    text = f"{value:.6E}"
    mantissa, exp = text.split("E")
    sign = exp[0]
    return f"{mantissa}E{sign}{int(exp[1:]):03d}"


def convert_file(metadata_group: CompiledTableGroup, csv_texts, mode: str = MODE_STANDARD,
                 suppress_string_datatype: bool = False, bnode_seed: str = "",
                 encode_iris: bool = False, fast_tables: bool = False,
                 only_table_url: str | None = None) -> ConversionResult:
    """Convenience one-shot conversion.  ``fast_tables=True`` lets simple
    tables come back as Arrow term tables in ``result.tables`` (batch-UDF
    callers); default off so tuple-consuming callers see ``result.triples``
    exclusively."""
    converter = Converter(mode=mode, suppress_string_datatype=suppress_string_datatype,
                          bnode_seed=bnode_seed, encode_iris=encode_iris,
                          fast_tables=fast_tables)
    return converter.convert(metadata_group, csv_texts,
                             only_table_url=only_table_url)
