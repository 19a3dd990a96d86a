"""Vectorized whole-table conversion for simple CSVW schemas.

The per-cell row loop in ``converter.Converter`` is exact but costs
~6 µs/triple of pure Python (template binding, cell normalization,
literal creation, list appends) — at corpus scale that loop IS the
pipeline's largest phase.  Most real tables are *simple*: single-variable
``aboutUrl`` templates, row-invariant (or default) ``propertyUrl``,
plain string/numeric/boolean datatypes, no separators/lists/valueUrl.
For those, every per-row decision collapses into Arrow kernels over
whole columns.

``try_fast_table`` returns ``(term_table, n_rows)`` — an Arrow table of
the seven term columns (subj_kind, subj, pred, obj_kind, obj_value,
obj_datatype, obj_lang) — or ``None`` whenever ANY static or runtime
condition is not met, in which case the caller falls back to the exact
per-row converter.  The contract is strict equality: for an eligible
table the emitted triple SET, the row count, the error channel (empty)
and the blank-node labels are identical to the slow path's
(``tests/test_fastpath.py`` asserts set-equality on a battery of
schemas; the W3C suite exercises it end-to-end through the DAG).

Reference semantics preserved: ``Rdf/Converter.cs:377-462`` (per-cell
emission), ``Rdf/CellParser.cs:53-149`` (normalization),
``UriTemplate.cs:30-118`` (binding).

Fallback (→ slow path) triggers, all conservative:

- static: standard mode, rowTitles, valueUrl/separator/ordered-list/
  required columns, non-simple datatypes (formats, constraints, bounded
  integer widths, temporal), multi-variable or non-affine templates,
  dialect beyond (skipRows=0, skipColumns=0, headerRowCount≤1,
  1-char delimiter, '"' quoting), comment-prefix present in text,
  bare-``\r`` line terminators;
- runtime: ragged/malformed CSV (pyarrow raises), a template variable
  value that is empty/null/outside ``[0-9A-Za-z_-]`` (keeps percent-
  encoding an identity and URI resolution affine), any numeric/boolean
  value outside its lexical space (the slow path emits a per-cell
  warning there — the error channel must match).
"""

from __future__ import annotations

import csv as _csv
import hashlib
import io

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..metadata.datatypes import (
    RETAINS_LEADING_TRAILING_WS,
    RETAINS_LINE_ENDINGS,
    XSD_BOOLEAN,
    XSD_STRING,
    get_annotation_iri,
)
from ..urifns import is_absolute_uri, resolve_uri

__all__ = ["try_fast_table"]

#: bases whose (format-free) handling is fully vectorized; bounded
#: integer widths / temporal / binary go to the slow path
_ELIGIBLE_BASES = frozenset(
    {"string", "integer", "decimal", "double", "float", "number", "boolean"})

#: RE2 lexical-space checks (same expressions as converter._lexical_ok)
_LEXICAL_RE = {
    "integer": r"^[+-]?\d+$",
    "decimal": r"^[+-]?(\d+(\.\d*)?|\.\d+)$",
    "double": r"^([+-]?(\d+(\.\d*)?|\.\d+)([Ee][+-]?\d+)?|NaN|[+-]?INF)$",
    "float": r"^([+-]?(\d+(\.\d*)?|\.\d+)([Ee][+-]?\d+)?|NaN|[+-]?INF)$",
    "number": r"^([+-]?(\d+(\.\d*)?|\.\d+)([Ee][+-]?\d+)?|NaN|[+-]?INF)$",
    "boolean": r"^(true|false|1|0)$",
}

#: template-variable value charset under which RFC 6570 percent-encoding
#: is an identity and relative-URI resolution is affine (no '.', '/',
#: ':', '?', '#', whitespace — see module docstring)
_SAFE_VALUE_RE = r"^[0-9A-Za-z_-]+$"

_ROW_VARS = ("_row", "_sourceRow")
_CONST_VARS = ("_name", "_column", "_sourceColumn")


def _template_parts(template):
    """(prefix, var, suffix) for a single-expression template whose one
    variable is expanded simple/'+'/'#'-style, else None."""
    exprs = [p for p in template._parts if p[0]]
    if len(exprs) != 1:
        return None
    operator, variables = exprs[0][1]
    if len(variables) != 1:
        return None
    pre, suf, seen = [], [], False
    for is_expr, payload in template._parts:
        if is_expr:
            seen = True
            continue
        (suf if seen else pre).append(payload)
    prefix = "".join(pre) + ("#" if operator == "#" else "")
    return prefix, variables[0], "".join(suf)


def _affine_resolution(prefix: str, suffix: str, base_url: str):
    """(resolved_prefix, resolved_suffix) such that for every safe value
    the fully-resolved subject IRI == rprefix + value + rsuffix; None when
    the template is not affine in the value (e.g. dot-segment or scheme
    interactions).  Probed empirically with two sentinels spanning the
    safe charset's scheme-character split ('-' is scheme-legal, '_' is
    not), so value-dependent absoluteness is caught."""
    outs = []
    for sent in ("zQ0sentinelXy9", "vK9sentinel_Wu3"):
        expanded = prefix + sent + suffix
        uri = expanded if is_absolute_uri(expanded) \
            else resolve_uri(base_url, expanded)
        if uri.count(sent) != 1:
            return None
        i = uri.find(sent)
        outs.append((uri[:i], uri[i + len(sent):]))
    if outs[0] != outs[1]:
        return None
    return outs[0]


def _pct_encode_name(name: str) -> str:
    from .converter import _pct_encode_name as enc

    return enc(name)


class _Ineligible(Exception):
    pass


def _dialect_ok(table, text: str) -> bool:
    d = table.dialect
    if d.skip_rows or d.skip_columns:
        return False
    if d.effective_header_row_count() > 1:
        return False
    if d.effective_header_row_count() == 0 and not table.columns_declared:
        return False  # lazily-fabricated _col.N columns → slow path
    if not d.delimiter or len(d.delimiter) != 1:
        return False
    if d.quote_char != '"' or not d.double_quote:
        return False
    if d.effective_trim() not in ("false", "true", "start", "end"):
        return False
    if "\r" in text:
        return False  # \r / \r\n terminators → slow path
    if d.comment_prefix and (
            text.startswith(d.comment_prefix) or f"\n{d.comment_prefix}" in text):
        return False  # possible comment lines (conservative: quoted-field
        # false positives also fall back)
    return True


def _column_ok(col) -> bool:
    if col.value_url is not None:
        return False
    if col.separator is not None and col.ordered:
        return False  # ordered lists become rdf:List structures → slow path
    if col.required:
        return False  # null → per-cell error in the slow path
    dt = col.datatype
    if dt is not None:
        if dt.format is not None or dt.constraints:
            return False
        if dt.base not in _ELIGIBLE_BASES:
            return False
    return True


def _resolve_const_template(template, table_url, name, col_ix, encode) -> str:
    """Row-invariant template (vars ⊆ _name/_column/_sourceColumn) → IRI."""
    consts = {
        "_name": _pct_encode_name(name) if encode else name,
        "_column": str(col_ix + 1),
        "_sourceColumn": str(col_ix + 1),  # skipColumns == 0 by eligibility
    }

    def lookup(var):
        if var not in consts or consts[var] is None:
            raise _Ineligible(var)
        return consts[var]

    from ..uritemplate import UriTemplateBindingError

    try:
        uri = template.resolve(lookup)
    except (UriTemplateBindingError, _Ineligible):
        raise _Ineligible("property template")
    if not is_absolute_uri(uri):
        uri = resolve_uri(table_url, uri)
    return uri


def _parse_csv(body: str, delimiter: str, n_fields: int,
               ignore_empty: bool) -> pa.Table | None:
    from pyarrow import csv as pacsv

    keys = [f"f{i}" for i in range(n_fields)]
    try:
        return pacsv.read_csv(
            io.BytesIO(body.encode("utf-8")),
            read_options=pacsv.ReadOptions(
                column_names=keys, use_threads=False),
            parse_options=pacsv.ParseOptions(
                delimiter=delimiter, quote_char='"', double_quote=True,
                newlines_in_values=True, ignore_empty_lines=ignore_empty),
            convert_options=pacsv.ConvertOptions(
                column_types={k: pa.string() for k in keys},
                strings_can_be_null=False))
    except pa.ArrowInvalid:
        return None  # ragged/malformed → exact slow path


def _split_header(text: str, header_rows: int):
    """(header_record | None, body).  The header must be a single physical
    line (no embedded newline — checked via quote parity) so the body
    slice is exact."""
    if header_rows == 0:
        return None, text
    nl = text.find("\n")
    if nl < 0:
        return None if text.count('"') % 2 else _one_record(text), ""
    first = text[:nl]
    if first.count('"') % 2:
        raise _Ineligible("multi-line header")
    return _one_record(first), text[nl + 1:]


def _one_record(line: str):
    rec = next(_csv.reader([line]), [])
    return rec


def try_fast_table(table, text: str, *, suppress_string_datatype: bool,
                   encode_iris: bool, bnode_seed: str, bnode_start: int):
    """Vectorized conversion of one simple table; ``None`` → slow path."""
    try:
        return _fast_table(table, text,
                           suppress_string_datatype=suppress_string_datatype,
                           encode_iris=encode_iris, bnode_seed=bnode_seed,
                           bnode_start=bnode_start)
    except _Ineligible:
        return None


def _fast_table(table, text, *, suppress_string_datatype, encode_iris,
                bnode_seed, bnode_start):
    if table.row_titles:
        raise _Ineligible("rowTitles")
    if not _dialect_ok(table, text):
        raise _Ineligible("dialect")
    dialect = table.dialect
    hrc = dialect.effective_header_row_count()

    header, body = _split_header(text, hrc)

    # -- column plans ------------------------------------------------------
    if table.columns_declared and table.columns:
        columns = list(table.columns)
        n_virtual_tail = 0
        for c in reversed(columns):
            if not c.virtual:
                break
            n_virtual_tail += 1
        if any(c.virtual for c in columns[:len(columns) - n_virtual_tail]):
            raise _Ineligible("interleaved virtual columns")
        n_fields = len(columns) - n_virtual_tail
    elif not table.columns_declared:
        if header is None:
            raise _Ineligible("no header for inference")
        names = list(header)
        if len(set(names)) != len(names) or any(not n for n in names):
            raise _Ineligible("duplicate/empty header names")
        columns = [table.inferred_column(n) for n in names]
        n_virtual_tail = 0
        n_fields = len(columns)
    else:
        raise _Ineligible("no columns")
    if n_fields == 0:
        raise _Ineligible("zero source columns")

    names_seen = [c.name for c in columns if c.name]
    if len(set(names_seen)) != len(names_seen):
        raise _Ineligible("duplicate column names")
    name_to_index = {c.name: i for i, c in enumerate(columns) if c.name}

    emitting = [(ix, c) for ix, c in enumerate(columns) if not c.suppress_output]
    for _, c in emitting:
        if not _column_ok(c):
            raise _Ineligible("column")

    # -- parse -------------------------------------------------------------
    if not body:
        empty = {c: pa.nulls(0, type=pa.string()) for c in (
            "subj_kind", "subj", "pred", "obj_kind", "obj_value",
            "obj_datatype", "obj_lang")}
        return pa.table(empty), 0
    parsed = _parse_csv(body, dialect.delimiter, n_fields,
                        ignore_empty=dialect.skip_blank_rows)
    if parsed is None:
        raise _Ineligible("parse")

    fields = [parsed[f"f{i}"].combine_chunks() for i in range(n_fields)]
    n = parsed.num_rows

    trim = dialect.effective_trim()
    if trim == "true":
        fields = [pc.utf8_trim_whitespace(a) for a in fields]
    elif trim == "start":
        fields = [pc.utf8_ltrim_whitespace(a) for a in fields]
    elif trim == "end":
        fields = [pc.utf8_rtrim_whitespace(a) for a in fields]

    if dialect.skip_blank_rows and n:
        blank = None
        for a in fields:
            e = pc.equal(a, "")
            blank = e if blank is None else pc.and_(blank, e)
        if pc.any(blank).as_py():
            keep = pc.invert(blank)
            fields = [pc.filter(a, keep) for a in fields]
            n = len(fields[0])
    if n == 0:
        empty = {c: pa.nulls(0, type=pa.string()) for c in (
            "subj_kind", "subj", "pred", "obj_kind", "obj_value",
            "obj_datatype", "obj_lang")}
        return pa.table(empty), 0

    # -- subjects ----------------------------------------------------------
    bnode_subjects = None

    def _bnode_array():
        nonlocal bnode_subjects
        if bnode_subjects is None:
            labels = [
                "b" + hashlib.sha1(
                    f"{bnode_seed}|{bnode_start + i}".encode()).hexdigest()[:20]
                for i in range(n)]
            bnode_subjects = pa.array(labels, type=pa.string())
        return bnode_subjects

    def _var_array(var):
        if var == "_row":
            return pc.cast(pa.array(np.arange(1, n + 1)), pa.string())
        if var == "_sourceRow":
            return pc.cast(pa.array(np.arange(1, n + 1) + hrc), pa.string())
        ix = name_to_index.get(var)
        if ix is None or ix >= n_fields or columns[ix].virtual:
            raise _Ineligible("template var")
        arr = fields[ix]
        # binding uses the RAW (post-trim) value; empty or null-set →
        # UriTemplateBindingError → per-cell error in the slow path, and
        # any char outside the safe set breaks encoding/affine guarantees
        mask = pc.match_substring_regex(arr, _SAFE_VALUE_RE)
        nulls = columns[ix].null
        if nulls:
            mask = pc.and_(mask, pc.invert(
                pc.is_in(arr, value_set=pa.array(list(nulls), type=pa.string()))))
        if not pc.all(mask).as_py():
            raise _Ineligible("unsafe template value")
        return arr

    subj_cache: dict = {}

    def _subject(col):
        if col.about_url is None:
            return "b", _bnode_array()
        key = col.about_url.template
        hit = subj_cache.get(key)
        if hit is not None:
            return hit
        parts = _template_parts(col.about_url)
        if parts is None:
            raise _Ineligible("about template")
        prefix, var, suffix = parts
        if var in _CONST_VARS:
            raise _Ineligible("about template const var")
        aff = _affine_resolution(prefix, suffix, table.url)
        if aff is None:
            raise _Ineligible("non-affine about template")
        rp, rs = aff
        arr = _var_array(var)
        subj = pc.binary_join_element_wise(rp, arr, rs, "")
        subj_cache[key] = ("i", subj)
        return "i", subj

    # -- build per-column term tables ---------------------------------------
    out_parts = []
    for col_ix, col in emitting:
        subj_kind, subj = _subject(col)

        if col.property_url is None:
            name = col.name or f"_col.{col_ix + 1}"
            if encode_iris:
                name = _pct_encode_name(name)
            pred = resolve_uri(table.url, "#" + name)
        else:
            tvars = col.property_url.variables
            if any(v not in _CONST_VARS for v in tvars):
                raise _Ineligible("row-varying property template")
            if col.name is None and "_name" in tvars:
                raise _Ineligible("unnamed column with _name property")
            pred = _resolve_const_template(
                col.property_url, table.url, col.name, col_ix, encode_iris)

        dt = col.datatype
        base = dt.base if dt is not None else "string"
        datatype_iri = dt.id if (dt is not None and dt.id is not None) \
            else (get_annotation_iri(base) or XSD_STRING)

        if col.virtual:
            raw = pa.array([col.default if col.default is not None else ""] * n,
                           type=pa.string())
        else:
            if col_ix >= n_fields:
                raise _Ineligible("non-virtual column beyond source fields")
            raw = fields[col_ix]

        # cell normalization (Rdf/CellParser.cs:53-80): whitespace classes
        # by base, empty → default, null-set → no triple
        norm = raw
        if base not in RETAINS_LINE_ENDINGS:
            norm = pc.replace_substring_regex(norm, pattern="[\\t\\n\\r]",
                                              replacement=" ")
        if base not in RETAINS_LEADING_TRAILING_WS:
            norm = pc.utf8_trim_whitespace(norm)
            norm = pc.replace_substring_regex(norm, pattern="\\s+",
                                              replacement=" ")
        default = col.default if col.default is not None else ""
        val = pc.if_else(pc.equal(norm, ""), pa.scalar(default), norm)
        null_arr = pa.array(list(col.null), type=pa.string()) if col.null \
            else None

        if col.separator is not None:
            # unordered list values (CellParser.cs:89-113 → Converter.cs
            # 4.6.8.6): split the normalized cell, re-apply default/null
            # per token, repeat the subject per surviving token
            row_null = pc.is_in(val, value_set=null_arr) \
                if null_arr is not None else None
            tokens = pc.split_pattern(val, pattern=col.separator)
            parents = pc.list_parent_indices(tokens)
            tok = pc.list_flatten(tokens)
            from ..metadata.datatypes import RETAINS_WS_IN_LIST

            if base not in RETAINS_WS_IN_LIST:
                tok = pc.utf8_trim_whitespace(tok)
            tok = pc.if_else(pc.equal(tok, ""), pa.scalar(default), tok)
            keep = pc.invert(pc.is_in(tok, value_set=null_arr)) \
                if null_arr is not None else None
            if row_null is not None and pc.any(row_null).as_py():
                not_null_row = pc.invert(pc.take(row_null, parents))
                keep = not_null_row if keep is None \
                    else pc.and_(keep, not_null_row)
            subj = pc.take(subj, parents)
            val = tok
        else:
            keep = pc.invert(pc.is_in(val, value_set=null_arr)) \
                if null_arr is not None else None

        # literal creation (Converter.cs:533-595 without formats): any
        # value outside the base's lexical space gets a per-cell warning
        # in the slow path — fall back so the error channel matches
        if base == "boolean":
            val = pc.if_else(pc.equal(val, "1"), pa.scalar("true"),
                             pc.if_else(pc.equal(val, "0"), pa.scalar("false"),
                                        val))
        lex = _LEXICAL_RE.get(base)
        if lex is not None:
            ok = pc.match_substring_regex(val, lex)
            if keep is not None:
                ok = pc.or_(ok, pc.invert(keep))  # nulls emit nothing
            if not pc.all(ok).as_py():
                raise _Ineligible("lexical")

        if keep is not None and not pc.all(keep).as_py():
            subj_out = pc.filter(subj, keep)
            val_out = pc.filter(val, keep)
            m = len(val_out)
        else:
            subj_out, val_out, m = subj, val, len(val)
        if m == 0:
            continue

        if datatype_iri == XSD_STRING and col.lang:
            obj_dt, obj_lang = None, col.lang
        elif datatype_iri == XSD_STRING and suppress_string_datatype:
            obj_dt, obj_lang = None, None
        else:
            obj_dt, obj_lang = datatype_iri, None

        out_parts.append(pa.table({
            "subj_kind": pa.array([subj_kind] * m, type=pa.string()),
            "subj": subj_out,
            "pred": pa.array([pred] * m, type=pa.string()),
            "obj_kind": pa.array(["l"] * m, type=pa.string()),
            "obj_value": val_out,
            "obj_datatype": (pa.array([obj_dt] * m, type=pa.string())
                             if obj_dt else pa.nulls(m, type=pa.string())),
            "obj_lang": (pa.array([obj_lang] * m, type=pa.string())
                         if obj_lang else pa.nulls(m, type=pa.string())),
        }))

    if not out_parts:
        empty = {c: pa.nulls(0, type=pa.string()) for c in (
            "subj_kind", "subj", "pred", "obj_kind", "obj_value",
            "obj_datatype", "obj_lang")}
        return pa.table(empty), n
    return pa.concat_tables(out_parts), n
