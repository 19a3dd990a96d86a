"""Property-based fast-path ≡ slow-path equivalence fuzzing.

``tests/test_fastpath.py`` pins 28 hand-written schema/CSV cases; this
file drives the same double-conversion harness with *generated* schemas
(random datatype/null/default/separator/lang/template combinations,
including ineligible ones) and generated CSV content (unsafe template
chars, quoted fields, embedded delimiters/newlines, null markers, empty
cells, numeric edge lexicals, ragged rows).  The invariant is the fast
path's contract: whether it fires or declines, the emitted triple SET,
the row count and the error channel must equal the exact per-row
converter's.  Eligibility itself is NOT asserted here — only
equivalence — so every generated case is a valid test regardless of
which path runs.

Deterministic: fixed hypothesis seed via ``derandomize=True``.
"""

from __future__ import annotations

import csv as _csv
import io
import json

from hypothesis import given, settings
from hypothesis import strategies as st

from csvweb_ray.convert.converter import MODE_MINIMAL, convert_file
from csvweb_ray.metadata.parser import parse_metadata

BASE = "http://corpus.invalid/org/repo/data/t.csv"

# -- schema space -----------------------------------------------------------

_DATATYPES = st.sampled_from([
    None, "integer", "decimal", "double", "float", "number", "boolean",
    "string", "date",                      # date → ineligible base
    {"base": "integer", "minimum": 0},     # constraint → ineligible
    {"base": "string", "format": "[a-z]+"},  # format → ineligible
])

_ABOUT_URLS = st.sampled_from([
    None,
    "item/{id}",
    "item/{id}-x",
    "{id}/thing",
    "http://abs.invalid/e/{id}",
    "item/{id}{c1}",      # multi-expression → ineligible
    "row/{_row}",
    "srow/{_sourceRow}",
    "item/{+id}",
    "frag#{id}",
    "name/{_name}",       # const var in aboutUrl → ineligible
])

_PROPERTY_URLS = st.sampled_from([
    None,
    "http://vocab.invalid/#{_name}",
    "http://vocab.invalid/p",
    "{_name}",
    "col/{_column}",
    "http://vocab.invalid/{id}",  # row-varying → ineligible
])


@st.composite
def _column(draw, name: str):
    col: dict = {"name": name}
    dt = draw(_DATATYPES)
    if dt is not None:
        col["datatype"] = dt
    if draw(st.booleans()):
        col["null"] = draw(st.sampled_from([["NA"], ["NA", "-"], [""]]))
    if draw(st.booleans()):
        col["default"] = draw(st.sampled_from(["dflt", "0", ""]))
    if draw(st.integers(0, 5)) == 0:
        col["separator"] = draw(st.sampled_from(["|", ";"]))
        if draw(st.booleans()):
            col["ordered"] = True  # rdf:List → ineligible
    if draw(st.integers(0, 4)) == 0:
        col["lang"] = "en"
    if draw(st.integers(0, 5)) == 0:
        col["suppressOutput"] = True
    if draw(st.integers(0, 6)) == 0:
        col["required"] = True
    return col


@st.composite
def _schema(draw):
    n_cols = draw(st.integers(1, 4))
    names = ["id", "c1", "c2", "c3"][:n_cols]
    cols = [draw(_column(n)) for n in names]
    schema: dict = {"columns": cols}
    about = draw(_ABOUT_URLS)
    if about is not None:
        schema["aboutUrl"] = about
    prop = draw(_PROPERTY_URLS)
    if prop is not None:
        schema["propertyUrl"] = prop
    if draw(st.integers(0, 5)) == 0:
        cols.append({"name": "virt", "virtual": True,
                     "default": "vdefault",
                     "propertyUrl": "http://vocab.invalid/#virt"})
    return schema


# -- CSV content space ------------------------------------------------------

_CELLS = st.sampled_from([
    "1", "42", "-3.5", "1e3", "0", "true", "false", "NaN", "INF",
    "abc", "a_b-C", "x y", "  pad  ", "", "NA", "-",
    'qu"ote', "com,ma", "line\nbreak", "semi;colon", "pipe|bar",
    "a.b", "a/b", "a:b", "ünïcode", "%41", "{brace}", "tab\tchar",
])


@st.composite
def _csv_text(draw, n_fields: int):
    n_rows = draw(st.integers(0, 5))
    buf = io.StringIO()
    w = _csv.writer(buf, lineterminator="\n")
    w.writerow(["id", "c1", "c2", "c3"][:n_fields])
    for _ in range(n_rows):
        width = n_fields
        if draw(st.integers(0, 9)) == 0:
            width = max(1, n_fields + draw(st.sampled_from([-1, 1])))
        w.writerow([draw(_CELLS) for _ in range(width)])
    return buf.getvalue()


# -- the property -----------------------------------------------------------


def _run(meta: dict, csv_text: str, fast: bool, encode_iris: bool):
    group = parse_metadata(json.dumps(meta), BASE,
                           encode_templates=encode_iris)
    return convert_file(group, {t.url: csv_text for t in group.tables},
                        mode=MODE_MINIMAL, suppress_string_datatype=True,
                        bnode_seed="seed|x", encode_iris=encode_iris,
                        fast_tables=fast)


def _triple_set(result):
    out = set()
    for (s, p, o) in result.triples:
        out.add((tuple(s), p, tuple(o)))
    for t in result.tables:
        for r in t.to_pylist():
            o = ("l", r["obj_value"], r["obj_datatype"], r["obj_lang"])
            out.add(((r["subj_kind"], r["subj"]), r["pred"], o))
    return out


@settings(max_examples=250, deadline=None, derandomize=True)
@given(data=st.data())
def test_fast_equals_slow_on_generated_cases(data):
    schema = data.draw(_schema())
    n_fields = sum(1 for c in schema["columns"] if not c.get("virtual"))
    csv_text = data.draw(_csv_text(n_fields))
    encode_iris = data.draw(st.booleans())
    meta = {"@context": "http://www.w3.org/ns/csvw", "url": "t.csv",
            "tableSchema": schema}

    slow = _run(meta, csv_text, fast=False, encode_iris=encode_iris)
    fast = _run(meta, csv_text, fast=True, encode_iris=encode_iris)

    assert not slow.tables  # slow path never emits Arrow term tables
    assert _triple_set(fast) == _triple_set(slow)
    assert fast.rows == slow.rows
    assert fast.errors == slow.errors
