"""Fast-path ≡ slow-path equivalence battery.

Every case converts the same (metadata, CSV) pair twice — once with
``fast_tables=True`` (vectorized Arrow path where eligible) and once with
the exact per-row converter — and asserts identical triple SETS, row
counts and error channels.  Cases marked ``fires=True`` additionally
assert the fast path actually produced Arrow tables (so eligibility
doesn't silently regress), and ``fires=False`` cases assert it correctly
declined.
"""

from __future__ import annotations

import json

import pytest

from csvweb_ray.convert.converter import MODE_MINIMAL, convert_file
from csvweb_ray.metadata.model import CompiledTable, CompiledTableGroup
from csvweb_ray.metadata.parser import parse_metadata

BASE = "http://corpus.invalid/org/repo/data/t.csv"


def _convert(meta: dict | None, csv_text: str, fast: bool,
             encode_iris: bool = False):
    if meta is None:
        group = CompiledTableGroup()
        table = CompiledTable(url=BASE)
        table.columns_declared = False
        group.tables.append(table)
    else:
        group = parse_metadata(json.dumps(meta), BASE,
                               encode_templates=encode_iris)
    result = convert_file(group, {t.url: csv_text for t in group.tables},
                          mode=MODE_MINIMAL, suppress_string_datatype=True,
                          bnode_seed="seed|x", encode_iris=encode_iris,
                          fast_tables=fast)
    return result


def _triple_set(result):
    out = {tuple((tuple(s) if isinstance(s, tuple) else s) for s in ())}
    out = set()
    for (s, p, o) in result.triples:
        out.add((tuple(s), p, tuple(o)))
    for t in result.tables:
        for r in t.to_pylist():
            o = ("l", r["obj_value"], r["obj_datatype"], r["obj_lang"])
            out.add(((r["subj_kind"], r["subj"]), r["pred"], o))
    return out


def _check(meta, csv_text, fires: bool, encode_iris: bool = False):
    slow = _convert(meta, csv_text, fast=False, encode_iris=encode_iris)
    fast = _convert(meta, csv_text, fast=True, encode_iris=encode_iris)
    assert not slow.tables
    assert (len(fast.tables) > 0) == fires, \
        f"fast path {'did not fire' if fires else 'fired unexpectedly'}"
    assert _triple_set(fast) == _triple_set(slow)
    assert fast.rows == slow.rows
    assert fast.errors == slow.errors
    return fast


def _meta(schema: dict, url: str = "t.csv") -> dict:
    return {"@context": "http://www.w3.org/ns/csvw", "url": url,
            "tableSchema": schema}


CSV_BASIC = "id,code,lat,label\n1,AB,4.5,hello world\n2,CD,-3.25,x y\n"


def test_about_template_typed_columns():
    meta = _meta({
        "aboutUrl": "item/{id}",
        "columns": [{"name": "id", "datatype": "integer"},
                    {"name": "code", "datatype": "string"},
                    {"name": "lat", "datatype": "double"},
                    {"name": "label"}]})
    fast = _check(meta, CSV_BASIC, fires=True)
    trips = _triple_set(fast)
    subjects = {s[1] for (s, _, _) in trips}
    assert subjects == {"http://corpus.invalid/org/repo/data/item/1",
                        "http://corpus.invalid/org/repo/data/item/2"}


def test_property_template_name_and_lang():
    meta = _meta({
        "aboutUrl": "item/{id}",
        "propertyUrl": "http://corpus.invalid/vocab#{_name}",
        "columns": [{"name": "id", "datatype": "integer"},
                    {"name": "code"},
                    {"name": "lat", "datatype": "decimal"},
                    {"name": "label", "lang": "en"}]})
    fast = _check(meta, CSV_BASIC, fires=True)
    preds = {p for (_, p, _) in _triple_set(fast)}
    assert "http://corpus.invalid/vocab#code" in preds


def test_inferred_schema_bnode_subjects():
    fast = _check(None, CSV_BASIC, fires=True)
    kinds = {s[0] for (s, _, _) in _triple_set(fast)}
    assert kinds == {"b"}


def test_bnode_labels_match_slow_path_exactly():
    # labels are part of the set comparison already; this pins the format
    fast = _convert(None, CSV_BASIC, fast=True)
    labels = sorted({s[1] for (s, _, _) in _triple_set(fast)})
    assert all(lbl.startswith("b") and len(lbl) == 21 for lbl in labels)


def test_null_set_and_default():
    meta = _meta({
        "aboutUrl": "item/{id}",
        "columns": [{"name": "id", "datatype": "integer"},
                    {"name": "code", "null": ["NA"], "default": "zz"}]})
    csv_text = "id,code\n1,NA\n2,\n3,ok\n"
    fast = _check(meta, csv_text, fires=True)
    vals = sorted(o[1] for (_, p, o) in _triple_set(fast)
                  if p.endswith("#code"))
    assert vals == ["ok", "zz"]  # NA dropped, empty -> default


def test_boolean_normalization():
    meta = _meta({
        "aboutUrl": "item/{id}",
        "columns": [{"name": "id", "datatype": "integer"},
                    {"name": "flag", "datatype": "boolean"}]})
    fast = _check(meta, "id,flag\n1,1\n2,false\n3,0\n", fires=True)
    vals = sorted(o[1] for (_, p, o) in _triple_set(fast)
                  if p.endswith("#flag"))
    assert vals == ["false", "false", "true"]


def test_virtual_column_constant():
    meta = _meta({
        "aboutUrl": "item/{id}",
        "columns": [{"name": "id", "datatype": "integer"},
                    {"name": "kind", "virtual": True, "default": "place",
                     "propertyUrl": "http://corpus.invalid/vocab#kind"}]})
    fast = _check(meta, "id\n1\n2\n", fires=True)
    vals = [o[1] for (_, p, o) in _triple_set(fast) if p.endswith("#kind")]
    assert sorted(vals) == ["place", "place"]


def test_trim_true():
    meta = _meta({
        "aboutUrl": "item/{id}",
        "columns": [{"name": "id", "datatype": "integer"},
                    {"name": "label"}]})
    meta["dialect"] = {"trim": True}
    _check(meta, "id,label\n 1 ,  padded  \n", fires=True)


def test_header_only_zero_rows():
    meta = _meta({"aboutUrl": "item/{id}",
                  "columns": [{"name": "id", "datatype": "integer"}]})
    fast = _check(meta, "id\n", fires=True)
    assert fast.rows == 0 and not _triple_set(fast)


def test_separator_unordered_list():
    meta = _meta({
        "columns": [{"name": "id", "datatype": "integer"},
                    {"name": "tags", "separator": ";"}]})
    fast = _check(meta, "id,tags\n1,a;b;c\n2,\n3,x\n", fires=True)
    vals = sorted(o[1] for (_, p, o) in _triple_set(fast)
                  if p.endswith("#tags"))
    assert vals == ["a", "b", "c", "x"]


def test_separator_null_and_default_per_token():
    meta = _meta({
        "columns": [{"name": "id", "datatype": "integer"},
                    {"name": "tags", "separator": ";", "null": ["NA"],
                     "default": "dd"}]})
    fast = _check(meta, "id,tags\n1,a;NA;;b\n2,NA\n", fires=True)
    vals = sorted(o[1] for (_, p, o) in _triple_set(fast)
                  if p.endswith("#tags"))
    # row 2's whole cell is null -> no list at all; row 1: NA token dropped,
    # empty token -> default
    assert vals == ["a", "b", "dd"]


def test_separator_numeric_tokens_trimmed():
    meta = _meta({
        "columns": [{"name": "id", "datatype": "integer"},
                    {"name": "ns", "separator": ",", "datatype": "integer"}]})
    fast = _check(meta, 'id,ns\n1,"1, 2, 3"\n', fires=True)
    vals = sorted(o[1] for (_, p, o) in _triple_set(fast)
                  if p.endswith("#ns"))
    assert vals == ["1", "2", "3"]


def test_ordered_list_falls_back():
    meta = _meta({
        "columns": [{"name": "id", "datatype": "integer"},
                    {"name": "tags", "separator": ";", "ordered": True}]})
    _check(meta, "id,tags\n1,a;b\n", fires=False)


def test_unsafe_about_value_falls_back():
    meta = _meta({
        "aboutUrl": "item/{code}",
        "columns": [{"name": "code"}, {"name": "v"}]})
    _check(meta, "code,v\na/b,1\n", fires=False)


def test_lexical_violation_falls_back_with_error_parity():
    meta = _meta({
        "aboutUrl": "item/{id}",
        "columns": [{"name": "id", "datatype": "integer"},
                    {"name": "n", "datatype": "integer"}]})
    fast = _check(meta, "id,n\n1,abc\n", fires=False)
    assert fast.errors  # slow path emitted the lexical warning


def test_ragged_rows_fall_back():
    meta = _meta({
        "aboutUrl": "item/{id}",
        "columns": [{"name": "id", "datatype": "integer"},
                    {"name": "a"}, {"name": "b"}]})
    _check(meta, "id,a,b\n1,x\n2,y,z,extra\n", fires=False)


def test_quoted_values_and_embedded_newlines():
    meta = _meta({
        "aboutUrl": "item/{id}",
        "columns": [{"name": "id", "datatype": "integer"},
                    {"name": "text"}]})
    csv_text = 'id,text\n1,"line one\nline two"\n2,"with ""quotes"""\n'
    _check(meta, csv_text, fires=True)


def test_row_variable_in_about():
    meta = _meta({
        "aboutUrl": "row/{_row}",
        "columns": [{"name": "a"}, {"name": "b"}]})
    fast = _check(meta, "a,b\nx,y\nz,w\n", fires=True)
    subjects = {s[1] for (s, _, _) in _triple_set(fast)}
    assert subjects == {"http://corpus.invalid/org/repo/data/row/1",
                        "http://corpus.invalid/org/repo/data/row/2"}


def test_encode_iris_mode():
    meta = _meta({
        "aboutUrl": "item/{id}",
        "columns": [{"name": "id", "datatype": "integer"},
                    {"name": "my col"}]})
    _check(meta, "id,my col\n1,v\n", fires=True, encode_iris=True)


def test_suppressed_column_is_template_source_only():
    meta = _meta({
        "aboutUrl": "item/{id}",
        "columns": [{"name": "id", "datatype": "integer",
                     "suppressOutput": True},
                    {"name": "label"}]})
    fast = _check(meta, "id,label\n7,seven\n", fires=True)
    preds = {p for (_, p, _) in _triple_set(fast)}
    assert all(not p.endswith("#id") for p in preds)


def test_standard_mode_never_fast():
    from csvweb_ray.convert.converter import MODE_STANDARD

    meta = _meta({"aboutUrl": "item/{id}",
                  "columns": [{"name": "id", "datatype": "integer"}]})
    group = parse_metadata(json.dumps(meta), BASE)
    res = convert_file(group, {t.url: "id\n1\n" for t in group.tables},
                       mode=MODE_STANDARD, suppress_string_datatype=True,
                       bnode_seed="s", fast_tables=True)
    assert not res.tables and res.triples


def test_multi_table_group_counter_consistency():
    # two tables under one metadata root: first fast, second slow
    # (separator) — bnode labels of the slow table must match an all-slow
    # run (the fast table advances the counter identically)
    meta = {"@context": "http://www.w3.org/ns/csvw", "tables": [
        {"url": "a.csv", "tableSchema": {
            "columns": [{"name": "x"}]}},
        {"url": "b.csv", "tableSchema": {
            "columns": [{"name": "tags", "separator": ";"}]}},
    ]}
    base_root = "http://corpus.invalid/org/repo/data/meta.json"
    group = parse_metadata(json.dumps(meta), base_root)
    texts = {"http://corpus.invalid/org/repo/data/a.csv": "x\n1\n2\n",
             "http://corpus.invalid/org/repo/data/b.csv": "tags\np;q\n"}
    slow = convert_file(group, texts, mode=MODE_MINIMAL,
                        suppress_string_datatype=True, bnode_seed="s",
                        fast_tables=False)
    group2 = parse_metadata(json.dumps(meta), base_root)
    fast = convert_file(group2, texts, mode=MODE_MINIMAL,
                        suppress_string_datatype=True, bnode_seed="s",
                        fast_tables=True)
    assert fast.tables  # table a went fast
    assert _triple_set(fast) == _triple_set(slow)


@pytest.mark.parametrize("base,val,ok", [
    ("integer", "42", True), ("integer", "+7", True),
    ("double", "4.5e2", True), ("double", "NaN", True),
    ("decimal", "-.5", True), ("number", "INF", True),
])
def test_numeric_lexicals_stay_fast(base, val, ok):
    meta = _meta({
        "aboutUrl": "item/{id}",
        "columns": [{"name": "id", "datatype": "integer"},
                    {"name": "v", "datatype": base}]})
    _check(meta, f"id,v\n1,{val}\n", fires=ok)
