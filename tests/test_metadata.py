"""Metadata-compiler tests, mirroring ``Tests/JsonMetadataParserSpec.cs``
scenarios: inherited-property flattening, title→name fallback, ``_col.N``
defaults, dialect parsing, date-looking defaults kept as strings."""

import pytest

from csvweb_ray.metadata.model import MetadataParseError
from csvweb_ray.metadata.parser import parse_metadata

BASE = "http://example.org/metadata.json"


def test_single_table_root():
    g = parse_metadata('{"url": "t.csv"}', BASE)
    assert len(g.tables) == 1
    assert g.tables[0].url == "http://example.org/t.csv"
    assert not g.tables[0].columns_declared


def test_table_group_root():
    g = parse_metadata('{"tables": [{"url": "a.csv"}, {"url": "b.csv"}]}', BASE)
    assert [t.url for t in g.tables] == [
        "http://example.org/a.csv", "http://example.org/b.csv"]


def test_inherited_about_url_flattened_to_columns():
    g = parse_metadata('''{
      "url": "t.csv",
      "aboutUrl": "http://e.org/{id}",
      "tableSchema": {"columns": [{"name": "id"}, {"name": "v", "aboutUrl": "http://o.org/{id}"}]}
    }''', BASE)
    cols = g.tables[0].columns
    assert cols[0].about_url.template == "http://e.org/{id}"
    assert cols[1].about_url.template == "http://o.org/{id}"


def test_title_name_fallback_und():
    g = parse_metadata('''{"url": "t.csv",
      "tableSchema": {"columns": [{"titles": "GID"}, {"titles": {"fr": "rue"}}]}}''', BASE)
    cols = g.tables[0].columns
    assert cols[0].name == "GID"
    assert cols[1].name == "_col.2"  # no und/default-language title


def test_context_language_title_fallback():
    g = parse_metadata('''{"@context": ["http://www.w3.org/ns/csvw", {"@language": "en"}],
      "url": "t.csv",
      "tableSchema": {"columns": [{"titles": "Name"}]}}''', BASE)
    assert g.tables[0].columns[0].name == "Name"


def test_datatype_shorthand():
    g = parse_metadata('''{"url": "t.csv",
      "tableSchema": {"columns": [{"name": "lat", "datatype": "decimal"}]}}''', BASE)
    assert g.tables[0].columns[0].datatype.base == "decimal"


def test_date_looking_default_kept_as_string():
    g = parse_metadata('''{"url": "t.csv",
      "tableSchema": {"columns": [{"name": "d", "default": "2015-03-22"}]}}''', BASE)
    assert g.tables[0].columns[0].default == "2015-03-22"


def test_virtual_column():
    g = parse_metadata('''{"url": "t.csv",
      "tableSchema": {"columns": [{"name": "a"}, {"virtual": true, "default": "x",
        "propertyUrl": "http://e.org/p"}]}}''', BASE)
    assert g.tables[0].columns[1].virtual
    assert g.tables[0].columns[1].default == "x"


def test_dialect_parsing():
    g = parse_metadata('''{"url": "t.csv",
      "dialect": {"delimiter": ";", "header": false, "trim": "start",
                  "skipRows": 2, "encoding": "latin1"}}''', BASE)
    d = g.tables[0].dialect
    assert d.delimiter == ";"
    assert not d.header
    assert d.effective_header_row_count() == 0
    assert d.effective_trim() == "start"
    assert d.skip_rows == 2


def test_bad_encoding_warns_and_falls_back():
    g = parse_metadata('{"url": "t.csv", "dialect": {"encoding": "nope-8"}}', BASE)
    assert g.tables[0].dialect.encoding == "utf-8"
    assert any("encoding" in w.path for w in g.warnings)


def test_duplicate_column_names_fatal():
    with pytest.raises(MetadataParseError):
        parse_metadata('''{"url": "t.csv",
          "tableSchema": {"columns": [{"name": "a"}, {"name": "a"}]}}''', BASE)


def test_virtual_before_nonvirtual_fatal():
    with pytest.raises(MetadataParseError):
        parse_metadata('''{"url": "t.csv",
          "tableSchema": {"columns": [{"name": "a", "virtual": true}, {"name": "b"}]}}''', BASE)


def test_root_must_be_object():
    with pytest.raises(MetadataParseError):
        parse_metadata('[1,2]', BASE)


def test_unrecognized_root():
    with pytest.raises(MetadataParseError):
        parse_metadata('{"foo": 1}', BASE)


def test_trailing_commas_tolerated():
    g = parse_metadata('{"url": "t.csv", "tableSchema": {"columns": [{"name": "a"},]},}', BASE)
    assert g.tables[0].columns[0].name == "a"


def test_null_inheritance_from_schema():
    # deliberate divergence from the reference (which loses schema-level
    # null defaults); see model.py docstring
    g = parse_metadata('''{"url": "t.csv", "null": "NA",
      "tableSchema": {"columns": [{"name": "a"}]}}''', BASE)
    assert g.tables[0].columns[0].null == ("NA",)
