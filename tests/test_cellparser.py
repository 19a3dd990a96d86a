"""Cell-normalization tests (reference ``Rdf/CellParser.cs:53-149``)."""

from csvweb_ray.convert.cells import normalize_cell_value
from csvweb_ray.metadata.model import ColumnPlan, DatatypeSpec


def col(**kw):
    defaults = dict(name="c")
    defaults.update(kw)
    return ColumnPlan(**defaults)


def test_plain_string_passthrough():
    cell = normalize_cell_value("  hello  world ", col())
    # string datatype retains whitespace
    assert cell.value == "  hello  world "


def test_non_string_collapses_whitespace():
    cell = normalize_cell_value("  42\n7 ", col(datatype=DatatypeSpec(base="decimal")))
    assert cell.normalized == "42 7"


def test_empty_becomes_default():
    cell = normalize_cell_value("", col(default="dflt"))
    assert cell.value == "dflt"


def test_null_set_membership():
    cell = normalize_cell_value("NA", col(null=("NA",)))
    assert cell.value is None


def test_required_null_records_error():
    cell = normalize_cell_value("", col(required=True))
    assert cell.value is None
    assert cell.errors


def test_separator_splits_list():
    cell = normalize_cell_value("a;b; c", col(separator=";"))
    assert cell.is_list
    # string datatype keeps the leading space on ' c'
    assert cell.value_list == ["a", "b", " c"]


def test_separator_trims_non_string():
    cell = normalize_cell_value("1; 2 ;3",
                                col(separator=";", datatype=DatatypeSpec(base="integer")))
    assert cell.value_list == ["1", "2", "3"]


def test_separator_null_whole_cell():
    cell = normalize_cell_value("", col(separator=";"))
    assert cell.is_list and cell.value_list is None


def test_none_raw_value():
    cell = normalize_cell_value(None, col())
    assert cell.value is None and not cell.is_list
