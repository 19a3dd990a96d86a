"""The 13 reference golden conversion pairs
(``Tests/ConverterSpec.cs:43-58``), compared by graph isomorphism in
minimal mode with reference-parity options (no IRI encoding, short offsets)."""

import os

import pytest

from csvweb_ray.convert.converter import MODE_MINIMAL, convert_file
from csvweb_ray.metadata.parser import parse_metadata
from csvweb_ray.rdf.compare import isomorphic
from csvweb_ray.rdf.turtle import parse_turtle

CASES = [
    ("valid-table-1.json", "countries.csv", "valid-table-1-out.ttl"),
    ("valid-table-2.json", "countries.csv", "valid-table-2-out.ttl"),
    ("valid-table-3.json", "countries.csv", "valid-table-3-out.ttl"),
    ("valid-table-4.json", "countries.csv", "valid-table-4-out.ttl"),
    ("valid-table-5.json", "countries.csv", "valid-table-5-out.ttl"),
    ("valid-table-6.json", "countries.csv", "valid-table-6-out.ttl"),
    ("valid-table-7.json", "countries.csv", "valid-table-7-out.ttl"),
    ("valid-table-suppressed-columns.json", "countries.csv",
     "valid-table-suppressed-columns-out.ttl"),
    ("empty_column.metadata.json", "empty_column.csv", "empty_column.out.ttl"),
    ("escaping.metadata.json", "escaping.csv", "escaping.out.ttl"),
    ("valid-table-9.json", "countries.csv", "valid-table-9-out.ttl"),
    ("virtual-column-with-default-1.json", "countries.csv",
     "virtual-column-with-default-1-out.ttl"),
    ("dateTime.json", "dateTime.csv", "dateTime.ttl"),
]


@pytest.mark.parametrize("metadata_file,csv_file,expected_ttl", CASES)
def test_golden_conversion(fixtures_dir, metadata_file, csv_file, expected_ttl):
    def read(name):
        with open(os.path.join(fixtures_dir, name), encoding="utf-8-sig") as fh:
            return fh.read()

    group = parse_metadata(read(metadata_file), "http://example.org/metadata.json")
    csv_text = read(csv_file)
    result = convert_file(group, {t.url: csv_text for t in group.tables},
                          mode=MODE_MINIMAL, bnode_seed=metadata_file)
    assert result.errors == []
    expected = parse_turtle(read(expected_ttl), base=group.tables[0].url)
    assert isomorphic(result.triples, expected), (
        f"graphs differ for {metadata_file}")


def test_deterministic_bnodes(fixtures_dir):
    def read(name):
        with open(os.path.join(fixtures_dir, name), encoding="utf-8-sig") as fh:
            return fh.read()

    group = parse_metadata(read("valid-table-1.json"), "http://example.org/metadata.json")
    csv_text = read("countries.csv")
    a = convert_file(group, {t.url: csv_text for t in group.tables},
                     mode=MODE_MINIMAL, bnode_seed="seed")
    b = convert_file(group, {t.url: csv_text for t in group.tables},
                     mode=MODE_MINIMAL, bnode_seed="seed")
    assert a.triples == b.triples  # identical labels, not just isomorphic
    c = convert_file(group, {t.url: csv_text for t in group.tables},
                     mode=MODE_MINIMAL, bnode_seed="other")
    assert a.triples != c.triples
