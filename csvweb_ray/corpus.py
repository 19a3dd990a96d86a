"""Deterministic synthetic source-code-repository corpus.

The pipeline's input contract (BASELINE.json ``input_hint``) is a Parquet
table ``(repo:string, path:string, commit:string, lang:string,
content:string)``.  This module builds that table three ways, all
seed-deterministic (FIXTURES.md §1):

1. ``fixture_corpus_rows``   — the reference golden pairs (countries.csv ×
   metadata variants, ``ConverterSpec.cs:43-58``) and, optionally, W3C
   suite cases, one repo per conversion so path-convention metadata
   discovery (``Rdf/Converter.cs:141-207``) finds the right file.
2. ``table_corpus_rows``     — renders a pyarrow table (e.g. the driver's
   ``documents`` table) into CSV files + CSVW metadata inside synthetic
   repos; used by ``__ray_entry__.entry()`` so the flagship pipeline runs
   over ``/root/testdata`` content.
3. ``synth_corpus_rows``     — scale filler: countries-like CSVs with
   parameterized row counts and a skewed repo-size distribution (one giant
   repo holding ~half the files) to exercise salted repartitioning.

Rows also include non-CSVW noise files that the scan stage must filter out.
"""

from __future__ import annotations

import csv
import hashlib
import io
import json
import os
import random

import pyarrow as pa

CORPUS_FIELDS = ["repo", "path", "commit", "lang", "content"]

CORPUS_SCHEMA = pa.schema([
    ("repo", pa.string()),
    ("path", pa.string()),
    ("commit", pa.string()),
    ("lang", pa.string()),
    ("content", pa.string()),
])

#: Synthetic URI scheme under which corpus files are "served"; the convert
#: stage resolves metadata-relative table URLs against this base.
REPO_BASE = "http://corpus.invalid/"


def file_base_uri(repo: str, path: str) -> str:
    return f"{REPO_BASE}{repo}/{path}"


def _commit(repo: str) -> str:
    return hashlib.sha1(f"commit|{repo}".encode()).hexdigest()


def _lang_for(path: str) -> str:
    if path.endswith(".csv"):
        return "csv"
    if path.endswith(".json"):
        return "json"
    if path.endswith(".py"):
        return "python"
    if path.endswith(".md"):
        return "markdown"
    return "text"


def _row(repo: str, path: str, content: str) -> dict:
    return {"repo": repo, "path": path, "commit": _commit(repo),
            "lang": _lang_for(path), "content": content}


# ---------------------------------------------------------------------------
# 1. Reference golden fixtures as corpus rows

#: (repo-name, csv fixture, metadata fixture, original table url, expected
#: ttl) — metadata lands as ``csv-metadata.json`` so same-directory
#: discovery picks it up.  The reference tests serve the CSV at an
#: arbitrary logical URL via a mocked resolver (``ConverterSpec.cs:43-58``);
#: in a Parquet corpus the CSV is addressed by its path, so the metadata's
#: table url is rewritten to the in-repo file URL at embed time and the
#: expected TTL is rewritten identically for comparison.
GOLDEN_PAIRS = [
    ("golden/valid-table-1", "countries.csv", "valid-table-1.json",
     "http://example.org/countries.csv", "valid-table-1-out.ttl"),
    ("golden/valid-table-2", "countries.csv", "valid-table-2.json",
     "http://example.org/countries.csv", "valid-table-2-out.ttl"),
    ("golden/valid-table-3", "countries.csv", "valid-table-3.json",
     "http://example.org/countries.csv", "valid-table-3-out.ttl"),
    ("golden/valid-table-4", "countries.csv", "valid-table-4.json",
     "http://example.org/countries.csv", "valid-table-4-out.ttl"),
    ("golden/valid-table-5", "countries.csv", "valid-table-5.json",
     "http://example.org/countries.csv", "valid-table-5-out.ttl"),
    ("golden/valid-table-6", "countries.csv", "valid-table-6.json",
     "http://example.org/countries.csv", "valid-table-6-out.ttl"),
    ("golden/valid-table-7", "countries.csv", "valid-table-7.json",
     "http://example.org/countries.csv", "valid-table-7-out.ttl"),
    ("golden/valid-table-9", "countries.csv", "valid-table-9.json",
     "http://example.org/countries.csv", "valid-table-9-out.ttl"),
    ("golden/valid-table-suppressed", "countries.csv", "valid-table-suppressed-columns.json",
     "http://example.org/countries.csv", "valid-table-suppressed-columns-out.ttl"),
    ("golden/virtual-column", "countries.csv", "virtual-column-with-default-1.json",
     "http://example.org/countries.csv", "virtual-column-with-default-1-out.ttl"),
    ("golden/empty-column", "empty_column.csv", "empty_column.metadata.json",
     "http://example.org/data/empty_column", "empty_column.out.ttl"),
    ("golden/escaping", "escaping.csv", "escaping.metadata.json",
     "http://example.org/data/escaping", "escaping.out.ttl"),
    ("golden/dateTime", "dateTime.csv", "dateTime.json",
     "http://datadock.io/kal/data_dev/id/dataset/dateTime", "dateTime.ttl"),
]


def fixture_corpus_rows(fixtures_dir: str) -> list[dict]:
    """Golden conversion pairs, one repo per pair, table url rewritten to
    the in-corpus file URL so path-convention discovery works."""
    rows = []
    for repo, csv_name, meta_name, orig_url, _ttl in GOLDEN_PAIRS:
        with open(os.path.join(fixtures_dir, csv_name), encoding="utf-8-sig") as fh:
            csv_text = fh.read()
        with open(os.path.join(fixtures_dir, meta_name), encoding="utf-8-sig") as fh:
            meta_text = fh.read()
        meta_text = meta_text.replace(orig_url, file_base_uri(repo, csv_name))
        rows.append(_row(repo, csv_name, csv_text))
        rows.append(_row(repo, "csv-metadata.json", meta_text))
        # noise the scan stage must drop
        rows.append(_row(repo, "README.md", f"# {repo}\n"))
        rows.append(_row(repo, "build.py", "print('not a csv')\n"))
    return rows


def golden_expected_triples(fixtures_dir: str) -> dict[str, list]:
    """repo → expected term-tuple triples, table url rewritten to match the
    corpus embedding (minimal mode, as ``ConverterSpec.cs:60-94`` runs)."""
    from .rdf.turtle import parse_turtle

    out = {}
    for repo, csv_name, _meta, orig_url, ttl in GOLDEN_PAIRS:
        with open(os.path.join(fixtures_dir, ttl), encoding="utf-8-sig") as fh:
            text = fh.read()
        text = text.replace(orig_url, file_base_uri(repo, csv_name))
        out[repo] = parse_turtle(text, base=file_base_uri(repo, csv_name))
    return out


# ---------------------------------------------------------------------------
# 2. Corpus rendered from an arbitrary Arrow table (driver testdata)

def table_corpus_rows(table: pa.Table, name: str, rows_per_file: int = 100,
                      repo_prefix: str = "org0/data") -> list[dict]:
    """Split ``table`` into CSV files of ``rows_per_file`` rows each, with a
    per-file CSVW metadata document (typed columns, ``aboutUrl`` template) —
    the flagship pipeline's input when driven from ``/root/testdata``."""
    cols = table.column_names
    first = cols[0]
    xsd = {
        pa.int64(): "integer", pa.int32(): "integer",
        pa.float64(): "double", pa.float32(): "double",
        pa.bool_(): "boolean",
    }
    columns_meta = []
    for f in table.schema:
        dt = xsd.get(f.type, "string")
        columns_meta.append({"name": f.name, "datatype": dt})
    rows = []
    n = table.num_rows
    for start in range(0, n, rows_per_file):
        chunk = table.slice(start, rows_per_file).to_pylist()
        shard = start // rows_per_file
        repo = f"{repo_prefix}{shard % 4}"
        csv_path = f"{name}/{name}_{shard:04d}.csv"
        buf = io.StringIO()
        writer = csv.writer(buf, lineterminator="\n")
        writer.writerow(cols)
        for r in chunk:
            writer.writerow(["" if r[c] is None else r[c] for c in cols])
        meta = {
            "@context": "http://www.w3.org/ns/csvw",
            "url": os.path.basename(csv_path),
            "tableSchema": {
                "columns": columns_meta,
                "aboutUrl": f"{name}/{{{first}}}",
            },
        }
        rows.append(_row(repo, csv_path, buf.getvalue()))
        rows.append(_row(repo, f"{name}/{name}_{shard:04d}.csv-metadata.json",
                         json.dumps(meta, indent=1)))
    return rows


# ---------------------------------------------------------------------------
# 3. Generated scale filler (bench / skew)

_WORDS = ("alpha beta gamma delta epsilon zeta eta theta iota kappa lam mu nu xi "
          "omicron pi rho sigma tau upsilon phi chi psi omega").split()

_META_VARIANTS = [
    # (suffix, schema-builder) — cycled per generated file
    lambda u: {"@context": "http://www.w3.org/ns/csvw", "url": u, "tableSchema": {
        "aboutUrl": "item/{id}",
        "columns": [{"name": "id", "datatype": "integer"},
                    {"name": "code", "datatype": "string"},
                    {"name": "lat", "datatype": "double"},
                    {"name": "lon", "datatype": "double"},
                    {"name": "label", "datatype": "string"}]}},
    lambda u: {"@context": "http://www.w3.org/ns/csvw", "url": u, "tableSchema": {
        "aboutUrl": "item/{id}", "propertyUrl": "http://corpus.invalid/vocab#{_name}",
        "columns": [{"name": "id", "datatype": "integer"},
                    {"name": "code"},
                    {"name": "lat", "datatype": "decimal"},
                    {"name": "lon", "datatype": "decimal"},
                    {"name": "label", "lang": "en"}]}},
    lambda u: {"@context": "http://www.w3.org/ns/csvw", "url": u, "tableSchema": {
        "columns": [{"name": "id", "datatype": "integer"},
                    {"name": "code", "null": ["NA"]},
                    {"name": "lat", "datatype": "double"},
                    {"name": "lon", "datatype": "double"},
                    {"name": "label", "separator": ";"},
                    {"name": "kind", "virtual": True, "default": "place",
                     "propertyUrl": "http://corpus.invalid/vocab#kind"}]}},
]


def synth_corpus_rows(n_files: int = 64, rows_per_file: int = 200, seed: int = 42,
                      giant_frac: float = 0.5, n_small_repos: int = 16) -> list[dict]:
    """Countries-like generated corpus.

    ``giant_frac`` of the files land in one giant repo (FIXTURES.md: "one
    'giant' repo with ~50% of files to exercise salted repartitioning");
    the rest round-robin over ``n_small_repos`` small repos.
    """
    rng = random.Random(seed)
    rows = []
    for i in range(n_files):
        if i < n_files * giant_frac:
            repo = "bigorg/monorepo"
        else:
            repo = f"org{i % n_small_repos}/repo{i % n_small_repos}"
        stem = f"data/t{i:05d}"
        csv_name = f"{stem}.csv"
        buf = io.StringIO()
        writer = csv.writer(buf, lineterminator="\n")
        writer.writerow(["id", "code", "lat", "lon", "label"])
        for r in range(rows_per_file):
            label = " ".join(rng.choice(_WORDS) for _ in range(3))
            if i % 3 == 2 and r % 7 == 0:
                label = label.replace(" ", ";")  # list values for separator variant
            code = "NA" if (i % 3 == 2 and r % 11 == 0) else rng.choice(_WORDS)[:3].upper()
            writer.writerow([r, code, round(rng.uniform(-90, 90), 4),
                             round(rng.uniform(-180, 180), 4), label])
        meta = _META_VARIANTS[i % len(_META_VARIANTS)](os.path.basename(csv_name))
        rows.append(_row(repo, csv_name, buf.getvalue()))
        rows.append(_row(repo, f"{stem}.csv-metadata.json", json.dumps(meta)))
        if i % 5 == 0:
            rows.append(_row(repo, f"{stem}.md", "docs\n"))
    return rows


#: Optional sidecar columns modeling the reference's non-path metadata
#: discovery channels (``Rdf/Converter.cs:125-207``) in a Parquet corpus:
#: ``user_metadata`` = repo-relative path of user-supplied metadata (the
#: ``ConvertWithLocalMetadata`` channel, highest precedence, conversion
#: rooted at the metadata document); ``link_header`` = raw HTTP ``Link``
#: header value associated with the CSV (``rel="describedby"``);
#: ``convert_root`` = mark on a metadata JSON row making it a conversion
#: root even with no CSV row naming it (the "source IS the metadata"
#: entry point, ``Rdf/Converter.cs:109-112``).
SIDECAR_FIELDS = ["user_metadata", "link_header", "convert_root"]


def rows_to_table(rows: list[dict]) -> pa.Table:
    schema = CORPUS_SCHEMA
    extra = [f for f in SIDECAR_FIELDS if any(r.get(f) is not None for r in rows)]
    for f in extra:
        schema = schema.append(pa.field(f, pa.string()))
    return pa.Table.from_pylist(rows, schema=schema)


def write_corpus(rows: list[dict], out_path: str, files: int = 1) -> str:
    """Write corpus rows as parquet: one file, or (``files`` > 1) a
    DIRECTORY of ``part-*.parquet``.  Ray parallelizes parquet reads per
    FILE, so a single-file corpus serializes the whole decode into one
    read task and chains every downstream groupby's partition count to
    that one task's block split — a layout artifact no real corpus has
    (100 TB is millions of files).  Row content and order are identical
    either way."""
    import pyarrow.parquet as pq

    table = rows_to_table(rows)
    if files <= 1:
        os.makedirs(os.path.dirname(out_path) or ".", exist_ok=True)
        pq.write_table(table, out_path)
        return out_path
    os.makedirs(out_path, exist_ok=True)
    n = table.num_rows
    per = (n + files - 1) // files
    for i in range(files):
        chunk = table.slice(i * per, per)
        if chunk.num_rows:
            pq.write_table(chunk, os.path.join(out_path, f"part-{i:05d}.parquet"))
    return out_path
