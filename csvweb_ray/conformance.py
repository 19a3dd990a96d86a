"""W3C CSVW csv2rdf conformance harness.

Reads the test manifest (``manifest-rdf.ttl``) with our own Turtle parser
and runs each case through the conversion core, emulating the reference's
metadata-discovery precedence (``Rdf/Converter.cs:141-207``) over a local
file mapping instead of HTTP:

1. user-supplied metadata (``csvt:metadata`` option) — highest precedence
2. ``Link rel=describedby`` header (``csvt:httpLink``)
3. ``{url}-metadata.json``
4. same-directory ``csv-metadata.json``
5. none → bare table group, header-inferred all-string schema

The same runner is reused by the pytest conformance gate and by the corpus
synthesizer (each fixture file becomes a corpus row; see tools/make_corpus.py).
"""

from __future__ import annotations

import os
from dataclasses import dataclass, field

from .convert.converter import MODE_MINIMAL, MODE_STANDARD, convert_file
from .metadata.model import MetadataParseError
from .metadata.normalizer import lenient_json_loads
from .metadata.parser import parse_metadata
from .rdf.compare import precision_recall
from .rdf.turtle import parse_turtle

CSVWT = "http://www.w3.org/2013/csvw/tests/vocab#"
MF = "http://www.w3.org/2001/sw/DataAccess/tests/test-manifest#"
RDFT = "http://www.w3.org/ns/rdftest#"
RDF_NS = "http://www.w3.org/1999/02/22-rdf-syntax-ns#"

# Virtual base under which the fixture tree is "served"; expected TTLs are
# parsed against the same base so relative IRIs line up.
DEFAULT_BASE = "http://www.w3.org/2013/csvw/tests/"


@dataclass
class SuiteTest:
    id: str
    name: str
    test_type: str  # "ToRdfTest" | "ToRdfTestWithWarnings" | "NegativeRdfTest"
    action: str  # path relative to suite root
    result: str | None = None
    minimal: bool = False
    no_prov: bool = False
    metadata: str | None = None  # user metadata file (relative path)
    implicit: list = field(default_factory=list)
    http_link: str | None = None


def _obj_values(triples, subject, predicate):
    return [o for (s, p, o) in triples if s == subject and p == predicate]


def _read_list(triples, head):
    items = []
    nil = ("i", RDF_NS + "nil")
    while head != nil:
        first = _obj_values(triples, head, RDF_NS + "first")
        rest = _obj_values(triples, head, RDF_NS + "rest")
        if not first or not rest:
            break
        items.append(first[0])
        head = rest[0]
    return items


def read_manifest(manifest_path: str, base: str = DEFAULT_BASE) -> list[SuiteTest]:
    with open(manifest_path, "r", encoding="utf-8-sig") as fh:
        text = fh.read()
    triples = parse_turtle(text, base=base)

    def rel(uri_node):
        if uri_node is None or uri_node[0] != "i":
            return None
        value = uri_node[1]
        return value[len(base):] if value.startswith(base) else value

    tests = []
    manifests = [s for (s, p, o) in triples
                 if p == RDF_NS + "type" and o == ("i", MF + "Manifest")]
    for mnode in manifests:
        entries = _obj_values(triples, mnode, MF + "entries")
        if not entries:
            continue
        for tnode in _read_list(triples, entries[0]):
            types = _obj_values(triples, tnode, RDF_NS + "type")
            ttype = None
            for t in types:
                if t[0] == "i" and t[1].startswith(CSVWT):
                    ttype = t[1][len(CSVWT):]
            if ttype is None:
                continue
            approvals = _obj_values(triples, tnode, RDFT + "approval")
            if ("i", RDFT + "Approved") not in approvals:
                continue
            names = _obj_values(triples, tnode, MF + "name")
            actions = _obj_values(triples, tnode, MF + "action")
            results = _obj_values(triples, tnode, MF + "result")
            options = _obj_values(triples, tnode, CSVWT + "option")
            minimal = no_prov = False
            metadata = None
            if options:
                opt = options[0]
                for o in _obj_values(triples, opt, CSVWT + "minimal"):
                    minimal = o[0] == "l" and o[1] == "true"
                for o in _obj_values(triples, opt, CSVWT + "noProv"):
                    no_prov = o[0] == "l" and o[1] == "true"
                for o in _obj_values(triples, opt, CSVWT + "metadata"):
                    metadata = rel(o)
            implicit = [rel(o) for o in _obj_values(triples, tnode, CSVWT + "implicit")]
            link_values = [o[1] for o in _obj_values(triples, tnode, CSVWT + "httpLink")
                           if o[0] == "l"]
            test_id = tnode[1].split("#")[-1] if tnode[0] == "i" else repr(tnode)
            tests.append(SuiteTest(
                id=test_id,
                name=names[0][1] if names else test_id,
                test_type=ttype,
                action=rel(actions[0]) if actions else None,
                result=rel(results[0]) if results else None,
                minimal=minimal,
                no_prov=no_prov,
                metadata=metadata,
                implicit=[p for p in implicit if p],
                http_link=link_values[0] if link_values else None,
            ))
    return tests


@dataclass
class SuiteOutcome:
    test_id: str
    passed: bool
    precision: float = 1.0
    recall: float = 1.0
    actual_count: int = 0
    expected_count: int = 0
    errors: list = field(default_factory=list)
    note: str = ""


def _parse_link_header(link_header: str) -> str | None:
    """Extract the target of a ``<target>; rel="describedby"`` Link value
    (reference ``Rdf/Converter.cs:166-189``)."""
    parts = [p.replace(" ", "") for p in link_header.split(";")]
    interesting = any(
        p.lower() == 'rel="describedby"' or p.lower().startswith('type="application/csvm+json')
        or p.lower().startswith('type="application/ld+json')
        for p in parts)
    if not interesting:
        return None
    for p in parts:
        if p.startswith("<") and p.endswith(">"):
            return p[1:-1]
    return None


def run_suite_test(test: SuiteTest, fetch, base: str = DEFAULT_BASE,
                   encode_templates: bool = True) -> SuiteOutcome:
    """Run one conformance case.

    ``fetch(relpath) -> str | None`` returns the text of a fixture file.
    """
    outcome = SuiteOutcome(test_id=test.id, passed=False)

    def _rel(uri: str):
        if not uri.startswith(base):
            return None
        # a served URL may carry a query string (W3C test116/118); the
        # underlying fixture file does not
        return uri[len(base):].split("?", 1)[0].split("#", 1)[0]

    def resolver(uri: str):
        relpath = _rel(uri)
        if relpath is None:
            return None
        text = fetch(relpath)
        if text is None:
            return None
        return lenient_json_loads(text)

    def csv_texts(url: str):
        relpath = _rel(url)
        return fetch(relpath) if relpath else None

    errors: list[str] = []
    try:
        action_is_json = test.action.endswith(".json")
        group = None
        if action_is_json or test.metadata:
            metadata_path = test.action if action_is_json else test.metadata
            metadata_text = fetch(metadata_path)
            if metadata_text is None:
                raise MetadataParseError(f"missing metadata file {metadata_path}")
            group = parse_metadata(metadata_text, base + metadata_path,
                                   resolver=resolver,
                                   encode_templates=encode_templates)
        else:
            candidates = []
            if test.http_link:
                target = _parse_link_header(test.http_link)
                if target:
                    from .urifns import resolve_uri
                    resolved = resolve_uri(base + test.action, target)
                    candidates.append(resolved[len(base):])
            candidates.append(test.action + "-metadata.json")
            dirname = os.path.dirname(test.action)
            prefix = dirname + "/" if dirname else ""
            # the published site-wide configuration at
            # http://www.w3.org/.well-known/csvm lists, in order:
            # {+url}-metadata.json, {+url}.json, csvm.json, csv-metadata.json
            # (W3C test259/test260 rely on the last two entries)
            candidates.append(test.action + ".json")
            candidates.append(prefix + "csvm.json")
            candidates.append(prefix + "csv-metadata.json")
            action_url = base + test.action
            for cand in candidates:
                metadata_text = fetch(cand)
                if metadata_text is None:
                    continue
                try:
                    parsed = parse_metadata(metadata_text, base + cand,
                                            resolver=resolver,
                                            encode_templates=encode_templates)
                except MetadataParseError:
                    continue
                # discovery rule: metadata located by convention MUST
                # explicitly reference the requested tabular file, else it
                # is ignored with a warning (W3C test117)
                if any(t.url == action_url for t in parsed.tables):
                    group = parsed
                    break
        if group is None:
            from .metadata.model import CompiledTableGroup, CompiledTable

            group = CompiledTableGroup()
            table = CompiledTable(url=base + test.action)
            table.columns_declared = False
            group.tables.append(table)

        mode = MODE_MINIMAL if test.minimal else MODE_STANDARD
        result = convert_file(group, csv_texts, mode=mode,
                              suppress_string_datatype=True,
                              bnode_seed=test.id,
                              encode_iris=encode_templates)
        errors.extend(result.errors)
        actual = result.triples
    except MetadataParseError as ex:
        errors.append(str(ex))
        actual = []
    except Exception as ex:  # noqa: BLE001 - conformance harness records all
        errors.append(f"{type(ex).__name__}: {ex}")
        actual = []

    outcome.errors = errors
    outcome.actual_count = len(actual)

    if test.test_type == "NegativeRdfTest":
        outcome.passed = len(errors) > 0
        outcome.precision = outcome.recall = 1.0 if outcome.passed else 0.0
        return outcome

    if test.result is None:
        outcome.passed = not errors
        return outcome
    expected_text = fetch(test.result)
    if expected_text is None:
        outcome.note = "missing expected result file"
        return outcome
    expected = parse_turtle(expected_text, base=base + test.result)
    outcome.expected_count = len(expected)
    precision, recall = precision_recall(actual, expected)
    outcome.precision, outcome.recall = precision, recall
    outcome.passed = precision == 1.0 and recall == 1.0 and (
        test.test_type == "ToRdfTestWithWarnings" or not errors)
    return outcome


def make_dir_fetch(root: str):
    """fetch() over a fixture directory tree."""

    def fetch(relpath: str):
        if not relpath:
            return None
        path = os.path.join(root, relpath.replace("/", os.sep))
        if not os.path.isfile(path):
            return None
        with open(path, "r", encoding="utf-8-sig", errors="replace") as fh:
            return fh.read()

    return fetch
