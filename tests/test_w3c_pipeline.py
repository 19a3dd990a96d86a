"""W3C CSVW conformance cases driven through the DISTRIBUTED pipeline.

The pure-core suite (test_w3c_suite.py) covers all 270 cases through
``convert_file``; this file re-runs the *path-convention-discoverable*
subset through the full Ray DAG (scan → pair → convert → dedup) and
compares per-test triples against the expected TTL by graph isomorphism —
proving the distributed orchestration (pairing precedence, per-file
conversion, dedup, lineage) preserves conversion semantics.

Subset rule: CSV-action tests with no user-metadata / Link-header /
well-known discovery (those mechanisms are HTTP-only and don't exist in
a Parquet corpus; SURVEY.md S3).
"""

from __future__ import annotations

import os
import posixpath

import pytest

from csvweb_ray.conformance import DEFAULT_BASE, read_manifest
from csvweb_ray.corpus import REPO_BASE, rows_to_table
from csvweb_ray.rdf.compare import precision_recall
from csvweb_ray.rdf.turtle import parse_turtle


def _table_urls(suite_dir, action):
    """Relative CSV paths referenced by a metadata action's table url(s)."""
    import json as _json

    with open(os.path.join(suite_dir, action), encoding="utf-8-sig") as fh:
        try:
            doc = _json.loads(fh.read())
        except ValueError:
            return None
    tables = doc.get("tables", [doc] if "url" in doc else [])
    urls = []
    base_dir = posixpath.dirname(action)
    for t in tables:
        url = t.get("url")
        if not isinstance(url, str):
            return None
        if url.startswith(DEFAULT_BASE):
            rel = url[len(DEFAULT_BASE):]
        elif "://" in url:
            return None
        else:
            rel = posixpath.normpath(posixpath.join(base_dir, url))
        urls.append(rel)
    return urls


def _eligible(suite_dir, tests, minimal: bool):
    """Tests runnable by pure path convention in a Parquet corpus.

    Two shapes: CSV actions whose metadata already sits at a convention
    path, and JSON (metadata) actions — embedded as
    ``{csv}-metadata.json`` next to their CSV (same directory ⇒ same base
    URI ⇒ identical template/url resolution).
    """
    out = []
    for t in tests:
        if t.test_type == "NegativeRdfTest" or not t.result:
            continue
        if t.minimal != minimal or t.metadata or t.http_link:
            continue
        d = posixpath.dirname(t.action)
        has = lambda p: os.path.isfile(os.path.join(suite_dir, p))
        if t.action.endswith(".csv"):
            if not (has(t.action + "-metadata.json")
                    or has(posixpath.join(d, "csv-metadata.json") if d else "csv-metadata.json")):
                continue
            if has(t.action + ".json") or has(posixpath.join(d, "csvm.json") if d else "csvm.json"):
                continue
            t._embed = None
            out.append(t)
        elif t.action.endswith(".json"):
            urls = _table_urls(suite_dir, t.action)
            if not urls or not all(u.endswith(".csv") and has(u) for u in urls):
                continue
            # renaming must not change the base: metadata and every CSV in
            # the same directory; and no name collision with existing files
            if any(posixpath.dirname(u) != d for u in urls):
                continue
            # the convention name must not collide with a file this test
            # itself would carry into the corpus (other tests' fixtures
            # don't matter — every test gets its own repo)
            own = set(t.implicit) | {t.action}
            if any(u + "-metadata.json" in own for u in urls):
                continue
            if not minimal and len(urls) > 1:
                continue  # per-root provenance ownership (documented)
            t._embed = urls
            out.append(t)
    return out


def _corpus_rows(suite_dir, tests):
    rows, expected = [], {}
    for t in tests:
        repo = f"w3c/{t.id}"
        d = posixpath.dirname(t.action)
        files = {}  # corpus path -> source fixture path
        if t._embed is None:
            files[t.action] = t.action
            files[t.action + "-metadata.json"] = t.action + "-metadata.json"
            cmj = posixpath.join(d, "csv-metadata.json") if d else "csv-metadata.json"
            files[cmj] = cmj
        else:
            # metadata action embedded under the convention name of each
            # CSV it references (same dir ⇒ same base URI)
            for u in t._embed:
                files[u] = u
                files[u + "-metadata.json"] = t.action
        for p in t.implicit:
            if p:
                files.setdefault(p, p)
        for rel, src in sorted(files.items()):
            path = os.path.join(suite_dir, src)
            if not os.path.isfile(path):
                continue
            with open(path, encoding="utf-8-sig", errors="replace") as fh:
                text = fh.read()
            # rebase absolute suite IRIs into the corpus repo namespace;
            # also privatize example.org so tests minting the same
            # absolute IRIs stay disjoint (otherwise corpus-wide RDF set
            # dedup correctly collapses shared triples across repos and
            # per-test slices are not self-contained)
            text = text.replace(DEFAULT_BASE, f"{REPO_BASE}{repo}/")
            text = text.replace("http://example.org", f"http://{t.id}.example.org")
            rows.append({"repo": repo, "path": rel, "commit": "0" * 40,
                         "lang": "json" if rel.endswith(".json") else "csv",
                         "content": text})
        with open(os.path.join(suite_dir, t.result), encoding="utf-8-sig") as fh:
            ttl = fh.read().replace(DEFAULT_BASE, f"{REPO_BASE}{repo}/")
        ttl = ttl.replace("http://example.org", f"http://{t.id}.example.org")
        triples = parse_turtle(ttl, base=f"{REPO_BASE}{repo}/{t.result}")
        if t._embed is not None and len(t._embed) == 1:
            # the metadata document's own URL changed with the embedding
            # rename; IRIs minted from it (relative @id, often written as
            # relative refs in the TTL and only absolute after parsing)
            old = f"{REPO_BASE}{repo}/{t.action}"
            new = f"{REPO_BASE}{repo}/{t._embed[0]}-metadata.json"

            def fix(node):
                if isinstance(node, tuple) and node[0] == "i" \
                        and node[1].startswith(old):
                    return ("i", new + node[1][len(old):])
                return node

            triples = [(fix(s), p, fix(o)) for (s, p, o) in triples]
        expected[repo] = triples
    return rows, expected


@pytest.mark.parametrize("minimal", [True, False], ids=["minimal", "standard"])
def test_w3c_subset_through_pipeline(ray_session, tmp_path, suite_dir, minimal):
    import ray.data as rd

    from csvweb_ray.pipeline.runner import run_kg_pipeline
    from csvweb_ray.pipeline.stages import triples_to_terms

    tests = read_manifest(os.path.join(suite_dir, "manifest-rdf.ttl"))
    subset = _eligible(suite_dir, tests, minimal=minimal)
    # the manifest is overwhelmingly standard-mode (205 standard vs 7
    # minimal entries), so the minimal subset is inherently small
    assert len(subset) >= (3 if minimal else 20), \
        f"subset unexpectedly small: {len(subset)}"

    rows, expected = _corpus_rows(suite_dir, subset)
    out = str(tmp_path / "out")
    mode = "minimal" if minimal else "standard"
    run_kg_pipeline(rows_to_table(rows), out, num_shards=8, mode=mode,
                    encode_iris=True)
    final = rd.read_parquet(os.path.join(out, "final")).to_pandas()

    failures = []
    for repo, exp in sorted(expected.items()):
        mine = triples_to_terms(final[final.repo == repo].to_dict("records"))
        p, r = precision_recall(mine, exp)
        if (p, r) != (1.0, 1.0):
            failures.append((repo, round(p, 3), round(r, 3), len(mine), len(exp)))
    rate = 1 - len(failures) / len(expected)
    assert rate >= 0.95, f"pass rate {rate:.2f}; failures: {failures[:10]}"
