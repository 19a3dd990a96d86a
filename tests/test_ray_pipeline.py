"""Ray Data pipeline tests: E2E golden parity, resume, salting, linking.

These run the *distributed* path (scan → pair → convert → dedup → sort →
write) and compare against the reference golden fixtures
(``ConverterSpec.cs:43-94``) by graph isomorphism; the pure-core
conformance suite (test_w3c_suite.py) covers the conversion semantics in
breadth, this file proves the Ray orchestration preserves them.
"""

from __future__ import annotations

import json
import os

import pytest

from csvweb_ray.corpus import (
    GOLDEN_PAIRS,
    fixture_corpus_rows,
    golden_expected_triples,
    rows_to_table,
    synth_corpus_rows,
)
from csvweb_ray.rdf.compare import precision_recall


def _run(ray_session, tmp_path, rows, **kw):
    from csvweb_ray.pipeline.runner import run_kg_pipeline

    out = str(tmp_path / "out")
    return out, run_kg_pipeline(rows_to_table(rows), out, **kw)


@pytest.fixture(scope="module")
def golden_run(ray_session, tmp_path_factory, fixtures_dir):
    from csvweb_ray.pipeline.runner import run_kg_pipeline

    out = str(tmp_path_factory.mktemp("kg") / "out")
    rows = fixture_corpus_rows(fixtures_dir)
    report = run_kg_pipeline(rows_to_table(rows), out, num_shards=4)
    return out, report


def test_golden_pipeline_parity(ray_session, golden_run, fixtures_dir):
    """Every reference golden pair converts identically through the
    distributed DAG (P/R == 1.0, graph isomorphism)."""
    import ray.data as rd

    from csvweb_ray.pipeline.stages import triples_to_terms

    out, report = golden_run
    final = rd.read_parquet(report["final_dir"]).to_pandas()
    expected = golden_expected_triples(fixtures_dir)
    assert len(expected) == len(GOLDEN_PAIRS)
    for repo, exp in expected.items():
        mine = triples_to_terms(final[final.repo == repo].to_dict("records"))
        p, r = precision_recall(mine, exp)
        assert (p, r) == (1.0, 1.0), f"{repo}: p={p} r={r}"


def test_sha256_invariant_preserved(ray_session, golden_run, fixtures_dir):
    """G2: the content sha256 carried on every triple row matches a direct
    hash of the corpus row it derives from."""
    import hashlib

    import ray.data as rd

    out, report = golden_run
    source = {(r["repo"], r["path"]): hashlib.sha256(r["content"].encode()).hexdigest()
              for r in fixture_corpus_rows(fixtures_dir)}
    final = rd.read_parquet(report["final_dir"]).to_pandas()
    assert len(final) > 0
    for _, row in final.iterrows():
        if row["path"] is None:
            continue  # link triples carry their source file's lineage too
        assert source[(row["repo"], row["path"])] == row["content_sha256"]


def test_manifest_lineage(golden_run):
    out, report = golden_run
    manifest = json.load(open(os.path.join(out, "manifest.json")))
    assert sum(s["files"] for s in manifest["shards"].values()) == len(GOLDEN_PAIRS)
    assert sum(s["triples"] for s in manifest["shards"].values()) \
        == report["total_triples_pre_dedup"]
    for entry in manifest["shards"].values():
        assert entry["fingerprint"] and entry["triples_hash"]


def test_resume_skips_done_shards_and_is_identical(ray_session, tmp_path, fixtures_dir):
    """G9: after a completed run, a re-run skips every shard (manifest
    fingerprints match) and the final output is byte-identical; with a
    shard's output deleted, only that shard is rebuilt."""
    import ray.data as rd

    from csvweb_ray.pipeline.runner import run_kg_pipeline

    rows = fixture_corpus_rows(fixtures_dir)
    out = str(tmp_path / "out")
    run_kg_pipeline(rows_to_table(rows), out, num_shards=4,
                    shards_per_wave=1)
    first = rd.read_parquet(os.path.join(out, "final")).to_pandas()
    m1 = json.load(open(os.path.join(out, "manifest.json")))

    # resume with nothing to do: manifest unchanged, same output
    run_kg_pipeline(rows_to_table(rows), out, num_shards=4)
    m2 = json.load(open(os.path.join(out, "manifest.json")))
    assert m1 == m2
    second = rd.read_parquet(os.path.join(out, "final")).to_pandas()
    assert first.sort_values(["nt"]).nt.tolist() == second.sort_values(["nt"]).nt.tolist()

    # delete one wave's data (simulating loss/invalidation) → only its
    # shards are rebuilt, with the same per-shard hashes
    import shutil

    victim = next(k for k, v in m1["shards"].items() if v["triples"] > 0)
    victim_wave = m1["shards"][victim]["wave"]
    shutil.rmtree(os.path.join(out, "shards", victim_wave))
    # wave dir gone but manifest says complete → startup cleanup treats it
    # as crashed debris only if incomplete; deleting the manifest entry is
    # the supported invalidation path
    m_edit = json.load(open(os.path.join(out, "manifest.json")))
    for s in m_edit["waves"][victim_wave]["shards"]:
        del m_edit["shards"][str(s)]
    del m_edit["waves"][victim_wave]
    with open(os.path.join(out, "manifest.json"), "w") as fh:
        json.dump(m_edit, fh)
    run_kg_pipeline(rows_to_table(rows), out, num_shards=4)
    m3 = json.load(open(os.path.join(out, "manifest.json")))
    assert m3["shards"][victim]["triples_hash"] == m1["shards"][victim]["triples_hash"]
    third = rd.read_parquet(os.path.join(out, "final")).to_pandas()
    assert first.sort_values(["nt"]).nt.tolist() == third.sort_values(["nt"]).nt.tolist()


def test_pairing_salt_same_result(ray_session, tmp_path, fixtures_dir):
    """G8: salted pairing (JSON side replicated into each bucket) yields
    the identical triple set."""
    import ray.data as rd

    rows = fixture_corpus_rows(fixtures_dir)
    out1, _ = _run(ray_session, tmp_path / "a", rows, num_shards=2)
    out2, _ = _run(ray_session, tmp_path / "b", rows, num_shards=2, pairing_salt=4)
    a = rd.read_parquet(os.path.join(out1, "final")).to_pandas().nt.sort_values().tolist()
    b = rd.read_parquet(os.path.join(out2, "final")).to_pandas().nt.sort_values().tolist()
    assert a == b


def test_parallelism_invariance(ray_session, tmp_path, fixtures_dir):
    """Different shard counts produce the identical sorted output —
    determinism across partitionings (stands in for cluster-size
    invariance)."""
    import ray.data as rd

    rows = fixture_corpus_rows(fixtures_dir)
    out1, _ = _run(ray_session, tmp_path / "a", rows, num_shards=1)
    out2, _ = _run(ray_session, tmp_path / "b", rows, num_shards=7)
    a = rd.read_parquet(os.path.join(out1, "final")).to_pandas().nt.sort_values().tolist()
    b = rd.read_parquet(os.path.join(out2, "final")).to_pandas().nt.sort_values().tolist()
    assert a == b


def test_synth_corpus_convert_counts(ray_session, tmp_path):
    """Generated corpus: every CSV row becomes triples (schema-driven
    aboutUrl/propertyUrl/virtual columns all fire); noise files are
    filtered; skewed giant repo spreads over shards."""
    import ray.data as rd

    rows = synth_corpus_rows(n_files=12, rows_per_file=20, seed=7)
    out, report = _run(ray_session, tmp_path, rows, num_shards=4)
    assert report["total_files"] == 12
    manifest = json.load(open(os.path.join(out, "manifest.json")))
    nonempty = [s for s in manifest["shards"].values() if s["files"]]
    assert len(nonempty) >= 2  # giant repo did not collapse into one shard
    final = rd.read_parquet(os.path.join(out, "final"))
    # 12 files x 20 rows x 5 columns = 1200 cell triples; separators/
    # virtual columns add more, NA nulls subtract — sanity band
    n = final.count()
    assert 1000 < n < 2000


def test_error_side_channel(ray_session, tmp_path):
    """M15: malformed metadata / broken CSV / unreferenced metadata do not
    abort the pipeline — they surface in the per-file metrics rows and the
    manifest error counts while healthy files convert normally."""
    import json as _json

    import pyarrow.dataset as pads
    import ray.data as rd

    from csvweb_ray.pipeline.runner import run_kg_pipeline

    good_meta = {"@context": "http://www.w3.org/ns/csvw", "url": "good.csv",
                 "tableSchema": {"columns": [{"name": "id", "datatype": "integer"},
                                             {"name": "v"}]}}
    rows = [
        # healthy pair
        {"repo": "r/e", "path": "good.csv", "commit": "a" * 40, "lang": "csv",
         "content": "id,v\n1,x\n2,y\n"},
        {"repo": "r/e", "path": "good.csv-metadata.json", "commit": "a" * 40,
         "lang": "json", "content": _json.dumps(good_meta)},
        # metadata that is not even JSON
        {"repo": "r/e", "path": "bad.csv", "commit": "a" * 40, "lang": "csv",
         "content": "a,b\n1,2\n"},
        {"repo": "r/e", "path": "bad.csv-metadata.json", "commit": "a" * 40,
         "lang": "json", "content": "{not json at all"},
        # metadata referencing a different table → ignored with warning,
        # bare-table conversion still happens (W3C test117 semantics)
        {"repo": "r/e", "path": "other.csv", "commit": "a" * 40, "lang": "csv",
         "content": "c\nz\n"},
        {"repo": "r/e", "path": "csv-metadata.json", "commit": "a" * 40,
         "lang": "json",
         "content": _json.dumps({"@context": "http://www.w3.org/ns/csvw",
                                 "url": "http://elsewhere.invalid/x.csv"})},
        # datatype violation: non-integer cell under an integer column
        {"repo": "r/e2", "path": "typed.csv", "commit": "b" * 40, "lang": "csv",
         "content": "id,v\nNOTANINT,x\n"},
        {"repo": "r/e2", "path": "typed.csv-metadata.json", "commit": "b" * 40,
         "lang": "json", "content": _json.dumps(
             {"@context": "http://www.w3.org/ns/csvw", "url": "typed.csv",
              "tableSchema": {"columns": [{"name": "id", "datatype": "integer"},
                                          {"name": "v"}]}})},
    ]
    out = str(tmp_path / "out")
    report = run_kg_pipeline(rows_to_table(rows), out, num_shards=2)
    assert report["total_files"] == 4
    assert report["total_errors"] >= 2  # bad json + reference mismatch (+ type)
    # healthy file converted; every CSV produced a metrics row
    shards = os.path.join(out, "shards")
    metas = pads.dataset(shards, format="parquet").to_table(
        filter=pads.field("rkind") == "f",
        columns=["path", "n_triples", "errors"]).to_pylist()
    by_path = {m["path"]: m for m in metas}
    assert by_path["good.csv"]["n_triples"] == 4
    assert by_path["good.csv"]["errors"] is None
    assert "metadata" in (by_path["bad.csv"]["errors"] or "")
    assert by_path["bad.csv"]["n_triples"] > 0       # fell back to bare table
    assert by_path["other.csv"]["n_triples"] > 0     # ignored foreign metadata
    final = rd.read_parquet(os.path.join(out, "final")).to_pandas()
    assert len(final) == report["total_triples_pre_dedup"]


def test_dedup_exactness_adversarial(ray_session):
    """The fused dedup+sort rests on Ray's range partitioner mapping equal
    keys to one partition and each reduce partition merging to one block
    (see stages.dedup_triples).  Hammer it: 120k rows over only 37 distinct
    triples (every partition boundary lands inside a duplicate run) — the
    result must be exactly the distinct set."""
    import pyarrow as pa
    import ray.data as rd

    from csvweb_ray.pipeline.stages import TRIPLE_COLUMNS, dedup_triples

    n, k = 120_000, 37
    rows = {
        "subj_kind": ["i"] * n,
        "subj": [f"http://x.invalid/s{i % k:03d}" for i in range(n)],
        "pred": ["http://x.invalid/p"] * n,
        "obj_kind": ["l"] * n,
        "obj_value": [f"v{i % k:03d}" for i in range(n)],
        "obj_datatype": [None] * n,
        "obj_lang": [None] * n,
        "repo": [f"r{i % 101}" for i in range(n)],
        "path": [f"f{i % 11}.csv" for i in range(n)],
        "commit": ["c" * 40] * n,
        "content_sha256": ["s" * 64] * n,
    }
    ds = rd.from_arrow(pa.table({c: pa.array(rows[c], type=pa.string())
                                 for c in TRIPLE_COLUMNS})).repartition(64)
    out = dedup_triples(ds).to_pandas()
    assert len(out) == k
    keys = sorted(zip(out.subj, out.obj_value))
    assert keys == sorted({(f"http://x.invalid/s{i:03d}", f"v{i:03d}")
                           for i in range(k)})
    # output arrives sorted by (subj, pred, obj_value) within the stream
    assert list(out.subj) == sorted(out.subj)


def test_linking_stage(ray_session, tmp_path, fixtures_dir):
    """G4: linker actor pool resolves literal mentions against the
    broadcast IRI dictionary and emits linksTo triples."""
    import ray.data as rd

    # corpus where a literal equals the label of a minted subject IRI
    csv_text = "id,name\n1,alpha beta\n2,gamma\n"
    meta = {
        "@context": "http://www.w3.org/ns/csvw", "url": "t.csv",
        "tableSchema": {
            "aboutUrl": "entity/{name}",
            "columns": [{"name": "id", "datatype": "integer"},
                        {"name": "name"}]},
    }
    rows = [
        {"repo": "r/l", "path": "t.csv", "commit": "c" * 40, "lang": "csv",
         "content": csv_text},
        {"repo": "r/l", "path": "t.csv-metadata.json", "commit": "c" * 40,
         "lang": "json", "content": json.dumps(meta)},
    ]
    out, report = _run(ray_session, tmp_path, rows, num_shards=1,
                       with_linking=True)
    final = rd.read_parquet(os.path.join(out, "final")).to_pandas()
    links = final[final.pred == "http://corpus.invalid/vocab#linksTo"]
    assert len(links) >= 2  # "alpha beta" and "gamma" literals link to their IRIs
    assert set(links.obj_kind) == {"i"}


def test_control_chars_in_cells_roundtrip(ray_session, tmp_path):
    """A literal \\x1f / \\x00 / \\x1e inside a CSV cell (legal input) must
    survive the packed dedup+sort exchange byte-for-byte — the pack
    escapes its own separator/null-mark control characters."""
    import ray.data as rd

    csv_text = 'id,v\n1,"a\x1fb"\n2,"c\x00d"\n3,"e\x1ef"\n4,"\x00"\n'
    rows = [{"repo": "r/ctl", "path": "t.csv", "commit": "c" * 40,
             "lang": "csv", "content": csv_text}]
    out, report = _run(ray_session, tmp_path, rows, num_shards=1)
    final = rd.read_parquet(os.path.join(out, "final")).to_pandas()
    lits = set(final[final.obj_kind == "l"].obj_value)
    assert {"a\x1fb", "c\x00d", "e\x1ef", "\x00"} <= lits
    # no corrupted splits: every triple row still has a valid subject
    assert final.subj.notna().all()


def test_resume_drops_shards_with_removed_inputs(ray_session, tmp_path):
    """A shard whose input files were all deleted between runs must be
    invalidated on resume — its triples may not persist in the output."""
    import ray.data as rd

    from csvweb_ray.pipeline.runner import run_kg_pipeline, shard_of

    def row(repo, val):
        return {"repo": repo, "path": "t.csv", "commit": "c" * 40,
                "lang": "csv", "content": f"id,v\n1,{val}\n"}

    # two repos that land in different shards (dir = "")
    r1, r2 = "r/keep", "r/drop"
    n = 8
    assert shard_of(r1, "", n) != shard_of(r2, "", n)
    out = str(tmp_path / "out")
    run_kg_pipeline(rows_to_table([row(r1, "kept"), row(r2, "gone")]), out,
                    num_shards=n, shards_per_wave=1)
    first = rd.read_parquet(os.path.join(out, "final")).to_pandas()
    assert set(first[first.obj_kind == "l"].obj_value) >= {"kept", "gone"}

    # second run without r2: its shard has no surviving inputs
    run_kg_pipeline(rows_to_table([row(r1, "kept")]), out,
                    num_shards=n, shards_per_wave=1)
    second = rd.read_parquet(os.path.join(out, "final")).to_pandas()
    vals = set(second[second.obj_kind == "l"].obj_value)
    assert "kept" in vals and "gone" not in vals


def test_fingerprint_layout_invariant_and_wellknown_mixed(ray_session):
    """The per-shard XOR fingerprint must be independent of the block
    layout (regression: a uint64-range xor in one group next to an
    int64-range one promoted the concat column to float64, truncating the
    low bits), and the repo's .well-known/csvm digest must participate in
    EVERY shard fingerprint of that repo — not just the shard holding the
    wellknown file."""
    import ray.data as rd

    from csvweb_ray.pipeline.runner import _add_shard, _input_fingerprint

    import pyarrow as _pa

    rows = [{"repo": f"r/{'ab'[i % 2]}", "path": f"d{i}/f.csv",
             "commit": f"{i:040x}", "lang": "csv"} for i in range(60)]
    t = _pa.Table.from_pylist(rows)
    n = 8

    def fp(k, wellknown=None):
        ds = _add_shard(rd.from_arrow(t).repartition(k), n)
        return _input_fingerprint(ds, wellknown)

    base = fp(1)
    assert fp(10) == base  # layout invariance (float64 truncation trap)

    wk = fp(10, wellknown={"r/a": "{+url}-metadata.json"})
    from csvweb_ray.pipeline.runner import shard_of

    a_shards = {shard_of("r/a", f"d{i}", n) for i in range(0, 60, 2)}
    b_only = {s for s in base
              if s not in a_shards}
    assert all(wk[s] != base[s] for s in a_shards)   # every r/a shard moves
    assert all(wk[s] == base[s] for s in b_only)     # r/b shards untouched


def test_wellknown_change_invalidates_whole_repo(ray_session, tmp_path):
    """Editing a repo's .well-known/csvm template list must re-run ALL of
    the repo's shards on resume: the templates drive metadata discovery
    for every directory, so stale shards would keep triples converted
    with the old template list."""
    import ray.data as rd

    from csvweb_ray.pipeline.runner import run_kg_pipeline, shard_of

    meta = ('{"@context": "http://www.w3.org/ns/csvw", "url": "data.csv",'
            ' "tableSchema": {"columns": [{"name": "id", "titles": "id"},'
            ' {"name": "v", "titles": "v", "propertyUrl":'
            ' "http://ex.org/withmeta"}]}}')
    repo, n = "r/wk", 16
    # precondition making the test meaningful: the data dir's shard is NOT
    # the shard holding the wellknown file
    assert shard_of(repo, "d1", n) != shard_of(repo, ".well-known", n)

    def rows(wk_content, wk_commit):
        return [
            {"repo": repo, "path": ".well-known/csvm", "commit": wk_commit,
             "lang": "text", "content": wk_content},
            {"repo": repo, "path": "d1/data.csv", "commit": "a" * 40,
             "lang": "csv", "content": "id,v\n1,x\n"},
            {"repo": repo, "path": "d1/csvm.json", "commit": "b" * 40,
             "lang": "json", "content": meta},
        ]

    out = str(tmp_path / "out")
    run_kg_pipeline(rows_to_table(rows("csvm.json", "1" * 40)), out,
                    num_shards=n)
    first = rd.read_parquet(os.path.join(out, "final")).to_pandas()
    assert first.pred.str.contains("withmeta").any()  # metadata discovered

    # wellknown no longer lists csvm.json; d1's own files are UNCHANGED,
    # so only the wellknown digest can invalidate d1's shard
    run_kg_pipeline(rows_to_table(rows("nope.json", "2" * 40)), out,
                    num_shards=n)
    second = rd.read_parquet(os.path.join(out, "final")).to_pandas()
    assert len(second) > 0
    assert not second.pred.str.contains("withmeta").any()


def test_zero_triple_corpus_with_linking(ray_session, tmp_path):
    """A corpus whose files convert to zero triples must complete cleanly
    with linking enabled (regression: the old post-dedup linking path
    crashed reading an empty checkpoint dir)."""
    rows = [{"repo": "r/empty", "path": "t.csv", "commit": "c" * 40,
             "lang": "csv", "content": ""}]
    out, report = _run(ray_session, tmp_path, rows, num_shards=2,
                       with_linking=True)
    import ray.data as rd

    final_dir = os.path.join(out, "final")
    assert os.path.isdir(final_dir)
    files = [f for f in os.listdir(final_dir) if f.endswith(".parquet")]
    assert (rd.read_parquet(final_dir).count() if files else 0) == 0


def test_linking_bucketed_fallback_matches_broadcast(ray_session, tmp_path):
    """Forcing the dictionary over the broadcast cap must switch to the
    hash-partitioned bucket join and produce IDENTICAL final output."""
    import ray.data as rd

    csv_text = ("id,name\n1,alpha beta\n2,gamma\n3,beta  ALPHA\n"
                "4,delta\n5,unrelated text\n")
    meta = {
        "@context": "http://www.w3.org/ns/csvw", "url": "t.csv",
        "tableSchema": {
            "aboutUrl": "entity/{name}",
            "columns": [{"name": "id", "datatype": "integer"},
                        {"name": "name"}]},
    }
    rows = [
        {"repo": "r/lb", "path": "t.csv", "commit": "c" * 40, "lang": "csv",
         "content": csv_text},
        {"repo": "r/lb", "path": "t.csv-metadata.json", "commit": "c" * 40,
         "lang": "json", "content": json.dumps(meta)},
    ]
    out_a, _ = _run(ray_session, tmp_path / "a", rows, num_shards=1,
                    with_linking=True)
    out_b, _ = _run(ray_session, tmp_path / "b", rows, num_shards=1,
                    with_linking=True, link_max_entries=1)
    a = rd.read_parquet(os.path.join(out_a, "final")).to_pandas()
    b = rd.read_parquet(os.path.join(out_b, "final")).to_pandas()
    assert sorted(a.nt) == sorted(b.nt)
    links = a[a.pred == "http://corpus.invalid/vocab#linksTo"]
    assert len(links) >= 3  # exact ("alpha beta", "gamma") + token-set hit


def test_dedup_boundaries_path_exactness(ray_session):
    """The int-partition (columnar) dedup path: duplicates scattered
    across many input blocks — including control-char values and
    boundary-straddling keys — must dedup exactly and keep min lineage,
    same as the packed-key path."""
    import pyarrow as pa
    import ray.data as rd

    from csvweb_ray.pipeline.stages import TRIPLE_COLUMNS, dedup_triples

    k = 400
    n = k * 3  # every triple appears 3x with different lineage
    subs = [f"http://x.invalid/s{i % k:03d}" for i in range(n)]
    vals = [f"v{i % k:03d}" if i % 7 else f"v\x1f{i % k:03d}" for i in range(n)]
    rows = {
        "subj_kind": ["i"] * n,
        "subj": subs,
        "pred": ["http://x.invalid/p"] * n,
        "obj_kind": ["l"] * n,
        "obj_value": vals,
        "obj_datatype": [None] * n,
        "obj_lang": [None] * n,
        "repo": [f"r{(i // k) % 3}" for i in range(n)],  # 3 lineages per key
        "path": ["t.csv"] * n,
        "commit": ["c" * 40] * n,
        "content_sha256": ["s" * 64] * n,
    }
    ds = rd.from_arrow(pa.table({c: pa.array(rows[c], type=pa.string())
                                 for c in TRIPLE_COLUMNS})).repartition(48)
    # boundaries deliberately split the key space mid-range
    bounds = [f"http://x.invalid/s{i:03d}\x1f" for i in (100, 200, 300)]
    out = dedup_triples(ds, boundaries=bounds).to_pandas()
    distinct = set(zip(subs, vals))
    assert len(out) == len(distinct)
    assert sorted(zip(out.subj, out.obj_value)) == sorted(distinct)
    # keys whose 3 copies are value-identical must keep min lineage; the
    # dedup never drops a lineage other than by the deterministic rule
    full_dupes = {subs[j] for j in range(k)
                  if (j % 7 == 0) == ((j + k) % 7 == 0) == ((j + 2 * k) % 7 == 0)}
    assert set(out[out.subj.isin(full_dupes)].repo) <= {"r0"}


def test_dedup_prefix_split_mixed_domains(ray_session):
    """The exchange's subject prefix-split (``_strip_common_prefix``) is
    per-block: blocks holding one IRI domain strip a long prefix, blocks
    mixing domains strip a short or empty one, and sub-``min_len``
    sharing ships unsplit.  Whatever each map block chose, the reduce
    side must reassemble identical full IRIs — exercised by duplicates
    whose copies land in blocks with DIFFERENT split decisions."""
    import pyarrow as pa
    import ray.data as rd

    from csvweb_ray.pipeline.stages import (
        TRIPLE_COLUMNS,
        _strip_common_prefix,
        dedup_triples,
    )

    # unit: the helper itself
    col = pa.array(["http://a.invalid/x/1", "http://a.invalid/x/2"])
    pfx, suf = _strip_common_prefix(col)
    assert pfx == "http://a.invalid/x/" and suf.to_pylist() == ["1", "2"]
    pfx, suf = _strip_common_prefix(pa.array(["ab1", "ab2"]))  # < min_len
    assert pfx == "" and suf is not None
    pfx, suf = _strip_common_prefix(pa.array([None, None], type=pa.string()))
    assert pfx == ""

    # end-to-end: 3 domains, duplicates scattered so the same subject
    # appears in single-domain AND mixed-domain blocks
    doms = ["http://alpha.invalid/items/", "https://beta.invalid/e/", "urn:z:"]
    n_per, copies = 60, 3
    subs, vals = [], []
    for c in range(copies):
        for d, dom in enumerate(doms):
            for i in range(n_per):
                subs.append(f"{dom}{i:04d}")
                vals.append(f"val{d}-{i:04d}")
    n = len(subs)
    tbl = pa.table({c: pa.array({
        "subj_kind": ["i"] * n, "subj": subs,
        "pred": ["http://p.invalid/p"] * n,
        "obj_kind": ["l"] * n, "obj_value": vals,
        "obj_datatype": [None] * n, "obj_lang": [None] * n,
        "repo": ["r"] * n, "path": ["t.csv"] * n,
        "commit": ["c" * 40] * n, "content_sha256": ["s" * 64] * n,
    }[c], type=pa.string()) for c in TRIPLE_COLUMNS})
    # copy 0: blocks are per-domain contiguous (long prefixes); the full
    # shuffle of all copies lands later copies in mixed blocks
    ds = rd.from_arrow(tbl).random_shuffle(seed=7).repartition(24)
    bounds = [doms[1], doms[2]]
    out = dedup_triples(ds, boundaries=bounds).to_pandas()
    distinct = sorted(set(zip(subs, vals)))
    assert len(out) == len(distinct)
    assert sorted(zip(out.subj, out.obj_value)) == distinct
    # global order preserved (the fused G7 sort)
    assert list(out.subj) == sorted(out.subj)


def test_wave_checkpoint_sample_channel(ray_session, golden_run):
    """The convert UDF checkpoints strided packed sort keys as
    ``rkind='s'`` rows; ``sample_term_boundaries`` derives the merge
    boundaries from them (no second shard scan), and the keys use the
    exchange's escaped packing (field-separator join of the key cols)."""
    import os

    import pyarrow.dataset as pads

    from csvweb_ray.pipeline.stages import sample_term_boundaries

    out, _ = golden_run
    shards_dir = os.path.join(out, "shards")
    d = pads.dataset(shards_dir, format="parquet")
    assert "sample_key" in d.schema.names
    samples = d.to_table(columns=["sample_key"],
                         filter=pads.field("rkind") == "s")
    assert samples.num_rows > 0
    keys = [k for k in samples["sample_key"].to_pylist() if k]
    assert all("\x1f" in k for k in keys)  # packed (subj, pred, obj) keys
    bounds = sample_term_boundaries(shards_dir, 4)
    assert bounds == sorted(bounds) and len(bounds) <= 3
    # boundaries must be drawn from the checkpointed sample population
    assert all(any(k >= b for k in keys) for b in bounds)


def test_sample_coverage_fallback(ray_session, golden_run, tmp_path):
    """When the checkpointed sample covers only part of the corpus (e.g. a
    resume mixing waves written before the sample channel existed with new
    ones), ``sample_term_boundaries`` must NOT silently bias boundaries to
    the sampled waves — it falls back to the distributed strided sample
    over the key columns (ADVICE r3)."""
    import os
    import shutil

    import pyarrow.dataset as pads
    import pyarrow.parquet as pq

    from csvweb_ray.pipeline.stages import sample_term_boundaries

    out, _ = golden_run
    shards_dir = os.path.join(out, "shards")
    d = pads.dataset(shards_dir, format="parquet")
    n_t = d.count_rows(filter=pads.field("rkind") == "t")

    # copy the shards but strip the sample rows from every file — the
    # pre-sample-channel wave layout
    legacy = tmp_path / "legacy_shards"
    for root, _dirs, files in os.walk(shards_dir):
        rel = os.path.relpath(root, shards_dir)
        os.makedirs(legacy / rel, exist_ok=True)
        for f in files:
            if not f.endswith(".parquet"):
                continue
            t = pq.read_table(os.path.join(root, f))
            import pyarrow.compute as pc

            t = t.filter(pc.not_equal(t["rkind"], "s"))
            pq.write_table(t, str(legacy / rel / f))

    # full coverage claim with zero sample rows -> distributed fallback
    bounds = sample_term_boundaries(str(legacy), 4, expected_total=n_t)
    assert bounds == sorted(bounds)
    assert len(bounds) >= 1  # fallback actually produced boundaries

    # mixed layout: one wave with samples + claim of a much larger corpus
    # -> partial coverage detected -> fallback (not the biased fast path)
    partial = sample_term_boundaries(
        shards_dir, 4, expected_total=max(n_t * 1000, 10_000_000))
    assert partial == sorted(partial)


def test_write_corpus_multifile_roundtrip(tmp_path):
    """Multi-file corpus layout (bench cache shape) is content-identical
    to the single-file layout — same rows, same order (pure pyarrow)."""
    import pyarrow.parquet as pq

    from csvweb_ray.corpus import synth_corpus_rows, write_corpus

    rows = synth_corpus_rows(n_files=10, rows_per_file=5, seed=3)
    single = write_corpus(rows, str(tmp_path / "single.parquet"))
    multi = write_corpus(rows, str(tmp_path / "multi"), files=4)
    t1 = pq.read_table(single)
    t2 = pq.ParquetDataset(multi).read()
    assert t1.schema.names == t2.schema.names
    assert t1.equals(t2.select(t1.schema.names).cast(t1.schema))


def test_render_homogeneity_shortcircuits(ray_session):
    """render_ntriples_column's per-batch branch skips (no-lang, no-dt,
    no-bnode, all/no-literal — see stages.py) must be invisible: every
    homogeneity mix renders byte-identically to the per-row reference
    renderer, including rows that need escaping."""
    import itertools

    import pyarrow as pa
    import ray.data as rd

    from csvweb_ray.pipeline.stages import render_ntriples_column
    from csvweb_ray.rdf.ntriples import render_triple

    base = "https://ex.org/s"
    variants = {
        "iri": ("i", "https://ex.org/o1", None, None),
        "bnode": ("b", "b0", None, None),
        "lit": ("l", "plain", None, None),
        "lit_dt": ("l", "42", "http://www.w3.org/2001/XMLSchema#integer", None),
        "lit_lang": ("l", "hi", None, "en"),
        "lit_esc": ("l", 'quote " and\ttab', None, None),
        "iri_esc": ("i", "https://ex.org/o with space", None, None),
    }
    combos = [c for r in (1, 2, 3)
              for c in itertools.combinations(sorted(variants), r)]
    for combo in combos:
        rows = []
        for j, v in enumerate(combo):
            ok, ov, dt, lang = variants[v]
            subj_kind = "b" if v == "bnode" else "i"
            subj = f"bn{j}" if subj_kind == "b" else f"{base}{j}"
            rows.append({"subj_kind": subj_kind, "subj": subj,
                         "pred": f"https://ex.org/p{j}", "obj_kind": ok,
                         "obj_value": ov, "obj_datatype": dt,
                         "obj_lang": lang})
        tbl = pa.table({k: pa.array([r[k] for r in rows], type=pa.string())
                        for k in rows[0]})
        got = [b["nt"] for b in
               render_ntriples_column(rd.from_arrow(tbl)).take_all()]
        want = []
        for r in rows:
            s = (r["subj_kind"], r["subj"])
            o = (("l", r["obj_value"], r["obj_datatype"], r["obj_lang"])
                 if r["obj_kind"] == "l" else (r["obj_kind"], r["obj_value"]))
            want.append(render_triple((s, r["pred"], o)))
        assert got == want, combo


def test_merge_block_count_rules():
    """Pins the three measured sizing rules (rows target + straggler
    floor, split-side multiple snap, coalesce-side whole-files snap)."""
    from csvweb_ray.pipeline.runner import merge_block_count

    # no files yet (fresh dir scan race): the rows/floor target alone
    assert merge_block_count(0, 32, 0) == 48
    assert merge_block_count(68_020_616, 32, 0) == 97
    # split side: more blocks than files -> whole multiple of file count
    assert merge_block_count(136_000_000, 32, 128) == 256  # 194 -> 2x128
    assert merge_block_count(68_020_616, 32, 64) == 128    # 97 -> 2x64
    # coalesce side: 97-target on 128 files -> 1 file/block (even 128)
    assert merge_block_count(68_020_616, 32, 128) == 128
    # coalesce side: 48-target on 128 files -> 2 files/block (even 64)
    assert merge_block_count(17_004_616, 32, 128) == 64
    # exact divisor passes through
    assert merge_block_count(68_020_616, 32, 97) == 97
    # 16x-CPU cap holds before snapping
    assert merge_block_count(10**9, 32, 0) == 512


def test_merge_block_count_invariants():
    """Property: result >= the straggler floor whenever files allow a
    whole-k grouping at or above it, never triggers an uneven Ray
    SplitBlocks (result is a whole multiple of the file count when
    splitting), and whole files per block when coalescing."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from csvweb_ray.pipeline.runner import merge_block_count

    @settings(max_examples=300, derandomize=True, deadline=None)
    @given(rows=st.integers(0, 10**12), ncpu=st.sampled_from([4, 8, 16, 32, 256]),
           files=st.integers(0, 5000))
    def check(rows, ncpu, files):
        target = max(ncpu + ncpu // 2, min(rows // 700_000, 16 * ncpu), 1)
        got = merge_block_count(rows, ncpu, files)
        assert got >= 1
        if not files:
            assert got == target
        elif target > files:
            assert got % files == 0 and got >= target
        else:
            k = max(1, files // target)
            assert got == -(-files // k)
            assert got >= target * 2 // 3  # floor can sag at most ~1/3

    check()


def _final_nt(final_dir):
    import ray.data as rd

    return sorted(rd.read_parquet(final_dir).to_pandas().nt)


def test_resume_merge_matches_default(ray_session, tmp_path, fixtures_dir, golden_run):
    """The resumable range-partitioned merge (the default since round 5)
    must emit the exact same triple set (and global order) as the fused
    sort path — here the FUSED leg is the explicit one."""
    from csvweb_ray.pipeline.runner import run_kg_pipeline

    rows = fixture_corpus_rows(fixtures_dir)
    out = str(tmp_path / "rm")
    report = run_kg_pipeline(rows_to_table(rows), out, num_shards=4,
                             resume_merge=False)
    assert "merge_resume" not in report
    assert golden_run[1]["merge_resume"]["parts_skipped"] == 0
    assert _final_nt(report["final_dir"]) == _final_nt(golden_run[1]["final_dir"])


def test_resume_merge_skips_done_parts(ray_session, tmp_path, fixtures_dir):
    """Simulated mid-merge kill: finished part files survive, the re-run
    processes ONLY the missing ranges, output is identical."""
    from csvweb_ray.pipeline.runner import run_kg_pipeline

    rows = fixture_corpus_rows(fixtures_dir)
    out = str(tmp_path / "rk")
    r1 = run_kg_pipeline(rows_to_table(rows), out, num_shards=4,
                         resume_merge=True)
    full = _final_nt(r1["final_dir"])
    n1 = r1["merge_resume"]["parts_processed"]
    assert n1 > 1

    # reconstruct the mid-merge state: final -> .resume with half the parts
    final = r1["final_dir"]
    resume_dir = final + ".resume"
    os.rename(final, resume_dir)
    parts = sorted(f for f in os.listdir(resume_dir) if f.endswith(".parquet"))
    kept = parts[: len(parts) // 2]
    for f in parts[len(parts) // 2:]:
        os.remove(os.path.join(resume_dir, f))

    r2 = run_kg_pipeline(rows_to_table(rows), out, num_shards=4,
                         resume_merge=True)
    assert r2["merge_resume"]["parts_skipped"] == len(kept)
    assert r2["merge_resume"]["parts_processed"] == n1 - len(kept)
    assert _final_nt(r2["final_dir"]) == full


def test_resume_merge_stale_sig_resets(ray_session, tmp_path, fixtures_dir):
    """Partial state from a DIFFERENT input (sig mismatch) must be
    discarded, never merged into the new output."""
    from csvweb_ray.pipeline.runner import run_kg_pipeline

    rows = fixture_corpus_rows(fixtures_dir)
    out = str(tmp_path / "rs")
    r1 = run_kg_pipeline(rows_to_table(rows), out, num_shards=4,
                         resume_merge=True)
    full = _final_nt(r1["final_dir"])

    # fake stale state: resume dir with a bogus part + mismatched sig
    resume_dir = r1["final_dir"] + ".resume"
    os.makedirs(resume_dir)
    os.rename(os.path.join(r1["final_dir"],
                           sorted(os.listdir(r1["final_dir"]))[0]),
              os.path.join(resume_dir, "part-000000.parquet"))
    with open(resume_dir + ".manifest.json", "w") as f:
        json.dump({"sig": "stale", "parts": {"0": {"rows": 1, "sha": "x"}}}, f)

    r2 = run_kg_pipeline(rows_to_table(rows), out, num_shards=4,
                         resume_merge=True)
    assert r2["merge_resume"]["parts_skipped"] == 0
    assert _final_nt(r2["final_dir"]) == full


def test_resume_merge_survives_injected_crash(ray_session, tmp_path, fixtures_dir):
    """A merge killed MID-RUN (fault injection inside the real finish
    tasks) leaves atomic part files; the re-run skips them and the final
    output matches an uninterrupted run."""
    from csvweb_ray.pipeline.runner import run_kg_pipeline

    rows = fixture_corpus_rows(fixtures_dir)
    ref = run_kg_pipeline(rows_to_table(rows), str(tmp_path / "ref"),
                          num_shards=4, resume_merge=True)
    full = _final_nt(ref["final_dir"])

    out = str(tmp_path / "crash")
    with pytest.raises(Exception):
        run_kg_pipeline(rows_to_table(rows), out, num_shards=4,
                        resume_merge=True, _merge_crash_after_parts=2)
    resume_dir = os.path.join(out, "final.resume")
    survived = [f for f in os.listdir(resume_dir) if f.endswith(".parquet")]
    assert len(survived) >= 2

    r2 = run_kg_pipeline(rows_to_table(rows), out, num_shards=4,
                         resume_merge=True)
    assert r2["merge_resume"]["parts_skipped"] == len(survived)
    assert _final_nt(r2["final_dir"]) == full
