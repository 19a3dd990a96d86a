"""G9 — sharded, resumable orchestration of the KG pipeline.

Layout under ``out_dir``::

    shards/shard=K/*.parquet     converted (pre-dedup) triples + filemeta of shard K
    manifest.json                per-shard lineage: input fingerprint, files,
                                 rows, triples, errors, order-insensitive
                                 triples hash
    final/*.parquet              deduped, sorted, N-Triples-rendered output

Shard assignment is ``crc32(repo|dir) % num_shards`` — pairing only needs
``(repo, dir)`` co-location, so sharding by directory (not by repo)
spreads a giant monorepo across every shard: this IS the salted
repartition on (repo, path) the north-star asks for, with the salt being
the directory hash.  A shard whose manifest entry matches the current
input fingerprint is skipped on re-run; pending shards are processed in
waves (default: all pending in ONE Dataset execution for maximum
parallelism; ``shards_per_wave=1`` gives per-shard checkpoint granularity
at the cost of serializing waves).

Determinism: conversion bnode labels are content-hashes (see
``convert.converter``), dedup keeps the lexicographically-first lineage
row, and the final sort is total — identical output bytes for identical
input at any parallelism level, which is what makes the resume hash check
meaningful.
"""

from __future__ import annotations

import json
import os
import shutil
import zlib

import pyarrow as pa
import pyarrow.compute as pc

from .linker import build_iri_dictionary, link_triples, links_as_triples
from .stages import (
    add_sha256,
    convert_batches,
    dedup_triples,
    filter_candidates,
    pair_files,
    render_ntriples_column,
    scan_corpus,
    split_convert_output,
)

__all__ = ["run_kg_pipeline", "shard_of", "PipelineReport"]


def shard_of(repo: str, dir_: str, num_shards: int) -> int:
    return zlib.crc32(f"{repo}|{dir_}".encode()) % num_shards


def _add_shard(ds, num_shards: int):
    import posixpath

    def _fn(batch: pa.Table) -> pa.Table:
        shards = [shard_of(r, posixpath.dirname(p), num_shards)
                  for r, p in zip(batch["repo"].to_pylist(),
                                  batch["path"].to_pylist())]
        return batch.append_column("shard", pa.array(shards, type=pa.int32()))

    return ds.map_batches(_fn, batch_format="pyarrow")


def _load_manifest(path: str) -> dict:
    if os.path.isfile(path):
        with open(path, encoding="utf-8") as fh:
            return json.load(fh)
    return {"shards": {}}


def _save_manifest(path: str, manifest: dict) -> None:
    tmp = path + ".tmp"
    with open(tmp, "w", encoding="utf-8") as fh:
        json.dump(manifest, fh, indent=1, sort_keys=True)
    os.replace(tmp, path)


def _input_fingerprint(ds) -> dict[int, str]:
    """Order-insensitive per-shard fingerprint: XOR of per-file
    ``sha256(repo|path|commit)`` digests plus a file count.  Uses the
    commit id as the content identity (immutable in a code corpus), so the
    fingerprint pass never reads the ``content`` column — column pruning
    makes resume-detection nearly free even at corpus scale."""
    import hashlib

    acc: dict[int, int] = {}
    counts: dict[int, int] = {}
    for batch in (ds.select_columns(["shard", "repo", "path", "commit"])
                  .iter_batches(batch_size=65536, batch_format="pyarrow")):
        for s, r, p, h in zip(batch["shard"].to_pylist(), batch["repo"].to_pylist(),
                              batch["path"].to_pylist(),
                              batch["commit"].to_pylist()):
            d = int(hashlib.sha256(f"{r}|{p}|{h}".encode()).hexdigest()[:16], 16)
            acc[s] = acc.get(s, 0) ^ d
            counts[s] = counts.get(s, 0) + 1
    return {s: f"{counts[s]}:{acc[s]:016x}" for s in acc}


class PipelineReport(dict):
    """Manifest + headline metrics returned by ``run_kg_pipeline``."""


def run_kg_pipeline(source, out_dir: str, *, mode: str = "minimal",
                    num_shards: int = 8, shards_per_wave: int | None = None,
                    pairing_salt: int = 1, resume: bool = True,
                    with_linking: bool = False,
                    sort_output: bool = True) -> PipelineReport:
    """Run the flagship corpus→triples pipeline with checkpoint/resume.

    ``source``: parquet path / pyarrow.Table / Dataset of corpus rows.
    Returns the manifest (per-shard lineage + totals).
    """
    os.makedirs(out_dir, exist_ok=True)
    shards_dir = os.path.join(out_dir, "shards")
    manifest_path = os.path.join(out_dir, "manifest.json")
    manifest = _load_manifest(manifest_path) if resume else {"shards": {}}

    base = scan_corpus(source)
    base = filter_candidates(base)
    base = add_sha256(base)
    base = _add_shard(base, num_shards)

    # resume detection reads only (repo, path, commit, lang) — content is
    # pruned at the parquet read
    slim = scan_corpus(source, columns=["repo", "path", "commit", "lang"])
    fingerprints = _input_fingerprint(_add_shard(filter_candidates(slim), num_shards))
    pending = [s for s, fp in sorted(fingerprints.items())
               if manifest["shards"].get(str(s), {}).get("fingerprint") != fp
               or not os.path.isdir(os.path.join(shards_dir, f"shard={s}"))]

    wave_size = shards_per_wave or max(1, len(pending))
    for i in range(0, len(pending), wave_size):
        wave = pending[i:i + wave_size]
        wave_set = set(wave)
        # clear any partial output of a previously-killed run
        for s in wave:
            part = os.path.join(shards_dir, f"shard={s}")
            if os.path.isdir(part):
                shutil.rmtree(part)

        ds = base.map_batches(
            lambda b, ws=tuple(sorted(wave_set)): b.filter(
                pc.is_in(b["shard"], value_set=pa.array(list(ws), type=pa.int32()))),
            batch_format="pyarrow")
        paired = pair_files(ds.drop_columns(["shard"]), pairing_salt=pairing_salt)
        converted = convert_batches(paired, mode=mode)
        converted = _add_shard(converted, num_shards)
        converted.write_parquet(shards_dir, partition_cols=["shard"])

        # wave complete → record lineage per shard.  Only the per-file
        # metrics rows (rkind == "f") are read back — a columnar predicate
        # over a handful of small columns; the per-file triples hash was
        # computed inside the distributed convert UDF.
        import pyarrow.dataset as pads

        stats: dict[int, dict] = {}
        for s in wave:
            st = {"files": 0, "rows": 0, "triples": 0, "errors": 0, "thash": 0}
            part = os.path.join(shards_dir, f"shard={s}")
            dset = pads.dataset(part, format="parquet")
            tbl = dset.to_table(
                columns=["rows", "n_triples", "n_errors", "triples_hash"],
                filter=pads.field("rkind") == "f")
            for row in tbl.to_pylist():
                st["files"] += 1
                st["rows"] += row["rows"] or 0
                st["errors"] += row["n_errors"] or 0
                st["triples"] += row["n_triples"] or 0
                st["thash"] ^= int(row["triples_hash"], 16)
            stats[s] = st
        for s in wave:
            st = stats[s]
            manifest["shards"][str(s)] = {
                "fingerprint": fingerprints[s],
                "files": st["files"], "rows": st["rows"],
                "triples": st["triples"], "errors": st["errors"],
                "triples_hash": f"{st['thash']:016x}",
            }
        _save_manifest(manifest_path, manifest)

    # ---- final merge: dedup → (link) → sort → render → write -------------
    import ray.data as rd

    shard_dirs = [os.path.join(shards_dir, d) for d in sorted(os.listdir(shards_dir))
                  if d.startswith("shard=")] if os.path.isdir(shards_dir) else []
    report = PipelineReport(manifest)
    final_dir = os.path.join(out_dir, "final")
    if not shard_dirs:
        report["total_triples"] = 0
        return report

    from .stages import canonicalize_triple_schema

    all_out = rd.read_parquet(shards_dir)
    triples, filemeta = split_convert_output(all_out)
    triples = canonicalize_triple_schema(
        dedup_triples(triples).drop_columns(["tkey"]))

    if with_linking:
        import ray

        # checkpoint the deduped stream so the dictionary build and the
        # linking pass don't each re-run the dedup shuffle
        dedup_dir = os.path.join(out_dir, "deduped")
        if os.path.isdir(dedup_dir):
            shutil.rmtree(dedup_dir)
        triples.write_parquet(dedup_dir)
        triples = rd.read_parquet(dedup_dir)
        dict_ref = ray.put(build_iri_dictionary(triples))
        triples = link_triples(rd.read_parquet(dedup_dir), dict_ref)
        triples = links_as_triples(triples)

    if sort_output:
        triples = triples.sort(["subj", "pred", "obj_value"])
    triples = render_ntriples_column(triples)

    if os.path.isdir(final_dir):
        shutil.rmtree(final_dir)
    tmp_final = final_dir + ".tmp"
    if os.path.isdir(tmp_final):
        shutil.rmtree(tmp_final)
    triples.write_parquet(tmp_final)
    os.replace(tmp_final, final_dir)

    total = sum(v["triples"] for v in manifest["shards"].values())
    report["total_triples_pre_dedup"] = total
    report["total_files"] = sum(v["files"] for v in manifest["shards"].values())
    report["total_errors"] = sum(v["errors"] for v in manifest["shards"].values())
    report["final_dir"] = final_dir
    return report
