"""G9 — sharded, resumable orchestration of the KG pipeline.

Layout under ``out_dir``::

    shards/wave-*/*.parquet      converted (pre-dedup) triples + per-file
                                 metrics rows, shard id as a column (a few
                                 large files per wave — hive-partitioning
                                 by shard produced write-tasks × shards
                                 tiny files, which dominated both the
                                 write and the merge read-back at scale)
    manifest.json                per-shard lineage: input fingerprint, files,
                                 rows, triples, errors, order-insensitive
                                 triples hash, owning wave; plus wave
                                 completion records
    final/*.parquet              deduped, sorted, N-Triples-rendered output

Shard assignment is ``crc32(repo|dir) % num_shards`` — pairing only needs
``(repo, dir)`` co-location, so sharding by directory (not by repo)
spreads a giant monorepo across every shard: this IS the salted
repartition on (repo, path) the north-star asks for, with the salt being
the directory hash.  A shard whose manifest entry matches the current
input fingerprint is skipped on re-run; pending shards are processed in
waves (default: all pending in ONE Dataset execution for maximum
parallelism; ``shards_per_wave=1`` gives per-shard checkpoint granularity
at the cost of serializing waves).  A wave is atomic for resume: killed
mid-wave → its dir is deleted on the next run and its shards re-run;
invalidating any shard of a completed wave re-runs that whole wave.

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

from .linker import (
    build_iri_dictionary,
    build_iri_pairs,
    link_triples,
    link_triples_bucketed,
    links_as_triples,
)
from .stages import (
    WELLKNOWN_PATH,
    add_sha256,
    convert_batches,
    dedup_triples,
    filter_candidates,
    pair_files,
    render_ntriples_column,
    scan_corpus,
    split_convert_output,
)


def _collect_wellknown(source) -> dict[str, str]:
    """{repo → template text} for repos carrying a root ``.well-known/csvm``
    location-template list.  The file is rare and tiny (a few template
    lines), so a driver dict broadcast into the pairing stage is the right
    shape; the parquet path uses a pushed-down row filter so the scan never
    touches other rows' ``content``."""
    if isinstance(source, str):
        import pyarrow.dataset as pads

        t = pads.dataset(source, format="parquet").to_table(
            columns=["repo", "content"],
            filter=pads.field("path") == WELLKNOWN_PATH)
        return dict(zip(t["repo"].to_pylist(), t["content"].to_pylist()))

    def _f(b: pa.Table) -> pa.Table:
        return b.filter(pc.equal(b["path"], WELLKNOWN_PATH)) \
            .select(["repo", "content"])

    rows = scan_corpus(source).map_batches(_f, batch_format="pyarrow").take_all()
    return {r["repo"]: r["content"] for r in rows}

__all__ = ["run_kg_pipeline", "shard_of", "PipelineReport"]


def shard_of(repo: str, dir_: str, num_shards: int) -> int:
    return zlib.crc32(f"{repo}|{dir_}".encode()) % num_shards


def _add_shard(ds, num_shards: int):
    import posixpath

    def _fn(batch: pa.Table) -> pa.Table:
        ums = (batch["user_metadata"].to_pylist()
               if "user_metadata" in batch.column_names
               else [None] * batch.num_rows)
        # a CSV row routed to a metadata-rooted conversion shards by the
        # METADATA's directory, so the whole conversion (metadata + every
        # CSV it references) lands in one wave
        shards = [shard_of(r, posixpath.dirname((u or p).split("?", 1)[0]),
                           num_shards)
                  for r, p, u in zip(batch["repo"].to_pylist(),
                                     batch["path"].to_pylist(), ums)]
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


def _input_fingerprint(ds, wellknown: dict[str, str] | None = None) -> dict[int, str]:
    """Order-insensitive per-shard fingerprint: XOR of per-file
    ``sha256(repo|path|commit|wellknown-digest)`` digests plus a file
    count.  Uses the commit id as the content identity (immutable in a
    code corpus), so the fingerprint pass never reads the ``content``
    column — column pruning makes resume-detection nearly free even at
    corpus scale.

    The repo's ``.well-known/csvm`` template list drives pairing for
    EVERY directory of that repo, so its content digest is mixed into
    every file digest of the repo — editing the wellknown file
    invalidates all of the repo's shards on resume, not just the one
    shard that happens to contain ``.well-known``.

    Fully distributed: each batch reduces to at most ``num_shards``
    partial (shard, xor, count) rows (XOR is associative/commutative), the
    grouped reduce sees one group per SHARD (bounded by configuration, not
    corpus size), and only ``num_shards`` rows reach the driver.  The xor
    travels as a fixed-width HEX STRING: a bare uint64-range Python int in
    one group next to an int64-range one in another promotes the concat
    column to float64 and silently truncates the low bits, making resume
    fingerprints block-layout-dependent."""
    import hashlib

    import pandas as pd

    wk_digest = {r: hashlib.sha256((c or "").encode()).hexdigest()[:16]
                 for r, c in (wellknown or {}).items()}

    def _partial(batch: pa.Table) -> pa.Table:
        acc: dict[int, int] = {}
        counts: dict[int, int] = {}
        for s, r, p, h in zip(batch["shard"].to_pylist(), batch["repo"].to_pylist(),
                              batch["path"].to_pylist(),
                              batch["commit"].to_pylist()):
            wk = wk_digest.get(r, "")
            d = int(hashlib.sha256(f"{r}|{p}|{h}|{wk}".encode()).hexdigest()[:16], 16)
            acc[s] = acc.get(s, 0) ^ d
            counts[s] = counts.get(s, 0) + 1
        shards = sorted(acc)
        return pa.table({
            "shard": pa.array(shards, type=pa.int32()),
            "xor": pa.array([f"{acc[s]:016x}" for s in shards], type=pa.string()),
            "count": pa.array([counts[s] for s in shards], type=pa.int64())})

    def _reduce(g: pd.DataFrame) -> pd.DataFrame:
        x = 0
        for v in g["xor"]:
            x ^= int(v, 16)
        return pd.DataFrame({"shard": [int(g["shard"].iloc[0])],
                             "xor": [f"{x:016x}"], "count": [int(g["count"].sum())]})

    parts = (ds.select_columns(["shard", "repo", "path", "commit"])
             .map_batches(_partial, batch_format="pyarrow")
             .groupby("shard").map_groups(_reduce, batch_format="pandas"))
    out: dict[int, str] = {}
    for row in parts.take_all():
        out[int(row["shard"])] = f"{int(row['count'])}:{row['xor']}"
    return out


def merge_block_count(total_rows: int, ncpu: int, n_shard_files: int) -> int:
    """Block count for the final-merge read (bounds the sort partitions).

    Three rules, each measured on this workload:

    - **rows target with a straggler floor**: ~700k rows/partition
      (best of 68/96/128 on a 68M-triple corpus at 32 CPUs; neutral at
      8) but never fewer than 1.5× CPUs — at exactly 1 task/CPU the
      reduce tail IS the merge wall (boundary jitter makes 1.7× blocks;
      9.6 s vs 7.7 s at 48 partitions on 17M triples); capped at 16×
      CPUs so the sort's P² slice overhead grows with the cluster, not
      the corpus.
    - **splitting side**: requesting more blocks than shard files makes
      Ray split fragments, and an uneven request splits unevenly (194
      blocks on 128 files → 64.1 s vs 55.1 s for the even 256 on a 136M
      merge) — snap UP to a whole multiple of the file count.
    - **coalescing side**: a request that doesn't divide the file count
      packs 1-vs-2 files per block (97 blocks on 128 even files gave
      516k/1078k-row blocks — 2× skew through the pack stage AND the
      sort's map side; 27.7 s vs 26.4 s for the even 128 on a 68M
      merge) — snap to a whole number of files per block, flooring k so
      the snapped count stays at or above the straggler floor.
    """
    target = max(ncpu + ncpu // 2, min(total_rows // 700_000, 16 * ncpu), 1)
    if not n_shard_files:
        return target
    if target > n_shard_files:
        k = -(-target // n_shard_files)  # ceil: split every file k ways
        return n_shard_files * k
    k = max(1, n_shard_files // target)  # whole files per block
    return -(-n_shard_files // k)


def merge_triples_resumable(triples, boundaries: list[str], final_dir: str,
                            *, sig: str, compression: str = "zstd",
                            crash_after_parts: int | None = None) -> dict:
    """Resumable final merge: an explicit range exchange + per-partition
    finish tasks, each writing its own ``part-NNNNNN.parquet`` atomically.

    The default merge (``dedup_triples`` → ``write_parquet``) is faster —
    Ray's native range sort with all the boundary-sampling tuning — but
    all-or-nothing: a merge that dies at 90% restarts from the wave
    shards.  This variant trades one extra key-pack pass for per-RANGE
    checkpoints: rows whose range already has a finished part file are
    dropped at the map side (a searchsorted + isin per batch), so a
    re-run only sorts, dedups, renders and writes the missing ranges.
    Output files are named by zero-padded part id — reading them in
    name order yields the same global (subj, pred, obj) order as the
    default path.  Exactness: a range's rows all land in its one part
    (the id is a pure function of the escaped key), and the per-part
    ``first_per_identity`` sees every copy — same invariant as
    ``dedup_triples``.

    ``sig`` fingerprints the inputs (boundaries + wave set + row count);
    partial state from a different input is discarded, never merged."""
    import json as _json
    import re as _re

    import numpy as np
    import pyarrow as pa
    import pyarrow.compute as pc
    import pyarrow.parquet as pq

    from .stages import (
        _IDENT_EXTRA,
        _KEY_COLS,
        _LINEAGE_COLS,
        TRIPLE_COLUMNS,
        _join_cols,
        first_per_identity,
        render_ntriples_table,
    )

    tmp = final_dir + ".resume"
    # manifest + per-part metric sidecars live BESIDE the part dir: the
    # dir gets promoted to final_dir wholesale and read_parquet must only
    # see parquet files (no json, no crash leftovers)
    manifest_path = tmp + ".manifest.json"
    meta_dir = tmp + ".meta"
    manifest = {}
    if os.path.exists(manifest_path):
        try:
            with open(manifest_path) as f:
                manifest = _json.load(f)
        except (OSError, ValueError):
            manifest = {}
    if manifest.get("sig") != sig:
        shutil.rmtree(tmp, ignore_errors=True)
        shutil.rmtree(meta_dir, ignore_errors=True)
        if os.path.exists(manifest_path):
            os.remove(manifest_path)
        manifest = {"sig": sig, "parts": {}}
    os.makedirs(tmp, exist_ok=True)
    os.makedirs(meta_dir, exist_ok=True)
    # commit the sig BEFORE any processing: a crash mid-merge must leave
    # (sig manifest + atomic part files) or the next run cannot tell the
    # survivors from stale state and wipes them
    with open(manifest_path + ".tmp", "w") as f:
        _json.dump(manifest, f, indent=1)
    os.replace(manifest_path + ".tmp", manifest_path)
    # a _finish task killed between write and os.replace leaves a stale
    # .part-NNNNNN.inprogress; its range is NOT in `done`, so it will be
    # reprocessed — drop the debris now or the final promote publishes it
    for f in os.listdir(tmp):
        if f.endswith(".inprogress"):
            os.remove(os.path.join(tmp, f))
    done = sorted(
        int(m.group(1)) for f in os.listdir(tmp)
        if (m := _re.match(r"part-(\d+)\.parquet$", f)))
    bounds = np.asarray(boundaries, dtype=object)
    done_arr = np.asarray(done, dtype=np.int64)

    # same dictionary-encoding set as the default merge path: the
    # exchange is bandwidth-bound, bytes are the lever
    _dict_cols = {"subj_kind", "pred", "obj_kind", "obj_datatype",
                  "obj_lang", "repo", "path", "commit", "content_sha256"}

    def _canon(col):
        col = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
        if pa.types.is_dictionary(col.type):
            col = col.cast(col.type.value_type)
        if pa.types.is_null(col.type):
            return pa.nulls(len(col), type=pa.string())
        return col.cast(pa.string())

    def _pack(b: pa.Table) -> pa.Table:
        keys = _join_cols(b, _KEY_COLS).to_numpy(zero_copy_only=False)
        part = np.searchsorted(bounds, keys, side="right").astype(np.int64)
        out = {"part": pa.array(part)}
        for c in TRIPLE_COLUMNS:
            col = _canon(b[c])
            out[c] = pc.dictionary_encode(col) if c in _dict_cols else col
        t = pa.table(out)
        if len(done_arr):
            t = t.filter(pa.array(~np.isin(part, done_arr)))
        return t

    def _finish(t: pa.Table) -> pa.Table:
        import hashlib as _hashlib

        pid = t["part"][0].as_py()
        t = pa.table({c: _canon(t[c]) for c in TRIPLE_COLUMNS})
        t = first_per_identity(t, _KEY_COLS + _IDENT_EXTRA + _LINEAGE_COLS,
                               _KEY_COLS + _IDENT_EXTRA)
        t = render_ntriples_table(t)
        # exact content+order digest over the Arrow buffers (C-speed) —
        # a Python to_pylist/join here materializes the whole corpus as
        # Python strings across the part tasks (measured dominant)
        nt = t["nt"].combine_chunks()
        h = _hashlib.sha256()
        for buf in nt.buffers():
            if buf is not None:
                h.update(buf)
        digest = h.hexdigest()
        inprog = os.path.join(tmp, f".part-{pid:06d}.inprogress")
        pq.write_table(t, inprog, compression=compression)
        os.replace(inprog, os.path.join(tmp, f"part-{pid:06d}.parquet"))
        # persist the part's metrics BESIDE the part (atomic, in the
        # non-promoted meta dir): a later crash-resume rebuilds the
        # manifest from these sidecars, so surviving parts keep their
        # rows/sha instead of vanishing from parts_done_total
        meta_tmp = os.path.join(meta_dir, f".part-{pid:06d}.json.tmp")
        with open(meta_tmp, "w") as mf:
            _json.dump({"rows": len(t), "sha": digest}, mf)
        os.replace(meta_tmp, os.path.join(meta_dir, f"part-{pid:06d}.json"))
        if crash_after_parts is not None:
            # fault injection (tests): die mid-merge through the REAL
            # task path once enough part files exist
            n_done = sum(1 for f in os.listdir(tmp)
                         if f.endswith(".parquet"))
            if n_done >= crash_after_parts:
                raise RuntimeError(
                    f"injected merge crash after {n_done} parts")
        return pa.table({"part": pa.array([pid], type=pa.int64()),
                         "rows": pa.array([len(t)], type=pa.int64()),
                         "sha": pa.array([digest], type=pa.string())})

    metrics = (triples.map_batches(_pack, batch_format="pyarrow")
               .groupby("part")
               .map_groups(_finish, batch_format="pyarrow")
               .to_pandas())
    parts = dict(manifest.get("parts", {}))
    # fold crash survivors back in: their entries were lost when the sig
    # manifest was committed pre-processing, but each part wrote a metric
    # sidecar — rebuild from those (sidecar wins over a stale entry)
    for f in os.listdir(meta_dir):
        if (m := _re.match(r"part-(\d+)\.json$", f)):
            try:
                with open(os.path.join(meta_dir, f)) as mf:
                    parts[str(int(m.group(1)))] = _json.load(mf)
            except (OSError, ValueError):
                pass
    for _, r in metrics.iterrows():
        parts[str(int(r["part"]))] = {"rows": int(r["rows"]),
                                      "sha": r["sha"]}
    manifest = {"sig": sig, "parts": parts}
    with open(manifest_path + ".tmp", "w") as f:
        _json.dump(manifest, f, indent=1)
    os.replace(manifest_path + ".tmp", manifest_path)

    # finalize: promote the completed resume dir to final_dir
    if os.path.isdir(final_dir):
        shutil.rmtree(final_dir)
    os.replace(tmp, final_dir)
    shutil.rmtree(meta_dir, ignore_errors=True)
    return {"parts_done_total": len(parts), "parts_skipped": len(done),
            "parts_processed": len(metrics)}


class PipelineReport(dict):
    """Manifest + headline metrics returned by ``run_kg_pipeline``."""


def run_kg_pipeline(source, out_dir: str, *, mode: str = "minimal",
                    num_shards: int = 8, shards_per_wave: int | None = None,
                    pairing_salt: int = 1, resume: bool = True,
                    with_linking: bool = False, rebalance: bool = True,
                    encode_iris: bool = False,
                    resume_merge: bool = True,
                    _merge_crash_after_parts: int | None = None,
                    link_max_entries: int = 1_000_000) -> PipelineReport:
    """Run the flagship corpus→triples pipeline with checkpoint/resume.

    ``source``: parquet path / pyarrow.Table / Dataset of corpus rows.
    Returns the manifest (per-shard lineage + totals).
    """
    import time

    phases: dict[str, float] = {}
    t_start = time.perf_counter()

    def _mark(name: str):
        nonlocal t_start
        now = time.perf_counter()
        phases[name] = phases.get(name, 0.0) + now - t_start
        t_start = now

    os.makedirs(out_dir, exist_ok=True)
    shards_dir = os.path.join(out_dir, "shards")
    manifest_path = os.path.join(out_dir, "manifest.json")
    manifest = _load_manifest(manifest_path) if resume else {"shards": {}}

    base = scan_corpus(source)
    base = filter_candidates(base)
    base = add_sha256(base)
    base = _add_shard(base, num_shards)

    # resume detection reads only (repo, path, commit, lang) — content is
    # pruned at the parquet read; the per-shard XOR reduce keeps the
    # driver's share at num_shards rows regardless of corpus size.
    # user_metadata participates in shard routing, so the slim scan must
    # carry it when the corpus has the sidecar column
    want = ["repo", "path", "commit", "lang", "user_metadata"]
    if isinstance(source, pa.Table):
        slim_cols = [c for c in want if c in source.column_names]
        slim = scan_corpus(source.select(slim_cols))
    elif isinstance(source, str):
        import pyarrow.dataset as pads

        names = pads.dataset(source, format="parquet").schema.names
        slim_cols = [c for c in want if c in names]
        slim = scan_corpus(source, columns=slim_cols).select_columns(slim_cols)
    else:
        slim_cols = [c for c in want if c in source.schema().names]
        slim = source.select_columns(slim_cols)
    # wellknown templates are collected BEFORE fingerprinting — their
    # digest participates in every file fingerprint of the owning repo
    # (see _input_fingerprint); the collection itself is a pushed-down
    # pruned scan over a rare tiny file, cheap at any corpus size
    wellknown = _collect_wellknown(source)

    # The fingerprint gates two things: (a) which prior shards are stale
    # (resume only) and (b) the lineage recorded at manifest-write time.
    # On a FRESH run there are no prior shards, so (a) is vacuous and the
    # fingerprint only needs to COMPLETE before the first manifest write —
    # it runs concurrently with convert in a driver thread (its slim
    # column-pruned scan barely competes with the convert CPUs), removing
    # the one phase that was serialized ahead of all useful work.
    import threading

    _fp_out: dict[int, str] = {}
    _fp_err: list[BaseException] = []

    def _fp_compute() -> None:
        try:
            _fp_out.update(_input_fingerprint(
                _add_shard(filter_candidates(slim), num_shards), wellknown))
        except BaseException as ex:  # noqa: BLE001 - re-raised at join
            _fp_err.append(ex)

    fresh = not manifest["shards"]
    fp_thread: threading.Thread | None = None
    if fresh:
        fp_thread = threading.Thread(target=_fp_compute, daemon=True)
        fp_thread.start()
        fingerprints: dict[int, str] = {}
    else:
        _fp_compute()
        if _fp_err:
            raise _fp_err[0]
        fingerprints = _fp_out
    _mark("fingerprint")

    def _join_fingerprint() -> dict[int, str]:
        nonlocal fp_thread
        if fp_thread is not None:
            fp_thread.join()
            fp_thread = None
            if _fp_err:
                raise _fp_err[0]
            fingerprints.update(_fp_out)
        return fingerprints

    # --- resume bookkeeping over wave directories -----------------------
    # Shard data lives in per-WAVE directories (shards/<wave_id>/) with
    # the shard id as a COLUMN, not a hive partition: a wave writes a few
    # large parquet files instead of (write tasks x shards) tiny ones,
    # which at 17M triples was the dominant cost of both the write and
    # the merge's read-back.  The manifest marks a wave complete only
    # after its stats are recorded; incomplete wave dirs are deleted on
    # startup (killed-run debris), and invalidating any shard of a
    # completed wave drops the whole wave (its shards simply re-run).
    manifest.setdefault("waves", {})
    for wid in list(manifest["waves"]):
        if not manifest["waves"][wid].get("complete"):
            shutil.rmtree(os.path.join(shards_dir, wid), ignore_errors=True)
            del manifest["waves"][wid]
    if os.path.isdir(shards_dir):
        for d in os.listdir(shards_dir):
            if d not in manifest["waves"]:
                shutil.rmtree(os.path.join(shards_dir, d), ignore_errors=True)

    invalid = {s for s, fp in fingerprints.items()
               if manifest["shards"].get(str(s), {}).get("fingerprint") != fp}
    # a manifest shard with NO surviving input files never appears in the
    # current fingerprint map — without this its stale wave (and triples
    # from deleted corpus files) would persist into the final merge
    invalid |= {int(s) for s in manifest["shards"]
                if int(s) not in fingerprints}
    dropped_waves = [wid for wid, info in manifest["waves"].items()
                     if any(int(x) in invalid for x in info["shards"])]
    for wid in dropped_waves:
        for x in manifest["waves"][wid]["shards"]:
            manifest["shards"].pop(str(x), None)
        shutil.rmtree(os.path.join(shards_dir, wid), ignore_errors=True)
        del manifest["waves"][wid]
    # fresh runs don't know the populated shard set yet (the fingerprint
    # is still computing in the background) — run every configured shard;
    # unpopulated ones contribute no rows and are dropped at manifest time
    pending = list(range(num_shards)) if fresh else \
        [s for s in sorted(fingerprints) if str(s) not in manifest["shards"]]

    wave_size = shards_per_wave or max(1, len(pending))
    for i in range(0, len(pending), wave_size):
        wave = wave_list = pending[i:i + wave_size]
        wave_set = set(wave)
        wid = f"wave-{wave[0]:04d}-{len(wave)}"
        wdir = os.path.join(shards_dir, wid)
        shutil.rmtree(wdir, ignore_errors=True)

        ds = base.map_batches(
            lambda b, ws=tuple(sorted(wave_set)): b.filter(
                pc.is_in(b["shard"], value_set=pa.array(list(ws), type=pa.int32()))),
            batch_format="pyarrow")
        paired = pair_files(ds, pairing_salt=pairing_salt, wellknown=wellknown)
        if rebalance:
            # a monorepo directory emerges from the pairing groupby as ONE
            # block; spread its files across the cluster before the
            # (CPU-heavy) conversion so one straggler task doesn't
            # serialize the wave.  With a high pairing_salt the groups are
            # already small -- callers may skip the extra exchange.
            import ray as _ray

            cpus = int(_ray.cluster_resources().get("CPU", 8)) \
                if _ray.is_initialized() else 8
            paired = paired.repartition(4 * cpus)
        # shard is carried through pairing/convert (constant per (repo,
        # dir) group) -- no per-triple recomputation
        converted = convert_batches(paired, mode=mode, encode_iris=encode_iris)
        # zstd for the wave shards: measured AGAINST lz4 at 68M triples —
        # the shards are read back once by the merge and the extra read
        # I/O volume of lz4 cost ~8 s where zstd's encode CPU cost ~0
        # (the convert stage is no longer CPU-bound after the fast path)
        converted.write_parquet(wdir, compression="zstd")
        _mark("convert")

        # lineage needs the input fingerprints now; on a fresh run they
        # were computing concurrently with convert, so this join is ~free
        fingerprints = _join_fingerprint()
        _mark("fingerprint_wait")
        os.makedirs(wdir, exist_ok=True)  # zero-row wave writes no files

        # wave complete -> record lineage per shard.  Only the per-file
        # metrics rows (rkind == "f") are read back -- a columnar
        # predicate over a handful of small columns; the per-file triples
        # hash was computed inside the distributed convert UDF.
        import pyarrow.dataset as pads

        stats: dict[int, dict] = {
            s: {"files": 0, "rows": 0, "triples": 0, "errors": 0, "thash": 0}
            for s in wave}
        wave_files = [f for f in os.listdir(wdir) if f.endswith(".parquet")]
        tbl = pads.dataset(
            [os.path.join(wdir, f) for f in wave_files],
            format="parquet").to_table(
            columns=["shard", "rows", "n_triples", "n_errors", "triples_hash"],
            filter=pads.field("rkind") == "f") if wave_files else pa.table(
            {"shard": pa.array([], type=pa.int32())})
        for row in tbl.to_pylist():
            st = stats[int(row["shard"])]
            st["files"] += 1
            st["rows"] += row["rows"] or 0
            st["errors"] += row["n_errors"] or 0
            st["triples"] += row["n_triples"] or 0
            st["thash"] ^= int(row["triples_hash"], 16)
        # a shard absent from the fingerprint map has no input files (can
        # only happen on the fresh all-shards path) — no lineage entry
        wave_shards = [s for s in wave if s in fingerprints]
        for s in wave_shards:
            st = stats[s]
            manifest["shards"][str(s)] = {
                "fingerprint": fingerprints[s],
                "files": st["files"], "rows": st["rows"],
                "triples": st["triples"], "errors": st["errors"],
                "triples_hash": f"{st['thash']:016x}",
                "wave": wid,
            }
        if wave_shards:
            manifest["waves"][wid] = {"shards": wave_shards, "complete": True}
        else:
            shutil.rmtree(wdir, ignore_errors=True)
        _save_manifest(manifest_path, manifest)
        _mark("shard_stats")

    # ---- final merge: dedup → (link) → sort → render → write -------------
    import ray.data as rd

    wave_dirs = [os.path.join(shards_dir, d) for d in sorted(manifest["waves"])]
    report = PipelineReport(manifest)
    final_dir = os.path.join(out_dir, "final")
    if not wave_dirs:
        report["total_triples"] = 0
        return report

    from .stages import canonicalize_triple_schema

    # The merge-read block count BOUNDS the sort partition count (map
    # stages preserve block count, and Ray's range sort emits one reduce
    # partition per input block).  Too many partitions pay P² slice-object
    # overhead in the exchange; too FEW are worse: a reduce task full-sorts
    # its merged partition, and an 8-partition merge of a 68M-triple corpus
    # put 8.5M rows × 11 string columns into one Arrow sort (~20 min/task
    # measured).  Row-count is the honest sizing signal — the manifest
    # already carries per-shard triple counts (zstd on-disk bytes
    # under-estimate in-memory size ~20×).  Asking for MORE blocks than
    # parquet files is counter-productive: Ray answers with SplitBlocks
    # fan-out (512 blocks for a 194 request on 128 files, measured) and
    # the sort's P² slice overhead dominates (49 s → 115 s merge).
    # Straggler control comes from boundary ACCURACY instead — see
    # sample_term_boundaries' distributed strided sample.
    import ray as _ray

    ncpu = int(_ray.cluster_resources().get("CPU", 8)) \
        if _ray.is_initialized() else 8
    total_rows = sum(v.get("triples", 0) for v in manifest["shards"].values())
    n_shard_files = sum(
        1 for _, _, fs in os.walk(shards_dir)
        for f in fs if f.endswith(".parquet"))
    merge_blocks = merge_block_count(total_rows, ncpu, n_shard_files)
    # prune at the read: the merge only consumes triple rows and triple
    # columns — the per-file metrics columns (errors, hashes, counts) and
    # the 'f' rows are skipped at the parquet scan, not post-decode
    import pyarrow.dataset as pads

    from .stages import TRIPLE_COLUMNS, sample_term_boundaries

    all_out = rd.read_parquet(
        shards_dir, override_num_blocks=merge_blocks,
        columns=list(TRIPLE_COLUMNS) + ["rkind"],
        filter=(pads.field("rkind") == "t"))
    triples, _ = split_convert_output(all_out)

    # 4× finer part ids than sort partitions: Ray's sort samples the part
    # column at runtime and one part id is indivisible — with ids ==
    # partitions, quantile jitter puts 0 or 2 ids into a partition (2×
    # skew measured); at 4× each partition averages 4 ids ±1 (~±25%).
    # The searchsorted partition-id assignment makes the finer boundary
    # list free on the map side.
    merge_boundaries = sample_term_boundaries(shards_dir, 4 * merge_blocks,
                                              expected_total=total_rows)

    if with_linking:
        import ray

        # linking runs BEFORE the fused dedup+sort so the link triples ride
        # the same single exchange (the old post-dedup path paid a second
        # full sort over the entire stream just to re-order the appended
        # links).  Both passes re-read the already-checkpointed wave
        # parquet, so nothing is recomputed; duplicate link triples minted
        # from duplicate source triples collapse in the dedup.
        dictionary = build_iri_dictionary(triples, max_entries=link_max_entries)
        if dictionary is None:
            # dictionary too large for a worker-heap broadcast → the
            # hash-partitioned bucket-join fallback (same link output)
            link_trips = link_triples_bucketed(triples, build_iri_pairs(triples))
            triples = triples.union(link_trips)
        else:
            dict_ref = ray.put(dictionary)
            triples = links_as_triples(link_triples(triples, dict_ref))

    if resume_merge:
        # resumable variant: explicit range exchange + atomic per-range
        # part files — a killed merge re-runs only the missing ranges
        # (trade: one extra key-pack pass vs Ray's tuned native sort)
        import hashlib as _hashlib

        sig = _hashlib.sha256("\x1f".join(
            merge_boundaries + [str(total_rows)]
            + sorted(manifest["waves"])).encode()).hexdigest()
        report["merge_resume"] = merge_triples_resumable(
            triples, merge_boundaries, final_dir, sig=sig,
            crash_after_parts=_merge_crash_after_parts)
    else:
        # dedup_triples fuses G6 dedup with the G7 (subj, pred, obj)
        # sort: one exchange serves both
        triples = canonicalize_triple_schema(
            dedup_triples(triples, boundaries=merge_boundaries))
        triples = render_ntriples_column(triples)

        if os.path.isdir(final_dir):
            shutil.rmtree(final_dir)
        tmp_final = final_dir + ".tmp"
        if os.path.isdir(tmp_final):
            shutil.rmtree(tmp_final)
        triples.write_parquet(tmp_final, compression="zstd")
        os.makedirs(tmp_final, exist_ok=True)  # zero-triple corpus: write creates nothing
        os.replace(tmp_final, final_dir)

    _mark("final_merge")
    report["phase_secs"] = {k: round(v, 2) for k, v in phases.items()}
    total = sum(v["triples"] for v in manifest["shards"].values())
    report["total_triples_pre_dedup"] = total
    report["total_files"] = sum(v["files"] for v in manifest["shards"].values())
    report["total_errors"] = sum(v["errors"] for v in manifest["shards"].values())
    report["final_dir"] = final_dir
    return report
