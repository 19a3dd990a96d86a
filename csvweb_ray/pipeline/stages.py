"""Dataset stage functions for the CSVW knowledge-graph pipeline.

Every stage is expressed as a Ray Data transform over Arrow batches
(``batch_format="pyarrow"`` unless pandas semantics are needed); nothing
here materializes the dataset.  Cross-references to the reference
implementation (``/root/reference/src/DataDock.CsvWeb``) are cited per
stage so semantics parity can be audited.

Scale notes (the design constraints these stages were written against):

- one corpus row = one whole file, so a file never splits across UDF
  calls and per-file row numbering needs no cross-block state
  (SURVEY.md §7 "per-file ordering");
- the pairing shuffle key is ``(repo, dir [, salt])``, never bare
  ``repo`` — a giant monorepo spreads across the cluster by directory,
  and a monster directory can additionally be salted
  (``pairing_salt > 1`` replicates the small JSON side into each salt
  bucket, the classic skew-join treatment);
- ``content`` is dropped as soon as each stage is done with it; triples
  rows carry only lineage scalars.
"""

from __future__ import annotations

import hashlib
import json
import posixpath

import pyarrow as pa
import pyarrow.compute as pc

from ..corpus import REPO_BASE
from ..convert.converter import MODE_MINIMAL, MODE_STANDARD, convert_file
from ..metadata.model import CompiledTable, CompiledTableGroup, MetadataParseError
from ..metadata.normalizer import lenient_json_loads
from ..metadata.parser import parse_metadata
from ..rdf.ntriples import render_triple

__all__ = [
    "TRIPLE_COLUMNS", "scan_corpus", "filter_candidates", "add_sha256",
    "pair_files", "convert_batches", "dedup_triples", "render_ntriples_column",
]

#: Output schema of the convert stage (FIXTURES.md §2 + lineage).
TRIPLE_COLUMNS = [
    "subj_kind", "subj", "pred", "obj_kind", "obj_value", "obj_datatype",
    "obj_lang", "repo", "path", "commit", "content_sha256",
]

_TRIPLE_SCHEMA = pa.schema(
    [(c, pa.string()) for c in TRIPLE_COLUMNS])

_FILEMETA_SCHEMA = pa.schema([
    ("repo", pa.string()), ("path", pa.string()), ("commit", pa.string()),
    ("content_sha256", pa.string()), ("metadata_path", pa.string()),
    ("rows", pa.int64()), ("n_triples", pa.int64()), ("n_errors", pa.int64()),
    ("errors", pa.string()), ("triples_hash", pa.string()),
])


def _triple_digest(s, p, o) -> int:
    key = "\x1f".join((
        s[0], s[1], p, o[0], o[1],
        (o[2] or "") if o[0] == "l" else "",
        (o[3] or "") if o[0] == "l" else ""))
    return int(hashlib.sha256(key.encode()).hexdigest()[:16], 16)


def _table_digest(t: pa.Table) -> int:
    """Order-insensitive digest of a fast-path term table: ONE sha256 over
    the sort-canonicalized packed keys' Arrow buffers (offsets+data, so
    row boundaries are unambiguous) instead of a per-triple Python hash.
    Same role as the XOR of ``_triple_digest``s on the slow path — the two
    definitions never mix for one file (path routing is a deterministic
    function of the file), and the manifest only ever compares hashes
    produced by the same code."""
    keys = pc.binary_join_element_wise(
        *(pc.fill_null(t[c].combine_chunks().cast(pa.string()), "\x00")
          for c in ("subj_kind", "subj", "pred", "obj_kind", "obj_value",
                    "obj_datatype", "obj_lang")), "\x1f")
    arr = pc.take(keys, pc.sort_indices(keys))
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    # hash the exact offsets+data byte ranges (not whole buffers — Arrow
    # pads buffers to 64 B and padding content is not guaranteed zeroed);
    # take() yields fresh offset-0 arrays, so the ranges are exact
    import struct

    nrows = len(arr)
    offs, data = arr.buffers()[1], arr.buffers()[2]
    h = hashlib.sha256()
    h.update(offs[:(nrows + 1) * 4])
    end = struct.unpack_from("<i", offs, nrows * 4)[0]
    if data is not None:
        h.update(data[:end])
    return int(h.hexdigest()[:16], 16)


def scan_corpus(source, columns=None):
    """Corpus source → Dataset.  ``source`` may be a parquet path/dir, a
    ``pyarrow.Table``, or an existing Dataset (reference analogue: the
    ``ITableResolver`` fetch, ``DefaultResolver.cs:12-40`` — here the
    corpus already sits in Parquet, so the resolver is the read)."""
    import ray.data as rd
    from ray.data import Dataset

    if isinstance(source, Dataset):
        return source
    if isinstance(source, pa.Table):
        return rd.from_arrow(source)
    if columns is None or "content" in columns:
        # fat read (whole-file text rides along): Ray's eager fragment
        # sampling would decode sample row groups of `content` on the
        # driver (~3 s serialized per read_parquet at 14k files) just to
        # estimate a ratio the default approximates well for text — skip
        # it.  Slim column-pruned reads keep the real sampler: their
        # sample is cheap and the measured ratio drives block splitting
        # (see raycfg.skip_parquet_sampling).
        from ..raycfg import skip_parquet_sampling

        with skip_parquet_sampling():
            return rd.read_parquet(source, columns=columns)
    return rd.read_parquet(source, columns=columns)


def filter_candidates(ds):
    """G1: keep only CSVW-relevant files.  Vectorized Arrow predicate
    (``pc.ends_with``) inside ``map_batches`` — cheaper than per-row
    ``ds.filter`` (reference analogue: MIME dispatch,
    ``Rdf/Converter.cs:95-112``).  Also kept: repo-root
    ``.well-known/csvm`` template lists (S3 discovery channel) and CSV
    paths carrying a query string (RFC 7111 file addressing)."""

    def _keep(batch: pa.Table) -> pa.Table:
        path = batch["path"]
        mask = pc.or_(pc.ends_with(path, pattern=".csv"),
                      pc.ends_with(path, pattern=".json"))
        mask = pc.or_(mask, pc.match_substring(path, ".csv?"))
        mask = pc.and_(mask, pc.is_in(batch["lang"],
                                      value_set=pa.array(["csv", "json"])))
        mask = pc.or_(mask, pc.equal(path, WELLKNOWN_PATH))
        return batch.filter(mask)

    return ds.map_batches(_keep, batch_format="pyarrow")


def add_sha256(ds, column: str = "content", out: str = "content_sha256"):
    """G2: per-row content fingerprint, the invariant carried through every
    stage (BASELINE.json input_hint).  hashlib releases the GIL and runs at
    C speed; the loop is over file-sized strings, not cells."""

    def _sha(batch: pa.Table) -> pa.Table:
        vals = batch[column]
        out_col = pa.array(
            [hashlib.sha256(v.encode("utf-8")).hexdigest() if v is not None else None
             for v in vals.to_pylist()], type=pa.string())
        return batch.append_column(out, out_col)

    return ds.map_batches(_sha, batch_format="pyarrow")


def _dirname(path: str) -> str:
    d = posixpath.dirname(path)
    return d


#: Repo-root path of the site-wide metadata-location template list
#: (the reference resolves ``/.well-known/csvm`` against the table URL,
#: ``Rdf/Converter.cs:152-170``; in a Parquet corpus the host root is the
#: repo root).
WELLKNOWN_PATH = ".well-known/csvm"

#: Spec default location templates when no ``/.well-known/csvm`` exists.
DEFAULT_TEMPLATES = ("{+url}-metadata.json", "csv-metadata.json")

#: Pairing-group namespace for metadata-rooted conversions (user-supplied
#: metadata, possibly multi-table): the group key is the metadata
#: document's directory, so the metadata and its sibling schema JSONs
#: co-locate with every CSV that names it.
_META_GROUP = "\x01m:"


def parse_link_header(link_header: str) -> str | None:
    """Target of a ``<target>; rel="describedby"`` Link value (reference
    ``Rdf/Converter.cs:166-189``)."""
    parts = [p.replace(" ", "") for p in link_header.split(";")]
    interesting = any(
        p.lower() == 'rel="describedby"'
        or p.lower().startswith('type="application/csvm+json')
        or p.lower().startswith('type="application/ld+json')
        for p in parts)
    if not interesting:
        return None
    for p in parts:
        if p.startswith("<") and p.endswith(">"):
            return p[1:-1]
    return None


def _wk_candidates(path: str, templates) -> list[str]:
    """Expand location templates against a repo-relative CSV path.  Only
    same-directory results are reachable in the directory-grouped pairing
    (documented partitioning assumption; cross-directory metadata must use
    the ``user_metadata`` sidecar channel instead)."""
    stripped = path.split("?", 1)[0]
    d = _dirname(stripped)
    out = []
    for t in templates:
        t = t.strip()
        if not t or t.startswith("#"):
            continue
        if "{+url}" in t:
            cand = t.replace("{+url}", path)
        else:
            cand = posixpath.join(d, t) if d else t
        if _dirname(cand.split("?", 1)[0]) == d:
            out.append(cand)
    return out


def pair_files(ds, pairing_salt: int = 1, wellknown: dict | None = None):
    """G3: CSV ↔ metadata pairing as a grouped join on ``(repo, dir)``.

    Emulates the reference's metadata-location precedence
    (``Rdf/Converter.cs:125-207``) inside each directory group:

    1. ``user_metadata`` sidecar column (the ConvertWithLocalMetadata
       channel): the conversion is ROOTED at the named metadata document —
       the CSV rows route to the metadata's directory group and one
       conversion row per metadata document is emitted with all its CSVs
       attached (this is also how multi-table metadata converts exactly
       once).
    2. ``link_header`` sidecar column: ``rel="describedby"`` target
       resolved against the CSV URL, tried before the location templates.
    3. Location templates from the repo's ``.well-known/csvm`` file
       (broadcast driver-side dict — the file is tiny and rare) or the
       spec defaults ``{+url}-metadata.json`` / ``csv-metadata.json``.

    The *reference check* — discovered metadata must explicitly reference
    the CSV, else it is ignored with a warning (W3C test117) — happens in
    the convert stage where the JSON is parsed anyway.  User-supplied
    metadata is exempt (reference ``Rdf/Converter.cs:125-139``).

    ``pairing_salt > 1``: every JSON row is replicated into each of the
    ``salt`` buckets and CSV rows hash into one bucket, so one directory
    with millions of CSVs spreads over ``salt`` groups (G8).  The JSON
    side of a directory is assumed small (metadata documents), which is
    what makes the replicate-the-small-side trick cheap.
    """
    import pandas as pd

    wk = wellknown or {}

    def _prep(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        for c in ("user_metadata", "link_header", "convert_root"):
            if c not in batch.column_names:
                batch = batch.append_column(c, pa.nulls(n, type=pa.string()))
        paths = batch["path"].to_pylist()
        umd = batch["user_metadata"].to_pylist()
        indices, dirs, salts = [], [], []
        for i, (p, u) in enumerate(zip(paths, umd)):
            stripped = p.split("?", 1)[0]
            d = _dirname(stripped)
            if stripped.endswith(".json"):
                # json side: replicate into every salt bucket of its dir
                # group + once into the dir's metadata-root group
                for s in (range(pairing_salt) if pairing_salt > 1 else (0,)):
                    indices.append(i)
                    dirs.append(d)
                    salts.append(s)
                indices.append(i)
                dirs.append(_META_GROUP + d)
                salts.append(0)
                if u and _dirname(u) != d:
                    # a schema document referenced from a metadata root in
                    # ANOTHER directory (tableSchema-by-URL, M3): carry it
                    # into that root's group too
                    indices.append(i)
                    dirs.append(_META_GROUP + _dirname(u))
                    salts.append(0)
            elif u:
                indices.append(i)
                dirs.append(_META_GROUP + _dirname(u))
                salts.append(0)
            else:
                s = (int(hashlib.md5(p.encode()).hexdigest(), 16)
                     % pairing_salt) if pairing_salt > 1 else 0
                indices.append(i)
                dirs.append(d)
                salts.append(s)
        taken = batch.take(pa.array(indices, type=pa.int64()))
        taken = taken.append_column("dir", pa.array(dirs, type=pa.string()))
        return taken.append_column("salt", pa.array(salts, type=pa.int32()))

    _OUT_COLS = ["repo", "dir", "csv_path", "commit", "content_sha256",
                 "csv_text", "candidates", "json_files", "user_metadata",
                 "attached_csvs", "shard"]

    def _pair(group: pd.DataFrame) -> pd.DataFrame:
        rows = {c: [] for c in _OUT_COLS}
        has_shard = "shard" in group.columns

        def emit(r, csv_path, commit, sha, csv_text, cands, carried,
                 user_md, attached):
            rows["repo"].append(r.repo)
            rows["dir"].append(r.dir)
            rows["csv_path"].append(csv_path)
            rows["commit"].append(commit)
            rows["content_sha256"].append(sha)
            rows["csv_text"].append(csv_text)
            rows["candidates"].append(json.dumps(cands))
            rows["json_files"].append(json.dumps(carried))
            rows["user_metadata"].append(user_md)
            rows["attached_csvs"].append(json.dumps(attached) if attached else None)
            rows["shard"].append(int(r.shard) if has_shard else -1)

        jrows = {r.path: r for r in group.itertuples()
                 if r.path.split("?", 1)[0].endswith(".json")}
        jsons = {p: r.content for p, r in jrows.items()}
        group_dir = group["dir"].iloc[0] if len(group) else ""

        if group_dir.startswith(_META_GROUP):
            # metadata-rooted conversions: one row per metadata document —
            # named by a CSV row's user_metadata, or self-marked via
            # convert_root (a metadata doc with no CSV rows, e.g. a
            # negative case whose table urls are unresolvable)
            csvs_by_meta: dict[str, list] = {}
            for r in group.itertuples():
                p = r.path.split("?", 1)[0]
                if p.endswith(".json") or not r.user_metadata:
                    continue
                csvs_by_meta.setdefault(r.user_metadata, []).append(r)
            for p, jr in jrows.items():
                if getattr(jr, "convert_root", None):
                    csvs_by_meta.setdefault(p, [])
            for meta_path in sorted(csvs_by_meta):
                csv_rows = sorted(csvs_by_meta[meta_path], key=lambda r: r.path)
                mrow = jrows.get(meta_path)
                base = csv_rows[0] if csv_rows else mrow
                if base is None:
                    continue
                attached = {r.path: r.content for r in csv_rows}
                emit(base, meta_path,
                     mrow.commit if mrow else base.commit,
                     mrow.content_sha256 if mrow else base.content_sha256,
                     None, [meta_path], jsons, meta_path, attached)
            return pd.DataFrame(rows)

        for r in group.itertuples():
            p_stripped = r.path.split("?", 1)[0]
            if p_stripped.endswith(".json") or not (
                    p_stripped.endswith(".csv") or "?" in r.path):
                continue
            cands = []
            link_hdr = getattr(r, "link_header", None)
            if isinstance(link_hdr, str) and link_hdr:
                target = parse_link_header(link_hdr)
                if target:
                    from ..urifns import resolve_uri

                    resolved = resolve_uri(
                        f"{REPO_BASE}{r.repo}/{r.path}", target)
                    prefix = f"{REPO_BASE}{r.repo}/"
                    if resolved.startswith(prefix):
                        rel = resolved[len(prefix):].split("#", 1)[0]
                        if rel in jsons:
                            cands.append(rel)
            templates = wk.get(r.repo)
            templates = templates.splitlines() if templates \
                else DEFAULT_TEMPLATES
            for cand in _wk_candidates(r.path, templates):
                if cand in jsons and cand not in cands:
                    cands.append(cand)
            carried = {c: jsons[c] for c in cands}
            # a candidate's text may reference sibling JSONs (tableSchema
            # by URL, M3) — include a sibling iff some candidate names its
            # basename, instead of shipping the whole directory per CSV
            # row (a monorepo dir can hold thousands of files)
            cand_text = "\n".join(carried.values())
            for sib, text in jsons.items():
                if sib not in carried and posixpath.basename(sib) in cand_text:
                    carried[sib] = text
            emit(r, r.path, r.commit, r.content_sha256, r.content,
                 cands, carried, None, None)
        return pd.DataFrame(rows)

    prepped = ds.map_batches(_prep, batch_format="pyarrow")
    return prepped.groupby(["repo", "dir", "salt"]).map_groups(
        _pair, batch_format="pandas")


def _convert_one(repo: str, csv_path: str, commit: str, sha: str, csv_text: str,
                 candidates: list[str], json_files: dict, mode: str,
                 encode_iris: bool = False, user_metadata: str | None = None,
                 attached_csvs: dict | None = None,
                 meta_cache: dict | None = None, cache_key=None):
    """Convert one conversion root → (triples, filemeta).  Pure; called per
    row inside the convert UDF.  Reference: the whole of
    ``Rdf/Converter.cs:227-471`` plus the discovery reference-check at
    ``:141-207``.

    Two root kinds: a CSV file (path-convention / Link discovery, single
    table), or — when ``user_metadata`` is set — a METADATA document (the
    ``ConvertWithLocalMetadata`` channel, ``Rdf/Converter.cs:125-139``):
    every table in the document converts in one pass against the attached
    CSV contents, which is what makes multi-table groups (and their
    standard-mode TableGroup provenance) convert exactly once."""
    repo_root = f"{REPO_BASE}{repo}/"
    root_url = repo_root + csv_path

    def resolver(uri: str):
        if not uri.startswith(repo_root):
            return None
        rel = uri[len(repo_root):].split("?", 1)[0].split("#", 1)[0]
        text = json_files.get(rel)
        return lenient_json_loads(text) if text is not None else None

    errors: list[str] = []
    group = None
    meta_path = None
    only_table_url = None  # user-metadata roots convert every table

    if user_metadata is not None:
        text = json_files.get(user_metadata)
        if text is None:
            return [], [], user_metadata, 0, \
                [f"user metadata {user_metadata} not found in corpus"]
        try:
            group = parse_metadata(text, repo_root + user_metadata,
                                   resolver=resolver,
                                   encode_templates=encode_iris)
        except Exception as ex:  # noqa: BLE001 - M15: fatal for this root
            return [], [], user_metadata, 0, \
                [f"metadata {user_metadata}: {type(ex).__name__}: {ex}"]
        meta_path = user_metadata
        attached = attached_csvs or {}
        seed = f"{repo}|{commit}|{meta_path}|"

        def csv_texts(url: str):
            if not url.startswith(repo_root):
                return None
            rel = url[len(repo_root):].split("#", 1)[0]
            if rel in attached:
                return attached[rel]
            return attached.get(rel.split("?", 1)[0])
    else:
        only_table_url = root_url
        for cand in candidates:
            text = json_files.get(cand)
            if text is None:
                continue
            # every CSV of a directory re-parses the same metadata
            # candidates (K csvs × M candidates parses per directory —
            # measured 28% of the convert UDF).  The parse result is
            # shared READ-ONLY across the batch: (cache_key, cand) fully
            # determines the parse inputs because cache_key fingerprints
            # the directory's serialized sidecar map (text AND resolver
            # lookups both come from it); per-file table selection is the
            # non-mutating ``only_table_url`` filter, never a write to
            # the cached group.  Parse FAILURES cache as ("err", msg) so
            # the M15 error row still repeats per file.
            ck = (cache_key, cand) if (meta_cache is not None
                                       and cache_key is not None) else None
            parsed = meta_cache.get(ck) if ck is not None else None
            if parsed is None:
                try:
                    parsed = parse_metadata(text, repo_root + cand,
                                            resolver=resolver,
                                            encode_templates=encode_iris)
                except Exception as ex:  # noqa: BLE001 - any parse failure
                    # (incl. malformed JSON) is an M15 error-channel
                    # event, never fatal
                    parsed = ("err", f"metadata {cand}: {type(ex).__name__}: {ex}")
                if ck is not None:
                    meta_cache[ck] = parsed
            if isinstance(parsed, tuple) and parsed and parsed[0] == "err":
                errors.append(parsed[1])
                continue
            if any(t.url == root_url for t in parsed.tables):
                group, meta_path = parsed, cand
                break
            errors.append(f"metadata {cand} does not reference {csv_path}; ignored")
        if group is None:
            # bare table group, header-inferred all-string schema
            # (``Rdf/Converter.cs:105-107``)
            group = CompiledTableGroup()
            table = CompiledTable(url=root_url)
            table.columns_declared = False
            group.tables.append(table)

        # each CSV is one conversion root: emit only its own table's
        # triples (path-convention multi-table groups are converted once
        # per member CSV, each member owning its table — exactly-once
        # without cross-file coordination).  only_table_url (above) does
        # this without mutating the cached group.

        seed = f"{repo}|{commit}|{meta_path or ''}|{csv_path}"

        def csv_texts(url: str):
            return csv_text if url == root_url else None

    try:
        result = convert_file(group, csv_texts, mode=mode,
                              suppress_string_datatype=True, bnode_seed=seed,
                              encode_iris=encode_iris, fast_tables=True,
                              only_table_url=only_table_url)
        triples = result.triples
        tables = result.tables
        errors.extend(result.errors)
        rows = result.rows
    except Exception as ex:  # noqa: BLE001 - error side-channel (M15)
        triples, tables, rows = [], [], 0
        errors.append(f"{type(ex).__name__}: {ex}")
    return triples, tables, meta_path, rows, errors


#: one packed sort key per this many triples rides the wave checkpoint
#: as an ``rkind="s"`` sample row (see ``convert_batches`` /
#: ``sample_term_boundaries``); 68M triples → ~266k keys ≈ 25 MB driver
SAMPLE_STRIDE = 256


def convert_batches(ds, mode: str = MODE_MINIMAL, encode_iris: bool = False,
                    errors_out: str | None = None):
    """The central conversion UDF (C1-C14, U1-U4, D1-D8, J1-J4): stateless
    ``map_batches`` task, whole files in, triple rows out.

    Returns a dataset with marker column ``rkind``: ``"t"`` = triple row,
    ``"f"`` = per-file metrics row (rows/errors/metadata path) — the error
    side channel of M15.  Split downstream with ``split_convert_output``.
    """
    assert mode in (MODE_MINIMAL, MODE_STANDARD)

    def _convert(batch: pa.Table) -> pa.Table:
        import numpy as np

        shards_t, shards_f = [], []
        t_cols = {c: [] for c in TRIPLE_COLUMNS}
        fast_parts: list[pa.Table] = []   # vectorized fast-path term tables
        fast_shards: list[np.ndarray] = []
        f_cols = {c: [] for c in
                  ("repo", "path", "commit", "content_sha256", "metadata_path",
                   "rows", "n_triples", "n_errors", "errors", "triples_hash")}
        data = batch.to_pylist()
        # per-task caches: a directory's sidecar map and parsed metadata
        # are shared by every CSV row of that directory in the batch —
        # keyed by the serialized blob itself (a content fingerprint that
        # also pins resolver behavior), never by path alone
        meta_cache: dict = {}
        jf_cache: dict[tuple, dict] = {}
        for row in data:
            row_shard = int(row.get("shard", -1))
            attached = row.get("attached_csvs")
            jf_key = (row["repo"], row["json_files"])
            jf = jf_cache.get(jf_key)
            if jf is None:
                jf = jf_cache[jf_key] = json.loads(row["json_files"])
            triples, fast_tables, meta_path, nrows, errs = _convert_one(
                row["repo"], row["csv_path"], row["commit"],
                row["content_sha256"], row["csv_text"],
                json.loads(row["candidates"]), jf,
                mode, encode_iris=encode_iris,
                user_metadata=row.get("user_metadata"),
                attached_csvs=json.loads(attached) if attached else None,
                meta_cache=meta_cache, cache_key=jf_key)
            thash = 0
            for (s, p, o) in triples:
                thash ^= _triple_digest(s, p, o)
                t_cols["subj_kind"].append(s[0])
                t_cols["subj"].append(s[1])
                t_cols["pred"].append(p)
                t_cols["obj_kind"].append(o[0])
                t_cols["obj_value"].append(o[1])
                t_cols["obj_datatype"].append(o[2] if o[0] == "l" else None)
                t_cols["obj_lang"].append(o[3] if o[0] == "l" else None)
                t_cols["repo"].append(row["repo"])
                t_cols["path"].append(row["csv_path"])
                t_cols["commit"].append(row["commit"])
                t_cols["content_sha256"].append(row["content_sha256"])
                shards_t.append(row_shard)
            n_fast = 0
            for ft in fast_tables:
                if not ft.num_rows:
                    continue
                thash ^= _table_digest(ft)
                n_fast += ft.num_rows
                m = ft.num_rows
                cols = {c: ft[c] for c in ft.column_names}
                for c, v in (("repo", row["repo"]), ("path", row["csv_path"]),
                             ("commit", row["commit"]),
                             ("content_sha256", row["content_sha256"])):
                    # C-speed constant column (a [v]*m Python list costs
                    # ~15% of the batch UDF at 4.8k rows/file)
                    cols[c] = pa.nulls(m, type=pa.string()).fill_null(v)
                fast_parts.append(pa.table(
                    {c: cols[c] for c in TRIPLE_COLUMNS}))
                fast_shards.append(np.full(m, row_shard, dtype=np.int64))
            shards_f.append(row_shard)
            f_cols["repo"].append(row["repo"])
            f_cols["path"].append(row["csv_path"])
            f_cols["commit"].append(row["commit"])
            f_cols["content_sha256"].append(row["content_sha256"])
            f_cols["metadata_path"].append(meta_path)
            f_cols["rows"].append(nrows)
            f_cols["n_triples"].append(len(triples) + n_fast)
            f_cols["n_errors"].append(len(errs))
            f_cols["errors"].append(json.dumps(errs) if errs else None)
            f_cols["triples_hash"].append(f"{thash:016x}")

        triples_tbl = pa.Table.from_pydict(t_cols, schema=_TRIPLE_SCHEMA)
        if fast_parts:
            # chunked concat — each fast table rides as its own chunk; the
            # copying combine_chunks pass (one full rewrite of the batch's
            # ~100 MB of term bytes) is pure waste here because the merged
            # assembly below is chunk-based too
            triples_tbl = pa.concat_tables(
                [triples_tbl.cast(_TRIPLE_SCHEMA)]
                + [p.cast(_TRIPLE_SCHEMA) for p in fast_parts])
        meta_tbl = pa.Table.from_pydict(f_cols, schema=_FILEMETA_SCHEMA)
        # every SAMPLE_STRIDE-th triple's packed sort key rides the wave
        # checkpoint as an ``rkind="s"`` row: the merge's range boundaries
        # then come from these (driver reads ~0.4% of a key column)
        # instead of a second scan over the shards — at corpus scale the
        # sampling pass must happen DURING the pass that already holds
        # the triples (stratified per file-chunk, so unbiased)
        n_t, n_f = triples_tbl.num_rows, meta_tbl.num_rows
        shards_t_np = np.asarray(shards_t, dtype=np.int64)
        if fast_shards:
            shards_t_np = np.concatenate([shards_t_np] + fast_shards)
        # seeded UNIFORM sampling, not a fixed stride: the fast path emits
        # triples column-major in runs of (rows-per-file) rows, and when
        # the run length shares a factor with the stride the sample
        # aliases onto a fraction of the key space (900-row runs with
        # stride 256 share gcd 4 → only every 4th subject id ever sampled
        # → 2.5× sort-partition skew, measured).  The seed derives from
        # the batch's first file sha, so re-runs sample identically.
        if n_t:
            seed = (int(f_cols["content_sha256"][0][:8], 16) & 0x7FFFFFFF) \
                if f_cols["content_sha256"] and f_cols["content_sha256"][0] else 0
            rng = np.random.RandomState(seed)
            samp_idx = np.unique(rng.randint(
                0, n_t, size=max(1, n_t // SAMPLE_STRIDE)))
        else:
            samp_idx = np.zeros(0, dtype=np.int64)
        samp_keys = _join_cols(triples_tbl.take(samp_idx), _KEY_COLS) \
            if len(samp_idx) else pa.array([], type=pa.string())
        n_s = len(samp_keys)
        # align into one table with the marker column.  SINGLE-COPY
        # assembly: the per-file fast-path chunks flow straight into ONE
        # concat_arrays pass (a fully chunked zero-copy table was tried —
        # hundreds of ~1k-row chunks per block made the parquet write and
        # block serialization 1.5× slower; a table-level combine_chunks
        # BEFORE this loop would copy the batch's ~100 MB of term bytes a
        # second time for nothing)
        def _const(n: int, v: str):
            # C-speed constant/marker column (no n-element Python list)
            return pa.nulls(n, type=pa.string()).fill_null(v)

        merged = {"rkind": pa.concat_arrays(
                      [_const(n_t, "t"), _const(n_f, "f"), _const(n_s, "s")]),
                  "shard": pa.array(
                      np.concatenate([
                          shards_t_np,
                          np.asarray(shards_f, dtype=np.int64),
                          shards_t_np[samp_idx] if len(samp_idx)
                          else np.zeros(0, dtype=np.int64)]),
                      type=pa.int32())}
        for name in _TRIPLE_SCHEMA.names:
            left = triples_tbl[name]
            if name in meta_tbl.column_names:
                right = meta_tbl[name].combine_chunks()
            else:
                right = pa.nulls(n_f, type=pa.string())
            merged[name] = pa.concat_arrays(
                list(left.chunks) + [right, pa.nulls(n_s, type=pa.string())])
        for name in ("metadata_path", "errors", "triples_hash"):
            merged[name] = pa.concat_arrays([
                pa.nulls(n_t, type=pa.string()),
                meta_tbl[name].combine_chunks(),
                pa.nulls(n_s, type=pa.string())])
        for name in ("rows", "n_triples", "n_errors"):
            merged[name] = pa.concat_arrays([
                pa.nulls(n_t, type=pa.int64()),
                meta_tbl[name].combine_chunks(),
                pa.nulls(n_s, type=pa.int64())])
        merged["sample_key"] = pa.concat_arrays([
            pa.nulls(n_t + n_f, type=pa.string()),
            samp_keys.combine_chunks() if isinstance(samp_keys, pa.ChunkedArray)
            else samp_keys])
        return pa.Table.from_pydict(merged)

    return ds.map_batches(_convert, batch_format="pyarrow")


def split_convert_output(ds):
    """(triples_ds, filemeta_ds) from the marked convert output."""

    def _only(kind, cols):
        def fn(batch: pa.Table) -> pa.Table:
            sub = batch.filter(pc.equal(batch["rkind"], kind))
            return sub.select(cols)
        return fn

    triples = ds.map_batches(_only("t", TRIPLE_COLUMNS), batch_format="pyarrow")
    filemeta = ds.map_batches(
        _only("f", ["repo", "path", "commit", "content_sha256", "metadata_path",
                    "rows", "n_triples", "n_errors", "errors", "triples_hash"]),
        batch_format="pyarrow")
    return triples, filemeta


def triple_key_column(batch: pa.Table) -> pa.Table:
    """Content hash of the (s,p,o) term triple — the dedup / lineage key
    (G6; SURVEY.md §7: dedup key = sha256 of the six term fields)."""
    import numpy as np

    cols = [batch[c].to_pylist() for c in
            ("subj_kind", "subj", "pred", "obj_kind", "obj_value",
             "obj_datatype", "obj_lang")]
    keys = np.array([
        hashlib.sha256("\x1f".join("" if v is None else v for v in vals).encode())
        .hexdigest() for vals in zip(*cols)], dtype=object)
    return batch.append_column("tkey", pa.array(keys, type=pa.string()))


_FIELD_SEP = "\x1f"
_NULL_MARK = "\x00"
_ESC = "\x1e"


def _escape_cells(arr: pa.Array) -> pa.Array:
    """Escape the pack-control characters inside cell values so a literal
    ``\\x1f`` / ``\\x00`` in CSV text (legal input) cannot split into extra
    fields or round-trip to null.  ESC is escaped first so decoding is
    unambiguous.  Clean data (the overwhelmingly normal case) pays ONE
    boolean regex scan instead of three full-column ``replace_substring``
    copies — the pack stage is bandwidth-bound at full concurrency, so
    skipped allocations are wall time (33% off ``_join_cols`` measured)."""
    hit = pc.any(pc.match_substring_regex(
        arr, "[\x1e\x1f\x00]")).as_py()
    if not hit:  # all-null column scans to null → falsy → clean
        return arr
    a = pc.replace_substring(arr, pattern=_ESC, replacement=_ESC + "E")
    a = pc.replace_substring(a, pattern=_FIELD_SEP, replacement=_ESC + "F")
    return pc.replace_substring(a, pattern=_NULL_MARK, replacement=_ESC + "Z")


def _unescape_cells(arr: pa.Array) -> pa.Array:
    a = pc.replace_substring(arr, pattern=_ESC + "Z", replacement=_NULL_MARK)
    a = pc.replace_substring(a, pattern=_ESC + "F", replacement=_FIELD_SEP)
    return pc.replace_substring(a, pattern=_ESC + "E", replacement=_ESC)

#: the G7 output-sort key packed into ONE plain string column — sorting
#: by ``term_key`` is sorting by (subj, pred, obj_value), so one exchange
#: serves both the dedup co-location AND the final ordering.  Only these
#: three fields ride as the (wide) key; everything else crosses the
#: shuffle as dictionary-encoded payload (below).
_KEY_COLS = ["subj", "pred", "obj_value"]
#: remaining triple-identity fields (dedup compares key + these)
_IDENT_EXTRA = ["subj_kind", "obj_kind", "obj_datatype", "obj_lang"]
_LINEAGE_COLS = ["repo", "path", "commit", "content_sha256"]
#: payload columns that are per-file constants or low-cardinality — they
#: cross the all-to-all as Arrow dictionary-encoded columns (~2-4 B/row
#: of indices + one tiny dictionary per block, vs ~150 B/row of repeated
#: strings; the exchange is the pipeline's non-scaling phase, so shuffled
#: bytes are the lever).  Arrow cannot SORT by a dictionary column, which
#: is why the sort key itself stays a plain string.
_DICT_COLS = ["obj_datatype", "obj_lang", "repo", "path", "commit",
              "content_sha256"]


def _join_cols(batch: pa.Table, cols: list[str]) -> pa.Array:
    """Vectorized null-safe column concatenation (Arrow kernel).  Values
    are control-char-escaped first (``_escape_cells``); a bare NULL-mark
    therefore unambiguously means SQL-null."""
    arrays = [pc.fill_null(
        _escape_cells(batch[c].combine_chunks().cast(pa.string())),
        _NULL_MARK) for c in cols]
    return pc.binary_join_element_wise(*arrays, _FIELD_SEP)


def _strip_common_prefix(col: pa.Array, min_len: int = 8):
    """(prefix, suffix_array) for a string column: the longest common
    prefix of all non-null values is the common prefix of the column's
    MIN and MAX (one C-speed ``min_max`` scan, two Python strings
    compared), so no per-row Python.  Columns whose sharing is below
    ``min_len`` codepoints aren't worth the 4 B/row dictionary index and
    ship unsplit (empty prefix)."""
    mm = pc.min_max(col)
    lo, hi = mm["min"].as_py(), mm["max"].as_py()
    if lo is None:
        return "", col
    n = min(len(lo), len(hi))
    i = 0
    while i < n and lo[i] == hi[i]:
        i += 1
    if i < min_len:
        return "", col
    return lo[:i], pc.utf8_slice_codeunits(col, start=i)


def sample_term_boundaries(shards_dir: str, num_parts: int,
                           target_samples: int = 500_000,
                           expected_total: int | None = None) -> list[str]:
    """Range boundaries for the fused dedup+sort, from a DISTRIBUTED
    strided sample of the key columns.

    The earlier head-of-row-group sample was biased: a wave shard holds
    ~100 input files' triples in file order, so row-group heads
    over-represent each shard's FIRST files and the resulting quantiles
    put up to 3.35× the mean row count into one partition — whose 20 s
    post-sort task set the whole merge's critical path (ds.stats(), 68M
    triples @32 CPUs).  Instead: a column-pruned parallel read of the 3
    key columns, every k-th row packed with the SAME escaped key
    encoding as the exchange (k sized from parquet metadata row counts
    for ~``target_samples`` total), quantiles on the driver.  ~1-2% of
    the merge's own read, fully parallel, unbiased up to stride
    regularity.

    Sorting by the resulting small-int partition id instead of the wide
    string key keeps Ray's SortMap partition search on zero-copy numpy
    ints — the string-key path materializes the whole key column per
    boundary (measured 16 s/task vs <1 s).

    FAST PATH: the convert UDF checkpoints every ``SAMPLE_STRIDE``-th
    triple's packed key as an ``rkind="s"`` row (column ``sample_key``),
    so normally this is one driver-side metadata-pruned read of ~0.4% of
    one column — no second scan at all.  The distributed sample below
    remains as the fallback for shard layouts written before the sample
    channel existed."""
    import numpy as np
    import pyarrow.dataset as pads
    import ray.data as rd

    d = pads.dataset(shards_dir, format="parquet")
    keys: list[str] = []
    if "sample_key" in d.schema.names:
        keys = d.to_table(columns=["sample_key"],
                          filter=pads.field("rkind") == "s")
        keys = keys["sample_key"].to_pylist()
    if keys and expected_total:
        # coverage sanity check (a resumed corpus can mix waves written
        # BEFORE the sample channel existed with new ones — the fast-path
        # sample would then silently represent only the new waves' key
        # distribution, re-introducing partition skew): expect roughly
        # expected_total/SAMPLE_STRIDE keys; fall through to the
        # distributed strided sample when coverage is partial
        if len(keys) < (expected_total // SAMPLE_STRIDE) // 2:
            keys = []
    if not keys:
        # expected_total (manifest triple count) excludes the rkind='f'/'s'
        # bookkeeping rows that d.count_rows() would include
        total = expected_total or d.count_rows()
        if not total:
            return []
        stride = max(1, total // target_samples)

        def _sample(b: pa.Table) -> pa.Table:
            b = b.filter(pc.is_valid(b["subj"]))  # drop per-file metrics rows
            if not b.num_rows:
                return pa.table({"k": pa.nulls(0, type=pa.string())})
            t = b.take(np.arange(0, b.num_rows, stride))
            return pa.table({"k": _join_cols(t, _KEY_COLS)})

        keys = [r["k"] for r in rd.read_parquet(shards_dir,
                                                columns=list(_KEY_COLS))
                .map_batches(_sample, batch_format="pyarrow").take_all()]
    if not keys:
        return []
    keys.sort()
    bounds = []
    for i in range(1, num_parts):
        b = keys[min(len(keys) - 1, i * len(keys) // num_parts)]
        if not bounds or b != bounds[-1]:
            bounds.append(b)
    return bounds


def first_per_identity(t: pa.Table, sort_cols, ident_cols) -> pa.Table:
    """Deterministic winner per triple identity: min lineage under the
    column-tuple order, nulls last — all C-speed Arrow kernels (a
    pandas object sort here costs seconds per 500k-row block).

    Fused gather: ``sort_indices`` + a masked ``take`` instead of
    materializing the fully-sorted table and then filtering it — the
    non-identity columns are gathered exactly once, for the surviving
    rows only (the reduce stage is memory-bandwidth-bound at full
    concurrency; ~14% off the whole pass measured, byte-identical
    output)."""
    idx = pc.sort_indices(t, sort_keys=[(c, "ascending")
                                        for c in sort_cols])
    n = len(idx)
    keep = None
    for c in ident_cols:
        col = pc.take(t[c].combine_chunks(), idx)
        a, b = col.slice(0, n - 1), col.slice(1, n)
        both_null = pc.and_(pc.is_null(a), pc.is_null(b))
        neq = pc.if_else(both_null, pa.scalar(False),
                         pc.fill_null(pc.not_equal(a, b), True))
        keep = neq if keep is None else pc.or_(keep, neq)
    mask = pa.concat_arrays([pa.array([True]), keep.combine_chunks()
                             if isinstance(keep, pa.ChunkedArray) else keep])
    return t.take(pc.filter(idx, mask))


def dedup_triples(ds, boundaries: list[str] | None = None):
    """G6 + G7 in one exchange: RDF set semantics (dotNetRDF ``Graph``
    deduplicates on insert) fused with the global output sort.

    With ``boundaries`` (the scale path, used by the runner): rows get a
    small-int partition id (#boundaries ≤ escaped (subj,pred,obj_value)
    key), the range sort keys on that INT, and the triple fields cross
    the exchange as dictionary-encoded COLUMNS; the reduce side then
    fully sorts + dedups each merged partition with Arrow kernels.
    Without boundaries (generic/small callers): one packed string key is
    sorted directly.

    Exactness rests on two Ray sort invariants (ray 2.49,
    ``table_block._find_partitions_sorted`` / ``merge_sorted_blocks``):
    range partitioning maps every row with the same key value to the same
    partition, and each reduce partition merges into one block — so all
    copies of a triple land in one block and the in-block pass sees every
    one of them (with boundaries this holds trivially: the part id is a
    pure function of the key).  ``batch_size=None`` keeps one UDF call
    per block.  Output order is (subj, pred, obj_value) except for values
    containing ASCII control chars < 0x1f, where the packed-key order used
    for partitioning can differ from column-tuple order across a
    partition boundary (dedup is unaffected; documented trade).

    Why not ``groupby().map_groups(head(1))`` or ``aggregate(Min)``: both
    pay per-distinct-key Python/accumulator overhead — at one group per
    distinct triple that overhead IS the corpus (measured 4-10x the cost
    of this sort-based formulation).
    """

    _PASS_COLS = _IDENT_EXTRA + _LINEAGE_COLS
    _SORT_COLS = ["term_key"] + _IDENT_EXTRA + _LINEAGE_COLS
    columnar = boundaries is not None
    dict_cols = set(_DICT_COLS) | (
        {"pred", "subj_kind", "obj_kind"} if columnar else set())

    def _canon_str(col):
        col = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
        if pa.types.is_dictionary(col.type):
            col = col.cast(col.type.value_type)
        if pa.types.is_null(col.type):
            col = pa.nulls(len(col), type=pa.string())
        return col.cast(pa.string())

    def _pack(batch: pa.Table) -> pa.Table:
        # pure Arrow kernels, no pandas round-trip.  No local combiner:
        # measured dup ratio in converted corpora is a few percent, so a
        # per-block pandas sort+dedup cost far more CPU than the bytes it
        # saved the exchange; the reduce side dedups exactly regardless.
        term_key = _join_cols(batch, _KEY_COLS)
        if columnar:
            # partition id = #boundaries <= key, via ONE binary search of
            # the block's keys against the sorted boundary list —
            # O(N log B) regardless of boundary count (the per-boundary
            # Arrow memcmp pass was O(N·B), which forbade fine
            # boundaries).  Equal keys share a partition by construction,
            # so the reduce-side dedup stays exact; the range sort then
            # keys on this small int instead of the wide string, and the
            # triple columns cross the exchange AS columns — no
            # packed-string split/unescape on the reduce side at all
            import numpy as np

            keys_np = term_key.to_numpy(zero_copy_only=False)
            part = pa.array(np.searchsorted(
                np.asarray(boundaries, dtype=object), keys_np,
                side="right").astype(np.int32))
            out = {"part": part}
            for c in TRIPLE_COLUMNS:
                col = _canon_str(batch[c])
                if c == "subj":
                    # prefix-split: subject IRIs in a block share a long
                    # common prefix (file base URI + aboutUrl template
                    # head), found in O(1) from the block's min/max — ship
                    # it ONCE as a 1-entry dictionary column and only the
                    # per-row tail as plain bytes (~30-50% of subj bytes;
                    # the exchange is the non-scaling phase, bytes are the
                    # lever).  The reduce side re-joins before any
                    # compare, so sort/dedup exactness is untouched.
                    pfx, col = _strip_common_prefix(col)
                    out["subj_pfx"] = pa.DictionaryArray.from_arrays(
                        pa.nulls(len(col), pa.int32()).fill_null(0),
                        pa.array([pfx], type=pa.string()))
                out[c] = pc.dictionary_encode(col) if c in dict_cols else col
            return pa.table(out)
        return pa.table({
            "term_key": term_key,
            **{c: (pc.dictionary_encode(_canon_str(batch[c]))
                   if c in dict_cols else _canon_str(batch[c]))
               for c in _PASS_COLS}})

    def _adjacent(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return pa.table({c: pa.nulls(0, type=pa.string())
                             for c in TRIPLE_COLUMNS})
        if columnar:
            cols = {c: _canon_str(batch[c]) for c in TRIPLE_COLUMNS}
            # undo the prefix-split (concat unified the per-block 1-entry
            # dictionaries; decode + element-wise join restores full IRIs
            # BEFORE any sort/compare)
            cols["subj"] = pc.binary_join_element_wise(
                _canon_str(batch["subj_pfx"]), cols["subj"], "")
            t = pa.table(cols)
            t = first_per_identity(t, _KEY_COLS + _IDENT_EXTRA + _LINEAGE_COLS,
                                   _KEY_COLS + _IDENT_EXTRA)
            return t.select(TRIPLE_COLUMNS)
        t = pa.table({c: _canon_str(batch[c]) for c in batch.column_names})
        t = first_per_identity(t, _SORT_COLS, ["term_key"] + _IDENT_EXTRA)
        terms = pc.split_pattern(t["term_key"].combine_chunks(), _FIELD_SEP)
        out = {}
        for i, c in enumerate(_KEY_COLS):
            v = pc.list_element(terms, i)
            out[c] = pc.if_else(pc.equal(v, _NULL_MARK),
                                pa.nulls(len(t), type=pa.string()),
                                _unescape_cells(v))
        for c in _PASS_COLS:
            out[c] = t[c].combine_chunks()
        return pa.table({c: out[c] for c in TRIPLE_COLUMNS})

    packed = ds.map_batches(_pack, batch_format="pyarrow")
    sorted_ds = packed.sort("part" if columnar else "term_key")
    return sorted_ds.map_batches(_adjacent, batch_format="pyarrow",
                                 batch_size=None)


def canonicalize_triple_schema(ds):
    """Cast every triple column to its declared string type.  Pandas
    round-trips (map_groups) infer all-null columns as null-typed, which
    breaks downstream concat/write schema unification."""

    def _cast(batch: pa.Table) -> pa.Table:
        arrays, names = [], []
        for name in batch.column_names:
            col = batch[name].combine_chunks()
            if name in TRIPLE_COLUMNS:
                col = pa.nulls(len(batch), type=pa.string()) \
                    if pa.types.is_null(col.type) else col.cast(pa.string())
            arrays.append(col)
            names.append(name)
        return pa.table(dict(zip(names, arrays)))

    return ds.map_batches(_cast, batch_format="pyarrow")


#: characters that force the slow (escaping) render path: IRIs escape
#: controls, space and <>"{}|^`\ (ntriples.py `_escape_iri`); literals
#: escape only quote, backslash and control chars — a space in a literal
#: is legal and must NOT push the row onto the slow path
_IRI_SPECIAL = r'[\x00-\x20"\\<>{}|^`]'
_LIT_SPECIAL = r'["\\\x00-\x1f]'


def _count_true(mask) -> int:
    return pc.sum(pc.cast(pc.fill_null(mask, False), pa.int64())).as_py() or 0


def render_ntriples_table(batch: pa.Table, out: str = "nt") -> pa.Table:
    """Table-level N-Triples renderer (see render_ntriples_column) —
    shared by the streaming render stage and the resumable merge's
    per-partition tasks."""
    n = len(batch)
    cols = {c: batch[c].combine_chunks().cast(pa.string())
            for c in ("subj_kind", "subj", "pred", "obj_kind",
                      "obj_value", "obj_datatype", "obj_lang")}
    is_lit = pc.equal(cols["obj_kind"], "l")
    n_lit = _count_true(is_lit)
    # IRI-positioned text: subj + pred (+ obj when it's an IRI) + dt
    if n_lit == n:
        iri_obj = pc.fill_null(cols["obj_datatype"], "")
    elif n_lit == 0:
        iri_obj = cols["obj_value"]
    else:
        iri_obj = pc.if_else(is_lit, pc.fill_null(cols["obj_datatype"], ""),
                             cols["obj_value"])
    iri_joined = pc.binary_join_element_wise(
        cols["subj"], cols["pred"], iri_obj, "")
    needs_escape = pc.match_substring_regex(iri_joined, _IRI_SPECIAL)
    if n_lit:
        lit_text = cols["obj_value"] if n_lit == n else pc.if_else(
            is_lit, cols["obj_value"], pa.nulls(n, pa.string()).fill_null(""))
        needs_escape = pc.or_(
            needs_escape, pc.match_substring_regex(lit_text, _LIT_SPECIAL))

    # each term text is ONE multi-arg element-wise join (scalars
    # broadcast), not a chain of pairwise joins — halves the kernel
    # passes of this stage (measured ~1.5 s/M rows across ~14 passes)
    is_b = pc.equal(cols["subj_kind"], "b")
    n_b = _count_true(is_b)
    if n_b == 0:
        subj_txt = pc.binary_join_element_wise("<", cols["subj"], ">", "")
    elif n_b == n:
        subj_txt = pc.binary_join_element_wise("_:", cols["subj"], "")
    else:
        subj_txt = pc.if_else(
            is_b,
            pc.binary_join_element_wise("_:", cols["subj"], ""),
            pc.binary_join_element_wise("<", cols["subj"], ">", ""))
    pred_txt = pc.binary_join_element_wise("<", cols["pred"], ">", "")

    kind = cols["obj_kind"]
    dt = cols["obj_datatype"]
    lang = cols["obj_lang"]
    ov = cols["obj_value"]
    if n_lit:
        n_lang = _count_true(pc.is_valid(lang))
        n_dt = _count_true(pc.is_valid(dt))
        lit_txt = pc.binary_join_element_wise('"', ov, '"', "") \
            if n_dt == 0 else pc.if_else(
                pc.is_valid(dt),
                pc.binary_join_element_wise(
                    '"', ov, '"^^<', pc.fill_null(dt, ""), ">", ""),
                pc.binary_join_element_wise('"', ov, '"', ""))
        if n_lang:
            lit_txt = pc.if_else(
                pc.is_valid(lang),
                pc.binary_join_element_wise(
                    '"', ov, '"@', pc.fill_null(lang, ""), ""),
                lit_txt)
    if n_lit == n:
        obj_txt = lit_txt
    else:
        n_ob = _count_true(pc.equal(kind, "b"))
        iri_obj_txt = pc.binary_join_element_wise("_:", ov, "") \
            if n_ob == n - n_lit else (
                pc.binary_join_element_wise("<", ov, ">", "")
                if n_ob == 0 else pc.if_else(
                    pc.equal(kind, "b"),
                    pc.binary_join_element_wise("_:", ov, ""),
                    pc.binary_join_element_wise("<", ov, ">", "")))
        obj_txt = iri_obj_txt if n_lit == 0 else pc.if_else(
            pc.equal(kind, "l"), lit_txt, iri_obj_txt)
    fast = pc.binary_join_element_wise(
        subj_txt, pred_txt, obj_txt, ".", " ")

    # per-row escaping for ONLY the masked rows (gather → render →
    # scatter): the old formulation materialized all 8 columns to
    # Python lists the moment a single row needed escaping, which on
    # an escape-bearing web corpus is every batch
    needs_escape = pc.fill_null(needs_escape, False)
    if pc.any(needs_escape).as_py():
        idx = pc.indices_nonzero(needs_escape)
        sub = {c: pc.take(cols[c], idx).to_pylist()
               for c in ("subj_kind", "subj", "pred", "obj_kind",
                         "obj_value", "obj_datatype", "obj_lang")}
        slow = []
        for i in range(len(idx)):
            o = (("l", sub["obj_value"][i], sub["obj_datatype"][i],
                  sub["obj_lang"][i]) if sub["obj_kind"][i] == "l"
                 else (sub["obj_kind"][i], sub["obj_value"][i]))
            slow.append(render_triple(
                ((sub["subj_kind"][i], sub["subj"][i]),
                 sub["pred"][i], o)))
        lines = pc.replace_with_mask(
            fast, needs_escape, pa.array(slow, type=pa.string()))
    else:
        lines = fast
    return batch.append_column(out, lines)



def render_ntriples_column(ds, out: str = "nt"):
    """Final projection: one N-Triples line per triple row (sink analogue
    of ``IRdfHandler`` → writer, S6).

    Vectorized fast path: rows whose terms contain no escapable character
    (the overwhelming majority) are assembled with Arrow string kernels;
    only the rest go through the exact per-row escaping renderer.

    Per-batch homogeneity short-circuits: a branch whose selector never
    fires in this block (no language tags, no datatypes, no blank nodes,
    all/no literals — boolean counts, ~1 ms each) skips both its join
    pass and the blending ``if_else`` copy.  Real blocks are overwhelmingly
    homogeneous (a sorted merge partition holds runs of one predicate's
    triples), so this removes 2-4 of the stage's full-column passes
    (``lit_txt`` alone was 157 ms of a 620 ms/354k-row block)."""
    return ds.map_batches(
        lambda b: render_ntriples_table(b, out=out), batch_format="pyarrow")


def triples_to_terms(rows: list[dict]) -> list:
    """Triple rows (dicts) → term-tuple triples, for isomorphism tests."""
    out = []
    for r in rows:
        s = (r["subj_kind"], r["subj"])
        if r["obj_kind"] == "l":
            o = ("l", r["obj_value"], r["obj_datatype"], r["obj_lang"])
        else:
            o = (r["obj_kind"], r["obj_value"])
        out.append((s, r["pred"], o))
    return out
