"""Deduplication family over a documents table.

All operators are deterministic (seeded hash families, ties broken by id)
so re-runs and retries produce identical output at any parallelism.

Distributed shapes:

- exact:    sha256 per batch (combiner dedup) → groupby(hash) keep min id
- MinHash:  shingle→signature per batch → explode (band, band_hash) rows →
            groupby(band bucket) → candidate pairs → pair-level dedup →
            (optional) exact-Jaccard verify as a second grouped pass
- SimHash:  64-bit signature per batch → band on 4×16-bit chunks →
            groupby → verify Hamming distance in-bucket
- embedding near-dup: random-hyperplane LSH bucket → in-bucket cosine
  (numpy matmul) → pairs ≥ threshold

The candidate-pair sets are assumed ≪ corpus size (the LSH contract);
clustering runs union-find on the collected pair list, which is the only
driver-side step and is bounded by the number of near-duplicate pairs.
"""

from __future__ import annotations

import hashlib
import re
import struct

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

__all__ = [
    "add_sha256_column", "exact_dedup", "minhash_signatures",
    "lsh_candidate_pairs", "verify_jaccard_pairs", "ngram_jaccard_allpairs",
    "simhash_signatures",
    "simhash_candidate_pairs", "embedding_neardup_pairs", "auto_num_planes",
    "cluster_pairs", "cluster_pairs_distributed", "dedup_keep_ids",
]

_TOKEN = re.compile(r"\w+", re.UNICODE)

# Mersenne prime hash family for minhash permutations
_P = (1 << 61) - 1

#: signature sets above this stay OFF the object store (parquet
#: checkpoint + re-read) — below it, three zero-copy consumptions of a
#: materialized dataset beat a disk round-trip by seconds
CHECKPOINT_BYTES = 256 << 20

#: per-doc value sets (signatures / shingle sets) at or below this are
#: BROADCAST (``ray.put`` once, zero-copy ``ray.get`` per task) and the
#: pair pipeline attaches them by sorted-id lookup inside ``map_batches``
#: instead of bucketed join shuffles — the "broadcast the small side"
#: pattern.  Above it, the explicit bucketed hash joins run (nothing
#: driver-sized ever rides an exchange).
BROADCAST_BYTES = 64 << 20


def _hash64(data: bytes) -> int:
    return struct.unpack("<Q", hashlib.blake2b(data, digest_size=8).digest())[0]


def _hash_str_array(strings, family: str = "fast") -> np.ndarray:
    """64-bit hashes of a token/gram string sequence.

    ``fast`` (default): ONE vectorized ``pandas.util.hash_array`` call
    (SipHash in C, fixed key — deterministic across processes/workers;
    the same hasher the sampling/sketch fast paths use).  The per-gram
    Python ``hashlib`` loop this replaces was the signature stages' CPU
    floor at corpus-scale token counts.  ``blake2b``: the audited
    per-gram path, kept for bit-compatibility with externally pinned
    signatures.  Both are uniform 64-bit families — LSH banding, SimHash
    and winnowing semantics are family-agnostic."""
    n = len(strings)
    if family == "fast":
        if not n:
            return np.empty(0, dtype=np.uint64)
        from pandas.util import hash_array

        return hash_array(np.asarray(strings, dtype=object),
                          categorize=False).astype(np.uint64)
    return np.fromiter((_hash64(s.encode()) for s in strings),
                       dtype=np.uint64, count=n)


def _perm_params(num_perm: int, seed: int) -> tuple[np.ndarray, np.ndarray]:
    rng = np.random.RandomState(seed)
    a = rng.randint(1, _P, size=num_perm, dtype=np.uint64)
    b = rng.randint(0, _P, size=num_perm, dtype=np.uint64)
    return a, b


def shingle_hashes(text: str, ngram: int = 3,
                   hash_family: str = "fast") -> np.ndarray:
    """Word-shingle 64-bit hashes (n-gram Jaccard universe)."""
    toks = [t.casefold() for t in _TOKEN.findall(text)]
    if len(toks) < ngram:
        grams = [" ".join(toks)] if toks else []
    else:
        grams = [" ".join(toks[i:i + ngram]) for i in range(len(toks) - ngram + 1)]
    return np.unique(_hash_str_array(grams, hash_family))


# ---------------------------------------------------------------------------
# exact dedup

def add_sha256_column(ds, col: str = "text", out: str = "text_sha256"):
    def _sha(batch: pa.Table) -> pa.Table:
        vals = [hashlib.sha256((v or "").encode()).hexdigest()
                for v in batch[col].to_pylist()]
        return batch.append_column(out, pa.array(vals, type=pa.string()))

    return ds.map_batches(_sha, batch_format="pyarrow")


def exact_dedup(ds, col: str = "text", id_col: str = "doc_id",
                num_buckets: int = 64):
    """Hash-partitioned exact dedup keeping the min id per content hash.

    Per-batch local dedup acts as the combiner before the shuffle; the
    exchange groups by a bounded BUCKET (hash prefix of the digest), not
    by the digest itself — ``groupby(digest).map_groups`` pays one pandas
    call per *distinct document*, which at corpus scale IS the corpus
    (the map_groups-cardinality trap; see ``pipeline/stages.dedup_triples``).
    One vectorized ``drop_duplicates`` per bucket does the same work in
    ``num_buckets`` calls total."""
    import pandas as pd

    ds = add_sha256_column(ds, col=col)

    def _local(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        df = df.sort_values([  # deterministic local winner
            "text_sha256", id_col]).drop_duplicates("text_sha256")
        # bucket on the digest prefix: all rows of one hash share a bucket
        df["_bucket"] = [int(h[:8], 16) % num_buckets for h in df["text_sha256"]]
        return pa.Table.from_pandas(df, preserve_index=False)

    def _bucket_first(g: pd.DataFrame) -> pd.DataFrame:
        return (g.sort_values(["text_sha256", id_col])
                .drop_duplicates("text_sha256")
                .drop(columns=["_bucket"]))

    return (ds.map_batches(_local, batch_format="pyarrow")
            .groupby("_bucket").map_groups(_bucket_first, batch_format="pandas"))


# ---------------------------------------------------------------------------
# bucketed pair ⋈ per-id value join (shared by the MinHash estimate and the
# exact-Jaccard verify — keeps candidate lists OFF the driver)

def _attach_value(pairs_ds, pair_schema: dict, value_ds, key_col: str,
                  id_col: str, value_col: str, out_col: str,
                  value_type: pa.DataType, num_buckets: int = 64,
                  dedup_pairs: bool = False):
    """Attach ``value_ds[value_col]`` (keyed by ``id_col``) to each pair row
    as ``out_col``, joining on ``pairs_ds[key_col]`` — an explicit bucketed
    hash join (int ids): both sides tagged with ``bucket = key & (B-1)``
    into ONE unified schema (missing columns as typed nulls — the shuffle
    reduce concats Arrow blocks and requires identical schemas), one
    union + groupby(bucket) exchange, one vectorized pandas merge per
    bucket.  ``pair_schema`` maps pair column → Arrow type; the join
    output is emitted as Arrow with that schema pinned so empty buckets
    cannot promote int columns to float64 (or drift list/large_list)
    across the shuffle concat.  Pairs whose key has no value row are
    dropped (inner join).  ``dedup_pairs=True`` drops duplicate pair rows
    before the merge — every copy of a pair shares ``key_col``, so they
    all land in one bucket and the join doubles as the global pair dedup,
    saving the separate groupby-(a, b) exchange (whose multi-key sort was
    the most expensive stage of the candidate pipeline)."""
    import pandas as pd

    pair_cols = list(pair_schema)
    payload = dict(pair_schema)
    payload[out_col] = value_type

    def _tag(side: str, kcol: str, have: dict):
        def fn(b: pa.Table) -> pa.Table:
            k = b[kcol].combine_chunks().cast(pa.int64())
            bucket = pc.cast(
                pc.bit_wise_and(k, pa.scalar(num_buckets - 1)), pa.int32())
            cols = {"bucket": bucket,
                    "side": pa.array([side] * len(b), type=pa.string()),
                    "k": k}
            for c, typ in payload.items():
                src = have.get(c)
                cols[c] = (b[src].combine_chunks().cast(typ) if src
                           else pa.nulls(len(b), type=typ))
            return pa.table(cols)
        return fn

    out_cols = pair_cols + [out_col]

    def _join(g: pd.DataFrame) -> pa.Table:
        p = g[g["side"] == "p"].reindex(columns=["k"] + pair_cols)
        if dedup_pairs:
            p = p.drop_duplicates(pair_cols)
        v = (g[g["side"] == "v"].reindex(columns=["k", out_col]))
        m = p.merge(v, on="k", how="inner").reindex(columns=out_cols)
        # emit Arrow with the schema pinned explicitly: pandas→Arrow
        # inference on empty/object columns drifts between list/large_list
        # and int64/float64 across blocks, which breaks the shuffle concat
        return pa.table({
            c: pa.array([None if x is None else
                         (x.tolist() if hasattr(x, "tolist") else x)
                         for x in m[c]], type=t)
            for c, t in payload.items()})

    left = pairs_ds.map_batches(
        _tag("p", key_col, {c: c for c in pair_cols}), batch_format="pyarrow")
    right = value_ds.map_batches(
        _tag("v", id_col, {out_col: value_col}), batch_format="pyarrow")
    # reduce-partition count pinned to the bucket count: the shuffle's
    # cost at low data volume is per-task dispatch latency, and there are
    # only ``num_buckets`` distinct keys anyway
    return left.union(right).groupby("bucket", num_partitions=num_buckets) \
        .map_groups(_join, batch_format="pandas")


# ---------------------------------------------------------------------------
# MinHash + LSH

def minhash_signatures(ds, col: str = "text", id_col: str = "doc_id",
                       num_perm: int = 128, ngram: int = 3, seed: int = 42,
                       keep_shingles: bool = False,
                       hash_family: str = "fast"):
    """(id, signature[num_perm]) per document; vectorized over the
    permutation axis with numpy (one (shingles × perms) broadcast per doc)."""
    a, b = _perm_params(num_perm, seed)

    def _sig(batch: pa.Table) -> pa.Table:
        ids = batch[id_col].to_pylist()
        sigs, shingle_lists = [], []
        for text in batch[col].to_pylist():
            sh = shingle_hashes(text or "", ngram=ngram,
                                hash_family=hash_family)
            if sh.size == 0:
                sig = np.full(num_perm, np.iinfo(np.uint64).max, dtype=np.uint64)
            else:
                # (a*x + b) mod p, min over shingles, per permutation
                prod = (sh[:, None] * a[None, :] + b[None, :]) % _P
                sig = prod.min(axis=0).astype(np.uint64)
            sigs.append(sig)
            if keep_shingles:
                shingle_lists.append(sh.tolist())
        out = {id_col: pa.array(ids),
               "signature": pa.array([s.tolist() for s in sigs],
                                     type=pa.list_(pa.uint64()))}
        if keep_shingles:
            out["shingles"] = pa.array(shingle_lists, type=pa.list_(pa.uint64()))
        return pa.Table.from_pydict(out)

    return ds.map_batches(_sig, batch_format="pyarrow")


def _broadcast_uniform_sigs(sig_mat, id_col: str):
    """``ray.put`` a small signature set as ``(ids_sorted, sig_matrix)``
    numpy arrays for in-task lookup, or ``None`` when the signatures are
    ragged/empty (the join path handles those)."""
    import ray

    tbl = pa.concat_tables(ray.get(sig_mat.to_arrow_refs()))
    if not tbl.num_rows:
        return None
    sig = tbl["signature"].combine_chunks()
    offs = np.diff(sig.offsets.to_numpy(zero_copy_only=False))
    if not offs.size or not (offs == offs[0]).all() or not offs[0]:
        return None
    num_perm = int(offs[0])
    first = int(sig.offsets[0].as_py())
    mat = sig.values.to_numpy(zero_copy_only=False) \
        [first:first + tbl.num_rows * num_perm] \
        .astype(np.uint64, copy=False).reshape(tbl.num_rows, num_perm)
    ids = tbl[id_col].combine_chunks().to_numpy(zero_copy_only=False) \
        .astype(np.int64, copy=False)
    order = np.argsort(ids, kind="stable")
    return ray.put((ids[order], mat[order]))


def lsh_candidate_pairs(sig_ds, id_col: str = "doc_id", num_bands: int = 32,
                        threshold: float = 0.5, max_bucket_size: int = 4096,
                        num_buckets: int = 64,
                        checkpoint_dir: str | None = None,
                        broadcast_bytes: int = BROADCAST_BYTES):
    """Band the signatures, group by (band, band-hash) bucket, emit
    candidate pairs, estimate Jaccard from signature agreement, keep pairs
    with estimate ≥ ``threshold``, deduped across bands.

    Scale shape (no driver materialization anywhere):

    - only slim ``(id, band, band_hash)`` rows ride the band exchange —
      the full signature (the widest column) does NOT get ×num_bands
      amplification;
    - a hot band bucket (a flood of identical documents — the normal
      web-crawl case) is emitted in id-sorted CHUNKS of
      ``max_bucket_size`` with one-doc overlap, bounding the per-bucket
      pair count at O(bucket · chunk) instead of O(bucket²) while keeping
      the duplicate run CONNECTED for downstream clustering (same
      treatment as ``embedding_neardup_pairs``);
    - the candidate list stays a Dataset: signatures are re-attached via
      two bucketed hash joins (``_attach_value``), and the Jaccard
      estimate is one vectorized ``(n_pairs × num_perm)`` numpy compare
      per batch — no per-pair Python.

    Signature storage triage by materialized size:

    - ≤ ``broadcast_bytes``: the signatures are BROADCAST (``ray.put``
      once, zero-copy per task) and the estimate + threshold filter run
      INSIDE the band-bucket reduce via sorted-id lookup — the two
      bucketed signature-join shuffles disappear and only the slim
      surviving ``(a, b, est)`` rows ride one final dedup exchange;
    - ≤ ``CHECKPOINT_BYTES``: materialized in the object store, three
      zero-copy consumptions (band explode + two bucketed joins);
    - larger (or ``checkpoint_dir`` set): checkpointed to parquet (lz4:
      the payload is near-incompressible random uint64s) and re-read per
      consumption — pinning num_perm × 8 B/doc for the whole multi-stage
      run would hold real object-store memory hostage.

    Output: (a, b, est_jaccard) with a < b, sorted ids.
    """
    import tempfile

    import pandas as pd
    import ray
    import ray.data as rd

    bcast = None
    sig_mat = sig_ds.materialize()
    if checkpoint_dir is not None or sig_mat.size_bytes() > CHECKPOINT_BYTES:
        ckpt = checkpoint_dir or tempfile.mkdtemp(prefix="csvweb_sig_ckpt_")
        if checkpoint_dir is None:
            # the returned Dataset is lazy — the parquet must outlive every
            # consumption, so the auto tempdir (corpus-scale signatures can
            # be TBs) is reclaimed at interpreter exit, not eagerly
            import atexit
            import shutil

            atexit.register(shutil.rmtree, ckpt, ignore_errors=True)
        sig_mat.write_parquet(ckpt, compression="lz4")
        del sig_mat  # release the pinned object-store copy
        sig_ds = rd.read_parquet(ckpt)
    else:
        sig_ds = sig_mat
        if sig_mat.size_bytes() <= broadcast_bytes:
            bcast = _broadcast_uniform_sigs(sig_mat, id_col)

    def _explode(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        sig_col = batch["signature"].combine_chunks()
        offs = np.diff(sig_col.offsets.to_numpy(zero_copy_only=False))
        if n and offs.size and (offs == offs[0]).all() and offs[0] >= num_bands:
            # uniform signature length (the normal case): zero-copy flatten
            # → (docs, bands, lanes) view, one vectorized FNV-1a fold over
            # the lane axis — no per-doc×band Python.  Band-hash VALUES
            # differ from the blake2b fallback below, but LSH only uses
            # hash EQUALITY (equal band chunks collide under any
            # deterministic hash; 64-bit cross-collisions are negligible),
            # so the candidate-pair set is unchanged.
            num_perm = int(offs[0])
            rpb = num_perm // num_bands
            # a sliced ListArray's .values spans the UNsliced child —
            # window it by the first offset before reshaping
            first = int(sig_col.offsets[0].as_py())
            flat = sig_col.values.to_numpy(zero_copy_only=False) \
                [first:first + n * num_perm].astype(np.uint64, copy=False)
            lanes = flat.reshape(n, num_perm)[:, :num_bands * rpb] \
                .reshape(n, num_bands, rpb)
            h = np.full((n, num_bands), 0xCBF29CE484222325, dtype=np.uint64)
            fnv = np.uint64(0x100000001B3)
            for j in range(rpb):
                h ^= lanes[:, :, j]
                h *= fnv
            ids_np = np.repeat(
                batch[id_col].combine_chunks().to_numpy(zero_copy_only=False),
                num_bands)
            bands_np = np.tile(np.arange(num_bands, dtype=np.int64), n)
            bh = h.reshape(-1)
        else:  # ragged / degenerate signatures: exact per-doc fallback
            ids = batch[id_col].to_pylist()
            sigs = batch["signature"].to_pylist()
            rows_id, rows_band, rows_bh = [], [], []
            for i, sig in zip(ids, sigs):
                arr = np.asarray(sig, dtype=np.uint64)
                rows_per_band = len(arr) // num_bands
                for band in range(num_bands):
                    chunk = arr[band * rows_per_band:(band + 1) * rows_per_band]
                    rows_id.append(i)
                    rows_band.append(band)
                    rows_bh.append(_hash64(chunk.tobytes()))
            ids_np = np.asarray(rows_id)
            bands_np = np.asarray(rows_band, dtype=np.int64)
            bh = np.asarray(rows_bh, dtype=np.uint64)
        # the exchange groups by a BOUNDED bucket of the (band, band_hash)
        # key, not the key itself: one pandas call per (band, hash) would
        # be one call per document×band — the map_groups-cardinality trap
        bucket = ((bh ^ (bands_np.astype(np.uint64) * np.uint64(0x9E3779B97F4A7C15)))
                  & np.uint64(num_buckets - 1)).astype(np.int32)
        return pa.Table.from_pydict({
            id_col: pa.array(ids_np),
            "band": pa.array(bands_np, type=pa.int32()),
            "band_hash": pa.array(bh, type=pa.uint64()),
            "bucket": pa.array(bucket, type=pa.int32()),
        })

    def _allpairs(ids: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
        ai, bi = np.triu_indices(len(ids), k=1)
        return ids[ai], ids[bi]

    def _capped_pairs(ids: np.ndarray, out_a: list, out_b: list) -> None:
        ids = np.sort(ids)
        if len(ids) <= max_bucket_size:
            a, b = _allpairs(ids)
            out_a.append(a)
            out_b.append(b)
            return
        step = max_bucket_size - 1  # one-doc overlap chains the chunks
        for start in range(0, len(ids) - 1, step):
            a, b = _allpairs(ids[start:start + max_bucket_size])
            out_a.append(a)
            out_b.append(b)

    def _bucket_pairs(g: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame({"a": pd.Series([], dtype="int64"),
                              "b": pd.Series([], dtype="int64")})
        # vectorized pre-filter: only (band, band_hash) groups with ≥2
        # members can emit pairs — the Python loop below runs per
        # *collision group*, bounded by the near-duplicate count, not the
        # corpus
        g = g[g.duplicated(["band", "band_hash"], keep=False)]
        if g.empty:
            return empty
        out_a: list = []
        out_b: list = []
        for _, sub in g.groupby(["band", "band_hash"], sort=False):
            _capped_pairs(sub[id_col].to_numpy(), out_a, out_b)
        df = pd.DataFrame({"a": np.concatenate(out_a),
                           "b": np.concatenate(out_b)}).astype("int64")
        # overlap chunks and multi-band collisions inside one bucket can
        # repeat a pair; local dedup before the (a, b) exchange
        return df.drop_duplicates(["a", "b"])

    if bcast is not None:
        # broadcast path: signatures looked up in-task, estimate +
        # threshold filter fused into the band-bucket reduce; only the
        # slim survivors ride the final (global) pair-dedup exchange
        _EMPTY_EST = {"a": pd.Series([], dtype="int64"),
                      "b": pd.Series([], dtype="int64"),
                      "est_jaccard": pd.Series([], dtype="float64"),
                      "db": pd.Series([], dtype="int64")}

        def _bucket_pairs_est(g: pd.DataFrame) -> pd.DataFrame:
            df = _bucket_pairs(g)
            if df.empty:
                return pd.DataFrame(_EMPTY_EST)
            ids, mat = ray.get(bcast)
            a = df["a"].to_numpy()
            b = df["b"].to_numpy()
            ia = np.minimum(np.searchsorted(ids, a), len(ids) - 1)
            ib = np.minimum(np.searchsorted(ids, b), len(ids) - 1)
            # pairs derive from the same signature set, so every id is
            # present; the exact-match guard keeps inner-join parity
            # regardless (bcast is never built from an empty set)
            ok = (ids[ia] == a) & (ids[ib] == b)
            est = np.zeros(len(df), dtype=np.float64)
            est[ok] = (mat[ia[ok]] == mat[ib[ok]]).mean(axis=1)
            keep = ok & (est >= threshold)
            if not keep.any():
                return pd.DataFrame(_EMPTY_EST)
            return pd.DataFrame({
                "a": a[keep], "b": b[keep], "est_jaccard": est[keep],
                "db": a[keep] & (num_buckets - 1)})

        def _dedup_group(g: pd.DataFrame) -> pd.DataFrame:
            return g.drop_duplicates(["a", "b"]).drop(columns=["db"])

        return (sig_ds.map_batches(_explode, batch_format="pyarrow")
                .groupby("bucket", num_partitions=num_buckets)
                .map_groups(_bucket_pairs_est, batch_format="pandas")
                .groupby("db", num_partitions=num_buckets)
                .map_groups(_dedup_group, batch_format="pandas"))

    cand = (sig_ds.map_batches(_explode, batch_format="pyarrow")
            .groupby("bucket", num_partitions=num_buckets)
            .map_groups(_bucket_pairs, batch_format="pandas"))

    # the same pair found in several bands lands in several band-buckets;
    # the first signature join (keyed by `a`) doubles as the global pair
    # dedup — no separate groupby-(a, b) exchange
    sig_t = pa.list_(pa.uint64())
    j1 = _attach_value(cand, {"a": pa.int64(), "b": pa.int64()},
                       sig_ds, "a", id_col, "signature", "sig_a", sig_t,
                       num_buckets=num_buckets, dedup_pairs=True)
    j2 = _attach_value(j1, {"a": pa.int64(), "b": pa.int64(), "sig_a": sig_t},
                       sig_ds, "b", id_col, "signature", "sig_b", sig_t,
                       num_buckets=num_buckets)

    def _estimate(batch: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame({"a": pd.Series([], dtype="int64"),
                              "b": pd.Series([], dtype="int64"),
                              "est_jaccard": pd.Series([], dtype="float64")})
        if batch.empty:
            return empty
        sa = np.stack([np.asarray(s, dtype=np.uint64) for s in batch["sig_a"]])
        sb = np.stack([np.asarray(s, dtype=np.uint64) for s in batch["sig_b"]])
        est = (sa == sb).mean(axis=1)
        keep = est >= threshold
        if not keep.any():
            return empty
        out = batch.loc[keep, ["a", "b"]].reset_index(drop=True)
        out["est_jaccard"] = est[keep]
        return out

    return j2.map_batches(_estimate, batch_format="pandas")


def ngram_jaccard_allpairs(ds, col: str = "text", id_col: str = "doc_id",
                           ngram: int = 3, threshold: float = 0.5,
                           token_pattern: str = r"[0-9a-z_]+"):
    """Exact ALL-pairs n-gram Jaccard over a (bounded) document subset —
    the oracle-checkable exhaustive variant (LSH candidate generation has
    recall < 1 by design, so it cannot be SQL-verified).  Gram sets are
    computed distributed per batch; the O(n²) pair comparison runs in one
    group over C-speed set ops — callers bound the subset size.  The ASCII
    token pattern (not ``\\w``) matches RE2/DuckDB regex semantics so the
    DuckDB oracle computes identical grams."""
    import pandas as pd

    tok = re.compile(token_pattern)

    def _grams(batch: pa.Table) -> pa.Table:
        ids = batch[id_col].to_pylist()
        gram_lists = []
        for text in batch[col].to_pylist():
            toks = tok.findall((text or "").lower())
            if not toks:
                grams = []
            elif len(toks) < ngram:
                grams = [" ".join(toks)]
            else:
                grams = sorted({" ".join(toks[i:i + ngram])
                                for i in range(len(toks) - ngram + 1)})
            gram_lists.append(grams)
        return pa.table({
            id_col: batch[id_col],
            "grams": pa.array(gram_lists, type=pa.list_(pa.string())),
            "g": pa.array([0] * len(ids), type=pa.int32())})

    def _pairs(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(id_col)
        ids = g[id_col].tolist()
        sets = [set(x) for x in g["grams"]]
        rows = {"a": [], "b": [], "jaccard": []}
        for i in range(len(ids)):
            for j in range(i + 1, len(ids)):
                union = len(sets[i] | sets[j])
                jac = 1.0 if union == 0 else len(sets[i] & sets[j]) / union
                if jac >= threshold:
                    rows["a"].append(ids[i])
                    rows["b"].append(ids[j])
                    rows["jaccard"].append(jac)
        return pd.DataFrame(rows)

    return (ds.map_batches(_grams, batch_format="pyarrow")
            .groupby("g").map_groups(_pairs, batch_format="pandas"))


def verify_jaccard_pairs(ds, pairs_ds, col: str = "text", id_col: str = "doc_id",
                         ngram: int = 3, threshold: float = 0.5,
                         num_buckets: int = 64,
                         broadcast_bytes: int = BROADCAST_BYTES,
                         checkpoint_dir: str | None = None,
                         hash_family: str = "fast"):
    """Exact n-gram-Jaccard verification of candidate pairs, distributed
    end-to-end: per-doc shingle sets are computed in one vectorized pass
    (the same per-doc cost MinHash already paid), re-attached to the pair
    list, and the exact Jaccard is computed per candidate row with C-speed
    ``np.intersect1d`` over the sorted hash arrays.  Pairs referencing
    missing docs drop out (inner-join semantics either path).

    Shingle-set storage triage by materialized size (mirrors
    ``lsh_candidate_pairs``): ≤ ``broadcast_bytes`` → ``ray.put`` a
    per-doc dict once and attach by in-task lookup (ZERO shuffles); ≤
    ``CHECKPOINT_BYTES`` → materialized, two bucketed hash joins
    (``_attach_value`` — the candidate list never touches the driver);
    larger → parquet checkpoint + re-read per join consumption."""
    import tempfile

    import pandas as pd
    import ray
    import ray.data as rd

    def _shingles(batch: pa.Table) -> pa.Table:
        sh = [shingle_hashes(t or "", ngram=ngram,
                             hash_family=hash_family).tolist()
              for t in batch[col].to_pylist()]
        return pa.table({
            id_col: batch[id_col],
            "shingles": pa.array(sh, type=pa.list_(pa.uint64()))})

    sh_ds = ds.map_batches(_shingles, batch_format="pyarrow")
    sh_mat = sh_ds.materialize()
    if checkpoint_dir is not None or sh_mat.size_bytes() > CHECKPOINT_BYTES:
        ckpt = checkpoint_dir or tempfile.mkdtemp(prefix="csvweb_sh_ckpt_")
        if checkpoint_dir is None:
            import atexit
            import shutil

            atexit.register(shutil.rmtree, ckpt, ignore_errors=True)
        sh_mat.write_parquet(ckpt, compression="lz4")
        del sh_mat
        sh_ds = rd.read_parquet(ckpt)
    else:
        sh_ds = sh_mat
        if sh_mat.size_bytes() <= broadcast_bytes:
            tbl = pa.concat_tables(ray.get(sh_mat.to_arrow_refs()))
            sh_col = tbl["shingles"].combine_chunks() if tbl.num_rows else None
            if sh_col is not None:
                # offsets are absolute into the (unsliced) values child,
                # so o0:o1 windows are correct even for sliced arrays
                offs = sh_col.offsets.to_numpy(zero_copy_only=False)
                vals = sh_col.values.to_numpy(zero_copy_only=False) \
                    .astype(np.uint64, copy=False)
                lut = {int(i): vals[int(o0):int(o1)]
                       for i, o0, o1 in zip(tbl[id_col].to_pylist(),
                                            offs[:-1], offs[1:])}
                lut_ref = ray.put(lut)

                def _jaccard_lookup(batch: pd.DataFrame) -> pd.DataFrame:
                    empty = pd.DataFrame({
                        "a": pd.Series([], dtype="int64"),
                        "b": pd.Series([], dtype="int64"),
                        "jaccard": pd.Series([], dtype="float64")})
                    if batch.empty:
                        return empty
                    table = ray.get(lut_ref)
                    rows = {"a": [], "b": [], "jaccard": []}
                    for a_id, b_id in zip(batch["a"], batch["b"]):
                        s1 = table.get(int(a_id))
                        s2 = table.get(int(b_id))
                        if s1 is None or s2 is None:  # inner-join parity
                            continue
                        inter = np.intersect1d(s1, s2,
                                               assume_unique=True).size
                        union = s1.size + s2.size - inter
                        jac = (inter / union) if union else 1.0
                        if jac >= threshold:
                            rows["a"].append(int(a_id))
                            rows["b"].append(int(b_id))
                            rows["jaccard"].append(jac)
                    return pd.DataFrame(rows) if rows["a"] else empty

                return pairs_ds.map_batches(_jaccard_lookup,
                                            batch_format="pandas")

    slim = pairs_ds.map_batches(
        lambda b: pa.table({"a": b["a"], "b": b["b"]}), batch_format="pyarrow")
    sh_t = pa.list_(pa.uint64())
    j1 = _attach_value(slim, {"a": pa.int64(), "b": pa.int64()},
                       sh_ds, "a", id_col, "shingles", "sh_a", sh_t,
                       num_buckets=num_buckets)
    j2 = _attach_value(j1, {"a": pa.int64(), "b": pa.int64(), "sh_a": sh_t},
                       sh_ds, "b", id_col, "shingles", "sh_b", sh_t,
                       num_buckets=num_buckets)

    def _jaccard(batch: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame({"a": pd.Series([], dtype="int64"),
                              "b": pd.Series([], dtype="int64"),
                              "jaccard": pd.Series([], dtype="float64")})
        if batch.empty:
            return empty
        jacs = np.empty(len(batch), dtype=np.float64)
        for i, (s1, s2) in enumerate(zip(batch["sh_a"], batch["sh_b"])):
            s1 = np.asarray(s1, dtype=np.uint64)
            s2 = np.asarray(s2, dtype=np.uint64)
            inter = np.intersect1d(s1, s2, assume_unique=True).size
            union = s1.size + s2.size - inter
            jacs[i] = (inter / union) if union else 1.0
        keep = jacs >= threshold
        if not keep.any():
            return empty
        out = batch.loc[keep, ["a", "b"]].reset_index(drop=True)
        out["jaccard"] = jacs[keep]
        return out

    return j2.map_batches(_jaccard, batch_format="pandas")


# ---------------------------------------------------------------------------
# SimHash

def simhash64(text: str, hash_family: str = "fast") -> int:
    """64-bit SimHash: token hashes stacked once, ONE unpackbits pass per
    document (the per-token 64-wide numpy loop cost ~10× this)."""
    toks = [t.casefold() for t in _TOKEN.findall(text)]
    if not toks:
        return 0
    hs = _hash_str_array(toks, hash_family)
    # (n_toks, 64) bit matrix, bit i of each hash in column i (LSB-first,
    # matching the (h >> i) & 1 definition)
    bits = np.unpackbits(hs.view(np.uint8).reshape(-1, 8),
                         axis=1, bitorder="little")
    # acc[i] = (+1 per set bit, -1 per clear bit) summed over tokens
    acc = 2 * bits.sum(axis=0, dtype=np.int64) - len(toks)
    return int(np.packbits(acc > 0, bitorder="little").view(np.uint64)[0])


def simhash_signatures(ds, col: str = "text", id_col: str = "doc_id",
                       hash_family: str = "fast"):
    def _sig(batch: pa.Table) -> pa.Table:
        ids = batch[id_col].to_pylist()
        sigs = [simhash64(t or "", hash_family=hash_family)
                for t in batch[col].to_pylist()]
        return pa.Table.from_pydict({
            id_col: pa.array(ids),
            "simhash": pa.array(sigs, type=pa.uint64())})

    return ds.map_batches(_sig, batch_format="pyarrow")


def _popcount64(arr: np.ndarray) -> np.ndarray:
    """Per-element popcount of a uint64 array (numpy<2 has no bit_count)."""
    v = np.ascontiguousarray(arr, dtype=np.uint64).view(np.uint8)
    return np.unpackbits(v).reshape(-1, 64).sum(axis=1).astype(np.int64)


def simhash_candidate_pairs(sig_ds, id_col: str = "doc_id", max_hamming: int = 3,
                            max_bucket_size: int = 4096, num_buckets: int = 64):
    """Pigeonhole banding: split 64 bits into 4×16-bit chunks — any pair
    within Hamming distance ≤ 3 shares at least one exact chunk; verify
    the distance in-bucket with a vectorized popcount.

    Same scale shape as ``lsh_candidate_pairs``: the exchange groups by a
    BOUNDED bucket of the (band, chunk) key (not the key itself — that is
    one pandas call per document×band), collision groups are found with a
    vectorized ``duplicated`` prefilter, and a flood of identical
    signatures is emitted in capped chunks with one-doc overlap."""
    import pandas as pd

    def _explode(batch: pa.Table) -> pa.Table:
        ids = batch[id_col].to_pylist()
        sigs = batch["simhash"].to_pylist()
        out = {id_col: [], "band": [], "chunk": [], "simhash": []}
        for i, s in zip(ids, sigs):
            for band in range(4):
                out[id_col].append(i)
                out["band"].append(band)
                out["chunk"].append((s >> (16 * band)) & 0xFFFF)
                out["simhash"].append(s)
        chunk = np.asarray(out["chunk"], dtype=np.uint64)
        band = np.asarray(out["band"], dtype=np.uint64)
        bucket = ((chunk ^ (band * np.uint64(0x9E3779B97F4A7C15)))
                  & np.uint64(num_buckets - 1)).astype(np.int32)
        return pa.Table.from_pydict({
            id_col: pa.array(out[id_col]),
            "band": pa.array(out["band"], type=pa.int32()),
            "chunk": pa.array(out["chunk"], type=pa.int32()),
            "simhash": pa.array(out["simhash"], type=pa.uint64()),
            "bucket": pa.array(bucket, type=pa.int32())})

    def _emit(ids: np.ndarray, sigs: np.ndarray,
              rows_a: list, rows_b: list, rows_d: list) -> None:
        order = np.argsort(ids, kind="stable")
        ids, sigs = ids[order], sigs[order]
        n = len(ids)
        spans = ([(0, n)] if n <= max_bucket_size else
                 [(s, min(s + max_bucket_size, n))
                  for s in range(0, n - 1, max_bucket_size - 1)])
        for lo, hi in spans:
            ai, bi = np.triu_indices(hi - lo, k=1)
            d = _popcount64(sigs[lo + ai] ^ sigs[lo + bi])
            keep = (d <= max_hamming) & (ids[lo + ai] != ids[lo + bi])
            rows_a.append(ids[lo + ai][keep])
            rows_b.append(ids[lo + bi][keep])
            rows_d.append(d[keep])

    def _pairs(g: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame({"a": pd.Series([], dtype="int64"),
                              "b": pd.Series([], dtype="int64"),
                              "hamming": pd.Series([], dtype="int64")})
        g = g[g.duplicated(["band", "chunk"], keep=False)]
        if g.empty:
            return empty
        rows_a: list = []
        rows_b: list = []
        rows_d: list = []
        for _, sub in g.groupby(["band", "chunk"], sort=False):
            _emit(sub[id_col].to_numpy(),
                  sub["simhash"].to_numpy(dtype=np.uint64), rows_a, rows_b, rows_d)
        df = pd.DataFrame({"a": np.concatenate(rows_a),
                           "b": np.concatenate(rows_b),
                           "hamming": np.concatenate(rows_d)})
        return (df.astype({"a": "int64", "b": "int64", "hamming": "int64"})
                .drop_duplicates(["a", "b"]))

    from ray.data.aggregate import Min

    pairs = (sig_ds.map_batches(_explode, batch_format="pyarrow")
             .groupby("bucket", num_partitions=num_buckets)
             .map_groups(_pairs, batch_format="pandas"))
    return pairs.groupby(["a", "b"]).aggregate(Min("hamming", alias_name="hamming"))


# ---------------------------------------------------------------------------
# Embedding near-dup

from functools import lru_cache as _lru_cache


@_lru_cache(maxsize=8)
def _hyperplanes(d: int, k: int, seed: int) -> np.ndarray:
    """Seeded random-hyperplane matrix, memoized per worker process —
    identical on every worker (deterministic LSH), generated once instead
    of once per batch."""
    return np.random.RandomState(seed).standard_normal((d, k))


def auto_num_planes(n: int, target_bucket_size: int = 256,
                    lo: int = 4, hi: int = 24) -> int:
    """Hyperplane count sized to the corpus: 2^planes buckets ≈
    n / target_bucket_size, clamped to [lo, hi] — a fixed plane count
    makes the per-bucket all-pairs cosine O((n/2^planes)²) blow up as the
    corpus grows."""
    import math

    if n <= 1:
        return lo
    return max(lo, min(hi, math.ceil(math.log2(max(1.0, n / target_bucket_size)))))


def embedding_neardup_pairs(emb_ds, id_col: str = "vec_id", col: str = "embedding",
                            threshold: float = 0.95,
                            num_planes: int | str = "auto",
                            seed: int = 42, dim: int | None = None,
                            max_bucket_size: int = 4096,
                            target_bucket_size: int = 256):
    """Cosine near-duplicate pairs via random-hyperplane LSH buckets; the
    in-bucket verify is one numpy matmul per bucket.  ``num_planes=0``
    degenerates to a single bucket = exact brute force (baseline);
    ``"auto"`` (default) scales the plane count with the corpus so the
    expected bucket size stays near ``target_bucket_size``.

    Bucket-size bound: a bucket larger than ``max_bucket_size`` (hot
    bucket — e.g. an all-identical corpus, where no plane count helps) is
    processed in id-sorted CHUNKS of ``max_bucket_size`` with one-vector
    overlap, bounding the matmul at O(chunk²) per chunk.  Pairs that
    straddle non-adjacent chunks are not emitted (documented recall
    trade), but connectivity for downstream near-dup CLUSTERING is
    preserved: identical/near-identical runs stay connected through the
    overlap chain, so the keep-set is unaffected for exact-duplicate
    floods."""
    import pandas as pd

    if num_planes == "auto":
        num_planes = auto_num_planes(emb_ds.count(), target_bucket_size)

    def _bucket(batch: pa.Table) -> pa.Table:
        from .similarity import _as_matrix

        # zero-copy Arrow list flatten+reshape (uniform-width contract);
        # to_pylist() here converted every embedding to Python floats
        mat = _as_matrix(batch[col])
        if dim is not None and mat.shape[1] != dim:
            raise ValueError(f"embedding dim {mat.shape[1]} != {dim}")
        if num_planes:
            # hoisted per-process state: generating the (seeded) matrix in
            # every batch is the state-per-batch anti-pattern
            planes = _hyperplanes(mat.shape[1], num_planes, seed)
            bits = (mat @ planes) > 0
            keys = (bits * (1 << np.arange(num_planes))).sum(axis=1)
        else:
            keys = np.zeros(len(mat), dtype=np.int64)
        return pa.Table.from_pydict({
            id_col: batch[id_col],
            "bucket": pa.array(keys.astype(np.int64)),
            col: batch[col]})

    def _chunk_pairs(ids: list, unit: np.ndarray) -> dict:
        cos = unit @ unit.T
        ai, bi = np.triu_indices(len(ids), k=1)
        mask = cos[ai, bi] >= threshold
        return {"a": [ids[i] for i in ai[mask]],
                "b": [ids[i] for i in bi[mask]],
                "cosine": list(cos[ai, bi][mask])}

    def _pairs(g: pd.DataFrame) -> pd.DataFrame:
        if len(g) < 2:
            return pd.DataFrame({"a": [], "b": [], "cosine": []})
        g = g.sort_values(id_col)
        ids = g[id_col].tolist()
        mat = np.asarray(g[col].tolist(), dtype=np.float64)
        norms = np.linalg.norm(mat, axis=1, keepdims=True)
        norms[norms == 0] = 1.0
        unit = mat / norms
        if len(ids) <= max_bucket_size:
            return pd.DataFrame(_chunk_pairs(ids, unit))
        rows = {"a": [], "b": [], "cosine": []}
        step = max_bucket_size - 1  # one-vector overlap chains the chunks
        for start in range(0, len(ids) - 1, step):
            end = min(start + max_bucket_size, len(ids))
            part = _chunk_pairs(ids[start:end], unit[start:end])
            for k in rows:
                rows[k].extend(part[k])
        df = pd.DataFrame(rows)
        # the overlap row appears in two chunks → drop duplicate pairs
        return df.drop_duplicates(["a", "b"])

    return (emb_ds.map_batches(_bucket, batch_format="pyarrow")
            .groupby("bucket").map_groups(_pairs, batch_format="pandas"))


# ---------------------------------------------------------------------------
# clustering / keep-list

def cluster_pairs_distributed(pairs_ds, a_col: str = "a", b_col: str = "b",
                              num_buckets: int = 32, max_rounds: int = 100):
    """Connected components over the near-dup pair graph WITHOUT collecting
    pairs to the driver — the scale path when the pair list outgrows
    ``cluster_pairs``'s driver union-find.

    Iterative min-label propagation: every directed edge proposes
    ``label(src)`` to ``dst`` each round; labels reduce via a native
    grouped Min (no per-node UDF); the edge⋈label join is an explicit
    bucketed hash join (union + groupby(bucket) + one pandas merge per
    bucket).  Labels only decrease, so the label SUM is a monotone
    convergence witness — the loop stops the first round it is unchanged
    (≤ component diameter rounds).  Returns a Dataset of (node, label)
    with label = the component's minimum id.
    """
    import pandas as pd
    from ray.data.aggregate import Min, Sum

    def _directed(batch: pa.Table) -> pa.Table:
        a = batch[a_col].combine_chunks().cast(pa.int64())
        b = batch[b_col].combine_chunks().cast(pa.int64())
        return pa.table({"src": pa.concat_arrays([a, b]),
                         "dst": pa.concat_arrays([b, a])})

    edges = pairs_ds.map_batches(_directed, batch_format="pyarrow").materialize()
    labels = (edges.map_batches(
        lambda b: pa.table({"node": b["src"], "label": b["src"]}),
        batch_format="pyarrow")
        .groupby("node").aggregate(Min("label", alias_name="label"))
        .materialize())

    def _bucketize(side: str, kcol: str, vcol: str):
        def fn(b: pa.Table) -> pa.Table:
            k = b[kcol].combine_chunks().cast(pa.int64())
            bucket = pc.cast(
                pc.bit_wise_and(k, pa.scalar(num_buckets - 1)), pa.int32())
            return pa.table({
                "bucket": bucket,
                "side": pa.array([side] * len(b), type=pa.string()),
                "k": k, "v": b[vcol].combine_chunks().cast(pa.int64())})
        return fn

    def _join(g: pd.DataFrame) -> pd.DataFrame:
        e = g[g["side"] == "e"].reindex(columns=["k", "v"])
        lab = g[g["side"] == "l"].reindex(columns=["k", "v"])
        if e.empty or lab.empty:
            return pd.DataFrame({"node": pd.Series([], dtype="int64"),
                                 "label": pd.Series([], dtype="int64")})
        m = e.merge(lab, on="k", suffixes=("_dst", "_lab"))
        return pd.DataFrame({"node": m["v_dst"], "label": m["v_lab"]})

    prev_sum = None
    for _ in range(max_rounds):
        marked_e = edges.map_batches(_bucketize("e", "src", "dst"),
                                     batch_format="pyarrow")
        marked_l = labels.map_batches(_bucketize("l", "node", "label"),
                                      batch_format="pyarrow")
        msgs = (marked_e.union(marked_l).groupby("bucket")
                .map_groups(_join, batch_format="pandas")
                # normalize to arrow blocks: the union with `labels` (arrow)
                # must not mix block types
                .map_batches(lambda b: b, batch_format="pyarrow"))
        # the repartition pins the label block count per round — without it
        # each union+aggregate doubles the block count and round time grows
        # geometrically (measured: 0.5 s/round flat vs 65 s by round 8)
        labels = (msgs.union(labels).groupby("node")
                  .aggregate(Min("label", alias_name="label"))
                  .repartition(num_buckets).materialize())
        s = labels.aggregate(Sum("label", alias_name="s"))["s"]
        if s == prev_sum:
            break
        prev_sum = s
    return labels


def cluster_pairs(pairs: list[tuple]) -> dict:
    """Union-find over the (small) near-dup pair list → id → cluster root.
    Driver-side by design: |pairs| ≪ corpus (LSH contract).  At a scale
    where pairs don't fit, use ``cluster_pairs_distributed``."""
    parent: dict = {}

    def find(x):
        while parent.setdefault(x, x) != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in pairs:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    return {x: find(x) for x in list(parent)}


def dedup_keep_ids(all_ids, pairs: list[tuple]) -> set:
    """Keep-set after near-dup clustering: cluster root (min id) survives."""
    roots = cluster_pairs(pairs)
    return {i for i in all_ids if roots.get(i, i) == i}


# ---------------------------------------------------------------------------
# edit-distance string-similarity join (deletion neighborhoods / FastSS k=1)


def _ed_le1(a: str, b: str) -> int:
    """Exact edit distance when ≤ 1, else 2 (the verifier only needs to
    accept/reject, so the general DP is unnecessary)."""
    la, lb = len(a), len(b)
    if abs(la - lb) > 1:
        return 2
    if la == lb:
        d = sum(x != y for x, y in zip(a, b))
        return d if d <= 1 else 2
    if la > lb:
        a, b, la = b, a, lb
    i = 0
    while i < la and a[i] == b[i]:
        i += 1
    return 1 if a[i:] == b[i + 1:] else 2


def edit_distance_pairs(ds, col: str = "text", id_col: str = "doc_id",
                        key_len: int = 12, group_cap: int = 4096,
                        num_buckets: int = 64):
    """Distributed edit-distance-≤1 similarity join on a derived string
    key (``lower(text[:key_len])``) via deletion neighborhoods — the
    FastSS construction at k=1, the classic scalable alternative to the
    O(n²) all-pairs levenshtein join.

    Signature set of key ``s`` = {s} ∪ {s with char i deleted}: any two
    keys at edit distance ≤ 1 share a signature (equal keys share ``s``;
    a substitution at i shares the i-deletion; an insertion/deletion
    shares the shorter key itself).  One flat-map pass emits
    ``len(s)+1`` hashed signatures per doc, ONE ``groupby(sig)`` shuffle
    co-locates candidates, pairs are verified in-group with the exact
    ≤1 check (false candidates cost bandwidth, never correctness), and
    a final pair-key groupby dedups pairs that share several signatures.
    Output: ``(a, b, dist)`` with a < b, exactly the pairs SQL's
    ``levenshtein(ka, kb) <= 1`` join produces (the DuckDB oracle twin).

    Rows with NULL ``col`` are excluded (SQL's levenshtein(NULL, x)
    join-condition semantics).  ``group_cap`` bounds one signature
    group's pair expansion: a group of m IDENTICAL keys legitimately
    owns m(m-1)/2 output pairs, so a mega-cluster of equal keys blows
    the output itself, not just the task — the op raises loudly at the
    cap instead of silently truncating; route equal-key mass through
    ``exact_dedup`` first and ED-join the survivors.

    Shuffle shape: ONE exchange total.  Signatures are hash-BUCKETED and
    the pair expansion runs once per bucket, not once per signature (one
    signature = one map_groups call would pay per-group pandas overhead
    ~13× the doc count — the map_groups-cardinality trap); inside a
    bucket a vectorized ``duplicated`` mask discards the (vast majority
    of) collision-free signatures before any Python loop runs.  Pair
    dedup needs NO second shuffle: an unequal-key pair at distance 1
    shares exactly ONE variant string (equal-length pairs share only the
    deletion at the substituted position; length±1 pairs share only the
    shorter key — repeated-char deletions that produce the same string
    are the same string, i.e. the same group), so it is emitted by
    exactly one signature group; equal-key pairs co-occur in all
    ``len(key)+1`` groups and are emitted only from the full-key group,
    marked by variant tag 0."""
    import pandas as pd

    from pandas.util import hash_array

    def _sigs(b: pa.Table) -> pa.Table:
        tbl = b.select([id_col, col]).drop_null()
        ids = tbl[id_col].to_pylist()
        texts = tbl[col].to_pylist()
        out_id, out_key, out_tag, variants = [], [], [], []
        for did, text in zip(ids, texts):
            key = text[:key_len].lower()
            vs = [key] + [key[:i] + key[i + 1:] for i in range(len(key))]
            out_id.extend([did] * len(vs))
            out_key.extend([key] * len(vs))
            out_tag.extend(range(len(vs)))
            variants.extend(vs)
        sig_u = hash_array(np.asarray(variants, dtype=object)) \
            .astype(np.uint64) if variants else np.array([], dtype=np.uint64)
        return pa.table({
            "bucket": pa.array((sig_u & np.uint64(num_buckets - 1))
                               .astype(np.int32), pa.int32()),
            "sig": pa.array(sig_u.astype(np.int64), pa.int64()),
            id_col: pa.array(out_id, pa.int64()),
            "key": pa.array(out_key, pa.string()),
            "tag": pa.array(out_tag, pa.int8())})

    def _bucket_pairs(g: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame({"a": pd.Series([], dtype="int64"),
                              "b": pd.Series([], dtype="int64"),
                              "dist": pd.Series([], dtype="int64")})
        # within one signature a doc may appear under several tags (a
        # repeated char deleted at different positions is the same
        # string); keep the min tag so tag 0 survives when present
        g = g.sort_values("tag").drop_duplicates(["sig", id_col])
        g = g[g.duplicated("sig", keep=False)]  # collided sigs only
        if g.empty:
            return empty
        rows = {"a": [], "b": [], "dist": []}
        for _, sub in g.groupby("sig", sort=False):
            n = len(sub)
            if n > group_cap:
                raise ValueError(
                    f"signature group of {n} docs exceeds group_cap="
                    f"{group_cap}: an equal-key cluster this size owns "
                    "O(m^2) genuine pairs — exact_dedup the equal keys "
                    "first, or raise group_cap deliberately")
            sub = sub.sort_values(id_col)
            ids = sub[id_col].to_numpy()
            keys = sub["key"].tolist()
            tags = sub["tag"].to_numpy()
            for i in range(n):
                for j in range(i + 1, n):
                    if keys[i] == keys[j]:
                        # equal keys collide in every variant group:
                        # emit only from the full-key group (tag 0)
                        if tags[i] == 0 and tags[j] == 0:
                            rows["a"].append(int(ids[i]))
                            rows["b"].append(int(ids[j]))
                            rows["dist"].append(0)
                        continue
                    d = _ed_le1(keys[i], keys[j])
                    if d == 1:
                        rows["a"].append(int(ids[i]))
                        rows["b"].append(int(ids[j]))
                        rows["dist"].append(1)
        return pd.DataFrame(rows) if rows["a"] else empty

    return (ds.map_batches(_sigs, batch_format="pyarrow")
            .groupby("bucket").map_groups(_bucket_pairs,
                                          batch_format="pandas"))
