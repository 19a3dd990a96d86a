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
    "lsh_candidate_pairs", "verify_jaccard_pairs", "simhash_signatures",
    "simhash_candidate_pairs", "embedding_neardup_pairs", "cluster_pairs",
    "dedup_keep_ids",
]

_TOKEN = re.compile(r"\w+", re.UNICODE)

# Mersenne prime hash family for minhash permutations
_P = (1 << 61) - 1


def _hash64(data: bytes) -> int:
    return struct.unpack("<Q", hashlib.blake2b(data, digest_size=8).digest())[0]


def _perm_params(num_perm: int, seed: int) -> tuple[np.ndarray, np.ndarray]:
    rng = np.random.RandomState(seed)
    a = rng.randint(1, _P, size=num_perm, dtype=np.uint64)
    b = rng.randint(0, _P, size=num_perm, dtype=np.uint64)
    return a, b


def shingle_hashes(text: str, ngram: int = 3) -> np.ndarray:
    """Word-shingle 64-bit hashes (n-gram Jaccard universe)."""
    toks = [t.casefold() for t in _TOKEN.findall(text)]
    if len(toks) < ngram:
        grams = [" ".join(toks)] if toks else []
    else:
        grams = [" ".join(toks[i:i + ngram]) for i in range(len(toks) - ngram + 1)]
    return np.unique(np.fromiter(
        (_hash64(g.encode()) for g in grams), dtype=np.uint64, count=len(grams)))


# ---------------------------------------------------------------------------
# exact dedup

def add_sha256_column(ds, col: str = "text", out: str = "text_sha256"):
    def _sha(batch: pa.Table) -> pa.Table:
        vals = [hashlib.sha256((v or "").encode()).hexdigest()
                for v in batch[col].to_pylist()]
        return batch.append_column(out, pa.array(vals, type=pa.string()))

    return ds.map_batches(_sha, batch_format="pyarrow")


def exact_dedup(ds, col: str = "text", id_col: str = "doc_id"):
    """Hash-partitioned exact dedup keeping the min id per content hash.
    Per-batch local dedup acts as the combiner before the shuffle."""
    import pandas as pd

    ds = add_sha256_column(ds, col=col)

    def _local(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        return pa.Table.from_pandas(
            df.sort_values([  # deterministic local winner
                "text_sha256", id_col]).drop_duplicates("text_sha256"),
            preserve_index=False)

    def _first(g: pd.DataFrame) -> pd.DataFrame:
        return g.sort_values(id_col).head(1)

    return (ds.map_batches(_local, batch_format="pyarrow")
            .groupby("text_sha256").map_groups(_first, batch_format="pandas"))


# ---------------------------------------------------------------------------
# MinHash + LSH

def minhash_signatures(ds, col: str = "text", id_col: str = "doc_id",
                       num_perm: int = 128, ngram: int = 3, seed: int = 42,
                       keep_shingles: bool = False):
    """(id, signature[num_perm]) per document; vectorized over the
    permutation axis with numpy (one (shingles × perms) broadcast per doc)."""
    a, b = _perm_params(num_perm, seed)

    def _sig(batch: pa.Table) -> pa.Table:
        ids = batch[id_col].to_pylist()
        sigs, shingle_lists = [], []
        for text in batch[col].to_pylist():
            sh = shingle_hashes(text or "", ngram=ngram)
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


def lsh_candidate_pairs(sig_ds, id_col: str = "doc_id", num_bands: int = 32,
                        threshold: float = 0.5):
    """Band the signatures, group by (band, band-hash) bucket, emit verified
    candidate pairs (estimated Jaccard from signature agreement ≥
    ``threshold``), deduped across bands.

    Output: (a, b, est_jaccard) with a < b, sorted ids.
    """
    import pandas as pd

    def _explode(batch: pa.Table) -> pa.Table:
        ids = batch[id_col].to_pylist()
        sigs = batch["signature"].to_pylist()
        rows_id, rows_band, rows_bh, rows_sig = [], [], [], []
        for i, sig in zip(ids, sigs):
            arr = np.asarray(sig, dtype=np.uint64)
            rows_per_band = len(arr) // num_bands
            for band in range(num_bands):
                chunk = arr[band * rows_per_band:(band + 1) * rows_per_band]
                bh = _hash64(chunk.tobytes())
                rows_id.append(i)
                rows_band.append(band)
                rows_bh.append(bh)
                rows_sig.append(sig)
        return pa.Table.from_pydict({
            id_col: pa.array(rows_id),
            "band": pa.array(rows_band, type=pa.int32()),
            "band_hash": pa.array(rows_bh, type=pa.uint64()),
            "signature": pa.array(rows_sig, type=pa.list_(pa.uint64())),
        })

    def _pairs(g: pd.DataFrame) -> pd.DataFrame:
        if len(g) < 2:
            return pd.DataFrame({"a": [], "b": [], "est_jaccard": []})
        g = g.sort_values(id_col)
        ids = g[id_col].tolist()
        sigs = [np.asarray(s, dtype=np.uint64) for s in g["signature"]]
        rows = {"a": [], "b": [], "est_jaccard": []}
        for i in range(len(ids)):
            for j in range(i + 1, len(ids)):
                est = float(np.mean(sigs[i] == sigs[j]))
                if est >= threshold:
                    rows["a"].append(ids[i])
                    rows["b"].append(ids[j])
                    rows["est_jaccard"].append(est)
        return pd.DataFrame(rows)

    from ray.data.aggregate import Min

    pairs = (sig_ds.map_batches(_explode, batch_format="pyarrow")
             .groupby(["band", "band_hash"])
             .map_groups(_pairs, batch_format="pandas"))
    # pair-level dedup across bands via native aggregate (est_jaccard is
    # identical for every copy of a pair, so Min is a pure dedup)
    return pairs.groupby(["a", "b"]).aggregate(
        Min("est_jaccard", alias_name="est_jaccard"))


def verify_jaccard_pairs(ds, pairs_ds, col: str = "text", id_col: str = "doc_id",
                         ngram: int = 3, threshold: float = 0.5):
    """Exact n-gram-Jaccard verification of candidate pairs, distributed:
    the (small) pair list is broadcast; each doc batch emits
    (pair_id, shingles) rows only for docs that appear in a pair;
    ``groupby(pair)`` computes the exact Jaccard from the two sets."""
    import pandas as pd
    import ray

    pairs = pairs_ds.to_pandas()
    doc_to_pairs: dict = {}
    for idx, row in pairs.iterrows():
        doc_to_pairs.setdefault(row["a"], []).append(idx)
        doc_to_pairs.setdefault(row["b"], []).append(idx)
    ref = ray.put(doc_to_pairs)

    def _emit(batch: pa.Table) -> pa.Table:
        lookup = ray.get(ref)
        out = {"pair_id": [], id_col: [], "shingles": []}
        for i, text in zip(batch[id_col].to_pylist(), batch[col].to_pylist()):
            for pair_id in lookup.get(i, ()):
                out["pair_id"].append(pair_id)
                out[id_col].append(i)
                out["shingles"].append(shingle_hashes(text or "", ngram=ngram).tolist())
        return pa.Table.from_pydict({
            "pair_id": pa.array(out["pair_id"], type=pa.int64()),
            id_col: pa.array(out[id_col]),
            "shingles": pa.array(out["shingles"], type=pa.list_(pa.uint64())),
        })

    def _jaccard(g: pd.DataFrame) -> pd.DataFrame:
        if len(g) != 2:
            return pd.DataFrame({"a": [], "b": [], "jaccard": []})
        g = g.sort_values(id_col)
        s1, s2 = (set(x) for x in g["shingles"])
        union = len(s1 | s2)
        j = (len(s1 & s2) / union) if union else 1.0
        ids = g[id_col].tolist()
        if j < threshold:
            return pd.DataFrame({"a": [], "b": [], "jaccard": []})
        return pd.DataFrame({"a": [ids[0]], "b": [ids[1]], "jaccard": [j]})

    return (ds.map_batches(_emit, batch_format="pyarrow")
            .groupby("pair_id").map_groups(_jaccard, batch_format="pandas"))


# ---------------------------------------------------------------------------
# SimHash

def simhash64(text: str) -> int:
    toks = [t.casefold() for t in _TOKEN.findall(text)]
    if not toks:
        return 0
    acc = np.zeros(64, dtype=np.int64)
    for t in toks:
        h = _hash64(t.encode())
        bits = (h >> np.arange(64, dtype=np.uint64)) & np.uint64(1)
        acc += np.where(bits.astype(bool), 1, -1)
    return int(sum(1 << i for i in range(64) if acc[i] > 0))


def simhash_signatures(ds, col: str = "text", id_col: str = "doc_id"):
    def _sig(batch: pa.Table) -> pa.Table:
        ids = batch[id_col].to_pylist()
        sigs = [simhash64(t or "") for t in batch[col].to_pylist()]
        return pa.Table.from_pydict({
            id_col: pa.array(ids),
            "simhash": pa.array(sigs, type=pa.uint64())})

    return ds.map_batches(_sig, batch_format="pyarrow")


def simhash_candidate_pairs(sig_ds, id_col: str = "doc_id", max_hamming: int = 3):
    """Pigeonhole banding: split 64 bits into 4×16-bit chunks — any pair
    within Hamming distance ≤ 3 shares at least one exact chunk; verify the
    distance in-bucket."""
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
        return pa.Table.from_pydict({
            id_col: pa.array(out[id_col]),
            "band": pa.array(out["band"], type=pa.int32()),
            "chunk": pa.array(out["chunk"], type=pa.int32()),
            "simhash": pa.array(out["simhash"], type=pa.uint64())})

    def _pairs(g: pd.DataFrame) -> pd.DataFrame:
        if len(g) < 2:
            return pd.DataFrame({"a": [], "b": [], "hamming": []})
        g = g.sort_values(id_col)
        ids, sigs = g[id_col].tolist(), g["simhash"].tolist()
        rows = {"a": [], "b": [], "hamming": []}
        for i in range(len(ids)):
            for j in range(i + 1, len(ids)):
                d = bin(int(sigs[i]) ^ int(sigs[j])).count("1")
                if d <= max_hamming and ids[i] != ids[j]:
                    rows["a"].append(ids[i])
                    rows["b"].append(ids[j])
                    rows["hamming"].append(d)
        return pd.DataFrame(rows)

    from ray.data.aggregate import Min

    pairs = (sig_ds.map_batches(_explode, batch_format="pyarrow")
             .groupby(["band", "chunk"]).map_groups(_pairs, batch_format="pandas"))
    return pairs.groupby(["a", "b"]).aggregate(Min("hamming", alias_name="hamming"))


# ---------------------------------------------------------------------------
# Embedding near-dup

def embedding_neardup_pairs(emb_ds, id_col: str = "vec_id", col: str = "embedding",
                            threshold: float = 0.95, num_planes: int = 8,
                            seed: int = 42, dim: int | None = None):
    """Cosine near-duplicate pairs via random-hyperplane LSH buckets; the
    in-bucket verify is one numpy matmul per bucket.  ``num_planes=0``
    degenerates to a single bucket = exact brute force (baseline)."""
    import pandas as pd

    def _bucket(batch: pa.Table) -> pa.Table:
        mat = np.asarray(batch[col].to_pylist(), dtype=np.float64)
        if dim is not None and mat.shape[1] != dim:
            raise ValueError(f"embedding dim {mat.shape[1]} != {dim}")
        if num_planes:
            rng = np.random.RandomState(seed)
            planes = rng.standard_normal((mat.shape[1], num_planes))
            bits = (mat @ planes) > 0
            keys = (bits * (1 << np.arange(num_planes))).sum(axis=1)
        else:
            keys = np.zeros(len(mat), dtype=np.int64)
        return pa.Table.from_pydict({
            id_col: batch[id_col],
            "bucket": pa.array(keys.astype(np.int64)),
            col: batch[col]})

    def _pairs(g: pd.DataFrame) -> pd.DataFrame:
        if len(g) < 2:
            return pd.DataFrame({"a": [], "b": [], "cosine": []})
        g = g.sort_values(id_col)
        ids = g[id_col].tolist()
        mat = np.asarray(g[col].tolist(), dtype=np.float64)
        norms = np.linalg.norm(mat, axis=1, keepdims=True)
        norms[norms == 0] = 1.0
        unit = mat / norms
        cos = unit @ unit.T
        ai, bi = np.triu_indices(len(ids), k=1)
        mask = cos[ai, bi] >= threshold
        return pd.DataFrame({
            "a": [ids[i] for i in ai[mask]],
            "b": [ids[i] for i in bi[mask]],
            "cosine": cos[ai, bi][mask]})

    return (emb_ds.map_batches(_bucket, batch_format="pyarrow")
            .groupby("bucket").map_groups(_pairs, batch_format="pandas"))


# ---------------------------------------------------------------------------
# clustering / keep-list

def cluster_pairs(pairs: list[tuple]) -> dict:
    """Union-find over the (small) near-dup pair list → id → cluster root.
    Driver-side by design: |pairs| ≪ corpus (LSH contract).  At a scale
    where pairs don't fit, swap for iterative min-label propagation with
    groupby rounds."""
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
