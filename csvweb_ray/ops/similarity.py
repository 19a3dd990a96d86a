"""Similarity search over an embedding column (``list<float>``).

- ``ann_topk``      — brute-force cosine top-k baseline: one numpy matmul
  per batch against a **broadcast** query matrix (``ray.put`` once, read
  zero-copy per task), per-batch partial top-k (the combiner), then a
  single tiny merge per query.  Exact; scales linearly in corpus size.
- ``ann_topk_lsh``  — random-hyperplane-bucketed variant: vectors and
  queries hash into sign-pattern buckets (multi-probe over the query's
  neighbors at Hamming distance ≤ 1); only matching buckets are scored.
  The scale path: cost ~ corpus/2^planes per query, recall < 1 and
  documented, partitioning assumption = bucket key.
- ``ann_topk_ivf``  — inverted-file variant: spherical k-means centroids
  trained on a CAPPED head sample driver-side (classic IVF practice —
  training is bounded, assignment is distributed), every data vector
  assigned to its nearest centroid inside ``map_batches``, queries probe
  only their ``nprobe`` nearest centroid lists.  ``nprobe ==
  num_centroids`` degenerates to exact brute force (the DuckDB-oracle
  twin); smaller ``nprobe`` is the scale path with recall < 1.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

__all__ = ["ann_topk", "ann_topk_lsh", "ann_topk_ivf", "train_ivf_centroids"]


def _as_matrix(column) -> np.ndarray:
    """Arrow ``list<float>`` column → ``(n, d)`` float64 matrix.

    Uniform-width null-free lists (the embeddings contract) flatten
    zero-copy: one ``values.to_numpy()`` view + reshape — no per-row
    Python objects (a ``to_pylist()`` here was the dominant constant in
    the ANN/near-dup map stages).  Ragged or null-bearing inputs fall
    back to the exact ``to_pylist`` path."""
    col = column.combine_chunks() if isinstance(column, pa.ChunkedArray) \
        else column
    try:
        if pa.types.is_fixed_size_list(col.type) and col.null_count == 0 \
                and len(col):
            d = col.type.list_size
            flat = col.values.to_numpy(zero_copy_only=False)
            start = col.offset * d
            return flat[start:start + len(col) * d] \
                .astype(np.float64, copy=False).reshape(len(col), d)
        if pa.types.is_list(col.type) and col.null_count == 0 and len(col):
            offs = col.offsets.to_numpy(zero_copy_only=False)
            widths = np.diff(offs)
            if widths.size and widths[0] and (widths == widths[0]).all():
                d = int(widths[0])
                flat = col.values.to_numpy(zero_copy_only=False)
                return flat[offs[0]:offs[0] + len(col) * d] \
                    .astype(np.float64, copy=False).reshape(len(col), d)
    except (pa.ArrowInvalid, ValueError):
        pass
    return np.asarray(col.to_pylist(), dtype=np.float64)


def _unit(mat: np.ndarray) -> np.ndarray:
    norms = np.linalg.norm(mat, axis=1, keepdims=True)
    norms[norms == 0] = 1.0
    return mat / norms


def ann_topk(emb_ds, queries: np.ndarray, k: int = 10, id_col: str = "vec_id",
             col: str = "embedding"):
    """Exact cosine top-k: returns (query_id, vec_id, score) rows, the top
    ``k`` per query, ranked by (-score, vec_id) for determinism."""
    import pandas as pd
    import ray

    qmat = _unit(np.asarray(queries, dtype=np.float64))
    qref = ray.put(qmat)

    def _partial(batch: pa.Table) -> pa.Table:
        q = ray.get(qref)  # zero-copy view of the broadcast matrix
        ids = batch[id_col].to_numpy(zero_copy_only=False)
        mat = _unit(_as_matrix(batch[col]))
        scores = q @ mat.T  # (n_queries, batch)
        out = {"query_id": [], id_col: [], "score": []}
        top = min(k, scores.shape[1])
        for qi in range(scores.shape[0]):
            row = scores[qi]
            # deterministic partial top-k: sort by (-score, id)
            order = np.lexsort((ids, -row))[:top]
            out["query_id"].extend([qi] * len(order))
            out[id_col].extend(ids[order].tolist())
            out["score"].extend(row[order].tolist())
        # pin the id type: an empty partial would otherwise infer a
        # null-typed column and emit schema-mismatched blocks
        return pa.Table.from_pydict({
            "query_id": pa.array(out["query_id"], type=pa.int32()),
            id_col: pa.array(out[id_col],
                             type=batch.schema.field(id_col).type),
            "score": pa.array(out["score"], type=pa.float64())})

    def _merge(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["score", id_col], ascending=[False, True]).head(k)
        g["rank"] = range(1, len(g) + 1)
        return g

    return (emb_ds.map_batches(_partial, batch_format="pyarrow")
            .groupby("query_id").map_groups(_merge, batch_format="pandas"))


def ann_topk_lsh(emb_ds, queries: np.ndarray, k: int = 10, id_col: str = "vec_id",
                 col: str = "embedding", num_planes: int = 6, seed: int = 42):
    """Bucketed approximate top-k.  Each data vector lands in one bucket;
    each query probes its own bucket plus all buckets at Hamming distance 1
    (multi-probe) — so a batch only scores queries whose probe set contains
    the batch's buckets."""
    import pandas as pd
    import ray

    queries = np.asarray(queries, dtype=np.float64)
    rng = np.random.RandomState(seed)
    planes = rng.standard_normal((queries.shape[1], num_planes))
    powers = 1 << np.arange(num_planes)

    def bucket_of(mat: np.ndarray) -> np.ndarray:
        return ((mat @ planes) > 0) @ powers

    qmat = _unit(queries)
    qbuckets = bucket_of(queries)
    probe: dict[int, list[int]] = {}
    for qi, b in enumerate(qbuckets):
        for cand in [int(b)] + [int(b) ^ (1 << p) for p in range(num_planes)]:
            probe.setdefault(cand, []).append(qi)
    state = ray.put((qmat, probe))

    def _partial(batch: pa.Table) -> pa.Table:
        q, probe_map = ray.get(state)
        ids = batch[id_col].to_numpy(zero_copy_only=False)
        mat = _as_matrix(batch[col])
        buckets = bucket_of(mat)
        out = {"query_id": [], id_col: [], "score": []}
        unit = _unit(mat)
        for b in np.unique(buckets):
            qis = probe_map.get(int(b))
            if not qis:
                continue
            sel = buckets == b
            sub_ids, sub = ids[sel], unit[sel]
            scores = q[qis] @ sub.T
            top = min(k, scores.shape[1])
            for row_i, qi in enumerate(qis):
                row = scores[row_i]
                order = np.lexsort((sub_ids, -row))[:top]
                out["query_id"].extend([qi] * len(order))
                out[id_col].extend(sub_ids[order].tolist())
                out["score"].extend(row[order].tolist())
        # pin the id type: an empty partial would otherwise infer a
        # null-typed column and emit schema-mismatched blocks
        return pa.Table.from_pydict({
            "query_id": pa.array(out["query_id"], type=pa.int32()),
            id_col: pa.array(out[id_col],
                             type=batch.schema.field(id_col).type),
            "score": pa.array(out["score"], type=pa.float64())})

    def _merge(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["score", id_col], ascending=[False, True]).head(k)
        g["rank"] = range(1, len(g) + 1)
        return g

    return (emb_ds.map_batches(_partial, batch_format="pyarrow")
            .groupby("query_id").map_groups(_merge, batch_format="pandas"))


def train_ivf_centroids(emb_ds, num_centroids: int = 16, col: str = "embedding",
                        iters: int = 10, seed: int = 42,
                        train_cap: int = 65536) -> np.ndarray:
    """Spherical k-means on a capped head sample, driver-side.

    The cap bounds driver memory at any corpus scale (the standard IVF
    recipe: train the coarse quantizer on a sample, assign the full
    corpus distributed).  Deterministic for a fixed seed + input order.
    Returns unit-norm centroids, shape (C, dim)."""
    sample = emb_ds.limit(train_cap).to_pandas()
    mat = _unit(np.asarray(sample[col].tolist(), dtype=np.float64))
    rng = np.random.RandomState(seed)
    c = min(num_centroids, len(mat))
    cent = mat[rng.choice(len(mat), c, replace=False)].copy()
    for _ in range(iters):
        assign = np.argmax(mat @ cent.T, axis=1)
        for ci in range(c):
            members = mat[assign == ci]
            if len(members):
                cent[ci] = members.mean(axis=0)
        cent = _unit(cent)
    return cent


def ann_topk_ivf(emb_ds, queries: np.ndarray, k: int = 10,
                 id_col: str = "vec_id", col: str = "embedding",
                 num_centroids: int = 16, nprobe: int = 4,
                 iters: int = 10, seed: int = 42, train_cap: int = 65536):
    """IVF top-k: per-batch centroid assignment + probed-list scoring.

    One broadcast ``ray.put`` carries (queries, centroids, probe map); a
    batch scores only the (centroid, query) combinations whose probe set
    contains a centroid present in the batch — cost ~ nprobe/C of brute
    force per query.  Partial top-k per (batch, list) merges to the exact
    top-k of the probed lists (top-k is a semilattice), so ``nprobe == C``
    reproduces ``ann_topk`` bit-for-bit."""
    import pandas as pd
    import ray

    queries = np.asarray(queries, dtype=np.float64)
    cent = train_ivf_centroids(emb_ds, num_centroids=num_centroids, col=col,
                               iters=iters, seed=seed, train_cap=train_cap)
    qmat = _unit(queries)
    nprobe = min(nprobe, len(cent))
    # top-nprobe centroid lists per query, inverted to centroid -> queries
    order = np.argsort(-(qmat @ cent.T), axis=1)[:, :nprobe]
    probe: dict[int, list[int]] = {}
    for qi, cents in enumerate(order):
        for ci in cents:
            probe.setdefault(int(ci), []).append(qi)
    state = ray.put((qmat, cent, probe))

    def _partial(batch: pa.Table) -> pa.Table:
        q, centroids, probe_map = ray.get(state)
        ids = batch[id_col].to_numpy(zero_copy_only=False)
        unit = _unit(_as_matrix(batch[col]))
        assign = np.argmax(unit @ centroids.T, axis=1)
        out = {"query_id": [], id_col: [], "score": []}
        for ci in np.unique(assign):
            qis = probe_map.get(int(ci))
            if not qis:
                continue
            sel = assign == ci
            sub_ids, sub = ids[sel], unit[sel]
            scores = q[qis] @ sub.T
            top = min(k, scores.shape[1])
            for row_i, qi in enumerate(qis):
                row = scores[row_i]
                o = np.lexsort((sub_ids, -row))[:top]
                out["query_id"].extend([qi] * len(o))
                out[id_col].extend(sub_ids[o].tolist())
                out["score"].extend(row[o].tolist())
        # pin the id type: an empty partial would otherwise infer a
        # null-typed column and emit schema-mismatched blocks
        return pa.Table.from_pydict({
            "query_id": pa.array(out["query_id"], type=pa.int32()),
            id_col: pa.array(out[id_col],
                             type=batch.schema.field(id_col).type),
            "score": pa.array(out["score"], type=pa.float64())})

    def _merge(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["score", id_col], ascending=[False, True]).head(k)
        g["rank"] = range(1, len(g) + 1)
        return g

    return (emb_ds.map_batches(_partial, batch_format="pyarrow")
            .groupby("query_id").map_groups(_merge, batch_format="pandas"))
