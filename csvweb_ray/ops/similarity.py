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
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

__all__ = ["ann_topk", "ann_topk_lsh"]


def _as_matrix(column) -> np.ndarray:
    return np.asarray(column.to_pylist(), dtype=np.float64)


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
        ids = np.asarray(batch[id_col].to_pylist())
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
        return pa.Table.from_pydict({
            "query_id": pa.array(out["query_id"], type=pa.int32()),
            id_col: pa.array(out[id_col]),
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
        ids = np.asarray(batch[id_col].to_pylist())
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
        return pa.Table.from_pydict({
            "query_id": pa.array(out["query_id"], type=pa.int32()),
            id_col: pa.array(out[id_col]),
            "score": pa.array(out["score"], type=pa.float64())})

    def _merge(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["score", id_col], ascending=[False, True]).head(k)
        g["rank"] = range(1, len(g) + 1)
        return g

    return (emb_ds.map_batches(_partial, batch_format="pyarrow")
            .groupby("query_id").map_groups(_merge, batch_format="pandas"))
