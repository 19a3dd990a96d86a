"""Deterministic corpus sampling.

A 100-TB training-data pipeline samples by CONTENT HASH, not RNG state:
the decision for a row is a pure function of (salt, key), so it is
reproducible across reruns, cluster sizes and block layouts, composable
with checkpoint/resume (a resumed run keeps the same sample), and
auditable in SQL (`md5` exists in every engine).

Two hashers:

- ``md5``  (default): bit-exact SQL parity (DuckDB
  ``('0x' || substr(md5(salt|key),1,8))::BIGINT % 1000``).  hashlib is
  C, but the per-row call is a Python loop — ~1 µs/row, fine for
  sampling decisions (one short hash per ROW, not per token).
- ``fast``: ``pandas.util.hash_array`` — fully vectorized, ~20× faster,
  same statistical properties, no SQL twin.  The scale path when the
  sample needn't be SQL-audited.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa

__all__ = ["hash_sample", "hash_topk_sample"]


def _md5_permille(keys, salt: str) -> np.ndarray:
    pre = f"{salt}|".encode()
    return np.fromiter(
        (int(hashlib.md5(pre + str(k).encode()).hexdigest()[:8], 16) % 1000
         for k in keys),
        dtype=np.int64, count=len(keys))


def _fast_permille(keys, salt: str) -> np.ndarray:
    from pandas.util import hash_array

    h = hash_array(np.asarray([f"{salt}|{k}" for k in keys], dtype=object))
    return (h % 1000).astype(np.int64)


def hash_sample(ds, key_col: str, rate_permille: int = 100, *,
                salt: str = "s0", group_col: str | None = None,
                group_rates: dict | None = None, hasher: str = "md5"):
    """Keep a row iff ``hash(salt|key) % 1000 < rate``.

    ``group_rates`` (with ``group_col``) gives per-stratum rates —
    stratified sampling keyed on e.g. language or quality bucket;
    strata absent from the dict fall back to ``rate_permille``.
    Deterministic: same salt + key ⇒ same decision, at any parallelism.
    """
    permille = {"md5": _md5_permille, "fast": _fast_permille}[hasher]

    def _keep(b: pa.Table) -> pa.Table:
        h = permille(b[key_col].to_pylist(), salt)
        if group_col is not None and group_rates:
            groups = b[group_col].to_pylist()
            rates = np.asarray(
                [group_rates.get(g, rate_permille) for g in groups],
                dtype=np.int64)
        else:
            rates = rate_permille
        return b.filter(pa.array(h < rates))

    return ds.map_batches(_keep, batch_format="pyarrow")


def hash_topk_sample(ds, key_col: str, k: int = 10, *,
                     group_col: str | None = None, salt: str = "s0"):
    """EXACT-k deterministic sample per stratum: the k rows whose
    ``md5(salt|key)`` digits sort smallest ("hash-order head").  Where
    ``hash_sample`` fixes the RATE and lets the count float, this fixes
    the COUNT — the right tool for "give me exactly 10k eval docs per
    language, reproducibly".  Same determinism contract: the selection
    is a pure function of (salt, key set), invariant to parallelism,
    block layout and resume, and SQL-auditable (``row_number() OVER
    (PARTITION BY stratum ORDER BY md5(salt|key), key)``).

    Combiner shape: each batch forwards AT MOST k rows per stratum it
    sees (one local sort of the batch), so the merge input is bounded by
    batches × strata × k; the final per-stratum pick is one
    ``groupby(stratum)`` map_groups whose call count equals the stratum
    count — small by contract (languages, quality buckets), the same
    cardinality assumption the stratified ``hash_sample`` rates make.
    Returns ``(group_col?, rn, key_col)`` with ``rn`` 1-based in hash
    order.  Ties on the digest (only possible for equal keys) break by
    key, matching the SQL twin exactly."""
    import pandas as pd

    def _partial(b: pa.Table) -> pa.Table:
        keys = b[key_col].to_pylist()
        pre = f"{salt}|"
        h = [hashlib.md5((pre + str(key)).encode()).hexdigest()
             for key in keys]
        g = b[group_col].to_pylist() if group_col else [0] * len(keys)
        df = pd.DataFrame({"_g": g, key_col: keys, "_h": h})
        df = (df.sort_values(["_g", "_h", key_col])
              .groupby("_g", sort=False).head(k))
        return pa.Table.from_pandas(df, preserve_index=False)

    def _pick(g: "pd.DataFrame") -> "pd.DataFrame":
        g = g.sort_values(["_h", key_col]).head(k).reset_index(drop=True)
        g["rn"] = np.arange(1, len(g) + 1, dtype=np.int64)
        return g

    out = (ds.map_batches(_partial, batch_format="pyarrow")
           .groupby("_g").map_groups(_pick, batch_format="pandas")
           .to_pandas())
    cols = ([group_col] if group_col else []) + ["rn", key_col]
    if group_col:
        out = out.rename(columns={"_g": group_col})
    return pa.Table.from_pandas(
        out[cols].sort_values(cols).reset_index(drop=True),
        preserve_index=False)
