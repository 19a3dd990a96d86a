"""Distributed sketches — the at-scale substitutes for exact wide ops.

``q_quantiles`` (exact) materializes each group's values inside one
``map_groups`` call; at 100 TB a group does not fit a worker.  These
sketches keep every pass a bounded-size combiner:

- ``approx_quantiles`` — two linear passes: a native Min/Max aggregate,
  then fixed-edge histogram partials (one ``np.bincount`` per batch).
  Deterministic error bound: |q̂ - q| ≤ (max-min)/bins.
- ``hll_distinct`` — HyperLogLog distinct count (p → m=2^p registers):
  per-batch register partials from one vectorized 64-bit hash pass,
  max-merged.  Standard error ≈ 1.04/√m (~1.6% at p=12).

Both reduce through an intermediate ``groupby(shard).map_groups`` level
so the driver merges at most ``merge_shards`` sketch rows, not one per
batch (800k batches × 8 KB would otherwise land on the driver at the
100 TB design point).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

__all__ = ["approx_quantiles", "approx_quantiles_by", "hll_distinct",
           "hll_distinct_by", "BloomFilter", "build_bloom", "bloom_prune"]

_MERGE_SHARDS = 64


def _shard_of(arr: np.ndarray, merge_shards: int) -> int:
    """Content-derived merge shard for a sketch partial.  Must VARY per
    batch: a row-count-derived key is constant across Ray's uniform-size
    batches and would funnel every partial into one map_groups task —
    the single-task blow-up the shard level exists to avoid."""
    import zlib

    return zlib.crc32(np.ascontiguousarray(arr).tobytes()) % merge_shards


def _bit_length(x: np.ndarray) -> np.ndarray:
    """Vectorized integer bit length for uint64 (binary search, 6 steps)."""
    out = np.zeros(x.shape, dtype=np.int64)
    x = x.copy()
    for s in (32, 16, 8, 4, 2, 1):
        big = x >= (np.uint64(1) << np.uint64(s))
        out[big] += s
        x[big] >>= np.uint64(s)
    out[x > 0] += 1
    return out


def approx_quantiles(ds, col: str, qs=(0.5, 0.95), bins: int = 8192,
                     merge_shards: int = _MERGE_SHARDS):
    """Histogram-sketch quantiles of ``col``.

    Returns ``{q: value}`` with linear interpolation inside the owning
    bin; error ≤ (max-min)/bins by construction (pytest-gated).  Three
    bounded passes, no full-column materialization anywhere."""
    from ray.data.aggregate import Max, Min

    mm = ds.aggregate(Min(col, alias_name="lo"), Max(col, alias_name="hi"))
    lo, hi = float(mm["lo"]), float(mm["hi"])
    if not np.isfinite(lo) or not np.isfinite(hi) or lo == hi:
        return {float(q): lo for q in qs}
    width = (hi - lo) / bins

    def _partial(b: pa.Table) -> pa.Table:
        v = b[col].to_numpy(zero_copy_only=False).astype(np.float64)
        v = v[np.isfinite(v)]
        idx = np.minimum(((v - lo) / width).astype(np.int64), bins - 1)
        counts = np.bincount(idx, minlength=bins)
        return pa.table({
            "shard": pa.array([_shard_of(counts, merge_shards)], pa.int32()),
            "counts": pa.array([counts.tolist()],
                               type=pa.list_(pa.int64()))})

    def _merge(g) -> "pa.Table":
        import pandas as pd  # noqa: F401  (map_groups gives pandas)

        total = np.sum(np.asarray(g["counts"].tolist(), dtype=np.int64),
                       axis=0)
        return g.iloc[:1].assign(counts=[total.tolist()])

    parts = (ds.map_batches(_partial, batch_format="pyarrow")
             .groupby("shard").map_groups(_merge, batch_format="pandas")
             .to_pandas())
    counts = np.sum(np.asarray(parts["counts"].tolist(), dtype=np.int64),
                    axis=0)
    cdf = np.cumsum(counts)
    n = cdf[-1]
    out = {}
    for q in qs:
        target = q * (n - 1)
        b = int(np.searchsorted(cdf, target, side="right"))
        b = min(b, bins - 1)
        prev = cdf[b - 1] if b else 0
        inbin = counts[b] or 1
        frac = (target - prev) / inbin
        out[float(q)] = lo + (b + np.clip(frac, 0.0, 1.0)) * width
    return out


def hll_distinct(ds, col: str, p: int = 12,
                 merge_shards: int = _MERGE_SHARDS) -> float:
    """HyperLogLog estimate of ``count(DISTINCT col)``.

    One vectorized hash pass per batch (``pandas.util.hash_array``),
    ``np.maximum.at`` register update, max-merge through the shard level.
    Standard error ≈ 1.04/√(2^p)."""
    m = 1 << p
    wbits = 64 - p
    wmask = np.uint64((1 << wbits) - 1)

    def _partial(b: pa.Table) -> pa.Table:
        from pandas.util import hash_array

        # SQL count(DISTINCT col) drops NULLs; hashing them as a regular
        # value would silently inflate the estimate vs the oracle convention
        vals = pc.drop_null(b[col]).to_numpy(zero_copy_only=False)
        reg = np.zeros(m, dtype=np.int64)
        if len(vals) == 0:
            return pa.table({
                "shard": pa.array([_shard_of(reg, merge_shards)], pa.int32()),
                "reg": pa.array([reg.tolist()], type=pa.list_(pa.int64()))})
        # numeric columns hash fully vectorized (splitmix-style finalizer
        # inside hash_array); only non-numeric dtypes take the per-element
        # object path — at 100-TB row counts this is the stage's CPU floor
        if vals.dtype == object or vals.dtype.kind in "OUS":
            vals = vals.astype(object)
        h = hash_array(vals).astype(np.uint64)
        idx = (h >> np.uint64(wbits)).astype(np.int64)
        w = h & wmask
        rho = np.where(w == 0, wbits + 1, wbits - (_bit_length(w) - 1)) \
            .astype(np.int64)
        reg = np.zeros(m, dtype=np.int64)
        np.maximum.at(reg, idx, rho)
        return pa.table({
            "shard": pa.array([_shard_of(reg, merge_shards)], pa.int32()),
            "reg": pa.array([reg.tolist()], type=pa.list_(pa.int64()))})

    def _merge(g):
        reg = np.max(np.asarray(g["reg"].tolist(), dtype=np.int64), axis=0)
        return g.iloc[:1].assign(reg=[reg.tolist()])

    parts = (ds.map_batches(_partial, batch_format="pyarrow")
             .groupby("shard").map_groups(_merge, batch_format="pandas")
             .to_pandas())
    reg = np.max(np.asarray(parts["reg"].tolist(), dtype=np.int64), axis=0)
    return _hll_estimate(reg, m)


def _hll_estimate(reg: np.ndarray, m: int) -> float:
    alpha = 0.7213 / (1 + 1.079 / m)
    est = alpha * m * m / np.sum(np.exp2(-reg.astype(np.float64)))
    zeros = int(np.count_nonzero(reg == 0))
    if est <= 2.5 * m and zeros:
        est = m * np.log(m / zeros)  # linear-counting small-range correction
    return float(est)


def _hll_registers(vals: np.ndarray, m: int, wbits: int,
                   wmask: np.uint64) -> np.ndarray:
    """One vectorized hash pass → max-filled register array."""
    from pandas.util import hash_array

    if vals.dtype == object or vals.dtype.kind in "OUS":
        vals = vals.astype(object)
    h = hash_array(vals).astype(np.uint64)
    idx = (h >> np.uint64(wbits)).astype(np.int64)
    w = h & wmask
    rho = np.where(w == 0, wbits + 1, wbits - (_bit_length(w) - 1)) \
        .astype(np.int64)
    reg = np.zeros(m, dtype=np.int64)
    np.maximum.at(reg, idx, rho)
    return reg


def hll_distinct_by(ds, group_col: str, col: str, p: int = 12,
                    merge_shards: int = _MERGE_SHARDS):
    """Per-group HyperLogLog: ``count(DISTINCT col) GROUP BY group_col``
    estimates — the grouped twin of ``hll_distinct``, completing the
    per-group sketch family alongside ``approx_quantiles_by``.

    Combiner shape: each batch emits ONE register row per group it
    contains (group-count-bounded, never row-count-bounded), max-merged
    through a ``groupby((shard, group))`` level so the driver folds at
    most ``merge_shards`` rows per group.  NULL values drop per batch
    (SQL count(DISTINCT) semantics); NULL groups drop with them.
    Designed for low-to-moderate group cardinality (each batch partial
    is ``groups-in-batch × 2^p`` ints); per-key distinct counts at
    vocabulary scale belong to an exact groupby instead.

    Returns an Arrow table ``(group_col, n_distinct_est: float64)``
    sorted by group; error ≈ 1.04/√(2^p), pytest-gated."""
    import pandas as pd

    m = 1 << p
    wbits = 64 - p
    wmask = np.uint64((1 << wbits) - 1)

    def _partial(b: pa.Table) -> pa.Table:
        t = b.select([group_col, col]).drop_null()
        groups = t[group_col].to_numpy(zero_copy_only=False)
        vals = t[col].to_numpy(zero_copy_only=False)
        out_shard, out_group, out_reg = [], [], []
        for g in pd.unique(groups):
            reg = _hll_registers(vals[groups == g], m, wbits, wmask)
            out_shard.append(_shard_of(reg, merge_shards))
            out_group.append(g)
            out_reg.append(reg.tolist())
        return pa.table({
            "shard": pa.array(out_shard, pa.int32()),
            group_col: pa.array(out_group),
            "reg": pa.array(out_reg, type=pa.list_(pa.int64()))})

    def _merge(g):
        rows = []
        for gv, sub in g.groupby(group_col, sort=False):
            reg = np.max(np.asarray(sub["reg"].tolist(), np.int64), axis=0)
            rows.append(sub.iloc[:1].assign(reg=[reg.tolist()]))
        return pd.concat(rows, ignore_index=True)

    parts = (ds.map_batches(_partial, batch_format="pyarrow")
             .groupby("shard").map_groups(_merge, batch_format="pandas")
             .to_pandas())
    out_g, out_est = [], []
    for gv, sub in sorted(parts.groupby(group_col, sort=False),
                          key=lambda kv: str(kv[0])):
        reg = np.max(np.asarray(sub["reg"].tolist(), np.int64), axis=0)
        out_g.append(gv)
        out_est.append(_hll_estimate(reg, m))
    return pa.table({group_col: pa.array(out_g),
                     "n_distinct_est": pa.array(out_est, pa.float64())})


class BloomFilter:
    """Fixed-size double-hashing Bloom filter over a packed uint64 word
    array — picklable, OR-mergeable, vectorized membership tests.

    ``k`` probe positions are derived as ``h1 + i*h2 mod m`` (Kirsch–
    Mitzenmacher): two vectorized 64-bit hash passes serve any ``k``."""

    def __init__(self, num_bits: int, num_hashes: int):
        self.m = int(num_bits)
        self.k = int(num_hashes)
        self.words = np.zeros((self.m + 63) // 64, dtype=np.uint64)

    @staticmethod
    def sized(expected_items: int, fpr: float = 0.01) -> "BloomFilter":
        n = max(1, expected_items)
        m = int(np.ceil(-n * np.log(fpr) / (np.log(2) ** 2)))
        k = max(1, int(round(m / n * np.log(2))))
        return BloomFilter(m, k)

    def _positions(self, vals) -> np.ndarray:
        from pandas.util import hash_array

        a = np.asarray(vals, dtype=object)
        h1 = hash_array(a).astype(np.uint64)
        h2 = hash_array(np.char.add("b|", a.astype(str))).astype(np.uint64) \
            | np.uint64(1)
        i = np.arange(self.k, dtype=np.uint64)[:, None]
        return ((h1[None, :] + i * h2[None, :]) % np.uint64(self.m))

    def add(self, vals) -> None:
        pos = self._positions(vals).ravel()
        np.bitwise_or.at(self.words, (pos >> np.uint64(6)).astype(np.int64),
                         np.uint64(1) << (pos & np.uint64(63)))

    def contains(self, vals) -> np.ndarray:
        pos = self._positions(vals)
        bits = (self.words[(pos >> np.uint64(6)).astype(np.int64)]
                >> (pos & np.uint64(63))) & np.uint64(1)
        return bits.all(axis=0)

    def merge(self, other: "BloomFilter") -> "BloomFilter":
        assert (self.m, self.k) == (other.m, other.k)
        self.words |= other.words
        return self


def build_bloom(ds, col: str, expected_items: int, fpr: float = 0.01,
                merge_shards: int = _MERGE_SHARDS) -> BloomFilter:
    """Distributed Bloom build: per-batch filter partials (the combiner),
    OR-merged through the shard level, ≤``merge_shards`` word arrays on
    the driver.  The classic probe-side pruner for large-large joins:
    broadcast the filter once (``ray.put``) and drop non-matching probe
    rows BEFORE the shuffle — no false negatives, FPR-bounded extra rows."""
    proto = BloomFilter.sized(expected_items, fpr)

    def _partial(b: pa.Table) -> pa.Table:
        bf = BloomFilter(proto.m, proto.k)
        vals = b[col].to_numpy(zero_copy_only=False)
        if len(vals):
            bf.add(vals)
        return pa.table({
            "shard": pa.array([_shard_of(bf.words, merge_shards)], pa.int32()),
            "words": pa.array([bf.words.tolist()],
                              type=pa.list_(pa.uint64()))})

    def _merge(g):
        words = np.bitwise_or.reduce(
            np.asarray(g["words"].tolist(), dtype=np.uint64), axis=0)
        return g.iloc[:1].assign(words=[words.tolist()])

    parts = (ds.map_batches(_partial, batch_format="pyarrow")
             .groupby("shard").map_groups(_merge, batch_format="pandas")
             .to_pandas())
    out = BloomFilter(proto.m, proto.k)
    out.words = np.bitwise_or.reduce(
        np.asarray(parts["words"].tolist(), dtype=np.uint64), axis=0)
    return out


def bloom_prune(ds, col: str, bloom_ref):
    """Drop rows whose ``col`` is definitely NOT in the broadcast filter
    (``ray.put(BloomFilter)`` handle).  Zero false negatives."""
    import ray

    def _keep(b: pa.Table) -> pa.Table:
        bf = ray.get(bloom_ref)
        vals = b[col].to_numpy(zero_copy_only=False)
        if not len(vals):
            return b
        return b.filter(pa.array(bf.contains(vals)))

    return ds.map_batches(_keep, batch_format="pyarrow")


def approx_quantiles_by(ds, group_col: str, col: str, qs=(0.5, 0.95),
                        bins: int = 2048, merge_shards: int = _MERGE_SHARDS):
    """Per-group histogram-sketch quantiles — the scale path for
    ``q_quantiles``-style per-group percentiles (the exact version
    materializes each group inside one ``map_groups`` call, which cannot
    hold a 100-TB group).

    Pass 1: one native grouped Min/Max (tiny result, broadcast as plain
    captured state).  Pass 2: per-batch histograms for ALL groups at once
    — group ordinals × bins flattened into a single ``np.bincount``; one
    partial row per (group, batch), merged per group.  Error per group ≤
    (group_max-group_min)/bins.  Returns a pandas frame
    ``(group_col, q, value)``."""
    import pandas as pd

    from ray.data.aggregate import Max, Min

    mm = (ds.groupby(group_col)
          .aggregate(Min(col, alias_name="lo"), Max(col, alias_name="hi"))
          .to_pandas())
    groups = sorted(mm[group_col].tolist())
    ordinal = {g: i for i, g in enumerate(groups)}
    lo = np.full(len(groups), np.nan)
    hi = np.full(len(groups), np.nan)
    for _, r in mm.iterrows():
        lo[ordinal[r[group_col]]] = r["lo"]
        hi[ordinal[r[group_col]]] = r["hi"]
    finite = np.isfinite(lo) & np.isfinite(hi)
    width = np.where(finite & (hi > lo), (hi - lo) / bins, 1.0)

    def _partial(b: pa.Table) -> pa.Table:
        import pandas as pd

        # vectorized group→ordinal lookup (one reindex), not a per-row
        # Python dict get over the full column
        g = (pd.Series(b[group_col].to_pandas()).map(ordinal)
             .to_numpy(dtype=np.int64))
        v = b[col].to_numpy(zero_copy_only=False).astype(np.float64)
        ok = np.isfinite(v)
        g, v = g[ok], v[ok]
        bin_ = np.clip(np.nan_to_num((v - lo[g]) / width[g]),
                       0, bins - 1).astype(np.int64)
        flat = np.bincount(g * bins + bin_, minlength=len(groups) * bins)
        present = np.unique(g)
        return pa.table({
            group_col: pa.array([groups[i] for i in present]),
            "counts": pa.array(
                [flat[i * bins:(i + 1) * bins].tolist() for i in present],
                type=pa.list_(pa.int64()))})

    def _merge(gdf):
        total = np.sum(np.asarray(gdf["counts"].tolist(), dtype=np.int64),
                       axis=0)
        return gdf.iloc[:1].assign(counts=[total.tolist()])

    parts = (ds.map_batches(_partial, batch_format="pyarrow")
             .groupby(group_col).map_groups(_merge, batch_format="pandas")
             .to_pandas())
    rows = []
    for _, r in parts.iterrows():
        gi = ordinal[r[group_col]]
        counts = np.asarray(r["counts"], dtype=np.int64)
        cdf = np.cumsum(counts)
        n = cdf[-1]
        for q in qs:
            if lo[gi] == hi[gi] or not finite[gi]:
                rows.append((r[group_col], float(q), float(lo[gi])))
                continue
            target = q * (n - 1)
            b = min(int(np.searchsorted(cdf, target, side="right")), bins - 1)
            prev = cdf[b - 1] if b else 0
            frac = np.clip((target - prev) / (counts[b] or 1), 0.0, 1.0)
            rows.append((r[group_col], float(q),
                         float(lo[gi] + (b + frac) * width[gi])))
    return pd.DataFrame(rows, columns=[group_col, "q", "value"]) \
        .sort_values([group_col, "q"]).reset_index(drop=True)
