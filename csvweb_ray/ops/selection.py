"""Distributed exact selection — per-group order statistics without
materializing any group.

``q_quantiles`` originally computed exact percentiles by materializing
each group inside one ``map_groups`` call; at 100 TB a group does not
fit a worker.  ``exact_group_quantiles`` keeps the answer EXACT (it
matches ``np.percentile`` / DuckDB ``quantile_cont`` bit-for-bit after
rounding) while every pass stays a bounded-size combiner:

1. one native ``groupby().aggregate(Count/Min/Max)`` pass sizes each
   group and seeds a candidate range per (group, percentile) target;
2. iterative histogram refinement: each round is ONE streaming
   ``map_batches`` pass over the dataset that, for every still-active
   target, bucket-counts the values inside its candidate range and
   records per-bucket min/max.  The bucket holding the wanted order
   statistic becomes the next round's range, so the candidate count
   shrinks ~``bins``× per round — ``ceil(log_bins(n / gather_threshold))``
   rounds total (2 rounds cover 10^12 rows at the defaults);
3. a final gather pass collects only the ≤``gather_threshold`` candidate
   values per target and selects/interpolates exactly on the driver.

Partials reduce through the same content-sharded
``groupby(shard).map_groups`` level as ``ops.sketch`` so the driver
merges at most ``merge_shards`` histogram rows per target, never one
per batch.

Duplicate-heavy data terminates via exact resolution: when every
non-empty candidate bucket has ``bmin == bmax`` the round's histogram
IS the exact value multiset (value → count), and the order statistics
are read straight off the cumulative counts — this covers the
pathological case where two huge runs of equal values straddle a
percentile rank and the candidate count can never fall below the
gather threshold.

Designed for low-cardinality group-bys (each round's partial is
``n_targets × bins`` cells); for high-cardinality groups use the
``approx_quantiles_by`` sketch, whose cost is group-count-proportional.

Reference parity: the reference engine computes percentiles by sorting
the whole column in memory (single-process); this is the distributed
re-expression, exact by construction rather than by materialization.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np
import pyarrow as pa

from .sketch import _MERGE_SHARDS, _shard_of

__all__ = ["exact_group_quantiles"]


@dataclass
class _Target:
    tid: int
    group: object
    n: int
    q: float
    kf: int          # floor order statistic (0-indexed, within group)
    kc: int          # ceil order statistic
    frac: float      # interpolation weight between kf and kc
    lo: float        # candidate range [lo, hi] (inclusive) ...
    hi: float
    below: int = 0   # ... with exactly `below` group values < lo
    done: bool = False
    result: float = field(default=np.nan)

    def finish(self, vf: float, vc: float) -> None:
        self.result = vf + self.frac * (vc - vf)
        self.done = True


def _refine_pass(ds, group_col: str, value_col: str, active: list[_Target],
                 bins: int, merge_shards: int) -> dict[int, tuple]:
    """One streaming histogram pass for all active targets.  Returns
    ``{tid: (counts, bmin, bmax)}`` merged across the whole dataset."""
    # ship only the read-only per-target state the batch fn needs
    spec = [(t.tid, t.group, t.lo, t.hi) for t in active]

    def _partial(b: pa.Table) -> pa.Table:
        g = b[group_col].to_numpy(zero_copy_only=False)
        v = b[value_col].to_numpy(zero_copy_only=False).astype(np.float64)
        tids, shards, counts_c, bmin_c, bmax_c = [], [], [], [], []
        masks: dict = {}
        for tid, grp, lo, hi in spec:
            if grp not in masks:               # one equality scan per group
                masks[grp] = g == grp
            m = masks[grp] & (v >= lo) & (v <= hi)
            vv = v[m]
            if vv.size == 0:
                continue
            width = (hi - lo) or 1.0
            j = np.minimum((bins * (vv - lo) / width).astype(np.int64),
                           bins - 1)
            cnt = np.bincount(j, minlength=bins)
            bmin = np.full(bins, np.inf)
            bmax = np.full(bins, -np.inf)
            np.minimum.at(bmin, j, vv)
            np.maximum.at(bmax, j, vv)
            tids.append(tid)
            shards.append(_shard_of(cnt, merge_shards))
            counts_c.append(cnt.tolist())
            bmin_c.append(bmin.tolist())
            bmax_c.append(bmax.tolist())
        return pa.table({
            "shard": pa.array(shards, pa.int32()),
            "tid": pa.array(tids, pa.int32()),
            "counts": pa.array(counts_c, type=pa.list_(pa.int64())),
            "bmin": pa.array(bmin_c, type=pa.list_(pa.float64())),
            "bmax": pa.array(bmax_c, type=pa.list_(pa.float64()))})

    def _merge(g):
        rows = []
        for tid, sub in g.groupby("tid", sort=False):
            cnt = np.sum(np.asarray(sub["counts"].tolist(), np.int64), axis=0)
            bmin = np.min(np.asarray(sub["bmin"].tolist(), np.float64), axis=0)
            bmax = np.max(np.asarray(sub["bmax"].tolist(), np.float64), axis=0)
            rows.append(sub.iloc[:1].assign(counts=[cnt.tolist()],
                                            bmin=[bmin.tolist()],
                                            bmax=[bmax.tolist()]))
        import pandas as pd

        return pd.concat(rows, ignore_index=True)

    parts = (ds.map_batches(_partial, batch_format="pyarrow")
             .groupby("shard").map_groups(_merge, batch_format="pandas")
             .to_pandas())
    out: dict[int, tuple] = {}
    for tid, sub in parts.groupby("tid", sort=False):
        cnt = np.sum(np.asarray(sub["counts"].tolist(), np.int64), axis=0)
        bmin = np.min(np.asarray(sub["bmin"].tolist(), np.float64), axis=0)
        bmax = np.max(np.asarray(sub["bmax"].tolist(), np.float64), axis=0)
        out[int(tid)] = (cnt, bmin, bmax)
    return out


def _select_from_exact(t: _Target, cnt, bmin) -> None:
    """Every non-empty bucket is a single distinct value: the histogram
    IS the multiset.  Read both order statistics off the cumulative
    counts directly (the duplicate-run terminator)."""
    nz = cnt > 0
    vals = bmin[nz]
    cdf = np.cumsum(cnt[nz]) + t.below
    vf = vals[np.searchsorted(cdf, t.kf, side="right")]
    vc = vals[np.searchsorted(cdf, t.kc, side="right")]
    t.finish(float(vf), float(vc))


def exact_group_quantiles(ds, group_col: str, value_col: str,
                          qs=(0.5, 0.95), bins: int = 1024,
                          gather_threshold: int = 8192,
                          merge_shards: int = _MERGE_SHARDS,
                          max_rounds: int = 64) -> "pa.Table":
    """EXACT per-group quantiles (linear interpolation, the
    ``np.percentile`` / SQL ``quantile_cont`` convention) with no group
    materialization — see module docstring for the pass structure.

    Rows with a NULL value are excluded (the SQL aggregate convention);
    NULL groups are excluded with them.  Returns an Arrow table with one
    row per (group, q): ``(group_col, q, value)``, sorted by group then q.
    """
    from ray.data.aggregate import Count, Max, Min

    def _drop_null(b: pa.Table) -> pa.Table:
        return b.select([group_col, value_col]).drop_null()

    ds = ds.map_batches(_drop_null, batch_format="pyarrow")

    sizes = (ds.groupby(group_col)
             .aggregate(Count(alias_name="n"),
                        Min(value_col, alias_name="lo"),
                        Max(value_col, alias_name="hi"))
             .to_pandas())

    targets: list[_Target] = []
    for _, row in sizes.iterrows():
        n, lo, hi = int(row["n"]), float(row["lo"]), float(row["hi"])
        for q in qs:
            idx = q * (n - 1)
            kf, kc = int(np.floor(idx)), int(np.ceil(idx))
            t = _Target(tid=len(targets), group=row[group_col], n=n,
                        q=float(q), kf=kf, kc=kc, frac=float(idx - kf),
                        lo=lo, hi=hi)
            if n == 0 or lo == hi:
                t.finish(lo, lo)
            targets.append(t)

    gather: list[_Target] = [t for t in targets
                             if not t.done and t.n <= gather_threshold]
    for t in gather:
        t.done = True  # skip refinement; candidates already small enough

    for _ in range(max_rounds):
        active = [t for t in targets if not t.done]
        if not active:
            break
        hists = _refine_pass(ds, group_col, value_col, active, bins,
                             merge_shards)
        for t in active:
            cnt, bmin, bmax = hists[t.tid]
            cdf = np.cumsum(cnt)
            bf = int(np.searchsorted(cdf, t.kf - t.below, side="right"))
            bc = int(np.searchsorted(cdf, t.kc - t.below, side="right"))
            cand = int(cdf[bc] - (cdf[bf - 1] if bf else 0))
            nz = cnt > 0
            if np.all(bmin[nz] == bmax[nz]):
                _select_from_exact(t, cnt, bmin)
                continue
            t.below += int(cdf[bf - 1]) if bf else 0
            t.lo, t.hi = float(bmin[bf]), float(bmax[bc])
            if t.lo == t.hi:
                t.finish(t.lo, t.lo)
            elif cand <= gather_threshold:
                t.done = True
                gather.append(t)
    else:
        undone = [t for t in targets if not t.done]
        if undone:
            raise RuntimeError(
                f"histogram refinement did not converge for {len(undone)} "
                "targets — invariant violation (each round must shrink the "
                "candidate range or resolve exactly)")

    if gather:
        spec = [(t.tid, t.group, t.lo, t.hi) for t in gather]

        def _collect(b: pa.Table) -> pa.Table:
            g = b[group_col].to_numpy(zero_copy_only=False)
            v = b[value_col].to_numpy(zero_copy_only=False).astype(np.float64)
            tid_out, val_out = [], []
            for tid, grp, lo, hi in spec:
                vv = v[(g == grp) & (v >= lo) & (v <= hi)]
                tid_out.append(np.full(vv.size, tid, np.int32))
                val_out.append(vv)
            return pa.table({
                "tid": pa.array(np.concatenate(tid_out) if tid_out
                                else np.array([], np.int32), pa.int32()),
                "v": pa.array(np.concatenate(val_out) if val_out
                              else np.array([], np.float64), pa.float64())})

        # bounded: ≤ gather_threshold values per target reach the driver
        cand = (ds.map_batches(_collect, batch_format="pyarrow")
                .to_pandas())
        by_tid = {int(k): np.sort(sub["v"].to_numpy())
                  for k, sub in cand.groupby("tid", sort=False)}
        for t in gather:
            s = by_tid[t.tid]
            t.finish(float(s[t.kf - t.below]), float(s[t.kc - t.below]))

    targets.sort(key=lambda t: (str(t.group), t.q))
    return pa.table({
        group_col: pa.array([t.group for t in targets]),
        "q": pa.array([t.q for t in targets], pa.float64()),
        "value": pa.array([t.result for t in targets], pa.float64())})
