"""Relational / dataflow operator demonstrations over the driver testdata
tables, exercised against DuckDB oracles (``__ray_entry__``).

Each function takes ``sf_dir`` and returns a small result (pyarrow Table
or pandas DataFrame) with **named** computed columns matching the oracle
SQL exactly.  Pipelines stay lazy/streaming until the final small
collect; shuffles are preceded by per-batch partial aggregation where the
algebra allows (the combiner pattern).
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

__all__ = ["T", "auto_num_buckets"]


def T(sf_dir: str, name: str, columns=None):
    import ray.data as rd

    return rd.read_parquet(os.path.join(sf_dir, f"{name}.parquet"),
                           columns=columns)


def auto_num_buckets(n_rows: int, target_bucket_rows: int = 1_000_000,
                     lo: int = 16, hi: int = 1 << 14) -> int:
    """Power-of-two bucket count for the key-bucketed map_groups queries
    (sessionize / as-of join / interval join), sized to the input like
    ``auto_num_planes`` sizes LSH buckets: ≈ ``n_rows /
    target_bucket_rows`` buckets, clamped to [lo, hi], rounded up to a
    power of two so the ``key & (n-1)`` mask stays one Arrow kernel.

    Why it matters at 100 TB: a FIXED bucket count means per-bucket rows
    grow linearly with the table — sessionize pays O(rows log rows) and
    the interval join O(rows + pairs) *per bucket in one task's pandas
    heap*.  Scaling buckets with the input pins per-bucket work at
    ~``target_bucket_rows`` regardless of table size.

    Skew bound (documented contract of all three queries): hashing
    co-locates each key's rows, so one hot key lower-bounds its bucket —
    per-bucket rows = max(hot-key rows, n_rows / num_buckets) and, for
    the interval join, per-bucket pairs = Σ_user (rows_user × avg window
    occupancy).  More buckets dilute the *other* keys sharing the hot
    bucket but can never split the hot key itself; a pathological single
    key needs a per-key remedy (sessionize: per-key work is O(n log n),
    fine; interval join: the gap bound caps window occupancy, so pairs
    stay O(rows × occupancy), not O(rows²))."""
    import math

    if n_rows <= 0:
        return lo
    want = max(1, math.ceil(n_rows / target_bucket_rows))
    return max(lo, min(hi, 1 << math.ceil(math.log2(want))))


# ---------------------------------------------------------------------------
# scans / filters / projection (G1)

def q_filter_scan(sf_dir: str):
    """Filter + projection with column pruning at the read: click events
    with value ≥ 50, id/user/value only, sorted for stable compare."""
    ds = T(sf_dir, "events", columns=["event_id", "user_id", "event_type", "value"])

    def _keep(b: pa.Table) -> pa.Table:
        m = pc.and_(pc.equal(b["event_type"], "click"),
                    pc.greater_equal(b["value"], 50.0))
        return b.filter(m).select(["event_id", "user_id", "value"])

    return ds.map_batches(_keep, batch_format="pyarrow").sort("event_id")


# ---------------------------------------------------------------------------
# grouped aggregation with partial pre-aggregation (TPC-H Q1 shape)

def q_groupby_agg(sf_dir: str):
    """Pricing summary: per-batch partial sums (combiner) → tiny groupby.
    The shuffle moves one row per (flag,status) per batch, not 600k rows."""
    ds = T(sf_dir, "lineitem",
           columns=["l_returnflag", "l_linestatus", "l_quantity",
                    "l_extendedprice", "l_discount"])

    def _partial(b: pa.Table) -> pa.Table:
        df = b.to_pandas()
        df["revenue"] = df.l_extendedprice * (1 - df.l_discount)
        g = (df.groupby(["l_returnflag", "l_linestatus"], as_index=False)
             .agg(sum_qty=("l_quantity", "sum"),
                  sum_base_price=("l_extendedprice", "sum"),
                  revenue=("revenue", "sum"),
                  count_order=("l_quantity", "size")))
        return pa.Table.from_pandas(g, preserve_index=False)

    from ray.data.aggregate import Sum

    out = (ds.map_batches(_partial, batch_format="pyarrow")
           .groupby(["l_returnflag", "l_linestatus"])
           .aggregate(Sum("sum_qty", alias_name="sum_qty"),
                      Sum("sum_base_price", alias_name="sum_base_price"),
                      Sum("revenue", alias_name="revenue"),
                      Sum("count_order", alias_name="count_order")))
    df = out.to_pandas().sort_values(["l_returnflag", "l_linestatus"])
    df["avg_qty"] = (df.sum_qty / df.count_order).round(4)
    for c in ("sum_qty", "sum_base_price", "revenue"):
        df[c] = df[c].round(4)
    return pa.Table.from_pandas(df, preserve_index=False)


# ---------------------------------------------------------------------------
# broadcast (small-side) join — no shuffle

def q_broadcast_join(sf_dir: str):
    """orders ⋈ customer via a broadcast dict of the small side (``ray.put``
    once, read per task): revenue per market segment."""
    import ray
    from ray.data.aggregate import Sum

    cust = T(sf_dir, "customer", columns=["c_custkey", "c_mktsegment"]).to_pandas()
    # broadcast an index-keyed Series, not a dict: the probe is then one
    # vectorized reindex per batch instead of a per-row dict lookup
    seg_ref = ray.put(pd.Series(cust.c_mktsegment.to_numpy(),
                                index=cust.c_custkey.to_numpy()))

    ds = T(sf_dir, "orders", columns=["o_custkey", "o_totalprice"])

    def _attach(b: pa.Table) -> pa.Table:
        seg = ray.get(seg_ref)
        keys = b["o_custkey"].to_numpy(zero_copy_only=False)
        segs = seg.reindex(keys).to_numpy()
        out = b.append_column(
            "c_mktsegment", pa.array(segs, type=pa.string(), from_pandas=True))
        return out.filter(pc.is_valid(out["c_mktsegment"]))

    out = (ds.map_batches(_attach, batch_format="pyarrow")
           .groupby("c_mktsegment")
           .aggregate(Sum("o_totalprice", alias_name="segment_revenue")))
    df = out.to_pandas().sort_values("c_mktsegment")
    df["segment_revenue"] = df["segment_revenue"].round(4)
    return pa.Table.from_pandas(df, preserve_index=False)


# ---------------------------------------------------------------------------
# partitioned hash join (both sides large): bucket + per-bucket merge

def q_hash_join(sf_dir: str, num_buckets: int = 16):
    """lineitem ⋈ orders on orderkey as an explicit bucketed hash join:
    both sides get ``bucket = key % B``, co-grouped per bucket, pandas
    merge inside ``map_groups`` — the portable large-large join pattern.
    Result: revenue per order priority."""
    li = T(sf_dir, "lineitem", columns=["l_orderkey", "l_extendedprice", "l_discount"])
    od = T(sf_dir, "orders", columns=["o_orderkey", "o_orderpriority"])

    def _mark(side, key):
        def fn(b: pa.Table) -> pa.Table:
            bucket = pc.cast(
                pc.bit_wise_and(b[key], pa.scalar(num_buckets - 1)), pa.int32())
            b = b.append_column("bucket", bucket)
            return b.append_column("side", pa.array([side] * b.num_rows,
                                                    type=pa.string()))
        return fn

    left = li.map_batches(_mark("l", "l_orderkey"), batch_format="pyarrow")
    right = od.map_batches(_mark("r", "o_orderkey"), batch_format="pyarrow")
    # union then co-group per bucket (one shuffle total)
    both = left.union(right)

    def _join(g: pd.DataFrame) -> pd.DataFrame:
        # after union a block's schema may or may not be unified across
        # sides — reindex pins each side to its own columns either way
        lt = g[g["side"] == "l"].reindex(
            columns=["l_orderkey", "l_extendedprice", "l_discount"])
        rt = g[g["side"] == "r"].reindex(
            columns=["o_orderkey", "o_orderpriority"])
        m = lt.merge(rt, left_on="l_orderkey", right_on="o_orderkey")
        if m.empty:
            return pd.DataFrame({"o_orderpriority": [], "revenue": []})
        m["revenue"] = m.l_extendedprice * (1 - m.l_discount)
        return (m.groupby("o_orderpriority", as_index=False)
                .agg(revenue=("revenue", "sum")))

    from ray.data.aggregate import Sum

    out = (both.groupby("bucket").map_groups(_join, batch_format="pandas")
           .groupby("o_orderpriority")
           .aggregate(Sum("revenue", alias_name="revenue")))
    df = out.to_pandas().sort_values("o_orderpriority")
    df["revenue"] = df["revenue"].round(4)
    return pa.Table.from_pandas(df, preserve_index=False)


# ---------------------------------------------------------------------------
# dedup-first-per-key (G6 analogue on relational data)

def q_dedup_first(sf_dir: str):
    """First event per (user_id, event_type) by (ts, event_id): per-batch
    local winner (combiner) → native Min over a sortable packed
    ``ts|event_id`` string (one Python UDF call per *block*, not per key —
    per-key ``map_groups`` would pay one pandas call per distinct key)."""
    from ray.data.aggregate import Min

    ds = T(sf_dir, "events", columns=["event_id", "ts", "user_id", "event_type"])

    def _local(b: pa.Table) -> pa.Table:
        df = b.to_pandas().sort_values(["user_id", "event_type", "ts", "event_id"])
        df = df.drop_duplicates(["user_id", "event_type"])
        # ISO timestamps sort lexicographically; zero-pad the id tiebreak
        df["packed"] = (df["ts"].dt.strftime("%Y-%m-%dT%H:%M:%S.%f")
                        + "|" + df["event_id"].map("{:020d}".format))
        return pa.Table.from_pandas(
            df[["user_id", "event_type", "packed"]], preserve_index=False)

    out = (ds.map_batches(_local, batch_format="pyarrow")
           .groupby(["user_id", "event_type"])
           .aggregate(Min("packed", alias_name="packed")))

    df = out.to_pandas().sort_values(["user_id", "event_type"])
    df["ts"] = pd.to_datetime(df["packed"].str.split("|").str[0])
    df["event_id"] = df["packed"].str.split("|").str[1].astype("int64")
    return pa.Table.from_pandas(
        df[["user_id", "event_type", "event_id", "ts"]], preserve_index=False)


# ---------------------------------------------------------------------------
# global sort + top-k (G7 analogue)

def q_sort_topk(sf_dir: str, k: int = 100):
    """Top-k by price with deterministic tie-breaks; per-batch partial
    top-k before the final merge so the sort sees k×blocks rows."""
    ds = T(sf_dir, "lineitem",
           columns=["l_orderkey", "l_linenumber", "l_extendedprice"])

    def _partial(b: pa.Table) -> pa.Table:
        df = b.to_pandas().sort_values(
            ["l_extendedprice", "l_orderkey", "l_linenumber"],
            ascending=[False, True, True]).head(k)
        return pa.Table.from_pandas(df, preserve_index=False)

    df = (ds.map_batches(_partial, batch_format="pyarrow")
          .to_pandas()
          .sort_values(["l_extendedprice", "l_orderkey", "l_linenumber"],
                       ascending=[False, True, True]).head(k))
    return pa.Table.from_pandas(df, preserve_index=False)


# ---------------------------------------------------------------------------
# windowed aggregate (streaming-shaped; guide §Streaming)

def q_window_tumbling(sf_dir: str):
    """Per-user hourly tumbling windows: the window key is computed
    vectorized per batch; the groupby is the only shuffle.  Ordering
    assumption: none needed (counts/sums are order-free)."""
    from ray.data.aggregate import Count, Sum

    ds = T(sf_dir, "events", columns=["user_id", "ts", "value"])

    def _window(b: pa.Table) -> pa.Table:
        w = pc.floor_temporal(b["ts"], unit="hour")
        return b.append_column("window_start", w)

    out = (ds.map_batches(_window, batch_format="pyarrow")
           .groupby(["user_id", "window_start"])
           .aggregate(Count(alias_name="n_events"),
                      Sum("value", alias_name="sum_value")))
    df = out.to_pandas().sort_values(["user_id", "window_start"])
    df["sum_value"] = df["sum_value"].round(4)
    return pa.Table.from_pandas(df, preserve_index=False)


# ---------------------------------------------------------------------------
# as-of join (bucketed merge_asof; guide §Joins)

def q_asof_join(sf_dir: str, num_buckets: int | None = None):
    """Each event joined to the most recent prior order of the same
    user/customer: hash the key into ``num_buckets`` buckets (NOT one
    group per raw key — that is one pandas call per user and maps a hot
    user onto a single task), then one ``pd.merge_asof(..., by="k")`` per
    bucket.  Partitioning assumption: key co-location per bucket.
    ``num_buckets`` defaults to ``auto_num_buckets`` over the combined
    row count (parquet-metadata count, no data pass) so per-bucket rows
    stay bounded as the input grows; see its docstring for the hot-key
    skew bound."""
    ev = T(sf_dir, "events", columns=["event_id", "user_id", "ts"])
    od = T(sf_dir, "orders", columns=["o_orderkey", "o_custkey", "o_orderdate"])
    if num_buckets is None:
        num_buckets = auto_num_buckets(ev.count() + od.count())

    def _mark(side):
        def fn(b: pa.Table) -> pa.Table:
            return b.append_column("side", pa.array([side] * b.num_rows,
                                                    type=pa.string()))
        return fn

    left = ev.map_batches(_mark("e"), batch_format="pyarrow")
    right = od.map_batches(_mark("o"), batch_format="pyarrow")

    def _key(b: pa.Table) -> pa.Table:
        key = b["user_id"] if "user_id" in b.column_names else b["o_custkey"]
        k = pc.cast(key, pa.int64())
        b = b.append_column("k", k)
        bucket = pc.cast(pc.bit_wise_and(k, pa.scalar(num_buckets - 1)),
                         pa.int32())
        return b.append_column("bucket", bucket)

    both = (left.map_batches(_key, batch_format="pyarrow")
            .union(right.map_batches(_key, batch_format="pyarrow")))

    def _asof(g: pd.DataFrame) -> pd.DataFrame:
        ev_g = g[g["side"] == "e"].reindex(
            columns=["event_id", "k", "ts"]).sort_values("ts")
        od_g = g[g["side"] == "o"].reindex(
            columns=["k", "o_orderdate"]).sort_values("o_orderdate")
        if ev_g.empty:
            return pd.DataFrame({"event_id": pd.Series([], dtype="int64"),
                                 "last_order_date": pd.Series([], dtype="datetime64[us]")})
        if od_g.empty:
            m = ev_g.copy()
            m["last_order_date"] = pd.NaT
            return m[["event_id", "last_order_date"]]
        m = pd.merge_asof(ev_g, od_g, by="k", left_on="ts",
                          right_on="o_orderdate", direction="backward")
        m = m.rename(columns={"o_orderdate": "last_order_date"})
        return m[["event_id", "last_order_date"]]

    out = both.groupby("bucket").map_groups(_asof, batch_format="pandas")
    df = out.to_pandas().sort_values("event_id")
    # merge/reindex paths introduce NaN-capable dtypes; pin to the oracle's
    df["event_id"] = df["event_id"].astype("int64")
    df["last_order_date"] = df["last_order_date"].astype("datetime64[us]")
    return pa.Table.from_pandas(df, preserve_index=False)


# ---------------------------------------------------------------------------
# top-k per group (window-function shape)

def q_topk_per_group(sf_dir: str, k: int = 3):
    """Top-3 orders by price per market segment: per-batch partial top-k
    (combiner) → small grouped exact top-k.  The map_groups here runs once
    per segment (5 groups), not per row."""
    import ray

    cust = T(sf_dir, "customer", columns=["c_custkey", "c_mktsegment"]).to_pandas()
    seg_ref = ray.put(pd.Series(cust.c_mktsegment.to_numpy(),
                                index=cust.c_custkey.to_numpy()))
    ds = T(sf_dir, "orders", columns=["o_orderkey", "o_custkey", "o_totalprice"])

    def _attach_partial(b: pa.Table) -> pa.Table:
        seg = ray.get(seg_ref)
        df = b.to_pandas()
        # Series-keyed map = one vectorized reindex, not per-row dict gets
        df["c_mktsegment"] = seg.reindex(df.o_custkey.to_numpy()).to_numpy()
        df = df.dropna(subset=["c_mktsegment"])
        df = (df.sort_values(["c_mktsegment", "o_totalprice", "o_orderkey"],
                             ascending=[True, False, True])
              .groupby("c_mktsegment").head(k))
        return pa.Table.from_pandas(df[["c_mktsegment", "o_orderkey", "o_totalprice"]],
                                    preserve_index=False)

    def _final(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["o_totalprice", "o_orderkey"],
                          ascending=[False, True]).head(k)
        g["rank"] = range(1, len(g) + 1)
        return g

    out = (ds.map_batches(_attach_partial, batch_format="pyarrow")
           .groupby("c_mktsegment").map_groups(_final, batch_format="pandas"))
    df = out.to_pandas().sort_values(["c_mktsegment", "rank"])
    return pa.Table.from_pandas(df, preserve_index=False)


# ---------------------------------------------------------------------------
# distinct aggregation

def q_distinct_count(sf_dir: str):
    """count(DISTINCT user_id) per event_type: per-batch distinct pairs
    (combiner) → native grouped Count (one row per distinct pair) → count
    rows per event_type.  Both aggregates are native — no per-group Python
    call (a ``map_groups`` here would pay one pandas call per distinct
    (event_type, user_id) pair, the map_groups-cardinality trap)."""
    from ray.data.aggregate import Count

    ds = T(sf_dir, "events", columns=["user_id", "event_type"])

    def _distinct(b: pa.Table) -> pa.Table:
        df = b.to_pandas().drop_duplicates(["event_type", "user_id"])
        return pa.Table.from_pandas(df, preserve_index=False)

    pairs = (ds.map_batches(_distinct, batch_format="pyarrow")
             .groupby(["event_type", "user_id"])
             .aggregate(Count(alias_name="n_copies")))
    out = pairs.groupby("event_type").aggregate(Count(alias_name="n_users"))
    return pa.Table.from_pandas(
        out.to_pandas()[["event_type", "n_users"]].sort_values("event_type"),
        preserve_index=False)


# ---------------------------------------------------------------------------
# exact quantiles per group

def q_quantiles(sf_dir: str):
    """p50/p95 of extended price per return flag — EXACT (linear
    interpolation, the np.percentile / quantile_cont convention), computed
    by distributed iterative histogram refinement
    (`ops.selection.exact_group_quantiles`): no group is ever materialized
    in one task, every pass is a bounded combiner, and the round count is
    ceil(log_bins(n / gather_threshold)) — the scale path that replaced the
    original map_groups full-group materialization."""
    from csvweb_ray.ops.selection import exact_group_quantiles

    ds = T(sf_dir, "lineitem", columns=["l_returnflag", "l_extendedprice"])
    long = exact_group_quantiles(ds, "l_returnflag", "l_extendedprice",
                                 qs=(0.5, 0.95)).to_pandas()
    wide = (long.pivot(index="l_returnflag", columns="q", values="value")
            .reset_index())
    df = pd.DataFrame({
        "l_returnflag": wide["l_returnflag"].astype(str),
        "p50": wide[0.5].round(4).astype("float64"),
        "p95": wide[0.95].round(4).astype("float64"),
    }).sort_values("l_returnflag")
    return pa.Table.from_pandas(df, preserve_index=False)


# ---------------------------------------------------------------------------
# session windows (streaming-shaped; 30-minute inactivity gap)

def q_sessionize(sf_dir: str, gap_minutes: int = 30,
                 num_buckets: int | None = None):
    """Per-user session windows: events sorted within user, a new session
    starts after a >30-min gap.  Users are hashed into ``num_buckets``
    buckets (one pandas call per BUCKET, not per user — the
    map_groups-cardinality trap); inside a bucket the session boundaries
    and aggregates are fully vectorized pandas groupby operations.
    Ordering assumption: per-user order established inside the bucket (the
    groupby co-locates each user's rows).  Output: one row per session.
    ``num_buckets`` defaults to ``auto_num_buckets(row count)`` so a
    bucket's rows stay ~constant as the table grows; a single hot user
    lower-bounds one bucket at its own row count (see auto_num_buckets)."""
    ds = T(sf_dir, "events", columns=["event_id", "user_id", "ts"])
    if num_buckets is None:
        num_buckets = auto_num_buckets(ds.count())

    def _bucket(b: pa.Table) -> pa.Table:
        bucket = pc.cast(pc.bit_wise_and(pc.cast(b["user_id"], pa.int64()),
                                         pa.scalar(num_buckets - 1)), pa.int32())
        return b.append_column("bucket", bucket)

    def _sessions(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["user_id", "ts", "event_id"])
        new_user = g.user_id.ne(g.user_id.shift())
        gap = (g.ts.diff() > pd.Timedelta(minutes=gap_minutes)) & ~new_user
        g["session_id"] = gap.astype("int64").groupby(
            g.user_id.values).cumsum().astype("int64")
        out = (g.groupby(["user_id", "session_id"], as_index=False)
               .agg(n_events=("event_id", "size"),
                    t_start=("ts", "min"), t_end=("ts", "max")))
        return out[["user_id", "session_id", "n_events", "t_start", "t_end"]]

    out = (ds.map_batches(_bucket, batch_format="pyarrow")
           .groupby("bucket").map_groups(_sessions, batch_format="pandas"))
    df = out.to_pandas().sort_values(["user_id", "session_id"])
    df["n_events"] = df["n_events"].astype("int64")
    return pa.Table.from_pandas(df, preserve_index=False)


# ---------------------------------------------------------------------------
# windowed analytics: per-key running sum / lag / row_number

def q_window_analytics(sf_dir: str, num_buckets: int | None = None):
    """Per-user windowed analytics in ONE pass: running sum, previous
    value (lag 1) and row number, each over ``PARTITION BY user_id ORDER
    BY ts, event_id``.  Same partitioning as ``q_sessionize``: users hash
    into ``auto_num_buckets`` buckets (one shuffle, one pandas call per
    BUCKET), then fully vectorized in-bucket ``groupby`` cumsum / shift /
    cumcount — no per-user Python, no per-row loops.

    The running sum accumulates integer CENTS (``floor(value * 100)``) so
    the result is exact and association-order-free — a float64 cumsum's
    low bits depend on the engine's accumulation order, which would make
    an otherwise-correct result hash-diverge from the SQL oracle.  Skew:
    a hot user lower-bounds its bucket (see ``auto_num_buckets``); all
    three analytics are O(rows) per bucket after the in-bucket sort."""
    ds = T(sf_dir, "events", columns=["event_id", "user_id", "ts", "value"])
    if num_buckets is None:
        num_buckets = auto_num_buckets(ds.count())

    def _bucket(b: pa.Table) -> pa.Table:
        bucket = pc.cast(pc.bit_wise_and(pc.cast(b["user_id"], pa.int64()),
                                         pa.scalar(num_buckets - 1)), pa.int32())
        return b.append_column("bucket", bucket)

    def _analytics(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["user_id", "ts", "event_id"])
        cents = np.floor(g.value.to_numpy() * 100.0).astype("int64")
        uid = g.user_id.to_numpy()
        grp = g.groupby("user_id", sort=False)
        g["running_cents"] = pd.Series(cents, index=g.index).groupby(
            uid).cumsum().astype("int64")
        g["prev_value"] = grp["value"].shift()
        g["row_no"] = (grp.cumcount() + 1).astype("int64")
        return g[["event_id", "user_id", "running_cents", "prev_value",
                  "row_no"]]

    out = (ds.map_batches(_bucket, batch_format="pyarrow")
           .groupby("bucket").map_groups(_analytics, batch_format="pandas"))
    df = out.to_pandas().sort_values("event_id").reset_index(drop=True)
    for c, t in (("event_id", "int64"), ("user_id", "int64"),
                 ("running_cents", "int64"), ("prev_value", "float64"),
                 ("row_no", "int64")):
        if str(df[c].dtype) != t:
            df[c] = df[c].astype(t)
    return pa.Table.from_pandas(df, preserve_index=False)


# ---------------------------------------------------------------------------
# semi / anti join via distinct-key broadcast

def q_semi_join(sf_dir: str):
    """orders SEMI JOIN heavy lineitems (l_quantity ≥ 48): distributed
    distinct of the filtered probe keys (per-batch unique combiner →
    ``Dataset.unique``), broadcast ONCE via ``ray.put``, sorted-array
    ``np.isin`` filter inside ``map_batches``.  The broadcast assumption
    is the filtered-distinct key set fitting a worker heap (it is the
    *selective* side by construction); past that, fall back to the
    bucketed co-group shape of ``q_hash_join``."""
    import ray
    from ray.data.aggregate import Count, Sum

    li = T(sf_dir, "lineitem", columns=["l_orderkey", "l_quantity"])

    def _keys(b: pa.Table) -> pa.Table:
        m = pc.greater_equal(b["l_quantity"], 48.0)
        return pa.table({"l_orderkey": pc.unique(b.filter(m)["l_orderkey"])})

    keys = li.map_batches(_keys, batch_format="pyarrow").unique("l_orderkey")
    key_ref = ray.put(np.sort(np.asarray(keys, dtype=np.int64)))

    od = T(sf_dir, "orders",
           columns=["o_orderkey", "o_orderpriority", "o_totalprice"])

    def _semi(b: pa.Table) -> pa.Table:
        ks = ray.get(key_ref)
        keep = np.isin(np.asarray(b["o_orderkey"]), ks)
        return b.filter(pa.array(keep))

    out = (od.map_batches(_semi, batch_format="pyarrow")
           .groupby("o_orderpriority")
           .aggregate(Count(alias_name="n_orders"),
                      Sum("o_totalprice", alias_name="total_price")))
    df = out.to_pandas().sort_values("o_orderpriority").reset_index(drop=True)
    df["total_price"] = df["total_price"].round(4)
    df["n_orders"] = df["n_orders"].astype("int64")
    return pa.Table.from_pandas(
        df[["o_orderpriority", "n_orders", "total_price"]],
        preserve_index=False)


def q_anti_join(sf_dir: str):
    """customer ANTI JOIN events (customers with no recorded activity):
    same distinct-key broadcast shape as ``q_semi_join`` with the filter
    inverted — the key set is the distinct *event* users, which is the
    small side at any scale (bounded by the active-user population)."""
    import ray
    from ray.data.aggregate import Count

    ev = T(sf_dir, "events", columns=["user_id"])

    def _keys(b: pa.Table) -> pa.Table:
        return pa.table({"user_id": pc.unique(b["user_id"])})

    keys = ev.map_batches(_keys, batch_format="pyarrow").unique("user_id")
    key_ref = ray.put(np.sort(np.asarray(keys, dtype=np.int64)))

    cu = T(sf_dir, "customer", columns=["c_custkey", "c_mktsegment"])

    def _anti(b: pa.Table) -> pa.Table:
        ks = ray.get(key_ref)
        keep = ~np.isin(np.asarray(b["c_custkey"]), ks)
        return b.filter(pa.array(keep))

    out = (cu.map_batches(_anti, batch_format="pyarrow")
           .groupby("c_mktsegment").aggregate(Count(alias_name="n_customers")))
    df = out.to_pandas().sort_values("c_mktsegment").reset_index(drop=True)
    df["n_customers"] = df["n_customers"].astype("int64")
    return pa.Table.from_pandas(df[["c_mktsegment", "n_customers"]],
                                preserve_index=False)


# ---------------------------------------------------------------------------
# interval (range) join

def q_range_join(sf_dir: str, gap_minutes: int = 5,
                 num_buckets: int | None = None):
    """Interval self-join: ordered event pairs of the same user within
    ``gap_minutes``.  Users hash into buckets (ONE shuffle, the sessionize
    partitioning); inside a bucket the pair expansion is fully vectorized:
    rows sorted by (user, ts) are encoded as a single monotonic int64 key
    (user × span + ts-offset), window ends found with one ``searchsorted``
    per bucket, and the (a, b) index pairs materialized with a
    repeat/cumsum expansion — no per-row or per-user Python.  Partitioning
    assumption: a user's rows co-locate in one bucket (same as
    ``q_sessionize``).  ``num_buckets`` defaults to
    ``auto_num_buckets(row count)`` — per-bucket rows stay ~constant as
    the table grows, and more buckets also push the int64 key-overflow
    guard further out (fewer distinct users per bucket).  Skew: a hot
    user lower-bounds its bucket; its pair count is capped at rows ×
    window-occupancy by the gap bound, not rows² (see auto_num_buckets)."""
    ds = T(sf_dir, "events", columns=["event_id", "user_id", "ts"])
    if num_buckets is None:
        num_buckets = auto_num_buckets(ds.count())
    gap_us = gap_minutes * 60 * 1_000_000

    def _bucket(b: pa.Table) -> pa.Table:
        bucket = pc.cast(pc.bit_wise_and(pc.cast(b["user_id"], pa.int64()),
                                         pa.scalar(num_buckets - 1)), pa.int32())
        return b.append_column("bucket", bucket)

    def _pairs(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["user_id", "ts", "event_id"])
        ts = g.ts.values.astype("datetime64[us]").astype("int64")
        # dense per-bucket ordinals, NOT raw ids: raw_id × span overflows
        # int64 for ids above ~3.5e6 at a 30-day span, silently unsorting
        # the key and garbage-ing the searchsorted windows
        uid = pd.factorize(g.user_id.to_numpy())[0].astype("int64")
        eid = g.event_id.to_numpy()
        t0 = ts - ts.min()
        span = int(t0.max()) + gap_us + 1
        # factorize fixes huge id VALUES but not huge per-bucket user
        # COUNTS: uid.max() * span silently wraps int64 (numpy does not
        # raise) above ~3.5M distinct users over a ~30-day span, unsorting
        # the searchsorted key space.  Fail loudly instead of corrupting;
        # the remedy at that scale is more buckets (num_buckets knob).
        if int(uid.max()) >= (2**63 - 1) // span:
            raise OverflowError(
                f"range-join bucket holds {int(uid.max()) + 1} distinct "
                f"users over a {span} us span — int64 key would overflow; "
                f"raise num_buckets (currently hashing user_id & "
                f"{num_buckets - 1})")
        key = uid * span + t0
        # strictly-later events of the same user within the gap:
        # (key_i, key_i + gap] in the sorted key space
        lo = np.searchsorted(key, key, side="right")
        hi = np.searchsorted(key, key + gap_us, side="right")
        n_i = hi - lo
        total = int(n_i.sum())
        if total == 0:
            return pd.DataFrame({"a_event_id": pd.Series([], dtype="int64"),
                                 "b_event_id": pd.Series([], dtype="int64"),
                                 "delta_us": pd.Series([], dtype="int64")})
        a_idx = np.repeat(np.arange(len(key)), n_i)
        cs = np.concatenate(([0], np.cumsum(n_i)))
        b_idx = np.arange(total) - np.repeat(cs[:-1], n_i) + np.repeat(lo, n_i)
        return pd.DataFrame({"a_event_id": eid[a_idx],
                             "b_event_id": eid[b_idx],
                             "delta_us": ts[b_idx] - ts[a_idx]})

    out = (ds.map_batches(_bucket, batch_format="pyarrow")
           .groupby("bucket").map_groups(_pairs, batch_format="pandas"))
    df = out.to_pandas().sort_values(["a_event_id", "b_event_id"])
    for c in df.columns:
        df[c] = df[c].astype("int64")
    return pa.Table.from_pandas(df.reset_index(drop=True), preserve_index=False)


# ---------------------------------------------------------------------------
# grouping sets: ROLLUP from one finest-grain aggregate

def q_rollup(sf_dir: str):
    """GROUP BY ROLLUP(l_returnflag, l_linestatus): ONE distributed
    finest-grain aggregate (per-batch partial combiner, same shape as
    ``q_groupby_agg``); the coarser grouping-set levels are re-aggregated
    from the tiny finest result on the driver — sums and counts are
    algebraic, so the rollup adds ZERO extra shuffles at any scale."""
    from ray.data.aggregate import Sum

    ds = T(sf_dir, "lineitem",
           columns=["l_returnflag", "l_linestatus", "l_quantity"])

    def _partial(b: pa.Table) -> pa.Table:
        df = b.to_pandas()
        g = (df.groupby(["l_returnflag", "l_linestatus"], as_index=False)
             .agg(sum_qty=("l_quantity", "sum"),
                  n_rows=("l_quantity", "size")))
        return pa.Table.from_pandas(g, preserve_index=False)

    fin = (ds.map_batches(_partial, batch_format="pyarrow")
           .groupby(["l_returnflag", "l_linestatus"])
           .aggregate(Sum("sum_qty", alias_name="sum_qty"),
                      Sum("n_rows", alias_name="n_rows"))
           .to_pandas())
    lvl1 = (fin.groupby("l_returnflag", as_index=False)
            .agg(sum_qty=("sum_qty", "sum"), n_rows=("n_rows", "sum")))
    lvl1["l_linestatus"] = "ALL"
    lvl0 = pd.DataFrame({"l_returnflag": ["ALL"], "l_linestatus": ["ALL"],
                         "sum_qty": [fin.sum_qty.sum()],
                         "n_rows": [fin.n_rows.sum()]})
    out = pd.concat([fin, lvl1, lvl0], ignore_index=True)
    out["sum_qty"] = out["sum_qty"].round(4)
    out["n_rows"] = out["n_rows"].astype("int64")
    out = out[["l_returnflag", "l_linestatus", "sum_qty", "n_rows"]]
    return pa.Table.from_pandas(
        out.sort_values(["l_returnflag", "l_linestatus"]).reset_index(drop=True),
        preserve_index=False)


# ---------------------------------------------------------------------------
# pivot (long → wide)

PIVOT_TYPES = ("click", "error", "purchase", "signup", "view")


def q_pivot_wide(sf_dir: str):
    """Pivot event_type long→wide per user: per-batch pandas pivot_table
    builds the partial conditional counts/sums (combiner), reindexed to the
    fixed type vocabulary so every partial has an identical schema, then a
    native grouped Sum — the shuffle moves one row per (user, batch), not
    one per event."""
    from ray.data.aggregate import Sum

    ds = T(sf_dir, "events", columns=["user_id", "event_type", "value"])
    n_cols = [f"n_{t}" for t in PIVOT_TYPES]

    def _partial(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            # pivot_table on an empty frame drops the "size"/"sum" column
            # level entirely (KeyError); Ray Data can emit empty blocks
            return pa.table(
                {"user_id": pa.array([], b.schema.field("user_id").type),
                 **{f"n_{t}": pa.array([], pa.int64()) for t in PIVOT_TYPES},
                 "click_value": pa.array([], pa.float64()),
                 "purchase_value": pa.array([], pa.float64())})
        df = b.to_pandas()
        # aggfunc "size" counts ROWS (the oracle's CASE WHEN ... THEN 1);
        # "count" would skip null values and diverge from SQL
        p = df.pivot_table(index="user_id", columns="event_type",
                           values="value", aggfunc=["size", "sum"],
                           fill_value=0.0)
        cnt = p["size"].reindex(columns=list(PIVOT_TYPES), fill_value=0)
        val = p["sum"].reindex(columns=list(PIVOT_TYPES), fill_value=0.0)
        out = pd.DataFrame({"user_id": p.index.to_numpy()})
        for t in PIVOT_TYPES:
            out[f"n_{t}"] = cnt[t].to_numpy().astype("int64")
        out["click_value"] = val["click"].to_numpy().astype("float64")
        out["purchase_value"] = val["purchase"].to_numpy().astype("float64")
        return pa.Table.from_pandas(out, preserve_index=False)

    aggs = [Sum(c, alias_name=c) for c in n_cols]
    aggs += [Sum("click_value", alias_name="click_value"),
             Sum("purchase_value", alias_name="purchase_value")]
    out = (ds.map_batches(_partial, batch_format="pyarrow")
           .groupby("user_id").aggregate(*aggs))
    df = out.to_pandas().sort_values("user_id").reset_index(drop=True)
    for c in n_cols:
        df[c] = df[c].astype("int64")
    for c in ("click_value", "purchase_value"):
        df[c] = df[c].round(4)
    return pa.Table.from_pandas(
        df[["user_id", *n_cols, "click_value", "purchase_value"]],
        preserve_index=False)


# ---------------------------------------------------------------------------
# sliding (hopping) window aggregate

def q_window_sliding(sf_dir: str):
    """1-hour windows hopping every 30 min (each event lands in exactly
    two windows): the window replication is a vectorized Arrow
    ``floor_temporal`` + duration shift inside ``map_batches`` — the
    dataset doubles BEFORE one grouped aggregate, no per-row Python and
    no second shuffle.  The streaming analogue of ``q_window_tumbling``
    for overlapping windows."""
    from ray.data.aggregate import Count, Sum

    ds = T(sf_dir, "events", columns=["user_id", "ts", "value"])
    half_hour = pa.scalar(30 * 60 * 1_000_000, type=pa.duration("us"))

    def _expand(b: pa.Table) -> pa.Table:
        b30 = pc.floor_temporal(b["ts"], multiple=30, unit="minute")
        one = pa.table({"user_id": b["user_id"], "window_start": b30,
                        "value": b["value"]})
        two = pa.table({"user_id": b["user_id"],
                        "window_start": pc.subtract(b30, half_hour),
                        "value": b["value"]})
        return pa.concat_tables([one, two])

    out = (ds.map_batches(_expand, batch_format="pyarrow")
           .groupby(["user_id", "window_start"])
           .aggregate(Count(alias_name="n_events"),
                      Sum("value", alias_name="sum_value")))
    df = out.to_pandas().sort_values(["user_id", "window_start"])
    df["n_events"] = df["n_events"].astype("int64")
    df["sum_value"] = df["sum_value"].round(4)
    return pa.Table.from_pandas(
        df[["user_id", "window_start", "n_events", "sum_value"]]
        .reset_index(drop=True), preserve_index=False)


# ---------------------------------------------------------------------------
# bloom-pruned hash join (the 100-TB large-large join pattern)

def q_bloom_join(sf_dir: str, num_buckets: int = 16):
    """lineitem ⋈ urgent orders with a Bloom pre-filter: the build side's
    keys go into a distributed Bloom filter (per-batch partials,
    OR-merged, broadcast once), the probe side drops non-matching rows
    BEFORE the bucketed exchange — the shuffle moves ~selectivity + FPR
    of the probe table instead of all of it.  The join itself re-checks
    keys, so false positives cost bandwidth, never correctness (exact
    DuckDB oracle)."""
    import ray

    from csvweb_ray.ops.sketch import bloom_prune, build_bloom

    od = T(sf_dir, "orders", columns=["o_orderkey", "o_orderpriority"])

    def _urgent(b: pa.Table) -> pa.Table:
        return b.filter(pc.equal(b["o_orderpriority"], "1-URGENT"))

    # materialize the (small) build side once: a lazy Dataset would
    # re-read and re-filter orders for count(), build_bloom AND the union
    # — two redundant full scans of the build side at corpus scale
    urgent = od.map_batches(_urgent, batch_format="pyarrow").materialize()
    bf = build_bloom(urgent, "o_orderkey",
                     expected_items=max(1, urgent.count()), fpr=0.01)
    bf_ref = ray.put(bf)

    li = T(sf_dir, "lineitem",
           columns=["l_orderkey", "l_extendedprice", "l_discount"])
    li = bloom_prune(li, "l_orderkey", bf_ref)

    def _mark(side, key):
        def fn(b: pa.Table) -> pa.Table:
            bucket = pc.cast(
                pc.bit_wise_and(b[key], pa.scalar(num_buckets - 1)), pa.int32())
            b = b.append_column("bucket", bucket)
            return b.append_column("side", pa.array([side] * b.num_rows,
                                                    type=pa.string()))
        return fn

    both = li.map_batches(_mark("l", "l_orderkey"), batch_format="pyarrow") \
        .union(urgent.map_batches(_mark("r", "o_orderkey"),
                                  batch_format="pyarrow"))

    def _join(g: pd.DataFrame) -> pd.DataFrame:
        lt = g[g["side"] == "l"].reindex(
            columns=["l_orderkey", "l_extendedprice", "l_discount"])
        rt = g[g["side"] == "r"].reindex(
            columns=["o_orderkey", "o_orderpriority"])
        m = lt.merge(rt, left_on="l_orderkey", right_on="o_orderkey")
        if m.empty:
            return pd.DataFrame({"o_orderpriority": [], "revenue": []})
        m["revenue"] = m.l_extendedprice * (1 - m.l_discount)
        return (m.groupby("o_orderpriority", as_index=False)
                .agg(revenue=("revenue", "sum")))

    from ray.data.aggregate import Sum

    out = (both.groupby("bucket").map_groups(_join, batch_format="pandas")
           .groupby("o_orderpriority")
           .aggregate(Sum("revenue", alias_name="revenue")))
    df = out.to_pandas().sort_values("o_orderpriority").reset_index(drop=True)
    df["revenue"] = df["revenue"].round(4)
    return pa.Table.from_pandas(df, preserve_index=False)


# ---------------------------------------------------------------------------
# vectorized regex extraction (string-function family)

def q_regex_extract(sf_dir: str):
    """Extract the numeric payload from the JSON-ish ``props`` column with
    ONE Arrow ``extract_regex`` kernel pass (no per-row Python, no JSON
    parser), filter, and aggregate per event type."""
    from ray.data.aggregate import Count, Sum

    ds = T(sf_dir, "events", columns=["event_type", "props"])

    def _extract(b: pa.Table) -> pa.Table:
        m = pc.extract_regex(pc.fill_null(b["props"], ""), r"(?P<k>[0-9]+)")
        k = pc.cast(pc.struct_field(m, "k"), pa.int64())
        t = pa.table({"event_type": b["event_type"], "k": k})
        return t.filter(pc.greater_equal(pc.fill_null(t["k"], -1), 50))

    out = (ds.map_batches(_extract, batch_format="pyarrow")
           .groupby("event_type")
           .aggregate(Count(alias_name="n_high"),
                      Sum("k", alias_name="sum_k")))
    df = out.to_pandas().sort_values("event_type").reset_index(drop=True)
    df["n_high"] = df["n_high"].astype("int64")
    df["sum_k"] = df["sum_k"].astype("int64")
    return pa.Table.from_pandas(df[["event_type", "n_high", "sum_k"]],
                                preserve_index=False)


# ---------------------------------------------------------------------------
# set operations (INTERSECT / EXCEPT re-expressed as one flag aggregation)

def q_set_ops(sf_dir: str):
    """Which users clicked, purchased, or both — SQL ``INTERSECT`` /
    ``EXCEPT`` on user sets, re-expressed so BOTH set operators come out
    of ONE pass over events: a per-batch distinct-flag combiner, then a
    single ``groupby(user_id)`` Max-flag aggregate (the only shuffle,
    and its row count is bounded by distinct flagged users, not events),
    then vectorized classification.  At 100 TB this beats two distinct
    pipelines + an anti join by a full exchange."""
    from ray.data.aggregate import Max

    ds = T(sf_dir, "events", columns=["user_id", "event_type"])

    def _flags(b: pa.Table) -> pa.Table:
        df = b.to_pandas()
        df = df[df.event_type.isin(["click", "purchase"])]
        df["is_click"] = (df.event_type == "click").astype("int64")
        df["is_purchase"] = (df.event_type == "purchase").astype("int64")
        g = (df.groupby("user_id", as_index=False)
             [["is_click", "is_purchase"]].max())
        return pa.Table.from_pandas(g, preserve_index=False)

    agg = (ds.map_batches(_flags, batch_format="pyarrow")
           .groupby("user_id")
           .aggregate(Max("is_click", alias_name="has_click"),
                      Max("is_purchase", alias_name="has_purchase")))
    df = agg.to_pandas()
    both = df.has_click.astype(bool) & df.has_purchase.astype(bool)
    seg = np.where(both, "both",
                   np.where(df.has_click.astype(bool), "click_only",
                            "purchase_only"))
    out = pd.DataFrame({"user_id": df.user_id.astype("int64"),
                        "segment": seg.astype(object)})
    return pa.Table.from_pandas(out.sort_values("user_id"),
                                preserve_index=False)


# ---------------------------------------------------------------------------
# quartile bucketing via exact distributed quantile thresholds (G31 composed)

def q_quartile_stats(sf_dir: str):
    """Per-group quartile buckets of extended price with count and sum —
    thresholds from `ops.selection.exact_group_quantiles` (EXACT, no
    group materialization), then ONE vectorized classify + combine pass
    and a tiny grouped aggregate.  Value-based bucketing (ties share a
    bucket) so the SQL twin is a deterministic CASE over
    ``quantile_cont`` thresholds — not positional NTILE, whose
    tie-splitting is row-order-dependent and unreproducible under
    distributed row order."""
    from ray.data.aggregate import Sum

    from csvweb_ray.ops.selection import exact_group_quantiles

    ds = T(sf_dir, "lineitem", columns=["l_returnflag", "l_extendedprice"])
    qt = exact_group_quantiles(ds, "l_returnflag", "l_extendedprice",
                               qs=(0.25, 0.5, 0.75)).to_pandas()
    thr = {g: sub.sort_values("q")["value"].to_numpy()
           for g, sub in qt.groupby("l_returnflag")}

    def _classify(b: pa.Table) -> pa.Table:
        df = b.to_pandas()
        v = df.l_extendedprice.to_numpy()
        g = df.l_returnflag.to_numpy()
        quart = np.ones(len(df), np.int64)
        for grp, t in thr.items():
            m = g == grp
            # bucket = 1 + #(thresholds < v): v == threshold stays below
            quart[m] = 1 + np.searchsorted(t, v[m], side="left").clip(0, 3)
        part = (pd.DataFrame({"l_returnflag": g, "quartile": quart,
                              "n": 1, "sum_price": v})
                .groupby(["l_returnflag", "quartile"], as_index=False)
                .agg(n=("n", "sum"), sum_price=("sum_price", "sum")))
        return pa.Table.from_pandas(part, preserve_index=False)

    out = (ds.map_batches(_classify, batch_format="pyarrow")
           .groupby(["l_returnflag", "quartile"])
           .aggregate(Sum("n", alias_name="n"),
                      Sum("sum_price", alias_name="sum_price")))
    df = out.to_pandas().sort_values(["l_returnflag", "quartile"])
    df["n"] = df["n"].astype("int64")
    df["quartile"] = df["quartile"].astype("int64")
    df["sum_price"] = df["sum_price"].round(4).astype("float64")
    return pa.Table.from_pandas(
        df[["l_returnflag", "quartile", "n", "sum_price"]].reset_index(
            drop=True), preserve_index=False)


# ---------------------------------------------------------------------------
# edit-distance similarity join (deletion neighborhoods, G34)

def q_editdist_join(sf_dir: str):
    """All document pairs whose 12-char lowercased text prefix is within
    edit distance 1 — `ops.dedup.edit_distance_pairs` (FastSS deletion
    neighborhoods: one flat-map signature pass, one groupby(sig)
    shuffle, in-group exact verification, pair-key dedup) against the
    O(n²) DuckDB `levenshtein` join oracle."""
    from csvweb_ray.ops.dedup import edit_distance_pairs

    ds = T(sf_dir, "documents", columns=["doc_id", "text"])
    pairs = edit_distance_pairs(ds, col="text", id_col="doc_id", key_len=12)
    df = pairs.to_pandas().sort_values(["a", "b"]).reset_index(drop=True)
    for c in ("a", "b", "dist"):
        df[c] = df[c].astype("int64")
    return pa.Table.from_pandas(df[["a", "b", "dist"]], preserve_index=False)


# ---------------------------------------------------------------------------
# TF-IDF top terms (G35)

def q_tfidf(sf_dir: str):
    """Top-5 TF-IDF terms per document — `ops.text.tfidf_top_terms`
    (distributed document-frequency combiner, one groupby(term), idf
    broadcast once, shuffle-free per-batch top-k) against the DuckDB
    window-function oracle.  score = tf·ln(N/df) rounded to 6 dp with a
    term tie-break, deterministic under any distributed row order."""
    from csvweb_ray.ops.text import tfidf_top_terms

    ds = T(sf_dir, "documents", columns=["doc_id", "text"])
    out = tfidf_top_terms(ds, top_k=5).to_pandas()
    out = out.sort_values(["doc_id", "term"]).reset_index(drop=True)
    out["doc_id"] = out["doc_id"].astype("int64")
    out["score"] = out["score"].astype("float64")
    return pa.Table.from_pandas(out[["doc_id", "term", "score"]],
                                preserve_index=False)


# ---------------------------------------------------------------------------
# exact-k deterministic sampling per stratum (G36)

def q_sample_topk(sf_dir: str):
    """Exactly 10 docs per language, reproducibly — the hash-order head
    (`ops.sampling.hash_topk_sample`): each batch forwards ≤k rows per
    stratum, one tiny per-stratum merge; selection is a pure function of
    (salt, doc_id set) so it is parallelism/resume-invariant and the
    DuckDB row_number-over-md5 twin is bit-exact."""
    from csvweb_ray.ops.sampling import hash_topk_sample

    ds = T(sf_dir, "documents", columns=["doc_id", "lang"])
    out = hash_topk_sample(ds, "doc_id", k=10, group_col="lang").to_pandas()
    out["doc_id"] = out["doc_id"].astype("int64")
    out["rn"] = out["rn"].astype("int64")
    return pa.Table.from_pandas(out[["lang", "rn", "doc_id"]],
                                preserve_index=False)
