"""Per-commit DuckDB oracle gate for the round-4 query additions.

Mirrors the driver's compare (columns sorted by name, rows sorted by all
columns, exact values) at sf0.001 — the full set runs via
``tools/oracle_check.py`` at sf0.01.
"""

from __future__ import annotations

import os

import pytest

SF_DIR = "/root/testdata/sf0.001"
TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

pytestmark = pytest.mark.skipif(
    not os.path.isdir(SF_DIR), reason="driver testdata absent")


@pytest.fixture(scope="module")
def duck():
    import duckdb

    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(SF_DIR, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    yield con
    con.close()


def _canon(df):
    if hasattr(df, "to_pandas"):
        df = df.to_pandas()
    df = df[sorted(df.columns)]
    if len(df):
        df = df.sort_values(list(df.columns), kind="mergesort")
    return df.reset_index(drop=True)


NEW_QUERIES = ["semi_join", "anti_join", "range_join", "rollup",
               "pivot_wide", "kg_triples", "stratified_sample", "top_ngrams",
               "ann_topk_ivf_full", "window_sliding", "bloom_join",
               "regex_extract", "audio_features", "video_frames",
               "window_analytics", "image_decode", "set_ops",
               "quartile_stats", "editdist_join", "tfidf", "sample_topk"]


@pytest.mark.parametrize("name", NEW_QUERIES)
def test_query_matches_oracle(ray_session, duck, name):
    import __ray_entry__ as em

    mine = _canon(em.queries()[name](SF_DIR))
    oracle = _canon(duck.execute(em.oracle_sql()[name]).df())
    assert list(mine.columns) == list(oracle.columns)
    assert len(mine) == len(oracle)
    for c in mine.columns:
        # dtype-KIND parity, not just value parity: the driver's value-hash
        # coalesces integer widths (int32 5 ≡ int64 5) but NOT int vs float
        # (int64 5 vs HUGEINT→float64 5.0 hash differently — the pivot_wide
        # red of round 4, which this gate passed because 5 == 5.0).  Same
        # numeric family ⇒ the driver hash cannot diverge on equal values.
        kind = lambda d: "i" if d.kind in "iu" else d.kind  # noqa: E731
        assert kind(mine[c].dtype) == kind(oracle[c].dtype), (
            f"{name}.{c}: engine dtype {mine[c].dtype} vs oracle dtype "
            f"{oracle[c].dtype} — values may compare equal but the driver "
            f"value-hash will diverge")
        a, b = mine[c].tolist(), oracle[c].tolist()

        def _eq(x, y):
            # NaN/None compare equal to themselves (LAG's first-row NULL):
            # the driver's value-hash sees identical bytes for them
            if x is None or y is None or (isinstance(x, float) and x != x):
                return (x is None or x != x) and (y is None or y != y)
            return x == y

        assert all(_eq(x, y) for x, y in zip(a, b)), (
            f"{name}.{c}: first diff at " + str(next(
                (i, x, y) for i, (x, y) in enumerate(zip(a, b))
                if not _eq(x, y))))


def test_range_join_nonzero(ray_session, duck):
    """The interval join must compare real rows at this scale (guard
    against a vacuous 0-row green)."""
    import __ray_entry__ as em

    n = len(em.queries()["range_join"](SF_DIR).to_pandas())
    assert n > 0


def test_auto_num_buckets():
    """Bucket-count knob: power of two, clamped, grows with the input."""
    from csvweb_ray.queries import auto_num_buckets

    assert auto_num_buckets(0) == 16
    assert auto_num_buckets(10_000) == 16          # lo clamp at bench scale
    assert auto_num_buckets(50_000_000) == 64       # ceil(50) → next pow2
    assert auto_num_buckets(10**12) == 1 << 14      # hi clamp
    prev = 0
    for n in (1, 10**6, 10**8, 10**10, 10**12):
        b = auto_num_buckets(n)
        assert b & (b - 1) == 0, "mask arithmetic needs a power of two"
        assert b >= prev, "monotone in the input size"
        prev = b


def _hot_user_events(tmp_path):
    """One user owns ~80% of all events — the adversarial skew case the
    bucketed queries' docstrings bound: the hot user co-locates in ONE
    bucket and that bucket's work is lower-bounded by the hot user."""
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq

    rng = np.random.RandomState(11)
    rows, eid = [], 0
    t0 = pd.Timestamp("2024-03-01")
    # hot user 7: 800 events in bursts (2-min steps) with occasional
    # >30-min gaps, so sessions split and 5-min range pairs exist
    t = t0
    for i in range(800):
        t = t + pd.Timedelta(minutes=45 if i % 50 == 49 else 2)
        rows.append({"event_id": eid, "user_id": 7, "ts": t})
        eid += 1
    for u in range(100, 120):  # 20 cold users, 10 events each
        t = t0 + pd.Timedelta(minutes=int(rng.randint(0, 60)))
        for _ in range(10):
            t = t + pd.Timedelta(minutes=int(rng.randint(1, 50)))
            rows.append({"event_id": eid, "user_id": u, "ts": t})
            eid += 1
    df = pd.DataFrame(rows)
    pq.write_table(pa.Table.from_pandas(df, preserve_index=False),
                   str(tmp_path / "events.parquet"))
    return df


def test_sessionize_hot_user_skew(ray_session, tmp_path):
    from csvweb_ray.queries import q_sessionize

    df = _hot_user_events(tmp_path)

    def twin(g):
        g = g.sort_values(["ts", "event_id"])
        sid = (g.ts.diff() > pd.Timedelta(minutes=30)).cumsum()
        out = g.groupby(sid).agg(n_events=("event_id", "size"),
                                 t_start=("ts", "min"), t_end=("ts", "max"))
        out["session_id"] = range(len(out))
        return out

    import pandas as pd

    expect = (df.groupby("user_id", group_keys=True).apply(twin)
              .reset_index(level=0).reset_index(drop=True)
              .sort_values(["user_id", "session_id"]).reset_index(drop=True))

    results = []
    for nb in (4, 64):  # hot bucket alone vs diluted — output invariant
        got = (q_sessionize(str(tmp_path), num_buckets=nb).to_pandas()
               .sort_values(["user_id", "session_id"])
               .reset_index(drop=True))
        assert got.n_events.tolist() == expect.n_events.tolist()
        assert got.t_start.tolist() == expect.t_start.tolist()
        assert got.t_end.tolist() == expect.t_end.tolist()
        results.append(got)
    assert results[0].equals(results[1])
    # the hot user really is skewed: one session stream holds most rows
    assert int(expect[expect.user_id == 7].n_events.sum()) == 800


def test_range_join_hot_user_skew(ray_session, tmp_path):
    import pandas as pd

    from csvweb_ray.queries import q_range_join

    df = _hot_user_events(tmp_path)
    m = df.merge(df, on="user_id", suffixes=("_a", "_b"))
    m = m[(m.ts_b > m.ts_a) & (m.ts_b <= m.ts_a + pd.Timedelta(minutes=5))]
    expect = m.sort_values(["event_id_a", "event_id_b"])

    for nb in (4, 64):
        got = q_range_join(str(tmp_path), num_buckets=nb).to_pandas()
        assert len(got) == len(expect) > 0
        assert got.a_event_id.tolist() == expect.event_id_a.tolist()
        assert got.b_event_id.tolist() == expect.event_id_b.tolist()


def test_range_join_huge_user_ids(ray_session, tmp_path):
    """Snowflake-scale user ids must not overflow the interval-join key
    encoding (raw_id x span exceeded int64 and silently unsorted the
    searchsorted key space)."""
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq

    from csvweb_ray.queries import q_range_join

    rng = np.random.RandomState(3)
    base = 10**18
    rows = []
    eid = 0
    for u in (base + 1, base + 7_000_003, 4_000_000_017):
        t = pd.Timestamp("2024-01-01")
        for _ in range(40):
            t = t + pd.Timedelta(seconds=int(rng.randint(10, 600)))
            rows.append({"event_id": eid, "user_id": u, "ts": t})
            eid += 1
    df = pd.DataFrame(rows)
    pq.write_table(pa.Table.from_pandas(df, preserve_index=False),
                   str(tmp_path / "events.parquet"))

    got = q_range_join(str(tmp_path)).to_pandas()

    m = df.merge(df, on="user_id", suffixes=("_a", "_b"))
    m = m[(m.ts_b > m.ts_a)
          & (m.ts_b <= m.ts_a + pd.Timedelta(minutes=5))]
    expect = m.sort_values(["event_id_a", "event_id_b"])
    assert len(got) == len(expect) > 0
    assert got.a_event_id.tolist() == expect.event_id_a.tolist()
    assert got.b_event_id.tolist() == expect.event_id_b.tolist()
