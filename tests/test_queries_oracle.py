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
               "regex_extract"]


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
        assert a == b, f"{name}.{c}: first diff at " + str(next(
            (i, x, y) for i, (x, y) in enumerate(zip(a, b)) if x != y))


def test_range_join_nonzero(ray_session, duck):
    """The interval join must compare real rows at this scale (guard
    against a vacuous 0-row green)."""
    import __ray_entry__ as em

    n = len(em.queries()["range_join"](SF_DIR).to_pandas())
    assert n > 0


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
