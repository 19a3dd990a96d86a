"""exact_group_quantiles — distributed exact per-group percentiles.

The contract under test: bit-exact agreement with ``np.percentile``
(linear interpolation, the DuckDB ``quantile_cont`` convention) on the
materialized data, through every code path — small-group direct gather,
multi-round histogram refinement, the duplicate-run exact-resolution
terminator, and null exclusion.
"""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest


def _run(df, qs=(0.5, 0.95), **kw):
    import ray.data as rd

    from csvweb_ray.ops.selection import exact_group_quantiles

    ds = rd.from_arrow(pa.Table.from_pandas(df, preserve_index=False)) \
        .repartition(7)
    out = exact_group_quantiles(ds, "g", "v", qs=qs, **kw).to_pandas()
    return {(r.g, r.q): r.value for r in out.itertuples()}


def _expect(df, qs=(0.5, 0.95)):
    exp = {}
    for g, sub in df.dropna().groupby("g"):
        for q in qs:
            exp[(g, q)] = float(np.percentile(sub["v"], q * 100))
    return exp


def _check(got, exp):
    assert set(got) == set(exp)
    for k in exp:
        assert got[k] == pytest.approx(exp[k], rel=0, abs=1e-9), (
            k, got[k], exp[k])


def test_matches_np_percentile_refinement_path(ray_session):
    rng = np.random.RandomState(5)
    df = pd.DataFrame({
        "g": rng.choice(["A", "N", "R"], 60000),
        "v": np.round(rng.lognormal(7, 1.5, 60000), 2)})
    # gather_threshold far below group sizes forces ≥1 refinement round
    got = _run(df, gather_threshold=256, bins=64)
    _check(got, _expect(df))


def test_matches_np_percentile_direct_gather(ray_session):
    rng = np.random.RandomState(6)
    df = pd.DataFrame({"g": rng.choice(["x", "y"], 500),
                       "v": rng.uniform(-10, 10, 500)})
    got = _run(df)  # n << default gather_threshold: no refinement rounds
    _check(got, _expect(df))


def test_duplicate_runs_straddling_the_rank(ray_session):
    # two huge runs of equal values around the median rank: the candidate
    # count can never fall below the gather threshold, so termination must
    # come from the exact-resolution path (every non-empty bucket is a
    # single distinct value)
    df = pd.DataFrame({"g": ["d"] * 10000,
                       "v": [1.0] * 5000 + [2.0] * 5000})
    got = _run(df, qs=(0.5,), gather_threshold=10, bins=4)
    assert got[("d", 0.5)] == pytest.approx(1.5)


def test_constant_group_and_extreme_qs(ray_session):
    df = pd.DataFrame({"g": ["c"] * 1000 + ["s"],
                       "v": [7.25] * 1000 + [3.0]})
    got = _run(df, qs=(0.0, 0.5, 1.0), gather_threshold=8, bins=4)
    for q in (0.0, 0.5, 1.0):
        assert got[("c", q)] == 7.25
        assert got[("s", q)] == 3.0


def test_nulls_excluded_like_sql(ray_session):
    rng = np.random.RandomState(7)
    v = rng.uniform(0, 100, 2000)
    v[::5] = np.nan
    df = pd.DataFrame({"g": ["n"] * 2000, "v": v})
    got = _run(df, qs=(0.5,), gather_threshold=64, bins=16)
    exp = float(np.percentile(v[~np.isnan(v)], 50))
    assert got[("n", 0.5)] == pytest.approx(exp, abs=1e-9)


def test_integer_heavy_ties(ray_session):
    # many ties at few distinct values, ranks landing on and between ties
    rng = np.random.RandomState(8)
    df = pd.DataFrame({"g": rng.choice(["p", "q"], 30000),
                       "v": rng.choice([1.0, 2.0, 2.0, 3.0, 10.0], 30000)})
    got = _run(df, qs=(0.25, 0.5, 0.9), gather_threshold=32, bins=8)
    _check(got, _expect(df, qs=(0.25, 0.5, 0.9)))


def test_query_matches_duckdb_quantile_cont(ray_session, tmp_path):
    import duckdb

    from csvweb_ray.queries import q_quantiles

    sf = "/root/testdata/sf0.001"
    got = q_quantiles(sf).to_pandas()
    exp = duckdb.sql(f"""
        SELECT l_returnflag,
               round(quantile_cont(l_extendedprice, 0.50), 4) AS p50,
               round(quantile_cont(l_extendedprice, 0.95), 4) AS p95
        FROM read_parquet('{sf}/lineitem.parquet')
        GROUP BY l_returnflag ORDER BY l_returnflag""").df()
    pd.testing.assert_frame_equal(got.reset_index(drop=True), exp,
                                  check_dtype=True)
