#!/usr/bin/env python
"""Local stand-in for the driver's correctness gate: runs every
``queries()`` entry and its ``oracle_sql()`` twin over the same sf dir,
compares row count, sorted column names, and values (columns sorted by
name, rows sorted by all columns — the driver's hash-compare semantics).

Usage: python tools/oracle_check.py [sf_dir] [query ...]
Owns its Ray session (dev tool, like bench/CLI/tests).
"""

from __future__ import annotations

import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def _canon(df):
    import pandas as pd

    if hasattr(df, "to_pandas"):
        df = df.to_pandas()
    df = df[sorted(df.columns)]
    if len(df):
        df = df.sort_values(list(df.columns), kind="mergesort")
    return df.reset_index(drop=True)


def _dtype_kind(dt) -> str:
    """Collapse a pandas dtype to the kind the driver's value-hash is
    sensitive to: int vs float vs bool vs datetime vs everything-else.
    Value-equal frames with different kinds (int64 5 vs float64 5.0 —
    the pivot_wide lesson) hash differently at the driver."""
    s = str(dt)
    if s.startswith("datetime64"):
        return "datetime"
    k = getattr(dt, "kind", "O")
    return {"i": "int", "u": "int", "f": "float", "b": "bool",
            "M": "datetime"}.get(k, "object")


def _dtypes_match(a, b) -> list:
    """Columns whose dtype KIND differs between engine and oracle."""
    return [f"{c}: {a[c].dtype} vs {b[c].dtype}"
            for c in a.columns
            if _dtype_kind(a[c].dtype) != _dtype_kind(b[c].dtype)]


def _values_equal(a, b) -> bool:
    import numpy as np

    if a.shape != b.shape or list(a.columns) != list(b.columns):
        return False
    for c in a.columns:
        av, bv = a[c].to_numpy(), b[c].to_numpy()
        try:
            if np.array_equal(av, bv):
                continue
            ok = np.allclose(av.astype("float64"), bv.astype("float64"),
                             rtol=0, atol=0, equal_nan=True)
        except (TypeError, ValueError):
            ok = all(x == y for x, y in zip(av.tolist(), bv.tolist()))
        if not ok:
            return False
    return True


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import duckdb
    import ray

    ray.init(address="local", num_cpus=int(os.environ.get("RAY_GRAFT_CPUS", 8)),
             include_dashboard=False, ignore_reinit_error=True,
             logging_level="ERROR")
    import __ray_entry__ as em

    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")

    qs, sqls = em.queries(), em.oracle_sql()
    failures = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        try:
            mine = _canon(fn(sf_dir))
        except Exception as e:  # noqa: BLE001
            print(f"{name:24s} ERROR running query: {e!r}")
            failures += 1
            continue
        if name not in sqls:
            dts = ",".join(f"{c}:{_dtype_kind(mine[c].dtype)}"
                           for c in mine.columns)
            print(f"{name:24s} rows={len(mine):6d}  (no_oracle)  [{dts}]")
            continue
        oracle = _canon(con.execute(sqls[name]).df())
        rows_ok = len(mine) == len(oracle)
        schema_ok = list(mine.columns) == list(oracle.columns)
        dtype_bad = _dtypes_match(mine, oracle) if schema_ok else []
        vals_ok = rows_ok and schema_ok and _values_equal(mine, oracle)
        status = "OK" if (rows_ok and schema_ok and vals_ok
                          and not dtype_bad) else "FAIL"
        if status == "FAIL":
            failures += 1
        print(f"{name:24s} rows={len(mine):6d}/{len(oracle):6d} "
              f"schema={'Y' if schema_ok else 'N'} "
              f"dtypes={'Y' if not dtype_bad else 'N'} "
              f"values={'Y' if vals_ok else 'N'}  {status}")
        for d in dtype_bad:
            print(f"  dtype-kind mismatch (driver-hash red even on equal "
                  f"values): {d}")
        if status == "FAIL" and len(mine) and len(oracle):
            print("  mine:  ", mine.head(3).to_dict("records"))
            print("  oracle:", oracle.head(3).to_dict("records"))
    ray.shutdown()
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
