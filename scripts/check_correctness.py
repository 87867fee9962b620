"""Driver-simulation: run every queries() entry at sf0.01 and compare
with oracle_sql() via DuckDB (row count, column names, order-insensitive
value hash).  Usage: python scripts/check_correctness.py [sf_dir]
"""

from __future__ import annotations

import sys

import duckdb
import pandas as pd


def to_pandas(res) -> pd.DataFrame:
    import pyarrow as pa

    if isinstance(res, pd.DataFrame):
        return res
    if isinstance(res, pa.Table):
        return res.to_pandas()
    return res.to_pandas()  # ray Dataset


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)]
    df = df.sort_values(by=list(df.columns)).reset_index(drop=True)
    return df


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=8, include_dashboard=False,
                 logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    sys.path.insert(0, "/root/repo")
    import __ray_entry__ as e

    con = duckdb.connect()
    for t in ["region", "nation", "customer", "supplier", "part", "orders",
              "lineitem", "events", "documents", "embeddings"]:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    qs, oracles = e.queries(), e.oracle_sql()
    failures = 0
    for name, fn in qs.items():
        got = canon(to_pandas(fn(sf_dir)))
        if name not in oracles:
            print(f"{name:32s} rows={len(got):7d}  (rows-only check)")
            continue
        want = canon(con.sql(oracles[name]).df())
        ok_rows = len(got) == len(want)
        ok_cols = list(got.columns) == list(want.columns)
        ok_vals = False
        if ok_rows and ok_cols:
            try:
                pd.testing.assert_frame_equal(got, want, check_dtype=False,
                                              check_exact=False, rtol=1e-9)
                ok_vals = True
            except AssertionError as ex:
                print(ex)
        status = "OK" if (ok_rows and ok_cols and ok_vals) else "FAIL"
        if status == "FAIL":
            failures += 1
            print(f"{name:32s} {status} rows {len(got)}/{len(want)} "
                  f"cols {list(got.columns)} vs {list(want.columns)}")
        else:
            print(f"{name:32s} {status} rows={len(got)}")
    ray.shutdown()
    return failures


if __name__ == "__main__":
    raise SystemExit(main())
