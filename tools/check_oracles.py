"""Local replica of the driver's correctness gate: run every queries()
entry at a given sf dir; compare SQL-oracled ones against DuckDB
(row count, sorted-column value equality); report rows-only counts for
the rest. Usage: python tools/check_oracles.py [sf_dir] [name ...]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb
import pandas as pd

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def to_df(result) -> pd.DataFrame:
    import pyarrow as pa

    try:
        import ray.data

        if isinstance(result, ray.data.Dataset):
            return result.to_pandas()
    except ImportError:
        pass
    if isinstance(result, pa.Table):
        return result.to_pandas()
    return pd.DataFrame(result)


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)]
    return df.sort_values(list(df.columns)).reset_index(drop=True)


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])
    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=8, include_dashboard=False)
    import __ray_entry__ as e

    qs = e.queries()
    oracles = e.oracle_sql(sf_dir)  # scale-keyed span-truth paths
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    failures = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            got = to_df(fn(sf_dir))
        except Exception as ex:
            print(f"FAIL  {name}: raised {type(ex).__name__}: {ex}")
            failures += 1
            continue
        dt = time.time() - t0
        if name not in oracles:
            print(f"rows  {name}: {len(got)} rows, cols={list(got.columns)} [{dt:.1f}s]")
            continue
        want = con.execute(oracles[name]).df()
        g, w = canon(got), canon(want)
        if list(g.columns) != list(w.columns):
            print(f"FAIL  {name}: columns {list(g.columns)} != {list(w.columns)}")
            failures += 1
            continue
        if len(g) != len(w):
            print(f"FAIL  {name}: rows {len(g)} != {len(w)}")
            failures += 1
            continue
        eq = True
        for c in g.columns:
            a, b = g[c], w[c]
            if a.dtype != b.dtype:
                # Driver's value hash is dtype-sensitive (round-1 lesson):
                # a float64 oracle vs int64 pipeline is a hash FAIL even
                # when every value is numerically equal. No coercion here.
                print(f"FAIL  {name}: column {c} dtype {a.dtype} != oracle {b.dtype}")
                eq = False
                continue
            if not a.equals(b):
                neq = (a != b) & ~(a.isna() & b.isna())
                print(f"FAIL  {name}: column {c} differs in {neq.sum()} rows; e.g.\n"
                      f"{pd.DataFrame({'got': a[neq].head(3), 'want': b[neq].head(3)})}")
                eq = False
        if eq:
            print(f"OK    {name}: {len(g)} rows exact [{dt:.1f}s]")
        else:
            failures += 1
    ray.shutdown()
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
