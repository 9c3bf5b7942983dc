"""Local stand-in for the driver's correctness gate: run every queries()
entry and its oracle_sql() twin on the same sf dir, compare row count, column
names and (order-insensitively) values.

Usage: python tools/check_oracle.py [sf_dir] [query ...]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb
import pandas as pd

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def to_pandas(obj):
    import pyarrow as pa

    if isinstance(obj, pd.DataFrame):
        return obj
    if isinstance(obj, pa.Table):
        return obj.to_pandas()
    return obj.to_pandas()  # ray Dataset


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
    return df.sort_values(list(df.columns), ignore_index=True)


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=8, include_dashboard=False, logging_level="ERROR")
    import ray.data

    ray.data.DataContext.get_current().enable_progress_bars = False

    import __ray_entry__ as entrymod

    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")

    qs = entrymod.queries()
    sqls = entrymod.oracle_sql()
    failures = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        try:
            got = normalize(to_pandas(fn(sf_dir)))
        except Exception as ex:
            print(f"FAIL {name}: ray side raised {type(ex).__name__}: {ex}")
            failures.append(name)
            continue
        if name not in sqls:
            print(f"OK?  {name}: rows={len(got)} (no oracle; rows-only check)")
            continue
        try:
            exp = normalize(con.sql(sqls[name]).df())
        except Exception as ex:
            print(f"FAIL {name}: oracle SQL raised {type(ex).__name__}: {ex}")
            failures.append(name)
            continue
        if list(got.columns) != list(exp.columns):
            print(f"FAIL {name}: columns {list(got.columns)} != {list(exp.columns)}")
            failures.append(name)
            continue
        if len(got) != len(exp):
            print(f"FAIL {name}: rows {len(got)} != {len(exp)}")
            failures.append(name)
            continue
        # value compare with float tolerance
        bad = None
        for c in got.columns:
            g, e = got[c], exp[c]
            if g.dtype.kind == "f" or e.dtype.kind == "f":
                import numpy as np

                if not np.allclose(g.astype(float), e.astype(float), atol=1e-9, rtol=0, equal_nan=True):
                    bad = c
                    break
            else:
                if not (g.astype(str).values == e.astype(str).values).all():
                    bad = c
                    break
        if bad:
            mism = (got[bad].astype(str).values != exp[bad].astype(str).values)
            import numpy as np

            i = int(np.argmax(mism)) if mism.any() else 0
            print(f"FAIL {name}: column {bad} differs; first at row {i}: got={got[bad].iloc[i]} exp={exp[bad].iloc[i]}")
            failures.append(name)
        else:
            print(f"PASS {name}: rows={len(got)} cols={list(got.columns)}")
    ray.shutdown()
    if failures:
        print("FAILURES:", failures)
        sys.exit(1)
    print("ALL PASS")


if __name__ == "__main__":
    main()
