#!/usr/bin/env python
import sys, time, hashlib
import numpy as np, pandas as pd, duckdb, ray
ray.init(address="local", num_cpus=8, include_dashboard=False, logging_level="ERROR")
from ray.data import DataContext
DataContext.get_current().enable_progress_bars = False

sys.path.insert(0, "/root/repo")
import __ray_entry__ as E

SF = "/root/testdata/sf0.01"
con = duckdb.connect()
for t in ["region","nation","customer","supplier","part","orders","lineitem","events","documents","embeddings"]:
    con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{SF}/{t}.parquet'")

def to_df(res):
    import pyarrow as pa
    if isinstance(res, pa.Table):
        return res.to_pandas()
    if isinstance(res, pd.DataFrame):
        return res
    return res.to_pandas()

def canon(df):
    """Driver-style canon: sort columns by name, stringify EVERY value, sort rows.

    The driver hashes stringified values, so an engine int64 147 vs an
    oracle HUGEINT->float64 147.0 is a hash mismatch even though the
    values are numerically equal. Stringifying here catches that class
    locally (VERDICT r02 item #1).
    """
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        df[c] = df[c].astype(str)
    return df.sort_values(list(df.columns), kind="stable").reset_index(drop=True)

qs = E.queries()
oracles = E.oracle_sql()
only = sys.argv[1:] or list(qs)
fails = []
for name in only:
    fn = qs[name]
    t0 = time.time()
    try:
        mine = canon(to_df(fn(SF)))
    except Exception as ex:
        print(f"{name}: RAY ERROR {type(ex).__name__}: {ex}")
        fails.append(name); continue
    dt_ray = time.time() - t0
    if name not in oracles:
        print(f"{name}: rows-only {len(mine)} rows  ({dt_ray:.1f}s)")
        continue
    try:
        want = canon(con.sql(oracles[name]).df())
    except Exception as ex:
        print(f"{name}: SQL ERROR {ex}")
        fails.append(name); continue
    ok_rows = len(mine) == len(want)
    ok_cols = list(mine.columns) == list(want.columns)
    ok_vals = False
    if ok_rows and ok_cols:
        try:
            pd.testing.assert_frame_equal(mine, want, check_dtype=False, check_exact=True)
            ok_vals = True
        except AssertionError as ex:
            ok_vals = False
            msg = str(ex).split("\n")[0]
    status = "OK " if (ok_rows and ok_cols and ok_vals) else "FAIL"
    if status == "FAIL":
        fails.append(name)
        print(f"{name}: {status} rows {len(mine)}/{len(want)} cols {list(mine.columns)} vs {list(want.columns)}")
        if ok_rows and ok_cols:
            print("   value diff:", msg)
            print(mine.head(3)); print(want.head(3))
    else:
        print(f"{name}: OK {len(mine)} rows  ({dt_ray:.1f}s)")
print("FAILS:", fails)
ray.shutdown()
