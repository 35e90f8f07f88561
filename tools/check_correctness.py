# Dev harness (not part of the engine): local driver-sim comparing queries()
# vs oracle_sql() exactly; stricter than the driver (bitwise float compare).
"""Local driver-sim: run queries() vs oracle_sql() at a given sf dir,
compare row count / schema / exact values after sorting columns by name and
rows by all columns."""
import sys
import time

import duckdb
import numpy as np
import pandas as pd

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
ONLY = sys.argv[2].split(",") if len(sys.argv) > 2 else None

import ray

ray.init(address="local", num_cpus=8, include_dashboard=False,
         logging_level="ERROR")
import ray.data as rd

rd.DataContext.get_current().enable_progress_bars = False

sys.path.insert(0, "/root/repo")
import __ray_entry__ as E

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]
con = duckdb.connect()
for t in TABLES:
    try:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')")
    except Exception:
        pass

qs = E.queries()
oracles = E.oracle_sql()
results = {}
for name, fn in qs.items():
    if ONLY and name not in ONLY:
        continue
    t0 = time.time()
    try:
        res = fn(SF)
        if hasattr(res, "to_pandas"):
            try:
                df = res.to_pandas()
            except Exception:
                import pyarrow as pa
                df = pa.Table.from_batches(res.to_batches()).to_pandas()
        else:
            df = pd.DataFrame(res)
    except Exception as e:
        import traceback
        traceback.print_exc()
        results[name] = f"QUERY ERROR: {e}"
        continue
    dt = time.time() - t0
    if name not in oracles:
        results[name] = f"no_oracle rows={len(df)} ({dt:.1f}s)"
        continue
    try:
        odf = con.execute(oracles[name]).fetchdf()
    except Exception as e:
        results[name] = f"ORACLE ERROR: {e}"
        continue
    df = df[sorted(df.columns)]
    odf = odf[sorted(odf.columns)]
    ok_rows = len(df) == len(odf)
    ok_schema = list(df.columns) == list(odf.columns)
    msg = []
    if not ok_rows:
        msg.append(f"rows {len(df)} vs {len(odf)}")
    if not ok_schema:
        msg.append(f"cols {list(df.columns)} vs {list(odf.columns)}")
    ok_vals = False
    if ok_rows and ok_schema:
        a = df.sort_values(list(df.columns)).reset_index(drop=True)
        b = odf.sort_values(list(odf.columns)).reset_index(drop=True)
        ok_vals = True
        for c in a.columns:
            av, bv = a[c].to_numpy(), b[c].to_numpy()
            if av.dtype.kind == "f" or bv.dtype.kind == "f":
                av = av.astype(np.float64)
                bv = bv.astype(np.float64)
                if not np.array_equal(av, bv):
                    ok_vals = False
                    d = np.abs(av - bv)
                    msg.append(f"col {c}: maxdiff {np.nanmax(d):.3e} "
                               f"n_diff {(d != 0).sum()}")
            else:
                if not (av.astype(str) == bv.astype(str)).all():
                    ok_vals = False
                    bad = np.nonzero(av.astype(str) != bv.astype(str))[0][:3]
                    msg.append(f"col {c}: {len(bad)}+ diffs e.g. "
                               f"{[(av[i], bv[i]) for i in bad]}")
    status = "OK" if (ok_rows and ok_schema and ok_vals) else "FAIL"
    results[name] = f"{status} rows={len(df)} ({dt:.1f}s) " + "; ".join(msg)

for k, v in results.items():
    print(f"{k:28s} {v}")
ray.shutdown()
