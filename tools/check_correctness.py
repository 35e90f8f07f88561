# Dev harness (not part of the engine): local driver-sim comparing queries()
# vs oracle_sql() exactly; stricter than the driver (bitwise float compare).
"""Local driver-sim: run queries() vs oracle_sql() at a given sf dir,
compare row count / schema / exact values after sorting columns by name and
rows by all columns.

Usage: check_correctness.py [SF_DIR | --planted] [only1,only2] [--json OUT]
  --planted  build the planted-duplicate corpus (tools/planted_corpus.py —
             exact dups + containment pairs the shipped testdata lacks) and
             run against it, so exact_dup_groups / substring_pairs are
             exercised at > 0 rows instead of passing vacuously.
  --json OUT additionally write structured per-query results to OUT.
"""
import json
import os
import sys
import time

import duckdb
import numpy as np
import pandas as pd

args = [a for a in sys.argv[1:]]
JSON_OUT = None
if "--json" in args:
    i = args.index("--json")
    JSON_OUT = args[i + 1]
    del args[i:i + 2]
if args and args[0] == "--planted":
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from planted_corpus import build_planted
    SF = build_planted()
    args = args[1:]
else:
    SF = args[0] if args else "/root/testdata/sf0.01"
    args = args[1:]
ONLY = args[0].split(",") if args else None

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
records = {}
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
        records[name] = {"status": "query_error", "err": str(e)}
        continue
    dt = time.time() - t0
    if name not in oracles:
        results[name] = f"no_oracle rows={len(df)} ({dt:.1f}s)"
        records[name] = {"status": "no_oracle", "rows": len(df)}
        continue
    try:
        odf = con.execute(oracles[name]).fetchdf()
    except Exception as e:
        results[name] = f"ORACLE ERROR: {e}"
        records[name] = {"status": "oracle_error", "err": str(e)}
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
    records[name] = {"status": status.lower(), "rows": len(df),
                     "oracle_rows": len(odf), "rows_match": ok_rows,
                     "schema_match": ok_schema, "values_match": ok_vals,
                     "secs": round(dt, 1), "detail": "; ".join(msg)}

for k, v in results.items():
    print(f"{k:28s} {v}")
if JSON_OUT:
    with open(JSON_OUT, "w") as f:
        json.dump({"sf_dir": SF, "results": records}, f, indent=2)
    print(f"wrote {JSON_OUT}")
ray.shutdown()
