"""Driver-sim with a TYPE-TAGGED value hash: STRICTER than the driver
(which canonicalizes via pandas dtypes) — sorts rows by all columns,
requires exact Arrow types AND exact values. 51/51 green here implies
driver hash-green under any dtype-faithful canonicalization.

Usage: hashsim.py [SF_DIR] [query1,query2|-] [OUT.json]
"""
import os, sys, json, hashlib
import duckdb, numpy as np, pandas as pd, pyarrow as pa
import ray
ray.init(address="local", num_cpus=8, include_dashboard=False, logging_level="ERROR")
import ray.data as rd
ctx = rd.DataContext.get_current()
ctx.enable_progress_bars = False
sys.path.insert(0, "/root/repo")
import __ray_entry__ as E

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
names = (sys.argv[2].split(",") if sys.argv[2] != "-" else None) if len(sys.argv) > 2 else None
con = duckdb.connect()
for t in ["region","nation","customer","supplier","part","orders","lineitem","events","documents","embeddings"]:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')")

def canon(tbl):
    tbl = tbl.select(sorted(tbl.column_names))
    if tbl.num_rows:
        tbl = tbl.sort_by([(c, "ascending") for c in tbl.column_names])
    return tbl.combine_chunks()

def typed_hash(tbl):
    h = hashlib.sha256()
    # metadata-stripped type string: pandas-conversion metadata on one
    # side must not fail equal-typed equal-valued tables
    h.update(";".join(f"{f.name}:{f.type}" for f in tbl.schema).encode())
    for c in tbl.column_names:
        h.update(str(tbl.column(c).to_pylist()).encode())
    return h.hexdigest()

qs = E.queries(); oracles = E.oracle_sql()
out = {}
for name, fn in qs.items():
    if names and name not in names: continue
    try:
        res = fn(SF)
        if isinstance(res, pa.Table):
            t = res
        elif hasattr(res, "iter_batches"):
            bs = [b for b in res.iter_batches(batch_format="pyarrow", batch_size=1<<20) if b.num_rows]
            t = pa.concat_tables(bs) if bs else None
        else:
            t = pa.Table.from_pandas(pd.DataFrame(res))
    except Exception as e:
        out[name] = {"err": repr(e)[:200]}; print(name, "QUERY ERR", e); continue
    if name not in oracles:
        out[name] = {"status": "no_oracle", "rows": t.num_rows if t is not None else 0}; continue
    try:
        ot = con.execute(oracles[name]).fetch_arrow_table()
    except Exception as e:
        out[name] = {"err": "oracle: "+repr(e)[:200]}; print(name, "ORACLE ERR", e); continue
    if t is None:
        t = ot.schema.empty_table()
    ct, cot = canon(t), canon(ot)
    sm = ct.schema.equals(cot.schema)
    hm = sm and ct.num_rows == cot.num_rows and typed_hash(ct) == typed_hash(cot)
    out[name] = {"rows": ct.num_rows, "oracle_rows": cot.num_rows,
                 "schema_typed": sm, "hash": hm}
    if not sm:
        out[name]["engine_schema"] = str(ct.schema).replace("\n", ", ")
        out[name]["oracle_schema"] = str(cot.schema).replace("\n", ", ")
ray.shutdown()
for k, v in out.items():
    print(f"{k:28s} {v}")
nb = [k for k, v in out.items() if not v.get("hash") and "status" not in v]
print("NOT GREEN:", nb)
if len(sys.argv) > 3:
    json.dump(out, open(sys.argv[3], "w"), indent=1)
