"""Pre-flight for the driver contract: every queries() entry runs; every
oracle_sql() entry matches on row count + sorted-column value equality
(mimicking the driver's order-insensitive compare) at sf0.001."""

import math

import duckdb
import numpy as np
import pandas as pd
import pytest

import __ray_entry__ as entrymod

SF_DIR = "/root/testdata/sf0.001"
TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def _to_pandas(res):
    import pyarrow as pa
    import ray.data
    if isinstance(res, ray.data.Dataset):
        return res.to_pandas()
    if isinstance(res, pa.Table):
        return res.to_pandas()
    return res


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    df = df.sort_values(list(df.columns)).reset_index(drop=True)
    for c in df.columns:
        if df[c].dtype == object and len(df) and isinstance(df[c].iloc[0], bytes):
            df[c] = df[c].map(lambda b: b.hex())
        if np.issubdtype(df[c].dtype, np.floating):
            df[c] = df[c].round(6)
        if np.issubdtype(df[c].dtype, np.integer):
            df[c] = df[c].astype("int64")
    return df


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    for t in TABLES:
        c.execute(f"CREATE VIEW {t} AS SELECT * FROM "
                  f"read_parquet('{SF_DIR}/{t}.parquet')")
    return c


def test_entry_smoke():
    out = _to_pandas(entrymod.entry())
    assert len(out) >= 0
    assert set(out.columns) == {"id", "cluster_id"}


@pytest.mark.parametrize("name", sorted(entrymod.queries().keys()))
def test_query_runs(name):
    fn = entrymod.queries()[name]
    out = _to_pandas(fn(SF_DIR))
    assert out is not None
    assert len(out.columns) > 0


@pytest.mark.parametrize("name", sorted(entrymod.oracle_sql().keys()))
def test_query_matches_oracle(name, con):
    assert name in entrymod.queries(), f"oracle without query: {name}"
    ours = _canon(_to_pandas(entrymod.queries()[name](SF_DIR)))
    theirs = _canon(con.sql(entrymod.oracle_sql()[name]).df())
    assert list(ours.columns) == list(theirs.columns), \
        f"{name}: columns {list(ours.columns)} vs {list(theirs.columns)}"
    assert len(ours) == len(theirs), f"{name}: {len(ours)} vs {len(theirs)} rows"
    pd.testing.assert_frame_equal(ours, theirs, check_dtype=False,
                                  check_exact=False, rtol=1e-6, atol=1e-9)
