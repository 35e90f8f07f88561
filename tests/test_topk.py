"""Grouped top-k (stages/topk.py): QUALIFY parity, deterministic ties,
combiner correctness across many small batches, ascending mode."""

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

from raydedup.stages.topk import top_k_per_group


def _table(n=500, groups=7, seed=5):
    rng = np.random.default_rng(seed)
    return pa.table({
        "doc_id": pa.array(np.arange(n), pa.int64()),
        "lang": pa.array([f"g{int(x)}" for x in rng.integers(0, groups, n)]),
        # coarse values force ties at the cut
        "n_chars": pa.array(rng.integers(0, 10, n), pa.int64()),
    })


def _oracle(t, k, desc):
    con = duckdb.connect()
    con.register("t", t)
    d = "DESC" if desc else "ASC"
    return con.sql(f"""
        SELECT doc_id, lang, n_chars FROM t
        QUALIFY row_number() OVER (
          PARTITION BY lang ORDER BY n_chars {d}, doc_id) <= {k}
        ORDER BY doc_id
    """).df()


def test_topk_matches_qualify_with_ties(ray_session):
    t = _table()
    for blocks in (1, 13):
        ds = ray.data.from_arrow(
            [t.slice(i * 40, 40) for i in range((t.num_rows + 39) // 40)]
            if blocks > 1 else t)
        out = top_k_per_group(ds, "lang", "n_chars", "doc_id", k=3) \
            .to_pandas().sort_values("doc_id").reset_index(drop=True)
        ora = _oracle(t, 3, True)
        pd.testing.assert_frame_equal(out[ora.columns], ora,
                                      check_dtype=False)


def test_topk_ascending(ray_session):
    t = _table(seed=9)
    out = top_k_per_group(ray.data.from_arrow(t), "lang", "n_chars",
                          "doc_id", k=2, descending=False) \
        .to_pandas().sort_values("doc_id").reset_index(drop=True)
    ora = _oracle(t, 2, False)
    pd.testing.assert_frame_equal(out[ora.columns], ora, check_dtype=False)


def test_topk_k_larger_than_group(ray_session):
    t = pa.table({"doc_id": pa.array([0, 1], pa.int64()),
                  "lang": pa.array(["a", "a"]),
                  "n_chars": pa.array([5, 5], pa.int64())})
    out = top_k_per_group(ray.data.from_arrow(t), "lang", "n_chars",
                          "doc_id", k=10).to_pandas()
    assert len(out) == 2


def test_topk_null_group_forms_own_partition(ray_session):
    # SQL PARTITION BY groups NULLs together; the kernel must match
    t = pa.table({"doc_id": pa.array([0, 1, 2, 3], pa.int64()),
                  "lang": pa.array(["a", None, None, "a"]),
                  "n_chars": pa.array([5, 7, 3, 9], pa.int64())})
    out = top_k_per_group(ray.data.from_arrow(t), "lang", "n_chars",
                          "doc_id", k=1).to_pandas()
    assert sorted(out.doc_id) == [1, 3]
