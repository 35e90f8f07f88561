"""Decontamination (stages/decontaminate.py): planted-overlap detection,
strict short-doc semantics, DuckDB string-gram parity, cap behavior."""

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray.data

from raydedup.stages.decontaminate import decontaminate, eval_gram_keys

EVAL_SENT = "the quick brown fox jumps over the lazy dog"


def _tables():
    rng = np.random.default_rng(3)
    words = [f"w{i}" for i in range(40)]
    train_texts = [" ".join(rng.choice(words, 30)) for _ in range(50)]
    # plant the eval sentence inside two train docs
    train_texts[7] = train_texts[7] + " " + EVAL_SENT
    train_texts[23] = EVAL_SENT + " " + train_texts[23]
    train_texts.append("too short")               # < n tokens: no grams
    train = pa.table({"doc_id": pa.array(range(len(train_texts)),
                                         pa.int64()),
                      "text": pa.array(train_texts)})
    ev = pa.table({"doc_id": pa.array([1000, 1001], pa.int64()),
                   "text": pa.array([EVAL_SENT, "completely unrelated eval "
                                     "text with its own words"])})
    return train, ev


def test_planted_contamination_found(ray_session):
    train, ev = _tables()
    keys = eval_gram_keys(ray.data.from_arrow(ev), n=5)
    out = decontaminate(ray.data.from_arrow(train), keys, n=5) \
        .to_pandas().sort_values("doc_id").reset_index(drop=True)
    assert set(out.doc_id) == {7, 23}
    # the planted sentence has 9 tokens -> 5 distinct 5-grams
    assert (out.n_hit == 5).all()


def test_matches_duckdb_string_grams(ray_session):
    train, ev = _tables()
    keys = eval_gram_keys(ray.data.from_arrow(ev), n=5)
    out = decontaminate(ray.data.from_arrow(train), keys, n=5,
                        only_contaminated=False) \
        .to_pandas().sort_values("doc_id").reset_index(drop=True)
    con = duckdb.connect()
    con.register("train", train)
    con.register("ev", ev)
    ora = con.sql(r"""
        WITH toks AS (
          SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9_]+') AS t
          FROM train
        ), g AS (
          SELECT doc_id, array_to_string(t[i:i+4], ' ') AS gram
          FROM toks, LATERAL unnest(range(1, len(t) - 5 + 2)) AS u(i)
        ), et AS (
          SELECT regexp_extract_all(lower(text), '[a-z0-9_]+') AS t FROM ev
        ), eg AS (
          SELECT DISTINCT array_to_string(t[i:i+4], ' ') AS gram
          FROM et, LATERAL unnest(range(1, len(t) - 5 + 2)) AS u(i)
        ), tg AS (SELECT DISTINCT doc_id, gram FROM g)
        SELECT d.doc_id AS doc_id,
               COALESCE(cg.n_grams, 0) AS n_grams,
               COALESCE(h.n_hit, 0) AS n_hit
        FROM (SELECT doc_id FROM train) d
        LEFT JOIN (SELECT doc_id, count(*) AS n_grams FROM tg
                   GROUP BY doc_id) cg USING (doc_id)
        LEFT JOIN (SELECT doc_id, count(*) AS n_hit FROM tg
                   WHERE gram IN (SELECT gram FROM eg)
                   GROUP BY doc_id) h USING (doc_id)
        ORDER BY doc_id
    """).df()
    pd.testing.assert_frame_equal(out[ora.columns], ora, check_dtype=False)


def test_short_docs_have_no_grams(ray_session):
    train, _ = _tables()
    keys = eval_gram_keys(
        ray.data.from_arrow(pa.table({"doc_id": pa.array([0], pa.int64()),
                                      "text": pa.array(["too short"])})),
        n=5)
    assert len(keys) == 0           # 2 tokens < n: strict semantics
    out = decontaminate(ray.data.from_arrow(train), keys, n=5,
                        only_contaminated=False).to_pandas()
    assert int(out[out.doc_id == 50].n_grams.iloc[0]) == 0


def test_eval_cap_raises(ray_session):
    _, ev = _tables()
    with pytest.raises(ValueError, match="max_grams"):
        eval_gram_keys(ray.data.from_arrow(ev), n=5, max_grams=2)
