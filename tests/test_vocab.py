"""Vocabulary df stats (stages/vocab.py): DuckDB parity, distinct-doc
semantics, deterministic tie-break at the top-k cut, null/empty text."""

import duckdb
import pandas as pd
import pyarrow as pa
import ray.data

from raydedup.stages.vocab import term_doc_counts, top_terms


def _table():
    return pa.table({
        "doc_id": pa.array(range(6), pa.int64()),
        "text": pa.array([
            "Alpha beta beta GAMMA",          # repeats count once per doc
            "alpha;beta,delta",
            "ALPHA  beta\nepsilon_1",
            "zeta zeta zeta",
            None,
            "",
        ]),
    })


def test_df_matches_duckdb(ray_session):
    t = _table()
    out = term_doc_counts(ray.data.from_arrow(t)) \
        .to_pandas().sort_values("term").reset_index(drop=True)
    con = duckdb.connect()
    con.register("t", t)
    ora = con.sql(r"""
        WITH toks AS (SELECT doc_id,
                             unnest(regexp_extract_all(lower(text),
                                    '[a-z0-9_]+')) AS term FROM t),
        d AS (SELECT DISTINCT doc_id, term FROM toks)
        SELECT term, count(*) AS df FROM d GROUP BY term ORDER BY term
    """).df()
    pd.testing.assert_frame_equal(out, ora, check_dtype=False)
    # distinct-doc semantics: 'beta' appears in 3 docs (not 4 occurrences)
    assert int(out[out.term == "beta"].df.iloc[0]) == 3
    assert int(out[out.term == "epsilon_1"].df.iloc[0]) == 1


def test_top_terms_tie_break_deterministic(ray_session):
    t = _table()
    out = top_terms(ray.data.from_arrow(t), k=2, min_docs=1).to_pandas()
    # alpha and beta both df=3; term-ASC tie-break puts alpha first
    assert list(out.term) == ["alpha", "beta"]
    assert list(out.df) == [3, 3]
