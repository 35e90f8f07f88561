"""quality_filter + corpus_stats_by_lang (training-data quality pass).

quality_filter: inclusive bounds, exact-threshold ratio, lang whitelist,
empty/null text, non-ASCII fallback parity. corpus_stats_by_lang:
multi-block partial-merge parity vs a pandas recompute (integer-sum
derived ratios are exact, so equality is exact).
"""

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data as rd

from raydedup.stages.textstats import corpus_stats_by_lang, quality_filter


def _docs(rows):
    ids, texts, langs = zip(*rows)
    return pa.table({"doc_id": pa.array(ids, pa.int64()),
                     "text": pa.array(texts, pa.string()),
                     "lang": pa.array(langs, pa.string())})


def test_quality_filter_boundaries_inclusive():
    tbl = _docs([
        (1, "a b", "en"),           # 2 tokens: at min -> kept
        (2, "a b c", "en"),         # 3 tokens: at max -> kept
        (3, "a b c d", "en"),       # 4 tokens: above max -> dropped
        (4, "a", "en"),             # 1 token: below min -> dropped
        (5, "ab 1", "en"),          # alpha_ratio 2/4 = 0.5 exactly -> kept
        (6, "ab 12", "en"),         # 2/5 = 0.4 < 0.5 -> dropped
        (7, "a b", "zz"),           # lang not whitelisted -> dropped
        (8, "", "en"),              # 0 tokens -> dropped
        (9, None, "en"),            # null text -> 0 tokens -> dropped
        (10, "a b", None),          # null lang -> dropped
    ])
    out = quality_filter(rd.from_arrow(tbl), min_tokens=2, max_tokens=3,
                         min_alpha_ratio=0.5, langs=("en",)).to_pandas()
    assert sorted(out.doc_id) == [1, 2, 5]
    assert set(out.columns) == {"doc_id", "lang", "n_tokens", "alpha_ratio"}
    r5 = out.set_index("doc_id").loc[5]
    assert r5.n_tokens == 2 and r5.alpha_ratio == 0.5


def test_quality_filter_non_ascii_fallback_counts_match():
    """A non-ASCII batch routes token counting through the regex fallback;
    the \\S+ run count must equal the byte path's on the ASCII rows."""
    tbl = _docs([
        (1, "héllo wörld und mehr", "de"),   # 4 tokens, non-ASCII
        (2, "plain ascii text here", "en"),  # 4 tokens
    ])
    out = quality_filter(rd.from_arrow(tbl), min_tokens=4, max_tokens=4,
                         min_alpha_ratio=0.0, langs=("de", "en")).to_pandas()
    assert sorted(out.doc_id) == [1, 2]
    assert list(out.sort_values("doc_id").n_tokens) == [4, 4]


def test_corpus_stats_by_lang_multiblock_partial_merge():
    rng = np.random.default_rng(7)
    langs = ["en", "de", "fr"]
    rows = []
    for i in range(300):
        lang = langs[int(rng.integers(len(langs)))]
        ntok = int(rng.integers(1, 12))
        toks = ["ab1"[: int(rng.integers(1, 4))] * int(rng.integers(1, 3))
                for _ in range(ntok)]
        rows.append((i, " ".join(toks), lang))
    tbl = _docs(rows)
    out = corpus_stats_by_lang(rd.from_arrow(tbl).repartition(7)) \
        .to_pandas().sort_values("lang").reset_index(drop=True)

    df = tbl.to_pandas()
    df["n_tokens"] = df.text.str.split().map(len)
    df["n_chars"] = df.text.str.len()
    df["alpha"] = df.text.str.count("[A-Za-z]")
    exp = df.groupby("lang").agg(
        n_docs=("doc_id", "size"), total_tokens=("n_tokens", "sum"),
        min_tokens=("n_tokens", "min"), max_tokens=("n_tokens", "max"),
        total_chars=("n_chars", "sum"), alpha=("alpha", "sum"),
    ).reset_index().sort_values("lang").reset_index(drop=True)

    assert list(out.lang) == list(exp.lang)
    for c in ["n_docs", "total_tokens", "min_tokens", "max_tokens",
              "total_chars"]:
        assert list(out[c]) == list(exp[c]), c
    # integer-sum derived ratios are exact (no float accumulation order)
    assert np.array_equal(out.avg_tokens.to_numpy(),
                          (exp.total_tokens / exp.n_docs).to_numpy())
    assert np.array_equal(out.alpha_char_ratio.to_numpy(),
                          (exp.alpha / exp.total_chars).to_numpy())


def test_corpus_stats_empty_lang_and_empty_text():
    tbl = _docs([(1, "", "en"), (2, "  ", "en"), (3, "x", "de")])
    out = corpus_stats_by_lang(rd.from_arrow(tbl)).to_pandas() \
        .set_index("lang")
    assert out.loc["en"].n_docs == 2
    assert out.loc["en"].total_tokens == 0
    assert out.loc["en"].avg_tokens == 0.0
    assert out.loc["en"].min_tokens == 0
    assert out.loc["de"].total_chars == 1
    assert out.loc["de"].alpha_char_ratio == 1.0


def test_quality_filter_is_single_scan():
    """The filter is one map_batches over the input — no shuffle stages in
    the plan (embarrassingly parallel at scale)."""
    tbl = _docs([(i, "a b c d", "en") for i in range(10)])
    ds = quality_filter(rd.from_arrow(tbl))
    plan = repr(ds)
    for wide in ("Sort", "Aggregate", "RandomShuffle", "Repartition"):
        assert wide not in plan, plan


def test_repetition_stats_planted_cases():
    """Hand-computed repetition profiles, including multi-byte UTF-8
    lines, interior/trailing empty lines, and the all-empty document."""
    from raydedup.stages.textstats import repetition_stats
    tbl = _docs([
        (1, "a\nb\na\n", "en"),        # 3 lines, 2 unique, top 2
        (2, "", "en"),                 # no lines
        (3, "\n\n\n", "en"),           # only empty lines
        (4, "solo", "en"),             # 1 line
        (5, "x\nx\nx\nx", "en"),       # 4 lines all same
        (6, "é\né\nß", "en"),          # UTF-8 lines: 3 lines, 2 unique
        (7, None, "en"),               # null text
    ])
    out = repetition_stats(rd.from_arrow(tbl)).to_pandas() \
        .set_index("doc_id").sort_index()
    assert out.loc[1].tolist() == [3, 2, 1 / 3, 2]
    assert out.loc[2].tolist() == [0, 0, 0.0, 0]
    assert out.loc[3].tolist() == [0, 0, 0.0, 0]
    assert out.loc[4].tolist() == [1, 1, 0.0, 1]
    assert out.loc[5].tolist() == [4, 1, 3 / 4, 4]
    assert out.loc[6].tolist() == [3, 2, 1 / 3, 2]
    assert out.loc[7].tolist() == [0, 0, 0.0, 0]


def test_repetition_stats_matches_duckdb_oracle():
    """Random multi-block corpus vs the exact SQL the driver runs."""
    import duckdb

    from raydedup.stages.textstats import repetition_stats
    rng = np.random.default_rng(5)
    lines = ["alpha", "beta beta", "", "gamma", "alpha", "  spaced  "]
    docs = ["\n".join(rng.choice(lines, size=rng.integers(0, 12)).tolist())
            for _ in range(200)]
    tbl = pa.table({"doc_id": pa.array(range(200), pa.int64()),
                    "text": pa.array(docs, pa.string())})
    got = repetition_stats(rd.from_arrow(tbl).repartition(7)).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    con = duckdb.connect()
    con.register("documents", tbl)
    import __ray_entry__ as E
    want = con.execute(E.oracle_sql()["repetition_stats"]
                       + " ORDER BY doc_id").df()
    pd.testing.assert_frame_equal(got, want.astype(got.dtypes.to_dict()))


def _boiler_tbl(n=60):
    rows = []
    for i in range(n):
        extra = "\nSHARED\nSHARED" if i % 2 == 0 else "\n\n"
        rows.append((i, f"unique body line {i}\nFOOTER-{i % 3}{extra}"))
    return pa.table({"doc_id": pa.array([r[0] for r in rows], pa.int64()),
                     "text": pa.array([r[1] for r in rows], pa.string())})


def test_boilerplate_lines_distinct_doc_counts():
    """Within-doc repeats must not inflate the distinct-doc count: SHARED
    appears twice in each even doc but counts each doc once."""
    from raydedup.stages.boilerplate import boilerplate_lines
    tbl = _boiler_tbl(60)
    out = boilerplate_lines(rd.from_arrow(tbl).repartition(5), 10) \
        .to_pandas().set_index("line").sort_index()
    assert out.loc["SHARED"].n_docs == 30
    assert out.loc["FOOTER-0"].n_docs == 20
    assert len(out) == 4        # 3 footers + SHARED; body lines unique


def test_remove_boilerplate_preserves_order_and_empties():
    from raydedup.stages.boilerplate import remove_boilerplate
    tbl = _boiler_tbl(60)
    out = remove_boilerplate(rd.from_arrow(tbl).repartition(5), 10) \
        .to_pandas().set_index("doc_id").sort_index()
    # even doc: body + footer + SHARED x2 -> 3 removed, body kept
    assert out.loc[0].clean_text == "unique body line 0"
    assert out.loc[0].n_removed == 3
    # odd doc: trailing empty lines preserved verbatim
    assert out.loc[1].clean_text == "unique body line 1\n\n"
    assert out.loc[1].n_removed == 1


def test_remove_boilerplate_matches_duckdb_oracle():
    import duckdb

    from raydedup.stages.boilerplate import remove_boilerplate
    tbl = _boiler_tbl(60)
    got = remove_boilerplate(rd.from_arrow(tbl).repartition(7), 10) \
        .to_pandas().sort_values("doc_id").reset_index(drop=True)
    con = duckdb.connect()
    con.register("b", tbl)
    want = con.execute("""
        WITH X AS (SELECT doc_id,
                          unnest(string_split(text, chr(10))) AS line,
                          generate_subscripts(string_split(text, chr(10)), 1)
                              AS ord FROM b),
        H AS (SELECT line FROM X WHERE line <> ''
              GROUP BY line HAVING COUNT(DISTINCT doc_id) >= 10)
        SELECT x.doc_id,
               COALESCE(string_agg(CASE WHEN h.line IS NULL THEN x.line END,
                                   chr(10) ORDER BY x.ord), '') AS clean_text,
               CAST(COUNT(h.line) AS BIGINT) AS n_removed
        FROM X x LEFT JOIN H h USING (line)
        GROUP BY x.doc_id ORDER BY x.doc_id""").df()
    pd.testing.assert_frame_equal(got, want.astype(got.dtypes.to_dict()))


def test_remove_boilerplate_hot_set_cap_raises():
    """Exceeding max_hot_lines must fail loudly (no silent caps)."""
    import pytest

    from raydedup.stages.boilerplate import remove_boilerplate
    tbl = _boiler_tbl(60)
    with pytest.raises(ValueError, match="max_hot_lines"):
        remove_boilerplate(rd.from_arrow(tbl), 10, max_hot_lines=2)


def test_remove_boilerplate_no_hot_lines_is_identity():
    from raydedup.stages.boilerplate import remove_boilerplate
    tbl = _boiler_tbl(6)
    out = remove_boilerplate(rd.from_arrow(tbl), 1000) \
        .to_pandas().sort_values("doc_id").reset_index(drop=True)
    assert (out.n_removed == 0).all()
    assert out.clean_text.tolist() == tbl.column("text").to_pylist()


def test_remove_boilerplate_oracle_keeps_null_text_docs():
    """The driver oracle LEFT-JOINs back to the corpus so NULL-text docs
    keep their row, matching the engine's fill_null('') behavior."""
    import duckdb

    from raydedup.stages.boilerplate import remove_boilerplate
    t = pa.table({"doc_id": pa.array([1, 2, 3], pa.int64()),
                  "text": pa.array(["a\nF", None, "b\nF"], pa.string())})
    got = remove_boilerplate(rd.from_arrow(t), 2).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    con = duckdb.connect()
    con.register("b0", t)
    want = con.execute("""
        WITH B AS (SELECT doc_id, text FROM b0),
        X AS (SELECT doc_id, unnest(string_split(text, chr(10))) AS line,
                     generate_subscripts(string_split(text, chr(10)), 1)
                         AS ord FROM B),
        H AS (SELECT line FROM X WHERE line <> ''
              GROUP BY line HAVING COUNT(DISTINCT doc_id) >= 2),
        A AS (SELECT x.doc_id,
                     string_agg(CASE WHEN h.line IS NULL THEN x.line END,
                                chr(10) ORDER BY x.ord) AS clean_text,
                     CAST(COUNT(h.line) AS BIGINT) AS n_removed
              FROM X x LEFT JOIN H h USING (line) GROUP BY x.doc_id)
        SELECT b.doc_id, COALESCE(a.clean_text, '') AS clean_text,
               COALESCE(a.n_removed, 0) AS n_removed
        FROM B b LEFT JOIN A a USING (doc_id) ORDER BY doc_id""").df()
    assert len(got) == 3 and got.loc[1, "n_removed"] == 0
    pd.testing.assert_frame_equal(got, want.astype(got.dtypes.to_dict()))
