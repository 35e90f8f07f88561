"""Corpus vocabulary statistics: per-term document frequency and the
top-k most widespread terms.

The df table is the backbone of the classic corpus-quality passes (IDF
weighting, stopword discovery, junk-vocab detection); the reference has no
corpus-text plane at all (SelfClean is embedding-space only, SURVEY §2.8).
Same wide-step shape as stages/boilerplate.py: per-batch DISTINCT
(doc, term) partials reduced with Arrow's native hash group-by so each
batch ships at most one row per distinct term, then ONE string-keyed
groupby-sum as the only shuffle. Tokens are the '[a-z0-9_]+' runs of the
lowercased text — the same token contract lang_id's oracle already gates —
extracted with the vectorized C++ `split_pattern_regex` kernel (split on
the complement class; empties from edges/runs dropped).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray.data
from ray.data.aggregate import Sum

_DF_SCHEMA = pa.schema([("term", pa.large_string()), ("df", pa.int64())])


def term_doc_counts(ds: ray.data.Dataset, text_col: str = "text",
                    id_col: str = "doc_id") -> ray.data.Dataset:
    """-> (term, df): for every distinct lowercased '[a-z0-9_]+' token, the
    number of distinct documents containing it."""

    def partial(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return _DF_SCHEMA.empty_table()
        s = pc.utf8_lower(
            pc.fill_null(pc.cast(t.column(text_col), pa.large_string()), ""))
        if isinstance(s, pa.ChunkedArray):
            s = s.combine_chunks()
        lists = pc.split_pattern_regex(s, "[^a-z0-9_]+")
        ids = t.column(id_col).to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        counts = pc.list_value_length(lists).to_numpy(zero_copy_only=False)
        flat = pc.list_flatten(lists)
        x = pa.table({
            "doc_id": pa.array(np.repeat(ids, counts), pa.int64()),
            "term": flat,
        }).filter(pc.not_equal(flat, pa.scalar("", pa.large_string())))
        distinct = x.group_by(["doc_id", "term"]).aggregate([])
        p = distinct.group_by("term").aggregate([("doc_id", "count")])
        return pa.table({"term": p.column("term").cast(pa.large_string()),
                         "df": p.column("doc_id_count").cast(pa.int64())})

    partials = ds.map_batches(partial, batch_format="pyarrow")
    return partials.groupby("term").aggregate(Sum("df", alias_name="df"))


def top_terms(ds: ray.data.Dataset, k: int = 100, min_docs: int = 2,
              text_col: str = "text", id_col: str = "doc_id"
              ) -> ray.data.Dataset:
    """-> the k most widespread terms (df >= min_docs), ordered df DESC then
    term ASC (the tie-break makes the cut deterministic)."""
    df = term_doc_counts(ds, text_col, id_col) \
        .filter(expr=f"df >= {int(min_docs)}")
    return df.sort(["df", "term"], descending=[True, False]).limit(k)
