"""Corpus-wide boilerplate line removal (CCNet/RefinedWeb-style hot-line
dedup): find lines repeated across many DISTINCT documents (license
headers, navigation chrome, shared footers) and rewrite every document
without them.

Engine extension beyond the reference (task brief: large-scale
training-data operations). Two operators, both SQL-oracle-checked:

- line_doc_counts / boilerplate_lines: (line, n_docs) over non-empty
  newline-split lines, counting DISTINCT documents per line. Distinct
  (doc, line) pairs are reduced INSIDE each batch with Arrow's native
  hash group-by (a document is one row, so per-batch dedup is exact),
  so the global shuffle carries one partial count per distinct line per
  batch — the classic pre-aggregate-before-groupby shape. The wide step
  is a single string-keyed groupby-sum over distinct lines.

- remove_boilerplate: broadcast the hot-line set (ray.put once, read
  zero-copy in every task) and rewrite each document vectorized:
  split_pattern -> is_in membership (exact string compare, no hash
  collisions) -> rebuilt list array -> binary_join. No shuffle at all
  for the rewrite; each block rewrites independently.

Partitioning assumption (documented per the brief): the hot-line set is
collected to the driver and broadcast — its size is bounded above by
total_lines / min_docs and in practice by the corpus's real boilerplate
inventory. cfg-style `max_hot_lines` caps the collect; exceeding it
raises (never a silent cap) — at that point boilerplate removal needs
the join-based rewrite, which the error message names.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data
from ray.data.aggregate import Sum

_LINES_SCHEMA = pa.schema([("line", pa.large_string()),
                           ("n", pa.int64())])


def _doc_lines(t: pa.Table, text_col: str, id_col: str):
    """Batch -> (doc_ids int64[n], lists: LargeList<large_string> of each
    doc's newline-split lines)."""
    s = pc.fill_null(pc.cast(t.column(text_col), pa.large_string()), "")
    if isinstance(s, pa.ChunkedArray):
        s = s.combine_chunks()
    ids = t.column(id_col).to_numpy(zero_copy_only=False).astype(np.int64)
    return ids, pc.split_pattern(s, "\n")


def line_doc_counts(ds: ray.data.Dataset, text_col: str = "text",
                    id_col: str = "doc_id") -> ray.data.Dataset:
    """-> (line, n_docs) for every distinct NON-EMPTY line: the number of
    distinct documents the line occurs in."""

    def partial(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return _LINES_SCHEMA.empty_table()
        ids, lists = _doc_lines(t, text_col, id_col)
        counts = pc.list_value_length(lists).to_numpy(zero_copy_only=False)
        flat = pc.list_flatten(lists)
        x = pa.table({
            "doc_id": pa.array(np.repeat(ids, counts), pa.int64()),
            "line": flat,
        }).filter(pc.not_equal(flat, pa.scalar("", pa.large_string())))
        distinct = x.group_by(["doc_id", "line"]).aggregate([])
        p = distinct.group_by("line").aggregate([("doc_id", "count")])
        return pa.table({"line": p.column("line").cast(pa.large_string()),
                         "n": p.column("doc_id_count").cast(pa.int64())})

    partials = ds.map_batches(partial, batch_format="pyarrow")
    return partials.groupby("line").aggregate(Sum("n", alias_name="n_docs"))


def boilerplate_lines(ds: ray.data.Dataset, min_docs: int,
                      text_col: str = "text",
                      id_col: str = "doc_id") -> ray.data.Dataset:
    """-> (line, n_docs) restricted to lines in >= min_docs distinct docs."""
    return line_doc_counts(ds, text_col, id_col).filter(
        expr=f"n_docs >= {int(min_docs)}")


def remove_boilerplate(ds: ray.data.Dataset, min_docs: int,
                       text_col: str = "text", id_col: str = "doc_id",
                       max_hot_lines: int = 5_000_000) -> ray.data.Dataset:
    """-> (doc_id, clean_text, n_removed): every document rewritten without
    its boilerplate lines (order and empty lines preserved; n_removed
    counts removed line INSTANCES)."""
    from raydedup.util import collect_up_to
    hot = collect_up_to(
        boilerplate_lines(ds, min_docs, text_col, id_col), max_hot_lines)
    if hot is None:
        raise ValueError(
            f"hot-line set exceeds max_hot_lines={max_hot_lines}; the "
            "broadcast rewrite does not apply — raise the limit or rewrite "
            "via an explode + anti-join + string_agg-style reassembly")
    hot_arr = hot.column("line").combine_chunks().cast(pa.large_string()) \
        if hot.num_rows else pa.array([], pa.large_string())
    hot_ref = ray.put(hot_arr)

    def clean(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table({id_col: pa.array([], pa.int64()),
                             "clean_text": pa.array([], pa.large_string()),
                             "n_removed": pa.array([], pa.int64())})
        hot_set = ray.get(hot_ref)
        ids, lists = _doc_lines(t, text_col, id_col)
        counts = pc.list_value_length(lists).to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        flat = pc.list_flatten(lists)
        if len(hot_set):
            is_hot = pc.is_in(flat, value_set=hot_set) \
                .to_numpy(zero_copy_only=False)
        else:
            is_hot = np.zeros(len(flat), dtype=bool)
        doc_of = np.repeat(np.arange(len(ids), dtype=np.int64), counts)
        n_removed = np.bincount(doc_of[is_hot], minlength=len(ids)) \
            .astype(np.int64)
        kept_counts = counts - n_removed
        new_offs = np.zeros(len(ids) + 1, dtype=np.int64)
        np.cumsum(kept_counts, out=new_offs[1:])
        kept_flat = flat.filter(pa.array(~is_hot)).cast(pa.large_string())
        new_lists = pa.LargeListArray.from_arrays(
            pa.array(new_offs, pa.int64()), kept_flat)
        return pa.table({
            id_col: pa.array(ids, pa.int64()),
            "clean_text": pc.binary_join(
                new_lists, pa.scalar("\n", pa.large_string())),
            "n_removed": pa.array(n_removed, pa.int64()),
        })

    return ds.map_batches(clean, batch_format="pyarrow")
