"""Grouped top-k: the k best rows per group, with map-side combining.

The grouped-ranking aggregate every corpus report needs (top documents
per language/source, worst offenders per cluster); the reference's only
ranking is global (SURVEY §2.6). Ray Data has no QUALIFY/row_number —
the idiomatic shape is a per-batch PARTIAL top-k (each batch ships at
most k rows per group it contains — the combiner) followed by one
groupby().map_groups final top-k over the k*num_batches survivors. The
wide step therefore moves O(k * groups * batches) rows, not the corpus.

Ordering is (value DESC|ASC, id ASC): the id tie-break makes the cut
deterministic, which is what lets a SQL QUALIFY row_number() oracle
match value-for-value.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data


def _topk_table(t: pa.Table, group_col: str, value_col: str, id_col: str,
                k: int, descending: bool) -> pa.Table:
    if t.num_rows == 0:
        return t
    g = t.column(group_col).to_numpy(zero_copy_only=False)
    v = t.column(value_col).to_numpy(zero_copy_only=False)
    i = t.column(id_col).cast(pa.int64()).to_numpy(zero_copy_only=False)
    if v.dtype.kind == "f" and np.isnan(v).any():
        # NaN has no defined rank vs the SQL oracle's ORDER BY — fail loudly
        raise ValueError("top_k_per_group: NaN in value column "
                         f"{value_col!r} is not orderable")
    # sort by (group, value, id); group key may be strings — factorize to
    # codes so one numeric lexsort serves any key type
    codes, _ = pd.factorize(g, sort=True)
    if descending:
        # rank-space inversion instead of -v: negating values silently
        # wraps at INT64_MIN and misorders unsigned columns (round-3
        # ADVICE item); value ranks are batch-local small ints, equal
        # values share a rank so the id tie-break still applies
        _, vinv = np.unique(v, return_inverse=True)
        vkey = -vinv.astype(np.int64)
    else:
        vkey = v
    order = np.lexsort((i, vkey, codes))
    gs = codes[order]
    starts = np.nonzero(np.r_[True, gs[1:] != gs[:-1]])[0]
    rank = np.arange(len(gs)) - np.repeat(starts, np.r_[starts[1:],
                                                        len(gs)] - starts)
    keep = order[rank < k]
    keep.sort()                     # preserve original row order per batch
    return t.take(keep)


def top_k_per_group(ds: ray.data.Dataset, group_col: str, value_col: str,
                    id_col: str, k: int,
                    descending: bool = True) -> ray.data.Dataset:
    """-> the k rows with the best `value_col` per `group_col` (ties broken
    by ascending `id_col`), original columns preserved."""

    def partial(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return t
        return _topk_table(t, group_col, value_col, id_col, k, descending)

    def final(t: pa.Table) -> pa.Table:
        return _topk_table(t, group_col, value_col, id_col, k, descending)

    return ds.map_batches(partial, batch_format="pyarrow") \
        .groupby(group_col).map_groups(final, batch_format="pyarrow")
