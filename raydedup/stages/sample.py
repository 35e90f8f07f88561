"""Deterministic hash sampling: a reproducible, order-free corpus sample.

Every training-data pipeline needs "take X% of the corpus, the same X%
every run, on any cluster, in any order" — random_sample() is none of
those. The standard trick is a keyed hash filter: keep rows where
splitmix64(id ^ salt) % mod < keep_lt. Properties:
- deterministic and seed-able (salt), independent of partitioning,
  block order, and cluster size;
- composable: a 10% sample of a 50% sample at the same salt is the 10%
  sample (nested thresholds);
- streaming and shuffle-free (one stateless map_batches filter);
- stratified-proportional in expectation over any attribute not
  correlated with the hash (i.e. everything).

The SQL oracle replays splitmix64 exactly (the same generated-SQL
machinery the simhash oracle proves bit-exact), so the sampled id SET is
value-checked, not just its size.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray.data

from raydedup.kernels import splitmix64


def hash_sample(ds: ray.data.Dataset, id_col: str = "doc_id",
                keep_lt: int = 100, mod: int = 1000,
                salt: int = 0) -> ray.data.Dataset:
    """Keep rows where splitmix64(id ^ salt) % mod < keep_lt
    (keep_lt/mod of the corpus in expectation, exactly reproducible).

    Non-null id contract: a null id has no stable hash — rather than
    keep/drop such rows on the garbage bit pattern a null-masked to_numpy
    would produce (float64 NaN reinterpreted as uint64), the stage fails
    loudly."""
    if not (0 <= keep_lt <= mod):
        raise ValueError("keep_lt must be within [0, mod]")
    s = np.uint64(salt)
    m = np.uint64(mod)
    k = np.uint64(keep_lt)

    def fn(t: pa.Table) -> pa.Table:
        col = t.column(id_col)
        if col.null_count:
            raise ValueError(
                f"hash_sample: {col.null_count} null value(s) in id column "
                f"{id_col!r} — sampling requires non-null ids")
        ids = col.cast(pa.int64()).to_numpy(
            zero_copy_only=False).view(np.uint64)
        keep = (splitmix64(ids ^ s) % m) < k
        return t.filter(pa.array(keep))

    return ds.map_batches(fn, batch_format="pyarrow")


def stratified_sample(ds: ray.data.Dataset, k: int,
                      group_col: str = "lang", id_col: str = "doc_id",
                      salt: int = 0) -> ray.data.Dataset:
    """Deterministic k-per-group sample: within each group, keep the k rows
    with the smallest (splitmix64(id ^ salt), id) rank — the balanced
    per-language/per-source cap every multilingual corpus pipeline needs,
    with all of hash_sample's properties (reproducible on any cluster,
    partition- and order-invariant, salt-seedable; groups smaller than k
    keep all rows). Non-null id contract as hash_sample.

    Execution reuses the grouped top-k machinery (stages/topk.py): a
    map-side PARTIAL top-k combiner ships at most k rows per group per
    batch, then ONE grouped final cut — the wide step moves
    O(k * groups * batches) rows, never the corpus."""
    from raydedup.stages.topk import top_k_per_group
    s = np.uint64(salt)

    def add_rank(t: pa.Table) -> pa.Table:
        col = t.column(id_col)
        if col.null_count:
            raise ValueError(
                f"stratified_sample: {col.null_count} null value(s) in id "
                f"column {id_col!r} — sampling requires non-null ids")
        ids = col.cast(pa.int64()).to_numpy(
            zero_copy_only=False).view(np.uint64)
        return t.append_column("_srank",
                               pa.array(splitmix64(ids ^ s), pa.uint64()))

    ranked = ds.map_batches(add_rank, batch_format="pyarrow")
    out = top_k_per_group(ranked, group_col, "_srank", id_col, k,
                          descending=False)
    return out.map_batches(lambda t: t.drop_columns(["_srank"]),
                           batch_format="pyarrow")
