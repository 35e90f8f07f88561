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
