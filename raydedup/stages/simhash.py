"""SimHash near-duplicate detection: 64-bit fingerprint, 4x16-bit band
bucketing, Hamming-distance verification.

Engine extension beyond the reference (training-data dedup family). Any two
docs within Hamming distance d <= 3 share at least one of the 4 16-bit bands
(pigeonhole), so banding gives exact recall at d <= 3.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray.data
from ray.data.aggregate import Count

from raydedup import kernels as K
from raydedup.config import EngineConfig
from raydedup.stages.candidates import dedupe_pairs, grouped_pairs
from raydedup.util import hash_join

N_BANDS = 4
BITS = 16


def _explode_simhash_bands(batch: pa.Table) -> pa.Table:
    ids = batch.column("id").to_numpy(zero_copy_only=False).astype(np.int64)
    sh = batch.column("simhash").to_numpy(zero_copy_only=False) \
        .astype(np.int64).view(np.uint64)
    n_sh = batch.column("n_shingles").to_numpy(zero_copy_only=False)
    keep = n_sh > 0
    ids, sh = ids[keep], sh[keep]
    parts = []
    for b in range(N_BANDS):
        chunk = (sh >> K.U64(b * BITS)) & K.U64((1 << BITS) - 1)
        with np.errstate(over="ignore"):
            gkey = K.splitmix64(chunk ^ K.splitmix64(
                np.full(len(chunk), b, dtype=np.uint64)))
        parts.append(pa.table({
            "gkey": pa.array(K.to_i63(gkey), pa.int64()),
            "id": pa.array(ids, pa.int64()),
        }))
    return pa.concat_tables(parts) if parts else pa.table(
        {"gkey": pa.array([], pa.int64()), "id": pa.array([], pa.int64())})


def simhash_pairs(sigs: ray.data.Dataset, cfg: EngineConfig,
                  max_hamming: int = 3) -> ray.data.Dataset:
    """signatures -> (id_a, id_b, hamming) pairs with Hamming distance <=
    max_hamming. Same groupby-shuffle shape as the MinHash LSH path."""
    rows = sigs.select_columns(["id", "simhash", "n_shingles"]) \
        .map_batches(_explode_simhash_bands, batch_format="pyarrow")
    cap = cfg.lsh.max_group_pairs
    pairs = grouped_pairs(rows.select_columns(["gkey", "id"]), "gkey", cap,
                          cfg.join_num_partitions, mode="all")
    deduped = dedupe_pairs(pairs).materialize()
    if deduped.count() == 0:
        return ray.data.from_arrow(pa.table({
            "id_a": pa.array([], pa.int64()),
            "id_b": pa.array([], pa.int64()),
            "hamming": pa.array([], pa.int64()),
        }))

    proj = sigs.select_columns(["id", "simhash"])
    j1 = hash_join(deduped, proj, on="id_a", right_on="id",
                   num_partitions=cfg.join_num_partitions) \
        .rename_columns({"simhash": "simhash_a"})
    j2 = hash_join(j1, proj, on="id_b", right_on="id",
                   num_partitions=cfg.join_num_partitions) \
        .rename_columns({"simhash": "simhash_b"})

    def verify(t: pa.Table) -> pa.Table:
        a = t.column("simhash_a").to_numpy(zero_copy_only=False) \
            .astype(np.int64).view(np.uint64)
        b = t.column("simhash_b").to_numpy(zero_copy_only=False) \
            .astype(np.int64).view(np.uint64)
        ham = K.hamming64(a, b).astype(np.int64)
        out = pa.table({"id_a": t.column("id_a"), "id_b": t.column("id_b"),
                        "hamming": pa.array(ham, pa.int64())})
        return out.filter(pa.compute.less_equal(out.column("hamming"),
                                                pa.scalar(max_hamming)))

    return j2.map_batches(verify, batch_format="pyarrow")
