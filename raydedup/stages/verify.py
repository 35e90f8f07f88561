"""Pair verification: estimated Jaccard from MinHash + exact Jaccard over
shingle sets, distance = 1 - J clipped to [0,1].

Replaces the reference's distance computation + clip
(selfclean/cleaner/selfclean_cleaner.py:121-149); distance here is Jaccard
distance of shingle sets rather than embedding cosine, per BASELINE.json
north_star ("candidate pairs are verified by Jaccard estimation plus a
suffix-array substring pass").

Scale note: candidate pairs are joined (hash-partitioned Dataset.join) with a
projected signature table (id, minhash, shingles). The est-Jaccard prefilter
drops clearly-low pairs before the exact set intersection runs; both happen in
one vectorized map_batches after the joins, so only candidate rows — a small
fraction of the corpus — ever carry signature payloads.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray.data

from raydedup.config import EngineConfig
from raydedup.util import hash_join, unpack_u64_2d, unpack_u64_rows


def _score_batch(cfg: EngineConfig):
    P = cfg.minhash.num_perm
    thr = cfg.verify.threshold
    band = cfg.verify.exact_band
    use_exact = cfg.verify.use_exact

    def fn(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        if n == 0:
            return pa.table({"id_a": pa.array([], pa.uint64()),
                             "id_b": pa.array([], pa.uint64()),
                             "est_jaccard": pa.array([], pa.float64()),
                             "jaccard": pa.array([], pa.float64()),
                             "distance": pa.array([], pa.float64())})
        sig_a = unpack_u64_2d(batch.column("minhash_a"), P)
        sig_b = unpack_u64_2d(batch.column("minhash_b"), P)
        est = (sig_a == sig_b).mean(axis=1)
        jac = est.copy()
        if use_exact:
            # exact set intersection only in/above the prefilter band
            need = est >= (thr - band)
            if need.any():
                sh_a = unpack_u64_rows(batch.column("shingles_a"))
                sh_b = unpack_u64_rows(batch.column("shingles_b"))
                for i in np.nonzero(need)[0]:
                    a, b = sh_a[i], sh_b[i]
                    if len(a) == 0 and len(b) == 0:
                        jac[i] = 1.0
                        continue
                    inter = len(np.intersect1d(a, b, assume_unique=True))
                    jac[i] = inter / (len(a) + len(b) - inter)
        dist = np.clip(1.0 - jac, 0.0, 1.0)
        out = pa.table({
            "id_a": batch.column("id_a"),
            "id_b": batch.column("id_b"),
            "est_jaccard": pa.array(est, pa.float64()),
            "jaccard": pa.array(jac, pa.float64()),
            "distance": pa.array(dist, pa.float64()),
        })
        return out.filter(pc.greater_equal(out.column("jaccard"), pa.scalar(thr)))

    return fn


def empty_verified() -> ray.data.Dataset:
    return ray.data.from_arrow(pa.table({
        "id_a": pa.array([], pa.int64()),
        "id_b": pa.array([], pa.int64()),
        "est_jaccard": pa.array([], pa.float64()),
        "jaccard": pa.array([], pa.float64()),
        "distance": pa.array([], pa.float64()),
    }))


def verify_pairs(pairs: ray.data.Dataset, sigs: ray.data.Dataset,
                 cfg: EngineConfig) -> ray.data.Dataset:
    """Candidate pairs + signatures -> verified pair Dataset
    (id_a, id_b, est_jaccard, jaccard, distance), jaccard >= threshold."""
    pairs = pairs.materialize()
    if pairs.count() == 0:
        # empty groupby outputs lose their schema in Ray Data and break the
        # downstream hash join — short-circuit with a typed empty Dataset
        return empty_verified()
    proj = sigs.select_columns(["id", "minhash", "shingles"])
    j1 = hash_join(pairs, proj, on="id_a", right_on="id",
                   num_partitions=cfg.join_num_partitions)
    j1 = j1.rename_columns({"minhash": "minhash_a", "shingles": "shingles_a"})
    j2 = hash_join(j1, proj, on="id_b", right_on="id",
                   num_partitions=cfg.join_num_partitions)
    j2 = j2.rename_columns({"minhash": "minhash_b", "shingles": "shingles_b"})
    return j2.map_batches(_score_batch(cfg), batch_format="pyarrow")
