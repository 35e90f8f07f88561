"""Signature stage: per-file shingles + 128-perm MinHash + SimHash, computed by
a stateful actor pool over zero-copy Arrow batches.

Replaces the reference's embedding stage (emb_space (N,D) float32,
selfclean/cleaner/selfclean.py:274-283) per BASELINE.json north_star: the
"model" state here is the seeded permutation table, built ONCE per actor in
__init__ — work happens per batch in __call__.

Content is DROPPED after this stage (SURVEY §7 "very wide rows"): only ids +
hashes travel through the shuffles.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray.data

from raydedup import kernels as K
from raydedup.config import EngineConfig
from raydedup.util import pack_u64_2d, pack_u64_ragged


class SignatureActor:
    """Actor-pool callable: (ingested batch) -> signature rows."""

    def __init__(self, cfg: EngineConfig):
        self.cfg = cfg
        # stateful setup, once per actor (not per batch)
        self.perm = K.perm_seeds(cfg.minhash.num_perm, cfg.minhash.seed)

    def __call__(self, batch: pa.Table) -> pa.Table:
        cfg = self.cfg
        texts = batch.column("content").to_pylist()
        flat, offs = K.tokenize_hash_batch(texts, lowercase=cfg.shingle.lowercase)
        sh, so = K.shingle_hashes(flat, offs, cfg.shingle.k)
        sig = K.minhash_signatures(sh, so, self.perm)
        sim = K.simhash64(sh, so)

        # unique shingle set per doc (for exact-Jaccard verification)
        uniq_parts = []
        uoffs = np.zeros(len(so), dtype=np.int64)
        for i in range(len(so) - 1):
            u = np.unique(sh[so[i]:so[i + 1]])
            uniq_parts.append(u)
            uoffs[i + 1] = uoffs[i] + len(u)
        uflat = np.concatenate(uniq_parts) if uniq_parts else np.empty(0, K.U64)

        n_shingles = (uoffs[1:] - uoffs[:-1]).astype(np.int64)
        # prepend 0 back: uoffs already has n+1 entries
        return pa.table({
            "id": batch.column("id"),
            "content_sha256": batch.column("content_sha256"),
            "lang": batch.column("lang"),
            "n_shingles": pa.array(n_shingles, pa.int64()),
            "minhash": pack_u64_2d(sig),
            "shingles": pack_u64_ragged(uflat, uoffs),
            # reinterpret-cast: groupable int64, bit pattern preserved
            "simhash": pa.array(sim.view(np.int64), pa.int64()),
        })


def compute_signatures(ingested: ray.data.Dataset, cfg: EngineConfig
                       ) -> ray.data.Dataset:
    """Stateful actor-pool map_batches over Arrow batches."""
    # autoscaling pool (min 1): a fixed pool equal to the CPU count starves
    # the upstream read stage of CPUs and deadlocks the streaming executor.
    return ingested.map_batches(
        SignatureActor,
        fn_constructor_args=(cfg,),
        batch_format="pyarrow",
        batch_size=cfg.sig_batch_size,
        concurrency=(1, cfg.sig_concurrency),
        num_cpus=1,
        zero_copy_batch=True,
    )
