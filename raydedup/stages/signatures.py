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
    """Actor-pool callable: (ingested batch) -> signature rows.

    with_simhash=False by default: the SimHash bit-vote is ~60% of the warm
    per-batch cost and only the simhash_pairs pipeline consumes it.

    with_shingles=False drops the packed shingle-set column — 87% of the
    signature table's bytes (measured ~7.5 KB of 8.7 KB/row at ~940 mean
    shingles) — for callers that re-derive exact-verify shingle sets from
    content for the candidate-touched subset only (see
    verify.verify_pairs(shingle_source=...)); the minhash math is identical
    either way (it consumes the same sorted-unique intermediates)."""

    def __init__(self, cfg: EngineConfig, with_simhash: bool = False,
                 with_shingles: bool = True):
        self.cfg = cfg
        self.with_simhash = with_simhash
        self.with_shingles = with_shingles
        # stateful setup, once per actor (not per batch)
        self.perm = K.perm_seeds(cfg.minhash.num_perm, cfg.minhash.seed)

    def __call__(self, batch: pa.Table) -> pa.Table:
        cfg = self.cfg
        # straight from the Arrow buffers — no to_pylist string materialization
        flat, offs = K.tokenize_hash_arrow(batch.column("content"),
                                           lowercase=cfg.shingle.lowercase)
        sh, so = K.shingle_hashes(flat, offs, cfg.shingle.k)
        sim = K.simhash64(sh, so) if self.with_simhash else \
            np.zeros(len(so) - 1, dtype=np.uint64)

        # ONE batch-wide (doc, shingle) sort serves BOTH the per-doc unique
        # shingle sets (exact-Jaccard verification) AND the OPH MinHash
        # minima (bin = top hash bits, so value order is bin order and each
        # (doc, bin) run's first value is its min) — the stage previously
        # paid two overlapping lexsorts, ~60% of flagship wall.
        uflat, uoffs = K.segmented_unique(sh, so)
        sig = K.minhash_from_sorted_unique(uflat, uoffs,
                                           cfg.minhash.num_perm)

        n_shingles = (uoffs[1:] - uoffs[:-1]).astype(np.int64)
        # prepend 0 back: uoffs already has n+1 entries
        cols = {
            "id": batch.column("id"),
            "content_sha256": batch.column("content_sha256"),
            "lang": batch.column("lang"),
            "n_shingles": pa.array(n_shingles, pa.int64()),
            "minhash": pack_u64_2d(sig),
        }
        if self.with_shingles:
            cols["shingles"] = pack_u64_ragged(uflat, uoffs)
        # reinterpret-cast: groupable int64, bit pattern preserved
        cols["simhash"] = pa.array(sim.view(np.int64), pa.int64())
        return pa.table(cols)


_TASK_STATE: dict = {}


def _signature_task(cfg: EngineConfig, with_simhash: bool,
                    with_shingles: bool = True):
    """Stateless-task variant: the per-worker state (permutation seeds +
    token-hash cache) is tiny, so plain tasks beat an actor pool — no pool
    spin-up/ramp, elastic scheduling. State is memoized per worker process
    in a module global (same amortization an actor would give)."""

    def fn(batch: pa.Table) -> pa.Table:
        # key on the WHOLE (frozen, hashable) config: __call__ also reads
        # cfg.shingle.k / lowercase, so a (num_perm, seed)-only key let a
        # warm worker silently reuse a stale shingle configuration across
        # jobs with different shingle settings
        key = (cfg, with_simhash, with_shingles)
        actor = _TASK_STATE.get(key)
        if actor is None:
            actor = SignatureActor(cfg, with_simhash, with_shingles)
            _TASK_STATE[key] = actor
        return actor(batch)

    return fn


def compute_signatures(ingested: ray.data.Dataset, cfg: EngineConfig,
                       with_simhash: bool = False,
                       with_shingles: bool = True) -> ray.data.Dataset:
    """Signature stage as stateless map_batches tasks over Arrow batches.

    An actor pool here costs pool spin-up + ramp for state that is only a
    128-entry seed table; tasks amortize that state per worker process via a
    module-global cache instead. (A true model-loading stage WOULD use an
    actor pool — see multimodal.decode_features.)"""
    return ingested.map_batches(
        _signature_task(cfg, with_simhash, with_shingles),
        batch_format="pyarrow",
        batch_size=cfg.sig_batch_size,
        num_cpus=1,
        zero_copy_batch=True,
    )


def compute_shingle_sets(id_content: ray.data.Dataset,
                         cfg: EngineConfig) -> ray.data.Dataset:
    """(id, content) rows -> (id, shingles packed u64) rows: the exact-verify
    shingle sets alone, re-derived from content with the SAME kernels the
    signature stage runs (tokenize -> k-shingle -> segmented sorted-unique),
    so a recomputed set is bit-identical to a stored one. Used by
    verify.verify_pairs(shingle_source=...) on the candidate-touched subset
    when the signature table was built with with_shingles=False."""

    def fn(batch: pa.Table) -> pa.Table:
        flat, offs = K.tokenize_hash_arrow(batch.column("content"),
                                           lowercase=cfg.shingle.lowercase)
        sh, so = K.shingle_hashes(flat, offs, cfg.shingle.k)
        uflat, uoffs = K.segmented_unique(sh, so)
        return pa.table({
            "id": batch.column("id"),
            "shingles": pack_u64_ragged(uflat, uoffs),
        })

    return id_content.map_batches(
        fn, batch_format="pyarrow", batch_size=cfg.sig_batch_size,
        num_cpus=1, zero_copy_batch=True)
