"""Candidate generation: LSH band expansion -> salted groupby -> pair emission
-> canonical pair dedup.

This is THE wide step replacing the reference's dense chunked all-pairs
distance computation (selfclean/cleaner/selfclean_cleaner.py:121-146) with a
sparse self-join keyed on band hash (SURVEY §2.4).

Skew handling (north_rule): each band bucket is split into cfg.lsh.salt_buckets
sub-groups keyed by hash(id) (round 1: pairs within salt), then per-salt
representatives (min id) meet in a round-2 groupby keyed on the raw band hash,
preserving connectivity across salts. Oversized groups fall back from all-pairs
to a star on the min id (connectivity preserved for CC); the fallback count is
observable via group sizes — no silent caps, see emit_pairs docstring.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray.data
from ray.data.aggregate import Count

from raydedup import kernels as K
from raydedup.config import EngineConfig
from raydedup.util import unpack_u64_2d


def _explode_bands(cfg: EngineConfig):
    bands, rows = cfg.lsh.bands, cfg.lsh.rows
    S = cfg.lsh.salt_buckets
    salt_seed = K.U64(K.hash64_str(f"salt:{cfg.seed}"))

    def fn(batch: pa.Table) -> pa.Table:
        sig = unpack_u64_2d(batch.column("minhash"), cfg.minhash.num_perm)
        ids = batch.column("id").to_numpy(zero_copy_only=False).astype(np.int64)
        n_sh = batch.column("n_shingles").to_numpy(zero_copy_only=False)
        keep = n_sh > 0                      # empty docs never band (logged count
        sig = sig[keep]                      # shows up as dropped rows in stats)
        ids = ids[keep]
        bh = K.band_hashes(sig, bands, rows)          # (n, bands) uint64
        flat_band = bh.ravel()
        flat_id = np.repeat(ids, bands)
        if S > 1:
            salt = (K.splitmix64(flat_id.view(np.uint64) ^ salt_seed)
                    % K.U64(S)).astype(np.int32)
        else:
            salt = np.zeros(len(flat_id), dtype=np.int32)
        # single int63 group key = mix(band_hash, salt) for the round-1 shuffle
        with np.errstate(over="ignore"):
            gkey = K.splitmix64(flat_band ^ K.splitmix64(salt.astype(np.uint64)))
        return pa.table({
            "gkey": pa.array(K.to_i63(gkey), pa.int64()),
            "band_key": pa.array(K.to_i63(flat_band), pa.int64()),
            "id": pa.array(flat_id, pa.int64()),
        })

    return fn


def emit_pairs(ids: np.ndarray, max_group_pairs: int) -> tuple[np.ndarray, np.ndarray]:
    """Canonical (id_a < id_b) pairs for one bucket.

    |G| <= max_group_pairs: all C(G,2) pairs (full recall).
    |G| >  max_group_pairs: star on min id — O(G) edges; cluster connectivity
    is preserved, only redundant intra-bucket pairs are dropped (other bands
    and the round-2 pass still surface them).
    """
    u = np.unique(ids)
    g = len(u)
    if g < 2:
        return np.empty(0, np.int64), np.empty(0, np.int64)
    if g <= max_group_pairs:
        ia, ib = np.triu_indices(g, k=1)
        return u[ia], u[ib]
    return np.full(g - 1, u[0], np.int64), u[1:]


def _emit_group_pairs(cap: int):
    def fn(t: pa.Table) -> pa.Table:
        ids = t.column("id").to_numpy(zero_copy_only=False).astype(np.int64)
        a, b = emit_pairs(ids, cap)
        return pa.table({"id_a": pa.array(a, pa.int64()),
                         "id_b": pa.array(b, pa.int64())})
    return fn


def _emit_group_reps():
    def fn(t: pa.Table) -> pa.Table:
        ids = t.column("id").to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table({
            "band_key": t.column("band_key").slice(0, 1),
            "id": pa.array([ids.min()], pa.int64()),
        })
    return fn


def candidate_pairs(sigs: ray.data.Dataset, cfg: EngineConfig) -> ray.data.Dataset:
    """Signatures -> deduplicated canonical candidate pair Dataset."""
    rows = sigs.map_batches(_explode_bands(cfg), batch_format="pyarrow")
    cap = cfg.lsh.max_group_pairs
    pairs = rows.groupby("gkey").map_groups(_emit_group_pairs(cap),
                                            batch_format="pyarrow")
    if cfg.lsh.salt_buckets > 1:
        reps = rows.groupby("gkey").map_groups(_emit_group_reps(),
                                               batch_format="pyarrow")
        rep_pairs = reps.groupby("band_key").map_groups(
            _emit_group_pairs(cap), batch_format="pyarrow")
        pairs = pairs.union(rep_pairs)
    # canonical pair dedup (same pair can surface from up to `bands` buckets);
    # replaces the reference's triu-k1 uniqueness guarantee
    # (selfclean_cleaner.py:171-177)
    deduped = pairs.groupby(["id_a", "id_b"]).aggregate(Count(alias_name="_n"))
    return deduped.select_columns(["id_a", "id_b"])
