"""Incremental dedup: dedupe an INCREMENT of new files against an
already-signed base WITHOUT re-scanning the base content.

The reference has no incremental story — SelfClean refits the full N x N
matrix on every run (selfclean/cleaner/selfclean_cleaner.py:105-146, fit is
all-or-nothing). A 100 TB training-data pipeline ingests increments daily, so
this stage closes that gap: the base side contributes only its STORED
signature rows (id, content_sha256, minhash, shingles — the exact output the
flagship pipeline already checkpoints per partition), while the expensive
content scan (tokenize + shingle + MinHash, ~60% of flagship wall, plus the
content read itself) runs over the increment only.

Semantics (the contract the SQL oracle replays): emit every verified pair
(id_a < id_b) with >= 1 endpoint in the increment —
  - exact      : identical content (same sha256), distance 0;
  - near_dup   : shingle Jaccard >= cfg.verify.threshold, not exact;
  - substring  : containment >= cfg.verify.containment_threshold (own kind,
                 excluded from the distance plane, as in the full pipeline) —
plus the KEEP-DELTA: a new doc is kept iff its connected component over the
incremental distance pairs contains no base doc and it is the min-id new doc
of that component. Appending keep-delta survivors to the base keep-list
yields the same invariant the full keep-list has: no two kept docs are
connected by a verified pair.

Scale design:
  - base-side costs are one (sha256, id) sort over base+new (40 B/row fixed
    width) and a band explode of the base REPRESENTATIVES — no content.
    A production deployment would persist the rep-id set and the sha->members
    map from the base run (both are by-products of the flagship pipeline) and
    skip even that sort; they are re-derived here so base_sigs stays the only
    base-side input.
  - bucket prune: base band rows are semi-joined on the increment's distinct
    band keys BEFORE pair emission, so the pure-base buckets (the vast
    majority) never reach the run-scan.
  - all small-side lookups (new-id set, new band keys, new shas) broadcast
    while under candidates.DRIVER_SMALL_LIMIT rows with hash-join fallbacks
    beyond — the same split the rest of the engine uses, exercised by the
    forced-fallback tests.
  - the incremental LSH pass runs UNSALTED (hot buckets degrade to the
    logged star-edge cap): salting exists to split full-corpus hot bands
    across partitions, while incremental buckets are pre-pruned to those a
    new doc touches; a manual cfg.lsh.salt_buckets > 1 is intentionally NOT
    honored here because new-vs-base rows landing in different salts of the
    same band would only meet in the full pipeline's round-2 rep pass.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Optional

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray.data

from raydedup.config import EngineConfig
from raydedup.stages import candidates as C
from raydedup.stages import cluster as CL
from raydedup.stages import verify as V
from raydedup.stages.expand import expand_to_members
from raydedup.util import collect_up_to, hash_join


@dataclass
class IncrementResult:
    """Outputs of one incremental dedup run."""
    new_signatures: ray.data.Dataset
    pairs: ray.data.Dataset        # verified pairs touching >= 1 new doc
    keep_delta: ray.data.Dataset   # (id,) new docs that survive dedup
    clusters: ray.data.Dataset     # (id, cluster_id) over the incr. graph


# ------------------------------------------------------------------ helpers
def _in_sorted(sorted_vals: np.ndarray, vals: np.ndarray) -> np.ndarray:
    """Membership mask of vals in a sorted int64 array (vectorized binary
    search — the per-batch cost of a broadcast semi-join)."""
    if len(sorted_vals) == 0:
        return np.zeros(len(vals), dtype=bool)
    pos = np.clip(np.searchsorted(sorted_vals, vals), 0,
                  len(sorted_vals) - 1)
    return sorted_vals[pos] == vals


def _distinct_keys(ds: ray.data.Dataset, col: str) -> ray.data.Dataset:
    from ray.data.aggregate import Count
    return ds.select_columns([col]).groupby(col) \
        .aggregate(Count(alias_name="_n")).select_columns([col])


def _semi_join(ds: ray.data.Dataset, keys: ray.data.Dataset, col: str,
               key_col: str, cfg: EngineConfig) -> ray.data.Dataset:
    """Rows of ds whose ds[col] is in keys[key_col]. Broadcast membership
    filter while the key set is driver-small; hash semi-join (against the
    DISTINCT key set, so no row multiplication) beyond. The key column is
    materialized first: it is consumed up to twice (collect probe + join
    build), and re-executing a lazy aggregate lineage per consumer was the
    dominant cost of the 1.6M-row incremental probe."""
    keys = keys.select_columns([key_col]).materialize()
    tbl = collect_up_to(keys, C.DRIVER_SMALL_LIMIT)
    if tbl is not None:
        if tbl.num_rows == 0:
            return ds.map_batches(lambda t: t.slice(0, 0),
                                  batch_format="pyarrow")
        vals = pc.unique(tbl.column(key_col).combine_chunks())

        def keep(t: pa.Table) -> pa.Table:
            m = pc.is_in(t.column(col), value_set=vals)
            return t.filter(pc.fill_null(m, False))

        return ds.map_batches(keep, batch_format="pyarrow")
    uk = _distinct_keys(keys, key_col)
    if key_col == col:
        uk = uk.rename_columns({key_col: f"_sj_{key_col}"})
        key_col = f"_sj_{key_col}"
    return hash_join(ds, uk, on=col, right_on=key_col,
                     num_partitions=cfg.join_num_partitions)


def _pairs_touching(pairs: ray.data.Dataset, ids: ray.data.Dataset,
                    cfg: EngineConfig) -> ray.data.Dataset:
    """Pairs with >= 1 endpoint in ids. Broadcast sorted-array membership
    while the id set fits cfg.broadcast_id_limit (int64 ids: 20M rows =
    160 MB, one object-store read per task); beyond, two flag joins (flag =
    max over (ids:1, endpoints:0) — complete on every endpoint, so the
    inner hash joins lose no pair rows)."""
    tbl = collect_up_to(ids.select_columns(["id"]), cfg.broadcast_id_limit)
    if tbl is not None:
        id_set = np.unique(
            tbl.column("id").to_numpy(zero_copy_only=False)) \
            if tbl.num_rows else np.empty(0, np.int64)

        def keep(t: pa.Table) -> pa.Table:
            a = t.column("id_a").to_numpy(zero_copy_only=False)
            b = t.column("id_b").to_numpy(zero_copy_only=False)
            m = _in_sorted(id_set, a) | _in_sorted(id_set, b)
            return t.filter(pa.array(m))

        return pairs.map_batches(keep, batch_format="pyarrow")

    pairs = pairs.materialize()      # consumed by flag build + two joins
    flags = _endpoint_flags(pairs, ids, cfg).materialize()
    j1 = hash_join(pairs, flags.rename_columns(
        {"id": "_fa", "flag": "flag_a"}), on="id_a", right_on="_fa",
        num_partitions=cfg.join_num_partitions)
    j2 = hash_join(j1, flags.rename_columns(
        {"id": "_fb", "flag": "flag_b"}), on="id_b", right_on="_fb",
        num_partitions=cfg.join_num_partitions)

    def fin(t: pa.Table) -> pa.Table:
        m = pc.or_(pc.equal(t.column("flag_a"), pa.scalar(1)),
                   pc.equal(t.column("flag_b"), pa.scalar(1)))
        return t.filter(m).drop_columns(["flag_a", "flag_b"])

    return j2.map_batches(fin, batch_format="pyarrow")


def _endpoint_flags(pairs: ray.data.Dataset, new_ids: ray.data.Dataset,
                    cfg: EngineConfig) -> ray.data.Dataset:
    """(id, flag) for every pair endpoint and every new id: flag = 1 iff the
    id is new. One Max aggregate over a tagged union — no join, no set."""
    from ray.data.aggregate import Max

    def tag(flag: int):
        def fn(t: pa.Table) -> pa.Table:
            n = t.num_rows
            return pa.table({
                "id": t.column(t.column_names[0]).cast(pa.int64()),
                "flag": pa.array(np.full(n, flag, np.int64)),
            })
        return fn

    ends = pairs.select_columns(["id_a"]).map_batches(
        tag(0), batch_format="pyarrow").union(
        pairs.select_columns(["id_b"]).map_batches(
            tag(0), batch_format="pyarrow"),
        new_ids.select_columns(["id"]).map_batches(
            tag(1), batch_format="pyarrow"))
    return ends.groupby("id").aggregate(Max("flag", alias_name="flag"))


def _filter_rep_ids(sigs: ray.data.Dataset, rep_ids: ray.data.Dataset,
                    cfg: EngineConfig) -> ray.data.Dataset:
    """Signature rows of the representative ids (same broadcast-isin /
    hash-join split as pipeline._exact_pairs_and_reps)."""
    tbl = collect_up_to(rep_ids, cfg.broadcast_id_limit)
    if tbl is not None:
        id_set = np.sort(tbl.column("id").to_numpy(zero_copy_only=False)) \
            if tbl.num_rows else np.empty(0, np.int64)

        def keep(t: pa.Table) -> pa.Table:
            ids = t.column("id").to_numpy(zero_copy_only=False)
            return t.filter(pa.array(_in_sorted(id_set, ids)))

        return sigs.map_batches(keep, batch_format="pyarrow")
    return hash_join(sigs, rep_ids.rename_columns({"id": "rep_id"}),
                     on="id", right_on="rep_id",
                     num_partitions=cfg.join_num_partitions)


# ------------------------------------------------------------------- planes
def incremental_pairs(new_sigs: ray.data.Dataset,
                      base_sigs: ray.data.Dataset,
                      cfg: Optional[EngineConfig] = None
                      ) -> ray.data.Dataset:
    """Verified pairs (exact + near_dup + substring) touching >= 1 new doc.

    Same machinery as the flagship (sha fast path, rep collapse, LSH
    run-scan, broadcast verify, member expansion) restricted to the
    increment's reach; see the module docstring for the pruning steps."""
    cfg = cfg or EngineConfig()
    new_ids = new_sigs.select_columns(["id"]).materialize()
    new_shas = _distinct_keys(new_sigs, "content_sha256").materialize()

    # one (sha, id) sort over base+new serves reps, exact groups, expansion
    all_sigs = base_sigs.union(new_sigs)
    srt = all_sigs.select_columns(["content_sha256", "id"]) \
        .sort("content_sha256").materialize()

    # ---- exact plane: complete groups whose sha a new doc shares.
    # The broadcast membership filter preserves block and row order, so the
    # filtered rows are still globally sha-sorted — no re-sort; only the
    # hash-join fallback (order-destroying) pays one.
    sha_tbl = collect_up_to(new_shas, C.DRIVER_SMALL_LIMIT)
    if sha_tbl is not None:
        sha_vals = pc.unique(
            sha_tbl.column("content_sha256").combine_chunks()) \
            if sha_tbl.num_rows else pa.array([], pa.string())

        def keep_sha(t: pa.Table) -> pa.Table:
            m = pc.is_in(t.column("content_sha256"), value_set=sha_vals)
            return t.filter(pc.fill_null(m, False))

        touched = srt.map_batches(keep_sha, batch_format="pyarrow") \
            .materialize()
    else:
        touched = _semi_join(srt, new_shas, "content_sha256",
                             "content_sha256", cfg) \
            .sort("content_sha256").materialize()
    exact_all = C.grouped_pairs(None, "content_sha256",
                                cfg.lsh.max_group_pairs,
                                cfg.join_num_partitions, mode="all",
                                srt=touched)
    exact_pairs = _pairs_touching(exact_all, new_ids, cfg) \
        .map_batches(V.exact_score_table, batch_format="pyarrow")

    # ---- near plane over representatives (one per distinct content)
    rep_ids = C.run_minima(srt, "content_sha256")
    # banding needs only (id, n_shingles, minhash); the rep filter is fused
    # into the band explode rather than materializing a near-full-width
    # copy of the signature table (same fix as the flagship — the shingle
    # payload dominates signature bytes, and verification reads it from
    # the unfiltered table since candidate pairs reference rep ids only)
    # deliberately NOT materialized although two consumers below re-execute
    # this lineage (the newside gkey collect and the pruned explode): the
    # scan fuses with the base-signature parquet read, and re-running that
    # fused read twice measures 3x CHEAPER end-to-end than forcing the
    # minhash payload (~1 KB/row) through the object store as a barrier
    # (bench incremental_dedup 7.5 s lazy vs 22.2 s materialized at
    # 50k-base/32 CPUs — same trade as the flagship's fused-read fix)
    rep_band = _filter_rep_ids(
        all_sigs.select_columns(["id", "n_shingles", "minhash"]),
        rep_ids, cfg)
    # reps of groups containing a new doc (the "new side"; the rep itself
    # may be a base id when the group's min id is old)
    newside_rep_ids = C.run_minima(touched, "content_sha256") \
        .materialize()

    # bucket prune: only buckets a new-side rep touches can yield new pairs.
    # Explode the NEWSIDE reps' bands first (increment-sized: |new reps| x
    # bands rows) and collect their distinct gkeys as ONE broadcast sorted
    # array, then fuse the membership filter INTO the base band explode —
    # the full |reps| x bands row set streams through a single filter pass
    # and never materializes or shuffles. (The previous shape — materialize
    # the full explode, then hash-semi-join it on a lazily-aggregated key
    # set — re-executed the key lineage three times and shuffled 51M rows
    # at a 1.6M-doc base: 209 s of the 295 s probe wall.)
    newside_rows = _filter_rep_ids(rep_band, newside_rep_ids, cfg) \
        .map_batches(C._explode_bands(cfg, 1), batch_format="pyarrow")
    gk_tbl = collect_up_to(newside_rows.select_columns(["gkey"]),
                           cfg.broadcast_id_limit)
    if gk_tbl is not None:
        gkeys = np.unique(
            gk_tbl.column("gkey").to_numpy(zero_copy_only=False)) \
            if gk_tbl.num_rows else np.empty(0, np.int64)
        _explode = C._explode_bands(cfg, 1)

        def explode_pruned(t: pa.Table) -> pa.Table:
            out = _explode(t)
            g = out.column("gkey").to_numpy(zero_copy_only=False)
            return out.filter(pa.array(_in_sorted(gkeys, g)))

        rows = rep_band.map_batches(explode_pruned, batch_format="pyarrow")
    else:
        # key set beyond the broadcast budget: materialize the full band
        # explode (two consumers) and prune via distributed semi-joins
        rows_all = rep_band.map_batches(C._explode_bands(cfg, 1),
                                        batch_format="pyarrow").materialize()
        newside_d = _semi_join(rows_all, newside_rep_ids, "id", "id", cfg)
        rows = _semi_join(rows_all, _distinct_keys(newside_d, "gkey"),
                          "gkey", "gkey", cfg)
    cand = C.grouped_pairs(rows.select_columns(["gkey", "id"]), "gkey",
                           cfg.lsh.max_group_pairs,
                           cfg.join_num_partitions, mode="all")
    cand = C.dedupe_pairs(_pairs_touching(cand, newside_rep_ids, cfg))
    rep_verified = V.verify_pairs(cand, all_sigs, cfg)
    near_pairs = _pairs_touching(
        expand_to_members(rep_verified, srt, cfg), new_ids, cfg)

    return exact_pairs.union(near_pairs)


def incremental_keep_delta(pairs: ray.data.Dataset,
                           new_ids: ray.data.Dataset,
                           cfg: Optional[EngineConfig] = None
                           ) -> tuple[ray.data.Dataset, ray.data.Dataset]:
    """(keep_delta, clusters): connected components over the incremental
    DISTANCE pairs (exact + near_dup; substring rows are not metric pairs,
    exactly as in the full pipeline), then per component keep the min-id new
    doc iff the component contains no base doc. Returns the kept (id,) rows
    and the (id, cluster_id) labels (nodes = new ids + base endpoints)."""
    from ray.data.aggregate import Max, Min

    cfg = cfg or EngineConfig()
    dist = V.distance_pairs(pairs).materialize()
    # node set = distinct(dist endpoints ∪ new ids). Driver np.unique while
    # both sides are collectable (pair-scale data): a distributed distinct
    # here measured 24 s of pure groupby orchestration for 300k rows at the
    # 1.6M probe. Distributed distinct beyond the broadcast budget.
    end_tbl = collect_up_to(dist.select_columns(["id_a", "id_b"]),
                            cfg.broadcast_id_limit)
    nid_tbl = collect_up_to(new_ids.select_columns(["id"]),
                            cfg.broadcast_id_limit)
    if end_tbl is not None and nid_tbl is not None:
        parts = [nid_tbl.column("id").to_numpy(zero_copy_only=False)
                 .astype(np.int64)] if nid_tbl.num_rows else []
        if end_tbl.num_rows:
            parts += [end_tbl.column("id_a").to_numpy(zero_copy_only=False)
                      .astype(np.int64),
                      end_tbl.column("id_b").to_numpy(zero_copy_only=False)
                      .astype(np.int64)]
        uids = np.unique(np.concatenate(parts)) if parts \
            else np.empty(0, np.int64)
        nodes = ray.data.from_arrow(
            pa.table({"id": pa.array(uids, pa.int64())}))
    else:
        ends = dist.select_columns(["id_a"]) \
            .rename_columns({"id_a": "id"}) \
            .union(dist.select_columns(["id_b"])
                   .rename_columns({"id_b": "id"}))
        nodes = _distinct_keys(ends.union(new_ids.select_columns(["id"])),
                               "id")
    clusters = CL.connected_components(dist, nodes, cfg).materialize()

    tbl = collect_up_to(new_ids.select_columns(["id"]),
                        cfg.broadcast_id_limit)
    if tbl is not None:
        vals = np.unique(
            tbl.column("id").to_numpy(zero_copy_only=False)) \
            if tbl.num_rows else np.empty(0, np.int64)

        def mark(t: pa.Table) -> pa.Table:
            ids = t.column("id").to_numpy(zero_copy_only=False)
            is_new = _in_sorted(vals, ids)
            return pa.table({
                "cluster_id": t.column("cluster_id"),
                "new_key": pa.array(
                    np.where(is_new, ids, np.iinfo(np.int64).max),
                    pa.int64()),
                "old": pa.array((~is_new).astype(np.int64), pa.int64()),
            })

        marked = clusters.map_batches(mark, batch_format="pyarrow")
    else:
        flags = _endpoint_flags(dist, new_ids, cfg)
        j = hash_join(clusters, flags.rename_columns({"id": "_fid"}),
                      on="id", right_on="_fid",
                      num_partitions=cfg.join_num_partitions)

        def mark_j(t: pa.Table) -> pa.Table:
            ids = t.column("id").to_numpy(zero_copy_only=False)
            is_new = t.column("flag").to_numpy(zero_copy_only=False) == 1
            return pa.table({
                "cluster_id": t.column("cluster_id"),
                "new_key": pa.array(
                    np.where(is_new, ids, np.iinfo(np.int64).max),
                    pa.int64()),
                "old": pa.array((~is_new).astype(np.int64), pa.int64()),
            })

        marked = j.map_batches(mark_j, batch_format="pyarrow")

    # per-cluster (min new_key, max old): driver reduceat while the marked
    # rows are collectable (they are node-scale — a distributed Min/Max
    # groupby here measured 12 s of orchestration for 216k rows at the
    # 1.6M probe); hash-aggregate fallback beyond.
    mtbl = collect_up_to(marked, cfg.broadcast_id_limit)
    if mtbl is not None:
        if mtbl.num_rows == 0:
            return ray.data.from_arrow(
                pa.table({"id": pa.array([], pa.int64())})), clusters
        cid = mtbl.column("cluster_id").to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        nk = mtbl.column("new_key").to_numpy(zero_copy_only=False)
        old = mtbl.column("old").to_numpy(zero_copy_only=False)
        order = np.argsort(cid, kind="stable")
        cid, nk, old = cid[order], nk[order], old[order]
        starts = np.nonzero(np.r_[True, cid[1:] != cid[:-1]])[0]
        keep_id = np.minimum.reduceat(nk, starts)
        has_old = np.maximum.reduceat(old, starts)
        sel = (has_old == 0) & (keep_id != np.iinfo(np.int64).max)
        return ray.data.from_arrow(pa.table(
            {"id": pa.array(keep_id[sel], pa.int64())})), clusters

    agg = marked.groupby("cluster_id").aggregate(
        Min("new_key", alias_name="keep_id"),
        Max("old", alias_name="has_old"))

    def fin(t: pa.Table) -> pa.Table:
        m = pc.and_(pc.equal(t.column("has_old"), pa.scalar(0)),
                    pc.not_equal(t.column("keep_id"),
                                 pa.scalar(np.iinfo(np.int64).max)))
        return pa.table({"id": t.filter(m).column("keep_id")})

    return agg.map_batches(fin, batch_format="pyarrow"), clusters


def incremental_dedup(new_sigs: ray.data.Dataset,
                      base_sigs: ray.data.Dataset,
                      cfg: Optional[EngineConfig] = None) -> IncrementResult:
    """Full incremental run over precomputed signatures (the stored base
    signatures + the increment's, from signatures.compute_signatures)."""
    cfg = cfg or EngineConfig()
    pairs = incremental_pairs(new_sigs, base_sigs, cfg).materialize()
    keep, clusters = incremental_keep_delta(
        pairs, new_sigs.select_columns(["id"]), cfg)
    return IncrementResult(new_signatures=new_sigs, pairs=pairs,
                           keep_delta=keep, clusters=clusters)


def incremental_on_files(new_files: ray.data.Dataset,
                         base_sigs: ray.data.Dataset,
                         cfg: Optional[EngineConfig] = None,
                         pre_blocked: bool = False) -> IncrementResult:
    """Convenience entry: ingest + sign the increment (the only content
    scan), then dedupe it against the stored base signatures.

    The increment's blocks are coalesced to the flagship's rows-per-block
    target before signing: a file-per-block source hands the signature
    stage hundreds of near-empty blocks whose per-task overhead then taxes
    EVERY pass of the pair plane (measured 3x on the 50k bench when the
    sig stage emitted 224 ~200-row blocks). base_sigs is used as given —
    stored signatures read from parquet arrive source-sized; callers
    producing them in-process should size them the same way.

    pre_blocked=True promises the increment's blocks are already
    right-sized at the source (read with override_num_blocks — same
    contract as pipeline.run_pipeline): the coalescing repartition is then
    SKIPPED, preserving read->sign fusion instead of re-exchanging every
    content byte through the object store."""
    from raydedup.pipeline import _target_blocks
    from raydedup.stages.ingest import ingest
    from raydedup.stages.signatures import compute_signatures
    cfg = cfg or EngineConfig()
    if not pre_blocked:
        try:
            cpus = int(ray.cluster_resources().get("CPU", 4))
            n = new_files.count()       # parquet source: metadata-only
            new_files = new_files.repartition(_target_blocks(n, cpus))
        except Exception:
            pass                        # unsized input still works
    new_sigs = compute_signatures(ingest(new_files), cfg).materialize()
    return incremental_dedup(new_sigs, base_sigs, cfg)
