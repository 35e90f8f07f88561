"""Flagship pipeline: read -> ingest -> signatures -> exact dedup fast path ->
LSH candidates over sha-representatives -> verify -> union exact+near edges ->
connected components -> ranking + duplicity.

Lifecycle mirrors SelfClean.run_on_image_folder -> fit -> predict
(selfclean/cleaner/selfclean.py:127-299, SURVEY §3) with the dense-matrix data
plane replaced by the content-hash plane sanctioned by BASELINE.json.

Scale design notes:
- content is dropped at the signature stage; only ids + hashes shuffle.
- exact-dup groups are collapsed to one representative per content_sha256
  BEFORE LSH: a group of g identical files would otherwise collide in all
  bands and explode candidate generation; the star edges (distance 0) keep
  the cluster intact and give the reference's "exact dup at rank 0, score 0"
  (tests/unittests/cleaner/near_duplicates/test_embedding_distance.py:22-40).
"""

from __future__ import annotations

from typing import Optional, Sequence

import numpy as np
import pyarrow as pa
import ray.data

from raydedup.config import EngineConfig
from raydedup.issues import DEFAULT_ISSUES, DedupResult, IssueType
from raydedup.util import hash_join
from raydedup.stages import candidates as C
from raydedup.stages import cluster as CL
from raydedup.stages import ingest as I
from raydedup.stages import rank as R
from raydedup.stages import signatures as S
from raydedup.stages import verify as V


def _exact_pairs_and_reps(sigs: ray.data.Dataset, cfg: EngineConfig):
    """ONE sha-sort serves both the exact-dup pair emission and the per-sha
    representative selection (SURVEY §2.7). Returns
    (exact_pairs, rep_cand_sigs, srt, n_reps).

    rep_cand_sigs is the LAZY banding-side projection (id, n_shingles,
    minhash) of the representative rows — never materialized: for a
    mostly-unique corpus it is ~a full copy of the signature table
    (measured 13.5 GB of 14 GB at 1.6M rows, a 77 s object-store copy
    whose bandwidth does not scale with CPUs), while its only consumer
    (LSH banding) fuses the filter into its own scan. The shingle payload
    is NOT carried: pair verification reads the full signature table
    directly — candidate pairs reference representative ids only, so the
    rep filter is a no-op there. When the rep id set fits the driver
    (cfg.broadcast_id_limit) the filter is a broadcast sorted-array
    membership test; beyond the limit it falls back to a hash join of the
    projection (n_reps is then None)."""
    srt = sigs.select_columns(["content_sha256", "id"]) \
        .sort("content_sha256").materialize()

    pairs = C.grouped_pairs(None, "content_sha256", cfg.lsh.max_group_pairs,
                            cfg.join_num_partitions, mode="all", srt=srt)

    exact_pairs = pairs.map_batches(V.exact_score_table,
                                    batch_format="pyarrow")

    rep_ids = C.run_minima(srt, "content_sha256")
    from raydedup.util import collect_up_to
    rep_tbl = collect_up_to(rep_ids, cfg.broadcast_id_limit)
    band_cols = ["id", "n_shingles", "minhash"]
    if rep_tbl is not None:
        n_reps = rep_tbl.num_rows
        id_set = np.sort(
            rep_tbl.column("id").to_numpy(zero_copy_only=False)) \
            if rep_tbl.num_rows else np.empty(0, np.int64)

        def keep_reps(t: pa.Table) -> pa.Table:
            ids = t.column("id").to_numpy(zero_copy_only=False)
            mask = np.zeros(len(ids), dtype=bool)
            if len(id_set):
                pos = np.searchsorted(id_set, ids)
                pos = np.clip(pos, 0, len(id_set) - 1)
                mask = id_set[pos] == ids
            return t.filter(pa.array(mask))

        rep_cand = sigs.select_columns(band_cols) \
            .map_batches(keep_reps, batch_format="pyarrow")
    else:
        n_reps = None
        rep_cand = hash_join(sigs.select_columns(band_cols),
                             rep_ids.rename_columns({"id": "rep_id"}),
                             on="id", right_on="rep_id",
                             num_partitions=cfg.join_num_partitions)
    return exact_pairs, rep_cand, srt, n_reps


def _target_blocks(n_rows: Optional[int], cpus: int) -> int:
    """Block count sized by rows, capped at 4/CPU: hundreds of near-empty
    blocks just multiply per-task overhead on small inputs (the round-1
    32-CPU regression), while ~2.5k rows/block keeps tasks meaningful."""
    if n_rows is None:
        return 4 * cpus
    return max(2, min(4 * cpus, n_rows // 2500 + 1))


def run_pipeline(code_files: ray.data.Dataset,
                 cfg: Optional[EngineConfig] = None,
                 issues_to_detect: Sequence[IssueType] = DEFAULT_ISSUES,
                 ckpt_dir: Optional[str] = None,
                 input_token: str = "",
                 pre_blocked: bool = False,
                 store_shingles: bool | None = None,
                 ) -> DedupResult:
    """Flagship run. With ckpt_dir set, every wide-stage output is written to
    per-stage Parquet with a lineage manifest; a rerun with the same config +
    input token resumes from the last completed stage (mid-shuffle resume).

    pre_blocked=True promises the input's blocks are already right-sized
    (e.g. read with override_num_blocks — see run_on_parquet), letting the
    pipeline skip its content repartition barrier so the read fuses straight
    into ingest+signatures and the raw content never enters the object
    store.

    store_shingles: None (default) picks cost-based — store the shingle
    payload below cfg.lean_sigs_min_rows rows (object-store-trivial
    there; the recompute's fixed re-read cost dominates), LEAN at or
    above it (or when the row count is unknown): the packed shingle-set
    column (~87% of the table's bytes at ~940 mean shingles/doc) is
    never stored and verification recomputes exact shingle sets from
    content for the candidate-touched subset only
    (verify.verify_pairs(shingle_source=...); bit-identical results,
    same kernels — parity-gated in tests/test_round4.py). True forces
    storing (the CLI --write-signatures surface feeding --base-sigs must
    be self-contained); False forces lean."""
    cfg = cfg or EngineConfig()
    issues = {IssueType.canonical(i) for i in issues_to_detect}

    ckpt = None
    if ckpt_dir is not None:
        import os

        from raydedup.checkpoint import CheckpointManager, config_hash
        os.makedirs(ckpt_dir, exist_ok=True)
        # input fingerprint: changed data at the same path must NOT silently
        # reuse stale checkpoints. Row count alone is not enough (edited
        # data can keep the count) — fold the source files' names, sizes
        # and mtimes (cheap stats, no data scan) into the lineage token;
        # in-memory inputs fall back to the row count.
        import hashlib as _hashlib
        try:
            _fp = f"rows={code_files.count()}"
            _files = sorted(code_files.input_files() or [])
            if _files:
                _meta = []
                for _p in _files:
                    try:
                        _st = os.stat(_p)
                        _meta.append(f"{_p}:{_st.st_size}:"
                                     f"{int(_st.st_mtime_ns)}")
                    except OSError:
                        _meta.append(_p)
                _fp += "#files=" + _hashlib.sha256(
                    ";".join(_meta).encode()).hexdigest()[:16]
        except Exception:
            _fp = "unknown"
        ckpt = CheckpointManager(root=ckpt_dir, cfg_hash=config_hash(cfg),
                                 input_token=f"{input_token}#{_fp}")

    import os
    import time as _time
    debug_t = os.environ.get("RAYDEDUP_TIMING")
    _t0 = _time.perf_counter()

    def _lap(name):
        if debug_t:
            print(f"[timing] {name}: {_time.perf_counter() - _t0:.1f}s",
                  flush=True)

    def staged(name, build):
        if ckpt is not None:
            out = ckpt.stage(name, build)
        else:
            out = build().materialize()
        _lap(name)
        return out

    # signatures fan out to 4+ consumers (exact pairs, reps, ids, label
    # errors) — checkpoint/materialize once so the content scan + hashing
    # runs once, not per consumer (~3 KB/row, content dropped). Blocks are
    # coalesced to ~4/CPU: the read stage splits into hundreds of small
    # blocks and every downstream scan would pay per-task overhead on each.
    import ray as _ray
    try:
        _cpus = int(_ray.cluster_resources().get("CPU", 4))
    except Exception:
        _cpus = 4
    try:
        _n_rows = code_files.count()    # parquet: metadata-only
    except Exception:
        _n_rows = None
    _blocks = _target_blocks(_n_rows, _cpus)
    if store_shingles is None:
        # cost-based: see the docstring; unknown row count -> lean (the
        # safe choice at scale, and in-memory toy inputs answer count())
        store_shingles = _n_rows is not None \
            and _n_rows < cfg.lean_sigs_min_rows
    # pre_blocked inputs were block-sized at the read: skip the all-to-all
    # content exchange (it re-wrote every content byte to the object store,
    # and /dev/shm's concurrent page-fault path is this host's measured
    # scaling ceiling — evidence/scaling_r3/flag_t{4,16}.log)
    _sized = code_files if pre_blocked else code_files.repartition(_blocks)
    if ckpt is not None:
        # partition-granular checkpoint: signatures land in
        # ckpt_part=<id % P> dirs with per-part commit markers, so a resumed
        # run recomputes only unfinished partitions (north_star
        # "checkpoints per-partition signatures").
        P = cfg.ckpt_num_parts

        def _with_part(ds):
            def add(t: pa.Table) -> pa.Table:
                ids = t.column("id").to_numpy(zero_copy_only=False)
                return t.append_column(
                    "ckpt_part",
                    pa.array(ids.astype(np.int64) % np.int64(P), pa.int64()))

            return ds.map_batches(add, batch_format="pyarrow")

        # same pre-signature content repartition as the non-ckpt branch:
        # without it a checkpointed run feeds the signature stage the read
        # stage's hundreds of near-empty blocks (the measured per-task-
        # overhead regression the non-ckpt comment below documents)
        from raydedup.schema import SIGNATURES, SIGNATURES_LEAN
        sigs = ckpt.partitioned_stage(
            # lean tables get their own stage name: a resume must never mix
            # partition files written under the other schema
            "signatures" if store_shingles else "signatures-lean",
            lambda: I.ingest(_sized),
            lambda ds: _with_part(S.compute_signatures(
                ds, cfg, with_shingles=store_shingles)),
            num_parts=P, chunk_parts=cfg.ckpt_chunk_parts,
            empty_schema=SIGNATURES if store_shingles else SIGNATURES_LEAN)
        _lap("signatures")
    else:
        # repartition the raw content BEFORE the signature stage rather than
        # the wider signature payload after it: the exchange moves the
        # ~1.2 GB content instead of the ~3.2 GB signature rows, and the
        # signature actors start from right-sized blocks (A/B at 400k rows:
        # 16 CPUs signatures 11.6 s vs 14.2 s, 4 CPUs total 46.7 s vs
        # 70.6 s).
        sigs = staged("signatures",
                      lambda: S.compute_signatures(
                          I.ingest(_sized), cfg,
                          with_shingles=store_shingles))
    # verify-time shingle source for lean runs: the (id, content)
    # projection of the sized input (lazy — re-executes the pruned read
    # only over the candidate-touched semi-filter)
    shingle_src = None if store_shingles else I.ids_and_content(_sized)

    # exact-dup fast path (SURVEY §2.7) + one representative per distinct
    # content for the near-dup plane (consumed by candidates AND verify)
    exact_pairs, rep_cand, sha_sort, n_reps = _exact_pairs_and_reps(sigs, cfg)
    _lap("exact+reps build")

    # verified pairs are the hub of every downstream ranking/clustering stage
    # and are small (only pairs above threshold). Rep-level near-dup pairs are
    # expanded back to exact-group members so the pair list matches the
    # reference's all-pairs semantics (embedding_distance_mixin.py:41-83).
    from raydedup.stages.expand import expand_to_members
    if ckpt is not None:
        # partition-granular resume for the second-most-expensive stage:
        # candidate pairs are checkpointed once (a sort — cheap to redo),
        # then VERIFICATION runs per ckpt_part = pair_hash % P with
        # per-part commit markers, so a kill mid-verify loses at most one
        # chunk of partitions. Expansion + the exact-pair union stay in the
        # final (cheap) stage whose body just rereads the partition files.
        P = cfg.ckpt_num_parts

        def _pair_key_col(t: pa.Table) -> pa.Table:
            a = t.column("id_a").to_numpy(zero_copy_only=False) \
                .astype(np.int64).view(np.uint64)
            b = t.column("id_b").to_numpy(zero_copy_only=False) \
                .astype(np.int64).view(np.uint64)
            from raydedup import kernels as K
            key = K.to_i63(K.splitmix64(K.splitmix64(a) ^ b))
            return t.append_column("ckpt_key", pa.array(key, pa.int64()))

        def _with_pair_part(ds):
            def add(t: pa.Table) -> pa.Table:
                kt = _pair_key_col(t)
                key = kt.column("ckpt_key").to_numpy(zero_copy_only=False)
                return t.append_column(
                    "ckpt_part", pa.array(key % np.int64(P), pa.int64()))

            return ds.map_batches(add, batch_format="pyarrow")

        cands = ckpt.stage("candidates",
                           lambda: C.candidate_pairs(rep_cand, cfg,
                                                     n_rows=n_reps))
        rep_verified = ckpt.partitioned_stage(
            "verified_rep_pairs",
            lambda: cands.map_batches(_pair_key_col,
                                      batch_format="pyarrow"),
            # full sigs, not the rep projection: candidate pairs reference
            # representative ids only, and verify filters to pair members
            lambda ds: _with_pair_part(V.verify_pairs(
                ds, sigs, cfg, shingle_source=shingle_src)),
            num_parts=P, chunk_parts=cfg.ckpt_chunk_parts,
            key_col="ckpt_key",
            empty_schema=pa.schema(V.VERIFIED_FIELDS))
        _lap("verified_rep_pairs")
        verified = staged("verified_pairs", lambda: exact_pairs.union(
            expand_to_members(rep_verified, sha_sort, cfg)))
    else:
        verified = staged("verified_pairs", lambda: exact_pairs.union(
            expand_to_members(
                V.verify_pairs(C.candidate_pairs(rep_cand, cfg,
                                                 n_rows=n_reps),
                               sigs, cfg, shingle_source=shingle_src),
                sha_sort, cfg)))

    result = DedupResult(cfg=cfg,
                         ingested=I.ingest(code_files), signatures=sigs,
                         verified_pairs=verified)
    # substring/containment matches are kept in verified_pairs as their own
    # surface, but they are NOT distance-metric pairs (their Jaccard distance
    # is above the threshold cut): the single-linkage-cut analog (CC),
    # duplicity and label-error minima consume only true distance pairs —
    # matching the reference's cut-at-threshold semantics (SURVEY §2.5).
    dist_pairs = V.distance_pairs(verified)

    if IssueType.NEAR_DUPLICATES in issues:
        result.ranked_pairs = R.ranked_pairs(verified)
    if IssueType.OFF_TOPIC in issues or IssueType.NEAR_DUPLICATES in issues:
        ids = sigs.select_columns(["id"])
        result.clusters = staged(
            "clusters", lambda: CL.connected_components(dist_pairs, ids, cfg))
        result.duplicity = R.duplicity(dist_pairs, result.clusters, cfg)
        _lap("duplicity build")
    if IssueType.LABEL_ERRORS in issues:
        from raydedup.stages.labelerrors import label_error_scores
        result.label_errors = label_error_scores(dist_pairs, sigs, cfg)

    # auto-cleaning (perform_auto_cleaning analog,
    # selfclean/cleaner/auto_cleaning_mixin.py:37-89): attach auto_issue
    # flags from fraction_cut over each issue's score column.
    # DOCUMENTED DEVIATION: for near-dup pairs the reference fits the cut on
    # the FULL condensed N(N-1)/2 distance vector; here the fit runs on the
    # sparse verified-pair scores only (all <= 1-threshold), so the quantile
    # anchors and M differ structurally — the engine never materializes the
    # N^2 vector by design. Flags agree when the contaminated tail (what the
    # cut targets) lies inside the verified set, which is the regime the
    # auto-clean is for; pair_rule=True preserves the alpha^2 pair
    # treatment the length-based detection would otherwise miss.
    if cfg.autoclean.enabled:
        from raydedup.stages.autoclean import fraction_cut_dataset
        n = sigs.count()
        if result.ranked_pairs is not None:
            if cfg.autoclean.full_condensed_m:
                # reference-EXACT opt-in (closes the deviation above for
                # small N): fit on the FULL condensed N(N-1)/2 exact-
                # Jaccard distance vector; pair_rule=None lets the
                # reference's length-based M == N(N-1)/2 detection square
                # alpha itself (auto_cleaning_mixin.py:102-105)
                from raydedup.stages.autoclean import condensed_distances
                fit_vec = condensed_distances(
                    sigs, cfg, shingle_source=shingle_src)
                result.ranked_pairs = fraction_cut_dataset(
                    result.ranked_pairs, "distance", n,
                    alpha=cfg.autoclean.cut_off,
                    q=cfg.autoclean.significance,
                    ascending=True, pair_rule=None, fit_scores=fit_vec)
            else:
                # fit on distance-metric pairs only (substring rows are
                # not on the 1-J metric and would inflate M / shift the
                # anchors); the flag is applied to the full ranked
                # surface — substring rows sit above the cut and tag False
                result.ranked_pairs = fraction_cut_dataset(
                    result.ranked_pairs, "distance", n,
                    alpha=cfg.autoclean.cut_off,
                    q=cfg.autoclean.significance,
                    ascending=True, pair_rule=True, fit_ds=dist_pairs)
        if result.duplicity is not None:
            result.duplicity = fraction_cut_dataset(
                result.duplicity, "off_topic_score", n,
                alpha=cfg.autoclean.cut_off, q=cfg.autoclean.significance,
                ascending=False)
        if result.label_errors is not None:
            result.label_errors = fraction_cut_dataset(
                result.label_errors, "score", n,
                alpha=cfg.autoclean.cut_off, q=cfg.autoclean.significance,
                ascending=True)
        _lap("autoclean")
    return result


def run_on_parquet(path: str, cfg: Optional[EngineConfig] = None,
                   issues_to_detect: Sequence[IssueType] = DEFAULT_ISSUES,
                   ckpt_dir: Optional[str] = None,
                   store_shingles: bool | None = None) -> DedupResult:
    """Flagship entry (analog of run_on_image_folder, selfclean.py:127-173).

    Sizes the read's blocks at the source so run_pipeline can skip its
    content repartition barrier (pre_blocked) — the read then fuses with
    ingest+signatures and raw content never enters the object store."""
    src = I.read_code_files(path)
    try:
        n_rows = src.count()            # parquet: metadata-only
        import ray as _ray
        cpus = int(_ray.cluster_resources().get("CPU", 4))
        src = I.read_code_files(path, num_blocks=_target_blocks(n_rows, cpus))
        pre = True
    except Exception:
        pre = False
    return run_pipeline(src, cfg, issues_to_detect,
                        ckpt_dir=ckpt_dir, input_token=path, pre_blocked=pre,
                        store_shingles=store_shingles)
