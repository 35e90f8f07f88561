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
from raydedup.stages import candidates as C
from raydedup.stages import cluster as CL
from raydedup.stages import ingest as I
from raydedup.stages import rank as R
from raydedup.stages import signatures as S
from raydedup.stages import verify as V


def _exact_group_pairs(cap: int):
    """Per-sha group -> (pairs at distance 0, rep rows)."""

    def fn(t: pa.Table) -> pa.Table:
        ids = np.sort(t.column("id").to_numpy(zero_copy_only=False)
                      .astype(np.int64))
        a, b = C.emit_pairs(ids, cap)
        return pa.table({
            "id_a": pa.array(a, pa.int64()),
            "id_b": pa.array(b, pa.int64()),
            "est_jaccard": pa.array(np.ones(len(a)), pa.float64()),
            "jaccard": pa.array(np.ones(len(a)), pa.float64()),
            "distance": pa.array(np.zeros(len(a)), pa.float64()),
        })

    return fn


def _sha_representatives():
    """Per-sha group -> the signature row with the min id."""

    def fn(t: pa.Table) -> pa.Table:
        ids = t.column("id").to_numpy(zero_copy_only=False)
        return t.take([int(np.argmin(ids))])

    return fn


def run_pipeline(code_files: ray.data.Dataset,
                 cfg: Optional[EngineConfig] = None,
                 issues_to_detect: Sequence[IssueType] = DEFAULT_ISSUES,
                 ckpt_dir: Optional[str] = None,
                 input_token: str = "",
                 ) -> DedupResult:
    """Flagship run. With ckpt_dir set, every wide-stage output is written to
    per-stage Parquet with a lineage manifest; a rerun with the same config +
    input token resumes from the last completed stage (mid-shuffle resume)."""
    cfg = cfg or EngineConfig()
    issues = {IssueType.canonical(i) for i in issues_to_detect}

    ckpt = None
    if ckpt_dir is not None:
        import os

        from raydedup.checkpoint import CheckpointManager, config_hash
        os.makedirs(ckpt_dir, exist_ok=True)
        ckpt = CheckpointManager(root=ckpt_dir, cfg_hash=config_hash(cfg),
                                 input_token=input_token)

    def staged(name, build):
        if ckpt is not None:
            return ckpt.stage(name, build)
        return build().materialize()

    # signatures fan out to 4+ consumers (exact pairs, reps, ids, label
    # errors) — checkpoint/materialize once so the content scan + hashing
    # runs once, not per consumer (~3 KB/row, content dropped).
    sigs = staged("signatures",
                  lambda: S.compute_signatures(I.ingest(code_files), cfg))

    # exact-dup fast path (SURVEY §2.7): star/all pairs within sha groups
    exact_pairs = sigs.select_columns(["id", "content_sha256"]) \
        .groupby("content_sha256") \
        .map_groups(_exact_group_pairs(cfg.lsh.max_group_pairs),
                    batch_format="pyarrow")

    # one representative per distinct content for the near-dup plane;
    # consumed by candidates AND verify
    rep_sigs = staged("rep_sigs",
                      lambda: sigs.groupby("content_sha256").map_groups(
                          _sha_representatives(), batch_format="pyarrow"))

    # verified pairs are the hub of every downstream ranking/clustering stage
    # and are small (only pairs above threshold)
    verified = staged("verified_pairs", lambda: exact_pairs.union(
        V.verify_pairs(C.candidate_pairs(rep_sigs, cfg), rep_sigs, cfg)))

    result = DedupResult(ingested=I.ingest(code_files), signatures=sigs,
                         verified_pairs=verified)

    if IssueType.NEAR_DUPLICATES in issues:
        result.ranked_pairs = R.ranked_pairs(verified)
    if IssueType.OFF_TOPIC in issues or IssueType.NEAR_DUPLICATES in issues:
        ids = sigs.select_columns(["id"])
        result.clusters = staged(
            "clusters", lambda: CL.connected_components(verified, ids, cfg))
        result.duplicity = R.duplicity(verified, result.clusters, cfg)
    if IssueType.LABEL_ERRORS in issues:
        from raydedup.stages.labelerrors import label_error_scores
        result.label_errors = label_error_scores(verified, sigs, cfg)
    return result


def run_on_parquet(path: str, cfg: Optional[EngineConfig] = None,
                   issues_to_detect: Sequence[IssueType] = DEFAULT_ISSUES,
                   ckpt_dir: Optional[str] = None) -> DedupResult:
    """Flagship entry (analog of run_on_image_folder, selfclean.py:127-173)."""
    return run_pipeline(I.read_code_files(path), cfg, issues_to_detect,
                        ckpt_dir=ckpt_dir, input_token=path)
