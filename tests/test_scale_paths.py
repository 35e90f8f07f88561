"""Exercise the at-scale fallback paths that the small-data defaults bypass:
aggregate-based pair dedupe, join-based verification, distributed boundary
handling. These are the code paths a 10^12-row run would take."""

import numpy as np
import pandas as pd
import pytest
import ray.data as rd

from raydedup.config import EngineConfig
from raydedup.issues import IssueType
from raydedup.pipeline import run_pipeline
from raydedup.stages import candidates as C


@pytest.fixture()
def small_limit(monkeypatch):
    monkeypatch.setattr(C, "DRIVER_SMALL_LIMIT", 0)


def test_aggregate_dedupe_path(small_limit):
    import pyarrow as pa
    pairs = rd.from_arrow(pa.table({
        "id_a": pa.array([1, 1, 2, 1], pa.int64()),
        "id_b": pa.array([5, 5, 6, 5], pa.int64()),
    }))
    out = C.dedupe_pairs(pairs).to_pandas().sort_values(
        ["id_a", "id_b"]).reset_index(drop=True)
    assert list(zip(out.id_a, out.id_b)) == [(1, 5), (2, 6)]


def test_pipeline_with_forced_distributed_paths(tiny_corpus, monkeypatch):
    """Same cluster assignments when every driver shortcut is disabled:
    aggregate dedupe + boundary joins (DRIVER_SMALL_LIMIT=0), join-based
    verify (broadcast_id_limit=0), distributed CC (cc_driver_edge_limit=0)."""
    code, _ = tiny_corpus
    base = run_pipeline(rd.from_arrow(code),
                        issues_to_detect=[IssueType.NEAR_DUPLICATES])
    cl_base = base.clusters.to_pandas()

    monkeypatch.setattr(C, "DRIVER_SMALL_LIMIT", 0)
    cfg = EngineConfig(broadcast_id_limit=0, cc_driver_edge_limit=0,
                       join_num_partitions=4)
    forced = run_pipeline(rd.from_arrow(code), cfg,
                          issues_to_detect=[IssueType.NEAR_DUPLICATES])
    cl_forced = forced.clusters.to_pandas()

    a = dict(zip(cl_base.id, cl_base.cluster_id))
    b = dict(zip(cl_forced.id, cl_forced.cluster_id))
    from tests.oracle import same_cluster_pairs
    assert same_cluster_pairs(a) == same_cluster_pairs(b)

    vp_a = base.verified_pairs.to_pandas()[["id_a", "id_b"]] \
        .sort_values(["id_a", "id_b"]).reset_index(drop=True)
    vp_b = forced.verified_pairs.to_pandas()[["id_a", "id_b"]] \
        .sort_values(["id_a", "id_b"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(vp_a, vp_b)
