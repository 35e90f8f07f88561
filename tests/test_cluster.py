"""Connected-components: driver union-find vs distributed hash-min parity."""

import numpy as np
import pyarrow as pa
import pytest
import ray.data as rd

from raydedup.config import EngineConfig
from raydedup.stages.cluster import _union_find, connected_components


def _edges_ds(pairs):
    a = pa.array([p[0] for p in pairs], pa.int64())
    b = pa.array([p[1] for p in pairs], pa.int64())
    return rd.from_arrow(pa.table({"id_a": a, "id_b": b}))


def _ids_ds(ids):
    return rd.from_arrow(pa.table({"id": pa.array(ids, pa.int64())}))


CASES = [
    # chain 1-2-3-4, pair (10,11), singletons 20,21
    ([(1, 2), (2, 3), (3, 4), (10, 11)], [1, 2, 3, 4, 10, 11, 20, 21]),
    # star + cross links
    ([(5, 1), (5, 2), (5, 3), (2, 9), (7, 8)], [1, 2, 3, 5, 7, 8, 9]),
    # long chain (worst case for propagation depth)
    ([(i, i + 1) for i in range(30)], list(range(31))),
]


def _expected(pairs, ids):
    mapping = _union_find(np.array([p[0] for p in pairs]),
                          np.array([p[1] for p in pairs]))
    return {i: mapping.get(i, i) for i in ids}


@pytest.mark.parametrize("pairs,ids", CASES)
def test_driver_cc(pairs, ids):
    cfg = EngineConfig()   # edge count below driver limit -> union-find path
    out = connected_components(_edges_ds(pairs), _ids_ds(ids), cfg).to_pandas()
    got = dict(zip(out.id, out.cluster_id))
    assert got == _expected(pairs, ids)


@pytest.mark.parametrize("pairs,ids", CASES)
def test_distributed_cc_matches_driver(pairs, ids):
    cfg = EngineConfig(cc_driver_edge_limit=0, join_num_partitions=4)
    out = connected_components(_edges_ds(pairs), _ids_ds(ids), cfg).to_pandas()
    got = dict(zip(out.id, out.cluster_id))
    assert got == _expected(pairs, ids)


def test_no_edges():
    cfg = EngineConfig()
    out = connected_components(
        _edges_ds([]).filter(lambda r: True), _ids_ds([1, 2, 3]), cfg
    ).to_pandas()
    assert dict(zip(out.id, out.cluster_id)) == {1: 1, 2: 2, 3: 3}


@pytest.mark.parametrize("pairs,ids", CASES)
def test_keep_representatives_one_per_cluster(pairs, ids):
    from raydedup.stages.cluster import keep_representatives
    cfg = EngineConfig()
    clusters = connected_components(_edges_ds(pairs), _ids_ds(ids), cfg)
    kept = sorted(keep_representatives(clusters).to_pandas().id)
    exp = _expected(pairs, ids)
    assert kept == sorted(set(exp.values()))   # exactly the min-id reps
    assert all(exp[i] == i for i in kept)      # each kept row is its own rep
