"""Driver-side LAD-style utility: reference off-topic fixture ports."""

import numpy as np
import pytest

from raydedup.lad import lad_ranking, lad_scores, single_linkage_merges


def _dist_from_points(pts: np.ndarray) -> np.ndarray:
    d = np.linalg.norm(pts[:, None, :] - pts[None, :, :], axis=-1)
    return d


def test_far_outlier_ranks_first():
    """Mirrors tests/unittests/cleaner/off_topic_samples/test_lad_scoring.py:9-19:
    a single far outlier tops the ranking (DFS emission order, smallest
    subtree first)."""
    rng = np.random.default_rng(4)
    pts = rng.normal(0, 0.1, size=(30, 4))
    pts[17] += 10.0                      # planted far outlier
    d = _dist_from_points(pts)
    d = d / d.max()                      # reference clips distances to [0,1]
    scores, order = lad_ranking(d)
    assert order[0] == 17
    # cumulative scores are nondecreasing along the ranking
    assert (np.diff(scores) >= -1e-12).all()


def test_two_clusters_outlier_beats_cluster_members():
    rng = np.random.default_rng(9)
    a = rng.normal(0, 0.05, size=(10, 3))
    b = rng.normal(5, 0.05, size=(10, 3))
    out = np.full((1, 3), 50.0)
    pts = np.vstack([a, b, out])
    d = _dist_from_points(pts)
    scores, order = lad_ranking(d / d.max())
    assert order[0] == 20


def test_single_linkage_merge_order_matches_chain():
    # points on a line at 0, 1, 3, 7: single linkage merges (0,1) then
    # ({0,1},3) then ({0,1,3},7)
    pts = np.array([[0.0], [1.0], [3.0], [7.0]])
    merges = single_linkage_merges(_dist_from_points(pts))
    dists = [round(m[2], 6) for m in merges]
    assert dists == [1.0, 2.0, 4.0]


def test_value_parity_three_leaves():
    """Hand-computed reference geometry (lad_scoring.py:28-331) for a
    3-leaf chain: merges (0,1)@0.2 then (+2)@0.8; root swaps so leaf 2
    (smaller subtree) goes left. Rectangles:
      root: 1.0*(1.0-0.8)=0.2 ; leaf2 [0,1/3]: (1/3)*0.8 ;
      node(0,1) [1/3,2/3]: (1/3)*(0.8-0.2) ; leaf0 [1/3,1/2]: (1/6)*0.2 ;
      leaf1 zero-width at 1/2 (equal-size split shrinks the right child).
    """
    d = np.array([[0.0, 0.2, 1.0],
                  [0.2, 0.0, 0.8],
                  [1.0, 0.8, 0.0]])
    scores, order = lad_ranking(d)
    assert order.tolist() == [2, 0, 1]
    np.testing.assert_allclose(
        scores, [0.2 + 0.8 / 3, 0.7, 0.7], rtol=0, atol=1e-12)


def test_value_parity_whitespace_backfill():
    """4 leaves, two tight pairs: the right pair subtree starts at x=0.5
    while the left pair's last leaf ended at x=0.25 — the white-space
    back-fill (lad_scoring.py:210-290) adds (0.5-0.25)*0.2 = 0.05 exactly.
    Hand-computed cumulative scores: 0.5, 0.5, 0.55, 0.55."""
    d = np.full((4, 4), 0.9)
    np.fill_diagonal(d, 0.0)
    d[0, 1] = d[1, 0] = 0.2
    d[2, 3] = d[3, 2] = 0.3
    scores, order = lad_ranking(d)
    assert order.tolist() == [0, 1, 2, 3]
    np.testing.assert_allclose(
        scores, [0.5, 0.5, 0.55, 0.55], rtol=0, atol=1e-12)


def test_scores_nonnegative_and_sized():
    rng = np.random.default_rng(2)
    d = _dist_from_points(rng.normal(size=(25, 5)))
    s = lad_scores(d)
    assert s.shape == (25,)
    assert (s >= 0).all()


def test_degenerate_all_equal_distances_matches_scipy_order():
    """4 points, ALL pairwise distances equal (0.5): hand-derived
    scipy-then-reference tree. Prim from 0 emits (0,1),(0,2),(0,3); stable
    sort keeps that order; scipy label() produces node4=(0,1),
    node5=(2,4), node6=(3,5). Reference swaps smaller-count left, keeping
    ascending ids on count ties. DFS (smaller-left) emission order is
    therefore 3, 2, 0, 1."""
    d = np.full((4, 4), 0.5)
    np.fill_diagonal(d, 0.0)
    merges = single_linkage_merges(d)
    # merge sequence: cluster-id pairs as SETS (orientation is normalized
    # by the swap rule inside lad_ranking, same as scipy label's ordering)
    assert [frozenset(m[:2]) for m in merges] == \
        [frozenset({0, 1}), frozenset({2, 4}), frozenset({3, 5})]
    _, order = lad_ranking(d)
    assert list(order) == [3, 2, 0, 1]


def test_degenerate_equal_size_tie_keeps_smaller_cluster_id_left():
    """Two 2-leaf clusters merging at the root with EQUAL sizes: d(0,1) =
    d(2,3) = 0.1, cross = 0.5. Hand-derived scipy tree: node4=(0,1),
    node5=(2,3), root=(4,5) — the count tie keeps ascending ids, so the
    {0,1} cluster (id 4) stays LEFT and DFS emits 0,1,2,3."""
    d = np.array([[0.0, 0.1, 0.5, 0.5],
                  [0.1, 0.0, 0.5, 0.5],
                  [0.5, 0.5, 0.0, 0.1],
                  [0.5, 0.5, 0.1, 0.0]])
    merges = single_linkage_merges(d)
    assert [frozenset(m[:2]) for m in merges] == \
        [frozenset({0, 1}), frozenset({2, 3}), frozenset({4, 5})]
    _, order = lad_ranking(d)
    assert list(order) == [0, 1, 2, 3]


def test_degenerate_leaf_pair_tie_smaller_leaf_left():
    """Equal-size LEAF tie inside one merge: with node4=(0,1) the swap
    rule must keep leaf 0 left of leaf 1 (ascending ids, scipy row
    order). Scores must be nondecreasing along the ranking in all
    degenerate cases."""
    d = np.full((4, 4), 0.5)
    np.fill_diagonal(d, 0.0)
    scores, order = lad_ranking(d)
    pos = {int(v): i for i, v in enumerate(order)}
    assert pos[0] < pos[1]
    assert (np.diff(scores) >= -1e-12).all()


def test_scipy_cross_check_when_available():
    """Machine-verifies the derived scipy tie-order parity whenever scipy
    IS importable (lad.py docstring: the derivation leans on scipy
    internals only this check can pin). Skips in environments without
    scipy — the hand-derived fixtures above remain the floor."""
    scipy_hier = pytest.importorskip("scipy.cluster.hierarchy")
    squareform = pytest.importorskip("scipy.spatial.distance").squareform
    rng = np.random.default_rng(7)
    cases = [np.full((4, 4), 0.5),
             np.array([[0.0, 0.1, 0.5, 0.5],
                       [0.1, 0.0, 0.5, 0.5],
                       [0.5, 0.5, 0.0, 0.1],
                       [0.5, 0.5, 0.1, 0.0]])]
    for _ in range(5):
        pts = rng.standard_normal((8, 3))
        cases.append(_dist_from_points(pts))
    # quantized distances to force ties in the random cases too
    pts = rng.integers(0, 3, size=(7, 2)).astype(float)
    cases.append(_dist_from_points(pts))
    for d in cases:
        d = d.copy()
        np.fill_diagonal(d, 0.0)
        Z = scipy_hier.linkage(squareform(d, checks=False), method="single")
        merges = single_linkage_merges(d)
        got = [(frozenset(m[:2]), round(m[2], 12)) for m in merges]
        want = [(frozenset({int(r[0]), int(r[1])}), round(float(r[2]), 12))
                for r in Z]
        assert got == want
