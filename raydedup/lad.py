"""Driver-side LAD-style off-topic scoring for small N (SURVEY §7 "exact LAD
retained only as a small-N driver-side utility").

Reference semantics (selfclean/scoring/lad_scoring.py:28-208, studied for
behavior; reimplemented from the documented algorithm, not copied): build the
single-linkage dendrogram over the condensed distances, then assign each leaf
an isolation-area score — samples that merge late (high) and alone accumulate
large area and rank first (fixture:
tests/unittests/cleaner/off_topic_samples/test_lad_scoring.py:9-19).

Both the ranking ORDER and the cumulative score VALUES follow the reference
geometry, including the shrinking child x-intervals (w_right =
start + (end-start)*p_right) and the white-space back-fill rectangles
(lad_scoring.py:210-290); parity is gated by hand-computed small-N fixtures
(tests/test_lad.py), including degenerate equal-distance/equal-size merges.

Tie-order parity with the reference's scipy path — DERIVED and
FIXTURE-PINNED, not machine-verified against scipy (scipy is absent from
this environment; tests/test_lad.py has a cross-check that runs whenever
scipy IS importable): scipy.cluster.hierarchy.linkage(method='single')
builds the MST with Prim from vertex 0 (ties broken by lowest index via
strict-< scans), stable-sorts the MST edges by distance, and relabels rows
with Z[i,0] < Z[i,1] ascending cluster ids (_hierarchy label()); the
reference then swaps the smaller-COUNT child left, keeping Z's
ascending-id order on count ties (lad_scoring.py:103-108). This module's
Prim + stable edge sort are derived to reproduce that merge sequence, and
its final swap rule — smaller size left, smaller cluster id left on size
ties — is orientation-independent and matches on every hand-derived
degenerate fixture (test_lad); the derivation leans on scipy internals
(MST edge-sort stability) that only the optional cross-check can pin.

scipy is unavailable; single linkage is computed with an O(N^2) Prim MST —
fine for the intended N <= a few thousand.
"""

from __future__ import annotations

import numpy as np


def single_linkage_merges(dist: np.ndarray):
    """Dense symmetric (N,N) distances -> merge list [(a, b, d)] in merge
    order, where a/b are cluster ids (leaves 0..N-1, internal N..2N-2).

    Single linkage equals Kruskal on the MST edges sorted ascending; the MST
    comes from O(N^2) Prim.
    """
    n = len(dist)
    in_tree = np.zeros(n, dtype=bool)
    best = np.full(n, np.inf)
    best_from = np.zeros(n, dtype=np.int64)
    in_tree[0] = True
    best_m = np.minimum(best, dist[0])
    best_from = np.where(dist[0] < best, 0, best_from)
    best = best_m
    best[0] = np.inf
    edges = []
    for _ in range(n - 1):
        j = int(np.argmin(best))
        edges.append((int(best_from[j]), j, float(best[j])))
        in_tree[j] = True
        upd = dist[j] < best
        upd &= ~in_tree
        best_from = np.where(upd, j, best_from)
        best = np.where(upd, dist[j], best)
        best[in_tree] = np.inf

    edges.sort(key=lambda e: e[2])
    parent = list(range(2 * n - 1))
    cluster_of = list(range(n))        # representative -> current cluster id

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    merges = []
    next_id = n
    for a, b, d in edges:
        ra, rb = find(a), find(b)
        ca, cb = cluster_of[ra], cluster_of[rb]
        merges.append((ca, cb, d))
        parent[rb] = ra
        cluster_of[ra] = next_id
        next_id += 1
    return merges


def lad_ranking(dist: np.ndarray,
                global_leaves: bool = False
                ) -> tuple[np.ndarray, np.ndarray]:
    """-> (scores, indices) in the reference's RANKING ORDER with the
    reference's cumulative score VALUES.

    global_leaves=False (reference default): child interval ratios are
    computed against the NODE's own leaf count (lad_scoring.py:100 —
    n_leaves is reset to node.count at every pop because children inherit
    None). global_leaves=True: every ratio uses the ROOT's leaf count
    (lad_scoring.py:156,165 — children inherit the first-set n_leaves), so
    intervals shrink toward zero and late-merging singletons dominate even
    more strongly.

    The reference's off-topic ranking IS the dendrogram DFS emission order
    with the SMALLER subtree visited first (lad_scoring.py:103-108: children
    swapped so the smaller goes left; :161-168: left pushed last = popped
    first; calc_scores returns `scoring` unsorted, lad_mixin.py:16-34 passes
    it through). A far outlier is the smallest subtree hanging off the root,
    so it is emitted — and therefore ranked — first
    (test_lad_scoring.py:9-19).

    Score accumulation follows the reference geometry exactly
    (lad_scoring.py:28-331):
    - every node contributes its own rectangle
      (end-start) * (dist_parent - node_height), root extent [0,1] with
      dist_parent 1.0;
    - the LEFT (smaller) child occupies [start, w_left] and the RIGHT child
      [w_left, w_right] with w_right = start + (end-start)*p_right — the
      interval SHRINKS when p_left > 0, leaving unallocated "white space";
    - white space is back-filled (:210-290): after a leaf at x-extent
      ending at leaf_end under parent height leaf_dist, the next node
      starting at start > leaf_end adds (start-leaf_end)*leaf_dist, plus,
      for every node popped since the last back-fill whose height > 0, the
      rectangle (start - node_end) * (dist_parent - node_height) when
      node_end < start.
    Each leaf's score is the cumulative sum of every rectangle appended so
    far — ascending along the ranking.
    """
    n = len(dist)
    if n == 1:
        return np.zeros(1), np.zeros(1, dtype=np.int64)
    merges = single_linkage_merges(dist)
    n_nodes = 2 * n - 1
    left = np.full(n_nodes, -1, dtype=np.int64)
    right = np.full(n_nodes, -1, dtype=np.int64)
    height = np.zeros(n_nodes)
    size = np.ones(n_nodes, dtype=np.int64)
    for i, (a, b, d) in enumerate(merges):
        node = n + i
        left[node], right[node] = a, b
        height[node] = d
        size[node] = size[a] + size[b]

    root = n_nodes - 1
    running = 0.0
    out_scores, out_idx = [], []
    white: list[tuple[float, float, float]] = []   # (x_start, y_start, y_end)
    leaf_end = None
    leaf_dist = None
    # stack of (node, start, end, dist_parent); smaller child pushed last
    stack = [(root, 0.0, 1.0, 1.0)]
    while stack:
        node, start, end, dist_parent = stack.pop()
        h = float(height[node])
        # record the potential white space to the RIGHT of this node
        if h > 0.0:
            white.append((end, h, dist_parent))
        # back-fill unallocated rectangles once the x-cursor jumps
        if leaf_end is not None and leaf_end != start:
            square = (start - leaf_end) * leaf_dist
            if square > 0.0:
                running += square
            for (ws_x, ys, ye) in white:
                if ws_x < start:
                    square = (start - ws_x) * (ye - ys)
                    if square > 0.0:
                        running += square
            white = []
            leaf_end = None
            leaf_dist = None
        square = (end - start) * (dist_parent - h)
        if square > 0.0:
            running += square
        if node < n:
            out_scores.append(running)
            out_idx.append(node)
            leaf_end = end
            leaf_dist = dist_parent
            continue
        lc, rc = left[node], right[node]
        # smaller subtree left (reference lad_scoring.py:103-108); on EQUAL
        # sizes the earlier-formed (smaller-id) cluster goes left — exactly
        # scipy's label() ascending-id row order, which the reference keeps
        # on count ties (see module docstring for the derivation; pinned by
        # the degenerate fixtures in tests/test_lad.py)
        if size[lc] > size[rc] or (size[lc] == size[rc] and lc > rc):
            lc, rc = rc, lc
        denom = n if global_leaves else size[node]
        p_left = size[lc] / denom
        p_right = size[rc] / denom
        w_left = start + (end - start) * p_left
        w_right = start + (end - start) * p_right
        stack.append((rc, w_left, w_right, h))
        stack.append((lc, start, w_left, h))
    return np.asarray(out_scores), np.asarray(out_idx, dtype=np.int64)


def lad_scores(dist: np.ndarray,
               global_leaves: bool = False) -> np.ndarray:
    """Per-leaf cumulative scores indexed by leaf id (see lad_ranking)."""
    scores, idx = lad_ranking(dist, global_leaves=global_leaves)
    out = np.zeros(len(dist))
    out[idx] = scores
    return out
