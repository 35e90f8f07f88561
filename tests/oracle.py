"""Driver-side brute-force oracle (FIXTURES F1): exact k-shingle Jaccard over
all pairs -> pairs with J >= tau -> connected components via union-find.

Feasible for <= ~5k rows; used only by tests, never by the engine.
"""

from __future__ import annotations

import numpy as np

from raydedup import kernels as K


def shingle_sets(contents: list[str], k: int, lowercase: bool = False):
    flat, offs = K.tokenize_hash_batch(contents, lowercase=lowercase)
    sh, so = K.shingle_hashes(flat, offs, k)
    return [np.unique(sh[so[i]:so[i + 1]]) for i in range(len(so) - 1)]


def brute_force_pairs(contents: list[str], ids: list[int], k: int,
                      tau: float, lowercase: bool = False):
    """All unordered (id_a, id_b, jaccard) with exact J >= tau (includes
    exact duplicates: identical content has J == 1)."""
    sets = shingle_sets(contents, k, lowercase)
    n = len(sets)
    out = []
    for i in range(n):
        a = sets[i]
        for j in range(i + 1, n):
            b = sets[j]
            if len(a) == 0 and len(b) == 0:
                jac = 1.0 if contents[i] == contents[j] else 0.0
            else:
                union = len(a) + len(b)
                if union == 0:
                    continue
                inter = len(np.intersect1d(a, b, assume_unique=True))
                jac = inter / (union - inter) if union - inter else 1.0
            if jac >= tau or contents[i] == contents[j]:
                lo, hi = sorted((ids[i], ids[j]))
                out.append((lo, hi, jac))
    return out


def union_find_clusters(ids: list[int], pairs) -> dict[int, int]:
    """id -> min-id cluster label; singletons map to themselves."""
    parent = {i: i for i in ids}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b, _ in pairs:
        ra, rb = find(a), find(b)
        if ra != rb:
            if rb < ra:
                ra, rb = rb, ra
            parent[rb] = ra
    return {i: find(i) for i in ids}


def same_cluster_pairs(assign: dict[int, int]) -> set[tuple[int, int]]:
    from collections import defaultdict
    groups = defaultdict(list)
    for i, c in assign.items():
        groups[c].append(i)
    out = set()
    for members in groups.values():
        ms = sorted(members)
        for x in range(len(ms)):
            for y in range(x + 1, len(ms)):
                out.add((ms[x], ms[y]))
    return out
