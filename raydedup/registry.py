"""Named kernel registry — the engine's replacement for the reference's
eval-based pluggable distance function (selfclean_cleaner.py:39-41, 77-80:
`eval(distance_function_path + name)`). A config string selects a registered
batch kernel; users extend by calling register(). No eval.
"""

from __future__ import annotations

from typing import Callable, Dict

import numpy as np


def _cosine_sims(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """(n,D) x (m,D) L2-normalized -> (n,m) cosine similarity."""
    return a @ b.T


def _cosine_distance_dot(dot: np.ndarray) -> np.ndarray:
    """Reference cosine->distance affine map d = 1 - (sim+1)/2, clipped
    (selfclean_cleaner.py:142-149), as a function of the dot matrix."""
    return np.clip(1.0 - (dot + 1.0) / 2.0, 0.0, 1.0)


def _projective_distance_dot(dot: np.ndarray) -> np.ndarray:
    """Projective distance on L2-normalized vectors:
    min(||x-y||, ||x+y||) / sqrt(2) — antipodal points are identified
    (selfclean/distances/projective_distance.py:6-35). Computed from the dot
    product: ||x±y||^2 = 2 ± 2<x,y> for unit vectors."""
    dot = np.clip(dot, -1.0, 1.0)
    d_minus = np.sqrt(np.maximum(2.0 - 2.0 * dot, 0.0))
    d_plus = np.sqrt(np.maximum(2.0 + 2.0 * dot, 0.0))
    return np.minimum(d_minus, d_plus) / np.sqrt(2.0)


def _cosine_distance(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    return _cosine_distance_dot(a @ b.T)


def _projective_distance(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    return _projective_distance_dot(a @ b.T)


DISTANCE_KERNELS: Dict[str, Callable[[np.ndarray, np.ndarray], np.ndarray]] = {
    "cosine": _cosine_distance,
    "projective": _projective_distance,
}

# dot-product form: distance as a function of the (already computed)
# similarity/dot matrix of L2-normalized vectors. The pair-ranking plane
# holds precomputed similarities, not vectors, so it can only apply kernels
# registered in THIS form — a vector-form-only kernel fed reshaped scalars
# would silently compute garbage there.
DOT_KERNELS: Dict[str, Callable[[np.ndarray], np.ndarray]] = {
    "cosine": _cosine_distance_dot,
    "projective": _projective_distance_dot,
}


def register_distance(name: str,
                      fn: Callable[[np.ndarray, np.ndarray], np.ndarray],
                      from_dot: Callable[[np.ndarray], np.ndarray]
                      | None = None):
    """User-extension hook (test parity: pluggable distance fn,
    tests/unittests/cleaner/test_selfclean_cleaner.py:118-132).
    fn(a, b) takes two (n, D) / (m, D) L2-normalized vector matrices.
    from_dot, if given, is the same distance expressed as a function of
    the (n, m) dot matrix — required for pair_ranking (which has only the
    precomputed similarities)."""
    DISTANCE_KERNELS[name] = fn
    if from_dot is not None:
        DOT_KERNELS[name] = from_dot
    else:
        DOT_KERNELS.pop(name, None)


def get_distance(name: str) -> Callable[[np.ndarray, np.ndarray], np.ndarray]:
    try:
        return DISTANCE_KERNELS[name]
    except KeyError:
        raise KeyError(f"unknown distance kernel {name!r}; registered: "
                       f"{sorted(DISTANCE_KERNELS)}") from None


def get_dot_distance(name: str) -> Callable[[np.ndarray], np.ndarray]:
    if name not in DISTANCE_KERNELS:
        raise KeyError(f"unknown distance kernel {name!r}; registered: "
                       f"{sorted(DISTANCE_KERNELS)}")
    try:
        return DOT_KERNELS[name]
    except KeyError:
        raise KeyError(
            f"distance kernel {name!r} was registered without a dot-product "
            f"form (register_distance(..., from_dot=...)); pair_ranking "
            f"operates on precomputed similarities and needs one") from None
