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


def _cosine_distance(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """Reference cosine->distance affine map d = 1 - (sim+1)/2, clipped
    (selfclean_cleaner.py:142-149)."""
    return np.clip(1.0 - (a @ b.T + 1.0) / 2.0, 0.0, 1.0)


def _projective_distance(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """Projective distance on L2-normalized vectors:
    min(||x-y||, ||x+y||) / sqrt(2) — antipodal points are identified
    (selfclean/distances/projective_distance.py:6-35). Computed from the dot
    product: ||x±y||^2 = 2 ± 2<x,y> for unit vectors."""
    dot = np.clip(a @ b.T, -1.0, 1.0)
    d_minus = np.sqrt(np.maximum(2.0 - 2.0 * dot, 0.0))
    d_plus = np.sqrt(np.maximum(2.0 + 2.0 * dot, 0.0))
    return np.minimum(d_minus, d_plus) / np.sqrt(2.0)


DISTANCE_KERNELS: Dict[str, Callable[[np.ndarray, np.ndarray], np.ndarray]] = {
    "cosine": _cosine_distance,
    "projective": _projective_distance,
}


def register_distance(name: str,
                      fn: Callable[[np.ndarray, np.ndarray], np.ndarray]):
    """User-extension hook (test parity: pluggable distance fn,
    tests/unittests/cleaner/test_selfclean_cleaner.py:118-132)."""
    DISTANCE_KERNELS[name] = fn


def get_distance(name: str) -> Callable[[np.ndarray, np.ndarray], np.ndarray]:
    try:
        return DISTANCE_KERNELS[name]
    except KeyError:
        raise KeyError(f"unknown distance kernel {name!r}; registered: "
                       f"{sorted(DISTANCE_KERNELS)}") from None
