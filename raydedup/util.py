"""Shared Ray Data helpers: list-column <-> numpy, hash joins, logging."""

from __future__ import annotations

import logging

import numpy as np
import pyarrow as pa

log = logging.getLogger("raydedup")


def pack_u64_2d(values_2d: np.ndarray) -> pa.Array:
    """(n, w) uint64 -> fixed-stride binary column (w*8 bytes per row)."""
    n, w = values_2d.shape
    byts = np.ascontiguousarray(values_2d, dtype="<u8").tobytes()
    stride = w * 8
    return pa.array([byts[i * stride:(i + 1) * stride] for i in range(n)],
                    pa.binary())


def unpack_u64_2d(col, width: int) -> np.ndarray:
    """binary column of uniform w*8-byte rows -> (n, w) uint64 array."""
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    if len(col) == 0:
        return np.empty((0, width), dtype=np.uint64)
    buf = b"".join(col.to_pylist())
    return np.frombuffer(buf, dtype="<u8").reshape(-1, width)


def pack_u64_ragged(flat: np.ndarray, offsets: np.ndarray) -> pa.Array:
    """ragged uint64 runs -> large_binary column (8 bytes per element)."""
    byts = np.ascontiguousarray(flat, dtype="<u8").tobytes()
    out = [byts[offsets[i] * 8: offsets[i + 1] * 8]
           for i in range(len(offsets) - 1)]
    return pa.array(out, pa.large_binary())


def unpack_u64_rows(col) -> list[np.ndarray]:
    """binary column -> list of uint64 numpy arrays (one per row)."""
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    return [np.frombuffer(b, dtype="<u8") if b is not None else
            np.empty(0, np.uint64) for b in col.to_pylist()]


def effective_partitions(requested: int) -> int:
    """Clamp shuffle fan-out to the cluster CPU count: Ray's hash-shuffle join
    spawns `num_partitions` aggregator actors, and a partition count above the
    available CPUs deadlocks the streaming executor on small clusters."""
    import ray
    try:
        cpus = int(ray.cluster_resources().get("CPU", 4))
    except Exception:
        cpus = 4
    return max(2, min(requested, cpus))


def hash_join(left, right, on: str, right_on: str, num_partitions: int,
              join_type: str = "inner", left_suffix: str = "",
              right_suffix: str = "_r"):
    """Hash-partitioned Dataset join (Ray >= 2.46 Dataset.join).

    At cluster scale this is the explicit partitioned hash join SURVEY §4 calls
    for; num_partitions controls the shuffle fan-out.
    """
    num_partitions = effective_partitions(num_partitions)
    return left.join(
        right,
        join_type=join_type,
        num_partitions=num_partitions,
        on=(on,),
        right_on=(right_on,),
        left_suffix=left_suffix,
        right_suffix=right_suffix,
    )
