"""Shared Ray Data helpers: list-column <-> numpy, hash joins, logging."""

from __future__ import annotations

import logging

import numpy as np
import pyarrow as pa

log = logging.getLogger("raydedup")


def pack_u64_2d(values_2d: np.ndarray) -> pa.Array:
    """(n, w) uint64 -> fixed-stride binary column (w*8 bytes per row),
    built zero-copy-ish via Array.from_buffers (no per-row Python)."""
    n, w = values_2d.shape
    stride = w * 8
    data = pa.py_buffer(np.ascontiguousarray(values_2d, dtype="<u8")
                        .tobytes())
    offs = pa.py_buffer(
        (np.arange(n + 1, dtype=np.int32) * stride).tobytes())
    return pa.Array.from_buffers(pa.binary(), n, [None, offs, data])


def _binary_parts(col) -> tuple[np.ndarray, np.ndarray]:
    """(Large)Binary column -> (byte_offsets int64[n+1], data uint8[...]),
    straight from the Arrow buffers (no per-row Python)."""
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    bufs = col.buffers()
    off_dtype = np.int64 if pa.types.is_large_binary(col.type) else np.int32
    offs = np.frombuffer(bufs[1], dtype=off_dtype)[
        col.offset: col.offset + len(col) + 1].astype(np.int64)
    data = np.frombuffer(bufs[2], dtype=np.uint8) if bufs[2] is not None \
        else np.empty(0, np.uint8)
    return offs, data


def _view_u64(byts: np.ndarray) -> np.ndarray:
    """uint8 slice -> uint64 view (copy fallback when unaligned)."""
    try:
        return byts.view("<u8")
    except ValueError:
        return np.frombuffer(byts.tobytes(), dtype="<u8")


def unpack_u64_2d(col, width: int) -> np.ndarray:
    """binary column of uniform w*8-byte rows -> (n, w) uint64 array.
    Zero-copy from the Arrow data buffer (binary values are contiguous)."""
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    if len(col) == 0:
        return np.empty((0, width), dtype=np.uint64)
    offs, data = _binary_parts(col)
    return _view_u64(data[offs[0]:offs[-1]]).reshape(-1, width)


def unpack_u64_flat(col) -> tuple[np.ndarray, np.ndarray]:
    """binary column of uint64-packed rows -> (flat uint64 values,
    element offsets int64[n+1]); row i = flat[eoffs[i]:eoffs[i+1]]."""
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    if len(col) == 0:
        return np.empty(0, np.uint64), np.zeros(1, np.int64)
    offs, data = _binary_parts(col)
    flat = _view_u64(data[offs[0]:offs[-1]])
    return flat, (offs - offs[0]) // 8


def pack_u64_ragged(flat: np.ndarray, offsets: np.ndarray) -> pa.Array:
    """ragged uint64 runs -> large_binary column (8 bytes per element),
    built zero-copy-ish via Array.from_buffers (no per-row Python)."""
    data = pa.py_buffer(np.ascontiguousarray(flat, dtype="<u8").tobytes())
    offs = pa.py_buffer(
        (np.asarray(offsets, dtype=np.int64) * 8).tobytes())
    return pa.Array.from_buffers(pa.large_binary(), len(offsets) - 1,
                                 [None, offs, data])


def unpack_u64_rows(col) -> list[np.ndarray]:
    """binary column -> list of uint64 numpy views (one per row)."""
    flat, eoffs = unpack_u64_flat(col)
    return [flat[eoffs[i]:eoffs[i + 1]] for i in range(len(eoffs) - 1)]


def collect_up_to(ds, cap_rows: int):
    """Collect a Dataset to one pyarrow Table iff it has <= cap_rows rows;
    returns None once the cap is exceeded (caller falls back to the
    distributed path). Streaming: never holds more than cap_rows + one batch."""
    batches = []
    total = 0
    for b in ds.iter_batches(batch_format="pyarrow", batch_size=1 << 20):
        if b.num_rows == 0 or b.num_columns == 0:
            continue
        total += b.num_rows
        if total > cap_rows:
            return None
        batches.append(b)
    if not batches:
        return pa.table({})
    return pa.concat_tables(batches, promote_options="default")


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


_SENTINEL_STR = "\x00__raydedup_join_sentinel__"
_SENTINEL_INT = np.iinfo(np.int64).min


def _sentinel_row(schema, key: str):
    """One-row table: sentinel value in the key column, nulls elsewhere.
    `schema` is a ray.data Schema or pyarrow.Schema."""
    base = getattr(schema, "base_schema", schema)
    if not isinstance(base, pa.Schema):
        base = pa.schema(list(zip(schema.names, schema.types)))
    cols = {}
    key_type = None
    for f in base:
        if f.name == key:
            key_type = f.type
            if pa.types.is_integer(f.type):
                cols[f.name] = pa.array([_SENTINEL_INT], f.type)
            else:
                cols[f.name] = pa.array([_SENTINEL_STR], f.type)
        else:
            cols[f.name] = pa.array([None], f.type)
    if key_type is None:
        raise KeyError(f"join key {key} not in schema {schema.names}")
    return pa.table(cols), key_type


def hash_join(left, right, on: str, right_on: str, num_partitions: int,
              join_type: str = "inner", left_suffix: str = "",
              right_suffix: str = "_r", left_schema: pa.Schema | None = None,
              right_schema: pa.Schema | None = None):
    """Hash-partitioned Dataset join (Ray >= 2.46 Dataset.join).

    At cluster scale this is the explicit partitioned hash join SURVEY §4
    calls for; num_partitions controls the shuffle fan-out (clamped to the
    CPU count — see effective_partitions).

    Robustness: Ray's join aggregator builds a ZERO-COLUMN table for any
    partition whose input sequence contributed no schema-bearing shard (e.g.
    an input that produced no blocks), and pyarrow then fails with "No match
    ... for key field". Each side is therefore padded with one sentinel row
    (guaranteeing at least one shuffle task per side, whose first task
    broadcasts the schema to every partition); sentinel rows are filtered
    from the join output by key value.
    """
    import ray.data

    num_partitions = effective_partitions(num_partitions)
    # Schema hints take precedence: ds.schema() on a lazy aggregate EXECUTES
    # it just for inference (and returns None for lazily-empty datasets), so
    # callers that know their schemas pass them explicitly.
    lsch = left_schema or left.schema()
    rsch = right_schema or right.schema()
    if lsch is None or rsch is None:
        raise ValueError(
            f"hash_join({on}/{right_on}): side with unknown (empty) schema "
            "and no schema hint — pass left_schema/right_schema")
    ls, _ = _sentinel_row(lsch, on)
    rs, key_type = _sentinel_row(rsch, right_on)
    left_p = ray.data.from_arrow(ls).union(left)
    right_p = ray.data.from_arrow(rs).union(right)
    joined = left_p.join(
        right_p,
        join_type=join_type,
        num_partitions=num_partitions,
        on=(on,),
        right_on=(right_on,),
        left_suffix=left_suffix,
        right_suffix=right_suffix,
    )
    if pa.types.is_integer(key_type):
        sent = pa.scalar(_SENTINEL_INT, key_type)
    else:
        sent = pa.scalar(_SENTINEL_STR, key_type)

    def drop_sentinels(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        if on not in t.column_names:
            return t
        return t.filter(pc.not_equal(t.column(on), sent))

    return joined.map_batches(drop_sentinels, batch_format="pyarrow")


def boundary_take(starts: np.ndarray, ends: np.ndarray) -> np.ndarray:
    """Row indices of the FIRST and LAST key-run of a key-sorted block.

    The shared boundary scheme of every sort+run-scan operator (candidates
    grouped_pairs/run_minima, rank quantile_off_topic, ngram dup_gram_hits,
    containment_candidates): interior runs are complete within a block, but
    the first and last run may straddle block edges, so their rows are
    re-emitted for a small global pass. Sorted unique indices; empty when
    the block is empty."""
    if len(starts) == 0:
        return np.empty(0, np.int64)
    if len(starts) == 1:
        return np.arange(starts[0], ends[0])
    return np.unique(np.r_[np.arange(starts[0], ends[0]),
                           np.arange(starts[-1], ends[-1])])


def boundary_columns(t: pa.Table, cols: list[str],
                     take: np.ndarray) -> pa.Table:
    """Project `cols` of the taken rows (the boundary emitters' tail)."""
    arr = pa.array(take)
    return pa.table({c: t.column(c).take(arr) for c in cols})
