"""Windowed aggregates over an event log (engine extension; the reference has
no streaming operators, SURVEY §2.9 — these cover the training-data-pipeline
windowing the task brief calls for, over the driver `events` table).

Ray Data has no event-time windows; tumbling windows are expressed as a
grouped aggregate on (key, floor(ts / width)) — a single hash shuffle —
and session windows as one global (key, ts) sort + a vectorized per-batch
gap-split, with at most two edge-session summaries per batch stitched in
a driver-side merge scan (no per-key map_groups anywhere; hot keys cost
O(#batches) summary rows, never their raw rows).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray.data
from ray.data.aggregate import Count, Max, Mean, Min, Sum


def tumbling_window(events: ray.data.Dataset, width_s: int,
                    key: str = "event_type", ts_col: str = "ts",
                    value_col: str = "value") -> ray.data.Dataset:
    """-> (key, window_start_s, n_events, sum_value, avg_value).

    window_start_s = epoch-floored second (int64; timestamps are kept out of
    the comparison surface — Arrow/DuckDB tz semantics differ)."""

    def bucket(t: pa.Table) -> pa.Table:
        ts_us = t.column(ts_col).cast(pa.int64())   # microseconds since epoch
        # positive timestamps: integer division == floor
        ts_s = pc.divide(ts_us, pa.scalar(1_000_000, pa.int64()))
        wstart = pc.multiply(pc.divide(ts_s, pa.scalar(width_s, pa.int64())),
                             pa.scalar(width_s, pa.int64()))
        return pa.table({
            key: t.column(key),
            "window_start_s": wstart,
            value_col: t.column(value_col),
        })

    return events.map_batches(bucket, batch_format="pyarrow") \
        .groupby([key, "window_start_s"]).aggregate(
            Count(alias_name="n_events"),
            Sum(value_col, alias_name="sum_value"),
            Mean(value_col, alias_name="avg_value"),
        )


def hopping_window(events: ray.data.Dataset, width_s: int, hop_s: int,
                   key: str = "event_type", ts_col: str = "ts",
                   value_col: str = "value") -> ray.data.Dataset:
    """Hopping (sliding) windows: width width_s, advancing by hop_s; an
    event at t belongs to every window start w = m*hop_s with
    w <= t < w + width_s (ceil(width/hop) windows; width_s must be a
    multiple-free positive int, hop_s <= width_s for overlap).

    -> (key, window_start_s, n_events, sum_value, avg_value).

    Execution: vectorized replication inside map_batches (each event row
    fans out to its window assignments — the flat_map-shaped step), then
    the same single hash-shuffle grouped aggregate as tumbling_window.
    Replication factor is the constant ceil(width/hop), so the exchange
    volume is predictable; windows never start before epoch 0."""
    if hop_s <= 0 or width_s <= 0:
        raise ValueError("width_s and hop_s must be positive")
    n_off = -(-width_s // hop_s)        # ceil

    def assign(t: pa.Table) -> pa.Table:
        ts_us = t.column(ts_col).cast(pa.int64()) \
            .to_numpy(zero_copy_only=False)
        ts_s = ts_us // 1_000_000
        keys = t.column(key).to_numpy(zero_copy_only=False)
        vals = t.column(value_col).to_numpy(zero_copy_only=False)
        m_hi = ts_s // hop_s                      # latest window index
        k = np.tile(np.arange(n_off, dtype=np.int64), len(ts_s))
        w = (np.repeat(m_hi, n_off) - k) * hop_s
        tt = np.repeat(ts_s, n_off)
        keep = (w + width_s > tt) & (w >= 0)
        return pa.table({
            key: pa.array(np.repeat(keys, n_off)[keep]),
            "window_start_s": pa.array(w[keep], pa.int64()),
            value_col: pa.array(np.repeat(vals, n_off)[keep]),
        })

    return events.map_batches(assign, batch_format="pyarrow") \
        .groupby([key, "window_start_s"]).aggregate(
            Count(alias_name="n_events"),
            Sum(value_col, alias_name="sum_value"),
            Mean(value_col, alias_name="avg_value"),
        )


def session_windows(events: ray.data.Dataset, gap_s: int,
                    key: str = "user_id", ts_col: str = "ts"
                    ) -> ray.data.Dataset:
    """-> (key, session_start, session_end, n_events).

    A session breaks when the gap to the previous event of the same key
    exceeds gap_s. Execution: ONE global sort by (key, ts), then a SINGLE
    map_batches pass sessionizes each sorted batch with the vectorized
    run-scan and tags every emitted session interior (0) or edge (1).
    Every session of a batch except the FIRST and LAST is provably final
    (only the batch's leading session can extend into the previous batch
    and only its trailing session into the next); the tagged output is
    materialized ONCE — so interior sessions and edge summaries come from
    the same physical batching, with no reliance on two executions
    reproducing byte-identical batch boundaries (round-4 ADVICE item) —
    then split by tag: interior sessions flow through, the <=2 edge rows
    per batch go to a driver-side vectorized merge scan that stitches
    fragments whose inter-fragment gap is within gap_s. Driver data is
    O(#batches) regardless of key skew — a hot key spanning many blocks
    costs two summary rows per batch, never its raw rows — so there is no
    collect cap and no per-key map_groups fallback anywhere on this
    path. (The materialized set is the sessionized OUTPUT — at most one
    row per input event and usually far fewer — replacing the previous
    materialize of the full sorted (key, ts) projection.)"""

    def to_secs(t: pa.Table) -> pa.Table:
        ts_us = t.column(ts_col).cast(pa.int64())
        return pa.table({
            key: t.column(key),
            "_ts_s": pc.divide(ts_us, pa.scalar(1_000_000, pa.int64())),
        })

    srt = events.select_columns([key, ts_col]) \
        .map_batches(to_secs, batch_format="pyarrow") \
        .sort([key, "_ts_s"])
    ktype = dict(zip(srt.schema().names, srt.schema().types))[key]

    def _batch_sessions(t: pa.Table) -> pa.Table:
        k = t.column(key).to_numpy(zero_copy_only=False)
        ts = t.column("_ts_s").to_numpy(zero_copy_only=False)
        sess = _sessionize_wrapped(k, ts, gap_s, key,
                                   key_type=t.schema.field(key).type)
        m = sess.num_rows
        tag = np.zeros(m, dtype=np.int8)
        if m:                      # first + last session can cross batches
            tag[0] = 1
            tag[m - 1] = 1
        return sess.append_column("_edge", pa.array(tag, pa.int8()))

    tagged = srt.map_batches(_batch_sessions,
                             batch_format="pyarrow").materialize()

    def _split(t: pa.Table, edge: int) -> pa.Table:
        mask = pc.equal(t.column("_edge"), pa.scalar(edge, pa.int8()))
        return t.filter(mask).drop_columns(["_edge"])

    inner = tagged.map_batches(lambda t: _split(t, 0),
                               batch_format="pyarrow")
    edges = tagged.map_batches(lambda t: _split(t, 1),
                               batch_format="pyarrow")
    # <= 2 summary rows per batch by construction: bounded driver collect
    ebatches = [b for b in edges.iter_batches(batch_format="pyarrow",
                                              batch_size=1 << 20)
                if b.num_rows]
    etbl = pa.concat_tables(ebatches) if ebatches else None
    if etbl is None or etbl.num_rows == 0:
        merged = _sessionize_wrapped(np.empty(0, np.int64),
                                     np.empty(0, np.int64), gap_s, key,
                                     key_type=ktype)
    else:
        st = etbl.sort_by([(key, "ascending"),
                           ("session_start", "ascending")])
        merged = _merge_session_fragments(
            st.column(key).to_numpy(zero_copy_only=False),
            st.column("session_start").to_numpy(zero_copy_only=False),
            st.column("session_end").to_numpy(zero_copy_only=False),
            st.column("n_events").to_numpy(zero_copy_only=False),
            gap_s, key, key_type=ktype)
    return inner.union(ray.data.from_arrow(merged))


def _merge_session_fragments(uid: np.ndarray, starts: np.ndarray,
                             ends: np.ndarray, ns: np.ndarray, gap_s: int,
                             key: str, key_type=None) -> pa.Table:
    """Stitch per-batch edge-session fragments (sorted by key, start):
    consecutive fragments of one key merge when the next fragment's first
    event is within gap_s of the previous fragment's last event — exactly
    the event-level break rule, since a fragment's start/end ARE its
    first/last event times."""
    if len(uid) == 0:
        return _sessionize_wrapped(np.empty(0, np.int64),
                                   np.empty(0, np.int64), gap_s, key,
                                   key_type=key_type)
    starts = np.asarray(starts, dtype=np.int64)
    ends = np.asarray(ends, dtype=np.int64)
    ns = np.asarray(ns, dtype=np.int64)
    brk = np.ones(len(uid), dtype=bool)
    brk[1:] = (uid[1:] != uid[:-1]) | (starts[1:] - ends[:-1] > gap_s)
    g0 = np.nonzero(brk)[0]
    # max-end per merged group, not last-end: fragments with tied starts
    # (same-ts events split across a batch boundary) may sort either way
    return pa.table({
        key: pa.array(uid[g0], key_type),
        "session_start": pa.array(starts[g0], pa.int64()),
        "session_end": pa.array(
            np.maximum.reduceat(ends, g0).astype(np.int64), pa.int64()),
        "n_events": pa.array(np.add.reduceat(ns, g0).astype(np.int64),
                             pa.int64()),
    })


def _sessionize_wrapped(uid: np.ndarray, ts: np.ndarray, gap_s: int,
                        key: str, key_type=None) -> pa.Table:
    if len(ts) == 0:
        # empty blocks must carry the key column's REAL type — an int64
        # default makes block schemas disagree for string-keyed sessions
        return pa.table({key: pa.array([], key_type or pa.int64()),
                         "session_start": pa.array([], pa.int64()),
                         "session_end": pa.array([], pa.int64()),
                         "n_events": pa.array([], pa.int64())})
    uid = np.asarray(uid)
    ts = np.asarray(ts, dtype=np.int64)
    breaks = np.ones(len(ts), dtype=bool)
    breaks[1:] = (uid[1:] != uid[:-1]) | (ts[1:] - ts[:-1] > gap_s)
    starts = np.nonzero(breaks)[0]
    ends = np.r_[starts[1:], len(ts)]
    return pa.table({
        key: pa.array(uid[starts]),
        "session_start": pa.array(ts[starts], pa.int64()),
        "session_end": pa.array(ts[ends - 1], pa.int64()),
        "n_events": pa.array((ends - starts).astype(np.int64), pa.int64()),
    })
