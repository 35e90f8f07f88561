"""Windowed aggregates over an event log (engine extension; the reference has
no streaming operators, SURVEY §2.9 — these cover the training-data-pipeline
windowing the task brief calls for, over the driver `events` table).

Ray Data has no event-time windows; tumbling windows are expressed as a
grouped aggregate on (key, floor(ts / width)) — a single hash shuffle —
and session windows as per-key sorted gap-splitting inside map_groups
(ordering assumption: within one key group, rows are sorted by ts before
sessionizing; stated per the ray guide's streaming-shaped pattern).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
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
    exceeds gap_s. Execution: ONE global sort by (key, ts) + vectorized
    gap-splitting per sorted block — no per-key Python/pandas (a hot key
    would make a map_groups variant unbounded). A key's run can straddle
    blocks, so each block's first and last key-runs are finished in a small
    second pass (driver re-scan; candidates.run_minima boundary scheme)."""

    def to_secs(t: pa.Table) -> pa.Table:
        ts_us = t.column(ts_col).cast(pa.int64())
        return pa.table({
            key: t.column(key),
            "_ts_s": pc.divide(ts_us, pa.scalar(1_000_000, pa.int64())),
        })

    srt = events.select_columns([key, ts_col]) \
        .map_batches(to_secs, batch_format="pyarrow") \
        .sort([key, "_ts_s"]).materialize()

    def _runs_of(t: pa.Table):
        k = t.column(key).to_numpy(zero_copy_only=False)
        ts = t.column("_ts_s").to_numpy(zero_copy_only=False)
        if len(k) == 0:
            return k, ts, np.empty(0, np.int64), np.empty(0, np.int64)
        starts = np.nonzero(np.r_[True, k[1:] != k[:-1]])[0]
        return k, ts, starts, np.r_[starts[1:], len(k)]

    def interior(t: pa.Table) -> pa.Table:
        k, ts, starts, ends = _runs_of(t)
        ktype = t.schema.field(key).type
        if len(starts) <= 2:
            return _sessionize_wrapped(np.empty(0, np.int64),
                                       np.empty(0, np.int64), gap_s, key,
                                       key_type=ktype)
        lo, hi = starts[1], ends[-2]
        return _sessionize_wrapped(k[lo:hi], ts[lo:hi], gap_s, key,
                                   key_type=ktype)

    def boundary(t: pa.Table) -> pa.Table:
        k, ts, starts, ends = _runs_of(t)
        if len(starts) == 0:
            return pa.table({key: pa.array([], t.schema.field(key).type),
                             "_ts_s": pa.array([], pa.int64())})
        take = np.r_[np.arange(starts[0], ends[0]),
                     np.arange(starts[-1], ends[-1])] if len(starts) > 1 \
            else np.arange(starts[0], ends[0])
        take = np.unique(take)
        return pa.table({key: pa.array(k[take]),
                         "_ts_s": pa.array(ts[take], pa.int64())})

    inner = srt.map_batches(interior, batch_format="pyarrow")
    brows = srt.map_batches(boundary, batch_format="pyarrow")
    from raydedup.stages.candidates import DRIVER_SMALL_LIMIT
    from raydedup.util import collect_up_to
    btbl = collect_up_to(brows, DRIVER_SMALL_LIMIT)
    if btbl is not None and btbl.num_rows and key in btbl.column_names:
        st = btbl.sort_by([(key, "ascending"), ("_ts_s", "ascending")])
        bout = ray.data.from_arrow(_sessionize_wrapped(
            st.column(key).to_numpy(zero_copy_only=False),
            st.column("_ts_s").to_numpy(zero_copy_only=False), gap_s, key))
    elif btbl is not None:
        ktype = dict(zip(srt.schema().names, srt.schema().types))[key]
        bout = ray.data.from_arrow(_sessionize_wrapped(
            np.empty(0, np.int64), np.empty(0, np.int64), gap_s, key,
            key_type=ktype))
    else:
        def per_group(g: pd.DataFrame) -> pd.DataFrame:
            g = g.sort_values("_ts_s")
            out = _sessionize_wrapped(
                g[key].to_numpy(), g["_ts_s"].to_numpy(), gap_s, key)
            return out.to_pandas()

        bout = brows.groupby(key).map_groups(per_group,
                                             batch_format="pandas")
    return inner.union(bout)


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
