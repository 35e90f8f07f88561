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


def session_windows(events: ray.data.Dataset, gap_s: int,
                    key: str = "user_id", ts_col: str = "ts"
                    ) -> ray.data.Dataset:
    """-> (key, session_start, session_end, n_events).

    A session breaks when the gap to the previous event of the same key
    exceeds gap_s. Per-key map_groups sorts by ts then splits at gaps —
    per-group pandas is fine here: group count == distinct keys, and the
    windowing itself is O(events-per-key)."""

    def sessionize(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(ts_col)
        ts = g[ts_col].astype("int64").to_numpy() // 1_000_000  # epoch s
        breaks = np.r_[True, np.diff(ts) > gap_s]
        sess = np.cumsum(breaks) - 1
        starts = np.nonzero(breaks)[0]
        ends = np.r_[starts[1:], len(ts)]
        return pd.DataFrame({
            key: np.repeat(g[key].iloc[0], len(starts)),
            "session_start": ts[starts],
            "session_end": ts[ends - 1],
            "n_events": (ends - starts).astype(np.int64),
        })

    return events.select_columns([key, ts_col]).groupby(key) \
        .map_groups(sessionize, batch_format="pandas")
