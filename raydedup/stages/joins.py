"""Temporal join operators over event streams: as-of join and range join.

The reference has no temporal operators at all (SURVEY §2.9 — SelfClean's
pairwise plane is selfclean/cleaner/selfclean_cleaner.py:121-146, dense and
time-free); these are the training-data-pipeline "custom operators" the
task brief names (as-of join, range join), expressed Ray-Data-first:

- ONE hash partition on the join key (`groupby(_part)` — the only wide
  exchange), with the partition count sized by row volume so each merge
  task holds a bounded byte budget;
- inside a partition, fully vectorized sorted-merge kernels (one lexsort +
  O(n) cumulative scans) — no per-key map_groups (a hot key stays inside
  its partition's numpy arrays, it never becomes a per-group Python call),
  no per-row Python.

Semantics (each gated by a DuckDB oracle in __ray_entry__):
- `asof_join`: for every left row, the single right row with the same key
  and the greatest right ts <= left ts (DuckDB `ASOF LEFT JOIN ... ON
  l.key = r.key AND l.ts >= r.ts`). Right-side (key, ts) ties are reduced
  to the max-`right_id` row first so the match is deterministic.
- `range_join_agg`: for every left row, COUNT and integer-SUM of right
  rows with the same key and ts in the half-open window
  (left_ts - width, left_ts]. Sums are over `floor(value * scale)` int64
  so the result is order-independent and bitwise-comparable to SQL.

At 100 TB both operators move each row exactly once through the hash
exchange; the per-partition kernels are O(n log n) lexsort + O(n) scans,
and no state outlives a task.
"""

from __future__ import annotations

from typing import Optional

import numpy as np
import pyarrow as pa
import ray.data

from raydedup.kernels import splitmix64

_ASOF_SCHEMA = pa.schema([
    ("event_id", pa.int64()), ("key", pa.int64()), ("ts_us", pa.int64()),
    ("matched_event_id", pa.int64()), ("matched_ts_us", pa.int64()),
    ("matched_value", pa.float64()),
])
_RANGE_SCHEMA = pa.schema([
    ("event_id", pa.int64()), ("key", pa.int64()), ("ts_us", pa.int64()),
    ("n_in_window", pa.int64()), ("sum_scaled", pa.int64()),
])


def _default_parts(left, right) -> int:
    """Default partition count WITHOUT executing the inputs: lazy pipelines
    would run once per .count() and once more for the union (a ~3x input
    scan — round-3 ADVICE item). The cluster CPU count is the right order
    for a hash exchange; callers with a known row volume pass num_parts
    explicitly. (A non-empty input_files() does NOT mean count() is a
    metadata lookup — transformed datasets keep file lineage and count()
    would execute the whole pipeline, the exact scan this helper exists to
    avoid — round-4 ADVICE item, so no count() probing at all here.)"""
    try:
        import ray as _ray
        cpus = int(_ray.cluster_resources().get("CPU", 4))
    except Exception:
        cpus = 4
    return max(1, cpus)


def _col_i64(t: pa.Table, name: str) -> np.ndarray:
    return t.column(name).cast(pa.int64()).to_numpy(zero_copy_only=False)


def _col_f64(t: pa.Table, name: str) -> np.ndarray:
    return t.column(name).cast(pa.float64()).to_numpy(zero_copy_only=False)


def _tag_side(ds: ray.data.Dataset, side: int, key: str, ts_col: str,
              id_col: str, value_col: str, num_parts: int
              ) -> ray.data.Dataset:
    """Project either side to the fixed merge schema
    (_part, _side, key, ts_us, event_id, value) — timestamps become int64
    microseconds so the kernels and the SQL oracle share one comparison
    domain (windows.py does the same at second granularity)."""

    def fn(t: pa.Table) -> pa.Table:
        k = _col_i64(t, key)
        part = (splitmix64(k.astype(np.uint64)) %
                np.uint64(num_parts)).astype(np.int64)
        ts = t.column(ts_col)
        if pa.types.is_timestamp(ts.type):
            # normalize the unit before the int64 cast — blocks that
            # round-tripped through Python rows can arrive as ms
            ts = ts.cast(pa.timestamp("us"))
        return pa.table({
            "_part": pa.array(part, pa.int64()),
            "_side": pa.array(np.full(len(k), side, np.int8)),
            "key": pa.array(k, pa.int64()),
            "ts_us": ts.cast(pa.int64()),
            "event_id": t.column(id_col).cast(pa.int64()),
            "value": t.column(value_col).cast(pa.float64()),
        })

    return ds.map_batches(fn, batch_format="pyarrow")


def _seg_starts(k: np.ndarray) -> np.ndarray:
    if len(k) == 0:
        return np.empty(0, np.int64)
    return np.nonzero(np.r_[True, k[1:] != k[:-1]])[0]


def _asof_kernel(t: pa.Table) -> pa.Table:
    """One partition's rows (both sides) -> left rows with their as-of
    match. Sort by (key, ts, side, event_id); rights at equal ts precede
    lefts (inclusive <=), and the max-event_id right wins a (key, ts) tie
    because the per-key running maximum below keeps the LATEST right
    position."""
    k = _col_i64(t, "key")
    ts = _col_i64(t, "ts_us")
    side = t.column("_side").to_numpy(zero_copy_only=False)
    eid = _col_i64(t, "event_id")
    val = _col_f64(t, "value")
    order = np.lexsort((eid, side, ts, k))
    k, ts, side, eid, val = (a[order] for a in (k, ts, side, eid, val))
    n = len(k)
    if n == 0:
        return _ASOF_SCHEMA.empty_table()
    seg = np.cumsum(np.r_[False, k[1:] != k[:-1]]).astype(np.int64)
    idx = np.arange(n, dtype=np.int64)
    is_r = side == 0
    rpos = np.where(is_r, idx, np.int64(-1))
    big = np.int64(n + 2)
    # per-key running max of "last right position": compose (seg, rpos+1)
    # into one monotone int64 so a single cummax resets at key boundaries
    comp = seg * big + (rpos + 1)
    cm = np.maximum.accumulate(comp)
    same_seg = (cm // big) == seg
    last_r = np.where(same_seg, cm % big - 1, np.int64(-1))
    lmask = ~is_r
    lr = last_r[lmask]
    hit = lr >= 0
    safe = np.where(hit, lr, 0)
    return pa.table({
        "event_id": pa.array(eid[lmask], pa.int64()),
        "key": pa.array(k[lmask], pa.int64()),
        "ts_us": pa.array(ts[lmask], pa.int64()),
        "matched_event_id": pa.array(
            np.where(hit, eid[safe], np.int64(-1)), pa.int64()),
        "matched_ts_us": pa.array(
            np.where(hit, ts[safe], np.int64(-1)), pa.int64()),
        "matched_value": pa.array(
            np.where(hit, val[safe], -1.0), pa.float64()),
    })


def asof_join(left: ray.data.Dataset, right: ray.data.Dataset,
              key: str = "user_id", ts_col: str = "ts",
              id_col: str = "event_id", value_col: str = "value",
              num_parts: Optional[int] = None) -> ray.data.Dataset:
    """-> (event_id, key, ts_us, matched_event_id, matched_ts_us,
    matched_value); unmatched left rows carry -1 / -1 / -1.0 (LEFT join).

    Assumes non-null key/ts/value columns (the events contract); a null
    right value would surface as NaN where SQL reports NULL."""
    if num_parts is None:
        num_parts = _default_parts(left, right)
    both = _tag_side(right, 0, key, ts_col, id_col, value_col, num_parts) \
        .union(_tag_side(left, 1, key, ts_col, id_col, value_col, num_parts))
    out = both.groupby("_part").map_groups(
        _asof_kernel, batch_format="pyarrow")
    return out


def _range_kernel_factory(width_us: int, scale: float):
    width = np.int64(width_us)

    def kern(t: pa.Table) -> pa.Table:
        k = _col_i64(t, "key")
        ts = _col_i64(t, "ts_us")
        side = t.column("_side").to_numpy(zero_copy_only=False)
        eid = _col_i64(t, "event_id")
        val = _col_f64(t, "value")
        is_r0 = side == 0
        nr = int(is_r0.sum())
        lmask = ~is_r0
        nl = len(k) - nr
        if nl == 0:
            return _RANGE_SCHEMA.empty_table()
        kl, tl, el = k[lmask], ts[lmask], eid[lmask]
        kr, tr, vr = k[is_r0], ts[is_r0], val[is_r0]
        cents = np.floor(vr * scale).astype(np.int64)
        # merged array: rights + upper probes (at t) + lower probes (at
        # t - width); rights sort before probes at equal ts so both
        # prefix counts are "rights with ts <= probe ts" (window is the
        # half-open (t - width, t])
        k3 = np.concatenate([kr, kl, kl])
        t3 = np.concatenate([tr, tl, tl - width])
        tag = np.concatenate([np.zeros(nr, np.int8),
                              np.ones(2 * nl, np.int8)])
        qid = np.concatenate([np.full(nr, -1, np.int64),
                              np.arange(nl, dtype=np.int64),
                              np.arange(nl, dtype=np.int64)])
        qlo = np.concatenate([np.zeros(nr, np.int8), np.zeros(nl, np.int8),
                              np.ones(nl, np.int8)])
        order = np.lexsort((tag, t3, k3))
        k3, t3, tag, qid, qlo = (a[order] for a in (k3, t3, tag, qid, qlo))
        is_r = tag == 0
        cnt = np.cumsum(is_r).astype(np.int64)
        # rights keep their (k, t) sort order inside the merged order
        # (stable lexsort; rights precede probes in the concat), so their
        # scaled values scatter to the rights' merged positions in the
        # rights' own (k, t) sort order
        sval = np.zeros(len(k3), np.int64)
        sval[np.nonzero(is_r)[0]] = cents[np.lexsort((tr, kr))]
        csum = np.cumsum(sval)
        starts = _seg_starts(k3)
        seg_id = np.cumsum(np.r_[False, k3[1:] != k3[:-1]]).astype(np.int64)
        base_cnt = np.r_[0, cnt][starts]          # cnt before segment start
        base_sum = np.r_[0, csum][starts]
        pref_cnt = cnt - base_cnt[seg_id]
        pref_sum = csum - base_sum[seg_id]
        q = tag == 1
        upper = q & (qlo == 0)
        lower = q & (qlo == 1)
        ucnt = np.zeros(nl, np.int64)
        usum = np.zeros(nl, np.int64)
        lcnt = np.zeros(nl, np.int64)
        lsum = np.zeros(nl, np.int64)
        ucnt[qid[upper]] = pref_cnt[upper]
        usum[qid[upper]] = pref_sum[upper]
        lcnt[qid[lower]] = pref_cnt[lower]
        lsum[qid[lower]] = pref_sum[lower]
        return pa.table({
            "event_id": pa.array(el, pa.int64()),
            "key": pa.array(kl, pa.int64()),
            "ts_us": pa.array(tl, pa.int64()),
            "n_in_window": pa.array(ucnt - lcnt, pa.int64()),
            "sum_scaled": pa.array(usum - lsum, pa.int64()),
        })

    return kern


def range_join_agg(left: ray.data.Dataset, right: ray.data.Dataset,
                   width_us: int, key: str = "user_id", ts_col: str = "ts",
                   id_col: str = "event_id", value_col: str = "value",
                   scale: float = 100.0,
                   num_parts: Optional[int] = None) -> ray.data.Dataset:
    """-> (event_id, key, ts_us, n_in_window, sum_scaled): per left row, the
    count and floor(value*scale) int64 sum of right rows with the same key
    in the window (left_ts - width_us, left_ts]."""
    if num_parts is None:
        num_parts = _default_parts(left, right)
    both = _tag_side(right, 0, key, ts_col, id_col, value_col, num_parts) \
        .union(_tag_side(left, 1, key, ts_col, id_col, value_col, num_parts))
    return both.groupby("_part").map_groups(
        _range_kernel_factory(width_us, scale), batch_format="pyarrow")
