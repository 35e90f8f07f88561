"""Distributed EXACT quantiles over a numeric column — iterative
histogram-refinement rank select.

The reference computes global quantiles driver-side over a dense score
vector (selfclean/cleaner/auto_cleaning_mixin.py:112-115 quantile anchors;
quantile_off_topic_mixin.py:14-30); at 100 TB a score column cannot be
collected, and a global sort just to read a handful of order statistics
moves every row through an all-to-all exchange. This operator computes
exact order statistics with NO sort and NO driver stream:

1. one aggregate pass -> (count, min, max) of the column;
2. per target rank r = floor(q * (n-1)) (the lower/"disc" convention),
   iterate: bucket the half-open value range [lo, hi) into B linear bins,
   one map_batches pass emits per-batch bin counts (a (B,) int64 partial —
   bytes independent of row count), sum them, walk the cumulative
   histogram to the bin holding the rank, and recurse into that bin;
3. when a range's row count <= collect_cap, filter-collect just those
   rows and select the remaining rank exactly with a driver sort.

Bin membership and child-range predicates share the EXACT same edge
floats and comparisons (searchsorted over one edges array; half-open
[e_i, e_{i+1}) bins), so parent rank bookkeeping and child below-counts
can never drift by boundary rounding. A range whose in-range min equals
its max resolves immediately (tie mass that bin refinement alone could
never split). Each refinement multiplies resolution by B, so even an
adversarial distribution needs O(log_B(range/ulp)) passes (~5 at B=4096
for float64); every pass is a streaming scan and all requested quantiles
share the passes. Values must be exactly representable as float64 (int64
magnitudes beyond 2^53 would round — documented domain limit).
"""

from __future__ import annotations

from typing import Sequence

import numpy as np
import pyarrow as pa
import ray.data

_DEFAULT_BINS = 4096
_COLLECT_CAP = 2_000_000


def _rank_of(q: float, n: int) -> int:
    """Lower ("disc") rank convention: the element at floor(q*(n-1)) of the
    ascending order — exact, interpolation-free, and stable under ties."""
    return int(np.floor(q * (n - 1) + 1e-9))


def quantile_select(ds: ray.data.Dataset, col: str,
                    qs: Sequence[float],
                    bins: int = _DEFAULT_BINS,
                    collect_cap: int = _COLLECT_CAP) -> pa.Table:
    """-> pa.Table(q float64, value float64): the EXACT order statistics of
    `col` at quantiles qs (lower/disc convention, see _rank_of). Nulls/NaNs
    are excluded (SQL aggregate semantics); raises on an all-null/empty
    column."""
    qs = sorted(float(q) for q in qs)
    if not qs or qs[0] < 0.0 or qs[-1] > 1.0:
        raise ValueError("quantiles must lie in [0, 1]")
    proj = ds.select_columns([col])

    def clean(t: pa.Table) -> np.ndarray:
        v = t.column(col).to_numpy(zero_copy_only=False)
        if v.dtype.kind == "f":
            v = v[~np.isnan(v)]
        return v.astype(np.float64)

    # pass 0: count/min/max (NaN-safe via the same clean())
    def stats(t: pa.Table) -> pa.Table:
        v = clean(t)
        return pa.table({
            "n": pa.array([len(v)], pa.int64()),
            "lo": pa.array([float(v.min()) if len(v) else np.inf],
                           pa.float64()),
            "hi": pa.array([float(v.max()) if len(v) else -np.inf],
                           pa.float64()),
        })

    n, glo, ghi = 0, np.inf, -np.inf
    for b in proj.map_batches(stats, batch_format="pyarrow") \
            .iter_batches(batch_format="pyarrow", batch_size=1 << 16):
        if b.num_rows:
            n += int(np.sum(b.column("n").to_numpy(zero_copy_only=False)))
            glo = min(glo, float(np.min(b.column("lo").to_numpy(
                zero_copy_only=False))))
            ghi = max(ghi, float(np.max(b.column("hi").to_numpy(
                zero_copy_only=False))))
    if n == 0:
        raise ValueError(f"quantile_select: no non-null values in {col!r}")

    def hist_pass(lo: float, hi: float):
        """One streaming pass over the HALF-OPEN range [lo, hi): per-batch
        bin counts on shared edge floats, the count strictly below lo, and
        the in-range min/max."""
        edges = lo + (hi - lo) * np.arange(bins + 1) / bins
        edges[0], edges[-1] = lo, hi        # exact endpoints

        def fn(t: pa.Table) -> pa.Table:
            v = clean(t)
            inside = (v >= lo) & (v < hi)
            vi = v[inside]
            idx = np.searchsorted(edges, vi, side="right") - 1
            np.clip(idx, 0, bins - 1, out=idx)
            counts = np.bincount(idx, minlength=bins).astype(np.int64)
            return pa.table({
                "below": pa.array([int((v < lo).sum())], pa.int64()),
                "counts": pa.array([counts], pa.list_(pa.int64())),
                "rmin": pa.array([float(vi.min()) if len(vi) else np.inf],
                                 pa.float64()),
                "rmax": pa.array([float(vi.max()) if len(vi) else -np.inf],
                                 pa.float64()),
            })

        below = 0
        total = np.zeros(bins, dtype=np.int64)
        rmin, rmax = np.inf, -np.inf
        for b in proj.map_batches(fn, batch_format="pyarrow") \
                .iter_batches(batch_format="pyarrow", batch_size=1 << 16):
            if not b.num_rows:
                continue
            below += int(np.sum(b.column("below").to_numpy(
                zero_copy_only=False)))
            rmin = min(rmin, float(np.min(b.column("rmin").to_numpy(
                zero_copy_only=False))))
            rmax = max(rmax, float(np.max(b.column("rmax").to_numpy(
                zero_copy_only=False))))
            for chunk in b.column("counts").to_pylist():
                total += np.asarray(chunk, dtype=np.int64)
        return below, total, edges, rmin, rmax

    def exact_in_range(lo: float, hi: float, ranks_rebased: list[int]
                       ) -> list[float]:
        """Collect the rows in [lo, hi) (caller guarantees <= collect_cap)
        and select the rebased ranks exactly."""
        def keep(t: pa.Table) -> pa.Table:
            v = clean(t)
            m = (v >= lo) & (v < hi)
            return pa.table({col: pa.array(v[m], pa.float64())})

        arrs = [b.column(col).to_numpy(zero_copy_only=False)
                for b in proj.map_batches(keep, batch_format="pyarrow")
                .iter_batches(batch_format="pyarrow", batch_size=1 << 20)
                if b.num_rows]
        vals = np.concatenate(arrs) if arrs else np.empty(0)
        vals.sort()
        return [float(vals[r]) for r in ranks_rebased]

    # pending: rank -> half-open range; top range includes ghi exactly
    top_hi = np.nextafter(ghi, np.inf)
    targets = sorted({_rank_of(q, n) for q in qs})
    pending = {r: (glo, top_hi) for r in targets}
    resolved: dict[int, float] = {}
    for _ in range(64):                             # paranoid upper bound
        if not pending:
            break
        by_range: dict[tuple, list] = {}
        for r, rng in pending.items():
            by_range.setdefault(rng, []).append(r)
        nxt: dict[int, tuple] = {}
        for (lo, hi), ranks in by_range.items():
            below, counts, edges, rmin, rmax = hist_pass(lo, hi)
            if rmin == rmax:            # all in-range values identical
                for r in ranks:
                    resolved[r] = rmin
                continue
            in_range = int(counts.sum())
            if in_range <= collect_cap:
                vals = exact_in_range(lo, hi, [r - below for r in ranks])
                for r, v in zip(ranks, vals):
                    resolved[r] = v
                continue
            cum = np.cumsum(counts)
            for r in ranks:
                k = r - below                       # rank within [lo, hi)
                if not 0 <= k < in_range:
                    raise RuntimeError(
                        "quantile_select rank bookkeeping out of range")
                bi = int(np.searchsorted(cum, k, side="right"))
                if int(counts[bi]) <= collect_cap:
                    v = exact_in_range(
                        float(edges[bi]), float(edges[bi + 1]),
                        [k - (int(cum[bi - 1]) if bi else 0)])[0]
                    resolved[r] = v
                else:
                    nxt[r] = (float(edges[bi]), float(edges[bi + 1]))
        pending = nxt
    if pending:
        raise RuntimeError("quantile_select failed to converge")
    return pa.table({
        "q": pa.array(qs, pa.float64()),
        "value": pa.array([resolved[_rank_of(q, n)] for q in qs],
                          pa.float64()),
    })
