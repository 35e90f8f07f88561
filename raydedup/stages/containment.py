"""Exact containment (substring) candidate generation — prefix filter.

The LSH plane's candidacy is MinHash-probabilistic and bounded below by an
est-Jaccard floor, so a short doc contained in a much longer one (containment
~1.0, Jaccard << 0.7) may never become a candidate. This stage generates
containment candidates EXACTLY (PPJoin-family prefix filtering, public
set-similarity-join literature):

    cont(A, B) = |A n B| / min(|A|, |B|) >= c  (engine default c = 0.9).
    With A the smaller side, at most floor((1-c)|A|) of A's shingles lie
    outside B, so among A's floor((1-c)|A|)+1 SMALLEST shingle hashes at
    least one is in B (pigeonhole). Emitting those as PROBE keys and every
    shingle as an INDEX key guarantees each qualifying pair shares a
    (probe, index) key — recall 1.0 modulo the logged hot-bucket cap.

Execution is the engine's standard sort + run-scan shape (one global sort
of the shingle stream by key; per-block interior runs emit probe x member
pairs, first/last runs finish on the driver or in a boundary groupby), then
canonical dedupe and ALWAYS-exact verification (the est-J prefilter is
bypassed — these candidates exist precisely because est-J is low).

Reference surface: the north-star "suffix-array substring pass"
(BASELINE.json) — re-expressed as shingle containment, which the SQL oracle
can replay exhaustively.
"""

from __future__ import annotations

import logging

import numpy as np
import pyarrow as pa
import ray.data

from raydedup import kernels as K
from raydedup.config import EngineConfig
from raydedup.stages.candidates import DRIVER_SMALL_LIMIT, dedupe_pairs
from raydedup.util import (boundary_columns, boundary_take, collect_up_to,
                           unpack_u64_flat)

logger = logging.getLogger(__name__)

_EMPTY_PAIRS = pa.schema([("id_a", pa.int64()), ("id_b", pa.int64())])
_EMPTY_ROWS = pa.schema([("skey", pa.int64()), ("id", pa.int64()),
                         ("probe", pa.int8())])


def containment_rows(sigs: ray.data.Dataset,
                     cthr: float) -> ray.data.Dataset:
    """signatures -> (skey, id, probe) rows: one INDEX row per (doc,
    shingle), with probe=1 on each doc's floor((1-cthr)*n)+1 smallest
    shingles (per-doc shingle arrays are stored sorted ascending)."""
    frac = 1.0 - cthr

    def emit(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return _EMPTY_ROWS.empty_table()
        flat, offs = unpack_u64_flat(t.column("shingles"))
        ids = t.column("id").to_numpy(zero_copy_only=False).astype(np.int64)
        counts = (offs[1:] - offs[:-1]).astype(np.int64)
        doc_of = np.repeat(np.arange(len(ids), dtype=np.int64), counts)
        # floor(n * (1-cthr)) must be the REAL-arithmetic floor: 1-0.9
        # rounds to 0.0999..98, so bare floor(10 * frac) = 0 loses one
        # probe at every n where n*(1-cthr) is an exact integer and a
        # containment-exactly-at-threshold pair missing the doc's smallest
        # shingle would never collide (recall < 1). The epsilon biases UP
        # only (float error here is ≤ ~1e-9 absolute for n ≤ 1e7); one
        # extra probe is harmless — verification filters exactly.
        p = np.minimum(
            np.floor(counts * frac + 1e-6).astype(np.int64) + 1, counts)
        within = np.arange(len(flat), dtype=np.int64) \
            - np.repeat(offs[:-1], counts)
        probe = within < p[doc_of]
        return pa.table({
            "skey": pa.array(K.to_i63(flat), pa.int64()),
            "id": pa.array(ids[doc_of], pa.int64()),
            "probe": pa.array(probe.astype(np.int8), pa.int8()),
        })

    return sigs.select_columns(["id", "shingles"]) \
        .map_batches(emit, batch_format="pyarrow")


def _emit_probe_pairs(skey: np.ndarray, ids: np.ndarray, probe: np.ndarray,
                      starts: np.ndarray, ends: np.ndarray,
                      run_sel: np.ndarray, cap: int) -> pa.Table:
    """Vectorized probe x member pair emission for the selected runs.

    Hot runs (common shingles) are capped: each probe pairs with at most
    cap members of its run ("no silent caps" — the truncation is logged).
    """
    lens = ends - starts
    live = run_sel & (lens >= 2)
    if not live.any():
        return _EMPTY_PAIRS.empty_table()
    in_live = np.zeros(len(skey), dtype=bool)
    for i in np.nonzero(live)[0]:
        in_live[starts[i]:ends[i]] = True
    ppos = np.nonzero(probe.astype(bool) & in_live)[0]
    if len(ppos) == 0:
        return _EMPTY_PAIRS.empty_table()
    run_of = np.searchsorted(starts, ppos, side="right") - 1
    reps = lens[run_of]
    over = reps > cap + 1
    if over.any():
        logger.warning(
            "containment: %d probe keys in hot buckets capped to %d "
            "members each (%d members dropped)", int(over.sum()), cap,
            int((reps[over] - (cap + 1)).sum()))
        reps = np.minimum(reps, cap + 1)
    total = int(reps.sum())
    offs = np.zeros(len(ppos) + 1, dtype=np.int64)
    np.cumsum(reps, out=offs[1:])
    seg = np.repeat(np.arange(len(ppos), dtype=np.int64), reps)
    within = np.arange(total, dtype=np.int64) - offs[seg]
    partner = starts[run_of][seg] + within
    keep = partner != ppos[seg]
    # a probe whose own slot lies OUTSIDE its run's first `reps` members
    # never hits the self-exclusion above and would emit cap+1 pairs; drop
    # its window's last slot so every probe emits at most cap partners
    outside = (ppos - starts[run_of]) >= reps
    if outside.any():
        keep[offs[1:][outside] - 1] = False
    a = ids[ppos[seg][keep]]
    b = ids[partner[keep]]
    return pa.table({
        "id_a": pa.array(np.minimum(a, b), pa.int64()),
        "id_b": pa.array(np.maximum(a, b), pa.int64()),
    })


def _block_runs(t: pa.Table):
    k = t.column("skey").to_numpy(zero_copy_only=False)
    if len(k) == 0:
        return k, np.empty(0, np.int64), np.empty(0, np.int64)
    starts = np.nonzero(np.r_[True, k[1:] != k[:-1]])[0]
    return k, starts, np.r_[starts[1:], len(k)]


def containment_candidates(sigs: ray.data.Dataset,
                           cfg: EngineConfig) -> ray.data.Dataset:
    """signatures -> canonical candidate pairs covering every pair with
    containment >= cfg.verify.containment_threshold (recall 1.0 modulo the
    logged hot-bucket cap). One global sort of the shingle stream; interior
    runs emit locally, first/last runs of each block finish on the driver
    (or in a small boundary groupby when too large to collect)."""
    cthr = cfg.verify.containment_threshold
    cap = cfg.lsh.max_group_pairs
    rows = containment_rows(sigs, cthr)
    srt = rows.sort("skey").materialize()

    def interior(t: pa.Table) -> pa.Table:
        k, starts, ends = _block_runs(t)
        if len(starts) <= 2:
            return _EMPTY_PAIRS.empty_table()
        ids = t.column("id").to_numpy(zero_copy_only=False)
        probe = t.column("probe").to_numpy(zero_copy_only=False)
        sel = np.zeros(len(starts), dtype=bool)
        sel[1:-1] = True
        return _emit_probe_pairs(k, ids, probe, starts, ends, sel, cap)

    def boundary(t: pa.Table) -> pa.Table:
        _, starts, ends = _block_runs(t)
        take = boundary_take(starts, ends)
        if len(take) == 0:
            return _EMPTY_ROWS.empty_table()
        return boundary_columns(t, ["skey", "id", "probe"], take)

    inner = srt.map_batches(interior, batch_format="pyarrow")
    brows = srt.map_batches(boundary, batch_format="pyarrow")
    btbl = collect_up_to(brows, DRIVER_SMALL_LIMIT)
    if btbl is not None:
        if btbl.num_rows == 0 or "skey" not in btbl.column_names:
            bpairs = ray.data.from_arrow(_EMPTY_PAIRS.empty_table())
        else:
            order = np.lexsort((
                btbl.column("id").to_numpy(zero_copy_only=False),
                btbl.column("skey").to_numpy(zero_copy_only=False)))
            st = btbl.take(pa.array(order))
            k, starts, ends = _block_runs(st)
            sel = np.ones(len(starts), dtype=bool)
            bpairs = ray.data.from_arrow(_emit_probe_pairs(
                k, st.column("id").to_numpy(zero_copy_only=False),
                st.column("probe").to_numpy(zero_copy_only=False),
                starts, ends, sel, cap))
    else:
        def per_group(t: pa.Table) -> pa.Table:
            ids = t.column("id").to_numpy(zero_copy_only=False)
            probe = t.column("probe").to_numpy(zero_copy_only=False)
            starts = np.array([0], dtype=np.int64)
            ends = np.array([t.num_rows], dtype=np.int64)
            return _emit_probe_pairs(
                t.column("skey").to_numpy(zero_copy_only=False), ids,
                probe, starts, ends, np.array([True]), cap)

        bpairs = brows.groupby("skey").map_groups(
            per_group, batch_format="pyarrow")
    return dedupe_pairs(inner.union(bpairs))


def containment_pairs(sigs: ray.data.Dataset,
                      cfg: EngineConfig) -> ray.data.Dataset:
    """Exact substring/containment surface: prefix-filter candidates +
    ALWAYS-exact verification (force_exact bypasses the est-J floor that
    makes the LSH-piggybacked pass under-report at low Jaccard)."""
    from raydedup.stages.verify import verify_pairs
    cands = containment_candidates(sigs, cfg)
    return verify_pairs(cands, sigs, cfg, force_exact=True)
