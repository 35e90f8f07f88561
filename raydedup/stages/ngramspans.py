"""Duplicated n-gram span detection (ExactSubstr semantics).

Finds, per document, the maximal [span_start, span_end) codepoint intervals
covered by k-codepoint windows whose gram occurs at >= 2 distinct (doc, pos)
sites corpus-wide — the "substring duplicated anywhere in the corpus"
surface of Lee et al. 2021 (arXiv:2107.06499, public), and the Ray-native
answer to the north-rule's "suffix-array substring" pass: a suffix array is
the single-node way to FIND repeated substrings (it materializes ~8N bytes
of rank entries); here the same O(N) per-position keys ((gram-hash, doc,
pos), 24 bytes/position) flow through the engine's standard global-sort +
run-scan machinery instead of a global index, then duplicated-gram runs
merge into spans with one (doc, pos) pass.

Reference surface: complements the set-level containment pass
(stages/containment.py; SelfClean itself has no substring plane — its
pairwise semantics are selfclean/cleaner/selfclean_cleaner.py:121-146).

Positions are CODEPOINTS, not bytes, so the DuckDB oracle (substr/length
are codepoint-based) replays the semantics exactly and independently.
ASCII batches stream straight off the Arrow byte buffer (bytes ==
codepoints, fully vectorized); only non-ASCII docs take a per-doc utf-32
decode, mirroring the tokenizer's per-doc routing (stages/textstats.py).

Gram identity is a 63-bit key from two independent Horner polynomial
hashes (distinct odd multipliers) mixed through splitmix64: a collision
needs ~2^31.5 distinct grams in one corpus before even money. The SQL
oracle groups by the gram STRING, so a collision would surface as a driver
hash mismatch rather than pass silently.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray.data

from raydedup import kernels as K
from raydedup.stages.candidates import DRIVER_SMALL_LIMIT
from raydedup.stages.containment import _block_runs
from raydedup.util import boundary_columns, boundary_take, collect_up_to

_U64 = np.uint64
# FNV-1a 64 prime and the odd golden-gamma: independent Horner multipliers.
_PH1 = _U64(0x00000100000001B3)
_PH2 = _U64(0x9E3779B97F4A7C15) | _U64(1)
_SALT = _U64(0xD1B54A32D192ED03)

_ROWS_SCHEMA = pa.schema([("skey", pa.int64()), ("id", pa.int64()),
                          ("pos", pa.int64())])
_HITS_SCHEMA = pa.schema([("id", pa.int64()), ("pos", pa.int64())])
_SPANS_SCHEMA = pa.schema([("doc_id", pa.int64()),
                           ("span_start", pa.int64()),
                           ("span_end", pa.int64())])


def _codepoints(col) -> tuple[np.ndarray, np.ndarray]:
    """String column -> (flat uint64 codepoints, char offsets int64[n+1]).

    ASCII data is a zero-copy byte view widened once; non-ASCII docs are
    decoded individually (the rest of the batch stays on the fast path).
    """
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    bufs = col.buffers()
    off_dtype = np.int64 if (pa.types.is_large_string(col.type)
                             or pa.types.is_large_binary(col.type)) \
        else np.int32
    boffs = np.frombuffer(bufs[1], dtype=off_dtype)[
        col.offset: col.offset + len(col) + 1].astype(np.int64)
    data = np.frombuffer(bufs[2], dtype=np.uint8) if bufs[2] is not None \
        else np.empty(0, np.uint8)
    data = data[boffs[0]:boffs[-1]]
    boffs = boffs - boffs[0]
    hi = data >= 128
    if not hi.any():
        return data.astype(_U64), boffs
    # per-doc non-ASCII byte counts without a Python loop over all docs
    cum = np.zeros(len(data) + 1, dtype=np.int64)
    np.cumsum(hi, out=cum[1:])
    bad = (cum[boffs[1:]] - cum[boffs[:-1]]) > 0
    parts: list[np.ndarray] = []
    lens = np.empty(len(col), dtype=np.int64)
    for i in range(len(col)):
        raw = data[boffs[i]:boffs[i + 1]]
        if bad[i]:
            cp = np.frombuffer(
                raw.tobytes().decode("utf-8").encode("utf-32-le"), "<u4"
            ).astype(_U64)
        else:
            cp = raw.astype(_U64)
        parts.append(cp)
        lens[i] = len(cp)
    offs = np.zeros(len(col) + 1, dtype=np.int64)
    np.cumsum(lens, out=offs[1:])
    flat = np.concatenate(parts) if parts else np.empty(0, _U64)
    return flat, offs


def _window_keys(flat: np.ndarray, k: int) -> np.ndarray:
    """63-bit keys for every length-k window of the flat codepoint stream
    (two Horner chains, splitmix64-mixed). Windows that straddle a doc
    boundary are computed too (cheap) and masked out by the caller."""
    m = len(flat) - k + 1
    if m <= 0:
        return np.empty(0, np.int64)
    h1 = np.zeros(m, dtype=_U64)
    h2 = np.zeros(m, dtype=_U64)
    with np.errstate(over="ignore"):
        for j in range(k):
            w = flat[j:j + m]
            h1 = h1 * _PH1 + w
            h2 = h2 * _PH2 + w
        key = K.splitmix64(h1) ^ K.splitmix64(h2 ^ _SALT)
    return K.to_i63(key)


_SENTINEL = np.int64(np.iinfo(np.int64).max)


def _winnow_select(keys: np.ndarray, m: np.ndarray, w: int) -> np.ndarray:
    """Winnowing fingerprint selection (Schleimer et al. 2003, MOSS —
    public): within every w consecutive window positions of a doc, keep the
    position of the minimal key — selection is determined by CONTENT, so
    two copies of a substring select the same relative positions regardless
    of alignment. Any shared substring of length >= k + w - 1 contains a
    full w-window, hence at least one shared selected gram.

    Vectorized across the whole batch: docs are laid into one padded
    stream with w-1 sentinel (int64 max) separators, so no sliding window
    sees two docs and one argmin pass covers every doc. Windows that
    overhang a doc's edges act as shorter windows (extra edge
    fingerprints — content-determined by that doc alone, so the output is
    invariant to batch/block layout).

    keys: per-position window keys laid out doc-major; m: per-doc position
    counts. Returns a boolean keep-mask over the flat positions.
    """
    total = len(keys)
    keep = np.zeros(total, dtype=bool)
    if total == 0:
        return keep
    pad = w - 1
    nd = len(m)
    starts = np.zeros(nd + 1, dtype=np.int64)
    np.cumsum(m, out=starts[1:])
    # padded position of flat index i in doc d: pad*(d+1) + i
    doc_of = np.repeat(np.arange(nd, dtype=np.int64), m)
    shift = pad * (doc_of + 1)
    plen = total + pad * (nd + 1)
    padded = np.full(plen, _SENTINEL, dtype=np.int64)
    flat_pos = np.arange(total, dtype=np.int64)
    padded[flat_pos + shift] = keys
    win = np.lib.stride_tricks.sliding_window_view(padded, min(w, plen))
    sel = win.argmin(axis=1) + np.arange(win.shape[0], dtype=np.int64)
    sel = np.unique(sel)
    sel = sel[padded[sel] != _SENTINEL]
    # map padded -> flat: subtract the owning doc's shift
    d = np.searchsorted(starts[1:] + pad * (np.arange(nd) + 1), sel,
                        side="right")
    keep[sel - pad * (d + 1)] = True
    return keep


def gram_rows(docs: ray.data.Dataset, k: int, text_col: str = "text",
              id_col: str = "doc_id",
              winnow: int = 0) -> ray.data.Dataset:
    """documents -> one (skey, id, pos) row per in-doc window position.

    winnow=0 (exact): shuffle volume is 24 bytes per codepoint — the same
    order as a distributed suffix-array construction would move (8N rank
    entries per round); at 100 TB this stage IS the cost of exact-substring
    dedup. winnow=w>1 is the scale path: only winnowed fingerprints
    (~2/(w+1) of positions) leave the task, with the MOSS guarantee that
    every duplicated substring of length >= k + w - 1 is still detected
    (span edges trimmed by < w; see dup_ngram_spans).
    """

    def emit(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return _ROWS_SCHEMA.empty_table()
        ids = t.column(id_col).to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        flat, offs = _codepoints(t.column(text_col))
        keys = _window_keys(flat, k)
        lens = offs[1:] - offs[:-1]
        m = np.maximum(lens - k + 1, 0)
        total = int(m.sum())
        if total == 0:
            return _ROWS_SCHEMA.empty_table()
        doc_of = np.repeat(np.arange(len(ids), dtype=np.int64), m)
        starts = np.zeros(len(ids) + 1, dtype=np.int64)
        np.cumsum(m, out=starts[1:])
        pos = np.arange(total, dtype=np.int64) - np.repeat(starts[:-1], m)
        gpos = offs[:-1][doc_of] + pos
        skey = keys[gpos]
        if winnow > 1:
            keep = _winnow_select(skey, m, winnow)
            skey, pos, doc_of = skey[keep], pos[keep], doc_of[keep]
        return pa.table({
            "skey": pa.array(skey, pa.int64()),
            "id": pa.array(ids[doc_of], pa.int64()),
            "pos": pa.array(pos, pa.int64()),
        })

    return docs.map_batches(emit, batch_format="pyarrow")


def _run_members(t: pa.Table, sel: np.ndarray, starts: np.ndarray,
                 ends: np.ndarray) -> pa.Table:
    """(id, pos) rows of every selected run — vectorized gather."""
    lens = (ends - starts)[sel]
    base = starts[sel]
    total = int(lens.sum())
    if total == 0:
        return _HITS_SCHEMA.empty_table()
    seg = np.repeat(np.arange(len(base), dtype=np.int64), lens)
    offs = np.zeros(len(base) + 1, dtype=np.int64)
    np.cumsum(lens, out=offs[1:])
    idx = base[seg] + (np.arange(total, dtype=np.int64) - offs[:-1][seg])
    take = pa.array(idx)
    return pa.table({"id": t.column("id").take(take),
                     "pos": t.column("pos").take(take)})


def dup_gram_hits(rows: ray.data.Dataset) -> ray.data.Dataset:
    """(skey, id, pos) stream -> the (id, pos) sites whose gram occurs at
    >= 2 sites corpus-wide. One global sort by skey; interior runs emit in
    their block, first/last runs of each block finish on the driver (or in
    a boundary groupby when too large to collect) — the engine's standard
    run-scan shape (stages/candidates.py, stages/containment.py)."""
    srt = rows.sort("skey").materialize()

    def interior(t: pa.Table) -> pa.Table:
        _, starts, ends = _block_runs(t)
        if len(starts) <= 2:
            return _HITS_SCHEMA.empty_table()
        sel = np.zeros(len(starts), dtype=bool)
        sel[1:-1] = (ends - starts)[1:-1] >= 2
        return _run_members(t, sel, starts, ends)

    def boundary(t: pa.Table) -> pa.Table:
        _, starts, ends = _block_runs(t)
        take = boundary_take(starts, ends)
        if len(take) == 0:
            return _ROWS_SCHEMA.empty_table()
        return boundary_columns(t, ["skey", "id", "pos"], take)

    inner = srt.map_batches(interior, batch_format="pyarrow")
    brows = srt.map_batches(boundary, batch_format="pyarrow")
    btbl = collect_up_to(brows, DRIVER_SMALL_LIMIT)
    if btbl is not None:
        if btbl.num_rows == 0 or "skey" not in btbl.column_names:
            bhits = ray.data.from_arrow(_HITS_SCHEMA.empty_table())
        else:
            order = np.lexsort((
                btbl.column("pos").to_numpy(zero_copy_only=False),
                btbl.column("id").to_numpy(zero_copy_only=False),
                btbl.column("skey").to_numpy(zero_copy_only=False)))
            st = btbl.take(pa.array(order))
            _, starts, ends = _block_runs(st)
            sel = (ends - starts) >= 2
            bhits = ray.data.from_arrow(_run_members(st, sel, starts, ends))
    else:
        def per_group(t: pa.Table) -> pa.Table:
            if t.num_rows < 2:
                return _HITS_SCHEMA.empty_table()
            return pa.table({"id": t.column("id"), "pos": t.column("pos")})

        bhits = brows.groupby("skey").map_groups(
            per_group, batch_format="pyarrow")
    return inner.union(bhits)


def _merge_sorted(ids: np.ndarray, pos: np.ndarray, k: int,
                  gap: int) -> pa.Table:
    """(id, pos) sorted by (id, pos) -> merged spans: each hit covers
    [p, p+k); hits chain into one span while the next start is <= p + gap
    (gap == k exact; gap == k + w winnowed, where selected sites of one
    duplicated region are up to w apart)."""
    if len(ids) == 0:
        return _SPANS_SCHEMA.empty_table()
    brk = np.ones(len(ids), dtype=bool)
    brk[1:] = (ids[1:] != ids[:-1]) | (pos[1:] - pos[:-1] > gap)
    gstart = np.nonzero(brk)[0]
    gend = np.r_[gstart[1:], len(ids)] - 1
    return pa.table({
        "doc_id": pa.array(ids[gstart], pa.int64()),
        "span_start": pa.array(pos[gstart], pa.int64()),
        "span_end": pa.array(pos[gend] + k, pa.int64()),
    })


def dup_ngram_spans(docs: ray.data.Dataset, k: int = 25,
                    text_col: str = "text",
                    id_col: str = "doc_id",
                    winnow: int = 0) -> ray.data.Dataset:
    """documents -> (doc_id, span_start, span_end) merged duplicated spans.

    winnow=0: exact (every duplicated k-gram position). winnow=w>1: the
    scale path — hit sites are winnowed fingerprints only. Guarantee (per
    MAXIMAL PAIRWISE-SHARED substring, the unit the MOSS proof covers):
    any substring of length >= k + w - 1 shared verbatim between two
    sites is reported at both, with edges trimmed by < w — its first and
    last fully-interior selection windows see identical gram hashes at
    both sites, so both select the same fingerprints. A merged EXACT span
    pieced from shorter segments with different partners carries no such
    guarantee (each piece below k + w - 1 may be dropped entirely). All
    reported sites remain TRUE duplicated positions (winnowing only
    drops, never invents); merge gap widens to k + w.

    Hit sites are a small subset of positions in real corpora; they merge
    on the driver when they fit (collect_up_to) and otherwise per doc in a
    groupby (a group is one doc's hit list — bounded by doc length, so no
    hot-key hazard)."""
    hits = dup_gram_hits(gram_rows(docs, k, text_col, id_col,
                                   winnow=winnow))
    gap = k + winnow if winnow > 1 else k
    tbl = collect_up_to(hits, DRIVER_SMALL_LIMIT)
    if tbl is not None:
        if tbl.num_rows == 0 or "id" not in tbl.column_names:
            return ray.data.from_arrow(_SPANS_SCHEMA.empty_table())
        ids = tbl.column("id").to_numpy(zero_copy_only=False)
        pos = tbl.column("pos").to_numpy(zero_copy_only=False)
        order = np.lexsort((pos, ids))
        return ray.data.from_arrow(
            _merge_sorted(ids[order], pos[order], k, gap))

    def per_doc(t: pa.Table) -> pa.Table:
        ids = t.column("id").to_numpy(zero_copy_only=False)
        pos = t.column("pos").to_numpy(zero_copy_only=False)
        order = np.argsort(pos, kind="stable")
        return _merge_sorted(ids[order], pos[order], k, gap)

    return hits.groupby("id").map_groups(per_doc, batch_format="pyarrow")


def dup_ngram_stats(docs: ray.data.Dataset, k: int = 25,
                    text_col: str = "text",
                    id_col: str = "doc_id") -> ray.data.Dataset:
    """documents -> (doc_id, dup_chars): total codepoints per doc covered
    by duplicated spans (docs with none are absent, as in the SQL)."""
    from ray.data.aggregate import Sum
    spans = dup_ngram_spans(docs, k, text_col, id_col)

    def width(t: pa.Table) -> pa.Table:
        s = t.column("span_start").to_numpy(zero_copy_only=False)
        e = t.column("span_end").to_numpy(zero_copy_only=False)
        return pa.table({"doc_id": t.column("doc_id"),
                         "w": pa.array(e - s, pa.int64())})

    return spans.map_batches(width, batch_format="pyarrow") \
        .groupby("doc_id").aggregate(Sum("w", alias_name="dup_chars"))
