"""Pair verification: estimated Jaccard from MinHash + exact Jaccard over
shingle sets, distance = 1 - J clipped to [0,1].

Replaces the reference's distance computation + clip
(selfclean/cleaner/selfclean_cleaner.py:121-149); distance here is Jaccard
distance of shingle sets rather than embedding cosine, per BASELINE.json
north_star ("candidate pairs are verified by Jaccard estimation plus a
suffix-array substring pass").

Scale note: candidate pairs are joined (hash-partitioned Dataset.join) with a
projected signature table (id, minhash, shingles). The est-Jaccard prefilter
drops clearly-low pairs before the exact set intersection runs; both happen in
one vectorized map_batches after the joins, so only candidate rows — a small
fraction of the corpus — ever carry signature payloads.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray.data

from raydedup.config import EngineConfig
from raydedup.util import hash_join, unpack_u64_2d


def _score_batch(cfg: EngineConfig, force_exact: bool = False):
    P = cfg.minhash.num_perm

    def fn(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        if n == 0:
            return pa.schema(VERIFIED_FIELDS).empty_table()
        sig_a = unpack_u64_2d(batch.column("minhash_a"), P)
        sig_b = unpack_u64_2d(batch.column("minhash_b"), P)
        est = (sig_a == sig_b).mean(axis=1)

        def get_exact(sel: np.ndarray):
            from raydedup import kernels as K
            from raydedup.util import unpack_u64_flat
            flat_a, offs_a = unpack_u64_flat(batch.column("shingles_a"))
            flat_b, offs_b = unpack_u64_flat(batch.column("shingles_b"))
            inter = K.segmented_intersection_sizes2(
                flat_a, offs_a, sel, flat_b, offs_b, sel)
            la = (offs_a[sel + 1] - offs_a[sel]).astype(np.int64)
            lb = (offs_b[sel + 1] - offs_b[sel]).astype(np.int64)
            return inter, la, lb

        return _finish_scores(batch.column("id_a"), batch.column("id_b"),
                              est, get_exact, cfg, force_exact)

    return fn


def _finish_scores(ids_a_col, ids_b_col, est: np.ndarray, get_exact,
                   cfg, force_exact: bool) -> pa.Table:
    """Shared tail of all verification paths (broadcast lookup, sharded
    broadcast, hash join): exact-gate, substring/near-dup classification,
    output table, threshold filter. get_exact(sel) lazily yields
    (intersection_sizes, len_a, len_b) int64 arrays for the selected pair
    positions — each path gathers from its own shingle storage layout.

    Exact set math runs where est J is near/above threshold OR where a
    high-containment substring match is still possible: a contained set of
    size m in a set of size M has J = m/M, so est J alone bounds containment
    candidates from below; cheap blanket rule: exact-check est >= small
    floor."""
    thr = cfg.verify.threshold
    band = cfg.verify.exact_band
    use_exact = cfg.verify.use_exact or force_exact
    cthr = cfg.verify.containment_threshold
    jac = est.copy()
    cont = est.copy()
    if use_exact:
        need = np.ones(len(est), dtype=bool) if force_exact \
            else est >= min(thr - band, 0.2)
        if need.any():
            sel = np.nonzero(need)[0]
            inter, la, lb = get_exact(sel)
            _apply_exact_vals(jac, cont, sel, inter, la, lb)
    dist = np.clip(1.0 - jac, 0.0, 1.0)
    is_dup = jac >= thr
    is_sub = (~is_dup) & (cthr > 0) & (cont >= cthr)
    kind = np.where(is_dup, "near_dup", np.where(is_sub, "substring", ""))
    out = pa.table({
        "id_a": ids_a_col,
        "id_b": ids_b_col,
        "est_jaccard": pa.array(est, pa.float64()),
        "jaccard": pa.array(jac, pa.float64()),
        "containment": pa.array(cont, pa.float64()),
        "distance": pa.array(dist, pa.float64()),
        "match_kind": pa.array(kind.tolist(), pa.string()),
    })
    return out.filter(pa.array(is_dup | is_sub))


def _apply_exact_vals(jac: np.ndarray, cont: np.ndarray, sel: np.ndarray,
                      inter: np.ndarray, la: np.ndarray, lb: np.ndarray
                      ) -> None:
    """Overwrite jac/cont at positions `sel` with exact shingle-set Jaccard /
    containment from precomputed intersection sizes and set sizes."""
    inter = inter.astype(np.float64)
    la = la.astype(np.int64)
    lb = lb.astype(np.int64)
    union = (la + lb).astype(np.float64) - inter
    both_empty = (la + lb) == 0
    jac[sel] = np.where(both_empty, 1.0,
                        inter / np.maximum(union, 1.0))
    m = np.minimum(la, lb).astype(np.float64)
    cont[sel] = np.where(both_empty, 1.0,
                         np.where(m > 0, inter / np.maximum(m, 1.0), 0.0))


VERIFIED_FIELDS = [
    ("id_a", pa.int64()), ("id_b", pa.int64()),
    ("est_jaccard", pa.float64()), ("jaccard", pa.float64()),
    ("containment", pa.float64()), ("distance", pa.float64()),
    ("match_kind", pa.string()),
]


def empty_verified() -> ray.data.Dataset:
    return ray.data.from_arrow(pa.schema(VERIFIED_FIELDS).empty_table())


def exact_score_table(t: pa.Table) -> pa.Table:
    """(id_a, id_b) pairs -> the constant VERIFIED_FIELDS row for EXACT
    duplicates (J = containment = 1, distance = 0). Shared by the flagship
    sha-group path and the incremental plane so a VERIFIED_FIELDS change
    cannot drift the two exact tables' schemas apart."""
    n = t.num_rows
    return pa.table({
        "id_a": t.column("id_a"),
        "id_b": t.column("id_b"),
        "est_jaccard": pa.array(np.ones(n), pa.float64()),
        "jaccard": pa.array(np.ones(n), pa.float64()),
        "containment": pa.array(np.ones(n), pa.float64()),
        "distance": pa.array(np.zeros(n), pa.float64()),
        "match_kind": pa.array(["exact"] * n, pa.string()),
    })


def distance_pairs(verified: ray.data.Dataset) -> ray.data.Dataset:
    """Verified pairs restricted to true distance-metric rows (exact +
    near_dup); substring/containment matches live above the distance
    threshold and are excluded from CC / duplicity / label-error minima."""
    return verified.map_batches(
        lambda t: t.filter(pc.not_equal(t.column("match_kind"),
                                        pa.scalar("substring"))),
        batch_format="pyarrow")


def _collect_ids(ds: ray.data.Dataset, col: str) -> np.ndarray:
    arrs = [b.column(col).to_numpy(zero_copy_only=False)
            for b in ds.select_columns([col])
            .iter_batches(batch_format="pyarrow", batch_size=1 << 22)
            if b.num_rows]
    return np.concatenate(arrs) if arrs else np.empty(0, np.int64)


def _pair_touched_ids(pairs: ray.data.Dataset) -> np.ndarray:
    """Sorted unique ids appearing in either column of a pair dataset."""
    return np.unique(np.concatenate([
        _collect_ids(pairs, "id_a"), _collect_ids(pairs, "id_b")]))


def _semi_filter_to_ids(ds: ray.data.Dataset,
                        cand_ids: np.ndarray) -> ray.data.Dataset:
    """Keep only rows whose id is in the SORTED cand_ids (vectorized
    searchsorted membership; the clip guards the all-greater position)."""

    def keep(t: pa.Table) -> pa.Table:
        ids = t.column("id").to_numpy(zero_copy_only=False)
        pos = np.clip(np.searchsorted(cand_ids, ids), 0, len(cand_ids) - 1)
        return t.filter(pa.array(cand_ids[pos] == ids))

    return ds.map_batches(keep, batch_format="pyarrow")


def _gather_segments(flat: np.ndarray, offsets: np.ndarray,
                     order: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Reorder a ragged (flat, offsets) array so segment i of the output is
    segment order[i] of the input — one vectorized fancy-index gather."""
    starts = offsets[order]
    lens = offsets[order + 1] - starts
    noffs = np.zeros(len(order) + 1, dtype=np.int64)
    np.cumsum(lens, out=noffs[1:])
    if noffs[-1] == 0:
        return flat[:0], noffs
    pos = np.arange(noffs[-1], dtype=np.int64) \
        - np.repeat(noffs[:-1], lens) + np.repeat(starts, lens)
    return flat[pos], noffs


def _assemble_broadcast2(num_perm: int, lo, hi, n_mh_blocks: int, *blocks):
    """Two-source variant of _assemble_broadcast for lean signature tables
    (with_shingles=False): the first n_mh_blocks refs are (id, minhash)
    blocks, the rest are (id, shingles) blocks RECOMPUTED from content for
    the same candidate-touched id set (signatures.compute_shingle_sets).
    The shingle segments are gathered into the minhash side's row order, so
    the returned tuple has the exact single-source layout and the scoring
    lookup is unchanged."""
    mh_blocks = blocks[:n_mh_blocks]
    sh_blocks = blocks[n_mh_blocks:]
    ids_m, perm, mh, _, _ = _assemble_broadcast(
        num_perm, lo, hi, *mh_blocks)
    from raydedup.util import unpack_u64_flat
    kept = []
    for b in sh_blocks:
        if not b.num_rows:
            continue
        ids = b.column("id").to_numpy(zero_copy_only=False)
        m = np.ones(len(ids), dtype=bool)
        if lo is not None:
            m &= ids >= lo
        if hi is not None:
            m &= ids < hi
        if m.any():
            kept.append(b.filter(pa.array(m)))
    if not kept:
        return ids_m, perm, mh, np.empty(0, np.uint64), \
            np.zeros(len(ids_m) + 1, np.int64)
    sub = kept[0] if len(kept) == 1 else \
        pa.concat_tables(kept, promote_options="default")
    sh_ids = sub.column("id").to_numpy(zero_copy_only=False)
    # both sides MUST carry the same id multiset or the gather below would
    # silently pair a row with the wrong shingle segment; a drifted
    # shingle_source (or duplicate ids on one side only) fails loudly here
    if len(sh_ids) != len(ids_m) or \
            not np.array_equal(np.sort(sh_ids, kind="stable"), ids_m):
        raise ValueError(
            "lean-verify shingle side id set diverged from the minhash "
            f"side ({len(sh_ids)} vs {len(ids_m)} rows): shingle_source "
            "must be the (id, content) projection of the SAME ingested "
            "input that produced the signatures")
    flat, offs = unpack_u64_flat(sub.column("shingles"))
    # row r of the mh side holds id ids_m[inv[r]] (inv = sorted position of
    # r); its shingle segment lives at sh row sperm[inv[r]] — both sides
    # carry the same id multiset (asserted above) with stable sorts on
    # both, so equal ids keep their relative order and the maps coincide
    sperm = np.argsort(sh_ids, kind="stable")
    inv = np.empty(len(perm), dtype=np.int64)
    inv[perm] = np.arange(len(perm), dtype=np.int64)
    gflat, goffs = _gather_segments(flat, offs, sperm[inv])
    return ids_m, perm, mh, gflat, goffs


def _assemble_broadcast(num_perm: int, lo, hi, *blocks):
    """Remote body: filtered signature blocks -> one broadcast lookup tuple
    (sorted_ids, perm, minhash 2D, shingle flat, shingle offsets). Runs as a
    Ray task so the payload never transits the driver: block reads from
    same-node plasma are zero-copy and the returned tuple lands directly in
    the object store as the broadcast object (the old path streamed the
    whole subset through driver iter_batches and re-uploaded it with
    ray.put — a serial ~2x-payload round trip that profiled as a
    near-fixed 12-15 s cost at 400k rows regardless of CPU count).

    lo/hi (either may be None) restrict the shard to lo <= id < hi: the
    caller launches one such task per id-range shard so the payload copy —
    fault-bound on /dev/shm at a few hundred MB/s per stream — runs in
    parallel instead of as one serial ~23 s task (measured at 1.6M rows)."""
    from raydedup.util import unpack_u64_2d, unpack_u64_flat
    empty = (np.empty(0, np.int64), np.empty(0, np.int64),
             np.empty((0, num_perm), np.uint64), np.empty(0, np.uint64),
             np.zeros(1, np.int64))
    if lo is not None or hi is not None:
        # range-filter each block BEFORE the concat so a shard task copies
        # only its own ~1/P slice, not the full payload
        kept = []
        for b in blocks:
            if not b.num_rows:
                continue
            ids = b.column("id").to_numpy(zero_copy_only=False)
            m = np.ones(len(ids), dtype=bool)
            if lo is not None:
                m &= ids >= lo
            if hi is not None:
                m &= ids < hi
            if m.any():
                kept.append(b.filter(pa.array(m)))
        blocks = kept
    else:
        blocks = [b for b in blocks if b.num_rows]
    if not blocks:
        return empty
    sub = blocks[0] if len(blocks) == 1 else \
        pa.concat_tables(blocks, promote_options="default")
    ids_orig = sub.column("id").to_numpy(zero_copy_only=False)
    # permutation indirection instead of physically reordering the payloads:
    # row for id x = perm[searchsorted(sorted_ids, x)]
    perm = np.argsort(ids_orig, kind="stable")
    mh = unpack_u64_2d(sub.column("minhash"), num_perm)
    if "shingles" in sub.column_names:
        sh_flat, sh_offsets = unpack_u64_flat(sub.column("shingles"))
    else:
        # lean (minhash-only) blocks: _assemble_broadcast2 attaches the
        # recomputed shingle side itself
        sh_flat = np.empty(0, np.uint64)
        sh_offsets = np.zeros(len(ids_orig) + 1, np.int64)
    return ids_orig[perm], perm, mh, sh_flat, sh_offsets


def _broadcast_verify(pairs: ray.data.Dataset, sigs: ray.data.Dataset,
                      cfg: EngineConfig,
                      force_exact: bool = False,
                      shingle_source: ray.data.Dataset | None = None
                      ) -> ray.data.Dataset:
    """Join-free verification: the signature subset touched by candidates is
    filtered distributedly, assembled into ONE broadcast object by a single
    Ray task over the filtered blocks' object refs (never transiting the
    driver), and looked up per pair batch with searchsorted. Kills two
    hash-join shuffles whose aggregator-actor spin-up dominates wall time
    when the candidate set is small (the common case:
    candidates << corpus).

    With a lean signature table (no `shingles` column), shingle_source must
    be the (id, content) projection of the ingested input: the exact-verify
    shingle sets are recomputed for the candidate-touched subset only
    (signatures.compute_shingle_sets — same kernels, bit-identical sets),
    so the full corpus never materializes its ~87%-of-bytes shingle
    payload."""
    import ray

    has_shingles = shingle_source is None
    cand_ids = _pair_touched_ids(pairs)
    proj_cols = ["id", "minhash", "shingles"] if has_shingles \
        else ["id", "minhash"]
    sub = _semi_filter_to_ids(
        sigs.select_columns(proj_cols), cand_ids).materialize()
    if sub.count() == 0:
        return empty_verified()
    sub_sh = None
    payload_bytes = sub.size_bytes()
    if not has_shingles:
        from raydedup.stages.signatures import compute_shingle_sets
        sub_sh = compute_shingle_sets(
            _semi_filter_to_ids(shingle_source, cand_ids),
            cfg).materialize()
        payload_bytes += sub_sh.size_bytes()
    # shard the assembly by id range (~256 MB payload per shard): the copy
    # into the broadcast object is fault-bound on /dev/shm at a few hundred
    # MB/s per stream, so P parallel shard tasks replace one serial task
    n_shards = int(np.clip(
        payload_bytes // max(1, cfg.verify.broadcast_shard_bytes), 1, 16))
    bounds = cand_ids[(np.arange(1, n_shards) * len(cand_ids)) // n_shards] \
        if n_shards > 1 else np.empty(0, dtype=cand_ids.dtype)
    los = [None] + list(bounds)
    his = list(bounds) + [None]
    if has_shingles:
        asm = ray.remote(num_cpus=1)(_assemble_broadcast)
        refs = [asm.remote(cfg.minhash.num_perm, lo, hi,
                           *sub.to_arrow_refs())
                for lo, hi in zip(los, his)]
    else:
        mh_refs = sub.to_arrow_refs()
        sh_refs = sub_sh.to_arrow_refs()
        asm = ray.remote(num_cpus=1)(_assemble_broadcast2)
        refs = [asm.remote(cfg.minhash.num_perm, lo, hi, len(mh_refs),
                           *mh_refs, *sh_refs)
                for lo, hi in zip(los, his)]
    P = len(refs)

    def score(t: pa.Table) -> pa.Table:
        shards = ray.get(refs)  # zero-copy views into the shard objects
        a = t.column("id_a").to_numpy(zero_copy_only=False)
        b = t.column("id_b").to_numpy(zero_copy_only=False)
        n = len(a)
        if P > 1:
            sa = np.searchsorted(bounds, a, side="right")
            sb = np.searchsorted(bounds, b, side="right")
        else:
            sa = np.zeros(n, dtype=np.int64)
            sb = np.zeros(n, dtype=np.int64)
        ra = np.empty(n, dtype=np.int64)
        rb = np.empty(n, dtype=np.int64)
        for s in range(P):
            ids_s, perm_s = shards[s][0], shards[s][1]
            m = sa == s
            if m.any():
                ra[m] = perm_s[np.searchsorted(ids_s, a[m])]
            m = sb == s
            if m.any():
                rb[m] = perm_s[np.searchsorted(ids_s, b[m])]
        est = np.empty(n, dtype=np.float64)
        combo = sa * P + sb
        for c in np.unique(combo):
            i, j = divmod(int(c), P)
            m = combo == c
            est[m] = (shards[i][2][ra[m]] == shards[j][2][rb[m]]) \
                .mean(axis=1)

        def get_exact(sel: np.ndarray):
            from raydedup import kernels as K
            inter = np.zeros(len(sel), dtype=np.int64)
            la = np.zeros(len(sel), dtype=np.int64)
            lb = np.zeros(len(sel), dtype=np.int64)
            cs = combo[sel]
            for c in np.unique(cs):
                i, j = divmod(int(c), P)
                m = cs == c
                fa, oa = shards[i][3], shards[i][4]
                fb, ob = shards[j][3], shards[j][4]
                ia = ra[sel[m]]
                ib = rb[sel[m]]
                inter[m] = K.segmented_intersection_sizes2(
                    fa, oa, ia, fb, ob, ib)
                la[m] = oa[ia + 1] - oa[ia]
                lb[m] = ob[ib + 1] - ob[ib]
            return inter, la, lb

        return _finish_scores(t.column("id_a"), t.column("id_b"), est,
                              get_exact, cfg, force_exact)

    return pairs.map_batches(score, batch_format="pyarrow")


def _broadcast_bytes_ok(n_pairs: int, sigs: ray.data.Dataset,
                        cfg: EngineConfig) -> bool:
    """Gate the broadcast-verify path on ESTIMATED payload bytes, not just
    pair count: at the id-count limit the collected minhash+shingle subset
    could be tens of GB of driver memory. Estimate = distinct-id upper bound
    (2 * n_pairs) x (mean shingles * 8 + signature bytes + overhead); falls
    back to the join path when it exceeds cfg.broadcast_byte_limit."""
    try:
        mean_sh = sigs.mean("n_shingles") or 0.0
    except Exception:
        # no stats: the SAFE fallback is the join path — approving an
        # ungated broadcast defeats the gate's whole purpose
        return False
    per_row = 8.0 * mean_sh + 8.0 * cfg.minhash.num_perm + 32.0
    return 2.0 * n_pairs * per_row <= cfg.broadcast_byte_limit


def verify_pairs(pairs: ray.data.Dataset, sigs: ray.data.Dataset,
                 cfg: EngineConfig,
                 force_exact: bool = False,
                 shingle_source: ray.data.Dataset | None = None
                 ) -> ray.data.Dataset:
    """Candidate pairs + signatures -> verified pair Dataset
    (id_a, id_b, est_jaccard, jaccard, distance), jaccard >= threshold.

    Small candidate sets (<= cfg.broadcast_id_limit ids) take the broadcast
    path (no shuffle); larger sets fall back to two hash-partitioned joins.
    force_exact bypasses the est-Jaccard prefilter (containment candidates
    exist precisely because their est-J is low).

    shingle_source: required iff `sigs` is a LEAN signature table (built
    with with_shingles=False) — the (id, content) projection the exact
    shingle sets are recomputed from, candidate-touched rows only."""
    pairs = pairs.materialize()
    n = pairs.count()
    if n == 0:
        # empty groupby outputs lose their schema in Ray Data and break the
        # downstream hash join — short-circuit with a typed empty Dataset
        return empty_verified()
    sig_schema = sigs.schema()
    has_shingles = sig_schema is None or "shingles" in sig_schema.names
    if not has_shingles and shingle_source is None:
        raise ValueError("verify_pairs: lean signature table (no shingles "
                         "column) requires shingle_source=(id, content)")
    src = None if has_shingles else shingle_source
    if 2 * n <= cfg.broadcast_id_limit and \
            _broadcast_bytes_ok(n, sigs, cfg):
        return _broadcast_verify(pairs, sigs, cfg, force_exact,
                                 shingle_source=src)
    if not has_shingles:
        # join fallback for lean tables: recompute the shingle sets (for the
        # candidate-touched subset when it is still id-list-small, the whole
        # corpus beyond — the same bytes a stored column would move) and
        # join them onto the minhash projection by id
        from raydedup.stages.signatures import compute_shingle_sets
        mh_proj = sigs.select_columns(["id", "minhash"])
        sh_src = shingle_source
        if 2 * n <= cfg.broadcast_id_limit:
            touched = _pair_touched_ids(pairs)
            mh_proj = _semi_filter_to_ids(mh_proj, touched)
            sh_src = _semi_filter_to_ids(sh_src, touched)
        sh_ds = compute_shingle_sets(sh_src, cfg) \
            .rename_columns({"id": "sh_id"})
        proj = hash_join(mh_proj, sh_ds, on="id", right_on="sh_id",
                         num_partitions=cfg.join_num_partitions) \
            .materialize()
        j1 = hash_join(pairs, proj, on="id_a", right_on="id",
                       num_partitions=cfg.join_num_partitions)
        j1 = j1.rename_columns({"minhash": "minhash_a",
                                "shingles": "shingles_a"}).materialize()
        j2 = hash_join(j1, proj, on="id_b", right_on="id",
                       num_partitions=cfg.join_num_partitions)
        j2 = j2.rename_columns({"minhash": "minhash_b",
                                "shingles": "shingles_b"})
        return j2.map_batches(_score_batch(cfg, force_exact),
                              batch_format="pyarrow")
    proj = sigs.select_columns(["id", "minhash", "shingles"])
    # The join path is entered when the candidate-touched PAYLOAD exceeds
    # the broadcast byte gate — but the candidate ID LIST is ints only
    # (16 B/pair) and almost always still driver-small. Semi-filtering the
    # signature side to candidate-touched rows BEFORE the joins keeps the
    # shuffle at O(candidate rows) instead of O(corpus rows) of ~3 KB
    # payloads (measured at 1.6M rows / 16 CPUs: the unfiltered first join
    # spilled for 12+ minutes; filtered it is seconds).
    if 2 * n <= cfg.broadcast_id_limit:
        proj = _semi_filter_to_ids(proj, _pair_touched_ids(pairs))
    # materialized so j2's schema inference and execution reuse it (an
    # unmaterialized j1 would execute once for .schema() and once again
    # inside j2 — the schema peek alone runs the full join)
    proj = proj.materialize()
    j1 = hash_join(pairs, proj, on="id_a", right_on="id",
                   num_partitions=cfg.join_num_partitions)
    j1 = j1.rename_columns({"minhash": "minhash_a", "shingles": "shingles_a"}) \
        .materialize()
    j2 = hash_join(j1, proj, on="id_b", right_on="id",
                   num_partitions=cfg.join_num_partitions)
    j2 = j2.rename_columns({"minhash": "minhash_b", "shingles": "shingles_b"})
    return j2.map_batches(_score_batch(cfg, force_exact),
                          batch_format="pyarrow")
