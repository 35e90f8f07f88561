"""Embedding-space operators over a `list<float>` embedding column.

- all-pairs cosine-distance pair ranking: the reference's actual near-dup
  semantics (dense distance matrix -> condensed ascending ranking,
  selfclean/cleaner/selfclean_cleaner.py:121-177 +
  near_duplicates/embedding_distance_mixin.py:41-83), feasible at small N and
  kept as the parity surface for the driver `embeddings` table.
- embedding near-dup pairs at a cosine threshold (sparse output).
- brute-force top-k cosine similarity search: each batch of the corpus is
  scored against a BROADCAST query matrix (ray.put once, numpy matmul per
  batch) — the baseline ANN per the task brief; the scale path would bucket
  by coarse quantizer (IVF) using the same groupby machinery as LSH.

All batch kernels are numpy matmuls over Arrow list columns; ids are int64.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray
import ray.data


def _emb_matrix(t: pa.Table, col: str = "embedding") -> np.ndarray:
    arr = t.column(col).combine_chunks()
    n = len(arr)
    if n == 0:
        # width is unknowable from an empty list column; callers guard on
        # num_rows == 0 before any matmul against a non-degenerate side
        return np.zeros((0, 0), dtype=np.float64)
    vals = arr.values.to_numpy(zero_copy_only=False).astype(np.float64)
    return vals.reshape(n, -1)


def _normalize(m: np.ndarray) -> np.ndarray:
    norms = np.linalg.norm(m, axis=1, keepdims=True)
    norms[norms == 0] = 1.0
    return m / norms


def _round9(x: np.ndarray) -> np.ndarray:
    """floor(x*1e9 + 0.5)/1e9 — bitwise-identical to the SQL oracles'
    floor-based rounding (np.round is half-even, DuckDB round is half-away;
    this formula is the same IEEE ops on both sides)."""
    return np.floor(x * 1e9 + 0.5) / 1e9


def load_embeddings(path: str) -> ray.data.Dataset:
    return ray.data.read_parquet(path, columns=["vec_id", "embedding"])


# rows per block in the block-vs-block pair plane: two blocks of this size
# (float64, D~128) are ~32 MB of task heap; K = ceil(N/this) blocks yield
# K(K+1)/2 independent tasks.
PAIR_BLOCK_ROWS = 16384


def _block_pair_index(ds: ray.data.Dataset, id_col: str,
                      target_block_rows: int):
    """Split the embedding table into K object-store blocks and build the
    K(K+1)/2 unordered block-pair task index. Returns (refs, idx_ds)."""
    n = ds.count()
    k = max(1, -(-n // target_block_rows))
    prep = ds.select_columns([id_col, "embedding"]).repartition(k) \
        .materialize()
    refs = prep.to_arrow_refs()
    items = [{"bi": i, "bj": j}
             for i in range(len(refs)) for j in range(i, len(refs))]
    idx_ds = ray.data.from_items(items, override_num_blocks=len(items))
    return refs, idx_ds


def _iter_block_tiles(t: pa.Table, refs, id_col: str):
    """Shared block-pair tile preamble: for each (bi, bj) row of a tile
    index table, fetch the two blocks from the object store, extract ids,
    normalize, matmul — yield (is_diag, ids_a, ids_b, sims) with sims the
    RAW (unrounded) cosine matrix. Empty blocks are skipped. Keeps the
    self-exclusion/rounding determinism contract of every consumer anchored
    to ONE preamble."""
    for bi, bj in zip(t.column("bi").to_pylist(),
                      t.column("bj").to_pylist()):
        ta = ray.get(refs[bi])
        tb = ta if bj == bi else ray.get(refs[bj])
        if ta.num_rows == 0 or tb.num_rows == 0:
            continue                 # empty input block (empty dataset)
        ids_a = ta.column(id_col).to_numpy(
            zero_copy_only=False).astype(np.int64)
        ids_b = ids_a if bj == bi else tb.column(id_col).to_numpy(
            zero_copy_only=False).astype(np.int64)
        m_a = _normalize(_emb_matrix(ta))
        m_b = m_a if bj == bi else _normalize(_emb_matrix(tb))
        yield bi == bj, ids_a, ids_b, m_a @ m_b.T


def _cell_sims(t: pa.Table, id_col: str):
    """Shared routed-cell tile preamble: split one cell's rows into seeds
    (role 0) vs candidates (role 1) and return (ids_s, ids_c, sims) with
    sims ROUNDED (1e-9) and self-pairs masked to -2.0 — or None when the
    cell lacks either role."""
    role = t.column("role").to_numpy(zero_copy_only=False)
    s_mask, c_mask = role == 0, role == 1
    if not s_mask.any() or not c_mask.any():
        return None
    st, ct = t.filter(pa.array(s_mask)), t.filter(pa.array(c_mask))
    ids_s = st.column(id_col).to_numpy(
        zero_copy_only=False).astype(np.int64)
    ids_c = ct.column(id_col).to_numpy(
        zero_copy_only=False).astype(np.int64)
    sims = _round9(
        _normalize(_emb_matrix(st)) @ _normalize(_emb_matrix(ct)).T)
    sims[ids_s[:, None] == ids_c[None, :]] = -2.0     # exclude self
    return ids_s, ids_c, sims


def cosine_pairs(ds: ray.data.Dataset, threshold: float,
                 id_col: str = "vec_id",
                 target_block_rows: int = PAIR_BLOCK_ROWS
                 ) -> ray.data.Dataset:
    """All (id_a < id_b) pairs with cosine similarity >= threshold.

    Block-vs-block execution: the table is split into K object-store blocks
    (zero-copy refs, NEVER collected to the driver) and every unordered
    block pair (i, j) is one task computing its (rows_i x rows_j) similarity
    tile — the reference's chunked all-pairs fit loop
    (selfclean_cleaner.py:121-135) distributed over the tile grid. Peak task
    memory is two blocks + one tile regardless of N; the emitted pair count
    (not N^2) is what flows downstream.

    Rounding boundary: the threshold applies to the UNROUNDED similarity
    (matching the embedding_near_dup_pairs SQL oracle, which filters on raw
    list_cosine_similarity) while the emitted cosine_sim column is rounded
    to 1e-9; ivf_cosine_pairs thresholds the ROUNDED value (so its
    trained=False bucketing is SQL-replayable). The two paths can therefore
    disagree on pairs whose raw similarity lies within 0.5e-9 of the
    threshold."""
    refs, idx_ds = _block_pair_index(ds, id_col, target_block_rows)

    def tile(t: pa.Table) -> pa.Table:
        outs = []
        for is_diag, ids_a, ids_b, sims in _iter_block_tiles(t, refs,
                                                             id_col):
            ia, ib = np.nonzero(sims >= threshold)
            if is_diag:
                keep = ia < ib               # upper triangle once
                ia, ib = ia[keep], ib[keep]
            lo = np.minimum(ids_a[ia], ids_b[ib])
            hi = np.maximum(ids_a[ia], ids_b[ib])
            outs.append(pa.table({
                "id_a": pa.array(lo, pa.int64()),
                "id_b": pa.array(hi, pa.int64()),
                "cosine_sim": pa.array(_round9(sims[ia, ib]),
                                       pa.float64()),
            }))
        return pa.concat_tables(outs) if outs else pa.table({
            "id_a": pa.array([], pa.int64()),
            "id_b": pa.array([], pa.int64()),
            "cosine_sim": pa.array([], pa.float64())})

    return idx_ds.map_batches(tile, batch_format="pyarrow")


def pair_ranking(ds: ray.data.Dataset, id_col: str = "vec_id",
                 limit: int | None = None,
                 metric: str = "cosine") -> ray.data.Dataset:
    """Reference-parity ascending distance pair ranking.

    metric selects a registered distance kernel (raydedup.registry — the
    no-eval replacement for the reference's pluggable distance function,
    selfclean_cleaner.py:77-80): "cosine" = 1-(sim+1)/2 clipped
    (selfclean_cleaner.py:142-149), "projective" = min(|x-y|,|x+y|)/sqrt(2)
    (selfclean/distances/projective_distance.py:6-35). Global ascending sort
    with (id_a, id_b) tie-break replaces the condensed argsort
    (embedding_distance_mixin.py:41-83).
    """
    from raydedup.registry import get_dot_distance
    kernel = get_dot_distance(metric)   # raises for kernels registered
    # without a dot-product form — this plane only has precomputed
    # similarities, not the vectors, so a vector-form-only kernel cannot
    # be applied here (it would silently get wrong inputs)
    pairs = cosine_pairs(ds, threshold=-2.0, id_col=id_col)  # all pairs

    def to_dist(t: pa.Table) -> pa.Table:
        sim = t.column("cosine_sim").to_numpy(zero_copy_only=False)
        dist = _round9(kernel(np.clip(sim, -1.0, 1.0)))
        return pa.table({"id_a": t.column("id_a"), "id_b": t.column("id_b"),
                         "distance": pa.array(dist, pa.float64())})

    ranked = pairs.map_batches(to_dist, batch_format="pyarrow")
    if limit:
        # per-batch partial top-k before the global sort: the sort input is
        # bounded by (#tiles x limit) rows instead of all N^2 pairs
        def local_topk(t: pa.Table) -> pa.Table:
            if t.num_rows <= limit:
                return t
            d = t.column("distance").to_numpy(zero_copy_only=False)
            a = t.column("id_a").to_numpy(zero_copy_only=False)
            b = t.column("id_b").to_numpy(zero_copy_only=False)
            order = np.lexsort((b, a, d))[:limit]
            return t.take(pa.array(np.sort(order)))

        ranked = ranked.map_batches(local_topk, batch_format="pyarrow")
    ranked = ranked.sort(["distance", "id_a", "id_b"])
    return ranked.limit(limit) if limit else ranked


def approx_nn_ranking(ds: ray.data.Dataset, k: int = 5,
                      id_col: str = "vec_id",
                      target_block_rows: int = PAIR_BLOCK_ROWS,
                      method: str = "brute",
                      n_cells: int = 0, n_probe: int = 8,
                      seed: int = 42,
                      trained: bool = True) -> ray.data.Dataset:
    """Per-item nearest-neighbor table for EVERY row — the engine analog of
    the reference's get_approx_near_duplicate_ranking
    (selfclean/cleaner/near_duplicates/embedding_distance_mixin.py:92-127,
    AnnoyIndex angular kNN per sample). Output long-form:
    (seed_idx, rank 1..k-1, nn_idx, nn_dist) with the reference's angular
    distance sqrt(2*(1-cos)); self (the reference's nn_idx_0 == seed_idx) is
    implicit.

    method="brute": block-pair tiles emit each row's LOCAL top-(k-1) per
    tile — recall 1, O(N^2) dot products; the small-N parity gate.
    method="ivf": the scale path (Annoy exists in the reference precisely
    to avoid N^2) — rows are bucketed by an IVF coarse quantizer and each
    seed is scored only against rows in its n_probe nearest cells; compute
    is ~sum_cells |cell| x |probed rows|, sub-quadratic when cells spread.

    Both paths share one reduce: sort by (seed, sim desc, nn) + per-block
    run-scan taking the first k-1 rows per seed (boundary runs finished on
    the driver, candidates.run_minima scheme). Rows into the sort are
    linear in N, never N^2."""
    kk = max(1, k - 1)
    if method == "ivf":
        rows = _ivf_nn_rows(ds, kk, id_col, n_cells, n_probe, seed,
                            trained=trained)
        return _rank_nn_rows(rows, kk)
    refs, idx_ds = _block_pair_index(ds, id_col, target_block_rows)

    def local_topk(sims: np.ndarray, ids_rows: np.ndarray,
                   ids_cols: np.ndarray) -> pa.Table:
        # per-row top-m under the SAME (sim desc, nn_idx asc) order the
        # global reduce uses — argpartition alone drops arbitrary tied
        # candidates before the global sort (duplicate embeddings make tied
        # sims the common case in a dedup corpus)
        m = min(kk, sims.shape[1])
        idx = np.lexsort(
            (np.broadcast_to(ids_cols, sims.shape), -sims), axis=1)[:, :m]
        take = np.take_along_axis(sims, idx, axis=1).ravel()
        # drop the -2.0 fill_diagonal self-sentinel rows that survive the
        # top-m when a seed has fewer than m real neighbors in this tile
        # (same guard as the IVF path) — without it an N <= k corpus emits
        # phantom self-neighbors at distance 2.0
        keep = take > -2.0
        return pa.table({
            "seed_idx": pa.array(np.repeat(ids_rows, m)[keep], pa.int64()),
            "nn_idx": pa.array(ids_cols[idx.ravel()][keep], pa.int64()),
            "sim": pa.array(take[keep], pa.float64()),
        })

    def tile(t: pa.Table) -> pa.Table:
        outs = []
        for is_diag, ids_a, ids_b, sims in _iter_block_tiles(t, refs,
                                                             id_col):
            if is_diag:
                np.fill_diagonal(sims, -2.0)     # exclude self
            outs.append(local_topk(sims, ids_a, ids_b))
            if not is_diag:
                outs.append(local_topk(sims.T.copy(), ids_b, ids_a))
        return pa.concat_tables(outs) if outs else pa.table({
            "seed_idx": pa.array([], pa.int64()),
            "nn_idx": pa.array([], pa.int64()),
            "sim": pa.array([], pa.float64())})

    rows = idx_ds.map_batches(tile, batch_format="pyarrow")
    return _rank_nn_rows(rows, kk)


def _rank_nn_rows(rows: ray.data.Dataset, kk: int) -> ray.data.Dataset:
    """Shared NN reduce: candidate rows (seed_idx, nn_idx, sim) -> ranked
    (seed_idx, rank 1..kk, nn_idx, nn_dist) via one global sort + per-block
    run-scan (boundary runs finished on the driver when small)."""
    srt = rows.sort(["seed_idx", "sim", "nn_idx"],
                    descending=[False, True, False]).materialize()

    def emit(seed, nn, sim, starts, ends):
        """First kk rows per run -> ranked output rows."""
        lens = ends - starts
        take_n = np.minimum(lens, kk)
        seg = np.repeat(np.arange(len(starts)), take_n)
        offs = np.zeros(len(starts) + 1, dtype=np.int64)
        np.cumsum(take_n, out=offs[1:])
        within = np.arange(int(offs[-1]), dtype=np.int64) - offs[seg]
        rowi = starts[seg] + within
        dist = np.sqrt(2.0 * (1.0 - np.clip(sim[rowi], -1.0, 1.0)))
        return pa.table({
            "seed_idx": pa.array(seed[rowi], pa.int64()),
            "rank": pa.array(within + 1, pa.int64()),
            "nn_idx": pa.array(nn[rowi], pa.int64()),
            "nn_dist": pa.array(_round9(dist), pa.float64()),
        })

    from raydedup.stages.candidates import DRIVER_SMALL_LIMIT
    from raydedup.util import collect_up_to

    def _seed_runs(t: pa.Table):
        k_ = t.column("seed_idx").to_numpy(zero_copy_only=False)
        if len(k_) == 0:
            return k_, np.empty(0, np.int64), np.empty(0, np.int64)
        starts = np.nonzero(np.r_[True, k_[1:] != k_[:-1]])[0]
        return k_, starts, np.r_[starts[1:], len(k_)]

    def interior(t: pa.Table) -> pa.Table:
        k_, starts, ends = _seed_runs(t)
        if len(starts) <= 2:
            return pa.schema([("seed_idx", pa.int64()),
                              ("rank", pa.int64()),
                              ("nn_idx", pa.int64()),
                              ("nn_dist", pa.float64())]).empty_table()
        nn = t.column("nn_idx").to_numpy(zero_copy_only=False)
        sim = t.column("sim").to_numpy(zero_copy_only=False)
        return emit(k_, nn, sim, starts[1:-1], ends[1:-1])

    def boundary(t: pa.Table) -> pa.Table:
        k_, starts, ends = _seed_runs(t)
        if len(starts) == 0:
            return pa.table({"seed_idx": pa.array([], pa.int64()),
                             "nn_idx": pa.array([], pa.int64()),
                             "sim": pa.array([], pa.float64())})
        take = np.r_[np.arange(starts[0], ends[0]),
                     np.arange(starts[-1], ends[-1])] if len(starts) > 1 \
            else np.arange(starts[0], ends[0])
        take = np.unique(take)
        return pa.table({
            "seed_idx": pa.array(k_[take], pa.int64()),
            "nn_idx": pa.array(t.column("nn_idx").to_numpy(
                zero_copy_only=False)[take], pa.int64()),
            "sim": pa.array(t.column("sim").to_numpy(
                zero_copy_only=False)[take], pa.float64()),
        })

    inner = srt.map_batches(interior, batch_format="pyarrow")
    brows = srt.map_batches(boundary, batch_format="pyarrow")
    btbl = collect_up_to(brows, DRIVER_SMALL_LIMIT)
    if btbl is not None and btbl.num_rows and \
            "seed_idx" in btbl.column_names:
        order = np.lexsort((
            btbl.column("nn_idx").to_numpy(zero_copy_only=False),
            -btbl.column("sim").to_numpy(zero_copy_only=False),
            btbl.column("seed_idx").to_numpy(zero_copy_only=False)))
        st = btbl.take(pa.array(order))
        seed = st.column("seed_idx").to_numpy(zero_copy_only=False)
        starts = np.nonzero(np.r_[True, seed[1:] != seed[:-1]])[0]
        ends = np.r_[starts[1:], len(seed)]
        bout = ray.data.from_arrow(emit(
            seed, st.column("nn_idx").to_numpy(zero_copy_only=False),
            st.column("sim").to_numpy(zero_copy_only=False), starts, ends))
    elif btbl is not None:
        bout = ray.data.from_arrow(pa.schema(
            [("seed_idx", pa.int64()), ("rank", pa.int64()),
             ("nn_idx", pa.int64()), ("nn_dist", pa.float64())])
            .empty_table())
    else:
        def per_group(t: pa.Table) -> pa.Table:
            order = np.lexsort((
                t.column("nn_idx").to_numpy(zero_copy_only=False),
                -t.column("sim").to_numpy(zero_copy_only=False)))
            st = t.take(pa.array(order))
            n = st.num_rows
            return emit(
                st.column("seed_idx").to_numpy(zero_copy_only=False),
                st.column("nn_idx").to_numpy(zero_copy_only=False),
                st.column("sim").to_numpy(zero_copy_only=False),
                np.array([0]), np.array([n]))

        bout = brows.groupby("seed_idx").map_groups(
            per_group, batch_format="pyarrow")
    return inner.union(bout)


def _train_centroids(smat: np.ndarray, n_cells: int, seed: int,
                     iters: int = 5) -> np.ndarray:
    """Spherical k-means (Lloyd) over a normalized sample: seeded
    random-unit init refined so cells follow the data's mass."""
    rng = np.random.default_rng(seed)
    cents = _normalize(rng.standard_normal((n_cells, smat.shape[1])))
    for _ in range(iters):
        assign = np.argmax(smat @ cents.T, axis=1)
        for c in range(n_cells):
            members = smat[assign == c]
            if len(members):
                cents[c] = members.sum(axis=0)
        cents = _normalize(cents)
    return cents


# driver-side sample size for IVF centroid training (rows)
IVF_TRAIN_SAMPLE = 16384


def rp_centroids(n_cells: int, dim: int, seed: int) -> np.ndarray:
    """Data-independent random-projection cells: normalized rows of a
    seeded standard-normal draw. Exactly reproducible outside the engine
    (the ivf_nn_ranking SQL oracle inlines these as literals), unlike the
    k-means cells which depend on the training sample."""
    rng = np.random.default_rng(seed)
    return _normalize(rng.standard_normal((n_cells, dim)))


def _build_cells(ds: ray.data.Dataset, n_cells: int, seed: int,
                 trained: bool, target_cell_rows: int | None = None
                 ) -> tuple[int, int, np.ndarray]:
    """Coarse-quantizer cells shared by _ivf_route and semantic_dedup:
    default C ~ sqrt(N)/2 (avg cell ~ 2 sqrt(N) rows) clamped at 256 —
    UNLESS target_cell_rows is set, in which case C grows as
    ceil(N / target_cell_rows) past the clamp so the average cell stays
    bounded at any N (semantic_dedup's scale path; the two formulas agree
    for every N <= ~2.1M at the default target, so small-scale results
    are bit-identical to the historical clamp). Centroids are trained on
    a bounded driver-side sample (trained=True) or seeded
    random-projection planes (trained=False, replayable by a SQL oracle).
    Returns (row count, resolved n_cells, unit-norm centroid matrix).

    Driver-side cost is O(sample x C x dim) for training and a C x dim
    float64 broadcast (~2 MB per 1k cells at dim 256) — at C beyond ~10^5
    prefer trained=False (no training matmul) and expect the broadcast to
    be a few hundred MB (ray.put once, shared by all tasks)."""
    n = ds.count()
    if n_cells <= 0:
        n_cells = max(1, min(256, int(round(np.sqrt(n / 4.0)))))
        if target_cell_rows:
            n_cells = max(n_cells, -(-n // target_cell_rows))
    n_cells = min(n_cells, max(1, n))
    batches = list(
        ds.select_columns(["embedding"]).limit(
            IVF_TRAIN_SAMPLE if trained else 1)
        .iter_batches(batch_format="pyarrow", batch_size=IVF_TRAIN_SAMPLE))
    smat = _normalize(_emb_matrix(pa.concat_tables(batches))) if batches \
        else np.zeros((0, 0))            # empty dataset: degenerate cells
    cents = _train_centroids(smat, n_cells, seed) if trained \
        else rp_centroids(n_cells, smat.shape[1], seed)
    return n, n_cells, cents


def _ivf_route(ds: ray.data.Dataset, id_col: str,
               n_cells: int, n_probe: int, seed: int,
               trained: bool = True) -> ray.data.Dataset:
    """IVF bucketing shared by the per-item-NN and threshold-pair paths.

    1. Build C cells — spherical-k-means centroids trained on a bounded
       driver-side sample (trained=True, better recall) or seeded
       random-projection centroids (trained=False, reproducible outside
       the engine so a SQL oracle can replay the exact bucketing);
       broadcast (ray.put) centroids + the REVERSE probe map rev[d] =
       {c : d among the n_probe cells nearest centroid c}.
       Assignment / probe / scoring similarities are all rounded to 1e-9
       (shared floor formula) before any argmax / sort, so an external
       replay with different float op order lands on the same cells.
    2. Route (map_batches): every row is emitted once as a SEED (role 0)
       of its own cell and once as a CANDIDATE (role 1) into each group of
       rev[own_cell] — candidate duplication ~= n_probe, seeds never
       duplicated, so each (seed, cand) pair is scored at most once.

    Downstream: one groupby("grp").map_groups computes the per-cell
    seeds x candidates similarity tile. Compute is sum_c |c| x |probed(c)|
    dot products — sub-quadratic when cells spread; a single giant
    duplicate cluster degenerates to one hot cell (that cell's tile is
    quadratic in its size; the LSH plane's sha-representative collapse is
    the engine's answer for exact dups). Partitioning assumption: one hash
    shuffle by cell id (<= C keys)."""
    _, n_cells, cents = _build_cells(ds, n_cells, seed, trained)
    n_probe = min(n_probe, n_cells)
    csim = _round9(cents @ cents.T)
    # per-row (sim desc, cell asc) — deterministic probe graph
    probe = np.lexsort((np.broadcast_to(
        np.arange(n_cells), csim.shape), -csim), axis=1)[:, :n_probe]
    rev = [[] for _ in range(n_cells)]
    for c in range(n_cells):
        for d in probe[c]:
            rev[int(d)].append(c)
    rev_counts = np.array([len(r) for r in rev], dtype=np.int64)
    rev_offs = np.zeros(n_cells + 1, dtype=np.int64)
    np.cumsum(rev_counts, out=rev_offs[1:])
    rev_flat = np.array([c for r in rev for c in r], dtype=np.int64)
    bref = ray.put((cents, rev_flat, rev_offs, rev_counts))

    def route(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return t.select([id_col, "embedding"]) \
                .append_column("grp", pa.array([], pa.int64())) \
                .append_column("role", pa.array([], pa.int8()))
        cm, rflat, roffs, rcounts = ray.get(bref)
        # argmax of ROUNDED sims, first-max = lowest cell on ties
        cells = np.argmax(_round9(_normalize(_emb_matrix(t)) @ cm.T),
                          axis=1)
        nloc = t.num_rows
        base = t.select([id_col, "embedding"])
        seeds = base.append_column("grp", pa.array(cells, pa.int64())) \
            .append_column("role", pa.array(np.zeros(nloc, np.int8)))
        # vectorized variable-length expansion of rev[cells[i]]
        reps = rcounts[cells]
        total = int(reps.sum())
        seg = np.repeat(np.arange(nloc, dtype=np.int64), reps)
        starts = np.zeros(nloc + 1, dtype=np.int64)
        np.cumsum(reps, out=starts[1:])
        within = np.arange(total, dtype=np.int64) - starts[seg]
        grp = rflat[roffs[cells[seg]] + within]
        cands = base.take(pa.array(seg)) \
            .append_column("grp", pa.array(grp, pa.int64())) \
            .append_column("role", pa.array(np.ones(total, np.int8)))
        return pa.concat_tables([seeds, cands])

    return ds.map_batches(route, batch_format="pyarrow")


def _ivf_nn_rows(ds: ray.data.Dataset, kk: int, id_col: str,
                 n_cells: int, n_probe: int, seed: int,
                 trained: bool = True) -> ray.data.Dataset:
    """IVF-bucketed per-item NN candidate rows (seed_idx, nn_idx, sim):
    per-cell tiles emit each seed's top-kk under the deterministic
    (sim desc, nn asc) order (see _ivf_route for the bucketing)."""
    routed = _ivf_route(ds, id_col, n_cells, n_probe, seed, trained)

    empty = pa.schema([("seed_idx", pa.int64()), ("nn_idx", pa.int64()),
                       ("sim", pa.float64())]).empty_table()

    def score_cell(t: pa.Table) -> pa.Table:
        cell = _cell_sims(t, id_col)
        if cell is None:
            return empty
        ids_s, ids_c, sims = cell
        m = min(kk, sims.shape[1])
        idx = np.lexsort(
            (np.broadcast_to(ids_c, sims.shape), -sims), axis=1)[:, :m]
        take = np.take_along_axis(sims, idx, axis=1).ravel()
        keep = take > -2.0          # drop self rows when pool is tiny
        return pa.table({
            "seed_idx": pa.array(np.repeat(ids_s, m)[keep], pa.int64()),
            "nn_idx": pa.array(ids_c[idx.ravel()][keep], pa.int64()),
            "sim": pa.array(take[keep], pa.float64()),
        })

    return routed.groupby("grp").map_groups(
        score_cell, batch_format="pyarrow")


def ivf_cosine_pairs(ds: ray.data.Dataset, threshold: float,
                     id_col: str = "vec_id", n_cells: int = 0,
                     n_probe: int = 8, seed: int = 42,
                     trained: bool = True) -> ray.data.Dataset:
    """IVF-bucketed threshold pairs — the scale path beside cosine_pairs'
    all-pairs block tiles: (id_a < id_b, cosine_sim >= threshold) emitted
    for every pair whose cells are probe-adjacent in EITHER direction.
    Rounded (1e-9) sims on both the filter and the output so the
    trained=False flavor is replayable by a SQL oracle; a pair reachable
    from both endpoints is deduped by a (id_a, id_b) max-aggregate (the
    two sims are identical by construction)."""
    from ray.data.aggregate import Max
    routed = _ivf_route(ds, id_col, n_cells, n_probe, seed, trained)

    empty = pa.schema([("id_a", pa.int64()), ("id_b", pa.int64()),
                       ("cosine_sim", pa.float64())]).empty_table()

    def score_cell(t: pa.Table) -> pa.Table:
        cell = _cell_sims(t, id_col)
        if cell is None:
            return empty
        ids_s, ids_c, sims = cell
        ia, ib = np.nonzero(sims >= threshold)
        a, b = ids_s[ia], ids_c[ib]
        return pa.table({
            "id_a": pa.array(np.minimum(a, b), pa.int64()),
            "id_b": pa.array(np.maximum(a, b), pa.int64()),
            "cosine_sim": pa.array(sims[ia, ib], pa.float64()),
        })

    pairs = routed.groupby("grp").map_groups(
        score_cell, batch_format="pyarrow")
    out = pairs.groupby(["id_a", "id_b"]).aggregate(
        Max("cosine_sim", alias_name="cosine_sim"))
    return out


# semantic_dedup scale knobs: target average cell size (cells grow as
# ceil(N/this) past the historical 256-cell clamp), rows per prior-max
# tile (two 2048-row float64 tiles are ~32 MB of task heap), and the
# row-count floor below which the hot-cell pre-count pass (an extra
# input scan) is skipped entirely.
SEMDEDUP_TARGET_CELL_ROWS = 8192
SEMDEDUP_TILE_ROWS = 2048
SEMDEDUP_HOT_CHECK_MIN_ROWS = 1_000_000


def _dedup_cell_prior_max(m: np.ndarray, tile_rows: int) -> np.ndarray:
    """max_prior[i] = max over strictly-earlier rows j < i of
    _round9(m[i] . m[j]) — computed block-vs-block so peak tile memory is
    tile_rows^2 floats regardless of the cell size (the round-4 verdict's
    scale fix for the former dense (|c|,|c|) matrix built in one task).
    Each pairwise dot product is the identical BLAS reduction either way,
    and the 1e-9 floor-rounding is applied per tile exactly as it was per
    full matrix, so the result is value-identical to the dense path
    (pinned by the forced-multi-block parity test)."""
    n = len(m)
    max_prior = np.full(n, -2.0)
    for i0 in range(0, n, tile_rows):
        i1 = min(i0 + tile_rows, n)
        mi = m[i0:i1]
        acc = np.full(i1 - i0, -2.0)
        for j0 in range(0, i0, tile_rows):
            j1 = min(j0 + tile_rows, i0)
            tile = _round9(mi @ m[j0:j1].T)
            np.maximum(acc, tile.max(axis=1), out=acc)
        tile = _round9(mi @ mi.T)      # strict-lower-triangle of own block
        tile[np.triu_indices(i1 - i0)] = -2.0
        np.maximum(acc, tile.max(axis=1, initial=-2.0), out=acc)
        max_prior[i0:i1] = acc
    return max_prior


def semantic_dedup(ds: ray.data.Dataset, eps: float,
                   id_col: str = "vec_id", n_cells: int = 0,
                   seed: int = 42,
                   trained: bool = True,
                   target_cell_rows: int = SEMDEDUP_TARGET_CELL_ROWS,
                   tile_rows: int = SEMDEDUP_TILE_ROWS,
                   hot_cell_rows: int | None = None,
                   hot_check_min_rows: int = SEMDEDUP_HOT_CHECK_MIN_ROWS
                   ) -> ray.data.Dataset:
    """SemDeDup semantic deduplication (Abbas et al. 2023,
    arXiv:2303.09540): cluster embeddings with the coarse quantizer, then
    within each cluster keep-first in (centroid_sim ASC, id ASC) order —
    a row is dropped when ANY earlier row in that order has cosine
    similarity >= eps to it (the paper's upper-triangular max over the
    within-cluster pair matrix; ASC order implements its best-performing
    "keep examples with LOW similarity to the centroid" variant).

    The reference has no semantic-dedup surface — this extends the
    near-duplicate plane (selfclean_cleaner.py:121-146 semantics) with the
    standard LLM-corpus operator. One map_batches assigns (cell,
    centroid_sim) against broadcast centroids; one groupby computes the
    per-cluster prior-max. trained=False uses seeded random-projection
    cells so a SQL oracle can replay the bucketing.

    Scale shape (round-4 verdict fix — no dense (|c|,|c|) tile anywhere):
    - cell count grows as ceil(N / target_cell_rows) past the historical
      256 clamp (bit-identical below ~2.1M rows), so the average cell
      stays ~target_cell_rows at any N;
    - within a cell the prior-max is computed in tile_rows x tile_rows
      blocks (_dedup_cell_prior_max), bounding task heap at
      O(|c| x dim + tile_rows^2) instead of O(|c|^2);
    - HOT cells (a giant semantic cluster overwhelming its centroid) are
      detected by a distributed pre-count (only run when N >
      hot_check_min_rows — the pre-count is an extra scan of the input)
      and SALTED into ceil(|c| / hot_cell_rows) deterministic
      splitmix64(id) subcells, each deduplicated independently. Salting
      DROPS cross-subcell prior-similarities — a pair of near-dups split
      across subcells may BOTH be kept (recall loss on the pathological
      cell only, logged loudly; precision is unaffected, and `keep`
      stays deterministic). hot_cell_rows defaults to
      max(4 x target_cell_rows, 32768).

    Output: (vec_id, cell, centroid_sim, max_prior_sim, keep) — keep=1
    rows form the deduplicated corpus; max_prior_sim is -2.0 for the
    first row of each cluster (no prior rows). `cell` is always the TRUE
    quantizer cell, also under salting.
    """
    if hot_cell_rows is None:
        hot_cell_rows = max(4 * target_cell_rows, 32768)
    n, n_cells, cents = _build_cells(ds, n_cells, seed, trained,
                                     target_cell_rows=target_cell_rows)
    cref = ray.put(cents)

    def assign(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return t.select([id_col, "embedding"]) \
                .append_column("cell", pa.array([], pa.int64())) \
                .append_column("centroid_sim", pa.array([], pa.float64()))
        cm = ray.get(cref)
        sims = _round9(_normalize(_emb_matrix(t)) @ cm.T)
        cells = np.argmax(sims, axis=1)          # first-max = lowest cell
        return t.select([id_col, "embedding"]) \
            .append_column("cell", pa.array(cells, pa.int64())) \
            .append_column("centroid_sim", pa.array(
                sims[np.arange(t.num_rows), cells], pa.float64()))

    assigned = ds.map_batches(assign, batch_format="pyarrow")

    splits: dict[int, int] = {}
    if n > hot_check_min_rows:
        # distributed count per cell; only cells ABOVE the hot bound are
        # collected (rare by construction — avg cell ~ target_cell_rows)
        import pyarrow.compute as pc
        counts = assigned.select_columns(["cell"]) \
            .groupby("cell").count()
        cname = [c for c in counts.schema().names if c != "cell"][0]

        def only_hot(t: pa.Table) -> pa.Table:
            return t.filter(pc.greater(
                t.column(cname).cast(pa.int64()),
                pa.scalar(hot_cell_rows, pa.int64())))

        hot = counts.map_batches(only_hot, batch_format="pyarrow") \
            .take_all()
        splits = {int(r["cell"]): -(-int(r[cname]) // hot_cell_rows)
                  for r in hot}
        if splits:
            import logging
            logging.getLogger(__name__).warning(
                "semantic_dedup: %d hot cell(s) over %d rows salted into "
                "subcells (max %d-way); cross-subcell prior-similarities "
                "are dropped for those cells — near-dup pairs split "
                "across subcells may both be kept",
                len(splits), hot_cell_rows, max(splits.values()))

    if splits:
        from raydedup.kernels import splitmix64
        sref = ray.put(splits)

        def salt(t: pa.Table) -> pa.Table:
            cells = t.column("cell").to_numpy(zero_copy_only=False)
            sub = np.zeros(len(cells), dtype=np.int64)
            smap = ray.get(sref)
            ids = t.column(id_col).to_numpy(zero_copy_only=False) \
                .astype(np.int64)
            for c, s in smap.items():
                msk = cells == c
                if msk.any():
                    sub[msk] = (splitmix64(ids[msk].astype(np.uint64))
                                % np.uint64(s)).astype(np.int64)
            # unique across cells: gkey = cell + n_cells * sub
            return t.append_column("_gkey", pa.array(
                cells + n_cells * sub, pa.int64()))

        assigned = assigned.map_batches(salt, batch_format="pyarrow")
    else:
        assigned = assigned.map_batches(
            lambda t: t.append_column(
                "_gkey", t.column("cell").cast(pa.int64())),
            batch_format="pyarrow")

    def dedup_cell(t: pa.Table) -> pa.Table:
        ids = t.column(id_col).to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        cs = t.column("centroid_sim").to_numpy(zero_copy_only=False)
        order = np.lexsort((ids, cs))            # centroid_sim asc, id asc
        m = _normalize(_emb_matrix(t))[order]
        max_prior = _dedup_cell_prior_max(m, tile_rows)
        return pa.table({
            id_col: pa.array(ids[order], pa.int64()),
            "cell": t.column("cell").take(pa.array(order)),
            "centroid_sim": pa.array(cs[order], pa.float64()),
            "max_prior_sim": pa.array(max_prior, pa.float64()),
            "keep": pa.array((max_prior < eps).astype(np.int64)),
        })

    return assigned.groupby("_gkey").map_groups(
        dedup_cell, batch_format="pyarrow")


_KNN_EMPTY = pa.schema([("query_id", pa.int64()),
                        ("neighbor_id", pa.int64()),
                        ("cosine_sim", pa.float64())]).empty_table()


def _make_reduce_topk(k: int):
    """Per-query global top-k merge shared by knn_search and
    ivf_knn_search: (sim desc, neighbor_id asc) order + rank column —
    one definition so the tie-break can never diverge between the two."""
    def reduce_topk(t: pa.Table) -> pa.Table:
        sims = t.column("cosine_sim").to_numpy(zero_copy_only=False)
        nid = t.column("neighbor_id").to_numpy(zero_copy_only=False)
        order = np.lexsort((nid, -sims))[:k]
        out = t.take(order)
        return out.append_column(
            "rank", pa.array(np.arange(1, len(order) + 1), pa.int64()))
    return reduce_topk


def ivf_knn_search(ds: ray.data.Dataset, queries: np.ndarray,
                   query_ids: np.ndarray, k: int, n_cells: int = 64,
                   n_probe: int = 8, seed: int = 42,
                   id_col: str = "vec_id") -> ray.data.Dataset:
    """IVF-bucketed approximate kNN — the scale path beside brute force.

    Coarse quantizer: seeded random-unit init REFINED with a few spherical
    k-means (Lloyd) iterations over a deterministic driver-side sample —
    data-driven cells concentrate probes where the mass is, so recall at a
    fixed n_probe improves over the random-plane cells. Index build: one
    pass assigns each row to its nearest centroid (argmax dot). Query: score
    only rows whose cell is among the query's n_probe closest centroids —
    the per-batch mask replaces a per-cell shuffle, so the whole search
    stays one map_batches + one small groupby(query) reduction, same shape
    as brute force but touching ~n_probe/n_cells of the dot products.
    """
    batches = list(
        ds.select_columns(["embedding"]).limit(IVF_TRAIN_SAMPLE)
        .iter_batches(batch_format="pyarrow", batch_size=IVF_TRAIN_SAMPLE))
    smat = _normalize(_emb_matrix(pa.concat_tables(batches))) if batches \
        else _normalize(queries.astype(np.float64))  # empty corpus: any cells
    cents = _train_centroids(smat, n_cells, seed)
    qn = _normalize(queries.astype(np.float64))
    q_cells = np.argsort(-(qn @ cents.T), axis=1)[:, :n_probe]   # (Q, n_probe)
    qref = ray.put((query_ids.astype(np.int64), qn, cents, q_cells))

    def local_topk(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return _KNN_EMPTY
        qids, qm, cm, qc = ray.get(qref)
        ids = t.column(id_col).to_numpy(zero_copy_only=False).astype(np.int64)
        m = _normalize(_emb_matrix(t))
        cells = np.argmax(m @ cm.T, axis=1)                       # (batch,)
        out_q, out_n, out_s = [], [], []
        for qi in range(len(qids)):
            probe = np.isin(cells, qc[qi])
            if not probe.any():
                continue
            pidx = np.nonzero(probe)[0]
            sims = qm[qi] @ m[probe].T
            kk = min(k, len(sims))
            idx = np.lexsort((ids[pidx], -sims))[:kk]   # tie-break: id asc
            sel = pidx[idx]
            out_q.append(np.full(kk, qids[qi]))
            out_n.append(ids[sel])
            out_s.append(sims[idx])
        if not out_q:
            return _KNN_EMPTY
        return pa.table({
            "query_id": pa.array(np.concatenate(out_q), pa.int64()),
            "neighbor_id": pa.array(np.concatenate(out_n), pa.int64()),
            "cosine_sim": pa.array(np.concatenate(out_s), pa.float64()),
        })

    return ds.map_batches(local_topk, batch_format="pyarrow") \
        .groupby("query_id").map_groups(_make_reduce_topk(k),
                                        batch_format="pyarrow")


def knn_search(ds: ray.data.Dataset, queries: np.ndarray,
               query_ids: np.ndarray, k: int,
               id_col: str = "vec_id",
               round_sims: bool = False) -> ray.data.Dataset:
    """Brute-force top-k cosine neighbors of each query vector.

    queries: (Q, D) matrix, broadcast via ray.put; each corpus batch emits its
    local top-k per query; a final per-query map_groups reduces to the global
    top-k (partial top-k then merge — no full N x Q materialization).
    Ties broken on neighbor id ascending (deterministic).

    round_sims floors sims to the shared 1e-9 grid BEFORE ranking so a
    SQL oracle applying the same floor ranks identically even when its
    cosine differs from BLAS in the last ulps (near-ties become exact
    ties, broken by the shared id-asc rule on both sides)."""
    qn = _normalize(queries.astype(np.float64))
    qref = ray.put((query_ids.astype(np.int64), qn))

    def local_topk(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return _KNN_EMPTY
        qids, qm = ray.get(qref)
        ids = t.column(id_col).to_numpy(zero_copy_only=False).astype(np.int64)
        m = _normalize(_emb_matrix(t))
        sims = qm @ m.T                            # (Q, batch)
        if round_sims:
            sims = _round9(sims)
        kk = min(k, sims.shape[1])
        # (sim desc, id asc) per-query order — matches reduce_topk's
        # tie-break so tied candidates are never dropped locally
        idx = np.lexsort((np.broadcast_to(ids, sims.shape), -sims),
                         axis=1)[:, :kk]
        rows = np.repeat(qids, kk)
        cols = idx.ravel()
        return pa.table({
            "query_id": pa.array(rows, pa.int64()),
            "neighbor_id": pa.array(ids[cols], pa.int64()),
            "cosine_sim": pa.array(
                np.take_along_axis(sims, idx, axis=1).ravel(), pa.float64()),
        })

    return ds.map_batches(local_topk, batch_format="pyarrow") \
        .groupby("query_id").map_groups(_make_reduce_topk(k),
                                        batch_format="pyarrow")
