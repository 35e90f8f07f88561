"""Ranking stages.

- ranked near-duplicate pairs: global ascending sort by (distance, id_a, id_b)
  — the reference's condensed-pair argsort
  (selfclean/cleaner/near_duplicates/embedding_distance_mixin.py:41-83) with an
  explicit multi-key sort for stable ranks under parallelism (SURVEY §4).
- per-id duplicity / off-topic scores: grouped aggregates over the sparse
  verified-pair set — the sanctioned replacement for LAD dendrogram scoring
  (selfclean/scoring/lad_scoring.py:28-208, BASELINE.json north_star).
  duplicity(id)  = sum of (1 - distance) over its verified pairs (high = deeply
                   duplicated); off_topic(id) = 1 - max similarity to any
                   neighbor (1.0 = no near neighbor at all = most isolated,
                   mirroring "a single far outlier ranks first",
                   tests/unittests/cleaner/off_topic_samples/test_lad_scoring.py:9-19).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray.data
from ray.data.aggregate import Count, Max, Sum

from raydedup.config import EngineConfig
from raydedup.util import boundary_columns, boundary_take, hash_join


def ranked_pairs(verified: ray.data.Dataset) -> ray.data.Dataset:
    """Ascending by distance; ties broken on (id_a, id_b). The sort order IS
    the rank (rank column materialization is driver-side for small top-k)."""
    return verified.sort(["distance", "id_a", "id_b"])


def _sim_rows(verified: ray.data.Dataset) -> ray.data.Dataset:
    """Explode verified pairs into per-endpoint similarity rows."""

    def explode(t: pa.Table) -> pa.Table:
        sim = pc.subtract(pa.scalar(1.0), t.column("distance"))
        ids = pa.concat_arrays([t.column("id_a").combine_chunks(),
                                t.column("id_b").combine_chunks()])
        sims = pa.concat_arrays([sim.combine_chunks(), sim.combine_chunks()]) \
            if isinstance(sim, pa.ChunkedArray) else pa.concat_arrays(
                [sim, sim])
        return pa.table({"id": ids, "sim": sims})

    return verified.select_columns(["id_a", "id_b", "distance"]).map_batches(
        explode, batch_format="pyarrow")


def duplicity(verified: ray.data.Dataset, clusters: ray.data.Dataset,
              cfg: EngineConfig) -> ray.data.Dataset:
    """-> (id, cluster_id, cluster_size, duplicity_score, off_topic_score)."""
    npart = cfg.join_num_partitions
    per_id = _sim_rows(verified).groupby("id").aggregate(
        Sum("sim", alias_name="duplicity_score"),
        Max("sim", alias_name="max_sim"),
    )
    sizes = clusters.groupby("cluster_id").aggregate(
        Count(alias_name="cluster_size"))
    clusters_schema = pa.schema([("id", pa.int64()),
                                 ("cluster_id", pa.int64())])
    per_id_schema = pa.schema([("id", pa.int64()),
                               ("duplicity_score", pa.float64()),
                               ("max_sim", pa.float64())])
    out = hash_join(clusters, per_id, on="id", right_on="id",
                    num_partitions=npart, join_type="left_outer",
                    left_schema=clusters_schema, right_schema=per_id_schema)
    joined_schema = pa.schema(list(clusters_schema) + list(per_id_schema)[1:])
    out = hash_join(out, sizes, on="cluster_id", right_on="cluster_id",
                    num_partitions=npart, left_schema=joined_schema,
                    right_schema=pa.schema([("cluster_id", pa.int64()),
                                            ("cluster_size", pa.int64())]))

    def finish(t: pa.Table) -> pa.Table:
        dup = pc.fill_null(t.column("duplicity_score"), pa.scalar(0.0))
        ms = pc.fill_null(t.column("max_sim"), pa.scalar(0.0))
        off = pc.subtract(pa.scalar(1.0), ms)
        return pa.table({
            "id": t.column("id"),
            "cluster_id": t.column("cluster_id"),
            "cluster_size": pc.cast(t.column("cluster_size"), pa.int64()),
            "duplicity_score": pc.cast(dup, pa.float64()),
            "off_topic_score": pc.cast(off, pa.float64()),
        })

    return out.map_batches(finish, batch_format="pyarrow")


def _order_stat_score(vals: np.ndarray, starts: np.ndarray,
                      ends: np.ndarray, i0: int, frac: float,
                      n_total: int) -> np.ndarray:
    """Per run of per-id SORTED distances, the reference quantile statistic
    over the VIRTUAL length-N distance row: v[0] = 0 (self), v[1..k] = known
    pair distances ascending, v[k+1..N-1] = 1.0 (unseen pairs at the clip
    ceiling). Returns np.quantile(v, q)-equivalent (linear interpolation at
    h = q*(N-1) = i0 + frac) for each run."""
    lens = ends - starts

    def v_at(j: int) -> np.ndarray:
        if j <= 0:
            return np.zeros(len(starts))
        idx = starts + j - 1
        known = j <= lens
        safe = np.where(known, np.minimum(idx, len(vals) - 1), 0)
        return np.where(known, vals[safe] if len(vals) else 1.0, 1.0)

    j1 = min(i0 + 1, n_total - 1)
    lo = v_at(i0)
    hi = v_at(j1)
    return lo + frac * (hi - lo)


def quantile_off_topic(dist_pairs: ray.data.Dataset,
                       all_ids: ray.data.Dataset, n_total: int,
                       q: float = 0.01,
                       cfg: EngineConfig | None = None) -> ray.data.Dataset:
    """Reference-parity quantile off-topic score: per sample, the q-quantile
    of its full distance-matrix column (quantile_off_topic_mixin.py:14-31 —
    np.quantile(distance_matrix, q, axis=0), which includes the diagonal 0).

    Sparse analog: distances are known only for verified distance pairs; the
    virtual column is [0 (self)] + known + 1.0 for every unseen pair (clip
    ceiling). Execution: explode pairs to endpoint rows, ONE global sort by
    (id, distance), run-scan order statistics per block (boundary runs
    finished on the driver, same scheme as candidates.run_minima) — no
    per-group Python in the scaled path.

    -> (id, off_topic_q) for every id in all_ids; ranking is descending
    (most isolated first)."""
    from raydedup.stages.candidates import DRIVER_SMALL_LIMIT, _runs
    from raydedup.util import collect_up_to
    cfg = cfg or EngineConfig()
    if n_total <= 1:
        return all_ids.select_columns(["id"]).map_batches(
            lambda t: pa.table({"id": t.column("id"),
                                "off_topic_q": pa.array(
                                    np.zeros(t.num_rows), pa.float64())}),
            batch_format="pyarrow")
    h = q * (n_total - 1)
    i0 = int(np.floor(h))
    frac = float(h - i0)

    def explode_d(t: pa.Table) -> pa.Table:
        ids = pa.concat_arrays([t.column("id_a").combine_chunks(),
                                t.column("id_b").combine_chunks()])
        d = t.column("distance").combine_chunks()
        return pa.table({"id": ids, "d": pa.concat_arrays([d, d])})

    rows = dist_pairs.select_columns(["id_a", "id_b", "distance"]) \
        .map_batches(explode_d, batch_format="pyarrow")
    srt = rows.sort(["id", "d"]).materialize()

    def interior(t: pa.Table) -> pa.Table:
        k, _, starts, ends = _runs(t, "id")
        if len(starts) <= 2:
            return pa.table({"id": pa.array([], pa.int64()),
                             "off_topic_q": pa.array([], pa.float64())})
        vals = t.column("d").to_numpy(zero_copy_only=False)
        sc = _order_stat_score(vals, starts[1:-1], ends[1:-1], i0, frac,
                               n_total)
        return pa.table({"id": pa.array(k[starts[1:-1]], pa.int64()),
                         "off_topic_q": pa.array(sc, pa.float64())})

    def boundary(t: pa.Table) -> pa.Table:
        _, _, starts, ends = _runs(t, "id")
        take = boundary_take(starts, ends)
        if len(take) == 0:
            return pa.table({"id": pa.array([], pa.int64()),
                             "d": pa.array([], pa.float64())})
        return boundary_columns(t, ["id", "d"], take)

    inner = srt.map_batches(interior, batch_format="pyarrow")
    brows = srt.map_batches(boundary, batch_format="pyarrow")
    btbl = collect_up_to(brows, DRIVER_SMALL_LIMIT)
    if btbl is not None and btbl.num_rows and "id" in btbl.column_names:
        st = btbl.sort_by([("id", "ascending"), ("d", "ascending")])
        ids = st.column("id").to_numpy(zero_copy_only=False)
        vals = st.column("d").to_numpy(zero_copy_only=False)
        starts = np.nonzero(np.r_[True, ids[1:] != ids[:-1]])[0]
        ends = np.r_[starts[1:], len(ids)]
        sc = _order_stat_score(vals, starts, ends, i0, frac, n_total)
        bscores = ray.data.from_arrow(pa.table({
            "id": pa.array(ids[starts], pa.int64()),
            "off_topic_q": pa.array(sc, pa.float64())}))
    elif btbl is not None:
        bscores = ray.data.from_arrow(pa.table({
            "id": pa.array([], pa.int64()),
            "off_topic_q": pa.array([], pa.float64())}))
    else:
        def per_group(t: pa.Table) -> pa.Table:
            vals = np.sort(t.column("d").to_numpy(zero_copy_only=False))
            sc = _order_stat_score(vals, np.array([0]),
                                   np.array([len(vals)]), i0, frac, n_total)
            return pa.table({"id": t.column("id").slice(0, 1),
                             "off_topic_q": pa.array(sc, pa.float64())})

        bscores = brows.groupby("id").map_groups(per_group,
                                                 batch_format="pyarrow")
    scores = inner.union(bscores)

    # singleton default: v = [0, 1, 1, ...] -> frac when i0 == 0 else 1.0
    default = frac if i0 == 0 else 1.0
    out = hash_join(all_ids.select_columns(["id"]), scores, on="id",
                    right_on="id", num_partitions=cfg.join_num_partitions,
                    join_type="left_outer",
                    left_schema=pa.schema([("id", pa.int64())]),
                    right_schema=pa.schema([("id", pa.int64()),
                                            ("off_topic_q", pa.float64())]))

    def finish(t: pa.Table) -> pa.Table:
        s = pc.fill_null(t.column("off_topic_q"), pa.scalar(default))
        return pa.table({"id": t.column("id"),
                         "off_topic_q": pc.cast(s, pa.float64())})

    return out.map_batches(finish, batch_format="pyarrow")


def off_topic_ranking(dup: ray.data.Dataset) -> ray.data.Dataset:
    """Most-isolated first (reference off-topic ranking is descending,
    lad_scoring.py:185 / quantile_off_topic_mixin.py:17-21)."""
    return dup.sort(["off_topic_score", "id"], descending=[True, False])


def duplicity_ranking(dup: ray.data.Dataset) -> ray.data.Dataset:
    return dup.sort(["duplicity_score", "id"], descending=[True, False])
