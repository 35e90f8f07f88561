"""Connected components over the verified-pair Dataset.

Replaces the reference's single-linkage dendrogram cut
(selfclean/cleaner/off_topic_samples/lad_mixin.py:18): CC over pairs with
distance < threshold IS a single-linkage cut at that threshold (SURVEY §2.5).

Two execution paths (config cc_driver_edge_limit):
- small edge sets -> driver-side union-find (exact, cheap);
- large -> distributed hash-min label propagation with pointer-halving:
  each round every id takes min(own label, neighbors' labels, label-of-label),
  implemented as hash joins + groupby-min over Datasets; converges in
  O(log N) rounds; labels materialized per round (ids+labels only, 16 B/row).
Cluster id = min id in the component — canonical regardless of iteration order
(determinism, SURVEY §4).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray.data
from ray.data.aggregate import Min

from raydedup.config import EngineConfig
from raydedup.util import hash_join


def _cc_arrays(ids_a: np.ndarray, ids_b: np.ndarray
               ) -> tuple[np.ndarray, np.ndarray]:
    """Driver-side connected components, fully vectorized: dense re-index +
    iterated min-label propagation with pointer jumping (the numpy analog of
    the distributed hash-min path — no per-edge Python loop).
    Returns (uids sorted ascending, root id per uid)."""
    uids, inv = np.unique(np.concatenate([ids_a, ids_b]),
                          return_inverse=True)
    ea, eb = inv[:len(ids_a)], inv[len(ids_a):]
    labels = np.arange(len(uids), dtype=np.int64)
    while True:
        m = np.minimum(labels[ea], labels[eb])
        new = labels.copy()
        np.minimum.at(new, ea, m)
        np.minimum.at(new, eb, m)
        while True:                       # pointer jumping to fixpoint
            nn = new[new]
            if np.array_equal(nn, new):
                break
            new = nn
        if np.array_equal(new, labels):
            break
        labels = new
    return uids, uids[labels]


def _union_find(ids_a: np.ndarray, ids_b: np.ndarray) -> dict[int, int]:
    """id -> min-id-of-component for every id appearing in an edge (dict view
    of _cc_arrays; kept for tests/small utilities)."""
    uids, roots = _cc_arrays(ids_a, ids_b)
    return dict(zip(uids.tolist(), roots.tolist()))


def _cc_driver(edges: ray.data.Dataset):
    batches = [b for b in edges.select_columns(["id_a", "id_b"])
               .iter_batches(batch_format="pyarrow", batch_size=1 << 20)]
    batches = [b for b in batches if b.num_rows]
    if not batches:
        return None
    tbl = pa.concat_tables(batches, promote_options="default")
    a = tbl.column("id_a").to_numpy(zero_copy_only=False).astype(np.int64)
    b = tbl.column("id_b").to_numpy(zero_copy_only=False).astype(np.int64)
    return _cc_arrays(a, b)


def _cc_distributed(edges: ray.data.Dataset, cfg: EngineConfig) -> ray.data.Dataset:
    """Hash-min propagation entirely as Dataset ops. Returns (id, label) for
    every id that appears in an edge."""
    npart = cfg.join_num_partitions
    # undirected -> both directions
    fwd = edges.select_columns(["id_a", "id_b"]).rename_columns(
        {"id_a": "src", "id_b": "dst"})
    rev = edges.select_columns(["id_a", "id_b"]).rename_columns(
        {"id_b": "src", "id_a": "dst"})
    dedges = fwd.union(rev).materialize()

    labels = (dedges.groupby("src").aggregate(Min("dst", alias_name="nbr_min"))
              .map_batches(lambda t: pa.table({
                  "id": t.column("src"),
                  "label": pa.compute.min_element_wise(t.column("src"),
                                                       t.column("nbr_min")),
              }), batch_format="pyarrow").materialize())

    for _ in range(cfg.cc_max_iters):
        # neighbor labels: join edges with labels on dst, min per src
        nbr = hash_join(dedges, labels, on="dst", right_on="id",
                        num_partitions=npart)
        nbr_min = nbr.groupby("src").aggregate(Min("label", alias_name="nbr_label"))
        merged = hash_join(labels, nbr_min, on="id", right_on="src",
                           num_partitions=npart, join_type="left_outer")

        def take_min(t: pa.Table) -> pa.Table:
            lab = t.column("label")
            nb = pa.compute.fill_null(t.column("nbr_label"), pa.scalar(
                np.iinfo(np.int64).max, pa.int64()))
            new = pa.compute.min_element_wise(lab, nb)
            return pa.table({"id": t.column("id"), "label": new,
                             "changed": pa.compute.not_equal(new, lab)})

        stepped = merged.map_batches(take_min, batch_format="pyarrow")
        # pointer halving: label <- label(label)
        lab_of_lab = hash_join(
            stepped.select_columns(["id", "label", "changed"]),
            stepped.select_columns(["id", "label"]).rename_columns(
                {"id": "lid", "label": "llabel"}),
            on="label", right_on="lid", num_partitions=npart,
            join_type="left_outer")

        def halve(t: pa.Table) -> pa.Table:
            lab = t.column("label")
            ll = pa.compute.fill_null(t.column("llabel"), pa.scalar(
                np.iinfo(np.int64).max, pa.int64()))
            new = pa.compute.min_element_wise(lab, ll)
            return pa.table({"id": t.column("id"), "label": new,
                             "changed": pa.compute.or_(
                                 t.column("changed"),
                                 pa.compute.not_equal(new, lab))})

        new_labels = lab_of_lab.map_batches(halve, batch_format="pyarrow")
        new_labels = new_labels.materialize()
        changed = new_labels.map_batches(
            lambda t: pa.table({"c": [pa.compute.sum(
                pa.compute.cast(t.column("changed"), pa.int64())).as_py() or 0]}),
            batch_format="pyarrow").sum("c")
        labels = new_labels.select_columns(["id", "label"]).materialize()
        if not changed:
            break
    else:
        # exhausting the iteration budget without convergence means the
        # labels are WRONG (one true component reported as several) — say so
        # loudly instead of silently under-merging ("no silent caps")
        import logging
        logging.getLogger(__name__).warning(
            "connected_components: hash-min propagation did NOT converge "
            "within cc_max_iters=%d (last round still changed %s labels); "
            "component labels are under-merged — raise cfg.cc_max_iters",
            cfg.cc_max_iters, changed)
    return labels


def connected_components(edges: ray.data.Dataset, all_ids: ray.data.Dataset,
                         cfg: EngineConfig) -> ray.data.Dataset:
    """-> (id, cluster_id) for EVERY id in all_ids; singletons map to self.

    all_ids: Dataset with column `id` (one row per file).
    """
    n_edges = edges.count()
    if n_edges == 0:
        return all_ids.select_columns(["id"]).map_batches(
            lambda t: pa.table({"id": t.column("id"),
                                "cluster_id": t.column("id")}),
            batch_format="pyarrow")
    if n_edges <= cfg.cc_driver_edge_limit:
        cc = _cc_driver(edges)
        uids, roots = cc if cc is not None else (
            np.empty(0, np.int64), np.empty(0, np.int64))

        def assign(t: pa.Table) -> pa.Table:
            ids = t.column("id").to_numpy(zero_copy_only=False)
            lab = ids.astype(np.int64, copy=True)
            if len(uids):
                pos = np.clip(np.searchsorted(uids, ids), 0, len(uids) - 1)
                has = uids[pos] == ids
                lab = np.where(has, roots[pos], lab)
            return pa.table({"id": t.column("id"),
                             "cluster_id": pa.array(lab, pa.int64())})

        # arrays are broadcast once via closure capture (ray.put under the
        # hood when the task is shipped); fine while the edge set is small.
        return all_ids.select_columns(["id"]).map_batches(
            assign, batch_format="pyarrow")

    labels = _cc_distributed(edges, cfg)
    joined = hash_join(all_ids.select_columns(["id"]), labels, on="id",
                       right_on="id", num_partitions=cfg.join_num_partitions,
                       join_type="left_outer", right_suffix="_lab")

    def finish(t: pa.Table) -> pa.Table:
        lab = t.column("label")
        cid = pa.compute.if_else(pa.compute.is_null(lab), t.column("id"), lab)
        return pa.table({"id": t.column("id"),
                         "cluster_id": pa.compute.cast(cid, pa.int64())})

    return joined.map_batches(finish, batch_format="pyarrow")


def keep_representatives(clusters: ray.data.Dataset) -> ray.data.Dataset:
    """Near-dedup keep-list: one representative per cluster — the canonical
    min-id member, which is exactly the row whose id equals its cluster_id
    (labels are min-id by construction above). The training-data consumption
    of the reference's ranking surfaces (selfclean_cleaner.py:182-246 ranks
    duplicates; a pipeline then DROPS them): filter the (id, cluster_id)
    table to id == cluster_id. Stateless per-batch filter — no shuffle, no
    driver collect; singleton clusters keep themselves.
    """
    def f(t: pa.Table) -> pa.Table:
        keep = pa.compute.equal(t.column("id"), t.column("cluster_id"))
        return t.filter(keep).select(["id"])

    return clusters.map_batches(f, batch_format="pyarrow")
