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
from raydedup.util import hash_join


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


def off_topic_ranking(dup: ray.data.Dataset) -> ray.data.Dataset:
    """Most-isolated first (reference off-topic ranking is descending,
    lad_scoring.py:185 / quantile_off_topic_mixin.py:17-21)."""
    return dup.sort(["off_topic_score", "id"], descending=[True, False])


def duplicity_ranking(dup: ray.data.Dataset) -> ray.data.Dataset:
    return dup.sort(["duplicity_score", "id"], descending=[True, False])
