"""Label-error detection over the sparse verified-pair set.

Reference semantics (selfclean/cleaner/label_errors/intra_extra_distance_mixin.py:12-70):
per sample, min distance to a same-label sample (intra) and to a
different-label sample (extra); score = min_diff^2 / (min_same^2 + min_diff^2),
ranked ASCENDING (small = a different-label file is much closer than any
same-label file = suspicious). `lang` plays the role of the label.

Sparse analog: distances are known only for verified near-dup pairs; any
unseen pair is at distance >= threshold, so missing minima fall back to 1.0
(the clip ceiling — analog of the reference's max-over-other-distances
fallback, :33-40). Guards mirror :48-53: no labels / single distinct label ->
empty result (with a warning).
"""

from __future__ import annotations

import warnings

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray.data
from ray.data.aggregate import Min

from raydedup.config import EngineConfig
from raydedup.util import hash_join


def _endpoint_rows(t: pa.Table) -> pa.Table:
    """(id_a,id_b,distance,lang_a,lang_b) -> per-endpoint rows
    (id, distance, same_label)."""
    same = pc.fill_null(pc.equal(t.column("lang_a"), t.column("lang_b")), False)
    ids = pa.concat_arrays([t.column("id_a").combine_chunks(),
                            t.column("id_b").combine_chunks()])
    d = t.column("distance").combine_chunks()
    dist = pa.concat_arrays([d, d])
    s = same.combine_chunks() if isinstance(same, pa.ChunkedArray) else same
    sames = pa.concat_arrays([s, s])
    d_np = dist.to_numpy(zero_copy_only=False)
    s_np = sames.to_numpy(zero_copy_only=False)
    return pa.table({
        "id": ids,
        # null (not NaN) where the side doesn't apply, so Min ignores it
        "d_same": pa.array(d_np, pa.float64(), mask=~s_np),
        "d_diff": pa.array(d_np, pa.float64(), mask=s_np),
    })


def label_error_scores(verified: ray.data.Dataset, sigs: ray.data.Dataset,
                       cfg: EngineConfig) -> ray.data.Dataset:
    """-> (id, lang, min_same, min_diff, score) sorted ascending by score."""
    langs = sigs.select_columns(["id", "lang"])
    distinct = langs.unique("lang")
    if len(distinct) <= 1:
        warnings.warn("Can't detect label errors with only one label.")
        return ray.data.from_arrow(pa.table({
            "id": pa.array([], pa.int64()),
            "lang": pa.array([], pa.string()),
            "min_same": pa.array([], pa.float64()),
            "min_diff": pa.array([], pa.float64()),
            "score": pa.array([], pa.float64()),
        }))

    npart = cfg.join_num_partitions
    j = hash_join(verified.select_columns(["id_a", "id_b", "distance"]),
                  langs.rename_columns({"lang": "lang_a"}),
                  on="id_a", right_on="id", num_partitions=npart)
    j = hash_join(j, langs.rename_columns({"lang": "lang_b"}),
                  on="id_b", right_on="id", num_partitions=npart)
    per_id = j.map_batches(_endpoint_rows, batch_format="pyarrow") \
        .groupby("id").aggregate(Min("d_same", alias_name="min_same"),
                                 Min("d_diff", alias_name="min_diff"))
    out = hash_join(langs, per_id, on="id", right_on="id",
                    num_partitions=npart, join_type="left_outer",
                    right_schema=pa.schema([("id", pa.int64()),
                                            ("min_same", pa.float64()),
                                            ("min_diff", pa.float64())]))

    def score(t: pa.Table) -> pa.Table:
        ms = pc.fill_null(t.column("min_same"), pa.scalar(np.nan)) \
            .to_numpy(zero_copy_only=False)
        md = pc.fill_null(t.column("min_diff"), pa.scalar(np.nan)) \
            .to_numpy(zero_copy_only=False)
        # unseen pair = far: fall back to the clip ceiling 1.0
        ms = np.where(np.isnan(ms), 1.0, ms)
        md = np.where(np.isnan(md), 1.0, md)
        with np.errstate(invalid="ignore", divide="ignore"):
            sc = (md ** 2) / (ms ** 2 + md ** 2)
        sc = np.where(np.isnan(sc), 0.5, sc)
        return pa.table({
            "id": t.column("id"),
            "lang": t.column("lang"),
            "min_same": pa.array(ms, pa.float64()),
            "min_diff": pa.array(md, pa.float64()),
            "score": pa.array(sc, pa.float64()),
        })

    return out.map_batches(score, batch_format="pyarrow").sort(["score", "id"])
