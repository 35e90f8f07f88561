"""Expansion of representative-level pair rows to exact-duplicate group
members.

The near-dup plane runs over ONE representative per content_sha256 (see
pipeline._exact_pairs_and_reps) so a group of g identical files costs one LSH
participant instead of g. The reference computes all-pairs over every file
(selfclean/cleaner/near_duplicates/embedding_distance_mixin.py:41-83), so a
verified pair (ra, rb) between representatives must be re-expanded to every
member cross pair (a in group(ra), b in group(rb)) — identical content means
identical shingles, so every expanded pair carries the representative pair's
metrics unchanged.

Two paths:
- broadcast (common): multi-member groups are rare and tiny; their
  (rep -> members) map is collected once and applied as a vectorized
  cartesian expansion inside map_batches. Groups of size 1 expand to
  themselves at zero cost (the no-multi fast path returns the input Dataset
  untouched).
- join fallback (forced by tests via candidates.DRIVER_SMALL_LIMIT): pairs
  x (id -> sha) x (sha -> member) hash joins on each side.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray.data

from raydedup.config import EngineConfig
from raydedup.stages import candidates as C
from raydedup.util import collect_up_to, hash_join


def _multi_group_rows(srt: ray.data.Dataset) -> ray.data.Dataset:
    """sha-sorted (content_sha256, id) -> candidate rows of multi-member
    groups: interior runs with >= 2 rows, plus ALL first/last-run rows of each
    block (a multi group can straddle blocks; the driver re-scan merges)."""

    def fn(t: pa.Table) -> pa.Table:
        k, ids, starts, ends = C._runs(t, "content_sha256")
        if len(starts) == 0:
            return pa.table({"content_sha256": t.column("content_sha256").slice(0, 0),
                             "id": pa.array([], pa.int64())})
        lens = ends - starts
        sel = lens >= 2
        sel[0] = True
        sel[-1] = True
        sidx = np.nonzero(sel)[0]
        take = np.concatenate([np.arange(starts[i], ends[i]) for i in sidx])
        return pa.table({
            "content_sha256": pa.array(k[take]).cast(
                t.schema.field("content_sha256").type),
            "id": pa.array(ids[take], pa.int64()),
        })

    return srt.map_batches(fn, batch_format="pyarrow")


def _member_map_driver(btbl: pa.Table):
    """Collected candidate rows -> (rep_ids_sorted, moffs, mflat) arrays for
    groups with >= 2 members, or None when there are no multi groups."""
    if btbl.num_rows == 0 or "content_sha256" not in btbl.column_names:
        return None
    st = btbl.sort_by([("content_sha256", "ascending"), ("id", "ascending")])
    k = st.column("content_sha256").to_numpy(zero_copy_only=False)
    ids = st.column("id").to_numpy(zero_copy_only=False).astype(np.int64)
    starts = np.nonzero(np.r_[True, k[1:] != k[:-1]])[0]
    ends = np.r_[starts[1:], len(k)]
    lens = ends - starts
    multi = lens >= 2
    if not multi.any():
        return None
    sidx = np.nonzero(multi)[0]
    reps = ids[starts[sidx]]                    # min id per group (id-sorted)
    mflat = np.concatenate([ids[starts[i]:ends[i]] for i in sidx])
    moffs = np.zeros(len(sidx) + 1, dtype=np.int64)
    np.cumsum(lens[sidx], out=moffs[1:])
    order = np.argsort(reps)
    # reorder groups so reps are sorted for searchsorted lookup
    reps_s = reps[order]
    glens = (moffs[1:] - moffs[:-1])[order]
    moffs_s = np.zeros(len(order) + 1, dtype=np.int64)
    np.cumsum(glens, out=moffs_s[1:])
    mflat_s = np.concatenate([mflat[moffs[i]:moffs[i + 1]] for i in order])
    return reps_s, moffs_s, mflat_s


def _expand_broadcast(pairs: ray.data.Dataset, mmap) -> ray.data.Dataset:
    reps, moffs, mflat = mmap

    def fn(t: pa.Table) -> pa.Table:
        m = t.num_rows
        if m == 0:
            return t
        a = t.column("id_a").to_numpy(zero_copy_only=False).astype(np.int64)
        b = t.column("id_b").to_numpy(zero_copy_only=False).astype(np.int64)

        def lookup(x):
            pos = np.clip(np.searchsorted(reps, x), 0, len(reps) - 1)
            has = reps[pos] == x
            cnt = np.where(has, moffs[pos + 1] - moffs[pos], 1)
            return pos, has, cnt

        pos_a, has_a, ca = lookup(a)
        pos_b, has_b, cb = lookup(b)
        tot = ca * cb
        if int(tot.sum()) == m:          # nothing to expand
            return t
        offs = np.zeros(m + 1, dtype=np.int64)
        np.cumsum(tot, out=offs[1:])
        total = int(offs[-1])
        pair_idx = np.repeat(np.arange(m, dtype=np.int64), tot)
        within = np.arange(total, dtype=np.int64) - offs[pair_idx]
        ai = within // cb[pair_idx]
        bi = within % cb[pair_idx]
        base_a = moffs[pos_a][pair_idx]
        base_b = moffs[pos_b][pair_idx]
        new_a = np.where(has_a[pair_idx],
                         mflat[np.where(has_a[pair_idx], base_a + ai, 0)],
                         a[pair_idx])
        new_b = np.where(has_b[pair_idx],
                         mflat[np.where(has_b[pair_idx], base_b + bi, 0)],
                         b[pair_idx])
        lo = np.minimum(new_a, new_b)
        hi = np.maximum(new_a, new_b)
        out = t.take(pa.array(pair_idx))
        out = out.set_column(out.schema.get_field_index("id_a"), "id_a",
                             pa.array(lo, pa.int64()))
        out = out.set_column(out.schema.get_field_index("id_b"), "id_b",
                             pa.array(hi, pa.int64()))
        return out

    return pairs.map_batches(fn, batch_format="pyarrow")


def _expand_join(pairs: ray.data.Dataset, srt: ray.data.Dataset,
                 cfg: EngineConfig) -> ray.data.Dataset:
    """Join fallback: build the (rep -> member) expansion map FROM THE
    EXISTING sha-sort via the star-pair run-scan (grouped_pairs mode="star"
    emits (min_id, other_member) for every multi-member run — exactly the
    non-identity expansion rows), union the identity rows, and fan each
    pair side out with one hash join per side (2 joins total). Only taken
    when the multi-group row set exceeds the driver cap."""
    from raydedup.stages.verify import VERIFIED_FIELDS
    pair_schema = pa.schema(VERIFIED_FIELDS)
    npart = cfg.join_num_partitions
    star = C.grouped_pairs(None, "content_sha256", cfg.lsh.max_group_pairs,
                           npart, mode="star", srt=srt)
    ident = srt.select_columns(["id"]).map_batches(
        lambda t: pa.table({"rep": t.column("id"),
                            "member": t.column("id")}),
        batch_format="pyarrow")
    # materialize barriers: upstream of `pairs` is itself a join DAG
    # (verify), and star's boundary fallback is another — running every
    # join operator in ONE streaming DAG over-subscribes the shuffle
    # aggregator actors and can stall a small cluster. Serializing here
    # bounds concurrent joins to the two fan-out joins below.
    pairs = pairs.materialize()
    emap = star.map_batches(
        lambda t: pa.table({"rep": t.column("id_a"),
                            "member": t.column("id_b")}),
        batch_format="pyarrow").union(ident).materialize()

    j1 = hash_join(pairs,
                   emap.rename_columns({"member": "member_a"}),
                   on="id_a", right_on="rep", num_partitions=npart,
                   left_schema=pair_schema,
                   right_schema=pa.schema([("rep", pa.int64()),
                                           ("member_a", pa.int64())]))
    j1_schema = pa.schema(list(pair_schema) + [pa.field("member_a",
                                                        pa.int64())])
    j2 = hash_join(j1.select_columns(
        [f.name for f in j1_schema]),
        emap.rename_columns({"member": "member_b"}),
        on="id_b", right_on="rep", num_partitions=npart,
        left_schema=j1_schema,
        right_schema=pa.schema([("rep", pa.int64()),
                                ("member_b", pa.int64())]))

    def canon(t: pa.Table) -> pa.Table:
        ma = t.column("member_a").to_numpy(zero_copy_only=False)
        mb = t.column("member_b").to_numpy(zero_copy_only=False)
        lo = np.minimum(ma, mb)
        hi = np.maximum(ma, mb)
        keep = [f.name for f in pair_schema
                if f.name not in ("id_a", "id_b")]
        return pa.table({"id_a": pa.array(lo, pa.int64()),
                         "id_b": pa.array(hi, pa.int64()),
                         **{n: t.column(n) for n in keep}})

    return j2.map_batches(canon, batch_format="pyarrow")


def expand_to_members(pairs: ray.data.Dataset, srt: ray.data.Dataset,
                      cfg: EngineConfig) -> ray.data.Dataset:
    """Rep-level verified pairs -> member-level pairs (see module doc).

    `srt` is the already-materialized sha-sort from _exact_pairs_and_reps —
    reused, no extra shuffle."""
    btbl = collect_up_to(_multi_group_rows(srt), C.DRIVER_SMALL_LIMIT)
    if btbl is None:
        return _expand_join(pairs, srt, cfg)
    mmap = _member_map_driver(btbl)
    if mmap is None:
        return pairs                      # no multi-member groups: identity
    return _expand_broadcast(pairs, mmap)
