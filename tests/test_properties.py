"""Property-based gates (hypothesis) for the numeric kernel layer.

These pin the kernels' contracts on adversarial shapes the example-based
tests cannot enumerate: ragged segments with empties in every position,
mixed ASCII/non-ASCII batches, duplicate-heavy value streams, and
arbitrary run structures for the boundary scheme. Pure numpy/Arrow — no
Ray session needed."""
from __future__ import annotations

import numpy as np
import pyarrow as pa
from hypothesis import given, settings
from hypothesis import strategies as st

from raydedup import kernels as K
from raydedup.util import (boundary_take, pack_u64_2d, pack_u64_ragged,
                           unpack_u64_2d, unpack_u64_flat)

FAST = settings(max_examples=60, deadline=None)

segments = st.lists(
    st.lists(st.integers(0, 2**64 - 1), max_size=12), max_size=8)


@FAST
@given(segments)
def test_segmented_unique_matches_per_segment_np_unique(segs):
    offs = np.zeros(len(segs) + 1, np.int64)
    np.cumsum([len(s) for s in segs], out=offs[1:])
    values = np.array([v for s in segs for v in s], dtype=np.uint64)
    uflat, uoffs = K.segmented_unique(values, offs)
    for i, s in enumerate(segs):
        got = uflat[uoffs[i]:uoffs[i + 1]]
        want = np.unique(np.array(s, dtype=np.uint64))
        assert np.array_equal(got, want), (i, got, want)


@FAST
@given(st.lists(st.sets(st.integers(0, 40), max_size=10),
                min_size=2, max_size=6),
       st.data())
def test_segmented_intersection_matches_intersect1d(sets, data):
    segs = [np.sort(np.array(sorted(s), dtype=np.uint64)) for s in sets]
    offs = np.zeros(len(segs) + 1, np.int64)
    np.cumsum([len(s) for s in segs], out=offs[1:])
    flat = np.concatenate(segs) if segs else np.empty(0, np.uint64)
    n_pairs = data.draw(st.integers(0, 6))
    ia = np.array([data.draw(st.integers(0, len(segs) - 1))
                   for _ in range(n_pairs)], dtype=np.int64)
    ib = np.array([data.draw(st.integers(0, len(segs) - 1))
                   for _ in range(n_pairs)], dtype=np.int64)
    got = K.segmented_intersection_sizes(flat, offs, ia, ib)
    want = np.array([len(np.intersect1d(segs[a], segs[b]))
                     for a, b in zip(ia, ib)], dtype=np.int64)
    assert np.array_equal(got, want)


texts = st.lists(st.text(max_size=40), max_size=6)


@FAST
@given(texts)
def test_tokenize_hash_batch_position_invariant(docs):
    """Each doc's token-hash stream is independent of its batch position
    and of its neighbours (ASCII fast path and mixed path must agree)."""
    flat, offs = K.tokenize_hash_batch(docs)
    for i, d in enumerate(docs):
        solo_flat, solo_offs = K.tokenize_hash_batch([d])
        assert np.array_equal(flat[offs[i]:offs[i + 1]], solo_flat), d


@FAST
@given(texts)
def test_tokenize_hash_arrow_matches_batch(docs):
    flat, offs = K.tokenize_hash_batch(docs)
    for typ in (pa.string(), pa.large_string()):
        aflat, aoffs = K.tokenize_hash_arrow(pa.array(docs, typ))
        assert np.array_equal(aflat, flat) and np.array_equal(aoffs, offs)


@FAST
@given(texts, st.integers(1, 6))
def test_shingle_counts_per_contract(docs, k):
    flat, offs = K.tokenize_hash_batch(docs)
    sh, so = K.shingle_hashes(flat, offs, k)
    lens = offs[1:] - offs[:-1]
    want = np.where(lens == 0, 0, np.where(lens < k, 1, lens - k + 1))
    assert np.array_equal(so[1:] - so[:-1], want)


@FAST
@given(st.lists(st.integers(0, 2**64 - 1), min_size=1, max_size=30),
       st.data())
def test_minhash_invariant_under_permutation_and_duplication(vals, data):
    """A MinHash signature is a function of the shingle SET: shuffling the
    stream or duplicating elements must not change it; identical sets give
    identical signatures (est_jaccard == 1)."""
    seeds = K.perm_seeds(16, seed=7)
    a = np.array(vals, dtype=np.uint64)
    perm = data.draw(st.permutations(list(range(len(vals)))))
    dups = data.draw(st.lists(st.integers(0, len(vals) - 1), max_size=10))
    b = np.concatenate([a[list(perm)], a[dups]]).astype(np.uint64)
    offs_a = np.array([0, len(a)], np.int64)
    offs_b = np.array([0, len(b)], np.int64)
    sig_a = K.minhash_signatures(a, offs_a, seeds)
    sig_b = K.minhash_signatures(b, offs_b, seeds)
    assert np.array_equal(sig_a, sig_b)
    assert K.est_jaccard(sig_a, sig_b)[0] == 1.0


@FAST
@given(st.lists(st.text(max_size=30), max_size=4), st.integers(0, 3))
def test_simhash_position_invariant(docs, pad):
    """Each doc's simhash equals its solo value regardless of batch
    position or trailing/leading empty docs."""
    batch = [""] * pad + docs + [""] * pad
    flat, offs = K.tokenize_hash_batch(batch)
    sh, so = K.shingle_hashes(flat, offs, 3)
    sims = K.simhash64(sh, so)
    for i, d in enumerate(docs):
        f1, o1 = K.tokenize_hash_batch([d])
        s1, so1 = K.shingle_hashes(f1, o1, 3)
        assert sims[pad + i] == K.simhash64(s1, so1)[0]


@FAST
@given(st.integers(1, 5), st.integers(0, 6), st.data())
def test_pack_unpack_2d_roundtrip(width, rows, data):
    m = np.array([[data.draw(st.integers(0, 2**64 - 1))
                   for _ in range(width)] for _ in range(rows)],
                 dtype=np.uint64).reshape(rows, width)
    col = pack_u64_2d(m)
    assert np.array_equal(unpack_u64_2d(col, width), m)


@FAST
@given(segments)
def test_pack_unpack_ragged_roundtrip(segs):
    offs = np.zeros(len(segs) + 1, np.int64)
    np.cumsum([len(s) for s in segs], out=offs[1:])
    flat = np.array([v for s in segs for v in s], dtype=np.uint64)
    col = pack_u64_ragged(flat, offs)
    got_flat, got_offs = unpack_u64_flat(col)
    assert np.array_equal(got_flat, flat)
    assert np.array_equal(got_offs, offs)


@FAST
@given(st.lists(st.integers(0, 5), min_size=0, max_size=40))
def test_boundary_take_plus_interior_covers_block_exactly(keys):
    """The sort+run-scan split contract: boundary rows (first+last run)
    plus interior runs partition the block's rows exactly."""
    k = np.sort(np.array(keys, dtype=np.int64))
    if len(k) == 0:
        starts = np.empty(0, np.int64)
        ends = np.empty(0, np.int64)
    else:
        starts = np.nonzero(np.r_[True, k[1:] != k[:-1]])[0]
        ends = np.r_[starts[1:], len(k)]
    take = boundary_take(starts, ends)
    interior = (np.concatenate([np.arange(starts[i], ends[i])
                                for i in range(1, len(starts) - 1)])
                if len(starts) > 2 else np.empty(0, np.int64))
    both = np.concatenate([take, interior])
    assert len(np.unique(both)) == len(both)          # disjoint
    assert np.array_equal(np.sort(both), np.arange(len(k)))  # complete


@FAST
@given(st.lists(st.integers(0, 2**64 - 1), max_size=20))
def test_to_i63_range_and_determinism(vals):
    x = np.array(vals, dtype=np.uint64)
    a, b = K.to_i63(x), K.to_i63(x)
    assert np.array_equal(a, b)
    assert a.dtype == np.int64 and (a >= 0).all()


@FAST
@given(st.lists(st.integers(0, 2**64 - 1), max_size=16),
       st.lists(st.integers(0, 2**64 - 1), max_size=16))
def test_hamming64_matches_popcount(xs, ys):
    n = min(len(xs), len(ys))
    a = np.array(xs[:n], dtype=np.uint64)
    b = np.array(ys[:n], dtype=np.uint64)
    got = K.hamming64(a, b)
    want = np.array([bin(int(x) ^ int(y)).count("1")
                     for x, y in zip(a, b)], dtype=got.dtype)
    assert np.array_equal(got, want)
    assert (K.hamming64(a, a) == 0).all()


# ----------------------------------------------------------- join kernels

_events = st.lists(
    st.tuples(st.integers(0, 3),            # key
              st.integers(0, 20),           # ts
              st.booleans(),                # is_left
              st.floats(0, 50, allow_nan=False, width=32)),
    max_size=40)


def _merged_table(evs):
    import pyarrow as pa
    return pa.table({
        "_part": pa.array([0] * len(evs), pa.int64()),
        "_side": pa.array([1 if is_l else 0 for _, _, is_l, _ in evs],
                          pa.int8()),
        "key": pa.array([k for k, _, _, _ in evs], pa.int64()),
        "ts_us": pa.array([t for _, t, _, _ in evs], pa.int64()),
        "event_id": pa.array(list(range(len(evs))), pa.int64()),
        "value": pa.array([v for _, _, _, v in evs], pa.float64()),
    })


@FAST
@given(_events)
def test_asof_kernel_matches_python_reference(evs):
    from raydedup.stages.joins import _asof_kernel
    out = _asof_kernel(_merged_table(evs)).to_pydict()
    got = {eid: (m, mt) for eid, m, mt in zip(out["event_id"],
                                              out["matched_event_id"],
                                              out["matched_ts_us"])}
    lefts = [(i, k, t) for i, (k, t, is_l, _) in enumerate(evs) if is_l]
    assert sorted(got) == sorted(i for i, _, _ in lefts)
    for i, k, t in lefts:
        cands = [(tt, j) for j, (kk, tt, is_l, _) in enumerate(evs)
                 if not is_l and kk == k and tt <= t]
        want = max(cands) if cands else (-1, -1)   # max ts, then max eid
        assert got[i] == (want[1], want[0]), (i, got[i], want)


@FAST
@given(_events, st.integers(1, 10))
def test_range_kernel_matches_python_reference(evs, width):
    import math

    from raydedup.stages.joins import _range_kernel_factory
    out = _range_kernel_factory(width, 100.0)(_merged_table(evs)) \
        .to_pydict()
    got = {eid: (n, s) for eid, n, s in zip(out["event_id"],
                                            out["n_in_window"],
                                            out["sum_scaled"])}
    for i, (k, t, is_l, _) in enumerate(evs):
        if not is_l:
            assert i not in got
            continue
        rs = [vv for j, (kk, tt, is_r2, vv) in enumerate(evs)
              if not is_r2 and kk == k and t - width < tt <= t]
        want = (len(rs), sum(int(math.floor(v * 100.0)) for v in rs))
        assert got[i] == want, (i, got[i], want)


@FAST
@given(st.lists(st.tuples(st.integers(0, 4),          # group
                          st.integers(0, 6)),         # value (ties likely)
                max_size=50),
       st.integers(1, 4), st.booleans())
def test_topk_table_matches_pandas_reference(rows, k, desc):
    import pandas as pd
    import pyarrow as pa

    from raydedup.stages.topk import _topk_table
    t = pa.table({
        "lang": pa.array([f"g{g}" for g, _ in rows]),
        "n_chars": pa.array([v for _, v in rows], pa.int64()),
        "doc_id": pa.array(list(range(len(rows))), pa.int64()),
    })
    got = _topk_table(t, "lang", "n_chars", "doc_id", k, desc).to_pydict()
    df = t.to_pandas()
    if len(df):
        df = df.sort_values(["lang", "n_chars", "doc_id"],
                            ascending=[True, not desc, True])
        want = df.groupby("lang", sort=False).head(k)
        assert sorted(got["doc_id"]) == sorted(want.doc_id.tolist())
    else:
        assert got["doc_id"] == []
