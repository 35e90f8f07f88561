"""Round-5 gates: semantic_dedup scale-safety (tiled prior-max, cell-count
growth past the 256 clamp, hot-cell salting) per the round-4 verdict fix
list — the dense (|c|,|c|) single-task tile is gone and these pin that the
replacement is value-identical where semantics are unchanged and loudly
approximate where salting drops cross-subcell priors."""

import numpy as np
import pyarrow as pa
import pytest
import ray.data as rd


def _clustered(n_clusters, per_cluster, d, noise, seed):
    rng = np.random.default_rng(seed)
    centers = rng.normal(size=(n_clusters, d))
    centers /= np.linalg.norm(centers, axis=1, keepdims=True)
    mat = np.repeat(centers, per_cluster, axis=0) \
        + noise * rng.normal(size=(n_clusters * per_cluster, d))
    ids = np.arange(1000, 1000 + len(mat), dtype=np.int64)
    perm = rng.permutation(len(mat))
    return mat[perm].astype(np.float64), ids[perm]


def _emb_table(mat, ids):
    return pa.table({"vec_id": pa.array(ids, pa.int64()),
                     "embedding": pa.array(list(mat))})


def test_semdedup_tiled_prior_max_matches_dense():
    """_dedup_cell_prior_max with a tiny tile (forces many blocks, both
    prior-block and within-block paths) equals the dense masked-matrix
    formula it replaced, bitwise."""
    from raydedup.stages.embedding import (_dedup_cell_prior_max,
                                           _normalize, _round9)
    rng = np.random.default_rng(5)
    for n, d, tile in [(1, 4, 3), (7, 8, 3), (64, 16, 7), (301, 12, 16)]:
        m = _normalize(rng.normal(size=(n, d)))
        dense = _round9(m @ m.T)
        dense[np.triu_indices(n)] = -2.0
        want = dense.max(axis=1, initial=-2.0)
        got = _dedup_cell_prior_max(m, tile)
        assert np.array_equal(got, want), (n, tile)


def test_semdedup_forced_multiblock_parity():
    """Whole-operator parity: semantic_dedup with tile_rows=5 (every cell
    spans many tiles) vs tile_rows large enough for one tile — identical
    output tables (the round-4 verdict's required forced-multi-block
    parity gate)."""
    from raydedup.stages.embedding import semantic_dedup
    mat, ids = _clustered(4, 30, 16, noise=0.25, seed=31)
    ds = rd.from_arrow(_emb_table(mat, ids))
    kw = dict(eps=0.8, n_cells=6, seed=31, trained=False)
    small = semantic_dedup(ds, tile_rows=5, **kw).to_pandas() \
        .sort_values("vec_id").reset_index(drop=True)
    big = semantic_dedup(ds, tile_rows=1 << 20, **kw).to_pandas() \
        .sort_values("vec_id").reset_index(drop=True)
    assert small.shape == big.shape
    for col in small.columns:
        assert (small[col].values == big[col].values).all(), col


def test_semdedup_cell_count_grows_past_clamp():
    """_build_cells with target_cell_rows: below the clamp the historical
    sqrt default is untouched (bit-parity region), and when
    ceil(N/target) exceeds it the cell count grows so the average cell
    stays bounded — the 256 hard cap is gone."""
    from raydedup.stages.embedding import _build_cells
    rng = np.random.default_rng(3)
    mat = rng.normal(size=(3000, 8))
    ds = rd.from_arrow(_emb_table(mat, np.arange(3000, dtype=np.int64)))
    # sqrt default: round(sqrt(3000/4)) = 27; target 100 -> ceil = 30
    n, c_old, _ = _build_cells(ds, 0, 7, trained=False)
    assert (n, c_old) == (3000, 27)
    n, c_new, cents = _build_cells(ds, 0, 7, trained=False,
                                   target_cell_rows=100)
    assert (n, c_new) == (3000, 30)
    assert cents.shape == (30, 8)
    # parity region: target larger than N/sqrt-default leaves it alone
    n, c_same, _ = _build_cells(ds, 0, 7, trained=False,
                                target_cell_rows=8192)
    assert c_same == c_old


def test_semdedup_hot_cell_salting():
    """Force the hot path (hot_check_min_rows=0, tiny hot_cell_rows): the
    output is still row-complete with the TRUE cell column, keep stays
    deterministic across runs, and relaxing the bound back reproduces
    the unsalted result on non-hot data. Cross-subcell priors are
    dropped, so salted keep-counts are >= the unsalted ones per cell."""
    from raydedup.stages.embedding import semantic_dedup
    mat, ids = _clustered(3, 40, 12, noise=0.1, seed=17)
    ds = rd.from_arrow(_emb_table(mat, ids))
    kw = dict(eps=0.85, n_cells=3, seed=17, trained=False)
    plain = semantic_dedup(ds, **kw).to_pandas() \
        .sort_values("vec_id").reset_index(drop=True)
    salted = semantic_dedup(ds, hot_check_min_rows=0, hot_cell_rows=16,
                            **kw).to_pandas() \
        .sort_values("vec_id").reset_index(drop=True)
    salted2 = semantic_dedup(ds, hot_check_min_rows=0, hot_cell_rows=16,
                             **kw).to_pandas() \
        .sort_values("vec_id").reset_index(drop=True)
    assert sorted(salted.vec_id) == sorted(ids)             # row-complete
    assert (salted.vec_id.values == salted2.vec_id.values).all()
    assert (salted.keep.values == salted2.keep.values).all()  # determinism
    assert set(salted.cell) <= set(plain.cell)          # true cells kept
    assert ((salted.max_prior_sim < kw["eps"])
            == (salted.keep == 1)).all()
    # dropping priors can only KEEP more rows, never fewer
    assert salted.keep.sum() >= plain.keep.sum()
    # with the bound above every cell size, salting is a no-op
    nohot = semantic_dedup(ds, hot_check_min_rows=0, hot_cell_rows=10_000,
                           **kw).to_pandas() \
        .sort_values("vec_id").reset_index(drop=True)
    for col in plain.columns:
        assert (nohot[col].values == plain[col].values).all(), col


def test_embed_actor_matches_pure_python_replay():
    """EmbedActor pool output == a pure-Python char-count x weight replay,
    bit for bit (the dyadic-weight exactness argument in
    embed.embed_weights), including non-charset bytes, uppercase folding
    and empty strings (zero vector, not NaN)."""
    from raydedup.stages.embed import (EMBED_CHARSET, embed_documents,
                                       embed_weights)
    texts = ["Hello World 123", "", "    ", "zzzz!!!@@@", "AbC aBc 999",
             "x" * 500, "the quick brown fox 0042"]
    tbl = pa.table({
        "doc_id": pa.array(np.arange(len(texts), dtype=np.int64)),
        "text": pa.array(texts, pa.string()),
    })
    out = embed_documents(rd.from_arrow(tbl), concurrency=2,
                          batch_size=3).to_pandas() \
        .sort_values("vec_id").reset_index(drop=True)
    W = embed_weights()
    for i, s in enumerate(texts):
        low = s.lower()
        counts = np.array([low.count(c) for c in EMBED_CHARSET], float)
        want = counts @ W
        got = np.asarray(out.embedding.iloc[i], dtype=np.float64)
        assert np.array_equal(got, want), (i, s)


def test_embed_knn_chain_feeds_embedding_plane():
    """The computed embeddings drive the existing plane end to end:
    knn_search over EmbedActor output ranks an exact text copy as its
    twin's top non-self neighbor with sim 1.0 (rounded grid)."""
    from raydedup.stages.embed import embed_documents
    from raydedup.stages.embedding import knn_search
    rng = np.random.default_rng(41)
    texts = ["".join(rng.choice(list("abcdef "), size=60))
             for _ in range(30)]
    texts.append(texts[0])                      # plant an exact twin
    tbl = pa.table({
        "doc_id": pa.array(np.arange(len(texts), dtype=np.int64)),
        "text": pa.array(texts, pa.string()),
    })
    emb = embed_documents(rd.from_arrow(tbl)).materialize()
    rows = emb.sort("vec_id").limit(1).take_all()
    q = np.array([rows[0]["embedding"]], dtype=np.float64)
    out = knn_search(emb, q, np.array([0], dtype=np.int64), k=3,
                     round_sims=True).to_pandas().sort_values("rank")
    # rank 1 = self (sim 1), rank 2 = the planted twin (also sim 1, id
    # tie-break ascending puts 0 before 30)
    assert list(out.neighbor_id[:2]) == [0, 30]
    assert (out.cosine_sim.iloc[:2] == 1.0).all()
