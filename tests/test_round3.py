"""Round-3 regression gates: the ADVICE-flagged defects (tie-dropping in
per-item NN local top-k, stale checkpoint partitions after a num_parts
change, shift-by-64 pack mask, row-count-only input fingerprint, non-ASCII
punctuation inflating lang-id denominators) each get a test that fails on
the round-2 code."""

import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest
import ray.data as rd


# ------------------------------------------------ NN tie-break correctness

def _brute_nn(mat, ids, k):
    norm = mat / np.linalg.norm(mat, axis=1, keepdims=True)
    sims = norm @ norm.T
    np.fill_diagonal(sims, -2.0)
    expect = {}
    for i in range(len(ids)):
        order = np.lexsort((ids, -sims[i]))[:k - 1]
        for r, j in enumerate(order):
            dist = round(float(np.sqrt(2 * (1 - np.clip(sims[i, j],
                                                        -1, 1)))), 9)
            expect[(int(ids[i]), r + 1)] = (int(ids[j]), dist)
    return expect


def test_approx_nn_ranking_duplicate_vectors_tie_break():
    """30 of 40 rows share one vector (every in-cluster sim is exactly 1.0):
    the local top-k must keep the LOWEST-id tied candidates, matching the
    oracle's (sim desc, nn_idx asc) order — argpartition without a tie-break
    returned arbitrary tied ids here."""
    from raydedup.stages.embedding import approx_nn_ranking

    rng = np.random.default_rng(3)
    d, k = 8, 4
    base = rng.normal(size=d)
    mat = np.vstack([np.tile(base, (30, 1)),
                     rng.normal(size=(10, d))]).astype(np.float64)
    ids = np.arange(100, 140, dtype=np.int64)
    perm = rng.permutation(40)                 # ids not in block order
    mat, ids = mat[perm], ids[perm]
    tbl = pa.table({"vec_id": pa.array(ids, pa.int64()),
                    "embedding": pa.array(list(mat))})
    expect = _brute_nn(mat, ids, k)

    for blk in (7, 1000):                      # multi-block and single-block
        out = approx_nn_ranking(rd.from_arrow(tbl), k=k,
                                target_block_rows=blk).to_pandas()
        got = {(int(r.seed_idx), int(r.rank)): (int(r.nn_idx), r.nn_dist)
               for r in out.itertuples()}
        assert len(out) == 40 * (k - 1), blk
        for key, (nid, ndist) in expect.items():
            gid, gdist = got[key]
            assert gid == nid, (blk, key, gid, nid)
            assert gdist == pytest.approx(ndist, abs=2e-9), (blk, key)


def test_knn_search_duplicate_vectors_tie_break():
    """Brute kNN local top-k keeps lowest-id tied candidates across batches
    (same defect class as approx_nn_ranking)."""
    from raydedup.stages.embedding import knn_search

    rng = np.random.default_rng(4)
    d, k = 6, 5
    base = rng.normal(size=d)
    mat = np.vstack([np.tile(base, (20, 1)),
                     rng.normal(size=(20, d))]).astype(np.float64)
    ids = np.arange(200, 240, dtype=np.int64)
    perm = rng.permutation(40)
    mat, ids = mat[perm], ids[perm]
    tbl = pa.table({"vec_id": pa.array(ids, pa.int64()),
                    "embedding": pa.array(list(mat))})
    queries = np.vstack([base, rng.normal(size=d)])
    qids = np.array([0, 1], dtype=np.int64)

    norm = mat / np.linalg.norm(mat, axis=1, keepdims=True)
    qn = queries / np.linalg.norm(queries, axis=1, keepdims=True)
    sims = qn @ norm.T
    ds = rd.from_arrow(tbl).repartition(6)     # force multiple batches
    out = knn_search(ds, queries, qids, k=k).to_pandas() \
        .sort_values(["query_id", "rank"])
    for qi in (0, 1):
        order = np.lexsort((ids, -sims[qi]))[:k]
        got = out[out.query_id == qi].neighbor_id.to_numpy()
        assert (got == ids[order]).all(), qi


# ------------------------------------------------ IVF-bucketed per-item NN

def _clustered(n_clusters, per_cluster, d, noise, seed):
    rng = np.random.default_rng(seed)
    centers = rng.normal(size=(n_clusters, d))
    centers /= np.linalg.norm(centers, axis=1, keepdims=True)
    mat = np.repeat(centers, per_cluster, axis=0) \
        + noise * rng.normal(size=(n_clusters * per_cluster, d))
    ids = np.arange(1000, 1000 + len(mat), dtype=np.int64)
    perm = rng.permutation(len(mat))
    return mat[perm].astype(np.float64), ids[perm]


def test_ivf_nn_trained_matches_brute_on_clusters():
    """Well-separated clusters: the k-means cells align with the clusters,
    so the bucketed path reproduces the brute per-item NN exactly (the
    forced-multi-cell exact gate; no all-pairs tile in the ivf path)."""
    from raydedup.stages.embedding import approx_nn_ranking

    mat, ids = _clustered(6, 20, 32, noise=0.02, seed=11)
    tbl = pa.table({"vec_id": pa.array(ids, pa.int64()),
                    "embedding": pa.array(list(mat))})
    k = 4
    brute = approx_nn_ranking(rd.from_arrow(tbl), k=k).to_pandas() \
        .sort_values(["seed_idx", "rank"]).reset_index(drop=True)
    ivf = approx_nn_ranking(rd.from_arrow(tbl), k=k, method="ivf",
                            n_cells=8, n_probe=4, seed=11).to_pandas() \
        .sort_values(["seed_idx", "rank"]).reset_index(drop=True)
    assert brute.shape == ivf.shape
    assert (brute[["seed_idx", "rank", "nn_idx"]].values
            == ivf[["seed_idx", "rank", "nn_idx"]].values).all()
    assert np.allclose(brute.nn_dist, ivf.nn_dist, atol=2e-9)


def test_ivf_nn_recall_gate_noisy_clusters():
    """Looser clusters (noise 0.2 — beyond that the weak-neighbor tail is
    uniform noise, which no bucketing can rank): bucketed recall vs brute
    must stay >= 0.95 while touching only ~n_probe/n_cells of the
    similarity matrix (measured 0.993 at these settings)."""
    from raydedup.stages.embedding import approx_nn_ranking

    mat, ids = _clustered(8, 25, 24, noise=0.2, seed=13)
    tbl = pa.table({"vec_id": pa.array(ids, pa.int64()),
                    "embedding": pa.array(list(mat))})
    k = 5
    brute = approx_nn_ranking(rd.from_arrow(tbl), k=k).to_pandas()
    ivf = approx_nn_ranking(rd.from_arrow(tbl), k=k, method="ivf",
                            n_cells=8, n_probe=3, seed=13).to_pandas()
    b = set(map(tuple, brute[["seed_idx", "nn_idx"]].values))
    v = set(map(tuple, ivf[["seed_idx", "nn_idx"]].values))
    recall = len(b & v) / len(b)
    assert recall >= 0.95, recall


def test_ivf_cosine_pairs_matches_brute_on_clusters():
    """Clustered fixture: the IVF-bucketed threshold pairs equal the
    all-pairs cosine_pairs surface exactly (in-cluster pairs land in
    probe-adjacent cells), with canonical deduped output."""
    from raydedup.stages.embedding import cosine_pairs, ivf_cosine_pairs

    mat, ids = _clustered(6, 15, 24, noise=0.1, seed=19)
    tbl = pa.table({"vec_id": pa.array(ids, pa.int64()),
                    "embedding": pa.array(list(mat))})
    thr = 0.8
    brute = cosine_pairs(rd.from_arrow(tbl), thr).to_pandas() \
        .sort_values(["id_a", "id_b"]).reset_index(drop=True)
    ivf = ivf_cosine_pairs(rd.from_arrow(tbl), thr, n_cells=8, n_probe=4,
                           seed=19).to_pandas() \
        .sort_values(["id_a", "id_b"]).reset_index(drop=True)
    assert len(brute) > 50
    assert (brute[["id_a", "id_b"]].values
            == ivf[["id_a", "id_b"]].values).all()
    assert np.allclose(brute.cosine_sim, ivf.cosine_sim, atol=2e-9)
    assert (ivf.id_a < ivf.id_b).all()
    assert not ivf.duplicated(["id_a", "id_b"]).any()


def test_rp_centroids_deterministic():
    """Random-projection cells are seeded + unit-norm: the SQL oracle
    inlines byte-identical literals."""
    from raydedup.stages.embedding import rp_centroids
    a, b = rp_centroids(16, 64, 7), rp_centroids(16, 64, 7)
    assert (a == b).all()
    assert np.allclose(np.linalg.norm(a, axis=1), 1.0)


def test_semantic_dedup_planted_duplicates():
    """SemDeDup on clusters with planted exact-duplicate vectors: one keep
    per duplicate group (lowest id among ties), keep/drop consistent with
    max_prior_sim vs eps, and every input row present exactly once."""
    from raydedup.stages.embedding import semantic_dedup

    mat, ids = _clustered(5, 12, 16, noise=0.15, seed=23)
    # plant 4 exact copies of one vector and 3 of another (fresh ids)
    dup_a, dup_b = mat[0], mat[30]
    extra = np.vstack([np.tile(dup_a, (4, 1)), np.tile(dup_b, (3, 1))])
    extra_ids = np.arange(9000, 9007, dtype=np.int64)
    mat = np.vstack([mat, extra])
    ids = np.concatenate([ids, extra_ids])
    tbl = pa.table({"vec_id": pa.array(ids, pa.int64()),
                    "embedding": pa.array(list(mat))})
    # noisy cluster-mates reach cos ~0.98; only exact copies reach ~1.0,
    # so eps=0.999 isolates the planted groups from cluster geometry
    eps = 0.999
    out = semantic_dedup(rd.from_arrow(tbl), eps=eps, n_cells=8,
                         seed=23).to_pandas()
    assert sorted(out.vec_id) == sorted(ids)                 # row-complete
    assert ((out.max_prior_sim < eps) == (out.keep == 1)).all()
    for dup_vec in (dup_a, dup_b):
        group = ids[(mat == dup_vec).all(axis=1)]
        sub = out[out.vec_id.isin(group)]
        assert sub.keep.sum() == 1, sub
        # identical vectors tie on centroid_sim -> keep-first is min id
        assert sub.loc[sub.keep == 1, "vec_id"].iloc[0] == group.min()


def test_semantic_dedup_numpy_parity():
    """trained=False path vs an independent dense-numpy replay of the full
    SemDeDup semantics (cell assignment, centroid_sim ASC / id ASC order,
    strict-prior max) — exact value match on every column."""
    from raydedup.stages.embedding import (_normalize, _round9,
                                           rp_centroids, semantic_dedup)

    mat, ids = _clustered(4, 10, 12, noise=0.3, seed=29)
    tbl = pa.table({"vec_id": pa.array(ids, pa.int64()),
                    "embedding": pa.array(list(mat))})
    n_cells, seed, eps = 6, 29, 0.6
    out = semantic_dedup(rd.from_arrow(tbl), eps=eps, n_cells=n_cells,
                         seed=seed, trained=False).to_pandas() \
        .sort_values("vec_id").reset_index(drop=True)

    cents = rp_centroids(n_cells, mat.shape[1], seed)
    e = _normalize(mat)
    sims_c = _round9(e @ cents.T)
    cells = np.argmax(sims_c, axis=1)
    csim = sims_c[np.arange(len(ids)), cells]
    exp = {}
    for c in np.unique(cells):
        sel = np.nonzero(cells == c)[0]
        order = sel[np.lexsort((ids[sel], csim[sel]))]
        m = e[order]
        sims = _round9(m @ m.T)
        for i, gi in enumerate(order):
            mp = sims[i, :i].max() if i else -2.0
            exp[ids[gi]] = (int(c), csim[gi], mp, int(mp < eps))
    for _, r in out.iterrows():
        ec, ecs, emp, ek = exp[r.vec_id]
        assert r.cell == ec and r.keep == ek
        assert r.centroid_sim == ecs and r.max_prior_sim == emp


# ---------------------------------------- stale checkpoint partition purge

def test_partitioned_stage_purges_stale_high_parts(tmp_path):
    """Reducing num_parts on an existing ckpt_dir must not silently read
    stale ckpt_part dirs >= the new num_parts into the output (rows were
    duplicated before the purge), and the stale manifest must be rewritten."""
    import json

    from raydedup.checkpoint import CheckpointManager
    tbl = pa.table({"id": pa.array(range(100), pa.int64()),
                    "v": pa.array(range(100), pa.int64())})

    def pre():
        return rd.from_arrow(tbl)

    root = str(tmp_path / "ck")
    ck8 = CheckpointManager(root=root, cfg_hash="h8", input_token="t")
    out8 = ck8.partitioned_stage("s", pre, lambda ds: ds, num_parts=8)
    assert out8.count() == 100

    # same stage dir, smaller partitioning (cfg change)
    ck4 = CheckpointManager(root=root, cfg_hash="h4", input_token="t")
    out4 = ck4.partitioned_stage("s", pre, lambda ds: ds, num_parts=4)
    assert out4.count() == 100                  # not 100 + stale rows
    sdir = os.path.join(root, "s")
    stale = [d for d in os.listdir(sdir)
             if d.startswith("ckpt_part=")
             and int(d.split("=")[1]) >= 4]
    assert stale == []
    stale_markers = [f for f in os.listdir(sdir)
                     if f.startswith("part=") and f.endswith(".done.json")
                     and int(f[len("part="):-len(".done.json")]) >= 4]
    assert stale_markers == []
    with open(os.path.join(root, "s.manifest.json")) as f:
        meta = json.load(f)
    assert meta["cfg_hash"] == "h4" and meta["num_parts"] == 4


# --------------------------------------------- one-sort signature kernel

def test_minhash_from_sorted_unique_parity():
    """OPH signatures built from the sorted-unique shingle arrays must be
    value-identical to the raw-stream construction (the flagship's one-sort
    signature path must not shift a single n_pairs invariant)."""
    from raydedup import kernels as K

    rng = np.random.default_rng(17)
    P = 128
    perm = K.perm_seeds(P, 42)
    counts = np.array([0, 1, 3, 200, 17, 0, 64, 1000], dtype=np.int64)
    offs = np.zeros(len(counts) + 1, dtype=np.int64)
    np.cumsum(counts, out=offs[1:])
    # heavy duplication inside docs exercises the unique collapse
    vals = rng.integers(0, 1 << 20, size=int(offs[-1]), dtype=np.uint64)
    vals = K.splitmix64(vals)
    old = K.minhash_signatures(vals, offs, perm)
    uflat, uoffs = K.segmented_unique(vals, offs)
    new = K.minhash_from_sorted_unique(uflat, uoffs, P)
    assert (old == new).all()


# --------------------------------- partition-granular verified_pairs ckpt

def test_verified_pairs_partitioned_resume(tmp_path):
    """Verification is checkpointed per ckpt_part = pair_hash % P: losing a
    committed partition recomputes ONLY it (plus the cheap final union) and
    the resumed run reproduces the identical pair set."""
    import shutil

    from raydedup import corpus
    from raydedup.pipeline import run_on_parquet

    code_dir, _ = corpus.write_corpus(str(tmp_path / "c"), 200, seed=11,
                                      num_files=2)
    ck = str(tmp_path / "ck")
    res1 = run_on_parquet(code_dir, ckpt_dir=ck,
                          store_shingles=False)
    vp1 = res1.verified_pairs.to_pandas() \
        .sort_values(["id_a", "id_b"]).reset_index(drop=True)
    assert len(vp1) > 0
    vdir = os.path.join(ck, "verified_rep_pairs")
    markers = [f for f in os.listdir(vdir) if f.endswith(".done.json")]
    assert len(markers) == 16
    nonempty = [d for d in sorted(os.listdir(vdir))
                if d.startswith("ckpt_part=")
                and any(f.endswith(".parquet")
                        for f in os.listdir(os.path.join(vdir, d)))]
    assert nonempty, "corpus must produce rep-level verified pairs"
    a = nonempty[0]
    ai = a.split("=")[1]
    shutil.rmtree(os.path.join(vdir, a))
    os.remove(os.path.join(vdir, f"part={ai}.done.json"))
    os.remove(os.path.join(ck, "verified_pairs.manifest.json"))

    res2 = run_on_parquet(code_dir, ckpt_dir=ck,
                          store_shingles=False)
    vp2 = res2.verified_pairs.to_pandas() \
        .sort_values(["id_a", "id_b"]).reset_index(drop=True)
    assert vp1.equals(vp2)
    assert os.path.isdir(os.path.join(vdir, a))


# ------------------------------------------------------- pack mask lookup

def test_token_hash_mask_lookup_parity():
    """8-byte-token pack mask comes from a lookup table (shift-by-64 is
    undefined); hashes for 1..12-byte tokens must equal the scalar spec."""
    from raydedup import kernels as K
    toks = ["a", "ab", "abcdefg", "abcdefgh", "abcdefghi", "abcdefghijkl"]
    text = " ".join(toks)
    flat, offs = K.tokenize_hash_batch([text])
    assert int(offs[1]) == len(toks)
    for i, tok in enumerate(toks):
        assert int(flat[i]) == K._token_hash_cached(tok), tok
    assert int(K._PACK_MASKS[8]) == (1 << 64) - 1


# ----------------------------------------- input fingerprint detects edits

def test_ckpt_fingerprint_detects_same_count_edit(tmp_path):
    """Editing the input data without changing the row count must invalidate
    the checkpoints (round-2 folded only the row count). Proof: poison a
    committed signature partition (empty parquet, marker intact) — an
    unchanged input trusts it from disk, an edited input recomputes it."""
    from raydedup import corpus
    from raydedup.pipeline import run_on_parquet

    code_dir, _ = corpus.write_corpus(str(tmp_path / "c"), 120, seed=7,
                                      num_files=1)
    ck = str(tmp_path / "ck")
    res1 = run_on_parquet(code_dir, ckpt_dir=ck,
                          store_shingles=False)
    assert res1.signatures.count() == 120

    sig_dir = os.path.join(ck, "signatures-lean")
    poisoned = 0
    for d in sorted(os.listdir(sig_dir)):
        if not d.startswith("ckpt_part="):
            continue
        for f in os.listdir(os.path.join(sig_dir, d)):
            if f.endswith(".parquet"):
                p = os.path.join(sig_dir, d, f)
                t = pq.read_table(p)
                poisoned += t.num_rows
                pq.write_table(t.slice(0, 0), p)
        if poisoned:
            break
    assert poisoned > 0
    os.remove(os.path.join(ck, "signatures-lean.manifest.json"))

    # edit one input file: same row count, different content bytes
    src = next(f for f in sorted(os.listdir(code_dir))
               if f.endswith(".parquet"))
    p = os.path.join(code_dir, src)
    t = pq.read_table(p)
    texts = t.column("content").to_pylist()
    texts[0] = texts[0] + " edited"
    t = t.set_column(t.schema.get_field_index("content"), "content",
                     pa.array(texts, t.column("content").type))
    pq.write_table(t, p)

    res2 = run_on_parquet(code_dir, ckpt_dir=ck,
                          store_shingles=False)
    # edited input -> every partition recomputed, poisoned rows restored
    assert res2.signatures.count() == 120


# ------------------------------------- exact containment (prefix filter)

def _containment_fixture():
    """Docs where short texts are contained in long concatenations —
    Jaccard far below 0.7, containment ~1.0: invisible to LSH candidacy,
    exactly the case the prefix-filter pass must catch."""
    rng = np.random.default_rng(21)
    words = [f"w{i:03d}" for i in range(300)]
    texts = [" ".join(rng.choice(words, size=30, replace=False))
             for _ in range(20)]
    texts.append(texts[0] + " " + texts[1] + " " + texts[2])   # id 20
    texts.append(texts[3] + " " + texts[4])                    # id 21
    return pa.table({
        "repo": pa.array(["r"] * len(texts)),
        "path": pa.array([f"f{i}.py" for i in range(len(texts))]),
        "commit": pa.array(["c"] * len(texts)),
        "lang": pa.array(["python"] * len(texts)),
        "content": pa.array(texts, pa.large_string()),
    })


def _expected_containment(sigs_df):
    """Brute-force exact containment ground truth from the shingle sets."""
    import raydedup.util as U
    flat, offs = U.unpack_u64_flat(pa.chunked_array(
        [pa.array(sigs_df.shingles.tolist())]))
    sets = [set(flat[offs[i]:offs[i + 1]].tolist())
            for i in range(len(sigs_df))]
    ids = sigs_df.id.tolist()
    out = set()
    for i in range(len(ids)):
        for j in range(i + 1, len(ids)):
            inter = len(sets[i] & sets[j])
            mn = min(len(sets[i]), len(sets[j]))
            un = len(sets[i] | sets[j])
            if mn and inter / mn >= 0.9 and inter / un < 0.7:
                out.add((min(ids[i], ids[j]), max(ids[i], ids[j])))
    return out


def test_containment_pairs_exact_recall(monkeypatch):
    """Prefix-filter containment candidates find EVERY cont>=0.9 pair
    (pigeonhole guarantee) on both the driver boundary path and the forced
    distributed one — the LSH-piggybacked pass missed 8 of 12 planted
    pairs at J~0.26."""
    from raydedup.config import EngineConfig
    from raydedup.stages import candidates as C
    from raydedup.stages import containment as CT
    from raydedup.stages.containment import containment_pairs
    from raydedup.stages.ingest import ingest
    from raydedup.stages.signatures import compute_signatures

    cfg = EngineConfig()
    sigs = compute_signatures(
        ingest(rd.from_arrow(_containment_fixture()).repartition(3)),
        cfg).materialize()
    expect = _expected_containment(
        sigs.select_columns(["id", "shingles"]).to_pandas())
    assert len(expect) >= 5, "fixture must plant containment pairs"

    for force in (False, True):
        if force:
            monkeypatch.setattr(C, "DRIVER_SMALL_LIMIT", 0)
            monkeypatch.setattr(CT, "DRIVER_SMALL_LIMIT", 0)
        out = containment_pairs(sigs, cfg) \
            .filter(expr="match_kind == 'substring'").to_pandas()
        got = {(int(r.id_a), int(r.id_b)) for r in out.itertuples()}
        assert got == expect, (force, got ^ expect)
        assert (out.containment >= 0.9).all()
        assert (out.jaccard < 0.7).all()


# --------------------------------------------- LAD global_leaves variant

def test_lad_global_leaves_hand_computed():
    """3-leaf dendrogram ((0,1)@0.2, +2@0.8), hand-computed
    (reference lad_scoring.py:100,156,165 n_leaves propagation):
    local and global modes agree at the root (denominator = root count)
    and diverge below it — node (0,1) splits at 1/2 locally but at 1/3
    of the TOTAL leaves globally, shrinking the child intervals."""
    from raydedup.lad import lad_ranking

    d = np.array([[0.0, 0.2, 0.8],
                  [0.2, 0.0, 0.8],
                  [0.8, 0.8, 0.0]])
    s_loc, o_loc = lad_ranking(d, global_leaves=False)
    assert list(o_loc) == [2, 0, 1]
    assert s_loc == pytest.approx([7 / 15, 0.7, 0.7])
    s_glo, o_glo = lad_ranking(d, global_leaves=True)
    assert list(o_glo) == [2, 0, 1]
    assert s_glo == pytest.approx([7 / 15, 31 / 45, 31 / 45])


def test_lad_equal_distance_ties_deterministic():
    """Degenerate all-equal distances: the smaller-id-left tie rule makes
    the ranking deterministic (documented convention) and every leaf is
    emitted exactly once with monotone nondecreasing cumulative scores."""
    from raydedup.lad import lad_ranking

    n = 6
    d = np.full((n, n), 0.5)
    np.fill_diagonal(d, 0.0)
    s1, o1 = lad_ranking(d)
    s2, o2 = lad_ranking(d)
    assert (o1 == o2).all() and (s1 == s2).all()
    assert sorted(o1) == list(range(n))
    assert (np.diff(s1) >= -1e-12).all()


# ----------------------------------------- lang-id non-ASCII punctuation

def test_lang_id_non_ascii_punct_excluded_from_denominator():
    """Non-ASCII punctuation (¿ — «) routes the batch to the regex fallback;
    it must not count toward the \\w+ token denominator (round-2 filtered
    only ASCII punctuation by hash)."""
    from raydedup.stages.textstats import lang_id

    # 4 es stopword hits over 5 word tokens -> 0.8; the buggy denominator
    # also counted the 3 punctuation marks -> 0.5
    txt = "el la de que ¿cómo? —"
    tbl = pa.table({"doc_id": pa.array([1, 2], pa.int64()),
                    "text": pa.array([txt, "the and of a to in"])})
    out = lang_id(rd.from_arrow(tbl)).to_pandas().sort_values("doc_id")
    assert list(out.pred_lang) == ["es", "en"]
    assert out.lang_score.iloc[0] == pytest.approx(4 / 5)
    assert out.lang_score.iloc[1] == pytest.approx(1.0)


# ----------------------------------------- real image decode (PPM/BMP)

def test_codecs_roundtrip_and_dispatch():
    """Pure-numpy codecs: encode->decode identity for P6 and 24-bit BMP
    (odd widths exercise row padding), P5 broadcast, maxval rescale."""
    from raydedup import codecs

    rng = np.random.default_rng(3)
    for h, w in [(5, 7), (24, 33), (1, 1)]:
        img = rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
        assert np.array_equal(codecs.decode_ppm(codecs.encode_ppm(img)), img)
        assert np.array_equal(codecs.decode_bmp(codecs.encode_bmp(img)), img)
    g = rng.integers(0, 256, (4, 6), dtype=np.uint8)
    d = codecs.decode_ppm(b"P5\n# c\n6 4\n255\n" + g.tobytes())
    assert d.shape == (4, 6, 3) and np.array_equal(d[..., 2], g)
    d2 = codecs.decode_ppm(b"P5\n2 1\n63\n" + bytes([0, 63]))
    assert d2[0, 0, 0] == 0 and d2[0, 1, 0] == 255
    # baseline JPEG decodes natively now; a truncated stream is a
    # ValueError, and genuinely unsupported codecs still gate honestly
    with pytest.raises(ValueError):
        codecs.decode_image(b"\xff\xd8\xff\xe0", "image/jpeg")
    with pytest.raises(NotImplementedError):
        codecs.decode_image(b"RIFFxxxxWEBP", "image/webp")


def test_codecs_resize_and_features():
    from raydedup import codecs

    rng = np.random.default_rng(4)
    const = np.full((10, 17, 3), 88, np.uint8)
    assert np.allclose(codecs.resize_bilinear(const, (32, 32)), 88.0)
    same = rng.integers(0, 256, (32, 32, 3), dtype=np.uint8)
    assert np.allclose(codecs.resize_bilinear(same, (32, 32)),
                       same.astype(np.float32))
    f = codecs.image_features(rng.integers(0, 256, (40, 50, 3),
                                           dtype=np.uint8))
    assert f.shape == (codecs.FEAT_DIM,) and f.dtype == np.float32
    assert (f >= 0).all() and (f <= 1.0).all()


def test_multimodal_real_decode_end_to_end():
    """fake=False over REAL encoded images (alternating PPM/BMP) through the
    actor-pool Dataset stage: per-row features equal the direct
    decode->descriptor computation, and near-identical images land close."""
    from raydedup import codecs
    from raydedup.stages import multimodal

    media = multimodal.synthesize_media(24, seed=5, real_images=True)
    out = multimodal.decode_features(rd.from_arrow(media), fake=False,
                                     concurrency=2).to_pandas()
    assert len(out) == 24
    payloads = {m: (p, mi) for m, p, mi in zip(
        media.column("media_id").to_pylist(),
        media.column("payload").to_pylist(),
        media.column("mime").to_pylist())}
    for mid, feat in zip(out.media_id, out.feature):
        p, mime = payloads[int(mid)]
        expect = codecs.image_features(codecs.decode_image(p, mime))
        assert np.allclose(np.asarray(feat), expect), mid
    # same image encoded as PPM vs BMP -> identical pixels -> identical
    # features (codec-invariant descriptor)
    img = np.random.default_rng(9).integers(0, 256, (30, 40, 3),
                                            dtype=np.uint8)
    fa = codecs.image_features(codecs.decode_ppm(codecs.encode_ppm(img)))
    fb = codecs.image_features(codecs.decode_bmp(codecs.encode_bmp(img)))
    assert np.array_equal(fa, fb)


# ----------------------------------------- ray job submit entrypoint

def test_job_entrypoint_writes_surfaces_and_metrics(tmp_path):
    """`python -m raydedup` (the `ray job submit` target) end to end:
    partitioned Parquet per surface + metrics JSON; reuses the session's
    Ray (main() only inits when none exists)."""
    import json

    from raydedup import corpus
    from raydedup.__main__ import main

    code_dir, _ = corpus.write_corpus(str(tmp_path / "corp"), 150, seed=3,
                                      num_files=2)
    out = tmp_path / "out"
    rc = main(["--input", code_dir, "--output", str(out),
               "--issues", "near_duplicates,off_topic"])
    assert rc == 0
    metrics = json.loads((out / "metrics.json").read_text())
    assert set(metrics["surfaces"]) == {"verified_pairs", "clusters",
                                        "keep_list", "duplicity",
                                        "ranked_pairs"}
    import pyarrow.parquet as pq
    cl = pq.read_table(str(out / "clusters"))
    assert cl.num_rows == metrics["surfaces"]["clusters"]["rows"] > 0
    assert {"id", "cluster_id"} <= set(cl.column_names)
    # keep-list = exactly the distinct cluster representatives
    kl = pq.read_table(str(out / "keep_list"))
    assert sorted(kl.column("id").to_pylist()) == sorted(
        set(cl.column("cluster_id").to_pylist()))
    # one-row corpus report in the metrics, consistent with the surfaces
    s = metrics["summary"]
    assert s["n_docs"] == cl.num_rows
    assert s["n_clusters"] == kl.num_rows
    assert s["n_docs_removed"] == cl.num_rows - kl.num_rows


def test_job_entrypoint_incremental_mode(tmp_path):
    """The daily-increment loop through the CLI: a base run persists its
    signatures (--write-signatures), an increment run dedupes new files
    against that stored dir (--base-sigs) without re-scanning base content,
    and the surfaces match the library-level incremental result."""
    import json

    import pyarrow.parquet as pq
    import ray.data as rd

    from raydedup import corpus
    from raydedup.__main__ import main

    code_dir, _ = corpus.write_corpus(str(tmp_path / "corp"), 200, seed=11,
                                      num_files=2)
    tbl = pq.read_table(code_dir)
    ids_t = rd.read_parquet(code_dir)
    from raydedup.stages.ingest import ingest
    ing = ingest(ids_t).to_pandas()
    new_mask = (ing["id"].to_numpy() % 4) == 1

    base_dir = tmp_path / "base_files"
    new_dir = tmp_path / "new_files"
    import pyarrow as pa
    pq.write_table(tbl.filter(pa.array(~new_mask)),
                   str(base_dir) + ".parquet")
    pq.write_table(tbl.filter(pa.array(new_mask)),
                   str(new_dir) + ".parquet")

    out_base = tmp_path / "out_base"
    rc = main(["--input", str(base_dir) + ".parquet",
               "--output", str(out_base), "--write-signatures"])
    assert rc == 0
    m = json.loads((out_base / "metrics.json").read_text())
    assert m["surfaces"]["signatures"]["rows"] == int((~new_mask).sum())

    out_inc = tmp_path / "out_inc"
    rc = main(["--input", str(new_dir) + ".parquet",
               "--output", str(out_inc),
               "--base-sigs", str(out_base / "signatures")])
    assert rc == 0
    mi = json.loads((out_inc / "metrics.json").read_text())
    assert set(mi["surfaces"]) == {"incremental_pairs", "keep_delta",
                                   "clusters", "new_signatures"}
    assert mi["surfaces"]["new_signatures"]["rows"] == int(new_mask.sum())

    # parity vs the library-level incremental run
    from raydedup.stages.incremental import incremental_on_files
    from raydedup.stages.signatures import compute_signatures
    from raydedup.config import EngineConfig
    base_sigs = compute_signatures(
        ingest(rd.from_arrow(tbl.filter(pa.array(~new_mask)))),
        EngineConfig()).materialize()
    ref = incremental_on_files(
        rd.from_arrow(tbl.filter(pa.array(new_mask))), base_sigs)
    ref_pairs = ref.pairs.to_pandas()
    got_pairs = pq.read_table(str(out_inc / "incremental_pairs")).to_pandas()
    key = lambda df: set(zip(df.id_a, df.id_b, df.match_kind))
    assert key(got_pairs) == key(ref_pairs)
    got_keep = set(pq.read_table(str(out_inc / "keep_delta"))
                   .column("id").to_pylist())
    assert got_keep == set(ref.keep_delta.to_pandas()["id"])


def test_containment_probe_count_exact_rational():
    """Regression: p must be the REAL-arithmetic floor((1-cthr)*n)+1.
    1-0.9 rounds below 0.1, so bare floor(n*frac) was one short at every
    n where n*(1-cthr) is an exact integer (n=10,20,... at cthr=0.9) —
    breaking the pigeonhole recall guarantee for pairs at exactly the
    threshold. Checked against Fraction arithmetic; over-probing by one
    is allowed (harmless), under-probing never."""
    from fractions import Fraction

    import raydedup.util as U
    from raydedup.stages.containment import containment_rows

    for cthr in (0.9, 0.8, 0.95):
        ns = list(range(1, 201))
        shingles = [list(range(1000 * i, 1000 * i + n))
                    for i, n in enumerate(ns)]
        flat = np.concatenate([np.array(s, dtype=np.uint64)
                               for s in shingles])
        offs = np.zeros(len(ns) + 1, dtype=np.int64)
        np.cumsum(ns, out=offs[1:])
        tbl = pa.table({
            "id": pa.array(np.arange(len(ns), dtype=np.int64), pa.int64()),
            "shingles": U.pack_u64_ragged(flat, offs),
        })
        rows = containment_rows(rd.from_arrow(tbl), cthr).to_pandas()
        got_p = rows.groupby("id")["probe"].sum()
        for i, n in enumerate(ns):
            exact = int(Fraction(1) - Fraction(str(cthr))
                        if False else (n * (Fraction(1) - Fraction(str(cthr))))
                        ) + 1
            exact = min(exact, n)
            assert exact <= got_p[i] <= min(exact + 1, n), \
                (cthr, n, got_p[i], exact)


def test_containment_pair_at_exact_threshold_found():
    """Planted pair with containment EXACTLY 0.9 whose shared shingles
    exclude both docs' smallest-probe prefixes under the buggy one-short
    p: A has 10 shingles, B has 100 with all its 10+ smallest outside A,
    and the one A-shingle missing from B is A's smallest — so with p_A=1
    (bug) no probe of either doc collides and the pair was lost."""
    import raydedup.util as U
    from raydedup.config import EngineConfig
    from raydedup.stages.containment import containment_candidates

    a_sh = np.arange(1000, 1010, dtype=np.uint64)          # A: 10 shingles
    b_extra = np.arange(10, 101, dtype=np.uint64)          # 91 small keys
    b_sh = np.sort(np.concatenate([b_extra, a_sh[1:]]))    # B: 100, no 1000
    flat = np.concatenate([a_sh, b_sh])
    offs = np.array([0, len(a_sh), len(a_sh) + len(b_sh)], dtype=np.int64)
    tbl = pa.table({
        "id": pa.array([1, 2], pa.int64()),
        "shingles": U.pack_u64_ragged(flat, offs),
    })
    inter = len(set(a_sh.tolist()) & set(b_sh.tolist()))
    assert inter / min(len(a_sh), len(b_sh)) == 0.9          # exactly at thr
    out = containment_candidates(rd.from_arrow(tbl),
                                 EngineConfig()).to_pandas()
    assert (1, 2) in {(int(r.id_a), int(r.id_b)) for r in out.itertuples()}


# ------------------------------------- sharded broadcast verify parity

def _shard_corpus_table():
    from tests.test_round2 import _mk_code_table
    rng = np.random.default_rng(11)
    rows = []
    rid = 1
    for g in range(6):                      # 6 near-dup groups of 3
        base = " ".join(f"g{g}tok{i}" for i in range(60))
        rows.append((rid, base, "en")); rid += 1
        rows.append((rid, base, "en")); rid += 1   # exact dup
        rows.append((rid, base.replace(f"g{g}tok7", "CHANGED"), "en"))
        rid += 1
    # one containment pair: small doc embedded in a modestly larger one
    # (J ~ 0.6 so LSH banding still surfaces the candidate; containment 1.0
    # with J < 0.7 classifies it substring on the flagship path)
    small = " ".join(f"sub{i}" for i in range(40))
    rows.append((rid, small, "en")); rid += 1
    rows.append((rid, small + " " + " ".join(f"pad{i}" for i in range(24)),
                 "en")); rid += 1
    for _ in range(20):                     # unrelated noise docs
        rows.append((rid, " ".join(
            f"x{rng.integers(0, 1 << 30)}" for _ in range(50)), "en"))
        rid += 1
    return _mk_code_table(rows)


def test_sharded_broadcast_verify_matches_single_shard():
    """Forcing broadcast_shard_bytes=1 splits the broadcast payload into the
    max 16 id-range shards; every (pair, kind, jaccard, containment) must be
    IDENTICAL to the single-shard path — gates the per-(shard_a, shard_b)
    combo scoring and the two-address-space intersection kernel that only
    multi-GB corpora exercise in production."""
    from raydedup.config import EngineConfig, VerifyConfig
    from raydedup.issues import IssueType
    from raydedup.pipeline import run_pipeline

    tbl = _shard_corpus_table()

    def run(shard_bytes):
        cfg = EngineConfig(
            verify=VerifyConfig(broadcast_shard_bytes=shard_bytes))
        res = run_pipeline(rd.from_arrow(tbl), cfg,
                           issues_to_detect=[IssueType.NEAR_DUPLICATES])
        return res.verified_pairs.to_pandas().sort_values(
            ["id_a", "id_b"]).reset_index(drop=True)

    single = run(1 << 40)                   # payload << target -> 1 shard
    sharded = run(1)                        # forces the 16-shard cap
    assert len(single) and len(sharded) == len(single)
    for col in ["id_a", "id_b", "match_kind"]:
        assert (single[col] == sharded[col]).all()
    for col in ["est_jaccard", "jaccard", "containment", "distance"]:
        assert np.allclose(single[col], sharded[col], atol=0, rtol=0)
    kinds = set(single.match_kind)
    assert {"exact", "near_dup", "substring"} <= kinds


def test_segmented_intersection_sizes2_two_spaces():
    """The two-address-space kernel must agree with intersecting the same
    segments through the single-space wrapper, including empty segments."""
    from raydedup import kernels as K

    rng = np.random.default_rng(5)
    sets = [np.unique(rng.integers(0, 50, size=rng.integers(0, 20))
                      .astype(np.uint64)) for _ in range(12)]
    sets[3] = np.empty(0, np.uint64)        # planted empty segment
    flat = np.concatenate(sets) if sets else np.empty(0, np.uint64)
    offs = np.cumsum([0] + [len(s) for s in sets]).astype(np.int64)
    ia = np.array([0, 1, 3, 5, 7], np.int64)
    ib = np.array([2, 1, 4, 3, 11], np.int64)
    want = np.array([len(np.intersect1d(sets[a], sets[b]))
                     if len(sets[a]) and len(sets[b]) else 0
                     for a, b in zip(ia, ib)], np.int64)
    one = K.segmented_intersection_sizes(flat, offs, ia, ib)
    # second space: the same sets shuffled into a different layout
    order = rng.permutation(len(sets))
    flat_b = np.concatenate([sets[i] for i in order]) \
        if len(sets) else np.empty(0, np.uint64)
    offs_b = np.cumsum([0] + [len(sets[i]) for i in order]).astype(np.int64)
    pos_b = np.argsort(order)               # row of set j in space B
    two = K.segmented_intersection_sizes2(flat, offs, ia,
                                          flat_b, offs_b, pos_b[ib])
    assert (one == want).all() and (two == want).all()


def test_bpe_token_counts_matches_duckdb_oracle():
    """The engine's pyarrow RE2 count of BPE_PRETOKEN_PATTERN matches
    DuckDB's regexp_extract_all of the SAME pattern string on adversarial
    inputs (contractions, unicode letters/punct, digit runs, whitespace
    runs, empty/whitespace-only docs), and the whitespace-token column
    matches token_counts' rule."""
    import duckdb

    from raydedup.stages.textstats import (BPE_PRETOKEN_PATTERN,
                                           bpe_token_counts)

    texts = ["Hello world", "it's  a test\n\tdon't", "naïve café über 123",
             "¿qué? — «okay»", "", "   ", "a'sb", "42x7", " 'll",
             "日本語のテキスト", "mixed 日本 text ©2024 #tag", "'s's's",
             "end  ", "def f(x):\n    return x*2  # comment"]
    ds = rd.from_arrow(pa.table({
        "doc_id": pa.array(range(len(texts)), pa.int64()),
        "text": pa.array(texts, pa.string())}))
    got = bpe_token_counts(ds).to_pandas().sort_values("doc_id") \
        .reset_index(drop=True)

    pat_sql = BPE_PRETOKEN_PATTERN.replace("'", "''")
    con = duckdb.connect()
    want = con.execute(f"""
        SELECT len(regexp_extract_all(t, '{pat_sql}')) AS n_bpe,
               CASE WHEN trim(t) = '' THEN 0
                    ELSE len(regexp_split_to_array(trim(t), '\\s+'))
               END AS n_ws
        FROM (SELECT unnest(?) AS t)""", [texts]).fetchall()
    assert got.n_bpe_tokens.tolist() == [r[0] for r in want]
    assert got.n_ws_tokens.tolist() == [r[1] for r in want]
    exp_ratio = [r[0] / r[1] if r[1] > 0 else 0.0 for r in want]
    assert got.bpe_per_word.tolist() == exp_ratio


def test_dedup_summary_matches_pandas_recount(tiny_result):
    """dedup_summary's seven scalars recomputed from the same result's
    datasets with pandas — an independent path through every statistic."""
    from raydedup.issues import dedup_summary

    res, _ = tiny_result
    row = dedup_summary(res).to_pylist()[0]

    cl = res.clusters.to_pandas()
    vp = res.verified_pairs.to_pandas()
    sh = res.signatures.to_pandas()[["content_sha256"]]

    sizes = cl.groupby("cluster_id").size()
    exact = sh.groupby("content_sha256").size()
    exact = exact[exact > 1]
    assert row["n_docs"] == len(cl)
    assert row["n_clusters"] == len(sizes)
    assert row["n_multi_clusters"] == int((sizes > 1).sum())
    assert row["n_dup_pairs"] == int((vp.match_kind != "substring").sum())
    assert row["n_exact_dup_groups"] == len(exact)
    assert row["n_exact_dup_docs"] == int(exact.sum())
    assert row["n_docs_removed"] == len(cl) - len(sizes)
    # the planted tiny corpus contains real duplicates — non-vacuous
    assert row["n_dup_pairs"] > 0 and row["n_multi_clusters"] > 0
