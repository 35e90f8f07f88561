"""Round-2 additions: vectorized kernels parity, exact-group member
expansion (mixed exact+near fixture — ADVICE item 1), quantile off-topic
reference parity, vectorized textstats parity."""

import numpy as np
import pyarrow as pa
import pytest
import ray.data as rd

from raydedup import kernels as K


# ---------------------------------------------------------------- kernels

def test_segmented_unique_matches_per_row():
    rng = np.random.default_rng(7)
    counts = rng.integers(0, 40, size=50)
    offs = np.zeros(51, dtype=np.int64)
    np.cumsum(counts, out=offs[1:])
    vals = rng.integers(0, 30, size=int(offs[-1])).astype(np.uint64)
    uflat, uoffs = K.segmented_unique(vals, offs)
    for i in range(50):
        expect = np.unique(vals[offs[i]:offs[i + 1]])
        got = uflat[uoffs[i]:uoffs[i + 1]]
        np.testing.assert_array_equal(got, expect)


def test_segmented_intersection_matches_intersect1d():
    rng = np.random.default_rng(11)
    rows = []
    for _ in range(30):
        rows.append(np.unique(rng.integers(0, 50, size=rng.integers(0, 25))
                              .astype(np.uint64)))
    offs = np.zeros(31, dtype=np.int64)
    np.cumsum([len(r) for r in rows], out=offs[1:])
    flat = np.concatenate(rows) if rows else np.empty(0, np.uint64)
    ia = rng.integers(0, 30, size=100).astype(np.int64)
    ib = rng.integers(0, 30, size=100).astype(np.int64)
    got = K.segmented_intersection_sizes(flat, offs, ia, ib)
    for n, (i, j) in enumerate(zip(ia, ib)):
        expect = len(np.intersect1d(rows[i], rows[j], assume_unique=True)) \
            if i != j else len(rows[i])
        assert got[n] == expect, (n, i, j)


# ------------------------------------------------------- member expansion

def _mk_code_table(rows):
    return pa.table({
        "id": pa.array([r[0] for r in rows], pa.int64()),
        "repo": pa.array([f"r{r[0]}" for r in rows], pa.string()),
        "path": pa.array([f"p{r[0]}" for r in rows], pa.string()),
        "commit": pa.array(["c"] * len(rows), pa.string()),
        "lang": pa.array([r[2] for r in rows], pa.string()),
        "content": pa.array([r[1] for r in rows], pa.large_string()),
    })


def test_exact_group_members_get_near_dup_pairs():
    """A pair of identical files (exact group) plus an outside near-dup of
    their content: the near-dup pair must be emitted for EVERY group member,
    not just the representative (reference all-pairs semantics)."""
    from raydedup.issues import IssueType
    from raydedup.pipeline import run_pipeline

    base = " ".join(f"tok{i}" for i in range(50))
    near = " ".join(f"tok{i}" for i in range(49)) + " changed"
    other = " ".join(f"zzz{i}" for i in range(40))
    tbl = _mk_code_table([
        (1, base, "en"), (2, base, "en"), (3, near, "en"), (4, other, "en"),
    ])
    res = run_pipeline(rd.from_arrow(tbl),
                       issues_to_detect=[IssueType.NEAR_DUPLICATES])
    vp = res.verified_pairs.to_pandas().sort_values(
        ["id_a", "id_b"]).reset_index(drop=True)
    pairs = set(zip(vp.id_a, vp.id_b, vp.match_kind))
    assert (1, 2, "exact") in pairs
    assert (1, 3, "near_dup") in pairs
    assert (2, 3, "near_dup") in pairs          # the expanded member pair
    j13 = vp[(vp.id_a == 1) & (vp.id_b == 3)].jaccard.iloc[0]
    j23 = vp[(vp.id_a == 2) & (vp.id_b == 3)].jaccard.iloc[0]
    assert j13 == j23 and 0.7 <= j13 < 1.0
    # clusters: all of 1,2,3 together, 4 alone
    cl = dict(zip(res.clusters.to_pandas().id,
                  res.clusters.to_pandas().cluster_id))
    assert cl[1] == cl[2] == cl[3] != cl[4]


def test_expand_join_fallback_matches_broadcast(monkeypatch):
    from raydedup.issues import IssueType
    from raydedup.pipeline import run_pipeline
    from raydedup.stages import candidates as C

    base = " ".join(f"tok{i}" for i in range(50))
    near = " ".join(f"tok{i}" for i in range(49)) + " changed"
    tbl = _mk_code_table([
        (1, base, "en"), (2, base, "en"), (3, near, "en"),
        (4, "unrelated words entirely", "en"),
    ])
    monkeypatch.setattr(C, "DRIVER_SMALL_LIMIT", 0)
    res = run_pipeline(rd.from_arrow(tbl),
                       issues_to_detect=[IssueType.NEAR_DUPLICATES])
    vp = res.verified_pairs.to_pandas()
    pairs = set(zip(vp.id_a, vp.id_b, vp.match_kind))
    assert (1, 3, "near_dup") in pairs and (2, 3, "near_dup") in pairs


# --------------------------------------------------- quantile off-topic

@pytest.mark.parametrize("q", [0.01, 0.15, 0.5])
def test_quantile_off_topic_matches_dense_numpy(q):
    """Sparse engine scores == np.quantile(dense_matrix, q, axis=0) when the
    dense matrix carries 1.0 for every unseen pair (the documented sparse
    analog of quantile_off_topic_mixin.py:14-31)."""
    from raydedup.stages.rank import quantile_off_topic

    rng = np.random.default_rng(3)
    n = 40
    dense = np.ones((n, n))
    np.fill_diagonal(dense, 0.0)
    pairs = set()
    while len(pairs) < 80:
        i, j = sorted(rng.integers(0, n, size=2).tolist())
        if i != j:
            pairs.add((i, j))
    pl = sorted(pairs)
    dists = rng.uniform(0.0, 0.4, size=len(pl))
    for (i, j), d in zip(pl, dists):
        dense[i, j] = dense[j, i] = d
    expect = np.quantile(dense, q, axis=0)

    vp = rd.from_arrow(pa.table({
        "id_a": pa.array([p[0] for p in pl], pa.int64()),
        "id_b": pa.array([p[1] for p in pl], pa.int64()),
        "distance": pa.array(dists, pa.float64()),
    }))
    ids = rd.from_arrow(pa.table({"id": pa.array(range(n), pa.int64())}))
    out = quantile_off_topic(vp, ids, n, q=q).to_pandas()
    got = out.set_index("id").off_topic_q
    np.testing.assert_allclose(
        np.array([got[i] for i in range(n)]), expect, rtol=0, atol=1e-12)


# ------------------------------------------------------- auto skew salt

def test_auto_salt_triggers_on_hot_band_and_preserves_clusters(monkeypatch):
    """Boilerplate-header corpus: many files share almost all shingles, so
    band buckets are corpus-sized. Auto-salt must (a) pick salt_buckets > 1
    once the sampled sketch crosses the threshold and (b) leave the cluster
    assignment identical to the unsalted run."""
    from raydedup.config import EngineConfig, LSHConfig
    from raydedup.issues import IssueType
    from raydedup.pipeline import run_pipeline
    from raydedup.stages import candidates as C
    from raydedup.stages.ingest import ingest
    from raydedup.stages.signatures import compute_signatures

    header = " ".join(f"hdr{i}" for i in range(120))
    rows = [(100 + i, f"{header} tail{i}", "en") for i in range(150)]
    rows.append((999, "totally unrelated content words", "en"))
    tbl = _mk_code_table(rows)

    monkeypatch.setattr(C, "_AUTO_SALT_THRESHOLD", 32)
    monkeypatch.setattr(C, "_AUTO_SALT_TARGET", 16)
    cfg_auto = EngineConfig(lsh=LSHConfig(salt_buckets=0))
    sigs = compute_signatures(ingest(rd.from_arrow(tbl)), cfg_auto) \
        .materialize()
    s = C.auto_salt_buckets(sigs, cfg_auto)
    assert s > 1, "hot-band sketch should trigger salting"

    res_auto = run_pipeline(rd.from_arrow(tbl), cfg_auto,
                            issues_to_detect=[IssueType.NEAR_DUPLICATES])
    cfg_off = EngineConfig(lsh=LSHConfig(salt_buckets=1))
    res_off = run_pipeline(rd.from_arrow(tbl), cfg_off,
                           issues_to_detect=[IssueType.NEAR_DUPLICATES])
    from tests.oracle import same_cluster_pairs
    a = dict(zip(res_auto.clusters.to_pandas().id,
                 res_auto.clusters.to_pandas().cluster_id))
    b = dict(zip(res_off.clusters.to_pandas().id,
                 res_off.clusters.to_pandas().cluster_id))
    assert same_cluster_pairs(a) == same_cluster_pairs(b)


# ------------------------------------------- embedding block-pair plane

def test_cosine_pairs_block_path_matches_brute():
    """Forced multi-block tile path (target_block_rows small) produces the
    same pair set + sims as a dense numpy all-pairs computation, and as the
    single-block path."""
    from raydedup.stages.embedding import cosine_pairs

    rng = np.random.default_rng(5)
    n, d = 120, 16
    mat = rng.normal(size=(n, d))
    ids = np.arange(100, 100 + n, dtype=np.int64)
    tbl = pa.table({"vec_id": pa.array(ids, pa.int64()),
                    "embedding": pa.array(list(mat.astype(np.float64)))})
    ds = rd.from_arrow(tbl)

    norm = mat / np.linalg.norm(mat, axis=1, keepdims=True)
    sims = norm @ norm.T
    thr = 0.35
    expect = {}
    for i in range(n):
        for j in range(i + 1, n):
            if sims[i, j] >= thr:
                expect[(int(ids[i]), int(ids[j]))] = round(sims[i, j], 9)
    assert expect, "fixture should have pairs"

    for blk in (17, 1000):                      # multi-block and one-block
        out = cosine_pairs(rd.from_arrow(tbl), thr,
                           target_block_rows=blk).to_pandas()
        got = {(int(r.id_a), int(r.id_b)): r.cosine_sim
               for r in out.itertuples()}
        assert got.keys() == expect.keys(), blk
        for k in expect:
            assert got[k] == pytest.approx(expect[k], abs=1e-9), (blk, k)


def test_approx_nn_ranking_matches_brute(monkeypatch):
    """Per-item NN table == dense numpy kNN (sim desc, id asc tie-break,
    angular distance), on both the single-block and forced multi-block
    paths, and on the forced distributed reduce (DRIVER_SMALL_LIMIT=0)."""
    from raydedup.stages import candidates as C
    from raydedup.stages.embedding import approx_nn_ranking

    rng = np.random.default_rng(12)
    n, d, k = 80, 12, 4
    mat = rng.normal(size=(n, d)).astype(np.float64)
    ids = np.arange(10, 10 + n, dtype=np.int64)
    tbl = pa.table({"vec_id": pa.array(ids, pa.int64()),
                    "embedding": pa.array(list(mat))})
    norm = mat / np.linalg.norm(mat, axis=1, keepdims=True)
    sims = norm @ norm.T
    np.fill_diagonal(sims, -2.0)

    expect = {}
    for i in range(n):
        order = np.lexsort((ids, -sims[i]))[:k - 1]
        for r, j in enumerate(order):
            dist = round(float(np.sqrt(2 * (1 - np.clip(sims[i, j],
                                                        -1, 1)))), 9)
            expect[(int(ids[i]), r + 1)] = (int(ids[j]), dist)

    for blk, force in ((19, False), (1000, False), (19, True)):
        if force:
            monkeypatch.setattr(C, "DRIVER_SMALL_LIMIT", 0)
        out = approx_nn_ranking(rd.from_arrow(tbl), k=k,
                                target_block_rows=blk).to_pandas()
        got = {(int(r.seed_idx), int(r.rank)): (int(r.nn_idx), r.nn_dist)
               for r in out.itertuples()}
        assert len(out) == n * (k - 1), blk
        for key, (nid, ndist) in expect.items():
            gid, gdist = got[key]
            assert gid == nid, (blk, key)
            assert gdist == pytest.approx(ndist, abs=2e-9), (blk, key)


def test_pair_ranking_blocked_matches_limit():
    from raydedup.stages.embedding import pair_ranking

    rng = np.random.default_rng(6)
    n, d = 60, 8
    mat = rng.normal(size=(n, d)).astype(np.float64)
    tbl = pa.table({"vec_id": pa.array(np.arange(n, dtype=np.int64)),
                    "embedding": pa.array(list(mat))})
    full = pair_ranking(rd.from_arrow(tbl), limit=25).to_pandas()
    assert len(full) == 25
    # ascending distances, deterministic tie-break
    assert (np.diff(full.distance) >= 0).all()


# ------------------------------------------ per-partition checkpointing

def test_partitioned_checkpoint_resume_skips_done_parts(tmp_path):
    """Signatures are checkpointed per ckpt_part=hash(id)%P dir with commit
    markers. Deleting a part (simulated lost partition) recomputes ONLY that
    part; a part with an intact marker is trusted from disk (proved by
    poisoning its data and observing the poisoned rows in the resume)."""
    import json
    import os

    import pyarrow.parquet as pq

    from raydedup import corpus
    from raydedup.pipeline import run_on_parquet
    code_dir, _ = corpus.write_corpus(str(tmp_path / "c"), 150, seed=5,
                                      num_files=2)
    ck = str(tmp_path / "ck")
    res1 = run_on_parquet(code_dir, ckpt_dir=ck,
                          store_shingles=False)
    assert res1.signatures.count() == 150
    sig_dir = os.path.join(ck, "signatures-lean")
    markers = [f for f in os.listdir(sig_dir) if f.endswith(".done.json")]
    assert len(markers) == 16
    part_dirs = sorted(d for d in os.listdir(sig_dir)
                       if d.startswith("ckpt_part="))
    nonempty = [d for d in part_dirs
                if any(f.endswith(".parquet")
                       for f in os.listdir(os.path.join(sig_dir, d)))]
    assert len(nonempty) >= 2
    # A: lose a partition entirely (dir + marker) -> must be recomputed
    a = nonempty[0]
    a_idx = a.split("=")[1]
    a_rows = pq.read_table(os.path.join(sig_dir, a)).num_rows
    import shutil
    shutil.rmtree(os.path.join(sig_dir, a))
    os.remove(os.path.join(sig_dir, f"part={a_idx}.done.json"))
    # B: poison a committed partition (empty its parquet) -> marker intact,
    # must NOT be recomputed, so its rows stay missing from the resume
    b = nonempty[1]
    b_rows = 0
    for f in os.listdir(os.path.join(sig_dir, b)):
        if f.endswith(".parquet"):
            p = os.path.join(sig_dir, b, f)
            t = pq.read_table(p)
            b_rows += t.num_rows
            pq.write_table(t.slice(0, 0), p)
    os.remove(os.path.join(ck, "signatures-lean.manifest.json"))

    res2 = run_on_parquet(code_dir, ckpt_dir=ck,
                          store_shingles=False)
    assert res2.signatures.count() == 150 - b_rows
    assert pq.read_table(os.path.join(sig_dir, a)).num_rows == a_rows


def test_partitioned_stage_chunked_kill_resume(tmp_path):
    """chunk_parts=2 with a failure injected after the first chunk: the
    committed chunk survives; the retry processes only the remaining parts
    (counted via the stage fn's row counter)."""
    import pyarrow as pa

    from raydedup.checkpoint import CheckpointManager
    tbl = pa.table({"id": pa.array(range(100), pa.int64()),
                    "v": pa.array(range(100), pa.int64())})

    def pre():
        return rd.from_arrow(tbl)

    calls = {"n": 0}

    def make_fn(fail_after):
        def fn(ds):
            calls["n"] += 1
            if calls["n"] > fail_after:
                raise RuntimeError("injected mid-stage kill")
            return ds
        return fn

    ck = CheckpointManager(root=str(tmp_path / "ck"), cfg_hash="h",
                           input_token="t")
    with pytest.raises(RuntimeError):
        ck.partitioned_stage("s", pre, make_fn(1), num_parts=4,
                             chunk_parts=2)
    done_first = ck._parts_done("s", 4)
    assert done_first == {0, 1}
    calls["n"] = 0
    out = ck.partitioned_stage("s", pre, make_fn(10), num_parts=4,
                               chunk_parts=2)
    assert calls["n"] == 1                      # one chunk left: parts {2,3}
    assert out.count() == 100
    assert ck._parts_done("s", 4) == {0, 1, 2, 3}


# ----------------------------------------------------- session windows

def test_session_windows_forced_distributed_matches():
    """Edge-summary sessionizer vs an exhaustive single-array oracle,
    across block layouts: a HOT key (70 % of rows on one user) spanning
    many small blocks exercises the cross-batch fragment merge — the path
    that used to be the per-key map_groups fallback and is now the
    driver-side merge scan over <=2 summaries per batch."""
    import pandas as pd

    from raydedup.stages.windows import (_sessionize_wrapped,
                                         session_windows)

    rng = np.random.default_rng(17)
    n = 5000
    uid = rng.integers(0, 40, size=n)
    uid[rng.random(n) < 0.7] = 7           # hot key spanning every block
    ts_s = rng.integers(0, 1_000_000, size=n).astype("int64")
    ev = pa.table({
        "user_id": pa.array(uid, pa.int64()),
        "ts": pa.array(ts_s * 1_000_000, pa.timestamp("us")),
    })
    order = np.lexsort((ts_s, uid))
    oracle = _sessionize_wrapped(uid[order], ts_s[order], 1800,
                                 "user_id").to_pandas() \
        .sort_values(["user_id", "session_start"]).reset_index(drop=True)
    for nblocks in (1, 4, 64):
        got = session_windows(
            rd.from_arrow(ev).repartition(nblocks), gap_s=1800
        ).to_pandas() \
            .sort_values(["user_id", "session_start"]) \
            .reset_index(drop=True)
        pd.testing.assert_frame_equal(got, oracle)
    assert oracle.n_events.sum() == n


# ------------------------------------------------------------- textstats

def test_token_counts_vectorized_matches_regex():
    import re

    from raydedup.stages.textstats import token_counts
    texts = ["a b  c", "", "  ", "one", "x\ty\nz", "a,b.c d!", "  lead",
             "trail  ", "ünïcödé fallback päth", "mixed ascii ünd"]
    ds = rd.from_arrow(pa.table({
        "doc_id": pa.array(range(len(texts)), pa.int64()),
        "text": pa.array(texts, pa.string()),
    }))
    out = token_counts(ds).to_pandas().sort_values("doc_id")
    expect = [len(re.findall(r"\S+", t)) for t in texts]
    assert out.n_tokens.tolist() == expect


def test_lang_id_vectorized_matches_reference_loop():
    import re

    from raydedup.stages.textstats import STOPWORDS, lang_id
    texts = [
        "the cat and the dog went to the market for a walk",
        "el perro y el gato en la casa de los amigos",
        "der hund und die katze ist in den garten von mir",
        "le chat et le chien est dans la maison pour que",
        "no stopwords here whatsoever xyzzy plugh",
        "", "12345 67890", "the el der le mixed equally once each",
    ]
    ds = rd.from_arrow(pa.table({
        "doc_id": pa.array(range(len(texts)), pa.int64()),
        "text": pa.array(texts, pa.string()),
    }))
    out = lang_id(ds).to_pandas().sort_values("doc_id")

    tok_re = re.compile(r"\w+", re.UNICODE)
    for i, x in enumerate(texts):
        toks = tok_re.findall(x.lower())
        best_lang, best = "und", 0.0
        for lang in sorted(STOPWORDS):
            tab = STOPWORDS[lang]
            r = sum(1 for t in toks if t in tab) / len(toks) if toks else 0.0
            if r > best:
                best_lang, best = lang, r
        row = out[out.doc_id == i].iloc[0]
        assert row.pred_lang == best_lang, (i, x)
        assert row.lang_score == pytest.approx(best, abs=0)
