"""Tests for the training-data extension operators: SimHash dedup, embedding
kNN/pairs, multimodal plumbing, checkpoint/resume."""

import json
import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest
import ray.data as rd

from raydedup.config import EngineConfig
from raydedup.stages import multimodal


def test_simhash_finds_exact_and_near_dups(tiny_corpus):
    from raydedup.stages.ingest import ingest
    from raydedup.stages.signatures import compute_signatures
    from raydedup.stages.simhash import simhash_pairs
    code, truth = tiny_corpus
    cfg = EngineConfig()
    sigs = compute_signatures(ingest(rd.from_arrow(code)), cfg,
                              with_simhash=True).materialize()
    pairs = simhash_pairs(sigs, cfg).to_pandas()
    assert len(pairs) > 0
    assert (pairs.hamming <= 3).all()
    assert (pairs.id_a < pairs.id_b).all()
    # exact dups (identical shingles) must appear at hamming 0
    assert (pairs.hamming == 0).any()


def test_knn_matches_numpy_oracle():
    from raydedup.stages.embedding import knn_search
    rng = np.random.default_rng(5)
    n, d, k, q = 200, 16, 5, 4
    mat = rng.standard_normal((n, d)).astype(np.float32)
    ids = np.arange(100, 100 + n, dtype=np.int64)
    tbl = pa.table({
        "vec_id": pa.array(ids, pa.int64()),
        "embedding": pa.array([row.tolist() for row in mat],
                              pa.list_(pa.float32())),
    })
    queries = mat[:q].copy()
    out = knn_search(rd.from_arrow(tbl), queries, ids[:q], k=k).to_pandas()

    norm = mat.astype(np.float64)
    norm = norm / np.linalg.norm(norm, axis=1, keepdims=True)
    sims = norm[:q] @ norm.T
    for qi in range(q):
        order = np.lexsort((ids, -sims[qi]))[:k]
        expect = ids[order].tolist()
        got = out[out.query_id == ids[qi]].sort_values("rank").neighbor_id.tolist()
        assert got == expect, f"query {qi}"


def test_cosine_pairs_threshold():
    from raydedup.stages.embedding import cosine_pairs
    base = np.eye(4, dtype=np.float32)
    base[1] = base[0] + 0.1          # high sim with row 0
    tbl = pa.table({
        "vec_id": pa.array([1, 2, 3, 4], pa.int64()),
        "embedding": pa.array([r.tolist() for r in base], pa.list_(pa.float32())),
    })
    out = cosine_pairs(rd.from_arrow(tbl), threshold=0.9).to_pandas()
    assert set(zip(out.id_a, out.id_b)) == {(1, 2)}


def test_multimodal_fake_decode_deterministic():
    media = multimodal.synthesize_media(32, seed=9)
    f1 = multimodal.decode_features(rd.from_arrow(media)).to_pandas()
    f2 = multimodal.decode_features(rd.from_arrow(media)).to_pandas()
    assert len(f1) == 32
    assert all(len(v) == multimodal.DecodeImageActor.FEAT_DIM
               for v in f1.feature)
    m1 = {k: tuple(v) for k, v in zip(f1.media_id, f1.feature)}
    m2 = {k: tuple(v) for k, v in zip(f2.media_id, f2.feature)}
    assert m1 == m2


def test_multimodal_real_decode_gated():
    """Codecs that genuinely need native libs (progressive JPEG, webp) still
    gate at the exact decode point; PPM/BMP/PNG/baseline-JPEG/WAV/y4m are
    real (covered in test_round3 and test_media_codecs)."""
    import struct

    actor = multimodal.DecodeImageActor(fake=False)
    # minimal SOF9 (arithmetic-coded) header — honest NotImplementedError
    # (SOF2 progressive is now a real decode path, test_round4)
    prog = (b"\xff\xd8\xff\xc9" + struct.pack(">H", 8)
            + b"\x08\x00\x08\x00\x08\x01")
    batch = pa.table({
        "media_id": pa.array([1], pa.int64()),
        "payload": pa.array([prog], pa.large_binary()),
        "mime": pa.array(["image/jpeg"], pa.string()),
    })
    with pytest.raises(NotImplementedError):
        actor(batch)
    webp = pa.table({
        "media_id": pa.array([1], pa.int64()),
        "payload": pa.array([b"RIFFxxxxWEBP"], pa.large_binary()),
        "mime": pa.array(["image/webp"], pa.string()),
    })
    with pytest.raises(NotImplementedError):
        actor(webp)


def test_frame_sample_only_videos():
    media = multimodal.synthesize_media(64, seed=11)
    frames = multimodal.frame_sample(rd.from_arrow(media),
                                     every_ms=10_000).to_pandas()
    md = media.to_pandas().set_index("media_id")
    assert len(frames) > 0
    for mid in frames.media_id.unique():
        assert md.loc[mid, "kind"] == "video"
    assert (frames.frame_ts_ms >= 0).all()


def test_checkpoint_resume(tmp_path, tiny_corpus):
    """Kill/restart semantics: second run with same config+input reuses every
    checkpointed stage (manifest match); changed config recomputes."""
    from raydedup import corpus
    from raydedup.pipeline import run_on_parquet
    code_dir, _ = corpus.write_corpus(str(tmp_path / "corp"), 120, seed=7,
                                      num_files=2)
    ck = str(tmp_path / "ckpt")
    res1 = run_on_parquet(code_dir, ckpt_dir=ck,
                          store_shingles=False)
    n1 = res1.verified_pairs.count()
    manifests = [f for f in os.listdir(ck) if f.endswith(".manifest.json")]
    # rep_sigs is intentionally NOT checkpointed: it is a lazy projection
    # fused into the banding scan (materializing it was a near-full copy of
    # the signature table at corpus scale)
    assert {"signatures-lean.manifest.json",
            "verified_pairs.manifest.json"} <= set(manifests)
    meta = json.load(open(os.path.join(ck, "signatures-lean.manifest.json")))
    assert meta["rows"] == 120 and meta["rows_per_s"] > 0

    # poison the parquet of verified_pairs to prove resume READS it rather
    # than recomputing: drop all rows
    vp_dir = os.path.join(ck, "verified_pairs")
    files = [f for f in os.listdir(vp_dir) if f.endswith(".parquet")]
    tb = pq.read_table(os.path.join(vp_dir, files[0]))
    for f in files:
        pq.write_table(tb.slice(0, 0), os.path.join(vp_dir, f))
    res2 = run_on_parquet(code_dir, ckpt_dir=ck,
                          store_shingles=False)
    assert res2.verified_pairs.count() == 0      # came from checkpoint

    # different config -> manifest mismatch -> recompute
    cfg2 = EngineConfig(verify=__import__("raydedup.config", fromlist=["VerifyConfig"]).VerifyConfig(threshold=0.6))
    res3 = run_on_parquet(code_dir, cfg=cfg2, ckpt_dir=ck)
    assert res3.verified_pairs.count() >= n1
