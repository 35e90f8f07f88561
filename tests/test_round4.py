"""Round-4 additions: lean signature tables (verify-time shingle recompute),
the edge-summary session-window merge, and the oracle type-pinning fixes.

The lean plane's contract: a flagship run with store_shingles=False must be
BIT-IDENTICAL to a stored-shingles run on every output surface — the
recomputed shingle sets go through the same kernels
(tokenize -> k-shingle -> segmented sorted-unique) as the stored column.
"""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray.data as rd


def _mk_code_table(rows):
    return pa.table({
        "id": pa.array([r[0] for r in rows], pa.int64()),
        "repo": pa.array([f"r{r[0]}" for r in rows], pa.string()),
        "path": pa.array([f"p{r[0]}" for r in rows], pa.string()),
        "commit": pa.array(["c"] * len(rows), pa.string()),
        "lang": pa.array([r[2] for r in rows], pa.string()),
        "content": pa.array([r[1] for r in rows], pa.large_string()),
    })


def _near_dup_corpus(n=60, seed=13):
    rng = np.random.default_rng(seed)
    rows = []
    for i in range(n):
        base = " ".join(f"w{rng.integers(0, 200)}" for _ in range(60))
        rows.append((i + 1, base, "en"))
        if i % 5 == 0:   # plant a near dup of every 5th doc
            toks = base.split()
            toks[rng.integers(0, len(toks))] = "mutated"
            rows.append((1000 + i, " ".join(toks), "en"))
    return _mk_code_table(rows)


def _snap(res):
    vp = res.verified_pairs.to_pandas().sort_values(
        ["id_a", "id_b"]).reset_index(drop=True)
    cl = res.clusters.to_pandas().sort_values("id").reset_index(drop=True)
    return vp, cl


def test_lean_run_bit_identical_to_stored():
    from raydedup.issues import IssueType
    from raydedup.pipeline import run_pipeline

    tbl = _near_dup_corpus()
    issues = [IssueType.NEAR_DUPLICATES, IssueType.OFF_TOPIC]
    lean = run_pipeline(rd.from_arrow(tbl), issues_to_detect=issues,
                        store_shingles=False)
    stored = run_pipeline(rd.from_arrow(tbl), issues_to_detect=issues,
                          store_shingles=True)
    assert "shingles" not in lean.signatures.schema().names
    assert "shingles" in stored.signatures.schema().names
    vp_l, cl_l = _snap(lean)
    vp_s, cl_s = _snap(stored)
    assert len(vp_l) > 0
    pd.testing.assert_frame_equal(vp_l, vp_s)
    pd.testing.assert_frame_equal(cl_l, cl_s)


def test_lean_join_fallback_bit_identical(monkeypatch):
    """broadcast_id_limit=0 forces the lean plane's hash-join path
    (minhash proj x recomputed shingle sets x pair joins); results must
    match the broadcast path bit-for-bit."""
    from raydedup.config import EngineConfig
    from raydedup.issues import IssueType
    from raydedup.pipeline import run_pipeline

    tbl = _near_dup_corpus(n=40, seed=5)
    issues = [IssueType.NEAR_DUPLICATES]
    base = run_pipeline(rd.from_arrow(tbl), issues_to_detect=issues,
                        store_shingles=False)
    import dataclasses
    cfg = EngineConfig()
    cfg_forced = dataclasses.replace(cfg, broadcast_id_limit=0)
    forced = run_pipeline(rd.from_arrow(tbl), cfg_forced,
                          issues_to_detect=issues, store_shingles=False)
    vp_b, _ = _snap(base)
    vp_f, _ = _snap(forced)
    assert len(vp_b) > 0
    pd.testing.assert_frame_equal(vp_b, vp_f)


def test_compute_shingle_sets_matches_stored_column():
    from raydedup.config import EngineConfig
    from raydedup.stages.ingest import ids_and_content, ingest
    from raydedup.stages.signatures import (compute_shingle_sets,
                                            compute_signatures)

    tbl = _near_dup_corpus(n=25, seed=3)
    cfg = EngineConfig()
    stored = compute_signatures(ingest(rd.from_arrow(tbl)), cfg) \
        .select_columns(["id", "shingles"]).to_pandas() \
        .sort_values("id").reset_index(drop=True)
    recomputed = compute_shingle_sets(
        ids_and_content(rd.from_arrow(tbl)), cfg).to_pandas() \
        .sort_values("id").reset_index(drop=True)
    pd.testing.assert_frame_equal(stored, recomputed)


def test_ids_and_content_matches_ingest_ids():
    """The lean shingle source must derive the SAME row ids as ingest for
    inputs without an id column (blake2b of repo\\x00path\\x00commit)."""
    from raydedup.stages.ingest import ids_and_content, ingest

    tbl = _mk_code_table([(1, "a b c", "en"), (2, "d e f", "en")]) \
        .drop_columns(["id"])
    got = ids_and_content(rd.from_arrow(tbl)).to_pandas() \
        .sort_values("id").reset_index(drop=True)
    want = ingest(rd.from_arrow(tbl)).to_pandas()[["id", "content"]] \
        .sort_values("id").reset_index(drop=True)
    pd.testing.assert_frame_equal(got, want)


def test_verify_lean_without_source_raises():
    from raydedup.config import EngineConfig
    from raydedup.stages.ingest import ingest
    from raydedup.stages.signatures import compute_signatures
    from raydedup.stages.verify import verify_pairs

    tbl = _mk_code_table([(1, "a b c d e f g", "en"),
                          (2, "a b c d e f h", "en")])
    cfg = EngineConfig()
    sigs = compute_signatures(ingest(rd.from_arrow(tbl)), cfg,
                              with_shingles=False).materialize()
    pairs = rd.from_arrow(pa.table({"id_a": pa.array([1], pa.int64()),
                                    "id_b": pa.array([2], pa.int64())}))
    with pytest.raises(ValueError, match="shingle_source"):
        verify_pairs(pairs, sigs, cfg)


# --------------------------------------------- session-window edge merge

def test_session_fragment_merge_max_end_on_tied_starts():
    """Fragments with tied starts can sort either way; the merged session
    end must be the MAX end of the group, not the last fragment's."""
    from raydedup.stages.windows import _merge_session_fragments

    uid = np.array([7, 7], dtype=np.int64)
    starts = np.array([100, 100], dtype=np.int64)
    ends = np.array([100, 500], dtype=np.int64)    # longer fragment FIRST
    ns = np.array([3, 2], dtype=np.int64)
    out = _merge_session_fragments(uid, starts, ends[::-1].copy(), ns, 10,
                                   "user_id", key_type=pa.int64())
    assert out.num_rows == 1
    assert out.column("session_end")[0].as_py() == 500
    assert out.column("n_events")[0].as_py() == 5


# ------------------------------------------------- ADVICE-item regressions

def test_topk_descending_int64_min_and_uint64():
    """Descending order must not negate values: INT64_MIN negation wraps
    and unsigned columns misorder (round-3 ADVICE)."""
    from raydedup.stages.topk import top_k_per_group

    imin = np.iinfo(np.int64).min
    t = pa.table({
        "g": pa.array(["a"] * 3, pa.string()),
        "v": pa.array([imin, 5, -7], pa.int64()),
        "id": pa.array([1, 2, 3], pa.int64()),
    })
    out = top_k_per_group(rd.from_arrow(t), "g", "v", "id", k=2) \
        .to_pandas().sort_values("v", ascending=False)
    assert list(out.v) == [5, -7]          # imin must rank LAST, not first

    tu = pa.table({
        "g": pa.array(["a"] * 3, pa.string()),
        "v": pa.array([2**63 + 5, 1, 2**64 - 1], pa.uint64()),
        "id": pa.array([1, 2, 3], pa.int64()),
    })
    outu = top_k_per_group(rd.from_arrow(tu), "g", "v", "id", k=1) \
        .to_pandas()
    assert list(outu.v) == [2**64 - 1]


def test_topk_nan_value_raises():
    from raydedup.stages.topk import top_k_per_group

    t = pa.table({
        "g": pa.array(["a", "a"], pa.string()),
        "v": pa.array([1.0, float("nan")], pa.float64()),
        "id": pa.array([1, 2], pa.int64()),
    })
    with pytest.raises(Exception, match="NaN"):
        top_k_per_group(rd.from_arrow(t), "g", "v", "id", k=1).to_pandas()


def test_hash_sample_null_id_raises():
    from raydedup.stages.sample import hash_sample

    t = pa.table({"doc_id": pa.array([1, None, 3], pa.int64())})
    with pytest.raises(Exception, match="null"):
        hash_sample(rd.from_arrow(t), keep_lt=1000, mod=1000).to_pandas()


def test_joins_default_parts_without_counting_lazy_inputs():
    """asof_join with num_parts unset on lazy (map_batches) inputs must
    still be correct; the default now derives from cluster CPUs instead of
    count()-executing the pipelines (round-3 ADVICE)."""
    from raydedup.stages.joins import asof_join

    left = pa.table({
        "event_id": pa.array([1, 2], pa.int64()),
        "user_id": pa.array([7, 7], pa.int64()),
        "ts": pa.array([2_000_000, 5_000_000], pa.timestamp("us")),
        "value": pa.array([0.0, 0.0], pa.float64()),
    })
    right = pa.table({
        "event_id": pa.array([10, 11], pa.int64()),
        "user_id": pa.array([7, 7], pa.int64()),
        "ts": pa.array([1_000_000, 4_000_000], pa.timestamp("us")),
        "value": pa.array([1.5, 2.5], pa.float64()),
    })
    lds = rd.from_arrow(left).map_batches(lambda t: t,
                                          batch_format="pyarrow")
    rds = rd.from_arrow(right).map_batches(lambda t: t,
                                           batch_format="pyarrow")
    out = asof_join(lds, rds).to_pandas().sort_values("event_id")
    assert list(out.matched_event_id) == [10, 11]
    assert list(out.matched_value) == [1.5, 2.5]


# ------------------------------------------------------ progressive JPEG

def test_progressive_jpeg_matches_baseline_decode():
    """encode_jpeg(progressive=True) writes SOF2 with all four
    progressive scan kinds (DC first/refine + AC first/refine); the scan
    script partitions the same quantized coefficients bit-exactly, so
    decoding it must give PIXEL-IDENTICAL output to decoding the baseline
    encode of the same image — this exercises EOB runs, ZRL, and the
    AC correction-bit algorithm with real nonzero coefficients."""
    from raydedup.codecs import decode_jpeg, encode_jpeg

    rng = np.random.default_rng(21)
    for trial in range(6):
        h, w = (int(x) for x in rng.integers(8, 64, size=2))
        gray = trial % 2 == 0
        img = rng.integers(0, 256,
                           size=(h, w) if gray else (h, w, 3)) \
            .astype(np.uint8)
        q = int(rng.integers(30, 100))
        base = decode_jpeg(encode_jpeg(img, quality=q))
        prog_bytes = encode_jpeg(img, quality=q, progressive=True)
        assert prog_bytes[2:4] != b"\xff\xc0"
        assert b"\xff\xc2" in prog_bytes[:200]        # SOF2 marker present
        prog = decode_jpeg(prog_bytes)
        np.testing.assert_array_equal(base, prog)


def test_progressive_jpeg_constant_blocks_exact():
    """Constant 8x8 blocks at quality 100 round-trip EXACTLY (lone DC
    coefficient, unit quantizer) — the property the
    media_progressive_roundtrip oracle relies on."""
    from raydedup.codecs import decode_jpeg, encode_jpeg

    vals = np.array([0, 1, 17, 127, 128, 200, 255], np.uint8)
    img = np.repeat(np.repeat(vals[None, :], 8, axis=0), 8, axis=1)
    out = decode_jpeg(encode_jpeg(img, quality=100, progressive=True))
    np.testing.assert_array_equal(out[..., 0], img)


def test_progressive_jpeg_truncation_raises():
    from raydedup.codecs import decode_jpeg, encode_jpeg

    img = np.full((16, 16), 90, np.uint8)
    b = encode_jpeg(img, quality=80, progressive=True)
    with pytest.raises(ValueError):
        decode_jpeg(b[: len(b) - 8])


def test_store_shingles_auto_threshold():
    """None (auto) stores below cfg.lean_sigs_min_rows and goes lean at or
    above it; explicit True/False override."""
    import dataclasses

    from raydedup.config import EngineConfig
    from raydedup.issues import IssueType
    from raydedup.pipeline import run_pipeline

    tbl = _near_dup_corpus(n=10, seed=2)
    issues = [IssueType.NEAR_DUPLICATES]
    auto_small = run_pipeline(rd.from_arrow(tbl), issues_to_detect=issues)
    assert "shingles" in auto_small.signatures.schema().names
    cfg_low = dataclasses.replace(EngineConfig(), lean_sigs_min_rows=1)
    auto_big = run_pipeline(rd.from_arrow(tbl), cfg_low,
                            issues_to_detect=issues)
    assert "shingles" not in auto_big.signatures.schema().names


# --------------------------------------------------- stratified sampling

def test_stratified_sample_deterministic_and_partition_invariant():
    """k-per-group cut is identical across block layouts and matches the
    numpy oracle (splitmix64 rank, id tie-break, small groups whole)."""
    from raydedup.kernels import splitmix64
    from raydedup.stages.sample import stratified_sample

    rng = np.random.default_rng(8)
    n = 400
    ids = rng.permutation(np.arange(1, n + 1)).astype(np.int64)
    langs = np.array(["en", "de", "fr", "xx"])[rng.integers(0, 4, n)]
    langs[ids <= 2] = "rare"              # group smaller than k
    t = pa.table({"doc_id": pa.array(ids, pa.int64()),
                  "lang": pa.array(langs, pa.string()),
                  "n_chars": pa.array(ids * 3, pa.int64())})
    h = splitmix64(ids.view(np.uint64))
    want = set()
    for g in np.unique(langs):
        m = langs == g
        order = np.lexsort((ids[m], h[m]))
        want |= set(ids[m][order][:5].tolist())
    for nblocks in (1, 7):
        got = stratified_sample(
            rd.from_arrow(t).repartition(nblocks), k=5).to_pandas()
        assert set(got.doc_id) == want
        assert (got[got.lang == "rare"].doc_id.nunique()
                == int((langs == "rare").sum()))


def test_stratified_sample_null_id_raises():
    from raydedup.stages.sample import stratified_sample

    t = pa.table({"doc_id": pa.array([1, None], pa.int64()),
                  "lang": pa.array(["en", "en"], pa.string())})
    with pytest.raises(Exception, match="null"):
        stratified_sample(rd.from_arrow(t), k=1).to_pandas()


# ------------------------------------------------ distributed quantiles

def test_quantile_select_exact_vs_numpy():
    """Exact order statistics (floor(q*(n-1)) lower convention) across
    distributions: uniform ints, heavy ties, floats with NaNs, tiny
    collect_cap forcing multiple refinement passes."""
    from raydedup.stages.quantiles import quantile_select

    rng = np.random.default_rng(4)
    qs = [0.0, 0.05, 0.5, 0.95, 1.0]
    cases = []
    v1 = rng.integers(-1000, 1000, 5000).astype(np.int64)
    cases.append(("int", pa.array(v1, pa.int64()), v1.astype(float)))
    v2 = v1.astype(float).copy()
    v2[:2000] = 3.25                      # heavy tie mass
    nanv = np.r_[v2, np.full(100, np.nan)]
    cases.append(("float+nan", pa.array(nanv, pa.float64()), v2))
    for name, arr, clean in cases:
        t = pa.table({"x": arr})
        out = quantile_select(rd.from_arrow(t).repartition(6), "x", qs,
                              bins=16, collect_cap=50)
        got = dict(zip(out.column("q").to_pylist(),
                       out.column("value").to_pylist()))
        sv = np.sort(clean)
        for q in qs:
            want = float(sv[int(np.floor(q * (len(sv) - 1) + 1e-9))])
            assert got[q] == want, (name, q, got[q], want)


def test_quantile_select_all_equal_and_errors():
    from raydedup.stages.quantiles import quantile_select

    t = pa.table({"x": pa.array([7] * 100, pa.int64())})
    out = quantile_select(rd.from_arrow(t), "x", [0.0, 0.5, 1.0])
    assert set(out.column("value").to_pylist()) == {7.0}
    with pytest.raises(ValueError, match="quantiles"):
        quantile_select(rd.from_arrow(t), "x", [1.5])
    empty = pa.table({"x": pa.array([None, None], pa.float64())})
    with pytest.raises(Exception):
        quantile_select(rd.from_arrow(empty), "x", [0.5])


# ------------------------------------------------------ dedup report

def test_dedup_report_counts_hand_computed():
    """Per-group duplicate rates from a hand-built cluster table: dup iff
    id != cluster_id (min-id labels), groups joined by id."""
    from raydedup.issues import dedup_report

    clusters = pa.table({
        "id": pa.array([1, 2, 3, 10, 11, 20], pa.int64()),
        "cluster_id": pa.array([1, 1, 1, 10, 10, 20], pa.int64()),
    })
    meta = pa.table({
        "doc_id": pa.array([1, 2, 3, 10, 11, 20], pa.int64()),
        "lang": pa.array(["en", "en", "de", "de", "de", "fr"],
                         pa.string()),
    })
    out = dedup_report(rd.from_arrow(clusters), rd.from_arrow(meta)) \
        .to_pandas().set_index("lang").sort_index()
    assert out.loc["en"].n_docs == 2 and out.loc["en"].n_dups == 1
    assert out.loc["de"].n_docs == 3 and out.loc["de"].n_dups == 2
    assert out.loc["fr"].n_docs == 1 and out.loc["fr"].n_dups == 0
    assert out.loc["de"].dup_frac == 2.0 / 3.0
