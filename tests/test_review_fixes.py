"""Regression gates for the round-3 self-review findings: brute-NN
self-sentinel leakage at N <= k, the pair-ranking kernel contract, empty
embedding inputs, and three codec robustness holes (truncated WAV data
chunk, odd JPEG fill runs, PNG zlib errors)."""

import numpy as np
import pyarrow as pa
import pytest
import ray.data as rd

from raydedup import codecs


def _emb_table(mat: np.ndarray, ids=None) -> pa.Table:
    ids = np.arange(len(mat), dtype=np.int64) if ids is None else ids
    return pa.table({
        "vec_id": pa.array(ids, pa.int64()),
        "embedding": pa.array([r.tolist() for r in mat],
                              pa.list_(pa.float32())),
    })


# ------------------------------------------------------------- embedding
def test_approx_nn_small_corpus_no_self_rows(ray_session):
    """N=3, k=5: every seed must emit exactly N-1 = 2 neighbors and no
    self rows (the -2.0 fill_diagonal sentinel previously leaked through
    the brute local_topk as phantom nn_idx == seed_idx at distance 2)."""
    from raydedup.stages.embedding import approx_nn_ranking
    mat = np.eye(3, dtype=np.float32)
    out = approx_nn_ranking(rd.from_arrow(_emb_table(mat)), k=5).to_pandas()
    assert len(out) == 6                         # 3 seeds x 2 real neighbors
    assert (out.nn_idx != out.seed_idx).all()
    assert (out.nn_dist < 2.0).all()             # sentinel dist would be 2.0
    assert sorted(out.groupby("seed_idx")["rank"].max()) == [2, 2, 2]


def test_approx_nn_small_corpus_ivf_brute_agree(ray_session):
    from raydedup.stages.embedding import approx_nn_ranking
    rng = np.random.default_rng(3)
    mat = rng.standard_normal((4, 8)).astype(np.float32)
    ds = rd.from_arrow(_emb_table(mat))
    brute = approx_nn_ranking(ds, k=9).to_pandas() \
        .sort_values(["seed_idx", "rank"]).reset_index(drop=True)
    ivf = approx_nn_ranking(ds, k=9, method="ivf", n_cells=1) \
        .to_pandas().sort_values(["seed_idx", "rank"]).reset_index(drop=True)
    # ids/ranks exact; distances to float tolerance (the IVF path rounds
    # sims BEFORE the distance map, brute rounds the final distance)
    for col in ("seed_idx", "rank", "nn_idx"):
        assert brute[col].tolist() == ivf[col].tolist()
    assert np.allclose(brute.nn_dist, ivf.nn_dist, atol=1e-8)


def test_pair_ranking_kernel_contract(ray_session):
    """pair_ranking applies kernels to PRECOMPUTED similarities, so a
    kernel registered without a dot-product form must raise loudly rather
    than silently computing garbage; one registered WITH from_dot works."""
    from raydedup.registry import register_distance
    from raydedup.stages.embedding import pair_ranking
    mat = np.eye(3, dtype=np.float32)
    ds = rd.from_arrow(_emb_table(mat, ids=np.array([1, 2, 3], np.int64)))

    register_distance("vec_only", lambda a, b: np.abs(a @ b.T))
    with pytest.raises(KeyError, match="dot-product form"):
        pair_ranking(ds, metric="vec_only")

    register_distance("one_minus", lambda a, b: 1.0 - a @ b.T,
                      from_dot=lambda dot: 1.0 - dot)
    out = pair_ranking(ds, metric="one_minus").to_pandas()
    # orthogonal unit vectors: dot 0 -> distance 1 for all 3 pairs
    assert len(out) == 3
    assert np.allclose(out.distance, 1.0)


def test_empty_embedding_dataset_ops(ray_session):
    """Every embedding operator returns an empty result (not a reshape
    crash) on an empty input dataset."""
    from raydedup.stages.embedding import (approx_nn_ranking, cosine_pairs,
                                           knn_search, semantic_dedup)
    empty = rd.from_arrow(_emb_table(np.zeros((0, 4), dtype=np.float32)))
    assert cosine_pairs(empty, threshold=0.5).count() == 0
    assert approx_nn_ranking(empty, k=3).count() == 0
    assert semantic_dedup(empty, eps=0.9).count() == 0
    q = np.eye(2, 4, dtype=np.float32)
    assert knn_search(empty, q, np.array([7, 8], np.int64), k=3).count() == 0


# ---------------------------------------------------------------- codecs
def test_wav_truncated_data_chunk_raises():
    wave = (np.sin(np.linspace(0, 20, 400)) * 30000).astype(np.int16)
    buf = codecs.encode_wav(wave, 8000)
    assert np.allclose(codecs.decode_wav(buf)[0],
                       wave.astype(np.float32) / 32768.0, atol=2e-4)
    with pytest.raises(ValueError, match="truncated WAV"):
        codecs.decode_wav(buf[:-10])


def test_jpeg_fill_bytes_before_marker():
    """T.81 B.1.1.2 allows any number of 0xFF fill bytes before a marker;
    an ODD run previously desynced the parser (it consumed fills two at a
    time, eating the real marker's lead byte)."""
    img = np.random.default_rng(11).integers(0, 256, (16, 16, 3),
                                             dtype=np.uint8)
    buf = codecs.encode_jpeg(img, 90)
    base = codecs.decode_jpeg(buf)
    for n_fill in (1, 2, 3):
        padded = buf[:2] + b"\xff" * n_fill + buf[2:]
        assert np.array_equal(codecs.decode_jpeg(padded), base)


def test_png_bad_zlib_stream_raises_valueerror():
    """IDAT with a valid CRC over an invalid deflate stream must raise
    ValueError (the shared corrupt-payload contract), not zlib.error."""
    import struct
    import zlib

    img = np.random.default_rng(4).integers(0, 256, (8, 8, 3),
                                            dtype=np.uint8)
    buf = bytearray(codecs.encode_png(img))
    i = 8
    while i < len(buf):
        (ln,) = struct.unpack_from(">I", buf, i)
        ctype = bytes(buf[i + 4: i + 8])
        if ctype == b"IDAT":
            garbage = b"\x00" * ln        # not a valid zlib stream
            buf[i + 8: i + 8 + ln] = garbage
            struct.pack_into(">I", buf, i + 8 + ln,
                             zlib.crc32(ctype + garbage) & 0xFFFFFFFF)
            break
        i += 12 + ln
    with pytest.raises(ValueError, match="corrupt image/png"):
        codecs.decode_image(bytes(buf), "image/png")


# ---------------------------------------------- round-3 follow-up review

def test_partitioned_stage_zero_rows_returns_typed_empty(tmp_path):
    """A stage that legitimately produces ZERO rows (e.g. no candidate
    pairs anywhere) must return a typed-empty Dataset and resume cleanly —
    read_parquet on a parquet-file-less tree raised before."""
    import pyarrow as pa
    import ray.data as rd

    from raydedup.checkpoint import CheckpointManager

    tbl = pa.table({"id": pa.array(range(50), pa.int64()),
                    "v": pa.array(range(50), pa.int64())})
    schema = pa.schema([("id", pa.int64()), ("v", pa.int64())])

    def pre():
        return rd.from_arrow(tbl)

    def drop_all(ds):
        return ds.filter(lambda r: False)

    root = str(tmp_path / "ck")
    ck = CheckpointManager(root=root, cfg_hash="h", input_token="t")
    out = ck.partitioned_stage("empty", pre, drop_all, num_parts=4,
                               empty_schema=schema)
    assert out.count() == 0
    assert set(out.schema().names) == {"id", "v"}
    # resume (markers committed): must not crash either
    ck2 = CheckpointManager(root=root, cfg_hash="h", input_token="t")
    out2 = ck2.partitioned_stage("empty", pre, drop_all, num_parts=4,
                                 empty_schema=schema)
    assert out2.count() == 0


def test_corpus_stats_by_lang_null_lang_is_its_own_group():
    """A null lang value forms its own group (SQL GROUP BY semantics)
    instead of crashing np.unique's object sort."""
    import pyarrow as pa
    import ray.data as rd

    from raydedup.stages.textstats import corpus_stats_by_lang

    ds = rd.from_arrow(pa.table({
        "text": pa.array(["hello world", "bonjour le monde", "hi"],
                         pa.string()),
        "lang": pa.array(["en", None, "en"], pa.string())}))
    df = corpus_stats_by_lang(ds).to_pandas()
    assert len(df) == 2
    en = df[df.lang == "en"].iloc[0]
    assert en.n_docs == 2 and en.total_tokens == 3
    nul = df[df.lang.isna()].iloc[0]
    assert nul.n_docs == 1 and nul.total_tokens == 3


def test_session_windows_string_key_schema_consistent():
    """String-keyed session windows: every output block (including the
    empty interior/boundary ones) carries the key at its REAL type, so the
    union has ONE schema and consumers don't see int64-vs-string blocks."""
    import pyarrow as pa
    import ray.data as rd

    from raydedup.stages.windows import session_windows

    n = 40
    ts = [(i // 2) * 3_000_000 for i in range(n)]     # alternating devices
    dev = [f"d{i % 2}" for i in range(n)]
    ds = rd.from_arrow(pa.table({
        "device_id": pa.array(dev, pa.string()),
        "ts": pa.array(ts, pa.int64())})).repartition(5)
    out = session_windows(ds, gap_s=10, key="device_id")
    want = pa.schema([("device_id", pa.string()),
                      ("session_start", pa.int64()),
                      ("session_end", pa.int64()),
                      ("n_events", pa.int64())])
    parts = list(out.iter_batches(batch_format="pyarrow",
                                  batch_size=1 << 16))
    for p in parts:                 # every block: the REAL key type
        assert p.schema.equals(want), p.schema
    tbl = pa.concat_tables(parts)
    df = tbl.to_pandas().sort_values(["device_id", "session_start"])
    # 1.5s spacing per device, gap 10s -> one session per device
    assert len(df) == 2
    assert set(df.device_id) == {"d0", "d1"}
    assert (df.n_events == 20).all()


def test_get_issues_off_topic_none_graceful():
    """get_issues(OFF_TOPIC) returns None (like the other branches) when
    the duplicity stage was not run, instead of raising AttributeError."""
    from raydedup.issues import DedupResult, IssueType

    res = DedupResult(ingested=None, signatures=None)
    assert res.get_issues(IssueType.OFF_TOPIC) is None
    assert res.get_issues(IssueType.NEAR_DUPLICATES) is None


def test_cc_distributed_warns_on_iteration_exhaustion(caplog):
    """Exhausting cc_max_iters without convergence logs a warning instead
    of silently returning under-merged labels."""
    import dataclasses
    import logging

    import pyarrow as pa
    import ray.data as rd

    from raydedup.config import EngineConfig
    from raydedup.stages.cluster import _cc_distributed

    # a 64-node chain cannot converge in one round of min + one halving
    edges = rd.from_arrow(pa.table({
        "id_a": pa.array(range(63), pa.int64()),
        "id_b": pa.array(range(1, 64), pa.int64())}))
    cfg = dataclasses.replace(EngineConfig(), cc_max_iters=1)
    with caplog.at_level(logging.WARNING, logger="raydedup.stages.cluster"):
        _cc_distributed(edges, cfg)
    assert any("did NOT converge" in r.message for r in caplog.records)


def test_signature_task_cache_keys_on_full_config():
    """A warm worker process must NOT reuse a SignatureActor built for a
    different shingle configuration: two _signature_task closures sharing
    (num_perm, seed) but differing in shingle.k must produce different
    shingle sets in the SAME process (the old cache keyed only on the
    minhash fields)."""
    import dataclasses

    import pyarrow as pa

    from raydedup.config import EngineConfig, ShingleConfig
    from raydedup.stages.signatures import _signature_task

    batch = pa.table({
        "id": pa.array([1], pa.int64()),
        "content_sha256": pa.array(["x"], pa.string()),
        "lang": pa.array(["py"], pa.string()),
        "content": pa.array(["a b c d e f g h i j"], pa.string()),
    })
    cfg5 = EngineConfig()
    cfg3 = dataclasses.replace(cfg5, shingle=ShingleConfig(k=3))
    n5 = _signature_task(cfg5, False)(batch).column("n_shingles")[0].as_py()
    n3 = _signature_task(cfg3, False)(batch).column("n_shingles")[0].as_py()
    assert n5 == 10 - 5 + 1
    assert n3 == 10 - 3 + 1


def test_truncated_jpeg_raises_valueerror_not_indexerror():
    """Segment lengths that cut a DHT or SOS table short must surface as
    the shared corrupt-payload ValueError, not a bare IndexError, so
    per-file skip-on-corrupt handlers keep working."""
    import pytest

    from raydedup import codecs

    buf, mime, _, _ = codecs.synthesize_image(0, 1, "jpeg")

    def corrupt(marker: int) -> bytes:
        b = bytearray(buf)
        i = 2
        while i + 2 <= len(b):
            if b[i] == 0xFF and b[i + 1] == marker:
                b[i + 2], b[i + 3] = 0, 5 if marker == 0xC4 else 2
                return bytes(b)
            i += 1
        raise AssertionError("marker not found")

    for marker in (0xC4, 0xDA):       # truncated DHT / empty SOS
        with pytest.raises(ValueError):
            codecs.decode_jpeg(corrupt(marker))


def test_corpus_generate_row_count_is_bounded():
    """generate(n) returns exactly n rows for any n that fits the planted
    mix, and never more than n + 3 (one unsplittable group) for tiny n;
    normal-size corpora are byte-identical to the pre-guard generator."""
    from raydedup import corpus

    for n in (1, 2, 5, 10, 24, 30, 64, 100, 200):
        code, truth = corpus.generate(n, seed=7)
        assert code.num_rows == truth.num_rows
        assert n <= code.num_rows <= max(n, 5) + 3
        if n >= 30:
            assert code.num_rows == n


def test_corpus_parallel_total_matches_request(tmp_path):
    """write_corpus_parallel must not multiply the planted floor across
    tiny chunks: 100 rows over 16 requested files lands exactly 100."""
    import pyarrow.parquet as pq

    from raydedup import corpus

    d = corpus.write_corpus_parallel(str(tmp_path), 100, seed=3,
                                     num_files=16, procs=4)
    assert pq.read_table(d).num_rows == 100


def test_containment_probe_cap_is_exact():
    """A probe outside its run's first cap+1 members must still emit at
    most cap pairs (the self-exclusion slot is reclaimed from the window's
    last member)."""
    import numpy as np
    import pyarrow as pa  # noqa: F401

    from raydedup.stages.containment import _emit_probe_pairs

    skey = np.array([7] * 5, np.int64)
    ids = np.array([10, 11, 12, 13, 14], np.int64)
    starts, ends = np.array([0]), np.array([5])
    sel = np.array([True])
    for pos, cap, want in [(4, 2, 2), (0, 2, 2), (1, 10, 4), (4, 4, 4)]:
        probe = np.zeros(5, np.int8)
        probe[pos] = 1
        t = _emit_probe_pairs(skey, ids, probe, starts, ends, sel, cap)
        assert t.num_rows == want, (pos, cap, t.num_rows)
        a = t.column("id_a").to_numpy()
        b = t.column("id_b").to_numpy()
        assert (a < b).all() and ids[pos] in np.r_[a, b]


def test_cli_rejects_full_pipeline_flags_in_incremental_mode(tmp_path):
    """--issues/--ckpt-dir/--write-signatures have no surface in
    --base-sigs mode; the CLI must fail loudly instead of silently
    dropping them."""
    import pytest

    from raydedup.__main__ import main

    with pytest.raises(SystemExit) as ei:
        main(["--input", str(tmp_path), "--output", str(tmp_path / "o"),
              "--base-sigs", str(tmp_path), "--ckpt-dir",
              str(tmp_path / "ck")])
    assert ei.value.code == 2
