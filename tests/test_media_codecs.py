"""Round-3 media codec gates: real PNG / WAV / y4m decode paths
(pure stdlib+numpy — see raydedup/codecs.py) and the generalized
multimodal decode + frame-feature stages."""

import numpy as np
import pyarrow as pa
import pytest
import ray.data as rd

from raydedup import codecs
from raydedup.stages import multimodal


# ----------------------------------------- PNG

def _expected_rgb(img: np.ndarray) -> np.ndarray:
    """What decode_png should return for an encoder input of any shape."""
    if img.ndim == 2:
        img = img[..., None]
    ch = img.shape[2]
    if ch in (1, 2):
        return np.repeat(img[..., :1], 3, axis=2)
    return np.ascontiguousarray(img[..., :3])


def test_png_roundtrip_all_filters_and_colortypes():
    rng = np.random.default_rng(11)
    shapes = [(5, 7), (1, 1), (16, 33, 3), (8, 9, 4), (6, 5, 2), (12, 3)]
    for ft in range(5):
        for shape in shapes:
            img = rng.integers(0, 256, shape, dtype=np.uint8)
            out = codecs.decode_png(codecs.encode_png(img, filter_type=ft))
            assert np.array_equal(out, _expected_rgb(img)), (ft, shape)


def test_png_gradient_compresses_and_roundtrips():
    # a smooth gradient (the adversarial case for filter reconstruction)
    yy, xx = np.mgrid[0:64, 0:48]
    img = np.stack([(xx * 5 + yy) % 256, (yy * 3) % 256,
                    (xx + yy * 7) % 256], axis=2).astype(np.uint8)
    for ft in (1, 2, 3, 4):
        payload = codecs.encode_png(img, filter_type=ft)
        assert len(payload) < img.nbytes          # actually compressed
        assert np.array_equal(codecs.decode_png(payload), img)


def test_png_rejects_corrupt_and_unsupported():
    img = np.zeros((4, 4, 3), np.uint8)
    good = bytearray(codecs.encode_png(img))
    good[40] ^= 0xFF                               # flip a byte inside IDAT
    with pytest.raises(ValueError):
        codecs.decode_png(bytes(good))
    with pytest.raises(ValueError):
        codecs.decode_png(b"\x89PNG")              # truncated signature
    import struct
    import zlib

    def chunk(ctype, payload):
        return struct.pack(">I", len(payload)) + ctype + payload + \
            struct.pack(">I", zlib.crc32(ctype + payload) & 0xFFFFFFFF)

    sig = b"\x89PNG\r\n\x1a\n"
    # 16-bit depth and palette color gate as NotImplementedError
    for depth, ctype_ in [(16, 2), (8, 3)]:
        ihdr = struct.pack(">IIBBBBB", 2, 2, depth, ctype_, 0, 0, 0)
        buf = sig + chunk(b"IHDR", ihdr) + \
            chunk(b"IDAT", zlib.compress(b"\x00" * 20)) + chunk(b"IEND", b"")
        with pytest.raises(NotImplementedError):
            codecs.decode_png(buf)
    # Adam7 interlace gates too
    ihdr = struct.pack(">IIBBBBB", 2, 2, 8, 2, 0, 0, 1)
    buf = sig + chunk(b"IHDR", ihdr) + \
        chunk(b"IDAT", zlib.compress(b"\x00" * 20)) + chunk(b"IEND", b"")
    with pytest.raises(NotImplementedError):
        codecs.decode_png(buf)


def test_png_dispatch_and_codec_invariance():
    img = np.random.default_rng(7).integers(0, 256, (20, 30, 3),
                                            dtype=np.uint8)
    via_mime = codecs.decode_image(codecs.encode_png(img, 4), "image/png")
    assert np.array_equal(via_mime, img)
    # identical pixels through PNG vs PPM -> identical descriptor
    fa = codecs.image_features(codecs.decode_png(codecs.encode_png(img)))
    fb = codecs.image_features(codecs.decode_ppm(codecs.encode_ppm(img)))
    assert np.array_equal(fa, fb)
    # codecs that genuinely need native libs remain honestly gated
    with pytest.raises(NotImplementedError):
        codecs.decode_image(b"RIFFxxxxWEBP", "image/webp")


# ----------------------------------------- WAV

def test_wav_roundtrip_and_variants():
    rng = np.random.default_rng(21)
    samples = rng.integers(-32768, 32768, 1000, dtype=np.int16)
    wave, rate = codecs.decode_wav(codecs.encode_wav(samples, 8000))
    assert rate == 8000
    assert np.allclose(wave, samples.astype(np.float32) / 32768.0)
    # 8-bit PCM: unsigned, centered at 128
    import struct
    fmt = struct.pack("<HHIIHH", 1, 1, 4000, 4000, 1, 8)
    data = bytes([0, 128, 255])
    body = b"fmt " + struct.pack("<I", len(fmt)) + fmt \
        + b"data" + struct.pack("<I", len(data)) + data
    buf8 = b"RIFF" + struct.pack("<I", 4 + len(body)) + b"WAVE" + body
    w8, r8 = codecs.decode_wav(buf8)
    assert r8 == 4000 and np.allclose(w8, [-1.0, 0.0, 127 / 128])
    # stereo averages to mono
    st = struct.pack("<HHIIHH", 1, 2, 8000, 32000, 4, 16)
    sdata = np.array([100, 300, -100, 100], dtype="<i2").tobytes()
    sbody = b"fmt " + struct.pack("<I", len(st)) + st \
        + b"data" + struct.pack("<I", len(sdata)) + sdata
    sw, _ = codecs.decode_wav(b"RIFF" + struct.pack("<I", 4 + len(sbody))
                              + b"WAVE" + sbody)
    assert np.allclose(sw, [200 / 32768, 0.0])
    with pytest.raises(ValueError):
        codecs.decode_wav(b"RIFFxxxxNOPE")


def test_audio_features_discriminate_frequency():
    rate = 8000
    t = np.arange(rate) / rate
    lo = np.sin(2 * np.pi * 200 * t).astype(np.float32)
    hi = np.sin(2 * np.pi * 3000 * t).astype(np.float32)
    f_lo = codecs.audio_features(lo, rate)
    f_hi = codecs.audio_features(hi, rate)
    assert f_lo.shape == (codecs.FEAT_DIM,)
    spec_lo, spec_hi = f_lo[32:], f_hi[32:]
    assert np.argmax(spec_lo) < np.argmax(spec_hi)
    # RMS of a unit sine ~ 0.707 in every frame; silence is all-zero
    assert np.allclose(f_lo[:16], 1 / np.sqrt(2), atol=0.01)
    assert np.array_equal(codecs.audio_features(np.zeros(0, np.float32),
                                                rate),
                          np.zeros(codecs.FEAT_DIM, np.float32))


# ----------------------------------------- y4m

def test_y4m_444_roundtrip_and_info():
    rng = np.random.default_rng(31)
    frames = [rng.integers(0, 256, (12, 16, 3), dtype=np.uint8)
              for _ in range(4)]
    buf = codecs.encode_y4m(frames, fps=25, chroma="444")
    info = codecs.y4m_info(buf)
    assert (info["w"], info["h"], info["n_frames"]) == (16, 12, 4)
    assert info["fps"] == 25.0
    for i, f in enumerate(frames):
        out = codecs.y4m_frame(buf, i, info)
        # RGB->YUV->RGB through two uint8 roundings: small bounded error
        assert np.abs(out.astype(int) - f.astype(int)).max() <= 3, i
    with pytest.raises(IndexError):
        codecs.y4m_frame(buf, 4, info)


def test_y4m_420_subsampling():
    # constant-color frames survive 4:2:0 exactly (chroma is constant)
    img = np.full((8, 10, 3), 0, np.uint8)
    img[..., 0] = 200
    img[..., 2] = 40
    buf = codecs.encode_y4m([img, img], fps=10, chroma="420")
    info = codecs.y4m_info(buf)
    assert info["chroma"] == "420"
    out = codecs.y4m_frame(buf, 1, info)
    assert np.abs(out.astype(int) - img.astype(int)).max() <= 3
    with pytest.raises(ValueError):
        codecs.y4m_info(b"YUV4MPEG2 W7 H4 F25:1 C420\n")   # odd w with 420
    with pytest.raises(NotImplementedError):
        codecs.y4m_info(b"YUV4MPEG2 W4 H4 F25:1 C411\n")


def test_video_features_shape_and_determinism():
    payload, mime, w, h, dur = codecs.synthesize_video(3, seed=5)
    assert mime == "video/x-yuv4mpeg" and dur > 0
    f1 = codecs.video_features(payload)
    f2 = codecs.video_features(payload)
    assert f1.shape == (codecs.FEAT_DIM,) and np.array_equal(f1, f2)


# ----------------------------------------- generalized decode stage

def test_real_media_decode_end_to_end(ray_session):
    """fake=False over a mixed image/audio/video table: every row decodes
    through its REAL codec branch and matches the direct computation."""
    media = multimodal.synthesize_media(18, seed=13, real_media=True)
    out = multimodal.decode_features(rd.from_arrow(media), fake=False,
                                     concurrency=2).to_pandas()
    assert len(out) == 18
    rows = {m: (p, mi, k) for m, p, mi, k in zip(
        media.column("media_id").to_pylist(),
        media.column("payload").to_pylist(),
        media.column("mime").to_pylist(),
        media.column("kind").to_pylist())}
    kinds_seen = set()
    for mid, feat in zip(out.media_id, out.feature):
        p, mime, kind = rows[int(mid)]
        kinds_seen.add(kind)
        if kind == "audio":
            expect = codecs.audio_features(*codecs.decode_wav(p))
        elif kind == "video":
            expect = codecs.video_features(p)
        else:
            expect = codecs.image_features(codecs.decode_image(p, mime))
        assert np.allclose(np.asarray(feat), expect), (mid, kind)
    assert kinds_seen == {"image", "audio", "video"}


def test_frame_features_real_frames(ray_session):
    media = multimodal.synthesize_media(9, seed=17, real_media=True)
    out = multimodal.frame_features(rd.from_arrow(media),
                                    every_ms=100).to_pandas()
    md = {m: (p, k) for m, p, k in zip(
        media.column("media_id").to_pylist(),
        media.column("payload").to_pylist(),
        media.column("kind").to_pylist())}
    assert len(out) > 0
    for mid in out.media_id.unique():
        assert md[int(mid)][1] == "video"
    # spot-check one row against a direct frame decode
    row = out.iloc[0]
    payload = md[int(row.media_id)][0]
    info = codecs.y4m_info(payload)
    idx = min(int(row.frame_ts_ms * info["fps"] / 1000.0),
              info["n_frames"] - 1)
    expect = codecs.image_features(codecs.y4m_frame(payload, idx, info))
    assert np.allclose(np.asarray(row.feature), expect)


def test_frame_sample_vectorized_counts(ray_session):
    """frame_sample plans ceil(duration/every_ms) timestamps per video and
    nothing for other kinds (parity with the round-2 per-row loop)."""
    media = multimodal.synthesize_media(64, seed=11)      # fake mixed kinds
    every = 7_000
    frames = multimodal.frame_sample(rd.from_arrow(media),
                                     every_ms=every).to_pandas()
    md = media.to_pandas().set_index("media_id")
    expect_rows = 0
    for mid, row in md.iterrows():
        if row["kind"] == "video" and row["duration_ms"] > 0:
            expect_rows += -(-int(row["duration_ms"]) // every)
    assert len(frames) == expect_rows
    for mid, grp in frames.groupby("media_id"):
        dur = int(md.loc[mid, "duration_ms"])
        assert md.loc[mid, "kind"] == "video"
        assert sorted(grp.frame_ts_ms) == list(range(0, dur, every))


# ----------------------------------------- baseline JPEG

def _psnr(a: np.ndarray, b: np.ndarray) -> float:
    mse = np.mean((a.astype(np.float64) - b.astype(np.float64)) ** 2)
    return 99.0 if mse == 0 else 10 * np.log10(255.0 ** 2 / mse)


def test_jpeg_roundtrip_quality_and_modes():
    """encode_jpeg -> decode_jpeg across quality / 4:4:4 vs 4:2:0 / restart
    intervals; PSNR must behave like a real transform codec (smooth content
    near-lossless at high quality, monotone in quality)."""
    grad = (np.add.outer(np.arange(48) * 3, np.arange(64) * 2)[:, :, None]
            .repeat(3, 2) % 256).astype(np.uint8)
    prev = 0.0
    for q in (50, 75, 90, 95):
        buf = codecs.encode_jpeg(grad, quality=q)
        dec = codecs.decode_jpeg(buf)
        assert dec.shape == grad.shape
        p = _psnr(grad, dec)
        assert p >= prev - 0.5       # monotone (within rounding)
        prev = p
    assert prev > 50.0               # q=95 on smooth content is near-lossless
    # subsampled + restart-interval variants stay consistent
    for sub in (False, True):
        for ri in (0, 2):
            dec = codecs.decode_jpeg(
                codecs.encode_jpeg(grad, 90, subsample=sub,
                                   restart_interval=ri))
            assert _psnr(grad, dec) > 45.0
    # flat image quantizes exactly at high quality
    flat = np.full((8, 8, 3), 127, np.uint8)
    assert np.array_equal(codecs.decode_jpeg(codecs.encode_jpeg(flat, 90)),
                          flat)


def test_jpeg_shapes_grayscale_and_dispatch():
    """Odd sizes (MCU padding + crop), 1x1, grayscale -> 3-channel, and the
    decode_image mime dispatch."""
    rng = np.random.default_rng(21)
    for shape in [(1, 1, 3), (7, 9, 3), (17, 33, 3), (16, 16, 3)]:
        img = rng.integers(0, 256, shape, dtype=np.uint8)
        for sub in (False, True):
            dec = codecs.decode_jpeg(codecs.encode_jpeg(img, 92,
                                                        subsample=sub))
            assert dec.shape == shape
    g = (np.add.outer(np.arange(20) * 7, np.arange(30) * 5) % 256) \
        .astype(np.uint8)
    dec = codecs.decode_jpeg(codecs.encode_jpeg(g, 90))
    assert dec.shape == (20, 30, 3)
    assert _psnr(np.repeat(g[..., None], 3, 2), dec) > 40.0
    via = codecs.decode_image(codecs.encode_jpeg(g, 90), "image/jpeg")
    assert np.array_equal(via, dec)


def test_jpeg_rejects_and_gates():
    """Truncated/corrupt payloads are ValueError; arithmetic processes
    gate with NotImplementedError (need native libs). Progressive (SOF2)
    is now SUPPORTED, so a truncated SOF2 header is a ValueError
    (missing SOS), not a gate."""
    import struct

    with pytest.raises(ValueError):
        codecs.decode_jpeg(b"not a jpeg")
    with pytest.raises(ValueError):
        codecs.decode_jpeg(b"\xff\xd8\xff\xe0")     # truncated, no SOS
    sof2 = (b"\xff\xd8\xff\xc2" + struct.pack(">H", 8)
            + b"\x08\x00\x08\x00\x08\x01")
    with pytest.raises(ValueError):
        codecs.decode_jpeg(sof2)          # progressive but truncated/no SOS
    sof9 = (b"\xff\xd8\xff\xc9" + struct.pack(">H", 8)
            + b"\x08\x00\x08\x00\x08\x01")
    with pytest.raises(NotImplementedError):
        codecs.decode_jpeg(sof9)                     # arithmetic
    # corrupt entropy data inside a valid stream must surface as a decode
    # error (never a silent wrong image is not checkable, but no unrelated
    # crash types)
    img = np.random.default_rng(5).integers(0, 256, (32, 32, 3),
                                            dtype=np.uint8)
    buf = bytearray(codecs.encode_jpeg(img, 90))
    assert len(buf) > 600            # entropy section well past the header
    buf[-40:-2] = b"\x55" * 38
    with pytest.raises((ValueError, IndexError)):
        codecs.decode_jpeg(bytes(buf))


def test_jpeg_non_interleaved_scans():
    """interleaved=False writes one baseline scan per component (T.81
    A.2.2); the decoder reconstructs the identical image because the
    quantized coefficients are the same either way."""
    rng = np.random.default_rng(33)
    for shape in [(16, 16, 3), (7, 9, 3), (20, 30)]:
        img = rng.integers(0, 256, shape, dtype=np.uint8)
        multi = codecs.encode_jpeg(img, 90, interleaved=False)
        single = codecs.encode_jpeg(img, 90)
        assert multi.count(b"\xff\xda") == (3 if len(shape) == 3 else 1)
        assert np.array_equal(codecs.decode_jpeg(multi),
                              codecs.decode_jpeg(single)), shape
    # unsupported non-interleaved combinations gate up front
    img = rng.integers(0, 256, (16, 16, 3), dtype=np.uint8)
    with pytest.raises(ValueError):
        codecs.encode_jpeg(img, 90, subsample=True, interleaved=False)
    with pytest.raises(ValueError):
        codecs.encode_jpeg(img, 90, restart_interval=2, interleaved=False)


def test_jpeg_marker_robustness_and_gates():
    """EOI stops the parse (trailing garbage ignored), stray TEM/RST
    markers are skipped, 4-component SOF gates, truncated entropy data
    and a missing component scan raise ValueError."""
    import struct

    img = np.random.default_rng(9).integers(0, 256, (24, 24, 3),
                                            dtype=np.uint8)
    buf = codecs.encode_jpeg(img, 90)
    base = codecs.decode_jpeg(buf)
    # trailing garbage after EOI is not part of the image
    assert np.array_equal(codecs.decode_jpeg(buf + b"\x00garbage\xff"), base)
    # a stray TEM marker between header segments is skipped
    assert np.array_equal(codecs.decode_jpeg(buf[:2] + b"\xff\x01"
                                             + buf[2:]), base)
    # 4-component (CMYK-shaped) SOF gates honestly
    sof_cmyk = (b"\xff\xd8\xff\xc0" + struct.pack(">H", 8 + 3 * 4)
                + b"\x08\x00\x10\x00\x10\x04"
                + b"\x01\x11\x00\x02\x11\x00\x03\x11\x00\x04\x11\x00")
    with pytest.raises(NotImplementedError):
        codecs.decode_jpeg(sof_cmyk)
    # truncated entropy data (restart segments missing) is a ValueError
    ri = codecs.encode_jpeg(img, 90, restart_interval=1)
    rst_positions = [i for i in range(len(ri) - 1)
                     if ri[i] == 0xFF and 0xD0 <= ri[i + 1] <= 0xD7]
    assert len(rst_positions) > 2
    with pytest.raises(ValueError):
        codecs.decode_jpeg(ri[:rst_positions[1]] + b"\xff\xd9")
    # non-interleaved stream missing its last component scan
    multi = codecs.encode_jpeg(img, 90, interleaved=False)
    last_sos = multi.rfind(b"\xff\xda")
    with pytest.raises(ValueError):
        codecs.decode_jpeg(multi[:last_sos] + b"\xff\xd9")


def test_jpeg_huffman_lut_cached_across_decodes():
    """_huff_lut is keyed on the raw DHT bytes, so decoding two images
    that share tables hits the cache instead of rebuilding 2x65536-entry
    LUTs (the round-3 profile showed LUT builds at ~1/3 of small-image
    decode time)."""
    rng = np.random.default_rng(41)
    imgs = [rng.integers(0, 256, (16, 16, 3), dtype=np.uint8)
            for _ in range(2)]
    bufs = [codecs.encode_jpeg(im, 90) for im in imgs]
    codecs._huff_lut.cache_clear()
    first = [codecs.decode_jpeg(b) for b in bufs]
    misses_after_first = codecs._huff_lut.cache_info().misses
    again = [codecs.decode_jpeg(b) for b in bufs]
    info = codecs._huff_lut.cache_info()
    assert info.misses == misses_after_first     # no rebuilds on re-decode
    assert info.hits > 0
    for a, b in zip(first, again):
        assert np.array_equal(a, b)


def test_jpeg_in_media_synthesis_and_actor():
    """synthesize_image('jpeg') produces a decodable baseline JPEG and the
    real decode actor handles a JPEG row end to end."""
    payload, mime, w, h = codecs.synthesize_image(3, seed=7, fmt="jpeg")
    assert mime == "image/jpeg"
    img = codecs.decode_image(payload, mime)
    assert img.shape == (h, w, 3)
    actor = multimodal.DecodeMediaActor(fake=False)
    batch = pa.table({
        "media_id": pa.array([1], pa.int64()),
        "kind": pa.array(["image"], pa.string()),
        "payload": pa.array([payload], pa.large_binary()),
        "mime": pa.array([mime], pa.string()),
    })
    out = actor(batch)
    feat = np.asarray(out.column("feature").to_pylist()[0])
    assert np.allclose(feat, codecs.image_features(img))


def test_truncated_payloads_raise_valueerror():
    """The shared corrupt-payload contract: truncated headers raise
    ValueError (not struct.error) from every codec entry point."""
    import pytest

    from raydedup.codecs import decode_image, decode_wav

    for buf, mime in [(b"BM" + b"\x00" * 10, "image/bmp"),
                      (b"\x89PNG\r\n\x1a\n" + b"\x00" * 4, "image/png"),
                      (b"\xff\xd8\xff\xe0\x00", "image/jpeg"),
                      (b"P6 junk", "image/x-portable-pixmap")]:
        with pytest.raises(ValueError):
            decode_image(buf, mime)
    with pytest.raises(ValueError):
        decode_wav(b"RIFF\x00\x00\x00\x00WAVEfmt "
                   + (8).to_bytes(4, "little") + b"\x00" * 8)


# ----------------------------------------- WAV round-trip stats (driver gate)

def test_docs_to_wav_audio_stats_roundtrip_parity():
    """The media_wav_roundtrip driver query's engine half: text codepoints
    mod 251 -> real WAV encode -> real WAV decode -> integer stats must equal
    a direct computation from the text (what the SQL oracle replays)."""
    texts = ["hello world", "", "   ", "a\U0001F600b\u00e9",  # astral + accents
             "x" * 1000, " tail"]
    docs = rd.from_arrow(pa.table({
        "doc_id": pa.array(range(len(texts)), pa.int64()),
        "text": pa.array(texts, pa.string()),
    }))
    out = {r["media_id"]: r for r in
           multimodal.audio_stats(multimodal.docs_to_wav(docs)).take_all()}
    assert len(out) == len(texts)
    for i, s in enumerate(texts):
        cps = np.frombuffer(s.encode("utf-32-le"), dtype="<u4") \
            .astype(np.int64) % 251
        r = out[i]
        assert r["n_samples"] == len(cps)
        assert r["sample_sum"] == int(cps.sum())
        assert r["sample_min"] == (int(cps.min()) if len(cps) else 0)
        assert r["sample_max"] == (int(cps.max()) if len(cps) else 0)


def test_media_wav_roundtrip_query_matches_duckdb_oracle():
    """Full driver-contract parity at sf0.001: queries()['media_wav_roundtrip']
    vs oracle_sql() through DuckDB, value-for-value."""
    import importlib.util

    import duckdb
    spec = importlib.util.spec_from_file_location(
        "_ray_entry_test", "/root/repo/__ray_entry__.py")
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    got = mod.queries()["media_wav_roundtrip"]("/root/testdata/sf0.001") \
        .to_pandas().sort_values("doc_id").reset_index(drop=True)
    con = duckdb.connect()
    con.execute("CREATE VIEW documents AS SELECT * FROM "
                "'/root/testdata/sf0.001/documents.parquet'")
    exp = con.sql(mod.oracle_sql()["media_wav_roundtrip"]).df() \
        .sort_values("doc_id").reset_index(drop=True)
    assert list(got.columns) == list(exp.columns) == \
        ["doc_id", "n_samples", "sample_sum", "sample_min", "sample_max"]
    assert got.equals(exp.astype(got.dtypes.to_dict()))


def test_docs_to_image_roundtrip_both_formats():
    """Even doc_ids encode BMP, odd PNG; both decode back to the exact
    codepoint-mod-256 strip, including non-ASCII codepoints and the empty
    text (empty payload, zero stats)."""
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from raydedup.stages.multimodal import docs_to_image, image_stats
    docs = ["abc", "", "héllo 世界", "z" * 300]
    t = pa.table({"doc_id": pa.array(range(len(docs)), pa.int64()),
                  "text": pa.array(docs, pa.string())})
    media = docs_to_image(rd.from_arrow(t))
    mt = media.to_pandas().set_index("media_id").sort_index()
    assert mt.loc[0, "mime"] == "image/bmp"
    assert mt.loc[1, "mime"] == "image/png" and len(mt.loc[1, "payload"]) == 0
    out = image_stats(media).to_pandas().set_index("media_id").sort_index()
    for i, s in enumerate(docs):
        cps = np.array([ord(c) % 256 for c in s], np.int64)
        assert out.loc[i, "n_pixels"] == len(cps)
        assert out.loc[i, "pixel_sum"] == (cps.sum() if len(cps) else 0)
        assert out.loc[i, "pixel_min"] == (cps.min() if len(cps) else 0)
        assert out.loc[i, "pixel_max"] == (cps.max() if len(cps) else 0)


def test_docs_to_y4m_roundtrip_stats():
    """Single-frame gray y4m streams decode back to the exact
    codepoint-mod-256 strip (gray RGB<->BT.601 is bit-exact for gray)."""
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from raydedup.stages.multimodal import docs_to_y4m, video_stats
    docs = ["abc", "", "héllo 世界", "q" * 200]
    t = pa.table({"doc_id": pa.array(range(len(docs)), pa.int64()),
                  "text": pa.array(docs, pa.string())})
    out = video_stats(docs_to_y4m(rd.from_arrow(t))).to_pandas() \
        .set_index("media_id").sort_index()
    for i, s in enumerate(docs):
        cps = np.array([ord(c) % 256 for c in s], np.int64)
        assert out.loc[i, "n_pixels"] == len(cps)
        assert out.loc[i, "pixel_sum"] == (cps.sum() if len(cps) else 0)
        assert out.loc[i, "pixel_min"] == (cps.min() if len(cps) else 0)
        assert out.loc[i, "pixel_max"] == (cps.max() if len(cps) else 0)
