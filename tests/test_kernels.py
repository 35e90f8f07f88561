"""Kernel unit tests: determinism, MinHash estimate property, edge cases.

Mirrors the reference's fixture style (SURVEY §5): planted/seeded inputs with
value + rank-order assertions.
"""

import hashlib

import numpy as np
import pytest

from raydedup import kernels as K


def _sig_of(texts, k=5, num_perm=128, seed=42):
    flat, offs = K.tokenize_hash_batch(texts)
    sh, so = K.shingle_hashes(flat, offs, k)
    return K.minhash_signatures(sh, so, K.perm_seeds(num_perm, seed)), sh, so


def test_tokenize_deterministic():
    texts = ["def foo(x):\n    return x + 1\n", "", "x y z"]
    f1, o1 = K.tokenize_hash_batch(texts)
    f2, o2 = K.tokenize_hash_batch(texts)
    assert (f1 == f2).all() and (o1 == o2).all()
    # batch composition must not change per-doc hashes
    f3, o3 = K.tokenize_hash_batch(texts[2:])
    assert (f3 == f1[o1[2]:o1[3]]).all()


def test_sha256_matches_hashlib():
    texts = ["abc", "", "héllo\nwörld"]
    assert K.sha256_hex(texts) == [
        hashlib.sha256(t.encode()).hexdigest() for t in texts]


def test_row_ids_stable_and_nonnegative():
    ids = K.row_ids(["r1", "r1"], ["a", "b"], ["c", "c"])
    assert ids.dtype == np.int64 and (ids >= 0).all()
    ids2 = K.row_ids(["r1"], ["a"], ["c"])
    assert ids2[0] == ids[0]
    # separator prevents (repo="r1a") colliding with (repo="r1", path="a")
    assert K.row_ids(["r1a"], [""], ["c"])[0] != ids[0]


def test_identical_content_identical_signature():
    sig, _, _ = _sig_of(["def f():\n    pass\n"] * 2 + ["other stuff here"])
    assert (sig[0] == sig[1]).all()
    assert not (sig[0] == sig[2]).all()


def test_empty_doc_gets_sentinel_signature():
    sig, sh, so = _sig_of(["", "x"])
    assert (sig[0] == np.iinfo(np.uint64).max).all()
    assert so[1] - so[0] == 0
    assert so[2] - so[1] == 1   # short doc -> one whole-token-run shingle


def test_minhash_estimates_exact_jaccard():
    """|Ĵ - J| small on constructed overlap (MinHash property, FIXTURES F2)."""
    rng = np.random.default_rng(7)
    base = [f"tok{int(x)}" for x in rng.integers(0, 50_000, 400)]
    for overlap in (0.9, 0.7, 0.5):
        keep = int(len(base) * overlap)
        alt = base[:keep] + [f"alt{int(x)}" for x in
                             rng.integers(0, 50_000, len(base) - keep)]
        t1, t2 = " ".join(base), " ".join(alt)
        sig, sh, so = _sig_of([t1, t2])
        est = K.est_jaccard(sig[0:1], sig[1:2])[0]
        exact = K.exact_jaccard_sets(sh[so[0]:so[1]], sh[so[1]:so[2]])
        assert abs(est - exact) <= 4 / np.sqrt(128), (overlap, est, exact)


def test_band_hashes_collide_iff_rows_equal():
    sig, _, _ = _sig_of(["a b c d e f g h i j"] * 2 + ["k l m n o p q r s t"])
    bh = K.band_hashes(sig, 32, 4)
    assert (bh[0] == bh[1]).all()
    assert not (bh[0] == bh[2]).any()


def test_simhash_hamming_tracks_similarity():
    near_a = "def f(x):\n" + "\n".join(f"    y{i} = x + {i}" for i in range(40))
    near_b = near_a.replace("y3 = x + 3", "z9 = x * 9")
    far = " ".join(f"zq{i}" for i in range(200))
    flat, offs = K.tokenize_hash_batch([near_a, near_b, far])
    sh, so = K.shingle_hashes(flat, offs, 5)
    s = K.simhash64(sh, so)
    d_near = K.hamming64(s[0:1], s[1:2])[0]
    d_far = K.hamming64(s[0:1], s[2:3])[0]
    assert d_near < d_far


def test_clip01():
    x = np.array([-0.5, 0.3, 1.7])
    assert (K.clip01(x) == np.array([0.0, 0.3, 1.0])).all()


def test_to_i63_range():
    x = np.array([0, 2**63 - 1, 2**63, 2**64 - 1], dtype=np.uint64)
    y = K.to_i63(x)
    assert y.dtype == np.int64 and (y >= 0).all()


MIXED_TEXTS = [
    "hello world, foo_bar 123!",
    "",                                              # empty doc
    "a b",                                           # short (< k tokens)
    "copyright — em–dash Ünïcode £5 ¿que?  nbsp",    # non-ASCII
    "normal ascii line\nwith lots of tokens " * 50,
    None,
    "tabs\tand\rcarriage\r\nreturns",
    "😀 emoji mixed with ascii tokens here",
    "x",                                             # single token
    "verylongtoken" * 20,                            # > 8-byte token
]


def test_mixed_batch_tokenizer_routes_per_doc():
    """A batch with SOME non-ASCII docs must produce identical hashes to the
    all-regex path (per-doc routing parity), on both entry points."""
    import pyarrow as pa
    strs = [("" if t is None else t) for t in MIXED_TEXTS]
    for lc in (False, True):
        for wo in (False, True):
            rf, ro = K._tokenize_hash_regex(strs, lc, wo)
            bf, bo = K.tokenize_hash_batch(MIXED_TEXTS, lowercase=lc,
                                           words_only=wo)
            assert np.array_equal(ro, bo) and np.array_equal(rf, bf)
            for typ in (pa.string(), pa.large_string()):
                af, ao = K.tokenize_hash_arrow(pa.array(strs, typ),
                                               lowercase=lc, words_only=wo)
                assert np.array_equal(ao, bo) and np.array_equal(af, bf)


def test_mixed_batch_regex_hashes_match_scalar_spec():
    """The regex fallback's vectorized hashing equals the per-token cached
    scalar hash (the spec's reference implementation)."""
    rf, ro = K._tokenize_hash_regex([MIXED_TEXTS[3]], False, False)
    toks = K.TOKEN_RE.findall(K.normalize_content(MIXED_TEXTS[3]))
    assert len(rf) == len(toks)
    for i, t in enumerate(toks):
        assert int(rf[i]) == K._token_hash_cached(t), t


def test_unicode_vectorized_matches_regex():
    """The codepoint-class unicode tokenizer must be value- and
    offset-identical to the regex reference on adversarial inputs: every
    UTF-8 width class (1/2/3/4 bytes), lone surrogates, CR/LF
    normalization, empty docs, and tokens crossing the 8-byte pack
    boundary."""
    rng = np.random.default_rng(23)
    pool = ["héllo wörld — ¿qué? 北京 「引用」", "  nbsp",
            "emoji 🎉🚀 text", "ΣΔΠ σδπ", "русский текст",
            "a" * 9 + "—" + "b" * 17, "𝔘𝔫𝔦𝔠𝔬𝔡𝔢", "", " ", "—",
            "mixed_ascii and ünïcode; §¶", chr(0xD83D) + " lone surrogate",
            "ﬁﬂ ligatures ß", "crlf\r\nand\rcr"]
    texts = ["".join(pool[i] for i in rng.integers(0, len(pool), 5))
             for _ in range(60)]
    texts += ["".join(chr(int(c)) for c in rng.integers(1, 0x2FFFF, 40))
              for _ in range(20)]
    for lc in (False, True):
        for wo in (False, True):
            rf, ro = K._tokenize_hash_regex(texts, lc, wo)
            vf, vo = K._tokenize_hash_unicode(texts, lc, wo)
            assert np.array_equal(ro, vo), (lc, wo)
            assert np.array_equal(rf, vf), (lc, wo)


def test_long_token_suffix_path_matches_scalar():
    """Very long tokens take the sorted-suffix + scalar-tail path in
    _hash_token_runs; values must equal the scalar reference (regression
    for the O(maxlen x T) rewrite)."""
    rng = np.random.default_rng(5)
    toks = [rng.integers(0, 256, n, dtype=np.uint8).tobytes()
            for n in [1, 8, 9, 16, 40, 40, 41, 5000, 20000]]
    data = np.frombuffer(b"".join(toks), dtype=np.uint8)
    lens = np.array([len(t) for t in toks], dtype=np.int64)
    tpos = np.zeros(len(toks), dtype=np.int64)
    np.cumsum(lens[:-1], out=tpos[1:])
    got = K._hash_token_runs(data, tpos, lens)
    exp = np.array([K._token_hash_bytes(t) for t in toks], dtype=np.uint64)
    assert np.array_equal(got, exp)


def test_shingles_contiguous_roll_with_short_docs():
    """Short docs in a batch no longer force the masked-gather path: outputs
    must equal the per-doc naive poly hash for every doc shape."""
    P = np.uint64(0x100000001B3)

    def naive(flat, offs, k):
        outs, so = [], [0]
        for d in range(len(offs) - 1):
            seg = flat[offs[d]:offs[d + 1]]
            if len(seg) == 0:
                ws = []
            elif len(seg) < k:
                ws = [seg]
            else:
                ws = [seg[i:i + k] for i in range(len(seg) - k + 1)]
            for w in ws:
                a = np.uint64(0)
                with np.errstate(over="ignore"):
                    for h in w:
                        a = a * P + h
                outs.append(int(K.splitmix64(np.array([a], np.uint64))[0]))
            so.append(len(outs))
        return np.array(outs, np.uint64), np.array(so, np.int64)

    flat, offs = K.tokenize_hash_batch(MIXED_TEXTS)
    for k in (2, 5, 9):
        sh, so = K.shingle_hashes(flat, offs, k)
        nsh, nso = naive(flat, offs, k)
        assert np.array_equal(so, nso) and np.array_equal(sh, nsh), k


def test_all_nonascii_and_all_empty_batches():
    """A block whose docs are ALL non-ASCII (empty ASCII subset) and blocks
    of only empty docs must not crash and must match the regex path."""
    import pyarrow as pa
    for texts in (["— ünïcode —", "😀"], ["—", "— —"]):
        rf, ro = K._tokenize_hash_regex(texts, False, False)
        for f, o in (K.tokenize_hash_batch(texts),
                     K.tokenize_hash_arrow(pa.array(texts))):
            assert np.array_equal(f, rf) and np.array_equal(o, ro)
    f, o = K.tokenize_hash_batch(["", "", None])
    assert len(f) == 0 and np.array_equal(o, np.zeros(4, np.int64))
    f, o = K.tokenize_hash_arrow(pa.array(["", "", ""]))
    assert len(f) == 0 and np.array_equal(o, np.zeros(4, np.int64))


def test_simhash_trailing_empty_doc_does_not_corrupt_predecessor():
    """A batch ending in empty docs must not steal the preceding doc's
    last shingle from its bit-vote segment (the old clamped-reduceat bug):
    every doc's simhash equals its solo-batch value regardless of where
    empty docs sit in the batch."""
    doc = "def f(x):\n    return x + 1\n"
    other = " ".join(f"tok{i}" for i in range(30))
    flat, offs = K.tokenize_hash_batch([doc])
    sh, so = K.shingle_hashes(flat, offs, 5)
    solo = K.simhash64(sh, so)[0]
    flat2, offs2 = K.tokenize_hash_batch([other, doc, "", ""])
    sh2, so2 = K.shingle_hashes(flat2, offs2, 5)
    s = K.simhash64(sh2, so2)
    assert s[1] == solo
    assert s[2] == 0 and s[3] == 0
    # leading + interior empties too
    flat3, offs3 = K.tokenize_hash_batch(["", doc, "", other])
    sh3, so3 = K.shingle_hashes(flat3, offs3, 5)
    s3 = K.simhash64(sh3, so3)
    assert s3[1] == solo and s3[0] == 0 and s3[2] == 0


def test_simhash_all_empty_batch():
    flat, offs = K.tokenize_hash_batch(["", ""])
    sh, so = K.shingle_hashes(flat, offs, 5)
    assert (K.simhash64(sh, so) == 0).all()
