"""Pure numpy/arrow batch kernels: normalize, sha256, shingle, MinHash, LSH
bands, SimHash, Jaccard.

Everything here is vectorized over a *batch* of documents; per-row Python is
limited to C-speed operations (regex findall, hashlib digests over unique
tokens). No per-shingle Python loops.

Hash scheme (public-knowledge constructions only):
- stable 64-bit token hash: blake2b(digest_size=8)
- shingle hash: polynomial roll of token hashes + splitmix64 finalizer
- MinHash perm p: min over shingles of splitmix64(shingle_hash XOR seed_p)
  (XOR-seeded universal-ish family; same family used by many public MinHash
  implementations in place of modular permutations)
- SimHash: 64-bit majority vote over shingle-hash bits

Reference semantics being replaced: dense (N,N) distance matrix
(selfclean/cleaner/selfclean_cleaner.py:105-149) -> sparse signatures here.
"""

from __future__ import annotations

import hashlib
import re
from functools import lru_cache

import numpy as np

U64 = np.uint64
_SPLITMIX_1 = U64(0x9E3779B97F4A7C15)
_SPLITMIX_2 = U64(0xBF58476D1CE4E5B9)
_SPLITMIX_3 = U64(0x94D049BB133111EB)

# code tokenizer: identifiers/numbers as one token, every punctuation char its
# own token; whitespace dropped (so whitespace-collapse is inherent).
TOKEN_RE = re.compile(r"\w+|[^\w\s]", re.UNICODE)

# word-only variant (lang-id denominators): punctuation — including
# non-ASCII punctuation the byte-class fast path never sees — is dropped at
# the tokenizer, so both paths count exactly the \w+ tokens.
WORD_RE = re.compile(r"\w+", re.UNICODE)


def splitmix64(x: np.ndarray) -> np.ndarray:
    """Vectorized splitmix64 finalizer (public domain algorithm)."""
    x = x.astype(U64, copy=True)
    with np.errstate(over="ignore"):
        x += _SPLITMIX_1
        x ^= x >> U64(30)
        x *= _SPLITMIX_2
        x ^= x >> U64(27)
        x *= _SPLITMIX_3
        x ^= x >> U64(31)
    return x


def hash64_str(s: str) -> int:
    """Stable 64-bit hash of a string (blake2b-8)."""
    return int.from_bytes(hashlib.blake2b(s.encode("utf-8", "surrogatepass"),
                                          digest_size=8).digest(), "little")


# Engine-visible ids/keys are 63-bit non-negative int64: Ray Data group keys
# round-trip through pandas, where full-range uint64 degrades to pickled
# objects. 63 bits keep collision odds negligible at 10^12 rows (~3e-6).
MASK63 = (1 << 63) - 1


def to_i63(x: np.ndarray) -> np.ndarray:
    """uint64 hash values -> non-negative int64 keys (mask to 63 bits)."""
    return (x & U64(MASK63)).astype(np.int64)


def row_ids(repos, paths, commits) -> np.ndarray:
    """Row identity id = hash63(repo \\x00 path \\x00 commit) as int64 >= 0."""
    out = np.empty(len(repos), dtype=np.int64)
    for i, (r, p, c) in enumerate(zip(repos, paths, commits)):
        out[i] = hash64_str(f"{r}\x00{p}\x00{c}") & MASK63
    return out


def sha256_hex(contents) -> list:
    """Per-row sha256 hex of the exact UTF-8 content bytes.

    Per-row invariant vs the reference hashing (BASELINE.json input_hint).
    """
    return [hashlib.sha256(c.encode("utf-8", "surrogatepass")).hexdigest()
            if c is not None else None for c in contents]


def normalize_content(text: str, lowercase: bool = False) -> str:
    """Newline canonicalization (+ optional lowercase). Tokenization already
    collapses whitespace, so no explicit collapse is needed for shingles."""
    if text is None:
        return ""
    t = text.replace("\r\n", "\n").replace("\r", "\n")
    return t.lower() if lowercase else t


# --- token hashing spec (shared by the vectorized ASCII path and the
# regex fallback; both MUST produce identical values for the same token):
# pack the first 8 bytes little-endian into a uint64, then for each further
# byte b: val = splitmix64(val) * POLY + b (mod 2^64); final = splitmix64(val).
_POLY = U64(0x100000001B3)

# all-ones masks for the first-n-bytes pack (n = 0..8); index 8 is the full
# 64-bit mask, precomputed in Python ints where 1 << 64 is well-defined
_PACK_MASKS = np.array([(1 << (8 * i)) - 1 for i in range(9)],
                       dtype=np.uint64)

# ASCII char classes: 0 = whitespace, 1 = word [0-9A-Za-z_], 2 = punct (own
# token). Bytes >= 128 never hit the fast path (non-ASCII batch falls back).
_CLS = np.zeros(256, dtype=np.uint8)
for _c in b" \t\n\r\x0b\x0c":
    _CLS[_c] = 0
for _r in (range(ord("0"), ord("9") + 1), range(ord("A"), ord("Z") + 1),
           range(ord("a"), ord("z") + 1), [ord("_")]):
    for _c in _r:
        _CLS[_c] = 1
for _c in range(33, 127):
    if _CLS[_c] == 0 and chr(_c) not in " ":
        if _CLS[_c] != 1:
            _CLS[_c] = 2
for _c in range(128, 256):
    _CLS[_c] = 1   # placeholder; fast path rejects non-ASCII batches
_LOWER = np.arange(256, dtype=np.uint8)
_LOWER[ord("A"):ord("Z") + 1] += 32


def _token_hash_bytes(bs: bytes) -> int:
    """Reference (scalar) implementation of the token-hash spec."""
    val = int.from_bytes(bs[:8], "little")
    m = (1 << 64) - 1
    for b in bs[8:]:
        # splitmix64 scalar
        x = val
        x = (x + 0x9E3779B97F4A7C15) & m
        x ^= x >> 30
        x = (x * 0xBF58476D1CE4E5B9) & m
        x ^= x >> 27
        x = (x * 0x94D049BB133111EB) & m
        x ^= x >> 31
        val = (x * 0x100000001B3 + b) & m
    return int(splitmix64(np.array([val], dtype=U64))[0])


@lru_cache(maxsize=1_000_000)
def _token_hash_cached(tok: str) -> int:
    return _token_hash_bytes(tok.encode("utf-8", "surrogatepass"))


def _tokenize_hash_regex(texts, lowercase: bool, words_only: bool = False):
    """Fallback path for non-ASCII docs: regex tokenizer (unicode \\w/\\s
    classes — byte class tables can't replicate these without decoding), but
    the HASHING half is the shared vectorized spec over the tokens' UTF-8
    bytes (`_hash_token_runs`), not a per-token Python hash. Values identical
    to the vectorized path by construction (pytest
    test_token_hash_mask_lookup_parity + mixed-batch parity gates)."""
    rx = WORD_RE if words_only else TOKEN_RE
    tok_lists = [rx.findall(normalize_content(t, lowercase))
                 for t in texts]
    lens = np.fromiter((len(t) for t in tok_lists), dtype=np.int64,
                       count=len(tok_lists))
    offsets = np.zeros(len(tok_lists) + 1, dtype=np.int64)
    np.cumsum(lens, out=offsets[1:])
    total = int(offsets[-1])
    if total == 0:
        return np.empty(0, dtype=U64), offsets
    tok_bytes = [t.encode("utf-8", "surrogatepass")
                 for toks in tok_lists for t in toks]
    tlens = np.fromiter((len(b) for b in tok_bytes), dtype=np.int64,
                        count=total)
    tpos = np.zeros(total, dtype=np.int64)
    np.cumsum(tlens[:-1], out=tpos[1:])
    data = np.frombuffer(b"".join(tok_bytes), dtype=np.uint8)
    return _hash_token_runs(data, tpos, tlens), offsets


def _hash_token_runs(data: np.ndarray, tpos: np.ndarray,
                     lens: np.ndarray) -> np.ndarray:
    """Vectorized token-hash spec over token byte runs (start tpos, length
    lens) inside data. Shared by the ASCII byte tokenizer and the regex
    fallback so both produce identical values for the same token bytes."""
    if len(tpos) == 0:
        return np.empty(0, dtype=U64)
    with np.errstate(over="ignore"):
        # first-8-bytes little-endian pack in ONE unaligned u64 gather +
        # length mask (replaces an 8-iteration byte-gather loop): pad the
        # byte buffer, view it at stride 1 as u64, mask bytes past the
        # token end. The mask comes from a 9-entry lookup table — a
        # computed (1 << 64) shift-by-width is undefined in C/NumPy and
        # platform-dependent, so never shift by the full word width.
        padded = np.empty(len(data) + 8, dtype=np.uint8)
        padded[:len(data)] = data
        padded[len(data):] = 0
        u64v = np.ndarray(shape=(len(data) + 1,), dtype="<u8",
                          buffer=padded, strides=(1,))
        mask = _PACK_MASKS[np.minimum(lens, 8)]
        val = u64v[tpos] & mask
        # long tokens (rare): continue per the spec. Sorting them by length
        # makes the active set at byte j a SUFFIX, so per-iteration work is
        # O(active + log L) and the total is O(sum of long-token bytes) —
        # the previous per-j full-array mask scan was O(maxlen × T), i.e.
        # one base64-ish blob token made the whole batch quadratic.
        long_idx = np.nonzero(lens > 8)[0]
        if len(long_idx):
            li = long_idx[np.argsort(lens[long_idx], kind="stable")]
            ll = lens[li]
            v = val[li]
            tp = tpos[li]
            L = len(li)
            j = 8
            while True:
                start = int(np.searchsorted(ll, j, side="right"))
                if start >= L:
                    break
                if L - start <= 4:
                    # tiny tail (a few tokens vastly longer than the rest):
                    # scalar chains beat per-byte numpy-call overhead
                    mm = (1 << 64) - 1
                    for k in range(start, L):
                        x_val = int(v[k])
                        lo = int(tp[k]) + j
                        for b in data[lo:int(tp[k]) + int(ll[k])].tolist():
                            x = (x_val + 0x9E3779B97F4A7C15) & mm
                            x ^= x >> 30
                            x = (x * 0xBF58476D1CE4E5B9) & mm
                            x ^= x >> 27
                            x = (x * 0x94D049BB133111EB) & mm
                            x ^= x >> 31
                            x_val = (x * 0x100000001B3 + b) & mm
                        v[k] = x_val
                    break
                v[start:] = splitmix64(v[start:]) * _POLY \
                    + data[tp[start:] + j].astype(np.uint64)
                j += 1
            val[li] = v
    return splitmix64(val)


def _token_runs(cls: np.ndarray, offs: np.ndarray, words_only: bool):
    """Token (start, length) runs over a class array (0 = ws, 1 = word,
    2 = punct) with document boundaries `offs` — word runs are maximal,
    punct units are single-unit tokens, replicating TOKEN_RE
    (`\\w+|[^\\w\\s]`). Unit-agnostic: bytes for the ASCII path, codepoints
    for the unicode path.

    Word-run starts: a word unit whose predecessor (within the same doc) is
    not word; doc starts count as boundaries. Run ENDS are computable
    elementwise the same way — a word unit whose successor (same doc) is
    not word — and the k-th end pairs with the k-th start (both
    position-sorted, same count). This replaces a full-length int64 reverse
    minimum.accumulate (two array reversals, ~48 bytes of memory traffic
    per input unit — the tokenizer's hot spot under multi-worker bandwidth
    contention) with unit-wide elementwise ops."""
    prev = np.empty_like(cls)
    prev[0] = 0
    prev[1:] = cls[:-1]
    starts_docs = offs[:-1]
    starts_docs = starts_docs[starts_docs < len(cls)]
    prev[starts_docs] = 0
    tok_start = (cls == 1) & (prev != 1)
    if not words_only:
        tok_start |= cls == 2
    tpos = np.nonzero(tok_start)[0]
    if len(tpos) == 0:
        return tpos, np.empty(0, dtype=np.int64)
    nxt = np.empty_like(cls)
    nxt[:-1] = cls[1:]
    nxt[-1] = 0
    ends_docs = offs[1:] - 1            # force run breaks at doc ends; the
    nxt[ends_docs] = 0                  # -1 of an empty leading doc aliases
    #                                     the last unit, whose nxt is 0 anyway
    word_ends = np.nonzero((cls == 1) & (nxt != 1))[0] + 1
    is_punct = cls[tpos] == 2
    ends = np.empty(len(tpos), dtype=np.int64)
    ends[is_punct] = tpos[is_punct] + 1
    ends[~is_punct] = word_ends
    return tpos, ends - tpos


# lazily grown codepoint -> class cache for the unicode path; classification
# delegates to the re module's own \w / \s so values are regex-parity by
# construction (unicode corpora touch a few hundred distinct codepoints)
_UCLS_CACHE: dict = {}
_RX_WORD = re.compile(r"\w", re.UNICODE)
_RX_SPACE = re.compile(r"\s", re.UNICODE)


def _tokenize_hash_unicode(texts, lowercase: bool, words_only: bool = False):
    """Vectorized unicode tokenizer for non-ASCII docs: codepoint class
    lookup (lazily built from re's own \\w / \\s, so exact regex parity)
    replaces the per-doc re.findall + per-token encode of
    `_tokenize_hash_regex` (~5x on mixed corpora). Hashing follows the
    shared spec over each token's UTF-8 bytes — values identical to the
    regex fallback by construction (pytest
    test_unicode_vectorized_matches_regex)."""
    n = len(texts)
    norm = [normalize_content(t, lowercase) for t in texts]
    cp_lens = np.fromiter((len(s) for s in norm), dtype=np.int64, count=n)
    cp_offs = np.zeros(n + 1, dtype=np.int64)
    np.cumsum(cp_lens, out=cp_offs[1:])
    joined = "".join(norm)
    if not joined:
        return np.empty(0, dtype=U64), cp_offs
    cp = np.frombuffer(joined.encode("utf-32-le", "surrogatepass"),
                       dtype="<u4")
    uniq, inv = np.unique(cp, return_inverse=True)
    cls_u = np.empty(len(uniq), dtype=np.uint8)
    for i, c in enumerate(uniq.tolist()):
        v = _UCLS_CACHE.get(c)
        if v is None:
            ch = chr(c)
            v = 1 if _RX_WORD.match(ch) else \
                (0 if _RX_SPACE.match(ch) else 2)
            _UCLS_CACHE[c] = v
        cls_u[i] = v
    tpos, lens = _token_runs(cls_u[inv], cp_offs, words_only)
    offsets = np.searchsorted(tpos, cp_offs, side="left")
    if len(tpos) == 0:
        return np.empty(0, dtype=U64), offsets
    # codepoint -> UTF-8 byte offsets: 1/2/3/4 bytes by value (lone
    # surrogates encode as 3 bytes under surrogatepass — the < 0x10000
    # bucket covers them)
    u8len = 1 + (cp >= 0x80) + (cp >= 0x800) + (cp >= 0x10000)
    b_off = np.zeros(len(cp) + 1, dtype=np.int64)
    np.cumsum(u8len, out=b_off[1:])
    data = np.frombuffer(joined.encode("utf-8", "surrogatepass"),
                         dtype=np.uint8)
    tb = b_off[tpos]
    return _hash_token_runs(data, tb, b_off[tpos + lens] - tb), offsets


def _tokenize_hash_ascii(byte_offs: np.ndarray, data: np.ndarray,
                         lowercase: bool, words_only: bool = False):
    """Fully vectorized byte-level tokenizer over concatenated ASCII docs.

    byte_offs: int64[n+1] doc boundaries into data (uint8). Token boundaries
    replicate TOKEN_RE (`\\w+|[^\\w\\s]`) for ASCII; hashing follows the
    shared spec above. No per-token Python.
    """
    n = len(byte_offs) - 1
    if len(data) == 0:   # n empty docs (or an all-non-ASCII mixed batch's
        return np.empty(0, dtype=U64), np.zeros(n + 1, dtype=np.int64)
    #                      empty ASCII subset): no bytes, no tokens
    if lowercase:
        data = _LOWER[data]
    tpos, lens = _token_runs(_CLS[data], byte_offs, words_only)
    if len(tpos) == 0:
        return np.empty(0, dtype=U64), np.zeros(n + 1, dtype=np.int64)

    flat = _hash_token_runs(data, tpos, lens)

    # per-doc token counts: search the n+1 doc boundaries in the sorted
    # token-start array — (n+1)·log T, instead of the transposed
    # T·log n searchsorted + bincount (T ≈ 1000·n on code corpora)
    offsets = np.searchsorted(tpos, byte_offs, side="left")
    return flat, offsets


def _scatter_segments(dst: np.ndarray, dst_starts: np.ndarray,
                      src: np.ndarray, src_offs: np.ndarray) -> None:
    """Copy src segment i (src_offs[i]:src_offs[i+1]) into dst starting at
    dst_starts[i], fully vectorized (one repeat + one arange + one scatter)."""
    seg_lens = src_offs[1:] - src_offs[:-1]
    total = int(src_offs[-1])
    if total == 0:
        return
    seg_of = np.repeat(np.arange(len(seg_lens), dtype=np.int64), seg_lens)
    pos = np.arange(total, dtype=np.int64)
    dst[dst_starts[seg_of] + (pos - src_offs[:-1][seg_of])] = src


def _tokenize_hash_mixed(data: np.ndarray, offs: np.ndarray,
                         nonascii_doc_mask: np.ndarray,
                         lowercase: bool, words_only: bool):
    """Per-doc routed tokenizer for batches where only SOME docs contain
    non-ASCII bytes (the common real-corpus shape: a few docs with unicode
    punctuation would otherwise send the whole batch to the regex fallback
    — measured as ~60% of flagship wall on the bench corpus, where 4.8% of
    docs carry em-dashes). ASCII docs keep the vectorized byte path; only
    the non-ASCII docs pay the (vectorized) unicode path; outputs merge
    back in doc order."""
    n = len(offs) - 1
    doc_lens = offs[1:] - offs[:-1]
    ascii_mask = ~nonascii_doc_mask
    keep = np.repeat(ascii_mask, doc_lens)
    a_data = np.ascontiguousarray(data[keep])
    a_offs = np.zeros(int(ascii_mask.sum()) + 1, dtype=np.int64)
    np.cumsum(doc_lens[ascii_mask], out=a_offs[1:])
    a_flat, a_toffs = _tokenize_hash_ascii(a_offs, a_data, lowercase,
                                           words_only)
    na_idx = np.nonzero(nonascii_doc_mask)[0]
    texts = [bytes(data[offs[d]:offs[d + 1]]).decode("utf-8", "surrogatepass")
             for d in na_idx]
    na_flat, na_toffs = _tokenize_hash_unicode(texts, lowercase, words_only)
    counts = np.empty(n, dtype=np.int64)
    counts[ascii_mask] = a_toffs[1:] - a_toffs[:-1]
    counts[na_idx] = na_toffs[1:] - na_toffs[:-1]
    out_offs = np.zeros(n + 1, dtype=np.int64)
    np.cumsum(counts, out=out_offs[1:])
    flat = np.empty(int(out_offs[-1]), dtype=U64)
    _scatter_segments(flat, out_offs[:-1][ascii_mask], a_flat, a_toffs)
    _scatter_segments(flat, out_offs[:-1][na_idx], na_flat, na_toffs)
    return flat, out_offs


def _nonascii_doc_mask(data: np.ndarray, offs: np.ndarray) -> np.ndarray:
    """bool[n]: which docs contain any byte >= 128."""
    mask = np.zeros(len(offs) - 1, dtype=bool)
    pos = np.nonzero(data >= 128)[0]
    if len(pos):
        mask[np.unique(np.searchsorted(offs, pos, side="right") - 1)] = True
    return mask


def tokenize_hash_batch(texts, lowercase: bool = False,
                        words_only: bool = False):
    """Tokenize a batch of documents and map tokens to stable uint64 hashes.

    Returns (flat_hashes uint64[T], doc_offsets int64[n+1]) where
    flat_hashes[doc_offsets[i]:doc_offsets[i+1]] are doc i's token hashes in
    order. ASCII docs take the vectorized byte path; non-ASCII docs take the
    regex path per doc (identical hash values by the shared spec)."""
    n = len(texts)
    if n == 0:
        return np.empty(0, dtype=U64), np.zeros(1, dtype=np.int64)
    strs = [("" if t is None else t) for t in texts]
    if all(s.isascii() for s in strs):
        encoded = [s.encode("ascii") for s in strs]
    else:
        encoded = [s.encode("utf-8", "surrogatepass") for s in strs]
    lens = np.fromiter((len(b) for b in encoded), dtype=np.int64, count=n)
    byte_offs = np.zeros(n + 1, dtype=np.int64)
    np.cumsum(lens, out=byte_offs[1:])
    data = np.frombuffer(b"".join(encoded), dtype=np.uint8)
    na = _nonascii_doc_mask(data, byte_offs)
    if na.any():
        return _tokenize_hash_mixed(data, byte_offs, na, lowercase,
                                    words_only)
    return _tokenize_hash_ascii(byte_offs, data, lowercase, words_only)


def tokenize_hash_arrow(col, lowercase: bool = False,
                        words_only: bool = False):
    """Zero-copy variant: (large_)string column -> (flat_hashes, doc_offsets)
    straight from the Arrow buffers when the batch is pure ASCII."""
    import pyarrow as pa
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    bufs = col.buffers()
    off_dtype = np.int64 if pa.types.is_large_string(col.type) else np.int32
    offs = np.frombuffer(bufs[1], dtype=off_dtype)[
        col.offset: col.offset + len(col) + 1].astype(np.int64)
    data = np.frombuffer(bufs[2], dtype=np.uint8) if bufs[2] is not None \
        else np.empty(0, np.uint8)
    data = data[offs[0]:offs[-1]]
    offs = offs - offs[0]
    if len(data) and data.max() >= 128:
        na = _nonascii_doc_mask(data, offs)
        return _tokenize_hash_mixed(data, offs, na, lowercase, words_only)
    return _tokenize_hash_ascii(offs, data, lowercase, words_only)


def shingle_hashes(flat_hashes: np.ndarray, doc_offsets: np.ndarray, k: int):
    """k-gram shingle hashes per doc, fully vectorized across the batch.

    For a doc with L tokens: L >= k -> L-k+1 window hashes; 0 < L < k -> one
    hash over all L tokens (so short files still participate); L == 0 -> none.

    Returns (shingles uint64[S], sh_offsets int64[n+1]).
    """
    n = len(doc_offsets) - 1
    starts = doc_offsets[:-1]
    ends = doc_offsets[1:]
    lens = ends - starts
    counts = np.maximum(lens - k + 1, 0)
    short = (lens > 0) & (lens < k)
    counts = np.where(short, 1, counts)
    sh_offsets = np.zeros(n + 1, dtype=np.int64)
    np.cumsum(counts, out=sh_offsets[1:])
    S = int(sh_offsets[-1])
    out = np.empty(S, dtype=U64)
    if S == 0:
        return out, sh_offsets

    # window-start indices into flat_hashes for all full windows, batchwide:
    # for each doc, starts[i] .. starts[i]+counts[i]-1 (short docs: just starts[i])
    reps = counts.astype(np.int64)
    doc_idx = np.repeat(np.arange(n, dtype=np.int64), reps)
    within = np.arange(S, dtype=np.int64) - sh_offsets[doc_idx]
    win_start = starts[doc_idx] + within

    P = U64(0x100000001B3)  # FNV-ish odd multiplier for the poly roll
    T = len(flat_hashes)
    if T >= k:
        # roll the poly hash over EVERY position of the flat token array
        # with CONTIGUOUS slices (no per-window gather), then select the
        # valid window starts per doc with one gather. Short docs (L < k,
        # whose single window would cross doc boundaries in acc_all) are
        # excluded from the gather and handled below — previously ANY short
        # doc in the batch sent every window through a k-pass masked
        # gather.
        with np.errstate(over="ignore"):
            acc_all = np.zeros(T - k + 1, dtype=U64)
            for j in range(k):
                acc_all = acc_all * P + flat_hashes[j: T - k + 1 + j]
        if short.any():
            sel = ~short[doc_idx]
            out[sel] = splitmix64(acc_all[win_start[sel]])
        else:
            out[:] = splitmix64(acc_all[win_start])
            return out, sh_offsets

    # short docs: poly-hash their whole token run, vectorized across docs
    # (at most k-1 masked passes)
    short_docs = np.nonzero(short)[0]
    if len(short_docs):
        s_starts = starts[short_docs]
        s_lens = lens[short_docs]
        acc = np.zeros(len(short_docs), dtype=U64)
        with np.errstate(over="ignore"):
            for j in range(int(s_lens.max())):
                m = s_lens > j
                acc[m] = acc[m] * P + flat_hashes[s_starts[m] + j]
        out[sh_offsets[short_docs]] = splitmix64(acc)
    return out, sh_offsets


def segmented_unique(values: np.ndarray, offsets: np.ndarray):
    """Per-segment sorted-unique: each segment is a contiguous slice, so
    sort+dedup it in place of a batch-wide (segment, value) lexsort. The
    per-segment np.sort runs in cache and skips the lexsort's two stable
    O(S log S) merge passes — measured 18x faster on a 1.7M-shingle batch
    (560 ms -> 31 ms); the loop is per SEGMENT (<= batch_size iterations
    of pure-numpy slice/sort), not per value.

    values: uint64[S]; offsets: int64[n+1] segment boundaries.
    Returns (uflat uint64[U], uoffs int64[n+1]) with each segment's values
    sorted ascending and deduplicated."""
    n = len(offsets) - 1
    S = len(values)
    if S == 0:
        return np.empty(0, dtype=U64), np.zeros(n + 1, dtype=np.int64)
    out = np.empty(S, dtype=U64)
    uoffs = np.zeros(n + 1, dtype=np.int64)
    pos = 0
    for i in range(n):
        seg = np.sort(values[offsets[i]:offsets[i + 1]])
        m = len(seg)
        if m:
            keep = np.empty(m, dtype=bool)
            keep[0] = True
            np.not_equal(seg[1:], seg[:-1], out=keep[1:])
            u = seg[keep]
            out[pos:pos + len(u)] = u
            pos += len(u)
        uoffs[i + 1] = pos
    return out[:pos].copy(), uoffs


def segmented_intersection_sizes(flat: np.ndarray, offs: np.ndarray,
                                 ia: np.ndarray, ib: np.ndarray
                                 ) -> np.ndarray:
    """For pairs of UNIQUE-value segments (rows ia[i], ib[i] of the ragged
    array flat/offs), the intersection size of each pair. Single-address-
    space convenience wrapper over segmented_intersection_sizes2."""
    return segmented_intersection_sizes2(flat, offs, ia, flat, offs, ib)


def segmented_intersection_sizes2(flat_a: np.ndarray, offs_a: np.ndarray,
                                  ia: np.ndarray,
                                  flat_b: np.ndarray, offs_b: np.ndarray,
                                  ib: np.ndarray) -> np.ndarray:
    """Two-address-space variant: side A's segments live in flat_a/offs_a,
    side B's in flat_b/offs_b (they may be the same arrays). Lets the
    sharded broadcast-verify path intersect rows of two independent shard
    payloads without concatenating them into one array first.

    Since each side is duplicate-free, a value appearing twice within one
    pair's combined run means it is present in both sets — so sort each
    pair's combined run and count adjacent equals. The per-pair np.sort
    runs in cache and replaces a batch-wide (pair, value) lexsort over the
    gathered runs, measured 14x faster on a 1024-pair verify batch
    (251 ms -> 17 ms); the loop is per PAIR (pure-numpy gather/sort), not
    per value."""
    m = len(ia)
    if m == 0:
        return np.empty(0, dtype=np.int64)
    out = np.zeros(m, dtype=np.int64)
    for i in range(m):
        a = flat_a[offs_a[ia[i]]:offs_a[ia[i] + 1]]
        b = flat_b[offs_b[ib[i]]:offs_b[ib[i] + 1]]
        if len(a) == 0 or len(b) == 0:
            continue
        c = np.sort(np.concatenate([a, b]))
        out[i] = np.count_nonzero(c[1:] == c[:-1])
    return out


SENTINEL64 = np.iinfo(np.uint64).max


def minhash_signatures(shingles: np.ndarray, sh_offsets: np.ndarray,
                       perm_seeds: np.ndarray, row_chunk: int = 0):
    """(n, P) uint64 MinHash signatures via One-Permutation Hashing (OPH)
    with rotation densification (public algorithm: Li, Owen, Zhang 2012;
    Shrivastava 2017 densification) — O(S + P) per doc instead of the
    classic O(S * P) per-permutation construction, which dominated the
    signature stage's profile.

    Bin = top log2(P) bits of the (already splitmix-mixed) shingle hash;
    value = the hash itself; sig[bin] = min over the doc's shingles in that
    bin; empty bins borrow cyclically from the nearest filled bin to the
    left (deterministic, so two docs sharing filled bins densify alike).
    Docs with zero shingles keep the all-sentinel signature; callers filter.

    perm_seeds is retained for config compatibility (P = len(perm_seeds));
    determinism comes from the shingle hashing itself.
    """
    n = len(sh_offsets) - 1
    P = len(perm_seeds)
    assert P & (P - 1) == 0, "num_perm must be a power of two for OPH"
    sig = np.full((n, P), SENTINEL64, dtype=U64)
    if len(shingles) == 0 or n == 0:
        return sig
    counts = (sh_offsets[1:] - sh_offsets[:-1]).astype(np.int64)
    doc_idx = np.repeat(np.arange(n, dtype=np.int64), counts)
    shift = U64(64 - int(np.log2(P)))
    bins = (shingles >> shift).astype(np.int64)
    flat_idx = doc_idx * P + bins
    # segment-min via sort + reduceat (ufunc.at is orders slower)
    order = np.argsort(flat_idx, kind="stable")
    fi = flat_idx[order]
    v = shingles[order]
    starts = np.nonzero(np.r_[True, fi[1:] != fi[:-1]])[0]
    mins = np.minimum.reduceat(v, starts)
    sig.ravel()[fi[starts]] = mins

    return _densify_rotate(sig, P)


def _densify_rotate(sig: np.ndarray, P: int) -> np.ndarray:
    """Rotation densification: nearest filled bin to the left, cyclic —
    double-width cummax over filled positions, fully vectorized."""
    filled = sig != SENTINEL64
    any_filled = filled.any(axis=1)
    if filled.all():
        return sig
    pos = np.arange(2 * P, dtype=np.int64)
    filled2 = np.where(np.concatenate([filled, filled], axis=1),
                       pos[None, :], -1)
    src_pos = np.maximum.accumulate(filled2, axis=1)[:, P:]
    src_bin = np.where(src_pos >= 0, src_pos % P, 0)
    borrowed = np.take_along_axis(sig, src_bin, axis=1)
    need = (~filled) & (src_pos >= 0) & any_filled[:, None]
    sig = np.where(need, borrowed, sig)
    return sig


def minhash_from_sorted_unique(uflat: np.ndarray, uoffs: np.ndarray,
                               num_perm: int) -> np.ndarray:
    """OPH MinHash signatures straight from per-doc SORTED-unique shingle
    arrays (segmented_unique output) — value-IDENTICAL to
    minhash_signatures on the raw stream, with NO sort at all: the OPH bin
    is the top log2(P) bits of the hash, so value-ascending order is also
    bin-ascending, and the FIRST value of each (doc, bin) run is that
    bin's minimum. This folds the signature stage's two overlapping
    lexsorts (unique + per-bin argsort) into the single unique sort."""
    n = len(uoffs) - 1
    P = num_perm
    assert P & (P - 1) == 0, "num_perm must be a power of two for OPH"
    sig = np.full((n, P), SENTINEL64, dtype=U64)
    if len(uflat) == 0 or n == 0:
        return sig
    counts = (uoffs[1:] - uoffs[:-1]).astype(np.int64)
    doc_idx = np.repeat(np.arange(n, dtype=np.int64), counts)
    shift = U64(64 - int(np.log2(P)))
    bins = (uflat >> shift).astype(np.int64)
    fi = doc_idx * P + bins              # nondecreasing by construction
    starts = np.nonzero(np.r_[True, fi[1:] != fi[:-1]])[0]
    sig.ravel()[fi[starts]] = uflat[starts]
    return _densify_rotate(sig, P)


def perm_seeds(num_perm: int, seed: int) -> np.ndarray:
    rng = np.random.default_rng(seed)
    return rng.integers(1, np.iinfo(np.uint64).max, size=num_perm, dtype=U64)


def band_hashes(sig: np.ndarray, bands: int, rows: int) -> np.ndarray:
    """(n, bands) uint64 band keys; band index is mixed into the key so the
    same row-values in different bands never collide."""
    n, P = sig.shape
    assert P == bands * rows
    s = sig.reshape(n, bands, rows)
    Pm = U64(0x100000001B3)
    with np.errstate(over="ignore"):
        acc = np.zeros((n, bands), dtype=U64)
        for j in range(rows):
            acc = acc * Pm + s[:, :, j]
        acc ^= splitmix64(np.arange(bands, dtype=U64))[None, :]
    return splitmix64(acc)


def simhash64(shingles: np.ndarray, sh_offsets: np.ndarray) -> np.ndarray:
    """64-bit SimHash per doc: majority vote over shingle-hash bits.
    Docs with zero shingles get 0."""
    n = len(sh_offsets) - 1
    out = np.zeros(n, dtype=U64)
    if len(shingles) == 0:
        return out
    # bit plane via unpackbits on the little-endian byte view: one C call
    # producing uint8[S, 64] with column j = bit j of the hash — replaces
    # a shift-broadcast that materialized an int32[S, 64] (4x the bytes,
    # ~28x slower measured on a 1.7M-shingle batch)
    le = np.ascontiguousarray(shingles).astype("<u8", copy=False)
    bits = np.unpackbits(le.view(np.uint8).reshape(-1, 8),
                         axis=1, bitorder="little")
    offs = sh_offsets[:-1].astype(np.int64)
    counts = (sh_offsets[1:] - sh_offsets[:-1]).astype(np.int64)
    nonempty = counts > 0
    ne = np.nonzero(nonempty)[0]
    if len(ne) == 0:
        return out
    # reduceat over NONEMPTY segment starts only: empty segments occupy zero
    # flat rows, so consecutive nonempty starts exactly tile `bits` (strictly
    # increasing, first start 0, last segment runs to the end). Clamping ALL
    # starts into range instead (the previous approach) shifted a trailing
    # empty doc's boundary from S to S-1 and stole the final shingle row out
    # of the preceding doc's bit-vote segment.
    sums = np.add.reduceat(bits, offs[ne], axis=0, dtype=np.int64)
    maj = (2 * sums) > counts[ne, None]
    vals = np.packbits(maj, axis=1, bitorder="little").copy() \
        .view("<u8").ravel().astype(U64)
    out[ne] = vals
    return out


def hamming64(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """Vectorized popcount of XOR for uint64 arrays."""
    x = (a ^ b).view(np.uint64)
    return np.unpackbits(x.view(np.uint8).reshape(-1, 8), axis=1).sum(axis=1)


def est_jaccard(sig_a: np.ndarray, sig_b: np.ndarray) -> np.ndarray:
    """Estimated Jaccard = fraction of equal MinHash coordinates. (n,P)x(n,P)->(n,)"""
    return (sig_a == sig_b).mean(axis=1)


def exact_jaccard_sets(sh_a: np.ndarray, sh_b: np.ndarray) -> float:
    """Exact Jaccard of two shingle multisets treated as sets."""
    a = np.unique(sh_a)
    b = np.unique(sh_b)
    if len(a) == 0 and len(b) == 0:
        return 1.0
    inter = len(np.intersect1d(a, b, assume_unique=True))
    return inter / (len(a) + len(b) - inter)


def clip01(x: np.ndarray) -> np.ndarray:
    """Score clipping (reference: selfclean_cleaner.py:147-149)."""
    return np.clip(x, 0.0, 1.0)
