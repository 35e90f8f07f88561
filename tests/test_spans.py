"""Duplicated n-gram span gates (stages/ngramspans.py, ExactSubstr
semantics): engine output must equal a brute-force Python oracle exactly,
on the driver path, the multi-block path, and the forced distributed
boundary/groupby fallbacks."""

import numpy as np
import pyarrow as pa
import ray.data as rd

from raydedup.stages import ngramspans as NG


def _brute_spans(texts, ids, k):
    from collections import Counter
    c = Counter()
    for t in texts:
        for i in range(max(len(t) - k + 1, 0)):
            c[t[i:i + k]] += 1
    spans = []
    for t, d in zip(texts, ids):
        cur = None
        for p in range(max(len(t) - k + 1, 0)):
            if c[t[p:p + k]] < 2:
                continue
            if cur and p <= cur[1]:
                cur[1] = p + k
            else:
                if cur:
                    spans.append((d, cur[0], cur[1]))
                cur = [p, p + k]
        if cur:
            spans.append((d, cur[0], cur[1]))
    return sorted(spans)


def _engine_spans(texts, ids, k, blocks=1):
    tbl = pa.table({"doc_id": pa.array(ids, pa.int64()), "text": texts})
    ds = rd.from_arrow(tbl)
    if blocks > 1:
        ds = ds.repartition(blocks)
    df = NG.dup_ngram_spans(ds, k=k).to_pandas() \
        .sort_values(["doc_id", "span_start"])
    return [tuple(r) for r in df.values.tolist()]


_PASSAGE = "the quick brown fox jumps over the lazy dog SHARED PASSAGE !!"


def _fixture():
    texts = [
        "AAA" + _PASSAGE + "zq9",          # shares passage with doc 2
        "bbq" + _PASSAGE + "meow",
        "totally unrelated text with no repeats anywhere at all, none.",
        "x" * 60,                           # within-doc repetition
        "héllo wörld " + _PASSAGE,          # non-ASCII prefix: codepoint pos
        "sh",                               # shorter than k: no grams
    ]
    return texts, [1, 2, 3, 4, 5, 6]


def test_spans_match_brute_force_single_block():
    texts, ids = _fixture()
    assert _engine_spans(texts, ids, 20) == _brute_spans(texts, ids, 20)


def test_spans_match_brute_force_multi_block():
    texts, ids = _fixture()
    assert _engine_spans(texts, ids, 20, blocks=5) == \
        _brute_spans(texts, ids, 20)


def test_spans_non_ascii_positions_are_codepoints():
    texts, ids = _fixture()
    got = {d: (a, b) for d, a, b in _engine_spans(texts, ids, 20)}
    # doc 5's passage starts after the 12-codepoint prefix "héllo wörld "
    # (bytes would say 14); doc 1's after its 3-char prefix.
    assert got[5][0] - got[1][0] == 12 - 3


def test_spans_forced_distributed_fallbacks(monkeypatch):
    """DRIVER_SMALL_LIMIT=0 pushes the boundary-run finish into the
    groupby("skey") path and the span merge into groupby("id").map_groups;
    results must be identical to the driver path."""
    monkeypatch.setattr(NG, "DRIVER_SMALL_LIMIT", 0)
    texts, ids = _fixture()
    assert _engine_spans(texts, ids, 20, blocks=4) == \
        _brute_spans(texts, ids, 20)


def test_spans_random_corpus_property():
    """Seeded random corpus with planted cross-doc and within-doc repeats:
    exact equality with the brute-force oracle at a small k."""
    rng = np.random.default_rng(7)
    alpha = np.array(list("abcdefg "))
    texts, ids = [], []
    shared = "".join(rng.choice(alpha, 30))
    for i in range(40):
        t = "".join(rng.choice(alpha, int(rng.integers(15, 80))))
        if i % 7 == 0:
            t = t[:5] + shared + t[5:]
        texts.append(t)
        ids.append(100 + i)
    k = 12
    assert _engine_spans(texts, ids, k, blocks=6) == \
        _brute_spans(texts, ids, k)


def test_winnowed_spans_recall_and_soundness():
    """Scale path (winnow=w): every maximal pairwise-shared substring of
    length >= k + w - 1 must be reported with edges trimmed by < w (MOSS
    guarantee — the fixture's spans are single shared passages, so the
    per-span check is exactly that), and every reported span must lie
    inside a true region (winnowing only drops sites, never invents
    them)."""
    texts, ids = _fixture()
    k, w = 20, 6
    exact = _brute_spans(texts, ids, k)
    tbl = pa.table({"doc_id": pa.array(ids, pa.int64()), "text": texts})
    for blocks in (1, 5):
        ds = rd.from_arrow(tbl)
        if blocks > 1:
            ds = ds.repartition(blocks)
        df = NG.dup_ngram_spans(ds, k=k, winnow=w).to_pandas()
        got = [tuple(r) for r in
               df.sort_values(["doc_id", "span_start"]).values.tolist()]
        # recall: every exact span of length >= k + w - 1 is covered
        for d, a, b in exact:
            if b - a < k + w - 1:
                continue
            cover = [(ga, gb) for gd, ga, gb in got if gd == d
                     and ga < b and gb > a]
            assert cover, (d, a, b, got)
            lo = min(c[0] for c in cover)
            hi = max(c[1] for c in cover)
            assert lo - a < w and b - hi < w, (d, a, b, lo, hi)
        # soundness: every winnowed span sits inside some exact span
        for d, a, b in got:
            assert any(gd == d and a >= ea and b <= eb
                       for gd, ea, eb in exact), (d, a, b, exact)


def test_winnowed_selection_invariant_to_block_layout():
    """The winnow mask is computed per doc (sentinel padding): the emitted
    fingerprint set must not depend on how docs are batched."""
    texts, ids = _fixture()
    k, w = 20, 4
    tbl = pa.table({"doc_id": pa.array(ids, pa.int64()), "text": texts})

    def rows(blocks):
        ds = rd.from_arrow(tbl)
        if blocks > 1:
            ds = ds.repartition(blocks)
        df = NG.gram_rows(ds, k, winnow=w).to_pandas()
        return sorted(map(tuple, df.values.tolist()))

    assert rows(1) == rows(6)


def test_stats_equal_span_widths():
    texts, ids = _fixture()
    tbl = pa.table({"doc_id": pa.array(ids, pa.int64()), "text": texts})
    st = NG.dup_ngram_stats(rd.from_arrow(tbl), k=20).to_pandas()
    exp = {}
    for d, a, b in _brute_spans(texts, ids, 20):
        exp[d] = exp.get(d, 0) + (b - a)
    assert dict(zip(st.doc_id, st.dup_chars)) == exp
