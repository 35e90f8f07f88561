"""Benchmark decontamination: flag training documents sharing word n-grams
with a held-out evaluation set.

The standard LLM training-data hygiene pass (n-gram overlap decontamination
as published for GPT-3, appendix C of Brown et al. 2020 arXiv:2005.14165,
and the Llama/FLAN replications): a training document is contaminated when
any of its word n-grams appears in any benchmark/eval document. The
reference has no such operator (SelfClean's pair plane is
selfclean/cleaner/selfclean_cleaner.py:121-146, within-corpus only); this
is one of the task brief's training-data-pipeline extensions.

Ray-Data-first shape — a broadcast SEMI-join, not a shuffle:
- eval side: tokenize (shared vectorized tokenizer, words_only+lowercase,
  stages/textstats.py semantics) -> strict word n-gram keys -> per-batch
  distinct -> ONE driver collect (capped, raises loudly when exceeded —
  eval sets are small by definition) -> np.unique -> `ray.put` once;
- train side: map_batches membership via np.searchsorted against the
  broadcast sorted key array — zero-copy from the object store in every
  task, no per-batch re-ship, no all-to-all.

Gram identity is the engine's polynomial hash over token hashes
(kernels.shingle_hashes — the same key family gating near_dup_pairs_exact
against string shingles); the SQL oracle joins on the gram STRING, so a
hash collision surfaces as a driver mismatch rather than passing silently.

Strictness: shingle_hashes gives docs shorter than n tokens one backstop
gram (MinHash wants every doc represented); decontamination must NOT —
a 3-token doc has no 5-grams — so those backstop grams are dropped here.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray
import ray.data

from raydedup import kernels as K

_OUT_SCHEMA = pa.schema([("doc_id", pa.int64()), ("n_grams", pa.int64()),
                         ("n_hit", pa.int64())])


def _strict_grams(col, n: int):
    """Arrow string column -> (gram keys uint64[G], offs int64[rows+1])
    with STRICT n-gram semantics (docs with < n tokens contribute none)."""
    flat, offs = K.tokenize_hash_arrow(col, lowercase=True, words_only=True)
    grams, goffs = K.shingle_hashes(flat, offs, n)
    lens = np.diff(offs)
    short = (lens > 0) & (lens < n)
    if short.any():
        counts = np.diff(goffs)
        keep = np.repeat(~short, counts)
        grams = grams[keep]
        counts = np.where(short, 0, counts)
        goffs = np.zeros(len(counts) + 1, np.int64)
        np.cumsum(counts, out=goffs[1:])
    return grams, goffs


def eval_gram_keys(eval_ds: ray.data.Dataset, n: int = 5,
                   text_col: str = "text",
                   max_grams: int = 50_000_000) -> np.ndarray:
    """Distinct word n-gram keys of the eval corpus, sorted ascending.

    Per-batch distinct partials stream to the driver; the collect is capped
    at `max_grams` keys (400 MB at the default) and RAISES when exceeded —
    never a silent truncation. An eval set that large should be flagged to
    the operator, not half-checked."""

    def partial(t: pa.Table) -> pa.Table:
        g, _ = _strict_grams(t.column(text_col), n)
        return pa.table({"g": pa.array(np.unique(g).view(np.int64),
                                       pa.int64())})

    parts = eval_ds.map_batches(partial, batch_format="pyarrow")
    chunks = []
    total = 0
    for b in parts.iter_batches(batch_format="pyarrow", batch_size=1 << 20):
        if b.num_rows == 0:
            continue
        total += b.num_rows
        if total > max_grams:
            raise ValueError(
                f"eval gram set exceeds max_grams={max_grams}; raise the "
                f"cap or shard the eval corpus — refusing to decontaminate "
                f"against a truncated benchmark set")
        chunks.append(b.column("g").to_numpy(zero_copy_only=False))
    if not chunks:
        return np.empty(0, np.uint64)
    return np.unique(np.concatenate(chunks).astype(np.int64)
                     .view(np.uint64))


def decontaminate(train_ds: ray.data.Dataset, eval_keys: np.ndarray,
                  n: int = 5, text_col: str = "text",
                  id_col: str = "doc_id",
                  only_contaminated: bool = True) -> ray.data.Dataset:
    """-> (doc_id, n_grams, n_hit): per training doc, its distinct word
    n-gram count and how many of those appear in the eval set; rows with
    n_hit == 0 are dropped unless only_contaminated=False."""
    keys_ref = ray.put(np.ascontiguousarray(eval_keys))

    def fn(t: pa.Table) -> pa.Table:
        ev = ray.get(keys_ref)
        g, goffs = _strict_grams(t.column(text_col), n)
        uflat, uoffs = K.segmented_unique(g, goffs)
        if len(uflat) and len(ev):
            pos = np.searchsorted(ev, uflat)
            pos_safe = np.minimum(pos, len(ev) - 1)
            hit = (ev[pos_safe] == uflat).astype(np.int64)
        else:
            hit = np.zeros(len(uflat), np.int64)
        c = np.r_[np.int64(0), np.cumsum(hit)]
        n_hit = c[uoffs[1:]] - c[uoffs[:-1]]
        n_grams = np.diff(uoffs)
        did = t.column(id_col).cast(pa.int64()).to_numpy(
            zero_copy_only=False)
        if only_contaminated:
            m = n_hit > 0
            did, n_grams, n_hit = did[m], n_grams[m], n_hit[m]
        return pa.table({
            "doc_id": pa.array(did, pa.int64()),
            "n_grams": pa.array(n_grams, pa.int64()),
            "n_hit": pa.array(n_hit, pa.int64()),
        })

    return train_ds.map_batches(fn, batch_format="pyarrow")
