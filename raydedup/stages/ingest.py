"""Ingest stage: read the (repo,path,commit,lang,content) Parquet table, attach
row identity + the content_sha256 invariant.

Reference analog: run_on_image_folder / run_on_dataset read paths
(selfclean/cleaner/selfclean.py:127-217). Ray-Data-first: a pruned
read_parquet followed by one stateless vectorized map_batches.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray.data

from raydedup import kernels as K

INPUT_COLUMNS = ["repo", "path", "commit", "lang", "content"]


def read_code_files(path: str,
                    num_blocks: int | None = None) -> ray.data.Dataset:
    """Column-pruned parquet read of the input_hint table.

    num_blocks sizes the read tasks at the SOURCE (override_num_blocks) so
    the pipeline can skip its content repartition barrier entirely: the read
    then fuses with ingest+signatures into one streaming task chain and the
    raw content column never lands in the object store (measured: the
    repartition exchange alone moved 2x the content bytes through /dev/shm,
    whose concurrent page-fault path is the host's scaling bottleneck)."""
    if num_blocks is not None:
        return ray.data.read_parquet(path, columns=INPUT_COLUMNS,
                                     override_num_blocks=num_blocks)
    return ray.data.read_parquet(path, columns=INPUT_COLUMNS)


def _hash_rows(col: pa.Array, algo) -> list:
    """Per-row digest hexdigests straight from the Arrow value buffer
    (UTF-8 bytes — the exact content bytes, no Python string round-trip).
    Null rows yield None."""
    import hashlib

    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    bufs = col.buffers()
    off_dtype = "int64" if (pa.types.is_large_string(col.type)
                            or pa.types.is_large_binary(col.type)) \
        else "int32"
    offs = np.frombuffer(bufs[1], dtype=off_dtype)[
        col.offset: col.offset + len(col) + 1].astype(np.int64)
    mv = memoryview(bufs[2]) if bufs[2] is not None else memoryview(b"")
    nulls = col.is_null().to_numpy(zero_copy_only=False) \
        if col.null_count else None
    out = []
    for i in range(len(col)):
        if nulls is not None and nulls[i]:
            out.append(None)
        else:
            out.append(algo(mv[offs[i]:offs[i + 1]]).hexdigest())
    return out


def _attach_id(batch: pa.Table) -> pa.Table:
    """Attach row identity when absent: 63-bit blake2b of
    repo \\x00 path \\x00 commit."""
    import hashlib

    if "id" in batch.column_names:
        return batch
    joined = pc.binary_join_element_wise(
        pc.cast(batch.column("repo"), pa.string()),
        pc.cast(batch.column("path"), pa.string()),
        pc.cast(batch.column("commit"), pa.string()), "\x00")
    jcol = joined.combine_chunks() \
        if isinstance(joined, pa.ChunkedArray) else joined
    bufs = jcol.buffers()
    offs = np.frombuffer(bufs[1], dtype="int32")[
        jcol.offset: jcol.offset + len(jcol) + 1].astype(np.int64)
    mv = memoryview(bufs[2]) if bufs[2] is not None else memoryview(b"")
    digests = b"".join(
        hashlib.blake2b(mv[offs[i]:offs[i + 1]], digest_size=8).digest()
        for i in range(len(jcol)))
    ids = (np.frombuffer(digests, dtype="<u8") & np.uint64(K.MASK63)) \
        .astype(np.int64)
    return batch.append_column("id", pa.array(ids, pa.int64()))


def _ingest_batch(batch: pa.Table) -> pa.Table:
    import hashlib

    content = batch.column("content")
    sha = _hash_rows(content, hashlib.sha256)
    n_bytes = pc.binary_length(pc.cast(content, pa.large_binary()))
    out = _attach_id(batch)
    out = out.append_column("content_sha256", pa.array(sha, pa.string()))
    out = out.append_column("n_bytes", pc.cast(n_bytes, pa.int64()))
    return out


def ingest(ds: ray.data.Dataset) -> ray.data.Dataset:
    """Attach id + content_sha256 + n_bytes. Stateless tasks, Arrow batches."""
    return ds.map_batches(_ingest_batch, batch_format="pyarrow")


def ids_and_content(ds: ray.data.Dataset) -> ray.data.Dataset:
    """(id, content) projection of the raw input — the verify-time shingle
    source for lean signature runs. Attaches the same blake2b row identity
    as ingest but SKIPS the sha256 content digest (the expensive per-row
    hash), since the shingle recompute only needs id + content."""

    def fn(batch: pa.Table) -> pa.Table:
        return _attach_id(batch).select(["id", "content"])

    return ds.map_batches(fn, batch_format="pyarrow")


def docs_to_code(ds: ray.data.Dataset) -> ray.data.Dataset:
    """Map a documents-shaped Dataset (doc_id,text,lang,source) onto the
    input_hint shape, keeping id = doc_id so SQL oracles can key on it."""

    def to_code(batch: pa.Table) -> pa.Table:
        return pa.table({
            "id": pc.cast(batch.column("doc_id"), pa.int64()),
            "repo": batch.column("source"),
            "path": pc.cast(batch.column("doc_id"), pa.string()),
            "commit": pa.array([""] * batch.num_rows, pa.string()),
            "lang": batch.column("lang"),
            "content": pc.cast(batch.column("text"), pa.large_string()),
        })

    return ds.map_batches(to_code, batch_format="pyarrow")


def documents_as_code_files(sf_dir: str) -> ray.data.Dataset:
    """docs_to_code over the driver `documents` parquet table."""
    return docs_to_code(ray.data.read_parquet(
        f"{sf_dir}/documents.parquet",
        columns=["doc_id", "text", "lang", "source"]))
