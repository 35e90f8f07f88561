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


def read_code_files(path: str) -> ray.data.Dataset:
    """Column-pruned parquet read of the input_hint table."""
    return ray.data.read_parquet(path, columns=INPUT_COLUMNS)


def _ingest_batch(batch: pa.Table) -> pa.Table:
    repos = batch.column("repo").to_pylist()
    paths = batch.column("path").to_pylist()
    commits = batch.column("commit").to_pylist()
    contents = batch.column("content").to_pylist()
    ids = K.row_ids(repos, paths, commits)
    sha = K.sha256_hex(contents)
    n_bytes = pc.binary_length(pc.cast(batch.column("content"), pa.large_binary()))
    out = batch
    if "id" not in out.column_names:
        out = out.append_column("id", pa.array(ids, pa.int64()))
    out = out.append_column("content_sha256", pa.array(sha, pa.string()))
    out = out.append_column("n_bytes", pc.cast(n_bytes, pa.int64()))
    return out


def ingest(ds: ray.data.Dataset) -> ray.data.Dataset:
    """Attach id + content_sha256 + n_bytes. Stateless tasks, Arrow batches."""
    return ds.map_batches(_ingest_batch, batch_format="pyarrow")


def documents_as_code_files(sf_dir: str) -> ray.data.Dataset:
    """Map the driver `documents` table (doc_id,text,lang,source,n_chars) onto
    the input_hint shape, keeping id = doc_id so SQL oracles can key on it."""
    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                               columns=["doc_id", "text", "lang", "source"])

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
