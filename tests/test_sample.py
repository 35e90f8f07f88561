"""Deterministic hash sampling (stages/sample.py): reproducibility across
partitioning, nesting composability, salt independence, rate accuracy."""

import numpy as np
import pyarrow as pa
import pytest
import ray.data

from raydedup.stages.sample import hash_sample


def _t(n=20000):
    return pa.table({"doc_id": pa.array(np.arange(n), pa.int64())})


def _ids(ds):
    return set(ds.to_pandas().doc_id)


def test_sample_partition_invariant_and_rate(ray_session):
    t = _t()
    whole = _ids(hash_sample(ray.data.from_arrow(t), keep_lt=100))
    chunked = ray.data.from_arrow(
        [t.slice(i * 977, 977) for i in range((t.num_rows + 976) // 977)])
    assert _ids(hash_sample(chunked, keep_lt=100)) == whole
    assert 0.08 < len(whole) / t.num_rows < 0.12


def test_sample_nesting_composes(ray_session):
    ds = ray.data.from_arrow(_t())
    ten = _ids(hash_sample(ds, keep_lt=100))
    ten_of_fifty = _ids(hash_sample(hash_sample(ds, keep_lt=500),
                                    keep_lt=100))
    assert ten_of_fifty == ten          # nested thresholds, same salt


def test_sample_salt_changes_set(ray_session):
    ds = ray.data.from_arrow(_t())
    a = _ids(hash_sample(ds, keep_lt=100, salt=0))
    b = _ids(hash_sample(ds, keep_lt=100, salt=12345))
    assert a != b
    assert 0.08 < len(b) / 20000 < 0.12


def test_sample_bounds_validated(ray_session):
    with pytest.raises(ValueError):
        hash_sample(ray.data.from_arrow(_t(10)), keep_lt=2000, mod=1000)
