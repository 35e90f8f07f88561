"""Multimodal column plumbing: image/audio/video as opaque binary columns with
typed metadata; decode / feature-extract / resize / frame-sample as actor-pool
map_batches stages.

The decode libraries (PIL/ffmpeg/torchaudio) are NOT in this container, so the
codec step is gated: `DecodeImageActor(fake=True)` produces a deterministic
fake decode (seeded from the payload bytes) with the real schema, batch-size
and actor plumbing; `fake=False` raises NotImplementedError at the exact point
a real decoder would plug in. Everything Ray-side (schema, actor signature,
zero-copy batches, output layout) is real and tested.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa
import ray.data

MEDIA_SCHEMA = pa.schema([
    ("media_id", pa.int64()),
    ("kind", pa.string()),          # image | audio | video
    ("payload", pa.large_binary()),  # opaque encoded bytes
    ("mime", pa.string()),
    ("width", pa.int32()),          # -1 when unknown/not applicable
    ("height", pa.int32()),
    ("duration_ms", pa.int32()),
])


def synthesize_media(n: int, seed: int = 42) -> pa.Table:
    """Deterministic fake media table for tests/benches (payload = seeded
    pseudo-random bytes; no real codecs involved)."""
    rng = np.random.default_rng(seed)
    kinds = np.array(["image", "audio", "video"])[rng.integers(0, 3, n)]
    payloads = [rng.integers(0, 256, int(rng.integers(256, 4096)),
                             dtype=np.uint8).tobytes() for _ in range(n)]
    return pa.table({
        "media_id": pa.array(np.arange(n), pa.int64()),
        "kind": pa.array(kinds.tolist(), pa.string()),
        "payload": pa.array(payloads, pa.large_binary()),
        "mime": pa.array([f"application/x-fake-{k}" for k in kinds],
                         pa.string()),
        "width": pa.array(rng.integers(16, 512, n, dtype=np.int32), pa.int32()),
        "height": pa.array(rng.integers(16, 512, n, dtype=np.int32), pa.int32()),
        "duration_ms": pa.array(
            np.where(kinds == "image", -1,
                     rng.integers(100, 60_000, n)).astype(np.int32), pa.int32()),
    })


class DecodeImageActor:
    """Actor-pool stage: payload bytes -> fixed-size feature vector.

    Real path (fake=False) would do: PIL.Image.open -> RGB -> resize(target) ->
    np.asarray -> embed; stubbed per the container constraints. Fake path is a
    deterministic 64-dim feature from sha256(payload) so downstream stages
    (similarity search, dedup over features) are exercised end to end.
    """

    TARGET = (224, 224)
    FEAT_DIM = 64

    def __init__(self, fake: bool = True):
        self.fake = fake
        if not fake:
            raise NotImplementedError(
                "image decode requires PIL/torchvision, not present in this "
                "environment; construct with fake=True for the deterministic "
                "stub (real plumbing, fake pixels)")

    def __call__(self, batch: pa.Table) -> pa.Table:
        payloads = batch.column("payload").to_pylist()
        feats = np.empty((len(payloads), self.FEAT_DIM), dtype=np.float32)
        for i, p in enumerate(payloads):
            digest = hashlib.sha256(p or b"").digest()
            seed = int.from_bytes(digest[:8], "little")
            feats[i] = np.random.default_rng(seed).standard_normal(
                self.FEAT_DIM).astype(np.float32)
        flat = pa.array(feats.ravel(), pa.float32())
        offs = pa.array(np.arange(0, (len(payloads) + 1) * self.FEAT_DIM,
                                  self.FEAT_DIM, dtype=np.int32))
        return pa.table({
            "media_id": batch.column("media_id"),
            "feature": pa.ListArray.from_arrays(offs, flat),
        })


def decode_features(media: ray.data.Dataset, concurrency: int = 4,
                    batch_size: int = 64, fake: bool = True
                    ) -> ray.data.Dataset:
    """Actor-pool decode stage. Small batch_size on purpose: media payloads
    are wide binary rows — batch x concurrency must fit worker heap."""
    return media.map_batches(
        DecodeImageActor, fn_constructor_kwargs={"fake": fake},
        batch_format="pyarrow", batch_size=batch_size,
        concurrency=(1, concurrency), num_cpus=1)


def frame_sample(media: ray.data.Dataset, every_ms: int = 1000
                 ) -> ray.data.Dataset:
    """Video rows -> one row per sampled frame timestamp (plumbing only; the
    frame extraction itself would live in the decode actor)."""

    def fn(t: pa.Table) -> pa.Table:
        kinds = t.column("kind").to_pylist()
        durs = t.column("duration_ms").to_numpy(zero_copy_only=False)
        ids = t.column("media_id").to_numpy(zero_copy_only=False)
        out_id, out_ts = [], []
        for i, kind in enumerate(kinds):
            if kind != "video" or durs[i] <= 0:
                continue
            for ts in range(0, int(durs[i]), every_ms):
                out_id.append(int(ids[i])); out_ts.append(ts)
        return pa.table({"media_id": pa.array(out_id, pa.int64()),
                         "frame_ts_ms": pa.array(out_ts, pa.int32())})

    return media.map_batches(fn, batch_format="pyarrow")
