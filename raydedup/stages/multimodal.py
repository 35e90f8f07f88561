"""Multimodal column plumbing: image/audio/video as opaque binary columns with
typed metadata; decode / feature-extract / resize / frame-sample as actor-pool
map_batches stages.

The decode path is REAL for PPM/PGM/BMP payloads (pure-numpy codecs in
raydedup.codecs: parse -> bilinear resize -> 64-dim visual descriptor); only
compressed codecs (JPEG/PNG/video frames) are gated behind
NotImplementedError because PIL/ffmpeg are not in this container.
`DecodeImageActor(fake=True)` remains available as a deterministic
payload-seeded stub for payloads with no decodable format at all.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa
import ray.data

from raydedup import codecs

MEDIA_SCHEMA = pa.schema([
    ("media_id", pa.int64()),
    ("kind", pa.string()),          # image | audio | video
    ("payload", pa.large_binary()),  # opaque encoded bytes
    ("mime", pa.string()),
    ("width", pa.int32()),          # -1 when unknown/not applicable
    ("height", pa.int32()),
    ("duration_ms", pa.int32()),
])


def synthesize_media(n: int, seed: int = 42,
                     real_images: bool = False) -> pa.Table:
    """Deterministic media table for tests/benches.

    real_images=False: payload = seeded pseudo-random bytes (opaque blobs for
    plumbing tests). real_images=True: every row is an ACTUAL encoded image
    (alternating PPM/BMP from codecs.synthesize_image) so the real decode
    path runs end to end with correct width/height metadata."""
    rng = np.random.default_rng(seed)
    if real_images:
        rows = [codecs.synthesize_image(i, seed,
                                        "ppm" if i % 2 == 0 else "bmp")
                for i in range(n)]
        return pa.table({
            "media_id": pa.array(np.arange(n), pa.int64()),
            "kind": pa.array(["image"] * n, pa.string()),
            "payload": pa.array([r[0] for r in rows], pa.large_binary()),
            "mime": pa.array([r[1] for r in rows], pa.string()),
            "width": pa.array([r[2] for r in rows], pa.int32()),
            "height": pa.array([r[3] for r in rows], pa.int32()),
            "duration_ms": pa.array([-1] * n, pa.int32()),
        })
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

    Real path (fake=False): codecs.decode_image (PPM/PGM/BMP, pure numpy) ->
    bilinear resize -> codecs.image_features 64-dim descriptor, per row.
    Per-row iteration is irreducible here (each payload has its own
    dimensions), but all per-image work is vectorized numpy.

    Fake path (fake=True) is a deterministic 64-dim feature from
    sha256(payload) for media with undecodable/absent formats so downstream
    stages (similarity search, dedup over features) still run end to end.
    """

    TARGET = codecs.TARGET
    FEAT_DIM = codecs.FEAT_DIM

    def __init__(self, fake: bool = True):
        self.fake = fake

    def _fake_feature(self, payload: bytes) -> np.ndarray:
        digest = hashlib.sha256(payload or b"").digest()
        seed = int.from_bytes(digest[:8], "little")
        return np.random.default_rng(seed).standard_normal(
            self.FEAT_DIM).astype(np.float32)

    def __call__(self, batch: pa.Table) -> pa.Table:
        payloads = batch.column("payload").to_pylist()
        mimes = batch.column("mime").to_pylist() \
            if "mime" in batch.column_names else [None] * len(payloads)
        feats = np.empty((len(payloads), self.FEAT_DIM), dtype=np.float32)
        for i, (p, mime) in enumerate(zip(payloads, mimes)):
            if self.fake:
                feats[i] = self._fake_feature(p)
            else:
                feats[i] = codecs.image_features(
                    codecs.decode_image(p, mime or ""))
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
