"""Multimodal column plumbing: image/audio/video as opaque binary columns with
typed metadata; decode / feature-extract / resize / frame-sample as actor-pool
map_batches stages.

The decode path is REAL for PPM/PGM/BMP/PNG/baseline-JPEG images, 8/16-bit
PCM WAV audio, and YUV4MPEG2 (.y4m) video (pure stdlib+numpy codecs in
raydedup.codecs: parse -> resize/frame/resample -> 64-dim descriptor); only
codecs that need external native libs (progressive/arithmetic JPEG, H.26x,
mp3) are gated behind NotImplementedError because PIL/ffmpeg are not in
this container. `DecodeMediaActor(fake=True)`
remains available as a deterministic payload-seeded stub for payloads with
no decodable format at all.
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


def synthesize_media(n: int, seed: int = 42, real_images: bool = False,
                     real_media: bool = False) -> pa.Table:
    """Deterministic media table for tests/benches.

    Default: payload = seeded pseudo-random bytes (opaque blobs for plumbing
    tests). real_images=True: every row is an ACTUAL encoded image (cycling
    PPM/BMP/PNG/JPEG from codecs.synthesize_image). real_media=True: rows cycle
    image / audio (WAV) / video (y4m) so every real decode branch runs end
    to end with correct metadata."""
    rng = np.random.default_rng(seed)
    if real_images:
        fmts = ["ppm", "bmp", "png", "jpeg"]
        rows = [codecs.synthesize_image(i, seed, fmts[i % 4])
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
    if real_media:
        kinds, payloads, mimes, ws, hs, durs = [], [], [], [], [], []
        img_fmts = ["ppm", "bmp", "png", "jpeg"]
        for i in range(n):
            if i % 3 == 0:
                p, m, w, h = codecs.synthesize_image(i, seed,
                                                     img_fmts[(i // 3) % 4])
                kinds.append("image"); ws.append(w); hs.append(h)
                durs.append(-1)
            elif i % 3 == 1:
                p, m, dur = codecs.synthesize_audio(i, seed)
                kinds.append("audio"); ws.append(-1); hs.append(-1)
                durs.append(dur)
            else:
                p, m, w, h, dur = codecs.synthesize_video(i, seed)
                kinds.append("video"); ws.append(w); hs.append(h)
                durs.append(dur)
            payloads.append(p); mimes.append(m)
        return pa.table({
            "media_id": pa.array(np.arange(n), pa.int64()),
            "kind": pa.array(kinds, pa.string()),
            "payload": pa.array(payloads, pa.large_binary()),
            "mime": pa.array(mimes, pa.string()),
            "width": pa.array(ws, pa.int32()),
            "height": pa.array(hs, pa.int32()),
            "duration_ms": pa.array(durs, pa.int32()),
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


class DecodeMediaActor:
    """Actor-pool stage: payload bytes -> fixed-size feature vector.

    Real path (fake=False) dispatches on the row's kind:
      image -> codecs.decode_image (PPM/PGM/BMP/PNG) -> 64-dim visual
               descriptor (grid means + luma histogram)
      audio -> codecs.decode_wav (PCM WAV) -> 64-dim spectral/energy
               descriptor
      video -> codecs.video_features (y4m frame sample -> mean visual
               descriptor)
    Per-row iteration is irreducible here (each payload has its own
    dimensions/length), but all per-item work is vectorized numpy.

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

    def _real_feature(self, payload: bytes, mime: str,
                      kind: str) -> np.ndarray:
        if kind == "audio" or mime.startswith("audio/"):
            return codecs.audio_features(*codecs.decode_wav(payload))
        if kind == "video" or mime.startswith("video/"):
            return codecs.video_features(payload)
        return codecs.image_features(codecs.decode_image(payload, mime))

    def __call__(self, batch: pa.Table) -> pa.Table:
        payloads = batch.column("payload").to_pylist()
        n = len(payloads)
        mimes = batch.column("mime").to_pylist() \
            if "mime" in batch.column_names else [""] * n
        kinds = batch.column("kind").to_pylist() \
            if "kind" in batch.column_names else [""] * n
        feats = np.empty((n, self.FEAT_DIM), dtype=np.float32)
        for i in range(n):
            if self.fake:
                feats[i] = self._fake_feature(payloads[i])
            else:
                feats[i] = self._real_feature(payloads[i], mimes[i] or "",
                                              kinds[i] or "")
        flat = pa.array(feats.ravel(), pa.float32())
        offs = pa.array(np.arange(0, (n + 1) * self.FEAT_DIM,
                                  self.FEAT_DIM, dtype=np.int32))
        return pa.table({
            "media_id": batch.column("media_id"),
            "feature": pa.ListArray.from_arrays(offs, flat),
        })


# Back-compat alias (round-2 public name; images were the only real branch
# then, the actor now handles all three kinds).
DecodeImageActor = DecodeMediaActor


def decode_features(media: ray.data.Dataset, concurrency: int = 4,
                    batch_size: int = 64, fake: bool = True
                    ) -> ray.data.Dataset:
    """Actor-pool decode stage. Small batch_size on purpose: media payloads
    are wide binary rows — batch x concurrency must fit worker heap."""
    return media.map_batches(
        DecodeMediaActor, fn_constructor_kwargs={"fake": fake},
        batch_format="pyarrow", batch_size=batch_size,
        concurrency=(1, concurrency), num_cpus=1)


def docs_to_wav(docs: ray.data.Dataset, rate: int = 8000
                ) -> ray.data.Dataset:
    """documents (doc_id, text) -> MEDIA_SCHEMA-shaped audio rows whose
    payload is a REAL 16-bit PCM WAV: sample i = codepoint i of the text,
    mod 251. Deterministic and codepoint-true, so an independent SQL oracle
    can recompute the expected waveform from the text alone — the gate that
    makes the decode plane non-vacuous on driver data (a fake decode would
    not reproduce the per-sample stats)."""

    def fn(t: pa.Table) -> pa.Table:
        texts = t.column("text").to_pylist()
        payloads, durs = [], np.empty(len(texts), np.int32)
        for i, s in enumerate(texts):
            cps = np.frombuffer((s or "").encode("utf-32-le"), dtype="<u4")
            samples = (cps % np.uint32(251)).astype(np.int16)
            payloads.append(codecs.encode_wav(samples, rate))
            durs[i] = len(samples) * 1000 // rate
        n = t.num_rows
        return pa.table({
            "media_id": t.column("doc_id").cast(pa.int64()),
            "kind": pa.array(["audio"] * n, pa.string()),
            "payload": pa.array(payloads, pa.large_binary()),
            "mime": pa.array(["audio/wav"] * n, pa.string()),
            "width": pa.array(np.full(n, -1, np.int32), pa.int32()),
            "height": pa.array(np.full(n, -1, np.int32), pa.int32()),
            "duration_ms": pa.array(durs, pa.int32()),
        })

    return docs.map_batches(fn, batch_format="pyarrow")


def audio_stats(media: ray.data.Dataset) -> ray.data.Dataset:
    """(media_id, payload) -> integer per-payload PCM stats through the REAL
    WAV decoder: n_samples, sample_sum, sample_min, sample_max (0s for an
    empty waveform). 16-bit PCM recovers the original integers exactly —
    decode divides by 2^15 (exact in float32), rint undoes it. Stateless
    map_batches tasks (the decode holds no model state; a true model stage
    would be an actor pool, see decode_features)."""

    def fn(t: pa.Table) -> pa.Table:
        payloads = t.column("payload").to_pylist()
        n = len(payloads)
        ns = np.zeros(n, np.int64)
        sm = np.zeros(n, np.int64)
        mn = np.zeros(n, np.int64)
        mx = np.zeros(n, np.int64)
        for i, p in enumerate(payloads):
            wave, _ = codecs.decode_wav(p)
            if len(wave) == 0:
                continue
            ints = np.rint(wave.astype(np.float64) * 32768.0).astype(np.int64)
            ns[i] = len(ints)
            sm[i] = ints.sum()
            mn[i] = ints.min()
            mx[i] = ints.max()
        return pa.table({
            "media_id": t.column("media_id"),
            "n_samples": pa.array(ns, pa.int64()),
            "sample_sum": pa.array(sm, pa.int64()),
            "sample_min": pa.array(mn, pa.int64()),
            "sample_max": pa.array(mx, pa.int64()),
        })

    return media.map_batches(fn, batch_format="pyarrow")


def frame_sample(media: ray.data.Dataset, every_ms: int = 1000
                 ) -> ray.data.Dataset:
    """Video rows -> one row per sampled frame timestamp (timestamp plan
    only; `frame_features` below decodes the planned frames)."""

    def fn(t: pa.Table) -> pa.Table:
        kinds = np.asarray(t.column("kind").to_pylist())
        durs = t.column("duration_ms").to_numpy(zero_copy_only=False)
        ids = t.column("media_id").to_numpy(zero_copy_only=False)
        keep = (kinds == "video") & (durs > 0)
        counts = np.where(keep, -(-durs // every_ms), 0).astype(np.int64)
        out_id = np.repeat(ids, counts)
        # per-video 0..k-1 ramp -> timestamps
        ramp = np.arange(int(counts.sum()), dtype=np.int64) - \
            np.repeat(np.cumsum(counts) - counts, counts)
        return pa.table({"media_id": pa.array(out_id, pa.int64()),
                         "frame_ts_ms": pa.array((ramp * every_ms)
                                                 .astype(np.int32),
                                                 pa.int32())})

    return media.map_batches(fn, batch_format="pyarrow")


class FrameFeatureActor:
    """Actor-pool stage: y4m video rows -> one (media_id, frame_ts_ms,
    feature) row per sampled frame, decoding each sampled frame for real.
    The y4m stream is parsed ONCE per row (y4m_info) and frames are sliced
    at constant offsets."""

    def __init__(self, every_ms: int = 1000):
        self.every_ms = every_ms

    def __call__(self, batch: pa.Table) -> pa.Table:
        payloads = batch.column("payload").to_pylist()
        kinds = batch.column("kind").to_pylist()
        ids = batch.column("media_id").to_numpy(zero_copy_only=False)
        out_id, out_ts, out_feat = [], [], []
        for i, (p, kind) in enumerate(zip(payloads, kinds)):
            if kind != "video":
                continue
            info = codecs.y4m_info(p)
            if info["n_frames"] == 0:
                continue
            dur_ms = info["n_frames"] * 1000.0 / info["fps"]
            for ts in range(0, int(dur_ms), self.every_ms):
                idx = min(int(ts * info["fps"] / 1000.0),
                          info["n_frames"] - 1)
                out_id.append(int(ids[i]))
                out_ts.append(ts)
                out_feat.append(codecs.image_features(
                    codecs.y4m_frame(p, idx, info)))
        n = len(out_id)
        flat = pa.array(np.concatenate(out_feat).ravel() if n else
                        np.empty(0, np.float32), pa.float32())
        offs = pa.array(np.arange(0, (n + 1) * codecs.FEAT_DIM,
                                  codecs.FEAT_DIM, dtype=np.int32))
        return pa.table({
            "media_id": pa.array(out_id, pa.int64()),
            "frame_ts_ms": pa.array(out_ts, pa.int32()),
            "feature": pa.ListArray.from_arrays(offs, flat),
        })


def frame_features(media: ray.data.Dataset, every_ms: int = 1000,
                   concurrency: int = 4, batch_size: int = 16
                   ) -> ray.data.Dataset:
    """Real frame-sampling stage: decode sampled y4m frames to features."""
    return media.map_batches(
        FrameFeatureActor, fn_constructor_kwargs={"every_ms": every_ms},
        batch_format="pyarrow", batch_size=batch_size,
        concurrency=(1, concurrency), num_cpus=1)


def docs_to_image(docs: ray.data.Dataset) -> ray.data.Dataset:
    """documents (doc_id, text) -> MEDIA_SCHEMA-shaped image rows whose
    payload is a REAL encoded image (BMP for even doc_ids, PNG for odd):
    a 1-pixel-tall RGB strip where pixel i's gray value = codepoint i of
    the text, mod 256 (replicated to the three channels). Codepoint-true
    and deterministic, so the SQL oracle recomputes the expected pixel
    stats from the text alone — the image-plane analog of docs_to_wav.
    Empty texts carry an empty payload (width 0)."""

    def fn(t: pa.Table) -> pa.Table:
        ids = t.column("doc_id").to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        texts = t.column("text").to_pylist()
        payloads, mimes, widths = [], [], np.empty(len(texts), np.int32)
        for i, s in enumerate(texts):
            cps = np.frombuffer((s or "").encode("utf-32-le"), dtype="<u4")
            widths[i] = len(cps)
            if len(cps) == 0:
                payloads.append(b"")
                mimes.append("image/bmp" if ids[i] % 2 == 0
                             else "image/png")
                continue
            gray = (cps % np.uint32(256)).astype(np.uint8)
            img = np.repeat(gray, 3).reshape(1, len(gray), 3)
            if ids[i] % 2 == 0:
                payloads.append(codecs.encode_bmp(img))
                mimes.append("image/bmp")
            else:
                payloads.append(codecs.encode_png(img))
                mimes.append("image/png")
        n = t.num_rows
        return pa.table({
            "media_id": pa.array(ids, pa.int64()),
            "kind": pa.array(["image"] * n, pa.string()),
            "payload": pa.array(payloads, pa.large_binary()),
            "mime": pa.array(mimes, pa.string()),
            "width": pa.array(widths, pa.int32()),
            "height": pa.array(np.where(widths > 0, 1, 0), pa.int32()),
            "duration_ms": pa.array(np.full(n, -1, np.int32), pa.int32()),
        })

    return docs.map_batches(fn, batch_format="pyarrow")


def docs_to_progressive_jpeg(docs: ray.data.Dataset) -> ray.data.Dataset:
    """documents (doc_id, text) -> MEDIA_SCHEMA-shaped image rows whose
    payload is a REAL PROGRESSIVE JPEG (SOF2, all four scan kinds: DC
    first/refine + AC first/refine, codecs.encode_jpeg(progressive=True)):
    codepoint i becomes an 8x8 CONSTANT gray block of value cp % 256 in an
    8-pixel-tall strip. Constant blocks quantize to a lone DC coefficient,
    and at quality=100 every quantizer step is 1, so the lossy pipeline is
    bit-exact here and the SQL oracle can recompute the pixel stats from
    the text alone (64 pixels per codepoint). Empty texts carry an empty
    payload."""

    def fn(t: pa.Table) -> pa.Table:
        ids = t.column("doc_id").to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        texts = t.column("text").to_pylist()
        payloads, widths = [], np.empty(len(texts), np.int32)
        for i, s in enumerate(texts):
            cps = np.frombuffer((s or "").encode("utf-32-le"), dtype="<u4")
            widths[i] = 8 * len(cps)
            if len(cps) == 0:
                payloads.append(b"")
                continue
            gray = (cps % np.uint32(256)).astype(np.uint8)
            img = np.repeat(np.repeat(gray[None, :], 8, axis=0), 8, axis=1)
            payloads.append(codecs.encode_jpeg(img, quality=100,
                                               progressive=True))
        n = t.num_rows
        return pa.table({
            "media_id": pa.array(ids, pa.int64()),
            "kind": pa.array(["image"] * n, pa.string()),
            "payload": pa.array(payloads, pa.large_binary()),
            "mime": pa.array(["image/jpeg"] * n, pa.string()),
            "width": pa.array(widths, pa.int32()),
            "height": pa.array(np.where(widths > 0, 8, 0), pa.int32()),
            "duration_ms": pa.array(np.full(n, -1, np.int32), pa.int32()),
        })

    return docs.map_batches(fn, batch_format="pyarrow")


def image_stats(media: ray.data.Dataset) -> ray.data.Dataset:
    """(media_id, payload, mime) -> integer per-image pixel stats through
    the REAL image decoders: n_pixels, pixel_sum, pixel_min, pixel_max
    over the first channel (0s for an empty payload). Stateless
    map_batches tasks, one decode per row."""

    def fn(t: pa.Table) -> pa.Table:
        payloads = t.column("payload").to_pylist()
        mimes = t.column("mime").to_pylist()
        n = len(payloads)
        np_, sm, mn, mx = (np.zeros(n, np.int64) for _ in range(4))
        for i, (p, m) in enumerate(zip(payloads, mimes)):
            if not p:
                continue
            img = codecs.decode_image(p, m)
            px = (img[..., 0] if img.ndim == 3 else img).ravel() \
                .astype(np.int64)
            if len(px) == 0:
                continue
            np_[i] = len(px)
            sm[i] = px.sum()
            mn[i] = px.min()
            mx[i] = px.max()
        return pa.table({
            "media_id": t.column("media_id"),
            "n_pixels": pa.array(np_, pa.int64()),
            "pixel_sum": pa.array(sm, pa.int64()),
            "pixel_min": pa.array(mn, pa.int64()),
            "pixel_max": pa.array(mx, pa.int64()),
        })

    return media.map_batches(fn, batch_format="pyarrow")


def docs_to_y4m(docs: ray.data.Dataset) -> ray.data.Dataset:
    """documents (doc_id, text) -> MEDIA_SCHEMA-shaped video rows whose
    payload is a REAL single-frame YUV4MPEG2 (C444) stream: a 1-pixel-tall
    gray strip with pixel i = codepoint i mod 256. Gray RGB -> BT.601 YUV
    -> RGB is bit-exact for gray values (coefficients sum to 1; verified
    by the round-trip test), so the SQL oracle recomputes the expected
    pixel stats from the text alone — the video analog of docs_to_wav /
    docs_to_image. Empty texts carry an empty payload."""

    def fn(t: pa.Table) -> pa.Table:
        ids = t.column("doc_id").to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        texts = t.column("text").to_pylist()
        payloads, widths = [], np.empty(len(texts), np.int32)
        for i, s in enumerate(texts):
            cps = np.frombuffer((s or "").encode("utf-32-le"), dtype="<u4")
            widths[i] = len(cps)
            if len(cps) == 0:
                payloads.append(b"")
                continue
            gray = (cps % np.uint32(256)).astype(np.uint8)
            img = np.repeat(gray, 3).reshape(1, len(gray), 3)
            payloads.append(codecs.encode_y4m([img], chroma="444"))
        n = t.num_rows
        return pa.table({
            "media_id": pa.array(ids, pa.int64()),
            "kind": pa.array(["video"] * n, pa.string()),
            "payload": pa.array(payloads, pa.large_binary()),
            "mime": pa.array(["video/x-yuv4mpeg2"] * n, pa.string()),
            "width": pa.array(widths, pa.int32()),
            "height": pa.array(np.where(widths > 0, 1, 0), pa.int32()),
            "duration_ms": pa.array(np.where(widths > 0, 40, 0), pa.int32()),
        })

    return docs.map_batches(fn, batch_format="pyarrow")


def video_stats(media: ray.data.Dataset) -> ray.data.Dataset:
    """(media_id, payload) -> integer pixel stats of the FIRST decoded
    frame through the real y4m decoder: n_pixels, pixel_sum, pixel_min,
    pixel_max over channel 0 (0s for an empty payload)."""

    def fn(t: pa.Table) -> pa.Table:
        payloads = t.column("payload").to_pylist()
        n = len(payloads)
        np_, sm, mn, mx = (np.zeros(n, np.int64) for _ in range(4))
        for i, p in enumerate(payloads):
            if not p:
                continue
            info = codecs.y4m_info(p)
            if info["n_frames"] == 0:
                continue
            img = codecs.y4m_frame(p, 0, info)
            px = img[..., 0].ravel().astype(np.int64)
            np_[i] = len(px)
            sm[i] = px.sum()
            mn[i] = px.min()
            mx[i] = px.max()
        return pa.table({
            "media_id": t.column("media_id"),
            "n_pixels": pa.array(np_, pa.int64()),
            "pixel_sum": pa.array(sm, pa.int64()),
            "pixel_min": pa.array(mn, pa.int64()),
            "pixel_max": pa.array(mx, pa.int64()),
        })

    return media.map_batches(fn, batch_format="pyarrow")
