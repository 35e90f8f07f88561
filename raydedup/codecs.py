"""Pure-numpy image codecs + resize + feature extraction for the multimodal
decode stage.

The container has no PIL/ffmpeg, but PPM/PGM (netpbm P6/P5) and uncompressed
24-bit BMP need nothing beyond numpy — so the decode path is REAL for those
formats (decode -> bilinear resize -> 64-dim feature), and only compressed
codecs (JPEG/PNG/video) remain gated behind NotImplementedError.

Reference analog: the SelfClean embedding stage consumes decoded image
tensors from torchvision loaders (selfclean/cleaner/selfclean.py:268-283);
here the decoded tensor feeds a deterministic visual descriptor instead of
an SSL model forward.
"""

from __future__ import annotations

import struct

import numpy as np

FEAT_DIM = 64
TARGET = (32, 32)   # decode-stage canonical size; small keeps batches light


def _read_pnm_header(buf: bytes):
    """Parse a netpbm header (magic, dims, maxval), honoring '#' comments.
    Returns (magic, width, height, maxval, data_offset)."""
    if len(buf) < 2 or buf[0:1] != b"P":
        raise ValueError("not a netpbm payload")
    magic = buf[:2].decode("ascii")
    fields: list[int] = []
    i = 2
    n_fields = 3 if magic in ("P5", "P6") else None
    if n_fields is None:
        raise ValueError(f"unsupported netpbm magic {magic!r}")
    while len(fields) < n_fields:
        # skip whitespace and comment lines
        while i < len(buf) and buf[i] in b" \t\r\n":
            i += 1
        if i < len(buf) and buf[i] == ord("#"):
            while i < len(buf) and buf[i] != ord("\n"):
                i += 1
            continue
        j = i
        while j < len(buf) and buf[j] not in b" \t\r\n#":
            j += 1
        if j == i:
            raise ValueError("truncated netpbm header")
        fields.append(int(buf[i:j]))
        i = j
    if i >= len(buf) or buf[i] not in b" \t\r\n":
        raise ValueError("malformed netpbm header")
    i += 1  # exactly ONE whitespace byte separates header from raster
    w, h, maxval = fields
    if maxval <= 0 or maxval > 255:
        raise ValueError(f"unsupported netpbm maxval {maxval}")
    return magic, w, h, maxval, i


def decode_ppm(buf: bytes) -> np.ndarray:
    """netpbm binary raster -> (H, W, 3) uint8. P6 = RGB, P5 = grayscale
    (broadcast to 3 channels so downstream sees one layout)."""
    magic, w, h, maxval, off = _read_pnm_header(buf)
    ch = 3 if magic == "P6" else 1
    need = w * h * ch
    raster = np.frombuffer(buf, dtype=np.uint8, count=need, offset=off)
    img = raster.reshape(h, w, ch)
    if maxval != 255:
        img = (img.astype(np.uint16) * 255 // maxval).astype(np.uint8)
    if ch == 1:
        img = np.repeat(img, 3, axis=2)
    return img


def encode_ppm(img: np.ndarray) -> bytes:
    """(H, W, 3) uint8 -> binary P6 payload (used by the synthetic media
    generator so tests exercise the REAL decode path)."""
    h, w, c = img.shape
    assert c == 3 and img.dtype == np.uint8
    return b"P6\n%d %d\n255\n" % (w, h) + img.tobytes()


def decode_bmp(buf: bytes) -> np.ndarray:
    """Uncompressed 24-bit BI_RGB BMP -> (H, W, 3) uint8 (RGB order).
    Rows are stored bottom-up and padded to 4 bytes."""
    if buf[:2] != b"BM":
        raise ValueError("not a BMP payload")
    data_off = struct.unpack_from("<I", buf, 10)[0]
    hdr_size = struct.unpack_from("<I", buf, 14)[0]
    if hdr_size < 40:
        raise ValueError("unsupported BMP header")
    w, h = struct.unpack_from("<ii", buf, 18)
    bpp = struct.unpack_from("<H", buf, 28)[0]
    comp = struct.unpack_from("<I", buf, 30)[0]
    if bpp != 24 or comp != 0:
        raise ValueError(f"unsupported BMP (bpp={bpp}, compression={comp})")
    flip = h > 0
    h = abs(h)
    stride = (w * 3 + 3) & ~3
    raster = np.frombuffer(buf, dtype=np.uint8, count=stride * h,
                           offset=data_off)
    rows = raster.reshape(h, stride)[:, : w * 3].reshape(h, w, 3)
    if flip:
        rows = rows[::-1]
    return rows[..., ::-1]  # BGR -> RGB


def encode_bmp(img: np.ndarray) -> bytes:
    """(H, W, 3) uint8 RGB -> uncompressed 24-bit bottom-up BMP."""
    h, w, c = img.shape
    assert c == 3 and img.dtype == np.uint8
    stride = (w * 3 + 3) & ~3
    rows = np.zeros((h, stride), dtype=np.uint8)
    rows[:, : w * 3] = img[::-1, :, ::-1].reshape(h, w * 3)
    raster = rows.tobytes()
    off = 14 + 40
    header = struct.pack("<2sIHHI", b"BM", off + len(raster), 0, 0, off)
    info = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(raster),
                       2835, 2835, 0, 0)
    return header + info + raster


def decode_image(buf: bytes, mime: str) -> np.ndarray:
    """Dispatch on mime; ValueError for corrupt payloads,
    NotImplementedError for codecs that genuinely need external libs."""
    if mime in ("image/x-portable-pixmap", "image/x-portable-graymap"):
        return decode_ppm(buf)
    if mime == "image/bmp":
        return decode_bmp(buf)
    raise NotImplementedError(
        f"decoding {mime!r} requires PIL/ffmpeg (not in this container); "
        "PPM/PGM/BMP decode natively")


def resize_bilinear(img: np.ndarray, size: tuple[int, int]) -> np.ndarray:
    """(H, W, C) -> (h, w, C) float32 bilinear resample (half-pixel centers,
    the align_corners=False convention), fully vectorized."""
    h_in, w_in = img.shape[:2]
    h_out, w_out = size
    src = img.astype(np.float32)
    ys = (np.arange(h_out, dtype=np.float32) + 0.5) * (h_in / h_out) - 0.5
    xs = (np.arange(w_out, dtype=np.float32) + 0.5) * (w_in / w_out) - 0.5
    y0 = np.clip(np.floor(ys), 0, h_in - 1).astype(np.int64)
    x0 = np.clip(np.floor(xs), 0, w_in - 1).astype(np.int64)
    y1 = np.minimum(y0 + 1, h_in - 1)
    x1 = np.minimum(x0 + 1, w_in - 1)
    wy = np.clip(ys - y0, 0.0, 1.0)[:, None, None]
    wx = np.clip(xs - x0, 0.0, 1.0)[None, :, None]
    top = src[y0][:, x0] * (1 - wx) + src[y0][:, x1] * wx
    bot = src[y1][:, x0] * (1 - wx) + src[y1][:, x1] * wx
    return top * (1 - wy) + bot * wy


def image_features(img: np.ndarray) -> np.ndarray:
    """Deterministic 64-dim visual descriptor of an (H, W, 3) image:
    4x4 grid of per-cell channel means (48 dims) + 16-bin luma histogram
    (16 dims), all in [0, 1]. Vectorized; no model weights needed."""
    resized = resize_bilinear(img, TARGET)          # (32, 32, 3) float32
    cells = resized.reshape(4, 8, 4, 8, 3).mean(axis=(1, 3)) / 255.0
    luma = resized @ np.array([0.299, 0.587, 0.114], dtype=np.float32)
    hist = np.bincount(
        np.clip((luma.ravel() / 16.0).astype(np.int64), 0, 15),
        minlength=16).astype(np.float32)
    hist /= max(1.0, float(luma.size))
    return np.concatenate([cells.ravel().astype(np.float32), hist])


def synthesize_image(media_id: int, seed: int = 42,
                     fmt: str = "ppm") -> tuple[bytes, str, int, int]:
    """Deterministic small test image (gradient + seeded noise rectangle):
    returns (payload, mime, width, height). Near-duplicate pairs can be
    planted by reusing a media_id with a tiny seed offset."""
    rng = np.random.default_rng((seed << 20) ^ media_id)
    w, h = int(rng.integers(24, 96)), int(rng.integers(24, 96))
    yy, xx = np.mgrid[0:h, 0:w]
    base = ((xx * 255) // max(1, w - 1)).astype(np.uint8)
    img = np.stack([base,
                    ((yy * 255) // max(1, h - 1)).astype(np.uint8),
                    np.full((h, w), int(rng.integers(0, 256)), np.uint8)],
                   axis=2)
    x0, y0 = int(rng.integers(0, w // 2)), int(rng.integers(0, h // 2))
    img[y0:y0 + h // 4, x0:x0 + w // 4] = rng.integers(
        0, 256, (min(h // 4, h - y0), min(w // 4, w - x0), 3), dtype=np.uint8)
    if fmt == "ppm":
        return encode_ppm(img), "image/x-portable-pixmap", w, h
    return encode_bmp(img), "image/bmp", w, h
