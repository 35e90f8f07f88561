"""Pure-numpy media codecs + resize + feature extraction for the multimodal
decode stage.

The container has no PIL/ffmpeg, but several real formats need nothing
beyond numpy + the stdlib:

- images: PPM/PGM (netpbm P6/P5), uncompressed 24-bit BMP, and PNG
  (stdlib zlib inflate + numpy scanline unfiltering; 8-bit depth,
  gray/RGB/alpha color types, non-interlaced)
- audio: WAV RIFF containers with 8/16-bit PCM -> mono float waveform ->
  64-dim spectral/energy descriptor
- video: YUV4MPEG2 (.y4m) C420/C444 -> per-frame RGB via BT.601 ->
  frame sampling + per-frame visual descriptor

so the decode path is REAL for all of those (decode -> bilinear resize ->
64-dim feature); only codecs that genuinely need external native libs
(JPEG, H.26x, vorbis/mp3) remain gated behind NotImplementedError.

Reference analog: the SelfClean embedding stage consumes decoded image
tensors from torchvision loaders (selfclean/cleaner/selfclean.py:268-283);
here the decoded tensor feeds a deterministic visual descriptor instead of
an SSL model forward.
"""

from __future__ import annotations

import struct
import zlib

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


# ---------------------------------------------------------------------------
# PNG (stdlib zlib inflate + numpy unfiltering)

_PNG_SIG = b"\x89PNG\r\n\x1a\n"
# colortype -> samples per pixel (8-bit depth only)
_PNG_CHANNELS = {0: 1, 2: 3, 4: 2, 6: 4}


def _png_chunks(buf: bytes):
    """Yield (type, payload) for each chunk; validates CRCs."""
    if buf[:8] != _PNG_SIG:
        raise ValueError("not a PNG payload")
    i = 8
    while i + 8 <= len(buf):
        (ln,) = struct.unpack_from(">I", buf, i)
        ctype = buf[i + 4: i + 8]
        payload = buf[i + 8: i + 8 + ln]
        if len(payload) != ln:
            raise ValueError("truncated PNG chunk")
        (crc,) = struct.unpack_from(">I", buf, i + 8 + ln)
        if crc != (zlib.crc32(ctype + payload) & 0xFFFFFFFF):
            raise ValueError(f"PNG chunk {ctype!r} CRC mismatch")
        yield ctype, payload
        i += 12 + ln
        if ctype == b"IEND":
            return
    raise ValueError("PNG missing IEND")


def _png_unfilter(raw: np.ndarray, h: int, stride: int, bpp: int) -> np.ndarray:
    """Reverse PNG scanline filtering. None/Sub/Up reconstruct vectorized
    (Sub is a cumsum over bpp-strided lanes); Average/Paeth are sequential
    in x by definition, so those rows fall back to a per-byte loop —
    bounded by image size, and our own encoder emits only filters 0-2."""
    if len(raw) != h * (stride + 1):
        raise ValueError("PNG raster size mismatch")
    rows = raw.reshape(h, stride + 1)
    ftypes = rows[:, 0]
    if ftypes.max(initial=0) > 4:
        raise ValueError("invalid PNG filter type")
    out = np.empty((h, stride), dtype=np.int64)
    prev = np.zeros(stride, dtype=np.int64)
    for y in range(h):
        ft = int(ftypes[y])
        row = rows[y, 1:].astype(np.int64)
        if ft == 0:
            rec = row
        elif ft == 1:      # Sub: lag-bpp cumsum along x
            rec = np.cumsum(row.reshape(-1, bpp), axis=0).reshape(-1) & 255
        elif ft == 2:      # Up
            rec = (row + prev) & 255
        elif ft == 3:      # Average (sequential in x)
            rec = np.empty(stride, dtype=np.int64)
            for i in range(stride):
                a = rec[i - bpp] if i >= bpp else 0
                rec[i] = (row[i] + ((a + prev[i]) >> 1)) & 255
        else:              # Paeth (sequential in x)
            rec = np.empty(stride, dtype=np.int64)
            for i in range(stride):
                a = rec[i - bpp] if i >= bpp else 0
                c = prev[i - bpp] if i >= bpp else 0
                b = prev[i]
                p = a + b - c
                pa_, pb_, pc_ = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa_ <= pb_ and pa_ <= pc_) else \
                    (b if pb_ <= pc_ else c)
                rec[i] = (row[i] + pred) & 255
        out[y] = rec
        prev = rec
    return out.astype(np.uint8)


def decode_png(buf: bytes) -> np.ndarray:
    """PNG -> (H, W, 3) uint8 RGB. Supports bit depth 8, color types
    0/2/4/6 (gray / RGB / gray+alpha / RGBA; palette would need the PLTE
    indirection — unsupported), non-interlaced. Alpha is dropped, gray is
    broadcast to 3 channels so downstream sees one layout."""
    ihdr = None
    idat = []
    for ctype, payload in _png_chunks(buf):
        if ctype == b"IHDR":
            ihdr = struct.unpack(">IIBBBBB", payload)
        elif ctype == b"IDAT":
            idat.append(payload)
    if ihdr is None or not idat:
        raise ValueError("PNG missing IHDR/IDAT")
    w, h, depth, ctype_, comp, filt, interlace = ihdr
    if depth != 8 or ctype_ not in _PNG_CHANNELS:
        raise NotImplementedError(
            f"PNG depth={depth} colortype={ctype_} unsupported "
            "(8-bit gray/RGB/alpha only)")
    if comp != 0 or filt != 0:
        raise ValueError("invalid PNG compression/filter method")
    if interlace != 0:
        raise NotImplementedError("Adam7-interlaced PNG unsupported")
    if w == 0 or h == 0:
        raise ValueError("empty PNG")
    ch = _PNG_CHANNELS[ctype_]
    raw = np.frombuffer(zlib.decompress(b"".join(idat)), dtype=np.uint8)
    img = _png_unfilter(raw, h, w * ch, ch).reshape(h, w, ch)
    if ctype_ == 0:
        return np.repeat(img, 3, axis=2)
    if ctype_ == 4:
        return np.repeat(img[..., :1], 3, axis=2)
    return np.ascontiguousarray(img[..., :3])


def _png_chunk(ctype: bytes, payload: bytes) -> bytes:
    return struct.pack(">I", len(payload)) + ctype + payload + \
        struct.pack(">I", zlib.crc32(ctype + payload) & 0xFFFFFFFF)


def encode_png(img: np.ndarray, filter_type: int = 0) -> bytes:
    """uint8 image -> PNG. Shape picks the color type: (H,W) or (H,W,1)
    gray, (H,W,2) gray+alpha, (H,W,3) RGB, (H,W,4) RGBA. Any filter 0-4
    (prediction over the known raster is fully vectorizable at encode
    time, so the test suite can exercise every decode branch)."""
    if img.ndim == 2:
        img = img[..., None]
    h, w, ch = img.shape
    assert img.dtype == np.uint8 and ch in (1, 2, 3, 4)
    ctype_ = {1: 0, 2: 4, 3: 2, 4: 6}[ch]
    rec = img.reshape(h, w * ch).astype(np.int64)
    bpp = ch
    a = np.zeros_like(rec)              # recon pixel to the left
    a[:, bpp:] = rec[:, :-bpp]
    b = np.zeros_like(rec)              # recon pixel above
    b[1:] = rec[:-1]
    c = np.zeros_like(rec)              # recon pixel above-left
    c[1:, bpp:] = rec[:-1, :-bpp]
    if filter_type == 0:
        filtered = rec
    elif filter_type == 1:
        filtered = rec - a
    elif filter_type == 2:
        filtered = rec - b
    elif filter_type == 3:
        filtered = rec - ((a + b) >> 1)
    elif filter_type == 4:
        p = a + b - c
        pa_, pb_, pc_ = np.abs(p - a), np.abs(p - b), np.abs(p - c)
        pred = np.where((pa_ <= pb_) & (pa_ <= pc_), a,
                        np.where(pb_ <= pc_, b, c))
        filtered = rec - pred
    else:
        raise ValueError(f"invalid filter {filter_type}")
    raster = np.empty((h, w * ch + 1), dtype=np.uint8)
    raster[:, 0] = filter_type
    raster[:, 1:] = (filtered & 255).astype(np.uint8)
    ihdr = struct.pack(">IIBBBBB", w, h, 8, ctype_, 0, 0, 0)
    return (_PNG_SIG + _png_chunk(b"IHDR", ihdr)
            + _png_chunk(b"IDAT", zlib.compress(raster.tobytes(), 6))
            + _png_chunk(b"IEND", b""))


def decode_image(buf: bytes, mime: str) -> np.ndarray:
    """Dispatch on mime; ValueError for corrupt payloads,
    NotImplementedError for codecs that genuinely need external libs."""
    if mime in ("image/x-portable-pixmap", "image/x-portable-graymap"):
        return decode_ppm(buf)
    if mime == "image/bmp":
        return decode_bmp(buf)
    if mime == "image/png":
        return decode_png(buf)
    raise NotImplementedError(
        f"decoding {mime!r} requires PIL/ffmpeg (not in this container); "
        "PPM/PGM/BMP/PNG decode natively")


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


# ---------------------------------------------------------------------------
# WAV (RIFF PCM) audio

def decode_wav(buf: bytes) -> tuple[np.ndarray, int]:
    """RIFF/WAVE with 8- or 16-bit PCM -> (mono float32 waveform in [-1, 1],
    sample_rate). Multi-channel input is averaged to mono."""
    if len(buf) < 12 or buf[:4] != b"RIFF" or buf[8:12] != b"WAVE":
        raise ValueError("not a WAV payload")
    i, fmt, data = 12, None, None
    while i + 8 <= len(buf):
        cid = buf[i: i + 4]
        (ln,) = struct.unpack_from("<I", buf, i + 4)
        body = buf[i + 8: i + 8 + ln]
        if cid == b"fmt ":
            fmt = struct.unpack_from("<HHIIHH", body, 0)
        elif cid == b"data":
            data = body
        i += 8 + ln + (ln & 1)          # chunks are word-aligned
    if fmt is None or data is None:
        raise ValueError("WAV missing fmt/data chunk")
    audio_fmt, n_ch, rate, _, _, bits = fmt
    if audio_fmt != 1:
        raise NotImplementedError(f"WAV format {audio_fmt} (PCM only)")
    if bits == 16:
        wave = np.frombuffer(data, dtype="<i2",
                             count=len(data) // 2).astype(np.float32) / 32768.0
    elif bits == 8:                      # 8-bit PCM is unsigned
        wave = (np.frombuffer(data, dtype=np.uint8).astype(np.float32)
                - 128.0) / 128.0
    else:
        raise NotImplementedError(f"WAV bit depth {bits} (8/16 only)")
    if n_ch > 1:
        wave = wave[: len(wave) - len(wave) % n_ch]
        wave = wave.reshape(-1, n_ch).mean(axis=1)
    return wave, rate


def encode_wav(samples: np.ndarray, rate: int) -> bytes:
    """int16 mono samples -> 16-bit PCM WAV."""
    assert samples.dtype == np.int16 and samples.ndim == 1
    data = samples.astype("<i2").tobytes()
    fmt = struct.pack("<HHIIHH", 1, 1, rate, rate * 2, 2, 16)
    body = b"fmt " + struct.pack("<I", len(fmt)) + fmt \
        + b"data" + struct.pack("<I", len(data)) + data
    return b"RIFF" + struct.pack("<I", 4 + len(body)) + b"WAVE" + body


def audio_features(wave: np.ndarray, rate: int) -> np.ndarray:
    """Deterministic 64-dim audio descriptor: 16 frames x (RMS energy,
    zero-crossing rate) = 32 dims + 32-band normalized magnitude spectrum.
    All vectorized; invariant to total clip length via framing."""
    if len(wave) == 0:
        return np.zeros(FEAT_DIM, dtype=np.float32)
    pad = (-len(wave)) % 16
    framed = np.pad(wave, (0, pad)).reshape(16, -1)
    rms = np.sqrt((framed ** 2).mean(axis=1))
    sgn = np.signbit(framed)
    zcr = (sgn[:, 1:] != sgn[:, :-1]).mean(axis=1) if framed.shape[1] > 1 \
        else np.zeros(16)
    mag = np.abs(np.fft.rfft(wave))
    bands = np.array_split(mag, 32)
    spec = np.array([b.mean() if len(b) else 0.0 for b in bands])
    spec = spec / max(spec.sum(), 1e-12)
    return np.concatenate([rms, zcr, spec]).astype(np.float32)


# ---------------------------------------------------------------------------
# YUV4MPEG2 (.y4m) video

def _y4m_header(buf: bytes) -> tuple[int, int, float, str, int]:
    """Parse the stream header -> (w, h, fps, chroma, body_offset)."""
    if not buf.startswith(b"YUV4MPEG2"):
        raise ValueError("not a y4m payload")
    nl = buf.find(b"\n")
    if nl < 0:
        raise ValueError("truncated y4m header")
    w = h = 0
    fps, chroma = 30.0, "420"
    for tok in buf[10:nl].split(b" "):
        if not tok:
            continue
        tag, val = tok[:1], tok[1:].decode("ascii")
        if tag == b"W":
            w = int(val)
        elif tag == b"H":
            h = int(val)
        elif tag == b"F":
            num, den = val.split(":")
            fps = int(num) / int(den)
        elif tag == b"C":
            chroma = val
    if w <= 0 or h <= 0:
        raise ValueError("y4m missing dimensions")
    if chroma.startswith("420"):
        chroma = "420"
    elif chroma != "444":
        raise NotImplementedError(f"y4m chroma {chroma} (420/444 only)")
    if chroma == "420" and (w % 2 or h % 2):
        raise ValueError("odd dimensions with 4:2:0 chroma")
    return w, h, fps, chroma, nl + 1


def _yuv_to_rgb(y: np.ndarray, u: np.ndarray, v: np.ndarray) -> np.ndarray:
    """Full-range BT.601 (the JPEG/JFIF matrix), vectorized."""
    yf = y.astype(np.float32)
    uf = u.astype(np.float32) - 128.0
    vf = v.astype(np.float32) - 128.0
    rgb = np.stack([yf + 1.402 * vf,
                    yf - 0.344136 * uf - 0.714136 * vf,
                    yf + 1.772 * uf], axis=-1)
    return np.clip(np.rint(rgb), 0, 255).astype(np.uint8)


def _rgb_to_yuv(img: np.ndarray) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    f = img.astype(np.float32)
    r, g, b = f[..., 0], f[..., 1], f[..., 2]
    y = 0.299 * r + 0.587 * g + 0.114 * b
    u = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
    v = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0
    to8 = lambda p: np.clip(np.rint(p), 0, 255).astype(np.uint8)  # noqa: E731
    return to8(y), to8(u), to8(v)


def y4m_info(buf: bytes) -> dict:
    """Stream metadata without decoding frames: w, h, fps, chroma, n_frames,
    frame_bytes, first-frame offsets (frame size is constant per stream)."""
    w, h, fps, chroma, off = _y4m_header(buf)
    luma = w * h
    frame_bytes = luma + (luma // 2 if chroma == "420" else 2 * luma)
    # frame headers may carry params; scan them (cheap: one find per frame)
    offsets = []
    i = off
    while i < len(buf):
        if buf[i: i + 5] != b"FRAME":
            raise ValueError("bad y4m frame marker")
        nl = buf.find(b"\n", i)
        if nl < 0 or nl + 1 + frame_bytes > len(buf):
            raise ValueError("truncated y4m frame")
        offsets.append(nl + 1)
        i = nl + 1 + frame_bytes
    return {"w": w, "h": h, "fps": fps, "chroma": chroma,
            "n_frames": len(offsets), "frame_bytes": frame_bytes,
            "offsets": offsets}


def y4m_frame(buf: bytes, idx: int, info: dict | None = None) -> np.ndarray:
    """Decode frame idx -> (H, W, 3) uint8 RGB. 4:2:0 chroma is upsampled
    by nearest-neighbor (np.repeat)."""
    info = info or y4m_info(buf)
    if not 0 <= idx < info["n_frames"]:
        raise IndexError(f"frame {idx} out of range 0..{info['n_frames']-1}")
    w, h = info["w"], info["h"]
    off = info["offsets"][idx]
    luma = w * h
    y = np.frombuffer(buf, np.uint8, luma, off).reshape(h, w)
    if info["chroma"] == "444":
        u = np.frombuffer(buf, np.uint8, luma, off + luma).reshape(h, w)
        v = np.frombuffer(buf, np.uint8, luma, off + 2 * luma).reshape(h, w)
    else:
        cw, chh = w // 2, h // 2
        u = np.frombuffer(buf, np.uint8, cw * chh,
                          off + luma).reshape(chh, cw)
        v = np.frombuffer(buf, np.uint8, cw * chh,
                          off + luma + cw * chh).reshape(chh, cw)
        u = np.repeat(np.repeat(u, 2, axis=0), 2, axis=1)
        v = np.repeat(np.repeat(v, 2, axis=0), 2, axis=1)
    return _yuv_to_rgb(y, u, v)


def encode_y4m(frames: list[np.ndarray], fps: int = 25,
               chroma: str = "444") -> bytes:
    """RGB frames -> y4m stream. 444 is lossless-ish (rounding only);
    420 box-averages each 2x2 chroma block."""
    h, w, _ = frames[0].shape
    out = [b"YUV4MPEG2 W%d H%d F%d:1 Ip A1:1 C%s\n"
           % (w, h, fps, chroma.encode("ascii"))]
    for img in frames:
        y, u, v = _rgb_to_yuv(img)
        out.append(b"FRAME\n")
        out.append(y.tobytes())
        if chroma == "444":
            out.append(u.tobytes())
            out.append(v.tobytes())
        else:
            sub = lambda p: ((p.reshape(h // 2, 2, w // 2, 2)  # noqa: E731
                              .mean(axis=(1, 3))) + 0.5).astype(np.uint8)
            out.append(sub(u).tobytes())
            out.append(sub(v).tobytes())
    return b"".join(out)


def video_features(buf: bytes, max_frames: int = 8) -> np.ndarray:
    """Deterministic 64-dim video descriptor: mean of image_features over
    <= max_frames frames sampled evenly across the stream."""
    info = y4m_info(buf)
    n = info["n_frames"]
    if n == 0:
        return np.zeros(FEAT_DIM, dtype=np.float32)
    picks = np.unique(np.linspace(0, n - 1, min(n, max_frames)).astype(int))
    feats = [image_features(y4m_frame(buf, int(i), info)) for i in picks]
    return np.mean(feats, axis=0).astype(np.float32)


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
    if fmt == "png":
        return (encode_png(img, filter_type=int(rng.integers(0, 5))),
                "image/png", w, h)
    return encode_bmp(img), "image/bmp", w, h


def synthesize_audio(media_id: int, seed: int = 42
                     ) -> tuple[bytes, str, int]:
    """Deterministic WAV clip (two seeded sine partials + noise floor):
    returns (payload, mime, duration_ms)."""
    rng = np.random.default_rng((seed << 21) ^ media_id)
    rate = 8000
    dur_ms = int(rng.integers(50, 400))
    t = np.arange(rate * dur_ms // 1000) / rate
    f0, f1 = rng.uniform(100, 1200, 2)
    wave = (0.5 * np.sin(2 * np.pi * f0 * t)
            + 0.25 * np.sin(2 * np.pi * f1 * t)
            + 0.02 * rng.standard_normal(len(t)))
    samples = np.clip(wave * 32000, -32768, 32767).astype(np.int16)
    return encode_wav(samples, rate), "audio/wav", dur_ms


def synthesize_video(media_id: int, seed: int = 42
                     ) -> tuple[bytes, str, int, int, int]:
    """Deterministic y4m clip (moving gradient square over a color wash):
    returns (payload, mime, width, height, duration_ms)."""
    rng = np.random.default_rng((seed << 22) ^ media_id)
    w, h = 2 * int(rng.integers(12, 40)), 2 * int(rng.integers(12, 40))
    fps = 25
    n_frames = int(rng.integers(3, 10))
    base_hue = int(rng.integers(0, 256))
    frames = []
    yy, xx = np.mgrid[0:h, 0:w]
    for f in range(n_frames):
        img = np.stack([
            ((xx * 255) // max(1, w - 1)).astype(np.uint8),
            np.full((h, w), base_hue, np.uint8),
            ((yy * 255) // max(1, h - 1)).astype(np.uint8)], axis=2)
        x0 = (f * max(1, w // max(1, n_frames))) % max(1, w - w // 4)
        img[h // 4: h // 2, x0: x0 + w // 4] = 255 - base_hue
        frames.append(img)
    chroma = "444" if media_id % 2 == 0 else "420"
    dur_ms = n_frames * 1000 // fps
    return (encode_y4m(frames, fps, chroma), "video/x-yuv4mpeg",
            w, h, dur_ms)
