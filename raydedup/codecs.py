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

- baseline JPEG (ITU T.81 sequential DCT): full marker parse, canonical
  Huffman entropy decode, batched einsum IDCT, 4:4:4/4:2:0/4:2:2 chroma,
  restart intervals; the encoder emits valid baseline JPEG with per-image
  fixed-length Huffman tables

so the decode path is REAL for all of those (decode -> bilinear resize ->
64-dim feature), including PROGRESSIVE JPEG (SOF2: DC/AC first +
successive-approximation refinement scans, EOB runs, T.81 G.2); only
codecs that genuinely need external native libs (arithmetic-coded JPEG,
H.26x, vorbis/mp3) remain gated behind NotImplementedError.

Reference analog: the SelfClean embedding stage consumes decoded image
tensors from torchvision loaders (selfclean/cleaner/selfclean.py:268-283);
here the decoded tensor feeds a deterministic visual descriptor instead of
an SSL model forward.
"""

from __future__ import annotations

import functools
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
    if len(buf) < 54:        # file header (14) + BITMAPINFOHEADER (40)
        raise ValueError("truncated BMP header")
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
    try:
        if mime in ("image/x-portable-pixmap", "image/x-portable-graymap"):
            return decode_ppm(buf)
        if mime == "image/bmp":
            return decode_bmp(buf)
        if mime == "image/png":
            return decode_png(buf)
        if mime == "image/jpeg":
            return decode_jpeg(buf)
    except struct.error as e:
        # truncated headers surface as struct.error from unpack_from —
        # re-raise under the shared corrupt-payload contract (ValueError)
        raise ValueError(f"corrupt {mime} payload: {e}") from e
    except zlib.error as e:
        # a PNG whose chunk CRCs pass but whose IDAT stream is invalid
        # deflate raises zlib.error from decompress — same contract
        raise ValueError(f"corrupt {mime} payload: {e}") from e
    raise NotImplementedError(
        f"decoding {mime!r} requires PIL/ffmpeg (not in this container); "
        "PPM/PGM/BMP/PNG/baseline-JPEG decode natively")


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
# Baseline JPEG (ITU T.81 sequential DCT, pure numpy + stdlib)
#
# Decoder: marker parse -> canonical Huffman -> per-MCU entropy decode
# (the only per-symbol Python loop; everything after is batched numpy:
# dequantize, inverse zigzag, one einsum IDCT over all blocks, chroma
# upsample, BT.601 to RGB). Encoder emits valid baseline JPEG with
# per-image fixed-length Huffman tables (all symbols at one code length
# -> trivially canonical, always decodable by any conformant reader) so
# no spec Annex K table transcription is needed. Progressive (SOF2) is
# fully decoded (and encodable via encode_jpeg(progressive=True));
# arithmetic coding and 12-bit precision raise NotImplementedError.

_ZIGZAG = np.array([
    0,  1,  8, 16,  9,  2,  3, 10, 17, 24, 32, 25, 18, 11,  4,  5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13,  6,  7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63])

# base quant tables (ITU T.81 Annex K.1 — the reference visual-weighting
# tables every JPEG implementation ships)
_Q_LUMA = np.array([
    16, 11, 10, 16, 24, 40, 51, 61, 12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56, 14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77, 24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101, 72, 92, 95, 98, 112, 100, 103, 99,
]).reshape(8, 8)
_Q_CHROMA = np.array([
    17, 18, 24, 47, 99, 99, 99, 99, 18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99, 47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99,
]).reshape(8, 8)

# orthonormal 8-point DCT-II basis: A[u, x] = c(u)/2 * cos((2x+1)u*pi/16)
_DCT_A = np.array([[(np.sqrt(0.5) if u == 0 else 1.0) / 2.0
                    * np.cos((2 * x + 1) * u * np.pi / 16)
                    for x in range(8)] for u in range(8)])


@functools.lru_cache(maxsize=64)
def _huff_lut(bits_counts: bytes, symbols: bytes
              ) -> tuple[list[int], list[int]]:
    """DHT (counts per length, symbols) -> flat 2^16 lookup tables
    (sym_by_peek, len_by_peek): canonical code c of length L owns the
    peek-value range [c << (16-L), (c+1) << (16-L)). len 0 = invalid.
    Cached on the raw DHT bytes: rebuilding these lists cost ~1/3 of a
    small-image decode, and a corpus reuses few distinct tables."""
    sym = np.full(65536, -1, np.int32)
    ln = np.zeros(65536, np.int32)
    code, k = 0, 0
    for length in range(1, 17):
        for _ in range(bits_counts[length - 1]):
            lo = code << (16 - length)
            sym[lo: lo + (1 << (16 - length))] = symbols[k]
            ln[lo: lo + (1 << (16 - length))] = length
            code += 1
            k += 1
        code <<= 1
    return sym.tolist(), ln.tolist()


def decode_jpeg(buf: bytes) -> np.ndarray:
    """Baseline sequential JPEG -> (H, W, 3) uint8 RGB. Supports 8-bit
    grayscale and YCbCr with sampling factors 1 or 2 (4:4:4 / 4:2:0 /
    4:2:2), restart intervals, and both interleaved (one 3-component
    scan) and non-interleaved (one scan per component) baseline files.
    Progressive/arithmetic/CMYK gate honestly; corrupt or truncated
    streams raise ValueError (the contract all codecs here share)."""
    try:
        return _decode_jpeg(buf)
    except (IndexError, struct.error) as e:
        # a segment length that cuts a DHT/SOS/SOF table short surfaces as
        # an out-of-range index or short unpack deep in the parser — map
        # every such truncation onto the shared corrupt-payload contract
        raise ValueError(f"truncated JPEG stream: {e}") from e


def _decode_jpeg(buf: bytes) -> np.ndarray:
    if buf[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG payload")
    qt: dict[int, np.ndarray] = {}
    huff: dict[tuple[int, int], tuple] = {}  # (class, id) -> peek16 LUT
    sof = None
    geom = None              # {cid: per-component geometry}, set on first SOS
    grids: dict[int, tuple[list, list]] = {}  # cid -> (vals, positions)
    coef: dict[int, np.ndarray] = {}  # progressive: cid -> dense zigzag i32
    progressive = False
    seen_scan: set[int] = set()
    restart_interval = 0
    i = 2
    while i + 2 <= len(buf):
        if buf[i] != 0xFF:
            raise ValueError("JPEG marker sync lost")
        marker = buf[i + 1]
        if marker == 0xD9:                      # EOI
            break
        if marker == 0xFF:
            # fill byte (T.81 B.1.1.2: any number of 0xFF fills may precede
            # a marker code) — consume ONE byte so the real marker's
            # leading 0xFF is still in place after an odd-length fill run
            i += 1
            continue
        if marker == 0x01 or 0xD0 <= marker <= 0xD7:
            i += 2                              # TEM / stray RST
            continue
        if marker in (0xC6, 0xCA, 0xCE):
            raise NotImplementedError(
                "differential/arithmetic progressive JPEG unsupported")
        if marker in (0xC3, 0xC5, 0xC7, 0xC9, 0xCB, 0xCD, 0xCF):
            raise NotImplementedError("non-baseline JPEG process")
        if i + 4 > len(buf):
            break
        (seglen,) = struct.unpack_from(">H", buf, i + 2)
        seg = buf[i + 4: i + 2 + seglen]
        if marker == 0xDB:                      # DQT
            j = 0
            while j < len(seg):
                prec, tid = seg[j] >> 4, seg[j] & 15
                if prec != 0:
                    raise NotImplementedError("16-bit quant tables")
                tbl = np.frombuffer(seg, np.uint8, 64, j + 1).astype(np.int32)
                dq = np.zeros(64, np.int32)
                dq[_ZIGZAG] = tbl
                qt[tid] = dq.reshape(8, 8)
                j += 65
        elif marker in (0xC0, 0xC1, 0xC2):      # SOF0/1 baseline, SOF2 prog
            progressive = marker == 0xC2
            prec, h, w, nc = struct.unpack_from(">BHHB", seg, 0)
            if prec != 8:
                raise NotImplementedError("12-bit JPEG")
            if nc not in (1, 3):
                raise NotImplementedError(
                    "JPEG with 2 or >3 components (CMYK/YCCK)")
            comps = []
            for c in range(nc):
                cid, hv, tq = struct.unpack_from(">BBB", seg, 6 + 3 * c)
                comps.append({"id": cid, "h": hv >> 4, "v": hv & 15,
                              "tq": tq})
            sof = (h, w, comps)
        elif marker == 0xC4:                    # DHT
            j = 0
            while j < len(seg):
                tc, th = seg[j] >> 4, seg[j] & 15
                counts = bytes(seg[j + 1: j + 17])
                n = sum(counts)
                syms = bytes(seg[j + 17: j + 17 + n])
                huff[(tc, th)] = _huff_lut(counts, syms)
                j += 17 + n
        elif marker == 0xDD:                    # DRI
            (restart_interval,) = struct.unpack_from(">H", seg, 0)
        elif marker == 0xDA:                    # SOS — entropy data follows
            if sof is None:
                raise ValueError("JPEG SOS before SOF")
            if geom is None:
                geom = _jpeg_geometry(sof)
                grids = {c["id"]: ([], []) for c in sof[2]}
                if progressive:
                    coef = {c["id"]: np.zeros(
                        geom[c["id"]]["nby_pad"]
                        * geom[c["id"]]["nbx_pad"] * 64, np.int32)
                        for c in sof[2]}
            ns = seg[0]
            scan = []
            for c in range(ns):
                cs, tds = seg[1 + 2 * c], seg[2 + 2 * c]
                if cs not in geom:
                    raise ValueError("JPEG scan references unknown component")
                if not progressive and ((0, tds >> 4) not in huff
                                        or (1, tds & 15) not in huff):
                    raise ValueError("JPEG scan references missing DHT table")
                scan.append({"id": cs, "td": tds >> 4, "ta": tds & 15})
            if progressive:
                ss, se = seg[1 + 2 * ns], seg[2 + 2 * ns]
                ahal = seg[3 + 2 * ns]
                if ss == 0:                     # DC coverage tracking
                    seen_scan.update(s["id"] for s in scan)
                i = _jpeg_progressive_scan(buf, i + 2 + seglen, geom, huff,
                                           scan, restart_interval, coef,
                                           ss, se, ahal >> 4, ahal & 15)
                continue
            seen_scan.update(s["id"] for s in scan)
            i = _jpeg_entropy_scan(buf, i + 2 + seglen, geom, huff, scan,
                                   restart_interval, grids)
            continue
        i += 2 + seglen
    if geom is None or not seen_scan:
        raise ValueError("JPEG missing SOS")
    if seen_scan != set(geom):
        raise ValueError("JPEG missing component scan"
                         if not progressive
                         else "progressive JPEG missing DC scan")
    if progressive:
        for cid, dense in coef.items():
            nz = np.nonzero(dense)[0]
            grids[cid] = (dense[nz], nz)
    return _jpeg_assemble(sof, geom, grids, qt)


def _jpeg_geometry(sof):
    """Per-component block geometry: MCU-padded grid (interleaved scans)
    and the component's own block grid (non-interleaved scans)."""
    h, w, comps = sof
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    if hmax not in (1, 2) or vmax not in (1, 2):
        raise NotImplementedError("JPEG sampling factors > 2")
    mcus_x = -(-w // (8 * hmax))
    mcus_y = -(-h // (8 * vmax))
    geom = {}
    for c in comps:
        cw = -(-w * c["h"] // hmax)             # T.81 A.1.1 component dims
        chh = -(-h * c["v"] // vmax)
        geom[c["id"]] = {
            "h": c["h"], "v": c["v"], "tq": c["tq"],
            "hmax": hmax, "vmax": vmax,
            "mcus_x": mcus_x, "mcus_y": mcus_y,
            "nbx_pad": mcus_x * c["h"], "nby_pad": mcus_y * c["v"],
            "nbx": -(-cw // 8), "nby": -(-chh // 8),
        }
    return geom


def _jpeg_destuff(buf, pos) -> tuple[list, int]:
    """Destuff entropy bytes starting at pos; split into segments at RST
    markers (DC predictors and EOB runs reset per segment). Returns
    (segments, index_of_next_marker)."""
    segments, cur = [], bytearray()
    i = pos
    while i < len(buf):
        b = buf[i]
        if b == 0xFF:
            nxt = buf[i + 1] if i + 1 < len(buf) else 0xD9
            if nxt == 0x00:
                cur.append(0xFF)
                i += 2
                continue
            if 0xD0 <= nxt <= 0xD7:
                segments.append(bytes(cur))
                cur = bytearray()
                i += 2
                continue
            break                                   # EOI or next marker
        cur.append(b)
        i += 1
    segments.append(bytes(cur))
    return segments, i


def _jpeg_entropy_scan(buf, pos, geom, huff, scan, restart_interval,
                       grids) -> int:
    """Decode one scan's entropy data into the per-component raster-order
    coefficient accumulators; return the index of the next marker.

    Interleaved scans (ns > 1) traverse MCUs over the padded grid;
    non-interleaved scans (ns == 1) traverse the component's own block
    grid in raster order (T.81 A.2.2). This is the ONLY per-symbol Python
    loop in the codec: bit reads are inlined 16-bit peeks + LUT hits and
    coefficients accumulate into flat lists, scattered into the numpy
    coefficient plane in one vectorized assignment at assembly."""
    segments, i = _jpeg_destuff(buf, pos)

    interleaved = len(scan) > 1
    g0 = geom[scan[0]["id"]]
    if interleaved:
        total_units = g0["mcus_x"] * g0["mcus_y"]   # unit = one MCU
    else:
        total_units = g0["nbx"] * g0["nby"]         # unit = one block
    units_per_seg = restart_interval or total_units

    sc_dc = [huff[(0, s["td"])] for s in scan]
    sc_ac = [huff[(1, s["ta"])] for s in scan]
    sc_geom = [geom[s["id"]] for s in scan]
    sc_grid = [grids[s["id"]] for s in scan]
    mcus_x = g0["mcus_x"]
    unit = 0
    for seg_bytes in segments:
        # 264-byte zero pad: one block consumes < 64*(16+15)+overhead bits
        # past the end before the per-block exhaustion check fires, so no
        # in-block peek can run off the buffer (IndexError is never the
        # corrupt-stream failure mode — ValueError is)
        data = seg_bytes + b"\x00" * 264
        nbits = len(seg_bytes) * 8
        pos = 0
        preds = [0] * len(scan)
        for _ in range(min(units_per_seg, total_units - unit)):
            for si in range(len(scan)):
                dsym, dlen = sc_dc[si]
                asym, alen = sc_ac[si]
                vals, vpos = sc_grid[si]
                g = sc_geom[si]
                ch_, cv_, nbx_pad = g["h"], g["v"], g["nbx_pad"]
                if interleaved:
                    my, mx = divmod(unit, mcus_x)
                    blocks_iter = [((my * cv_ + by) * nbx_pad
                                    + mx * ch_ + bx)
                                   for by in range(cv_)
                                   for bx in range(ch_)]
                else:
                    by, bx = divmod(unit, g["nbx"])
                    blocks_iter = [by * nbx_pad + bx]
                for raster in blocks_iter:
                    base = raster << 6
                    b = pos >> 3
                    pv = (((data[b] << 16) | (data[b + 1] << 8)
                           | data[b + 2]) >> (8 - (pos & 7))) & 0xFFFF
                    t = dsym[pv]
                    ln = dlen[pv]
                    if ln == 0:
                        raise ValueError("invalid JPEG Huffman code")
                    pos += ln
                    if t:
                        b = pos >> 3
                        mv = ((((data[b] << 16) | (data[b + 1] << 8)
                                | data[b + 2]) >> (8 - (pos & 7)))
                              & 0xFFFF) >> (16 - t)
                        pos += t
                        preds[si] += mv if mv >= (1 << (t - 1)) \
                            else mv - (1 << t) + 1
                    vals.append(preds[si])
                    vpos.append(base)
                    k = 1
                    while k < 64:
                        b = pos >> 3
                        pv = (((data[b] << 16) | (data[b + 1] << 8)
                               | data[b + 2]) >> (8 - (pos & 7))) & 0xFFFF
                        rs = asym[pv]
                        ln = alen[pv]
                        if ln == 0:
                            raise ValueError("invalid JPEG Huffman code")
                        pos += ln
                        size = rs & 15
                        if size == 0:
                            if rs == 0xF0:          # ZRL
                                k += 16
                                continue
                            break                   # EOB
                        k += rs >> 4
                        if k > 63:
                            raise ValueError("JPEG AC run overflow")
                        b = pos >> 3
                        mv = ((((data[b] << 16) | (data[b + 1] << 8)
                                | data[b + 2]) >> (8 - (pos & 7)))
                              & 0xFFFF) >> (16 - size)
                        pos += size
                        vals.append(mv if mv >= (1 << (size - 1))
                                    else mv - (1 << size) + 1)
                        vpos.append(base + k)
                        k += 1
                    if pos > nbits:
                        raise ValueError("JPEG entropy data exhausted")
            unit += 1
    if unit != total_units:
        # missing restart segments: without this check a truncated stream
        # would silently decode its remaining MCUs as flat gray
        raise ValueError("JPEG entropy data truncated")
    return i


def _jpeg_progressive_scan(buf, pos, geom, huff, scan, restart_interval,
                           coef, ss, se, ah, al) -> int:
    """Decode one PROGRESSIVE scan (T.81 G.2) into the dense per-component
    zigzag coefficient planes `coef` (cid -> int32[nblocks_padded * 64]).

    Four scan kinds: DC first (Ss=Se=0, Ah=0; interleaved allowed), DC
    refinement (Ah>0; one raw bit per block), AC first (Ss>0, Ah=0;
    single-component, run-length with EOB runs), AC refinement (Ah>0;
    correction-bit algorithm of G.1.2.3). EOB runs and DC predictors reset
    at restart markers (per destuffed segment)."""
    segments, nxt = _jpeg_destuff(buf, pos)
    is_dc = ss == 0
    if is_dc and se != 0:
        raise ValueError("JPEG progressive DC scan with Se != 0")
    interleaved = len(scan) > 1
    if not is_dc and interleaved:
        raise ValueError("JPEG progressive AC scan must be "
                         "single-component")
    g0 = geom[scan[0]["id"]]
    if interleaved:
        total_units = g0["mcus_x"] * g0["mcus_y"]
    else:
        total_units = g0["nbx"] * g0["nby"]
    units_per_seg = restart_interval or total_units
    dc_luts = [huff.get((0, s["td"])) for s in scan]
    ac_lut = huff.get((1, scan[0]["ta"])) if not is_dc else None
    if is_dc and ah == 0 and any(t is None for t in dc_luts):
        raise ValueError("JPEG scan references missing DHT table")
    if not is_dc and ac_lut is None:
        raise ValueError("JPEG scan references missing DHT table")
    mcus_x = g0["mcus_x"]
    p1 = 1 << al
    m1 = -p1
    unit = 0
    for seg_bytes in segments:
        data = seg_bytes + b"\x00" * 264
        nbits = len(seg_bytes) * 8
        state = [0]

        def getbits(n):
            p = state[0]
            b = p >> 3
            v = (((data[b] << 24) | (data[b + 1] << 16)
                  | (data[b + 2] << 8) | data[b + 3])
                 >> (32 - n - (p & 7))) & ((1 << n) - 1)
            state[0] = p + n
            return v

        def huffdec(lut):
            sym, ln = lut
            p = state[0]
            b = p >> 3
            pv = (((data[b] << 16) | (data[b + 1] << 8) | data[b + 2])
                  >> (8 - (p & 7))) & 0xFFFF
            l_ = ln[pv]
            if l_ == 0:
                raise ValueError("invalid JPEG Huffman code")
            state[0] = p + l_
            return sym[pv]

        preds = [0] * len(scan)
        eobrun = 0
        for _ in range(min(units_per_seg, total_units - unit)):
            if is_dc:
                for si, s in enumerate(scan):
                    g = geom[s["id"]]
                    c = coef[s["id"]]
                    if interleaved:
                        my, mx = divmod(unit, mcus_x)
                        blocks = [((my * g["v"] + by) * g["nbx_pad"]
                                   + mx * g["h"] + bx)
                                  for by in range(g["v"])
                                  for bx in range(g["h"])]
                    else:
                        by, bx = divmod(unit, g["nbx"])
                        blocks = [by * g["nbx_pad"] + bx]
                    for raster in blocks:
                        base = raster << 6
                        if ah == 0:
                            t = huffdec(dc_luts[si])
                            if t:
                                mv = getbits(t)
                                preds[si] += mv if mv >= (1 << (t - 1)) \
                                    else mv - (1 << t) + 1
                            c[base] = preds[si] << al
                        elif getbits(1):
                            c[base] |= p1
            else:
                g = g0
                c = coef[scan[0]["id"]]
                by, bx = divmod(unit, g["nbx"])
                base = (by * g["nbx_pad"] + bx) << 6
                if ah == 0:                         # AC first (G.1.2.2)
                    if eobrun:
                        eobrun -= 1
                    else:
                        k = ss
                        while k <= se:
                            rs = huffdec(ac_lut)
                            r, sz = rs >> 4, rs & 15
                            if sz == 0:
                                if r < 15:          # EOBn
                                    eobrun = (1 << r) - 1
                                    if r:
                                        eobrun += getbits(r)
                                    break
                                k += 16             # ZRL
                                continue
                            k += r
                            if k > se:
                                raise ValueError("JPEG AC run overflow")
                            mv = getbits(sz)
                            v = mv if mv >= (1 << (sz - 1)) \
                                else mv - (1 << sz) + 1
                            c[base + k] = v << al
                            k += 1
                else:                               # AC refine (G.1.2.3)
                    k = ss
                    if eobrun == 0:
                        while k <= se:
                            rs = huffdec(ac_lut)
                            r, sz = rs >> 4, rs & 15
                            if sz == 0:
                                if r < 15:          # EOBn: covers THIS block
                                    eobrun = 1 << r
                                    if r:
                                        eobrun += getbits(r)
                                    break
                                val = 0             # ZRL: 16 zero-history
                            else:
                                if sz != 1:
                                    raise ValueError(
                                        "JPEG AC refinement size != 1")
                                val = p1 if getbits(1) else m1
                            while k <= se:
                                cv = c[base + k]
                                if cv != 0:
                                    if getbits(1) and (cv & p1) == 0:
                                        c[base + k] = cv + (p1 if cv >= 0
                                                            else m1)
                                else:
                                    if r == 0:
                                        break
                                    r -= 1
                                k += 1
                            if val != 0 and k <= se:
                                c[base + k] = val
                            k += 1
                    if eobrun > 0:
                        while k <= se:
                            cv = c[base + k]
                            if cv != 0 and getbits(1) and (cv & p1) == 0:
                                c[base + k] = cv + (p1 if cv >= 0 else m1)
                            k += 1
                        eobrun -= 1
            if state[0] > nbits:
                raise ValueError("JPEG entropy data exhausted")
            unit += 1
    if unit != total_units:
        raise ValueError("JPEG entropy data truncated")
    return nxt


def _jpeg_assemble(sof, geom, grids, qt) -> np.ndarray:
    """All scans decoded -> dequantize, inverse zigzag, one einsum IDCT
    over every block, vectorized raster assembly, chroma upsample, crop,
    BT.601 -> RGB."""
    h, w, comps = sof
    planes = {}
    for c in comps:
        cid = c["id"]
        g = geom[cid]
        if g["tq"] not in qt:
            raise ValueError("JPEG scan references missing DQT table")
        nbx_pad, nby_pad = g["nbx_pad"], g["nby_pad"]
        flat = np.zeros(nby_pad * nbx_pad * 64, np.int32)
        vals, vpos = grids[cid]
        if len(vals):       # list (baseline) or ndarray (progressive)
            flat[np.asarray(vpos, np.int64)] = np.asarray(vals, np.int32)
        z = np.zeros((nby_pad * nbx_pad, 64), np.int32)
        z[:, _ZIGZAG] = flat.reshape(-1, 64)        # de-zigzag
        f = z.astype(np.float64).reshape(-1, 8, 8) * \
            qt[g["tq"]][None, :, :]
        spatial = np.einsum("ux,nuv,vy->nxy", _DCT_A, f, _DCT_A)
        blocks = np.clip(np.rint(spatial) + 128, 0, 255).astype(np.uint8)
        # raster-order blocks -> plane, one reshape/transpose (no loop)
        plane = blocks.reshape(nby_pad, nbx_pad, 8, 8) \
            .transpose(0, 2, 1, 3).reshape(nby_pad * 8, nbx_pad * 8)
        # upsample to full resolution and crop
        plane = np.repeat(np.repeat(plane, g["vmax"] // g["v"], axis=0),
                          g["hmax"] // g["h"], axis=1)
        planes[cid] = plane[:h, :w]

    order = [c["id"] for c in comps]
    if len(order) == 1:
        return np.repeat(planes[order[0]][..., None], 3, axis=2)
    y, cb, cr = (planes[c] for c in order)
    return _yuv_to_rgb(y, cb, cr)


class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.nacc = 0

    def write(self, value: int, nbits: int):
        self.acc = (self.acc << nbits) | (value & ((1 << nbits) - 1))
        self.nacc += nbits
        while self.nacc >= 8:
            byte = (self.acc >> (self.nacc - 8)) & 0xFF
            self.out.append(byte)
            if byte == 0xFF:
                self.out.append(0x00)               # stuffing
            self.nacc -= 8
        self.acc &= (1 << self.nacc) - 1

    def flush(self):
        if self.nacc:
            self.write(0x7F, 8 - self.nacc)         # pad with 1s per T.81


def _fixed_huff_table(symbols: list[int]) -> tuple[list[int], list[int],
                                                   dict]:
    """All symbols at one code length L: trivially canonical and
    prefix-free. L = bit_length(nsym) guarantees 2^L > nsym, so the
    all-ones code (reserved by T.81) is never assigned.
    Returns (bits_counts, ordered_symbols, {sym: (code, L)})."""
    syms = sorted(set(symbols))
    length = max(1, len(syms).bit_length())
    counts = [0] * 16
    counts[length - 1] = len(syms)
    enc = {s: (c, length) for c, s in enumerate(syms)}
    return counts, syms, enc


def _quality_scale(base: np.ndarray, quality: int) -> np.ndarray:
    quality = min(100, max(1, quality))
    scale = 5000 // quality if quality < 50 else 200 - 2 * quality
    return np.clip((base * scale + 50) // 100, 1, 255).astype(np.int32)


def encode_jpeg(img: np.ndarray, quality: int = 90,
                subsample: bool = False, restart_interval: int = 0,
                interleaved: bool = True,
                progressive: bool = False) -> bytes:
    """uint8 image -> baseline JPEG (or progressive with progressive=True).
    (H, W) gray or (H, W, 3) RGB; subsample=True writes 4:2:0 chroma, else
    4:4:4. Huffman tables are per-image fixed-length (valid canonical
    tables emitted in DHT). interleaved=False writes one scan per component
    (legal baseline, T.81 A.2.2); supported for 4:4:4 without restart
    markers.

    progressive=True writes SOF2 with a successive-approximation +
    spectral-selection scan script (T.81 G.1.2): interleaved DC first scan
    at Al=1, DC refinement, then per component an AC first scan
    Ss=1..63/Al=1 and an AC refinement to Al=0 — all four progressive scan
    kinds, full-precision-exact (the scan script partitions the quantized
    coefficients bit-exactly, so decode equals the baseline decode of the
    same image). 4:4:4/gray only, no restart intervals."""
    gray = img.ndim == 2
    h, w = img.shape[:2]
    assert img.dtype == np.uint8
    if not interleaved and (subsample or restart_interval):
        raise ValueError("non-interleaved encode supports 4:4:4 without "
                         "restart intervals only")
    if progressive and (subsample or restart_interval):
        raise ValueError("progressive encode supports 4:4:4 without "
                         "restart intervals only")

    qluma = _quality_scale(_Q_LUMA, quality)
    qchroma = _quality_scale(_Q_CHROMA, quality)
    if gray:
        planes = [(img, qluma, 0, 1, 1)]
    else:
        y, cb, cr = _rgb_to_yuv(img)
        sub = 2 if subsample else 1
        if subsample:
            ph, pw = -(-h // 2) * 2, -(-w // 2) * 2
            cb = np.pad(cb, ((0, ph - h), (0, pw - w)), mode="edge")
            cr = np.pad(cr, ((0, ph - h), (0, pw - w)), mode="edge")
            cb = cb.reshape(ph // 2, 2, pw // 2, 2).mean(axis=(1, 3))
            cr = cr.reshape(ph // 2, 2, pw // 2, 2).mean(axis=(1, 3))
            cb = np.clip(np.rint(cb), 0, 255).astype(np.uint8)
            cr = np.clip(np.rint(cr), 0, 255).astype(np.uint8)
        planes = [(y, qluma, 0, sub, sub), (cb, qchroma, 1, 1, 1),
                  (cr, qchroma, 1, 1, 1)]

    hmax = max(p[3] for p in planes)
    vmax = max(p[4] for p in planes)
    mcus_x = -(-w // (8 * hmax))
    mcus_y = -(-h // (8 * vmax))

    # per-plane blocks in MCU order, quantized zigzag coefficients
    comp_blocks = []
    for plane, qtab, _tq, ch_, cv_ in planes:
        ph, pw = mcus_y * cv_ * 8, mcus_x * ch_ * 8
        padded = np.pad(plane, ((0, ph - plane.shape[0]),
                                (0, pw - plane.shape[1])), mode="edge")
        f = padded.astype(np.float64) - 128.0
        blocks = f.reshape(ph // 8, 8, pw // 8, 8).transpose(0, 2, 1, 3)
        coef = np.einsum("ux,nmxy,vy->nmuv", _DCT_A, blocks, _DCT_A)
        q = np.rint(coef / qtab[None, None]).astype(np.int32)
        # reorder to MCU traversal: (mcu_y, mcu_x, by, bx)
        nby, nbx = ph // 8, pw // 8
        q = q.reshape(mcus_y, cv_, mcus_x, ch_, 8, 8) \
            .transpose(0, 2, 1, 3, 4, 5).reshape(-1, 64)[:, _ZIGZAG]
        assert nby * nbx == q.shape[0]
        comp_blocks.append(q)

    if progressive:
        # 4:4:4/gray: MCU order == component raster order, so comp_blocks
        # serve the per-component AC scans directly
        return _encode_jpeg_progressive(h, w, gray, planes, comp_blocks,
                                        qluma, qchroma)

    # entropy symbol streams (collect symbols first to build tables)
    def _cat(v: int) -> int:
        return int(abs(v)).bit_length()

    dc_syms = [[], []]
    ac_syms = [[], []]
    per_comp_tokens = []
    for ci, (plane, qtab, tclass, ch_, cv_) in enumerate(planes):
        toks = []
        blocks = comp_blocks[ci]
        n_per_mcu = ch_ * cv_
        pred = 0
        for bi in range(blocks.shape[0]):
            if restart_interval and bi % (restart_interval * n_per_mcu) == 0:
                pred = 0
            blk = blocks[bi]
            diff = int(blk[0]) - pred
            pred = int(blk[0])
            s = _cat(diff)
            dc_syms[tclass].append(s)
            toks.append(("dc", s, diff))
            run = 0
            for k in range(1, 64):
                v = int(blk[k])
                if v == 0:
                    run += 1
                    continue
                while run > 15:
                    ac_syms[tclass].append(0xF0)
                    toks.append(("ac", 0xF0, 0))
                    run -= 16
                s = _cat(v)
                ac_syms[tclass].append((run << 4) | s)
                toks.append(("ac", (run << 4) | s, v))
                run = 0
            if run:
                ac_syms[tclass].append(0x00)
                toks.append(("ac", 0x00, 0))
        per_comp_tokens.append(toks)

    tables = {}
    for tclass in (0, 1):
        if dc_syms[tclass]:
            tables[(0, tclass)] = _fixed_huff_table(dc_syms[tclass] or [0])
            tables[(1, tclass)] = _fixed_huff_table(ac_syms[tclass] or [0])

    # headers
    out = bytearray(b"\xff\xd8")

    def seg(marker: int, payload: bytes):
        out.extend(b"\xff" + bytes([marker])
                   + struct.pack(">H", len(payload) + 2) + payload)

    # DQT payload is zigzag-ordered: file[k] = natural[_ZIGZAG[k]]
    dqt = bytes([0]) + bytes(qluma.reshape(64)[_ZIGZAG].astype(np.uint8))
    if not gray:
        dqt += bytes([1]) + bytes(qchroma.reshape(64)[_ZIGZAG]
                                  .astype(np.uint8))
    seg(0xDB, dqt)
    ncomp = 1 if gray else 3
    sof = struct.pack(">BHHB", 8, h, w, ncomp)
    for ci, (plane, qtab, tq, ch_, cv_) in enumerate(planes):
        sof += struct.pack(">BBB", ci + 1, (ch_ << 4) | cv_, tq)
    seg(0xC0, sof)
    dht = b""
    for (tc, th), (counts, syms, _enc) in sorted(tables.items()):
        dht += bytes([(tc << 4) | th]) + bytes(counts) + bytes(syms)
    seg(0xC4, dht)
    if restart_interval:
        seg(0xDD, struct.pack(">H", restart_interval))

    def _write_block(wtr, toks, dc_enc, ac_enc):
        for kind, sym, val in toks:
            code, ln = (dc_enc if kind == "dc" else ac_enc)[sym]
            wtr.write(code, ln)
            size = sym if kind == "dc" else sym & 15
            if size:
                wtr.write(val if val >= 0 else val + (1 << size) - 1, size)

    # token streams are flat per component; each block is (1 dc + variable
    # ac) tokens — split them block-aligned for MCU interleaving
    block_tokens = []
    for toks in per_comp_tokens:
        per_block = []
        cur = []
        for t in toks:
            if t[0] == "dc" and cur:
                per_block.append(cur)
                cur = []
            cur.append(t)
        if cur:
            per_block.append(cur)
        block_tokens.append(per_block)

    if not interleaved:
        # one scan per component in SOF order (T.81 A.2.2); 4:4:4 means
        # the component block grid equals the MCU grid, so the per-comp
        # token stream is already in non-interleaved raster order
        for ci in range(ncomp):
            tclass = planes[ci][2]
            seg(0xDA, bytes([1]) + struct.pack(
                ">BB", ci + 1, (tclass << 4) | tclass) + b"\x00\x3f\x00")
            wtr = _BitWriter()
            dc_enc = tables[(0, tclass)][2]
            ac_enc = tables[(1, tclass)][2]
            for toks in block_tokens[ci]:
                _write_block(wtr, toks, dc_enc, ac_enc)
            wtr.flush()
            out.extend(wtr.out)
        out.extend(b"\xff\xd9")
        return bytes(out)

    sos = bytes([ncomp])
    for ci in range(ncomp):
        tclass = planes[ci][2]
        sos += struct.pack(">BB", ci + 1, (tclass << 4) | tclass)
    sos += b"\x00\x3f\x00"
    seg(0xDA, sos)

    # interleave tokens per MCU and write bits
    wtr = _BitWriter()
    n_mcus = mcus_x * mcus_y
    cursors = [0] * len(planes)
    encs = [(tables[(0, p[2])][2], tables[(1, p[2])][2]) for p in planes]
    for m in range(n_mcus):
        if restart_interval and m and m % restart_interval == 0:
            wtr.flush()
            out.extend(wtr.out)
            wtr = _BitWriter()
            out.extend(b"\xff" + bytes([0xD0 + ((m // restart_interval - 1)
                                                & 7)]))
        for ci, (plane, qtab, tclass, ch_, cv_) in enumerate(planes):
            dc_enc, ac_enc = encs[ci]
            for _ in range(ch_ * cv_):
                _write_block(wtr, block_tokens[ci][cursors[ci]],
                             dc_enc, ac_enc)
                cursors[ci] += 1
    wtr.flush()
    out.extend(wtr.out)
    out.extend(b"\xff\xd9")
    return bytes(out)


def _prog_dc_first_ops(comp_blocks, tclasses, al):
    """Interleaved DC first scan (Ah=0): per block, the category symbol and
    extension bits of the delta of the point-transformed DC (arithmetic
    right shift by al, T.81 G.1.2.1)."""
    ops = []
    preds = [0] * len(comp_blocks)
    nb = comp_blocks[0].shape[0]
    for bi in range(nb):
        for ci, blocks in enumerate(comp_blocks):
            v = int(blocks[bi][0]) >> al
            diff = v - preds[ci]
            preds[ci] = v
            s = abs(diff).bit_length()
            ops.append(("sym", 0, tclasses[ci], s))
            if s:
                ops.append(("bits",
                            diff if diff >= 0 else diff + (1 << s) - 1, s))
    return ops


def _prog_dc_refine_ops(comp_blocks, al):
    """Interleaved DC refinement (Ah=al+1): one raw bit per block — the
    al-th bit of the two's-complement DC (decoder ORs it in)."""
    ops = []
    nb = comp_blocks[0].shape[0]
    for bi in range(nb):
        for blocks in comp_blocks:
            ops.append(("bits", (int(blocks[bi][0]) >> al) & 1, 1))
    return ops


def _prog_ac_first_ops(blocks, tclass, al):
    """Single-component AC first scan (Ss=1..63, Ah=0): baseline-style RLE
    of the point-transformed magnitudes with EOB-run folding (G.1.2.2)."""
    ops = []
    eobrun = 0

    def emit_eobrun():
        nonlocal eobrun
        if eobrun > 0:
            nb_ = eobrun.bit_length() - 1
            ops.append(("sym", 1, tclass, nb_ << 4))
            if nb_:
                ops.append(("bits", eobrun & ((1 << nb_) - 1), nb_))
            eobrun = 0

    for blk in blocks:
        r = 0
        for k in range(1, 64):
            v = int(blk[k])
            t = abs(v) >> al
            if t == 0:
                r += 1
                continue
            emit_eobrun()
            while r > 15:
                ops.append(("sym", 1, tclass, 0xF0))
                r -= 16
            s = t.bit_length()
            ops.append(("sym", 1, tclass, (r << 4) | s))
            tv = t if v > 0 else -t
            ops.append(("bits", tv if tv >= 0 else tv + (1 << s) - 1, s))
            r = 0
        if r > 0:
            eobrun += 1
            if eobrun == 0x7FFE:
                emit_eobrun()
    emit_eobrun()
    return ops


def _prog_ac_refine_ops(blocks, tclass, al):
    """Single-component AC refinement scan (Ah=al+1 -> Al=al): the
    correction-bit algorithm of T.81 G.1.2.3 — new coefficients (point-
    transformed magnitude exactly 1) are coded with run/sign, previously-
    nonzero coefficients contribute one buffered correction bit each, and
    all-zero tails fold into EOB runs whose buffered bits flush with the
    EOBn symbol."""
    ops = []
    eobrun = 0
    be_bits: list[int] = []

    def emit_eobrun():
        nonlocal eobrun, be_bits
        if eobrun > 0:
            nb_ = eobrun.bit_length() - 1
            ops.append(("sym", 1, tclass, nb_ << 4))
            if nb_:
                ops.append(("bits", eobrun & ((1 << nb_) - 1), nb_))
            for b in be_bits:
                ops.append(("bits", b, 1))
            be_bits = []
            eobrun = 0

    for blk in blocks:
        temp = [abs(int(blk[k])) >> al for k in range(64)]
        eob = 0
        for k in range(1, 64):
            if temp[k] == 1:
                eob = k
        r = 0
        br: list[int] = []
        for k in range(1, 64):
            t = temp[k]
            if t == 0:
                r += 1
                continue
            while r > 15 and k <= eob:
                emit_eobrun()
                ops.append(("sym", 1, tclass, 0xF0))
                r -= 16
                for b in br:
                    ops.append(("bits", b, 1))
                br = []
            if t > 1:               # history coefficient: correction bit
                br.append(t & 1)
                continue
            emit_eobrun()           # newly appearing coefficient
            ops.append(("sym", 1, tclass, (r << 4) | 1))
            ops.append(("bits", 1 if int(blk[k]) > 0 else 0, 1))
            for b in br:
                ops.append(("bits", b, 1))
            br = []
            r = 0
        if r > 0 or br:
            eobrun += 1
            be_bits.extend(br)
            if eobrun == 0x7FFE:
                emit_eobrun()
    emit_eobrun()
    return ops


def _encode_jpeg_progressive(h, w, gray, planes, comp_blocks,
                             qluma, qchroma) -> bytes:
    """Emit the SOF2 container + four-kind scan script over the already-
    quantized zigzag blocks (see encode_jpeg(progressive=True))."""
    tclasses = [p[2] for p in planes]
    ncomp = len(planes)
    scans = []   # (sos_header_bytes, ops)
    al = 1

    def sos_hdr(comp_ids, tds, tas, ss, se, ah, al_):
        b = bytes([len(comp_ids)])
        for cid, td, ta in zip(comp_ids, tds, tas):
            b += struct.pack(">BB", cid, (td << 4) | ta)
        return b + bytes([ss, se, (ah << 4) | al_])

    all_ids = list(range(1, ncomp + 1))
    scans.append((sos_hdr(all_ids, tclasses, [0] * ncomp, 0, 0, 0, al),
                  _prog_dc_first_ops(comp_blocks, tclasses, al)))
    scans.append((sos_hdr(all_ids, [0] * ncomp, [0] * ncomp, 0, 0, al, 0),
                  _prog_dc_refine_ops(comp_blocks, 0)))
    for ci in range(ncomp):
        tc = tclasses[ci]
        scans.append((sos_hdr([ci + 1], [0], [tc], 1, 63, 0, al),
                      _prog_ac_first_ops(comp_blocks[ci], tc, al)))
        scans.append((sos_hdr([ci + 1], [0], [tc], 1, 63, al, 0),
                      _prog_ac_refine_ops(comp_blocks[ci], tc, 0)))

    # Huffman alphabets per (class, tclass) across all scans
    sym_sets: dict[tuple[int, int], list] = {}
    for _hdr, ops in scans:
        for op in ops:
            if op[0] == "sym":
                sym_sets.setdefault((op[1], op[2]), []).append(op[3])
    tables = {key: _fixed_huff_table(syms)
              for key, syms in sym_sets.items()}

    out = bytearray(b"\xff\xd8")

    def seg(marker: int, payload: bytes):
        out.extend(b"\xff" + bytes([marker])
                   + struct.pack(">H", len(payload) + 2) + payload)

    dqt = bytes([0]) + bytes(qluma.reshape(64)[_ZIGZAG].astype(np.uint8))
    if not gray:
        dqt += bytes([1]) + bytes(qchroma.reshape(64)[_ZIGZAG]
                                  .astype(np.uint8))
    seg(0xDB, dqt)
    sof = struct.pack(">BHHB", 8, h, w, ncomp)
    for ci, (_plane, _q, tq, ch_, cv_) in enumerate(planes):
        sof += struct.pack(">BBB", ci + 1, (ch_ << 4) | cv_, tq)
    seg(0xC2, sof)
    dht = b""
    for (tc, th), (counts, syms, _enc) in sorted(tables.items()):
        dht += bytes([(tc << 4) | th]) + bytes(counts) + bytes(syms)
    seg(0xC4, dht)
    for hdr, ops in scans:
        seg(0xDA, hdr)
        wtr = _BitWriter()
        for op in ops:
            if op[0] == "sym":
                code, ln = tables[(op[1], op[2])][2][op[3]]
                wtr.write(code, ln)
            else:
                wtr.write(op[1], op[2])
        wtr.flush()
        out.extend(wtr.out)
    out.extend(b"\xff\xd9")
    return bytes(out)


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
        if len(body) < ln:
            # a short chunk body means the payload was truncated — fail
            # loudly (the shared corrupt-payload contract) instead of
            # silently decoding a shorter waveform
            raise ValueError(f"truncated WAV {cid!r} chunk "
                             f"({len(body)} of {ln} bytes)")
        if cid == b"fmt ":
            if len(body) < 16:
                raise ValueError("truncated WAV fmt chunk")
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
    if fmt == "jpeg":
        return (encode_jpeg(img, quality=int(rng.integers(75, 96)),
                            subsample=bool(rng.integers(0, 2))),
                "image/jpeg", w, h)
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
