"""Image kernels: PNG codec, deterministic lossy codec, phash64, PSNR,
size classes.

The lossless path is REAL PNG (round 4 — formerly a stub): a pure
numpy + stdlib-zlib implementation of the public PNG specification
(RFC 2083 / W3C PNG): chunked container with CRC32, zlib-compressed
scanlines, all five line filters (None/Sub/Up/Average/Paeth) on
decode, 8-bit gray/RGB/RGBA color types. The pipeline's ``fmt='png'``
images are genuine PNG bytes any external tool can open. The lossy
path is REAL baseline JPEG too (round 4, functions/jpeg.py — pure
numpy T.81: DCT + Annex-K quant/Huffman on encode; full baseline
decode incl. subsampling and restart intervals):

- ``fmt='png'``  -> real PNG: exact roundtrip (encoder emits filter 0;
  decoder handles all filters, so foreign PNGs decode too).
- ``fmt='jpeg'`` -> real JFIF JPEG at quality 100 (all-ones quant
  tables): loss is DCT/chroma float rounding only, PSNR >> the 40 dB
  invariant from BASELINE.json::input_hint. Legacy PCS1 lossy blobs
  (pre-round-4 snapshots) still decode via the PCS1 branch.

All kernels are numpy-vectorized and wrapped by Arrow pandas UDFs in
operators/multimodal.py — no per-row Python in the data plane.

Reference analogs: byte-size small classification <= 2800
(/root/reference/crawler/weixin_public.py:322-325, SURVEY F16); format
from wx_fmt query param (weixin_public.py:269-275, X3); re-host id
scheme replaced by deterministic xxhash64 ids (X7/K5).
"""

from __future__ import annotations

import zlib

import numpy as np

from . import jpeg as JPEG

MAGIC = b"PCS1"
MODE_LOSSLESS = 0
MODE_LOSSY = 1
LOSSY_Q = 6  # quantization step; MSE ~ Q^2/12 = 3 -> PSNR ~ 43 dB
JPEG_QUALITY = 100  # all-ones quant tables: loss = rounding only
SMALL_IMAGE_MAX_BYTES = 2800  # weixin_public.py:324 boundary, inclusive


def encode_image(pixels: np.ndarray, fmt: str) -> bytes:
    """Encode an (h, w, 3) uint8 array. fmt in {'png','jpeg',
    'jpeg_progressive'}. 'png' emits a REAL PNG file (encode_png);
    'jpeg' a REAL baseline JFIF JPEG (functions/jpeg.py, round 4);
    'jpeg_progressive' a REAL SOF2 progressive JPEG
    (functions/jpeg_progressive.py, round 5 — at the same quality its
    pixels decode bit-identical to the baseline encoding).
    JPEG_QUALITY=100 keeps the codec's loss to DCT/chroma rounding,
    holding the PSNR>=40dB input_hint invariant even on random-noise
    synthetic images (the hardest DCT case)."""
    if pixels.dtype != np.uint8 or pixels.ndim != 3 or pixels.shape[2] != 3:
        raise ValueError("pixels must be (h, w, 3) uint8")
    if fmt == "png":
        return encode_png(pixels)
    if fmt == "png_interlaced":
        return encode_png(pixels, interlace=True)
    if fmt == "jpeg_progressive":
        from . import jpeg_progressive as JPEG_P

        return JPEG_P.encode_jpeg_progressive(pixels, quality=JPEG_QUALITY)
    if fmt != "jpeg":
        raise ValueError(f"unknown fmt {fmt!r}")
    return JPEG.encode_jpeg(pixels, quality=JPEG_QUALITY)


def encode_pcs1_lossy(pixels: np.ndarray) -> bytes:
    """Legacy deterministic lossy container (uniform quantization +
    zlib). Kept for decode compatibility with pre-round-4 snapshots;
    the pipeline now encodes real JPEG."""
    h, w = pixels.shape[:2]
    payload = (pixels // LOSSY_Q).astype(np.uint8).tobytes()
    header = MAGIC + bytes([MODE_LOSSY]) + w.to_bytes(2, "big") + h.to_bytes(2, "big")
    return header + zlib.compress(payload, 6)


def decode_image(data: bytes) -> tuple[int, int, str, np.ndarray]:
    """Decode image bytes -> (w, h, fmt, (h,w,3) uint8 pixels).
    Dispatches on signature: PCS1 (the legacy lossy container) here,
    everything else to decode_standard (real PNG/JPEG/GIF)."""
    if data[:4] != MAGIC:
        return decode_standard(data)
    mode = data[4]
    w = int.from_bytes(data[5:7], "big")
    h = int.from_bytes(data[7:9], "big")
    raw = np.frombuffer(zlib.decompress(data[9:]), dtype=np.uint8).reshape(h, w, 3)
    if mode == MODE_LOSSLESS:
        return w, h, "png", raw.copy()
    # dequantize to bin centers, clip to valid range
    px = np.minimum(raw.astype(np.int32) * LOSSY_Q + LOSSY_Q // 2, 255).astype(np.uint8)
    return w, h, "jpeg", px


# ------------------------------------------------------------- real PNG
# Pure numpy + stdlib zlib implementation of the public PNG spec
# (W3C PNG / RFC 2083). No library, no stub: these bytes interoperate
# with any PNG tool. Supported on decode: 8-bit depth, color types 0
# (gray), 2 (RGB), 4 (gray+alpha), 6 (RGBA), all five scanline
# filters, and both interlace methods (Adam7 added round 5: seven
# independently-filtered passes scattered back onto strided grids).

_PNG_SIG = b"\x89PNG\r\n\x1a\n"
_JPEG_SIG = b"\xff\xd8\xff"


def _chunk(ctype: bytes, body: bytes) -> bytes:
    return (
        len(body).to_bytes(4, "big")
        + ctype
        + body
        + (zlib.crc32(ctype + body) & 0xFFFFFFFF).to_bytes(4, "big")
    )


# Adam7 pass origins and strides (PNG spec §8.2): (x0, y0, dx, dy)
_ADAM7 = [
    (0, 0, 8, 8),
    (4, 0, 8, 8),
    (0, 4, 4, 8),
    (2, 0, 4, 4),
    (0, 2, 2, 4),
    (1, 0, 2, 2),
    (0, 1, 1, 2),
]


def encode_png(pixels: np.ndarray, interlace: bool = False) -> bytes:
    """(h, w, 3) uint8 -> real PNG bytes (color type 2).
    Non-interlaced uses filter 0 on every scanline; interlace=True
    emits Adam7 passes, each filtered with Up (type 2, predictor reset
    at every pass start — the spec's each-pass-is-its-own-image rule,
    which doubles as the decoder's test vector for it)."""
    h, w = pixels.shape[:2]
    ihdr = (
        w.to_bytes(4, "big") + h.to_bytes(4, "big")
        + bytes([8, 2, 0, 0, int(interlace)])  # depth 8, RGB, deflate, adaptive
    )
    if not interlace:
        # filter byte 0 prepended to each scanline
        lines = np.concatenate(
            [np.zeros((h, 1), dtype=np.uint8), pixels.reshape(h, w * 3)], axis=1
        )
        raw = lines.tobytes()
    else:
        parts = []
        for x0, y0, dx, dy in _ADAM7:
            sub = pixels[y0::dy, x0::dx]
            ph, pw = sub.shape[:2]
            if ph == 0 or pw == 0:
                continue  # empty pass emits nothing (spec §8.2)
            lines = sub.reshape(ph, pw * 3).astype(np.int16)
            prev = np.vstack([np.zeros((1, pw * 3), dtype=np.int16), lines[:-1]])
            diff = ((lines - prev) % 256).astype(np.uint8)
            parts.append(
                np.concatenate(
                    [np.full((ph, 1), 2, dtype=np.uint8), diff], axis=1
                ).tobytes()
            )
        raw = b"".join(parts)
    idat = zlib.compress(raw, 6)
    return _PNG_SIG + _chunk(b"IHDR", ihdr) + _chunk(b"IDAT", idat) + _chunk(b"IEND", b"")


def _paeth(a: np.ndarray, b: np.ndarray, c: np.ndarray) -> np.ndarray:
    """Paeth predictor (PNG spec §6.6), vectorized over the pixel's
    channels. a=left, b=up, c=up-left, int16 in/uint8-safe out."""
    p = a + b - c
    pa, pb, pc = np.abs(p - a), np.abs(p - b), np.abs(p - c)
    out = np.where((pa <= pb) & (pa <= pc), a, np.where(pb <= pc, b, c))
    return out


def _unfilter(raw, w: int, h: int, channels: int) -> np.ndarray:
    """Reverse PNG scanline filtering (spec §6.6) for one image or one
    Adam7 pass: (h * (1 + w*channels)) filter-prefixed bytes ->
    (h, w*channels) uint8. The up/left predictors start at zero — per
    pass, not per file (each pass is its own image)."""
    stride = w * channels
    arr = np.frombuffer(raw, dtype=np.uint8, count=h * (stride + 1)).reshape(
        h, stride + 1
    )
    filters = arr[:, 0]
    lines = arr[:, 1:].astype(np.int16)
    out = np.empty((h, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.int16)
    bpp = channels
    for y in range(h):
        f, cur = int(filters[y]), lines[y]
        if f == 0:  # None
            rec = cur
        elif f == 1:  # Sub: cumulative sum per channel offset, mod 256
            rec = np.cumsum(cur.reshape(w, bpp), axis=0, dtype=np.int64).reshape(stride) % 256
        elif f == 2:  # Up
            rec = (cur + prev) % 256
        elif f == 3:  # Average: left-sequential per pixel
            rec = np.empty(stride, dtype=np.int16)
            left = np.zeros(bpp, dtype=np.int16)
            for x in range(0, stride, bpp):
                left = (cur[x : x + bpp] + ((left + prev[x : x + bpp]) >> 1)) % 256
                rec[x : x + bpp] = left
        elif f == 4:  # Paeth: left-sequential per pixel
            rec = np.empty(stride, dtype=np.int16)
            left = np.zeros(bpp, dtype=np.int16)
            upleft = np.zeros(bpp, dtype=np.int16)
            for x in range(0, stride, bpp):
                up = prev[x : x + bpp]
                left = (cur[x : x + bpp] + _paeth(left, up, upleft)) % 256
                rec[x : x + bpp] = left
                upleft = up
        else:
            raise ValueError(f"bad PNG filter {f} on line {y}")
        out[y] = rec.astype(np.uint8)
        prev = rec.astype(np.int16)
    return out


def decode_png(data: bytes) -> tuple[int, int, str, np.ndarray]:
    """Real PNG bytes -> (w, h, 'png', (h,w,3) uint8). Alpha is
    dropped (the pipeline's schema is RGB); gray replicates. Both
    interlace methods decode (Adam7 added round 5)."""
    if data[:8] != _PNG_SIG:
        raise ValueError("not a PNG: bad signature")
    pos, w = 8, None
    idat = bytearray()
    h = depth = ctype = interlace = None
    while pos + 8 <= len(data):
        ln = int.from_bytes(data[pos : pos + 4], "big")
        typ = data[pos + 4 : pos + 8]
        body = data[pos + 8 : pos + 8 + ln]
        pos += 12 + ln  # len + type + body + crc (crc not verified: tolerant read)
        if typ == b"IHDR":
            w = int.from_bytes(body[0:4], "big")
            h = int.from_bytes(body[4:8], "big")
            depth, ctype, interlace = body[8], body[9], body[12]
        elif typ == b"IDAT":
            idat += body
        elif typ == b"IEND":
            break
    if w is None or h is None:
        raise ValueError("PNG missing IHDR")
    if depth != 8:
        raise ValueError(f"unsupported PNG bit depth {depth} (8 only)")
    channels = {0: 1, 2: 3, 4: 2, 6: 4}.get(ctype)
    if channels is None:
        raise ValueError(f"unsupported PNG color type {ctype}")
    raw = zlib.decompress(bytes(idat))
    if interlace == 0:
        px = _unfilter(raw, w, h, channels).reshape(h, w, channels)
    elif interlace == 1:
        # Adam7: seven independently-filtered sub-images in one zlib
        # stream, scattered back onto the (y0::dy, x0::dx) grids
        px = np.zeros((h, w, channels), dtype=np.uint8)
        off = 0
        for x0, y0, dx, dy in _ADAM7:
            pw = max(0, -(-(w - x0) // dx))
            ph = max(0, -(-(h - y0) // dy))
            if pw == 0 or ph == 0:
                continue
            n = ph * (1 + pw * channels)
            sub = _unfilter(raw[off : off + n], pw, ph, channels)
            off += n
            px[y0::dy, x0::dx] = sub.reshape(ph, pw, channels)
    else:
        raise ValueError(f"bad PNG interlace method {interlace}")
    if ctype == 0:
        px = np.repeat(px, 3, axis=2)
    elif ctype == 4:
        px = np.repeat(px[:, :, :1], 3, axis=2)
    elif ctype == 6:
        px = px[:, :, :3].copy()
    return w, h, "png", px


def decode_standard(data: bytes) -> tuple[int, int, str, np.ndarray]:
    """Standard formats by signature — all real as of round 4 (the
    reference's wire formats are exactly JPEG/PNG/GIF,
    weixin_public.py:315-321): PNG via :func:`decode_png` (numpy +
    zlib), JPEG via functions/jpeg.decode_jpeg (numpy-only T.81:
    Huffman + dequant + batched IDCT, subsampling, restart intervals,
    grayscale, and — round 5 — progressive/SOF2 and sequential
    multi-scan via functions/jpeg_progressive.py), GIF via
    functions/gif.decode_gif (LZW + palettes + interlace; first frame
    here, full animation via functions/gif.decode_gif_frames)."""
    if data[:8] == _PNG_SIG:
        fmt, dec = "png", decode_png
    elif data[:3] == _JPEG_SIG:
        fmt, dec = "jpeg", JPEG.decode_jpeg
    elif data[:6] in (b"GIF87a", b"GIF89a"):
        from . import gif as GIF

        fmt, dec = "gif", GIF.decode_gif
    else:
        raise ValueError(f"unrecognized image signature {data[:4]!r}")
    # Typed-failure boundary: a crawler feeds this ARBITRARY web bytes,
    # and the internal decoders walk untrusted offsets/codes — zlib
    # errors, short reads (struct/IndexError), and bogus code tables
    # (KeyError) are all just "malformed stream" to the caller.
    # ValueError is the single decode-failure type (fuzz-pinned in
    # tests); NotImplementedError still escapes untouched — it marks a
    # VALID stream using an unimplemented library-class feature, the
    # repo's documented loud seam, not corruption.
    try:
        return dec(data)
    except (ValueError, NotImplementedError):
        raise
    except Exception as e:
        raise ValueError(
            f"malformed {fmt} stream: {type(e).__name__}: {e}"
        ) from e


def resize_bilinear(pixels: np.ndarray, out_h: int, out_w: int) -> np.ndarray:
    """Deterministic bilinear resize of an (h, w, 3) uint8 image —
    REAL implementation (pure numpy, half-pixel centers like
    PIL/OpenCV), not a stub: resizing is pixel math, not codec work,
    so it needs no image library."""
    h, w = pixels.shape[:2]
    if (out_h, out_w) == (h, w):
        return pixels.copy()
    y = (np.arange(out_h) + 0.5) * h / out_h - 0.5
    x = (np.arange(out_w) + 0.5) * w / out_w - 0.5
    y0 = np.clip(np.floor(y).astype(int), 0, h - 1)
    y1 = np.clip(y0 + 1, 0, h - 1)
    x0 = np.clip(np.floor(x).astype(int), 0, w - 1)
    x1 = np.clip(x0 + 1, 0, w - 1)
    wy = np.clip(y - y0, 0.0, 1.0)[:, None, None]
    wx = np.clip(x - x0, 0.0, 1.0)[None, :, None]
    p = pixels.astype(np.float64)
    top = p[y0][:, x0] * (1 - wx) + p[y0][:, x1] * wx
    bot = p[y1][:, x0] * (1 - wx) + p[y1][:, x1] * wx
    out = top * (1 - wy) + bot * wy
    return np.clip(np.round(out), 0, 255).astype(np.uint8)


def thumbnail_dims(h: int, w: int, max_side: int) -> tuple[int, int]:
    """Aspect-preserving (h, w) with the longer side capped at
    max_side; never upscales."""
    side = max(h, w)
    if side <= max_side:
        return h, w
    scale = max_side / side
    return max(1, round(h * scale)), max(1, round(w * scale))


def to_gray(pixels: np.ndarray) -> np.ndarray:
    """ITU-R 601 luma, float64 (h, w)."""
    p = pixels.astype(np.float64)
    return 0.299 * p[..., 0] + 0.587 * p[..., 1] + 0.114 * p[..., 2]


def phash64(pixels: np.ndarray) -> int:
    """64-bit perceptual hash: 8x8 block-mean grayscale thresholded at
    its median. Deterministic; robust to the codec's quantization."""
    g = to_gray(pixels)
    h, w = g.shape
    # block-mean downsample to 8x8 via cumulative trick (handles any h,w)
    ys = (np.arange(9) * h // 8).astype(int)
    xs = (np.arange(9) * w // 8).astype(int)
    cells = np.empty((8, 8))
    for i in range(8):
        for j in range(8):
            cells[i, j] = g[ys[i] : ys[i + 1], xs[j] : xs[j + 1]].mean()
    bits = (cells > np.median(cells)).flatten()
    val = 0
    for b in bits:
        val = (val << 1) | int(b)
    return val - (1 << 64) if val >= (1 << 63) else val  # signed long for Spark


def image_features(pixels: np.ndarray) -> tuple[float, float, float, float]:
    """Per-image visual statistics used by training-data curation
    filters (blank/flat-image gates, screenshot-vs-photo heuristics,
    LAION-style aesthetic pre-filters):
      mean_lum, std_lum — ITU-R 601 luminance mean and standard
        deviation (std ~ contrast; near-zero std = flat/blank image);
      edge_frac — fraction of horizontal+vertical neighbor pairs whose
        absolute luminance difference exceeds 24 (texture/edge
        density; near-zero = flat fill, near-one = noise);
      colorfulness — Hasler & Süsstrunk (2003) metric
        sqrt(std_rg^2 + std_yb^2) + 0.3*sqrt(mean_rg^2 + mean_yb^2)
        on the opponent axes rg = R-G, yb = (R+G)/2 - B.
    All float64; deterministic for fixed pixels (numpy pairwise
    summation is shape-deterministic)."""
    g = to_gray(pixels)
    mean_lum = float(g.mean())
    std_lum = float(g.std())
    gx = np.abs(np.diff(g, axis=1))
    gy = np.abs(np.diff(g, axis=0))
    n_pairs = gx.size + gy.size
    edge_frac = float(((gx > 24).sum() + (gy > 24).sum()) / n_pairs) if n_pairs else 0.0
    p = pixels.astype(np.float64)
    rg = p[..., 0] - p[..., 1]
    yb = 0.5 * (p[..., 0] + p[..., 1]) - p[..., 2]
    colorfulness = float(
        np.sqrt(rg.std() ** 2 + yb.std() ** 2)
        + 0.3 * np.sqrt(rg.mean() ** 2 + yb.mean() ** 2)
    )
    return mean_lum, std_lum, edge_frac, colorfulness


def psnr(a: np.ndarray, b: np.ndarray) -> float:
    """Peak signal-to-noise ratio in dB between two uint8 images."""
    mse = np.mean((a.astype(np.float64) - b.astype(np.float64)) ** 2)
    if mse == 0:
        return float("inf")
    return 10.0 * np.log10(255.0**2 / mse)


def is_small(data: bytes) -> bool:
    """Reference small-image classification: byte size <= 2800
    (inclusive boundary, weixin_public.py:322-325)."""
    return len(data) <= SMALL_IMAGE_MAX_BYTES
