"""GIF87a codec from scratch — numpy + stdlib only.

Closes the gif-decode stub with a real implementation: GIF87a/89a with a
global or local color table, 4-pass interlacing (encode + decode), full
LZW compression/decompression (variable code width, clear/EOI codes,
code table growth to 12 bits), and GIF89a ANIMATION on both sides —
encode_gif_animation (full-frame, per-frame local palettes + delays) and
decode_gif_frames (composited frames: disposal methods 0-3, transparency,
sub-rectangle frames). decode_gif keeps the single-still contract (first
frame) for the image pipeline.

GIF is inherently palettized: images with <= 256 distinct colors
round-trip PIXEL-EXACT (the common case for real-web GIFs — logos, line
art, UI chrome). Richer images are quantized to a 256-entry palette
(6x7x6 color cube) at encode time; the decoder then reproduces the
QUANTIZED pixels exactly — the quantization is the format's semantics,
not codec error, and is pinned separately in tests/test_gif.py.
"""

from __future__ import annotations

import struct

import numpy as np


def is_gif(data: bytes) -> bool:
    return data[:6] in (b"GIF87a", b"GIF89a")


# --- palette ---------------------------------------------------------------


def _build_palette(px: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """(palette[n,3] uint8, indices[h,w]) — exact palette when the image has
    <= 256 distinct colors, else a 6x7x6 color-cube quantization."""
    h, w = px.shape[:2]
    flat = px.reshape(-1, 3)
    packed = (
        flat[:, 0].astype(np.int32) << 16
        | flat[:, 1].astype(np.int32) << 8
        | flat[:, 2].astype(np.int32)
    )
    uniq, inverse = np.unique(packed, return_inverse=True)
    if len(uniq) <= 256:
        pal = np.stack(
            [(uniq >> 16) & 0xFF, (uniq >> 8) & 0xFF, uniq & 0xFF], axis=1
        ).astype(np.uint8)
        return pal, inverse.reshape(h, w).astype(np.int32)
    # 6x7x6 cube (252 entries)
    r = np.minimum(flat[:, 0].astype(np.int32) * 6 // 256, 5)
    g = np.minimum(flat[:, 1].astype(np.int32) * 7 // 256, 6)
    b = np.minimum(flat[:, 2].astype(np.int32) * 6 // 256, 5)
    idx = (r * 7 + g) * 6 + b
    rr = np.arange(6) * 255 // 5
    gg = np.arange(7) * 255 // 6
    bb = np.arange(6) * 255 // 5
    pal = np.zeros((252, 3), dtype=np.uint8)
    k = 0
    for i in range(6):
        for j in range(7):
            for l in range(6):
                pal[k] = (rr[i], gg[j], bb[l])
                k += 1
    return pal, idx.reshape(h, w).astype(np.int32)


def quantize_for_gif(px: np.ndarray) -> np.ndarray:
    """The pixels a GIF round-trip reproduces exactly."""
    pal, idx = _build_palette(px)
    return pal[idx]


# --- LZW -------------------------------------------------------------------


def _lzw_encode(indices: np.ndarray, min_code_size: int) -> bytes:
    """Identical bitstream to the classic string-table formulation, two
    constant-factor rewrites (the jpegfn/webpfn vectorization discipline):
    the table is keyed by the integer pair (prefix_code << 8 | symbol) —
    isomorphic to keying by the expanded string, without building an
    O(match-length) bytes object per pixel — and the LSB-first bit packing
    is deferred to one numpy scatter over the emitted (code, width) list
    (bit positions are disjoint across codes, so three masked byte-adds
    can never carry)."""
    clear = 1 << min_code_size
    eoi = clear + 1
    codes: list[int] = []
    widths: list[int] = []
    table: dict[int, int] = {}
    next_code = eoi + 1
    width = min_code_size + 1
    codes.append(clear)
    widths.append(width)
    prefix = -1
    for v in indices.reshape(-1).tolist():
        if prefix < 0:
            prefix = v
            continue
        key = (prefix << 8) | v
        got = table.get(key)
        if got is not None:
            prefix = got
            continue
        codes.append(prefix)
        widths.append(width)
        if next_code < 4096:
            table[key] = next_code
            next_code += 1
            if next_code - 1 == (1 << width) and width < 12:
                width += 1
        else:
            codes.append(clear)
            widths.append(width)
            table.clear()
            next_code = eoi + 1
            width = min_code_size + 1
        prefix = v
    if prefix >= 0:
        codes.append(prefix)
        widths.append(width)
    codes.append(eoi)
    widths.append(width)
    ws = np.asarray(widths, dtype=np.int64)
    ends = np.cumsum(ws)
    offs = ends - ws
    total = int(ends[-1])
    out = np.zeros((total + 7) // 8 + 2, dtype=np.uint8)  # +2: 3-byte scatter slack
    big = np.asarray(codes, dtype=np.uint32) << (offs & 7).astype(np.uint32)
    byte0 = offs >> 3
    np.add.at(out, byte0, (big & 0xFF).astype(np.uint8))
    np.add.at(out, byte0 + 1, ((big >> 8) & 0xFF).astype(np.uint8))
    np.add.at(out, byte0 + 2, ((big >> 16) & 0xFF).astype(np.uint8))
    return out[: (total + 7) // 8].tobytes()


def _lzw_decode(data: bytes, min_code_size: int, n_pixels: int) -> np.ndarray:
    clear = 1 << min_code_size
    eoi = clear + 1
    pos = 0
    acc = 0
    nbits = 0

    def read(width: int) -> int:
        nonlocal pos, acc, nbits
        while nbits < width:
            if pos >= len(data):
                return eoi
            acc |= data[pos] << nbits
            pos += 1
            nbits += 8
        v = acc & ((1 << width) - 1)
        acc >>= width
        nbits -= width
        return v

    # Table entries are (start, length) back-references into the output
    # array itself: every non-root code's string was fully written to the
    # output at the moment the code was created (its prefix was the
    # just-emitted string and its final char is the next byte written), so
    # expansion is one numpy slice copy instead of a per-byte Python loop.
    out = np.empty(n_pixels, dtype=np.int32)
    n_out = 0
    starts = np.zeros(4096, dtype=np.int64)
    lens = np.zeros(4096, dtype=np.int64)
    next_code = eoi + 1
    width = min_code_size + 1
    prev_start = -1
    prev_len = 0
    while n_out < n_pixels:
        code = read(width)
        if code == clear:
            next_code = eoi + 1
            width = min_code_size + 1
            prev_start = -1
            continue
        if code == eoi:
            break
        if code < clear:
            ln = 1
            out[n_out] = code
        elif eoi < code < next_code:
            s, ln = int(starts[code]), int(lens[code])
            eff = min(ln, n_pixels - n_out)
            out[n_out : n_out + eff] = out[s : s + eff]
        elif code == next_code and prev_start >= 0:
            # KwKwK: entry = prev + prev[0]
            ln = prev_len + 1
            eff = min(prev_len, n_pixels - n_out)
            out[n_out : n_out + eff] = out[prev_start : prev_start + eff]
            if n_out + prev_len < n_pixels:
                out[n_out + prev_len] = out[prev_start]
        else:
            raise ValueError("corrupt LZW stream")
        if prev_start >= 0 and next_code < 4096:
            starts[next_code] = prev_start
            lens[next_code] = prev_len + 1
            next_code += 1
            if next_code == (1 << width) and width < 12:
                width += 1
        prev_start = n_out
        prev_len = ln
        n_out += ln
    if n_out < n_pixels:
        raise ValueError("truncated GIF pixel data")
    return out


# --- container -------------------------------------------------------------


def _interlace_order(h: int) -> np.ndarray:
    """Display-row index for each stored row, GIF 4-pass interlace:
    pass 1 rows 0,8,16.., pass 2 rows 4,12.., pass 3 rows 2,6,10..,
    pass 4 rows 1,3,5.. (GIF89a spec appendix E)."""
    return np.concatenate(
        [
            np.arange(0, h, 8),
            np.arange(4, h, 8),
            np.arange(2, h, 4),
            np.arange(1, h, 2),
        ]
    )


def encode_gif(pixels: np.ndarray, interlace: bool = False) -> bytes:
    """uint8 RGB (h, w, 3) or grayscale (h, w) -> GIF87a bytes.
    interlace=True stores rows in the 4-pass order and sets the image
    descriptor's interlace flag."""
    px = np.asarray(pixels)
    if px.ndim == 2:
        px = np.stack([px] * 3, axis=-1)
    if px.dtype != np.uint8 or px.ndim != 3 or px.shape[2] != 3:
        raise ValueError("encode_gif expects uint8 RGB (h, w, 3) or (h, w)")
    h, w = px.shape[:2]
    pal, idx = _build_palette(px)
    # global color table size: next power of two >= len(pal), min 2
    bits = max(1, int(np.ceil(np.log2(max(2, len(pal))))))
    gct = np.zeros((1 << bits, 3), dtype=np.uint8)
    gct[: len(pal)] = pal
    out = bytearray()
    out += b"GIF87a"
    out += struct.pack("<HHBBB", w, h, 0x80 | ((bits - 1) << 4) | (bits - 1), 0, 0)
    out += gct.tobytes()
    # image descriptor
    out += b"\x2c" + struct.pack("<HHHHB", 0, 0, w, h, 0x40 if interlace else 0)
    if interlace:
        idx = idx[_interlace_order(h)]
    min_code_size = max(2, bits)
    out += bytes([min_code_size])
    lzw = _lzw_encode(idx, min_code_size)
    for i in range(0, len(lzw), 255):
        chunk = lzw[i : i + 255]
        out += bytes([len(chunk)]) + chunk
    out += b"\x00"  # block terminator
    out += b"\x3b"  # trailer
    return bytes(out)


def _parse_image_block(
    data: bytes, pos: int, gct: np.ndarray | None
) -> tuple[np.ndarray, int, int, np.ndarray, int]:
    """Parse ONE image descriptor at ``data[pos] == 0x2C``: local color
    table, LZW sub-block concatenation, decode, deinterlace. Returns
    (palette-index array (ih, iw), ix, iy, color table, next pos) — the
    single implementation behind both the still decoder (first frame) and
    the animation compositor."""
    ix, iy, iw, ih, iflags = struct.unpack("<HHHHB", data[pos + 1 : pos + 10])
    pos += 10
    lct = gct
    if iflags & 0x80:
        n = 2 << (iflags & 0x07)
        lct = np.frombuffer(data[pos : pos + 3 * n], dtype=np.uint8).reshape(n, 3)
        pos += 3 * n
    if lct is None:
        raise ValueError("GIF without a color table")
    min_code_size = data[pos]
    pos += 1
    lzw = bytearray()
    while data[pos] != 0:
        ln = data[pos]
        lzw += data[pos + 1 : pos + 1 + ln]
        pos += 1 + ln
    pos += 1
    idx = _lzw_decode(bytes(lzw), min_code_size, iw * ih).reshape(ih, iw)
    if iflags & 0x40:  # deinterlace: stored row k is display row order[k]
        deinter = np.empty_like(idx)
        deinter[_interlace_order(ih)] = idx
        idx = deinter
    return idx, ix, iy, lct, pos


def decode_gif(data: bytes) -> np.ndarray:
    """GIF87a/89a bytes -> uint8 RGB (h, w, 3). Single-image, interlaced or
    sequential, global or local color table; 89a extension blocks are
    skipped."""
    if not is_gif(data):
        raise ValueError("not a GIF")
    w, h, flags, _bg, _ar = struct.unpack("<HHBBB", data[6:13])
    pos = 13
    gct = None
    if flags & 0x80:
        n = 2 << (flags & 0x07)
        gct = np.frombuffer(data[pos : pos + 3 * n], dtype=np.uint8).reshape(n, 3)
        pos += 3 * n
    while pos < len(data):
        b = data[pos]
        if b == 0x21:  # extension: skip sub-blocks
            pos += 2
            while data[pos] != 0:
                pos += 1 + data[pos]
            pos += 1
        elif b == 0x2C:  # image descriptor
            idx, ix, iy, lct, pos = _parse_image_block(data, pos, gct)
            ih, iw = idx.shape
            img = lct[np.clip(idx, 0, len(lct) - 1)].reshape(ih, iw, 3)
            if (iw, ih) != (w, h) or ix or iy:
                canvas = np.zeros((h, w, 3), dtype=np.uint8)
                canvas[iy : iy + ih, ix : ix + iw] = img
                return canvas
            return img.astype(np.uint8)
        elif b == 0x3B:
            break
        else:
            raise ValueError(f"unexpected GIF block 0x{b:02x}")
    raise ValueError("no image data in GIF")


# --- animation (GIF89a multi-frame) ----------------------------------------


def encode_gif_animation(
    frames: list[np.ndarray], delays_cs: list[int] | int = 10
) -> bytes:
    """List of uint8 RGB (h, w, 3) frames -> GIF89a animation bytes.

    Simplest valid form: every frame is a full-logical-screen image with
    its own LOCAL color table, preceded by a Graphic Control Extension
    carrying its delay (centiseconds) and disposal 1 (leave in place) —
    so frames with <= 256 distinct colors round-trip pixel-exact through
    :func:`decode_gif_frames` (richer frames reproduce their quantized
    pixels exactly, the still-image contract). A NETSCAPE2.0 loop block
    requests infinite looping, the common web default."""
    if not frames:
        raise ValueError("need at least one frame")
    if isinstance(delays_cs, int):
        delays_cs = [delays_cs] * len(frames)
    if len(delays_cs) != len(frames):
        raise ValueError("one delay per frame")
    norm = []
    for px in frames:
        px = np.asarray(px)
        if px.ndim == 2:
            px = np.stack([px] * 3, axis=-1)
        if px.dtype != np.uint8 or px.ndim != 3 or px.shape[2] != 3:
            raise ValueError("frames must be uint8 RGB (h, w, 3) or (h, w)")
        norm.append(px)
    h, w = norm[0].shape[:2]
    if any(px.shape[:2] != (h, w) for px in norm):
        raise ValueError("all frames must share one size")
    out = bytearray()
    out += b"GIF89a"
    out += struct.pack("<HHBBB", w, h, 0, 0, 0)  # no global color table
    # NETSCAPE2.0 application extension: loop forever
    out += b"\x21\xff\x0bNETSCAPE2.0\x03\x01\x00\x00\x00"
    for px, delay in zip(norm, delays_cs):
        out += b"\x21\xf9" + struct.pack(
            "<BBHBB", 4, 0x04, delay, 0, 0  # disposal 1, no transparency
        )
        pal, idx = _build_palette(px)
        bits = max(1, int(np.ceil(np.log2(max(2, len(pal))))))
        lct = np.zeros((1 << bits, 3), dtype=np.uint8)
        lct[: len(pal)] = pal
        out += b"\x2c" + struct.pack(
            "<HHHHB", 0, 0, w, h, 0x80 | (bits - 1)
        )
        out += lct.tobytes()
        min_code_size = max(2, bits)
        out += bytes([min_code_size])
        lzw = _lzw_encode(idx, min_code_size)
        for i in range(0, len(lzw), 255):
            chunk = lzw[i : i + 255]
            out += bytes([len(chunk)]) + chunk
        out += b"\x00"
    out += b"\x3b"
    return bytes(out)


def decode_gif_frames(data: bytes) -> tuple[list[np.ndarray], list[int]]:
    """GIF bytes -> (composited RGB frames, per-frame delays in
    centiseconds). Full GIF89a animation semantics per spec section 23:

    - Graphic Control Extension: delay, transparency index (transparent
      pixels keep the underlying canvas), disposal method;
    - disposal 0/1: leave the frame in place for the next one;
      disposal 2: restore the frame's rect to the background color
      (the logical-screen background index, black when there is no
      global color table); disposal 3: restore the canvas the frame
      was composited onto;
    - sub-rectangle frames composite at (left, top), interlaced or not.

    Still images (or animations with one frame) return one frame. The
    first-frame view equals :func:`decode_gif` for FULL-FRAME OPAQUE
    single-image files (the still contract: zero-filled canvas, no
    transparency); a sub-rect or transparent first frame composites over
    the background color here — the animation semantics — so the two
    views legitimately differ on such files."""
    if not is_gif(data):
        raise ValueError("not a GIF")
    w, h, flags, bg_idx, _ar = struct.unpack("<HHBBB", data[6:13])
    pos = 13
    gct = None
    if flags & 0x80:
        n = 2 << (flags & 0x07)
        gct = np.frombuffer(data[pos : pos + 3 * n], dtype=np.uint8).reshape(n, 3)
        pos += 3 * n
    bg_rgb = (
        gct[bg_idx] if gct is not None and bg_idx < len(gct)
        else np.zeros(3, dtype=np.uint8)
    )
    canvas = np.zeros((h, w, 3), dtype=np.uint8)
    canvas[:, :] = bg_rgb
    frames: list[np.ndarray] = []
    delays: list[int] = []
    # pending GCE state for the NEXT image descriptor
    delay_cs, disposal, trans_idx = 0, 0, None
    while pos < len(data):
        b = data[pos]
        if b == 0x21:
            label = data[pos + 1]
            pos += 2
            if label == 0xF9 and data[pos] >= 4:  # GCE
                packed, delay_cs, tcol = struct.unpack(
                    "<BHB", data[pos + 1 : pos + 5]
                )
                disposal = (packed >> 2) & 0x7
                trans_idx = tcol if packed & 0x01 else None
            while data[pos] != 0:
                pos += 1 + data[pos]
            pos += 1
        elif b == 0x2C:
            idx, ix, iy, lct, pos = _parse_image_block(data, pos, gct)
            ih, iw = idx.shape
            prev = canvas.copy() if disposal == 3 else None
            rect = canvas[iy : iy + ih, ix : ix + iw]
            img = lct[np.clip(idx, 0, len(lct) - 1)]
            if trans_idx is not None:
                mask = (idx != trans_idx)[:, :, None]
                rect[:] = np.where(mask, img, rect)
            else:
                rect[:] = img
            frames.append(canvas.copy())
            delays.append(delay_cs)
            if disposal == 2:
                canvas[iy : iy + ih, ix : ix + iw] = bg_rgb
            elif disposal == 3 and prev is not None:
                canvas = prev
            delay_cs, disposal, trans_idx = 0, 0, None
        elif b == 0x3B:
            break
        else:
            raise ValueError(f"unexpected GIF block 0x{b:02x}")
    if not frames:
        raise ValueError("no image data in GIF")
    return frames, delays
