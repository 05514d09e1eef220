"""From-scratch GIF87a codec (functions/giffn): LZW round-trips, palette
semantics (pixel-exact for <= 256 colors, quantized-exact otherwise), and
decode_image wiring."""

from __future__ import annotations

import numpy as np
import pytest

from scrapy_spark.functions import giffn
from scrapy_spark.functions.imagefn import decode_image


def test_palette_friendly_pixel_exact():
    """Real-web GIF content (logos, line art, <= 256 colors) round-trips
    PIXEL-EXACT — GIF is lossless within its palette."""
    logo = np.zeros((20, 30, 3), np.uint8)
    logo[5:15, 5:25] = (200, 30, 30)
    logo[8:12, 10:20] = (30, 30, 200)
    out = giffn.decode_gif(giffn.encode_gif(logo))
    assert np.array_equal(out, logo)


def test_grayscale_256_colors_exact():
    ramp = np.tile(np.arange(256, dtype=np.uint8), (4, 1))
    out = giffn.decode_gif(giffn.encode_gif(ramp))
    assert np.array_equal(out, np.stack([ramp] * 3, axis=-1))


def test_rich_image_quantized_exact():
    """>256-color content quantizes at encode time; the DECODER then
    reproduces the quantized pixels exactly — quantization is format
    semantics, not codec error."""
    rng = np.random.default_rng(3)
    noise = rng.integers(0, 256, (15, 21, 3), dtype=np.uint8)
    out = giffn.decode_gif(giffn.encode_gif(noise))
    assert not np.array_equal(out, noise)
    assert np.array_equal(out, giffn.quantize_for_gif(noise))


def test_lzw_table_growth_and_reset():
    """An image large/complex enough to push LZW past several width bumps
    (and possibly a table reset at 4096 codes) still round-trips exactly."""
    rng = np.random.default_rng(9)
    # 64 colors -> exact palette; 9000 pixels of varied runs
    vals = (rng.integers(0, 64, (75, 120), dtype=np.uint8) * 4).astype(np.uint8)
    px = np.stack([vals, vals // 2, 255 - vals], axis=-1)
    out = giffn.decode_gif(giffn.encode_gif(px))
    assert np.array_equal(out, px)


def test_structure_and_rejects():
    d = giffn.encode_gif(np.full((4, 4, 3), 9, np.uint8))
    assert d[:6] == b"GIF87a" and d[-1:] == b"\x3b"
    assert giffn.is_gif(d)
    with pytest.raises(ValueError):
        giffn.decode_gif(b"\x89PNG\r\n\x1a\n")


def test_interlaced_roundtrip_exact():
    """4-pass interlaced storage decodes to the same pixels as sequential;
    rows are genuinely permuted on disk (a naive sequential read of the
    interlaced stream would NOT match)."""
    rng = np.random.default_rng(11)
    vals = (rng.integers(0, 32, (23, 17), dtype=np.uint8) * 8).astype(np.uint8)
    px = np.stack([vals, 255 - vals, vals // 3], axis=-1)
    seq = giffn.encode_gif(px)
    inter = giffn.encode_gif(px, interlace=True)
    assert seq != inter  # storage order differs
    i = inter.index(b"\x2c")
    assert inter[i + 9] & 0x40  # interlace flag set in the image descriptor
    assert np.array_equal(giffn.decode_gif(inter), px)
    assert np.array_equal(giffn.decode_gif(seq), px)
    # flag-stripped interlaced stream mis-decodes (proves rows were permuted
    # on disk and the deinterlace pass is what restores them)
    stripped = bytearray(inter)
    stripped[i + 9] &= ~0x40
    assert not np.array_equal(giffn.decode_gif(bytes(stripped)), px)


def test_interlace_order_is_a_permutation():
    for h in (1, 2, 3, 4, 5, 7, 8, 9, 16, 23, 64):
        order = giffn._interlace_order(h)
        assert sorted(order.tolist()) == list(range(h))


def test_decode_image_wiring():
    logo = np.full((6, 6, 3), 77, np.uint8)
    out = decode_image(giffn.encode_gif(logo), "gif")
    assert np.array_equal(out, logo)


# --- property tests (hypothesis) ------------------------------------------

from hypothesis import given, settings, strategies as st  # noqa: E402


@settings(max_examples=25, deadline=None)
@given(
    w=st.integers(1, 48),
    h=st.integers(1, 48),
    seed=st.integers(0, 2**31 - 1),
)
def test_property_roundtrip_quantized_exact(w, h, seed):
    """Any shape and content: decode reproduces the quantized pixels
    EXACTLY (and the original exactly when <= 256 distinct colors)."""
    rng = np.random.default_rng(seed)
    px = rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
    out = giffn.decode_gif(giffn.encode_gif(px))
    assert out.shape == (h, w, 3)
    assert np.array_equal(out, giffn.quantize_for_gif(px))


def test_animation_roundtrip_exact():
    """<=256-color frames round-trip pixel-exact with their delays; the
    still decoder keeps returning the first frame."""
    from scrapy_spark.functions.giffn import (
        decode_gif,
        decode_gif_frames,
        encode_gif_animation,
    )

    rng = np.random.RandomState(1)
    frames = [
        (rng.randint(0, 4, (20, 24, 3)) * 80).astype(np.uint8)
        for _ in range(4)
    ]
    b = encode_gif_animation(frames, [5, 10, 15, 20])
    got, delays = decode_gif_frames(b)
    assert delays == [5, 10, 15, 20]
    assert len(got) == 4
    for a, g in zip(frames, got):
        assert np.array_equal(a, g)
    assert np.array_equal(decode_gif(b), frames[0])


def test_animation_disposal_and_transparency():
    """Hand-built GIF89a (independent of our animation encoder): frame 1
    full red; frame 2 a 2x2 sub-rect at (1,1) with one TRANSPARENT pixel
    (keeps red underneath) and disposal 2 (restore rect to background);
    frame 3 full-transparent sub-rect revealing the restored canvas.
    Pins compositing, disposal-2 clearing and per-pixel transparency."""
    import struct as st

    from scrapy_spark.functions.giffn import _lzw_encode, decode_gif_frames

    w = h = 4
    out = bytearray(b"GIF89a")
    # global color table: 0=black(bg), 1=red, 2=green, 3=blue
    out += st.pack("<HHBBB", w, h, 0x80 | 0x01, 0, 0)
    out += bytes([0, 0, 0, 255, 0, 0, 0, 255, 0, 0, 0, 255])

    def gce(disposal, delay, trans=None):
        packed = (disposal << 2) | (1 if trans is not None else 0)
        return b"\x21\xf9" + st.pack(
            "<BBHBB", 4, packed, delay, trans or 0, 0
        )

    def img(ix, iy, iw, ih, indices):
        r = b"\x2c" + st.pack("<HHHHB", ix, iy, iw, ih, 0)
        # min code size 2 -> codes start 3 bits wide
        data = _lzw_encode(np.array(indices, dtype=np.int64), 2)
        r += bytes([2])
        for i in range(0, len(data), 255):
            c = data[i : i + 255]
            r += bytes([len(c)]) + c
        return r + b"\x00"

    out += gce(1, 5)                       # frame 1: leave in place
    out += img(0, 0, w, h, [1] * 16)       # all red
    out += gce(2, 7, trans=3)              # frame 2: disposal 2, trans idx 3
    out += img(1, 1, 2, 2, [2, 3, 3, 2])   # green/T/T/green at (1,1)
    out += gce(0, 9)                       # frame 3
    out += img(0, 0, 1, 1, [2])            # one green pixel top-left
    out += b"\x3b"

    frames, delays = decode_gif_frames(bytes(out))
    assert delays == [5, 7, 9]
    RED, GREEN, BLACK = (255, 0, 0), (0, 255, 0), (0, 0, 0)
    f1, f2, f3 = frames
    assert all(tuple(p) == RED for p in f1.reshape(-1, 3))
    # frame 2: green at (1,1) and (2,2); transparent pixels keep red
    assert tuple(f2[1, 1]) == GREEN and tuple(f2[2, 2]) == GREEN
    assert tuple(f2[1, 2]) == RED and tuple(f2[2, 1]) == RED
    assert tuple(f2[0, 0]) == RED
    # frame 3: disposal 2 restored the 2x2 rect to BACKGROUND (black),
    # rest still red, plus the new green pixel
    assert tuple(f3[0, 0]) == GREEN
    assert tuple(f3[1, 1]) == BLACK and tuple(f3[2, 2]) == BLACK
    assert tuple(f3[1, 2]) == BLACK and tuple(f3[2, 1]) == BLACK
    assert tuple(f3[0, 1]) == RED and tuple(f3[3, 3]) == RED
