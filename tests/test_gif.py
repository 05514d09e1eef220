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
