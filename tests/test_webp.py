"""WebP VP8L codec (functions/webpfn): lossless round trips across every
encoder path (literal, LZ77 run, color cache, simple codes), container
structure, and labeled subset errors for the spec features the encoder
never emits (the reference accepts image/webp via PIL,
validator.py:511-520; this is the from-scratch stand-in)."""

from __future__ import annotations

import struct

import numpy as np
import pytest

from scrapy_spark.functions import webpfn
from scrapy_spark.functions.imagefn import decode_image, synth_pixels
from scrapy_spark.functions.webpfn import (
    _BitWriter,
    decode_webp,
    encode_webp,
    is_webp,
)


def test_roundtrip_random_pixels():
    px = synth_pixels("webp-rand", 47, 33)
    out = decode_webp(encode_webp(px))
    assert np.array_equal(out, px)


def test_roundtrip_runs_compress():
    """Flat regions go through the LZ77 length/distance path and compress."""
    px = np.zeros((40, 60, 3), dtype=np.uint8)
    px[:20] = (10, 200, 30)
    px[20:] = (255, 0, 128)
    px[5, 5] = (1, 2, 3)
    data = encode_webp(px)
    assert len(data) < px.size // 10  # runs actually collapse
    assert np.array_equal(decode_webp(data), px)


def test_roundtrip_color_cache():
    """Repeated colors via the 0x1e35a7bd color cache, still exact."""
    rng = np.random.RandomState(3)
    px = (rng.randint(0, 4, size=(31, 29, 3)) * 80).astype(np.uint8)
    cached = encode_webp(px, use_color_cache=True, cache_bits=5)
    plain = encode_webp(px)
    assert np.array_equal(decode_webp(cached), px)
    assert np.array_equal(decode_webp(plain), px)
    assert len(cached) < len(plain)  # the cache pays for itself here


@pytest.mark.parametrize("shape", [(1, 1), (1, 2), (2, 1), (3, 3), (1, 300)])
def test_roundtrip_tiny_shapes(shape):
    rng = np.random.RandomState(shape[0] * 1000 + shape[1])
    px = rng.randint(0, 256, size=(*shape, 3), dtype=np.uint8)
    assert np.array_equal(decode_webp(encode_webp(px)), px)
    assert np.array_equal(
        decode_webp(encode_webp(px, use_color_cache=True)), px
    )


def test_single_color_uses_simple_codes():
    px = np.full((16, 16, 3), 77, dtype=np.uint8)
    data = encode_webp(px)
    assert len(data) < 64  # 1-symbol simple codes + one run
    assert np.array_equal(decode_webp(data), px)


def test_simple_two_symbol_code_is_canonical_regardless_of_write_order():
    """A spec-valid external file may write the two simple-code symbols in
    DESCENDING order; the canonical code built from the lengths still gives
    code 0 to the numerically smaller symbol (this repo's encoder writes
    ascending, so only a hand-built fixture exercises the swap)."""
    from scrapy_spark.functions.webpfn import (
        _BitReader,
        _BitWriter,
        _read_code_lengths,
    )

    for sym0, sym1 in ((200, 3), (3, 200)):  # descending then ascending
        bw = _BitWriter()
        bw.write(1, 1)  # simple code
        bw.write(1, 1)  # num_symbols = 2
        bw.write(1, 1)  # first symbol uses 8 bits
        bw.write(sym0, 8)
        bw.write(sym1, 8)
        bw.write(0, 1)  # code 0 -> smaller symbol
        bw.write(1, 1)  # code 1 -> larger symbol
        br = _BitReader(bw.bytes())
        tree = _read_code_lengths(br, 256)
        assert br.read_sym(tree) == 3
        assert br.read_sym(tree) == 200


def test_container_structure():
    px = synth_pixels("webp-c", 10, 8)
    data = encode_webp(px)
    assert is_webp(data)
    assert data[:4] == b"RIFF" and data[8:12] == b"WEBP"
    (riff_size,) = struct.unpack("<I", data[4:8])
    assert riff_size == len(data) - 8
    assert data[12:16] == b"VP8L"
    assert data[20] == 0x2F  # VP8L signature byte
    assert len(data) % 2 == 0  # RIFF chunks are even-padded


def test_decode_image_wiring():
    px = synth_pixels("webp-wire", 24, 18)
    assert np.array_equal(decode_image(encode_webp(px), "webp"), px)


def test_not_webp_rejected():
    with pytest.raises(ValueError):
        decode_webp(b"\x89PNG\r\n\x1a\n")
    with pytest.raises(ValueError):
        decode_webp(b"RIFF\x04\x00\x00\x00WEBP")  # no VP8L chunk
    assert not is_webp(b"GIF87a")


def _vp8l_container(payload: bytes) -> bytes:
    chunk = b"VP8L" + struct.pack("<I", len(payload)) + payload
    if len(payload) % 2:
        chunk += b"\x00"
    riff = b"WEBP" + chunk
    return b"RIFF" + struct.pack("<I", len(riff)) + riff


def test_lossy_vp8_is_labeled_not_implemented():
    riff = b"WEBPVP8 \x00\x00\x00\x00"
    data = b"RIFF" + struct.pack("<I", len(riff)) + riff
    with pytest.raises(NotImplementedError):
        decode_webp(data)


def test_unsupported_transform_is_labeled_not_implemented():
    """Handcrafted header announcing the PREDICTOR transform (type 0)."""
    bw = _BitWriter()
    bw.write(0x2F, 8)
    bw.write(3, 14)  # width-1
    bw.write(3, 14)  # height-1
    bw.write(0, 1)
    bw.write(0, 3)
    bw.write(1, 1)  # transform present
    bw.write(0, 2)  # PREDICTOR
    with pytest.raises(NotImplementedError):
        decode_webp(_vp8l_container(bw.bytes()))


def test_meta_huffman_is_labeled_not_implemented():
    bw = _BitWriter()
    bw.write(0x2F, 8)
    bw.write(3, 14)
    bw.write(3, 14)
    bw.write(0, 1)
    bw.write(0, 3)
    bw.write(0, 1)  # no transforms
    bw.write(0, 1)  # no color cache
    bw.write(1, 1)  # meta-Huffman present -> subset error
    with pytest.raises(NotImplementedError):
        decode_webp(_vp8l_container(bw.bytes()))


def test_truncated_stream_is_value_error():
    px = synth_pixels("webp-t", 20, 20)
    data = bytearray(encode_webp(px))
    short = bytes(data[: len(data) - 40])
    # keep the RIFF framing self-consistent so we hit the bitstream check
    short = (
        short[:4]
        + struct.pack("<I", len(short) - 8)
        + short[8:12]
        + short[12:16]
        + struct.pack("<I", len(short) - 20)
        + short[20:]
    )
    with pytest.raises(ValueError):
        decode_webp(short)


# --- property tests (hypothesis) ------------------------------------------

from hypothesis import given, settings, strategies as st  # noqa: E402


@settings(max_examples=25, deadline=None)
@given(
    w=st.integers(1, 48),
    h=st.integers(1, 48),
    seed=st.integers(0, 2**31 - 1),
    cache=st.booleans(),
)
def test_property_roundtrip_exact(w, h, seed, cache):
    """Any shape, any content, cache on or off: VP8L is lossless —
    decode(encode(px)) == px bit-exactly."""
    rng = np.random.default_rng(seed)
    # mix flat runs and noise so literal, LZ77 and cache paths all trigger
    px = rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
    if h > 2:
        px[: h // 2] = px[0, 0]
    out = decode_webp(encode_webp(px, use_color_cache=cache))
    assert out.shape == (h, w, 3)
    assert np.array_equal(out, px)
