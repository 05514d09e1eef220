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


# --- decoder independence: hand-built external VP8L streams -----------------
# Round-6 verdict #9: every decode test above feeds the decoder its OWN
# encoder's output. These streams are built by an independent bit-writer in
# the test (spec conventions only: LSB-first packing, code bits MSB-first,
# canonical shorter-first/ties-by-symbol assignment — RFC 9649 §5), so a
# shared encoder/decoder misconception cannot cancel out.


class _XW:
    """Independent LSB-first bit accumulator (NOT webpfn._BitWriter)."""

    def __init__(self):
        self.bits = []

    def put(self, v, n):
        self.bits.extend((v >> i) & 1 for i in range(n))

    def code(self, c, length):  # prefix-code bits go MSB-of-code first
        self.bits.extend((c >> i) & 1 for i in range(length - 1, -1, -1))

    def vp8l(self):
        by = bytearray([0x2F])
        for i in range(0, len(self.bits), 8):
            b = 0
            for j, bit in enumerate(self.bits[i:i + 8]):
                b |= bit << j
            by.append(b)
        payload = bytes(by)
        chunk = b"VP8L" + struct.pack("<I", len(payload)) + payload
        if len(payload) & 1:
            chunk += b"\x00"
        riff = b"WEBP" + chunk
        return b"RIFF" + struct.pack("<I", len(riff)) + riff


def _x_canon(lengths):
    """Independent canonical assignment (shorter first, ties by symbol)."""
    codes, code, last = {}, 0, None
    for s in sorted(lengths, key=lambda s: (lengths[s], s)):
        code = 0 if last is None else (code + 1) << (lengths[s] - last)
        codes[s] = (code, lengths[s])
        last = lengths[s]
    return codes


def _x_simple(w, syms):
    """Simple-code tree header, symbols written in the GIVEN order."""
    w.put(1, 1)                  # simple
    w.put(len(syms) - 1, 1)      # num_symbols - 1
    if syms[0] <= 1:
        w.put(0, 1)
        w.put(syms[0], 1)
    else:
        w.put(1, 1)
        w.put(syms[0], 8)
    if len(syms) == 2:
        w.put(syms[1], 8)


def _x_header(w, width, height):
    w.put(width - 1, 14)
    w.put(height - 1, 14)
    w.put(0, 1)   # alpha hint
    w.put(0, 3)   # version


def test_external_stream_simple_codes():
    """4x2 red/blue checker, all five trees simple-coded, no transform, no
    cache. The red tree writes its two symbols DESCENDING (255 then 0) —
    a spec-valid order self-encoded streams never produce: canonical code 0
    must still land on the numerically smaller symbol."""
    from scrapy_spark.functions.webpfn import decode_webp

    w = _XW()
    _x_header(w, 4, 2)
    w.put(0, 1)  # no transforms
    w.put(0, 1)  # no color cache
    w.put(0, 1)  # no meta-huffman
    _x_simple(w, [0])         # green: always 0
    _x_simple(w, [255, 0])    # red: {0,255} written DESCENDING
    _x_simple(w, [0, 255])    # blue: {0,255} ascending
    _x_simple(w, [255])       # alpha: opaque
    _x_simple(w, [0])         # dist: unused but mandatory
    # canonical 1-bit codes: smaller symbol gets code 0 in BOTH orders
    for i in range(8):
        red = i % 2 == 0
        w.code(1 if red else 0, 1)   # red channel: 255 -> code 1
        w.code(0 if red else 1, 1)   # blue channel: 0 -> code 0
    px = decode_webp(w.vp8l())
    assert px.shape == (2, 4, 3)
    flat = px.reshape(-1, 3)
    for i, p in enumerate(flat):
        want = (255, 0, 0) if i % 2 == 0 else (0, 0, 255)
        assert tuple(p) == want, (i, tuple(p))


def test_external_stream_backref_and_cl_coded_tree():
    """8x1 stream whose green tree is CODE-LENGTH-coded (symbol 259 cannot
    ride a simple code) with the max-symbol short-circuit, ending in a
    linear back-reference (length 4, distance 4): pins the cl-tree reader,
    the length/distance prefix decode and the copy loop against spec."""
    from scrapy_spark.functions.webpfn import decode_webp

    w = _XW()
    _x_header(w, 8, 1)
    w.put(0, 1); w.put(0, 1); w.put(0, 1)  # transforms/cache/meta: none
    # green tree: lengths {0: 1, 259: 1} over the 280-symbol alphabet
    w.put(0, 1)       # not simple
    w.put(0, 4)       # num_code_lengths = 4: order prefix [17, 18, 0, 1]
    for ln in (0, 1, 0, 1):     # cl-symbol lengths: 18 -> 1, 1 -> 1
        w.put(ln, 3)
    clc = _x_canon({18: 1, 1: 1})
    w.put(1, 1)       # max-symbol short-circuit present
    w.put(0, 3)       # length_nbits = 2 + 2*0
    w.put(2, 2)       # max_symbol = 2 + 2 = 4 cl reads
    w.code(*clc[1])               # sym 0: length 1
    w.code(*clc[18]); w.put(138 - 11, 7)   # skip 138 zeros
    w.code(*clc[18]); w.put(120 - 11, 7)   # skip 120 -> at sym 259
    w.code(*clc[1])               # sym 259 (length prefix 3): length 1
    gc = _x_canon({0: 1, 259: 1})
    _x_simple(w, [0, 255])    # red
    _x_simple(w, [0, 255])    # blue
    _x_simple(w, [255])       # alpha
    _x_simple(w, [13])        # dist: prefix 13 == linear distance band
    for i in range(4):        # literals R,B,R,B
        red = i % 2 == 0
        w.code(*gc[0])
        w.code(1 if red else 0, 1)
        w.code(0 if red else 1, 1)
    w.code(*gc[259])          # length prefix 3 -> length 4, no extra bits
    w.put(27, 5)              # dist prefix 13 extras: (2+1)<<5 + 27 + 1
    #                           = dist_code 124 -> linear distance 4
    px = decode_webp(w.vp8l())
    assert px.shape == (1, 8, 3)
    flat = px.reshape(-1, 3)
    for i, p in enumerate(flat):
        want = (255, 0, 0) if i % 2 == 0 else (0, 0, 255)
        assert tuple(p) == want, (i, tuple(p))


def test_external_stream_color_cache_and_subtract_green():
    """4x1 single-color stream through the remaining decode paths: the
    subtract-green transform bit and a 1-bit color cache — one literal
    seeds the cache, three cache-hit symbols replay it; the inverse
    transform must restore the original color."""
    from scrapy_spark.functions.webpfn import decode_webp

    r0, g0, b0 = 10, 200, 30
    rt, bt = (r0 - g0) & 0xFF, (b0 - g0) & 0xFF   # subtract-green domain
    argb = (255 << 24) | (rt << 16) | (g0 << 8) | bt
    idx = ((0x1E35A7BD * argb) & 0xFFFFFFFF) >> 31   # spec cache hash, 1 bit
    cache_sym = 256 + 24 + idx

    w = _XW()
    _x_header(w, 4, 1)
    w.put(1, 1); w.put(2, 2)   # transform present: subtract-green (type 2)
    w.put(0, 1)                # no more transforms
    w.put(1, 1); w.put(1, 4)   # color cache, cache_bits = 1
    w.put(0, 1)                # no meta-huffman
    # green tree: lengths {200: 1, cache_sym: 1} over 282 symbols, cl-coded
    w.put(0, 1)
    w.put(0, 4)
    for ln in (0, 1, 0, 1):
        w.put(ln, 3)
    clc = _x_canon({18: 1, 1: 1})
    w.put(1, 1)
    w.put(0, 3)
    w.put(3, 2)                # max_symbol = 2 + 3 = 5 cl reads
    w.code(*clc[18]); w.put(138 - 11, 7)             # skip 138
    w.code(*clc[18]); w.put(62 - 11, 7)              # skip 62 -> sym 200
    w.code(*clc[1])                                   # sym 200: length 1
    w.code(*clc[18]); w.put(cache_sym - 201 - 11, 7)  # skip to cache_sym
    w.code(*clc[1])                                   # cache_sym: length 1
    gc = _x_canon({200: 1, cache_sym: 1})
    _x_simple(w, [rt])        # red (transformed): trivial
    _x_simple(w, [bt])        # blue (transformed): trivial
    _x_simple(w, [255])       # alpha
    _x_simple(w, [0])         # dist: unused
    w.code(*gc[200])          # literal seeds cache[idx]
    for _ in range(3):
        w.code(*gc[cache_sym])
    px = decode_webp(w.vp8l())
    assert px.shape == (1, 4, 3)
    assert [tuple(p) for p in px.reshape(-1, 3)] == [(r0, g0, b0)] * 4


# --- 2D distance-map codes (dist_code 1..120) -------------------------------

# The spec table (RFC 9649 §5.2.2) transcribed: the 120-pixel window is the
# 8 pixels to the left plus the full x=-7..8 span of the 7 rows above,
# listed by squared euclidean distance, ties larger-y-first then
# larger-x-first. The module regenerates it from that rule; this explicit
# transcription pins the generated order entry by entry.
_SPEC_DISTANCE_MAP = [
    (0, 1), (1, 0), (1, 1), (-1, 1), (0, 2), (2, 0), (1, 2), (-1, 2),
    (2, 1), (-2, 1), (2, 2), (-2, 2), (0, 3), (3, 0), (1, 3), (-1, 3),
    (3, 1), (-3, 1), (2, 3), (-2, 3), (3, 2), (-3, 2), (0, 4), (4, 0),
    (1, 4), (-1, 4), (4, 1), (-4, 1), (3, 3), (-3, 3), (2, 4), (-2, 4),
    (4, 2), (-4, 2), (0, 5), (3, 4), (-3, 4), (4, 3), (-4, 3), (5, 0),
    (1, 5), (-1, 5), (5, 1), (-5, 1), (2, 5), (-2, 5), (5, 2), (-5, 2),
    (4, 4), (-4, 4), (3, 5), (-3, 5), (5, 3), (-5, 3), (0, 6), (6, 0),
    (1, 6), (-1, 6), (6, 1), (-6, 1), (2, 6), (-2, 6), (6, 2), (-6, 2),
    (4, 5), (-4, 5), (5, 4), (-5, 4), (3, 6), (-3, 6), (6, 3), (-6, 3),
    (0, 7), (7, 0), (1, 7), (-1, 7), (5, 5), (-5, 5), (7, 1), (-7, 1),
    (4, 6), (-4, 6), (6, 4), (-6, 4), (2, 7), (-2, 7), (7, 2), (-7, 2),
    (3, 7), (-3, 7), (7, 3), (-7, 3), (5, 6), (-5, 6), (6, 5), (-6, 5),
    (8, 0), (4, 7), (-4, 7), (7, 4), (-7, 4), (8, 1), (8, 2), (6, 6),
    (-6, 6), (8, 3), (5, 7), (-5, 7), (7, 5), (-7, 5), (8, 4), (6, 7),
    (-6, 7), (7, 6), (-7, 6), (8, 5), (7, 7), (-7, 7), (8, 6), (8, 7),
]


def test_distance_map_matches_spec_table():
    from scrapy_spark.functions.webpfn import _DISTANCE_MAP

    assert len(_DISTANCE_MAP) == 120
    assert _DISTANCE_MAP == _SPEC_DISTANCE_MAP
    # window multiset: 8 left-of-current + 7 rows x 16 columns above
    exp = {(x, 0) for x in range(1, 9)} | {
        (x, y) for y in range(1, 8) for x in range(-7, 9)
    }
    assert set(_DISTANCE_MAP) == exp
    d2 = [x * x + y * y for x, y in _DISTANCE_MAP]
    assert d2 == sorted(d2)


def test_external_stream_2d_distance_codes():
    """4x2 stream: row 0 is four literals, row 1 comes entirely from 2D
    distance codes — a length-3 backref at dist_code 4 = (-1, 1) (the
    up-right neighbor, dist = w - 1 = 3) then a length-1 backref at
    dist_code 1 = (0, 1) (the pixel above, dist = w = 4). Expected row 1:
    B R B B. Hand-built by the independent bit-writer, so it pins the
    decoder's neighborhood table and backref arithmetic against the spec,
    not against our encoder (which only emits linear codes)."""
    from scrapy_spark.functions.webpfn import decode_webp

    w = _XW()
    _x_header(w, 4, 2)
    w.put(0, 1); w.put(0, 1); w.put(0, 1)  # transforms/cache/meta: none
    # green tree over 280 symbols: {0: len 1, 256: len 2, 258: len 2}
    # (256 = length prefix 0 -> length 1; 258 = prefix 2 -> length 3)
    w.put(0, 1)       # not simple
    w.put(1, 4)       # num_code_lengths = 5: order prefix [17, 18, 0, 1, 2]
    for ln in (0, 1, 2, 3, 3):   # cl lengths: 18->1, 0->2, 1->3, 2->3
        w.put(ln, 3)
    clc = _x_canon({18: 1, 0: 2, 1: 3, 2: 3})
    w.put(1, 1)       # max-symbol short-circuit present
    w.put(1, 3)       # length_nbits = 2 + 2*1 = 4
    w.put(4, 4)       # max_symbol = 2 + 4 = 6 cl reads
    w.code(*clc[1])                         # sym 0: green code length 1
    w.code(*clc[18]); w.put(138 - 11, 7)    # skip 138 zeros
    w.code(*clc[18]); w.put(117 - 11, 7)    # skip 117 -> at sym 256
    w.code(*clc[2])                         # sym 256: length 2
    w.code(*clc[0])                         # sym 257: zero
    w.code(*clc[2])                         # sym 258: length 2
    gc = _x_canon({0: 1, 256: 2, 258: 2})
    _x_simple(w, [0, 255])    # red
    _x_simple(w, [0, 255])    # blue
    _x_simple(w, [255])       # alpha
    _x_simple(w, [0, 3])      # dist prefixes: 0 (-> code 1), 3 (-> code 4)
    dc = _x_canon({0: 1, 3: 1})
    for i in range(4):        # row 0 literals R,B,R,B
        red = i % 2 == 0
        w.code(*gc[0])
        w.code(1 if red else 0, 1)
        w.code(0 if red else 1, 1)
    w.code(*gc[258])          # length 3 (prefix 2, no extras)
    w.code(*dc[3])            # dist prefix 3 -> dist_code 4 = (-1, 1)
    w.code(*gc[256])          # length 1 (prefix 0, no extras)
    w.code(*dc[0])            # dist prefix 0 -> dist_code 1 = (0, 1)
    px = decode_webp(w.vp8l())
    assert px.shape == (2, 4, 3)
    R, B = (255, 0, 0), (0, 0, 255)
    assert [tuple(p) for p in px.reshape(-1, 3)] == [R, B, R, B, B, R, B, B]


def test_external_stream_2d_distance_clamp():
    """2-wide stream using dist_code 80 = (-7, 1): dist = -7 + 1*2 = -5,
    which the spec clamps up to 1 (the left neighbor). Pins the clamp
    branch with a genuinely out-of-window offset."""
    from scrapy_spark.functions.webpfn import (
        _DISTANCE_MAP,
        _prefix_encode,
        decode_webp,
    )

    code = _DISTANCE_MAP.index((-7, 1)) + 1
    assert code == 80
    prefix, eb, ev = _prefix_encode(code)   # (12, 5, 15)
    w = _XW()
    _x_header(w, 2, 2)
    w.put(0, 1); w.put(0, 1); w.put(0, 1)
    # green tree: {0: len 1, 256: len 2, 257: len 2} (256 -> length 1,
    # 257 -> length 2: three backref copies after one literal)
    w.put(0, 1)
    w.put(1, 4)
    for ln in (0, 1, 2, 3, 3):
        w.put(ln, 3)
    clc = _x_canon({18: 1, 0: 2, 1: 3, 2: 3})
    w.put(1, 1)
    w.put(0, 3)       # length_nbits = 2
    w.put(3, 2)       # max_symbol = 2 + 3 = 5 cl reads
    w.code(*clc[1])                         # sym 0: length 1
    w.code(*clc[18]); w.put(138 - 11, 7)
    w.code(*clc[18]); w.put(117 - 11, 7)
    w.code(*clc[2])                         # sym 256: length 2
    w.code(*clc[2])                         # sym 257: length 2
    gc = _x_canon({0: 1, 256: 2, 257: 2})
    _x_simple(w, [0, 255])    # red
    _x_simple(w, [0, 255])    # blue
    _x_simple(w, [255])       # alpha
    _x_simple(w, [prefix])    # dist: single prefix 12 (trivial, 0 bits)
    w.code(*gc[0]); w.code(1, 1); w.code(0, 1)   # literal R at pos 0
    w.code(*gc[257])          # length prefix 1 -> length 2
    w.put(ev, eb)             # dist extras -> dist_code 80
    w.code(*gc[256])          # length 1, same clamped distance
    w.put(ev, eb)
    px = decode_webp(w.vp8l())
    assert px.shape == (2, 2, 3)
    # every copy resolves to "1 to the left": the whole image is red
    assert [tuple(p) for p in px.reshape(-1, 3)] == [(255, 0, 0)] * 4
