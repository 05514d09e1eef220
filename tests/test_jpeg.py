"""From-scratch baseline JPEG codec (functions/jpegfn): round-trip fidelity
per the input_hint's lossy bar (PSNR >= 40 dB), structural validity, and the
decode_image wiring."""

from __future__ import annotations

import numpy as np
import pytest

from scrapy_spark.functions import jpegfn
from scrapy_spark.functions.imagefn import decode_image, psnr, synth_pixels


def _cases():
    rng = np.random.default_rng(7)
    return {
        "synth": synth_pixels("img0000000000000042", 40, 28),
        "gradient": np.linspace(0, 255, 64 * 48 * 3)
        .reshape(48, 64, 3)
        .astype(np.uint8),
        "noise": rng.integers(0, 256, (17, 23, 3), dtype=np.uint8),
        "flat": np.full((8, 8, 3), 127, np.uint8),
        "odd": synth_pixels("img0000000000000001", 13, 9),
    }


def test_roundtrip_psnr_at_least_40db():
    """PSNR >= 40 dB at the default quality for EVERY case — including
    uniform random noise, the worst case for DCT coding."""
    for name, px in _cases().items():
        data = jpegfn.encode_jpeg(px)
        out = jpegfn.decode_jpeg(data)
        assert out.shape == px.shape, name
        p = psnr(px, out)
        assert p >= 40.0, (name, p)


def test_grayscale_input_roundtrip():
    g = np.arange(0, 256, 8, dtype=np.uint8).reshape(4, 8).repeat(4, 0).repeat(2, 1)
    out = jpegfn.decode_jpeg(jpegfn.encode_jpeg(g))
    assert out.shape == (16, 16, 3)
    assert psnr(np.stack([g] * 3, -1), out) >= 40.0


def test_structure_and_magic():
    data = jpegfn.encode_jpeg(_cases()["synth"])
    assert data[:2] == b"\xff\xd8" and data[-2:] == b"\xff\xd9"
    assert b"JFIF\x00" in data[:24]
    assert jpegfn.is_jpeg(data)
    assert not jpegfn.is_jpeg(b"\x89PNG\r\n")
    with pytest.raises(ValueError):
        jpegfn.decode_jpeg(b"\x89PNG\r\n\x1a\n not a jpeg")


def test_unsupported_sof_rejected_not_misdecoded():
    """Arithmetic-coded (SOF9) and lossless (SOF3) frames must raise
    NotImplementedError, never silently produce wrong pixels."""
    for sof in (0xC9, 0xC3):
        data = bytearray(jpegfn.encode_jpeg(_cases()["flat"]))
        i = bytes(data).index(b"\xff\xc0")
        data[i + 1] = sof
        with pytest.raises(NotImplementedError):
            jpegfn.decode_jpeg(bytes(data))


@pytest.mark.parametrize("mode", ["444", "422", "420"])
def test_progressive_decode_bit_identical_to_baseline(mode):
    """The 10-scan SOF2 stream carries the SAME quantized coefficients as
    the baseline stream, so decode must match the baseline decode
    bit-for-bit — across subsampling modes and odd edges."""
    rng = np.random.default_rng(31)
    for h, w in ((1, 1), (9, 17), (24, 24), (23, 31)):
        px = rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
        base = jpegfn.encode_jpeg(px, quality=90, subsampling=mode)
        prog = jpegfn.encode_jpeg(px, quality=90, subsampling=mode, progressive=True)
        assert b"\xff\xc2" in prog and b"\xff\xc0" not in prog[:200]
        assert prog.count(b"\xff\xda") >= 10  # the full scan script
        assert np.array_equal(
            jpegfn.decode_jpeg(prog), jpegfn.decode_jpeg(base)
        ), (mode, h, w)


def test_progressive_truncated_scans_refine_toward_full():
    """Progressive's defining property: decoding only a prefix of the scans
    yields a coarse image that the later scans refine. Cut the stream at
    scan boundaries (entropy data is stuffed, so a raw FFDA only occurs at
    a real SOS) and check PSNR vs the full decode never degrades as scans
    are added, improving overall."""
    px = _cases()["gradient"]
    prog = jpegfn.encode_jpeg(px, quality=90, progressive=True)
    full = jpegfn.decode_jpeg(prog).astype(np.float64)
    starts = []
    i = prog.find(b"\xff\xda")
    while i != -1:
        starts.append(i)
        i = prog.find(b"\xff\xda", i + 2)
    assert len(starts) == 10
    errs = []
    for cut in (1, 4, 7, 10):
        end = starts[cut] if cut < len(starts) else len(prog) - 2
        part = jpegfn.decode_jpeg(prog[:end] + b"\xff\xd9").astype(np.float64)
        errs.append(float(((part - full) ** 2).mean()))
    assert errs[-1] == 0.0  # all scans == full decode
    assert errs == sorted(errs, reverse=True)  # monotone refinement
    assert errs[0] > 0.0  # DC-only really is coarse


def test_progressive_decode_image_wiring():
    px = _cases()["synth"]
    out = decode_image(jpegfn.encode_jpeg(px, progressive=True), "jpeg")
    assert psnr(px, out) >= 40.0


def test_quality_monotone_size_and_fidelity():
    px = _cases()["synth"]
    sizes, errs = [], []
    for q in (50, 80, 97):
        d = jpegfn.encode_jpeg(px, quality=q)
        sizes.append(len(d))
        errs.append(psnr(px, jpegfn.decode_jpeg(d)))
    assert sizes == sorted(sizes)  # higher quality -> more bytes
    assert errs == sorted(errs)  # ... and higher PSNR


def test_decode_image_wiring():
    px = _cases()["gradient"]
    data = jpegfn.encode_jpeg(px)
    for fmt in ("jpeg", "jpg", "JPEG"):
        out = decode_image(data, fmt)
        assert psnr(px, out) >= 40.0


def test_byte_stuffing_roundtrip():
    """Blocks engineered to emit 0xFF bytes in the entropy stream must
    round-trip (stuffed 0xFF00 on write, unstuffed on read)."""
    rng = np.random.default_rng(1234)
    for trial in range(5):
        px = rng.integers(0, 256, (24, 24, 3), dtype=np.uint8)
        d = jpegfn.encode_jpeg(px, quality=90)
        scan = d[d.index(b"\xff\xda") :]
        out = jpegfn.decode_jpeg(d)
        assert out.shape == px.shape
        if b"\xff\x00" in scan:
            break
    else:
        pytest.fail("no stuffed byte produced across trials")


def test_subsampled_roundtrip_shapes_and_fidelity():
    """4:2:2 and 4:2:0 streams decode at full resolution; luma is never
    subsampled so smooth content stays high-fidelity, and the stream is
    smaller than 4:4:4 on chroma-rich content."""
    px = _cases()["gradient"]
    d444 = jpegfn.encode_jpeg(px, quality=90)
    for mode in ("422", "420"):
        d = jpegfn.encode_jpeg(px, quality=90, subsampling=mode)
        assert len(d) < len(d444), mode
        out = jpegfn.decode_jpeg(d)
        assert out.shape == px.shape, mode
        assert psnr(px, out) >= 32.0, mode  # chroma box-avg is lossy by design
    # gray content through 4:2:0 keeps the 40 dB luma contract (chroma flat)
    g = np.arange(0, 256, 4, dtype=np.uint8).reshape(8, 8).repeat(3, 0).repeat(3, 1)
    gpx = np.stack([g] * 3, -1)
    out = jpegfn.decode_jpeg(jpegfn.encode_jpeg(gpx, subsampling="420"))
    assert psnr(gpx, out) >= 40.0
    with pytest.raises(ValueError):
        jpegfn.encode_jpeg(px, subsampling="411")


def test_sof_sampling_factors_match_mode():
    """The SOF0 luma component advertises the declared sampling factors."""
    px = _cases()["synth"]
    for mode, hv in (("444", 0x11), ("422", 0x21), ("420", 0x22)):
        d = jpegfn.encode_jpeg(px, subsampling=mode)
        i = d.index(b"\xff\xc0")
        assert d[i + 11] == hv, mode  # first component's H/V nibbles


def test_restart_intervals_bit_identical_pixels():
    """DRI/RSTn framing never changes decoded pixels, and the markers are
    genuinely present (DC predictors reset per segment)."""
    rng = np.random.default_rng(77)
    px = rng.integers(0, 256, (40, 56, 3), dtype=np.uint8)
    base = jpegfn.decode_jpeg(jpegfn.encode_jpeg(px, quality=85))
    for mode in ("444", "420"):
        d = jpegfn.encode_jpeg(px, quality=85, subsampling=mode, restart_interval=2)
        assert b"\xff\xdd" in d  # DRI segment
        scan = d[d.index(b"\xff\xda") :]
        assert any(bytes([0xFF, 0xD0 + k]) in scan for k in range(8))
        out = jpegfn.decode_jpeg(d)
        nodri = jpegfn.decode_jpeg(jpegfn.encode_jpeg(px, quality=85, subsampling=mode))
        assert np.array_equal(out, nodri), mode
    assert np.array_equal(
        jpegfn.decode_jpeg(jpegfn.encode_jpeg(px, quality=85, restart_interval=2)), base
    )


@pytest.mark.parametrize("mode", ["422", "420"])
def test_subsampled_odd_edges(mode):
    """Shapes that don't divide the MCU (16x8 / 16x16) still round-trip at
    the declared size."""
    rng = np.random.default_rng(5)
    for h, w in ((1, 1), (9, 17), (15, 16), (16, 15), (23, 31)):
        px = rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
        out = jpegfn.decode_jpeg(jpegfn.encode_jpeg(px, subsampling=mode))
        assert out.shape == (h, w, 3), (mode, h, w)


# --- property tests (hypothesis) ------------------------------------------

from hypothesis import given, settings, strategies as st  # noqa: E402


@settings(max_examples=25, deadline=None)
@given(
    w=st.integers(1, 40),
    h=st.integers(1, 40),
    seed=st.integers(0, 2**31 - 1),
)
def test_property_roundtrip_any_shape(w, h, seed):
    """Any shape (including 1x1 and non-multiple-of-8 edges) and any
    content round-trips with shape preserved and PSNR >= 40 dB."""
    rng = np.random.default_rng(seed)
    px = rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
    out = jpegfn.decode_jpeg(jpegfn.encode_jpeg(px))
    assert out.shape == (h, w, 3)
    assert psnr(px, out) >= 40.0


def test_estimate_jpeg_quality():
    """The IJG quality inversion is exact for our own encoder at every
    quality, across baseline/progressive/subsampled framing; custom
    tables fall back to nearest-by-L1 with exact=False; non-JPEG bytes
    report (None, False)."""
    import numpy as np

    from scrapy_spark.functions.jpegfn import (
        encode_jpeg,
        estimate_jpeg_quality,
    )

    rng = np.random.RandomState(3)
    img = (rng.rand(40, 48, 3) * 255).astype(np.uint8)
    for q in (1, 5, 30, 50, 75, 90, 99, 100):
        assert estimate_jpeg_quality(encode_jpeg(img, quality=q)) == (q, True)
    assert estimate_jpeg_quality(
        encode_jpeg(img, quality=85, progressive=True)
    ) == (85, True)
    assert estimate_jpeg_quality(
        encode_jpeg(img, quality=60, subsampling="420")
    ) == (60, True)
    assert estimate_jpeg_quality(b"\x89PNG\r\n\x1a\n") == (None, False)
    # perturb one luma DQT coefficient: nearest quality, inexact
    b = bytearray(encode_jpeg(img, quality=80))
    i = b.index(b"\xff\xdb")
    b[i + 5] += 1
    assert estimate_jpeg_quality(bytes(b)) == (80, False)
