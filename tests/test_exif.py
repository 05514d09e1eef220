"""EXIF build/parse/scrub (functions/exiffn) + the Spark scrub operator.

The reference reads EXIF via PIL in stage-3 content handling
(content_handlers.py:206-263); here both directions are from-scratch
byte-level (TIFF 6.0 IFD tree inside APP1, ITU T.81 marker framing), so
the tests pin: round-trip exactness, big-endian decoder independence,
splice-only scrubbing (decoded pixels bit-identical), and the synth
corpus / operator / CLI agreement.
"""

from __future__ import annotations

import struct

import numpy as np
import pytest

from scrapy_spark.functions.exiffn import (
    apply_exif_orientation,
    build_exif,
    extract_jpeg_exif,
    insert_exif,
    parse_exif,
    strip_jpeg_metadata,
)
from scrapy_spark.functions.jpegfn import decode_jpeg, encode_jpeg


def _sample_jpeg(seed: int = 7, w: int = 32, h: int = 24) -> bytes:
    rng = np.random.RandomState(seed)
    return encode_jpeg((rng.rand(h, w, 3) * 255).astype(np.uint8))


def test_build_parse_round_trip():
    exif = build_exif(
        make="CamCo1",
        model="X42",
        orientation=6,
        datetime="2021:03:04 12:00:00",
        gps_lat=41.5125,
        gps_lon=-72.7033,
    )
    m = parse_exif(exif)
    assert m["make"] == "CamCo1"
    assert m["model"] == "X42"
    assert m["orientation"] == 6
    assert m["datetime"] == "2021:03:04 12:00:00"
    assert m["has_gps"]
    # DMS rationals carry (s*10000, 10000) — error bound 0.5/10000 arcsec,
    # far inside the milli-degree grid the operator reports on
    assert abs(m["gps_lat"] - 41.5125) < 1e-6
    assert abs(m["gps_lon"] + 72.7033) < 1e-6


def test_parse_partial_fields():
    m = parse_exif(build_exif(orientation=3))
    assert m["orientation"] == 3
    assert m["make"] is None and m["datetime"] is None and not m["has_gps"]


def test_big_endian_parse_decoder_independence():
    """Hand-built big-endian (MM) TIFF — the builder only emits
    little-endian, so a pass here pins the parser against the spec, not
    against our own writer."""
    # IFD0 at offset 8: 2 entries (orientation short=8, make ascii)
    make = b"BigEndianCam\x00"
    ifd = struct.pack(">H", 2)
    ifd += struct.pack(">HHI", 0x010F, 2, len(make))  # Make, overflow ptr
    ifd += struct.pack(">I", 8 + 2 + 24 + 4)
    ifd += struct.pack(">HHI", 0x0112, 3, 1) + struct.pack(">H", 8) + b"\x00\x00"
    ifd += struct.pack(">I", 0)  # no next IFD
    tiff = b"MM\x00*" + struct.pack(">I", 8) + ifd + make
    m = parse_exif(b"Exif\x00\x00" + tiff)
    assert m["make"] == "BigEndianCam"
    assert m["orientation"] == 8


def test_parse_rejects_non_exif():
    assert parse_exif(b"http://ns.adobe.com/xap/1.0/\x00<xml/>") is None
    assert parse_exif(b"") is None
    assert parse_exif(b"II*\x00") is None  # truncated header


def test_insert_extract_strip_inverse():
    j = _sample_jpeg()
    exif = build_exif(make="A", orientation=1, datetime="2020:01:01 00:00:00")
    j2 = insert_exif(j, exif)
    assert extract_jpeg_exif(j) is None  # metadata-free input has no EXIF
    got = extract_jpeg_exif(j2)
    assert got["make"] == "A" and got["datetime"] == "2020:01:01 00:00:00"
    # scrub is a pure splice: exact inverse of insert
    assert strip_jpeg_metadata(j2) == j
    # idempotent / no-op on metadata-free input
    assert strip_jpeg_metadata(j) == j
    # decoded pixels identical with or without the segment (entropy data
    # untouched — the no-generation-loss property the operator relies on)
    assert np.array_equal(decode_jpeg(j), decode_jpeg(j2))


def test_strip_drops_com_and_multiple_appn():
    j = _sample_jpeg(seed=11)
    # splice an APP13 (Photoshop/IPTC-shaped) and a COM right after SOI
    app13 = b"\xff\xed" + struct.pack(">H", 2 + 10) + b"Photoshop\x00"
    com = b"\xff\xfe" + struct.pack(">H", 2 + 7) + b"comment"
    j2 = insert_exif(j, build_exif(make="B"))
    assert j2[:2] == b"\xff\xd8"
    j3 = j2[:2] + app13 + com + j2[2:]
    s = strip_jpeg_metadata(j3)
    assert s == j
    # APP0/JFIF (written by encode_jpeg) survives
    assert b"JFIF" in s[:30]


def test_orientation_transforms():
    # asymmetric marker grid: value = 10*r + c over 2x3
    px = np.arange(6, dtype=np.uint8).reshape(2, 3, 1).repeat(3, axis=2)
    assert np.array_equal(apply_exif_orientation(px, 1), px)
    # involutions: mirror / 180 / vertical flip applied twice = identity
    for o in (2, 3, 4):
        out = apply_exif_orientation(px, o)
        assert out.shape == px.shape
        assert np.array_equal(apply_exif_orientation(out, o), px)
    # 90-degree family swaps dims
    for o in (5, 6, 7, 8):
        assert apply_exif_orientation(px, o).shape == (3, 2, 3)
    # case 3 = 180 rotation: top-left -> bottom-right
    assert apply_exif_orientation(px, 3)[-1, -1, 0] == px[0, 0, 0]
    # case 6 ("row 0 is visual right"): display = rotate 90 CW, so the
    # stored top-left lands at the visual top-right
    assert apply_exif_orientation(px, 6)[0, -1, 0] == px[0, 0, 0]
    # case 8: rotate 90 CCW, stored top-left lands bottom-left
    assert apply_exif_orientation(px, 8)[-1, 0, 0] == px[0, 0, 0]
    # unknown orientation passes through
    assert np.array_equal(apply_exif_orientation(px, 0), px)
    # case 5 (transpose): out[i, j] = px[j, i]
    t5 = apply_exif_orientation(px, 5)
    for i in range(3):
        for j in range(2):
            assert t5[i, j, 0] == px[j, i, 0]
    # case 7 (transverse, anti-diagonal flip): out[i, j] = px[H-1-j, W-1-i]
    # — and it is NOT the plain transpose (regression: was identical to 5)
    t7 = apply_exif_orientation(px, 7)
    h, w = px.shape[:2]
    for i in range(3):
        for j in range(2):
            assert t7[i, j, 0] == px[h - 1 - j, w - 1 - i, 0]
    assert not np.array_equal(t5, t7)


def test_fill_bytes_before_markers():
    """T.81 B.1.1.2: any number of 0xFF fill bytes may precede a marker.
    Regression: the segment walkers treated the fill byte as the marker id,
    so a spec-legal stream silently shipped its EXIF through the scrub."""
    j = _sample_jpeg()
    exif = build_exif(make="FillCam", gps_lat=1.0, gps_lon=2.0)
    j2 = insert_exif(j, exif)
    # inject one fill byte right before the APP1 marker
    at = j2.index(b"\xff\xe1")
    filled = j2[:at] + b"\xff" + j2[at:]
    got = extract_jpeg_exif(filled)
    assert got is not None and got["make"] == "FillCam" and got["has_gps"]
    stripped = strip_jpeg_metadata(filled)
    assert extract_jpeg_exif(stripped) is None
    assert b"FillCam" not in stripped
    # decoder also walks past fill bytes (same T.81 rule)
    assert np.array_equal(decode_jpeg(filled), decode_jpeg(j))


# --- synth corpus + operator -------------------------------------------------

from scrapy_spark.sources import synth  # noqa: E402
from scrapy_spark.sources.synth import SynthConfig  # noqa: E402

CFG = SynthConfig(seed=9, n_hosts=4, n_pages=40, n_images=48)


@pytest.fixture(scope="module")
def images_pdf():
    return synth.build_images(CFG)


def test_synth_exif_distribution(images_pdf):
    """~half the JPEGs carry EXIF, ~quarter carry GPS; non-JPEG never."""
    n_jpeg = n_exif = n_gps = 0
    for row in images_pdf.itertuples(index=False):
        meta = extract_jpeg_exif(bytes(row.bytes)) if row.fmt == "jpeg" else None
        want = synth.image_exif_fields(CFG, row.image_id)
        if row.fmt != "jpeg":
            assert want is None
            continue
        n_jpeg += 1
        if want is None:
            assert meta is None
            continue
        n_exif += 1
        assert meta["make"] == want["make"]
        assert meta["model"] == want["model"]
        assert meta["orientation"] == want["orientation"]
        assert meta["datetime"] == want["datetime"]
        if "gps_lat" in want:
            n_gps += 1
            assert meta["has_gps"]
            assert abs(meta["gps_lat"] - want["gps_lat"]) < 1e-6
            assert abs(meta["gps_lon"] - want["gps_lon"]) < 1e-6
        else:
            assert not meta["has_gps"]
    assert n_jpeg >= 3 and n_exif >= 1 and n_gps >= 1, (n_jpeg, n_exif, n_gps)
    # EXIF-bearing bytes still decode to the same pixels as the raw encode
    # (covered per-row by test_insert_extract_strip_inverse; here we pin the
    # corpus actually exercises both branches)


def test_exif_scrub_operator(spark, images_pdf, tmp_path):
    from scrapy_spark.operators.imageops import exif_scrub_images

    path = str(tmp_path / "images.parquet")
    spark.createDataFrame(images_pdf).write.parquet(path)
    images = spark.read.parquet(path)
    out = {r["image_id"]: r for r in exif_scrub_images(images).collect()}
    assert len(out) == len(images_pdf)
    n_meta = 0
    for row in images_pdf.itertuples(index=False):
        r = out[row.image_id]
        data = bytes(row.bytes)
        assert r["n_bytes_before"] == len(data)
        want = synth.image_exif_fields(CFG, row.image_id)
        if want is None:
            # passthrough: non-JPEG or EXIF-less JPEG, byte-identical
            assert not r["had_metadata"]
            assert bytes(r["scrubbed"]) == data
            assert r["exif_make"] is None and not r["has_gps"]
            continue
        n_meta += 1
        assert r["had_metadata"]
        assert r["exif_make"] == want["make"]
        assert r["exif_model"] == want["model"]
        assert r["exif_orientation"] == want["orientation"]
        assert r["exif_datetime"] == want["datetime"]
        if "gps_lat" in want:
            assert r["has_gps"]
            assert r["gps_lat_milli"] == round(want["gps_lat"] * 1000)
            assert r["gps_lon_milli"] == round(want["gps_lon"] * 1000)
        else:
            assert not r["has_gps"] and r["gps_lat_milli"] is None
        scrubbed = bytes(r["scrubbed"])
        assert len(scrubbed) == r["n_bytes_after"] < len(data)
        # scrubbed output carries no extractable metadata and decodes to
        # the exact same pixels (splice-only guarantee)
        assert extract_jpeg_exif(scrubbed) is None
        assert np.array_equal(decode_jpeg(scrubbed), decode_jpeg(data))
    assert n_meta >= 1


def test_exifscrub_cli(spark, images_pdf, tmp_path, capsys):
    import json

    from main import main as cli_main

    path = str(tmp_path / "images.parquet")
    spark.createDataFrame(images_pdf).write.parquet(path)
    out_dir = str(tmp_path / "scrubbed")
    rc = cli_main(["exifscrub", "--images", path, "--out", out_dir])
    assert rc in (0, None)
    line = [l for l in capsys.readouterr().out.splitlines()
            if l.startswith("{")][-1]
    summary = json.loads(line)
    want = [synth.image_exif_fields(CFG, r.image_id)
            for r in images_pdf.itertuples(index=False)]
    n_exif = sum(1 for w in want if w is not None)
    n_gps = sum(1 for w in want if w is not None and "gps_lat" in w)
    assert summary["images"] == len(images_pdf)
    assert summary["had_metadata"] == n_exif
    assert summary["with_gps"] == n_gps
    assert summary["with_orientation"] == n_exif
    assert summary["bytes_removed"] > 0
    # the written table is the operator output, bytes included
    back = spark.read.parquet(out_dir)
    assert back.count() == len(images_pdf)
    assert "scrubbed" in back.columns
