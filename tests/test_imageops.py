"""Multimodal binary-column plumbing: decode/meta UDF batch shape, codec
stub behavior, PSNR parity operator."""

from __future__ import annotations

import pyarrow.parquet as pq
import pytest

from scrapy_spark.operators.imageops import extract_image_meta, psnr_parity
from scrapy_spark.sources import synth
from scrapy_spark.sources.synth import SynthConfig

CFG = SynthConfig(seed=5, n_hosts=4, n_pages=40, n_images=25)


@pytest.fixture(scope="module")
def images_df(spark, tmp_path_factory):
    d = tmp_path_factory.mktemp("imgs")
    paths = synth.generate(CFG, str(d))
    return spark.read.parquet(paths["images"])


def test_image_meta_matches_table(spark, images_df):
    meta = {r["image_id"]: r for r in extract_image_meta(images_df).collect()}
    src = {
        r["image_id"]: r
        for r in images_df.select("image_id", "w", "h", "fmt", "phash").collect()
    }
    assert len(meta) == 25
    n_jpeg = 0
    for iid, m in meta.items():
        assert m["decode_ok"], iid
        assert m["decoded_w"] == src[iid]["w"]
        assert m["decoded_h"] == src[iid]["h"]
        if src[iid]["fmt"] in ("png", "gif", "webp"):
            # lossless round trips (gif sources are pre-posterized, webp is
            # VP8L lossless): stored phash reproduced bit-exactly
            assert m["decoded_phash"] == src[iid]["phash"]
        else:
            # lossy jpeg: the PERCEPTUAL hash must survive compression
            # within a small hamming distance — that robustness is phash's
            # entire job
            n_jpeg += 1
            ham = bin(
                (m["decoded_phash"] ^ src[iid]["phash"]) & ((1 << 64) - 1)
            ).count("1")
            assert ham <= 6, (iid, ham)
    assert n_jpeg >= 1  # the mix includes lossy rows


def test_unavailable_codec_is_data_not_failure(spark, images_df):
    from pyspark.sql import functions as F

    # truly-absent codec (tiff) -> NotImplementedError recorded as data
    # (webp got a real VP8L codec in functions/webpfn)
    tiffish = images_df.limit(3).withColumn("fmt", F.lit("tiff"))
    rows = extract_image_meta(tiffish).collect()
    assert len(rows) == 3
    for r in rows:
        assert not r["decode_ok"]
        assert "NotImplementedError" in r["decode_error"]
    # mislabeled bytes (PNG payload tagged webp) -> ValueError recorded
    webpish = (
        images_df.filter(F.col("fmt") == "png").limit(2)
        .withColumn("fmt", F.lit("webp"))
    )
    for r in extract_image_meta(webpish).collect():
        assert not r["decode_ok"]
        assert "ValueError" in r["decode_error"]
    # mislabeled bytes (PNG payload tagged jpeg) -> ValueError recorded,
    # never a task failure (jpeg decode is real now, functions/jpegfn);
    # filter to actual-PNG rows first — the synth image mix includes real
    # JPEGs that would decode successfully
    jpegish = (
        images_df.filter(F.col("fmt") == "png").limit(3)
        .withColumn("fmt", F.lit("jpeg"))
    )
    rows = extract_image_meta(jpegish).collect()
    for r in rows:
        assert not r["decode_ok"]
        assert "ValueError" in r["decode_error"]


def test_psnr_parity_operator(spark, images_df):
    out = psnr_parity(images_df, images_df).collect()
    assert len(out) == 25
    assert all(r["pixel_exact"] and r["psnr"] == float("inf") for r in out)
