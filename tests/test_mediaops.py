"""Multimodal plumbing: real bilinear resize/thumbnail over the PNG codec,
and the audio/video stub operators' Spark-side contract (schema, Arrow
batching, per-frame explode, determinism)."""

from __future__ import annotations

import numpy as np
import pandas as pd

from scrapy_spark.functions.imagefn import (
    decode_png,
    encode_png,
    resize_bilinear,
    synth_pixels,
)
from scrapy_spark.operators.imageops import thumbnail_images
from scrapy_spark.operators.mediaops import extract_audio_meta, sample_video_frames


def test_resize_bilinear_properties():
    # constant image stays constant at any scale
    const = np.full((32, 48, 3), 77, dtype=np.uint8)
    out = resize_bilinear(const, 16, 11)
    assert out.shape == (11, 16, 3) and np.all(out == 77)
    # horizontal gradient stays monotonic after downscale
    grad = np.tile(np.linspace(0, 255, 64, dtype=np.uint8)[None, :, None], (8, 1, 3))
    g2 = resize_bilinear(grad, 16, 8)
    row = g2[0, :, 0].astype(int)
    assert all(a <= b for a, b in zip(row, row[1:]))
    # identity resize is exact
    px = synth_pixels("imgX", 24, 16)
    assert np.array_equal(resize_bilinear(px, 24, 16), px)


def test_thumbnail_images_spark(spark):
    rows = []
    for i, (w, h) in enumerate([(48, 32), (32, 48), (16, 16)]):
        px = synth_pixels(f"img{i}", w, h)
        rows.append({"image_id": f"img{i}", "bytes": encode_png(px), "fmt": "png"})
    rows.append({"image_id": "bad", "bytes": b"\x00\x01", "fmt": "jpeg"})
    df = spark.createDataFrame(pd.DataFrame(rows))
    out = {r["image_id"]: r for r in thumbnail_images(df, max_side=16).collect()}
    assert (out["img0"]["thumb_w"], out["img0"]["thumb_h"]) == (16, 11)
    assert (out["img1"]["thumb_w"], out["img1"]["thumb_h"]) == (11, 16)
    assert (out["img2"]["thumb_w"], out["img2"]["thumb_h"]) == (16, 16)
    t = decode_png(bytes(out["img0"]["thumb"]))
    assert t.shape == (11, 16, 3)  # thumb is a real decodable PNG
    assert out["bad"]["thumb"] is None  # stubbed codec -> data, not failure


def test_audio_video_stub_operators(spark):
    media = spark.createDataFrame(
        pd.DataFrame(
            {
                "media_id": ["m1", "m2"],
                "bytes": [b"clip-one-bytes", b"clip-two-bytes"],
            }
        )
    )
    am = {r["media_id"]: r for r in extract_audio_meta(media).collect()}
    assert am["m1"]["decode_ok"] and am["m1"]["sample_rate"] == 16000
    assert am["m1"]["duration_s"] == am["m1"]["n_samples"] / 16000
    fr = sample_video_frames(media, every_n=10).collect()
    by_id = {}
    for r in fr:
        by_id.setdefault(r["media_id"], []).append(r)
    for mid, rows in by_id.items():
        idxs = sorted(r["frame_index"] for r in rows)
        assert idxs[0] == 0 and all(b - a == 10 for a, b in zip(idxs, idxs[1:]))
        for r in rows:
            assert r["ts_s"] == r["frame_index"] / 25.0
    # determinism: same bytes -> same frames/hashes on a second run
    fr2 = sample_video_frames(media, every_n=10).collect()
    assert sorted(map(tuple, fr)) == sorted(map(tuple, fr2))
