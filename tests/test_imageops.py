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


def test_image_caption_filter_brute_force(spark):
    """Spark funnel == sequential twin on constructed rows planting every
    drop reason plus clean keeps."""
    import pandas as pd

    from scrapy_spark.operators.imageops import (
        image_caption_filter,
        py_image_caption_filter,
    )

    rows = [
        # clean keeps
        {"image_id": "ok1", "w": 640, "h": 480, "fmt": "png",
         "caption": "a dog on the lawn", "phash": 111},
        {"image_id": "ok2", "w": 200, "h": 200, "fmt": "jpeg",
         "caption": "campus building at dusk", "phash": 222},
        # too small
        {"image_id": "tiny", "w": 16, "h": 500, "fmt": "png",
         "caption": "tracking pixel art", "phash": 333},
        # banner aspect
        {"image_id": "banner", "w": 1200, "h": 100, "fmt": "gif",
         "caption": "wide banner advertisement here", "phash": 444},
        # caption too short / too long
        {"image_id": "short", "w": 300, "h": 300, "fmt": "png",
         "caption": "x", "phash": 555},
        {"image_id": "long", "w": 300, "h": 300, "fmt": "png",
         "caption": " ".join(["kw"] * 70), "phash": 666},
        # boilerplate caption x3
        *[{"image_id": f"boiler{i}", "w": 300, "h": 300, "fmt": "png",
           "caption": "logo", "phash": 700 + i} for i in range(3)],
        # exact phash dup pair
        {"image_id": "dupa", "w": 300, "h": 300, "fmt": "png",
         "caption": "the original image caption", "phash": 999},
        {"image_id": "dupb", "w": 300, "h": 300, "fmt": "png",
         "caption": "a mirrored re-upload caption", "phash": 999},
        # NULL caption (real-HTTP image without alt text) == empty caption
        {"image_id": "noalt", "w": 300, "h": 300, "fmt": "png",
         "caption": None, "phash": 1111},
        # NULL phash (failed decode in a metadata parquet): unknown content,
        # kept as a singleton — never silently dropped, never a dup group
        {"image_id": "nohash", "w": 300, "h": 300, "fmt": "png",
         "caption": "decode failed but caption fine ok", "phash": None},
    ]
    df = spark.createDataFrame(pd.DataFrame(rows))
    got = {r["image_id"]: r.asDict() for r in image_caption_filter(df).collect()}
    want = {r["image_id"]: r for r in py_image_caption_filter(rows)}
    assert set(got) == set(want)
    for iid, w in want.items():
        g = got[iid]
        for k in w:
            assert g[k] == w[k], (iid, k, g[k], w[k])
    assert got["ok1"]["keep"] and got["ok2"]["keep"]
    for iid in ("tiny", "banner", "short", "long",
                "boiler0", "boiler1", "boiler2", "dupa", "dupb", "noalt"):
        assert not got[iid]["keep"], iid
    assert got["noalt"]["caption_tokens"] == 0  # never -1 from size(NULL)
    assert "nohash" in got  # null phash row survives the frequency join
    assert not got["nohash"]["dup_phash"] and got["nohash"]["keep"]


def test_imagefilter_cli_on_synth_images(spark, tmp_path, capsys):
    """CLI lock: the funnel over real synth-built input_hint images; JSON
    summary equals the sequential twin's aggregate."""
    import json

    import pandas as pd

    from main import main as cli_main
    from scrapy_spark.operators.imageops import py_image_caption_filter
    from scrapy_spark.sources import synth
    from scrapy_spark.sources.synth import SynthConfig

    cfg = SynthConfig(seed=13, n_hosts=4, n_pages=40, n_images=25)
    pdf = synth.build_images(cfg).drop(columns=["bytes"])
    # plant two rows the funnel must drop (the clean synth corpus keeps
    # everything at default knobs — verified by the twin equality below)
    planted = pd.DataFrame(
        [
            {"image_id": "planted-tiny", "w": 8, "h": 8, "fmt": "png",
             "caption": "tiny planted image", "phash": -12345},
            {"image_id": "planted-dup", "w": 100, "h": 100, "fmt": "png",
             "caption": "planted exact dup", "phash": int(pdf["phash"].iloc[0])},
        ]
    )
    pdf = pd.concat([pdf, planted.astype(pdf.dtypes.to_dict())],
                    ignore_index=True)
    path = str(tmp_path / "images.parquet")
    spark.createDataFrame(pdf).write.parquet(path)

    rc = cli_main(["imagefilter", "--images", path])
    assert rc in (0, None)
    out = capsys.readouterr().out
    summary = json.loads([l for l in out.splitlines() if l.startswith("{")][-1])

    twin = py_image_caption_filter(pdf.to_dict("records"))
    assert summary["images"] == len(twin) == 27
    assert summary["kept"] == sum(1 for t in twin if t["keep"])
    for reason in ("too_small", "bad_aspect", "caption_short",
                   "caption_long", "dup_caption", "dup_phash"):
        assert summary[reason] == sum(1 for t in twin if t[reason]), reason
    # the synth corpus must exercise the funnel non-vacuously
    assert 0 < summary["kept"] < summary["images"]


def test_imagefilter_cli_workdir_mode(spark, tmp_path, capsys):
    """imagefilter --workdir: decode real fetched bytes, funnel on decoded
    dims + crawl captions; summary counts consistent."""
    import json

    from main import main as cli_main
    from scrapy_spark.plans.crawl import CrawlJob, CrawlParams
    from scrapy_spark.sources.synth import SynthConfig

    wd = str(tmp_path / "crawl")
    cfg = SynthConfig(seed=9, n_hosts=4, n_pages=40, n_images=12)
    CrawlJob(spark, cfg, CrawlParams(max_generations=3, per_host_budget=6), wd).run()

    rc = cli_main(["imagefilter", "--workdir", wd])
    assert rc in (0, None)
    out = capsys.readouterr().out
    summary = json.loads([l for l in out.splitlines() if l.startswith("{")][-1])
    assert summary["images"] > 0
    assert summary["kept"] + summary["dropped"] == summary["images"]
    # mode exclusivity guard
    assert cli_main(["imagefilter"]) == 2


def test_image_caption_filter_neardup_arm(spark):
    """Round-6 verdict #6: opt-in ``drop_neardups`` drops banded-hamming
    phash near-dups (not just exact-phash ones), keeping one image per
    component (min image_id). Planted: a 1-bit-flip pair, a 3-node 1-bit
    chain, and an exact-dup group adjacent to a near phash; Spark funnel ==
    sequential union-find twin on every column."""
    import pandas as pd

    from scrapy_spark.operators.imageops import (
        image_caption_filter,
        py_image_caption_filter,
    )

    def img(iid, phash, caption):
        return {"image_id": iid, "w": 300, "h": 300, "fmt": "png",
                "caption": caption, "phash": phash}

    rows = [
        # 1-bit-flip near-dup pair: keeper = min image_id ("nd-a")
        img("nd-a", 0b1011_0000_1111_0000, "a lighthouse at noon"),
        img("nd-b", 0b1011_0000_1111_0001, "a lighthouse at noon again"),
        # 1-bit chain p, p^1, p^3 — pairwise hamming 1/1/2, ONE component
        img("chain-1", 1 << 40, "first crop of the quad"),
        img("chain-2", (1 << 40) | 1, "second crop of the quad"),
        img("chain-3", (1 << 40) | 3, "third crop of the quad"),
        # exact-dup pair whose phash is ALSO 2 bits from a third image:
        # x1/x2 fire dup_phash; the component {q, q^2} elects min("x1",
        # "x2", "y-solo") and drops the rest as near-dups
        img("x1", 0b111000, "original upload of the statue"),
        img("x2", 0b111000, "mirror upload of the statue"),
        img("y-solo", 0b111010, "recompressed statue image"),
        # far singleton + null phash: never near-dup members
        img("far", 0x5555555555555555, "an unrelated mountain photo"),
        img("nohash", None, "decode failed caption present"),
    ]
    df = spark.createDataFrame(
        [tuple(r.values()) for r in rows],
        "image_id string, w int, h int, fmt string, caption string, "
        "phash long",  # the input_hint contract type (int64, nullable)
    )
    got = {r["image_id"]: r.asDict()
           for r in image_caption_filter(df, drop_neardups=True).collect()}
    want = {r["image_id"]: r
            for r in py_image_caption_filter(rows, drop_neardups=True)}
    assert set(got) == set(want)
    for iid, w in want.items():
        for k in w:
            assert got[iid][k] == w[k], (iid, k, got[iid][k], w[k])
    # keepers survive, non-keepers carry dup_neardup
    assert got["nd-a"]["keep"] and not got["nd-a"]["dup_neardup"]
    assert got["nd-b"]["dup_neardup"] and not got["nd-b"]["keep"]
    assert got["chain-1"]["keep"]
    assert got["chain-2"]["dup_neardup"] and got["chain-3"]["dup_neardup"]
    assert got["x1"]["dup_phash"] and not got["x1"]["dup_neardup"]
    assert got["x2"]["dup_phash"] and got["x2"]["dup_neardup"]
    assert got["y-solo"]["dup_neardup"] and not got["y-solo"]["dup_phash"]
    assert got["far"]["keep"] and got["nohash"]["keep"]
    # default stays off: same rows, no near-dup column firing
    off = {r["image_id"]: r.asDict()
           for r in image_caption_filter(df).collect()}
    assert not any(r["dup_neardup"] for r in off.values())
    assert off["nd-b"]["keep"] and off["y-solo"]["keep"]


def test_aspect_bucket_assign_twin_and_exactness(spark):
    """Spark argmin over the exact-integer rational compare == the
    Fraction-arithmetic twin, including boundary aspects exactly between
    two buckets (tie -> earlier ladder entry) and extreme panoramas."""
    from scrapy_spark.operators.imageops import (
        ASPECT_LADDER,
        aspect_bucket_assign,
        aspect_bucket_stats,
        py_aspect_bucket_assign,
    )

    rows = [
        {"image_id": "sq", "w": 500, "h": 500},        # square -> 512x512
        {"image_id": "land", "w": 1280, "h": 1000},    # 1.28 ~ 576/448
        {"image_id": "port", "w": 1000, "h": 1280},
        {"image_id": "wide", "w": 1665, "h": 1000},    # 1.665 ~ 640/384
        {"image_id": "pano", "w": 4000, "h": 1000},    # beyond ladder: 704/320
        {"image_id": "tall", "w": 320, "h": 3000},
        # EXACT midpoint of 512/512 (1) and 576/448 (9/7): aspect 8/7
        # -> |8/7-1| = 1/7 == |8/7-9/7|; tie must take the EARLIER entry
        {"image_id": "mid", "w": 8, "h": 7},
        {"image_id": "small", "w": 16, "h": 16},       # upscale case
    ]
    df = spark.createDataFrame(
        [(r["image_id"], r["w"], r["h"]) for r in rows],
        "image_id string, w int, h int",
    )
    got = {r["image_id"]: r.asDict()
           for r in aspect_bucket_assign(df).collect()}
    want = {r["image_id"]: r for r in py_aspect_bucket_assign(rows)}
    assert got == want
    assert (got["sq"]["bucket_w"], got["sq"]["bucket_h"]) == (512, 512)
    assert (got["land"]["bucket_w"], got["land"]["bucket_h"]) == (576, 448)
    assert (got["port"]["bucket_w"], got["port"]["bucket_h"]) == (448, 576)
    assert (got["pano"]["bucket_w"], got["pano"]["bucket_h"]) == (704, 320)
    assert (got["tall"]["bucket_w"], got["tall"]["bucket_h"]) == (320, 704)
    assert (got["mid"]["bucket_w"], got["mid"]["bucket_h"]) == (512, 512)
    # mirror symmetry: transposing w/h lands in the mirrored bucket
    for a, b in (("land", "port"), ("pano", "tall")):
        assert (got[a]["bucket_w"], got[a]["bucket_h"]) == (
            got[b]["bucket_h"], got[b]["bucket_w"],
        )
    stats = {(r["bucket_w"], r["bucket_h"]): r.asDict()
             for r in aspect_bucket_stats(aspect_bucket_assign(df)).collect()}
    assert stats[(512, 512)]["n_images"] == 3      # sq, mid, small
    # all three sit below 512 on an axis (sq is 500x500) -> all upscale
    assert stats[(512, 512)]["n_upscaled"] == 3
    assert sum(s["n_images"] for s in stats.values()) == len(rows)
    assert set(stats) <= set(ASPECT_LADDER)


def test_aspect_bucket_assign_on_synth_images(spark):
    """Twin equality over the real synth input_hint corpus (every image
    assigned, no nulls, plan stays shuffle-free for the assignment)."""
    import pandas as pd

    from scrapy_spark.operators.imageops import (
        aspect_bucket_assign, py_aspect_bucket_assign,
    )
    from scrapy_spark.sources import synth
    from scrapy_spark.sources.synth import SynthConfig

    pdf = synth.build_images(SynthConfig(seed=7, n_hosts=4, n_pages=60,
                                         n_images=40)).drop(columns=["bytes"])
    df = spark.createDataFrame(pdf)
    out = aspect_bucket_assign(df)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, plan   # pure row-local column exprs
    got = {r["image_id"]: r.asDict() for r in out.collect()}
    want = {r["image_id"]: r
            for r in py_aspect_bucket_assign(pdf.to_dict("records"))}
    assert got == want and len(got) == len(pdf)


def test_imagebuckets_orientation_requires_resize(spark, tmp_path, capsys):
    """--apply-orientation without --resize must refuse (rc 2), not
    silently compute stats from unoriented dims (r7 ADVICE item)."""
    from main import main as cli_main
    from scrapy_spark.sources import synth
    from scrapy_spark.sources.synth import SynthConfig

    pdf = synth.build_images(SynthConfig(seed=21, n_hosts=4, n_pages=50,
                                         n_images=10)).drop(columns=["bytes"])
    path = str(tmp_path / "images.parquet")
    spark.createDataFrame(pdf).write.parquet(path)
    rc = cli_main(["imagebuckets", "--images", path, "--apply-orientation"])
    assert rc == 2
    assert "--apply-orientation requires --resize" in capsys.readouterr().err


def test_imagebuckets_cli(spark, tmp_path, capsys):
    """CLI lock: occupancy summary over a synth corpus equals the twin's
    aggregate; counts cover every image."""
    import json
    from collections import Counter

    from main import main as cli_main
    from scrapy_spark.operators.imageops import py_aspect_bucket_assign
    from scrapy_spark.sources import synth
    from scrapy_spark.sources.synth import SynthConfig

    pdf = synth.build_images(SynthConfig(seed=21, n_hosts=4, n_pages=50,
                                         n_images=30)).drop(columns=["bytes"])
    path = str(tmp_path / "images.parquet")
    spark.createDataFrame(pdf).write.parquet(path)
    rc = cli_main(["imagebuckets", "--images", path])
    assert rc in (0, None)
    out = capsys.readouterr().out
    summary = json.loads([l for l in out.splitlines() if l.startswith("{")][-1])
    twin = Counter(
        (r["bucket_w"], r["bucket_h"])
        for r in py_aspect_bucket_assign(pdf.to_dict("records"))
    )
    assert summary["images"] == len(pdf) == sum(twin.values())
    got = {(b["bucket_w"], b["bucket_h"]): b["n_images"]
           for b in summary["buckets"]}
    assert got == dict(twin)


def test_cover_geometry_hand_computed():
    from scrapy_spark.operators.imageops import cover_geometry

    # 100x100 into 576x448: cover scale 5.76 -> 576x576, crop centered in y
    assert cover_geometry(100, 100, 576, 448) == (576, 576, 0, 64)
    # exact-fit: no crop
    assert cover_geometry(512, 512, 512, 512) == (512, 512, 0, 0)
    # downscale-to-cover with a wide source: height binds
    assert cover_geometry(1280, 640, 512, 512) == (1024, 512, 256, 0)
    # both axes always reach the bucket even when rounding would undershoot
    sw, sh, cx, cy = cover_geometry(333, 100, 704, 320)
    assert sw >= 704 and sh >= 320 and cx >= 0 and cy >= 0


def test_resize_bilinear_matches_naive_loop():
    """Pin the vectorized numpy bilinear kernel against a per-pixel pure
    Python loop of the same convention (align_corners=False, edge clamp,
    rint): the twin the numpy layering must never drift from."""
    import numpy as np

    from scrapy_spark.functions.imagefn import resize_bilinear

    rng = np.random.default_rng(3)
    px = rng.integers(0, 256, size=(5, 7, 3), dtype=np.uint8)
    out_w, out_h = 4, 3
    got = resize_bilinear(px, out_w, out_h)
    h, w = px.shape[:2]
    want = np.zeros((out_h, out_w, 3), dtype=np.uint8)
    for oy in range(out_h):
        for ox in range(out_w):
            ys = (oy + 0.5) * (h / out_h) - 0.5
            xs = (ox + 0.5) * (w / out_w) - 0.5
            y0 = min(max(int(np.floor(ys)), 0), h - 1)
            x0 = min(max(int(np.floor(xs)), 0), w - 1)
            y1 = min(y0 + 1, h - 1)
            x1 = min(x0 + 1, w - 1)
            wy = min(max(ys - y0, 0.0), 1.0)
            wx = min(max(xs - x0, 0.0), 1.0)
            for c in range(3):
                top = px[y0, x0, c] * (1 - wx) + px[y0, x1, c] * wx
                bot = px[y1, x0, c] * (1 - wx) + px[y1, x1, c] * wx
                want[oy, ox, c] = np.uint8(
                    np.clip(np.rint(top * (1 - wy) + bot * wy), 0, 255)
                )
    assert np.array_equal(got, want)


def test_resize_to_bucket_parity_and_dims(spark):
    """Every decodable synth image resizes to EXACTLY its bucket resolution;
    full-row (bytes included) parity with the sequential twin; an
    unavailable codec surfaces as a decode_error row, never a task
    failure."""
    from pyspark.sql import functions as F

    from scrapy_spark.functions.imagefn import decode_png
    from scrapy_spark.operators.imageops import (
        py_resize_to_bucket,
        resize_to_bucket,
    )
    from scrapy_spark.sources import synth
    from scrapy_spark.sources.synth import SynthConfig

    pdf = synth.build_images(SynthConfig(seed=9, n_hosts=4, n_pages=40,
                                         n_images=18))
    df = spark.createDataFrame(pdf)
    got = {r["image_id"]: r.asDict() for r in resize_to_bucket(df).collect()}
    want = {r["image_id"]: r
            for r in py_resize_to_bucket(pdf.to_dict("records"))}
    assert set(got) == set(want) and len(got) == len(pdf)
    for iid, g in got.items():
        w = want[iid]
        assert g["decode_error"] is None, (iid, g["decode_error"])
        assert (g["bucket_w"], g["bucket_h"]) == (w["bucket_w"], w["bucket_h"])
        assert (g["scaled_w"], g["scaled_h"], g["crop_x"], g["crop_y"]) == (
            w["scaled_w"], w["scaled_h"], w["crop_x"], w["crop_y"]
        )
        assert bytes(g["resized"]) == bytes(w["resized"])  # byte-exact PNG
        px = decode_png(bytes(g["resized"]))
        assert px.shape[:2] == (g["bucket_h"], g["bucket_w"])
        # cover invariant: scaled covers the bucket; crop is centered
        assert g["scaled_w"] >= g["bucket_w"] and g["scaled_h"] >= g["bucket_h"]
        assert g["crop_x"] == (g["scaled_w"] - g["bucket_w"]) // 2
        assert g["crop_y"] == (g["scaled_h"] - g["bucket_h"]) // 2

    # unavailable codec -> data row with the labeled error
    bad = resize_to_bucket(df.limit(2).withColumn("fmt", F.lit("tiff"))).collect()
    assert len(bad) == 2
    for r in bad:
        assert r["resized"] is None and "NotImplementedError" in r["decode_error"]


def test_resize_to_bucket_dims_from_decode_equivalent(spark):
    """Crawl-row mode (no w/h columns): bucket from decoded dims must equal
    the stored-dims path byte-for-byte (the synth table's stored w/h match
    the bytes by contract)."""
    from scrapy_spark.operators.imageops import resize_to_bucket
    from scrapy_spark.sources import synth
    from scrapy_spark.sources.synth import SynthConfig

    pdf = synth.build_images(SynthConfig(seed=11, n_hosts=4, n_pages=40,
                                         n_images=10))
    df = spark.createDataFrame(pdf)
    a = {r["image_id"]: r.asDict() for r in resize_to_bucket(df).collect()}
    b = {
        r["image_id"]: r.asDict()
        for r in resize_to_bucket(
            df.drop("w", "h"), dims_from_decode=True
        ).collect()
    }
    assert set(a) == set(b)
    for iid in a:
        ra, rb = a[iid], b[iid]
        assert (ra["bucket_w"], ra["bucket_h"]) == (rb["bucket_w"], rb["bucket_h"])
        assert bytes(ra["resized"]) == bytes(rb["resized"])


def test_imagebuckets_cli_resize(spark, tmp_path, capsys):
    """CLI lock for the --resize arm: summary gains resized counts and the
    output parquet holds bucket-resolution PNGs."""
    import json

    from main import main as cli_main
    from scrapy_spark.functions.imagefn import decode_png
    from scrapy_spark.sources import synth
    from scrapy_spark.sources.synth import SynthConfig

    pdf = synth.build_images(SynthConfig(seed=23, n_hosts=4, n_pages=40,
                                         n_images=8))
    path = str(tmp_path / "images.parquet")
    spark.createDataFrame(pdf).write.parquet(path)
    out_dir = str(tmp_path / "resized")
    rc = cli_main(["imagebuckets", "--images", path, "--resize", out_dir])
    assert rc in (0, None)
    out = capsys.readouterr().out
    summary = json.loads([l for l in out.splitlines() if l.startswith("{")][-1])
    assert summary["resized"] == len(pdf)
    assert summary["resize_failed"] == 0
    rows = spark.read.parquet(out_dir).collect()
    assert len(rows) == len(pdf)
    for r in rows:
        px = decode_png(bytes(r["resized"]))
        assert px.shape[:2] == (r["bucket_h"], r["bucket_w"])


def test_resize_bilinear_window_equals_full_then_crop():
    """The crop-window sampler is bit-identical to full-resize-then-crop
    (same pixel-center coordinates restricted to the window) — the
    equivalence that lets resize_to_bucket bound memory by the bucket."""
    import numpy as np

    from scrapy_spark.functions.imagefn import (
        resize_bilinear,
        resize_bilinear_window,
    )

    rng = np.random.default_rng(5)
    px = rng.integers(0, 256, size=(9, 4, 3), dtype=np.uint8)
    full = resize_bilinear(px, 11, 23)
    for (x0, y0, ww, wh) in [(0, 0, 11, 23), (3, 5, 5, 7), (10, 22, 1, 1)]:
        win = resize_bilinear_window(px, 11, 23, x0, y0, ww, wh)
        assert np.array_equal(win, full[y0:y0 + wh, x0:x0 + ww])
    # extreme-aspect cover case stays tiny: 1x500 source covered onto
    # 704x320 implies a 704x352000 scaled grid; the window only ever
    # materializes 704x320
    spacer = rng.integers(0, 256, size=(500, 1, 3), dtype=np.uint8)
    from scrapy_spark.operators.imageops import cover_geometry

    sw, sh, cx, cy = cover_geometry(1, 500, 704, 320)
    out = resize_bilinear_window(spacer, sw, sh, cx, cy, 704, 320)
    assert out.shape == (320, 704, 3)


def test_resize_dims_from_decode_failed_rows_null_bucket(spark):
    """Decode-mode failure rows emit NULL bucket columns (no pixels -> no
    bucket), never the internal -1 sentinel; stored-dims mode keeps the
    real bucket on its error rows."""
    from pyspark.sql import functions as F

    from scrapy_spark.operators.imageops import resize_to_bucket
    from scrapy_spark.sources import synth
    from scrapy_spark.sources.synth import SynthConfig

    pdf = synth.build_images(SynthConfig(seed=13, n_hosts=4, n_pages=40,
                                         n_images=4))
    df = spark.createDataFrame(pdf).withColumn("fmt", F.lit("tiff"))
    dm = resize_to_bucket(df.drop("w", "h"), dims_from_decode=True).collect()
    assert all(r["bucket_w"] is None and r["bucket_h"] is None for r in dm)
    sd = resize_to_bucket(df).collect()
    assert all(
        r["bucket_w"] is not None and r["decode_error"] is not None for r in sd
    )


def test_resize_to_bucket_fit_letterbox(spark):
    """Fit mode: content scaled to fit INSIDE the bucket, centered on a
    black canvas; geometry hand-checked; interior equals the plain resize;
    twin parity byte-exact."""
    import numpy as np

    from scrapy_spark.functions.imagefn import decode_png, resize_bilinear
    from scrapy_spark.operators.imageops import (
        fit_geometry,
        py_resize_to_bucket,
        resize_to_bucket,
    )
    from scrapy_spark.sources import synth
    from scrapy_spark.sources.synth import SynthConfig

    # geometry: 100x100 into 576x448 fits at 448x448, padded 64 left/right
    assert fit_geometry(100, 100, 576, 448) == (448, 448, 64, 0)
    assert fit_geometry(512, 512, 512, 512) == (512, 512, 0, 0)
    # degenerate sliver never rounds to zero width
    sw, sh, ox, oy = fit_geometry(1, 500, 704, 320)
    assert sw >= 1 and sh <= 320

    pdf = synth.build_images(SynthConfig(seed=17, n_hosts=4, n_pages=40,
                                         n_images=6))
    df = spark.createDataFrame(pdf)
    got = {r["image_id"]: r.asDict()
           for r in resize_to_bucket(df, mode="fit").collect()}
    want = {r["image_id"]: r
            for r in py_resize_to_bucket(pdf.to_dict("records"), mode="fit")}
    assert set(got) == set(want)
    src = {r["image_id"]: r for r in pdf.to_dict("records")}
    for iid, g in got.items():
        assert bytes(g["resized"]) == bytes(want[iid]["resized"])
        out = decode_png(bytes(g["resized"]))
        assert out.shape[:2] == (g["bucket_h"], g["bucket_w"])
        # scaled content fits inside; offsets centered
        assert g["scaled_w"] <= g["bucket_w"] and g["scaled_h"] <= g["bucket_h"]
        assert g["crop_x"] == (g["bucket_w"] - g["scaled_w"]) // 2
        assert g["crop_y"] == (g["bucket_h"] - g["scaled_h"]) // 2
        # interior equals the plain bilinear resize; borders are black
        from scrapy_spark.functions.imagefn import decode_image

        px = decode_image(bytes(src[iid]["bytes"]), src[iid]["fmt"])
        inner = out[g["crop_y"]:g["crop_y"] + g["scaled_h"],
                    g["crop_x"]:g["crop_x"] + g["scaled_w"]]
        assert np.array_equal(
            inner, resize_bilinear(px, g["scaled_w"], g["scaled_h"])
        )
        if g["crop_x"] > 0:
            assert not out[:, : g["crop_x"]].any()
        if g["crop_y"] > 0:
            assert not out[: g["crop_y"], :].any()


def test_jpeg_quality_meta_and_funnel_arm(spark):
    """jpeg_quality_meta recovers the exact encode quality per JPEG row
    (NULL for other formats), and the funnel's min_jpeg_quality arm drops
    only the below-threshold JPEG — twin-checked with jpeg_quality fed to
    the sequential twin."""
    import numpy as np
    import pandas as pd

    from scrapy_spark.functions.imagefn import encode_png
    from scrapy_spark.functions.jpegfn import encode_jpeg
    from scrapy_spark.operators.imageops import (
        image_caption_filter,
        jpeg_quality_meta,
        py_image_caption_filter,
    )

    rng = np.random.RandomState(11)
    px = (rng.rand(64, 64, 3) * 255).astype(np.uint8)
    rows = [
        {"image_id": "lowq", "bytes": encode_jpeg(px, quality=30),
         "w": 64, "h": 64, "fmt": "jpeg",
         "caption": "heavily recompressed meme", "phash": 1},
        {"image_id": "highq", "bytes": encode_jpeg(px, quality=90),
         "w": 64, "h": 64, "fmt": "jpeg",
         "caption": "pristine press photo here", "phash": 2},
        {"image_id": "pngrow", "bytes": encode_png(px),
         "w": 64, "h": 64, "fmt": "png",
         "caption": "lossless diagram with text", "phash": 3},
    ]
    df = spark.createDataFrame(pd.DataFrame(rows))
    q = jpeg_quality_meta(df)
    got_q = {r["image_id"]: (r["jpeg_quality"], r["jpeg_quality_exact"])
             for r in q.collect()}
    assert got_q == {"lowq": (30, True), "highq": (90, True),
                     "pngrow": (None, None)}
    dec = {r["image_id"]: r.asDict()
           for r in image_caption_filter(
               df, min_jpeg_quality=50, quality=q).collect()}
    twin_rows = [dict(r, jpeg_quality=got_q[r["image_id"]][0]) for r in rows]
    want = {r["image_id"]: r
            for r in py_image_caption_filter(twin_rows, min_jpeg_quality=50)}
    for iid, w in want.items():
        for k in w:
            assert dec[iid][k] == w[k], (iid, k)
    assert dec["lowq"]["low_quality"] and not dec["lowq"]["keep"]
    assert dec["highq"]["keep"] and dec["pngrow"]["keep"]
    # threshold set without the quality table is a usage error, not a
    # silent bytes read
    import pytest

    with pytest.raises(ValueError):
        image_caption_filter(df, min_jpeg_quality=50)


def test_resize_to_bucket_apply_orientation(spark):
    """EXIF orientation 6 transposes the display aspect: a stored-portrait
    JPEG buckets as LANDSCAPE once oriented. Operator == sequential twin
    byte-for-byte, and the oriented bucket differs from the naive one."""
    import numpy as np
    import pandas as pd

    from scrapy_spark.functions.exiffn import build_exif, insert_exif
    from scrapy_spark.functions.jpegfn import encode_jpeg
    from scrapy_spark.operators.imageops import (
        py_resize_to_bucket,
        resize_to_bucket,
    )

    rng = np.random.RandomState(7)
    # stored 96h x 64w (portrait); orientation 6 displays it 64h x 96w
    px = (rng.rand(96, 64, 3) * 255).astype(np.uint8)
    b = insert_exif(encode_jpeg(px, quality=95), build_exif(orientation=6))
    rows = [{"image_id": "ori6", "bytes": b, "w": 64, "h": 96, "fmt": "jpeg"}]
    df = spark.createDataFrame(pd.DataFrame(rows))
    plain = resize_to_bucket(df).collect()[0]
    oriented = resize_to_bucket(df, apply_orientation=True).collect()[0]
    # portrait bucket vs landscape bucket
    assert plain["bucket_w"] < plain["bucket_h"]
    assert oriented["bucket_w"] > oriented["bucket_h"]
    assert (oriented["src_w"], oriented["src_h"]) == (96, 64)
    twin = py_resize_to_bucket(rows, apply_orientation=True)[0]
    for k in ("bucket_w", "bucket_h", "src_w", "src_h", "scaled_w",
              "scaled_h", "crop_x", "crop_y"):
        assert oriented[k] == twin[k], (k, oriented[k], twin[k])
    assert bytes(oriented["resized"]) == bytes(twin["resized"])
