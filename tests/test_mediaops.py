"""Multimodal plumbing: real bilinear resize/thumbnail over the PNG codec,
and the audio/video operators over REAL WAV/AVI parsing
(functions/mediafn): schema, Arrow batching, per-frame explode,
determinism, and labeled unsupported-codec rows."""

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


def _sine(freq: float, secs: float, rate: int) -> np.ndarray:
    t = np.arange(int(secs * rate), dtype=np.float32) / rate
    return (0.5 * np.sin(2 * np.pi * freq * t)).astype(np.float32)


def test_audio_meta_from_real_wav(spark):
    """extract_audio_meta decodes ACTUAL WAV bytes (functions/mediafn):
    rate/duration from the header, RMS from the real samples — a 0.5-amp
    sine's RMS is 0.5/sqrt(2)."""
    from scrapy_spark.functions.mediafn import encode_wav

    rate = 16000
    clips = {
        "m_sine": encode_wav(_sine(440, 1.0, rate), rate, bits=16),
        "m_stereo": encode_wav(
            np.stack([_sine(220, 0.5, rate), _sine(330, 0.5, rate)], axis=1),
            rate,
            bits=32,
        ),
        "m_silence": encode_wav(np.zeros(800, dtype=np.float32), 8000, bits=16),
        "m_bad": b"ID3\x03mp3-ish-bytes",
    }
    media = spark.createDataFrame(
        pd.DataFrame({"media_id": list(clips), "bytes": list(clips.values())})
    )
    am = {r["media_id"]: r for r in extract_audio_meta(media).collect()}
    s = am["m_sine"]
    assert s["decode_ok"] and s["sample_rate"] == rate and s["n_channels"] == 1
    assert s["n_samples"] == rate and s["duration_s"] == 1.0
    assert abs(s["rms"] - 0.5 / np.sqrt(2)) < 1e-3
    st_ = am["m_stereo"]
    assert st_["n_channels"] == 2 and st_["n_samples"] == rate // 2
    assert am["m_silence"]["rms"] == 0.0
    assert am["m_silence"]["duration_s"] == 0.1
    bad = am["m_bad"]
    assert not bad["decode_ok"] and "ValueError" in bad["decode_error"]


def test_video_frames_from_real_avi(spark):
    """sample_video_frames walks a REAL AVI/MJPEG container and hashes
    JPEG-decoded frames; the stride only decodes sampled frames."""
    from scrapy_spark.functions.imagefn import phash64, synth_pixels
    from scrapy_spark.functions.jpegfn import decode_jpeg
    from scrapy_spark.functions.mediafn import encode_avi_mjpeg, parse_avi_mjpeg

    frames = [synth_pixels(f"vid-f{i}", 32, 24) for i in range(25)]
    avi = encode_avi_mjpeg(frames, fps=25)
    media = spark.createDataFrame(
        pd.DataFrame(
            {"media_id": ["v1", "v_bad"], "bytes": [avi, b"RIFF\x00\x00\x00\x00AVI "]}
        )
    )
    fr = sample_video_frames(media, every_n=10).collect()
    good = sorted(
        (r for r in fr if r["media_id"] == "v1"), key=lambda r: r["frame_index"]
    )
    assert [r["frame_index"] for r in good] == [0, 10, 20]
    # timing from the stream header, hashes from the REAL decoded pixels
    _, payloads = parse_avi_mjpeg(avi)
    for r in good:
        assert r["ts_s"] == r["frame_index"] / 25.0
        assert r["frame_phash"] == phash64(decode_jpeg(payloads[r["frame_index"]]))
    bad = [r for r in fr if r["media_id"] == "v_bad"]
    assert len(bad) == 1 and not bad[0]["decode_ok"]
    # determinism: same bytes -> same frames/hashes on a second run
    fr2 = sample_video_frames(media, every_n=10).collect()
    assert sorted(map(tuple, fr)) == sorted(map(tuple, fr2))


def test_non_mjpeg_avi_is_labeled_unsupported(spark):
    """An H.264-flavored AVI surfaces as decode_ok=false with the labeled
    NotImplementedError — data, never a fabricated result."""
    from scrapy_spark.functions.imagefn import synth_pixels
    from scrapy_spark.functions.mediafn import encode_avi_mjpeg

    avi = bytearray(encode_avi_mjpeg([synth_pixels("h264", 16, 16)], fps=25))
    idx = bytes(avi).index(b"MJPG")  # strh fccHandler
    avi[idx : idx + 4] = b"H264"
    media = spark.createDataFrame(
        pd.DataFrame({"media_id": ["x"], "bytes": [bytes(avi)]})
    )
    rows = sample_video_frames(media).collect()
    assert len(rows) == 1 and not rows[0]["decode_ok"]
    assert "NotImplementedError" in rows[0]["decode_error"]


def test_wav_24bit_decode_path():
    """24-bit PCM has no encoder here — hand-pack a file to pin the
    sign-extension in decode_wav."""
    import struct

    from scrapy_spark.functions.mediafn import decode_wav

    vals = [0, 1 << 22, -(1 << 22), (1 << 23) - 1, -(1 << 23)]
    raw = b"".join(struct.pack("<i", v)[:3] for v in vals)
    fmt = struct.pack("<HHIIHH", 1, 1, 44100, 44100 * 3, 3, 24)
    body = b"fmt " + struct.pack("<I", len(fmt)) + fmt
    body += b"data" + struct.pack("<I", len(raw)) + raw + (b"\x00" if len(raw) % 2 else b"")
    wav = b"RIFF" + struct.pack("<I", 4 + len(body)) + b"WAVE" + body
    rate, out = decode_wav(wav)
    assert rate == 44100 and out.shape == (5, 1)
    expect = np.array([v / float(1 << 23) for v in vals], dtype=np.float32)
    assert np.allclose(out[:, 0], expect)


def test_video_neardup_pairs_constructed(spark):
    """Video near-dup from frame phashes: A and B share 3 frames within
    hamming 1 (at different frame indexes), C is unrelated; the
    min_shared_frames gate holds on both sides."""
    import hashlib

    from scrapy_spark.operators.mediaops import video_neardup_pairs

    def h64(tag):
        v = int.from_bytes(hashlib.md5(tag.encode()).digest()[:8], "big")
        return v - (1 << 64) if v >= 1 << 63 else v

    def flip(v, bit):
        v ^= 1 << bit
        v &= (1 << 64) - 1
        return v - (1 << 64) if v >= 1 << 63 else v

    pa = [h64(f"vframe{i}") for i in range(5)]
    rows = (
        [("va", i, pa[i]) for i in range(5)]
        # B: A's first three frames perturbed 1 bit, shifted indexes
        + [("vb", i + 7, flip(pa[i], 11)) for i in range(3)]
        + [("vb", 20, h64("vb-own1")), ("vb", 21, h64("vb-own2"))]
        + [("vc", i, h64(f"vc{i}")) for i in range(5)]
    )
    frames = spark.createDataFrame(
        rows, "media_id string, frame_index int, frame_phash long"
    )
    got = video_neardup_pairs(frames, max_hamming=3, min_shared_frames=2).collect()
    assert len(got) == 1
    r = got[0]
    assert (r["media_a"], r["media_b"]) == ("va", "vb")
    assert r["shared_a"] == 3 and r["shared_b"] == 3 and r["n_frame_matches"] == 3
    assert (
        video_neardup_pairs(frames, max_hamming=3, min_shared_frames=4).count() == 0
    )


def test_video_neardup_from_real_avis(spark):
    """End-to-end: two AVIs carrying the same pixel content at shifted
    positions pair up via content matching (frame_index never compared);
    a third AVI with different pixels stays unpaired."""
    from pyspark.sql import functions as F

    from scrapy_spark.functions.imagefn import synth_pixels
    from scrapy_spark.functions.mediafn import encode_avi_mjpeg
    from scrapy_spark.operators.mediaops import video_neardup_pairs

    shared = [synth_pixels(f"vshare{i}", 32, 24) for i in range(30)]
    v1 = encode_avi_mjpeg(shared[:25], fps=25)
    v2 = encode_avi_mjpeg(shared[5:30], fps=25)  # same content, offset 5
    v3 = encode_avi_mjpeg(
        [synth_pixels(f"vother{i}", 32, 24) for i in range(25)], fps=25
    )
    media = spark.createDataFrame(
        pd.DataFrame({"media_id": ["v1", "v2", "v3"], "bytes": [v1, v2, v3]})
    )
    frames = sample_video_frames(media, every_n=5).filter(F.col("decode_ok"))
    got = {
        (r["media_a"], r["media_b"]): r
        for r in video_neardup_pairs(
            frames, max_hamming=0, min_shared_frames=2
        ).collect()
    }
    # v1 samples content indexes {0,5,10,15,20}; v2 samples {5,10,15,20,25}
    # -> 4 shared pixel-identical frames at DIFFERENT frame_index positions
    assert set(got) == {("v1", "v2")}
    assert got[("v1", "v2")]["shared_a"] == 4
    assert got[("v1", "v2")]["shared_b"] == 4


def test_audio_fingerprint_properties():
    """Gain invariance (exact at 2^k), graded hamming by similarity, and
    the too-short guard."""
    import pytest

    from scrapy_spark.functions.mediafn import audio_fingerprint

    t = np.linspace(0, 1, 8000)

    def mk(freq, decay):
        return (np.sin(2 * np.pi * freq * t) * np.exp(-t * decay)).astype(
            np.float32
        )

    def ham(a, b):
        return bin((a ^ b) & ((1 << 64) - 1)).count("1")

    base = audio_fingerprint(mk(440, 2))
    assert audio_fingerprint((mk(440, 2) * 0.5).astype(np.float32)) == base
    assert audio_fingerprint((mk(440, 2) * 0.25).astype(np.float32)) == base
    rng = np.random.default_rng(7)
    noised = (mk(440, 2) + rng.normal(0, 1e-4, t.shape)).astype(np.float32)
    assert ham(base, audio_fingerprint(noised)) <= 2   # near-dup stays near
    near = ham(base, audio_fingerprint(mk(523, 2)))
    far = ham(base, audio_fingerprint(rng.normal(0, 0.3, t.shape).astype(np.float32)))
    assert near < far and far >= 15                    # graded distance
    # stereo mixes down; too-short clips raise (surfaced as data by the op)
    stereo = np.stack([mk(440, 2), mk(440, 2)], axis=1)
    assert audio_fingerprint(stereo) == base
    with pytest.raises(ValueError, match="too short"):
        audio_fingerprint(np.zeros(10, dtype=np.float32))


def test_audio_neardup_pairs_from_real_wavs(spark):
    """End-to-end over REAL encoded WAVs: a half-gain re-encode pairs with
    its original at hamming 0; unrelated noise stays unpaired; a corrupt
    clip flows through as a decode_error row."""
    from pyspark.sql import functions as F

    from scrapy_spark.functions.mediafn import encode_wav
    from scrapy_spark.operators.mediaops import (
        audio_fingerprints,
        audio_neardup_pairs,
    )

    t = np.linspace(0, 1, 8000)
    tone = (np.sin(2 * np.pi * 440 * t) * np.exp(-t * 2)).astype(np.float32)
    rng = np.random.default_rng(11)
    noise = rng.normal(0, 0.3, t.shape).astype(np.float32)
    media = spark.createDataFrame(
        pd.DataFrame(
            {
                "media_id": ["orig", "regain", "noise", "bad"],
                "bytes": [
                    encode_wav(tone.reshape(-1, 1), 8000),
                    encode_wav((tone * 0.5).reshape(-1, 1), 8000),
                    encode_wav(noise.reshape(-1, 1), 8000),
                    b"RIFF\x00\x00\x00\x00WAVE",
                ],
            }
        )
    )
    fps = audio_fingerprints(media)
    rows = {r["media_id"]: r for r in fps.collect()}
    assert not rows["bad"]["decode_ok"]
    got = audio_neardup_pairs(
        fps.filter(F.col("decode_ok")), max_hamming=3
    ).collect()
    assert len(got) == 1
    r = got[0]
    assert (r["media_a"], r["media_b"]) == ("orig", "regain")
    assert r["hamming"] == 0


def test_gif_neardup_from_real_animations(spark):
    """End-to-end animated-GIF near-dup: real GIF89a animations through
    decode_gif_frames -> phash -> the SAME video_neardup_pairs kernel.
    B re-encodes A's frames with a tiny brightness perturbation (phash
    within the hamming radius, content-matched despite B's two extra
    leading frames shifting every index); C is unrelated noise."""
    import numpy as np
    import pandas as pd
    from pyspark.sql import functions as F

    from scrapy_spark.functions.giffn import encode_gif_animation
    from scrapy_spark.operators.mediaops import (
        sample_gif_frames,
        video_neardup_pairs,
    )

    rng = np.random.RandomState(5)
    # smooth gradient frames: a tiny uniform brightness shift moves few
    # phash bits (phash thresholds against the block median)
    base = [
        (np.add.outer(np.arange(32) * 4, np.arange(32) * 3) % 200 + i * 13)
        .astype(np.uint8)
        for i in range(4)
    ]
    a_frames = [np.stack([f] * 3, axis=-1) for f in base]
    b_frames = [
        np.stack([np.clip(f.astype(np.int16) + 2, 0, 255).astype(np.uint8)] * 3,
                 axis=-1)
        for f in base
    ]
    extra = [
        (rng.randint(0, 4, (32, 32, 3)) * 70).astype(np.uint8) for _ in range(2)
    ]
    c_frames = [
        (rng.randint(0, 4, (32, 32, 3)) * 80).astype(np.uint8) for _ in range(4)
    ]
    rows = pd.DataFrame(
        {
            "media_id": ["ga", "gb", "gc"],
            "bytes": [
                encode_gif_animation(a_frames),
                encode_gif_animation(extra + b_frames),
                encode_gif_animation(c_frames),
            ],
        }
    )
    media = spark.createDataFrame(rows)
    frames = sample_gif_frames(media).filter("decode_ok")
    per = {r["media_id"]: r["n"] for r in
           frames.groupBy("media_id").agg(F.count("*").alias("n")).collect()}
    assert per == {"ga": 4, "gb": 6, "gc": 4}
    got = video_neardup_pairs(frames, max_hamming=3, min_shared_frames=2).collect()
    assert len(got) == 1
    r = got[0]
    assert (r["media_a"], r["media_b"]) == ("ga", "gb")
    assert r["shared_a"] >= 2 and r["shared_b"] >= 2
