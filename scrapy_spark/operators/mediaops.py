"""Audio/video binary-column operators: typed metadata + frame sampling.

The reference's media extraction pulls duration/metadata from audio and
samples frames from video (``media_extraction.py:199-347``). The decode
step here is REAL byte-level parsing (functions/mediafn): WAV/PCM audio is
fully decoded (rate, frames, RMS from actual samples), AVI/MJPEG video is
container-parsed and every sampled frame is decoded by the from-scratch
JPEG codec (functions/jpegfn) before hashing. Formats that genuinely need
external codec libraries (MP3, H.264, ...) surface as
``decode_ok = false`` rows with the error recorded — data, not task
failures, and never fabricated values.

Bytes discipline (same as the image path): the wide ``binary`` column
never leaves the task — operators ``mapInPandas`` over Arrow batches and
emit only narrow typed rows, so nothing below ever shuffles payload bytes.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame

AUDIO_META_SCHEMA = (
    "media_id string, sample_rate int, n_samples long, n_channels int, "
    "duration_s double, rms double, decode_ok boolean, decode_error string"
)

FRAME_SCHEMA = (
    "media_id string, frame_index int, ts_s double, frame_phash long, "
    "decode_ok boolean, decode_error string"
)


def extract_audio_meta(media: DataFrame) -> DataFrame:
    """(media_id, bytes) -> per-clip audio metadata computed from the REAL
    decoded waveform (functions/mediafn.decode_wav)."""
    from ..functions.mediafn import decode_wav

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for row in pdf.itertuples(index=False):
                try:
                    rate, samples = decode_wav(bytes(row.bytes))
                    n_frames, n_ch = samples.shape
                    out.append(
                        {
                            "media_id": row.media_id,
                            "sample_rate": rate,
                            "n_samples": n_frames,
                            "n_channels": n_ch,
                            "duration_s": n_frames / rate,
                            "rms": float(np.sqrt(np.mean(samples.astype(np.float64) ** 2))),
                            "decode_ok": True,
                            "decode_error": None,
                        }
                    )
                except Exception as exc:  # unsupported codec / corrupt bytes
                    out.append(
                        {
                            "media_id": row.media_id,
                            "sample_rate": None,
                            "n_samples": None,
                            "n_channels": None,
                            "duration_s": None,
                            "rms": None,
                            "decode_ok": False,
                            "decode_error": f"{type(exc).__name__}: {exc}",
                        }
                    )
            yield pd.DataFrame(out)

    return media.select("media_id", "bytes").mapInPandas(
        run, schema=AUDIO_META_SCHEMA
    )


def sample_video_frames(media: DataFrame, every_n: int = 10) -> DataFrame:
    """(media_id, bytes) -> one row per sampled frame (uniform stride).

    Real pipeline: AVI container walk (functions/mediafn.parse_avi_mjpeg)
    -> decode each SAMPLED frame's JPEG payload (functions/jpegfn) ->
    perceptual hash (functions/imagefn.phash64). Only sampled frames are
    decoded — the stride skips the expensive step, not just the output.
    Explodes inside the Arrow batch — the wide binary column never leaves
    the task, only narrow frame rows do."""
    from ..functions.imagefn import phash64
    from ..functions.jpegfn import decode_jpeg
    from ..functions.mediafn import parse_avi_mjpeg

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for row in pdf.itertuples(index=False):
                try:
                    fps, payloads = parse_avi_mjpeg(bytes(row.bytes))
                    for i in range(0, len(payloads), every_n):
                        px = decode_jpeg(payloads[i])
                        out.append(
                            {
                                "media_id": row.media_id,
                                "frame_index": i,
                                "ts_s": i / fps,
                                "frame_phash": phash64(px),  # already signed int64
                                "decode_ok": True,
                                "decode_error": None,
                            }
                        )
                except Exception as exc:
                    out.append(
                        {
                            "media_id": row.media_id,
                            "frame_index": None,
                            "ts_s": None,
                            "frame_phash": None,
                            "decode_ok": False,
                            "decode_error": f"{type(exc).__name__}: {exc}",
                        }
                    )
            yield pd.DataFrame(out)

    return media.select("media_id", "bytes").mapInPandas(run, schema=FRAME_SCHEMA)


def video_neardup_pairs(
    frames: DataFrame,
    max_hamming: int = 3,
    n_bands: int = 4,
    min_shared_frames: int = 2,
    materialize: bool = True,
    max_band_freq: int | None = None,
) -> DataFrame:
    """Near-duplicate VIDEO pairs from sampled-frame perceptual hashes —
    the video extension of imageops.phash_neardup_pairs (reference scope
    ends at per-frame hashing, media_extraction.py:199-347; pairing is
    rebuild-added pipeline surface).

    ``frames``: (media_id, frame_index, frame_phash) rows as produced by
    ``sample_video_frames`` (filter decode_ok first). Two videos are
    near-dups when at least ``min_shared_frames`` DISTINCT frames of each
    side match a frame of the other within ``max_hamming`` (re-encodes,
    watermarks and container changes perturb a few bits; frame sampling
    offsets shift indexes, which is why matching is by content, never by
    frame_index equality).

    The candidate join + exact verify is the SHARED banded-hamming kernel
    (imageops.banded_hamming_pairs with frame_index passthrough — one
    implementation to evolve, same complete-recall pigeonhole guarantee
    and lineage-cut discipline), followed by ONE linear groupBy to the
    (media_a, media_b) grain. Hot bands (solid-color frames: intros,
    fades) are the quadratic risk; ``max_band_freq`` caps them inside the
    kernel before the join."""
    from pyspark.sql import functions as F

    from .imageops import banded_hamming_pairs

    verified = banded_hamming_pairs(
        frames,
        max_hamming=max_hamming,
        n_bands=n_bands,
        id_col="media_id",
        phash_col="frame_phash",
        materialize=materialize,
        max_band_freq=max_band_freq,
        extra_cols=("frame_index",),
    ).withColumnsRenamed({"image_a": "media_a", "image_b": "media_b"})
    return (
        verified.groupBy("media_a", "media_b")
        .agg(
            F.countDistinct("frame_index_a").alias("shared_a"),
            F.countDistinct("frame_index_b").alias("shared_b"),
            F.count("*").alias("n_frame_matches"),
        )
        .filter(
            (F.col("shared_a") >= min_shared_frames)
            & (F.col("shared_b") >= min_shared_frames)
        )
    )


AUDIO_FP_SCHEMA = (
    "media_id string, afp long, decode_ok boolean, decode_error string"
)


def audio_fingerprints(media: DataFrame) -> DataFrame:
    """(media_id, bytes) -> 64-bit audio content fingerprint per clip
    (functions/mediafn.audio_fingerprint over the REAL decoded waveform).
    Arrow-batched; undecodable or too-short clips surface as
    decode_ok=false data rows, never task failures."""
    from ..functions.mediafn import audio_fingerprint, decode_wav

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for row in pdf.itertuples(index=False):
                try:
                    _rate, samples = decode_wav(bytes(row.bytes))
                    out.append(
                        {
                            "media_id": row.media_id,
                            "afp": audio_fingerprint(samples),
                            "decode_ok": True,
                            "decode_error": None,
                        }
                    )
                except Exception as exc:
                    out.append(
                        {
                            "media_id": row.media_id,
                            "afp": None,
                            "decode_ok": False,
                            "decode_error": f"{type(exc).__name__}: {exc}",
                        }
                    )
            yield pd.DataFrame(out)

    return media.select("media_id", "bytes").mapInPandas(
        run, schema=AUDIO_FP_SCHEMA
    )


def audio_neardup_pairs(
    fps: DataFrame,
    max_hamming: int = 3,
    n_bands: int = 4,
    materialize: bool = True,
    max_band_freq: int | None = None,
) -> DataFrame:
    """Near-duplicate AUDIO pairs over (media_id, afp) fingerprint rows
    (filter decode_ok first) — the audio leg of the multimodal dedup
    triad, sharing the SAME banded-hamming kernel as images and video
    frames (imageops.banded_hamming_pairs: band-equi candidate join,
    exact bit_count verify, complete recall for hamming < n_bands,
    hot-band cap). The fingerprint's thermometer coding makes hamming
    graded, so max_hamming is a genuine similarity radius: re-gained or
    lightly-noised re-encodes land at 0-2, unrelated content far away."""
    from .imageops import banded_hamming_pairs

    return banded_hamming_pairs(
        fps,
        max_hamming=max_hamming,
        n_bands=n_bands,
        id_col="media_id",
        phash_col="afp",
        materialize=materialize,
        max_band_freq=max_band_freq,
    ).withColumnsRenamed({"image_a": "media_a", "image_b": "media_b"})


def sample_gif_frames(media: DataFrame, every_n: int = 1) -> DataFrame:
    """(media_id, bytes) of animated GIFs -> one row per sampled
    COMPOSITED frame, same FRAME_SCHEMA as :func:`sample_video_frames` so
    the output feeds :func:`video_neardup_pairs` unchanged — animated
    GIFs (the meme format) join the multimodal near-dup triad through
    the same shared banded-hamming kernel.

    Frames are composited per GIF89a semantics (disposal methods,
    transparency, sub-rectangles — functions/giffn.decode_gif_frames)
    BEFORE hashing: a delta-encoded re-encode of the same animation then
    hashes frame-for-frame like its full-frame original. ts_s comes from
    the cumulative per-frame delays. Decode stays inside the Arrow batch;
    only narrow (media_id, frame_index, phash) rows leave the task."""
    from ..functions.giffn import decode_gif_frames
    from ..functions.imagefn import phash64

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for row in pdf.itertuples(index=False):
                try:
                    frames, delays = decode_gif_frames(bytes(row.bytes))
                    t_cs = 0
                    for i, (px, d) in enumerate(zip(frames, delays)):
                        if i % every_n == 0:
                            out.append(
                                {
                                    "media_id": row.media_id,
                                    "frame_index": i,
                                    "ts_s": t_cs / 100.0,
                                    "frame_phash": phash64(px),
                                    "decode_ok": True,
                                    "decode_error": None,
                                }
                            )
                        t_cs += d
                except Exception as exc:
                    out.append(
                        {
                            "media_id": row.media_id,
                            "frame_index": None,
                            "ts_s": None,
                            "frame_phash": None,
                            "decode_ok": False,
                            "decode_error": f"{type(exc).__name__}: {exc}",
                        }
                    )
            yield pd.DataFrame(out)

    return media.select("media_id", "bytes").mapInPandas(run, schema=FRAME_SCHEMA)
