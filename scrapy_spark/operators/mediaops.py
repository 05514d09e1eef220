"""Audio/video binary-column plumbing: typed metadata + frame sampling.

The reference's media extraction decodes audio/video with ffmpeg-backed
libs (``media_extraction.py``); none of those codecs exist in this
container, so the DECODE step is stubbed behind a deterministic fake —
but the Spark-side contract is real and tested: opaque ``binary`` columns
with typed metadata, Arrow-batched ``mapInPandas``, narrow typed outputs,
uniform stride sampling. Swapping ``_fake_decode_*`` for a real codec
changes no schema, no partitioning and no operator code.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame

AUDIO_META_SCHEMA = (
    "media_id string, sample_rate int, n_samples long, duration_s double, "
    "rms double, decode_ok boolean"
)

FRAME_SCHEMA = (
    "media_id string, frame_index int, ts_s double, frame_phash long, "
    "decode_ok boolean"
)


def _fake_decode_audio(data: bytes) -> tuple[int, np.ndarray]:
    """DETERMINISTIC FAKE (real codec absent): derives a waveform from the
    byte content so tests exercise true data flow. Replace with e.g.
    soundfile.read when the library exists."""
    seed = int.from_bytes(data[:8].ljust(8, b"\0"), "little")
    rng = np.random.default_rng(seed)
    n = 1600 + seed % 800
    return 16000, (rng.standard_normal(n) * 0.1).astype(np.float32)


def _fake_decode_video_frames(data: bytes, stride: int) -> list[tuple[int, float, int]]:
    """DETERMINISTIC FAKE frame sampler: (frame_index, timestamp, phash)
    per sampled frame at 25 fps; phash derives from (bytes, index)."""
    seed = int.from_bytes(data[:8].ljust(8, b"\0"), "little")
    n_frames = 50 + seed % 100
    out = []
    for i in range(0, n_frames, stride):
        h = (seed * 1000003 + i * 0x9E3779B9) & ((1 << 63) - 1)
        out.append((i, i / 25.0, h))
    return out


def extract_audio_meta(media: DataFrame) -> DataFrame:
    """(media_id, bytes) -> per-clip audio metadata (rate, length, RMS)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for row in pdf.itertuples(index=False):
                try:
                    rate, wave = _fake_decode_audio(bytes(row.bytes))
                    out.append(
                        {
                            "media_id": row.media_id,
                            "sample_rate": rate,
                            "n_samples": len(wave),
                            "duration_s": len(wave) / rate,
                            "rms": float(np.sqrt(np.mean(wave**2))),
                            "decode_ok": True,
                        }
                    )
                except Exception:
                    out.append(
                        {
                            "media_id": row.media_id,
                            "sample_rate": None,
                            "n_samples": None,
                            "duration_s": None,
                            "rms": None,
                            "decode_ok": False,
                        }
                    )
            yield pd.DataFrame(out)

    return media.select("media_id", "bytes").mapInPandas(
        run, schema=AUDIO_META_SCHEMA
    )


def sample_video_frames(media: DataFrame, every_n: int = 10) -> DataFrame:
    """(media_id, bytes) -> one row per sampled frame (uniform stride).

    Explodes inside the Arrow batch — the wide binary column never leaves
    the task, only narrow frame rows do (same bytes discipline as the
    image path)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for row in pdf.itertuples(index=False):
                try:
                    for idx, ts, ph in _fake_decode_video_frames(
                        bytes(row.bytes), every_n
                    ):
                        out.append(
                            {
                                "media_id": row.media_id,
                                "frame_index": idx,
                                "ts_s": ts,
                                "frame_phash": ph,
                                "decode_ok": True,
                            }
                        )
                except Exception:
                    out.append(
                        {
                            "media_id": row.media_id,
                            "frame_index": None,
                            "ts_s": None,
                            "frame_phash": None,
                            "decode_ok": False,
                        }
                    )
            yield pd.DataFrame(out)

    return media.select("media_id", "bytes").mapInPandas(run, schema=FRAME_SCHEMA)
