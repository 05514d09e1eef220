"""WAV/PCM and AVI/MJPEG container codecs from scratch — numpy + struct.

Replaces the last deterministic decode FAKES in operators/mediaops with
real byte-level parsers (the reference extracts audio/video metadata with
ffmpeg-backed libs, ``media_extraction.py:199-347``; those codecs are
absent here, but the CONTAINER formats are plain RIFF and fully
stdlib-parseable):

- WAV: RIFF/WAVE with ``fmt `` + ``data`` chunks; PCM (format 1) in
  8/16/24/32-bit integer widths and IEEE float32 (format 3), any channel
  count. ``decode_wav`` returns the actual samples as float32 in [-1, 1];
  duration/RMS downstream are computed from REAL decoded audio.
- AVI: RIFF/'AVI ' with hdrl (avih + strl/strh/strf) and movi lists;
  MJPEG video streams (each ``00dc`` chunk is a baseline JPEG frame our
  from-scratch functions/jpegfn decodes). ``parse_avi_mjpeg`` walks the
  container and returns real frame timing + per-frame JPEG payloads.

Compressed codecs that genuinely need external libraries (MP3/AAC audio,
H.264 video) raise labeled NotImplementedError — an unsupported stream is
data (``decode_ok=false``), never a fabricated result.

Encoders exist so the synthetic fixtures are REAL files of these formats
(same pattern as functions/jpegfn/giffn/webpfn: both engines synthesize
byte-identical media deterministically).
"""

from __future__ import annotations

import struct

import numpy as np

# --- WAV --------------------------------------------------------------------


def is_wav(data: bytes) -> bool:
    return len(data) >= 12 and data[:4] == b"RIFF" and data[8:12] == b"WAVE"


def encode_wav(samples: np.ndarray, rate: int, bits: int = 16) -> bytes:
    """float samples in [-1, 1], shape (n,) or (n, channels) -> PCM WAV."""
    if samples.ndim == 1:
        samples = samples[:, None]
    n, ch = samples.shape
    if bits == 16:
        fmt_code, block = 1, 2 * ch
        raw = np.clip(np.round(samples * 32767.0), -32768, 32767).astype("<i2").tobytes()
    elif bits == 8:
        fmt_code, block = 1, ch
        raw = (np.clip(np.round(samples * 127.0), -128, 127) + 128).astype(np.uint8).tobytes()
    elif bits == 32:
        fmt_code, block = 3, 4 * ch  # IEEE float
        raw = samples.astype("<f4").tobytes()
    else:
        raise ValueError("encode_wav supports 8/16/32-bit")
    fmt = struct.pack("<HHIIHH", fmt_code, ch, rate, rate * block, block, bits)
    body = b"fmt " + struct.pack("<I", len(fmt)) + fmt
    body += b"data" + struct.pack("<I", len(raw)) + raw
    if len(raw) % 2:
        body += b"\x00"
    return b"RIFF" + struct.pack("<I", 4 + len(body)) + b"WAVE" + body


def decode_wav(data: bytes) -> tuple[int, np.ndarray]:
    """WAV bytes -> (sample_rate, float32 samples shape (n_frames, channels)
    in [-1, 1]). PCM 8/16/24/32-bit and IEEE float32 supported."""
    if not is_wav(data):
        raise ValueError("not a RIFF/WAVE file")
    off = 12
    fmt = None
    raw = None
    while off + 8 <= len(data):
        tag = data[off : off + 4]
        (size,) = struct.unpack("<I", data[off + 4 : off + 8])
        body = data[off + 8 : off + 8 + size]
        if tag == b"fmt ":
            fmt = struct.unpack("<HHIIHH", body[:16])
        elif tag == b"data":
            raw = body
        off += 8 + size + (size & 1)
    if fmt is None or raw is None:
        raise ValueError("WAV missing fmt/data chunk")
    fmt_code, ch, rate, _, _, bits = fmt
    if fmt_code == 1 and bits == 16:
        x = np.frombuffer(raw, dtype="<i2").astype(np.float32) / 32768.0
    elif fmt_code == 1 and bits == 8:
        x = (np.frombuffer(raw, dtype=np.uint8).astype(np.float32) - 128.0) / 128.0
    elif fmt_code == 1 and bits == 24:
        b = np.frombuffer(raw, dtype=np.uint8).reshape(-1, 3).astype(np.int32)
        v = b[:, 0] | (b[:, 1] << 8) | (b[:, 2] << 16)
        v = np.where(v >= 1 << 23, v - (1 << 24), v)
        x = v.astype(np.float32) / float(1 << 23)
    elif fmt_code == 1 and bits == 32:
        x = np.frombuffer(raw, dtype="<i4").astype(np.float32) / float(1 << 31)
    elif fmt_code == 3 and bits == 32:
        x = np.frombuffer(raw, dtype="<f4").astype(np.float32)
    else:
        raise NotImplementedError(
            f"WAV format code {fmt_code} / {bits}-bit needs codec libraries "
            "not present in this container (PCM + float32 only)"
        )
    if ch < 1:
        raise ValueError("bad channel count")
    n = len(x) - len(x) % ch
    return rate, x[:n].reshape(-1, ch)


# --- AVI / MJPEG ------------------------------------------------------------


def is_avi(data: bytes) -> bool:
    return len(data) >= 12 and data[:4] == b"RIFF" and data[8:12] == b"AVI "


def encode_avi_mjpeg(frames: list[np.ndarray], fps: int = 25, quality: int = 99) -> bytes:
    """(h, w, 3) uint8 frames -> minimal AVI with one MJPEG video stream
    (every '00dc' chunk is a baseline JPEG from functions/jpegfn)."""
    from .jpegfn import encode_jpeg

    if not frames:
        raise ValueError("need at least one frame")
    h, w = frames[0].shape[:2]
    payloads = [encode_jpeg(f, quality=quality) for f in frames]

    def chunk(tag: bytes, body: bytes) -> bytes:
        return tag + struct.pack("<I", len(body)) + body + (b"\x00" if len(body) % 2 else b"")

    def lst(kind: bytes, body: bytes) -> bytes:
        return chunk(b"LIST", kind + body)

    max_bytes = max(len(p) for p in payloads)
    avih = struct.pack(
        "<14I",
        1_000_000 // fps,  # dwMicroSecPerFrame
        max_bytes * fps,  # dwMaxBytesPerSec
        0,  # padding granularity
        0,  # dwFlags: no AVIF_HASINDEX — we write no idx1 chunk, so the
        #            file must not advertise one (0x10 IS HASINDEX)
        len(payloads),  # dwTotalFrames
        0,
        1,  # one stream
        max_bytes,
        w,
        h,
        0, 0, 0, 0,
    )
    strh = (
        b"vids"
        + b"MJPG"
        + struct.pack(
            "<IHHIIIIIIII",
            0,  # flags
            0, 0,  # priority, language
            0,  # initial frames
            1,  # dwScale
            fps,  # dwRate -> fps = rate/scale
            0,  # start
            len(payloads),  # length in frames
            max_bytes,
            0xFFFFFFFF,  # quality (default)
            0,  # sample size (varies)
        )
        + struct.pack("<4H", 0, 0, w, h)
    )
    strf = struct.pack("<IiiHH4sIiiII", 40, w, h, 1, 24, b"MJPG", w * h * 3, 0, 0, 0, 0)
    hdrl = lst(
        b"hdrl",
        chunk(b"avih", avih) + lst(b"strl", chunk(b"strh", strh) + chunk(b"strf", strf)),
    )
    movi = lst(b"movi", b"".join(chunk(b"00dc", p) for p in payloads))
    body = b"AVI " + hdrl + movi
    return b"RIFF" + struct.pack("<I", len(body)) + body


def parse_avi_mjpeg(data: bytes) -> tuple[float, list[bytes]]:
    """AVI bytes -> (fps, [per-frame JPEG payload bytes]).

    Walks the RIFF tree: avih gives the frame clock fallback, the 'vids'
    strh gives the authoritative rate/scale, movi holds the '00dc'/'00db'
    frame chunks. Non-MJPEG video streams raise a labeled
    NotImplementedError (H.264 etc. need external codecs)."""
    if not is_avi(data):
        raise ValueError("not a RIFF/AVI file")
    us_per_frame = None
    fps = None
    handler_checked = False
    frames: list[bytes] = []

    def walk(buf: bytes) -> None:
        nonlocal us_per_frame, fps, handler_checked
        off = 0
        while off + 8 <= len(buf):
            tag = buf[off : off + 4]
            (size,) = struct.unpack("<I", buf[off + 4 : off + 8])
            body = buf[off + 8 : off + 8 + size]
            if tag == b"LIST":
                walk(body[4:])
            elif tag == b"avih":
                us_per_frame = struct.unpack("<I", body[:4])[0]
            elif tag == b"strh" and body[:4] == b"vids":
                handler = body[4:8]
                if handler not in (b"MJPG", b"mjpg"):
                    raise NotImplementedError(
                        f"AVI video handler {handler!r} needs codec libraries "
                        "not present in this container (MJPG only)"
                    )
                handler_checked = True
                scale, rate = struct.unpack("<II", body[20:28])
                if scale:
                    fps = rate / scale
            elif tag[2:4] in (b"dc", b"db") and tag[:2].isdigit():
                frames.append(body)
            off += 8 + size + (size & 1)

    walk(data[12:])
    if not handler_checked:
        raise ValueError("AVI has no video stream header")
    if fps is None:
        if not us_per_frame:
            raise ValueError("AVI has no frame clock")
        fps = 1_000_000.0 / us_per_frame
    return float(fps), frames


AUDIO_FP_THRESHOLDS = tuple(0.05 * (32 ** (j / 7)) for j in range(8))


def audio_fingerprint(samples: np.ndarray) -> int:
    """64-bit audio content fingerprint — the public Chromaprint/Shazam
    family idea without the FFT dependency: 32 bits encode the clip's
    frequency PROFILE (energy ratios of difference filters at lags
    1/2/4/8 against the raw signal, each quantized by an 8-step geometric
    thermometer code), 32 bits encode its temporal envelope (sign of
    successive window-energy deltas over 33 equal windows).

    Properties (pinned in tests): EXACTLY invariant to power-of-two gain
    (every energy scales by c, preserving each ratio and comparison;
    c = 2^k is lossless in floats) and robust to uniform gain generally;
    thermometer coding makes hamming distance GRADED — near frequencies
    differ in few bits, unrelated content in many — which is exactly what
    banded near-dup search wants. This is a COARSE near-dup fingerprint
    (similar-sounding clips land close), not an ID-level match. Requires
    >= 66 frames (callers surface shorter clips as decode_error data, the
    mediaops convention). Returns a SIGNED int64 like imagefn.phash64."""
    if samples.ndim == 2:
        mono = samples.astype(np.float64).mean(axis=1)
    else:
        mono = samples.astype(np.float64)
    if mono.shape[0] < 66:
        raise ValueError(
            f"audio too short for fingerprint: {mono.shape[0]} frames < 66"
        )

    def rms(sig: np.ndarray) -> float:
        return float(np.sqrt(np.mean(sig * sig))) if sig.size else 0.0

    e_raw = rms(mono)
    band = [
        rms(np.diff(mono, 1)),
        rms(np.diff(mono, 2)),
        rms(mono[4:] - mono[:-4]),
        rms(mono[8:] - mono[:-8]),
    ]
    # ratio denominators: d2 against d1 (its natural parent), others vs raw
    base = [e_raw, band[0], e_raw, e_raw]
    v = 0
    k = 0
    for b in range(4):
        r = band[b] / base[b] if base[b] > 0 else 0.0
        for th in AUDIO_FP_THRESHOLDS:
            if r > th:
                v |= 1 << k
            k += 1
    energies = [rms(w) for w in np.array_split(mono, 33)]
    for t in range(32):
        if energies[t + 1] > energies[t]:
            v |= 1 << k
        k += 1
    return v - (1 << 64) if v >= 1 << 63 else v
