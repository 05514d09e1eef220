"""Multimodal binary-column operators: decode, metadata, phash, PSNR parity.

The reference's stage-3 content handlers decode fetched image bytes with PIL
to extract width/height/format/EXIF and thumbnails
(``Scraping_project/src/stage3/content_handlers.py:206-263,329-340``) and
perceptually hash media (``media_extraction.py:93-196``). Spark-first
mapping: images are opaque ``binary`` columns with typed metadata; decode /
feature-extract run as Arrow-batched ``mapInPandas``. All four accepted
image formats decode for REAL via the from-scratch codecs
(functions/imagefn PNG, jpegfn, giffn, webpfn VP8L); only genuinely
library-bound formats (e.g. tiff, lossy-VP8 webp) surface as labeled
NotImplementedError rows — data, never task failures.

At 100 TB the invariants here matter more than the codec: bytes enter the
UDF via Arrow record batches (no per-row Python at the API), outputs are
narrow typed columns, and the wide binary column is dropped as early as the
plan allows (project-only-what-you-need).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame

from ..functions.imagefn import decode_image, phash64, psnr

IMAGE_META_SCHEMA = (
    "image_id string, decoded_w int, decoded_h int, decoded_phash long, "
    "decode_ok boolean, decode_error string"
)


def extract_image_meta(images: DataFrame) -> DataFrame:
    """(image_id, bytes, fmt) -> decoded metadata; mapInPandas over Arrow
    batches. Rows whose codec is unavailable get decode_ok=false with the
    error recorded (never a task failure — bad bytes are data, not bugs)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for row in pdf.itertuples(index=False):
                rec = {
                    "image_id": row.image_id,
                    "decoded_w": None,
                    "decoded_h": None,
                    "decoded_phash": None,
                    "decode_ok": False,
                    "decode_error": None,
                }
                try:
                    px = decode_image(bytes(row.bytes), row.fmt)
                    rec.update(
                        decoded_w=int(px.shape[1]),
                        decoded_h=int(px.shape[0]),
                        decoded_phash=phash64(px),
                        decode_ok=True,
                    )
                except (NotImplementedError, ValueError) as e:
                    rec["decode_error"] = f"{type(e).__name__}: {e}"
                out.append(rec)
            yield pd.DataFrame(out)

    return images.select("image_id", "bytes", "fmt").mapInPandas(
        run, schema=IMAGE_META_SCHEMA
    )


PSNR_SCHEMA = "image_id string, psnr double, pixel_exact boolean"


def psnr_parity(ours: DataFrame, reference: DataFrame) -> DataFrame:
    """Row-level parity join (J8, SURVEY §2.4): decode both sides' bytes and
    report PSNR (>= 40 dB gate; +inf == pixel-exact). Join on image_id keys
    first, bytes re-attached only inside the Arrow batch."""
    from pyspark.sql import functions as F

    a = ours.select(
        "image_id", F.col("bytes").alias("bytes_a"), F.col("fmt").alias("fmt")
    )
    b = reference.select("image_id", F.col("bytes").alias("bytes_b"))
    joined = a.join(b, "image_id")

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for row in pdf.itertuples(index=False):
                pa_ = decode_image(bytes(row.bytes_a), row.fmt)
                pb = decode_image(bytes(row.bytes_b), row.fmt)
                v = psnr(pa_, pb)
                out.append(
                    {
                        "image_id": row.image_id,
                        "psnr": float(v) if v != float("inf") else float("inf"),
                        "pixel_exact": v == float("inf"),
                    }
                )
            yield pd.DataFrame(out)

    return joined.mapInPandas(run, schema=PSNR_SCHEMA)


THUMB_SCHEMA = "image_id string, thumb binary, thumb_w int, thumb_h int"


def thumbnail_images(images: DataFrame, max_side: int = 16) -> DataFrame:
    """Aspect-preserving thumbnails (content_handlers.py:329-340): decode,
    bilinear-resize so max(w, h) == max_side, re-encode PNG. Arrow-batched;
    undecodable rows yield a null thumb (data, not task failure)."""
    from ..functions.imagefn import encode_png, resize_bilinear

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for row in pdf.itertuples(index=False):
                rec = {"image_id": row.image_id, "thumb": None,
                       "thumb_w": None, "thumb_h": None}
                try:
                    px = decode_image(bytes(row.bytes), row.fmt)
                    h, w = px.shape[:2]
                    scale = max_side / max(w, h)
                    tw, th = max(1, round(w * scale)), max(1, round(h * scale))
                    rec.update(
                        thumb=encode_png(resize_bilinear(px, tw, th)),
                        thumb_w=tw,
                        thumb_h=th,
                    )
                except (NotImplementedError, ValueError):
                    pass
                out.append(rec)
            yield pd.DataFrame(out)

    return images.select("image_id", "bytes", "fmt").mapInPandas(
        run, schema=THUMB_SCHEMA
    )
