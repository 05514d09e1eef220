"""PDF content operator: metadata, text stats and embedded links from a
binary PDF column (content_handlers.py:20-160 PDFHandler.process_pdf
semantics: title/author metadata, per-page text, page_count/word_count,
capped page processing; warehouse.py:152 has_pdf_links).

Spark-first mapping: PDFs are opaque ``binary`` columns; extraction is an
Arrow-batched ``mapInPandas`` producing narrow typed columns — the wide
bytes column never survives past this operator. The codec is the
from-scratch deterministic PDF 1.4 reader/writer in functions/pdffn.py
(container has no PyPDF2/pdfplumber; the reference's library fallback chain
collapses to one real implementation here, same seam)."""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions import pdffn

PDF_META_SCHEMA = (
    "url string, title string, author string, page_count int, "
    "pages_processed int, word_count int, link_uris array<string>, "
    "decode_ok boolean, decode_error string"
)


def extract_pdf_meta(pdfs: DataFrame, max_pages: int = 100) -> DataFrame:
    """(url, bytes) -> PDF metadata rows. ``max_pages`` caps text extraction
    like the reference's PDFHandler(max_pages) config. Broken bytes are data,
    not bugs: decode_ok=false with the error recorded."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for row in pdf.itertuples(index=False):
                rec = {
                    "url": row.url,
                    "title": None,
                    "author": None,
                    "page_count": None,
                    "pages_processed": None,
                    "word_count": None,
                    "link_uris": None,
                    "decode_ok": False,
                    "decode_error": None,
                }
                try:
                    data = bytes(row.bytes)
                    if not pdffn.is_pdf(data):
                        raise ValueError("not a PDF payload")
                    n = pdffn.pdf_page_count(data)
                    texts = pdffn.pdf_page_texts(data)[:max_pages]
                    rec.update(
                        title=pdffn.pdf_title(data),
                        author=pdffn.pdf_author(data),
                        page_count=n,
                        pages_processed=min(n, max_pages),
                        word_count=sum(len(t.split()) for t in texts),
                        link_uris=pdffn.pdf_link_uris(data),
                        decode_ok=True,
                    )
                except (ValueError, TypeError) as e:
                    rec["decode_error"] = f"{type(e).__name__}: {e}"
                out.append(rec)
            yield pd.DataFrame(out)

    return pdfs.select("url", "bytes").mapInPandas(run, schema=PDF_META_SCHEMA)


def pdf_embedded_candidates(pdf_meta: DataFrame) -> DataFrame:
    """Embedded /URI link annotations as frontier-shaped raw candidates
    (source_type pdf_embedded) — pure explode over the meta table."""
    return pdf_meta.filter(F.col("decode_ok")).select(
        F.explode("link_uris").alias("raw_url"),
        F.col("url").alias("source_url"),
        F.lit("pdf_embedded").alias("source_type"),
        F.lit(None).cast("string").alias("anchor"),
        F.lit(1).alias("depth"),
        F.lit(1).alias("attempt"),
    )
