"""Candidate extraction from fetched pages — pure JVM explode, no Python.

The reference extracts links with Scrapy's LinkExtractor + 9 heuristic
families and mines <img alt>/<figcaption> captions
(discovery_spider.py:253-528; enrichment F10). Because the fetch stage
returns *structured* content (body_links / image_refs arrays), extraction is
a 1→N ``explode`` — whole-stage-codegen'd, no UDF (SURVEY preference order:
compose built-ins before reaching for pandas UDFs).

Image candidates are materialized as their deterministic URLs
(``https://img{gidx % 4}.uconn.edu/i/{image_id}.png``) with the alt text as
anchor → downstream caption.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions import mining
from ..sources.synth import N_IMG_HOSTS


def mined_candidates(pages: DataFrame) -> DataFrame:
    """Heuristic URL mining over raw_snippets (discovery_spider.py:386-478,
    729-774) — pure JVM regexp_extract_all, see functions/mining.py. 1→N
    explode of snippets, then 1→N explode of the per-snippet match array."""
    sn = pages.select(
        F.col("url").alias("source_url"),
        (F.col("depth") + 1).alias("depth"),
        F.explode("raw_snippets").alias("sn"),
    ).select(
        "source_url",
        "depth",
        mining.mined_source_type_col(F.col("sn.kind")).alias("source_type"),
        F.explode(
            mining.mined_urls_col(F.col("sn.kind"), F.col("sn.text"))
        ).alias("mined_url"),
    )
    return sn.select(
        mining.resolve_mined_col(F.col("mined_url"), F.col("source_url")).alias(
            "raw_url"
        ),
        "source_url",
        "source_type",
        F.lit(None).cast("string").alias("anchor"),
        "depth",
        F.lit(1).alias("attempt"),
    )


def extract_candidates(fetched: DataFrame, heuristic_mining: bool = True) -> DataFrame:
    """fetched (FETCH_SCHEMA) -> raw candidates (CANDIDATE_COLS) at depth+1.

    Four 1→N branches, all pure explode: html links, html image refs,
    sitemap <loc> entries (S3) from application/xml responses, and heuristic
    snippet mining (gated by ``heuristic_mining``).

    When the input carries the stage-2→3 classification columns
    (plans/crawl.py → functions/classify.py), only ``is_enrichable`` rows
    are admitted to extraction — the reference's enrichment admission
    filter (content_classification.py:280-318). Inputs without the column
    (unit-test fixtures) behave as before."""
    admit = (
        F.col("is_enrichable")
        if "is_enrichable" in fetched.columns
        else F.lit(True)
    )
    pages = fetched.filter(
        (F.col("status_code") == 200)
        & (F.col("content_type") == "text/html")
        & admit
    )
    links = pages.select(
        F.explode("body_links").alias("raw_url"),
        F.col("url").alias("source_url"),
        F.lit("html_link").alias("source_type"),
        F.lit(None).cast("string").alias("anchor"),
        (F.col("depth") + 1).alias("depth"),
        F.lit(1).alias("attempt"),
    )
    sitemap_links = fetched.filter(
        (F.col("status_code") == 200)
        & (F.col("content_type") == "application/xml")
        & admit
    ).select(
        F.explode("body_links").alias("raw_url"),
        F.col("url").alias("source_url"),
        F.lit("sitemap").alias("source_type"),
        F.lit(None).cast("string").alias("anchor"),
        (F.col("depth") + 1).alias("depth"),
        F.lit(1).alias("attempt"),
    )
    gidx = F.substring(F.col("ref.image_id"), 4, 16).cast("long")
    imgs = (
        pages.select(
            F.explode("image_refs").alias("ref"),
            F.col("url").alias("source_url"),
            (F.col("depth") + 1).alias("depth"),
        )
        .select(
            # real-HTML pages (http_resolver) carry the already-resolved
            # absolute image URL as image_id — pass it through; synthetic
            # ids reconstruct the deterministic image host URL (oracle twin
            # has the same branch)
            F.when(
                F.col("ref.image_id").startswith("http"), F.col("ref.image_id")
            )
            .otherwise(
                F.concat(
                    F.lit("https://img"),
                    F.pmod(gidx, F.lit(N_IMG_HOSTS)).cast("string"),
                    F.lit(".uconn.edu/i/"),
                    F.col("ref.image_id"),
                    F.lit(".png"),
                )
            )
            .alias("raw_url"),
            F.col("source_url"),
            F.lit("img_tag").alias("source_type"),
            F.col("ref.alt").alias("anchor"),
            F.col("depth"),
            F.lit(1).alias("attempt"),
        )
    )
    # PDF responses yield their embedded /URI annotations as candidates
    # (content_handlers.py PDFHandler + datalake link extraction). The URIs
    # were extracted inside the fetch UDF while the bytes were in hand, so
    # this branch is a pure explode of a small array column — the bytes
    # column is never re-read or shuffled (SURVEY §7.3.4).
    pdf_links = (
        fetched.filter(
            (F.col("status_code") == 200)
            & (F.col("content_type") == "application/pdf")
            & admit
        )
        .select(
            F.explode("pdf_uris").alias("raw_url"),
            F.col("url").alias("source_url"),
            F.lit("pdf_embedded").alias("source_type"),
            F.lit(None).cast("string").alias("anchor"),
            (F.col("depth") + 1).alias("depth"),
            F.lit(1).alias("attempt"),
        )
    )
    out = (
        links.unionByName(sitemap_links).unionByName(imgs).unionByName(pdf_links)
    )
    if heuristic_mining:
        out = out.unionByName(mined_candidates(pages))
    return out
