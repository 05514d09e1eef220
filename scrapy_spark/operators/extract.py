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

from ..sources.synth import N_IMG_HOSTS


def extract_candidates(fetched: DataFrame) -> DataFrame:
    """fetched (FETCH_SCHEMA) -> raw candidates (CANDIDATE_COLS) at depth+1.

    Three 1→N branches, all pure explode: html links, html image refs, and
    sitemap <loc> entries (S3) from application/xml responses."""
    pages = fetched.filter(
        (F.col("status_code") == 200) & (F.col("content_type") == "text/html")
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
        (F.col("status_code") == 200) & (F.col("content_type") == "application/xml")
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
            F.concat(
                F.lit("https://img"),
                F.pmod(gidx, F.lit(N_IMG_HOSTS)).cast("string"),
                F.lit(".uconn.edu/i/"),
                F.col("ref.image_id"),
                F.lit(".png"),
            ).alias("raw_url"),
            F.col("source_url"),
            F.lit("img_tag").alias("source_type"),
            F.col("ref.alt").alias("anchor"),
            F.col("depth"),
            F.lit(1).alias("attempt"),
        )
    )
    return links.unionByName(sitemap_links).unionByName(imgs)
