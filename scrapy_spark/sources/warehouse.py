"""Dimensional (star-schema) export of crawl results — the reference's
data-warehouse connector recast as DataFrame projections
(warehouse.py:31-90, warehouse_schema.py SQLITE_SCHEMA).

The reference normalizes enriched rows into a versioned ``pages`` table
(url_hash + crawl_version, exactly one ``is_current`` row per page) plus
satellite fact tables. Here the same shape is a pair of pure projections
over fetch_results:

- ``dim_host``: one row per host (the natural dimension of a crawl).
- ``fact_pages``: one row per (url_hash, version); versions are ordered by
  (generation, attempt) per url_hash — a re-fetch (retry or revalidation)
  creates the next crawl_version, and ``is_current`` marks the latest,
  the reference's SCD-2 update-then-supersede semantics
  (warehouse.py insert_page).

Scale shape: versioning is ONE window over url_hash (the natural shuffle
key — same partitioning as the seen-set), and the host dimension is a
groupBy on host. No driver collects, no self-joins; `bytes` never enters
either projection (column-pruned scans)."""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def dim_host(fetch_results: DataFrame) -> DataFrame:
    """One row per host: host_id (xxhash64 — the engine's key function),
    page/fetch counts, first/last generation."""
    return fetch_results.groupBy("host").agg(
        F.xxhash64("host").alias("host_id"),
        F.countDistinct("url_hash").alias("n_pages"),
        F.count("*").alias("n_fetches"),
        F.min("generation").alias("first_generation"),
        F.max("generation").alias("last_generation"),
    )


def fact_pages(fetch_results: DataFrame) -> DataFrame:
    """Versioned page fact rows: (url_hash, crawl_version) grain with
    is_current on the latest version (deterministic (generation, attempt)
    order — the same tie-break chain the crawl itself uses)."""
    w = Window.partitionBy("url_hash").orderBy("generation", "attempt")
    return (
        fetch_results.select(
            "url_hash",
            "url",
            "host",
            "generation",
            "attempt",
            "status_code",
            "content_type",
            "content_category",
            "content_quality",
            "is_enrichable",
            "is_valid",
            "title",
        )
        .withColumn("crawl_version", F.row_number().over(w))
        .withColumn(
            "n_versions",
            F.count("*").over(Window.partitionBy("url_hash")),
        )
        .withColumn("is_current", F.col("crawl_version") == F.col("n_versions"))
    )


def star_export(fetch_results: DataFrame) -> dict[str, DataFrame]:
    """The full dimensional projection (pages fact + host dim)."""
    return {"dim_host": dim_host(fetch_results), "fact_pages": fact_pages(fetch_results)}
