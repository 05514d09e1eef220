"""Seed-list maintenance — the reference's ``tools/update_seeds.py:1-72``
(merge newly discovered / validated URLs back into the seed CSV), recast as
catalog-table queries instead of driver-side JSONL loops.

The reference reads a validation JSONL, keeps URLs with >= N successful
text/html validations, and set-unions them into the seed CSV. Here the
sources are committed catalog tables:

- ``--merge-from candidates`` (default): the pending frontier — URLs the
  crawl DISCOVERED but has not fetched, i.e. the genuinely-new work a
  future crawl should seed from;
- ``--merge-from fetch_results``: the reference's own semantics — pages
  that validated as 200 text/html at least ``min_validations`` times.

All sources are canonicalized with the crawl's own canonicalizer (one
vocabulary of URL identity everywhere), optionally domain-gated, deduped,
anti-joined against ``url_seen`` (a seed list full of already-crawled URLs
is dead weight — the reference tolerates it because its spider re-filters;
``--include-seen`` restores that behavior), merged with an existing seed
CSV, and written as ONE sorted CSV (deterministic output; the file is the
artifact, so the final coalesce is by design — seed lists are frontier-
sized, not corpus-sized)."""

from __future__ import annotations

import glob
import os
import shutil

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def merged_seed_urls(
    spark: SparkSession,
    catalog,
    merge_from: str = "candidates",
    seed_file: str | None = None,
    min_validations: int = 1,
    include_seen: bool = False,
    domain: str | None = None,
) -> DataFrame:
    """One ``url`` column: canonical, deduped, sorted seed candidates."""
    from ..operators.frontier import canonicalize_udf

    src = catalog.read(spark, merge_from)
    if src is None:
        raise ValueError(f"no table {merge_from!r} in this workdir")
    url_col = "raw_url" if "raw_url" in src.columns else "url"
    if url_col not in src.columns:
        raise ValueError(f"table {merge_from!r} has no url/raw_url column")
    if "status_code" in src.columns and "content_type" in src.columns:
        # fetch-results source: the reference's high-quality gate
        # (update_seeds.py:33-42 — 200, text/html, >= N validations)
        src = (
            src.filter(
                (F.col("status_code") == 200)
                & (F.col("content_type") == "text/html")
                & F.col("error_type").isNull()
            )
            .groupBy(url_col)
            .agg(F.count("*").alias("n_ok"))
            .filter(F.col("n_ok") >= min_validations)
        )
    urls = src.select(canonicalize_udf(F.col(url_col)).alias("url"))
    if seed_file is not None:
        existing = spark.read.csv(seed_file, header=True).select(
            canonicalize_udf(F.col("url")).alias("url")
        )
        urls = urls.unionByName(existing)
    urls = urls.filter(F.col("url").isNotNull())
    if domain:
        from ..operators.frontier import _host_col  # ONE host vocabulary

        host = _host_col(F.col("url"))
        urls = urls.filter(
            (host == domain.lower()) | host.endswith("." + domain.lower())
        )
    if not include_seen:
        seen = catalog.read(spark, "url_seen")
        if seen is not None:
            urls = urls.join(seen.select("url"), "url", "left_anti")
    return urls.distinct().orderBy("url")


def write_seed_csv(urls: DataFrame, out: str) -> int:
    """Write the seed list as ONE csv file with a ``url`` header; returns
    the row count. Spark writes a part-file directory; the single part is
    moved to ``out`` (seed lists are small by contract — they feed a crawl
    LAUNCH, not a distributed scan)."""
    tmp = out + ".__stage__"
    urls.coalesce(1).write.mode("overwrite").csv(tmp, header=True)
    parts = glob.glob(os.path.join(tmp, "part-*.csv"))
    assert len(parts) == 1, parts
    os.makedirs(os.path.dirname(os.path.abspath(out)), exist_ok=True)
    shutil.move(parts[0], out)
    shutil.rmtree(tmp, ignore_errors=True)
    with open(out) as f:
        return sum(1 for _ in f) - 1
