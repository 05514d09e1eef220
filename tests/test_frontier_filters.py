"""Edge-case parity for the candidate filters: the Spark operators and the
sequential oracle's ``_candidate`` must make the SAME keep/drop decision on
URLs that previously diverged latently (ADVICE r01):

- deny-extension applies to the PATH only (``a.pdf?x=1`` denied,
  ``/page?file=.pdf`` kept)
- sitemap candidates come only from seeds that survive the candidate filters
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import functions as F

from scrapy_spark.operators.frontier import (
    canonicalize_candidates,
    seeds_to_candidates,
)
from scrapy_spark.plans.oracle import _candidate

EDGE_URLS = [
    "https://x.uconn.edu/a.pdf?x=1",  # kept as pdf_link (round 3: PDFs fetchable)
    "https://x.uconn.edu/page?file=.pdf",  # kept: .pdf only in query
    "https://x.uconn.edu/docs/manual.PDF",  # kept as pdf_link (case-insensitive)
    "https://x.uconn.edu/a.pdf/inner",  # kept: .pdf not final segment
    "https://x.uconn.edu/a.zip?x=1",  # denied: .zip path despite query
    "https://x.uconn.edu/ok.html",  # kept
    "https://elsewhere.org/ok.html",  # dropped: domain
    "https://x.uconn.edu/pic.png",  # kept for img_tag (exempt source)
]


def _spark_decisions(spark, urls, source_type):
    pdf = pd.DataFrame(
        {
            "raw_url": urls,
            "source_url": [None] * len(urls),
            "source_type": [source_type] * len(urls),
            "anchor": [None] * len(urls),
            "depth": [1] * len(urls),
            "attempt": [1] * len(urls),
        }
    )
    out = canonicalize_candidates(spark.createDataFrame(pdf))
    return {r["url"] for r in out.select("url").collect()}


def test_deny_extension_path_only_parity(spark):
    for source_type in ("html_link", "img_tag"):
        kept_spark = _spark_decisions(spark, EDGE_URLS, source_type)
        kept_oracle = set()
        for u in EDGE_URLS:
            c = _candidate(u, None, source_type, None, 1, "uconn.edu")
            if c is not None:
                kept_oracle.add(c["url"])
        assert kept_spark == kept_oracle, (
            f"{source_type}: spark={sorted(kept_spark)} oracle={sorted(kept_oracle)}"
        )


def test_query_string_pdf_is_kept(spark):
    kept = _spark_decisions(spark, ["https://x.uconn.edu/page?file=.pdf"], "html_link")
    assert kept == {"https://x.uconn.edu/page?file=.pdf"}


def test_path_pdf_reclassified_not_denied(spark):
    """Round 3: .pdf html links become pdf_link candidates (fetchable
    document payload, content_handlers.py:20) instead of being denied; the
    PATH-only deny semantics still hold for the other extensions."""
    pdf = pd.DataFrame(
        {
            "raw_url": ["https://x.uconn.edu/a.pdf?x=1",
                        "https://x.uconn.edu/a.zip?x=1"],
            "source_url": [None, None],
            "source_type": ["html_link", "html_link"],
            "anchor": [None, None],
            "depth": [1, 1],
            "attempt": [1, 1],
        }
    )
    rows = canonicalize_candidates(spark.createDataFrame(pdf)).collect()
    assert {(r["url"], r["source_type"]) for r in rows} == {
        ("https://x.uconn.edu/a.pdf?x=1", "pdf_link")  # kept, reclassified
    }  # .zip path still denied
    c = _candidate("https://x.uconn.edu/a.pdf?x=1", None, "html_link", None, 1, "uconn.edu")
    assert c is not None and c["source_type"] == "pdf_link"
    assert _candidate("https://x.uconn.edu/a.zip?x=1", None, "html_link", None, 1, "uconn.edu") is None


def test_sitemap_only_for_surviving_seeds(spark):
    seeds = spark.createDataFrame(
        pd.DataFrame(
            {
                "url": [
                    "https://a.uconn.edu/file.pdf",  # dies at deny-extension
                    "https://elsewhere.org/",  # dies at domain filter
                    "https://b.uconn.edu/",  # survives
                ]
            }
        )
    )
    cands = seeds_to_candidates(seeds, domain="uconn.edu")
    sitemap_urls = {
        r["raw_url"]
        for r in cands.filter(F.col("source_type") == "sitemap_fetch").collect()
    }
    assert sitemap_urls == {"https://b.uconn.edu/sitemap.xml"}
