"""Importance scoring — one formula, two bit-identical implementations.

Mirrors the reference's piecewise importance blend
(``Scraping_project/src/stage1/discovery_spider.py:629-701``: source-type
priority base, path-depth penalty, anchor-keyword boost, clamped to [0,1]).
SURVEY §2.9 notes this is expressible as pure column expressions — so the
Spark side is JVM-codegen'd (`spark_score`), and the oracle uses the Python
twin (`py_score`). Both apply the identical IEEE-754 op sequence
``clamp(base - 0.05*path_depth + boost)`` so scores compare exactly.
"""

from __future__ import annotations

import re

from pyspark.sql import Column
from pyspark.sql import functions as F

SOURCE_PRIORITY = {
    "seed": 1.0,
    "sitemap": 0.9,
    "img_tag": 0.8,
    "html_link": 0.6,
    # heuristic-mining confidences (discovery_spider.py:382,456,464,405,478)
    # folded into the score base the same way the structured priorities are
    "pdf_link": 0.5,  # document payload: explicit default-tier priority
    "pdf_embedded": 0.4,  # links mined out of fetched PDF documents
    "ajax_endpoint": 0.6,
    "json_blob": 0.7,
    "html_comment": 0.2,
    "css_inline_style": 0.3,
    "meta_refresh": 0.9,
}
PRIORITY_TERMS = ("research", "news", "academics")
_TERM_RE = re.compile("|".join(PRIORITY_TERMS))
DEPTH_PENALTY = 0.05
ANCHOR_BOOST = 0.2


def py_path_depth(path: str) -> int:
    return len([s for s in path.split("/") if s])


def py_score(source_type: str, path: str, anchor: str | None) -> float:
    base = SOURCE_PRIORITY.get(source_type, 0.5)
    s = base - DEPTH_PENALTY * py_path_depth(path)
    if anchor and _TERM_RE.search(anchor.lower()):
        s = s + ANCHOR_BOOST
    return max(0.0, min(1.0, s))


def spark_path_depth(path: Column) -> Column:
    return F.size(F.filter(F.split(path, "/"), lambda x: x != F.lit("")))


def spark_score(source_type: Column, path: Column, anchor: Column) -> Column:
    base = F.lit(0.5)
    for k, v in SOURCE_PRIORITY.items():
        base = F.when(source_type == k, F.lit(v)).otherwise(base)
    s = base - F.lit(DEPTH_PENALTY) * spark_path_depth(path).cast("double")
    boost = F.when(
        anchor.isNotNull() & F.lower(anchor).rlike("|".join(PRIORITY_TERMS)),
        F.lit(ANCHOR_BOOST),
    ).otherwise(F.lit(0.0))
    s = s + boost
    return F.least(F.lit(1.0), F.greatest(F.lit(0.0), s))
