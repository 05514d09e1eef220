"""Interstage schema-validation gate (interstage_validation.py:46-49,
enforced at pipeline.py:191,222 in the reference: >= 95% of rows must pass
schema validation between stages or the pipeline halts).

Recast for the generation-batch model: row-level invariants of the fetch
output are pure column predicates folded into the SAME aggregation job that
computes lineage (zero extra actions per generation); the per-generation
pass rate is staged to the ``validation`` table and, when
``CrawlParams.validation_enforce`` is set, a rate below
``validation_threshold`` raises before the generation commits — the commit
is atomic, so a failing generation leaves no partial state behind.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from ..plans.oracle import MAX_ATTEMPTS, VALID_CONTENT_TYPES


def schema_valid_expr(has_bytes: Column | None = None) -> Column:
    """Row-level invariants of a fetch-result row (all JVM-side):

    - url present, http(s), and url_hash is exactly xxhash64(url)
    - status_code in the HTTP range (or the 599 timeout convention)
    - is_valid consistent with (status, content_type)
    - payload bytes present iff an image or PDF document was actually served
    - attempt within the retry policy, rank_in_host a positive rank

    ``has_bytes``: a precomputed boolean column standing in for
    ``bytes IS NOT NULL``. The crawl loop passes the flag it computed in
    its single bytes-touching projection so the lineage/gate aggregation
    never re-reads (and re-decompresses) the payload column; None keeps
    the self-contained form for direct callers.
    """
    sc = F.col("status_code")
    ct = F.coalesce(F.col("content_type"), F.lit(""))
    recomputed_valid = (sc >= 200) & (sc < 400) & ct.isin(*VALID_CONTENT_TYPES)
    served_image = (sc == 200) & (
        ct.startswith("image/") | (ct == "application/pdf")
    )
    hb = has_bytes if has_bytes is not None else F.col("bytes").isNotNull()
    return (
        F.col("url").isNotNull()
        & F.col("url").startswith("http")
        & (F.col("url_hash") == F.xxhash64(F.col("url")))
        & ((sc >= 100) & (sc <= 599))
        & (F.col("is_valid") == recomputed_valid)
        & (hb == served_image)
        & ((F.col("attempt") >= 1) & (F.col("attempt") <= MAX_ATTEMPTS))
        & (F.col("rank_in_host") >= 1)
    )
