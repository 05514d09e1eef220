"""Intelligent data-refresh prioritization (orchestrator/data_refresh.py).

The reference re-checks previously-fetched URLs with a priority score
(``_get_refresh_priorities``, data_refresh.py:131-167):

    +100  host under a priority domain
    + 50  failed rows (not valid, or an error recorded)
    + up to 25 staleness points once older than the refresh interval
          (one point per day of age, capped)
    + 10  unknown age ("no idea when = maybe refresh",
          data_refresh.py:156 except-branch) — NULL age_hours here
    - 10  healthy rows (valid AND status 200)

and refreshes rows with priority > 0 (failed rows always). Deterministic
recast: age arrives as a column (the caller derives it from the batch
clock or last_modified), the score is pure column arithmetic, and the
ordering is a total order (priority desc, url asc) so the refresh batch is
reproducible. Composes with CrawlParams.revalidate (freshness re-fetch):
this operator is the *selection policy* for which seen URLs deserve the
budget first.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def refresh_priority(
    priority_domains: list[str] | None = None,
    refresh_interval_hours: int = 24,
    age_hours: Column | None = None,
) -> Column:
    """The reference's refresh-priority score as one column expression."""
    age = age_hours if age_hours is not None else F.col("age_hours")
    p: Column = F.lit(0)
    if priority_domains:
        is_prio = None
        for d in priority_domains:
            c = F.col("host").contains(d)
            is_prio = c if is_prio is None else (is_prio | c)
        p = p + F.when(is_prio, 100).otherwise(0)
    failed = (~F.col("is_valid")) | F.col("error_type").isNotNull()
    p = p + F.when(failed, 50).otherwise(0)
    stale_pts = F.greatest(
        F.lit(0), F.least(F.lit(25), F.floor(age / 24).cast("int"))
    )
    # NULL age = unknown/unparseable timestamp -> the reference's
    # "maybe refresh" fallback (+10), not 0
    p = p + F.when(age.isNull(), 10).when(age > refresh_interval_hours, stale_pts).otherwise(0)
    p = p - F.when(F.col("is_valid") & (F.col("status_code") == 200), 10).otherwise(0)
    return p


def refresh_candidates(
    rows: DataFrame,
    priority_domains: list[str] | None = None,
    refresh_interval_hours: int = 24,
    limit: int | None = None,
) -> DataFrame:
    """Rows needing a refresh, highest priority first (total order).

    ``rows`` must carry (url, host, is_valid, error_type, status_code,
    age_hours). Refresh set = priority > 0 OR failed (data_refresh.py:184).
    ``limit`` applies the per-run refresh budget via the two-phase top-k.
    """
    p = refresh_priority(priority_domains, refresh_interval_hours)
    failed = (~F.col("is_valid")) | F.col("error_type").isNotNull()
    out = rows.withColumn("priority", p).filter((F.col("priority") > 0) | failed)
    if limit is None:
        # global total order via range-partitioned sort (distributed — not a
        # single-partition window); the unbudgeted path promises "highest
        # priority first" across the whole result, not per-partition
        return out.orderBy(F.col("priority").desc(), F.col("url").asc())
    from .topk import topk_total_order

    return topk_total_order(
        out, [F.col("priority").desc(), F.col("url").asc()], limit
    )
