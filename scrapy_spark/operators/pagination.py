"""Pagination guessing bounded by a TTL'd pagination cache (W8 +
PaginationCache, discovery_spider.py:1097-1154 + storage.py:213-343).

The reference GUESSES pagination URLs (page=N..N+k range expansion) and
bounds the guessing with a per-pattern SQLite cache: attempt page N only
while N <= last_valid_page + lookahead, tighten the lookahead to 2 when the
pattern's success rate drops below 0.3, and expire entries after a TTL so
stale patterns get re-probed from scratch.

Generation-batch recast (SURVEY §7.3.5 — mutation-based cache rebuilt as
order-independent aggregates): per-generation ``pagination_stats`` deltas
(host, section, attempts, successes, last valid page number) are committed
alongside the crawl; the next generation derives each pattern's guess range
from the TTL-windowed aggregate and emits candidates via
``explode(sequence(...))`` — pure column expressions, no driver loop. TTL
is measured in generations (the batch clock). Guessed candidates flow
through the normal filter/dedup/selection pipeline, so already-fetched
pages drop out at the seen anti-join and invalid guesses are recorded like
any fetch (feeding the next generation's stats).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# synth page URLs are https://{host}/{section}/p{N} — the pagination pattern
PAGE_NUM_RE = r"^/([a-z0-9_-]+)/p([0-9]+)$"


def page_pattern_cols(df: DataFrame) -> DataFrame:
    """Attach (section, page_num) parsed from ``path``; page_num is null for
    non-pagination paths."""
    sec = F.regexp_extract(F.col("path"), PAGE_NUM_RE, 1)
    num = F.regexp_extract(F.col("path"), PAGE_NUM_RE, 2)
    return df.withColumn(
        "section", F.when(sec != "", sec)
    ).withColumn("page_num", F.when(num != "", num.cast("int")))


def pagination_stats_delta(fetched_gen: DataFrame) -> DataFrame:
    """One generation's pagination outcomes per (host, section):
    (n attempts, n valid, last valid page, max attempted page)."""
    src = page_pattern_cols(
        fetched_gen.withColumn(
            "path", F.parse_url(F.col("url"), F.lit("PATH"))
        )
    ).filter(F.col("page_num").isNotNull())
    return src.groupBy("host", "section").agg(
        F.count("*").alias("n"),
        F.sum(F.when(F.col("is_valid"), 1).otherwise(0)).alias("nv"),
        F.coalesce(
            F.max(F.when(F.col("is_valid"), F.col("page_num"))), F.lit(0)
        ).alias("last_valid"),
        F.max("page_num").alias("max_attempted"),
    )


def pagination_guesses(
    stats: DataFrame,
    gen: int,
    ttl_gens: int,
    lookahead: int,
    max_pages: int,
    low_rate: float = 0.3,
    tight_lookahead: int = 2,
) -> DataFrame:
    """TTL-windowed per-pattern guess candidates for generation ``gen``.

    - pattern with UNEXPIRED history: guess last_valid+1 .. last_valid+L
      where L = ``tight_lookahead`` if the unexpired success rate < low_rate
      else ``lookahead`` (should_attempt_page, storage.py:310-343);
    - pattern whose history has fully EXPIRED: re-probe 1..max_pages
      (the reference's no-history branch after TTL expiry).
    """
    live = stats.filter(F.col("generation") > gen - ttl_gens)
    live_agg = live.groupBy("host", "section").agg(
        F.max("last_valid").alias("lv"),
        (F.sum("nv") / F.sum("n")).alias("rate"),
    )
    expired = (
        stats.groupBy("host", "section")
        .agg(F.max("generation").alias("g"))
        .filter(F.col("g") <= gen - ttl_gens)
        .select("host", "section", F.lit(1).alias("mode_expired"))
    )
    look = F.when(F.col("rate") < low_rate, F.lit(tight_lookahead)).otherwise(
        F.lit(lookahead)
    )
    fresh_probe = expired.select(
        "host",
        "section",
        F.lit(1).alias("lo"),
        F.lit(max_pages).alias("hi"),
    )
    bounded = live_agg.select(
        "host",
        "section",
        (F.col("lv") + 1).alias("lo"),
        (F.col("lv") + look).alias("hi"),
    )
    ranges = bounded.unionByName(fresh_probe).filter(F.col("hi") >= F.col("lo"))
    return ranges.select(
        "host",
        "section",
        F.explode(F.sequence(F.col("lo"), F.col("hi"))).alias("pn"),
    ).select(
        F.concat(
            F.lit("https://"),
            F.col("host"),
            F.lit("/"),
            F.col("section"),
            F.lit("/p"),
            F.col("pn").cast("string"),
        ).alias("raw_url"),
        F.lit(None).cast("string").alias("source_url"),
        F.lit("pagination_guess").alias("source_type"),
        F.lit(None).cast("string").alias("anchor"),
        F.lit(1).alias("depth"),
        F.lit(1).alias("attempt"),
    )
