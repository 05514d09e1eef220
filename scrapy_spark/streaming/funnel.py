"""Streaming image+caption admission — the batch funnel as an ingest gate.

The batch funnel (operators/imageops.image_caption_filter) is an AUDIT
table: it sees the whole corpus, so duplicate detection is a global
frequency aggregate and every image gets a row of reasons. At ingest time
(a live crawl emitting image+caption candidates) the same decisions must be
made per arriving row with BOUNDED state. The streaming recast:

- the stateless reasons (min side, aspect, caption token bounds) apply
  row-local, unchanged semantics from the batch funnel's predicates;
- the duplicate gate becomes FIRST-OCCURRENCE within an event-time
  watermark horizon (``dropDuplicatesWithinWatermark`` keyed on the
  64-bit phash — the streaming/dedup.py URL-seen kernel applied to image
  identity): state holds one horizon of fixed-width keys, never the
  corpus. Cross-horizon dedup stays with the batch path (phash components
  / the funnel audit) exactly like url_seen vs streaming_url_seen.

Semantic delta vs batch, stated rather than hidden: the batch funnel drops
EVERY member of an exact-dup group (n_same_phash > 1); the streaming gate
admits the first arrival and drops the rest — an ingest gate must admit
something before knowing a duplicate will ever arrive. And the
caption-boilerplate rule (global frequency > K) has no bounded-state
streaming form at the same semantics, so it stays batch-side; the windowed
stats surface counts caption-length drops only.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _stateless_keep(
    min_side: int, max_aspect: int, min_caption_tokens: int,
    max_caption_tokens: int,
):
    """The batch funnel's row-local predicates (same NULL-caption = empty
    rule: coalesce before tokenizing, never size(NULL) = -1)."""
    cap = F.coalesce(F.col("caption"), F.lit(""))
    toks = F.size(F.filter(F.split(cap, " "), lambda t: t != F.lit("")))
    return (
        (F.least("w", "h") >= min_side)
        & (F.greatest("w", "h") <= max_aspect * F.least("w", "h"))
        & (toks >= min_caption_tokens)
        & (toks <= max_caption_tokens)
    )


def streaming_image_admission(
    images: DataFrame,
    watermark: str = "1 hour",
    ts_col: str = "ts",
    min_side: int = 32,
    max_aspect: int = 4,
    min_caption_tokens: int = 2,
    max_caption_tokens: int = 64,
) -> DataFrame:
    """Admitted images only (append mode): stateless gates, then first
    phash occurrence within the watermark horizon. Rows with a NULL phash
    (decode failed upstream) pass the dedup gate as unknown-content
    singletons, mirroring the batch funnel's null-phash discipline —
    filtered BEFORE the stateful operator and unioned is not possible on
    one stream, so null phashes are keyed by a sentinel derived from the
    image_id hash (unique per image, never colliding into one dup group)."""
    ok = images.filter(
        _stateless_keep(min_side, max_aspect, min_caption_tokens,
                        max_caption_tokens)
    )
    # sentinel: xxhash64(image_id) is unique per image (so null-phash rows
    # never collapse into one dup group); a sentinel colliding with a real
    # phash is the generic 2^-64 hash-collision risk, the same class the
    # url_hash key of the URL kernel already accepts
    dedup_key = F.coalesce(
        F.col("phash"), F.xxhash64(F.col("image_id"))
    ).alias("dedup_key")
    keyed = ok.select("*", dedup_key)
    return (
        keyed.withWatermark(ts_col, watermark)
        .dropDuplicatesWithinWatermark(["dedup_key"])
        .drop("dedup_key")
    )


def streaming_admission_stats(
    images: DataFrame,
    watermark: str = "1 hour",
    window: str = "10 minutes",
    ts_col: str = "ts",
    min_side: int = 32,
    max_aspect: int = 4,
    min_caption_tokens: int = 2,
    max_caption_tokens: int = 64,
) -> DataFrame:
    """Windowed drop-reason rollup over the SAME stateless predicates (the
    ingest-health dashboard feed): per event-time window, arrivals and
    per-reason drop counts. Pure windowed aggregation — state is one
    window's counters, closed by the watermark (append mode emits each
    window once, late rows beyond the horizon are dropped by contract)."""
    cap = F.coalesce(F.col("caption"), F.lit(""))
    toks = F.size(F.filter(F.split(cap, " "), lambda t: t != F.lit("")))
    flagged = images.select(
        F.col(ts_col).alias("ts"),
        (F.least("w", "h") < min_side).cast("long").alias("too_small"),
        (F.greatest("w", "h") > max_aspect * F.least("w", "h"))
        .cast("long")
        .alias("bad_aspect"),
        (toks < min_caption_tokens).cast("long").alias("caption_short"),
        (toks > max_caption_tokens).cast("long").alias("caption_long"),
    )
    return (
        flagged.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("win"))
        .agg(
            F.count("*").alias("n_arrived"),
            F.sum("too_small").alias("n_too_small"),
            F.sum("bad_aspect").alias("n_bad_aspect"),
            F.sum("caption_short").alias("n_caption_short"),
            F.sum("caption_long").alias("n_caption_long"),
        )
        .select(
            F.col("win.start").alias("window_start"),
            F.col("win.end").alias("window_end"),
            "n_arrived", "n_too_small", "n_bad_aspect",
            "n_caption_short", "n_caption_long",
        )
    )
