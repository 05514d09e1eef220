"""Streaming first-occurrence dedup — the D1 URL-seen kernel as a stream.

The batch engine's seen-set (operators/dedup.py: sharded Bloom + catalog
anti-join, reference ``url_deduplication.py`` semantics) answers "ever seen
across the whole crawl"; this operator answers the STREAMING half: dedup
candidates as they arrive, with state bounded by an event-time watermark
instead of growing forever. ``dropDuplicatesWithinWatermark`` emits the
first row per key immediately and keeps the key in state only until the
watermark passes its event time — at the 10^10-URL design point the state
store holds one horizon's worth of keys, not the frontier's history.

Division of labor at scale (same split as the reference's in-memory set vs
its persisted stage outputs): the catalog/Bloom path stays the durable
cross-restart source of truth; this operator removes intra-horizon repeats
(hot re-discovered URLs) before they ever reach the expensive fetch stage.
State is keyed by the 64-bit URL hash, so the store carries fixed-width
keys, never URL strings.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def streaming_url_seen(
    candidates: DataFrame,
    watermark: str = "10 minutes",
    id_col: str = "url_hash",
    ts_col: str = "ts",
) -> DataFrame:
    """First occurrence per ``id_col`` within the watermark horizon.

    ``candidates`` must be a streaming DataFrame with an event-time column
    ``ts_col``. Works in append mode: the winner row is emitted in its own
    micro-batch (no watermark-close latency); later rows with the same key
    are dropped until the key ages out of state."""
    return candidates.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(
        [id_col]
    )
