"""URL lineage-path query (lineage.py:240-280 get_lineage_path): trace any
fetched URL backwards through its discovery edges to the seed.

The reference walks an in-memory edge list; the Spark form walks the
(url -> source_url) edge column of fetch_results with a BOUNDED iterative
broadcast join — one hop per iteration, frontier is the single current
path tail (1 row), so each hop is a broadcast-semi lookup against the
column-pruned fetch table, never a recursive self-join of the whole edge
set. Cycle-safe (visited set, the reference's guard) and depth-bounded.

At 10^10 scale the per-hop lookup is an (url_hash-keyed) point probe of
the bucketed fetch layout; hop count is bounded by max crawl depth
(generations), so the whole path costs O(depth) point lookups.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def lineage_path(
    fetch_results: DataFrame, url: str, max_hops: int = 32
) -> list[dict]:
    """Path from ``url`` back to its seed: list of rows (url, source_url,
    source_type, generation, depth), target first, seed last."""
    edges = fetch_results.select(
        "url", "source_url", "source_type", "generation", "depth"
    )
    path: list[dict] = []
    visited: set[str] = set()
    current: str | None = url
    for _ in range(max_hops):
        if current is None or current in visited:
            break
        visited.add(current)
        rows = (
            edges.filter(F.col("url") == current)
            # total order: (generation, depth) alone is not unique if a URL
            # ever gains two rows at the same coordinates (e.g. retry /
            # revalidate placement changes) — append deterministic final keys
            # so the hop choice can never become shuffle-order-dependent
            .orderBy("generation", "depth", "source_type", "source_url")
            .limit(1)
            .collect()
        )
        if not rows:
            break
        r = rows[0].asDict()
        path.append(r)
        current = r["source_url"]
    return path
