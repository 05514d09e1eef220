"""Prometheus exposition-format export of crawl metrics.

The reference emits pipeline metrics to a metrics server
(``Scraping_project/src/common/metrics_emitter.py``: url_discovered /
url_validated / pipeline_complete events) and snapshots per-stage
throughput (``performance_metrics.py:148-161`` get_summary: total items,
elapsed seconds, average rate). Observability proper was a declared
non-goal; this closes the EXPORT slice without dependencies: the same
facts already live in the snapshot catalog's ``metrics`` and ``lineage``
tables, so one column-pruned read renders them in the Prometheus text
exposition format (a public plain-text spec) for any scraper to ingest.

Scale shape: two tiny aggregations over per-generation tables (dozens of
rows per generation regardless of crawl size) — no per-URL data leaves
the catalog.
"""

from __future__ import annotations

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from .catalog import SnapshotCatalog


def _esc(v: str) -> str:
    """Escape a label value per the exposition format: backslash, quote and
    newline must be escaped or the line is unparseable. Current labels are
    internal constants, but host/URL-derived labels must stay safe."""
    return str(v).replace("\\", "\\\\").replace('"', '\\"').replace("\n", "\\n")


def _line(name: str, value, labels: dict[str, str] | None = None) -> str:
    lab = (
        "{" + ",".join(f'{k}="{_esc(v)}"' for k, v in sorted(labels.items())) + "}"
        if labels
        else ""
    )
    if isinstance(value, float):
        value = f"{value:.6g}"
    return f"{name}{lab} {value}"


def prometheus_exposition(spark: SparkSession, catalog: SnapshotCatalog) -> str:
    """Render the committed crawl state as Prometheus text format."""
    out: list[str] = []

    def head(name: str, mtype: str, help_: str) -> None:
        out.append(f"# HELP {name} {help_}")
        out.append(f"# TYPE {name} {mtype}")

    gen = catalog.committed_generation()
    head("crawl_generations_total", "counter", "Committed crawl generations")
    out.append(_line("crawl_generations_total", gen + 1))

    lineage = catalog.read(spark, "lineage")
    if lineage is not None:
        totals = lineage.agg(
            F.sum("scheduled").alias("scheduled"),
            F.sum("fetched").alias("fetched"),
            F.sum("failed").alias("failed"),
            F.sum("images").alias("images"),
        ).collect()[0]
        head("crawl_urls_scheduled_total", "counter",
             "URLs scheduled across all generations (metrics_emitter.url_discovered)")
        out.append(_line("crawl_urls_scheduled_total", int(totals["scheduled"] or 0)))
        head("crawl_urls_fetched_total", "counter",
             "Successful fetches (metrics_emitter.url_validated success)")
        out.append(_line("crawl_urls_fetched_total", int(totals["fetched"] or 0)))
        head("crawl_urls_failed_total", "counter",
             "Failed fetches (metrics_emitter.url_validated failure)")
        out.append(_line("crawl_urls_failed_total", int(totals["failed"] or 0)))
        head("crawl_images_total", "counter", "Image payloads fetched")
        out.append(_line("crawl_images_total", int(totals["images"] or 0)))

    metrics = catalog.read(spark, "metrics")
    if metrics is not None:
        rows = sorted(
            metrics.select(
                "generation", "stage", "items_processed",
                "items_per_second", "elapsed_seconds",
            ).collect(),
            key=lambda r: (r["generation"], r["stage"]),
        )
        head("crawl_stage_items_processed", "gauge",
             "Items per stage per generation (performance_metrics.get_summary)")
        for r in rows:
            out.append(_line(
                "crawl_stage_items_processed", int(r["items_processed"]),
                {"generation": str(r["generation"]), "stage": r["stage"]},
            ))
        head("crawl_stage_items_per_second", "gauge",
             "Stage throughput (performance_metrics.get_summary average_rate)")
        for r in rows:
            out.append(_line(
                "crawl_stage_items_per_second", float(r["items_per_second"]),
                {"generation": str(r["generation"]), "stage": r["stage"]},
            ))
        head("crawl_elapsed_seconds_total", "counter",
             "Wall time across stages (performance_metrics elapsed_seconds)")
        out.append(_line(
            "crawl_elapsed_seconds_total",
            float(sum(r["elapsed_seconds"] for r in rows)),
        ))

    alerts = catalog.read(spark, "alerts")
    if alerts is not None:
        counts = alerts.groupBy("severity", "event").count().collect()
        head("crawl_alerts_total", "counter",
             "Alert records by severity/event (alerts.py AlertManager)")
        for r in sorted(counts, key=lambda r: (r["severity"], r["event"])):
            out.append(_line(
                "crawl_alerts_total", int(r["count"]),
                {"severity": r["severity"], "event": r["event"]},
            ))

    cands = catalog.read(spark, "candidates")
    if cands is not None:
        est = (
            cands.filter(F.col("generation") == gen + 1)
            .agg(F.approx_count_distinct("raw_url").alias("n"))
            .collect()[0]["n"]
        )
        head("crawl_pending_frontier_urls", "gauge",
             "HLL estimate of the next generation's distinct pending URLs")
        out.append(_line("crawl_pending_frontier_urls", int(est)))

    return "\n".join(out) + "\n"
