"""Structured Streaming surfaces.

The reference has no true streaming (SURVEY §2.10) — its asyncio queues and
AIMD throttling are rate control, which the rebuild expresses as generation
micro-batching. Two genuinely streaming pieces are still useful:

1. ``continuous_crawl`` — a rate-source-paced foreachBatch loop that runs one
   frontier generation per trigger until exhaustion: the Structured-Streaming
   packaging of the batch loop (maxOffsetsPerTrigger-style pacing analog of
   the reference's backpressure queue, pipeline.py:33-152).
2. ``windowed_fetch_metrics`` — event-time windowed aggregation with
   watermarking over a fetch-events stream: items/sec per host window, the
   streaming twin of the reference's 10 s PerformanceSnapshot cadence
   (performance_metrics.py:20-31).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def continuous_crawl(job, timeout_s: float = 120.0) -> list:
    """Run the crawl as a Structured Streaming query: a rate source produces
    one tick per second; each micro-batch advances the frontier by one
    generation (foreachBatch = exactly-once sink boundary; the snapshot
    catalog commit is the idempotent sink). Stops when a generation schedules
    nothing or timeout_s elapses."""
    spark = job.spark
    stats: list = []
    done = {"flag": False}

    def advance(batch_df: DataFrame, epoch_id: int) -> None:
        if done["flag"]:
            return
        gen = job.catalog.committed_generation() + 1
        if gen >= job.params.max_generations:
            done["flag"] = True
            return
        st = job._run_generation(gen)
        stats.append(st)
        if st.scheduled == 0:
            done["flag"] = True

    stream = spark.readStream.format("rate").option("rowsPerSecond", 4).load()
    q = stream.writeStream.foreachBatch(advance).trigger(
        processingTime="250 milliseconds"
    ).start()
    import time

    try:
        # NOTE: processAllAvailable() never returns on an unbounded rate
        # source — poll the completion flag instead
        deadline = time.time() + timeout_s
        while not done["flag"] and time.time() < deadline:
            time.sleep(0.2)
    finally:
        q.stop()
    return stats


FETCH_EVENT_SCHEMA = (
    "url string, host string, ts timestamp, is_valid boolean, n_bytes long"
)


def windowed_fetch_metrics(
    stream: DataFrame, window: str = "10 seconds", watermark: str = "30 seconds"
) -> DataFrame:
    """Event-time windowed per-host fetch metrics with late-data watermark."""
    return (
        stream.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("w"), "host")
        .agg(
            F.count("*").alias("n_fetched"),
            F.sum(F.when(F.col("is_valid"), 1).otherwise(0)).alias("n_valid"),
            F.sum("n_bytes").alias("bytes_total"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "host",
            "n_fetched",
            "n_valid",
            "bytes_total",
        )
    )


def session_fetch_activity(
    stream: DataFrame, gap: str = "30 seconds", watermark: str = "2 minutes"
) -> DataFrame:
    """Per-host SESSION windows (gap-based) over the fetch-event stream —
    the streaming twin of the batch sessionize_events query (lag + gap
    threshold): a 'crawl session' for a host closes after ``gap`` of
    inactivity; late events merge sessions up to the watermark."""
    return (
        stream.withWatermark("ts", watermark)
        .groupBy(F.session_window("ts", gap).alias("s"), "host")
        .agg(
            F.count("*").alias("n_fetched"),
            F.sum(F.when(F.col("is_valid"), 1).otherwise(0)).alias("n_valid"),
        )
        .select(
            F.col("s.start").alias("session_start"),
            F.col("s.end").alias("session_end"),
            "host",
            "n_fetched",
            "n_valid",
        )
    )
