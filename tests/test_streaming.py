"""Streaming: continuous crawl loop parity + windowed metrics aggregation."""

from __future__ import annotations

from scrapy_spark.plans.crawl import CrawlJob
from scrapy_spark.plans.oracle import CrawlParams, run_oracle
from scrapy_spark.sources.synth import SynthConfig
from scrapy_spark.streaming.continuous import (
    FETCH_EVENT_SCHEMA,
    continuous_crawl,
    windowed_fetch_metrics,
)

CFG = SynthConfig(seed=42, n_hosts=8, n_pages=150, n_images=60)
PARAMS = CrawlParams(max_generations=3, per_host_budget=8)


def test_continuous_crawl_matches_oracle(spark, tmp_path):
    job = CrawlJob(spark, CFG, PARAMS, str(tmp_path / "wd"), salt_buckets=4)
    stats = continuous_crawl(job, timeout_s=90)
    oracle = run_oracle(CFG, PARAMS)
    seen = {
        (r["url"], r["generation"])
        for r in job.catalog.read(spark, "url_seen").collect()
    }
    assert seen == {(u, g) for u, g in oracle.seen.items()}
    assert [s.scheduled for s in stats] == [
        c["scheduled"] for c in oracle.gen_counts if c["scheduled"] > 0
    ]


def test_windowed_fetch_metrics(spark, tmp_path):
    import pandas as pd

    rows = []
    for i in range(100):
        rows.append(
            {
                "url": f"https://h{i%3}.uconn.edu/p{i}",
                "host": f"h{i%3}.uconn.edu",
                "ts": pd.Timestamp("2024-01-01 00:00:00") + pd.Timedelta(seconds=i),
                "is_valid": i % 10 != 0,
                "n_bytes": 100 + i,
            }
        )
    src = tmp_path / "stream_src"
    src.mkdir()
    # microsecond timestamps — Spark can't read pandas' default ns INT64
    pd.DataFrame(rows).to_parquet(
        src / "part0.parquet", coerce_timestamps="us", allow_truncated_timestamps=True
    )

    stream = spark.readStream.schema(FETCH_EVENT_SCHEMA).parquet(str(src))
    agg = windowed_fetch_metrics(stream, window="10 seconds")
    q = (
        agg.writeStream.outputMode("complete")
        .format("memory")
        .queryName("fetch_metrics")
        .start()
    )
    try:
        q.processAllAvailable()
        out = spark.sql("SELECT * FROM fetch_metrics").collect()
    finally:
        q.stop()
    # 100 seconds of events -> 10 windows x 3 hosts
    assert len(out) == 30
    total = sum(r["n_fetched"] for r in out)
    assert total == 100
    invalid = sum(r["n_fetched"] - r["n_valid"] for r in out)
    assert invalid == 10
