"""Large-scale crawl parity: the full bench-sized config (12.6k scheduled
URLs, ~2.7k binary payloads across png/jpeg/gif/webp/pdf) against the
sequential oracle — schedule, captions and payload bytes all exact.

ENV-GATED (~2 min): set SPARK_GRAFT_BIG_PARITY=1 to run; the standard
suite covers the same invariants at ~300-600 URLs. Last full run recorded
in COVERAGE.md (round 5): PARITY OK at 12622 URLs, 2723 byte-exact
payloads, mix {pdf: 323, png: 1758, webp: 160, jpeg: 339, gif: 143}."""

from __future__ import annotations

import os
import shutil
import tempfile

import pytest

pytestmark = pytest.mark.skipif(
    os.environ.get("SPARK_GRAFT_BIG_PARITY") != "1",
    reason="~2 min; set SPARK_GRAFT_BIG_PARITY=1 (results recorded in COVERAGE.md)",
)


def test_bench_config_crawl_matches_oracle(spark):
    from scrapy_spark.plans.crawl import CrawlJob
    from scrapy_spark.plans.oracle import CrawlParams, run_oracle
    from scrapy_spark.sources.synth import SynthConfig

    cfg = SynthConfig(seed=42, n_hosts=40, n_pages=20000, n_images=8000,
                      links_per_page=8, images_per_page=3, n_seeds=4000)
    params = CrawlParams(max_generations=3, per_host_budget=300, gen_cap=50000)
    wd = tempfile.mkdtemp(prefix="bigparity_")
    try:
        job = CrawlJob(spark, cfg, params, wd, salt_buckets=32)
        job.run()
        rows = job.catalog.read(spark, "fetch_results").collect()
        oracle = run_oracle(cfg, params)
        a = {(r["generation"], r["host"], r["rank_in_host"]): r["url"] for r in rows}
        b = {(r["generation"], r["host"], r["rank_in_host"]): r["url"]
             for r in oracle.scheduled}
        assert a == b
        assert len(a) > 10000  # genuinely the large config
        ours = {(r["url"], r["attempt"], r["generation"]): (r["bytes"], r["caption"])
                for r in rows}
        fmts = set()
        for o in oracle.scheduled:
            bts, cap = ours[(o["url"], o["attempt"], o["generation"])]
            assert cap == o["caption"]
            assert (bts is None) == (o["bytes"] is None)
            if o["bytes"] is not None:
                assert bytes(bts) == o["bytes"], o["url"]
                fmts.add(o["content_type"])
        assert fmts >= {"image/png", "image/jpeg", "image/gif", "image/webp",
                        "application/pdf"}
    finally:
        shutil.rmtree(wd, ignore_errors=True)
