"""Extra (non-driver) benchmarks: per-phase isolation of the expensive
queries via the noop sink (guide §1.4), used to attribute wall time inside
one timed query to its stages. The driver contract lives in bench.py
(FROZEN); this file only informs optimization work and OPTIMIZATION_r08.md.

Usage: python bench_extra.py [phase-group ...]
Groups: pagerank hits pq ivf bm25 ngram crawl bpe simhashp divsample
(default: all)
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent
if str(REPO) not in sys.path:
    sys.path.insert(0, str(REPO))

from pyspark.sql import functions as F  # noqa: E402


def _t(spark, label, df, res):
    spark.sparkContext.setJobDescription(label)
    t0 = time.perf_counter()
    df.write.format("noop").mode("overwrite").save()
    res[label] = round(time.perf_counter() - t0, 3)
    spark.sparkContext.setJobDescription(None)


def phases_pagerank(spark, sf_dir) -> dict:
    from scrapy_spark.entry_queries import QUERIES, _copurchase_edges_long

    res: dict = {}
    t0 = time.perf_counter()
    edges = _copurchase_edges_long(spark, sf_dir)
    _t(spark, "pr:edges-derive", edges, res)
    t1 = time.perf_counter()
    out = QUERIES["pagerank_copurchase"][0](spark, sf_dir)
    res["pr:build(all jobs inside)"] = round(time.perf_counter() - t1, 3)
    _t(spark, "pr:final-write", out, res)
    res["pr:total"] = round(time.perf_counter() - t0, 3)
    return res


def phases_hits(spark, sf_dir) -> dict:
    from scrapy_spark.entry_queries import QUERIES

    res: dict = {}
    t0 = time.perf_counter()
    out = QUERIES["hits_copurchase"][0](spark, sf_dir)
    res["hits:build(all jobs inside)"] = round(time.perf_counter() - t0, 3)
    _t(spark, "hits:final-write", out, res)
    res["hits:total"] = round(time.perf_counter() - t0, 3)
    return res


def phases_pq(spark, sf_dir) -> dict:
    from scrapy_spark.entry_queries import _spark_quantized
    from scrapy_spark.operators import ann

    res: dict = {}
    t0 = time.perf_counter()
    vecs = _spark_quantized(spark, sf_dir)
    sv = ann.pq_subvectors(vecs, 8, 8)
    _t(spark, "pq:subvectors", sv, res)
    t1 = time.perf_counter()
    cb = ann.pq_codebooks(sv, 16, 2)
    from scrapy_spark.plans.materialize import materialize as _cut

    cb = _cut(cb, name="pq-codebooks")
    res["pq:codebooks(2 Lloyd iters)"] = round(time.perf_counter() - t1, 3)
    codes = ann.pq_assign(sv, cb).select(
        F.col("vec_id").alias("neighbor_id"), "m", "cid"
    )
    _t(spark, "pq:encode-corpus", codes, res)
    full = ann.pq_topk(vecs, F.col("vec_id") < 20, 3)
    _t(spark, "pq:full-query", full, res)
    res["pq:total"] = round(time.perf_counter() - t0, 3)
    return res


def phases_ivf(spark, sf_dir) -> dict:
    from scrapy_spark.entry_queries import _spark_quantized
    from scrapy_spark.operators import ann

    res: dict = {}
    t0 = time.perf_counter()
    vecs = _spark_quantized(spark, sf_dir)
    t1 = time.perf_counter()
    cent = ann.ivf_train(vecs, 8, 2)
    res["ivf:train(2 Lloyd iters)"] = round(time.perf_counter() - t1, 3)
    _t(spark, "ivf:assign", ann.ivf_assign(vecs, cent), res)
    full = ann.ivf_topk(vecs, F.col("vec_id") < 20, 3)
    _t(spark, "ivf:full-query", full, res)
    res["ivf:total"] = round(time.perf_counter() - t0, 3)
    return res


def phases_bm25(spark, sf_dir) -> dict:
    from scrapy_spark.entry_queries import QUERIES, _BM25_TERMS, load

    res: dict = {}
    t0 = time.perf_counter()
    d = load(spark, sf_dir, "documents")
    toks = F.filter(F.split("text", " "), lambda w: w != F.lit(""))
    docs = d.select("doc_id", toks.alias("toks"))
    _t(spark, "bm25:split-scan-once", docs, res)
    occ = docs.select(
        "doc_id",
        F.explode(
            F.filter(F.col("toks"), lambda tk: tk.isin(*_BM25_TERMS))
        ).alias("tok"),
    )
    tf = occ.groupBy("doc_id", "tok").agg(F.count("*").alias("tf"))
    _t(spark, "bm25:tf", tf, res)
    full = QUERIES["bm25_topk"][0](spark, sf_dir)
    _t(spark, "bm25:full-query", full, res)
    res["bm25:total"] = round(time.perf_counter() - t0, 3)
    return res


def phases_ngram(spark, sf_dir) -> dict:
    from scrapy_spark.entry_queries import QUERIES, _spark_shingles

    res: dict = {}
    t0 = time.perf_counter()
    sh = _spark_shingles(spark, sf_dir)
    _t(spark, "ngram:shingles-derive", sh, res)
    full = QUERIES["dedup_ngram_jaccard"][0](spark, sf_dir)
    _t(spark, "ngram:full-query", full, res)
    res["ngram:total"] = round(time.perf_counter() - t0, 3)
    return res


def phases_bpe(spark, sf_dir) -> dict:
    from scrapy_spark.entry_queries import QUERIES

    res: dict = {}
    t0 = time.perf_counter()
    full = QUERIES["bpe_train_merges"][0](spark, sf_dir)
    _t(spark, "bpe:full-query", full, res)
    res["bpe:total"] = round(time.perf_counter() - t0, 3)
    return res


def phases_simhashp(spark, sf_dir) -> dict:
    from scrapy_spark.entry_queries import QUERIES

    res: dict = {}
    t0 = time.perf_counter()
    full = QUERIES["dedup_simhash_pairs"][0](spark, sf_dir)
    _t(spark, "simhashp:full-query", full, res)
    res["simhashp:total"] = round(time.perf_counter() - t0, 3)
    return res


def phases_divsample(spark, sf_dir) -> dict:
    from scrapy_spark.entry_queries import QUERIES

    res: dict = {}
    t0 = time.perf_counter()
    full = QUERIES["embed_diversity_sample"][0](spark, sf_dir)
    _t(spark, "divsample:full-query", full, res)
    res["divsample:total"] = round(time.perf_counter() - t0, 3)
    return res


def phases_crawl(spark, cpus: int) -> dict:
    import shutil
    import tempfile

    from scrapy_spark.plans.crawl import CrawlJob
    from scrapy_spark.plans.oracle import CrawlParams
    from scrapy_spark.sources.synth import SynthConfig

    res: dict = {}
    cfg = SynthConfig(seed=42, n_hosts=40, n_pages=20000, n_images=8000,
                      links_per_page=8, images_per_page=3, n_seeds=4000)
    params = CrawlParams(max_generations=3, per_host_budget=300, gen_cap=50000)
    for run in range(2):
        wd = tempfile.mkdtemp(prefix="bx_crawl_")
        try:
            t0 = time.perf_counter()
            stats = CrawlJob(spark, cfg, params, wd,
                             salt_buckets=max(8, cpus)).run()
            res[f"crawl:run{run}:total"] = round(time.perf_counter() - t0, 3)
            for s in stats:
                res[f"crawl:run{run}:gen{s.generation}"] = round(s.seconds, 3)
        finally:
            shutil.rmtree(wd, ignore_errors=True)
    return res


GROUPS = {
    "pagerank": phases_pagerank,
    "hits": phases_hits,
    "pq": phases_pq,
    "ivf": phases_ivf,
    "bm25": phases_bm25,
    "ngram": phases_ngram,
    "bpe": phases_bpe,
    "simhashp": phases_simhashp,
    "divsample": phases_divsample,
}


def main() -> None:
    from scrapy_spark.session import get_spark

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    which = sys.argv[1:] or list(GROUPS) + ["crawl"]
    spark = get_spark("bench_extra", master=f"local[{cpus}]",
                      shuffle_partitions=cpus)
    # warmup
    from scrapy_spark.entry_queries import QUERIES

    QUERIES["a1_group_counts"][0](spark, sf_dir).count()
    out: dict = {}
    for g in which:
        if g == "crawl":
            out.update(phases_crawl(spark, cpus))
        else:
            out.update(GROUPS[g](spark, sf_dir))
        print(json.dumps({g: {k: v for k, v in out.items()}}, indent=None))
    print("RESULT " + json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
