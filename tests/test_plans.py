"""Physical-plan assertions: the optimizer properties we rely on at 100 TB
must actually hold (SURVEY §4) — filter pushdown to the parquet scan, column
pruning, broadcast joins for small sides, anti-join strategy."""

from __future__ import annotations

import pytest

from scrapy_spark.entry_queries import QUERIES

SF = "/root/testdata/sf0.001"


def plan_of(spark, name: str) -> str:
    df = QUERIES[name][0](spark, SF)
    return df._jdf.queryExecution().executedPlan().toString()


def test_q1_filter_pushdown_and_pruning(spark):
    p = plan_of(spark, "q1_pricing_summary")
    assert "LessThanOrEqual(l_shipdate" in p  # predicate reached the scan
    # column pruning: only the 7 needed columns read, not all 11
    assert "l_orderkey" not in p.split("ReadSchema")[1][:200]


def test_q3_broadcasts_dims(spark):
    p = plan_of(spark, "q3_segment_top_orders")
    assert "BroadcastHashJoin" in p
    assert "CartesianProduct" not in p
    # customer filter pushed to its scan
    assert "EqualTo(c_mktsegment,BUILDING)" in p


def test_q5_no_shuffle_join_for_dims(spark):
    p = plan_of(spark, "q5_nation_revenue")
    # all three dims broadcast; the only shuffle is the final aggregation
    assert p.count("BroadcastHashJoin") >= 3
    assert "SortMergeJoin" not in p


def test_anti_join_strategy(spark):
    p = plan_of(spark, "j1_seen_anti_join")
    assert "LeftAnti" in p
    assert "GreaterThanOrEqual(ts,2024-01-20" in p  # split filters pushed


def test_keyword_explode_prunes_to_text(spark):
    p = plan_of(spark, "a14_top_keywords")
    read = p.split("ReadSchema")[1][:120]
    assert "text" in read and "lang" not in read and "source" not in read


# Queries where a BroadcastNestedLoopJoin is INTENTIONAL and provably
# bounded — the build side is O(1) or O(K) rows by construction, so the
# "nested loop" is a constant-size probe, not an all-pairs join:
#   ann_cosine_topk / ann_lsh_recall / ann_ivf_recall — the brute-force
#     cosine baseline (query set × corpus) is the documented reference
#     answer the approximate methods are scored against;
#   ann_ivf_topk — broadcast of the K-centroid table (K fixed, tiny);
#   pagerank_copurchase / hits_copurchase / w7_top_by_rank — per-iteration
#     1-row broadcast scalar subqueries (dangling mass / L2 norm).
BNLJ_ALLOWLIST = {
    "ann_cosine_topk",
    "ann_lsh_recall",
    "ann_ivf_recall",
    "ann_ivf_topk",
    "ann_pq_recall",  # 1-row x 1-row recall-ratio cross (bounded build)
    "ann_ivfpq_topk",  # centroid broadcast cross (8-row build, ivf_assign)
    "ann_ivfpq_recall",
    "corpus_stats",  # 1-row summary x 1-row quantile-pick crosses (bounded)
    "dsir_select",  # 1-row expected-ratio cross (bounded build)
    "lm_perplexity_buckets",  # 1-row LM total + 1-row tercile crosses (bounded)
    "bpe_train_merges",  # K fixed 1-row argmax crosses (pagerank discipline)
    "bpe_token_count",  # same trained chain under the per-doc apply
    "nb_langid_confusion",  # class-table cross (|classes| rows, bounded)
    "embed_diversity_sample",  # centroid broadcast cross (8-row build, ivf_assign)
    "pagerank_copurchase",
    "hits_copurchase",
    "w7_top_by_rank",
    # combos containing the above as members
    "ann_topk_methods",
    "ann_recall_methods",
    "page_importance",
    "text_analysis",  # carries dsir_select + lm_perplexity_buckets
}


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_no_all_pairs_joins(spark, name):
    """EVERY registered query must be free of the two all-pairs physical
    join operators. CartesianProduct is never acceptable;
    BroadcastNestedLoopJoin only with a bounded build side (allowlist above).
    This sweep exists because the old dedup_minhash_lsh OR-of-bands join
    executed as a BNLJ while a CartesianProduct-only assertion stayed
    green (round-3 verdict finding #1/#2)."""
    p = plan_of(spark, name)
    assert "CartesianProduct" not in p, name
    if name not in BNLJ_ALLOWLIST:
        assert "BroadcastNestedLoopJoin" not in p, name


def test_minhash_lsh_band_join_is_equi(spark):
    """The LSH candidate join must hash-partition on the band value: a
    shuffle-hash or sort-merge or broadcast-HASH join keyed by (band_idx,
    bv), never a nested-loop over signatures."""
    p = plan_of(spark, "dedup_minhash_lsh")
    assert "BroadcastNestedLoopJoin" not in p
    assert ("SortMergeJoin" in p) or ("ShuffledHashJoin" in p) or (
        "BroadcastHashJoin" in p
    )
    assert "bv" in p


def test_ngram_cap_hot_list_broadcast(spark):
    """The posting-list cap's hot-shingle anti-join must broadcast the tiny
    violator list, never shuffle the full shingle table for it. Built with
    materialize=False: the registered query localCheckpoints the capped
    table (shingle derivation has 4 consumers), which hides the join from
    the final plan string."""
    from scrapy_spark.entry_queries import _spark_shingles
    from scrapy_spark.operators.neardup import ngram_jaccard_pairs

    df = ngram_jaccard_pairs(
        _spark_shingles(spark, SF), threshold=0.2, max_doc_freq=1000,
        materialize=False,
    )
    p = df._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in p and "LeftAnti" in p


def test_ann_lsh_join_is_bucket_equi(spark):
    """LSH candidate join keys on the bucket id (equi), not a cross join."""
    p = plan_of(spark, "ann_lsh_bucketed")
    assert "CartesianProduct" not in p
    assert "bucket" in p


def test_topk_sites_have_no_global_sort_of_input(spark):
    """Two-phase top-k: the only full-order operator is the final
    TakeOrderedAndProject over the <= k*P survivors."""
    for name in ("a4_top_referrers", "a14_top_keywords", "w2_fifo_order",
                 "w4_random_order", "q3_segment_top_orders"):
        p = plan_of(spark, name)
        assert "TakeOrderedAndProject" in p, name
        for line in p.splitlines():
            stripped = line.strip(" +:-")
            if stripped.startswith("Sort ["):
                assert ", false, 0" in stripped, (name, stripped)


def test_revalidation_scan_prunes_bytes(spark, tmp_path):
    """Freshness derivation reads only (url, generation, age_days,
    error_type, attempt) from fetch history — the wide image-bytes column
    must never enter that scan (bytes discipline, SURVEY §7.3.4)."""
    from scrapy_spark.plans.crawl import CrawlJob
    from scrapy_spark.plans.oracle import CrawlParams
    from scrapy_spark.sources.synth import SynthConfig

    wd = str(tmp_path / "reval_plan")
    params = CrawlParams(max_generations=2, per_host_budget=5, revalidate=True)
    job = CrawlJob(spark, SynthConfig(seed=42, n_hosts=8, n_pages=120, n_images=40),
                   params, wd, salt_buckets=2)
    job.run()
    reval = job._revalidation_candidates(gen=4)
    p = reval._jdf.queryExecution().executedPlan().toString()
    read = p.split("ReadSchema")[1][:300]
    assert "bytes" not in read and "body_links" not in read, read
    assert "url" in read and "age_days" in read


def test_diversity_sample_no_per_cluster_rank_window(spark):
    """Round-6 verdict #1: the per-cluster sample election must not be a
    row_number window PARTITIONed BY cid (bounded parallelism, one task per
    cluster). After the grouped_total_rank rewrite the only row_number
    windows anywhere in the query tree are ivf_assign's per-VECTOR ones,
    and the only cid-partitioned window is the running-count aggregate over
    the tiny (pid, cid) cell table. Checked on the OPTIMIZED plan (the
    executed plan hides phase 1 behind the materialize cut, but neither
    plan may show a cid-keyed row_number)."""
    df = QUERIES["embed_diversity_sample"][0](spark, SF)
    for plan in (
        df._jdf.queryExecution().optimizedPlan().toString(),
        df._jdf.queryExecution().executedPlan().toString(),
    ):
        for line in plan.splitlines():
            if "row_number" in line:
                assert "cid#" not in line.split("windowspecdefinition")[-1], line
