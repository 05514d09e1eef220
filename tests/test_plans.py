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


@pytest.mark.parametrize(
    "name", ["dedup_minhash_lsh", "embed_neardup_pairs", "w1_frontier_rank_topk"]
)
def test_no_cartesian_products(spark, name):
    assert "CartesianProduct" not in plan_of(spark, name)
