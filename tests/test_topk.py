"""Two-phase top-k (operators/topk.py): identical output to the naive global
row_number window across partitionings, and a plan that never funnels the
full input through one task."""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from scrapy_spark.operators.topk import topk_total_order

SF_DIR = "/root/testdata/sf0.001"


def _naive(df, order_by, k, rank_col):
    w = Window.orderBy(*order_by)
    return df.withColumn(rank_col, F.row_number().over(w)).filter(
        F.col(rank_col) <= k
    )


def test_topk_equals_naive_window(spark):
    e = spark.read.parquet(f"{SF_DIR}/events.parquet")
    order = [F.col("value").desc(), F.col("event_id").asc()]
    for df in (e, e.repartition(13), e.repartition(32, "user_id")):
        for k in (1, 7, 100):
            naive = _naive(df, order, k, "rk").select("event_id", "rk")
            fast = topk_total_order(df, order, k, rank_col="rk").select(
                "event_id", "rk"
            )
            assert sorted(map(tuple, naive.collect())) == sorted(
                map(tuple, fast.collect())
            ), f"k={k}"


def test_topk_without_rank_col(spark):
    e = spark.read.parquet(f"{SF_DIR}/events.parquet").repartition(8)
    order = [F.col("ts").asc(), F.col("event_id").asc()]
    naive = _naive(e, order, 25, "_rk").drop("_rk")
    fast = topk_total_order(e, order, 25)
    assert sorted(map(tuple, naive.collect())) == sorted(map(tuple, fast.collect()))
    assert fast.columns == e.columns


def test_topk_plan_is_distributed(spark):
    """Local phase = per-partition (non-global) sort + positional filter;
    final phase collapses to TakeOrderedAndProject over <= k*P survivors."""
    e = spark.read.parquet(f"{SF_DIR}/events.parquet").repartition(8)
    fast = topk_total_order(
        e, [F.col("ts").asc(), F.col("event_id").asc()], 10, rank_col="seq"
    )
    plan = fast._jdf.queryExecution().executedPlan().toString()
    assert "monotonically_increasing_id" in plan
    assert "TakeOrderedAndProject" in plan
    # no global Sort of the full input: every Sort node is per-partition
    for line in plan.splitlines():
        if "+- Sort [" in line or line.startswith("Sort ["):
            assert ", false, 0" in line, f"global sort found: {line}"


def test_topk_property_random(spark):
    """Property: for random data (with heavy duplicate keys) and random k,
    two-phase top-k == naive global window, across partitionings."""
    import random

    import pandas as pd
    from pyspark.sql import functions as F

    rng = random.Random(7)
    pdf = pd.DataFrame(
        {
            "k": [rng.randint(0, 5) for _ in range(2000)],  # heavy ties
            "uid": range(2000),
        }
    )
    base = spark.createDataFrame(pdf)
    order = [F.col("k").desc(), F.col("uid").asc()]
    for parts in (1, 7, 64):
        df = base.repartition(parts)
        for k in (1, 3, 50, 2000, 5000):  # incl. k >= input size
            naive = sorted(
                map(tuple, _naive(df, order, k, "r").select("uid", "r").collect())
            )
            fast = sorted(
                map(
                    tuple,
                    topk_total_order(df, order, k, rank_col="r")
                    .select("uid", "r")
                    .collect(),
                )
            )
            assert naive == fast, (parts, k)
