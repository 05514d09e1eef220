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


# ---------------------------------------------------------------------------
# grouped_total_rank (round 7): exact within-group ranks without a
# per-group window — equality vs the naive window, skew included, and a
# plan with no row_number at all.
# ---------------------------------------------------------------------------

from scrapy_spark.operators.topk import grouped_total_rank  # noqa: E402


def _naive_grouped(df, group, order):
    w = Window.partitionBy(*group).orderBy(*order)
    return df.withColumn("r", F.row_number().over(w)).withColumn(
        "sz", F.count("*").over(Window.partitionBy(*group))
    )


def test_grouped_rank_equals_naive_window(spark):
    e = spark.read.parquet(f"{SF_DIR}/events.parquet")
    order = [F.col("value").desc(), F.col("event_id").asc()]
    for df in (e, e.repartition(13), e.repartition(32, "user_id")):
        naive = sorted(
            map(
                tuple,
                _naive_grouped(df, ["event_type"], order)
                .select("event_id", "r", "sz")
                .collect(),
            )
        )
        fast = sorted(
            map(
                tuple,
                grouped_total_rank(
                    df, ["event_type"], order, "r", size_col="sz"
                )
                .select("event_id", "r", "sz")
                .collect(),
            )
        )
        assert naive == fast


def test_grouped_rank_skewed_groups(spark):
    """One group holds 90% of the rows (the scale-killer case for a
    per-group window): ranks still exact, and the giant group spans many
    range partitions instead of one task."""
    import pandas as pd

    n = 5000
    pdf = pd.DataFrame(
        {
            "g": ["big"] * (n - 500) + [f"s{i % 50}" for i in range(500)],
            "uid": range(n),
        }
    )
    df = spark.createDataFrame(pdf).repartition(16)
    order = [F.col("uid").asc()]
    naive = sorted(
        map(tuple, _naive_grouped(df, ["g"], order).select("uid", "r", "sz").collect())
    )
    fast = sorted(
        map(
            tuple,
            grouped_total_rank(df, ["g"], order, "r", size_col="sz")
            .select("uid", "r", "sz")
            .collect(),
        )
    )
    assert naive == fast


def test_grouped_rank_plan_has_no_per_group_window(spark):
    """The ranking itself must not be a row_number window over the data:
    the only window allowed is the running-count aggregate over the tiny
    (pid, group) cell table."""
    e = spark.read.parquet(f"{SF_DIR}/events.parquet").repartition(8)
    fast = grouped_total_rank(
        e, ["event_type"], [F.col("event_id").asc()], "r"
    )
    plan = fast._jdf.queryExecution().optimizedPlan().toString()
    assert "row_number" not in plan
    # phase 1 sits behind the lineage cut (Scan ExistingRDD), so its shape
    # is asserted on an uncut replica: range exchange, per-partition sort
    # (never a global one), no window at all
    replica = (
        e.repartitionByRange(F.col("event_type").asc(), F.col("event_id").asc())
        .sortWithinPartitions(F.col("event_type").asc(), F.col("event_id").asc())
        .withColumn("_gid", F.monotonically_increasing_id())
    )
    rplan = replica._jdf.queryExecution().executedPlan().toString()
    assert "rangepartitioning" in rplan.lower()
    assert "Window" not in rplan
    for line in rplan.splitlines():
        if "+- Sort [" in line or line.startswith("Sort ["):
            assert ", false, 0" in line, f"global sort found: {line}"
