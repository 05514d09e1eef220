"""M5 skew hardening: a hot host with ~50x the URLs must not serialize the
fetch stage — salting splits it across salt_buckets partitions."""

from __future__ import annotations

from pyspark.sql import functions as F


def _partition_sizes(df):
    return [
        r["n"]
        for r in df.withColumn("pid", F.spark_partition_id())
        .groupBy("pid")
        .agg(F.count("*").alias("n"))
        .collect()
    ]


def test_salted_repartition_splits_hot_host(spark):
    rows = []
    for i in range(5000):  # hot host: ~83% of all rows
        rows.append((f"https://img0.uconn.edu/i/img{i:06d}.png", "img0.uconn.edu"))
    for h in range(20):
        for i in range(50):
            rows.append((f"https://dept{h:03d}.uconn.edu/news/p{i}", f"dept{h:03d}.uconn.edu"))
    df = (
        spark.createDataFrame(rows, ["url", "host"])
        .withColumn("url_hash", F.xxhash64("url"))
        .repartition(16)  # start from an arbitrary layout
    )

    unsalted = df.repartition(16, F.col("host"))
    salted = df.repartition(16, F.col("host"), F.pmod(F.col("url_hash"), F.lit(8)))

    total = 6000
    max_unsalted = max(_partition_sizes(unsalted))
    max_salted = max(_partition_sizes(salted))
    # unsalted: the hot host lands in ONE partition (>= 5000 rows)
    assert max_unsalted >= 5000
    # salted: the worst partition shrinks by >= 3x (8 salt keys can still
    # collide pairwise into 16 hash partitions, so fair-share is not exact)
    assert max_salted <= max_unsalted / 3
    assert max_salted < total / 3
    # and the hot host's rows actually spread across many partitions
    hot = salted.filter(F.col("host") == "img0.uconn.edu")
    hot_parts = (
        hot.withColumn("pid", F.spark_partition_id()).select("pid").distinct().count()
    )
    assert hot_parts >= 6
