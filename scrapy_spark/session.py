"""SparkSession factory with scale-aware defaults.

Local testing runs on local[N]; the same settings are what we'd submit to a
1000-executor cluster (AQE, skew-join, Arrow). ``spark.sql.shuffle.partitions``
is sized to cores locally; on a real cluster AQE coalescing makes the static
number mostly moot.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "scrapy_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    master = master or f"local[{cpus}]"
    # JIT code cache: the JVM default (240 MB) fills after a few dozen
    # whole-stage-codegen'd queries in one session; once full the compiler
    # stops and hot paths run interpreted (measured: 2-4x slowdown of a
    # crawl run AFTER a long query session, slowly recovering as code is
    # re-JITed). Only effective if the gateway JVM isn't up yet — for
    # spark-submit runs pass --driver-java-options instead.
    gateway_up = SparkSession.getActiveSession() is not None or (
        getattr(SparkSession, "_instantiatedSession", None) is not None
    )
    user_set = any(
        "-XX:ReservedCodeCacheSize" in os.environ.get(var, "")
        for var in ("SPARK_SUBMIT_OPTS", "JAVA_TOOL_OPTIONS", "_JAVA_OPTIONS")
    )
    # mutate the env only while it can still matter (gateway JVM not yet
    # launched) and never override a user-chosen code-cache size
    if not gateway_up and not user_set:
        os.environ["SPARK_SUBMIT_OPTS"] = (
            os.environ.get("SPARK_SUBMIT_OPTS", "")
            + " -XX:ReservedCodeCacheSize=1g"
        ).strip()
    if shuffle_partitions is None:
        n = master[master.find("[") + 1 : master.find("]")] if "[" in master else str(cpus)
        shuffle_partitions = cpus if n == "*" else int(n)
    b = (
        SparkSession.builder.master(master)
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "10000")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.autoBroadcastJoinThreshold", str(32 * 1024 * 1024))
    )
    for k, v in (extra_conf or {}).items():
        b = b.config(k, v)
    spark = b.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
