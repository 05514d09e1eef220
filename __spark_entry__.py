"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs each
``queries()[name]`` at sf=0.01 and compares it against the matching
``oracle_sql()[name]`` via DuckDB (row-count + schema + order-insensitive
value-hash -> CORRECTNESS_r{N}.json).

Implementations live in ``scrapy_spark/entry_queries.py`` (one registry entry
per operator family from SURVEY.md §2 plus the training-data pipeline ops);
this file is the thin adapter the driver imports.
"""

from __future__ import annotations

import sys
from collections.abc import Callable
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession

_REPO = Path(__file__).resolve().parent
if str(_REPO) not in sys.path:
    sys.path.insert(0, str(_REPO))

from scrapy_spark.entry_queries import QUERIES  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: the north-rule operator —
    per-host window-ranked frontier selection (W1 rank-and-take)."""
    fn, _ = QUERIES["w1_frontier_rank_topk"]
    return fn(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return {name: fn for name, (fn, _sql) in QUERIES.items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL twins (omitted for iterative/sequential ops —
    the driver records rows-only checks for those)."""
    return {name: sql for name, (_fn, sql) in QUERIES.items() if sql is not None}
