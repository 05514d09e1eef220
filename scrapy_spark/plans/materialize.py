"""Pluggable mid-plan materializer for multiply-consumed DataFrames.

Iterative loops (PageRank/HITS label propagation), LSH band tables and
edge lists are consumed by several downstream jobs; re-computing their
lineage each time is quadratic-ish, so they get cut. Locally the right
cut is ``localCheckpoint`` (executor-local shuffle-free blocks) — but on
a real cluster those blocks die with the executor, so the production cut
is a staged parquet round-trip (restart-safe, and readable by speculative
re-attempts). This module makes that swap a CONFIG choice instead of a
code edit — every operator calls ``materialize(df)`` and the session
decides the mechanism:

- default: ``df.localCheckpoint(eager=...)`` (single-node / dev);
- ``spark.conf.set("spark.scrapy_spark.materialize.dir", <path>)`` or env
  ``SPARK_GRAFT_MATERIALIZE_DIR``: stage the frame as parquet under that
  directory and read it back (cluster mode; the write is the
  materialization, so eager/lazy does not apply).

The parquet path trades one write+read for lineage safety — the same
trade SnapshotCatalog makes for crawl tables (sources/catalog.py), just
without commit semantics because these tables are transient per-query.
"""

from __future__ import annotations

import os
import uuid

from pyspark.sql import DataFrame

_CONF_KEY = "spark.scrapy_spark.materialize.dir"
_ENV_KEY = "SPARK_GRAFT_MATERIALIZE_DIR"


def staging_dir(spark) -> str | None:
    """The configured durable staging directory, or None for local mode."""
    try:
        d = spark.conf.get(_CONF_KEY, None)
    except Exception:
        d = None
    return d or os.environ.get(_ENV_KEY) or None


def _app_staging_dir(spark) -> str | None:
    """Staged cuts live under <dir>/<applicationId>/ so one job's transient
    tables are reclaimable as a unit (clear_staging) and concurrent
    applications never collide."""
    d = staging_dir(spark)
    if d is None:
        return None
    return os.path.join(d, spark.sparkContext.applicationId)


def materialize(df: DataFrame, eager: bool = True, name: str = "mid") -> DataFrame:
    """Cut the lineage of a multiply-consumed mid-plan DataFrame.

    ``eager`` only affects the localCheckpoint path (lazy is right when a
    following broadcast subquery will materialize the frame anyway —
    see linkgraph.py); the parquet path is inherently eager.

    Staged-parquet lifecycle: each cut writes a new table (the consuming
    plans read it lazily, so the helper cannot know when it dies). Cuts are
    grouped per application id; call :func:`clear_staging` when the job's
    results are fully materialized (end of a query sweep / after a
    generation commits) — mirroring how Spark's own ``cleanCheckpoints``
    handles reliable checkpoints at application end."""
    d = _app_staging_dir(df.sparkSession)
    if d is None:
        return df.localCheckpoint(eager=eager)
    # no mkdir needed: the parquet committer creates parents through the
    # Hadoop FileSystem for whatever scheme the URI names (file://, hdfs://,
    # s3a://) — a driver-local os.makedirs would create a bogus local dir
    # for remote URIs
    path = d.rstrip("/") + f"/{name}-{uuid.uuid4().hex}.parquet"
    df.write.mode("error").parquet(path)
    return df.sparkSession.read.parquet(path)


def _fs_and_path(spark, path_str: str):
    """Resolve (FileSystem, Path) for a possibly-remote staging URI via the
    Hadoop FS API, so hdfs://, s3a:// and plain local paths all work."""
    jvm = spark._jvm
    p = jvm.org.apache.hadoop.fs.Path(path_str)
    fs = p.getFileSystem(spark._jsc.hadoopConfiguration())
    return fs, p


def clear_staging(spark) -> int:
    """Delete this application's staged cuts; returns the number of staged
    tables removed. Only safe once no live plan still reads them (i.e.
    results have been collected/written). Called from the production
    lifecycle points — CrawlJob.run's finally, bench.py between sweeps,
    main.py's command epilogue — so configured staging dirs don't grow
    unboundedly for the life of the application."""
    d = _app_staging_dir(spark)
    if d is None:
        return 0
    fs, p = _fs_and_path(spark, d)
    if not fs.exists(p):
        return 0
    n = len(fs.listStatus(p))
    fs.delete(p, True)
    return n
