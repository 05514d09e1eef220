"""Vendor / third-party file ingestion into the warehouse.

Rebuilds the reference's vendor-data framework
(``Scraping_project/src/common/vendor_integration.py:42-180``:
VendorConfig + FileVendorSource extract for JSON/JSONL/CSV,
``load_to_warehouse`` :58-77 wrapping each record as a VendorDataRecord;
``warehouse.py:316-340 insert_vendor_data``; record shape
``warehouse_schema.py:400-409``) as ONE ``spark.read.*`` → normalized
``vendor_data`` append path:

- extract: the engine's native readers (csv with header, json/jsonl,
  parquet) replace the reference's csv.DictReader / json loops — the
  vendor file is read at full parallelism, not row-at-a-time on a driver.
  Excel needs openpyxl (absent here, an external-dep gap like the
  reference's own ImportError path :178-182) and raises a labeled
  NotImplementedError.
- normalize: every source row becomes (vendor_id, vendor_name, vendor_url,
  data_type, record_key, page_id, raw_data) — raw_data is the full source
  row as canonical JSON (the reference stores the same dict as JSON);
  page_id links to ``fact_pages`` when a URL column is mapped
  (xxhash64 of the canonicalized URL — the engine's page key).
- version: re-ingest appends a new batch; ``crawl_version``/``is_current``
  are computed per (vendor_id, record_key) over batch order — the same
  SCD-2 update-then-supersede election ``sources/warehouse.fact_pages``
  uses. ``batch_id`` is the logical clock (the reference's wall-clock
  ``extracted_at`` would break bit-identity on re-runs).

Scale shape: normalization is pure column expressions; versioning is one
window keyed on (vendor_id, record_key) — the natural shuffle key; batches
are partition directories (``batch=N``) so a read prunes to the batches it
needs. No driver-side row loops anywhere.
"""

from __future__ import annotations

import os
import re

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..operators.frontier import canonicalize_udf

_BATCH_RE = re.compile(r"^batch=(\d+)$")

FORMATS = ("csv", "json", "jsonl", "parquet")


def read_vendor(spark: SparkSession, path: str, fmt: str) -> DataFrame:
    """FileVendorSource.extract_data (vendor_integration.py:120-146), on the
    engine's readers."""
    if fmt == "csv":
        return spark.read.option("header", True).option("inferSchema", True).csv(path)
    if fmt in ("json", "jsonl"):
        # spark's json reader is line-delimited by default; whole-document
        # JSON arrays need multiLine
        return spark.read.option("multiLine", fmt == "json").json(path)
    if fmt == "parquet":
        return spark.read.parquet(path)
    if fmt in ("xlsx", "xls"):
        raise NotImplementedError(
            "excel ingestion needs openpyxl (vendor_integration.py:176-182 "
            "has the same external dependency); convert to csv/parquet"
        )
    raise ValueError(f"unsupported vendor format {fmt!r} (use one of {FORMATS})")


def normalize(
    df: DataFrame,
    vendor_name: str,
    vendor_url: str,
    data_type: str,
    key_col: str | None = None,
    url_col: str | None = None,
) -> DataFrame:
    """Source rows → vendor_data records (warehouse_schema.py:400-409 shape).

    record_key: the natural key for SCD-2 versioning — the mapped key
    column, else the xxhash64 of the canonical-JSON row (identical rows
    re-version, distinct rows coexist). raw_data: the full row as JSON with
    sorted keys, so the key is stable across column orders.
    """
    cols = df.columns
    if key_col is not None and key_col not in cols:
        raise ValueError(f"key column {key_col!r} not in source columns {cols}")
    if url_col is not None and url_col not in cols:
        raise ValueError(f"url column {url_col!r} not in source columns {cols}")
    # canonical JSON: struct fields in sorted name order
    raw = F.to_json(F.struct(*[F.col(c) for c in sorted(cols)]))
    key = (
        F.col(key_col).cast("string")
        if key_col is not None
        else F.xxhash64(raw).cast("string")
    )
    page_id = (
        F.xxhash64(canonicalize_udf(F.col(url_col)))
        if url_col is not None
        else F.lit(None).cast("long")
    )
    return df.select(
        F.xxhash64(F.lit(vendor_name)).alias("vendor_id"),
        F.lit(vendor_name).alias("vendor_name"),
        F.lit(vendor_url).alias("vendor_url"),
        F.lit(data_type).alias("data_type"),
        key.alias("record_key"),
        page_id.alias("page_id"),
        raw.alias("raw_data"),
    )


def next_batch_id(out_dir: str) -> int:
    """Batches are partition dirs batch=N; the next id is max+1 (a listing,
    not a scan — the logical ingest clock)."""
    if not os.path.isdir(out_dir):
        return 0
    ids = [
        int(m.group(1))
        for name in os.listdir(out_dir)
        if (m := _BATCH_RE.match(name))
    ]
    return max(ids) + 1 if ids else 0


def ingest(
    spark: SparkSession,
    path: str,
    fmt: str,
    out_dir: str,
    vendor_name: str,
    key_col: str | None = None,
    url_col: str | None = None,
) -> dict:
    """Extract → normalize → append one batch. Returns counts for the CLI."""
    src = read_vendor(spark, path, fmt)
    rec = normalize(src, vendor_name, path, fmt, key_col, url_col)
    batch = next_batch_id(out_dir)
    rec.write.mode("errorifexists").parquet(os.path.join(out_dir, f"batch={batch}"))
    n = spark.read.parquet(os.path.join(out_dir, f"batch={batch}")).count()
    return {"vendor": vendor_name, "batch": batch, "rows": n}


def vendor_data(spark: SparkSession, out_dir: str) -> DataFrame:
    """All ingested records with SCD-2 versioning: crawl_version per
    (vendor_id, record_key) in batch order (ties within a batch broken by
    raw_data — deterministic), is_current on the latest — the same election
    as warehouse.fact_pages / the reference's insert-then-supersede."""
    df = spark.read.option("basePath", out_dir).parquet(out_dir)
    w = Window.partitionBy("vendor_id", "record_key").orderBy("batch", "raw_data")
    return (
        df.withColumn("crawl_version", F.row_number().over(w))
        .withColumn(
            "n_versions",
            F.count("*").over(Window.partitionBy("vendor_id", "record_key")),
        )
        .withColumn("is_current", F.col("crawl_version") == F.col("n_versions"))
    )
