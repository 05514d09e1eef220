"""Deterministic testdata scale-up (sources/scale_testdata): linear-work
replication — consistent key offsets, disjoint replica shingles,
orthogonally-permuted embeddings — the input for bench.py's data-scaling
block."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from scrapy_spark.sources.scale_testdata import TABLES, ensure_scaled, scale_up

SRC = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def scaled(spark, tmp_path_factory):
    dst = str(tmp_path_factory.mktemp("scaled"))
    scale_up(spark, SRC, dst, factor=3)
    return dst


def test_row_counts_scale_exactly(spark, scaled):
    for t in TABLES:
        n0 = spark.read.parquet(f"{SRC}/{t}.parquet").count()
        n1 = spark.read.parquet(f"{scaled}/{t}.parquet").count()
        if t in ("region", "nation"):
            assert n1 == n0, t  # fixed dimension tables
        else:
            assert n1 == 3 * n0, t


def test_keys_unique_and_joins_intact(spark, scaled):
    o = spark.read.parquet(f"{scaled}/orders.parquet")
    assert o.select("o_orderkey").distinct().count() == o.count()
    li = spark.read.parquet(f"{scaled}/lineitem.parquet")
    assert li.join(o, li.l_orderkey == o.o_orderkey, "left_anti").count() == 0
    c = spark.read.parquet(f"{scaled}/customer.parquet")
    assert o.join(c, o.o_custkey == c.c_custkey, "left_anti").count() == 0
    # per-key density preserved: same max lineitems per order as the source
    src_li = spark.read.parquet(f"{SRC}/lineitem.parquet")
    m0 = src_li.groupBy("l_orderkey").count().agg(F.max("count")).collect()[0][0]
    m1 = li.groupBy("l_orderkey").count().agg(F.max("count")).collect()[0][0]
    assert m0 == m1


def test_documents_replica_shingles_disjoint(spark, scaled):
    """Replica token-suffixing keeps cross-replica text DISJOINT at the
    token level, so near-dup pair counts scale linearly (not r^2)."""
    d = spark.read.parquet(f"{scaled}/documents.parquet")
    n_src = spark.read.parquet(f"{SRC}/documents.parquet").count()
    r0 = d.filter(F.col("doc_id") < n_src)
    r1 = d.filter((F.col("doc_id") >= n_src) & (F.col("doc_id") < 2 * n_src))
    t0 = set(r0.select(F.explode(F.split("text", " ")).alias("w")).distinct().toPandas()["w"])
    t1 = set(r1.select(F.explode(F.split("text", " ")).alias("w")).distinct().toPandas()["w"])
    assert not (t0 & t1)  # fully disjoint vocabularies
    # n_chars recomputed for suffixed replicas
    bad = d.filter(F.length("text") != F.col("n_chars")).count()
    assert bad == 0


def test_embeddings_permutation_preserves_geometry(spark, scaled):
    """A dimension permutation is orthogonal: intra-replica cosines are
    EXACTLY the source cosines; cross-replica cosines decorrelate."""
    src = {r["vec_id"]: np.array(r["embedding"]) for r in
           spark.read.parquet(f"{SRC}/embeddings.parquet").limit(10).collect()}
    n_src = spark.read.parquet(f"{SRC}/embeddings.parquet").count()
    d = spark.read.parquet(f"{scaled}/embeddings.parquet")
    rep1 = {r["vec_id"] - n_src: np.array(r["embedding"]) for r in
            d.filter((F.col("vec_id") >= n_src) & (F.col("vec_id") < n_src + 10)).collect()}

    def cos(a, b):
        return float(a @ b / (np.linalg.norm(a) * np.linalg.norm(b)))

    ids = sorted(set(src) & set(rep1))[:5]
    for i in ids:
        for j in ids:
            if i < j:
                assert abs(cos(src[i], src[j]) - cos(rep1[i], rep1[j])) < 1e-6
    # the permuted replica is NOT identical to the source vectors
    assert any(not np.array_equal(src[i], rep1[i]) for i in ids)


def test_ensure_scaled_is_idempotent(spark, tmp_path):
    dst = str(tmp_path / "cache")
    ensure_scaled(spark, SRC, dst, factor=2)
    import os

    stamp = os.path.getmtime(os.path.join(dst, "_SCALE_OK"))
    ensure_scaled(spark, SRC, dst, factor=2)  # no regeneration
    assert os.path.getmtime(os.path.join(dst, "_SCALE_OK")) == stamp
