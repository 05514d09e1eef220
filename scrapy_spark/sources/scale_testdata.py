"""Deterministic scale-up of the driver testdata for data-size benching.

The driver ships sf0.001/0.01/0.1; the 10^10 design claims deserve one
more decade of measured evidence (VERDICT r4 #6), so this module derives
an sfN dataset from sf0.1 by replicating each table ``factor`` times with
transformations chosen so PER-QUERY WORK SCALES LINEARLY — i.e. the
replica seams don't manufacture superlinear blowups or free collapses:

- star tables (customer/supplier/part/orders/lineitem): every key column
  is offset by ``replica * (max_key + 1)`` CONSISTENTLY across tables, so
  join fan-outs, group counts and per-key densities are preserved while
  distinct keys scale with the data. region/nation stay fixed (dimension
  tables: 10x customers per nation — how dimensions actually behave).
- events: event_id/user_id offset the same way; timestamps unchanged, so
  time-window grains densify (10x rows per hour bucket) and the 25-domain
  latency grain keeps its group count with 10x traffic — both are the
  real at-scale shape.
- documents: doc_id offset; for replica > 0 every TOKEN gets a replica
  suffix, so cross-replica shingle sets are DISJOINT — near-dup pair
  counts scale linearly with replicas instead of quadratically (replicas
  of identical text would put r copies in every MinHash bucket and
  inflate pair output by r^2). n_chars is recomputed.
- embeddings: vec_id offset; each replica applies a seeded PERMUTATION of
  the 64 dimensions. A permutation is orthogonal, so intra-replica
  cosine geometry (and thus the natural near-dup/ANN structure) is
  preserved EXACTLY, while cross-replica cosines decorrelate — identical
  vectors across replicas would make every ANN/neardup bucket r-fold
  degenerate.

Everything is seeded and idempotent: same input -> byte-stable row set
(file layout may differ by partitioning, which no consumer depends on).
"""

from __future__ import annotations

import os
import random

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]

_KEY_OFFSETS = {
    # table -> [(column, key-space name)]
    "customer": [("c_custkey", "cust")],
    "supplier": [("s_suppkey", "supp")],
    "part": [("p_partkey", "part")],
    "orders": [("o_orderkey", "order"), ("o_custkey", "cust")],
    "lineitem": [("l_orderkey", "order"), ("l_partkey", "part"), ("l_suppkey", "supp")],
    "events": [("event_id", "event"), ("user_id", "user")],
    "documents": [("doc_id", "doc")],
    "embeddings": [("vec_id", "vec")],
}

_KEY_SPACES = {
    "cust": ("customer", "c_custkey"),
    "supp": ("supplier", "s_suppkey"),
    "part": ("part", "p_partkey"),
    "order": ("orders", "o_orderkey"),
    "event": ("events", "event_id"),
    "user": ("events", "user_id"),
    "doc": ("documents", "doc_id"),
    "vec": ("embeddings", "vec_id"),
}


def _spans(spark: SparkSession, src: str) -> dict[str, int]:
    spans = {}
    for space, (table, col) in _KEY_SPACES.items():
        df = spark.read.parquet(os.path.join(src, f"{table}.parquet"))
        spans[space] = int(df.agg(F.max(col)).collect()[0][0]) + 1
    return spans


def _replica(df: DataFrame, table: str, r: int, spans: dict[str, int], dim: int) -> DataFrame:
    out = df
    for col, space in _KEY_OFFSETS.get(table, []):
        out = out.withColumn(col, (F.col(col) + F.lit(r * spans[space])).cast("long"))
    if table == "documents" and r > 0:
        toks = F.transform(
            F.split(F.col("text"), " "), lambda w: F.concat(w, F.lit(f"_r{r}"))
        )
        out = out.withColumn("text", F.array_join(toks, " ")).withColumn(
            "n_chars", F.length("text").cast("long")
        )
    if table == "embeddings" and r > 0:
        perm = list(range(dim))
        random.Random(1000 + r).shuffle(perm)
        out = out.withColumn(
            "embedding", F.array(*[F.col("embedding")[i] for i in perm])
        )
    return out


def scale_up(spark: SparkSession, src: str, dst: str, factor: int) -> None:
    """Write a ``factor``-times scale-up of the testdata at ``src`` into
    ``dst`` (one parquet dir per table, same names/schemas)."""
    os.makedirs(dst, exist_ok=True)
    spans = _spans(spark, src)
    for table in TABLES:
        df = spark.read.parquet(os.path.join(src, f"{table}.parquet"))
        dim = 0
        if table == "embeddings":
            dim = len(df.select("embedding").first()[0])
        if table in ("region", "nation"):
            scaled = df  # fixed dimension tables
        else:
            parts = [_replica(df, table, r, spans, dim) for r in range(factor)]
            scaled = parts[0]
            for p in parts[1:]:
                scaled = scaled.unionByName(p)
        scaled.write.mode("overwrite").parquet(os.path.join(dst, f"{table}.parquet"))


def ensure_scaled(spark: SparkSession, src: str, dst: str, factor: int) -> str:
    """Idempotent cache: generate ``dst`` once, reuse thereafter (a marker
    file records the source + factor so a changed config regenerates)."""
    marker = os.path.join(dst, "_SCALE_OK")
    want = f"{src}|{factor}"
    if os.path.exists(marker) and open(marker).read() == want:
        return dst
    scale_up(spark, src, dst, factor)
    with open(marker, "w") as f:
        f.write(want)
    return dst
